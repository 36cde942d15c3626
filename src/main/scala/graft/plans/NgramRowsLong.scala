package graft.plans

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo, GenericInternalRow, Literal}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.functions.{call_function, lit}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Every word n-gram of orders 1..maxOrder as (ord, gram, prev) structs in
  * ONE per-row pass — the LM-counting fan-out ([[graft.operators.TextOps]]
  * `ngramRows`): gram = the window joined by single spaces, prev = the
  * single word left of the window (null at document start, the Kneser–Ney
  * continuation-evidence contract). Unlike the dedup-side
  * [[ShingleHashesLong]], gram TEXT survives — the count table is the
  * product — so grams are emitted as UTF8String slices over the row's own
  * byte copy (a window joined by single spaces is byte-identical to the
  * contiguous source range; `getBytes` hands this expression a private
  * array, so the slices are zero-copy AND safe).
  *
  * Why native (round 19): the relational form was a flatten over NESTED
  * transform/filter higher-order functions — CodegenFallback, interpreted
  * per element, one boxed struct + a concat_ws String per gram — profiled
  * across the whole lm family (lm1/lm3–lm9, lm5's ingest). Here the pass
  * stays inside whole-stage codegen and allocates only the output structs.
  */
case class NgramRowsLong(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType, right) match {
      case (StringType, IntegerType, Literal(n: Int, _)) if n >= 1 && n <= 8 =>
        TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (string, literal int in [1, 8]), got " +
          s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
    }

  override def dataType: DataType = NgramRowsLong.OutType
  override def nullable: Boolean = true
  override def prettyName: String = NgramRowsLong.Name

  override def nullSafeEval(text: Any, n: Any): Any =
    NgramRowsLong.compute(text.asInstanceOf[UTF8String], n.asInstanceOf[Int])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cls = NgramRowsLong.getClass.getName.stripSuffix("$") + "$.MODULE$"
    defineCodeGen(ctx, ev, (t, n) =>
      s"(org.apache.spark.sql.catalyst.util.ArrayData) $cls.compute($t, $n)")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object NgramRowsLong {
  val Name = "graft_ngram_rows"

  val OutType: DataType = ArrayType(StructType(Seq(
    StructField("ord", LongType, nullable = false),
    StructField("gram", StringType, nullable = false),
    StructField("prev", StringType, nullable = true))),
    containsNull = false)

  /** The per-document kernel; public because generated code calls it. */
  def compute(text: UTF8String, maxOrder: Int): GenericArrayData = {
    // getBytes copies unless the string spans its whole base array, and a
    // spanning base array is owned by this string alone — either way `b`
    // is private and immutable, so the gram slices below can wrap it
    val b = text.getBytes
    var nWords = 1
    var i = 0
    while (i < b.length) { if (b(i) == ' '.toByte) nWords += 1; i += 1 }
    val starts = new Array[Int](nWords + 1)
    var w = 1
    i = 0
    while (i < b.length) {
      if (b(i) == ' '.toByte) { starts(w) = i + 1; w += 1 }
      i += 1
    }
    starts(nWords) = b.length + 1
    val ords = math.min(maxOrder, nWords)
    var total = 0
    var n = 1
    while (n <= ords) { total += nWords - n + 1; n += 1 }
    val out = new Array[Any](total)
    var k = 0
    n = 1
    while (n <= ords) {
      var g = 0
      val nGrams = nWords - n + 1
      while (g < nGrams) {
        val s = starts(g)
        val e = starts(g + n) - 1
        val gram = UTF8String.fromBytes(b, s, e - s)
        val prev =
          if (g == 0) null
          else UTF8String.fromBytes(b, starts(g - 1), starts(g) - 1 - starts(g - 1))
        out(k) = new GenericInternalRow(
          Array[Any](n.toLong, gram, prev)): InternalRow
        k += 1
        g += 1
      }
      n += 1
    }
    new GenericArrayData(out)
  }

  val fromChildren: Seq[Expression] => Expression = children => {
    Builders.arity(Name, "(text, max_order)", 2, children)
    NgramRowsLong(children(0), children(1))
  }

  def register(spark: SparkSession): Unit = {
    val registry = spark.sessionState.functionRegistry
    val id = FunctionIdentifier(Name)
    if (!registry.functionExists(id)) {
      registry.registerFunction(
        id,
        new ExpressionInfo(classOf[NgramRowsLong].getName, Name),
        fromChildren)
    }
  }

  /** (ord, gram, prev) rows of orders 1..maxOrder for `inline()`. */
  def ngramRows(text: Column, maxOrder: Int): Column = {
    SparkSession.getActiveSession.foreach(register)
    call_function(Name, text, lit(maxOrder))
  }
}
