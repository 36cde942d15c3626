package graft.plans

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal, QuaternaryExpression, UnsafeArrayData}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.functions.{call_function, lit}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType}

/** The per-query PQ ADC lookup table as ONE native expression —
  * `Similarity.pqLut`: lut[mm][kk] = exact integer squared L2 between the
  * query's mm-th subvector and codebook entry cb[mm][kk], via the dot
  * identity a·a + b·b − 2a·b. Returns array<array<long>> (m × k).
  *
  * Why native (round 19): the Column form was a NESTED
  * transform(sequence, mm => transform(cb[mm], cc => subD2(slice(...))))
  * — both lambdas interpreted, a fresh slice array per (query, subspace),
  * and three kernel dots dispatched through interpreted glue per entry;
  * it runs on every serve-path query row (searchIvfPq, pqTopKWith, the
  * filtered serve). Here the whole m × k table builds in one codegen'd
  * pass; the query's per-subspace self-dot is computed once per subspace,
  * not once per entry.
  *
  * Exactness: identical integer arithmetic; a codebook entry whose length
  * differs from the query's subvector slice throws the [[DotProductLong]]
  * mismatch error exactly as the composed form did (slice truncation at
  * the vector end included).
  */
case class PqLutLong(first: Expression, second: Expression,
                     third: Expression, fourth: Expression)
    extends QuaternaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (first.dataType, second.dataType, third.dataType, fourth.dataType,
      third, fourth) match {
      case (ArrayType(LongType, _),
            ArrayType(ArrayType(ArrayType(LongType, _), _), _),
            IntegerType, IntegerType, Literal(d: Int, _), Literal(m: Int, _))
          if m >= 1 && d >= m && d % m == 0 =>
        TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (array<bigint>, array<array<array<bigint>>>, " +
          s"literal int dim, literal int m) with m >= 1 and m | dim, got " +
          s"(${first.dataType.simpleString}, ${second.dataType.simpleString}, " +
          s"${third.dataType.simpleString}, ${fourth.dataType.simpleString})")
    }

  override def dataType: DataType =
    ArrayType(ArrayType(LongType, containsNull = false), containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = PqLutLong.Name

  override def nullSafeEval(vec: Any, cb: Any, dim: Any, m: Any): Any =
    PqLutLong.compute(vec.asInstanceOf[ArrayData], cb.asInstanceOf[ArrayData],
      dim.asInstanceOf[Int], m.asInstanceOf[Int])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cls = PqLutLong.getClass.getName.stripSuffix("$") + "$.MODULE$"
    defineCodeGen(ctx, ev, (v, c, d, m) =>
      s"(org.apache.spark.sql.catalyst.util.ArrayData) $cls.compute($v, $c, $d, $m)")
  }

  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression, q: Expression): Expression =
    copy(first = f, second = s, third = t, fourth = q)
}

object PqLutLong {
  val Name = "graft_pq_lut"

  /** The per-query kernel; public because generated code calls it. */
  def compute(vec: ArrayData, cb: ArrayData, dim: Int, m: Int): GenericArrayData = {
    val sub = dim / m
    val vLen = vec.numElements()
    val out = new Array[Any](m)
    var mm = 0
    while (mm < m) {
      val base = mm * sub
      // slice(vec, base+1, sub) truncates at the vector end — reproduce
      val aLen = math.max(0, math.min(sub, vLen - base))
      var aa = 0L
      var j = 0
      while (j < aLen) {
        val x = vec.getLong(base + j); aa += x * x; j += 1
      }
      val entries = cb.getArray(mm)
      val k = entries.numElements()
      val row = new Array[Long](k)
      var kk = 0
      while (kk < k) {
        val cc = entries.getArray(kk)
        if (cc.numElements() != aLen)
          throw new IllegalArgumentException(
            s"graft_dot_long: array length mismatch ($aLen vs ${cc.numElements()})")
        var bb = 0L
        var ab = 0L
        j = 0
        while (j < aLen) {
          val b = cc.getLong(j)
          bb += b * b
          ab += vec.getLong(base + j) * b
          j += 1
        }
        row(kk) = aa + bb - 2L * ab
        kk += 1
      }
      out(mm) = UnsafeArrayData.fromPrimitiveArray(row)
      mm += 1
    }
    new GenericArrayData(out)
  }

  val fromChildren: Seq[Expression] => Expression = children => {
    Builders.arity(Name, "(query_vec, codebook, dim, m)", 4, children)
    PqLutLong(children(0), children(1), children(2), children(3))
  }

  def register(spark: SparkSession): Unit = {
    val registry = spark.sessionState.functionRegistry
    val id = FunctionIdentifier(Name)
    if (!registry.functionExists(id)) {
      registry.registerFunction(
        id,
        new ExpressionInfo(classOf[PqLutLong].getName, Name),
        fromChildren)
    }
  }

  /** m x k ADC lookup table of a quantized query against the codebook. */
  def pqLut(vec: Column, cb: Column, dim: Int, m: Int): Column = {
    SparkSession.getActiveSession.foreach(register)
    call_function(Name, vec, cb, lit(dim), lit(m))
  }
}
