package graft.plans

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.functions.{call_function, lit}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** The full 32-wide minhash signature of a document in ONE per-row pass:
  * word n-gram shingles (split on single spaces, empties kept — the exact
  * multiset `Dedup.wordShinglesAll` produces), each hashed to its unsigned
  * 32-bit md5 prefix (Md5PrefixLong semantics), folded through the 32 affine
  * permutations (a_i h + b_i) mod (2^31 - 1) keeping per-permutation minima.
  * Returns array<long>(32), or NULL when the document has fewer than n
  * words (no shingles — mirrors the relational path dropping the doc at the
  * groupBy).
  *
  * Equivalent to the explode -> 32-min-aggregate form and checked against
  * the same SQL oracle CTEs, but with NO row explosion and NO aggregation:
  * the relational form turns each document into |shingles| rows feeding a
  * 32-column min hash-aggregate — at sf0.1 that's ~1M shuffled rows for
  * what is inherently a per-row scalar computation, and it is on the hot
  * path of SIX pipeline queries (candidates, verified pairs, components,
  * corpus dedup, incremental dedup, edit-distance verify). Minima are
  * multiset-invariant, so shingle multiplicity needs no dedup.
  */
case class MinhashSigLong(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType, right) match {
      case (StringType, IntegerType, Literal(n: Int, _)) if n >= 1 =>
        TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (string, literal int >= 1), got " +
          s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
    }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "graft_minhash_sig"

  override def nullSafeEval(text: Any, n: Any): Any =
    MinhashSigLong.signature(text.asInstanceOf[UTF8String], n.asInstanceOf[Int])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cls = MinhashSigLong.getClass.getName.stripSuffix("$") + "$.MODULE$"
    nullSafeCodeGen(ctx, ev, (t, n) => {
      s"""
         |${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData) $cls.signature($t, $n);
         |${ev.isNull} = ${ev.value} == null;
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object MinhashSigLong {
  import graft.operators.Dedup.{MinhashPrime, NumHashes, hashA, hashB}

  /** The per-document kernel; public so generated code can call it.
    * Returns null when the document has fewer than n words.
    */
  def signature(text: UTF8String, n: Int): GenericArrayData = {
    val words = text.toString.split(" ", -1)
    if (words.length < n) return null
    val mins = Array.fill(NumHashes)(Long.MaxValue)
    val sb = new java.lang.StringBuilder
    var i = 0
    while (i <= words.length - n) {
      sb.setLength(0)
      var j = 0
      while (j < n) {
        if (j > 0) sb.append(' ')
        sb.append(words(i + j))
        j += 1
      }
      val h = Md5PrefixLong.prefix(sb.toString.getBytes("UTF-8"), 4)
      var k = 0
      while (k < NumHashes) {
        val v = (hashA(k) * h + hashB(k)) % MinhashPrime
        if (v < mins(k)) mins(k) = v
        k += 1
      }
      i += 1
    }
    new GenericArrayData(mins)
  }

  val Name = "graft_minhash_sig"

  val fromChildren: Seq[Expression] => Expression = children => {
    Builders.arity(Name, "(text, shingle_n)", 2, children)
    MinhashSigLong(children(0), children(1))
  }

  def register(spark: SparkSession): Unit = {
    val registry = spark.sessionState.functionRegistry
    val id = FunctionIdentifier(Name)
    if (!registry.functionExists(id)) {
      registry.registerFunction(
        id,
        new ExpressionInfo(classOf[MinhashSigLong].getName, Name),
        fromChildren)
    }
  }

  def minhashSig(c: Column, n: Int): Column = {
    SparkSession.getActiveSession.foreach(register)
    call_function(Name, c, lit(n))
  }
}
