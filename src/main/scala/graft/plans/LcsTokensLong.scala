package graft.plans

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Token-level LONGEST COMMON SUBSEQUENCE length of two texts as a NATIVE
  * expression — the counting core of ROUGE-L (Lin 2004 §3.2): tokens split
  * on single spaces (the house `words()` / DuckDB `string_split` contract,
  * empty tokens included so the two engines agree on degenerate inputs),
  * then the classic two-row O(|c|·|r|) DP.
  *
  * Why native (the [[CdcBoundariesLong]] rationale): LCS is a sequential
  * per-row recurrence — no SQL/HOF formulation avoids materializing the DP
  * as per-element lambda calls, and the interpreted tree walk dominates
  * the integer max() work by orders of magnitude. Here the row stays
  * inside whole-stage codegen: one static call, two int arrays, no
  * allocation beyond them. Reference tokens are interned to dense ints
  * first so the O(c·r) inner loop compares ints, never strings — candidate
  * tokens absent from the reference map to -1 and can never match.
  *
  * Cost is per-PAIR row work (quadratic in the two documents' token
  * counts, like any exact edit kernel — the d13 discipline), embarrassingly
  * parallel across pairs; nothing about the corpus enters.
  */
case class LcsTokensLong(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (StringType, StringType) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName needs two string inputs, got $other")
    }

  override def dataType: DataType = LongType
  override def prettyName: String = LcsTokensLong.Name

  override def nullSafeEval(a: Any, b: Any): Any =
    LcsTokensLong.compute(a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cls = LcsTokensLong.getClass.getName.stripSuffix("$") + "$.MODULE$"
    defineCodeGen(ctx, ev, (a, b) => s"$cls.compute($a, $b)")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object LcsTokensLong {
  val Name = "graft_lcs_tokens"

  val fromChildren: Seq[Expression] => Expression = children => {
    Builders.arity(Name, "(candidate_text, reference_text)", 2, children)
    LcsTokensLong(children(0), children(1))
  }

  /** LCS length over space-split tokens; public because codegen calls it
    * statically.
    */
  def compute(a: UTF8String, b: UTF8String): Long = {
    val aw = a.toString.split(" ", -1)
    val bw = b.toString.split(" ", -1)
    val dict = new java.util.HashMap[String, Integer](bw.length * 2)
    val bi = new Array[Int](bw.length)
    var next = 0
    var j = 0
    while (j < bw.length) {
      var idv = dict.get(bw(j))
      if (idv == null) {
        idv = Integer.valueOf(next); dict.put(bw(j), idv); next += 1
      }
      bi(j) = idv.intValue()
      j += 1
    }
    val ai = new Array[Int](aw.length)
    var i = 0
    while (i < aw.length) {
      val idv = dict.get(aw(i))
      ai(i) = if (idv == null) -1 else idv.intValue()
      i += 1
    }
    var prev = new Array[Int](bi.length + 1)
    var cur = new Array[Int](bi.length + 1)
    i = 0
    while (i < ai.length) {
      var jj = 0
      while (jj < bi.length) {
        var m = prev(jj + 1)
        if (cur(jj) > m) m = cur(jj)
        if (ai(i) == bi(jj) && prev(jj) + 1 > m) m = prev(jj) + 1
        cur(jj + 1) = m
        jj += 1
      }
      val t = prev; prev = cur; cur = t
      i += 1
    }
    prev(bi.length).toLong
  }

  def register(spark: SparkSession): Unit = {
    val registry = spark.sessionState.functionRegistry
    val id = FunctionIdentifier(Name)
    if (!registry.functionExists(id)) {
      registry.registerFunction(
        id,
        new ExpressionInfo(classOf[LcsTokensLong].getName, Name),
        fromChildren)
    }
  }

  /** Token-level LCS length of two text columns as bigint. */
  def lcsTokens(cand: Column, ref: Column): Column = {
    SparkSession.getActiveSession.foreach(register)
    call_function(Name, cand, ref)
  }
}
