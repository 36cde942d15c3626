package graft.plans

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.functions.{call_function, lit}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Viterbi segmentation of one word under a unigram-LM piece vocabulary —
  * the E-step kernel of [[graft.operators.TextOps.unigramLmVocab]] (Kudo
  * 2018's unigram tokenizer, hard-EM variant). The model rides the plan as
  * two literal arrays (pieces + integer micro-nat scores, the BpeSegment
  * posture), so segmenting a 100 TB corpus is one codegen'd per-row scan
  * with zero joins.
  *
  * DP contract (the oracle unrolls the identical recurrence in SQL, so
  * every choice below is bit-checked): dp[0] = 0; dp[i] maximizes
  * dp[i-j] + score(word[i-j, i)) over j = 1..min(maxPieceLen, i) with the
  * piece present in the vocabulary; ties prefer the LONGER last piece
  * (larger j). Scores are EXACT integer micro-nats (LnFp), so "max" is
  * integer comparison — no float drift, any engine agrees. Positions with
  * no parse are carried as unreachable sentinels (a multi-char-only
  * vocabulary like {"ab"} segments "abab" fine); only a word the WHOLE
  * vocabulary cannot cover fails loud (the trainer always seeds every
  * corpus character, so reaching that error means the caller passed a
  * foreign vocabulary).
  */
case class UnigramSegment(child: Expression,
                          pieces: Seq[(String, Long)])
  extends UnaryExpression with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName needs a string word, got ${other.simpleString}")
  }

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = UnigramSegment.Name

  @transient private lazy val scores: java.util.HashMap[String, java.lang.Long] = {
    val m = new java.util.HashMap[String, java.lang.Long](pieces.size * 2)
    pieces.foreach { case (p, s) => m.put(p, java.lang.Long.valueOf(s)) }
    m
  }
  @transient private lazy val maxLen: Int =
    if (pieces.isEmpty) 0 else pieces.iterator.map(_._1.length).max

  // evaluated, not codegen'd: the kernel needs the instance-bound score
  // map; one virtual call per ROW around a tight loop is noise next to
  // the DP itself (the BpeSegment precedent)
  override def nullSafeEval(input: Any): Any =
    UnigramSegment.segment(input.asInstanceOf[UTF8String].toString,
      scores, maxLen)

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object UnigramSegment {

  /** The per-word Viterbi kernel. */
  def segment(w: String, scores: java.util.HashMap[String, java.lang.Long],
              maxLen: Int): ArrayData = {
    val n = w.length
    if (n == 0) return new GenericArrayData(Array[Any](UTF8String.fromString("")))
    val total = new Array[Long](n + 1)
    val back = new Array[Int](n + 1) // chosen j at position i (0 = unreachable)
    var i = 1
    while (i <= n) {
      var bestTotal = Long.MinValue
      var bestJ = 0
      var j = 1
      val jMax = math.min(maxLen, i)
      while (j <= jMax) {
        if (i - j == 0 || back(i - j) > 0) { // predecessor reachable
          val sc = scores.get(w.substring(i - j, i))
          if (sc != null) {
            val t = total(i - j) + sc.longValue()
            // scan j ascending; accept equal totals at larger j so ties
            // prefer the LONGER last piece (the oracle's ORDER BY j DESC)
            if (bestJ == 0 || t > bestTotal || (t == bestTotal && j > bestJ)) {
              bestTotal = t; bestJ = j
            }
          }
        }
        j += 1
      }
      // bestJ == 0 marks position i unreachable — NOT an error yet: a
      // vocabulary of multi-char pieces only (no "a"/"b" next to "ab")
      // can still segment the full word even though some prefix lengths
      // have no parse (ADVICE r15). Only dp[n] unreachable fails.
      total(i) = bestTotal
      back(i) = bestJ
      i += 1
    }
    require(back(n) > 0,
      s"unigram vocabulary cannot segment '$w' — no combination of pieces " +
        "covers it (the in-repo trainer always seeds every corpus " +
        "character, so this word carries a character or sequence absent " +
        "from the supplied piece table)")
    // backtrace
    val buf = scala.collection.mutable.ArrayBuffer.empty[Any]
    var p = n
    while (p > 0) {
      buf.prepend(UTF8String.fromString(w.substring(p - back(p), p)))
      p -= back(p)
    }
    new GenericArrayData(buf.toArray)
  }

  val Name = "graft_unigram_segment"

  val fromChildren: Seq[Expression] => Expression = children => {
    Builders.arity(Name, "(word, pieces array, scores array)", 3, children)
    val Seq(word, piecesExpr, scoresExpr) = children
    val ps = Builders.litStrings(Name, "pieces argument", piecesExpr)
    val ss = Builders.litValue(Name, "scores argument", scoresExpr)
      .asInstanceOf[ArrayData].toLongArray()
    require(ps.length == ss.length,
      s"$Name pieces (${ps.length}) and scores (${ss.length}) must align")
    UnigramSegment(word, ps.zip(ss.toSeq))
  }

  def register(spark: SparkSession): Unit = {
    val registry = spark.sessionState.functionRegistry
    val id = FunctionIdentifier(Name)
    if (!registry.functionExists(id)) {
      registry.registerFunction(
        id,
        new ExpressionInfo(classOf[UnigramSegment].getName, Name),
        fromChildren)
    }
  }

  /** Column API: `model` rides the plan as two aligned literal arrays. */
  def unigramSegment(word: Column, model: Seq[(String, Long)]): Column = {
    SparkSession.getActiveSession.foreach(register)
    call_function(Name, word,
      lit(model.map(_._1).toArray), lit(model.map(_._2).toArray))
  }
}
