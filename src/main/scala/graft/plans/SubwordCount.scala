package graft.plans

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions.{call_function, typedlit}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Greedy longest-match subword segmentation count (the wordpiece/BPE
  * inference step): split on single spaces, then segment each word greedily
  * against a FIXED vocabulary — at every position consume the longest vocab
  * piece that prefixes the remainder — and return the total piece count for
  * the document.
  *
  * The vocabulary is a plan-time constant (corpus-trained by
  * TextOps.subwordVocab — dimension-sized, like a broadcast dim or IVF
  * centroid set), so the expression runs per-row inside the scan with no
  * shuffle and no lookup join: exactly where tokenization belongs in a
  * 100 TB pre-training pipeline (count tokens while the text is in cache,
  * not in a later pass).
  *
  * Matching structure: pieces grouped by length, probed longest-first — each
  * position costs O(maxPieceLen) hash probes, independent of vocab size.
  * A character absent from the vocab consumes one position and counts one
  * piece (the [UNK] convention); with a corpus-trained vocab this never
  * fires on the training corpus itself (all its characters are pieces).
  */
case class SubwordCount(child: Expression, vocab: Seq[String])
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (vocab.isEmpty) TypeCheckResult.TypeCheckFailure("vocab must be non-empty")
    else child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName needs string input, got ${other.simpleString}")
    }

  override def dataType: DataType = LongType
  override def prettyName: String = "graft_subword_count"

  @transient private lazy val matcher = new SubwordCount.Matcher(vocab)

  override def nullSafeEval(input: Any): Any =
    matcher.countDocument(input.asInstanceOf[UTF8String].toString)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    // the matcher is per-expression state; reference it from generated code
    val ref = ctx.addReferenceObj("matcher", matcher, classOf[SubwordCount.Matcher].getName)
    defineCodeGen(ctx, ev, c => s"$ref.countDocument($c.toString())")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object SubwordCount {

  /** Longest-first greedy matcher over pieces grouped by length. */
  final class Matcher(vocab: Seq[String]) extends Serializable {
    private val byLen: Array[java.util.HashSet[String]] = {
      val maxLen = vocab.map(_.length).max
      val a = Array.fill(maxLen + 1)(new java.util.HashSet[String]())
      vocab.foreach(p => if (p.nonEmpty) a(p.length).add(p))
      a
    }

    def countWord(w: String): Long = {
      var pos = 0
      var n = 0L
      while (pos < w.length) {
        var len = math.min(byLen.length - 1, w.length - pos)
        var matched = 1 // [UNK] fallback: consume one char, count one piece
        while (len >= 1) {
          if (byLen(len).contains(w.substring(pos, pos + len))) {
            matched = len
            len = 0
          } else len -= 1
        }
        pos += matched
        n += 1
      }
      n
    }

    def countDocument(text: String): Long = {
      var n = 0L
      var start = 0
      var i = 0
      while (i <= text.length) {
        if (i == text.length || text.charAt(i) == ' ') {
          if (i > start) n += countWord(text.substring(start, i))
          start = i + 1
        }
        i += 1
      }
      n
    }
  }

  val Name = "graft_subword_count"

  val fromChildren: Seq[Expression] => Expression = children => {
    Builders.arity(Name, "(text, vocab array)", 2, children)
    val vocab = Builders.litStrings(Name, "vocab argument", children(1))
    SubwordCount(children(0), vocab)
  }

  def register(spark: SparkSession): Unit = {
    val registry = spark.sessionState.functionRegistry
    val id = FunctionIdentifier(Name)
    if (!registry.functionExists(id)) {
      registry.registerFunction(
        id,
        new ExpressionInfo(classOf[SubwordCount].getName, Name),
        fromChildren)
    }
  }

  /** Column API. `vocab` is embedded in the plan (a per-query constant). */
  def subwordCount(text: Column, vocab: Seq[String]): Column = {
    SparkSession.getActiveSession.foreach(register)
    call_function(Name, text, typedlit(vocab))
  }
}
