package graft.plans

import scala.collection.mutable

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.functions.{call_function, typedlit}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Multi-pattern substring counting via Aho-Corasick (goto/fail automaton):
  * per input string, the occurrence count of EVERY pattern — overlapping
  * occurrences included — as one array<long> aligned with the pattern list.
  * The blocklist/phrase-filter primitive of a curation pipeline: flagging N
  * banned phrases with N `regexp_count` passes rescans the text N times
  * (and regex engines count non-overlapping only); the automaton reads each
  * character ONCE, O(len + matches) regardless of pattern count.
  *
  * The pattern list is a plan-time literal (the SubwordCount convention), so
  * the automaton builds once per expression instance and the match runs
  * per-row inside the scan — no shuffle, no join, no broadcast. Output
  * lists are pre-merged along fail links at build time (standard BFS
  * construction), so the hot loop is: one goto step, one output-array walk.
  *
  * Semantics an oracle can mirror exactly: count of every position i where
  * text[i .. i+|p|) == p — deterministic, overlap-inclusive, byte-equal
  * across engines.
  */
case class AhoCorasickCount(child: Expression, patterns: Seq[String])
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (patterns.isEmpty || patterns.exists(_.isEmpty))
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires a non-empty list of non-empty patterns")
    else child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName needs string input, got ${other.simpleString}")
    }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_aho_corasick"

  @transient private lazy val automaton = new AhoCorasickCount.Automaton(patterns)

  override def nullSafeEval(input: Any): Any =
    new GenericArrayData(
      automaton.counts(input.asInstanceOf[UTF8String].toString)
        .map(Long.box): Array[Any])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("automaton", automaton,
      classOf[AhoCorasickCount.Automaton].getName)
    defineCodeGen(ctx, ev, c => s"$ref.countsArray($c.toString())")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object AhoCorasickCount {

  /** Goto/fail automaton with outputs pre-merged along fail links. */
  final class Automaton(patterns: Seq[String]) extends Serializable {
    private val goto = mutable.ArrayBuffer(mutable.HashMap.empty[Char, Int])
    private val outs = mutable.ArrayBuffer[Array[Int]](Array.empty)
    private val fail = mutable.ArrayBuffer(0)

    patterns.zipWithIndex.foreach { case (p, id) =>
      var s = 0
      p.foreach { ch =>
        s = goto(s).getOrElseUpdate(ch, {
          goto += mutable.HashMap.empty[Char, Int]
          outs += Array.empty
          fail += 0
          goto.size - 1
        })
      }
      outs(s) = outs(s) :+ id
    }
    locally { // BFS fail links; merge output lists so matching never chains
      val q = mutable.Queue.empty[Int]
      goto(0).values.foreach { v => fail(v) = 0; q.enqueue(v) }
      while (q.nonEmpty) {
        val u = q.dequeue()
        goto(u).foreach { case (ch, v) =>
          // follow u's fail chain to the deepest proper suffix extending ch;
          // goto(f)(ch) sits strictly shallower than v, so no self-link
          var f = fail(u)
          while (f != 0 && !goto(f).contains(ch)) f = fail(f)
          fail(v) = goto(f).getOrElse(ch, 0)
          outs(v) = outs(v) ++ outs(fail(v))
          q.enqueue(v)
        }
      }
    }

    def counts(text: String): Array[Long] = {
      val c = new Array[Long](patterns.size)
      var s = 0
      var i = 0
      while (i < text.length) {
        val ch = text.charAt(i)
        while (s != 0 && !goto(s).contains(ch)) s = fail(s)
        s = goto(s).getOrElse(ch, 0)
        val o = outs(s)
        var j = 0
        while (j < o.length) { c(o(j)) += 1; j += 1 }
        i += 1
      }
      c
    }

    /** Codegen entry: counts boxed into Catalyst array data. */
    def countsArray(text: String): ArrayData =
      new GenericArrayData(counts(text).map(Long.box): Array[Any])
  }

  val Name = "graft_aho_corasick"

  def fromChildren(children: Seq[Expression]): AhoCorasickCount = {
    Builders.arity(Name, "(text, patterns array)", 2, children)
    val pats = Builders.litStrings(Name, "patterns argument", children(1))
    AhoCorasickCount(children.head, pats)
  }

  def register(spark: SparkSession): Unit = {
    val registry = spark.sessionState.functionRegistry
    val id = FunctionIdentifier(Name)
    if (!registry.functionExists(id)) {
      registry.registerFunction(
        id,
        new ExpressionInfo(classOf[AhoCorasickCount].getName, Name),
        (children: Seq[Expression]) => fromChildren(children))
    }
  }

  /** Column API. `patterns` is embedded in the plan (a per-query constant). */
  def multiMatchCounts(text: Column, patterns: Seq[String]): Column = {
    SparkSession.getActiveSession.foreach(register)
    call_function(Name, text, typedlit(patterns))
  }
}
