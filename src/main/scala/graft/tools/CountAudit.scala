package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** Bench-honesty audit (VERDICT r18 ask #2): Bench times `fn(...).count()`,
  * and Catalyst's column pruning + unique-key join elimination may LEGALLY
  * delete a query's entire computation under that count — observed live on
  * d37 (whole dedup collapsed to a doc count, 0.0 MB shuffle) — leaving a
  * bench row that times a no-op while claiming to time the operator.
  *
  * The audit is deterministic plan inspection, not timing: for each query
  * frame, collect the COMPUTED output columns (Alias whose child does real
  * work — not a bare attribute / literal / cast-of-attribute rename), then
  * inspect the optimized plan of `df.groupBy().count()` and report which of
  * those exprIds are still referenced (or defined) anywhere in it. A query
  * whose computed outputs ALL vanish under count is flagged PRUNED — its
  * bench and scaling rows are vacuous until a cardinality-neutral
  * forceUnderCount filter (queries/AppQueries.scala precedent) pins the
  * computation. PARTIAL (some survive) is reported for review: often fine
  * (an orderBy-only helper column legally dropping) but worth eyes.
  *
  * Usage: SPARK_GRAFT_ONLY=a,b sbt "runMain graft.tools.CountAudit [sfDir]"
  * Exit 0 always — this is a report; the close-out reads it.
  */
object CountAudit {

  /** Real work vs. plumbing: attribute/literal plus rename-shaped wrappers
    * around them are trivial; anything else (function call, arithmetic,
    * aggregate, window, conditional) is computation the bench must retain.
    */
  private def nonTrivial(e: Expression): Boolean = e match {
    case _: Attribute | _: Literal => false
    case c: Cast => nonTrivial(c.child)
    case a: Alias => nonTrivial(a.child)
    case _ => true
  }

  /** All exprIds referenced or (re)defined anywhere in the plan. */
  private def liveExprIds(plan: LogicalPlan): Set[ExprId] =
    plan.collect { case n =>
      n.expressions.flatMap(_.collect {
        case ar: AttributeReference => ar.exprId
        case al: Alias => al.exprId
      })
    }.flatten.toSet

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = graft.core.Sessions.configure(
      SparkSession.builder().appName("graft-count-audit").master("local[8]"),
      shufflePartitions = 8).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val only = sys.env.get("SPARK_GRAFT_ONLY").map(_.split(",").map(_.trim).toSet)
    var pruned, partial, retained, skipped = 0
    graft.SparkEntry.allDefs.sortBy(_.name)
      .filter(q => only.forall(_.contains(q.name)))
      .foreach { q =>
        try {
          val df = q.fn(spark, sfDir)
          val opt = df.queryExecution.optimizedPlan
          val out = opt.output.map(_.exprId).toSet
          // computed output columns: Alias anywhere in the plan whose
          // exprId reaches the output (bare re-projection preserves ids)
          val computed = opt.collect { case n =>
            n.expressions.flatMap(_.collect {
              case al: Alias if out(al.exprId) && nonTrivial(al.child) => al
            })
          }.flatten.distinctBy(_.exprId)
          if (computed.isEmpty) {
            println(s"OK-NOCOMP ${q.name}: no computed output columns " +
              "(filter/scan/explode shape — count retains its work)")
            retained += 1
          } else {
            val counted = df.groupBy().count()
            val cplan = counted.queryExecution.optimizedPlan
            val live = liveExprIds(cplan)
            // an alias may be pruned from the OUTPUT while its computation
            // survives INLINED elsewhere (a filter condition recomputing
            // the same expression) — that work IS measured, so check
            // semantic equality against every expression subtree too
            val subtrees = cplan.collect { case n =>
              n.expressions.flatMap(_.collect { case e: Expression => e })
            }.flatten
            val (kept, lost) = computed.partition(c =>
              live(c.exprId) || subtrees.exists(_.semanticEquals(c.child)))
            if (kept.isEmpty) {
              println(s"PRUNED ${q.name}: count() eliminates ALL computed " +
                s"outputs [${lost.map(_.name).mkString(",")}] — bench row " +
                "times a no-op; add forceUnderCount")
              pruned += 1
            } else if (lost.nonEmpty) {
              println(s"PARTIAL ${q.name}: kept [${kept.map(_.name).mkString(",")}]" +
                s" lost [${lost.map(_.name).mkString(",")}]")
              partial += 1
            } else {
              println(s"OK ${q.name}: all ${kept.size} computed outputs survive count()")
              retained += 1
            }
          }
        } catch {
          case e: Throwable =>
            println(s"SKIP ${q.name}: ${e.getClass.getSimpleName}: " +
              String.valueOf(e.getMessage).take(120))
            skipped += 1
        }
      }
    println(s"[count-audit] ok=$retained partial=$partial pruned=$pruned skipped=$skipped")
    spark.stop()
  }
}
