package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Dataset-level profiling and data-quality gates — the observability
  * operators that run beside every production pipeline (the reference has
  * none; bad rows silently vanish through its coerce-and-drop hygiene).
  */
object Quality {

  /** Column profile, one OUTPUT ROW PER COLUMN: row count, null count,
    * exact distinct count, min/max rendered as strings. ALL columns'
    * statistics come from ONE aggregation over ONE scan (the multi-distinct
    * Expand plan), then the single result row unpivots via a struct
    * explode — profiling k columns costs one table pass, not k. At scale,
    * swap exact distinct for approx_count_distinct per the ApproxOps
    * contract.
    */
  def profile(df: DataFrame, columns: Seq[String]): DataFrame = {
    require(columns.nonEmpty, "at least one column")
    val aggs = columns.flatMap(c => Seq(
      count(when(col(c).isNull, 1)).as(s"__nulls_$c"),
      countDistinct(col(c)).as(s"__dist_$c"),
      min(col(c)).cast("string").as(s"__min_$c"),
      max(col(c)).cast("string").as(s"__max_$c")))
    val one = df.agg(count(lit(1)).as("__n"), aggs: _*)
    one.select(col("__n"),
      explode(array(columns.map(c => struct(
        lit(c).as("column"),
        col(s"__nulls_$c").as("n_nulls"),
        col(s"__dist_$c").as("n_distinct"),
        col(s"__min_$c").as("min_s"),
        col(s"__max_$c").as("max_s"))): _*)).as("p"))
      .select(col("p.column"), col("__n").as("n_rows"), col("p.n_nulls"),
        col("p.n_distinct"), col("p.min_s"), col("p.max_s"))
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
    // single aggregate row unpivoted by struct explode — a union of
    // per-rule projections would re-evaluate the aggregation (and re-scan)
    // once per rule
    df.agg(count(lit(1)).as("__n"), aggs: _*)
      .select(col("__n"),
        explode(array(rules.map { case (name, _) => struct(
          lit(name).as("rule"),
          col(s"__v_$name").as("n_violations"))
        }: _*)).as("r"))
      .select(col("r.rule"), col("r.n_violations"),
        (col("r.n_violations").cast("double") /
          greatest(col("__n").cast("double"), lit(1.0))).as("violation_rate"))
  }

  /** Schema-drift report: compare a frame's ACTUAL schema against an
    * expected StructType and emit one row per divergence — `added` (column
    * the contract doesn't know), `missing` (contract column absent),
    * `type_changed`, `nullability_relaxed` (contract says required, data
    * says nullable — the only nullability direction that breaks a
    * consumer). Empty result = contract holds. Purely metadata — NO job
    * runs, so it gates an ingest before any bytes are read; pair with
    * [[expect]] for value-level rules.
    */
  def schemaDrift(df: DataFrame,
                  expected: org.apache.spark.sql.types.StructType): DataFrame = {
    import df.sparkSession.implicits._
    val actual = df.schema
    val a = actual.map(f => f.name -> f).toMap
    val e = expected.map(f => f.name -> f).toMap
    val drifts =
      actual.filterNot(f => e.contains(f.name))
        .map(f => ("added", f.name, f.dataType.simpleString, null: String)) ++
      expected.filterNot(f => a.contains(f.name))
        .map(f => ("missing", f.name, null: String, f.dataType.simpleString)) ++
      expected.flatMap { ef =>
        a.get(ef.name).toSeq.flatMap { af =>
          val typeDrift =
            if (af.dataType != ef.dataType)
              Seq(("type_changed", ef.name, af.dataType.simpleString,
                ef.dataType.simpleString))
            else Nil
          val nullDrift =
            if (af.nullable && !ef.nullable)
              Seq(("nullability_relaxed", ef.name, "nullable", "required"))
            else Nil
          typeDrift ++ nullDrift
        }
      }
    drifts.toDF("drift", "column", "actual", "expected")
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
