package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Approximate aggregates for corpus-scale profiling: HyperLogLog++
  * count-distinct and quantile-summary percentiles — the sketches a 100 TB
  * pipeline uses where exact aggregation would shuffle every distinct value.
  *
  * Verification strategy: sketch INTERNALS are engine-private (register
  * layouts, summary compression), so no cross-engine oracle can match the raw
  * approximate value. What IS portable is the accuracy contract. Each
  * operator therefore emits the exact answer alongside a boolean that the
  * approximation landed within its documented bound; the oracle computes the
  * exact columns and asserts the boolean is literally true — a hash-checkable
  * verification of the GUARANTEE, with the exact columns anchoring row
  * content. The booleans are deterministic even though sketch merge order is
  * not: HLL register merges are commutative, and the quantile-summary rank
  * error holds under any merge order.
  */
object ApproxOps {

  /** Per-key exact distinct count + whether HLL++ (`rsd` relative standard
    * deviation) lands within `tol` of it. Two aggregations on purpose: the
    * exact one is the oracle anchor, the sketch one is the operator under
    * test. At scale the exact branch is the one you'd drop.
    *
    * `tol` is an empirically-validated MARGIN, not a guarantee: HLL++'s rsd
    * is a standard deviation, so a tol of k x rsd is a ~k-sigma bound that
    * new data can legitimately exceed — callers asserting `approx_ok` (the
    * oracle queries do) should size tol generously relative to rsd (the
    * shipped queries use 2.5+ sigma on fixed fixtures) or gate on key
    * cardinality. An all-null key (n_exact = 0) is approx_ok iff the sketch
    * also says 0 — not NULL, which a bare division would produce.
    */
  def distinctWithinTol(df: DataFrame, keyCol: String, valCol: String,
                        rsd: Double, tol: Double): DataFrame =
    df.groupBy(col(keyCol))
      .agg(
        countDistinct(col(valCol)).as("n_exact"),
        approx_count_distinct(col(valCol), rsd).as("n_approx"))
      .select(col(keyCol), col("n_exact"),
        when(col("n_exact") === 0, col("n_approx") === 0)
          .otherwise(abs(col("n_approx") - col("n_exact")).cast("double") /
            col("n_exact") <= tol).as("approx_ok"))

  /** Per-key count + whether the approximate percentile `p` (quantile
    * summaries with `accuracy`) lies within the exact [lo, hi] percentile
    * window — the rank-error contract restated over values.
    */
  def percentileWithinWindow(df: DataFrame, keyCol: String, valCol: String,
                             p: Double, lo: Double, hi: Double,
                             accuracy: Int): DataFrame =
    df.groupBy(col(keyCol))
      .agg(
        count(col(valCol)).as("n_values"),
        percentile_approx(col(valCol), lit(p), lit(accuracy)).as("p_approx"),
        expr(s"percentile($valCol, $lo)").as("p_lo"),
        expr(s"percentile($valCol, $hi)").as("p_hi"))
      .select(col(keyCol), col("n_values"),
        (col("p_approx") >= col("p_lo") && col("p_approx") <= col("p_hi"))
          .as("approx_ok"))
}
