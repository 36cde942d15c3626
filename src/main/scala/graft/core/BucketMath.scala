package graft.core

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions.expr

/** Shared arithmetic for the two-level (group, bucket) prefix discipline
  * (rocAuc / calibration / exact order statistics / perplexity tiers):
  * the default bucket count and overflow-safe integer bucketing over a
  * driver-known [lo, hi] long range.
  */
object BucketMath {

  /** Planner-free default bucket count: the larger of the session's
    * declared parallelism and its shuffle-partition setting — NOT
    * `df.rdd.getNumPartitions`, which forces a second full physical
    * planning + RDD conversion of the input (pure driver-side waste on
    * every call) and can pin an extra lineage on a cached/checkpointed
    * input. Results are invariant to the count (property-tested); what it
    * trades is driver state (groups x buckets longs) against per-bucket
    * task size. `spark.sql.shuffle.partitions` is the knob clusters
    * already size to their workload, so the default tracks deployment
    * scale; a corpus far larger than the session's sizing should pass
    * `buckets` explicitly (every two-level operator exposes it).
    */
  def defaultBuckets(df: DataFrame): Int = {
    val spark = df.sparkSession
    math.max(math.max(spark.sessionState.conf.numShufflePartitions,
      spark.sparkContext.defaultParallelism), 1)
  }

  /** True when hi − lo exceeds Long.MaxValue, i.e. when a per-row BIGINT
    * offset `v − lo` can wrap (lo = Long.MinValue, v = Long.MaxValue → −1).
    */
  def isWide(lo: Long, hi: Long): Boolean =
    BigInt(hi) - BigInt(lo) > Long.MaxValue

  /** Integer bucket width ⌊(hi−lo)/n⌋+1 via BigInt — hi−lo alone can
    * overflow a Long for adversarial score ranges — clamped to
    * Long.MaxValue. Monotone: equal values share a bucket, and
    * base + within-bucket prefix IS the global per-group prefix.
    */
  def widthFor(lo: Long, hi: Long, nBuckets: Int): Long =
    (((BigInt(hi) - BigInt(lo)) / nBuckets) + 1)
      .min(BigInt(Long.MaxValue)).toLong

  /** Bucket index ⌊(col − lo)/width⌋ as an exact integral DIV (Spark DIV ==
    * DuckDB `//`; a double `/` + floor loses exactness past 2^53).
    * Overflow-safe: when the driver-known range exceeds Long.MaxValue the
    * per-row offset wraps in BIGINT and the wrapped-high values land in
    * NEGATIVE buckets that sort "strictly below" — silently corrupting any
    * prefix sum built on the bucket order — so the wide path routes the
    * offset through DECIMAL(38,0) before the div. The common narrow path
    * stays pure BIGINT (codegen'd, no decimal in the hot loop).
    */
  def bucketOf(colName: String, lo: Long, hi: Long, width: Long): Column =
    if (isWide(lo, hi))
      expr(s"CAST((CAST($colName AS DECIMAL(38,0)) - CAST($lo AS BIGINT))" +
        s" div CAST($width AS BIGINT) AS BIGINT)")
    else
      expr(s"($colName - CAST($lo AS BIGINT)) div CAST($width AS BIGINT)")

  /** Inclusive lower edge lo + bin·width as BIGINT. The final value is
    * ≤ hi so it always fits a Long, but the intermediate bin·width can
    * exceed Long.MaxValue exactly when the range is wide — route the
    * product through DECIMAL(38,0) there.
    */
  def bucketLoOf(binCol: String, lo: Long, hi: Long, width: Long): Column =
    if (isWide(lo, hi))
      expr(s"CAST(CAST($lo AS DECIMAL(38,0)) +" +
        s" CAST($binCol AS DECIMAL(38,0)) * CAST($width AS BIGINT) AS BIGINT)")
    else
      expr(s"CAST($lo AS BIGINT) + $binCol * CAST($width AS BIGINT)")
}
