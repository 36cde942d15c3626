package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Aggregates that are bit-identical across engines.
  *
  * Plain `sum(double)` is accumulation-order dependent, so a Spark result and
  * a single-threaded oracle (DuckDB) can disagree in the last ulp — enough to
  * break a hash compare. All source numerics in the fixtures carry <= 2
  * fractional decimal digits, so casting to a decimal first makes the sum
  * EXACT (and therefore order-independent); one final cast back to double is
  * a single deterministic rounding. Mean/stddev are then assembled from exact
  * sums with a fixed double expression tree that the oracle mirrors verbatim.
  *
  * This also reflects the scale posture: partial aggregation (map-side
  * combine) of decimals is exact, so a 1000-executor sum equals the
  * single-node sum — no nondeterminism at 100 TB either.
  */
object ExactAgg {
  private val dec = DecimalType(25, 4)
  private val decSq = DecimalType(30, 8)

  /** Exact sum of a (<=4 fractional digits) numeric column, as double. */
  def sumExact(c: Column): Column = sum(c.cast(dec)).cast("double")

  /** Exact-sum mean: `cast(sum(decimal) as double) / count` — one double
    * division of identical operands on both engines.
    */
  def meanExact(c: Column): Column = sumExact(c) / count(c)

  /** Sample standard deviation from exact decimal moments:
    * sqrt((n*s2 - s1^2) / (n*(n-1))), all-double once the sums are exact.
    * NULL for n <= 1 (matches pandas `Series.std` ddof=1 on singletons).
    */
  def stddevSampExact(c: Column): Column = {
    val n = count(c).cast("double")
    val s1 = sumExact(c)
    val s2 = sum((c * c).cast(decSq)).cast("double")
    when(n > 1, sqrt((n * s2 - s1 * s1) / (n * (n - lit(1.0)))))
  }
}
