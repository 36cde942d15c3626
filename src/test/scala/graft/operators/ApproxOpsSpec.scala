package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ApproxOpsSpec extends SparkSpec {
  import spark.implicits._

  test("HLL distinct stays within tolerance on the events fixture") {
    val out = ApproxOps.distinctWithinTol(
      graft.core.Tables.events(spark, sf), "event_type", "user_id", 0.02, 0.05)
    val rows = out.collect()
    assert(rows.nonEmpty)
    assert(rows.forall(_.getAs[Boolean]("approx_ok")), rows.mkString("\n"))
  }

  test("approximate percentile lands inside the exact [45,55] window") {
    val out = ApproxOps.percentileWithinWindow(
      graft.core.Tables.events(spark, sf), "event_type", "value",
      0.5, 0.45, 0.55, 10000)
    val rows = out.collect()
    assert(rows.nonEmpty)
    assert(rows.forall(_.getAs[Boolean]("approx_ok")), rows.mkString("\n"))
  }

  test("the bound check is not vacuous: a degenerate sketch fails it") {
    // accuracy=1 collapses the quantile summary to rank error ~100%; on a
    // spread-out distribution the median estimate must leave a tight window
    val skewed = (1 to 2000).map(i => ("k", i.toDouble)).toDF("k", "v")
    val out = ApproxOps.percentileWithinWindow(skewed, "k", "v",
      0.5, 0.4999, 0.5001, 1)
    assert(!out.collect()(0).getAs[Boolean]("approx_ok"))
  }
}
