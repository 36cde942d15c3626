package graft.operators

import graft.SparkSpec
import java.sql.Timestamp

class FunnelSpec extends SparkSpec {
  import spark.implicits._

  private def ts(m: Int) = new Timestamp(1700000000000L + m * 60000L)

  // u1 completes in order; u2 purchases BEFORE viewing (must not convert);
  // u3 views only; u4 never views (its click/purchase must not count).
  private val events = Seq(
    (1L, ts(0), "view"), (1L, ts(5), "click"), (1L, ts(9), "purchase"),
    (2L, ts(0), "purchase"), (2L, ts(3), "view"), (2L, ts(7), "click"),
    (3L, ts(1), "view"),
    (4L, ts(2), "click"), (4L, ts(4), "purchase")
  ).toDF("user_id", "ts", "event_type")

  test("chained funnel counts strictly-ordered first occurrences") {
    val out = Funnel.steps(events, "user_id", "ts", "event_type",
      Seq("view", "click", "purchase")).orderBy("step").collect()
    assert(out.map(_.getAs[Long]("n_users")).toSeq == Seq(3L, 2L, 1L))
    assert(out.map(_.getAs[String]("event_type")).toSeq ==
      Seq("view", "click", "purchase"))
    assert(out(1).getAs[Double]("pct_of_first") == 2.0 / 3.0)
    assert(out(2).getAs[Double]("pct_of_prev") == 0.5)
    assert(out(0).isNullAt(out(0).fieldIndex("pct_of_prev")))
  }

  test("a step at the SAME timestamp as the previous step does not convert") {
    val sameTs = Seq((9L, ts(0), "view"), (9L, ts(0), "click"))
      .toDF("user_id", "ts", "event_type")
    val out = Funnel.steps(sameTs, "user_id", "ts", "event_type",
      Seq("view", "click")).orderBy("step").collect()
    assert(out.map(_.getAs[Long]("n_users")).toSeq == Seq(1L, 0L))
  }

  test("empty input yields zero counts with NULL rates, not an empty frame") {
    val out = Funnel.steps(events.limit(0), "user_id", "ts", "event_type",
      Seq("view", "click", "purchase")).orderBy("step").collect()
    assert(out.map(_.getAs[Long]("n_users")).toSeq == Seq(0L, 0L, 0L))
    assert(out.forall(_.isNullAt(out.head.fieldIndex("pct_of_first"))))
  }

  test("conversionLatency: exact rank-select percentiles by hand; empty when nobody converts") {
    // three completed chains with latencies 10, 20, 30 MINUTES; one stuck
    val e = Seq(
      (1L, ts(0), "view"), (1L, ts(5), "click"), (1L, ts(10), "purchase"),
      (2L, ts(0), "view"), (2L, ts(5), "click"), (2L, ts(20), "purchase"),
      (3L, ts(0), "view"), (3L, ts(5), "click"), (3L, ts(30), "purchase"),
      (4L, ts(0), "view"))
      .toDF("user_id", "ts", "event_type")
    val out = Funnel.conversionLatency(e, "user_id", "ts", "event_type",
      Seq("view", "click", "purchase")).collect()
    assert(out.length == 1)
    val r = out.head
    val minuteUs = 60L * 1000000L
    assert(r.getAs[Long]("n_converted") == 3L)
    assert(r.getAs[Long]("min_us") == 10L * minuteUs)
    // median = rank ceil(3/2) = 2 -> 20 min; p90 = rank ceil(27/10) = 3 -> 30
    assert(r.getAs[Long]("median_us") == 20L * minuteUs)
    assert(r.getAs[Long]("p90_us") == 30L * minuteUs)
    assert(r.getAs[Long]("max_us") == 30L * minuteUs)
    // nobody converts -> EMPTY frame (no median of nothing), never a throw
    val stuck = Seq((1L, ts(0), "view")).toDF("user_id", "ts", "event_type")
    assert(Funnel.conversionLatency(stuck, "user_id", "ts", "event_type",
      Seq("view", "click", "purchase")).count() == 0L)
  }

  test("whole funnel rides ONE exchange on the user key") {
    val plan = Funnel.userSteps(events, "user_id", "ts", "event_type",
      Seq("view", "click", "purchase")).queryExecution.executedPlan.toString
    val nShuffles = "Exchange hashpartitioning".r.findAllIn(plan).length
    assert(nShuffles == 1, s"expected 1 exchange, got $nShuffles:\n$plan")
  }
}
