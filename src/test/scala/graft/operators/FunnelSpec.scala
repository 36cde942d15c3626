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

  test("whole funnel rides ONE exchange on the user key") {
    val plan = Funnel.userSteps(events, "user_id", "ts", "event_type",
      Seq("view", "click", "purchase")).queryExecution.executedPlan.toString
    val nShuffles = "Exchange hashpartitioning".r.findAllIn(plan).length
    assert(nShuffles == 1, s"expected 1 exchange, got $nShuffles:\n$plan")
  }
}
