package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class AsOfJoinSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  test("asOf picks the latest right row at-or-before each left timestamp") {
    val events = Seq(
      (1L, 10L, ts("2024-01-01 10:00:00")),
      (2L, 10L, ts("2024-01-03 10:00:00")),
      (3L, 10L, ts("2023-12-01 10:00:00")), // before any price -> null
      (4L, 20L, ts("2024-01-02 00:00:00"))
    ).toDF("event_id", "uid", "ts")
    val prices = Seq(
      (10L, ts("2024-01-01 00:00:00"), 100.0),
      (10L, ts("2024-01-02 00:00:00"), 200.0),
      (20L, ts("2024-01-02 00:00:00"), 55.0) // exactly simultaneous: inclusive
    ).toDF("uid", "pts", "price")

    val out = AsOfJoin.asOf(events, prices, "uid", "uid", "ts", "pts", Seq("price"))
      .select("event_id", "price").collect().map(r =>
        r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getDouble(1)))).toMap
    assert(out(1L) == Some(100.0))
    assert(out(2L) == Some(200.0))
    assert(out(3L) == None)
    assert(out(4L) == Some(55.0)) // ts == pts counts (<= bound)
  }

  test("a null value in the latest right row surfaces as null, not the previous row's value") {
    val events = Seq(
      (1L, 10L, ts("2024-01-03 10:00:00")) // latest price row holds a NULL
    ).toDF("event_id", "uid", "ts")
    val prices = Seq(
      (10L, ts("2024-01-01 00:00:00"), Some(100.0), "a"),
      (10L, ts("2024-01-02 00:00:00"), None, "b") // latest; price is null
    ).toDF("uid", "pts", "price", "tag")
    val row = AsOfJoin.asOf(events, prices, "uid", "uid", "ts", "pts",
      Seq("price", "tag")).select("price", "tag").collect()(0)
    assert(row.isNullAt(0), "latest row's null must NOT be patched by an older row")
    assert(row.getString(1) == "b")
  }

  test("forward direction picks the earliest at-or-after row; tolerance nulls far matches") {
    val events = Seq(
      (1L, 10L, ts("2024-01-01 10:00:00")), // next price at 12:00 (inclusive >= picks 12:00? no -> earliest AFTER-or-at 10:00 is 12:00)
      (2L, 10L, ts("2024-01-01 12:00:00")), // simultaneous: inclusive
      (3L, 10L, ts("2024-01-01 23:00:00"))  // nothing after
    ).toDF("event_id", "uid", "ts")
    val prices = Seq(
      (10L, ts("2024-01-01 12:00:00"), 100.0),
      (10L, ts("2024-01-01 14:00:00"), 200.0)
    ).toDF("uid", "pts", "price")

    val fwd = AsOfJoin.asOf(events, prices, "uid", "uid", "ts", "pts", Seq("price"),
      direction = "forward")
      .select("event_id", "price").collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getDouble(1)))).toMap
    assert(fwd(1L) == Some(100.0)) // earliest at-or-after, not latest
    assert(fwd(2L) == Some(100.0)) // ts == pts counts (inclusive)
    assert(fwd(3L) == None)

    val tol = AsOfJoin.asOf(events, prices, "uid", "uid", "ts", "pts", Seq("price"),
      direction = "forward", toleranceMicros = Some(3600L * 1000000)) // 1 hour
      .select("event_id", "price").collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getDouble(1)))).toMap
    assert(tol(1L) == None)        // 2h gap exceeds tolerance -> nulled
    assert(tol(2L) == Some(100.0)) // 0 gap within tolerance
  }

  test("all left rows survive (left-join semantics), keys don't leak") {
    val left = Seq((1L, 99L, ts("2024-01-01 00:00:00"))).toDF("id", "k", "t")
    val right = Seq((1L, ts("2024-01-01 00:00:00"), 1.0)).toDF("k", "t2", "v")
    val out = AsOfJoin.asOf(left, right, "k", "k", "t", "t2", Seq("v"))
    assert(out.count() == 1)
    assert(out.columns.toSeq == Seq("id", "k", "t", "v"))
    assert(out.collect()(0).isNullAt(3)) // key 99 has no right rows
  }

  test("nearest picks the closer side, resolves ties backward, and costs ONE window stage") {
    val events = Seq(
      (1L, 10L, ts("2024-01-01 10:00:00")), // prev 09:00, next 10:30 -> next
      (2L, 10L, ts("2024-01-01 11:00:00")), // prev 10:30, next 13:00 -> prev
      (3L, 10L, ts("2024-01-01 08:00:00")), // nothing before -> next (09:00)
      (4L, 20L, ts("2024-01-01 12:00:00")), // nothing after -> prev (11:00)
      (5L, 30L, ts("2024-01-01 12:00:00")), // exact match -> gap 0
      (6L, 40L, ts("2024-01-01 12:00:00")), // equidistant -> backward wins
      (7L, 99L, ts("2024-01-01 12:00:00"))  // keyless -> null
    ).toDF("event_id", "uid", "ts")
    val refs = Seq(
      (10L, ts("2024-01-01 09:00:00"), "a"),
      (10L, ts("2024-01-01 10:30:00"), "b"),
      (10L, ts("2024-01-01 13:00:00"), "c"),
      (20L, ts("2024-01-01 11:00:00"), "d"),
      (30L, ts("2024-01-01 12:00:00"), "e"),
      (40L, ts("2024-01-01 11:30:00"), "f"),
      (40L, ts("2024-01-01 12:30:00"), "g")
    ).toDF("uid", "rts", "tag")
    val df = AsOfJoin.nearest(events, refs, "uid", "uid", "ts", "rts", Seq("tag"))
    val out = df.select("event_id", "tag").collect()
      .map(r => r.getLong(0) -> Option(r.getString(1))).toMap
    assert(out == Map(1L -> Some("b"), 2L -> Some("b"), 3L -> Some("a"),
      4L -> Some("d"), 5L -> Some("e"), 6L -> Some("f"), 7L -> None))
    // both carries share one exchange and one sort: a single Window node
    val p = df.queryExecution.executedPlan.toString
    assert("Window ".r.findAllIn(p).length == 1, p)
  }
}
