package graft.operators

import graft.SparkSpec

class RangeJoinSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)
  private val H = 3600L * 1000000 // one hour in micros

  test("matches the naive range predicate exactly, including band-boundary points") {
    val points = Seq(
      (1L, ts("2024-01-01 00:00:00")), // == interval 10 start: included
      (2L, ts("2024-01-01 02:00:00")), // == interval 10 END: excluded there, inside 11
      (3L, ts("2024-01-01 01:30:00")), // inside two overlapping intervals
      (4L, ts("2024-01-02 12:00:00"))  // inside nothing
    ).toDF("pid", "pts")
    val intervals = Seq(
      (10L, ts("2024-01-01 00:00:00"), ts("2024-01-01 02:00:00")),
      (11L, ts("2024-01-01 01:00:00"), ts("2024-01-01 03:00:00")),
      (12L, ts("2024-01-03 00:00:00"), ts("2024-01-03 01:00:00"))
    ).toDF("iid", "istart", "iend")

    // band width deliberately SMALLER than interval spans (forces replication)
    val got = RangeJoin.bandedRangeJoin(points, intervals, "pts", "istart", "iend",
      bandMicros = H / 2)
      .select("pid", "iid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val naive = points.join(intervals,
      $"pts" >= $"istart" && $"pts" < $"iend")
      .select("pid", "iid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == naive)
    assert(got == Set((1L, 10L), (2L, 11L), (3L, 10L), (3L, 11L)))
  }

  test("no duplicate pairs when an interval spans many bands") {
    val points = Seq((1L, ts("2024-01-01 05:00:00"))).toDF("pid", "pts")
    val intervals = Seq((9L, ts("2024-01-01 00:00:00"), ts("2024-01-02 00:00:00")))
      .toDF("iid", "istart", "iend")
    val out = RangeJoin.bandedRangeJoin(points, intervals, "pts", "istart", "iend",
      bandMicros = H) // 24 bands per interval
    assert(out.count() == 1)
  }

  test("overlapping column names are rejected up front") {
    val a = Seq((1L, ts("2024-01-01 00:00:00"))).toDF("id", "t")
    val b = Seq((1L, ts("2024-01-01 00:00:00"), ts("2024-01-02 00:00:00")))
      .toDF("id", "s", "e")
    val ex = intercept[IllegalArgumentException](
      RangeJoin.bandedRangeJoin(a, b, "t", "s", "e", H))
    assert(ex.getMessage.contains("disjoint"))
  }
}
