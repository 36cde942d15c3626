package graft.apps

import graft.SparkSpec
import org.apache.spark.sql.functions._

class EventsAppSpec extends SparkSpec {

  test("analyze: sections agree with each other and with the fixture") {
    val events = graft.core.Tables.events(spark, sf)
    val (frames, stats) = EventsApp.analyze(spark, events)
    assert(stats.input == events.count())
    assert(stats.badRows == 0L) // driver fixture has no null ts/user
    assert(stats.users == events.select(col("user_id")).distinct().count())
    // sessions: at least one per active user, no more than events
    assert(stats.sessions >= stats.users && stats.sessions <= stats.input)
    assert(frames("sessions").count() == stats.sessions)
    // the funnel is monotone and bounded by the user count
    val f = frames("funnel").orderBy("step")
      .collect().map(_.getAs[Long]("n_users"))
    assert(f.sliding(2).forall(p => p.length < 2 || p(0) >= p(1)))
    assert(stats.viewers == f.head && stats.purchasers == f.last)
    assert(stats.viewers <= stats.users)
    // every active user has a best streak of >= 1 day
    assert(frames("streaks").count() == stats.users)
    assert(stats.maxStreakDays >= 1L)
    // OHLC bars: low <= open/close <= high on every bar
    val bad = frames("ohlc_bars").filter(
      col("low") > col("open") || col("low") > col("close") ||
        col("high") < col("open") || col("high") < col("close")).count()
    assert(bad == 0L)
    assert(stats.saltFactor >= 1L)
  }

  test("load lands each section as a run-date-partitioned table (main's path)") {
    // main itself owns (and stops) a session, so the spec drives the same
    // analyze -> PipelineApps.load composition main runs
    val out = java.nio.file.Files.createTempDirectory("graft_events").toString
    val (frames, _) =
      EventsApp.analyze(spark, graft.core.Tables.events(spark, sf))
    PipelineApps.load(frames, out, java.time.LocalDate.parse("2024-01-02"))
    val sessions = spark.read.parquet(s"$out/sessions")
    assert(sessions.count() > 0)
    assert(sessions.columns.contains("run_date"))
    val skew = spark.read.parquet(s"$out/skew")
    assert(skew.count() == 1)
  }
}
