package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Event-log analytics shared by the oracle-checked queries (w4, w12, ts3)
  * and [[graft.apps.EventsApp]] — one expression tree per operator, so the
  * app's numbers ARE the hash-checked ones (the bm25ScoreFrames discipline:
  * shared, not similar).
  *
  * All three are one hash partitioning on their key: gap sessionization and
  * streaks sort each user's (bounded) events/days inside their partition;
  * OHLC is a single map-side-combinable aggregate with struct-key
  * min_by/max_by picks (unique tie column ⇒ deterministic).
  */
object EventOps {

  /** Gap-based sessionization (w4): a session break is a gap > `gapMinutes`
    * between a user's consecutive events (epoch-micros integers — exact);
    * session id = running break count. One row per (user, session) with
    * event count and bounds.
    */
  def sessionize(events: DataFrame, userCol: String, tsCol: String,
                 tieCol: String, gapMinutes: Int = 30): DataFrame = {
    require(gapMinutes >= 1, s"gapMinutes must be >= 1, got $gapMinutes")
    val w = Window.partitionBy(col(userCol)).orderBy(col(tsCol), col(tieCol))
    val run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val gapUs = gapMinutes * 60L * 1000000L
    events
      .withColumn("new_s",
        when(lag(col(tsCol), 1).over(w).isNull ||
          unix_micros(col(tsCol)) - unix_micros(lag(col(tsCol), 1).over(w)) >
            gapUs, 1L).otherwise(0L))
      .withColumn("session_id", sum(col("new_s")).over(run))
      .groupBy(col(userCol), col("session_id"))
      .agg(count(lit(1)).as("n_events"),
        min(col(tsCol)).as("session_start"), max(col(tsCol)).as("session_end"))
  }

  /** Longest activity streak per user (w12, gaps-and-islands): distinct
    * activity dates, island anchor = date − row_number days, per-island
    * length/bounds, best streak by (length desc, start asc).
    */
  def bestStreaks(events: DataFrame, userCol: String, tsCol: String): DataFrame = {
    val w = Window.partitionBy(col(userCol)).orderBy(col("d"))
    val best = Window.partitionBy(col(userCol))
      .orderBy(col("streak_days").desc, col("streak_start"))
    events.select(col(userCol), col(tsCol).cast("date").as("d")).distinct()
      .withColumn("anchor", date_sub(col("d"), row_number().over(w)))
      .groupBy(col(userCol), col("anchor"))
      .agg(count(lit(1)).as("streak_days"), min(col("d")).as("streak_start"),
        max(col("d")).as("streak_end"))
      .withColumn("__rn", row_number().over(best))
      .filter(col("__rn") === 1)
      .select(col(userCol), col("streak_days"), col("streak_start"),
        col("streak_end"))
  }

  /** COHORT RETENTION matrix (the engagement dashboard's other staple
    * beside w12's streaks): users cohorted by FIRST-ACTIVITY date; per
    * (cohort_date, day_offset), how many of that cohort were active
    * day_offset days later. n_active is an exact distinct-user count for
    * free: the base is the DISTINCT (user, date) activity table, so a
    * plain count(*) per (cohort, offset) never double-counts.
    *
    * Scale shape: one (user, date) distinct exchange, then the cohort
    * date is a per-user window MIN on a second user-keyed exchange, then
    * one map-side-combinable count by (cohort, offset) — no self-join of
    * the activity table (the textbook formulation joins activity to
    * itself; this is the same matrix for one join less). Offsets are
    * bounded by the log's day span, so the output is calendar-sized,
    * never data-sized.
    */
  def cohortRetention(events: DataFrame, userCol: String,
                      tsCol: String): DataFrame = {
    val w = Window.partitionBy(col(userCol))
    events.select(col(userCol), col(tsCol).cast("date").as("d")).distinct()
      .withColumn("cohort_date", min(col("d")).over(w))
      .groupBy(col("cohort_date"),
        datediff(col("d"), col("cohort_date")).cast("long").as("day_offset"))
      .agg(count(lit(1)).as("n_active"))
  }

  /** DAU / WAU / MAU stickiness per activity day — the other engagement
    * dashboard staple beside [[cohortRetention]]: for every day with
    * activity, the exact distinct users active that day, in the trailing
    * 7 days, and in the trailing 30 days, plus stickiness = DAU/MAU
    * (round-6, the one float). Exact rolling distincts, not sketches
    * (ax6 is the approximate twin).
    *
    * Scale shape: each distinct (user, day) activity row EXPLODES to the
    * ≤30 future days it supports and the rolling distincts become plain
    * keyed aggregates — a documented constant 30x fan-out of the
    * user-DAY table (already distinct-collapsed, orders of magnitude
    * under the event table), in exchange for ZERO self-joins and no
    * per-day distinct scans. Output is calendar-sized.
    */
  def stickiness(events: DataFrame, userCol: String, tsCol: String): DataFrame = {
    val days = events
      .select(col(userCol).as("__u"), col(tsCol).cast("date").as("d"))
      .distinct()
    def rolling(window: Int, as: String): DataFrame = days
      .select(col("__u"), col("d"),
        explode(sequence(lit(0), lit(window - 1))).as("__o"))
      .withColumn("t", expr("date_add(d, __o)"))
      .select(col("__u"), col("t")).distinct()
      .groupBy(col("t")).agg(count(lit(1)).as(as))
    val dau = days.groupBy(col("d").as("t")).agg(count(lit(1)).as("dau"))
    dau.join(rolling(7, "wau"), Seq("t"))
      .join(rolling(30, "mau"), Seq("t"))
      .select(col("t").as("day"), col("dau"), col("wau"), col("mau"),
        round(col("dau").cast("double") / col("mau").cast("double"), 6)
          .as("stickiness"))
  }

  /** TIME-WEIGHTED average value per key (w13 — the TWAP/sensor-mean
    * every irregular time series needs: a value that held for 50 minutes
    * must outweigh one that held for 10 seconds, which the plain mean
    * gets wrong). Each observation holds until the key's next event
    * (lead); the last observation contributes no duration (its holding
    * period is unobserved — the standard open-interval convention).
    * Weighted sums ride DECIMAL(24,4)·DECIMAL(13,0) products — sized so
    * the (38,4) product is EXACT on both engines (a (25,4)² product
    * exceeds 38 digits and each engine rounds the overflow differently —
    * measured one-ULP drift) — until the ONE final division. Keys with a
    * single event report NULL (zero observed duration). One per-key
    * window pass + one aggregate. Bounds: |value| < 10^20, dur < 10^13 µs
    * (~4 months between a key's consecutive events).
    */
  def twap(events: DataFrame, keyCol: String, tsCol: String, tieCol: String,
           valueCol: String): DataFrame = {
    val decV = org.apache.spark.sql.types.DataTypes.createDecimalType(24, 4)
    val decD = org.apache.spark.sql.types.DataTypes.createDecimalType(13, 0)
    val w = Window.partitionBy(col(keyCol)).orderBy(col(tsCol), col(tieCol))
    events
      .withColumn("__dur",
        unix_micros(lead(col(tsCol), 1).over(w)) - unix_micros(col(tsCol)))
      .groupBy(col(keyCol))
      .agg(count(lit(1)).as("n_events"),
        sum(col("__dur")).as("observed_us"),
        // a NULL value would silently drop its weighted term while its
        // duration still counts in the denominator — fail loud instead
        // (the calibrationBins idiom; codegen'd, free on the valid path)
        sum(when(col(valueCol).isNull,
            raise_error(lit(s"$valueCol contains NULLs — an unobserved " +
              "value has no holding-period weight; filter or fill upstream")))
          .otherwise(col(valueCol).cast(decV)) * col("__dur").cast(decD))
          .as("__wv"))
      .select(col(keyCol), col("n_events"),
        coalesce(col("observed_us"), lit(0L)).as("observed_us"),
        // round(·, 6): DuckDB converts DECIMAL→DOUBLE in two roundings
        // (int128→double, then /10^scale) where the JVM's BigDecimal
        // path rounds once — a measured one-ULP drift the w10 rounding
        // convention absorbs
        when(col("observed_us") > 0L,
          round(col("__wv").cast("double") / col("observed_us").cast("double"),
            6)).as("twap"))
  }

  /** Hourly OHLC bars per key (ts3): open/close = value at the earliest/
    * latest (ts, tie), low/high/count — ONE map-side-combinable aggregate.
    */
  def ohlcBars(events: DataFrame, keyCol: String, tsCol: String,
               tieCol: String, valueCol: String): DataFrame =
    events
      .groupBy(col(keyCol), date_trunc("hour", col(tsCol)).as("hour_start"))
      .agg(
        min_by(col(valueCol), struct(col(tsCol), col(tieCol))).as("open"),
        max_by(col(valueCol), struct(col(tsCol), col(tieCol))).as("close"),
        min(col(valueCol)).as("low"), max(col(valueCol)).as("high"),
        count(lit(1)).as("n"))
}
