package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (point-in-time) join: for each left row, the nearest right row on
  * the same key — backward (most recent `rightTs <= leftTs`, the default)
  * or forward (earliest `rightTs >= leftTs`), optionally bounded by a
  * tolerance (a match farther than `toleranceMicros` from the left
  * timestamp surfaces as null). The temporal-join primitive the reference
  * lacks entirely but every event/feature pipeline needs.
  *
  * Implementation is the union+window pattern, not a per-key subquery:
  * tag both sides, union, sort within each key by (ts, side), and carry the
  * last-seen right values with `last(..., ignoreNulls=true)` (time-reversed
  * ordering for the forward direction). Cost is ONE shuffle of left+right
  * by key and a per-key sort — the same complexity as a sort-merge join,
  * with no range-explosion, so it holds at 100 TB (contrast a theta-join
  * `l.ts >= r.ts`, which Spark plans as a broadcast-nested-loop). The
  * tolerance is a post-carry null-out, not a join predicate — zero extra
  * cost.
  *
  * The right side must be unique per (key, ts) — enforce upstream (e.g.
  * keep max-id per timestamp) or the "nearest" row is undefined; this
  * mirrors DuckDB/pandas ASOF semantics which are likewise arbitrary under
  * ties. Right value columns MAY be null: the carry moves ONE struct of all
  * right values per right row (a struct with null fields is itself
  * non-null), so the nearest right row's values surface verbatim — a
  * per-column `last(_, ignoreNulls)` carry would instead resurrect a
  * FARTHER row's value wherever the nearest row holds a null.
  */
object AsOfJoin {

  def asOf(
      left: DataFrame,
      right: DataFrame,
      leftKey: String,
      rightKey: String,
      leftTs: String,
      rightTs: String,
      rightValues: Seq[String],
      direction: String = "backward",
      toleranceMicros: Option[Long] = None): DataFrame = {
    require(direction == "backward" || direction == "forward",
      s"direction must be 'backward' or 'forward', got '$direction'")
    val rvType = org.apache.spark.sql.types.StructType(
      right.schema(right.schema.fieldIndex(rightTs)).copy(name = "__rts") +:
        rightValues.map(c => right.schema(right.schema.fieldIndex(c)).copy(name = c)))
    val leftCols = left.columns
    val unioned = EtlOps.unionPages(Seq(
      left.select(
        (Seq(col(leftKey).as("__k"), col(leftTs).as("__t"),
          lit(0).as("__side"), // left sorts after right at equal ts
          lit(null).cast(rvType).as("__rv")) ++
          leftCols.map(col)): _*),
      right.select(
        (Seq(col(rightKey).as("__k"), col(rightTs).as("__t"),
          lit(1).as("__side"),
          struct(col(rightTs).as("__rts") +: rightValues.map(col): _*).as("__rv")) ++
          leftCols.map(c => lit(null).cast(left.schema(c).dataType).as(c))): _*)))

    // Right rows (side=1) sort BEFORE left rows at the same timestamp in
    // traversal order, so an exactly-simultaneous right row is visible to
    // the left row (inclusive bound in both directions). Backward walks
    // time ascending; forward walks it descending, making "last seen" the
    // EARLIEST right row at-or-after the left timestamp.
    val tOrder = if (direction == "backward") col("__t").asc else col("__t").desc
    val w = Window.partitionBy(col("__k"))
      .orderBy(tOrder, col("__side").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    val micros: Column => Column = c => unix_micros(c.cast("timestamp"))
    val withinTol: Column = toleranceMicros match {
      case None => lit(true)
      case Some(tol) =>
        val gap =
          if (direction == "backward") micros(col(leftTs)) - micros(col("__last")("__rts"))
          else micros(col("__last")("__rts")) - micros(col(leftTs))
        gap <= tol
    }
    unioned
      .withColumn("__last", last(col("__rv"), ignoreNulls = true).over(w))
      .filter(col("__side") === 0)
      .select(leftCols.toIndexedSeq.map(col) ++
        rightValues.map(c => when(withinTol, col("__last")(c)).as(c)): _*)
  }

  /** NEAREST-timestamp join: for each left row, the same-key right row with
    * the minimum |leftTs - rightTs| in EITHER direction (ties, including an
    * exact-timestamp match, resolve backward) — sensor alignment and
    * closest-reading enrichment, where backward-only as-of picks a stale
    * reading when a near-simultaneous later one exists.
    *
    * Same merged-stream machinery and cost as [[asOf]], with BOTH carries
    * from ONE exchange and ONE per-key sort: the backward carry is
    * `last(..., ignoreNulls)` over the ascending frame, the forward carry
    * is `first(..., ignoreNulls)` over the following frame of the SAME sort
    * — Spark plans the two frames in a single Window stage, so nearest
    * costs exactly what one-directional as-of costs.
    */
  def nearest(
      left: DataFrame,
      right: DataFrame,
      leftKey: String,
      rightKey: String,
      leftTs: String,
      rightTs: String,
      rightValues: Seq[String]): DataFrame = {
    val rvType = org.apache.spark.sql.types.StructType(
      right.schema(right.schema.fieldIndex(rightTs)).copy(name = "__rts") +:
        rightValues.map(c => right.schema(right.schema.fieldIndex(c)).copy(name = c)))
    val leftCols = left.columns
    val unioned = EtlOps.unionPages(Seq(
      left.select(
        (Seq(col(leftKey).as("__k"), col(leftTs).as("__t"),
          lit(0).as("__side"),
          lit(null).cast(rvType).as("__rv")) ++
          leftCols.map(col)): _*),
      right.select(
        (Seq(col(rightKey).as("__k"), col(rightTs).as("__t"),
          lit(1).as("__side"),
          struct(col(rightTs).as("__rts") +: rightValues.map(col): _*).as("__rv")) ++
          leftCols.map(c => lit(null).cast(left.schema(c).dataType).as(c))): _*)))

    // One sort order serves both directions: at an equal timestamp the
    // right row sorts before the left row, so it lands in the BACKWARD
    // frame (gap 0 — wins every tie) and stays out of the strictly-after
    // forward frame.
    val wB = Window.partitionBy(col("__k"))
      .orderBy(col("__t").asc, col("__side").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wF = Window.partitionBy(col("__k"))
      .orderBy(col("__t").asc, col("__side").desc)
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val micros: Column => Column = c => unix_micros(c.cast("timestamp"))
    val chosen = {
      val prev = col("__prev")
      val next = col("__next")
      when(prev.isNull, next)
        .when(next.isNull, prev)
        .when(micros(next("__rts")) - micros(col(leftTs)) <
          micros(col(leftTs)) - micros(prev("__rts")), next)
        .otherwise(prev)
    }
    unioned
      .withColumn("__prev", last(col("__rv"), ignoreNulls = true).over(wB))
      .withColumn("__next", first(col("__rv"), ignoreNulls = true).over(wF))
      .filter(col("__side") === 0)
      .select(leftCols.toIndexedSeq.map(col) ++
        rightValues.map(c => chosen(c).as(c)): _*)
  }
}
