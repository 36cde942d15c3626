package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Range (interval-containment) join WITHOUT an equi key — `point.ts ∈
  * [start, end)` — the join shape Spark plans as a broadcast-nested-loop or
  * cartesian product, both of which are O(|points| x |intervals|) and
  * unusable at scale.
  *
  * Banding makes it an equi-join: time is cut into `bandMicros`-wide bands,
  * each point hashes to ONE band, each interval is replicated onto every
  * band it overlaps, the join keys on the band id, and the exact range
  * predicate remains as a residual filter. Cost is
  * |points| + sum(interval span / bandWidth) replicated rows through ONE
  * hash shuffle — linear, partitionable, AQE-skew-splittable. Pick
  * `bandMicros` near the typical interval span: each interval then lands on
  * ~2 bands (replication factor ~2) while a band's population stays small
  * enough that the residual filter prunes cheaply.
  *
  * (When one side has an equi key too, prefer a plain join with the range
  * as a residual — see the interval-join query j5. This operator is for the
  * keyless case: sessions vs incidents, price windows vs trades, validity
  * intervals vs observations.)
  */
object RangeJoin {

  /** Inner join of `points` rows to every `intervals` row whose
    * [startCol, endCol) contains pointTs (end-exclusive; both sides
    * timestamps). Column names must be disjoint across the two frames.
    */
  def bandedRangeJoin(points: DataFrame, intervals: DataFrame, pointTs: String,
                      startCol: String, endCol: String,
                      bandMicros: Long): DataFrame = {
    require(bandMicros > 0, s"bandMicros must be positive, got $bandMicros")
    val overlap = points.columns.toSet.intersect(intervals.columns.toSet)
    require(overlap.isEmpty, s"column names must be disjoint, both sides have: $overlap")
    // cast through TIMESTAMP: fixture tables carry TIMESTAMP_NTZ, which
    // unix_micros rejects; the session TZ is pinned UTC so the cast is
    // deterministic
    def micros(c: Column): Column = unix_micros(c.cast("timestamp"))
    def bandOf(c: Column): Column = floor(micros(c) / bandMicros).cast("long")

    val p = points.withColumn("__band", bandOf(col(pointTs)))
    // an interval [s, e) overlaps bands floor(s/W) .. floor((e-1us)/W);
    // sequence is inclusive on both ends. Degenerate intervals (e <= s)
    // can match nothing but WOULD make sequence run backwards (Spark infers
    // step -1 when start > stop), replicating junk rows — drop them first.
    val i = intervals
      .filter(col(endCol) > col(startCol))
      .withColumn("__band",
        explode(sequence(bandOf(col(startCol)),
          floor((micros(col(endCol)) - 1) / bandMicros).cast("long"))))
    p.join(i, Seq("__band"))
      .filter(col(pointTs) >= col(startCol) && col(pointTs) < col(endCol))
      .drop("__band")
  }
}
