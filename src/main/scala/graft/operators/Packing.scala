package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence packing for training-batch construction: documents are laid out
  * in a deterministic order (`orderCol` asc) and concatenated into
  * fixed-size context windows of `packSize` tokens; each document is
  * assigned the pack containing its FIRST token (the GPT-style
  * concatenate-then-chunk layout — a document crossing a boundary spills
  * into the next pack, it is not moved). No reference analogue; this is the
  * batch-construction step between a cleaned corpus and a trainer.
  *
  * Scale shape: the global running token sum is order-DEPENDENT but not
  * inherently serial. A naive single `Window.orderBy` pulls the whole corpus
  * through ONE task (the classic global-window bottleneck); here the prefix
  * sum is two-level: value-derived buckets on the order key (deterministic —
  * no spark_partition_id, whose assignment can differ between the two jobs),
  * per-bucket token totals (a `buckets`-row aggregate), a driver-side
  * exclusive scan of those totals (dimension-sized, like any broadcast dim),
  * and a broadcast join back so the within-bucket cumsum runs as a window
  * PARTITIONED BY bucket — every heavy step parallel, serial state = one
  * long per bucket. Integer token counts make every offset engine-exact.
  */
object Packing {

  /** (original columns) + n_tokens via `tokensOf`, start_offset, pack_id,
    * offset_in_pack. `orderCol` must be unique (it defines the layout).
    *
    * `buckets` <= 0 (the default) derives the bucket count from the INPUT's
    * partition count: each window-sort bucket then holds ~one input
    * partition's rows, so the per-task slice stays task-sized at any scale
    * instead of growing as corpus/constant — the layout itself is
    * bucket-count-independent (PackingSpec), so the only effect is
    * parallelism.
    */
  def assignPacks(spark: SparkSession, df: DataFrame, orderCol: String,
                  tokensCol: String, packSize: Long,
                  buckets: Int = 0): DataFrame = {
    require(packSize > 0, s"packSize must be positive, got $packSize")
    val nBuckets = bucketCountFor(df, buckets)
    // value-derived bucket: order keys are range-bucketed by their value so
    // bucket assignment is a pure function of the row, reproducible across
    // the totals job and the cumsum job
    val bounds = df.agg(min(col(orderCol)).cast("long"),
      max(col(orderCol)).cast("long")).head()
    if (bounds.isNullAt(0)) return packColumns(df, lit(0L), packSize) // empty
    val (lo, hi) = (bounds.getLong(0), bounds.getLong(1))
    val width = math.max(1L, (hi - lo) / nBuckets + 1)
    val withBucket = df.withColumn("__bkt",
      ((col(orderCol).cast("long") - lo) / width).cast("long"))

    // per-bucket totals -> exclusive prefix offsets (driver scan of <=
    // `buckets` rows — dimension-sized by construction)
    val totals = withBucket.groupBy(col("__bkt"))
      .agg(sum(col(tokensCol).cast("long")).as("__tot"))
      .collect().map { r =>
        require(!r.isNullAt(0) && !r.isNullAt(1),
          s"$orderCol/$tokensCol contain NULLs — a token-budget packing over them is undefined")
        r.getLong(0) -> r.getLong(1)
      }.sortBy(_._1)
    val offsets = totals.scanLeft((Long.MinValue, 0L)) {
      case ((_, acc), (b, tot)) => (b, acc + tot)
    }.sliding(2).collect { case Array((_, prev), (b, _)) => (b, prev) }.toSeq
    val offsetDf = spark.createDataFrame(offsets).toDF("__bkt", "__base")

    val w = Window.partitionBy(col("__bkt")).orderBy(col(orderCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val withStart = withBucket
      .join(broadcast(offsetDf), Seq("__bkt"))
      .withColumn("__start",
        col("__base") + sum(col(tokensCol).cast("long")).over(w) -
          col(tokensCol).cast("long"))
    packColumns(withStart.drop("__bkt", "__base"), col("__start"), packSize)
      .drop("__start")
  }

  /** LENGTH-BANDED packing: documents are first split into bands (e.g. by
    * token-length quantile or range) and packed INDEPENDENTLY within each
    * band — the batch-construction layout that keeps similar-length
    * documents together, so a pack rarely splices a long-document tail
    * against many short ones (less cross-document attention bleed and less
    * fragmentation at pack boundaries than the single global layout of
    * [[assignPacks]]). `pack_id` is per-band; (band, pack_id) is the
    * training batch key.
    *
    * Same two-level prefix-sum shape, generalized: range buckets nest
    * INSIDE bands, per-(band, bucket) totals aggregate in one pass, the
    * driver scans band-by-band (bands x buckets rows — dimension-sized),
    * and the within-bucket cumsum windows partition by (band, bucket). No
    * single-task window at any band size; serial state is one long per
    * (band, bucket).
    */
  def assignPacksBanded(spark: SparkSession, df: DataFrame, orderCol: String,
                        tokensCol: String, packSize: Long, bandCol: String,
                        buckets: Int = 0): DataFrame = {
    require(packSize > 0, s"packSize must be positive, got $packSize")
    val nBuckets = bucketCountFor(df, buckets)
    val bounds = df.agg(min(col(orderCol)).cast("long"),
      max(col(orderCol)).cast("long")).head()
    if (bounds.isNullAt(0)) return packColumns(df, lit(0L), packSize)
    val (lo, hi) = (bounds.getLong(0), bounds.getLong(1))
    val width = math.max(1L, (hi - lo) / nBuckets + 1)
    val withBucket = df.withColumn("__bkt",
      ((col(orderCol).cast("long") - lo) / width).cast("long"))

    val totals = withBucket.groupBy(col(bandCol).cast("long").as("__band"), col("__bkt"))
      .agg(sum(col(tokensCol).cast("long")).as("__tot"))
      .collect().map { r =>
        require(!r.isNullAt(0) && !r.isNullAt(1) && !r.isNullAt(2),
          s"$bandCol/$orderCol/$tokensCol contain NULLs — a banded packing over them is undefined")
        (r.getLong(0), r.getLong(1), r.getLong(2))
      }
    val offsets = totals.groupBy(_._1).toSeq.flatMap { case (band, rows) =>
      val sorted = rows.sortBy(_._2)
      sorted.map(_._2).zip(
        sorted.map(_._3).scanLeft(0L)(_ + _).init).map { case (b, base) =>
        (band, b, base)
      }
    }
    val offsetDf = spark.createDataFrame(offsets.toSeq)
      .toDF("__band", "__bkt", "__base")

    val w = Window.partitionBy(col("__band"), col("__bkt")).orderBy(col(orderCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val withStart = withBucket
      .withColumn("__band", col(bandCol).cast("long"))
      .join(broadcast(offsetDf), Seq("__band", "__bkt"))
      .withColumn("__start",
        col("__base") + sum(col(tokensCol).cast("long")).over(w) -
          col(tokensCol).cast("long"))
    packColumns(withStart.drop("__bkt", "__base", "__band"),
      col("__start"), packSize)
      .drop("__start")
  }

  /** Pack-homogeneity report: for a packed layout, the per-pack document-
    * length spread (max - min tokens within each pack), summarized as ONE
    * row of exact integers — the measurement behind [[assignPacksBanded]]'s
    * claim (banding packs similar lengths together, so within-pack spread
    * collapses vs the global layout; a PackingSpec test asserts the banded
    * sum is strictly smaller on the fixtures). `packKeys` is the batch key
    * — Seq("pack_id") for the global layout, Seq("band", "pack_id") for
    * the banded one. One aggregation over the packed frame; all integers,
    * so cross-layout comparisons are exact.
    */
  def packSpreadReport(packed: DataFrame, tokensCol: String,
                       packKeys: Seq[String], layout: String): DataFrame =
    packed.groupBy(packKeys.map(col): _*)
      .agg((max(col(tokensCol).cast("long")) - min(col(tokensCol).cast("long")))
        .as("__spread"))
      .agg(count(lit(1)).as("n_packs"), sum(col("__spread")).as("sum_spread"))
      .select(lit(layout).as("layout"), col("n_packs"), col("sum_spread"),
        round(col("sum_spread").cast("double") / col("n_packs"), 6)
          .as("mean_spread"))

  /** Explicit `buckets` if positive, else the session's declared
    * parallelism (planner-free — no `.rdd` physical re-plan just to read a
    * partition count); either way the per-bucket window-sort slice tracks
    * corpus/buckets instead of corpus/constant.
    */
  private[operators] def bucketCountFor(df: DataFrame, buckets: Int): Int =
    if (buckets > 0) buckets else graft.core.BucketMath.defaultBuckets(df)

  private def packColumns(df: DataFrame, start: org.apache.spark.sql.Column,
                          packSize: Long): DataFrame =
    df.withColumn("start_offset", start)
      .withColumn("pack_id", expr(s"start_offset div ${packSize}L"))
      .withColumn("offset_in_pack", col("start_offset") % packSize)
}
