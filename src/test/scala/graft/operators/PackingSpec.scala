package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class PackingSpec extends SparkSpec {
  import spark.implicits._

  test("pack assignment equals the naive single-window prefix sum") {
    // uneven token counts, ids with gaps, enough rows to span buckets
    val docs = (0 until 500).filter(_ % 3 != 1)
      .map(i => (i.toLong, (i * 7 % 90 + 1).toLong)).toDF("id", "toks")
    val packed = Packing.assignPacks(spark, docs, "id", "toks", packSize = 128,
      buckets = 8)
      .select("id", "start_offset", "pack_id", "offset_in_pack")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap

    val naive = docs.orderBy("id").collect()
      .scanLeft((0L, 0L, 0L)) { case ((_, _, acc), r) =>
        (r.getLong(0), acc, acc + r.getLong(1))
      }.drop(1).map { case (id, start, _) =>
        id -> ((start, start / 128, start % 128))
      }.toMap
    assert(packed == naive)
  }

  test("layout invariants: offsets are contiguous and pack-local offsets in range") {
    val docs = (0 until 100).map(i => (i.toLong, (i % 13 + 1).toLong)).toDF("id", "toks")
    val out = Packing.assignPacks(spark, docs, "id", "toks", packSize = 64, buckets = 4)
      .orderBy("id").collect()
    var expected = 0L
    out.foreach { r =>
      assert(r.getAs[Long]("start_offset") == expected)
      assert(r.getAs[Long]("offset_in_pack") >= 0 &&
        r.getAs[Long]("offset_in_pack") < 64)
      assert(r.getAs[Long]("pack_id") == r.getAs[Long]("start_offset") / 64)
      expected += r.getAs[Long]("toks")
    }
  }

  test("bucket count never changes the layout (partitioning-independence)") {
    val docs = (0 until 300).map(i => (i.toLong * 3, (i % 11 + 1).toLong)).toDF("id", "toks")
    def layout(buckets: Int) =
      Packing.assignPacks(spark, docs, "id", "toks", packSize = 64, buckets = buckets)
        .select("id", "start_offset", "pack_id").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val one = layout(1)
    assert(layout(7) == one && layout(32) == one)
  }

  test("single row and empty frame") {
    val one = Seq((5L, 10L)).toDF("id", "toks")
    val r = Packing.assignPacks(spark, one, "id", "toks", 16).collect()(0)
    assert(r.getAs[Long]("start_offset") == 0L && r.getAs[Long]("pack_id") == 0L)
    val empty = Seq.empty[(Long, Long)].toDF("id", "toks")
    assert(Packing.assignPacks(spark, empty, "id", "toks", 16).count() == 0)
  }

  test("default bucket count is planner-free session parallelism (no fixed-32 window slice)") {
    val rows = (0 until 4000).map(i => (i.toLong, (i % 9 + 1).toLong))
    def withParts(parts: Int) = spark.createDataFrame(
      spark.sparkContext.parallelize(rows, parts)).toDF("id", "toks")
    // the derived bucket count is the session's declared parallelism —
    // NOT df.rdd.getNumPartitions, which forces a second physical plan of
    // the input just to read a count (r13 ADVICE) — so the per-bucket
    // window-sort slice stays ~corpus/cores at any corpus size
    val expected = math.max(math.max(
      spark.sessionState.conf.numShufflePartitions,
      spark.sparkContext.defaultParallelism), 1)
    assert(Packing.bucketCountFor(withParts(2), 0) == expected)
    assert(Packing.bucketCountFor(withParts(16), 0) == expected)
    assert(Packing.bucketCountFor(withParts(16), 7) == 7) // explicit wins
    // and the auto-derived layout is identical to an explicit-bucket run
    // (bucketing affects only parallelism, never the pack assignment)
    val docs16 = withParts(16)
    val auto = Packing.assignPacks(spark, docs16, "id", "toks", 128)
      .select("id", "start_offset").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val fixed = Packing.assignPacks(spark, docs16, "id", "toks", 128, buckets = 32)
      .select("id", "start_offset").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(auto == fixed)
  }

  test("assignPacksBanded: per-band layouts are independent, bucket-count-invariant, contiguous") {
    val docs = (1L to 300L).map(i => (i, 10L + (i % 5), (i % 3))).toDF("id", "toks", "band")
    val out = Packing.assignPacksBanded(spark, docs, "id", "toks", 64L, "band")
      .select($"id", $"toks", $"band", $"start_offset").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    // within each band: offsets are the exclusive running sum in id order
    out.groupBy(_._3).foreach { case (band, rows) =>
      val sorted = rows.sortBy(_._1)
      val expected = sorted.map(_._2).scanLeft(0L)(_ + _).init
      assert(sorted.map(_._4).toSeq == expected.toSeq, s"band $band")
    }
    // the layout is a pure function of the data — bucket count only
    // changes parallelism
    val by7 = Packing.assignPacksBanded(spark, docs, "id", "toks", 64L, "band", buckets = 7)
      .select($"id", $"start_offset").as[(Long, Long)].collect().toMap
    assert(by7 == out.map(r => r._1 -> r._4).toMap)
    // a doc's pack never depends on other bands: dropping band 2 entirely
    // leaves bands 0/1 byte-identical
    val dropped = Packing.assignPacksBanded(spark,
      docs.filter($"band" =!= 2), "id", "toks", 64L, "band")
      .select($"id", $"start_offset").as[(Long, Long)].collect().toMap
    out.filter(_._3 != 2L).foreach { r => assert(dropped(r._1) == r._4) }
  }

  test("packSpreadReport: banding measurably tightens within-pack length spread") {
    val docs = graft.core.Tables.documents(spark, sf).select($"doc_id",
      TextOps.wsTokenCount($"text").cast("long").as("n_tokens"))
    val global = Packing.assignPacks(spark, docs, "doc_id", "n_tokens", 256L)
    val banded = Packing.assignPacksBanded(spark,
      docs.withColumn("band", least(expr("n_tokens div 32"), lit(3L)).cast("long")),
      "doc_id", "n_tokens", 256L, "band")
    val g = Packing.packSpreadReport(global, "n_tokens", Seq("pack_id"), "global").head
    val b = Packing.packSpreadReport(banded, "n_tokens", Seq("band", "pack_id"), "banded").head
    // the whole point of banding: strictly tighter packs at a comparable
    // pack count (bands only add at most nBands boundary packs)
    assert(b.getAs[Long]("sum_spread") < g.getAs[Long]("sum_spread"),
      s"banded ${b} not tighter than global ${g}")
    assert(math.abs(b.getAs[Long]("n_packs") - g.getAs[Long]("n_packs")) <= 4)
  }
}
