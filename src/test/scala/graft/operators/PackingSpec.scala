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

  test("default bucket count scales with input partitions (no fixed-32 window slice)") {
    val rows = (0 until 4000).map(i => (i.toLong, (i % 9 + 1).toLong))
    def withParts(parts: Int) = spark.createDataFrame(
      spark.sparkContext.parallelize(rows, parts)).toDF("id", "toks")
    // the derived bucket count tracks input parallelism, so the per-bucket
    // window-sort slice stays ~one partition's rows at any corpus size
    assert(Packing.bucketCountFor(withParts(2), 0) == 2)
    assert(Packing.bucketCountFor(withParts(16), 0) == 16)
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
}
