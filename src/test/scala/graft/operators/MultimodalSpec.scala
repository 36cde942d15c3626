package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  test("binary plumbing: bytes survive, stub meta is deterministic") {
    val df = Multimodal.withBinary(Seq((1L, "hello")).toDF("doc_id", "text"), "text")
    val meta = Multimodal.stubDecodeMeta(df, "doc_id").collect()(0)
    assert(meta.getAs[Long]("n_bytes") == 5L)
    assert(meta.getAs[Long]("width") == 64 + 5 % 577)
    assert(meta.getAs[Long]("height") == 64 + (5 * 31) % 577)
    assert(meta.getAs[Long]("frames") == 1 + 5 % 7)
  }

  test("stubFrameFeatures samples every stride-th byte into an array column") {
    val df = Multimodal.withBinary(Seq((1L, "abcdef")).toDF("doc_id", "text"), "text")
    val r = Multimodal.stubFrameFeatures(df, "doc_id", stride = 2).collect()(0)
    val feats = r.getSeq[String](1)
    assert(feats.length == 3) // bytes 1,3,5 of 6
  }

  test("mapPartitions batch kernel agrees with the expression stub") {
    val d = Multimodal.withBinary(
      graft.core.Tables.documents(spark, sf).limit(50), "text")
    val exprSide = Multimodal.stubDecodeMeta(d, "doc_id")
      .orderBy($"id").collect().map(r => (r.getAs[Long]("id"), r.getAs[Long]("width")))
    val kernelSide = Multimodal.mapPartitionsDecode(spark, d, "doc_id")
      .collect().map(m => (m.id, m.width.toLong)).sortBy(_._1)
    assert(exprSide.toSeq == kernelSide.toSeq)
  }
}
