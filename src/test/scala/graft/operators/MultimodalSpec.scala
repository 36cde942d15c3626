package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  test("parseMeta reads a golden hand-assembled PNG header (spec bytes, not encodeMedia)") {
    // PNG signature + IHDR for a 3x2 image, CRC computed independently
    // (python zlib.crc32 over b'IHDR' + data = 0x5b2cca00 for these bytes).
    val sig = Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte)
    val ihdrData = Array[Byte](0, 0, 0, 3, 0, 0, 0, 2, 8, 2, 0, 0, 0)
    val crc = new java.util.zip.CRC32
    crc.update("IHDR".getBytes("US-ASCII")); crc.update(ihdrData)
    val bb = java.nio.ByteBuffer.allocate(33)
    bb.put(sig).putInt(13).put("IHDR".getBytes("US-ASCII")).put(ihdrData)
      .putInt(crc.getValue.toInt)
    assert(Multimodal.parseMeta(bb.array()) == (("png", 3, 2)))
  }

  test("parseMeta rejects corrupt PNG CRC and unknown magic") {
    val good = Multimodal.pngBytes(10, 20, Array[Byte](1, 2, 3))
    val bad = good.clone(); bad(30) = (bad(30) ^ 0x7f).toByte // flip a CRC byte
    intercept[IllegalArgumentException](Multimodal.parseMeta(bad))
    intercept[IllegalArgumentException](Multimodal.parseMeta("not an image".getBytes))
  }

  test("encode/parse round-trip for all three container formats") {
    val payload = "hello media".getBytes("UTF-8")
    assert(Multimodal.parseMeta(Multimodal.pngBytes(640, 480, payload)) == (("png", 640, 480)))
    assert(Multimodal.parseMeta(Multimodal.bmpBytes(1920, 1080, payload)) == (("bmp", 1920, 1080)))
    assert(Multimodal.parseMeta(Multimodal.gifBytes(320, 200, payload)) == (("gif", 320, 200)))
    // payload sits immediately after the fixed-size header
    val png = Multimodal.pngBytes(1, 1, payload)
    assert(png.slice(Multimodal.PngHeaderLen, png.length).sameElements(payload))
  }

  test("attachMedia + decodeMeta recover format and dimensions from real bytes") {
    val df = Seq((0L, "hello"), (1L, "worldly"), (2L, "x")).toDF("doc_id", "text")
    val meta = Multimodal.decodeMeta(spark, Multimodal.attachMedia(spark, df, "doc_id", "text"))
      .collect().sortBy(_.id)
    assert(meta.map(_.format).toSeq == Seq("png", "bmp", "gif"))
    // id=0: payload "hello" (5 bytes) -> png, 33-byte header
    assert(meta(0).n_bytes == 33L + 5L)
    assert(meta(0).width == 64 + (5L * 7919) % 509)
    assert(meta(0).height == 64 + (5L * 104729) % 509)
    assert(meta(1).n_bytes == 54L + 7L)
    assert(meta(2).n_bytes == 13L + 1L)
  }

  test("frameFeatures emits one scalar row per sampled payload byte") {
    val df = Seq((1L, "abcdef")).toDF("doc_id", "text") // id=1 -> bmp
    val rows = Multimodal.frameFeatures(
        Multimodal.attachMedia(spark, df, "doc_id", "text"), stride = 2)
      .orderBy($"pos").collect()
    // payload bytes 1,3,5 of "abcdef" = 'a','c','e' -> hex 61, 63, 65
    assert(rows.map(r => (r.getAs[Long]("pos"), r.getAs[String]("feature"))).toSeq ==
      Seq((1L, "61"), (3L, "63"), (5L, "65")))
  }

  test("decodeMeta over the documents fixture parses every row") {
    val docs = graft.core.Tables.documents(spark, sf).limit(100)
    val meta = Multimodal.decodeMeta(spark, Multimodal.attachMedia(spark, docs, "doc_id", "text"))
    assert(meta.count() == 100)
    assert(meta.filter(_.width >= 64).count() == 100)
  }
}
