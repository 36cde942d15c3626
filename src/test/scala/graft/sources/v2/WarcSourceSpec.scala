package graft.sources.v2

import graft.SparkSpec
import org.apache.spark.sql.execution.ExplainMode
import org.apache.spark.sql.functions._

class WarcSourceSpec extends SparkSpec {

  private def utf8(s: String) = s.getBytes(java.nio.charset.StandardCharsets.UTF_8)

  private def records(n: Int): Seq[WarcIo.Record] = (0 until n).map { i =>
    WarcIo.Record(s"https://h$i.example.com/p$i", s"2024-02-0${i % 9 + 1}T00:00:00Z",
      if (i % 2 == 0) "response" else "conversion", "text/plain",
      utf8(s"payload body $i with\r\nCRLF and WARC/1.0 look-alikes inside"))
  }

  private def writeDir(recs: Seq[WarcIo.Record], gzip: Boolean,
                       shards: Int = 2): String = {
    val dir = java.nio.file.Files.createTempDirectory("graft-warc-spec").toString
    val ext = if (gzip) "warc.gz" else "warc"
    (0 until shards).foreach { s =>
      WarcIo.write(s"$dir/part-$s.$ext",
        recs.zipWithIndex.collect { case (r, i) if i % shards == s => r }, gzip)
    }
    dir
  }

  private def readBack(dir: String) =
    spark.read.format("graft-warc").load(dir)
      .select(col("url"), col("warc_date"), col("record_type"), col("mime"),
        col("content_length"), col("payload"))
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2), r.getString(3),
        r.getLong(4), new String(r.getAs[Array[Byte]](5),
          java.nio.charset.StandardCharsets.UTF_8)))
      .sortBy(_._1)

  test("round-trip: plain and multi-member-gzip files parse to identical records") {
    val recs = records(10)
    val expected = recs.map(r => (r.url, r.date, r.recordType, r.mime,
      r.payload.length.toLong, new String(r.payload,
        java.nio.charset.StandardCharsets.UTF_8))).sortBy(_._1)
    assert(readBack(writeDir(recs, gzip = false)).toSeq == expected)
    assert(readBack(writeDir(recs, gzip = true)).toSeq == expected)
    // the gzip fixture genuinely is multi-member: one magic per record
    val gz = java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(
      writeDir(recs, gzip = true, shards = 1) + "/part-0.warc.gz"))
    val magics = gz.sliding(3).count(w =>
      (w(0) & 0xFF) == 0x1F && (w(1) & 0xFF) == 0x8B && w(2) == 8)
    assert(magics >= recs.length, s"expected one gzip member per record, saw $magics")
  }

  test("payload-boundary exactness: CRLFs and version-line look-alikes inside payloads") {
    // records(n) payloads embed "\r\nWARC/1.0" — only Content-Length framing
    // survives this; any delimiter-scanning parser would split early
    val got = readBack(writeDir(records(6), gzip = true))
    assert(got.forall(_._6.contains("WARC/1.0 look-alikes")))
  }

  test("column pruning reaches the source; payload skip composes with type filter") {
    val dir = writeDir(records(8), gzip = true)
    val pruned = spark.read.format("graft-warc").load(dir)
      .filter(col("record_type") === "response")
      .select("url", "content_length")
    val plan = pruned.queryExecution.explainString(ExplainMode.fromString("formatted"))
    // record_type rides along for Spark's residual IsNotNull filter (only
    // EqualTo is pushed — ADVICE r18 #1); the point is PAYLOAD never does
    assert(plan.contains("pruned to [url,record_type,content_length]"), plan)
    assert(!plan.contains("payload"), plan)
    assert(plan.contains("pushed [record_type = response]"), plan)
    assert(pruned.collect().length == 4)
  }

  test("exportCorpus: executor-parallel shards round-trip; re-export is byte-idempotent") {
    import spark.implicits._
    val rows = (0 until 24).map(i => (s"https://h.example.com/p$i",
      "2024-03-01T00:00:00Z", "response", "text/plain",
      utf8(s"payload $i")))
    val df = rows.toDF("url", "warc_date", "record_type", "mime", "payload")
      .repartitionByRange(3, col("url")).sortWithinPartitions("url")
    val dir = java.nio.file.Files.createTempDirectory("graft-warc-export").toString
    WarcIo.exportCorpus(df, dir, "url", "warc_date", "record_type", "mime",
      "payload", gzip = true, cdx = true)
    val shards = new java.io.File(dir).list().filter(_.endsWith(".warc.gz")).sorted
    assert(shards.length == 3, shards.toSeq)
    val back = spark.read.format("graft-warc").load(dir)
      .select("url", "payload").collect()
      .map(r => r.getString(0) -> new String(r.getAs[Array[Byte]](1),
        java.nio.charset.StandardCharsets.UTF_8)).sortBy(_._1)
    assert(back.toSeq == rows.map(r => r._1 -> s"payload ${r._1.drop(23).toInt}")
      .sortBy(_._1))
    // the export's streamed-member CDX sidecars round-trip through the
    // seek path byte-identically to the scan path
    val viaCdx = spark.read.format("graft-warc").option("cdx", "true").load(dir)
      .select("url", "payload").collect()
      .map(r => r.getString(0) -> new String(r.getAs[Array[Byte]](1),
        java.nio.charset.StandardCharsets.UTF_8)).sortBy(_._1)
    assert(viaCdx.toSeq == back.toSeq)
    // idempotence: a "retried" export (same deterministic partitioning)
    // atomically replaces each shard with identical bytes
    val before = shards.map(f => java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(dir, f)).toSeq)
    WarcIo.exportCorpus(df, dir, "url", "warc_date", "record_type", "mime",
      "payload", gzip = true)
    val after = shards.map(f => java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(dir, f)).toSeq)
    assert(before.toSeq == after.toSeq, "re-export must be byte-identical")
  }

  test("IsNotNull(record_type) stays a residual: typeless records are filtered, not returned") {
    // the reader tolerates records with no WARC-Type header (recType null);
    // accepting IsNotNull as fully pushed would silently RETURN those rows
    // on a bare `record_type IS NOT NULL` scan (ADVICE r18 #1)
    val dir = java.nio.file.Files.createTempDirectory("graft-warc-nn").toString
    WarcIo.write(s"$dir/part-0.warc", Seq(
      WarcIo.Record("https://x/typed", "2024-01-01T00:00:00Z", "response",
        "text/plain", utf8("a")),
      WarcIo.Record("https://x/typeless", "2024-01-01T00:00:00Z", null,
        "text/plain", utf8("b"))), gzip = false)
    val df = spark.read.format("graft-warc").load(dir)
    assert(df.count() == 2)
    val nn = df.filter(col("record_type").isNotNull)
    assert(nn.collect().map(_.getAs[String]("url")).toSeq == Seq("https://x/typed"))
    // and the plan must NOT claim the filter was pushed into the source
    val plan = nn.queryExecution.explainString(ExplainMode.fromString("formatted"))
    assert(!plan.contains("pushed [record_type"), plan)
  }

  test("CDX seek path: same rows, planning-time type pruning reads strictly fewer bytes, big files split") {
    // payload-heavy NON-matching records: the seek path must never touch
    // their compressed ranges, so raw bytes read collapses to ~the
    // response members + nothing else (warc2's scan path pays the lot)
    val rnd = new scala.util.Random(7)
    def blob(n: Int): Array[Byte] = { val b = new Array[Byte](n); rnd.nextBytes(b); b }
    val recs = (0 until 16).map { i =>
      if (i % 4 == 0)
        WarcIo.Record(s"https://h/doc/$i", "2024-01-01T00:00:00Z", "response",
          "text/html", utf8(s"small body $i"))
      else
        WarcIo.Record(s"https://h/doc/$i", "2024-01-01T00:00:00Z", "conversion",
          "text/plain", blob(100_000)) // incompressible: gzip keeps ~100 KB
    } :+ WarcIo.Record("https://h/doc/99", "2024-01-01T00:00:00Z", null,
      "text/plain", utf8("typeless — CDX '-' row, reader must re-verify"))
    val dir = java.nio.file.Files.createTempDirectory("graft-warc-cdx").toString
    WarcIo.write(s"$dir/part-0.warc.gz", recs, gzip = true, cdx = true)
    def responses(cdx: Boolean): (Seq[String], Long) = {
      WarcIo.bytesRead.set(0L)
      val df = spark.read.format("graft-warc")
        .option("cdx", cdx.toString).load(dir)
        .filter(col("record_type") === "response").select("url")
      val rows = df.collect().map(_.getString(0)).sorted.toSeq
      (rows, WarcIo.bytesRead.get())
    }
    val (scanRows, scanBytes) = responses(cdx = false)
    val (seekRows, seekBytes) = responses(cdx = true)
    assert(scanRows == seekRows, "the index must not change answers")
    assert(scanRows.length == 4)
    // scan path gunzips the whole ~1.2 MB file; seek path reads only the
    // 4 small response members (the typeless '-' row is read and then
    // re-verified away record-level)
    assert(scanBytes > 1000000L, s"scan read $scanBytes")
    assert(seekBytes < scanBytes / 100, s"seek read $seekBytes of $scanBytes")
    // the typeless record IS served when no type filter is pushed
    val all = spark.read.format("graft-warc").option("cdx", "true").load(dir)
    assert(all.count() == 17)
    assert(all.filter(col("record_type").isNotNull).count() == 16)
    // big files split: a tiny run target yields many member-run partitions
    val split = spark.read.format("graft-warc").option("cdx", "true")
      .option("cdx_target_bytes", "200000").load(dir)
    assert(split.rdd.getNumPartitions >= 5, s"${split.rdd.getNumPartitions}")
    assert(split.count() == 17)
    // the plan names the access path (PLANS.md evidence)
    val plan = all.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    assert(plan.contains("cdx-indexed"), plan)
    // fail-loud: cdx=true without a sidecar must not silently full-scan
    val bare = java.nio.file.Files.createTempDirectory("graft-warc-nocdx").toString
    WarcIo.write(s"$bare/part-0.warc.gz", recs.take(2), gzip = true)
    intercept[Exception] {
      spark.read.format("graft-warc").option("cdx", "true").load(bare).count()
    }
  }

  test("malformed framing fails loudly: truncated payload, missing Content-Length") {
    val dir = java.nio.file.Files.createTempDirectory("graft-warc-bad").toString
    val good = WarcIo.Record("https://x/1", "2024-01-01T00:00:00Z",
      "response", "text/plain", utf8("twelve bytes"))
    // truncated: frame claims 12 payload bytes, file ends after 4
    val framed = {
      val tmp = dir + "/whole.warc"
      WarcIo.write(tmp, Seq(good), gzip = false)
      java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(tmp))
    }
    java.nio.file.Files.write(java.nio.file.Paths.get(dir + "/cut.warc"),
      framed.dropRight(12)) // cuts into the payload
    java.nio.file.Files.delete(java.nio.file.Paths.get(dir + "/whole.warc"))
    val e1 = intercept[org.apache.spark.SparkException] {
      spark.read.format("graft-warc").load(dir + "/cut.warc").collect()
    }
    assert(e1.getMessage != null)
    // missing Content-Length
    java.nio.file.Files.write(java.nio.file.Paths.get(dir + "/nolen.warc"),
      utf8("WARC/1.0\r\nWARC-Type: response\r\n\r\nbody\r\n\r\n"))
    val e2 = intercept[org.apache.spark.SparkException] {
      spark.read.format("graft-warc").load(dir + "/nolen.warc").collect()
    }
    assert(e2.getMessage.contains("Content-Length") ||
      e2.getCause != null && String.valueOf(e2.getCause.getMessage).contains("Content-Length"))
  }
}
