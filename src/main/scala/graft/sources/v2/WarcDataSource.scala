package graft.sources.v2

import java.util

import scala.collection.mutable.ArrayBuffer
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources.{DataSourceRegister, EqualTo, Filter}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** DataSource V2 connector for WARC/WET crawl containers (VERDICT r17 ask
  * #4) — the entry format of a 100 TB web pipeline (ISO 28500; Common
  * Crawl's layout): records of the form
  *
  *   WARC/1.0 CRLF (header: value)* CRLF payload[Content-Length] CRLF CRLF
  *
  * parsed into (url, warc_date, record_type, mime, content_length,
  * payload binary), after which the existing chain takes over: t25 HTML
  * main-content over payload, d35 URL canonicalization over url, t32
  * unicode fix, the dedup ladder.
  *
  * Partitioning: one InputPartition PER FILE. A .warc.gz is a
  * CONCATENATION of gzip members (typically one per record) — readable as
  * one stream (the reader's GZIPInputStream consumes members back to
  * back) but NOT splittable at arbitrary byte offsets without the
  * external CDX/cluster index real crawls ship; with Common Crawl's ~64k
  * ~1 GB files per snapshot, file-granular partitions already saturate
  * thousands of executors, so the index-driven intra-file split is left
  * to the production extension. Uncompressed .warc files follow the same
  * per-file rule for symmetry.
  *
  * Pushdown: required-column pruning reaches the payload — a query that
  * never selects `payload` SKIPS the payload bytes (InputStream.skipNBytes
  * on the decompressed stream) instead of materializing them, which is
  * the difference between a header scan and a full read over 100 TB.
  * record_type equality filters are accepted and enforced record-level,
  * composing with the payload skip (a `record_type = 'response'` scan of
  * a WET file reads headers only).
  *
  * Exactness: Content-Length is authoritative (fail-loud when absent or
  * malformed — a drifted payload boundary silently corrupts every
  * downstream byte); header names are case-insensitive per the spec;
  * header values are UTF-8.
  */
class WarcDataSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "graft-warc"

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    WarcTable.Schema

  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table = {
    require(schema == WarcTable.Schema,
      s"graft-warc has a fixed schema ${WarcTable.Schema.simpleString}")
    new WarcTable(properties)
  }
}

object WarcTable {
  val Schema: StructType = new StructType()
    .add("url", StringType)          // WARC-Target-URI (null on warcinfo)
    .add("warc_date", StringType)    // WARC-Date
    .add("record_type", StringType)  // WARC-Type
    .add("mime", StringType)         // Content-Type
    .add("content_length", LongType)
    .add("payload", BinaryType)
}

final class WarcTable(properties: util.Map[String, String])
    extends Table with SupportsRead {
  private val path = properties.asScala.collectFirst {
    case (k, v) if k.equalsIgnoreCase("path") => v
  }.getOrElse(throw new IllegalArgumentException("graft-warc requires load(path)"))

  override def name(): String = s"graft-warc($path)"
  override def schema(): StructType = WarcTable.Schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new WarcScanBuilder(path, options.getBoolean("cdx", false),
      options.getLong("cdx_target_bytes", 64L << 20))
}

/** @param cdx when set, every warc file must carry a `<file>.cdx` sidecar
  *        (offset/length/type/url/mime per gzip member — the Common Crawl
  *        layout reduced to the fields partition planning needs); planning
  *        then emits MEMBER-RUN partitions that SEEK to the indexed
  *        compressed ranges instead of gunzipping the whole file, drops
  *        members failing the pushed record_type filter WITHOUT reading
  *        them, and splits big files into ~`cdxTargetBytes` runs (the
  *        intra-file parallelism a 1 GB Common Crawl shard wants).
  */
final class WarcScanBuilder(path: String, cdx: Boolean, cdxTargetBytes: Long)
    extends ScanBuilder with SupportsPushDownRequiredColumns
    with SupportsPushDownFilters {

  private var required: StructType = WarcTable.Schema
  private var pushed: Array[Filter] = Array.empty

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    // Only EqualTo is accepted (removed from Spark's residual): the reader
    // enforces exactly that predicate. IsNotNull stays in the residual —
    // the reader tolerates records missing the WARC-Type header (recType
    // null), so accepting IsNotNull would silently RETURN those rows on a
    // bare `record_type IS NOT NULL` scan (ADVICE r18 #1).
    val (accepted, residual) = filters.partition {
      case EqualTo("record_type", _: String) => true
      case _ => false
    }
    pushed = accepted
    residual
  }

  override def pushedFilters(): Array[Filter] = pushed

  private def typeEquals: Option[String] = pushed.collectFirst {
    case EqualTo("record_type", v: String) => v
  }

  override def build(): Scan = new Scan with Batch {
    private val wanted = typeEquals
    override def readSchema(): StructType = required
    override def toBatch: Batch = this
    override def description(): String =
      s"graft-warc $path, pruned to [${required.fieldNames.mkString(",")}]" +
        wanted.map(t => s", pushed [record_type = $t]").getOrElse("") +
        (if (cdx) ", cdx-indexed" else "")

    override def planInputPartitions(): Array[InputPartition] = {
      val p = java.nio.file.Paths.get(path)
      val files =
        if (java.nio.file.Files.isDirectory(p)) {
          val stream = java.nio.file.Files.list(p)
          try stream.toArray.map(_.toString) finally stream.close()
        } else Array(path)
      val warcs = files.filter(f => f.endsWith(".warc") || f.endsWith(".warc.gz") ||
        f.endsWith(".wet") || f.endsWith(".wet.gz")).sorted
      require(warcs.nonEmpty, s"graft-warc: no .warc/.wet files under $path")
      if (!cdx) warcs.map(f => WarcFilePartition(f): InputPartition)
      else warcs.flatMap { f =>
        // CDX sidecar is AUTHORITATIVE under cdx=true: fail loud when
        // missing rather than silently falling back to the full scan the
        // option exists to avoid
        val sidecar = java.nio.file.Paths.get(f + ".cdx")
        require(java.nio.file.Files.exists(sidecar),
          s"graft-warc: cdx=true but no sidecar ${f}.cdx — write it at export " +
            "(WarcIo cdx flag) or drop the option")
        val entries = WarcIo.readCdx(sidecar.toString)
          // planning-time type pruning: non-matching members are never
          // read; '-' (typeless) entries stay — the reader re-verifies
          .filter(e => wanted.forall(t => e.recordType == t || e.recordType == "-"))
        // consecutive members group into ~cdxTargetBytes runs: intra-file
        // parallelism for big shards, few-member runs stay one partition
        val runs = ArrayBuffer.empty[ArrayBuffer[WarcIo.CdxEntry]]
        var runBytes = 0L
        entries.foreach { e =>
          if (runs.isEmpty || runBytes + e.length > cdxTargetBytes) {
            runs += ArrayBuffer.empty; runBytes = 0L
          }
          runs.last += e; runBytes += e.length
        }
        runs.filter(_.nonEmpty).map(r => WarcMemberRunPartition(f,
          r.map(_.offset).toArray, r.map(_.length).toArray): InputPartition)
      }
    }

    override def createReaderFactory(): PartitionReaderFactory =
      new WarcReaderFactory(required, wanted)
  }
}

final case class WarcFilePartition(file: String) extends InputPartition

/** CDX-indexed partition: a run of gzip MEMBERS of one file, addressed by
  * (compressed offset, compressed length) — the reader SEEKS, it never
  * scans. Big files split into as many of these as their CDX yields.
  */
final case class WarcMemberRunPartition(file: String,
    offsets: Array[Long], lengths: Array[Int]) extends InputPartition

/** Streaming WARC record parser over one InputStream — shared by the
  * whole-file scan (multi-member gzip stream) and the CDX member reader
  * (one member's stream at a time). Fail-loud on malformed framing — a
  * tolerated drift here corrupts every later payload boundary.
  */
private[v2] final class WarcRecordStream(in: java.io.InputStream, file: String,
    required: StructType, typeEquals: Option[String]) {
  private val needPayload = required.fieldNames.contains("payload")
  private var current: InternalRow = _

  /** One header/payload line, CRLF- or LF-terminated, without the
    * terminator; null at EOF before any byte.
    */
  private def readLine(): String = {
    val buf = new ArrayBuffer[Byte](128)
    var b = in.read()
    if (b < 0) return null
    while (b >= 0 && b != '\n') { buf += b.toByte; b = in.read() }
    if (buf.nonEmpty && buf.last == '\r') buf.dropRightInPlace(1)
    new String(buf.toArray, java.nio.charset.StandardCharsets.UTF_8)
  }

  private def readFully(n: Long): Array[Byte] = {
    require(n <= Int.MaxValue, s"graft-warc: $n-byte record in $file")
    val out = new Array[Byte](n.toInt)
    var off = 0
    while (off < n) {
      val k = in.read(out, off, n.toInt - off)
      if (k < 0) throw new java.io.EOFException(
        s"graft-warc: payload truncated at $off/$n bytes in $file")
      off += k
    }
    out
  }

  /** Advance to the next record satisfying the pushed type filter;
    * false at EOF.
    */
  def advance(): Boolean = {
    while (true) {
      var line = readLine()
      while (line != null && line.isEmpty) line = readLine() // inter-record CRLFs
      if (line == null) return false
      require(line.startsWith("WARC/"),
        s"graft-warc: expected a WARC/x.y version line, got '$line' in $file")
      val headers = scala.collection.mutable.Map.empty[String, String]
      var h = readLine()
      while (h != null && h.nonEmpty) {
        val at = h.indexOf(':')
        require(at > 0, s"graft-warc: malformed header '$h' in $file")
        headers(h.substring(0, at).trim.toLowerCase) = h.substring(at + 1).trim
        h = readLine()
      }
      val len = headers.getOrElse("content-length", throw new IllegalStateException(
        s"graft-warc: record without Content-Length in $file")).toLong
      val recType = headers.getOrElse("warc-type", null)
      val matches = typeEquals.forall(_ == recType)
      val payload: Array[Byte] =
        if (matches && needPayload) readFully(len)
        else { in.skipNBytes(len); null }
      if (matches) {
        val vals = required.fieldNames.map {
          case "url" => utf8OrNull(headers.get("warc-target-uri"))
          case "warc_date" => utf8OrNull(headers.get("warc-date"))
          case "record_type" => utf8OrNull(Option(recType))
          case "mime" => utf8OrNull(headers.get("content-type"))
          case "content_length" => java.lang.Long.valueOf(len)
          case "payload" => payload
        }
        current = InternalRow.fromSeq(vals.toSeq)
        return true
      }
    }
    false
  }

  def get(): InternalRow = current

  private def utf8OrNull(v: Option[String]): UTF8String =
    v.map(UTF8String.fromString).orNull
}

/** OutputStream wrapper counting bytes written — gives [[WarcIo.exportCorpus]]
  * each streamed member's compressed length for its CDX line.
  */
private[v2] final class CountingOutputStream(under: java.io.OutputStream)
    extends java.io.FilterOutputStream(under) {
  var count = 0L
  override def write(b: Int): Unit = { out.write(b); count += 1 }
  override def write(b: Array[Byte], off: Int, len: Int): Unit = {
    out.write(b, off, len); count += len
  }
}

/** InputStream wrapper attributing raw (compressed) bytes consumed to
  * [[WarcIo.bytesRead]] — the observable the CDX path exists to shrink;
  * WarcSourceSpec asserts the seek path reads strictly less than the scan
  * path on a payload-heavy fixture. Single-JVM visible (local mode / one
  * executor); on a cluster each executor counts its own reads.
  */
private[v2] final class CountingInputStream(under: java.io.InputStream)
    extends java.io.FilterInputStream(under) {
  override def read(): Int = {
    val b = super.read(); if (b >= 0) WarcIo.bytesRead.incrementAndGet(); b
  }
  override def read(b: Array[Byte], off: Int, len: Int): Int = {
    val k = super.read(b, off, len)
    if (k > 0) WarcIo.bytesRead.addAndGet(k.toLong)
    k
  }
}

final class WarcReaderFactory(required: StructType, typeEquals: Option[String])
    extends PartitionReaderFactory {

  override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
    partition match {
      case WarcFilePartition(file) =>
        val raw = new java.io.BufferedInputStream(new CountingInputStream(
          java.nio.file.Files.newInputStream(java.nio.file.Paths.get(file))), 1 << 16)
        val in: java.io.InputStream =
          if (file.endsWith(".gz"))
            new java.util.zip.GZIPInputStream(raw, 1 << 16) // multi-member capable
          else raw
        val stream = new WarcRecordStream(in, file, required, typeEquals)
        new PartitionReader[InternalRow] {
          override def next(): Boolean = stream.advance()
          override def get(): InternalRow = stream.get()
          override def close(): Unit = in.close()
        }

      case WarcMemberRunPartition(file, offsets, lengths) =>
        // SEEK path: read exactly the indexed compressed ranges, one gzip
        // member (= one record) each; nothing between members is touched
        val ch = java.nio.channels.FileChannel.open(
          java.nio.file.Paths.get(file), java.nio.file.StandardOpenOption.READ)
        new PartitionReader[InternalRow] {
          private var i = 0
          private var stream: WarcRecordStream = _
          override def next(): Boolean = {
            // a member holds exactly one record; CDX promised a match for
            // the pushed type, but re-verify record-level (stale index =
            // wrong data; the filter also re-applies for safety)
            while (true) {
              if (stream != null && stream.advance()) return true
              if (i >= offsets.length) return false
              val buf = java.nio.ByteBuffer.allocate(lengths(i))
              var pos = offsets(i)
              while (buf.hasRemaining) {
                val k = ch.read(buf, pos)
                if (k < 0) throw new java.io.EOFException(
                  s"graft-warc: CDX range $pos+${buf.remaining} beyond EOF in $file")
                pos += k
              }
              WarcIo.bytesRead.addAndGet(lengths(i).toLong)
              val raw = new java.io.ByteArrayInputStream(buf.array())
              val in: java.io.InputStream =
                if (file.endsWith(".gz")) new java.util.zip.GZIPInputStream(raw)
                else raw
              stream = new WarcRecordStream(in, file, required, typeEquals)
              i += 1
            }
            false
          }
          override def get(): InternalRow = stream.get()
          override def close(): Unit = ch.close()
        }
    }
}

/** Writer side — the fixture/mini-sink twin of the reader: records land as
  * spec-exact WARC framing, one gzip MEMBER per record when `gzip` is set
  * (the Common Crawl layout the reader's multi-member stream consumes).
  */
object WarcIo {

  final case class Record(url: String, date: String, recordType: String,
                          mime: String, payload: Array[Byte])

  /** Raw (compressed) bytes the source has read from warc files — the
    * number the CDX seek path shrinks; see [[CountingInputStream]].
    */
  val bytesRead = new java.util.concurrent.atomic.AtomicLong

  /** One CDX sidecar line: the member's compressed (offset, length) plus
    * the planning fields (record type, url, mime — '-' for absent, the CDX
    * convention). Space-separated; urls carry no raw spaces per RFC 3986.
    */
  final case class CdxEntry(offset: Long, length: Int, recordType: String,
                            url: String, mime: String)

  def readCdx(path: String): Seq[CdxEntry] =
    scala.jdk.CollectionConverters.ListHasAsScala(
      java.nio.file.Files.readAllLines(java.nio.file.Paths.get(path)))
      .asScala.iterator.filter(_.nonEmpty).map { ln =>
        val f = ln.split(" ", 5)
        require(f.length == 5, s"graft-warc: malformed CDX line '$ln' in $path")
        CdxEntry(f(0).toLong, f(1).toInt, f(2), f(3), f(4))
      }.toSeq

  private def cdxLine(offset: Long, length: Int, r: Record): String = {
    def orDash(s: String) = if (s == null || s.isEmpty) "-" else s
    s"$offset $length ${orDash(r.recordType)} ${orDash(r.url)} ${orDash(r.mime)}"
  }

  def write(file: String, records: Seq[Record], gzip: Boolean,
            cdx: Boolean = false): Unit = {
    val out = new java.io.BufferedOutputStream(
      java.nio.file.Files.newOutputStream(java.nio.file.Paths.get(file)), 1 << 16)
    val index = new StringBuilder
    var offset = 0L
    try records.foreach { r =>
      val bytes = frame(r)
      val member =
        if (gzip) {
          val m = new java.io.ByteArrayOutputStream(bytes.length)
          val gz = new java.util.zip.GZIPOutputStream(m)
          gz.write(bytes); gz.close()
          m.toByteArray
        } else bytes
      out.write(member)
      if (cdx) index.append(cdxLine(offset, member.length, r)).append('\n')
      offset += member.length
    } finally out.close()
    if (cdx) java.nio.file.Files.writeString(
      java.nio.file.Paths.get(file + ".cdx"), index.toString)
  }

  /** EXECUTOR-PARALLEL corpus export as WARC shards — the cluster-scale
    * write twin of the DSv2 reader ([[write]] is the driver-side fixture
    * form): every partition streams its rows into its OWN multi-member
    * shard (`part-NNNNN.warc[.gz]`) through a write-temp-then-atomic-rename,
    * so a retried task replaces its shard instead of appending a duplicate
    * — idempotent under Spark task retry whenever the input partitioning
    * is deterministic (repartitionByRange + sortWithinPartitions on the
    * url/id is the caller's side of that contract; rows are framed in
    * partition iteration order). NULL payloads export as empty records;
    * NULL header fields are omitted, exactly as [[write]] frames them.
    *
    * 100 TB posture: one sequential gzip stream per task (the format's
    * floor — members must concatenate in order), thousands of tasks in
    * flight; no driver collect, no shuffle beyond what the caller chose.
    */
  def exportCorpus(df: org.apache.spark.sql.DataFrame, dir: String,
                   urlCol: String, dateCol: String, typeCol: String,
                   mimeCol: String, payloadCol: String,
                   gzip: Boolean = true, cdx: Boolean = false): Unit = {
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(dir))
    val ext = if (gzip) "warc.gz" else "warc"
    val cols = Seq(urlCol, dateCol, typeCol, mimeCol, payloadCol)
    df.select(cols.map(org.apache.spark.sql.functions.col): _*)
      .foreachPartition { rows: Iterator[org.apache.spark.sql.Row] =>
        val pid = org.apache.spark.TaskContext.getPartitionId()
        // temp name carries the task ATTEMPT id: two live attempts of the
        // same partition (speculation, a zombie racing its retry) must
        // each write a private file before the atomic rename — a shared
        // temp path would interleave their bytes (ADVICE r18 #3)
        val attempt = Option(org.apache.spark.TaskContext.get())
          .map(_.taskAttemptId()).getOrElse(0L)
        val fin = java.nio.file.Paths.get(f"$dir/part-$pid%05d.$ext")
        val tmp = java.nio.file.Paths.get(
          f"$dir/.part-$pid%05d-a$attempt.$ext.inprogress")
        // members STREAM into the shard (GZIPOutputStream.finish() closes a
        // member without closing the file — no in-memory compressed copy,
        // so a multi-GB payload never doubles in heap; VERDICT r18 nit);
        // the counting wrapper yields each member's compressed length for
        // the CDX line
        val out = new CountingOutputStream(new java.io.BufferedOutputStream(
          java.nio.file.Files.newOutputStream(tmp), 1 << 16))
        val index = new StringBuilder
        try {
          rows.foreach { r =>
            val payload = Option(r.getAs[Array[Byte]](4))
              .getOrElse(Array.emptyByteArray)
            val rec = Record(r.getAs[String](0), r.getAs[String](1),
              r.getAs[String](2), r.getAs[String](3), payload)
            val bytes = frame(rec)
            val offset = out.count
            if (gzip) {
              val gz = new java.util.zip.GZIPOutputStream(out, 1 << 16)
              gz.write(bytes); gz.finish()
            } else out.write(bytes)
            if (cdx) index.append(
              cdxLine(offset, (out.count - offset).toInt, rec)).append('\n')
          }
        } finally out.close()
        java.nio.file.Files.move(tmp, fin,
          java.nio.file.StandardCopyOption.REPLACE_EXISTING,
          java.nio.file.StandardCopyOption.ATOMIC_MOVE)
        if (cdx) {
          // sidecar rides the same private-temp + atomic-rename contract
          val ctmp = java.nio.file.Paths.get(
            f"$dir/.part-$pid%05d-a$attempt.$ext.cdx.inprogress")
          java.nio.file.Files.writeString(ctmp, index.toString)
          java.nio.file.Files.move(ctmp,
            java.nio.file.Paths.get(f"$dir/part-$pid%05d.$ext.cdx"),
            java.nio.file.StandardCopyOption.REPLACE_EXISTING,
            java.nio.file.StandardCopyOption.ATOMIC_MOVE)
        }
        ()
      }
  }

  private def frame(r: Record): Array[Byte] = {
    val crlf = "\r\n"
    val head = new StringBuilder("WARC/1.0").append(crlf)
    if (r.recordType != null) head.append("WARC-Type: ").append(r.recordType).append(crlf)
    if (r.url != null) head.append("WARC-Target-URI: ").append(r.url).append(crlf)
    if (r.date != null) head.append("WARC-Date: ").append(r.date).append(crlf)
    if (r.mime != null) head.append("Content-Type: ").append(r.mime).append(crlf)
    head.append("Content-Length: ").append(r.payload.length).append(crlf)
    head.append(crlf)
    val h = head.toString.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val tail = (crlf + crlf).getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val buf = new Array[Byte](h.length + r.payload.length + tail.length)
    System.arraycopy(h, 0, buf, 0, h.length)
    System.arraycopy(r.payload, 0, buf, h.length, r.payload.length)
    System.arraycopy(tail, 0, buf, h.length + r.payload.length, tail.length)
    buf
  }
}
