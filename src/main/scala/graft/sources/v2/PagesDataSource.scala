package graft.sources.v2

import java.util

import scala.jdk.CollectionConverters._

import com.fasterxml.jackson.databind.ObjectMapper
import graft.sources.HttpPages
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types.{StringType, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** DataSource V2 connector for paginated API envelopes: one InputPartition
  * PER PAGE, so page parsing — and in HTTP mode the page FETCH itself — runs
  * on executors in parallel. This is the DSv2 shape SURVEY.md §4 sketches
  * for the REST scans (S1-S4), and the parallel answer to the reference's
  * sequential driver-side pagination loop.
  *
  * Two modes:
  * - `load(dir)`: a directory of captured `pageN.json` bodies (replayable,
  *   deterministic — the test/backfill path);
  * - `.option("url", base).option("pageSize", n)[.option("param.K", V)...]`:
  *   live HTTP. The driver probes page 0 once (via `HttpPages`, with its
  *   retry/backoff), reads the envelope's `response.total`, and plans
  *   ceil(total/pageSize) partitions; each EXECUTOR then fetches its own
  *   offset concurrently — 1000 executors pull 1000 pages at once, vs one
  *   page at a time on the driver. (The probe's body rides along in
  *   partition 0, so page 0 is never fetched twice.) Only usable when the
  *   API paginates by offset with a stable total — the sequential
  *   stop-condition cyclers (`EnvelopeJson.fetch*`) remain the right tool
  *   when the end of data is discovered, not declared.
  *
  * Implements SupportsPushDownRequiredColumns: a `select` of 2 fields parses
  * and ships only those 2 — the reference hand-codes exactly this pruning as
  * `data[n]` request params (EIA7APipelineQuarterlyData.py:22-31).
  *
  * Implements SupportsPushDownFilters for comparisons on the period column
  * (option `periodField`, default "period"): accepted filters are enforced
  * row-level inside the reader, and in HTTP mode the tightest >=/<= bounds
  * additionally become `start=`/`end=` request params — the reference
  * hand-codes exactly this cutoff pushdown (EIA930PipelineHourlyData.py:48-53),
  * and because the probe's `response.total` then reflects the filtered count,
  * pushdown shrinks the number of planned page fetches, not just row volume.
  * Comparisons are lexicographic, which matches chronological order for the
  * fixed-width period formats the APIs serve (yyyy-MM-dd'T'HH, yyyy-MM,
  * yyyy-Qn).
  */
class PagesDataSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "graft-pages"
  override def supportsExternalMetadata(): Boolean = true

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    throw new IllegalArgumentException(
      "graft-pages requires an explicit row schema (the envelope's data-row fields)")

  // The reader materializes every envelope field as a UTF8String; accepting a
  // schema with non-string fields would corrupt rows (or throw deep inside
  // execution) instead of failing here with an actionable message.
  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table = {
    val nonString = schema.fields.filterNot(_.dataType == StringType)
    if (nonString.nonEmpty)
      throw new IllegalArgumentException(
        "graft-pages parses envelope fields as strings; cast downstream. " +
          "Non-string schema fields: " +
          nonString.map(f => s"${f.name}: ${f.dataType.simpleString}").mkString(", "))
    new PagesTable(schema, properties)
  }
}

final class PagesTable(schema: StructType, properties: util.Map[String, String])
    extends Table with SupportsRead {
  private def prop(key: String): Option[String] =
    properties.asScala.collectFirst { case (k, v) if k.equalsIgnoreCase(key) => v }

  private val path = prop("path")
  private val http: Option[HttpConfig] = prop("url").map { url =>
    HttpConfig(
      url,
      pageSize = prop("pageSize").map(_.toInt).getOrElse(5000),
      params = properties.asScala.collect {
        case (k, v) if k.toLowerCase.startsWith("param.") => k.drop("param.".length) -> v
      }.toMap,
      retries = prop("retries").map(_.toInt).getOrElse(5))
  }
  require(path.isDefined || http.isDefined,
    "graft-pages requires a load(path) or .option(\"url\", ...)")

  override def name(): String = s"graft-pages(${path.orElse(http.map(_.url)).get})"
  override def schema(): StructType = schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new PagesScanBuilder(schema, path, http,
      prop("periodField").getOrElse("period"))
}

final case class HttpConfig(url: String, pageSize: Int,
                            params: Map[String, String], retries: Int)

/** A pushed period comparison, serializable into every reader partition.
  * op is one of >=, >, <=, <, =; comparisons are lexicographic on the
  * period string (chronological for fixed-width period formats).
  */
final case class PeriodFilter(op: String, value: String) {
  def accepts(period: String): Boolean = {
    if (period == null) return false
    if (op == "notnull") return true
    val c = period.compareTo(value)
    op match {
      case ">=" => c >= 0
      case ">"  => c > 0
      case "<=" => c <= 0
      case "<"  => c < 0
      case "="  => c == 0
    }
  }
}

final class PagesScanBuilder(fullSchema: StructType, path: Option[String],
                             http: Option[HttpConfig], periodField: String)
    extends ScanBuilder with SupportsPushDownRequiredColumns
    with SupportsPushDownFilters with SupportsPushDownLimit
    with SupportsPushDownAggregates {
  import org.apache.spark.sql.sources._

  private var required: StructType = fullSchema
  private var pushed: Array[Filter] = Array.empty
  private var limit: Option[Int] = None
  private var countPushed = false

  // COUNT(*) with no grouping and no row-dropping filters, in HTTP mode,
  // is answered ENTIRELY by the probe's response.total — one request, zero
  // page fetches. Complete pushdown: the source emits the final count row.
  private def countableShape(
      agg: org.apache.spark.sql.connector.expressions.aggregate.Aggregation): Boolean =
    http.isDefined && pushed.isEmpty &&
      agg.groupByExpressions.isEmpty && agg.aggregateExpressions.length == 1 &&
      agg.aggregateExpressions()(0)
        .isInstanceOf[org.apache.spark.sql.connector.expressions.aggregate.CountStar]

  override def supportCompletePushDown(
      agg: org.apache.spark.sql.connector.expressions.aggregate.Aggregation): Boolean =
    countableShape(agg)

  override def pushAggregation(
      agg: org.apache.spark.sql.connector.expressions.aggregate.Aggregation): Boolean = {
    if (!countableShape(agg)) return false
    countPushed = true
    required = new StructType().add("count", org.apache.spark.sql.types.LongType)
    true
  }

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  // Partial pushdown (return false): with period filters enforced inside
  // the reader a page may yield fewer rows than it holds, so the source
  // can only bound work (fetch/plan fewer pages, stop each reader at n),
  // while Spark applies the exact final limit.
  override def pushLimit(n: Int): Boolean = {
    limit = Some(n)
    false
  }

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val (accepted, residual) = filters.partition {
      case GreaterThanOrEqual(a, _: String) => a == periodField
      case GreaterThan(a, _: String)        => a == periodField
      case LessThanOrEqual(a, _: String)    => a == periodField
      case LessThan(a, _: String)           => a == periodField
      case EqualTo(a, _: String)            => a == periodField
      case IsNotNull(a)                     => a == periodField
      case _ => false
    }
    pushed = accepted
    residual
  }

  override def pushedFilters(): Array[Filter] = pushed

  private def periodFilters: Seq[PeriodFilter] = pushed.toSeq.map {
    case GreaterThanOrEqual(_, v: String) => PeriodFilter(">=", v)
    case GreaterThan(_, v: String)        => PeriodFilter(">", v)
    case LessThanOrEqual(_, v: String)    => PeriodFilter("<=", v)
    case LessThan(_, v: String)           => PeriodFilter("<", v)
    case EqualTo(_, v: String)            => PeriodFilter("=", v)
    case IsNotNull(_)                     => PeriodFilter("notnull", "")
    case other => throw new IllegalStateException(s"unpushable filter $other")
  }

  override def build(): Scan = new Scan with Batch {
    private val filters = periodFilters
    private val pushedLimit = limit
    override def readSchema(): StructType = required
    override def toBatch: Batch = this
    override def description(): String =
      s"graft-pages ${path.orElse(http.map(_.url)).get}, " +
        s"pruned to [${required.fieldNames.mkString(",")}], " +
        s"pushed [${filters.map(f => s"$periodField ${f.op} ${f.value}").mkString(", ")}]" +
        pushedLimit.map(n => s", limit $n").getOrElse("")

    // The API's start/end params are inclusive bounds, so strict comparisons
    // push their value too (a superset); the reader's row-level check
    // restores strictness. EqualTo pins both ends.
    private def httpParams(cfg: HttpConfig): Map[String, String] = {
      val lower = filters.collect {
        case PeriodFilter(">=" | ">" | "=", v) => v
      }.maxOption
      val upper = filters.collect {
        case PeriodFilter("<=" | "<" | "=", v) => v
      }.minOption
      cfg.params ++ lower.map("start" -> _) ++ upper.map("end" -> _)
    }

    // lazy + cached: Spark calls planInputPartitions more than once on a
    // Scan (partitioning, RDD build) — one probe per query execution, not
    // one per call
    private lazy val planned: Array[InputPartition] =
      if (countPushed) Array(CountPartition(probeTotal()))
      else plannedPages

    /** One probe request; returns response.total. Only called in HTTP mode
      * (countableShape requires it).
      */
    private def probeTotal(): Long = {
      val cfg = http.get
      val probe = new HttpPages(cfg.url, httpParams(cfg), cfg.pageSize, cfg.retries)
        .fetch(0).getOrElse(throw new IllegalStateException(
          s"graft-pages: empty probe response from ${cfg.url}"))
      val totalNode = new ObjectMapper().readTree(probe).path("response").path("total")
      if (totalNode.isMissingNode)
        throw new IllegalArgumentException(
          "graft-pages count pushdown needs response.total in the envelope")
      if (totalNode.isNumber) totalNode.asLong() else totalNode.asText().toLong
    }

    private lazy val plannedPages: Array[InputPartition] = path match {
      case Some(dir) =>
        val stream = java.nio.file.Files.list(java.nio.file.Paths.get(dir))
        val files = try stream.toArray.map(_.toString) finally stream.close()
        files.filter(p => p.matches(".*page\\d+\\.json$")).sorted
          .map(p => FilePagePartition(p): InputPartition)
      case None =>
        val cfg = http.get
        val params = httpParams(cfg)
        val probe = new HttpPages(cfg.url, params, cfg.pageSize, cfg.retries)
          .fetch(0).getOrElse(throw new IllegalStateException(
            s"graft-pages: empty probe response from ${cfg.url}"))
        val totalNode = new ObjectMapper().readTree(probe).path("response").path("total")
        if (totalNode.isMissingNode)
          throw new IllegalArgumentException(
            "graft-pages http mode needs response.total in the envelope to plan " +
              "partitions; use the sequential EnvelopeJson cyclers for " +
              "discovered-end pagination")
        val total = if (totalNode.isNumber) totalNode.asLong() else totalNode.asText().toLong
        // a pushed limit (with no row-dropping filters) bounds the pages
        // worth FETCHING: n rows live in the first ceil(n/pageSize) pages
        val cappedTotal =
          if (filters.isEmpty) pushedLimit.fold(total)(n => math.min(total, n.toLong))
          else total
        val nPages = math.max(1L, (cappedTotal + cfg.pageSize - 1) / cfg.pageSize).toInt
        (0 until nPages).map { i =>
          HttpPagePartition(cfg.url, params, cfg.pageSize, i * cfg.pageSize,
            cfg.retries, if (i == 0) Some(probe) else None): InputPartition
        }.toArray
    }

    override def planInputPartitions(): Array[InputPartition] = planned

    override def createReaderFactory(): PartitionReaderFactory =
      new PagesReaderFactory(required, periodField, filters, pushedLimit)
  }
}

final case class FilePagePartition(file: String) extends InputPartition

/** Single-partition result of a completely-pushed COUNT(*). */
final case class CountPartition(total: Long) extends InputPartition

final case class HttpPagePartition(url: String, params: Map[String, String],
                                   pageSize: Int, offset: Int, retries: Int,
                                   prefetched: Option[String]) extends InputPartition

final class PagesReaderFactory(required: StructType, periodField: String,
                               filters: Seq[PeriodFilter],
                               limit: Option[Int] = None)
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    partition match {
      case CountPartition(total) =>
        return new PartitionReader[InternalRow] {
          private var done = false
          override def next(): Boolean = { val r = !done; done = true; r }
          override def get(): InternalRow = InternalRow(total)
          override def close(): Unit = ()
        }
      case _ => ()
    }
    val body = partition match {
      case FilePagePartition(file) =>
        java.nio.file.Files.readString(java.nio.file.Paths.get(file))
      case HttpPagePartition(url, params, pageSize, offset, retries, prefetched) =>
        prefetched.getOrElse(
          new HttpPages(url, params, pageSize, retries).fetch(offset).getOrElse(
            throw new IllegalStateException(
              s"graft-pages: no body for planned offset $offset at $url")))
    }
    new PartitionReader[InternalRow] {
      private val fields = required.fieldNames
      private val data = new ObjectMapper()
        .readTree(body)
        .path("response").path("data")
      private var i = -1

      // Pushed filters are ENFORCED here (Spark removed its own Filter node
      // when the pushdown was accepted). The period is read from the raw
      // node, not the pruned row — a query may filter on period while not
      // selecting it.
      private def rowAccepted(idx: Int): Boolean = {
        if (filters.isEmpty) return true
        val p = data.get(idx).get(periodField)
        val s = if (p == null || p.isNull) null else p.asText()
        filters.forall(_.accepts(s))
      }

      private var emitted = 0

      override def next(): Boolean = {
        // pushed limit: each partition emits at most n accepted rows (Spark
        // applies the exact global limit on top)
        if (limit.exists(emitted >= _)) return false
        i += 1
        while (i < data.size() && !rowAccepted(i)) i += 1
        val has = i < data.size()
        if (has) emitted += 1
        has
      }

      override def get(): InternalRow = {
        val node = data.get(i)
        InternalRow.fromSeq(fields.toSeq.map { f =>
          val v = node.get(f)
          if (v == null || v.isNull) null else UTF8String.fromString(v.asText())
        })
      }

      override def close(): Unit = ()
    }
  }
}
