package graft.sources.v2

import java.util

import com.fasterxml.jackson.databind.ObjectMapper
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types.{StringType, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** DataSource V2 connector for paginated API envelopes: one InputPartition
  * PER PAGE, so page parsing runs on executors in parallel — the DSv2 shape
  * SURVEY.md §4 sketches for the REST scans (S1-S4). Reading from a
  * directory of captured `pageN.json` bodies here; a production variant's
  * partitions carry (endpoint, offset) and fetch over HTTP instead of
  * opening files — everything else is identical.
  *
  * Implements SupportsPushDownRequiredColumns: a `select` of 2 fields parses
  * and ships only those 2 — the reference hand-codes exactly this pruning as
  * `data[n]` request params (EIA7APipelineQuarterlyData.py:22-31).
  *
  * Usage:
  * {{{
  * spark.read.format("graft-pages").schema(rowSchema).load(pagesDir)
  * }}}
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
    new PagesTable(schema, properties.get("path"))
  }
}

final class PagesTable(schema: StructType, path: String) extends Table with SupportsRead {
  require(path != null, "graft-pages requires a load(path)")
  override def name(): String = s"graft-pages($path)"
  override def schema(): StructType = schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new PagesScanBuilder(schema, path)
}

final class PagesScanBuilder(fullSchema: StructType, path: String)
    extends ScanBuilder with SupportsPushDownRequiredColumns {
  private var required: StructType = fullSchema

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  override def build(): Scan = new Scan with Batch {
    override def readSchema(): StructType = required
    override def toBatch: Batch = this
    override def description(): String =
      s"graft-pages $path, pruned to [${required.fieldNames.mkString(",")}]"

    override def planInputPartitions(): Array[InputPartition] = {
      val stream = java.nio.file.Files.list(java.nio.file.Paths.get(path))
      val files = try stream.toArray.map(_.toString) finally stream.close()
      files.filter(p => p.matches(".*page\\d+\\.json$")).sorted
        .map(p => PagePartition(p): InputPartition)
    }

    override def createReaderFactory(): PartitionReaderFactory =
      new PagesReaderFactory(required)
  }
}

final case class PagePartition(file: String) extends InputPartition

final class PagesReaderFactory(required: StructType) extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val file = partition.asInstanceOf[PagePartition].file
    new PartitionReader[InternalRow] {
      private val fields = required.fieldNames
      private val data = new ObjectMapper()
        .readTree(java.nio.file.Files.readString(java.nio.file.Paths.get(file)))
        .path("response").path("data")
      private var i = -1

      override def next(): Boolean = { i += 1; i < data.size() }

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
