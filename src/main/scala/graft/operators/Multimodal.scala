package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: media as opaque `binary` with typed metadata.
  *
  * The container has no image/audio codecs, so the decode kernel is a
  * clearly-marked deterministic STUB (`stubDecodeMeta`) — but the Spark-side
  * plumbing is real and what matters at 100 TB: binary columns travel
  * untouched through shuffles, metadata extraction is per-row (no shuffle),
  * and the batch-kernel entry point (`mapPartitionsDecode`) has the shape a
  * real decoder plugs into: one kernel instance per partition, rows streamed
  * through it, so codec init cost amortizes over the partition, exactly like
  * a Pandas-UDF/mapInPandas batch on the PySpark side.
  */
object Multimodal {

  /** A decoded media frame's metadata. A real implementation fills this from
    * the codec; the stub derives it deterministically from the bytes.
    */
  case class MediaMeta(id: Long, nBytes: Long, width: Int, height: Int, frames: Int)

  /** Attach a binary media column (here: UTF-8 bytes of `srcCol`, standing in
    * for image/audio payloads read from object storage).
    */
  def withBinary(df: DataFrame, srcCol: String): DataFrame =
    df.withColumn("media", col(srcCol).cast("binary"))

  /** STUB decode, expression form: deterministic fake dimensions from the
    * byte length. Pure Column algebra -> codegen'd, oracle-expressible.
    * Replace with a real codec kernel via `mapPartitionsDecode` in prod.
    */
  def stubDecodeMeta(df: DataFrame, idCol: String): DataFrame =
    df.select(
      col(idCol).as("id"),
      octet_length(col("media")).cast("long").as("n_bytes"))
      .withColumn("width", (lit(64) + col("n_bytes") % 577).cast("long"))
      .withColumn("height", (lit(64) + (col("n_bytes") * 31) % 577).cast("long"))
      .withColumn("frames", (lit(1) + col("n_bytes") % 7).cast("long"))

  /** STUB decode, batch-kernel form: the real-codec integration point.
    * One "decoder" per partition; rows stream through. A real decoder would
    * hold codec state here (dlopen'd libs, GPU handles) — the expensive init
    * happens once per partition, not per row.
    */
  def mapPartitionsDecode(spark: SparkSession, df: DataFrame, idCol: String): Dataset[MediaMeta] = {
    import spark.implicits._
    df.select(col(idCol).cast("long").as("id"), col("media"))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        // real impl: val codec = Codec.open(...)  — once per partition
        rows.map { case (id, bytes) =>
          val n = bytes.length.toLong
          MediaMeta(id, n, (64 + n % 577).toInt, (64 + (n * 31) % 577).toInt, (1 + n % 7).toInt)
        }
      }
  }

  /** Deterministic fake frame-sampling: pick every `stride`-th byte as a
    * "frame feature" — stands in for decode+resize+frame-sample while
    * exercising the real array-column plumbing.
    */
  def stubFrameFeatures(df: DataFrame, idCol: String, stride: Int): DataFrame =
    df.select(col(idCol).as("id"),
      transform(
        sequence(lit(1), greatest(octet_length(col("media")).cast("int"), lit(1)), lit(stride)),
        i => get(split(hex(col("media")), ""), (i - 1) * 2).cast("string")
      ).as("frame_features"))
}
