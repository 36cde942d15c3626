package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types._

/** Small-dimension sources: the EIA-930 reference tables (S5/S6) and the
  * curated-coordinates dimension (S9).
  */
object CsvSources {

  /** Balancing-authorities reference table: first 6 workbook columns
    * (EIA930PipelineHourlyData.py:33-34 slices `iloc[:, :6]`). Available
    * from CSV (below) or from the real two-sheet .xlsx workbook via
    * `balancingAuthoritiesXlsx` / `energySourcesXlsx` (graft.sources.Xlsx,
    * a pure-JDK OOXML parse — the reference's `pd.read_excel` is the same
    * driver-side parse).
    */
  val balancingAuthoritiesSchema: StructType = StructType(Seq(
    StructField("BA Code", StringType),
    StructField("BA Name", StringType),
    StructField("Time Zone", StringType),
    StructField("Region/Country Code", StringType),
    StructField("Region/Country Name", StringType),
    StructField("Generation Only BA", StringType)))

  val energySourcesSchema: StructType = StructType(Seq(
    StructField("Energy Source Code", StringType),
    StructField("Energy Source Name", StringType)))

  val coordinatesSchema: StructType = StructType(Seq(
    StructField("State", StringType),
    StructField("Latitude", DoubleType),
    StructField("Longitude", DoubleType)))

  def readCsv(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.option("header", "true").schema(schema).csv(path)

  def balancingAuthorities(spark: SparkSession, path: String): DataFrame =
    readCsv(spark, path, balancingAuthoritiesSchema)

  def energySources(spark: SparkSession, path: String): DataFrame =
    readCsv(spark, path, energySourcesSchema)

  def coordinates(spark: SparkSession, path: String): DataFrame =
    readCsv(spark, path, coordinatesSchema)

  /** S5 — the workbook's 'BAs' sheet, sliced to the first 6 columns exactly
    * as the reference's `iloc[:, :6]` (EIA930PipelineHourlyData.py:34).
    */
  def balancingAuthoritiesXlsx(spark: SparkSession, path: String): DataFrame = {
    val df = Xlsx.readSheet(spark, path, "BAs")
    df.select(df.columns.take(6).toIndexedSeq.map(org.apache.spark.sql.functions.col): _*)
  }

  /** S5 — the workbook's 'Energy Sources' sheet, all columns. */
  def energySourcesXlsx(spark: SparkSession, path: String): DataFrame =
    Xlsx.readSheet(spark, path, "Energy Sources")

  /** S6 — conditional-fetch cache: re-materialize the parquet cache only when
    * the upstream stamp (HTTP Last-Modified in prod; any string here)
    * differs from the cached one. Returns the cached DataFrame.
    */
  def cachedByStamp(spark: SparkSession, cacheDir: String, stamp: String)(
      load: => DataFrame): DataFrame = {
    val stampFile = java.nio.file.Paths.get(cacheDir, "_stamp")
    val dataDir = s"$cacheDir/data"
    val current =
      if (java.nio.file.Files.exists(stampFile))
        Some(java.nio.file.Files.readString(stampFile))
      else None
    if (!current.contains(stamp)) {
      load.write.mode("overwrite").parquet(dataDir)
      java.nio.file.Files.createDirectories(stampFile.getParent)
      java.nio.file.Files.writeString(stampFile, stamp)
    }
    spark.read.parquet(dataDir)
  }
}
