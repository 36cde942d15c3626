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

  /** S6 — the HTTP HEAD probe that PRODUCES the stamp: the upstream's
    * Last-Modified header (reference: EIA930PipelineHourlyData.py:18
    * `requests.head(url).headers.get('Last-Modified')`). Returns "" when
    * the server sends no header — matching the reference, whose stamp file
    * starts empty so a missing header refetches every run (correct: with no
    * change signal, staleness can't be ruled out). Driver-side: one HEAD
    * request per pipeline run, never per task.
    */
  def lastModifiedStamp(url: String,
      client: java.net.http.HttpClient = HttpPages.defaultClient): String = {
    val req = java.net.http.HttpRequest.newBuilder(java.net.URI.create(url))
      .method("HEAD", java.net.http.HttpRequest.BodyPublishers.noBody())
      .timeout(java.time.Duration.ofSeconds(30)).build()
    val resp = client.send(req, java.net.http.HttpResponse.BodyHandlers.discarding())
    require(resp.statusCode() == 200,
      s"lastModifiedStamp: HTTP ${resp.statusCode()} for HEAD $url")
    resp.headers().firstValue("Last-Modified").orElse("")
  }

  /** S6 end-to-end: conditional-fetch cache keyed by the URL's Last-Modified
    * header — `load` (typically an [[Xlsx]] read of the same URL) runs only
    * when the upstream reports a change since the cached copy
    * (EIA930PipelineHourlyData.py:15-42). A server that sends NO
    * Last-Modified gives no change signal, so staleness can't be ruled out
    * and every run refetches (a never-matching stamp).
    */
  def cachedByLastModified(spark: SparkSession, cacheDir: String, url: String,
      client: java.net.http.HttpClient = HttpPages.defaultClient)(
      load: => DataFrame): DataFrame =
    cachedByStamp(spark, cacheDir, effectiveStamp(url, client))(load)

  private def effectiveStamp(url: String,
      client: java.net.http.HttpClient): String =
    lastModifiedStamp(url, client) match {
      case ""    => s"__no-last-modified-${System.nanoTime()}"
      case stamp => stamp
    }

  /** The full S5+S6 production path: both EIA-930 reference tables from the
    * workbook URL, conditionally cached behind ONE Last-Modified probe —
    * the Spark shape of the reference's
    * `harvestEIA930FormDataReferenceTables` (EIA930PipelineHourlyData
    * .py:15-42): HEAD the URL, serve the parquet cache while the header is
    * unchanged, re-read the workbook (driver-side, [[Xlsx]]) when it moves.
    */
  def referenceTablesFromUrl(spark: SparkSession, cacheDir: String, url: String,
      client: java.net.http.HttpClient = HttpPages.defaultClient)
      : (DataFrame, DataFrame) = {
    val stamp = effectiveStamp(url, client)
    (cachedByStamp(spark, s"$cacheDir/balancing_authorities", stamp)(
       balancingAuthoritiesXlsx(spark, url)),
     cachedByStamp(spark, s"$cacheDir/energy_sources", stamp)(
       energySourcesXlsx(spark, url)))
  }
}
