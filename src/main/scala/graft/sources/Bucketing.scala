package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Bucketed-table helpers: pre-shuffle a fact table ONCE at write time so
  * every later equi-join/aggregation on the bucket key runs exchange-free.
  *
  * This is the 100 TB lever for repeated joins: a nightly-bucketed lineitem
  * joined to bucketed orders needs zero shuffle at read time — Spark aligns
  * bucket files 1:1. The cost moves to the single bucketed write, amortized
  * over every downstream query. (At cluster scale, choose bucket counts as
  * a multiple of executor cores and of each other.)
  */
object Bucketing {

  /** Write `df` as a bucketed, sorted managed table (bucketing requires the
    * catalog — plain parquet paths can't carry bucket metadata).
    */
  def writeBucketed(df: DataFrame, table: String, bucketCol: String,
                    nBuckets: Int): Unit =
    writeBucketedBy(df, table, Seq(bucketCol), nBuckets)

  /** Multi-column bucketing: the bucket columns must be EXACTLY a join's
    * equi-keys for the scan's HashPartitioning to satisfy the join's
    * clustering requirement (Spark requires all cluster keys as partition
    * keys for co-partition by default) — a subset match re-shuffles both
    * sides.
    */
  def writeBucketedBy(df: DataFrame, table: String, bucketCols: Seq[String],
                      nBuckets: Int): Unit =
    df.write
      .mode(SaveMode.Overwrite)
      .bucketBy(nBuckets, bucketCols.head, bucketCols.tail: _*)
      .sortBy(bucketCols.head, bucketCols.tail: _*)
      .format("parquet")
      .saveAsTable(table)

  /** APPEND to an existing bucketed table — the incremental-growth path
    * (e.g. a streaming ingest appending each batch's band-index rows).
    * The bucket spec must match the table's; Spark validates and refuses a
    * mismatched append, so the table never silently loses its exchange-free
    * join property.
    */
  def appendBucketedBy(df: DataFrame, table: String, bucketCols: Seq[String],
                       nBuckets: Int): Unit =
    df.write
      .mode(SaveMode.Append)
      .bucketBy(nBuckets, bucketCols.head, bucketCols.tail: _*)
      .sortBy(bucketCols.head, bucketCols.tail: _*)
      .format("parquet")
      .saveAsTable(table)

  /** Drop `table` and any orphaned warehouse directory left by a session
    * whose metastore is gone (fresh derby metastore + persistent
    * spark-warehouse dir = CREATE TABLE refusing to reuse the location).
    * Call before re-creating a managed table in a new session.
    */
  def ensureCleanTable(spark: SparkSession, table: String): Unit = {
    val ident = spark.sessionState.sqlParser.parseTableIdentifier(table)
    // resolve the true location from the catalog while the table still
    // exists — the default-layout guess below is wrong for tables created
    // with an explicit LOCATION
    val resolved: Option[java.net.URI] =
      if (spark.catalog.tableExists(table))
        scala.util.Try(
          spark.sessionState.catalog.getTableMetadata(ident).location).toOption
      else None
    spark.sql(s"DROP TABLE IF EXISTS $table")
    // orphan sweep: reproduce the catalog's default managed layout —
    // <warehouse>/<db>.db/<tbl> for qualified names, <warehouse>/<tbl> for
    // the default db, names lowercased on disk
    val default: java.net.URI = {
      val wh = spark.conf.get("spark.sql.warehouse.dir").stripSuffix("/")
      val dbPart = ident.database.filter(_ != "default")
        .map(d => s"/${d.toLowerCase}.db").getOrElse("")
      java.net.URI.create(
        s"$wh$dbPart/${ident.table.toLowerCase}".replace(" ", "%20"))
    }
    (resolved.toSeq :+ default).distinct.foreach { uri =>
      // only file-scheme (or scheme-less local) locations can be swept here;
      // remote warehouses are out of local reach and DROP TABLE handled them
      if (uri.getScheme == null || uri.getScheme == "file") {
        val p = java.nio.file.Paths.get(
          Option(uri.getPath).filter(_.nonEmpty).getOrElse(uri.toString))
        if (java.nio.file.Files.exists(p)) {
          val walk = java.nio.file.Files.walk(p)
          try {
            import scala.jdk.CollectionConverters._
            walk.iterator().asScala.toSeq.reverse
              .foreach(java.nio.file.Files.delete)
          } finally walk.close()
        }
      }
    }
  }

  /** Join two tables bucketed on their join keys — planned with NO Exchange
    * on either side when bucket counts match.
    */
  def bucketedJoin(spark: SparkSession, leftTable: String, rightTable: String,
                   leftKey: String, rightKey: String): DataFrame =
    spark.table(leftTable).join(spark.table(rightTable),
      org.apache.spark.sql.functions.col(leftKey) ===
        org.apache.spark.sql.functions.col(rightKey))
}
