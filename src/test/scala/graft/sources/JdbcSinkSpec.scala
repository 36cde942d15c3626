package graft.sources

import graft.SparkSpec

/** S10 end-to-end against an in-process Derby database (on the Spark
  * classpath): the reference's JDBC append (EIA930PipelineHourlyData.py:
  * 158-180) written and read back through a real JDBC driver — covering the
  * dialect mapping, not just the parquet sinks.
  */
class JdbcSinkSpec extends SparkSpec {
  import spark.implicits._

  private lazy val dbDir =
    java.nio.file.Files.createTempDirectory("graft_derby").resolve("db")
  private lazy val url = s"jdbc:derby:$dbDir;create=true"
  private def props = {
    val p = new java.util.Properties()
    p.setProperty("driver", "org.apache.derby.jdbc.EmbeddedDriver")
    p
  }

  test("jdbcAppend writes and reads back through Derby") {
    val df = Seq(
      ("CISO", "2026-08-10T00", 120.5),
      ("ERCO", "2026-08-10T00", 98.0),
      ("MISO", "2026-08-10T01", 75.25)
    ).toDF("respondent", "period", "value")
    Sinks.jdbcAppend(df, url, "net_generation", props)
    val back = spark.read.jdbc(url, "net_generation", props)
    assert(back.columns.map(_.toLowerCase).sorted.toSeq ==
      Seq("period", "respondent", "value"))
    // collect then filter: Spark would push a string predicate down to Derby,
    // which cannot compare the CLOBs its dialect maps StringType to
    val rows = back.collect()
    assert(rows.length == 3)
    val ciso = rows.find(_.getAs[String]("respondent") == "CISO").get
    assert(ciso.getAs[Double]("value") == 120.5)
  }

  test("append is append (reference parity): re-append duplicates rows") {
    val df = Seq(("PJM", "2026-08-10T02", 33.0)).toDF("respondent", "period", "value")
    Sinks.jdbcAppend(df, url, "append_semantics", props)
    Sinks.jdbcAppend(df, url, "append_semantics", props)
    assert(spark.read.jdbc(url, "append_semantics", props).count() == 2)
  }
}
