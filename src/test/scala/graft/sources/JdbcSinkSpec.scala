package graft.sources

import graft.SparkSpec

/** S10 integration test against embedded Derby (on the Spark classpath) —
  * exercises the real `df.write.jdbc` path the reference replaces psycopg2
  * execute_values with.
  */
class JdbcSinkSpec extends SparkSpec {
  import spark.implicits._

  private val url = "jdbc:derby:memory:graftdb;create=true"
  private def props = {
    val p = new java.util.Properties()
    p.setProperty("driver", "org.apache.derby.jdbc.EmbeddedDriver")
    p
  }

  test("S10: JDBC append writes rows; a second append appends (reference parity)") {
    val df = Seq(("SUN", "Solar"), ("WND", "Wind")).toDF("code", "name")
    Sinks.jdbcAppend(df, url, "energy_sources", props)
    val once = spark.read.jdbc(url, "energy_sources", props)
    assert(once.count() == 2)
    assert(once.columns.map(_.toLowerCase).sorted.toSeq == Seq("code", "name"))
    // blind append is NOT idempotent — documented reference behavior
    Sinks.jdbcAppend(df, url, "energy_sources", props)
    assert(spark.read.jdbc(url, "energy_sources", props).count() == 4)
  }
}
