package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

/** Round-trip fidelity of the format-parameterized sink across parquet, orc,
  * json and csv for a reference sink schema (timestamps + doubles + strings).
  */
class FormatsSpec extends SparkSpec {

  private val schema = Schemas.sinks("eia930_hourly_net_generation_by_energy_source")

  private def sample = {
    val rows = Seq(
      Row(java.sql.Timestamp.valueOf("2026-08-10 01:00:00"), "SUN", 175.5),
      Row(java.sql.Timestamp.valueOf("2026-08-10 02:00:00"), "WND", 50.25),
      Row(java.sql.Timestamp.valueOf("2026-08-10 03:00:00"), "COL", 0.0))
    spark.createDataFrame(spark.sparkContext.parallelize(rows), schema)
  }

  Seq("parquet", "orc", "json", "csv").foreach { fmt =>
    test(s"sink schema round-trips through $fmt") {
      val dir = java.nio.file.Files.createTempDirectory(s"graft_$fmt").toString
      Sinks.writeTable(sample, dir, fmt)
      val back = Sinks.readTable(spark, dir, fmt, schema)
        .orderBy(col("date"))
      assert(back.schema == schema)
      val rows = back.collect()
      assert(rows.length == 3)
      assert(rows(0).getAs[String]("fueltype") == "SUN")
      assert(rows(0).getAs[Double]("value") == 175.5)
      assert(rows(0).getAs[java.sql.Timestamp]("date") ==
        java.sql.Timestamp.valueOf("2026-08-10 01:00:00"))
    }
  }
}
