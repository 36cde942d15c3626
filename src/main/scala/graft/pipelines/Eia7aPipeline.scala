package graft.pipelines

import graft.core.Naming
import graft.operators.EtlOps
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** EIA-7A quarterly coal pipeline (EIA7APipelineQuarterlyData.py): two
  * endpoints (imports/exports, shipment receipts) through a shared cleaner.
  * Deterministic: the target quarter label ("YYYY-Qn", :76) is a parameter.
  */
object Eia7aPipeline {

  /** The cleaner (:74-92): drop null/unparseable price, lossy date parse,
    * endpoint-dispatched hygiene ("Total" rows out for customs data,
    * county-name fill for mine data, :85-88), then keep one quarter (:90).
    */
  def clean(pages: DataFrame, quarter: String): DataFrame = {
    // "YYYY-Qn" -> quarter-start timestamp (pandas to_datetime accepts the
    // quarter form natively; Spark's pattern set has no quarter parse letter,
    // so decompose — invalid shapes coerce to null, like errors='coerce').
    val quarterStart = when(col("date").rlike("^[0-9]{4}-Q[1-4]$"),
      expr("make_timestamp(CAST(substring(date, 1, 4) AS INT), " +
        "(CAST(substring(date, 7, 1) AS INT) - 1) * 3 + 1, 1, 0, 0, 0)"))
    val base = pages.withColumnRenamed("period", "date")
      .na.drop(Seq("price"))
      .filter(expr("try_cast(price AS DOUBLE)").isNotNull)
      .withColumn("date", quarterStart)
    val dispatched =
      if (base.columns.contains("customsDistrictId"))
        EtlOps.notEqual("customsDistrictDescription", "Total")(base)
      else
        EtlOps.fillNulls(Map("mineCountyName" -> "Not Specified"))(base)
    EtlOps.quarterEquals("date", quarter)(dispatched)
  }

  /** Transform stage -> sink-named, snake-cased, numerically-typed frames. */
  def transform(importExportPages: DataFrame, shipmentPages: DataFrame,
                quarter: String): Map[String, DataFrame] = {
    val ie = clean(importExportPages, quarter)
      .withColumn("price", expr("try_cast(price AS DOUBLE)"))
      .withColumn("quantity", expr("try_cast(quantity AS DOUBLE)"))
    val sh = clean(shipmentPages, quarter)
      .withColumn("mineMSHAID", expr("try_cast(mineMSHAID AS INT)"))
      .withColumn("mineCountyId", expr("try_cast(mineCountyId AS INT)"))
      .withColumn("plantId", expr("try_cast(plantId AS INT)"))
      .withColumn("ash-content", expr("try_cast(`ash-content` AS DOUBLE)"))
      .withColumn("heat-content", expr("try_cast(`heat-content` AS DOUBLE)"))
      .withColumn("price", expr("try_cast(price AS DOUBLE)"))
      .withColumn("quantity", expr("try_cast(quantity AS DOUBLE)"))
      .withColumn("sulfur-content", expr("try_cast(`sulfur-content` AS DOUBLE)"))
    Map(
      "eia7a_cleaned_quarterly_coal_imports_and_exports" -> ie,
      "eia7a_cleaned_quarterly_coal_shipment_receipts" -> sh
    ).map { case (k, v) => k -> Naming.snakeCaseColumns(v) }
  }

  /** F4 — quarter label for `monthsAgo` months before `today` (:51,:76). */
  def quarterLabelFor(today: java.time.LocalDate, monthsAgo: Int): String = {
    val d = today.minusMonths(monthsAgo)
    s"${d.getYear}-Q${(d.getMonthValue - 1) / 3 + 1}"
  }
}
