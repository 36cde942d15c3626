package graft.pipelines

import graft.core.Naming
import graft.operators.EtlOps
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** EIA-814 monthly crude-oil imports pipeline (EIA814PipelineMonthlyData.py):
  * the simplest of the four — union pages, parse "YYYY-MM" periods, snap to
  * month end (pd.offsets.MonthEnd(0), :66), snake-case, type the quantity.
  */
object Eia814Pipeline {

  def clean(pages: DataFrame): DataFrame =
    EtlOps.monthEnd("date", "date")(
      pages.withColumnRenamed("period", "date")
        .withColumn("date", try_to_timestamp(col("date"), lit("yyyy-MM"))))
      .withColumn("date", col("date").cast("timestamp"))

  def transform(pages: DataFrame): Map[String, DataFrame] =
    Map("eia814_cleaned_monthly_crude_oil_imports" ->
      Naming.snakeCaseColumns(
        clean(pages).withColumn("quantity", expr("try_cast(quantity AS DOUBLE)"))))
}
