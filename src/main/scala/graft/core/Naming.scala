package graft.core

import org.apache.spark.sql.DataFrame

/** Column-name hygiene (reference P14/F1: renameColumnsToSnakeCase,
  * EIA930PipelineHourlyData.py:145-155 — two regex passes + lowercase).
  *
  * This is driver-side metadata work: `toDF` rewrites the schema without
  * touching data, so it costs nothing at any scale.
  */
object Naming {
  private val seps = "[-\\s/]+".r
  private val camel = "([a-z0-9])([A-Z])".r

  /** `"BA Code"` -> `ba_code`, `"customsDistrictId"` -> `customs_district_id`,
    * `"Region/Country Code"` -> `region_country_code`.
    */
  def toSnakeCase(name: String): String = {
    val sep = seps.replaceAllIn(name, "_")
    camel.replaceAllIn(sep, m => m.group(1) + "_" + m.group(2)).toLowerCase
  }

  def snakeCaseColumns(df: DataFrame): DataFrame =
    df.toDF(df.columns.map(toSnakeCase).toIndexedSeq: _*)
}
