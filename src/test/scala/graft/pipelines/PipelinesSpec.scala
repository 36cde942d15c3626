package graft.pipelines

import graft.SparkSpec
import graft.sources.{CsvSources, EnvelopeJson, OpenMeteoSource, Schemas}
import graft.sources.EnvelopeJson.FixturePages
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** End-to-end pipeline tests over the canned fixtures (FIXTURES.md §A):
  * fetch (with real stop conditions) -> parse -> transform, asserted against
  * hand-computed goldens including every edge row the fixtures plant.
  */
class PipelinesSpec extends SparkSpec {
  import spark.implicits._

  private def fixture(p: String): String =
    getClass.getResource(s"/fixtures/$p").getPath

  private val cutoff = java.sql.Timestamp.valueOf("2026-08-10 06:00:00")

  private lazy val eia930 = {
    val fuel = EnvelopeJson.parsePages(spark,
      EnvelopeJson.fetchUntilPeriod(new FixturePages(fixture("eia930/fuel"), 12), 12, "2026-08-10T06"),
      Schemas.fuelTypeDataRow)
    val region = EnvelopeJson.parsePages(spark,
      EnvelopeJson.fetchUntilPeriod(new FixturePages(fixture("eia930/region"), 40), 40, "2026-08-10T06"),
      Schemas.regionDataRow)
    val inter = EnvelopeJson.parsePages(spark,
      EnvelopeJson.fetchUntilPeriod(new FixturePages(fixture("eia930/interchange"), 16), 16, "2026-08-10T06"),
      Schemas.interchangeDataRow)
    Eia930Pipeline.transform(fuel, region, inter,
      CsvSources.balancingAuthorities(spark, fixture("eia930/ba.csv")),
      CsvSources.energySources(spark, fixture("eia930/energy.csv")),
      cutoff)
  }

  test("eia930: pagination stops early at the period cutoff") {
    val pages = EnvelopeJson.fetchUntilPeriod(
      new FixturePages(fixture("eia930/fuel"), 12), 12, "2026-08-10T06")
    assert(pages.length == 3) // page3 never fetched: page2's last period passes the cutoff
  }

  test("eia930 cleaner: cutoff is half-open, unknown BAs are filtered, values typed") {
    val cleaned = eia930("eia930_cleaned_hourly_net_generation")
    // 6 hours (T00..T05) x 4 BA-valid rows (CISO x2, ERCO, MISO)
    assert(cleaned.count() == 24)
    assert(cleaned.agg(max($"date")).collect()(0).getTimestamp(0)
      .before(cutoff))
    assert(!cleaned.select("respondent").as[String].collect().contains("NOPE"))
    // 'not-a-number' coerced to null (errors='coerce')
    assert(cleaned.filter($"value".isNull).count() == 6)
  }

  test("eia930 A1: group-sum with pandas all-NaN-group semantics (0.0)") {
    val a1 = eia930("eia930_hourly_net_generation_by_energy_source")
    assert(a1.count() == 18) // 6 hours x 3 fueltypes
    val byFuel = a1.filter($"date" === "2026-08-10 00:00:00")
      .select("fueltype", "value").as[(String, Double)].collect().toMap
    assert(byFuel("SUN") == 175.0) // CISO 100 + ERCO 75; NOPE's 999 filtered
    assert(byFuel("WND") == 50.5)
    assert(byFuel("COL") == 0.0) // all-NaN group sums to 0.0 like pandas
  }

  test("eia930 A2: pivot + dropna removes respondents missing a type") {
    val a2 = eia930("eia930_hourly_respondents_producing_and_generating")
    assert(a2.count() == 12) // 6 hours x {CISO, ERCO}; MISO (D-only) dropped
    assert(!a2.select("respondent").as[String].collect().contains("MISO"))
    val r = a2.filter($"respondent" === "CISO").limit(1).collect()(0)
    assert(r.getAs[Double]("d") == 10.0 && r.getAs[Double]("df") == 11.0 &&
      r.getAs[Double]("ng") == 12.0 && r.getAs[Double]("ti") == 1.0)
  }

  test("eia930 A3: pivot by date keeps partial rows and sums across respondents") {
    val a3 = eia930("eia930_hourly_statistics_by_response_type")
    assert(a3.count() == 6)
    val r = a3.orderBy("date").limit(1).collect()(0)
    assert(r.getAs[Double]("d") == 25.0) // CISO 10 + ERCO 10 + MISO 5
    assert(r.getAs[Double]("ti") == 2.0)
  }

  test("eia930: interchange dataset dispatches the semi-join on fromba") {
    val inter = eia930("eia930_cleaned_hourly_interchange_by_neighboring_ba")
    assert(inter.count() == 6) // ZZZZ rows filtered; 6 hours of CISO
    assert(inter.select("fromba").distinct().as[String].collect().toSeq == Seq("CISO"))
  }

  test("eia7a: desc pagination stops when the period leaves the window; cleaner hygiene") {
    val customsPages = EnvelopeJson.fetchWhilePeriodEquals(
      new FixturePages(fixture("eia7a/customs"), 4), 4, "2026-Q1")
    assert(customsPages.length == 2)
    val out = Eia7aPipeline.transform(
      EnvelopeJson.parsePages(spark, customsPages, Schemas.coalImportsExportsRow),
      EnvelopeJson.parsePages(spark,
        EnvelopeJson.fetchWhilePeriodEquals(new FixturePages(fixture("eia7a/mine"), 1), 1, "2026-Q1"),
        Schemas.coalShipmentReceiptsRow),
      "2026-Q1")

    val ie = out("eia7a_cleaned_quarterly_coal_imports_and_exports")
    assert(ie.count() == 1) // Total row, null price, bad price, wrong quarter all dropped
    val r = ie.collect()(0)
    assert(r.getAs[String]("customs_district_description") == "Buffalo")
    assert(r.getAs[Double]("price") == 120.5 && r.getAs[Double]("quantity") == 1000.0)
    assert(r.getAs[java.sql.Timestamp]("date") ==
      java.sql.Timestamp.valueOf("2026-01-01 00:00:00")) // quarter start

    val sh = out("eia7a_cleaned_quarterly_coal_shipment_receipts")
    assert(sh.count() == 1)
    val m = sh.collect()(0)
    assert(m.getAs[String]("mine_county_name") == "Not Specified") // fillna
    assert(m.getAs[Int]("mine_mshaid") == 4601234) // INT-typed sink column
  }

  test("eia814: fetch-until-empty, month-end snap, typed quantity") {
    val pages = EnvelopeJson.fetchUntilEmpty(new FixturePages(fixture("eia814"), 1), 1)
    assert(pages.length == 3) // two data pages + the empty terminator
    val out = Eia814Pipeline.transform(
      EnvelopeJson.parsePages(spark, pages, Schemas.crudeOilImportsRow))(
      "eia814_cleaned_monthly_crude_oil_imports")
    assert(out.count() == 2)
    val dates = out.select("date").as[java.sql.Timestamp].collect().toSet
    assert(dates == Set(java.sql.Timestamp.valueOf("2026-05-31 00:00:00")))
    assert(out.select("quantity").as[Double].collect().toSet == Set(5500.0, 2100.0))
  }

  private lazy val weather: Map[String, DataFrame] = {
    val bodies = (0 to 5).map(i =>
      java.nio.file.Files.readString(java.nio.file.Paths.get(fixture(s"openmeteo/loc$i.json"))))
    OpenMeteoPipeline.transform(
      OpenMeteoSource.parseResponses(spark, bodies),
      CsvSources.coordinates(spark, fixture("openmeteo/coords.csv")))
  }

  test("openmeteo: columnar arrays explode to hourly rows; short location tolerated") {
    val cleaned = weather("openmeteo_cleaned_weather")
    assert(cleaned.count() == 132) // 5 x 24 + 1 x 12
    assert(cleaned.columns.length == 3 + 30)
    // planted NaN: loc2's temperature_2m[5]
    assert(cleaned.filter($"temperature_2m".isNull).count() == 1)
  }

  test("openmeteo: per-state-per-hour mean via the state JOIN (not positional)") {
    val means = weather("openmeteo_weather_means_per_hour")
    assert(means.count() == 48) // 2 states x 24 hours — short location doesn't corrupt grouping
    val cleaned = weather("openmeteo_cleaned_weather")
    // cross-check one group against a manual mean over raw rows
    val h0 = java.sql.Timestamp.valueOf("2025-08-07 00:00:00")
    val manual = cleaned.filter($"date" === h0 && $"latitude" < 40.0)
      .agg(avg($"temperature_2m")).collect()(0).getDouble(0)
    val fromPipeline = means.filter($"date" === h0 && $"state" === "Alabama")
      .select("temperature_2m").as[Double].collect()(0)
    assert(math.abs(manual - fromPipeline) < 1e-12)
    // NaN skipped like pandas: Alabama hour 5 averages the 2 non-null values
    val h5 = java.sql.Timestamp.valueOf("2025-08-07 05:00:00")
    assert(!means.filter($"date" === h5 && $"state" === "Alabama")
      .select("temperature_2m").as[Double].collect()(0).isNaN)
  }

  test("openmeteo: deviations are SAMPLE stddev; 2-row groups defined, 1-row null") {
    val dev = weather("openmeteo_weather_deviations_per_hour")
    assert(dev.count() == 48)
    // Alaska hours 12-23 have only 2 locations (loc5 short) -> stddev defined
    val h13 = java.sql.Timestamp.valueOf("2025-08-07 13:00:00")
    val v = dev.filter($"date" === h13 && $"state" === "Alaska")
      .select("temperature_2m").as[Double].collect()
    assert(v.length == 1 && !v(0).isNaN)
  }
}
