package graft.sources.v2

import graft.SparkSpec
import graft.sources.{EnvelopeJson, Schemas}
import graft.sources.EnvelopeJson.FixturePages
import org.apache.spark.sql.execution.ExplainMode

class PagesDataSourceSpec extends SparkSpec {

  private def pagesDir: String =
    getClass.getResource("/fixtures/eia930/fuel").getPath

  private def readV2 = spark.read.format("graft-pages")
    .schema(Schemas.fuelTypeDataRow).load(pagesDir)

  test("one partition per page; rows equal the driver-side envelope parse") {
    val v2 = readV2
    assert(v2.rdd.getNumPartitions == 4) // 4 page files -> 4 parallel partitions
    val viaDriver = EnvelopeJson.parsePages(spark,
      EnvelopeJson.fetchUntilEmpty(new FixturePages(pagesDir, 12), 12),
      Schemas.fuelTypeDataRow)
    val a = v2.collect().map(_.toSeq).toSet
    val b = viaDriver.collect().map(_.toSeq).toSet
    assert(a == b)
    assert(a.nonEmpty)
  }

  test("non-string schema fields fail fast with an actionable message") {
    val badSchema = new org.apache.spark.sql.types.StructType()
      .add("period", "string").add("value", "double")
    val e = intercept[IllegalArgumentException] {
      spark.read.format("graft-pages").schema(badSchema).load(pagesDir).collect()
    }
    assert(e.getMessage.contains("value: double"))
  }

  test("column pruning pushes into the source (reference's data[n] params)") {
    val pruned = readV2.select("period", "value")
    val plan = pruned.queryExecution
      .explainString(ExplainMode.fromString("formatted"))
    assert(plan.contains("pruned to [period,value]"), plan)
    assert(pruned.collect().forall(_.length == 2))
  }
}
