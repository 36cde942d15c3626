package graft.apps

import graft.SparkSpec
import org.apache.spark.sql.functions._

class CorpusAppSpec extends SparkSpec {
  import spark.implicits._

  test("curate: language filter, quality gate, dedup, metadata columns") {
    val docs = graft.core.Tables.documents(spark, sf)
    val (curated, stats) = CorpusApp.curate(spark, docs,
      keepLangs = Set("en", "de", "es", "fr", "zh"), minQuality = 0.0)
    // permissive gates: only dedup removes rows
    assert(stats.input == 500 && stats.langKept == 500 && stats.qualityKept == 500)
    assert(stats.deduped <= stats.qualityKept)
    assert(curated.columns.toSet.contains("n_tokens"))
    assert(curated.columns.toSet.contains("quality"))
    // kept docs are unique by fingerprint
    val n = curated.count()
    assert(curated.select("fp").distinct().count() == n)
  }

  test("curate: strict quality gate actually drops rows") {
    val docs = graft.core.Tables.documents(spark, sf)
    val (_, stats) = CorpusApp.curate(spark, docs,
      keepLangs = Set("en", "de", "es", "fr", "zh"), minQuality = 0.9)
    assert(stats.qualityKept < stats.langKept)
  }
}
