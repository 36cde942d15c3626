package graft.sources

import graft.SparkSpec

class CsvSourcesSpec extends SparkSpec {
  import spark.implicits._

  test("S6: stamp cache refetches only when the stamp changes") {
    val dir = java.nio.file.Files.createTempDirectory("graft_cache").toString
    var loads = 0
    def loadRef() = { loads += 1; Seq(("CISO", "x"), ("ERCO", "y")).toDF("code", "name") }

    val first = CsvSources.cachedByStamp(spark, dir, "Mon, 01 Jan 2026")(loadRef())
    assert(first.count() == 2 && loads == 1)
    // same stamp: served from the parquet cache, upstream not touched
    CsvSources.cachedByStamp(spark, dir, "Mon, 01 Jan 2026")(loadRef()).count()
    assert(loads == 1)
    // changed Last-Modified: refetch
    CsvSources.cachedByStamp(spark, dir, "Tue, 02 Jan 2026")(loadRef()).count()
    assert(loads == 2)
  }
}
