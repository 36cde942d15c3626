package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class FtsIndexSpec extends SparkSpec {
  import spark.implicits._

  private def cleanup(name: String): Unit =
    Seq(FtsIndex.postingsTable(name), FtsIndex.doclensTable(name),
      FtsIndex.metaTable(name))
      .foreach(graft.sources.Bucketing.ensureCleanTable(spark, _))

  test("persisted serve equals from-scratch bm25Rank bit-for-bit, appends included") {
    val name = "spec_rt"
    val docs = graft.core.Tables.documents(spark, sf)
    val terms = Seq("table", "hash", "merge")
    try {
      FtsIndex.writeBm25(docs.filter($"doc_id" % 3 =!= 0), "doc_id", "text",
        name, nBuckets = 4)
      FtsIndex.appendBm25(docs.filter($"doc_id" % 3 === 0), "doc_id", "text",
        name, nBuckets = 4)
      val served = FtsIndex.searchBm25(spark, name, terms, k = 25)
        .as[(Long, Double)].collect().toSeq
      val scratch = TextOps.bm25Rank(docs, "doc_id", "text", terms, k = 25)
        .as[(Long, Double)].collect().toSeq
      assert(served == scratch,
        "served ranking must equal the from-scratch ranking exactly")
      // wrong bucket count on append fails loud (catalog guard), never a
      // silently broken bucketed layout
      intercept[IllegalArgumentException] {
        FtsIndex.appendBm25(docs.limit(1), "doc_id", "text", name,
          nBuckets = 8)
      }
    } finally cleanup(name)
  }

  test("serve scan prunes postings buckets for the queried terms") {
    val name = "spec_prune"
    val docs = graft.core.Tables.documents(spark, sf)
    try {
      FtsIndex.writeBm25(docs, "doc_id", "text", name, nBuckets = 4)
      val plan = FtsIndex.searchBm25(spark, name, Seq("table"), k = 5)
        .queryExecution.explainString(
          org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
      // Spark reports bucket pruning as "SelectedBucketsCount: m out of n"
      val sel = "SelectedBucketsCount: (\\d+) out of 4".r.findFirstMatchIn(plan)
      assert(sel.isDefined, s"no bucket pruning on the postings scan:\n$plan")
      assert(sel.get.group(1).toInt < 4,
        s"one-term query must read fewer than all buckets:\n$plan")
    } finally cleanup(name)
  }

  test("meta stats are additive: appends never rewrite, serve sums the rows") {
    val name = "spec_meta"
    val docs = graft.core.Tables.documents(spark, sf)
    try {
      FtsIndex.writeBm25(docs.filter($"doc_id" % 3 =!= 0), "doc_id", "text",
        name, nBuckets = 4)
      FtsIndex.appendBm25(docs.filter($"doc_id" % 3 === 0), "doc_id", "text",
        name, nBuckets = 4)
      val meta = spark.table(FtsIndex.metaTable(name))
        .as[(Long, Long)].collect()
      assert(meta.length == 2, "one meta row per ingest")
      assert(meta.map(_._1).sum == docs.count(), "doc counts sum to corpus")
    } finally cleanup(name)
  }
}
