package graft.apps

import graft.SparkSpec
import graft.operators.{Html, TextOps}
import org.apache.spark.sql.execution.ExplainMode
import org.apache.spark.sql.functions._

/** web_app's cross-stage guarantees that the manifest hash can't show: the
  * DSv2 source subtree keeps its pushdown/pruning UNDER the composed
  * filters (the returned frame's plan starts at the landed shards, so
  * PLANS.md never sees the scan), and the robots -> extract -> fix chain
  * behaves stage-exactly on a hand fixture.
  */
class WebAppSpec extends SparkSpec {

  private def utf8(s: String) = s.getBytes(java.nio.charset.StandardCharsets.UTF_8)

  private def page(meta: String, body: String): String =
    s"""<html><head>$meta</head><body><h1>t</h1><nav><a href="/">homepage navigation links</a></nav><p>$body</p><p>tiny</p></body></html>"""

  test("source subtree under the composed gates: type pushed, payload-only read, warcinfo skipped") {
    import graft.sources.v2.WarcIo
    val dir = java.nio.file.Files.createTempDirectory("graft-webapp-spec").toString
    val body = (1 to 30).map(i => s"word$i").mkString(" ")
    WarcIo.write(s"$dir/part-0.warc.gz", Seq(
      WarcIo.Record(null, "2024-01-01T00:00:00Z", "warcinfo",
        "application/warc-fields", utf8("info")),
      WarcIo.Record("https://h/doc/1", "2024-01-01T00:00:00Z", "response",
        "text/html", utf8(page("", body))),
      WarcIo.Record("https://h/doc/2", "2024-01-01T00:00:00Z", "response",
        "text/html", utf8(page("<meta name=robots content=noindex>", body))),
      WarcIo.Record("https://h/doc/3", "2024-01-01T00:00:00Z", "response",
        "text/html", utf8(page("", body + " x\u00C3\u00A9\u00E2\u20AC\u2122y")))),
      gzip = true)
    val pages = spark.read.format("graft-warc").load(dir)
      .filter(col("record_type") === "response")
      .select(regexp_extract(col("url"), "/doc/(\\d+)$", 1).cast("long").as("doc_id"),
        col("payload").cast("string").as("page"))
      .filter(not(Html.robotsNoindex(col("page"))))
    // the scan the 100 TB run pays: record_type EqualTo pushed into the
    // source (warcinfo members' payloads are SKIPPED, headers only), and
    // column pruning drops warc_date/mime/content_length — record_type
    // itself rides along for Spark's residual IsNotNull only
    val plan = pages.queryExecution.explainString(ExplainMode.fromString("formatted"))
    assert(plan.contains("pushed [record_type = response]"), plan)
    assert(plan.contains("pruned to [url,record_type,payload]"), plan)
    // robots gate: the noindex page (doc 2) is out before extraction
    assert(pages.select("doc_id").collect().map(_.getLong(0)).sorted.toSeq == Seq(1L, 3L))
    // extract + fix: doc 3's planted cp1252 mojibake is repaired in the
    // kept main text; doc 1 passes through byte-identical
    val fixed = Html.mainContent(pages, "doc_id", "page", minChars = 25, maxLinkPct = 30)
      .select(col("sid"), TextOps.fixText(col("main")).as("text"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(fixed(1L) == body)
    assert(fixed(3L) == body + " x\u00E9\u2019y", fixed(3L))
  }
}
