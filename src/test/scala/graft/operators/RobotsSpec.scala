package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** RFC 9309 semantics the t36 fixture cannot reach: an EMPTY named group
  * (selection without fallback), an exact Allow/Disallow length tie, and
  * the no-rules host. The t36 oracle covers the parse/longest-match core.
  */
class RobotsSpec extends SparkSpec {
  import spark.implicits._

  private def gateOn(robotsTxt: Map[Int, String],
                     urls: Seq[(Long, Int, String)]): Map[Long, (Boolean, Long)] = {
    val rob = robotsTxt.toSeq.toDF("host", "txt")
    val u = urls.toDF("id", "host", "path")
    Robots.gate(u, Robots.compiledRules(rob, "host", "txt", "graftbot"),
        "id", "host", "path")
      .select(col("id"), col("allowed"), col("rule_len"))
      .as[(Long, Boolean, Long)].collect()
      .map { case (i, a, l) => i -> ((a, l)) }.toMap
  }

  test("empty named group selects (allow-all), does NOT fall back to *") {
    // RFC 9309 §2.2.1: a crawler matched to a group obeys THAT group even
    // when it carries no rules; the * group is ignored entirely.
    val out = gateOn(
      Map(0 -> "User-agent: graftbot\nUser-agent: *\nDisallow: /"),
      Seq((1L, 0, "/anything")))
    // graftbot and * share one stacked run here, so the Disallow applies...
    assert(out(1L) == ((false, 1L)))
    // Blank lines do NOT terminate a group (RFC 9309 §2.1 ABNF treats
    // emptyline as insignificant inside a group), so the stacked run above
    // also holds with a blank between the two User-agent lines.
    val out1b = gateOn(
      Map(0 -> "User-agent: graftbot\n\nUser-agent: *\nDisallow: /"),
      Seq((1L, 0, "/anything")))
    assert(out1b(1L) == ((false, 1L)))
    // ...but a SEPARATE empty graftbot group (closed by the * group's own
    // rules, here trailing at EOF) means allow-all for graftbot.
    val out2 = gateOn(
      Map(0 -> "User-agent: *\nDisallow: /\nUser-agent: graftbot"),
      Seq((1L, 0, "/anything")))
    assert(out2(1L) == ((true, 0L)))
  }

  test("longest match wins; Allow wins an exact length tie") {
    val rob = Map(0 ->
      "User-agent: *\nDisallow: /a/long\nAllow: /a/tied\nDisallow: /a/tied\nAllow: /a")
    val out = gateOn(rob, Seq(
      (1L, 0, "/a/long/x"),  // Disallow len 7 beats Allow len 2
      (2L, 0, "/a/tied/x"),  // exact 7-7 tie -> Allow wins
      (3L, 0, "/a/other"),   // only Allow /a matches
      (4L, 0, "/elsewhere")))// no match -> allowed
    assert(out(1L) == ((false, 7L)))
    assert(out(2L) == ((true, 7L)))
    assert(out(3L) == ((true, 2L)))
    assert(out(4L) == ((true, 0L)))
  }

  test("host with no robots.txt rules at all is fully allowed") {
    val out = gateOn(Map(0 -> "# nothing but comments\nSitemap: /s.xml"),
      Seq((1L, 0, "/x")))
    assert(out(1L) == ((true, 0L)))
  }

  test("parseSitemaps: block-wise extraction survives missing optional tags; missing <loc> fails loud") {
    // entry 0 has everything, entry 1 omits <lastmod> — a parallel-arrays
    // parse would shift entry 1's fields onto entry 0's lastmod
    val xml = "<urlset>" +
      "<url><loc>https://a/p0</loc><lastmod>2024-01-01</lastmod>" +
      "<changefreq>daily</changefreq></url>" +
      "<url><loc>https://a/p1</loc><changefreq>weekly</changefreq></url>" +
      "<url><loc>https://a/p2</loc><lastmod>2024-02-01</lastmod></url>" +
      "</urlset>"
    val rows = Robots.parseSitemaps(Seq((7, xml)).toDF("host", "xml"),
        "host", "xml")
      .orderBy("pos")
      .select(col("pos"), col("loc"), col("lastmod"), col("changefreq"))
      .as[(Long, String, Option[String], Option[String])].collect().toSeq
    assert(rows == Seq(
      (0L, "https://a/p0", Some("2024-01-01"), Some("daily")),
      (1L, "https://a/p1", None, Some("weekly")),
      (2L, "https://a/p2", Some("2024-02-01"), None)))
    val bad = "<urlset><url><lastmod>2024-01-01</lastmod></url></urlset>"
    val e = intercept[Exception] { // SparkRuntimeException is package-private
      Robots.parseSitemaps(Seq((7, bad)).toDF("host", "xml"), "host", "xml")
        .collect()
    }
    assert(e.getMessage.contains("no <loc>"))
  }
}
