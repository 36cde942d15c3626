package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class UrlOpsSpec extends SparkSpec {
  import spark.implicits._

  private def canon(urls: String*): Seq[String] =
    urls.toDF("u").select(UrlOps.canonicalizeUrl(col("u")).as("c"))
      .as[String].collect().toSeq

  test("canonicalization by hand: case, default port, trailing slash, tracking, fragment") {
    assert(canon("HTTPS://WWW.Ex.COM:443/a/b/?utm_source=x&b=2&a=1#frag") ==
      Seq("https://www.ex.com/a/b?a=1&b=2"))
    assert(canon("http://Host.com:80/") == Seq("http://host.com/"))
    // non-default port kept; http's default is NOT https' default
    assert(canon("http://h.com:8080/x", "https://h.com:80/x") ==
      Seq("http://h.com:8080/x", "https://h.com:80/x"))
    // empty path -> "/"; bare host with only tracking params -> "/"
    assert(canon("https://h.com", "https://h.com?fbclid=abc&gclid=1") ==
      Seq("https://h.com/", "https://h.com/"))
    // path/query case is significant and preserved (RFC 3986)
    assert(canon("https://h.com/Path?Q=V") == Seq("https://h.com/Path?Q=V"))
    // utm_* wildcard, valueless tracking param, doubled trailing slash
    assert(canon("https://h.com/a//?utm_campaign&z=1") ==
      Seq("https://h.com/a?z=1"))
  }

  test("scheme-less inputs fixpoint and keep their real host (ADVICE r17 #1)") {
    // bare crawl junk degrades to the "://host/..." form ONCE, then holds
    assert(canon("host.com/a", "Host.COM:80/a/?utm_x=1#f") ==
      Seq("://host.com/a", "://host.com:80/a"))
    val once = canon("host.com/a", "://host.com/a", "h.com?b=2&a=1")
    assert(canon(once: _*) == once, s"degraded form not a fixpoint: $once")
    // urlHost resolves the degraded form's host, not ""
    val hosts = Seq("://host.com/a", "https://other.org/x").toDF("c")
      .select(UrlOps.urlHost(col("c"))).as[String].collect().toSeq
    assert(hosts == Seq("host.com", "other.org"))
  }

  test("canonical form is idempotent over messy inputs") {
    val messy = Seq(
      "HTTPS://WWW.Ex.COM:443/a/b/?utm_source=x&b=2&a=1#frag",
      "http://Host.com:80//",
      "https://h.com:8443/Path/?z=9&utm_x=1&a",
      "ftp://Files.Example.org:21/pub/",
      "https://h.com?gclid=1",
      "http://a.b.c.d/e?f=g&h=i#j")
    val once = canon(messy: _*)
    val twice = canon(once: _*)
    assert(once == twice, s"not idempotent:\n once=$once\n twice=$twice")
  }

  test("tracking-param removal is order-insensitive") {
    val perms = Seq(
      "https://h.com/p?utm_a=1&b=2&a=1",
      "https://h.com/p?b=2&a=1&utm_a=9",
      "https://h.com/p?a=1&utm_a=0&b=2",
      "https://h.com/p?a=1&b=2")
    assert(canon(perms: _*).distinct == Seq("https://h.com/p?a=1&b=2"))
  }

  test("canonicalDedup keeps the minimum id per canonical form") {
    val df = Seq(
      (10L, "https://A.com/x/?utm_s=1"),
      (3L, "HTTPS://a.COM:443/x"),
      (7L, "https://b.com/y"))
      .toDF("id", "url")
    val out = UrlOps.canonicalDedup(df, "id", "url")
      .orderBy("url_canonical").collect()
    assert(out.map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq ==
      Seq(("https://a.com/x", 3L, 2L), ("https://b.com/y", 7L, 1L)))
  }

  test("hostRollupIngestBatch: replay-identity; verdict derives from merged sums") {
    val junk = "@@@@ #### !!!! %%%%"
    val good = ("the quick brown fox is on a table and " * 12).trim
    val path = java.nio.file.Files.createTempDirectory("graft-hosts")
      .toString + "/state"
    val b0 = Seq((1L, "https://h.com/a", junk)).toDF("id", "url", "text")
    val b1 = Seq((2L, "https://h.com/b", good), (3L, "https://h.com/c", good))
      .toDF("id", "url", "text")
    UrlOps.hostRollupIngestBatch(b0, 0L, path, "url", "text")
    UrlOps.hostRollupIngestBatch(b1, 1L, path, "url", "text")
    def serve() = UrlOps.servedHostRollup(spark, path, 0.5)
      .collect().map(_.toString).sorted.toSeq
    val before = serve()
    // injected retry: batch 1 replays after its write already landed
    UrlOps.hostRollupIngestBatch(b1, 1L, path, "url", "text")
    assert(serve() == before, "a replayed batch must change nothing")
    // batch 0 ALONE is blocked (junk mean << 0.5), but the verdict must
    // recompute on the MERGED sums: two good docs pull the mean back up
    val row = UrlOps.servedHostRollup(spark, path, 0.5).collect().head
    assert(row.getAs[Long]("n_docs") == 3L)
    assert(!row.getAs[Boolean]("blocked"),
      "verdict must derive from merged sums, never merge per-batch verdicts")
  }

  test("piiByHost: exact match counts and the cross-multiplied risk verdict") {
    val dirty = "reach me at bob@example.com or 555-1234 via https://x.org/p"
    val clean = ("token " * 99).trim + " end"     // 100 words, zero PII
    val df = Seq(
      (1L, "https://Dirty.com/a", dirty), (2L, "https://dirty.com/b", dirty),
      (3L, "https://clean.com/a", clean))
      .toDF("id", "url", "text")
    val out = UrlOps.piiByHost(df, "url", "text",
        maxPerMillionTokens = 10000L)
      .orderBy("host").collect()
    assert(out.map(_.getAs[String]("host")).toSeq ==
      Seq("clean.com", "dirty.com"))
    val d = out(1)
    assert(d.getAs[Long]("n_pii") == 6L)   // 3 patterns x 2 docs
    assert(d.getAs[Boolean]("pii_risky")) // 6e6 > 22 tokens x 1e4
    assert(out(0).getAs[Long]("n_pii") == 0L)
    assert(!out(0).getAs[Boolean]("pii_risky"))
  }

  test("hostRollup: exact counts and the cross-multiplied block verdict") {
    val junk = "@@@@ #### !!!! %%%%"            // punct-heavy: quality << 0.5
    val good = (("the quick brown fox is on a table and " * 12).trim)
    val df = Seq(
      (1L, "https://Low.com/a", junk), (2L, "https://low.com/b/", junk),
      (3L, "https://ok.com/a", good))
      .toDF("id", "url", "text")
    val out = UrlOps.hostRollup(df, "url", "text", minMeanQuality = 0.5)
      .orderBy("host").collect()
    assert(out.map(_.getAs[String]("host")).toSeq == Seq("low.com", "ok.com"))
    val low = out(0)
    assert(low.getAs[Long]("n_docs") == 2L)
    assert(low.getAs[Long]("n_tokens") == 8L)
    assert(low.getAs[Boolean]("blocked"))
    assert(!out(1).getAs[Boolean]("blocked"))
  }
}
