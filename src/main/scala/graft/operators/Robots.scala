package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** robots.txt parsing + per-URL Allow/Disallow evaluation — the CRAWL-side
  * compliance gate (t35/`Html.robotsPolicy` covers the per-PAGE meta tag;
  * this covers the per-HOST exclusion file that decides whether the fetch
  * was lawful at all). Reference behavior: the reference pipelines consume
  * public REST APIs and never crawl, so this is §8 beyond-reference
  * surface, modeled on RFC 9309 (Robots Exclusion Protocol).
  *
  * Semantics implemented (RFC 9309 §2, with one documented narrowing):
  *  - lines are `directive: value`, case-insensitive directive names,
  *    `#` starts a comment, unknown directives (crawl-delay, sitemap) are
  *    ignored;
  *  - a GROUP is a contiguous run of `User-agent:` lines followed by
  *    rules; every agent in the run owns every rule of the run;
  *  - group selection: if any group names the crawler's product token
  *    exactly (case-insensitive), the crawler obeys the UNION of its named
  *    groups and ignores `*` groups entirely — even when the named groups
  *    are EMPTY (an empty named group means allow-all, not fall-back);
  *  - rule match: literal path prefix (RFC wildcards `*`/`$` are out of
  *    scope here and documented as such — the fixture never uses them);
  *  - decision: longest matching rule wins; on a length tie Allow wins;
  *    an empty rule value matches nothing; no match means allowed.
  *
  * Scale posture (100 TB): rules are per-host and RFC-bounded (crawlers
  * MUST only parse the first 500 KiB of a robots.txt), so the compiled
  * rule table is a few rows per distinct host — the URL-side join is a
  * host-keyed equi-join with a bounded per-host fanout (#rules), never a
  * cartesian; a hot host amplifies by #rules(host), not by URL count. The
  * line-parse window partitions by host over those same bounded line
  * counts (never per-doc-unique values). The verdict aggregate is a
  * url-keyed `max_by` — one shuffle, map-side combinable.
  */
object Robots {

  /** Parse robots.txt bodies into (agents, rules):
    * agents = (host, run, agent) one row per User-agent line,
    * rules  = (host, run, allow, rpath, plen) one row per non-empty
    * Allow/Disallow line, keyed by the contiguous User-agent run that owns
    * it. `host` is whatever key column identifies the file's origin.
    */
  def parseRobots(robots: DataFrame, hostCol: String,
                  txtCol: String): (DataFrame, DataFrame) = {
    val lines = robots
      .select(col(hostCol).as("host"),
        posexplode(split(col(txtCol), "\n")).as(Seq("pos", "line")))
      .select(col("host"), col("pos"),
        trim(substring_index(col("line"), "#", 1)).as("clean"))
      .filter(col("clean") =!= "")
      .select(col("host"), col("pos"),
        lower(regexp_extract(col("clean"), "^([A-Za-z-]+)\\s*:", 1)).as("d"),
        trim(regexp_extract(col("clean"), "^[A-Za-z-]+\\s*:(.*)$", 1)).as("v"))
      .filter(col("d").isin("user-agent", "allow", "disallow"))
    val w = Window.partitionBy("host").orderBy("pos")
    val isUa = col("d") === "user-agent"
    val runStart = isUa && !coalesce(lag(isUa, 1).over(w), lit(false))
    val runs = lines
      .withColumn("rs", runStart.cast("int"))
      .withColumn("run", sum(col("rs")).over(w))
    val agents = runs.filter(isUa)
      .select(col("host"), col("run"), lower(col("v")).as("agent"))
    val rules = runs.filter(!isUa && col("v") =!= "")
      .select(col("host"), col("run"), (col("d") === "allow").as("allow"),
        col("v").as("rpath"), length(col("v")).cast("long").as("plen"))
    (agents, rules)
  }

  /** The effective rule set for one crawler product token: named groups if
    * the host has any (RFC group selection), `*` groups otherwise.
    * Output: (host, allow, rpath, plen).
    */
  def compiledRules(robots: DataFrame, hostCol: String, txtCol: String,
                    agent: String): DataFrame = {
    val (agents, rules) = parseRobots(robots, hostCol, txtCol)
    val hostAgent = agents.groupBy("host")
      .agg(max((col("agent") === agent).cast("int")).as("has_named"))
    rules
      .join(agents, Seq("host", "run"))
      .join(hostAgent, Seq("host"))
      .filter(col("agent") ===
        when(col("has_named") === 1, lit(agent)).otherwise(lit("*")))
      .select(col("host"), col("allow"), col("rpath"), col("plen"))
  }

  /** Evaluate URLs against compiled rules: longest-prefix match, Allow
    * wins length ties, no match = allowed. Output keeps every URL row and
    * adds `allowed` + `rule_len` (winning rule's length, 0 when no rule
    * matched). The tie-break is encoded arithmetically (`plen*2 + allow`)
    * so the Spark `max_by` and the DuckDB `arg_max` order identically;
    * equal keys can only carry equal decisions (the value's parity IS the
    * decision bit).
    */
  def gate(urls: DataFrame, compiled: DataFrame, idCol: String,
           hostCol: String, pathCol: String): DataFrame = {
    val c = compiled.select(col("host").as("_rb_host"), col("allow"),
      col("rpath"), col("plen"))
    val verdict = urls
      .join(c, urls(hostCol) === c("_rb_host"))
      .filter(col(pathCol).startsWith(col("rpath")))
      .groupBy(col(idCol))
      .agg(
        max_by(col("allow"), col("plen") * 2 + col("allow").cast("long"))
          .as("dec"),
        max(col("plen")).as("best_len"))
    urls
      .join(verdict, Seq(idCol), "left")
      .select(col(idCol), col(hostCol), col(pathCol),
        coalesce(col("dec"), lit(true)).as("allowed"),
        coalesce(col("best_len"), lit(0L)).as("rule_len"))
  }

  /** sitemaps.org XML parse — the crawl-frontier feed next to the robots
    * gate: one row per `<url>` entry, in document order, with the
    * mandatory `<loc>` and the OPTIONAL `<lastmod>`/`<changefreq>` (NULL
    * when absent). Entries are extracted BLOCK-WISE (each `<url>…</url>`
    * is its own row before the field extracts), so a missing optional tag
    * can never mis-align fields across entries — the parallel-arrays trap.
    * A `<url>` block with no `<loc>` is spec-invalid and fails loud.
    *
    * Scale posture: per-row regex work fused into the scan (sitemap files
    * are host-sized, RFC-capped at 50k URLs / 50 MB), one generator
    * explode, no shuffle.
    */
  def parseSitemaps(sitemaps: DataFrame, hostCol: String,
                    xmlCol: String): DataFrame = {
    val blocks = sitemaps
      .select(col(hostCol).as("host"),
        posexplode(expr(
          s"regexp_extract_all($xmlCol, '(?s)<url>(.*?)</url>', 1)"))
          .as(Seq("pos", "block")))
    val loc = regexp_extract(col("block"), "<loc>([^<]*)</loc>", 1)
    blocks.select(col("host"), col("pos").cast("long").as("pos"),
      when(loc === "", raise_error(concat(lit("sitemap: <url> entry "),
          col("pos").cast("string"), lit(" on host "),
          col("host").cast("string"), lit(" has no <loc> — spec-invalid"))))
        .otherwise(loc).as("loc"),
      nullif(regexp_extract(col("block"), "<lastmod>([^<]*)</lastmod>", 1),
        lit("")).as("lastmod"),
      nullif(regexp_extract(col("block"),
        "<changefreq>([^<]*)</changefreq>", 1), lit("")).as("changefreq"))
  }
}
