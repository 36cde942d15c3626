package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** HTML/markup cleanup for crawl corpora — the step every TextOps scorer
  * silently assumes already happened (Gopher rules, quality scores, LM
  * counts are all defined over VISIBLE text; raw crawls are markup).
  * Two operators in the jusText/boilerpipe lineage (Pomikálek 2011;
  * Kohlschütter et al. WSDM 2010), both oracle-exact:
  *
  *  - [[stripHtml]]: tag strip + fixed-entity decode as ONE native
  *    codegen'd kernel ([[graft.plans.HtmlStrip]]).
  *  - [[mainContent]]: block-level boilerplate removal — split on block
  *    tags, score each block by visible length and LINK DENSITY (the
  *    fraction of its visible characters that live inside `<a>` anchors —
  *    nav bars, footers and "related links" rows are mostly anchor text),
  *    keep blocks that are long enough and link-sparse, and reassemble
  *    the survivors in document order.
  *
  * Thresholds are exact integers (density as a cross-multiplied percent,
  * never a float ratio), so DuckDB replays the decision bit-for-bit.
  *
  * Scale shape: everything is per-row Column algebra over one scan —
  * split, per-block strip (native kernel), one regexp anchor erase, then
  * ONE per-doc aggregate whose state is the kept blocks of one document.
  * No corpus-global state, no window, no join except the final id
  * re-attach; cleaning 100 TB of crawl HTML is embarrassingly parallel
  * and this keeps it that way.
  */
object Html {

  /** Block-level split points: opening OR closing forms of the common
    * block/sectioning tags (attributes allowed). Inline markup (`<a>`,
    * `<b>`, `<span>`, …) stays inside its block.
    */
  val BlockTagRe: String =
    "(?i)</?(?:p|div|h[1-6]|li|ul|ol|br|table|tr|td|nav|header|footer|aside|section|article)\\b[^>]*>"

  /** Anchor spans (tag + visible text), non-greedy, case-insensitive,
    * dot-matches-newline — erased to measure a block's NON-link text.
    */
  val AnchorRe: String = "(?is)<a\\b[^>]*>.*?</a>"

  /** Visible text of an HTML fragment (native kernel — see
    * [[graft.plans.HtmlStrip]] for the exact oracle-shared semantics). */
  def stripHtml(c: Column): Column = graft.plans.HtmlStrip.htmlStrip(c)

  /** Main-content extraction: one row per input doc with
    * (sid, n_blocks, n_kept, main, main_len) where `main` is the kept
    * blocks joined by newline in document order. A block is KEPT when its
    * trimmed visible text has at least `minChars` characters AND its
    * anchor-visible characters are at most `maxLinkPct`% of its visible
    * characters. `n_blocks` counts blocks with any visible text at all.
    */
  def mainContent(df: DataFrame, idCol: String, htmlCol: String,
                  minChars: Int, maxLinkPct: Int): DataFrame = {
    require(minChars >= 1, s"minChars must be >= 1, got $minChars")
    require(maxLinkPct >= 0 && maxLinkPct <= 100,
      s"maxLinkPct must be a percent in [0, 100], got $maxLinkPct")
    val blocks = df
      .select(col(idCol).as("sid"),
        posexplode(split(col(htmlCol), BlockTagRe, -1)).as(Seq("bi", "blk")))
      .select(col("sid"), col("bi"),
        stripHtml(col("blk")).as("v0"),
        stripHtml(regexp_replace(col("blk"), AnchorRe, "")).as("vna"))
      .select(col("sid"), col("bi"), trim(col("v0")).as("vis"),
        length(col("v0")).as("nv"),
        // clamped at 0: erasing an anchor can splice an entity apart
        // ('&lt<a>;</a>' -> v0 '<' is SHORTER than vna '&lt'), and a
        // negative anchor-char count must not help a block pass the
        // link-density gate (ADVICE r15)
        greatest(lit(0), length(col("v0")) - length(col("vna"))).as("na"))
      .filter(length(col("vis")) > 0)
    // cross-multiply in LONG: length() is Int, and a giant single-block
    // page (> ~21M visible chars) would overflow na * 100 — ANSI abort or
    // a silently-kept link farm, either way diverging from the BIGINT
    // oracle (r15 review)
    val keep = length(col("vis")) >= minChars &&
      col("na").cast("long") * 100L <= col("nv").cast("long") * lit(maxLinkPct.toLong)
    val agg = blocks.groupBy(col("sid")).agg(
      count(lit(1)).as("n_blocks"),
      sum(when(keep, 1L).otherwise(0L)).as("n_kept"),
      // collect_list skips the nulls of the unmatched when-branch; the
      // struct sorts by (bi, vis) so document order survives the shuffle
      array_join(transform(
        array_sort(collect_list(when(keep, struct(col("bi"), col("vis"))))),
        s => s.getField("vis")), "\n").as("main"))
    df.select(col(idCol).as("sid")).distinct()
      .join(agg, Seq("sid"), "left")
      .select(col("sid"),
        coalesce(col("n_blocks"), lit(0L)).as("n_blocks"),
        coalesce(col("n_kept"), lit(0L)).as("n_kept"),
        coalesce(col("main"), lit("")).as("main"),
        length(coalesce(col("main"), lit(""))).cast("long").as("main_len"))
  }

  /** The page's `<meta name="robots">` directive content, lowercased — ""
    * when the page carries none. Both attribute orders match (name-first
    * and content-first; real crawls have both), tag case and attribute
    * quoting are insensitive, and only the FIRST matching tag counts (the
    * robots-exclusion convention for conflicting tags is out of scope —
    * crawl dedup keeps one). Patterns sit in the Java/RE2 common subset
    * (inline (?is), single [^"'>] content group) so the oracle extracts
    * the identical string.
    */
  def robotsContent(html: Column): Column = {
    // content VALUES match quoted or unquoted (ADVICE r18 #2: legal HTML
    // like <meta name=robots content=noindex> must not slip the gate) via
    // an alternation with one group per arm; both Spark and DuckDB return
    // "" for the non-participating group, so the coalesce is engine-exact.
    // An unquoted value ends at whitespace/quote/'>' per the HTML5 grammar.
    val nfRe =
      "(?is)<meta[^>]*name\\s*=\\s*[\"']?robots[\"']?[^>]*content\\s*=\\s*(?:[\"']([^\"'>]*)|([^\\s\"'>]+))"
    val cfRe =
      "(?is)<meta[^>]*content\\s*=\\s*(?:[\"']([^\"'>]*)[\"']|([^\\s\"'>]+))[^>]*name\\s*=\\s*[\"']?robots[\"']?"
    def firstGroup(re: String): Column = {
      val q = regexp_extract(html, re, 1)
      when(q =!= "", q).otherwise(regexp_extract(html, re, 2))
    }
    val nameFirst = firstGroup(nfRe)
    val contentFirst = firstGroup(cfRe)
    lower(when(nameFirst =!= "", nameFirst).otherwise(contentFirst))
  }

  /** Robots-meta COMPLIANCE gate (the stage a lawful crawl pipeline runs
    * before any text ever reaches curation): per page the noindex /
    * nofollow verdicts from the robots meta directive — `noindex` (or the
    * `none` shorthand) means the publisher forbade indexing and the page
    * must NOT enter a training corpus that honors robots semantics;
    * `nofollow` only gates link extraction (the g1/d35 graph stages), not
    * the page text. Token-exact membership over the comma-split directive
    * list (a substring test would mis-fire on `nosnippet` vs `no`),
    * whitespace-trimmed.
    *
    * Scale shape: two regexp extracts + array membership per row, fused
    * into the scan — zero shuffle, the [[mainContent]] posture.
    */
  private def robotsToks(html: Column): Column =
    filter(transform(split(robotsContent(html), ","), t => trim(t)),
      t => t =!= "")

  /** The noindex verdict as a bare Column — the zero-shuffle form a
    * composed pipeline FILTERS on inline (web_app fuses it into the source
    * scan) instead of joining [[robotsPolicy]]'s frame back by key.
    */
  def robotsNoindex(html: Column): Column = {
    val toks = robotsToks(html)
    array_contains(toks, "noindex") || array_contains(toks, "none")
  }

  def robotsPolicy(df: DataFrame, idCol: String, htmlCol: String): DataFrame = {
    val toks = robotsToks(col(htmlCol))
    val none = array_contains(toks, "none")
    df.select(col(idCol).as("sid"),
      (array_contains(toks, "noindex") || none).as("noindex"),
      (array_contains(toks, "nofollow") || none).as("nofollow"))
  }
}
