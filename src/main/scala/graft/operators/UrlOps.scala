package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** URL canonicalization + host-level rollup — the CommonCrawl-style stage-0
  * of a web-corpus pipeline: exact URL dedup is meaningless until
  * `HTTP://Host.COM:80/a/?utm_source=x` and `http://host.com/a` agree, and
  * the domain-blocklist decision table is a per-HOST rollup of doc/token/
  * quality mass over the canonicalized corpus.
  *
  * Everything is pure column algebra (regexp_extract / regexp_replace /
  * split / filter / array_sort / concat — codegen-capable builtins, zero
  * UDFs), patterns kept to the Java/RE2 common subset so the DuckDB oracle
  * computes the identical canonical string. The canonical form is
  * IDEMPOTENT (canonicalize ∘ canonicalize = canonicalize — spec'd) and
  * tracking-param removal is order-insensitive (params sort
  * lexicographically after filtering — spec'd).
  *
  * Scale posture: canonicalization is map-side per-row work on the scan;
  * the only exchanges are the dedup groupBy on the canonical string and
  * the rollup groupBy on the (low-cardinality, but possibly skewed) host —
  * both partial-aggregating. Host skew (one domain = half the crawl) is
  * the documented risk; the rollup aggregates commute, so map-side combine
  * already collapses each partition's share of a hot host to one row.
  */
object UrlOps {

  /** Tracking params stripped by canonicalization (utm_* wildcard, the
    * Facebook/Google click ids) — anchored full-param match, with or
    * without a value.
    */
  val TrackingParamRe = "^(utm_[^=]*|fbclid|gclid)(=.*)?$"

  /** Canonical form of an absolute URL:
    *   - scheme and host lowercased (path/query case is significant — RFC
    *     3986 §6.2.2.1 — and stays);
    *   - fragment dropped;
    *   - default port dropped (http:80, https:443), explicit non-default
    *     ports kept;
    *   - trailing slashes stripped from the path, empty path -> "/";
    *   - tracking params removed ([[TrackingParamRe]]), survivors sorted
    *     lexicographically (removal therefore order-insensitive), empty
    *     query dropped entirely.
    *
    * Input contract: ABSOLUTE URLs (crawl frontiers store them resolved).
    * A scheme-less input degrades deterministically (empty scheme,
    * "://host/..." form) rather than throwing — canonicalization must be
    * total over crawl junk — and the degraded form is itself a fixpoint (a
    * leading "://" with no scheme is recognized and stripped before
    * re-parsing, so canonicalize ∘ canonicalize = canonicalize holds on
    * scheme-less inputs too — ADVICE r17 #1; [[urlHost]] likewise resolves
    * the host of a degraded form). Distinct inputs never collide except
    * the deliberate "u" ≡ "://u" identification that fixpointing requires.
    */
  def canonicalizeUrl(url: Column): Column = {
    val noFrag0 = regexp_replace(trim(url), "#.*$", "")
    // strip the empty-scheme marker a prior canonicalization emitted, so
    // the degraded form re-parses to itself instead of re-degrading
    val noFrag = regexp_replace(noFrag0, "^://", "")
    val scheme = lower(regexp_extract(noFrag, "^([a-zA-Z][a-zA-Z0-9+.-]*)://", 1))
    val rest = regexp_replace(noFrag, "^[a-zA-Z][a-zA-Z0-9+.-]*://", "")
    val hostport = lower(regexp_extract(rest, "^([^/?]*)", 1))
    val port = regexp_extract(hostport, ":([0-9]+)$", 1)
    val host = regexp_replace(hostport, ":[0-9]+$", "")
    val keepPort = port =!= "" &&
      !((scheme === "http" && port === "80") ||
        (scheme === "https" && port === "443"))
    val pathq = regexp_replace(rest, "^[^/?]*", "")
    val path0 = regexp_replace(regexp_extract(pathq, "^([^?]*)", 1), "/+$", "")
    val path = when(path0 === "", lit("/")).otherwise(path0)
    val query0 = regexp_extract(pathq, "\\?(.*)$", 1)
    val params = array_sort(filter(split(query0, "&"),
      p => p =!= "" && !regexp_like(p, lit(TrackingParamRe))))
    concat(scheme, lit("://"), host,
      when(keepPort, concat(lit(":"), port)).otherwise(lit("")),
      path,
      when(size(params) > 0, concat(lit("?"), array_join(params, "&")))
        .otherwise(lit("")))
  }

  /** Host of a canonical URL (lowercase by construction). The scheme group
    * is optional so the degraded scheme-less canonical form ("://host/...")
    * still resolves its real host instead of collapsing every scheme-less
    * URL into one "" bucket (ADVICE r17 #1).
    */
  def urlHost(canonicalUrl: Column): Column =
    regexp_extract(canonicalUrl, "^(?:[a-z][a-z0-9+.-]*)?://([^/:?]+)", 1)

  /** Exact dedup on the canonical URL — d1's keep-first discipline: per
    * canonical form the minimum id survives, with the duplicate count kept
    * as the dedup ledger. ONE partial-aggregating groupBy on the canonical
    * string; the raw URL never rides the shuffle twice.
    */
  def canonicalDedup(df: DataFrame, idCol: String, urlCol: String): DataFrame =
    df.select(col(idCol).as("__id"), canonicalizeUrl(col(urlCol)).as("url_canonical"))
      .groupBy(col("url_canonical"))
      .agg(min(col("__id")).as("kept_id"), count(lit(1)).as("n_dups"))

  /** Per-host doc/token/quality rollup over canonicalized URLs — the
    * domain-blocklist decision table. Counts and token sums are exact
    * longs; quality rides exact integer MICRO-units (round(q·10^6) — the
    * lnMicro discipline) so the per-host sum is order-free, and the
    * blocklist verdict compares integers only:
    * `blocked` = mean quality below `minMeanQuality`, cross-multiplied
    * (quality_micro_sum < n_docs · minQualityMicro) — no float division
    * anywhere. All aggregates commute -> map-side combine collapses hot
    * hosts per-partition before the exchange.
    */
  def hostRollup(df: DataFrame, urlCol: String, textCol: String,
                 minMeanQuality: Double): DataFrame =
    blockVerdict(hostPartials(df, urlCol, textCol), minMeanQuality)

  /** The rollup's partial sums only — (host, n_docs, n_tokens,
    * quality_micro_sum), every column additive, which is what makes the
    * incremental/exactly-once path below exact by construction.
    */
  private def hostPartials(df: DataFrame, urlCol: String,
                           textCol: String): DataFrame = {
    val qMicro = round(TextOps.qualityScore(col(textCol)) * lit(1000000L), 0)
      .cast("long")
    df.select(urlHost(canonicalizeUrl(col(urlCol))).as("host"),
        TextOps.nWords(col(textCol)).cast("long").as("__nw"),
        qMicro.as("__q"))
      .groupBy(col("host"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("__nw")).as("n_tokens"),
        sum(col("__q")).as("quality_micro_sum"))
  }

  private def blockVerdict(partials: DataFrame,
                           minMeanQuality: Double): DataFrame =
    partials.withColumn("blocked",
      col("quality_micro_sum") <
        col("n_docs") * lit(math.round(minMeanQuality * 1000000L)))

  /** EXACTLY-ONCE incremental host rollup — the ds-series contract applied
    * to the blocklist table (a crawl ingests continuously; re-ranking the
    * whole corpus per batch is the anti-pattern): each micro-batch lands
    * its OWN hosts' partial sums by partition-replace on `ingest_batch`,
    * so a retried batch rewrites identical rows and replay changes
    * nothing. Serve = one more groupBy summing the committed partials —
    * exact because every rollup column is ADDITIVE (counts, token sums,
    * quality micro-mass), so batch-partitioned partials merge to precisely
    * the from-scratch rollup; the verdict recomputes on merged sums (a
    * host can cross the block threshold in either direction as batches
    * land — verdicts must never be merged, only derived).
    */
  def hostRollupIngestBatch(batch: DataFrame, batchId: Long, statePath: String,
                            urlCol: String, textCol: String): Unit =
    graft.sources.Sinks.overwriteRunPartition(
      hostPartials(batch, urlCol, textCol)
        .withColumn("ingest_batch", lit(batchId)),
      statePath, "ingest_batch")

  /** PII DENSITY per host — the compliance column of the blocklist
    * decision table: exact counts of email/URL/phone matches (the t8
    * patterns) per canonical host, with the risk verdict as a
    * cross-multiplied integer comparison against a per-million-tokens
    * budget (n_pii · 10^6 > n_tokens · maxPerMillionTokens) — no float
    * division. Same one-exchange map-side-combinable shape as
    * [[hostRollup]].
    */
  def piiByHost(df: DataFrame, urlCol: String, textCol: String,
                maxPerMillionTokens: Long): DataFrame = {
    val nPii = (TextOps.piiCount(col(textCol), TextOps.emailRe) +
      TextOps.piiCount(col(textCol), TextOps.urlRe) +
      TextOps.piiCount(col(textCol), TextOps.phoneRe)).cast("long")
    df.select(urlHost(canonicalizeUrl(col(urlCol))).as("host"),
        TextOps.nWords(col(textCol)).cast("long").as("__nw"), nPii.as("__p"))
      .groupBy(col("host"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("__nw")).as("n_tokens"),
        sum(col("__p")).as("n_pii"))
      .withColumn("pii_risky",
        col("n_pii") * lit(1000000L) > col("n_tokens") * lit(maxPerMillionTokens))
  }

  /** The committed blocklist table: merged partials + the block verdict. */
  def servedHostRollup(spark: org.apache.spark.sql.SparkSession,
                       statePath: String, minMeanQuality: Double): DataFrame =
    blockVerdict(
      spark.read.parquet(statePath)
        .groupBy(col("host"))
        .agg(sum(col("n_docs")).as("n_docs"),
          sum(col("n_tokens")).as("n_tokens"),
          sum(col("quality_micro_sum")).as("quality_micro_sum")),
      minMeanQuality)
}
