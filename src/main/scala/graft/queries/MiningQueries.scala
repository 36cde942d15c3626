package graft.queries

import graft.QueryDef
import graft.core.Tables
import graft.operators.{AnnIndex, Bitext, TextOps, UrlOps}
import org.apache.spark.sql.functions._

/** Round-17 mining surface: bitext mining over the persisted ANN index,
  * URL canonicalization + host rollup, and within-doc paragraph dedup.
  * Conventions are the house ones: every aggregate exact-integer where
  * possible, round(·, 6) where a float is unavoidable, column names
  * aliased identically in the Spark plan and the DuckDB oracle.
  */
object MiningQueries {

  /** Quantized-vector CTE (the CorpusQueries twin — duplicated here because
    * the helpers are per-registry private; one line, same constant).
    */
  private val quantVecCte =
    s"""v AS MATERIALIZED (SELECT vec_id AS sid,
       |  list_transform(embedding, x -> CAST(round(CAST(x AS DOUBLE) * ${graft.operators.Similarity.QuantScale}) AS BIGINT)) AS qv
       |  FROM embeddings)""".stripMargin

  private def sqlCosine(a: String, b: String): String =
    s"""CAST(list_dot_product($a, $b) AS DOUBLE) /
       |    nullif(sqrt(CAST(list_dot_product($a, $a) AS DOUBLE)) * sqrt(CAST(list_dot_product($b, $b) AS DOUBLE)), 0.0)""".stripMargin

  /** One direction of the b1/b2 persisted-IVF-PQ serve, relationally — the
    * s19/ds3 chain (seeded first-16 centroids + first-16 PQ seeds, m = 8
    * subspaces of 8 dims, ADC distances, nProbe = 4) parameterized by the
    * base (indexed) and query sets, ending at `sl$t (qid, nid)`: the
    * top-`adcK`-by-(d2, nid) ADC shortlist per query, optionally reranked
    * by EXACT cosine to the top-`refineK` (the s17/s20 refine tail —
    * searchIvfPqRefine's relational twin). Shares `v` and the exploded
    * subvector relation `e` across directions.
    */
  private def ivfDirCtes(t: String, baseWhere: String, queryWhere: String,
                         adcK: Int = 4, refineK: Int = 0): String = {
    val adcName = if (refineK > 0) s"adc$t" else s"sl$t"
    val refineTail =
      if (refineK == 0) ""
      else s""",
         |sl$t AS (SELECT qid, nid FROM (SELECT a.qid, a.nid,
         |    ROW_NUMBER() OVER (PARTITION BY a.qid
         |      ORDER BY ${sqlCosine("qa.qv", "nb.qv")} DESC, a.nid) AS r
         |  FROM adc$t a JOIN v qa ON qa.sid = a.qid
         |  JOIN v nb ON nb.sid = a.nid) WHERE r <= $refineK)""".stripMargin
    ivfDirCtesCore(t, baseWhere, queryWhere, adcK, adcName) + refineTail
  }

  private def ivfDirCtesCore(t: String, baseWhere: String, queryWhere: String,
                             adcK: Int, slName: String): String =
    s"""base$t AS (SELECT sid, qv FROM v WHERE $baseWhere),
       |qset$t AS (SELECT sid, qv FROM v WHERE $queryWhere),
       |cent$t AS (SELECT sid AS cid, qv AS cv FROM base$t ORDER BY sid LIMIT 16),
       |mranked$t AS MATERIALIZED (SELECT sid, cid,
       |    ROW_NUMBER() OVER (PARTITION BY sid ORDER BY ccos DESC, cid) AS crank
       |  FROM (SELECT s.sid, c.cid, ${sqlCosine("s.qv", "c.cv")} AS ccos
       |        FROM base$t s CROSS JOIN cent$t c)),
       |pranked$t AS (SELECT sid, cid,
       |    ROW_NUMBER() OVER (PARTITION BY sid ORDER BY ccos DESC, cid) AS crank
       |  FROM (SELECT s.sid, c.cid, ${sqlCosine("s.qv", "c.cv")} AS ccos
       |        FROM qset$t s CROSS JOIN cent$t c)),
       |seeds$t AS (SELECT sid, ROW_NUMBER() OVER (ORDER BY sid) - 1 AS code
       |  FROM (SELECT DISTINCT sid FROM base$t ORDER BY sid LIMIT 16)),
       |cb$t AS (SELECT s.code, e.m, e.j, e.q FROM e JOIN seeds$t s USING (sid)),
       |a$t AS MATERIALIZED (SELECT e.sid, e.m, cb.code,
       |    CAST(SUM((e.q - cb.q) * (e.q - cb.q)) AS BIGINT) AS d2
       |  FROM e JOIN cb$t cb ON e.m = cb.m AND e.j = cb.j GROUP BY 1, 2, 3),
       |codes$t AS (SELECT sid, m, code FROM (SELECT a.sid, m, code,
       |    ROW_NUMBER() OVER (PARTITION BY a.sid, m ORDER BY d2, code) AS rn
       |  FROM a$t a JOIN base$t cs ON cs.sid = a.sid) WHERE rn = 1),
       |members$t AS (SELECT r.cid, cd.sid AS nid, cd.m, cd.code
       |  FROM mranked$t r JOIN codes$t cd ON r.sid = cd.sid WHERE r.crank = 1),
       |probes$t AS (SELECT cid, sid AS qid FROM pranked$t WHERE crank <= 4),
       |dist$t AS (SELECT p.qid, mem.nid, CAST(SUM(qa.d2) AS BIGINT) AS d2
       |  FROM probes$t p JOIN members$t mem ON p.cid = mem.cid
       |  JOIN a$t qa ON qa.sid = p.qid AND qa.m = mem.m AND qa.code = mem.code
       |  GROUP BY 1, 2),
       |$slName AS (SELECT qid, nid FROM (SELECT qid, nid,
       |    ROW_NUMBER() OVER (PARTITION BY qid ORDER BY d2 ASC, nid ASC) AS r
       |  FROM dist$t) WHERE r <= $adcK)""".stripMargin

  /** Margin scoring over one direction's shortlist: exact integer
    * micro-cosines of the shortlist pairs (zero-norm rows drop — NULL
    * cosine, the Similarity contract).
    */
  private def microCosCte(name: String, sl: String, srcExpr: String,
                          tgtExpr: String): String =
    s"""$name AS (SELECT * FROM (SELECT $srcExpr AS src_id, $tgtExpr AS tgt_id,
       |    CAST(round((${sqlCosine("qa.qv", "nb.qv")}) * 1000000) AS BIGINT) AS cmicro
       |  FROM $sl s JOIN v qa ON qa.sid = s.qid JOIN v nb ON nb.sid = s.nid)
       |  WHERE cmicro IS NOT NULL)""".stripMargin

  private def bitextOracle(adcK: Int, refineK: Int): String =
    s"""WITH $quantVecCte,
       |e AS MATERIALIZED (SELECT sid, qv[pos] AS q,
       |    ((pos - 1) // 8) AS m, ((pos - 1) % 8) AS j
       |  FROM v, unnest(generate_series(1, 64)) AS t(pos)),
       |${ivfDirCtes("f", "sid % 2 = 1", "sid % 2 = 0", adcK, refineK)},
       |${ivfDirCtes("b", "sid % 2 = 0", "sid % 2 = 1", adcK, refineK)},
       |${microCosCte("fcos", "slf", "s.qid", "s.nid")},
       |${microCosCte("bcos", "slb", "s.nid", "s.qid")},
       |fstat AS (SELECT src_id, CAST(SUM(cmicro) AS BIGINT) AS fsum,
       |    CAST(COUNT(*) AS BIGINT) AS fn FROM fcos GROUP BY 1),
       |bstat AS (SELECT tgt_id, CAST(SUM(cmicro) AS BIGINT) AS bsum,
       |    CAST(COUNT(*) AS BIGINT) AS bn FROM bcos GROUP BY 1),
       |cand AS (SELECT f.src_id, f.tgt_id, f.cmicro,
       |    round(CAST(CAST(2 AS BIGINT) * f.cmicro * fs.fn * bs.bn AS DOUBLE) /
       |      nullif(CAST(fs.fsum * bs.bn + bs.bsum * fs.fn AS DOUBLE),
       |        CAST(0 AS DOUBLE)), 6) AS margin
       |  FROM fcos f JOIN fstat fs USING (src_id) JOIN bstat bs USING (tgt_id))
       |SELECT src_id, tgt_id, cos_micro, margin FROM (
       |  SELECT src_id, tgt_id, cmicro AS cos_micro, margin,
       |    ROW_NUMBER() OVER (PARTITION BY src_id
       |      ORDER BY margin DESC NULLS LAST, tgt_id) AS rn
       |  FROM cand) WHERE rn = 1 ORDER BY src_id""".stripMargin

  private val b1Oracle: String = bitextOracle(adcK = 4, refineK = 0)
  private val b2Oracle: String = bitextOracle(adcK = 16, refineK = 4)

  /** Deterministic messy-URL synthesis over `documents` — built by the SAME
    * expression on both sides, so the canonicalizer (not the generator) is
    * what the hash checks. Each doc pair (2g, 2g+1) differs ONLY in junk
    * canonicalization removes — scheme/host case, the default :443 port, a
    * doubled trailing slash, tracking params in DIFFERENT positions, a
    * fragment — so every pair collapses to one canonical URL (n_dups = 2,
    * kept_id = 2g), and the surviving params a=1&b=2 prove order-insensitive
    * removal in the hashed output itself.
    */
  private val rawUrlSql: String =
    """CASE WHEN doc_id % 2 = 0 THEN 'HTTPS' ELSE 'https' END || '://' ||
      |    CASE WHEN doc_id % 2 = 0
      |      THEN 'www.host' || CAST((doc_id // 2) % 7 AS VARCHAR) || '.example.com'
      |      ELSE upper('www.host' || CAST((doc_id // 2) % 7 AS VARCHAR) || '.example.com') END ||
      |    CASE WHEN doc_id % 2 = 0 THEN ':443' ELSE '' END ||
      |    '/Docs/' || CAST(doc_id // 2 AS VARCHAR) ||
      |    CASE WHEN doc_id % 2 = 0 THEN '//' ELSE '' END ||
      |    CASE WHEN doc_id % 2 = 0 THEN '?b=2&utm_source=x&a=1'
      |      ELSE '?a=1&b=2&gclid=9' END ||
      |    CASE WHEN doc_id % 2 = 0 THEN '#top' ELSE '' END""".stripMargin

  private def rawUrlSpark: org.apache.spark.sql.Column = {
    val g = expr("CAST(doc_id DIV 2 AS BIGINT)")
    val even = col("doc_id") % 2 === 0
    val host = concat(lit("www.host"), (g % 7).cast("string"), lit(".example.com"))
    concat(
      when(even, lit("HTTPS")).otherwise(lit("https")), lit("://"),
      when(even, host).otherwise(upper(host)),
      when(even, lit(":443")).otherwise(lit("")),
      lit("/Docs/"), g.cast("string"),
      when(even, lit("//")).otherwise(lit("")),
      when(even, lit("?b=2&utm_source=x&a=1")).otherwise(lit("?a=1&b=2&gclid=9")),
      when(even, lit("#top")).otherwise(lit("")))
  }

  /** The SQL twin of [[UrlOps.canonicalizeUrl]] as a CTE chain from a
    * relation `u0 (doc_id, raw, text)`; ends at `u5 (doc_id, host,
    * url_canonical, text)`.
    */
  private val canonicalCtes: String =
    """u1 AS (SELECT doc_id, text, regexp_replace(trim(raw), '#.*$', '') AS nf FROM u0),
      |u2 AS (SELECT doc_id, text,
      |    lower(regexp_extract(nf, '^([a-zA-Z][a-zA-Z0-9+.-]*)://', 1)) AS scheme,
      |    regexp_replace(nf, '^[a-zA-Z][a-zA-Z0-9+.-]*://', '') AS rest FROM u1),
      |u3 AS (SELECT doc_id, text, scheme,
      |    lower(regexp_extract(rest, '^([^/?]*)', 1)) AS hostport,
      |    regexp_replace(rest, '^[^/?]*', '') AS pathq FROM u2),
      |u4 AS (SELECT doc_id, text, scheme,
      |    regexp_extract(hostport, ':([0-9]+)$', 1) AS port,
      |    regexp_replace(hostport, ':[0-9]+$', '') AS host,
      |    regexp_replace(regexp_extract(pathq, '^([^?]*)', 1), '/+$', '') AS path0,
      |    regexp_extract(pathq, '\?(.*)$', 1) AS query0 FROM u3),
      |u5 AS (SELECT doc_id, text, host, scheme || '://' || host ||
      |    CASE WHEN port <> '' AND NOT ((scheme = 'http' AND port = '80')
      |        OR (scheme = 'https' AND port = '443'))
      |      THEN ':' || port ELSE '' END ||
      |    CASE WHEN path0 = '' THEN '/' ELSE path0 END ||
      |    CASE WHEN len(ps) > 0 THEN '?' || array_to_string(ps, '&') ELSE '' END
      |      AS url_canonical
      |  FROM (SELECT *, list_sort(list_filter(string_split(query0, '&'),
      |      p -> p <> '' AND NOT regexp_matches(p, '^(utm_[^=]*|fbclid|gclid)(=.*)?$'))) AS ps
      |    FROM u4))""".stripMargin

  /** Quality score SQL twin (TextOps.qualityScore — the sqlFunnelF blend). */
  private val qualitySql: String =
    s"""0.4 * least(1.0, greatest(CAST(len(string_split(text, ' ')) AS DOUBLE), 1.0) / 100.0)
       |     + 0.3 * (1.0 - CAST(len(regexp_extract_all(text, '[^a-z0-9 ]')) AS DOUBLE)
       |         / greatest(CAST(length(text) AS DOUBLE), 1.0))
       |     + 0.3 * least(1.0, 4.0 * CAST(len(list_filter(string_split(text, ' '),
       |           w -> w IN (${TextOps.stopwords.map(s => s"'$s'").mkString(", ")}))) AS DOUBLE)
       |         / greatest(CAST(len(string_split(text, ' ')) AS DOUBLE), 1.0))""".stripMargin

  /** One-row relational spec of [[graft.apps.EventsApp.analyze]]'s Stats:
    * each scalar re-derives through the SAME SQL its section's
    * oracle-checked query uses (w4 sessions, w11 funnel counts, w12
    * streaks, sk3 skew, dq1-style violation counts), cross-joined into one
    * row — all one-row CTEs, so the joins are scalar attaches.
    */
  private val eventsAppOracle: String =
    """WITH marks AS (
      |  SELECT user_id, ts, event_id,
      |    CASE WHEN epoch_us(ts) - lag(epoch_us(ts))
      |        OVER (PARTITION BY user_id ORDER BY ts, event_id) > 1800000000
      |      OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
      |      THEN 1 ELSE 0 END AS new_s
      |  FROM events),
      |sess AS (
      |  SELECT user_id,
      |    CAST(SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
      |      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id
      |  FROM marks),
      |nsess AS (SELECT CAST(COUNT(*) AS BIGINT) AS sessions FROM
      |  (SELECT user_id, session_id FROM sess GROUP BY 1, 2)),
      |u1 AS (SELECT user_id, ts, event_type,
      |    MIN(CASE WHEN event_type = 'view' THEN ts END)
      |      OVER (PARTITION BY user_id) AS t0
      |  FROM events),
      |u2 AS (SELECT *, MIN(CASE WHEN event_type = 'click' AND ts > t0
      |      THEN ts END) OVER (PARTITION BY user_id) AS t1 FROM u1),
      |u3 AS (SELECT *, MIN(CASE WHEN event_type = 'purchase' AND ts > t1
      |      THEN ts END) OVER (PARTITION BY user_id) AS t2 FROM u2),
      |per AS (SELECT user_id, MIN(t0) AS t0, MIN(t2) AS t2
      |  FROM u3 GROUP BY user_id),
      |fcounts AS (SELECT CAST(COUNT(t0) AS BIGINT) AS viewers,
      |    CAST(COUNT(t2) AS BIGINT) AS purchasers FROM per),
      |days AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events),
      |isl AS (SELECT user_id, d,
      |    d - CAST(ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY d)
      |      AS INTEGER) AS anchor
      |  FROM days),
      |st AS (SELECT user_id, anchor, CAST(COUNT(*) AS BIGINT) AS streak_days
      |  FROM isl GROUP BY user_id, anchor),
      |mx AS (SELECT CAST(COALESCE(MAX(streak_days), 0) AS BIGINT)
      |    AS max_streak_days FROM st),
      |c AS (SELECT user_id AS k, CAST(COUNT(*) AS BIGINT) AS n
      |  FROM events GROUP BY 1),
      |sk AS (SELECT CAST(COUNT(*) AS BIGINT) AS users, MAX(n) AS max_count
      |  FROM c),
      |r AS (SELECT n, ROW_NUMBER() OVER (ORDER BY n) AS rn FROM c),
      |p99 AS (SELECT n AS p99_count FROM r, sk
      |  WHERE rn = (99 * users + 99) // 100),
      |salt AS (SELECT CAST((max_count + p99_count - 1) // p99_count
      |    AS BIGINT) AS salt_factor FROM sk, p99),
      |bad AS (SELECT CAST(COUNT(CASE WHEN ts IS NULL THEN 1 END)
      |    + COUNT(CASE WHEN user_id IS NULL THEN 1 END) AS BIGINT)
      |    AS bad_rows FROM events),
      |inp AS (SELECT CAST(COUNT(*) AS BIGINT) AS input FROM events)
      |SELECT input, bad_rows, users, sessions, viewers, purchasers,
      |  max_streak_days, salt_factor
      |FROM inp, bad, sk, nsess, fcounts, mx, salt""".stripMargin

  val defs: Seq[QueryDef] = Seq(

    // EVENTS-APP END-TO-END COMPOSITION (EventsApp.analyze — VERDICT r16
    // ask #7): the six-section composed run (dq1 gate, w4 sessionization,
    // w11 funnel, w12 streaks, ts3 OHLC, sk3 skew) executes during frame
    // construction (the ds-series convention), so the BENCH row measures
    // the real composed cost — cross-section cache/checkpoint interference
    // a per-query bench never sees. The verified output is the one-row
    // Stats summary, re-derived relationally from the sections' own
    // oracle-checked SQL.
    QueryDef("events_app", eventsAppOracle) { (s, d) =>
      val (frames, stats) = graft.apps.EventsApp.analyze(s, Tables.events(s, d))
      // the stats row actions five of the six sections; force the sixth
      // (OHLC bars) so the measured run is the WHOLE composition
      frames("ohlc_bars").count()
      import s.implicits._
      Seq((stats.input, stats.badRows, stats.users, stats.sessions,
          stats.viewers, stats.purchasers, stats.maxStreakDays,
          stats.saltFactor))
        .toDF("input", "bad_rows", "users", "sessions", "viewers",
          "purchasers", "max_streak_days", "salt_factor")
    },

    // BITEXT MINING (Bitext.minePairs — the Artetxe-Schwenk ratio margin,
    // LASER/CCMatrix): even vec_ids are the "source language", odd the
    // "target"; BOTH direction shortlists are served from persisted IVF-PQ
    // indexes (AnnIndex write + search — the s19 storage path), so
    // candidate generation is index-served, never all-pairs. The oracle
    // re-derives both index serves relationally (the s19 CTE chain, twice)
    // and replays margin scoring over the exact shortlists: integer
    // micro-cosines, exact integer neighborhood sums, one cross-multiplied
    // double division, round(·, 6).
    QueryDef("b1_bitext_mining", b1Oracle) { (s, d) =>
      val emb = Tables.embeddings(s, d)
      val src = emb.filter(col("vec_id") % 2 === 0)
      val tgt = emb.filter(col("vec_id") % 2 =!= 0)
      val app = s.sparkContext.applicationId.replaceAll("[^a-zA-Z0-9]", "_")
      val nameF = "graft_ann_b1f_" + app
      val nameB = "graft_ann_b1b_" + app
      AnnIndex.writeIvfPq(tgt, "vec_id", "embedding", dim = 64, nCells = 16,
        m = 8, k = 16, nameF, nBuckets = 8)
      AnnIndex.writeIvfPq(src, "vec_id", "embedding", dim = 64, nCells = 16,
        m = 8, k = 16, nameB, nBuckets = 8)
      val fwd = AnnIndex.searchIvfPq(src, "vec_id", "embedding", dim = 64,
        m = 8, nProbe = 4, topK = 4, nameF).select("qid", "nid")
      val bwd = AnnIndex.searchIvfPq(tgt, "vec_id", "embedding", dim = 64,
        m = 8, nProbe = 4, topK = 4, nameB).select("qid", "nid")
      Bitext.minePairs(src, tgt, "vec_id", "embedding", fwd, bwd)
        .orderBy(col("src_id"))
    },

    // BITEXT MINING, REFINE-SERVED (the recommended serve configuration —
    // the s20 pattern applied to b1): each direction's ADC chain proposes
    // a top-16 shortlist from persisted m-byte codes, ONLY those pairs are
    // scored against full vectors, and the exact-cosine top-4 becomes the
    // margin neighborhood — better-quality k-NN means at the same
    // index-served scale shape (refine cost = 16 dots per query,
    // corpus-size-independent).
    QueryDef("b2_bitext_refined", b2Oracle) { (s, d) =>
      val emb = Tables.embeddings(s, d)
      val src = emb.filter(col("vec_id") % 2 === 0)
      val tgt = emb.filter(col("vec_id") % 2 =!= 0)
      val app = s.sparkContext.applicationId.replaceAll("[^a-zA-Z0-9]", "_")
      val nameF = "graft_ann_b2f_" + app
      val nameB = "graft_ann_b2b_" + app
      AnnIndex.writeIvfPq(tgt, "vec_id", "embedding", dim = 64, nCells = 16,
        m = 8, k = 16, nameF, nBuckets = 8)
      AnnIndex.writeIvfPq(src, "vec_id", "embedding", dim = 64, nCells = 16,
        m = 8, k = 16, nameB, nBuckets = 8)
      val fwd = AnnIndex.searchIvfPqRefine(src, emb, "vec_id", "embedding",
        dim = 64, m = 8, nProbe = 4, shortlistK = 16, topK = 4, nameF)
        .select("qid", "nid")
      val bwd = AnnIndex.searchIvfPqRefine(tgt, emb, "vec_id", "embedding",
        dim = 64, m = 8, nProbe = 4, shortlistK = 16, topK = 4, nameB)
        .select("qid", "nid")
      Bitext.minePairs(src, tgt, "vec_id", "embedding", fwd, bwd)
        .orderBy(col("src_id"))
    },

    // URL CANONICALIZATION + EXACT DEDUP (UrlOps.canonicalizeUrl +
    // canonicalDedup — the CommonCrawl stage-0): raw URLs are synthesized
    // deterministically (same expression both sides — see rawUrlSql's doc),
    // canonicalized by pure column algebra, and exact-deduped keep-first on
    // the canonical form. ONE groupBy on the canonical string.
    QueryDef(
      "d35_url_canonical",
      s"""WITH u0 AS (SELECT doc_id, text, $rawUrlSql AS raw FROM documents),
         |$canonicalCtes
         |SELECT url_canonical, CAST(MIN(doc_id) AS BIGINT) AS kept_id,
         |  CAST(COUNT(*) AS BIGINT) AS n_dups
         |FROM u5 GROUP BY 1 ORDER BY url_canonical""".stripMargin) { (s, d) =>
      UrlOps.canonicalDedup(
          Tables.documents(s, d).withColumn("raw", rawUrlSpark),
          "doc_id", "raw")
        .orderBy(col("url_canonical"))
    },

    // HOST-LEVEL ROLLUP (UrlOps.hostRollup — the domain-blocklist decision
    // table): per canonical host, exact doc/token counts and the quality
    // mass in integer micro-units; the block verdict is a cross-multiplied
    // integer comparison (mean quality < 0.5), no float division anywhere.
    QueryDef(
      "dp5_host_rollup",
      s"""WITH u0 AS (SELECT doc_id, text, $rawUrlSql AS raw FROM documents),
         |$canonicalCtes
         |SELECT host, CAST(COUNT(*) AS BIGINT) AS n_docs,
         |  CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS n_tokens,
         |  CAST(SUM(CAST(round(($qualitySql) * 1000000) AS BIGINT)) AS BIGINT)
         |    AS quality_micro_sum,
         |  CAST(SUM(CAST(round(($qualitySql) * 1000000) AS BIGINT)) AS BIGINT)
         |    < CAST(COUNT(*) AS BIGINT) * CAST(500000 AS BIGINT) AS blocked
         |FROM u5 GROUP BY 1 ORDER BY host""".stripMargin) { (s, d) =>
      UrlOps.hostRollup(
          Tables.documents(s, d).withColumn("raw", rawUrlSpark),
          "raw", "text", minMeanQuality = 0.5)
        .orderBy(col("host"))
    },

    // EXACTLY-ONCE INCREMENTAL HOST ROLLUP (UrlOps.hostRollupIngestBatch /
    // servedHostRollup — the ds-series contract on the blocklist table):
    // three doc batches land their ADDITIVE partial sums by
    // partition-replace on ingest_batch, batch 1 is replayed mid-run (the
    // injected-retry discipline, orchestration-only via Timing.overhead),
    // and the serve merges committed partials + recomputes the verdict.
    // The oracle is dp5's SQL VERBATIM through storage (the d33 pattern):
    // batch boundaries, the retry, and the additive merge must be
    // invisible in every value.
    QueryDef(
      "ds11_host_rollup_ingest",
      s"""WITH u0 AS (SELECT doc_id, text, $rawUrlSql AS raw FROM documents),
         |$canonicalCtes
         |SELECT host, CAST(COUNT(*) AS BIGINT) AS n_docs,
         |  CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS n_tokens,
         |  CAST(SUM(CAST(round(($qualitySql) * 1000000) AS BIGINT)) AS BIGINT)
         |    AS quality_micro_sum,
         |  CAST(SUM(CAST(round(($qualitySql) * 1000000) AS BIGINT)) AS BIGINT)
         |    < CAST(COUNT(*) AS BIGINT) * CAST(500000 AS BIGINT) AS blocked
         |FROM u5 GROUP BY 1 ORDER BY host""".stripMargin) { (s, d) =>
      val docs = Tables.documents(s, d).withColumn("raw", rawUrlSpark)
      val app = s.sparkContext.applicationId.replaceAll("[^a-zA-Z0-9]", "_")
      val path = s.conf.get("spark.sql.warehouse.dir").stripPrefix("file:") +
        "/graft_hosts_ds11_" + app
      (0 to 2).foreach { b =>
        graft.operators.UrlOps.hostRollupIngestBatch(
          docs.filter(col("doc_id") % 3 === b), b.toLong, path, "raw", "text")
      }
      // injected retry: replay batch 1 after its write already landed
      graft.core.Timing.overhead {
        graft.operators.UrlOps.hostRollupIngestBatch(
          docs.filter(col("doc_id") % 3 === 1), 1L, path, "raw", "text")
      }
      graft.operators.UrlOps.servedHostRollup(s, path, minMeanQuality = 0.5)
        .orderBy(col("host"))
    },

    // MATRYOSHKA truncation recall (Similarity.matryoshkaRecall — MRL,
    // Kusupati et al. 2022): per query, |top-5 by 16/32-dim PREFIX cosine
    // ∩ top-5 by full 64-dim cosine| — the measurement that decides how
    // few dimensions the ANN index can serve. Exact integers; one
    // broadcast-query brute-force arm per dim (the s16 recall-harness
    // posture), intersections by (qid, nid) equi-join.
    QueryDef(
      "s26_matryoshka_recall",
      { def arm(name: String, d: String) =
          s"""$name AS (SELECT qid, nid FROM (
             |  SELECT q.sid AS qid, c.sid AS nid,
             |    ROW_NUMBER() OVER (PARTITION BY q.sid
             |      ORDER BY ${sqlCosine(s"q.qv$d", s"c.qv$d")} DESC NULLS LAST,
             |        c.sid) AS r
             |  FROM (SELECT sid, qv FROM v WHERE sid < 8) q
             |  CROSS JOIN (SELECT sid, qv FROM v WHERE sid >= 8) c)
             |  WHERE r <= 5)""".stripMargin
        s"""WITH $quantVecCte,
           |${arm("t16", "[1:16]")},
           |${arm("t32", "[1:32]")},
           |${arm("t64", "")}
           |SELECT qid, dim, n_hits FROM (
           |  SELECT a.qid, CAST(16 AS BIGINT) AS dim,
           |    CAST(COUNT(f.nid) AS BIGINT) AS n_hits
           |  FROM t16 a LEFT JOIN t64 f ON a.qid = f.qid AND a.nid = f.nid
           |  GROUP BY 1
           |  UNION ALL
           |  SELECT a.qid, CAST(32 AS BIGINT), CAST(COUNT(f.nid) AS BIGINT)
           |  FROM t32 a LEFT JOIN t64 f ON a.qid = f.qid AND a.nid = f.nid
           |  GROUP BY 1)
           |ORDER BY dim, qid""".stripMargin }) { (s, d) =>
      val emb = Tables.embeddings(s, d)
      graft.operators.Similarity.matryoshkaRecall(
          emb.filter(col("vec_id") < 8), emb.filter(col("vec_id") >= 8),
          "vec_id", "embedding", dims = Seq(16, 32), k = 5)
        .orderBy(col("dim"), col("qid"))
    },

    // DAU/WAU/MAU STICKINESS (EventOps.stickiness): exact rolling distinct
    // actives per day via a documented 30x explode of the DISTINCT
    // user-day table (zero self-joins, plain keyed counts; ax6 is the
    // sketch twin). Stickiness = DAU/MAU, the one round-6 float.
    QueryDef(
      "w17_stickiness",
      """WITH days AS (SELECT DISTINCT user_id AS u, CAST(ts AS DATE) AS d
        |  FROM events),
        |dau AS (SELECT d AS t, CAST(COUNT(*) AS BIGINT) AS dau
        |  FROM days GROUP BY 1),
        |wau AS (SELECT t, CAST(COUNT(*) AS BIGINT) AS wau FROM (
        |  SELECT DISTINCT u, d + CAST(o AS INTEGER) AS t
        |  FROM days, unnest(generate_series(0, 6)) AS g(o)) GROUP BY 1),
        |mau AS (SELECT t, CAST(COUNT(*) AS BIGINT) AS mau FROM (
        |  SELECT DISTINCT u, d + CAST(o AS INTEGER) AS t
        |  FROM days, unnest(generate_series(0, 29)) AS g(o)) GROUP BY 1)
        |SELECT dau.t AS day, dau, wau, mau,
        |  round(CAST(dau AS DOUBLE) / CAST(mau AS DOUBLE), 6) AS stickiness
        |FROM dau JOIN wau ON wau.t = dau.t JOIN mau ON mau.t = dau.t
        |ORDER BY day""".stripMargin) { (s, d) =>
      graft.operators.EventOps.stickiness(Tables.events(s, d), "user_id", "ts")
        .orderBy(col("day"))
    },

    // TOKENIZER FERTILITY by language (TextOps.tokenizerFertility): exact
    // bytes / whitespace-words / BPE-ish tokens per language and the two
    // round-6 fertility ratios — the table a multilingual token-budget
    // plan reads. One map-side-combinable aggregate over one scan.
    QueryDef(
      "t31_tokenizer_fertility",
      s"""SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
         |  CAST(SUM(strlen(text)) AS BIGINT) AS n_bytes,
         |  CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS n_words,
         |  CAST(SUM(len(regexp_extract_all(text, '${TextOps.bpeishPattern}')))
         |    AS BIGINT) AS n_tokens,
         |  round(CAST(SUM(strlen(text)) AS DOUBLE) /
         |    nullif(CAST(SUM(len(regexp_extract_all(text, '${TextOps.bpeishPattern}')))
         |      AS DOUBLE), CAST(0 AS DOUBLE)), 6) AS bytes_per_token,
         |  round(CAST(SUM(len(string_split(text, ' '))) AS DOUBLE) /
         |    nullif(CAST(SUM(len(regexp_extract_all(text, '${TextOps.bpeishPattern}')))
         |      AS DOUBLE), CAST(0 AS DOUBLE)), 6) AS words_per_token
         |FROM documents GROUP BY 1 ORDER BY lang""".stripMargin) { (s, d) =>
      TextOps.tokenizerFertility(Tables.documents(s, d), "lang", "text")
        .orderBy(col("lang"))
    },

    // PII DENSITY per host (UrlOps.piiByHost — the compliance column of
    // the blocklist table): t8's synthesized PII over d35's synthesized
    // URLs, exact match counts per canonical host, risk verdict
    // cross-multiplied against a 10000-per-million-tokens budget.
    QueryDef(
      "dp7_pii_by_host",
      s"""WITH u0 AS (SELECT doc_id,
         |    text || CASE doc_id % 5
         |      WHEN 0 THEN ' contact bob' || doc_id || '@example.com now'
         |      WHEN 1 THEN ' visit https://site' || doc_id || '.example.org/page'
         |      WHEN 2 THEN ' call 555-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') || ' today'
         |      ELSE '' END AS text,
         |    $rawUrlSql AS raw
         |  FROM documents),
         |$canonicalCtes
         |SELECT host, CAST(COUNT(*) AS BIGINT) AS n_docs,
         |  CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS n_tokens,
         |  CAST(SUM(len(regexp_extract_all(text, '${TextOps.emailRe}'))
         |    + len(regexp_extract_all(text, '${TextOps.urlRe}'))
         |    + len(regexp_extract_all(text, '${TextOps.phoneRe}'))) AS BIGINT)
         |    AS n_pii,
         |  CAST(SUM(len(regexp_extract_all(text, '${TextOps.emailRe}'))
         |    + len(regexp_extract_all(text, '${TextOps.urlRe}'))
         |    + len(regexp_extract_all(text, '${TextOps.phoneRe}'))) AS BIGINT)
         |    * CAST(1000000 AS BIGINT)
         |    > CAST(SUM(len(string_split(text, ' '))) AS BIGINT)
         |      * CAST(10000 AS BIGINT) AS pii_risky
         |FROM u5 GROUP BY 1 ORDER BY host""".stripMargin) { (s, d) =>
      val t2 = concat(col("text"),
        when(col("doc_id") % 5 === 0,
          concat(lit(" contact bob"), col("doc_id").cast("string"),
            lit("@example.com now")))
          .when(col("doc_id") % 5 === 1,
            concat(lit(" visit https://site"), col("doc_id").cast("string"),
              lit(".example.org/page")))
          .when(col("doc_id") % 5 === 2,
            concat(lit(" call 555-"),
              lpad((col("doc_id") % 10000).cast("string"), 4, "0"),
              lit(" today")))
          .otherwise(lit("")))
      graft.operators.UrlOps.piiByHost(
          Tables.documents(s, d).withColumn("raw", rawUrlSpark)
            .withColumn("text", t2),
          "raw", "text", maxPerMillionTokens = 10000L)
        .orderBy(col("host"))
    },

    // RECURSIVE (c, l)-DIVERSITY audit (Quality.recursiveLDiversity —
    // Machanavajjhala et al. 2007 §4.2, the criterion dp3's distinct-l
    // misses: l distinct sensitive values with one at 99% still discloses).
    // Per class, r1 < c·(r_l+…+r_m) as a pure cross-multiplied integer
    // comparison (c = 2/1, l = 3 over dp3's QI/sensitive columns); fewer
    // than l values fails by definition (tail coalesces to 0).
    QueryDef(
      "dp6_recursive_l_diversity",
      """WITH vc AS (SELECT event_type, CAST(floor(value) AS BIGINT) AS vb,
        |    user_id, CAST(COUNT(*) AS BIGINT) AS cnt
        |  FROM events WHERE user_id IS NOT NULL GROUP BY 1, 2, 3),
        |rk AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY event_type, vb
        |    ORDER BY cnt DESC, user_id) AS rn FROM vc),
        |cls AS (SELECT event_type, vb, CAST(SUM(cnt) AS BIGINT) AS n_rows,
        |    CAST(COUNT(*) AS BIGINT) AS m_values,
        |    CAST(MAX(CASE WHEN rn = 1 THEN cnt END) AS BIGINT) AS r1,
        |    CAST(COALESCE(SUM(CASE WHEN rn >= 3 THEN cnt END), 0) AS BIGINT)
        |      AS tail_sum
        |  FROM rk GROUP BY 1, 2)
        |SELECT event_type, vb, n_rows, m_values, r1, tail_sum,
        |  tail_sum * CAST(2 AS BIGINT) > r1 * CAST(1 AS BIGINT) AS recursive_ok
        |FROM cls ORDER BY event_type, vb""".stripMargin) { (s, d) =>
      graft.operators.Quality.recursiveLDiversity(
          Tables.events(s, d)
            .withColumn("vb", floor(col("value")).cast("long")),
          Seq("event_type", "vb"), "user_id", l = 3, cNum = 2L, cDen = 1L)
        .orderBy(col("event_type"), col("vb"))
    },

    // FLEISS' KAPPA (Quality.fleissKappa — Fleiss 1971, the multi-rater
    // generalization of e15's Cohen): items = docs with >= 5 words, the
    // fixed n = 5 ratings per item are the first five words (deterministic
    // "raters"). A/S/D/M are exact integer aggregates; kappa is the one
    // fixed IEEE chain over them, round-6 (the cross-multiplied rational
    // overflows a long near 5e5 items — documented in the operator).
    QueryDef(
      "e17_fleiss_kappa",
      """WITH r AS (SELECT doc_id AS i, unnest(string_split(text, ' ')[1:5]) AS c
        |  FROM documents WHERE len(string_split(text, ' ')) >= 5),
        |nic AS (SELECT i, c, CAST(COUNT(*) AS BIGINT) AS nic FROM r GROUP BY 1, 2),
        |item AS (SELECT i, CAST(SUM(nic * (nic - 1)) AS BIGINT) AS ai
        |  FROM nic GROUP BY 1),
        |tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_items,
        |    CAST(SUM(ai) AS BIGINT) AS a_sum FROM item),
        |cat AS (SELECT CAST(SUM(mc * mc) AS BIGINT) AS s_sum FROM
        |  (SELECT CAST(SUM(nic) AS BIGINT) AS mc FROM nic GROUP BY c))
        |SELECT n_items, CAST(5 AS BIGINT) AS n_raters, a_sum, s_sum,
        |  round((CAST(a_sum AS DOUBLE) / CAST(n_items * 5 * 4 AS DOUBLE)
        |      - CAST(s_sum AS DOUBLE) / CAST(n_items * 5 * (n_items * 5) AS DOUBLE))
        |    / (CAST(1 AS DOUBLE)
        |      - CAST(s_sum AS DOUBLE) / CAST(n_items * 5 * (n_items * 5) AS DOUBLE)),
        |    6) AS kappa
        |FROM tot, cat""".stripMargin) { (s, d) =>
      val words = split(col("text"), " ")
      graft.operators.Quality.fleissKappa(
        Tables.documents(s, d).filter(size(words) >= 5)
          .select(col("doc_id").as("item"),
            explode(slice(words, 1, 5)).as("category")),
        "item", "category", n = 5)
    },

    // KRIPPENDORFF'S ALPHA, nominal (Quality.krippendorffAlpha — round 19,
    // completing the agreement family past e15's two raters and e17's
    // fixed-chance P_e): coincidence-matrix D_o/D_e with uniform 4 ratings
    // per item, every term an exact integer over the common 1/(n-1)
    // factor, one round-6 division. Raters = the first LETTERS of the
    // doc's first 4 words (a ~26-category space with real coincidences,
    // unlike whole-word categories which almost never repeat within an
    // item).
    QueryDef(
      "e18_krippendorff_alpha",
      """WITH r AS (SELECT doc_id AS i, substr(w, 1, 1) AS c
        |  FROM (SELECT doc_id, unnest(string_split(text, ' ')[1:4]) AS w
        |        FROM documents WHERE len(string_split(text, ' ')) >= 4)),
        |nic AS (SELECT i, c, CAST(COUNT(*) AS BIGINT) AS nic FROM r GROUP BY 1, 2),
        |item AS (SELECT i, CAST(SUM(nic * (nic - 1)) AS BIGINT) AS ai
        |  FROM nic GROUP BY 1),
        |tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_items,
        |    CAST(SUM(ai) AS BIGINT) AS a_sum FROM item),
        |cat AS (SELECT CAST(SUM(mc) AS BIGINT) AS n_tot,
        |    CAST(SUM(mc * mc) AS BIGINT) AS s_sum FROM
        |  (SELECT CAST(SUM(nic) AS BIGINT) AS mc FROM nic GROUP BY c))
        |SELECT n_items, CAST(4 AS BIGINT) AS n_raters,
        |  CAST(n_items * 4 * 3 - a_sum AS BIGINT) AS do_num,
        |  CAST(n_tot * n_tot - s_sum AS BIGINT) AS pairs_neq,
        |  round(CAST(1 AS DOUBLE)
        |    - CAST(n_tot - 1 AS DOUBLE) * CAST(n_items * 4 * 3 - a_sum AS DOUBLE)
        |    / nullif(CAST(3 * (n_tot * n_tot - s_sum) AS DOUBLE), CAST(0 AS DOUBLE)),
        |    6) AS alpha
        |FROM tot, cat""".stripMargin) { (s, d) =>
      val words = split(col("text"), " ")
      graft.operators.Quality.krippendorffAlpha(
        Tables.documents(s, d).filter(size(words) >= 4)
          .select(col("doc_id").as("item"),
            explode(slice(words, 1, 4)).as("w"))
          .select(col("item"), substring(col("w"), 1, 1).as("category")),
        "item", "category", n = 4)
    },

    // MIX CONCENTRATION (Sampling.mixConcentration): Simpson's index of
    // the source mix — an exact rational, unlike entropy — and the
    // effective number of sources; the one-row dial a mix review reads
    // before re-weighting. DECIMAL(38,0) pair counts, two round-6
    // divisions.
    QueryDef(
      "sm16_mix_simpson",
      """WITH c AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS n
        |  FROM documents GROUP BY 1),
        |t AS (SELECT CAST(SUM(n) AS BIGINT) AS n_rows,
        |    CAST(COUNT(*) AS BIGINT) AS n_keys,
        |    SUM(CAST(n AS HUGEINT) * CAST(n - 1 AS HUGEINT)) AS pairs FROM c)
        |SELECT n_rows, n_keys,
        |  round(CAST(pairs AS DOUBLE) / nullif(CAST(CAST(n_rows AS HUGEINT)
        |    * CAST(n_rows - 1 AS HUGEINT) AS DOUBLE), CAST(0 AS DOUBLE)), 6)
        |    AS simpson,
        |  round(CAST(CAST(n_rows AS HUGEINT) * CAST(n_rows - 1 AS HUGEINT)
        |      AS DOUBLE) / nullif(CAST(pairs AS DOUBLE), CAST(0 AS DOUBLE)), 6)
        |    AS effective_keys
        |FROM t""".stripMargin) { (s, d) =>
      graft.operators.Sampling.mixConcentration(
        Tables.documents(s, d), "source")
    },

    // COHORT RETENTION matrix (EventOps.cohortRetention): users cohorted
    // by first-activity date, exact distinct-active counts per
    // (cohort_date, day_offset) — one distinct + one user-keyed window +
    // one count, no activity self-join. Calendar-sized output.
    QueryDef(
      "w15_cohort_retention",
      """WITH days AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events),
        |c AS (SELECT user_id, d,
        |    MIN(d) OVER (PARTITION BY user_id) AS cohort_date FROM days)
        |SELECT cohort_date, CAST(d - cohort_date AS BIGINT) AS day_offset,
        |  CAST(COUNT(*) AS BIGINT) AS n_active
        |FROM c GROUP BY 1, 2 ORDER BY cohort_date, day_offset""".stripMargin) { (s, d) =>
      graft.operators.EventOps.cohortRetention(Tables.events(s, d),
          "user_id", "ts")
        .orderBy(col("cohort_date"), col("day_offset"))
    },

    // FUNNEL TIME-TO-CONVERT distribution (Funnel.conversionLatency):
    // exact integer-micro order statistics of t_last − t0 over completed
    // chains — median/p90 are data elements at ranks ceil(n/2), ceil(9n/10)
    // (the sk3 rank-select convention), served from the two-level bucket
    // walk, never a global sort.
    QueryDef(
      "w16_funnel_latency",
      """WITH u1 AS (SELECT user_id, ts, event_type,
        |    MIN(CASE WHEN event_type = 'view' THEN ts END)
        |      OVER (PARTITION BY user_id) AS t0
        |  FROM events),
        |u2 AS (SELECT *, MIN(CASE WHEN event_type = 'click' AND ts > t0
        |      THEN ts END) OVER (PARTITION BY user_id) AS t1 FROM u1),
        |u3 AS (SELECT *, MIN(CASE WHEN event_type = 'purchase' AND ts > t1
        |      THEN ts END) OVER (PARTITION BY user_id) AS t2 FROM u2),
        |per AS (SELECT user_id, MIN(t0) AS t0, MIN(t2) AS t2
        |  FROM u3 GROUP BY user_id),
        |lat AS (SELECT epoch_us(t2) - epoch_us(t0) AS l FROM per
        |  WHERE t2 IS NOT NULL),
        |s AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_converted,
        |    CAST(MIN(l) AS BIGINT) AS min_us, CAST(MAX(l) AS BIGINT) AS max_us
        |  FROM lat),
        |r AS (SELECT l, ROW_NUMBER() OVER (ORDER BY l) AS rn FROM lat),
        |med AS (SELECT CAST(l AS BIGINT) AS median_us FROM r, s
        |  WHERE rn = (n_converted + 1) // 2),
        |p90 AS (SELECT CAST(l AS BIGINT) AS p90_us FROM r, s
        |  WHERE rn = (9 * n_converted + 9) // 10)
        |SELECT n_converted, min_us, median_us, p90_us, max_us
        |FROM s, med, p90""".stripMargin) { (s, d) =>
      graft.operators.Funnel.conversionLatency(Tables.events(s, d),
        "user_id", "ts", "event_type", Seq("view", "click", "purchase"))
    },

    // WITHIN-DOC PARAGRAPH DEDUP-AND-REBUILD (TextOps.paragraphDedup —
    // Gopher repetition REMOVAL; t13 only measures the signals). The
    // fixture text carries no paragraph structure, so a paragraph-shaped
    // document is synthesized by the SAME expression on both sides (the
    // rawUrlSql precedent): [first-3-words, full text, a WHITESPACE-VARIANT
    // copy of the first 3 words, words 4-6] joined on '|' — every doc
    // plants exactly one duplicate that only normalization catches, so the
    // hashed output proves trim+collapse matching and keep-first order, not
    // just pass-through. All per-row map-side array algebra — the text
    // never shuffles.
    QueryDef(
      "t30_paragraph_dedup",
      """WITH u0 AS (SELECT doc_id,
        |    regexp_extract(text, '^(\S+ \S+ \S+)', 1) AS s1,
        |    regexp_extract(text, '^\S+ \S+ \S+ (\S+ \S+ \S+)', 1) AS s2, text
        |  FROM documents),
        |p AS (SELECT doc_id,
        |    string_split(s1 || '|' || text || '| ' || s1 || ' |' || s2, '|') AS paras
        |  FROM u0),
        |n AS (SELECT doc_id, paras,
        |    list_transform(paras, q -> regexp_replace(trim(q), '\s+', ' ', 'g')) AS norms
        |  FROM p),
        |k AS (SELECT doc_id, paras,
        |    list_filter(paras, (x, i) -> list_position(norms, norms[i]) = i) AS kept
        |  FROM n)
        |SELECT doc_id AS sid, array_to_string(kept, '|') AS text_dedup,
        |  CAST(len(paras) AS BIGINT) AS n_paras, CAST(len(kept) AS BIGINT) AS n_kept
        |FROM k ORDER BY sid""".stripMargin) { (s, d) =>
      val s1 = regexp_extract(col("text"), "^(\\S+ \\S+ \\S+)", 1)
      val s2 = regexp_extract(col("text"), "^\\S+ \\S+ \\S+ (\\S+ \\S+ \\S+)", 1)
      TextOps.paragraphDedup(
          Tables.documents(s, d).withColumn("para_text",
            concat(s1, lit("|"), col("text"), lit("| "), s1, lit(" |"), s2)),
          "doc_id", "para_text", sep = "|")
        .orderBy(col("sid"))
    }
  )
}
