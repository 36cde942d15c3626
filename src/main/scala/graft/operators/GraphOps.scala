package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Graph analytics over corpus-derived relations — the provenance/authority
  * layer of a curation pipeline. A web-scale corpus is not a bag of
  * documents: content flows between them (syndication, quoting, mirroring),
  * and ranking documents by where content ORIGINATES (rather than where it
  * appears) is the classic authority signal — CommonCrawl-derived corpora
  * weight pages by link authority for exactly this reason. The reference has
  * no graph surface at all; this extends its relational model the same way
  * the dedup family does (beyond-reference operator, SURVEY.md §8).
  */
object GraphOps {

  /** Content-DERIVATION edges: `src` → `dst` when document `src` contains a
    * word n-gram whose corpus-wide FIRST holder (minimum id — the d21
    * novelty convention, ids are ingest order) is `dst`. "src quotes /
    * derives from dst", the provenance relation [[Dedup.ngramNovelty]]
    * aggregates away: novelty counts how much of a doc is first-held
    * elsewhere; this keeps WHO holds it. Self-loops are excluded by
    * construction (`dst < src` strictly), so the graph is a DAG in id
    * order: derivation can only point backward in ingest time.
    *
    * Scale shape: documents reduce to distinct 48-bit gram hashes in-scan
    * (never text through a shuffle); the first-holder reduce is one
    * map-side-combinable gram-keyed MIN; the edge join fans out df(g)−1
    * edges per gram — LINEAR in total gram occurrences (each occurrence
    * yields at most one edge), unlike pair-generating dedup joins that go
    * df², so no hot-gram cap is needed. The final distinct is one shuffle
    * of (src, dst) id pairs.
    */
  def derivationEdges(df: DataFrame, idCol: String, textCol: String,
                      n: Int): DataFrame = {
    // cut: the gram relation feeds BOTH the first-holder reduce and the
    // edge join — one materialization, not two tokenize+hash passes
    // (exchange reuse is not guaranteed under AQE). The leaf stays for the
    // result plan (the shuffleOrder contract: the session sweep reclaims
    // it); [[refreshAuthority]] frees it per refresh.
    val sh = graft.core.Storage.cut(
      Dedup.wordShingleHashes(df, idCol, textCol, n), eager = false)
    val first = sh.groupBy(col("g")).agg(min(col("sid")).as("dst"))
    sh.join(first, Seq("g"))
      .filter(col("dst") < col("sid"))
      .select(col("sid").as("src"), col("dst"))
      .distinct()
  }

  /** PageRank (Page et al. 1999) in exact integer fixed point — the
    * authority rank over [[derivationEdges]] (or any edge list): documents
    * whose content others copy score high, serial copiers score the floor.
    * Unnormalized per-node form with rank unit 10^6: r₀(v) = 10^6,
    * rᵢ₊₁(v) = (10^6 − dampingFp) + ⌊dampingFp · Σ_{u→v} ⌊rᵢ(u)/deg(u)⌋ / 10^6⌋.
    * Every operation is integer floor division on nonnegative operands
    * (Spark `div` == DuckDB `//`), so ranks are bit-identical in any
    * engine — no float mass vector, no convergence epsilon. Dangling mass
    * (nodes with no out-edges) is dropped, not redistributed — the "weak"
    * PageRank variant; ranks order identically for authority use. Fixed
    * `iters` rather than a convergence test keeps cost contractual.
    *
    * Scale shape: per iteration — one equi-join of the rank state (sid,
    * long) against the degree-annotated edge list, one map-side-combinable
    * dst-keyed sum (in decimal(38,0): Σ⌊r/d⌋ is corpus × 10^6, and ×
    * dampingFp passes long range at 100 TB), one left join back to the
    * node set. The edge list is checkpointed ONCE with its degrees and
    * reused every round; each round's rank state is checkpointed and the
    * superseded round freed (the connectedComponents loop discipline —
    * unbounded lineage otherwise re-analyzes an exponentially growing plan
    * on the driver). Driver state: nothing but the loop counter.
    */
  def pageRank(edges: DataFrame, nodes: DataFrame, idCol: String,
               iters: Int, dampingFp: Long = 850000L): DataFrame =
   graft.core.Storage.freeingIntermediates(edges.sparkSession) {
    val unit = 1000000L
    require(iters >= 1 && iters <= 50, s"iters must be in [1, 50], got $iters")
    require(dampingFp >= 0 && dampingFp <= unit,
      s"dampingFp is parts-per-million in [0, $unit], got $dampingFp")
    val cut = graft.core.Storage.cut(_: DataFrame, _: Boolean)
    val deg = edges.groupBy(col("src")).agg(count(lit(1)).as("__d"))
    val e = cut(edges.join(deg, Seq("src")), true)
    var ranks = cut(nodes.select(col(idCol).as("sid")).distinct()
      .withColumn("rank_fp", lit(unit)), true)
    var i = 0
    while (i < iters) {
      val prev = ranks
      ranks = cut(rankRound(e, prev, dampingFp), true)
      graft.core.Storage.freeCheckpoint(prev)
      i += 1
    }
    ranks
   }

  /** LABEL PROPAGATION over an undirected pair list (Zhu & Ghahramani
    * 2002 / Raghavan et al. 2007, the clamped-seed variant): nodes with a
    * seed label keep it (round 0); each synchronous round, every still-
    * unlabeled node adopts the MAJORITY label among its already-labeled
    * neighbors, ties to the lexicographically smallest label — fully
    * deterministic, so the assignment is engine-reproducible. The weak-
    * supervision move a curation pipeline uses to spread a trusted metadata
    * label (language, topic, license) across a near-dup graph to documents
    * that lost theirs.
    *
    * Returns (sid, label, round) for nodes labeled within `rounds` rounds
    * (round = when the label arrived); untouched nodes are absent — left
    * join from the corpus to see them as NULL.
    *
    * Scale shape: per round one equi-join of the label state against the
    * checkpointed bidirectional edge list, one (sid, label) count
    * aggregate (map-side combinable; state per node bounded by its
    * neighbor-label diversity) and a per-NODE argmax window (per-node
    * cardinality = its distinct neighbor labels — never a global or
    * per-label sort). Each round's state is checkpointed and the
    * superseded one freed (the pageRank loop discipline).
    */
  def labelPropagate(pairs: DataFrame, seeds: DataFrame,
                     rounds: Int): DataFrame =
   graft.core.Storage.freeingIntermediates(pairs.sparkSession) {
    import org.apache.spark.sql.expressions.Window
    require(rounds >= 1 && rounds <= 50, s"rounds must be in [1, 50], got $rounds")
    val cut = graft.core.Storage.cut(_: DataFrame, _: Boolean)
    val bidir = cut(pairs.select(col("ida").as("a"), col("idb").as("b"))
      .unionByName(pairs.select(col("idb").as("a"), col("ida").as("b")))
      .distinct(), true)
    // a NULL seed label would WIN every majority tie (nulls sort first
    // under asc) and spread as a real label — fail loud instead
    var labeled = cut(seeds.select(col("sid"),
      when(col("label").isNull,
        raise_error(lit("labelPropagate: seed labels must be non-null")))
        .otherwise(col("label")).as("label"),
      lit(0L).as("round")), true)
    var r = 1
    while (r <= rounds) {
      val votes = bidir
        .join(labeled.select(col("sid").as("a"), col("label")), Seq("a"))
        .select(col("b").as("sid"), col("label"))
        .join(labeled.select(col("sid")), Seq("sid"), "left_anti")
        .groupBy(col("sid"), col("label")).agg(count(lit(1)).as("__c"))
      val w = Window.partitionBy(col("sid"))
        .orderBy(col("__c").desc, col("label").asc)
      val fresh = votes.withColumn("__rn", row_number().over(w))
        .filter(col("__rn") === 1)
        .select(col("sid"), col("label"), lit(r.toLong).as("round"))
      val prev = labeled
      labeled = cut(prev.unionByName(fresh), true)
      graft.core.Storage.freeCheckpoint(prev)
      r += 1
    }
    labeled
   }

  /** HITS hubs & authorities (Kleinberg 1999) in the exact-integer,
    * UNNORMALIZED, fixed-iteration form (the [[pageRank]] discipline —
    * no float mass vector, no convergence epsilon, engine-identical
    * outputs): a₀ = 1 everywhere, then per round
    * h(u) = Σ_{u→v} a(v), a(v) = Σ_{u→v} h(u). Normalization only
    * rescales, so hub/authority ORDER — the consumable — is the
    * normalized algorithm's. Values grow like (max degree)^(2·iters),
    * which is why `iters` is capped at 4: the BIGINT bound is the
    * caller's contract (a web-scale run wanting more rounds needs the
    * renormalized float variant, deliberately out of scope here).
    *
    * Scale shape: per round two equi-joins of an id+long state against
    * the checkpointed edge list and two map-side-combinable sums — the
    * pageRank loop's cost, twice. Each round's state is checkpointed and
    * the superseded one freed; driver holds only the loop counter.
    */
  def hits(edges: DataFrame, nodes: DataFrame, idCol: String,
           iters: Int): DataFrame =
   graft.core.Storage.freeingIntermediates(edges.sparkSession) {
    require(iters >= 1 && iters <= 4,
      s"iters must be in [1, 4] (value bound is degree^(2*iters)), got $iters")
    val cut = graft.core.Storage.cut(_: DataFrame, _: Boolean)
    val e = cut(edges.select(col("src"), col("dst")).distinct(), true)
    val ns = cut(nodes.select(col(idCol).as("sid")).distinct(), true)
    var auth = cut(ns.withColumn("a", lit(1L)), true)
    var hubs = cut(ns.withColumn("h", lit(0L)), true)
    var i = 0
    while (i < iters) {
      val h1 = cut(ns.join(
        e.join(auth.select(col("sid").as("dst"), col("a")), Seq("dst"))
          .groupBy(col("src").as("sid")).agg(sum(col("a")).as("__h")),
        Seq("sid"), "left")
        .select(col("sid"), coalesce(col("__h"), lit(0L)).as("h")), true)
      graft.core.Storage.freeCheckpoint(hubs)
      hubs = h1
      val a1 = cut(ns.join(
        e.join(hubs.select(col("sid").as("src"), col("h")), Seq("src"))
          .groupBy(col("dst").as("sid")).agg(sum(col("h")).as("__a")),
        Seq("sid"), "left")
        .select(col("sid"), coalesce(col("__a"), lit(0L)).as("a")), true)
      graft.core.Storage.freeCheckpoint(auth)
      auth = a1
      i += 1
    }
    hubs.join(auth, Seq("sid"))
      .select(col("sid"), col("h").as("hub_fp"), col("a").as("auth_fp"))
   }

  /** One rank-update round over the degree-annotated checkpointed edge
    * list `e` and the previous round's `ranks`: rank-in per dst as a
    * map-side-combinable decimal sum, damping, left-join back to the node
    * set. Shared by the [[pageRank]] loop and [[pageRankRoundForPlan]].
    */
  private def rankRound(e: DataFrame, ranks: DataFrame,
                        dampingFp: Long): DataFrame = {
    val unit = 1000000L
    val dec = org.apache.spark.sql.types.DataTypes.createDecimalType(38, 0)
    val in = e.join(ranks.select(col("sid").as("src"), col("rank_fp")),
        Seq("src"))
      .select(col("dst").as("sid"), expr("rank_fp div __d").as("__m"))
      .groupBy(col("sid")).agg(sum(col("__m").cast(dec)).as("__s"))
    ranks.select(col("sid"))
      .join(in, Seq("sid"), "left")
      .withColumn("__s0", coalesce(col("__s"), lit(0L)).cast(dec))
      .select(col("sid"),
        (lit(unit - dampingFp) + expr(
          s"CAST((__s0 * CAST($dampingFp AS DECIMAL(38,0))) div $unit AS BIGINT)"))
          .as("rank_fp"))
  }

  /** ONE un-executed rank-update round over checkpointed state — the
    * plan-inspection hook behind PLANS.md's g2 per-round section. The
    * served g2 query's own plan is a partition-pruned parquet read (the
    * refresh executes during construction); the per-round join is the
    * part whose shape matters at scale: a scan of the CHECKPOINTED
    * degree-annotated edge list (derivation edges are never re-derived
    * per round), the dst-keyed map-side sum, and the node-set left join.
    */
  private[graft] def pageRankRoundForPlan(corpus: DataFrame, idCol: String,
                                          textCol: String,
                                          n: Int): DataFrame = {
    val cut = graft.core.Storage.cut(_: DataFrame, _: Boolean)
    val edges = derivationEdges(corpus, idCol, textCol, n)
    val deg = edges.groupBy(col("src")).agg(count(lit(1)).as("__d"))
    val e = cut(edges.join(deg, Seq("src")), true)
    val ranks = cut(corpus.select(col(idCol).as("sid")).distinct()
      .withColumn("rank_fp", lit(1000000L)), true)
    rankRound(e, ranks, 850000L)
  }

  /** Versioned authority-rank REFRESH — the ds9 model-refresh discipline
    * applied to the graph family: recompute [[derivationEdges]] +
    * [[pageRank]] over the corpus snapshot and land the ranks by
    * partition-replace on `rank_version`. Authority is a corpus-global
    * fixed point — a batch append changes every rank in principle, so the
    * honest refresh is periodic recompute (cost ∝ corpus per refresh, like
    * a warehouse dimension rebuild), NOT per-batch incrementality; what IS
    * exactly-once is the landing: storage-derived input + integer-
    * deterministic ranks make a replayed refresh rewrite identical bytes,
    * and rollback = serve the previous version.
    */
  def refreshAuthority(corpus: DataFrame, idCol: String, textCol: String,
                       n: Int, iters: Int, version: Long,
                       ranksPath: String): Unit = {
    // freeingIntermediates with a null result: the write is the output, so
    // EVERY checkpoint this refresh registered — the corpus-scale shingle
    // leaf inside derivationEdges included — is freed on exit. A periodic
    // refresh loop in a long-lived session must not grow executor storage
    // by one shingle table per refresh.
    graft.core.Storage.freeingIntermediates(corpus.sparkSession) {
      val ranks = pageRank(derivationEdges(corpus, idCol, textCol, n),
        corpus, idCol, iters)
      graft.sources.Sinks.overwriteRunPartition(
        ranks.withColumn("rank_version", lit(version)),
        ranksPath, "rank_version")
      null
    }
    ()
  }

  /** Partition-pruned serve of ONE committed rank version from a
    * [[refreshAuthority]] store — (sid, rank_fp, rank_version).
    */
  def serveAuthority(spark: org.apache.spark.sql.SparkSession,
                     ranksPath: String, version: Long): DataFrame =
    spark.read.parquet(ranksPath)
      .filter(col("rank_version") === version)
      .select(col("sid"), col("rank_fp"),
        col("rank_version").cast("long").as("rank_version"))
}
