package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class GraphOpsSpec extends SparkSpec {
  import spark.implicits._

  test("derivationEdges: copiers link to the first holder, originators link nowhere") {
    val docs = Seq(
      (1L, "a b c d"),   // first holder of "a b c" and "b c d"
      (2L, "a b c x"),   // shares "a b c" -> edge 2 -> 1
      (3L, "a b c d")    // shares both grams -> ONE distinct edge 3 -> 1
    ).toDF("doc_id", "text")
    val edges = GraphOps.derivationEdges(docs, "doc_id", "text", 3)
      .as[(Long, Long)].collect().toSet
    assert(edges == Set((2L, 1L), (3L, 1L)))
  }

  test("pageRank: hand-checkable star, two exact integer iterations") {
    val edges = Seq((2L, 1L), (3L, 1L)).toDF("src", "dst")
    val nodes = Seq(1L, 2L, 3L).toDF("sid")
    val r1 = GraphOps.pageRank(edges, nodes, "sid", iters = 1)
      .as[(Long, Long)].collect().toMap
    // r(1) = 150000 + (10^6/1 + 10^6/1) * 0.85 = 1850000; leaves get base
    assert(r1 == Map(1L -> 1850000L, 2L -> 150000L, 3L -> 150000L))
    val r2 = GraphOps.pageRank(edges, nodes, "sid", iters = 2)
      .as[(Long, Long)].collect().toMap
    // r(1) = 150000 + (150000 + 150000) * 850000 // 10^6 = 405000
    assert(r2 == Map(1L -> 405000L, 2L -> 150000L, 3L -> 150000L))
  }

  test("pageRank: originators outrank copiers on the derivation graph") {
    val docs = Seq(
      (1L, "p q r s t u"),        // origin of everything
      (2L, "p q r s x y"),        // copies from 1
      (3L, "p q r z w v"),        // copies from 1
      (4L, "m n o k l j")         // isolated
    ).toDF("doc_id", "text")
    val edges = GraphOps.derivationEdges(docs, "doc_id", "text", 3)
    val r = GraphOps.pageRank(edges, docs, "doc_id", iters = 3)
      .as[(Long, Long)].collect().toMap
    assert(r(1L) > r(2L) && r(1L) > r(3L) && r(1L) > r(4L))
    // copiers and the isolated doc have no in-links: exactly the base rank
    assert(r(2L) == 150000L && r(4L) == 150000L)
  }

  test("refreshAuthority lifecycle: versions isolated, replay rewrites identical ranks") {
    val docs = Seq(
      (1L, "p q r s t u"), (2L, "p q r s x y"), (3L, "p q r z w v"),
      (4L, "m n o k l j"), (5L, "m n o k z q")
    ).toDF("doc_id", "text")
    val path = spark.conf.get("spark.sql.warehouse.dir").stripPrefix("file:") +
      "/graft_authority_spec_" +
      spark.sparkContext.applicationId.replaceAll("[^a-zA-Z0-9]", "_")
    val v0Corpus = docs.filter($"doc_id" <= 3L)
    val storedBefore = spark.sparkContext.getPersistentRDDs.keySet
    GraphOps.refreshAuthority(v0Corpus, "doc_id", "text", 3, 2, 0L, path)
    assert(spark.sparkContext.getPersistentRDDs.keySet == storedBefore,
      "a refresh must free every checkpoint it registered (periodic loops)")
    GraphOps.refreshAuthority(docs, "doc_id", "text", 3, 2, 1L, path)
    val before = GraphOps.serveAuthority(spark, path, 1L)
      .as[(Long, Long, Long)].collect().toSet
    // injected retry: the replay must rewrite identical ranks, and v0
    // must survive untouched (partition-replace, not truncate-and-load)
    GraphOps.refreshAuthority(docs, "doc_id", "text", 3, 2, 1L, path)
    val after = GraphOps.serveAuthority(spark, path, 1L)
      .as[(Long, Long, Long)].collect().toSet
    assert(after == before)
    val v0 = GraphOps.serveAuthority(spark, path, 0L)
      .select($"sid", $"rank_fp").as[(Long, Long)].collect().toMap
    val direct0 = GraphOps.pageRank(
        GraphOps.derivationEdges(v0Corpus, "doc_id", "text", 3),
        v0Corpus, "doc_id", iters = 2)
      .as[(Long, Long)].collect().toMap
    assert(v0 == direct0, "served v0 == from-scratch ranks on the v0 corpus")
    assert(v0.keySet == Set(1L, 2L, 3L) && after.map(_._1) == (1L to 5L).toSet)
  }

  test("labelPropagate: majority vote, lex tie-break, clamped seeds, round stamps") {
    val pairs = Seq((1L, 2L), (2L, 3L), (1L, 4L), (5L, 6L),
      (10L, 7L), (10L, 8L), (10L, 9L), (20L, 21L), (21L, 22L))
      .toDF("ida", "idb")
    val seeds = Seq((1L, "en"), (3L, "fr"), (6L, "de"),
      (7L, "es"), (8L, "es"), (9L, "en"), (20L, "zh"))
      .toDF("sid", "label")
    val out = GraphOps.labelPropagate(pairs, seeds, rounds = 2).collect()
      .map(r => r.getAs[Long]("sid") ->
        ((r.getAs[String]("label"), r.getAs[Long]("round")))).toMap
    assert(out(1L) == (("en", 0L)))  // seeds clamped at round 0
    assert(out(2L) == (("en", 1L)))  // en/fr tie -> lex smallest
    assert(out(4L) == (("en", 1L)))
    assert(out(5L) == (("de", 1L)))
    assert(out(10L) == (("es", 1L))) // majority: 2 es vs 1 en
    assert(out(21L) == (("zh", 1L))) // chain: hop 1 ...
    assert(out(22L) == (("zh", 2L))) // ... reaches hop 2 in round 2
    assert(out.size == 13)           // 7 seeds + 5 in round 1 + 1 in round 2
  }

  test("pageRank: deterministic under repartitioning; edge-free graph sits at the base") {
    val edges = Seq((2L, 1L), (3L, 1L), (3L, 2L), (4L, 2L)).toDF("src", "dst")
    val nodes = (1L to 5L).toDF("sid")
    val a = GraphOps.pageRank(edges, nodes, "sid", iters = 4)
      .as[(Long, Long)].collect().toMap
    val b = GraphOps.pageRank(edges.repartition(7), nodes.repartition(3),
      "sid", iters = 4).as[(Long, Long)].collect().toMap
    assert(a == b)
    val none = GraphOps.pageRank(edges.limit(0), nodes, "sid", iters = 2)
      .as[(Long, Long)].collect().toMap
    assert(none.values.toSet == Set(150000L) && none.keySet == (1L to 5L).toSet)
  }

  test("hits: hand-computed two rounds on a star-plus-chain graph") {
    // 1->3, 2->3, 2->4: node 2 is the stronger hub (two targets), 3 the
    // stronger authority (two sources, one of them the best hub)
    val edges = Seq((1L, 3L), (2L, 3L), (2L, 4L)).toDF("src", "dst")
    val nodes = Seq(1L, 2L, 3L, 4L, 5L).toDF("sid")
    val out = GraphOps.hits(edges, nodes, "sid", iters = 2)
      .as[(Long, Long, Long)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    // round 1: h = outdeg -> h(1)=1, h(2)=2; a(3)=h1+h2=3, a(4)=h2=2
    // round 2: h(1)=a(3)=3, h(2)=a(3)+a(4)=5; a(3)=h(1)+h(2)=8, a(4)=h(2)=5
    assert(out(1L) == ((3L, 0L)))
    assert(out(2L) == ((5L, 0L)))
    assert(out(3L) == ((0L, 8L)))
    assert(out(4L) == ((0L, 5L)))
    assert(out(5L) == ((0L, 0L))) // isolated node: present, both zero
  }
}
