package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SimilaritySpec extends SparkSpec {
  import spark.implicits._

  private def vecs = Seq(
    (0L, Array(1.0f, 0.0f, 0.0f)),
    (1L, Array(0.9f, 0.1f, 0.0f)), // closest to 0
    (2L, Array(0.0f, 1.0f, 0.0f)),
    (3L, Array(-1.0f, 0.0f, 0.0f))
  ).toDF("vec_id", "embedding")

  test("bruteForceTopK ranks by cosine, excludes self, deterministic tiebreak") {
    val out = Similarity.bruteForceTopK(
      vecs.filter($"vec_id" === 0), vecs, "vec_id", "embedding", 3)
      .select("nid", "rank").as[(Long, Long)].collect().sortBy(_._2)
    assert(out.map(_._1).toSeq == Seq(1L, 2L, 3L)) // by descending cosine
  }

  test("semanticDecontaminate: planted dup flags, tie to smallest bid, pairless NULL") {
    val corpus = Seq(
      (0L, Array(1.0f, 0.0f, 0.0f)),   // identical to benchmark 10 -> cos 1
      (1L, Array(0.99f, 0.14f, 0.0f)), // near benchmark 10 (~0.99)
      (2L, Array(0.0f, 0.0f, 1.0f)),   // orthogonal to both
      (3L, Array(0.0f, 0.0f, 0.0f)))   // zero-norm: no defined pair
      .toDF("vec_id", "embedding")
    val bench = Seq(
      (10L, Array(1.0f, 0.0f, 0.0f)),
      (11L, Array(0.0f, 1.0f, 0.0f)),
      (12L, Array(1.0f, 0.0f, 0.0f))) // duplicate of 10: argmax tie
      .toDF("vec_id", "embedding")
    val out = Similarity.semanticDecontaminate(corpus, bench,
        "vec_id", "embedding", minCosine = 0.98)
      .orderBy($"sid")
      .as[(Long, Option[Long], Option[Double], Boolean)].collect().toSeq
    // 0: cos 1.0 against BOTH 10 and 12 — the tie breaks to bid 10
    assert(out(0) == ((0L, Some(10L), Some(1.0), true)), out(0).toString)
    // 1: near-dup of 10 clears the 0.98 bar
    assert(out(1)._2 == Some(10L) && out(1)._4, out(1).toString)
    assert(out(1)._3.get > 0.98 && out(1)._3.get < 1.0)
    // 2: defined cosines but all 0 — best still reported, not contaminated
    assert(out(2)._3 == Some(0.0) && !out(2)._4, out(2).toString)
    // 3: zero-norm corpus vector — every pair NULL, surfaces uncontaminated
    assert(out(3) == ((3L, None, None, false)), out(3).toString)
    // agrees with bruteForceTopK's rank-1 against the benchmark (ids are
    // disjoint so the self-pair exclusion is inert; zero-norm 3 has no row)
    val top1 = Similarity.bruteForceTopK(corpus, bench, "vec_id", "embedding", 1)
      .filter($"cosine".isNotNull) // topK ranks NULL-cosine rows last, keeps them
      .select($"qid", $"nid", $"cosine")
      .as[(Long, Long, Option[Double])].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    out.filter(_._2.isDefined).foreach { case (sid, bid, cos, _) =>
      assert(top1(sid) == ((bid.get, cos)), s"sid=$sid: ${top1.get(sid)}")
    }
    assert(!top1.contains(3L))
  }

  test("hardNegatives: wrong-label only, equals label-filtered brute force") {
    val emb = graft.core.Tables.embeddings(spark, sf)
    val q = emb.filter($"vec_id" < 8)
    val got = Similarity.hardNegatives(emb.filter($"vec_id" < 8), emb,
        "vec_id", "embedding", "label", 5)
      .as[(Long, Long, Long, Option[Double], Long)].collect()
    val labels = emb.select($"vec_id", $"label".cast("long"))
      .as[(Long, Long)].collect().toMap
    // never the query itself, never its own label
    got.foreach { case (qid, nid, nlabel, _, _) =>
      assert(nid != qid)
      assert(nlabel == labels(nid))
      assert(nlabel != labels(qid), s"same-label negative $nid for $qid")
    }
    // equals the exact ranking restricted to wrong-label candidates: take
    // a full brute-force ranking and re-rank after the label filter
    val n = emb.count().toInt
    val full = Similarity.bruteForceTopK(q, emb, "vec_id", "embedding", n)
      .as[(Long, Long, Option[Double], Long)].collect()
    val want = full.groupBy(_._1).toSeq.flatMap { case (qid, rows) =>
      rows.sortBy(_._4).filter(r => labels(r._2) != labels(qid)).take(5)
        .zipWithIndex.map { case ((_, nid, _, _), i) => (qid, nid, i + 1L) }
        .toSeq
    }.toSet
    assert(got.map(r => (r._1, r._2, r._5)).toSet == want,
      "hard negatives must be the label-filtered exact ranking")
  }

  test("pairedCosineFilter: aligned keeps, mismatched drops, zero-norm NULL+false") {
    val img = Seq(
      (0L, Array(1.0f, 0.0f, 0.0f)),
      (1L, Array(1.0f, 0.0f, 0.0f)),
      (2L, Array(0.0f, 0.0f, 0.0f)), // zero norm -> undefined cosine
      (3L, Array(0.6f, 0.8f, 0.0f))
    ).toDF("vec_id", "embedding")
    val cap = Seq(
      (0L, Array(1.0f, 0.0f, 0.0f)),  // identical -> cos 1, keep
      (1L, Array(0.0f, 1.0f, 0.0f)),  // orthogonal -> cos 0, drop
      (2L, Array(1.0f, 0.0f, 0.0f)),
      (9L, Array(1.0f, 0.0f, 0.0f))   // no left side -> pair absent
    ).toDF("vec_id", "embedding")
    val out = Similarity.pairedCosineFilter(img, cap, "vec_id", "embedding",
      minCosine = 0.28).collect()
      .map(r => r.getAs[Long]("sid") ->
        ((Option(r.get(r.fieldIndex("cosine"))), r.getAs[Boolean]("keep"))))
      .toMap
    assert(out.keySet == Set(0L, 1L, 2L)) // inner join on the pair id
    assert(out(0L)._1.get.asInstanceOf[Double] == 1.0 && out(0L)._2)
    assert(out(1L)._1.get.asInstanceOf[Double] == 0.0 && !out(1L)._2)
    assert(out(2L)._1.isEmpty && !out(2L)._2) // zero norm: NULL, never kept
  }

  test("nearDupPairs finds only the close pair at high threshold") {
    val pairs = Similarity.nearDupPairs(vecs, "vec_id", "embedding", 0.95)
      .select("ida", "idb").as[(Long, Long)].collect().toSet
    assert(pairs == Set((0L, 1L)))
  }

  test("lshTopK neighbors are true neighbors (precision vs brute force)") {
    val emb = graft.core.Tables.embeddings(spark, sf)
    val brute = Similarity.bruteForceTopK(emb, emb, "vec_id", "embedding", 15)
      .select("qid", "nid").as[(Long, Long)].collect().groupBy(_._1)
      .view.mapValues(_.map(_._2).toSet).toMap
    val lsh = Similarity.lshTopK(emb, "vec_id", "embedding", 64, 8, 10, 5)
      .select("qid", "nid").as[(Long, Long)].collect()
    // LSH@5 hits inside brute-force top-15: must beat the random baseline
    // (15/500 = 3%) by a wide margin. Uniform random embeddings are the
    // worst case for LSH — real clustered embeddings score far higher.
    val hits = lsh.count { case (q, n) => brute.getOrElse(q, Set.empty).contains(n) }
    assert(lsh.nonEmpty)
    assert(hits.toDouble / lsh.length > 0.15,
      s"LSH precision ${hits.toDouble / lsh.length} below 5x random baseline")
  }

  test("lshNearDupPairs: precision 1 vs the exact baseline, useful recall") {
    val emb = graft.core.Tables.embeddings(spark, sf)
    val exact = Similarity.nearDupPairs(emb, "vec_id", "embedding", 0.45)
      .select("ida", "idb").as[(Long, Long)].collect().toSet
    // near-dup LSH wants SHORT signatures (6 bits) over MANY tables (16):
    // at cosine 0.45 (~63 degrees) per-plane agreement is ~0.65, so a 6-bit
    // bucket collides ~8% per table and 16 tables put expected recall ~0.75
    val lsh = Similarity.lshNearDupPairs(emb, "vec_id", "embedding", 64, 16, 6, 0.45)
      .select("ida", "idb").as[(Long, Long)].collect().toSet
    // every LSH pair passes the exact threshold -> subset of the baseline
    assert(lsh.subsetOf(exact), s"false positives: ${lsh.diff(exact)}")
    // near-dup pairs are highly correlated vectors — exactly what hyperplane
    // LSH buckets preserve, so recall should be high (planted dups agree on
    // most sign bits)
    if (exact.nonEmpty)
      assert(lsh.size.toDouble / exact.size >= 0.5,
        s"recall ${lsh.size.toDouble / exact.size} too low (${lsh.size}/${exact.size})")
  }

  test("ivfTopK neighbors are true neighbors (precision vs brute force)") {
    val emb = graft.core.Tables.embeddings(spark, sf)
    val brute = Similarity.bruteForceTopK(emb, emb, "vec_id", "embedding", 15)
      .select("qid", "nid").as[(Long, Long)].collect().groupBy(_._1)
      .view.mapValues(_.map(_._2).toSet).toMap
    val ivf = Similarity.ivfTopK(emb, "vec_id", "embedding", 16, 4, 5)
      .select("qid", "nid").as[(Long, Long)].collect()
    val hits = ivf.count { case (q, n) => brute.getOrElse(q, Set.empty).contains(n) }
    assert(ivf.nonEmpty)
    assert(hits.toDouble / ivf.length > 0.15,
      s"IVF precision ${hits.toDouble / ivf.length} below 5x random baseline")
  }

  test("ivfSearch: external queries hit true corpus neighbors, never themselves") {
    val emb = graft.core.Tables.embeddings(spark, sf)
    val queries = emb.filter($"vec_id" < 8)
    val corpus = emb.filter($"vec_id" >= 8)
    val got = Similarity.ivfSearch(queries, corpus, "vec_id", "embedding",
      nCells = 8, updates = 1, nProbe = 3, k = 5)
      .select("qid", "nid").as[(Long, Long)].collect()
    assert(got.nonEmpty)
    assert(got.forall { case (q, n) => q < 8 && n >= 8 }) // results come from the index only
    val brute = Similarity.bruteForceTopK(queries, corpus, "vec_id", "embedding", 15)
      .filter($"nid" >= 8)
      .select("qid", "nid").as[(Long, Long)].collect().groupBy(_._1)
      .view.mapValues(_.map(_._2).toSet).toMap
    val hits = got.count { case (q, n) => brute.getOrElse(q, Set.empty).contains(n) }
    assert(hits.toDouble / got.length > 0.15)
  }

  test("lshTopKMultiProbe: 0 flips equals plain LSH; more flips never lose recall") {
    val emb = graft.core.Tables.embeddings(spark, sf)
    val qids = col("qid") < 8
    def pairs(df: org.apache.spark.sql.DataFrame) =
      df.select("qid", "nid").as[(Long, Long)].collect().toSet
    val plain = pairs(Similarity.lshTopK(emb, "vec_id", "embedding",
      dim = 64, nTables = 8, nPlanes = 10, k = 5, probeFilter = qids))
    val f0 = pairs(Similarity.lshTopKMultiProbe(emb, "vec_id", "embedding",
      dim = 64, nTables = 8, nPlanes = 10, maxFlips = 0, k = 5, probeFilter = qids))
    assert(f0 == plain, "0-flip multiprobe must degrade to the plain probe")
    val exact = pairs(Similarity.bruteForceTopK(
      emb.filter($"vec_id" < 8), emb, "vec_id", "embedding", 5))
    def recall(s: Set[(Long, Long)]) = (s intersect exact).size
    val r1 = recall(pairs(Similarity.lshTopKMultiProbe(emb, "vec_id", "embedding",
      dim = 64, nTables = 8, nPlanes = 10, maxFlips = 1, k = 5, probeFilter = qids)))
    val r2 = recall(pairs(Similarity.lshTopKMultiProbe(emb, "vec_id", "embedding",
      dim = 64, nTables = 8, nPlanes = 10, maxFlips = 2, k = 5, probeFilter = qids)))
    // candidate sets are supersets as flips grow, and the final ranking is
    // exact cosine — so recall is monotone in maxFlips
    assert(recall(plain) <= r1 && r1 <= r2, s"recall not monotone: ${recall(plain)}, $r1, $r2")
    assert(r2 > recall(plain), "2-flip probing should recover neighbors the plain probe misses")
  }

  test("lshNearDupPairsMultiProbe: superset of the plain pairs, precision 1, beats the recall config") {
    val emb = graft.core.Tables.embeddings(spark, sf)
    def pairSet(df: org.apache.spark.sql.DataFrame) =
      df.select("ida", "idb").as[(Long, Long)].collect().toSet
    val tau = 0.45
    val exact = pairSet(Similarity.nearDupPairs(emb, "vec_id", "embedding", tau))
    val plain = pairSet(Similarity.lshNearDupPairs(emb, "vec_id", "embedding",
      dim = 64, nTables = 8, nPlanes = 10, threshold = tau))
    val mp = pairSet(Similarity.lshNearDupPairsMultiProbe(emb, "vec_id",
      "embedding", dim = 64, nTables = 8, nPlanes = 10, maxFlips = 2,
      threshold = tau))
    // probing is additive: multiprobe candidates contain the 0-flip ones
    assert(plain.subsetOf(mp))
    // precision 1: every emitted pair passes the exact threshold
    assert(mp.subsetOf(exact), s"false positives: ${mp diff exact}")
    // recall beats the d11-style plain mining on the same fixture
    val d11 = pairSet(Similarity.lshNearDupPairs(emb, "vec_id", "embedding",
      dim = 64, nTables = 16, nPlanes = 6, threshold = tau))
    assert(mp.size > d11.size, s"mp ${mp.size} <= d11 ${d11.size} of ${exact.size}")
  }

  test("ivfRangeSearch: exactly the probed-cell pairs at or above the threshold") {
    val emb = graft.core.Tables.embeddings(spark, sf)
    val tau = 0.25
    val got = Similarity.ivfRangeSearch(emb.filter($"vec_id" < 8), emb,
      "vec_id", "embedding", nCells = 16, updates = 0, nProbe = 4, minCosine = tau)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(got.nonEmpty, "threshold 0.25 should match some pairs on the fixture")
    // every returned pair genuinely clears the threshold
    assert(got.forall(_._3 >= tau), got.mkString("\n"))
    // completeness within the probed index: raising the threshold to the
    // max returned cosine still returns that pair; and the result equals
    // the top-k path filtered at tau when k is larger than any result set
    val viaTopK = Similarity.ivfTopK(emb, "vec_id", "embedding",
        nCells = 16, nProbe = 4, k = Int.MaxValue, probeFilter = col("qid") < 8)
      .filter($"cosine" >= tau)
      .collect().map(r => (r.getAs[Long]("qid"), r.getAs[Long]("nid"),
        r.getAs[Double]("cosine"))).toSet
    assert(got.toSet == viaTopK,
      s"range != filtered top-all: ${(got.toSet diff viaTopK) ++ (viaTopK diff got.toSet)}")
  }

  test("ivfTopKTrained: trained-centroid probe still finds true neighbors") {
    val emb = graft.core.Tables.embeddings(spark, sf)
    val brute = Similarity.bruteForceTopK(emb, emb, "vec_id", "embedding", 15)
      .select("qid", "nid").as[(Long, Long)].collect().groupBy(_._1)
      .view.mapValues(_.map(_._2).toSet).toMap
    val trained = Similarity.ivfTopKTrained(emb, "vec_id", "embedding",
      nCells = 8, updates = 1, nProbe = 2, k = 5)
      .select("qid", "nid").as[(Long, Long)].collect()
    val hits = trained.count { case (q, n) => brute.getOrElse(q, Set.empty).contains(n) }
    assert(trained.nonEmpty)
    assert(hits.toDouble / trained.length > 0.15,
      s"trained IVF precision ${hits.toDouble / trained.length} below 5x random baseline")
  }

  test("kmeansAssign: Lloyd rounds improve mean cosine, assignment is total") {
    val emb = graft.core.Tables.embeddings(spark, sf)
    val n = emb.count()
    val r1 = Similarity.kmeansAssign(emb, "vec_id", "embedding", 8, rounds = 1)
    val r2 = Similarity.kmeansAssign(emb, "vec_id", "embedding", 8, rounds = 2)
    assert(r1.count() == n && r2.count() == n) // every vector assigned once
    val m1 = r1.agg(avg($"cosine")).as[Double].collect()(0)
    val m2 = r2.agg(avg($"cosine")).as[Double].collect()(0)
    // Lloyd monotonicity: assignment + sum-direction update each improve the
    // spherical objective (tiny epsilon for the empty-cell edge)
    assert(m2 >= m1 - 1e-12, s"round 2 mean cosine $m2 < round 1 $m1")
    // deterministic: bit-identical across runs
    val again = Similarity.kmeansAssign(emb, "vec_id", "embedding", 8, rounds = 2)
      .orderBy($"sid").collect()
    assert(r2.orderBy($"sid").collect().sameElements(again))
  }

  test("kmeansAssign tightens clusters over the seed assignment (inertia check)") {
    // 2 well-separated synthetic clusters, seeds both in cluster A: one
    // Lloyd update must pull a centroid toward cluster B
    val pts = (0 until 20).map(i => (i.toLong, Array(1.0f, 0.02f * i))) ++
      (20 until 40).map(i => (i.toLong, Array(0.02f * (i - 20), 1.0f)))
    val df = pts.toDF("vec_id", "embedding")
    val out = Similarity.kmeansAssign(df, "vec_id", "embedding", 2, rounds = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val cellsOfA = (0L until 20L).map(out).toSet
    val cellsOfB = (20L until 40L).map(out).toSet
    assert((cellsOfA intersect cellsOfB).isEmpty,
      s"clusters not separated: A->$cellsOfA B->$cellsOfB")
  }

  test("zero-norm vectors null out instead of aborting the job (ANSI)") {
    val withZero = Seq(
      (0L, Array(1.0f, 0.0f)),
      (1L, Array(0.0f, 0.0f)), // quantizes to the zero vector
      (2L, Array(0.9f, 0.1f))
    ).toDF("vec_id", "embedding")
    val out = Similarity.nearDupPairs(withZero, "vec_id", "embedding", 0.5)
      .select("ida", "idb").as[(Long, Long)].collect().toSet
    assert(out == Set((0L, 2L))) // pairs with the zero vector drop via NULL
  }

  test("integer quantization makes cosine exact and order-independent") {
    val df = vecs.select(Similarity.quantize($"embedding").as("q"))
    val rows = df.collect()
    assert(rows(0).getSeq[Long](0) == Seq(1000L, 0L, 0L))
    assert(rows(1).getSeq[Long](0) == Seq(900L, 100L, 0L))
  }

  test("sq8: codes span [0,255], constant dims collapse to 0, codebook is per-dim") {
    val df = Seq(
      (0L, Array(0.0f, 5.0f, 7.0f)),
      (1L, Array(1.0f, 5.0f, 3.0f)),
      (2L, Array(2.0f, 5.0f, -1.0f))
    ).toDF("vec_id", "embedding")
    val cb = Similarity.sq8Train(df, "embedding").collect().head
    assert(cb.getSeq[Double](0) == Seq(0.0, 5.0, -1.0)) // lo
    assert(cb.getSeq[Double](1) == Seq(2.0, 5.0, 7.0)) // hi
    val codes = df.crossJoin(Similarity.sq8Train(df, "embedding"))
      .select($"vec_id", Similarity.sq8Codes($"embedding", $"lo", $"hi").as("c"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    // dim 0 range [0,2]: 0 -> 0, 1 -> 128 (round .5 up), 2 -> 255
    // dim 1 constant: every code 0; dim 2 range [-1,7]: -1 -> 0, 7 -> 255
    assert(codes(0L) == Seq(0L, 0L, 255L))
    assert(codes(1L) == Seq(128L, 0L, 128L))
    assert(codes(2L) == Seq(255L, 0L, 0L))
  }

  test("sq8TopK: an exact duplicate vector is its twin's nearest neighbor at d2=0") {
    val emb = graft.core.Tables.embeddings(spark, sf)
    val twin = emb.filter($"vec_id" === 3).select(
      (lit(100000L)).as("vec_id"), $"embedding", $"label")
    val out = Similarity.sq8TopK(
      emb.filter($"vec_id" === 3), emb.unionByName(twin),
      "vec_id", "embedding", 3)
      .select("qid", "nid", "d2", "rank").as[(Long, Long, Long, Long)].collect()
    val top = out.find(_._4 == 1L).get
    assert(top._2 == 100000L && top._3 == 0L)
    // distances are nonnegative and ranked ascending
    assert(out.forall(_._3 >= 0L))
    assert(out.sortBy(_._4).map(_._3).toSeq == out.map(_._3).sorted.toSeq)
  }

  test("pqCodes: a seed vector encodes to its own code in every subspace") {
    val emb = graft.core.Tables.embeddings(spark, sf)
    val cb = Similarity.pqTrain(emb, "vec_id", "embedding", dim = 64, m = 8, k = 16)
    val codes = emb.filter($"vec_id" < 16).crossJoin(broadcast(cb))
      .select($"vec_id",
        Similarity.pqCodes(Similarity.quantize($"embedding"), $"cb", 64, 8).as("c"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    // seeds are the 16 lowest vec_ids in id order, so seed i's subvectors
    // ARE centroid i in every subspace: d2 = 0 at its own code (distinct
    // random vectors make d2 > 0 at every other code)
    (0 until 16).foreach { i =>
      assert(codes(i.toLong) == Seq.fill(8)(i.toLong), s"seed $i: ${codes(i.toLong)}")
    }
    // and every code is in range for every vector
    val all = emb.crossJoin(broadcast(cb))
      .select(Similarity.pqCodes(Similarity.quantize($"embedding"), $"cb", 64, 8).as("c"))
      .collect().flatMap(_.getSeq[Long](0))
    assert(all.forall(c => c >= 0 && c < 16))
  }

  test("ANN recall ladder: every approximate path recovers a floor of the exact top-5") {
    val emb = graft.core.Tables.embeddings(spark, sf)
    def pairs(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
      df.select("qid", "nid").as[(Long, Long)].collect().toSet
    val exact = pairs(Similarity.bruteForceTopK(emb, emb, "vec_id", "embedding", 5))
    def recall(approx: Set[(Long, Long)]): Double =
      (exact intersect approx).size.toDouble / exact.size
    val lsh8 = recall(pairs(Similarity.lshTopK(emb, "vec_id", "embedding",
      dim = 64, nTables = 8, nPlanes = 4, k = 5)))
    val lsh16 = recall(pairs(Similarity.lshTopK(emb, "vec_id", "embedding",
      dim = 64, nTables = 16, nPlanes = 4, k = 5)))
    val ivf = recall(pairs(Similarity.ivfTopK(emb, "vec_id", "embedding",
      nCells = 8, nProbe = 3, k = 5)))
    val ivfTrained = recall(pairs(Similarity.ivfTopKTrained(emb, "vec_id",
      "embedding", nCells = 8, updates = 1, nProbe = 3, k = 5)))
    // floors, not exact values (the fixture is deterministic — measured
    // 0.71 / 0.91 / 0.57 / 0.62): these assert the index structures
    // actually find neighbors rather than returning plausible-but-
    // unrelated ids, and that the documented contracts hold — more LSH
    // tables buy recall, a Lloyd round does not hurt it
    assert(lsh8 >= 0.5, s"LSH(8x4) recall@5 collapsed: $lsh8")
    assert(lsh16 >= lsh8, s"more tables must not lose recall: $lsh16 < $lsh8")
    assert(ivf >= 0.4, s"IVF recall@5 collapsed: $ivf")
    assert(ivfTrained >= ivf, s"training must not hurt recall here: $ivfTrained < $ivf")
    info(f"recall@5 — lsh8: $lsh8%.3f lsh16: $lsh16%.3f ivf: $ivf%.3f trained: $ivfTrained%.3f")
  }

  test("refine recall holds at sf0.1 where raw ADC sinks (corpus-growth stability contract)") {
    // README's s16 table claims refine recall stays 0.83+ at sf0.1 while
    // fixed-parameter raw ADC sinks to ~0.43 — this makes that claim a
    // CONTRACT at the larger scale (the oracle gate runs at sf0.01 only).
    // Same fixed index parameters as s16: the point is recall stability
    // under corpus growth with parameters held constant.
    val emb = graft.core.Tables.embeddings(spark, "/root/testdata/sf0.1")
    val qids = col("qid") < 8
    val exact = Similarity.bruteForceTopK(
      emb.filter(col("vec_id") < 8), emb, "vec_id", "embedding", 5)
    def top5(df: org.apache.spark.sql.DataFrame) = df.select(col("qid"), col("nid"))
    val rec = Similarity.annRecall(Seq(
        "ivfpq_seeded" -> top5(Similarity.ivfPqTopK(emb, "vec_id", "embedding",
          dim = 64, nCells = 16, nProbe = 4, m = 16, k = 256, topK = 5,
          probeFilter = qids)),
        "ivfpq_refine" -> top5(Similarity.ivfPqRefineTopK(emb, "vec_id",
          "embedding", dim = 64, nCells = 16, nProbe = 4, m = 16, k = 256,
          shortlistK = 25, topK = 5, probeFilter = qids)),
        "ivfpq_residual_refine" -> top5(
          Similarity.ivfPqResidualRefineTopKTrained(emb, "vec_id", "embedding",
            dim = 64, nCells = 16, updates = 1, nProbe = 4, m = 16, k = 256,
            shortlistK = 25, topK = 5, probeFilter = qids))),
      exact, k = 5, minRecall = 0.8)
      .collect().map(r => r.getAs[String]("method") -> r.getAs[Double]("recall")).toMap
    assert(rec("ivfpq_refine") >= 0.8,
      s"refine recall sank at sf0.1: ${rec("ivfpq_refine")}")
    assert(rec("ivfpq_residual_refine") >= 0.8,
      s"residual refine recall sank at sf0.1: ${rec("ivfpq_residual_refine")}")
    assert(rec("ivfpq_refine") > rec("ivfpq_seeded"),
      s"refine must beat raw ADC at the larger corpus: $rec")
    info(rec.map { case (m, r) => f"$m: $r%.3f" }.mkString(" "))
  }

  test("annRecall: ground truth scores 1.0 against itself, misses are penalized") {
    val emb = graft.core.Tables.embeddings(spark, sf)
    val exact = Similarity.bruteForceTopK(
      emb.filter($"vec_id" < 8), emb, "vec_id", "embedding", 5)
    // self-recall is exactly 1.0 (the intersection is the whole truth set)
    val self = Similarity.annRecall(
      Seq("self" -> exact.select("qid", "nid")), exact, 5, 0.99).collect()(0)
    assert(self.getAs[Long]("hits") == self.getAs[Long]("n"))
    assert(self.getAs[Double]("recall") == 1.0 && self.getAs[Boolean]("recall_ok"))
    // a method that returns NOTHING for a query is penalized through n
    // (ground-truth-sized denominator), not silently excused
    val partial = Similarity.annRecall(
      Seq("half" -> exact.filter($"qid" % 2 === 0).select("qid", "nid")),
      exact, 5, 0.99).collect()(0)
    assert(partial.getAs[Long]("n") == self.getAs[Long]("n"))
    assert(partial.getAs[Double]("recall") < 1.0 && !partial.getAs[Boolean]("recall_ok"))
    // the s16 contract holds on the fixture: every ladder method clears
    // the 0.5 floor the oracle asserts — lsh, ivf_flat, raw ADC at
    // m=16/k=256, and both refine serve paths
    val s16 = graft.SparkEntry.queries("s16_ann_recall")(spark, sf).collect()
    assert(s16.length == 6)
    assert(s16.map(_.getAs[String]("method")).toSeq == Seq("ivf_flat",
      "ivfpq_refine", "ivfpq_residual_refine", "ivfpq_seeded", "lsh",
      "lsh_multiprobe"))
    s16.foreach { r =>
      assert(r.getAs[Boolean]("recall_ok"),
        s"${r.getAs[String]("method")} recall ${r.getAs[Double]("recall")} below contract")
      info(f"${r.getAs[String]("method")}: recall@5 = ${r.getAs[Double]("recall")}%.3f")
    }
    // the refine stage is what makes the serve path robust: re-ranked
    // recall must dominate its own raw-ADC shortlist source
    val byMethod = s16.map(r =>
      r.getAs[String]("method") -> r.getAs[Double]("recall")).toMap
    assert(byMethod("ivfpq_refine") >= byMethod("ivfpq_seeded"))
  }

  test("pq rejects a non-divisible (dim, m) instead of silently dropping tail dims") {
    val emb = graft.core.Tables.embeddings(spark, sf)
    val e = intercept[IllegalArgumentException](
      Similarity.pqTrain(emb, "vec_id", "embedding", dim = 64, m = 7, k = 16))
    assert(e.getMessage.contains("divide"), e.getMessage)
  }

  test("pqTopK: ADC ranks a code-identical twin at distance = LUT self-distance") {
    val emb = graft.core.Tables.embeddings(spark, sf)
    // a twin candidate with query 3's exact vector: identical codes, so its
    // ADC distance equals the query's LUT distance to its OWN codes — the
    // quantization-error floor, strictly the minimum over all candidates
    val twin = emb.filter($"vec_id" === 3).select(
      lit(100000L).as("vec_id"), $"embedding", $"label")
    val out = Similarity.pqTopK(
      emb.filter($"vec_id" === 3), emb.unionByName(twin),
      "vec_id", "embedding", dim = 64, m = 8, k = 16, topK = 3)
      .select("qid", "nid", "d2", "rank").as[(Long, Long, Long, Long)].collect()
    val top = out.find(_._4 == 1L).get
    assert(top._2 == 100000L, out.mkString(", "))
    assert(out.forall(_._3 >= 0L))
    assert(out.sortBy(_._4).map(_._3).toSeq == out.map(_._3).sorted.toSeq)
  }

  test("pqTrainKmeans: trained book keeps shape, lowers distortion, twin still wins ADC") {
    val emb = graft.core.Tables.embeddings(spark, sf)
    val seeded = Similarity.pqTrain(emb, "vec_id", "embedding", 64, 8, 16)
    val trained = Similarity.pqTrainKmeans(emb, "vec_id", "embedding", 64, 8, 16,
      updates = 2)
    // shape: 8 subspace books, each <= 16 codes of 8-long subvectors
    // (collect returns nested mutable ArraySeqs — normalize per level)
    def deepCb(df: org.apache.spark.sql.DataFrame): Seq[Seq[Seq[Long]]] =
      df.collect().head
        .getSeq[scala.collection.Seq[scala.collection.Seq[Long]]](0)
        .map(_.toSeq.map(_.toSeq))
    val cb = deepCb(trained)
    assert(cb.length == 8 && cb.forall(book =>
      book.nonEmpty && book.length <= 16 && book.forall(_.length == 8)))
    // training must not worsen total quantization distortion (Lloyd with
    // rounded-integer centroids: the rounding perturbation is bounded by
    // 0.25 per dim, far below the distortion a real update removes)
    def distortion(book: org.apache.spark.sql.DataFrame): Long = {
      val q = Similarity.quantize($"embedding")
      emb.crossJoin(broadcast(book))
        .select(aggregate(
          transform(sequence(lit(0), lit(7)), mm =>
            array_min(transform(element_at($"cb", mm + 1), c =>
              aggregate(zip_with(slice(q, mm * 8 + 1, lit(8)), c,
                (a, b) => (a - b) * (a - b)), lit(0L), _ + _)))),
          lit(0L), _ + _).as("d"))
        .agg(sum($"d")).as[Long].head()
    }
    val (ds, dt) = (distortion(seeded), distortion(trained))
    assert(dt < ds, s"training should reduce distortion: seeded=$ds trained=$dt")
    // determinism: re-training yields the identical book
    assert(deepCb(Similarity.pqTrainKmeans(emb, "vec_id", "embedding", 64, 8, 16, 2)) == cb)
    // a code-identical twin ranks first through the trained book, same as s8
    val twin = emb.filter($"vec_id" === 3).select(
      lit(100000L).as("vec_id"), $"embedding", $"label")
    val out = Similarity.pqTopKWith(trained, emb.filter($"vec_id" === 3),
      emb.unionByName(twin), "vec_id", "embedding", dim = 64, m = 8, topK = 3)
      .select("nid", "rank").as[(Long, Long)].collect()
    assert(out.find(_._2 == 1L).map(_._1).contains(100000L), out.mkString(", "))
  }

  test("ivfPq plan shape: candidate generation keyed by cell id, never corpus x corpus") {
    import org.apache.spark.sql.execution.ExplainMode
    val emb = graft.core.Tables.embeddings(spark, sf)
    // identity pin exposes the full lazy join structure
    val p = Similarity.ivfPqPlan(emb, "vec_id", "embedding",
        dim = 64, nCells = 16, updates = 0, nProbe = 4, m = 8, k = 16, topK = 5,
        pin = identity)
      .queryExecution.explainString(ExplainMode.fromString("formatted"))
    assert(!p.contains("CartesianProduct"), p)
    assert(p.contains("hashpartitioning(cid") ||
      """Left keys \[1\]: \[cid""".r.findFirstIn(p).nonEmpty, p)
    assert(p.contains("WindowGroupLimit"), p)
  }

  test("ivfPq plan shape: member encode materializes behind a cid exchange (never per-pair)") {
    import org.apache.spark.sql.execution.ExplainMode
    // the barrier behind round 11's 30x fix: whole-stage codegen defers
    // non-join-key streamed columns into the hash-join match loop, so
    // WITHOUT an exchange between the encode projection and the probe
    // join, graft_pq_encode re-runs once per (probe, member) PAIR whenever
    // the planner streams the member side — which it picks from size
    // estimates, i.e. config-dependently (surfaced at a 64 MB broadcast
    // threshold, hidden at 10 MB). repartition(cid) is also the production
    // index layout. Assert the exchange exists, the encode is projected in
    // exactly one subtree, and pair scoring is the ADC kernel.
    val emb = graft.core.Tables.embeddings(spark, sf)
    def planOf(residual: Boolean): String = {
      val df =
        if (residual) Similarity.ivfPqResidualPlan(
          Similarity.prepared(emb, "vec_id", "embedding"),
          Similarity.prepared(emb, "vec_id", "embedding"),
          selfExclude = true, dim = 64, nCells = 16, nProbe = 4, m = 8,
          k = 16, topK = 5, pin = identity)
        else Similarity.ivfPqPlan(emb, "vec_id", "embedding",
          dim = 64, nCells = 16, updates = 0, nProbe = 4, m = 8, k = 16,
          topK = 5, pin = identity)
      df.queryExecution.explainString(ExplainMode.fromString("formatted"))
    }
    for (residual <- Seq(false, true)) {
      val p = planOf(residual)
      assert(p.contains("hashpartitioning(cid"),
        s"member index must repartition by cell id (residual=$residual):\n$p")
      assert("graft_pq_encode".r.findAllIn(p).size == 1,
        s"encode must be projected exactly once (residual=$residual):\n$p")
      assert(p.contains("graft_pq_adc_direct"),
        s"pair scoring must be the native ADC kernel (residual=$residual):\n$p")
    }
  }

  test("trained ivfPq plan shape: Lloyd rounds don't change the probe join — still per cell id") {
    import org.apache.spark.sql.execution.ExplainMode
    val emb = graft.core.Tables.embeddings(spark, sf)
    val p = Similarity.ivfPqPlan(emb, "vec_id", "embedding",
        dim = 64, nCells = 16, updates = 1, nProbe = 4, m = 8, k = 16, topK = 5,
        pin = identity)
      .queryExecution.explainString(ExplainMode.fromString("formatted"))
    assert(!p.contains("CartesianProduct"), p)
    assert(p.contains("hashpartitioning(cid") ||
      """Left keys \[1\]: \[cid""".r.findFirstIn(p).nonEmpty, p)
    assert(p.contains("WindowGroupLimit"), p)
  }

  test("residual IVF-PQ: wins on cluster-aligned cells, and the regime claim is honest") {
    // clustered corpus: 16 well-separated coarse centers + small per-id
    // noise, ids round-robin over clusters so the 16 LOWEST ids are one
    // vector per cluster — the seeded cells align with the true clusters
    // and residuals are noise-sized (the regime residual PQ exists for)
    def h(s: String): Long = {
      val md = java.security.MessageDigest.getInstance("MD5").digest(s.getBytes)
      java.lang.Long.parseLong(md.take(4).map(b => f"$b%02x").mkString, 16)
    }
    val rows = (0 until 256).map { id =>
      val g = id % 16
      val vec = Array.tabulate(64) { j =>
        val center = (h(s"c_${g}_$j") % 2000 - 1000).toFloat / 1000f
        val noise = (h(s"n_${id}_$j") % 100 - 50).toFloat / 1000f
        center + noise
      }
      (id.toLong, vec, "x")
    }
    val emb = rows.toDF("vec_id", "embedding", "label")
    def pairs(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
      df.select("qid", "nid").as[(Long, Long)].collect().toSet
    val exact = pairs(Similarity.bruteForceTopK(emb, emb, "vec_id", "embedding", 5))
    def recall(s: Set[(Long, Long)]): Double =
      (exact intersect s).size.toDouble / exact.size
    // k = 128 codewords: enough codebook capacity to express the residual
    // distribution (at k = 16 BOTH methods bottom out on codebook capacity
    // and tie at 0.32 — measured; the win appears once capacity allows)
    val global = recall(pairs(Similarity.ivfPqTopK(emb, "vec_id", "embedding",
      dim = 64, nCells = 16, nProbe = 4, m = 8, k = 128, topK = 5)))
    val residual = recall(pairs(Similarity.ivfPqResidualTopK(emb, "vec_id",
      "embedding", dim = 64, nCells = 16, nProbe = 4, m = 8, k = 128, topK = 5)))
    assert(residual > global,
      f"residual must win on clustered data: residual=$residual%.3f global=$global%.3f")
    assert(residual >= 0.65, f"noise-sized residuals should quantize finely: $residual%.3f")
    info(f"clustered recall@5 — residual: $residual%.3f  global: $global%.3f")
    // per-call self-clean contract: one fresh call leaves only its result leaf
    graft.core.Storage.freeAll(spark, blocking = true)
    Similarity.ivfPqResidualTopK(emb, "vec_id", "embedding",
      dim = 64, nCells = 16, nProbe = 4, m = 8, k = 16, topK = 5).count()
    assert(spark.sparkContext.getPersistentRDDs.size <= 1)
  }

  test("residual serve plan shape: candidate generation stays cell-keyed, never corpus x corpus") {
    import org.apache.spark.sql.execution.ExplainMode
    val emb = graft.core.Tables.embeddings(spark, sf)
    val cv = emb.filter($"vec_id" >= 8)
    val qv = emb.filter($"vec_id" < 8)
    // identity pin exposes the full lazy join structure (the production
    // path pins the index with Storage.cut, which hides it)
    val p = Similarity.ivfPqResidualPlan(
        Similarity.prepared(cv, "vec_id", "embedding"),
        Similarity.prepared(qv, "vec_id", "embedding"),
        selfExclude = false, dim = 64, nCells = 16, nProbe = 4, m = 8,
        k = 16, topK = 5, pin = identity)
      .queryExecution.explainString(ExplainMode.fromString("formatted"))
    assert(!p.contains("CartesianProduct"), p)
    assert(p.contains("hashpartitioning(cid") ||
      """Left keys \[1\]: \[cid""".r.findFirstIn(p).nonEmpty, p)
    assert(p.contains("WindowGroupLimit"), p)
  }

  test("trained residual plan shape: Lloyd rounds keep the candidate join cell-keyed") {
    import org.apache.spark.sql.execution.ExplainMode
    val emb = graft.core.Tables.embeddings(spark, sf)
    val v = Similarity.prepared(emb, "vec_id", "embedding")
    val p = Similarity.ivfPqResidualPlan(v, v, selfExclude = true,
        dim = 64, nCells = 16, nProbe = 4, m = 8, k = 16, topK = 5,
        pin = identity, trainedUpdates = 1)
      .queryExecution.explainString(ExplainMode.fromString("formatted"))
    assert(!p.contains("CartesianProduct"), p)
    assert(p.contains("hashpartitioning(cid") ||
      """Left keys \[1\]: \[cid""".r.findFirstIn(p).nonEmpty, p)
    assert(p.contains("WindowGroupLimit"), p)
  }

  test("ivfPqResidualTopKTrained: self-cleans and training changes the index, not the contract") {
    val emb = graft.core.Tables.embeddings(spark, sf)
    graft.core.Storage.freeAll(spark, blocking = true)
    val out = Similarity.ivfPqResidualTopKTrained(emb, "vec_id", "embedding",
      dim = 64, nCells = 16, updates = 1, nProbe = 4, m = 8, k = 16, topK = 5)
      .select("qid", "nid", "rank").as[(Long, Long, Long)].collect()
    // contract: every query gets <= topK ranked neighbors, never itself
    assert(out.nonEmpty && out.forall { case (q, n, r) => q != n && r >= 1 && r <= 5 })
    assert(spark.sparkContext.getPersistentRDDs.size <= 1)
  }

  test("ivfPqResidualSearch: external twin ranks first, serve path self-cleans") {
    // clustered corpus (the regime residual PQ exists for — on the uniform
    // fixture residuals dwarf the codebook and the twin's quantization
    // error loses to other cells' approximation error, the documented
    // honest-regime claim). Same construction as the recall test above.
    def h(s: String): Long = {
      val md = java.security.MessageDigest.getInstance("MD5").digest(s.getBytes)
      java.lang.Long.parseLong(md.take(4).map(b => f"$b%02x").mkString, 16)
    }
    val rows = (0 until 256).map { id =>
      val g = id % 16
      val vec = Array.tabulate(64) { j =>
        val center = (h(s"c_${g}_$j") % 2000 - 1000).toFloat / 1000f
        val noise = (h(s"n_${id}_$j") % 100 - 50).toFloat / 1000f
        center + noise
      }
      (id.toLong, vec, "x")
    }
    val emb = rows.toDF("vec_id", "embedding", "label")
    // query = vector 77 under a fresh external id: its residual to 77's
    // cell is IDENTICAL to 77's, so the ADC distance to 77 is 77's own
    // quantization error — the floor within the probed cells. Exercises
    // cell assignment, residual encoding, per-cell LUTs, and the
    // no-self-exclusion contract.
    val externalQ = emb.filter($"vec_id" === 77).select(
      lit(500000L).as("vec_id"), $"embedding", $"label")
    graft.core.Storage.freeAll(spark, blocking = true)
    val out = Similarity.ivfPqResidualSearch(externalQ, emb, "vec_id",
      "embedding", dim = 64, nCells = 16, nProbe = 4, m = 8, k = 128, topK = 3)
      .select("qid", "nid", "rank").as[(Long, Long, Long)].collect()
    assert(out.nonEmpty && out.forall(_._1 == 500000L))
    assert(out.find(_._3 == 1L).map(_._2).contains(77L), out.mkString(", "))
    assert(spark.sparkContext.getPersistentRDDs.size <= 1)
  }

  test("ivfPqSearch: external query finds its corpus twin through the trained index") {
    val emb = graft.core.Tables.embeddings(spark, sf)
    // the corpus contains vector 77; querying with the SAME vector under a
    // fresh external id must land in 77's cell and rank it first (ADC floor)
    val externalQ = emb.filter($"vec_id" === 77).select(
      lit(500000L).as("vec_id"), $"embedding", $"label")
    graft.core.Storage.freeAll(spark, blocking = true) // isolate the leaf count
    val out = Similarity.ivfPqSearch(externalQ, emb, "vec_id", "embedding",
      dim = 64, nCells = 16, updates = 1, nProbe = 4, m = 8, k = 16, topK = 3)
      .select("qid", "nid", "rank").as[(Long, Long, Long)].collect()
    assert(out.nonEmpty && out.forall(_._1 == 500000L))
    assert(out.find(_._3 == 1L).map(_._2).contains(77L), out.mkString(", "))
    // serve path self-cleans: index state freed, only the top-k leaf kept
    assert(spark.sparkContext.getPersistentRDDs.size <= 1)
  }

  test("ivfPqTopKTrained: twin wins the ADC ranking through the trained quantizer") {
    val emb = graft.core.Tables.embeddings(spark, sf)
    val twin = emb.filter($"vec_id" === 77).select(
      lit(100000L).as("vec_id"), $"embedding", $"label")
    val out = Similarity.ivfPqTopKTrained(emb.unionByName(twin), "vec_id",
      "embedding", dim = 64, nCells = 16, updates = 1, nProbe = 4, m = 8,
      k = 16, topK = 3)
      .filter($"qid" === 77)
      .select("nid", "d2", "rank").as[(Long, Long, Long)].collect()
    // an identical vector lands in the same (trained) cell with identical
    // codes: its ADC distance is the query's quantization floor
    assert(out.find(_._3 == 1L).map(_._1).contains(100000L), out.mkString(", "))
    assert(out.nonEmpty && out.sortBy(_._3).map(_._2).toSeq == out.map(_._2).sorted.toSeq)
  }

  test("ivfPqTopK: a twin lands in the query's cell and wins the ADC ranking") {
    val emb = graft.core.Tables.embeddings(spark, sf)
    val twin = emb.filter($"vec_id" === 77).select(
      lit(100000L).as("vec_id"), $"embedding", $"label")
    val out = Similarity.ivfPqTopK(emb.unionByName(twin), "vec_id", "embedding",
      dim = 64, nCells = 16, nProbe = 4, m = 8, k = 16, topK = 3)
      .filter($"qid" === 77)
      .select("nid", "d2", "rank").as[(Long, Long, Long)].collect()
    // identical vector -> identical cell and identical codes -> the twin's
    // ADC distance is the query's own quantization floor, strictly minimal
    assert(out.find(_._3 == 1L).map(_._1).contains(100000L), out.mkString(", "))
    // probing 4 of 16 cells returns a nonempty, ascending ranking
    assert(out.nonEmpty && out.sortBy(_._3).map(_._2).toSeq == out.map(_._2).sorted.toSeq)
  }

  test("autoCells keeps self-search candidates subquadratic (o(N^2) guard)") {
    val emb = graft.core.Tables.embeddings(spark, sf)
    val n = emb.count()
    val (cells, probe) = Similarity.indexParams(n)
    // sizing discipline: nCells ~ 4 sqrt(N) (here 89 at N=500), nProbe >= 4
    assert(cells >= 4 * math.sqrt(n.toDouble) * 0.9 && cells <= 4 * math.sqrt(n.toDouble) * 1.1)
    val auto = Similarity.selfSearchCandidateCount(emb, "vec_id", "embedding", cells, probe)
    val fixed = Similarity.selfSearchCandidateCount(emb, "vec_id", "embedding", 16, 4)
    // fixed 16 cells scans ~N/4 of the corpus per query -> ~N^2/4 pairs;
    // auto sizing must beat it decisively and stay within a skew factor of
    // the uniform-occupancy model nProbe * N^1.5 / 4
    assert(auto < fixed / 2, s"auto=$auto not clearly below fixed=$fixed")
    val model = probe * math.pow(n.toDouble, 1.5) / 4.0
    assert(auto.toDouble <= 4.0 * model,
      s"auto=$auto exceeds 4x the uniform model $model — cell skew out of bounds")
  }

  test("probeFilter pushdown is bit-identical to filtering the full self-search") {
    val emb = graft.core.Tables.embeddings(spark, sf)
    val qids = col("qid") < 8
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.select("qid", "nid", "rank").as[(Long, Long, Long)].collect().toSet
    val cases: Seq[(String, org.apache.spark.sql.DataFrame, org.apache.spark.sql.DataFrame)] = Seq(
      ("ivfTopK",
        Similarity.ivfTopK(emb, "vec_id", "embedding", 16, 4, 5),
        Similarity.ivfTopK(emb, "vec_id", "embedding", 16, 4, 5, probeFilter = qids)),
      ("ivfPqTopK",
        Similarity.ivfPqTopK(emb, "vec_id", "embedding", 64, 16, 4, 16, 256, 5),
        Similarity.ivfPqTopK(emb, "vec_id", "embedding", 64, 16, 4, 16, 256, 5,
          probeFilter = qids)),
      ("ivfPqResidualTopK",
        Similarity.ivfPqResidualTopK(emb, "vec_id", "embedding", 64, 16, 4, 16, 256, 5),
        Similarity.ivfPqResidualTopK(emb, "vec_id", "embedding", 64, 16, 4, 16, 256, 5,
          probeFilter = qids)),
      ("lshTopK",
        Similarity.lshTopK(emb, "vec_id", "embedding", 64, 8, 4, 5),
        Similarity.lshTopK(emb, "vec_id", "embedding", 64, 8, 4, 5, probeFilter = qids)))
    for ((name, full, pushed) <- cases) {
      // the contract the s16 oracle depends on: the same INDEX (built from
      // the full corpus), only the probe side restricted — so the kept
      // qids' rows, ranks included, match the full run exactly
      assert(rows(pushed) == rows(full.filter(qids)), s"$name pushdown diverged")
    }
  }

  test("semIndex ingest: replay replaces members and rewrites identical labels") {
    val emb = graft.core.Tables.embeddings(spark, sf)
    val name = "spec_sem"
    try {
      Similarity.writeSemIndex(emb.filter($"vec_id" % 4 =!= 0), "vec_id",
        "embedding", nCells = 4, rounds = 2, threshold = 0.45, name,
        nBuckets = 4)
      val b0 = emb.filter($"vec_id" % 8 === 0)
      Similarity.ingestSemBatch(b0, 0L, "vec_id", "embedding", 0.45, name, 4)
      def labels() = spark.table(Similarity.semLabelsTable(name))
        .as[(Long, Long)].collect().toSet
      def nMembers() = spark.table(Similarity.semMembersTable(name)).count()
      val (l1, m1) = (labels(), nMembers())
      // injected retry
      Similarity.ingestSemBatch(b0, 0L, "vec_id", "embedding", 0.45, name, 4)
      assert(labels() == l1, "replay changed the labels table")
      assert(nMembers() == m1, "replay must replace its member partition")
      assert(m1 == emb.filter($"vec_id" % 4 =!= 0).count() + b0.count())
      // wrong bucket count fails loud before any destructive step
      intercept[IllegalArgumentException] {
        Similarity.ingestSemBatch(b0, 0L, "vec_id", "embedding", 0.45, name, 8)
      }
    } finally
      Seq(Similarity.semMembersTable(name), Similarity.semCentroidsTable(name),
        Similarity.semLabelsTable(name))
        .foreach(graft.sources.Bucketing.ensureCleanTable(spark, _))
  }

  test("centroidDrift: identical snapshots report cosine 1, one-sided labels drift") {
    val emb = graft.core.Tables.embeddings(spark, sf)
    val same = Similarity.centroidDrift(emb, emb, "embedding", "label", 0.95)
      .select($"label", $"cosine_shift", $"drift")
      .as[(Long, Option[Double], Boolean)].collect()
    assert(same.nonEmpty)
    same.foreach { case (l, c, d) =>
      assert(c.exists(v => math.abs(v - 1.0) < 1e-9) && !d,
        s"label $l: identical snapshots must not drift ($c)")
    }
    // a label present only in snapshot A: NULL cosine, drift = true
    val onlyA = Similarity.centroidDrift(
        emb, emb.filter($"label" =!= emb.select(min($"label")).as[Int].head()),
        "embedding", "label", 0.95)
      .filter($"n_b" === 0)
      .select($"cosine_shift", $"drift")
      .as[(Option[Double], Boolean)].collect()
    assert(onlyA.nonEmpty && onlyA.forall { case (c, d) => c.isEmpty && d })
  }

  test("retrievalMetrics: hand-checkable MRR and DCG integers, zero row for missed query") {
    // qid 1: approx hits exact members at ranks 1 and 3; the TRUE nearest
    // neighbor (erank 1 = nid 10) surfaces at arank 3. qid 2: no overlap.
    val exact = Seq(
      (1L, 10L, 1L), (1L, 11L, 2L), (1L, 12L, 3L),
      (2L, 20L, 1L), (2L, 21L, 2L), (2L, 22L, 3L)
    ).toDF("qid", "nid", "rank")
    val approx = Seq(
      (1L, 11L, 1L), (1L, 99L, 2L), (1L, 10L, 3L),
      (2L, 98L, 1L), (2L, 97L, 2L), (2L, 96L, 3L)
    ).toDF("qid", "nid", "rank")
    val out = Similarity.retrievalMetrics(approx, exact, 3)
      .as[(Long, Long, Long, Long, Long)].collect().sortBy(_._1).toList
    def dg(r: Long) = 1000000000000L / graft.plans.LnFp.lnMicro(r + 1, 1)
    val idcg = (1L to 3L).map(dg).sum
    assert(out == List(
      (1L, 2L, 1000000L / 3L, dg(1) + dg(3), idcg),
      (2L, 0L, 0L, 0L, idcg)))
  }

  test("semDedup: duplicate groups keep exactly one member, singletons survive") {
    // two groups of exact duplicates + two singletons: groups must collapse
    // to one kept member each (lowest sid on centroid-cosine ties),
    // singletons keep themselves with component = own sid
    val vecs = Seq(
      (1L, Array(1f, 0f, 0f, 0f)), (2L, Array(1f, 0f, 0f, 0f)),
      (3L, Array(1f, 0f, 0f, 0f)), (4L, Array(0.5f, 0.8f, 0f, 0f)),
      (5L, Array(0f, 0f, 1f, 0f)), (6L, Array(0f, 0f, 1f, 0f)),
      (7L, Array(0f, 0.9f, 0.1f, 0f))
    ).toDF("vec_id", "embedding")
    val out = Similarity.semDedup(vecs, "vec_id", "embedding",
        nCells = 2, rounds = 2, threshold = 0.99)
      .select($"sid", $"component", $"keep")
      .as[(Long, Long, Boolean)].collect().sortBy(_._1)
    val byComp = out.groupBy(_._2)
    // every component keeps exactly one member
    byComp.foreach { case (c, ms) =>
      assert(ms.count(_._3) == 1, s"component $c kept ${ms.count(_._3)}")
    }
    assert(byComp(1L).map(_._1).toSet == Set(1L, 2L, 3L))
    assert(byComp(5L).map(_._1).toSet == Set(5L, 6L))
    // singletons: own component, kept
    for (s <- Seq(4L, 7L)) {
      assert(byComp(s).map(_._1).toSeq == Seq(s))
      assert(out.find(_._1 == s).get._3, s"singleton $s must be kept")
    }
    // exact-duplicate ties break to the lowest sid
    assert(out.filter(_._3).map(_._1).toSet == Set(1L, 4L, 5L, 7L))
    // nCells <= 0 auto-sizes (the s18 discipline) — same decisions as the
    // explicit autoCells value
    val auto = Similarity.semDedup(vecs, "vec_id", "embedding",
        nCells = 0, rounds = 2, threshold = 0.99)
      .select($"sid", $"component", $"keep")
      .as[(Long, Long, Boolean)].collect().sortBy(_._1)
    val explicit = Similarity.semDedup(vecs, "vec_id", "embedding",
        nCells = Similarity.autoCells(7L), rounds = 2, threshold = 0.99)
      .select($"sid", $"component", $"keep")
      .as[(Long, Long, Boolean)].collect().sortBy(_._1)
    assert(auto.toSeq == explicit.toSeq)
  }

  test("binarySignTopK: signature bits, hamming shortlist and rerank semantics") {
    def mk(id: Long, xs: Seq[Double]) = (id, xs.map(_.toFloat).toArray)
    val q = Seq(mk(0L, Seq(1.0, 1.0, 1.0, -1.0))).toDF("vec_id", "embedding")
    val c = Seq(
      mk(1L, Seq(1.0, 1.0, 1.0, -1.0)),   // hamming 0, cosine 1.0
      mk(2L, Seq(1.0, 1.0, -1.0, -1.0)),  // hamming 1, cosine 0.5
      mk(3L, Seq(-1.0, -1.0, -1.0, 1.0)), // hamming 4 (full flip)
      mk(4L, Seq(0.0, 1.0, 1.0, -1.0))    // exact zero -> 0 bit: hamming 1
    ).toDF("vec_id", "embedding")
    // rerank=1: shortlist = top-2 by (hamming, nid) = {1, 2} (the nid
    // tiebreak puts 2 ahead of 4 at hamming 1); rerank orders by cosine
    val out = Similarity.binarySignTopK(q, c, "vec_id", "embedding",
        dim = 4, k = 2, rerank = 1)
      .select($"nid", $"hamming", $"cosine", $"rank")
      .as[(Long, Long, Double, Long)].collect().sortBy(_._4)
    assert(out.map(_._1).toSeq == Seq(1L, 2L), out.mkString(","))
    assert(out.head._2 == 0L && out.head._3 == 1.0)
    assert(out(1)._2 == 1L && math.abs(out(1)._3 - 0.5) < 1e-12)
    // ragged vector: the family's uniform-dim contract fails LOUD at the
    // signature stage with the actual lengths — deterministically, not
    // only when the ragged row happens to reach the rerank join
    val ragged = Seq(mk(5L, Seq(1.0, 1.0))).toDF("vec_id", "embedding")
    val e = intercept[Exception] {
      Similarity.binarySignTopK(q, c.unionByName(ragged),
        "vec_id", "embedding", dim = 4, k = 4, rerank = 1).collect()
    }
    val msg = e.getMessage + Option(e.getCause).map(_.getMessage).getOrElse("")
    assert(msg.contains("vector length 2 != dim 4"), e.toString)
  }

  test("binarySignTopK: shortlist+rerank recovers most exact neighbors on the fixture") {
    val emb = graft.core.Tables.embeddings(spark, sf)
    val qs = emb.filter($"vec_id" < 8)
    val exact = Similarity.bruteForceTopK(qs, emb, "vec_id", "embedding", 5)
      .select($"qid", $"nid").as[(Long, Long)].collect().toSet
    val bq = Similarity.binarySignTopK(qs, emb, "vec_id", "embedding",
        dim = 64, k = 5, rerank = 4)
      .select($"qid", $"nid").as[(Long, Long)].collect().toSet
    val recall = (exact & bq).size.toDouble / exact.size
    // deterministic fixture: measured recall is a fixed number; pin a
    // floor that a broken signature (e.g. wrong bit order barely matters,
    // but a constant sig collapses to nid-order) falls far below
    assert(recall >= 0.4, s"recall@5 = $recall")
  }

  test("matryoshkaRecall: planted prefix-vs-full divergence by hand; zero-overlap reports 0") {
    def vec(xs: Double*) = xs.map(_.toFloat).toArray
    val qs = Seq((1L, vec(1, 0, 0, 0))).toDF("vec_id", "embedding")
    // c11's mass lives in the TRUNCATED dims: prefix-2 sees a perfect
    // match, full cosine ranks it below c12
    val corpus = Seq(
      (10L, vec(1, 0, 0, 0)),      // full 1.0, prefix-2 1.0
      (11L, vec(0.6, 0, 0.8, 0)),  // full 0.6, prefix-2 1.0
      (12L, vec(0.8, 0.6, 0, 0)))  // full 0.8, prefix-2 0.8
      .toDF("vec_id", "embedding")
    val out = Similarity.matryoshkaRecall(qs, corpus, "vec_id", "embedding",
        dims = Seq(2, 4), k = 2)
      .collect().map(r => r.getAs[Long]("dim") -> r.getAs[Long]("n_hits"))
      .toMap
    // full top-2 = {10, 12}; prefix-2 top-2 = {10, 11} (tie 1.0/1.0 by nid)
    assert(out(2L) == 1L, out.toString)
    assert(out(4L) == 2L, out.toString) // full-width arm is a sanity row
    // a degenerate prefix (dim 1 of a zero-first-component query: every
    // truncated cosine NULL) must still report a row per query, never drop it
    val qs2 = Seq((1L, vec(0, 1, 0.01, 0))).toDF("vec_id", "embedding")
    val corpus2 = Seq(
      (10L, vec(0, 1, 0, 0)), (11L, vec(0.01, 0.9, 0, 0)),
      (12L, vec(-1, -1, 1, 0)), (13L, vec(-1, -0.5, 1, 0)))
      .toDF("vec_id", "embedding")
    val z = Similarity.matryoshkaRecall(qs2, corpus2, "vec_id", "embedding",
        dims = Seq(1), k = 2)
      .filter($"dim" === 1L).collect()
    assert(z.length == 1, "degenerate-prefix query must still report a row")
  }
}
