package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SamplingSpec extends SparkSpec {
  import spark.implicits._

  test("coresetPerCluster: k most-central members per cluster, deterministic") {
    val emb = graft.core.Tables.embeddings(spark, sf)
    val k = 5
    val core = Sampling.coresetPerCluster(emb, "vec_id", "embedding",
      nClusters = 8, rounds = 2, k = k)
      .select($"sid", $"cid", $"cosine").as[(Long, Long, Option[Double])]
      .collect()
    // per-cluster count = min(k, cluster size), derived from the same
    // assignment the coreset ranked
    val assigned = Similarity.kmeansAssign(emb, "vec_id", "embedding", 8, 2)
      .select($"sid", $"cid", $"cosine").as[(Long, Long, Option[Double])]
      .collect()
    val bySize = assigned.groupBy(_._2).view.mapValues(_.length).toMap
    val coreByCid = core.groupBy(_._2)
    assert(coreByCid.keySet == bySize.keySet.filter(bySize(_) > 0))
    coreByCid.foreach { case (cid, rows) =>
      assert(rows.length == math.min(k, bySize(cid)), s"cluster $cid")
    }
    // dominance: every kept member is at least as central as every unkept
    // member of its own cluster (None = zero-norm sorts last)
    def key(c: Option[Double]) = c.getOrElse(Double.NegativeInfinity)
    val keptIds = core.map(_._1).toSet
    coreByCid.foreach { case (cid, rows) =>
      val worstKept = rows.map(r => key(r._3)).min
      assigned.filter(a => a._2 == cid && !keptIds.contains(a._1))
        .foreach(a => assert(key(a._3) <= worstKept, s"cluster $cid: ${a._1}"))
    }
    // deterministic across runs
    val again = Sampling.coresetPerCluster(emb, "vec_id", "embedding", 8, 2, k)
      .select($"sid").as[Long].collect().toSet
    assert(again == keptIds)
  }

  test("hashSample: deterministic, near-rate, and stable under corpus growth") {
    val docs = graft.core.Tables.documents(spark, sf)
    val a = Sampling.hashSample(docs, "doc_id", 0.2, "t").select("doc_id")
      .as[Long].collect().toSet
    val b = Sampling.hashSample(docs, "doc_id", 0.2, "t").select("doc_id")
      .as[Long].collect().toSet
    assert(a == b)
    val n = docs.count().toDouble
    assert(math.abs(a.size / n - 0.2) < 0.08, s"rate ${a.size / n}")
    // membership is per-row: sampling a SUBSET keeps exactly the intersection
    val half = Sampling.hashSample(docs.filter($"doc_id" % 2 === 0), "doc_id", 0.2, "t")
      .select("doc_id").as[Long].collect().toSet
    assert(half == a.filter(_ % 2 == 0))
    // a different salt draws a different sample
    val other = Sampling.hashSample(docs, "doc_id", 0.2, "u").select("doc_id")
      .as[Long].collect().toSet
    assert(other != a)
  }

  test("splitAssign: total, disjoint, near the requested fractions") {
    val docs = graft.core.Tables.documents(spark, sf)
    val splits = Sampling.splitAssign(docs, "doc_id",
      Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1), "sp")
      .groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val n = docs.count().toDouble
    assert(splits.keySet == Set("train", "val", "test"))
    assert(splits.values.sum == n) // total: every row lands in exactly one
    assert(math.abs(splits("train") / n - 0.8) < 0.1, splits.toString)
  }

  test("temperatureSample flattens: small source rate caps at 1, big source thins") {
    // 400 "a" rows vs 25 "b" rows at alpha = 0.5, target 0.5:
    //   w_a = 20, w_b = 5, n_tot = 425, w_tot = 25
    //   rate_a = 0.5 * 425 * 20 / (25 * 400) = 0.425
    //   rate_b = 0.5 * 425 * 5 / (25 * 25) = 1.7 -> capped at 1.0
    // so the small source survives IN FULL (deterministically) while the
    // big one keeps ~42.5%.
    val docs = ((1 to 400).map(i => (i.toLong, "a")) ++
      (401 to 425).map(i => (i.toLong, "b"))).toDF("doc_id", "source")
    val out = Sampling.temperatureSample(docs, "doc_id", "source", 0.5, "tm")
    val again = Sampling.temperatureSample(docs, "doc_id", "source", 0.5, "tm")
      .select("doc_id").as[Long].collect().toSet
    assert(out.select("doc_id").as[Long].collect().toSet == again) // deterministic
    assert(out.filter($"source" === "b").count() == 25L, "capped rate keeps all")
    val keptA = out.filter($"source" === "a").count().toDouble / 400.0
    assert(math.abs(keptA - 0.425) < 0.08, s"big source kept $keptA, want ~0.425")
  }

  test("stratifiedSample keeps every row of rate-1.0 strata, thins the rest") {
    val docs = graft.core.Tables.documents(spark, sf)
    val out = Sampling.stratifiedSample(docs, "doc_id", "lang",
      Map("zh" -> 1.0), defaultRate = 0.2, salt = "st")
    val zhAll = docs.filter($"lang" === "zh").count()
    assert(out.filter($"lang" === "zh").count() == zhAll)
    val restIn = docs.filter($"lang" =!= "zh").count()
    val restOut = out.filter($"lang" =!= "zh").count()
    assert(restOut < restIn / 2, s"$restOut of $restIn kept")
  }

  test("exactKPerStratum: exactly k per stratum (or the whole small stratum), deterministic") {
    val docs = graft.core.Tables.documents(spark, sf)
    val out = Sampling.exactKPerStratum(docs, "doc_id", "lang", 20, "ek")
    val byLang = out.groupBy($"lang").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val full = docs.groupBy($"lang").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    byLang.foreach { case (lang, n) => assert(n == math.min(20L, full(lang)), s"$lang: $n") }
    // deterministic: same salt -> same members
    val again = Sampling.exactKPerStratum(docs, "doc_id", "lang", 20, "ek")
      .select("doc_id").as[Long].collect().toSet
    assert(again == out.select("doc_id").as[Long].collect().toSet)
    // per-group limit is planned as WindowGroupLimit (k rows per stratum
    // survive each map partition BEFORE the shuffle)
    val p = Sampling.exactKPerStratum(docs, "doc_id", "lang", 20, "ek")
      .queryExecution.executedPlan.toString
    assert(p.contains("WindowGroupLimit"), p)
  }

  test("shuffleOrder: pos is a contiguous permutation, bucket-count-independent") {
    val docs = graft.core.Tables.documents(spark, sf)
    val n = docs.count()
    val byDefault = Sampling.shuffleOrder(spark, docs, "doc_id", "ep0")
      .select($"doc_id", $"pos").as[(Long, Long)].collect().toMap
    // contiguous 0-based permutation
    assert(byDefault.values.toSeq.sorted == (0L until n).toSeq)
    // the layout is a pure function of (salt, id): bucket count only
    // changes parallelism, never the order
    val by3 = Sampling.shuffleOrder(spark, docs, "doc_id", "ep0", buckets = 3)
      .select($"doc_id", $"pos").as[(Long, Long)].collect().toMap
    assert(by3 == byDefault)
    // a different salt is a genuinely different epoch permutation
    val ep1 = Sampling.shuffleOrder(spark, docs, "doc_id", "ep1")
      .select($"doc_id", $"pos").as[(Long, Long)].collect().toMap
    assert(ep1 != byDefault)
    // and not the identity layout
    assert(byDefault.exists { case (id, pos) => id != pos })
  }

  test("writeTrainingShards: shards tile the permutation, re-export idempotent") {
    val docs = graft.core.Tables.documents(spark, sf)
    val n = docs.count()
    val path = java.nio.file.Files.createTempDirectory("graft_shards")
      .resolve("ep0").toString
    Sampling.writeTrainingShards(docs, "doc_id", "ep0", docsPerShard = 64L, path)
    // every doc lands exactly once, in its shuffleOrder shard
    val landed = spark.read.parquet(path)
      .select($"doc_id", $"pos", $"shard".cast("long"))
      .as[(Long, Long, Long)].collect()
    assert(landed.length == n)
    assert(landed.map(_._1).distinct.length == n)
    val order = Sampling.shuffleOrder(spark, docs, "doc_id", "ep0")
      .select($"doc_id", $"pos").as[(Long, Long)].collect().toMap
    landed.foreach { case (id, pos, shard) =>
      assert(pos == order(id) && shard == pos / 64, s"doc $id")
    }
    // shard sizes: exactly 64 except the last
    val sizes = landed.groupBy(_._3).view.mapValues(_.length).toMap
    val last = sizes.keys.max
    sizes.foreach { case (s, c) =>
      if (s < last) assert(c == 64, s"shard $s size $c")
      else assert(c >= 1 && c <= 64, s"last shard size $c")
    }
    // one file per shard (the repartition-before-partitionBy contract —
    // without it every task writes into every shard directory) and the
    // file's row order IS the training order
    assert(spark.read.parquet(path).inputFiles.length == sizes.size,
      "one file per shard")
    val shard0 = spark.read.parquet(path + "/shard=0")
      .select($"pos").as[Long].collect()
    assert(shard0.toSeq == shard0.sorted.toSeq, "in-file rows follow pos")
    // manifest reconciles with the corpus and is stable across re-export
    val m1 = Sampling.shardManifest(spark, path, "doc_id", "n_chars")
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(m1.toSeq.map(_._2).sum == n)
    Sampling.writeTrainingShards(docs, "doc_id", "ep0", 64L, path)
    val m2 = Sampling.shardManifest(spark, path, "doc_id", "n_chars")
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(m2 == m1, "re-export must land identical shards")
  }

  test("shuffleOrder fails loud on NULL ids instead of a corrupt order") {
    val withNull = Seq(Some(1L), Some(2L), None).toDF("doc_id")
    val e = intercept[IllegalArgumentException](
      Sampling.shuffleOrder(spark, withNull, "doc_id", "ep0").collect())
    assert(e.getMessage.contains("NULL"), e.getMessage)
  }

  test("splitAssignByCluster: clusters never straddle splits, singletons match plain split, growth is stable") {
    val docs = (1L to 400L).map(Tuple1(_)).toDF("id")
    // clusters: {1..5} -> 1, {10,11} -> 10; everyone else singleton
    val labels = (Seq((1L, 1L), (2L, 1L), (3L, 1L), (4L, 1L), (5L, 1L)) ++
      Seq((10L, 10L), (11L, 10L))).toDF("sid", "component")
    val out = Sampling.splitAssignByCluster(docs, "id", labels,
      "sid", "component", Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1), "sp")
      .select($"id", $"split").as[(Long, String)].collect().toMap
    // leakage invariant: every cluster member shares one split
    assert(Set(1L, 2L, 3L, 4L, 5L).map(out).size == 1)
    assert(Set(10L, 11L).map(out).size == 1)
    // singletons degrade to the plain document-keyed split
    val plain = Sampling.splitAssign(docs.filter($"id" > 20), "id",
      Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1), "sp")
      .select($"id", $"split").as[(Long, String)].collect().toMap
    plain.foreach { case (id, sp) => assert(out(id) == sp, s"id=$id") }
    // growth stability: a NEW doc joining cluster 1 gets cluster 1's
    // existing split — no reshuffle of anything already assigned
    val grown = Sampling.splitAssignByCluster(
      (1L to 401L).map(Tuple1(_)).toDF("id"), "id",
      labels.unionByName(Seq((401L, 1L)).toDF("sid", "component")),
      "sid", "component", Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1), "sp")
      .select($"id", $"split").as[(Long, String)].collect().toMap
    assert(grown(401L) == out(1L))
    (1L to 400L).foreach(id => assert(grown(id) == out(id)))
  }

  test("weightedKPerStratum: exact k per stratum, weight-biased, zero-weight excluded, deterministic") {
    // 2 strata x 100 rows; in stratum "a" rows 0..9 carry 1000x the weight
    val rows = (0 until 100).flatMap { i =>
      Seq(("a", i.toLong, if (i < 10) 100000L else 100L),
          ("b", (100 + i).toLong, 100L))
    } :+ (("a", 999L, 0L)) // weight 0: must never appear
    val df = rows.toDF("lang", "doc_id", "wt")
    val out = Sampling.weightedKPerStratum(df, "doc_id", "lang", "wt", k = 10, salt = "t")
    val byStratum = out.collect().groupBy(_.getString(0))
    assert(byStratum("a").length == 10 && byStratum("b").length == 10)
    assert(out.filter($"did" === 999L).isEmpty) // zero weight excluded
    // ln(1000x) = +6.9 nats: the 10 heavy rows should crowd out the light
    // ones almost surely (Gumbel spread is ~1.3 nats); require >= 8 of 10
    val heavy = byStratum("a").map(_.getAs[Long]("did")).count(_ < 10)
    assert(heavy >= 8, s"only $heavy heavy rows sampled in stratum a")
    // determinism: a second run is identical
    val again = Sampling.weightedKPerStratum(df, "doc_id", "lang", "wt", k = 10, salt = "t")
    assert(out.collect().map(_.toString).sorted.toSeq ==
      again.collect().map(_.toString).sorted.toSeq)
  }

  test("tokenBudgetPerKey: best-first fill, crossing doc kept, budgets independent per key") {
    val docs = Seq(
      // source a: scores order docs 3 > 1 > 2; budget 100
      ("a", 1L, 60L, 0.8), ("a", 2L, 60L, 0.5), ("a", 3L, 50L, 0.9),
      // source b: one giant doc crossing alone is still kept
      ("b", 4L, 500L, 0.9), ("b", 5L, 10L, 0.8)
    ).toDF("src", "doc_id", "n_tokens", "score")
    val out = Sampling.tokenBudgetPerKey(docs, "src", "doc_id", "n_tokens",
      "score", budgetTokens = 100L)
      .select("src", "doc_id", "cum_tokens").as[(String, Long, Long)]
      .collect().map(r => (r._1, r._2) -> r._3).toMap
    // a: doc3 (50) then doc1 (cum 110, starts at 50 < 100 -> kept, crosses);
    //    doc2 starts at 110 >= 100 -> dropped
    assert(out == Map(("a", 3L) -> 50L, ("a", 1L) -> 110L, ("b", 4L) -> 500L))
  }

  test("mixToWeights: exact shares, binding stratum near-full, deterministic, growth-stable") {
    val docs = graft.core.Tables.documents(spark, sf)
    val w = Map("en" -> 5L, "de" -> 2L, "zh" -> 1L)
    val out = Sampling.mixToWeights(docs, "doc_id", "lang", w, "mx")
    val kept = out.groupBy("lang").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // only weighted strata appear, at the documented floor quotas:
    // T* = min_s floor(n_s*W/w_s), k_s = floor(w_s*T*/W)
    assert(kept.keySet == w.keySet)
    val full = docs.groupBy("lang").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val wTotal = w.values.sum
    val tStar = w.map { case (s, wt) => full(s) * wTotal / wt }.min
    w.foreach { case (s, wt) =>
      assert(kept(s) == wt * tStar / wTotal, s"$s: ${kept(s)}")
    }
    kept.foreach { case (l, n) => assert(n <= full(l)) }
    assert(kept.exists { case (l, n) => full(l) - n < 10 },
      s"no stratum near-fully used: $kept vs $full")
    // deterministic, and a re-run over MORE data keeps prior members
    val again = Sampling.mixToWeights(docs, "doc_id", "lang", w, "mx")
      .select("doc_id").as[Long].collect().toSet
    assert(again == out.select("doc_id").as[Long].collect().toSet)
  }

  test("curriculumOrder: stages stream in order, contiguous pos, bucket-invariant, shuffled within") {
    val docs = (1L to 300L).map(i => (i, i % 3)).toDF("doc_id", "stage")
    val out = Sampling.curriculumOrder(spark, docs, "doc_id", "stage", "ep0")
      .select($"doc_id", $"stage", $"pos").as[(Long, Long, Long)].collect()
    assert(out.map(_._3).sorted.toSeq == (0L until 300L).toSeq) // contiguous
    // stage boundaries: all of stage s precedes all of stage s+1
    val byPos = out.sortBy(_._3).map(_._2)
    assert(byPos.toSeq == byPos.sorted.toSeq, "stages interleaved")
    // shuffled within a stage: not id order
    val stage0 = out.filter(_._2 == 0L).sortBy(_._3).map(_._1)
    assert(stage0.toSeq != stage0.sorted.toSeq, "stage not shuffled")
    // bucket count only changes parallelism, never the layout
    val by7 = Sampling.curriculumOrder(spark, docs, "doc_id", "stage", "ep0", buckets = 7)
      .select($"doc_id", $"pos").as[(Long, Long)].collect().toMap
    assert(by7 == out.map(r => r._1 -> r._3).toMap)
  }

  test("epochMix: per-stratum copy totals equal the integer quotas exactly") {
    val docs = ((1L to 4L).map((_, "a")) ++ (5L to 6L).map((_, "b")))
      .toDF("doc_id", "s")
    // quotas: a = b = 6 of 12. a (4 rows): 1 epoch + 2 extras; b (2 rows):
    // 3 full epochs, no extras
    val out = Sampling.epochMix(docs, "doc_id", "s",
        Map("a" -> 1L, "b" -> 1L), totalRows = 12L, salt = "em")
      .select($"doc_id", $"s", $"n_copies").as[(Long, String, Long)]
      .collect()
    val byStratum = out.groupBy(_._2)
    assert(byStratum("a").map(_._3).sum == 6 && byStratum("b").map(_._3).sum == 6)
    assert(byStratum("a").map(_._3).sorted.toSeq == Seq(1L, 1L, 2L, 2L))
    assert(byStratum("b").map(_._3).toSeq == Seq(3L, 3L))
  }

  test("epochMix: extra-copy membership is the exactKPerStratum top-rem under the same salt") {
    val docs = (1L to 90L).map(i => (i, if (i % 3 == 0) "x" else "y"))
      .toDF("doc_id", "s")
    // x: 30 rows, quota 50 -> 1 epoch + 20 extras; y: 60 rows, quota 50 ->
    // 0 epochs + 50 extras (the below-quota rows of y drop out entirely)
    val out = Sampling.epochMix(docs, "doc_id", "s",
        Map("x" -> 1L, "y" -> 1L), totalRows = 100L, salt = "em2")
      .select($"doc_id", $"s", $"n_copies").as[(Long, String, Long)]
      .collect()
    val extrasX = out.filter(r => r._2 == "x" && r._3 == 2L).map(_._1).toSet
    val keptY = out.filter(_._2 == "y").map(_._1).toSet
    assert(out.filter(_._2 == "y").forall(_._3 == 1L) && keptY.size == 50)
    val topX = Sampling.exactKPerStratum(docs.filter($"s" === "x"),
      "doc_id", "s", 20, "em2").select($"doc_id").as[Long].collect().toSet
    val topY = Sampling.exactKPerStratum(docs.filter($"s" === "y"),
      "doc_id", "s", 50, "em2").select($"doc_id").as[Long].collect().toSet
    assert(extrasX == topX && keptY == topY)
    // bucket count never changes membership or copy counts
    val by7 = Sampling.epochMix(docs, "doc_id", "s",
        Map("x" -> 1L, "y" -> 1L), totalRows = 100L, salt = "em2", buckets = 7)
      .select($"doc_id", $"n_copies").as[(Long, Long)].collect().toMap
    assert(by7 == out.map(r => r._1 -> r._3).toMap)
  }

  test("temporalPurgedSplit: embargo dropped, warm/cold test entities annotated") {
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    val ev = Seq(
      (1L, 10L, ts("2024-01-05 00:00:00")), // A: train
      (2L, 10L, ts("2024-01-25 00:00:00")), // A: test, warm
      (3L, 20L, ts("2024-01-21 00:00:00")), // B: embargo -> dropped
      (4L, 20L, ts("2024-01-26 00:00:00")), // B: test, cold (only embargo before)
      (5L, 30L, ts("2024-01-19 23:59:59")), // C: train (boundary-exclusive)
      (6L, 40L, ts("2024-01-22 00:00:00"))  // D: test at boundary, cold
    ).toDF("event_id", "user_id", "ts")
    val out = Sampling.temporalPurgedSplit(ev, "event_id", "user_id", "ts",
        ts("2024-01-20 00:00:00"), ts("2024-01-22 00:00:00"))
      .select($"event_id", $"split", $"cold_entity")
      .as[(Long, String, Boolean)].collect().map(r => r._1 -> (r._2, r._3))
      .toMap
    assert(!out.contains(3L), "embargo row must drop")
    assert(out(1L) == ("train", false) && out(5L) == ("train", false))
    assert(out(2L) == ("test", false), "entity with train history is warm")
    assert(out(4L) == ("test", true) && out(6L) == ("test", true))
    intercept[IllegalArgumentException] {
      Sampling.temporalPurgedSplit(ev, "event_id", "user_id", "ts",
        ts("2024-01-22 00:00:00"), ts("2024-01-20 00:00:00"))
    }
  }

  test("expandCopies: one row per copy, keys unique, totals preserved") {
    val mix = Seq((1L, "a", 3L), (2L, "a", 1L), (3L, "b", 2L))
      .toDF("doc_id", "s", "n_copies")
    val out = Sampling.expandCopies(mix, "doc_id")
      .select($"doc_id", $"copy", $"copy_key").as[(Long, Long, String)]
      .collect()
    assert(out.length == 6)
    assert(out.map(_._3).distinct.length == 6, "copy keys collide")
    assert(out.filter(_._1 == 1L).map(_._2).sorted.toSeq == Seq(1L, 2L, 3L))
    assert(out.map(_._3).toSet.contains("1#3"))
  }

  test("epochMix: a weighted stratum with no rows fails loud, never renormalizes") {
    val docs = Seq((1L, "a")).toDF("doc_id", "s")
    val e = intercept[IllegalArgumentException] {
      Sampling.epochMix(docs, "doc_id", "s",
        Map("a" -> 1L, "ghost" -> 1L), totalRows = 10L, salt = "em")
    }
    assert(e.getMessage.contains("ghost"))
  }

  test("mixConcentration: one-key mix is 1/1; uniform mix by hand; N<2 NULL") {
    val one = (1L to 6L).map(i => (i, "only")).toDF("id", "k")
    val o = Sampling.mixConcentration(one, "k").collect().head
    assert(o.getAs[Double]("simpson") == 1.0)
    assert(o.getAs[Double]("effective_keys") == 1.0)
    // 3 keys x 4 rows: D = 3*(4*3)/(12*11) = 36/132 = 0.272727;
    // effective = 132/36 = 3.666667
    val uniform = (0L until 12L).map(i => (i, s"k${i % 3}")).toDF("id", "k")
    val u = Sampling.mixConcentration(uniform, "k").collect().head
    assert(u.getAs[Long]("n_rows") == 12L && u.getAs[Long]("n_keys") == 3L)
    assert(u.getAs[Double]("simpson") == 0.272727)
    assert(u.getAs[Double]("effective_keys") == 3.666667)
    // a single row has no pairs to draw: both ratios NULL, never a throw
    val single = Seq((1L, "k")).toDF("id", "k")
    val s1 = Sampling.mixConcentration(single, "k").collect().head
    assert(s1.isNullAt(s1.fieldIndex("simpson")))
  }
}
