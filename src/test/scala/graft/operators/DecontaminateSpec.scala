package graft.operators

import graft.SparkSpec

class DecontaminateSpec extends SparkSpec {
  import spark.implicits._

  test("flags corpus docs sharing any n-gram with the benchmark, counts distinct overlaps") {
    val corpus = Seq(
      (1L, "the quick brown fox jumps over dogs"), // shares "the quick brown", "quick brown fox"
      (2L, "completely unrelated corpus text here"),
      (3L, "the quick brown fox" + " again and again") // same overlapping grams as 1
    ).toDF("doc_id", "text")
    val benchmark = Seq(
      (100L, "the quick brown fox is a benchmark item")
    ).toDF("doc_id", "text")

    val out = Dedup.decontaminate(corpus, benchmark, "doc_id", "text", 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out.keySet == Set(1L, 3L), s"got $out")
    assert(out(1L) == 2L) // "the quick brown" + "quick brown fox"
    assert(out(3L) == 2L)
  }

  test("gram multiplicity does not inflate the overlap count (distinct set semantics)") {
    val corpus = Seq((1L, "a b c a b c a b c")).toDF("doc_id", "text")
    val benchmark = Seq((9L, "a b c")).toDF("doc_id", "text")
    val out = Dedup.decontaminate(corpus, benchmark, "doc_id", "text", 3).collect()
    // corpus doc contains gram "a b c" three times, plus "b c a"/"c a b"
    // which the benchmark lacks -> exactly ONE distinct overlapping gram
    assert(out.length == 1 && out(0).getLong(1) == 1L)
  }

  test("clean corpus yields no rows; short docs produce no grams") {
    val corpus = Seq((1L, "x y z w"), (2L, "too short")).toDF("doc_id", "text")
    val benchmark = Seq((9L, "p q r s t")).toDF("doc_id", "text")
    assert(Dedup.decontaminate(corpus, benchmark, "doc_id", "text", 3).count() == 0)
  }

  test("bloom prefilter: n_exact matches decontaminate exactly; n_bloom is a superset count") {
    val d = graft.core.Tables.documents(spark, sf)
    val corpus = d.filter($"doc_id" % 7 =!= 0)
    val benchmark = d.filter($"doc_id" % 7 === 0)
    val exact = Dedup.decontaminate(corpus, benchmark, "doc_id", "text", 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val bloom = Dedup.bloomDecontaminate(corpus, benchmark, "doc_id", "text", 3)
      .collect().map(r => (r.getLong(0), (r.getAs[Long]("n_bloom"), r.getAs[Long]("n_exact")))).toMap
    // every truly contaminated doc appears with the same exact-overlap count
    exact.foreach { case (sid, n) =>
      assert(bloom.contains(sid), s"bloom missed contaminated doc $sid")
      assert(bloom(sid)._2 == n, s"doc $sid n_exact ${bloom(sid)._2} != $n")
    }
    // candidates are a superset: n_bloom >= n_exact everywhere, and docs
    // present only via false positives carry n_exact = 0
    bloom.foreach { case (sid, (nb, ne)) =>
      assert(nb >= ne)
      assert(ne == exact.getOrElse(sid, 0L))
    }
  }

  test("bloom prefilter with a tiny bitmap still verifies exactly (high fp-rate stress)") {
    val corpus = Seq(
      (1L, "the quick brown fox jumps over dogs"),
      (2L, "completely unrelated corpus text here today")).toDF("doc_id", "text")
    val benchmark = Seq((9L, "the quick brown fox is a benchmark item")).toDF("doc_id", "text")
    val out = Dedup.bloomDecontaminate(corpus, benchmark, "doc_id", "text", 3, log2m = 6)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    // at m = 64 bits nearly everything collides into candidates, but the
    // exact verify still reports the true overlaps only
    assert(out(1L)._2 == 2L)
    assert(out.getOrElse(2L, (0L, 0L))._2 == 0L)
  }

  test("verify join falls back to a shuffled join past the broadcast budget, same answer") {
    val d = graft.core.Tables.documents(spark, sf)
    val corpus = d.filter($"doc_id" % 7 =!= 0)
    val benchmark = d.filter($"doc_id" % 7 === 0)
    def rows(maxGrams: Long) =
      Dedup.bloomDecontaminate(corpus, benchmark, "doc_id", "text", 3,
          verifyBroadcastMaxGrams = maxGrams)
        .collect().map(r => (r.getLong(0), r.getAs[Long]("n_bloom"),
          r.getAs[Long]("n_exact"))).sortBy(_._1).toSeq
    // threshold 0 forces the shuffled verify; results must be identical
    val shuffled = rows(0L)
    val broadcasted = rows(Long.MaxValue)
    assert(shuffled.nonEmpty)
    assert(shuffled == broadcasted)
  }

  test("served decontamination through the persisted gram table equals from-scratch") {
    val docs = graft.core.Tables.documents(spark, sf)
    val bench = docs.filter($"doc_id" % 7 === 0)
    val corpus = docs.filter($"doc_id" % 7 =!= 0)
    val name = "dspec_" + System.nanoTime()
    graft.sources.Bucketing.ensureCleanTable(
      spark, Dedup.benchmarkGramsTable(name))
    Dedup.writeBenchmarkGrams(bench, "doc_id", "text", 3, name, 4)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.orderBy($"sid").as[(Long, Long)].collect().toSeq
    val scratch = rows(Dedup.decontaminate(corpus, bench, "doc_id", "text", 3))
    val served = rows(
      Dedup.decontaminateServed(spark, corpus, name, "doc_id", "text", 3))
    assert(scratch.nonEmpty && served == scratch)
    // the persisted gram set is the benchmark's distinct hashes exactly —
    // rebuilding over the same suite is a no-op for every later serve
    graft.sources.Bucketing.ensureCleanTable(
      spark, Dedup.benchmarkGramsTable(name))
    Dedup.writeBenchmarkGrams(bench, "doc_id", "text", 3, name, 4)
    assert(rows(Dedup.decontaminateServed(spark, corpus, name,
      "doc_id", "text", 3)) == scratch)
    spark.sql(s"DROP TABLE IF EXISTS ${Dedup.benchmarkGramsTable(name)}")
  }

  test("contaminationMatrix: per-suite doc and distinct-gram hits by hand; minShared gates; clean suite absent") {
    import spark.implicits._
    val corpus = Seq(
      (1L, "a b c d e"),     // shares "a b c" + "b c d" with suiteA (2 grams)
      (2L, "x y z w q"),     // shares "x y z" with suiteB (1 gram)
      (3L, "p q r s t"))     // clean
      .toDF("doc_id", "text")
    val suites = Seq(
      ("suiteA", "a b c d zz"),       // grams: "a b c", "b c d", "c d zz"
      ("suiteB", "x y z other words"),
      ("suiteC", "nothing shared here at all"))
      .toDF("suite", "text")
    def run(minShared: Long) =
      Dedup.contaminationMatrix(corpus, suites, "doc_id", "text", "suite",
          n = 3, minShared = minShared)
        .orderBy($"suite").as[(String, Long, Long)].collect().toSeq
    // doc 1 shares 2 distinct grams with suiteA; doc 2 shares 1 with
    // suiteB; suiteC never appears (no zero-row padding)
    assert(run(1L) == Seq(("suiteA", 1L, 2L), ("suiteB", 1L, 1L)))
    // minShared = 2 drops the single-gram suiteB hit
    assert(run(2L) == Seq(("suiteA", 1L, 2L)))
    // one corpus doc contaminating TWO suites counts in both rows
    // doc 4 shares "a b c"+"b c d" with suiteA and "x y z" with suiteB
    val multi = corpus.unionByName(Seq((4L, "a b c d x y z"))
      .toDF("doc_id", "text"))
    val both = Dedup.contaminationMatrix(multi, suites, "doc_id", "text",
        "suite", n = 3)
      .orderBy($"suite").as[(String, Long, Long)].collect().toSeq
    assert(both == Seq(("suiteA", 2L, 4L), ("suiteB", 2L, 2L)))
  }
}
