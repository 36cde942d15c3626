package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class QualitySpec extends SparkSpec {
  import spark.implicits._

  test("profile counts nulls/distinct and renders bounds per column") {
    val df = Seq(
      (Some(1.0), "a"), (Some(2.0), "a"), (None, "b")
    ).toDF("x", "k")
    val p = Quality.profile(df, Seq("x", "k")).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(p("x").getLong(1) == 3 && p("x").getLong(2) == 1) // rows, nulls
    assert(p("x").getLong(3) == 2) // distinct (nulls excluded)
    assert(p("x").getString(4) == "1.0" && p("x").getString(5) == "2.0")
    assert(p("k").getLong(2) == 0 && p("k").getLong(3) == 2)
  }

  test("expect: null predicates count as violations; rates over total rows") {
    val df = Seq(Some(5), Some(60), None).map(Tuple1(_)).toDF("v")
    val out = Quality.expect(df, Seq(
      "v_le_50" -> ($"v" <= 50),       // 60 violates; NULL violates
      "v_present" -> $"v".isNotNull)) // one null
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(out("v_le_50") == ((2L, 2.0 / 3)))
    assert(out("v_present") == ((1L, 1.0 / 3)))
  }

  test("distributionDrift: identical halves pass, a shifted run fires on the shifted column only") {
    val q = graft.SparkEntry.queries("dq3_distribution_drift")(spark, sf).collect()
    assert(q.length == 6)
    val ok = q.map(r => (r.getAs[String]("scenario"), r.getAs[String]("column")) ->
      r.getAs[Boolean]("drift_ok")).toMap
    // parity split: same distribution, every column passes
    assert(ok(("a_split", "o_orderpriority")) && ok(("a_split", "o_orderstatus")) &&
      ok(("a_split", "o_totalprice")))
    // price-truncated run: the shifted column fires, the independent
    // categoricals stay green
    assert(!ok(("b_price_shifted", "o_totalprice")))
    assert(ok(("b_price_shifted", "o_orderpriority")) && ok(("b_price_shifted", "o_orderstatus")))
    // TV is a real magnitude, not just a boolean: the truncation moved
    // ~30% of the mass at sf0.01 (0.297 measured), and > 0.1 generally
    val tvShift = q.find(r => r.getAs[String]("scenario") == "b_price_shifted" &&
      r.getAs[String]("column") == "o_totalprice").get.getAs[Double]("tv")
    assert(tvShift > 0.1, s"shifted TV $tvShift should exceed the gate budget")
  }

  test("distributionDrift: direct API — drifted bucket mass and halved cardinality both fire") {
    val ref = (1 to 400).map(i => i % 20).toDF("v")
    val sameD = (1 to 400).map(i => (i + 7) % 20).toDF("v")    // same uniform shape
    val shifted = (1 to 400).map(i => i % 10).toDF("v")        // half the buckets
    def run(cur: org.apache.spark.sql.DataFrame) =
      Quality.distributionDrift(ref, cur,
        Seq(("v", $"v", $"v".cast("string"))), maxTvPermille = 100, k = 8)
        .collect()(0)
    val same = run(sameD)
    assert(same.getAs[Boolean]("drift_ok") && same.getAs[Double]("tv") == 0.0)
    val drift = run(shifted)
    // mass doubled on 10 buckets and vanished from 10: TV = 0.5, and the
    // KMV sketch (k=8 < 10 distinct) still estimates, so both gates matter
    assert(!drift.getAs[Boolean]("drift_ok"))
    assert(drift.getAs[Double]("tv") == 0.5)
    assert(drift.getAs[Long]("n_ref") == 400 && drift.getAs[Long]("n_cur") == 400)
  }

  test("refreshSumCount: combining partial aggregates equals the full recompute") {
    val rows = (1 to 100).map(i => (s"k${i % 3}", (i % 7).toDouble)).toDF("k", "v")
      .withColumn("v", $"v".cast("string")) // sumExact takes the coercible form
    def agg(df: org.apache.spark.sql.DataFrame) =
      df.groupBy($"k").agg(ExactAgg.sumExact($"v").as("s"), count(lit(1)).as("n"))
    val full = agg(rows).collect()
      .map(r => r.getString(0) -> ((r.getDouble(1), r.getLong(2)))).toMap
    val merged = Quality.refreshSumCount(
      agg(rows.limit(60)), agg(rows.exceptAll(rows.limit(60))), Seq("k"), "s", "n")
      .collect().map(r => r.getString(0) -> ((r.getDouble(1), r.getLong(2)))).toMap
    assert(merged == full)
  }

  test("schemaDrift reports added/missing/type/nullability divergences, empty when clean") {
    import org.apache.spark.sql.types._
    val expected = StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("name", StringType, nullable = true),
      StructField("price", DoubleType, nullable = true)))
    val actual = spark.range(1).selectExpr(
      "id",                            // long, NOT NULL (range output)
      "'x' AS name",
      "CAST(1 AS INT) AS price",       // type drift
      "1.5 AS extra")                  // unknown column
    val drifts = Quality.schemaDrift(actual, expected)
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(drifts == Set(("added", "extra"), ("type_changed", "price")))

    // nullability relaxation is the one direction that breaks consumers
    val relaxed = spark.range(1).selectExpr(
      "CAST(NULL AS BIGINT) AS id", "'x' AS name", "CAST(1.0 AS DOUBLE) AS price")
    val nd = Quality.schemaDrift(relaxed, expected)
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(nd == Set(("nullability_relaxed", "id")))

    // a missing contract column is reported; a conforming frame is silent
    assert(Quality.schemaDrift(actual.drop("name", "extra"), expected)
      .collect().map(r => (r.getString(0), r.getString(1))).toSet ==
      Set(("missing", "name"), ("type_changed", "price")))
    val clean = spark.range(1).selectExpr("id", "'x' AS name", "CAST(1 AS DOUBLE) AS price")
    assert(Quality.schemaDrift(clean, expected).count() == 0)
  }

  test("curationFunnel: monotone counts that match the composed stage filters") {
    val docs = graft.core.Tables.documents(spark, sf)
    val r = Quality.curationFunnel(docs, "doc_id", "text", minQuality = 0.6).collect()(0)
    val (nIn, nG, nQ, nU) = (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
    assert(nIn == docs.count())
    assert(nIn >= nG && nG >= nQ && nQ >= nU, r.toString)
    assert(nU > 0, "funnel should keep something on the fixture")
    // recompute stage 2 + 3 by materializing the stages independently
    val (_, _, _, keep) = TextOps.gopherRules(col("text"), 30L, 10000L, 4.0, 5.0, 2L)
    val s2 = docs.filter(keep).filter(TextOps.qualityScore(col("text")) >= 0.6)
    assert(s2.count() == nQ)
    assert(s2.select(TextOps.fingerprint(col("text"))).distinct().count() == nU)
  }

  test("curationFunnelNovelty: extends fn1 unchanged, novelty stage discriminates and is monotone") {
    val docs = graft.core.Tables.documents(spark, sf)
    val r = Quality.curationFunnelNovelty(docs, "doc_id", "text",
      minQuality = 0.6, n = 3, minNovelty = 0.5).collect()(0)
    val (nIn, nG, nQ, nU, nN) = (r.getLong(0), r.getLong(1), r.getLong(2),
      r.getLong(3), r.getLong(4))
    // the first four counts are fn1's, untouched by the added stage
    val base = Quality.curationFunnel(docs, "doc_id", "text", 0.6).collect()(0)
    assert((nIn, nG, nQ, nU) ==
      ((base.getLong(0), base.getLong(1), base.getLong(2), base.getLong(3))))
    assert(nN <= nU, s"novelty stage must be a filter: $nN > $nU")
    assert(nN > 0, "fixture survivors should include novel docs")
    // at minNovelty = 0 every survivor with grams passes — upper bound check
    val all = Quality.curationFunnelNovelty(docs, "doc_id", "text",
      minQuality = 0.6, n = 3, minNovelty = 0.0).collect()(0).getLong(4)
    assert(nN <= all && all <= nU)
  }

  test("madOutlierGate: clean data passes, planted spikes fire, stddev would have missed them") {
    val clean = (1 to 1000).map(i => ("a", 100.0 + (i % 21))).toDF("k", "v")
    val c = Quality.madOutlierGate(clean, "k", "v", nSigma = 5.0, maxOutlierFrac = 0.02)
      .collect()(0)
    assert(c.getAs[Long]("n_outliers") == 0L && c.getAs[Boolean]("gate_ok"))
    // plant 30 extreme spikes among 1000: fires at 3% > 2%
    val dirty = clean.unionByName(
      (1 to 30).map(_ => ("a", 1e9)).toDF("k", "v"))
    val d = Quality.madOutlierGate(dirty, "k", "v", nSigma = 5.0, maxOutlierFrac = 0.02)
      .collect()(0)
    assert(d.getAs[Long]("n_outliers") == 30L && !d.getAs[Boolean]("gate_ok"), d.toString)
    // the median/MAD are UNMOVED by the spikes (robustness: the breakdown
    // property a mean/stddev gate lacks — 30 spikes at 1e9 would inflate
    // stddev ~5e7, putting every spike within ~1 sigma of the mean)
    assert(d.getAs[Double]("med") == c.getAs[Double]("med"))
    assert(math.abs(d.getAs[Double]("mad") - c.getAs[Double]("mad")) <= 1.0)
  }

  test("curationCube: grand total equals fn1, cells sum to rollups") {
    val docs = graft.core.Tables.documents(spark, sf)
    val cube = Quality.curationCube(docs, "text", "lang", "source", 0.6)
      .as[(String, String, Long, Long, Long, Long, Long)].collect()
    val total = cube.find(r => r._1 == "<all>" && r._2 == "<all>").get
    val f = Quality.curationFunnel(docs, "doc_id", "text", 0.6).collect().head
    assert(total._3 == f.getAs[Long]("n_input"))
    assert(total._5 == f.getAs[Long]("n_gopher"))
    assert(total._6 == f.getAs[Long]("n_quality"))
    assert(total._7 == f.getAs[Long]("n_unique"))
    // additive measures: per-lang rollups sum the (lang, source) cells
    val cells = cube.filter(r => r._1 != "<all>" && r._2 != "<all>")
    cube.filter(r => r._1 != "<all>" && r._2 == "<all>").foreach { roll =>
      val mine = cells.filter(_._1 == roll._1)
      assert(mine.map(_._3).sum == roll._3 && mine.map(_._4).sum == roll._4 &&
        mine.map(_._5).sum == roll._5 && mine.map(_._6).sum == roll._6,
        s"lang ${roll._1} rollup mismatch")
    }
  }

  test("rejectionReasons: verdict counts reconcile with the fn1 funnel exactly") {
    val docs = graft.core.Tables.documents(spark, sf)
    val verdicts = Quality.rejectionReasons(docs, "doc_id", "text", 0.6)
      .groupBy($"verdict").count()
      .as[(String, Long)].collect().toMap.withDefaultValue(0L)
    val f = Quality.curationFunnel(docs, "doc_id", "text", 0.6).collect().head
    val n = f.getAs[Long]("n_input")
    assert(verdicts.values.sum == n, "every doc gets exactly one verdict")
    assert(n - verdicts("gopher") == f.getAs[Long]("n_gopher"))
    assert(n - verdicts("gopher") - verdicts("low_quality") ==
      f.getAs[Long]("n_quality"))
    assert(verdicts("kept") == f.getAs[Long]("n_unique"),
      "kept == distinct quality survivors (one per fingerprint)")
  }

  test("rocAuc: hand-checkable midrank ties, perfect and reversed rankings") {
    // scores 1(neg) 2(pos) 2(neg) 3(pos): pairs = 3 wins + 1 tie of 4
    // -> AUC 3.5/4 = 7/8 in doubled-rank integers
    val df = Seq(("a", false, 1L), ("a", true, 2L), ("a", false, 2L),
      ("a", true, 3L)).toDF("g", "y", "s")
    val r = Quality.rocAuc(df, "g", "y", "s").collect().head
    assert(r.getAs[Long]("pos") == 2 && r.getAs[Long]("neg") == 2)
    assert(r.getDecimal(3).longValueExact == 7 &&
      r.getDecimal(4).longValueExact == 8)
    val perfect = Seq(("a", false, 1L), ("a", false, 2L), ("a", true, 3L),
      ("a", true, 4L)).toDF("g", "y", "s")
    val rp = Quality.rocAuc(perfect, "g", "y", "s").collect().head
    assert(rp.getDecimal(3).longValueExact == rp.getDecimal(4).longValueExact,
      "perfect separation: AUC = 1")
    val reversed = Seq(("a", true, 1L), ("a", true, 2L), ("a", false, 3L),
      ("a", false, 4L)).toDF("g", "y", "s")
    val rr = Quality.rocAuc(reversed, "g", "y", "s").collect().head
    assert(rr.getDecimal(3).longValueExact == 0, "fully reversed: AUC = 0")
  }

  test("rocAuc: equals the naive per-row midrank computation across groups and buckets") {
    import org.apache.spark.sql.expressions.Window
    val rng = new scala.util.Random(7)
    val rows = (0 until 400).map { i =>
      (s"g${i % 3}", rng.nextInt(4) == 0, rng.nextInt(40).toLong)
    }
    val df = rows.toDF("g", "y", "s").repartition(5)
    // buckets = 4 exercises the driver-side base scan over many buckets
    val got = Quality.rocAuc(df, "g", "y", "s", buckets = 4)
      .collect().map(r => r.getString(0) ->
        (r.getAs[Long]("pos"), r.getAs[Long]("neg"),
          r.getDecimal(3).longValueExact, r.getDecimal(4).longValueExact)).toMap
    // naive twin: per-row midranks from a plain window (doubled via
    // rank + reverse-rank), summed over positives
    val w = Window.partitionBy($"g").orderBy($"s")
    val wd = Window.partitionBy($"g").orderBy($"s".desc)
    val naive = df
      .withColumn("r2",
        rank().over(w) + (count(lit(1)).over(Window.partitionBy($"g"))
          - rank().over(wd) + lit(1)))
      .groupBy($"g").agg(
        sum(when($"y", 1L).otherwise(0L)).as("p"),
        sum(when($"y", 0L).otherwise(1L)).as("n"),
        sum(when($"y", $"r2").otherwise(0L)).as("sr2"))
      .collect().map(r => r.getString(0) -> (
        r.getAs[Long]("p"), r.getAs[Long]("n"),
        r.getAs[Long]("sr2") - r.getAs[Long]("p") * (r.getAs[Long]("p") + 1),
        2 * r.getAs[Long]("p") * r.getAs[Long]("n"))).toMap
    assert(got == naive)
  }

  test("calibrationBins: hand-checkable edges, sparse bins absent, totals reconcile") {
    // lo = 0, hi = 9, nBins = 4 -> width 3: bins {0-2, 3-5, 6-8, 9}
    val df = (0L to 9L).map(s => ("a", s >= 5L, s)).toDF("g", "y", "s")
    val out = Quality.calibrationBins(df, "g", "y", "s", nBins = 4)
      .select($"bin", $"bin_lo_fp", $"n", $"n_pos")
      .as[(Long, Long, Long, Long)].collect().sortBy(_._1)
    assert(out.toSeq == Seq((0L, 0L, 3L, 0L), (1L, 3L, 3L, 1L),
      (2L, 6L, 3L, 3L), (3L, 9L, 1L, 1L)))
    assert(out.map(_._3).sum == 10 && out.map(_._4).sum == 5)
    // sparse score range: untouched bins emit nothing
    val sparse = Seq(("a", true, 0L), ("a", false, 9L)).toDF("g", "y", "s")
    val sb = Quality.calibrationBins(sparse, "g", "y", "s", nBins = 4)
      .select($"bin").as[Long].collect().toSet
    assert(sb == Set(0L, 3L))
    assert(Quality.calibrationBins(df.limit(0), "g", "y", "s", 4)
      .collect().isEmpty)
  }

  test("confusionCounts: quadrants partition each group; reconciles with rocAuc pos/neg") {
    val df = Seq(("a", true, 5L), ("a", true, -2L), ("a", false, 1L),
      ("a", false, 0L), ("b", true, 3L)).toDF("g", "y", "s")
    // an unscored row predicts negative — it must land in a quadrant, not
    // silently vanish from all four
    val withNull = Seq(("c", Some(true), None: Option[Long]),
      ("c", Some(false), Some(2L))).toDF("g", "y", "s")
    val cn = Quality.confusionCounts(withNull, "g", "y", "s").collect().head
    assert((cn.getLong(1), cn.getLong(2), cn.getLong(3), cn.getLong(4))
      == ((0L, 1L, 1L, 0L)), "null score -> fn quadrant")
    val out = Quality.confusionCounts(df, "g", "y", "s")
      .as[(String, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> (r._2, r._3, r._4, r._5)).toMap
    // score 0 is NOT positive (log-odds flips strictly above 0)
    assert(out("a") == (1L, 1L, 1L, 1L) && out("b") == (1L, 0L, 0L, 0L))
    val auc = Quality.rocAuc(df, "g", "y", "s").collect()
      .map(r => r.getString(0) -> (r.getAs[Long]("pos"), r.getAs[Long]("neg")))
      .toMap
    out.foreach { case (g, (tp, fp, fn, tn)) =>
      assert((tp + fn, fp + tn) == auc(g), s"group $g")
    }
  }

  test("rocAuc: one-sided group reports den = 0; empty input yields no rows") {
    val df = Seq(("a", true, 5L), ("a", true, 9L)).toDF("g", "y", "s")
    val r = Quality.rocAuc(df, "g", "y", "s").collect().head
    assert(r.getAs[Long]("neg") == 0 && r.getDecimal(4).longValueExact == 0)
    val empty = Quality.rocAuc(df.limit(0), "g", "y", "s")
    assert(empty.collect().isEmpty)
  }

  test("rocAuc/calibrationBins: all-null scores fail loud; truly empty stays empty") {
    // min() skips nulls, so a null min is ambiguous — an input WITH rows
    // whose scores are all null is a scoring bug and must hit the same
    // fail-loud contract as a partial-null input, never return empty
    val allNull = Seq(("a", true, None: Option[Long]),
      ("a", false, None: Option[Long])).toDF("g", "y", "s")
    val e1 = intercept[IllegalArgumentException] {
      Quality.rocAuc(allNull, "g", "y", "s").collect()
    }
    assert(e1.getMessage.contains("NULL"))
    val e2 = intercept[IllegalArgumentException] {
      Quality.calibrationBins(allNull, "g", "y", "s", 4).collect()
    }
    assert(e2.getMessage.contains("NULL"))
    // PARTIAL nulls fail loud too (not a silent NULL-bin row): the error
    // raises at execution, inside Spark's wrapper
    val partial = Seq(("a", true, Some(5L)), ("a", false, None))
      .toDF("g", "y", "s")
    val e3 = intercept[Exception] {
      Quality.calibrationBins(partial, "g", "y", "s", 4).collect()
    }
    assert((e3.getMessage + Option(e3.getCause).map(_.getMessage).getOrElse(""))
      .contains("NULL"), e3.toString)
  }

  test("rocAuc: full-Long score range (wide offsets) stays exact") {
    // lo = Long.MinValue, hi = Long.MaxValue: the per-row BIGINT offset
    // s − lo wraps (MaxValue − MinValue > Long.MaxValue) — the DECIMAL
    // wide path must keep every bucket nonnegative and the prefix intact
    val df = Seq(
      ("a", false, Long.MinValue), ("a", true, -10L), ("a", false, 3L),
      ("a", true, Long.MaxValue), ("a", false, Long.MaxValue - 1),
      ("b", true, Long.MinValue + 1), ("b", false, Long.MaxValue)
    ).toDF("g", "y", "s")
    val got = Quality.rocAuc(df, "g", "y", "s", buckets = 4).collect()
      .map(r => r.getString(0) -> (r.getAs[Long]("pos"), r.getAs[Long]("neg"),
        r.getDecimal(3).longValueExact, r.getDecimal(4).longValueExact)).toMap
    // group a: pos {-10, MaxValue} vs neg {MinValue, 3, MaxValue-1}:
    // 4 wins of 6 pairs, no ties -> num 8 / den 12
    assert(got("a") == ((2L, 3L, 8L, 12L)), got("a").toString)
    assert(got("b") == ((1L, 1L, 0L, 2L)), got("b").toString)
  }

  test("calibrationBins: full-Long score range bins nonnegative and reconciled") {
    val df = Seq(("a", false, Long.MinValue), ("a", true, -1L),
      ("a", true, Long.MaxValue)).toDF("g", "y", "s")
    val out = Quality.calibrationBins(df, "g", "y", "s", nBins = 4)
      .select($"bin", $"bin_lo_fp", $"n", $"n_pos")
      .as[(Long, Long, Long, Long)].collect().sortBy(_._1)
    // width = (2^64-1)/4+1 = 2^62: MinValue -> bin 0, -1 -> bin 1,
    // MaxValue -> bin 3 (a wrapped offset would land negative)
    assert(out.map(_._1).toSeq == Seq(0L, 1L, 3L), out.mkString(","))
    assert(out.map(_._3).sum == 3 && out.map(_._4).sum == 2)
    assert(out.head._2 == Long.MinValue)
    // bin 3 lower edge = MinValue + 3*2^62 = 2^62: the PRODUCT exceeds
    // Long range even though the edge itself fits
    assert(out.last._2 == 4611686018427387904L)
  }

  test("dsirWeights: exact hand-computed log ratio; zero-feature doc reports 0") {
    import graft.plans.LnFp
    val target = Seq((10L, "x x")).toDF("doc_id", "text")
    val raw = Seq((1L, "x x"), (2L, "y y"), (3L, "")).toDF("doc_id", "text")
    val got = Quality.dsirWeights(raw, target, "doc_id", "text", 256)
      .as[(Long, Long, Long)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    // replay the definition exactly: features = unigrams + bigrams,
    // buckets via the same 48-bit hash, every ln the LnFp kernel
    val b = Seq("x", "y", "x x", "y y").toDF("f")
      .select($"f", (graft.operators.Dedup.hash48($"f") % 256).as("b"))
      .as[(String, Long)].collect().toMap
    val tFeats = Seq("x", "x", "x x").map(b)
    val rFeats = Seq("x", "x", "x x", "y", "y", "y y").map(b)
    val ct = tFeats.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val cr = rFeats.groupBy(identity).view.mapValues(_.size.toLong).toMap
    def w(bk: Long): Long =
      LnFp.lnMicro(ct.getOrElse(bk, 0L) + 1, tFeats.size + 256L) -
        LnFp.lnMicro(cr.getOrElse(bk, 0L) + 1, rFeats.size + 256L)
    val exp1 = 2 * w(b("x")) + w(b("x x"))
    val exp2 = 2 * w(b("y")) + w(b("y y"))
    assert(got(1L) == ((3L, exp1)), s"${got(1L)} vs (3, $exp1)")
    assert(got(2L) == ((3L, exp2)), s"${got(2L)} vs (3, $exp2)")
    assert(got(3L) == ((0L, 0L)), "empty doc: zero features, zero weight")
    assert(exp1 > exp2, "target-like doc must outscore the non-target doc")
  }

  test("dsirSelect: exact quantile threshold keeps the top quarter, ties kept") {
    val wts = Seq((1L, 1L, 10L), (2L, 1L, 20L), (3L, 1L, 20L), (4L, 1L, 30L))
      .toDF("sid", "n_feats", "dsir_fp")
    // n=4, ascending rank ceil(3*4/4)=3 -> threshold value 20; ties kept
    val kept = Quality.dsirSelect(wts, 3, 4)
      .filter($"kept").select($"sid").as[Long].collect().toSet
    assert(kept == Set(2L, 3L, 4L), kept.toString)
    assert(Quality.dsirSelect(wts.limit(0), 3, 4).collect().isEmpty)
  }

  test("kAnonymityAudit: hand-checkable classes, null QI is a class, null sensitive ignored") {
    val rows = Seq(
      // class (a, 1): 3 rows, 2 distinct users -> small (k=5), diverse-ish
      ("a", Some(1L), Some(100L)), ("a", Some(1L), Some(100L)),
      ("a", Some(1L), Some(200L)),
      // class (a, null): 5 rows, 1 distinct user -> k-ok, low diversity
      ("a", None, Some(7L)), ("a", None, Some(7L)), ("a", None, Some(7L)),
      ("a", None, Some(7L)), ("a", None, Some(7L)),
      // class (b, 2): 1 row, sensitive NULL -> l_div 0
      ("b", Some(2L), None)
    ).toDF("et", "vb", "uid")
    val s = Quality.kAnonymityAudit(rows, Seq("et", "vb"), "uid", 5, 2)
      .collect().head
    assert(s.getAs[Long]("n_rows") == 9 && s.getAs[Long]("n_classes") == 3)
    assert(s.getAs[Long]("min_class_size") == 1)
    assert(s.getAs[Long]("n_small_classes") == 2 &&
      s.getAs[Long]("rows_at_risk") == 4)
    assert(s.getAs[Long]("min_l_diversity") == 0 &&
      s.getAs[Long]("n_low_diversity") == 2)
    assert(!s.getAs[Boolean]("k_anonymous") && !s.getAs[Boolean]("l_diverse"))
    val v = Quality.kAnonymityViolations(rows, Seq("et", "vb"), "uid", 5, 2)
      .select($"et", $"vb", $"n", $"l_div")
      .as[(String, Option[Long], Long, Long)].collect().toSet
    assert(v == Set(("a", Some(1L), 3L, 2L), ("a", None, 5L, 1L),
      ("b", Some(2L), 1L, 0L)), v.toString)
    // a compliant table passes both gates
    val ok = (1 to 10).flatMap(u => Seq(("a", 1L, u.toLong))).toDF("et", "vb", "uid")
    val so = Quality.kAnonymityAudit(ok, Seq("et", "vb"), "uid", 5, 2).collect().head
    assert(so.getAs[Boolean]("k_anonymous") && so.getAs[Boolean]("l_diverse"))
    // empty input is vacuously compliant — the gate booleans must be
    // DEFINED (true), never NULL, for a release gate to read
    val se = Quality.kAnonymityAudit(rows.limit(0), Seq("et", "vb"), "uid",
      5, 2).collect().head
    assert(se.getAs[Long]("n_rows") == 0 && se.getAs[Long]("n_classes") == 0)
    assert(se.getAs[Boolean]("k_anonymous") && se.getAs[Boolean]("l_diverse"))
  }

  test("referentialIntegrity: orphans, null keys and clean edges by hand") {
    val child = Seq(Some(1L), Some(1L), Some(2L), Some(9L), None)
      .toDF("fk")
    val parent = Seq(1L, 2L, 3L).toDF("pk")
    val out = Quality.referentialIntegrity(Seq(
        ("edge", child, "fk", parent, "pk"),
        ("self", parent, "pk", parent, "pk")))
      .orderBy("relationship").collect()
    // edge: 5 children, 1 null key, 1 orphan (9); self joins clean
    assert(out(0).getAs[String]("relationship") == "edge")
    assert(out(0).getAs[Long]("n_child") == 5L)
    assert(out(0).getAs[Long]("n_null_keys") == 1L)
    assert(out(0).getAs[Long]("n_orphans") == 1L)
    assert(out(1).getAs[Long]("n_orphans") == 0L)
    assert(out(1).getAs[Long]("n_null_keys") == 0L)
  }

  test("spearmanByGroup: exact rho on hand-checkable permutations") {
    // g1: y = x (perfect agreement, rho 1); g2: y reversed (rho -1);
    // g3: y-ranks (1,3,2,5,4) vs x-ranks (1,2,3,4,5): d^2 = (0,1,1,1,1)
    //     -> sum 4, rho = 1 - 24/120 = 0.8
    val rows =
      (1L to 5L).map(i => ("g1", i, i * 10L, i * 10L)) ++
      (1L to 5L).map(i => ("g2", i, i * 10L, 100L - i * 10L)) ++
      Seq(("g3", 1L, 10L, 10L), ("g3", 2L, 20L, 30L), ("g3", 3L, 30L, 20L),
        ("g3", 4L, 40L, 60L), ("g3", 5L, 50L, 50L))
    val df = rows.toDF("g", "id", "x", "y")
    val out = Quality.spearmanByGroup(df, "g", "x", "y", "id")
      .orderBy("g").collect()
    assert(out.map(_.getAs[Double]("rho")).toSeq == Seq(1.0, -1.0, 0.8))
    assert(out.map(_.getAs[Double]("sum_d2")).toSeq == Seq(0.0, 40.0, 4.0))
  }

  test("spearmanByGroup: bucketed ranks equal a plain per-group window rank") {
    import org.apache.spark.sql.expressions.Window
    // per-doc-unique values, several groups, FORCED tiny buckets so the
    // base+row_number path crosses many bucket boundaries
    val df = graft.core.Tables.documents(spark, sf)
      .select(col("lang").as("g"), col("doc_id").as("id"),
        col("n_chars").as("x"),
        size(split(col("text"), " ")).cast("long").as("y"))
    val got = Quality.spearmanByGroup(df, "g", "x", "y", "id", buckets = 3)
      .orderBy("g").collect()
    val wx = Window.partitionBy(col("g")).orderBy(col("x"), col("id"))
    val wy = Window.partitionBy(col("g")).orderBy(col("y"), col("id"))
    val want = df
      .withColumn("d", row_number().over(wx).cast("long") -
        row_number().over(wy).cast("long"))
      .groupBy("g").agg(count(lit(1)).as("n"),
        sum(col("d") * col("d")).cast("double").as("sum_d2"))
      .orderBy("g").collect()
    got.zip(want).foreach { case (g, w) =>
      assert(g.getAs[String]("g") == w.getAs[String]("g"))
      assert(g.getAs[Long]("n") == w.getAs[Long]("n"))
      assert(g.getAs[Double]("sum_d2") == w.getAs[Double]("sum_d2"),
        s"group ${g.get(0)}")
    }
  }

  test("spearmanByGroup: singleton group rho NULL, null value fails loud, empty stays empty") {
    val single = Seq(("g", 1L, 5L, 7L)).toDF("g", "id", "x", "y")
    val out = Quality.spearmanByGroup(single, "g", "x", "y", "id").collect()
    assert(out.length == 1 && out.head.isNullAt(out.head.fieldIndex("rho")))
    assert(out.head.getAs[Double]("sum_d2") == 0.0)
    val withNull = Seq(("g", 1L, Some(5L), Some(7L)),
      ("g", 2L, None, Some(8L))).toDF("g", "id", "x", "y")
    val e = intercept[Exception] {
      Quality.spearmanByGroup(withNull, "g", "x", "y", "id").collect()
    }
    assert(e.getMessage != null)
    val empty = Quality.spearmanByGroup(single.limit(0), "g", "x", "y", "id")
    assert(empty.count() == 0)
  }

  test("averagePrecisionByGroup: hand-exact terms; no-positive group reports NULL") {
    // g ranked (score desc): pos, neg, pos, pos, neg ->
    // terms 10^6·(1/1, 2/3, 3/4) floored; ap = mean of the three
    val df = Seq(
      ("g", 1L, 50L, true), ("g", 2L, 40L, false), ("g", 3L, 30L, true),
      ("g", 4L, 20L, true), ("g", 5L, 10L, false),
      ("h", 6L, 5L, false), ("h", 7L, 4L, false)
    ).toDF("lang", "id", "score", "y")
    val out = Quality.averagePrecisionByGroup(df, "lang", "y", "score", "id")
      .orderBy("lang").collect()
    assert(out(0).getAs[Long]("n") == 5 && out(0).getAs[Long]("n_pos") == 3)
    assert(out(0).getAs[Long]("ap_fp") == (1000000L + 666666L + 750000L) / 3)
    assert(out(1).getAs[Long]("n_pos") == 0)
    assert(out(1).isNullAt(out(1).fieldIndex("ap_fp")))
  }

  test("averagePrecisionByGroup: bucketed bases equal a plain-window twin") {
    import org.apache.spark.sql.expressions.Window
    val df = graft.core.Tables.documents(spark, sf).select(col("lang"),
      col("doc_id"), col("n_chars").as("score"),
      (col("doc_id") % 3 === 0).as("y"))
    val got = Quality.averagePrecisionByGroup(df, "lang", "y", "score",
      "doc_id", buckets = 3).orderBy("lang").collect()
    val w = Window.partitionBy(col("lang"))
      .orderBy(col("score").desc, col("doc_id"))
    val want = df.withColumn("k", row_number().over(w))
      .withColumn("cp", sum(when(col("y"), 1L).otherwise(0L))
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy("lang").agg(count(lit(1)).as("n"),
        sum(when(col("y"), 1L).otherwise(0L)).as("n_pos"),
        sum(when(col("y"),
          expr("CAST((1000000 * cp) DIV k AS BIGINT)"))).as("aps"))
      .select(col("lang"), col("n"), col("n_pos"),
        when(col("n_pos") > 0L,
          expr("CAST(aps DIV n_pos AS BIGINT)")).as("ap_fp"))
      .orderBy("lang").collect()
    got.zip(want).foreach { case (g0, w0) =>
      assert(g0.toSeq == w0.toSeq, s"${g0.toSeq} vs ${w0.toSeq}")
    }
  }

  test("wilsonLower: confident 90/100 outranks perfect 2/2; bounds sane; n=0 NULL") {
    val df = Seq((1L, 2L, 2L), (2L, 100L, 90L), (3L, 100L, 0L), (4L, 0L, 0L))
      .toDF("id", "n", "c")
      .select(col("id"), col("n"), col("c"),
        Quality.wilsonLower(col("n"), col("c")).as("lb"))
    val out = df.collect().map(r => r.getAs[Long]("id") ->
      Option(r.get(r.fieldIndex("lb"))).map(_.asInstanceOf[Double])).toMap
    assert(out(2L).get > out(1L).get) // the whole point of the statistic
    assert(out(1L).get > 0.0 && out(1L).get < 1.0)
    assert(out(3L).get >= 0.0 && out(3L).get < 0.05)
    assert(out(4L).isEmpty)
    // by hand: p=.9, n=100 -> center .919208/1.038416, spread
    // 1.96·sqrt(.000996)/1.038416 -> lb ≈ 0.82563
    assert(math.abs(out(2L).get - 0.82563) < 0.0001, out(2L).toString)
  }

  test("uniqueKeys: dup keys and extra rows by hand; NULL keys are ordinary values") {
    val df = Seq(Some(1L), Some(1L), Some(1L), Some(2L), None, None)
      .toDF("k")
    val clean = Seq(10L, 11L).toDF("k")
    val out = Quality.uniqueKeys(Seq(
        ("dirty", df, Seq("k")), ("clean", clean, Seq("k"))))
      .orderBy("rule").collect()
    val dirty = out(1)
    assert(dirty.getAs[Long]("n_rows") == 6 && dirty.getAs[Long]("n_keys") == 3)
    assert(dirty.getAs[Long]("n_dup_keys") == 2)   // key 1 and the NULL key
    assert(dirty.getAs[Long]("n_extra_rows") == 3) // two extra 1s + one extra NULL
    assert(out(0).getAs[Long]("n_dup_keys") == 0)
  }

  test("regressionMetrics: hand MAE/RMSE/R2; constant group R2 NULL; null fails loud") {
    // g: y = (1, 3), yhat = (2, 2): ae = (1,1) -> mae 1; se = (1,1) ->
    // rmse 1; ybar = 2, sst = (1+1) = 2, r2 = 1 - 2/2 = 0
    // c: constant y -> sst 0 -> r2 NULL
    val df = Seq(("g", 1.0, 2.0), ("g", 3.0, 2.0),
      ("c", 5.0, 4.0), ("c", 5.0, 6.0)).toDF("g", "y", "p")
    val out = Quality.regressionMetrics(df, "g", "y", "p")
      .orderBy("g").collect()
    val c = out(0); val g = out(1)
    assert(g.getAs[Double]("mae") == 1.0 && g.getAs[Double]("rmse") == 1.0)
    assert(g.getAs[Double]("r2") == 0.0)
    assert(c.getAs[Double]("mae") == 1.0 && c.isNullAt(c.fieldIndex("r2")))
    val bad = Seq(("g", Some(1.0), None: Option[Double])).toDF("g", "y", "p")
    intercept[Exception] {
      Quality.regressionMetrics(bad, "g", "y", "p").collect()
    }
  }

  test("cohensKappa: perfect agreement 1, chance-level 0, degenerate den 0") {
    // group p: perfect predictor (score>0 iff label) -> kappa = 1
    // group c: predictions independent of labels at 50/50 -> kappa = 0
    // group d: all positive predictions AND all positive labels -> den 0
    val rows =
      Seq(("p", true, 5L), ("p", true, 5L), ("p", false, -5L), ("p", false, -5L)) ++
      Seq(("c", true, 5L), ("c", true, -5L), ("c", false, 5L), ("c", false, -5L)) ++
      Seq(("d", true, 5L), ("d", true, 5L))
    val df = rows.toDF("g", "y", "s")
    val out = Quality.cohensKappa(df, "g", "y", "s").collect()
      .map(r => r.getAs[String]("g") ->
        ((r.getAs[Long]("kappa_num"), r.getAs[Long]("kappa_den")))).toMap
    val p = out("p"); assert(p._1 == p._2 && p._2 > 0) // kappa 1
    assert(out("c")._1 == 0L && out("c")._2 > 0)       // kappa 0
    assert(out("d")._2 == 0L)                          // undefined, shipped
  }

  test("passAtK equals the exact binomial identity, short-circuits included") {
    // independent oracle: 1 - C(n-c, k)/C(n, k) in exact BigInt micro-floor
    def choose(n: Long, k: Long): BigInt =
      (0L until k).map(i => BigInt(n - i)).product /
        (1L to k).map(BigInt(_)).product
    def expect(n: Long, c: Long, k: Int): Option[Long] =
      if (n < k) None
      else if (n - c < k) Some(1000000L)
      else Some((BigInt(1000000) -
        choose(n - c, k) * 1000000 / choose(n, k)).toLong)
    // problems: (n, c) shapes incl. all-fail, all-pass, n < k, n - c < k
    val samples = Seq(
      ("p0", 20, 7), ("p1", 20, 0), ("p2", 20, 20), ("p3", 5, 2),
      ("p4", 12, 11), ("p5", 3, 1))
    val rows = samples.flatMap { case (p, n, c) =>
      (0 until n).map(i => (p, i < c)) }
    val out = Quality.passAtK(rows.toDF("problem", "ok"), "problem", "ok",
        Seq(1, 5, 10))
      .orderBy($"problem")
      .as[(String, Long, Long, Option[Long], Option[Long], Option[Long])]
      .collect()
    samples.sortBy(_._1).zip(out).foreach { case ((p, n, c), row) =>
      assert(row._1 == p && row._2 == n && row._3 == c, row.toString)
      assert(row._4 == expect(n, c, 1), s"$p pass@1: ${row._4}")
      assert(row._5 == expect(n, c, 5), s"$p pass@5: ${row._5}")
      assert(row._6 == expect(n, c, 10), s"$p pass@10: ${row._6}")
    }
    // spot values: pass@1 is exactly the micro-floor of c/n
    val p0 = out.find(_._1 == "p0").get
    assert(p0._4 == Some(350000L)) // 7/20
    assert(p0._6.get > p0._5.get && p0._5.get > p0._4.get) // monotone in k
    // all-fail -> 0 at every k; all-pass -> 1e6 at every k
    assert(out.find(_._1 == "p1").get._6 == Some(0L))
    assert(out.find(_._1 == "p2").get._6 == Some(1000000L))
    // n=3 < k=5,10 -> undefined
    val p5 = out.find(_._1 == "p5").get
    assert(p5._5.isEmpty && p5._6.isEmpty && p5._4 == expect(3, 1, 1))
  }

  test("fleissKappa: perfect agreement 1, below-chance negative, ragged n fails loud") {
    def ratings(xs: (Long, String)*) = xs.toDF("item", "category")
    // perfect: every item unanimous
    val perfect = ratings((1 to 5).map(_ => (1L, "a")) ++
      (1 to 5).map(_ => (2L, "b")): _*)
    val p = Quality.fleissKappa(perfect, "item", "category", n = 5)
      .collect().head
    assert(p.getAs[Long]("n_items") == 2L)
    assert(p.getAs[Long]("a_sum") == 40L && p.getAs[Long]("s_sum") == 50L)
    assert(p.getAs[Double]("kappa") == 1.0)
    // anti-correlated 3/2 splits: Pbar = 0.4 < Pe = 0.5 -> kappa = -0.2
    val split = ratings(
      (1L, "a"), (1L, "a"), (1L, "a"), (1L, "b"), (1L, "b"),
      (2L, "b"), (2L, "b"), (2L, "b"), (2L, "a"), (2L, "a"))
    assert(Quality.fleissKappa(split, "item", "category", n = 5)
      .collect().head.getAs[Double]("kappa") == -0.2)
    // an item with 4 ratings: Fleiss is undefined — fail loud, not biased
    val ragged = ratings((1L, "a"), (1L, "a"), (1L, "a"), (1L, "a"),
      (2L, "a"), (2L, "a"), (2L, "a"), (2L, "a"), (2L, "b"))
    val e = intercept[Exception] {
      Quality.fleissKappa(ragged, "item", "category", n = 5).collect()
    }
    assert(e.getMessage.contains("ratings, expected 5"), e.getMessage)
  }

  test("recursiveLDiversity: dominance fails, balanced passes, thin-tail fails by definition") {
    // class A: 9/1/1 — three DISTINCT values (distinct-l passes!) but one
    // value dominates: r1=9, tail=r3=1 -> 1·2 > 9·1 false -> NOT ok
    // class B: 3/3/3 — balanced: r1=3, tail=3 -> 6 > 3 -> ok
    // class C: 5/5 over two values — m < l, empty tail -> NOT ok
    val rows =
      (1 to 9).map(i => ("A", 101L)) ++ Seq(("A", 102L), ("A", 103L)) ++
        (1 to 3).flatMap(_ => Seq(("B", 201L), ("B", 202L), ("B", 203L))) ++
        (1 to 5).flatMap(_ => Seq(("C", 301L), ("C", 302L)))
    val df = rows.toDF("qi", "uid")
    val out = Quality.recursiveLDiversity(df, Seq("qi"), "uid",
        l = 3, cNum = 2L, cDen = 1L)
      .orderBy("qi").collect()
      .map(r => (r.getAs[String]("qi"), r.getAs[Long]("n_rows"),
        r.getAs[Long]("m_values"), r.getAs[Long]("r1"),
        r.getAs[Long]("tail_sum"), r.getAs[Boolean]("recursive_ok")))
    assert(out.toSeq == Seq(
      ("A", 11L, 3L, 9L, 1L, false),
      ("B", 9L, 3L, 3L, 3L, true),
      ("C", 10L, 2L, 5L, 0L, false)))
    // and the contrast that motivates the operator: distinct-l CALLS A fine
    val distinct = Quality.kAnonymityAudit(df.filter($"qi" === "A"),
      Seq("qi"), "uid", k = 2, l = 3).collect().head
    assert(distinct.getAs[Boolean]("l_diverse"),
      "fixture drifted: class A should pass distinct-l while failing (c,l)")
    // NULL sensitive values don't count toward diversity (the dp3 family
    // contract): a homogeneous class padded with NULLs must still fail
    val padded = ((1 to 9).map(_ => ("P", Some(1L))) ++
      (1 to 3).map(_ => ("P", Option.empty[Long]))).toDF("qi", "uid")
    val p = Quality.recursiveLDiversity(padded, Seq("qi"), "uid",
      l = 3, cNum = 2L, cDen = 1L).collect().head
    assert(p.getAs[Long]("n_rows") == 9L, "NULL rows must drop, not group")
    assert(p.getAs[Long]("m_values") == 1L && !p.getAs[Boolean]("recursive_ok"))
  }
}
