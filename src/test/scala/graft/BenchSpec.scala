package graft

import org.scalatest.funsuite.AnyFunSuite

/** The bench regression gates are pure functions — test them directly so an
  * injected regression provably fires without a 60-second bench run.
  */
class BenchSpec extends AnyFunSuite {

  test("forceFrame executes computation that df.count() legally deletes (bench honesty)") {
    // the d37 lesson generalized (VERDICT r18 ask #2): under df.count()
    // Catalyst prunes computed output columns — the bench row then times a
    // no-op. A side-effect-counting UDF (test-only; the engine itself never
    // uses UDFs) makes the deletion OBSERVABLE: plain count() runs it zero
    // times, forceFrame runs it once per row because the frame's own
    // physical plan materializes every output column.
    import org.apache.spark.sql.functions._
    val spark = TestSpark.spark
    val acc = spark.sparkContext.longAccumulator("bench-honesty-probe")
    val probe = udf((x: Long) => { acc.add(1L); x * 2 })
    val df = spark.range(0, 100, 1, 2).select(probe(col("id")).as("doubled"))
    df.count()
    assert(acc.value == 0L,
      "count() was expected to prune the computed column — if this fires, " +
        "Catalyst changed and the audit rationale needs a re-check")
    val n = Bench.forceFrame(df)
    assert(n == 100L)
    assert(acc.value == 100L,
      s"forceFrame must compute every output column once per row, ran ${acc.value}")
  }

  private val baselineLine =
    """{"metric":"total","value":55.3,"unit":"sec",""" +
      """"queries":{"q_fast":0.2,"q_mid":2.0,"q_big":8.0},""" +
      """"sf":"/root/testdata/sf0.1",""" +
      """"shuffle_mb":{"q_fast":0.4,"q_mid":12.0,"q_big":140.5},""" +
      """"spill_mb":{},"regressions":{},"failed":[],"skipped":[]}"""

  test("parseMetricBlock reads queries and shuffle_mb from a raw bench line") {
    assert(Bench.parseMetricBlock(baselineLine, "queries") ==
      Map("q_fast" -> 0.2, "q_mid" -> 2.0, "q_big" -> 8.0))
    assert(Bench.parseMetricBlock(baselineLine, "shuffle_mb") ==
      Map("q_fast" -> 0.4, "q_mid" -> 12.0, "q_big" -> 140.5))
  }

  test("parseMetricBlock reads a SPACE-FORMATTED (json-library) artifact") {
    // the r14 absorber: promotion re-serializes the baseline through a
    // JSON library that space-pads ("queries": {...}); the old whitespace-
    // blind regex returned EMPTY on every promoted baseline, the fallback
    // driver round files were also unparseable, and the time/shuffle gates
    // silently ran priorless for two rounds. This is the committed-file
    // format, verbatim.
    val pretty = """{"metric": "total", "value": 55.3, "unit": "sec", """ +
      """"queries": {"q_fast": 0.2, "q_mid": 2.0}, """ +
      """"calibration_sec": 0.218, "shuffle_mb": {"q_fast": 0.4}}"""
    assert(Bench.parseMetricBlock(pretty, "queries") ==
      Map("q_fast" -> 0.2, "q_mid" -> 2.0))
    assert(Bench.parseMetricBlock(pretty, "shuffle_mb") == Map("q_fast" -> 0.4))
    assert(Bench.parseCalibration(pretty).contains(0.218))
  }

  test("parseMetricBlock reads a driver round file that embeds the line as a JSON string") {
    val wrapped = s"""{"tail": "${baselineLine.replace("\"", "\\\"")}"}"""
    assert(Bench.parseMetricBlock(wrapped, "queries")("q_big") == 8.0)
    assert(Bench.parseMetricBlock(wrapped, "shuffle_mb")("q_big") == 140.5)
  }

  test("time gate fires on an injected slowdown, ignores noise-floor queries") {
    val prior = Bench.parseMetricBlock(baselineLine, "queries")
    val current = Seq("q_fast" -> 0.45, "q_mid" -> 3.5, "q_big" -> 8.1)
    val regs = Bench.regressionsAgainst(current, prior, factor = 1.5, minAbs = 0.5)
    // q_mid 2.0 -> 3.5 = 1.75x fires; q_fast is sub-half-second noise even
    // at 2.25x; q_big within factor
    assert(regs.map(_._1) == Seq("q_mid"))
    assert(math.abs(regs.head._2 - 1.75) < 1e-9)
  }

  test("time delta guard: ratio-only jitter on small queries stays quiet, real jumps flag") {
    // 0.8 -> 1.25 is 1.56x but only +0.45 s — the measured loaded-host
    // spread of a ~1 s query with NO code change; 4.0 -> 6.5 moves both
    // the ratio AND 2.5 s of absolute wall time
    val prior = Map("jitter" -> 0.8, "real" -> 4.0)
    val cur = Seq("jitter" -> 1.25, "real" -> 6.5)
    val regs = Bench.regressionsAgainst(cur, prior, factor = 1.5,
      minAbs = 0.5, minDelta = 0.75)
    assert(regs.map(_._1) == Seq("real"))
    // the guard defaults OFF (shuffle bytes are deterministic — delta 0)
    assert(Bench.regressionsAgainst(cur, prior, 1.5, 0.5)
      .map(_._1) == Seq("jitter", "real"))
  }

  test("shuffle gate fires on injected exchange growth (the cluster-cost signal)") {
    val prior = Bench.parseMetricBlock(baselineLine, "shuffle_mb")
    // a broadcast turned into a shuffle: bytes triple while wall time on
    // local[32] would barely move — exactly what the gate must catch
    val current = Seq("q_fast" -> 0.9, "q_mid" -> 36.0, "q_big" -> 150.0)
    val regs = Bench.regressionsAgainst(current, prior, factor = 1.5, minAbs = 1.0)
    assert(regs.map(_._1) == Seq("q_mid"))
    assert(math.abs(regs.head._2 - 3.0) < 1e-9)
  }

  test("sub-floor blind spot closed: a cheap query gone expensive flags, jitter does not") {
    // round 6 shipped d2 0.28 -> 1.27 s (4.5x) unflagged because BOTH sides
    // had to clear the floor; gating on max(prior, current) catches it
    val prior = Map("q_cheap" -> 0.3, "q_tiny" -> 0.1)
    val regs = Bench.regressionsAgainst(
      Seq("q_cheap" -> 1.2, "q_tiny" -> 0.2), prior, factor = 1.5, minAbs = 0.5)
    assert(regs.map(_._1) == Seq("q_cheap")) // 4x with current >= 0.5 fires
    assert(math.abs(regs.head._2 - 4.0) < 1e-9)
    // 0.1 -> 0.2 s doubling stays under the floor on both sides: noise
    assert(!regs.exists(_._1 == "q_tiny"))
  }

  test("a zero prior never divides, but a real metric growing from 0 still flags") {
    // driver round files round shuffle_mb to 2 decimals, so a prior can be
    // exactly 0.0 — the gate must not emit ratio = Infinity, but it must
    // also not go blind: a broadcast join degrading to a 5 MB shuffle from
    // a zero-shuffle baseline is exactly the regression the gate exists for
    // (ADVICE r7 #1). Ratio is reported as v/minAbs.
    val regs = Bench.regressionsAgainst(
      Seq("q" -> 5.0), Map("q" -> 0.0), factor = 1.5, minAbs = 1.0)
    assert(regs == Seq("q" -> 5.0))
    assert(regs.head._2.isFinite)
    // sub-floor drift from zero stays quiet (0.4 MB is rounding noise)
    assert(Bench.regressionsAgainst(
      Seq("q" -> 0.4), Map("q" -> 0.0), factor = 1.5, minAbs = 1.0).isEmpty)
  }

  test("no baseline entry means no gate (new queries pass until re-baselined)") {
    val regs = Bench.regressionsAgainst(Seq("brand_new" -> 99.0),
      Map.empty[String, Double], factor = 1.5, minAbs = 0.5)
    assert(regs.isEmpty)
  }

  test("parseCalibration reads the probe from raw and driver-embedded artifacts") {
    val raw = """{"metric":"total","value":1.0,"calibration_sec":0.642,"queries":{"a":1.0}}"""
    assert(Bench.parseCalibration(raw).contains(0.642))
    // driver round files embed the line as an escaped JSON string
    val embedded = raw.replace("\"", "\\\"")
    assert(Bench.parseCalibration(s"""{"tail":"$embedded"}""").contains(0.642))
    // a pre-calibration baseline: no probe, gate falls back to unscaled
    assert(Bench.parseCalibration("""{"queries":{"a":1.0}}""").isEmpty)
  }

  test("overhead-aware scaling: short queries keep their fixed-cost allowance") {
    // a 1.37x-faster host (hwScale 0.73): a 1.0 s prior must NOT shrink to
    // 0.73 s — ~0.25 s of it is silicon-independent job overhead
    val scaled = Bench.scalePrior(1.0, 0.73)
    assert(scaled > 0.73 && scaled < 1.0, scaled.toString)
    assert(math.abs(scaled - (0.25 + 0.75 * 0.73)) < 1e-9)
    // observed spurious flag: prior 1.0, measured 1.11 on the faster host —
    // under the overhead model that is < 1.5x and stays quiet
    assert(Bench.regressionsAgainst(Seq("q" -> 1.11),
      Map("q" -> Bench.scalePrior(1.0, 0.73)), 1.5, 0.5).isEmpty)
    // a REAL 2x regression still fires through the model
    assert(Bench.regressionsAgainst(Seq("q" -> 2.0),
      Map("q" -> Bench.scalePrior(1.0, 0.73)), 1.5, 0.5).nonEmpty)
    // long queries still scale ~proportionally (overhead amortized)
    assert(math.abs(Bench.scalePrior(60.0, 0.5) - (0.25 + 59.75 * 0.5)) < 1e-9)
  }

  test("soft scaling gate: flags growth past factor^1.3, respects floor and exemptions") {
    // documents family (10x data): 10^1.3 ~ 20 -> 25x growth flags, 15x not
    assert(Bench.scalingFlags(Seq("t1_x" -> 2.5), Map("t1_x" -> 0.1)).nonEmpty)
    assert(Bench.scalingFlags(Seq("t1_x" -> 1.5), Map("t1_x" -> 0.1)).isEmpty)
    // embeddings family (4x data): 4^1.3 ~ 6 -> 8x flags
    assert(Bench.dataFactor("s16_ladder") == 4.0)
    assert(Bench.scalingFlags(Seq("s16_ladder" -> 0.8), Map("s16_ladder" -> 0.1)).nonEmpty)
    // overhead floor: sub-0.5 s at the larger SF is noise, never a flag
    assert(Bench.scalingFlags(Seq("t1_x" -> 0.4), Map("t1_x" -> 0.01)).isEmpty)
    // documented quadratic baselines stay exempt (they are the oracles)
    assert(Bench.scalingFlags(
      Seq("d5_jaccard_bruteforce" -> 50.0), Map("d5_jaccard_bruteforce" -> 0.5)).isEmpty)
    // sm10 is embeddings-family, but sm1 is not (prefix must not bleed)
    assert(Bench.dataFactor("sm10_embed") == 4.0)
    assert(Bench.dataFactor("sm1_hash_sample") == 10.0)
  }

  test("hardware scaling: a 2x-slower host doubles the allowed prior seconds") {
    // the gate is regressionsAgainst(current, prior * hwScale): the same
    // 2.6x-slower-silicon measurement that is NOT a regression on the slow
    // host must not fire once the prior is scaled
    val prior = Map("q" -> 1.0)
    val current = Seq("q" -> 2.6)
    assert(Bench.regressionsAgainst(current, prior, 1.5, 0.5).nonEmpty)
    val scaled = prior.map { case (k, v) => k -> v * 2.6 } // calibration ratio
    assert(Bench.regressionsAgainst(current, scaled, 1.5, 0.5).isEmpty)
  }

  test("constant +1 s jump on a sub-second query fires even with a degraded probe") {
    // the r14 d2 lesson: prior 0.30 s, measured 1.30 s — a flat ICU-init
    // constant, not data-dependent work. The gate must fire even when the
    // calibration probe reads badly degraded: the trust bound caps the
    // ratio at 3x, and at the cap the scaled prior is 0.25 + 0.05*3 = 0.40,
    // so 1.30 clears both the 1.5x factor and the 3x escape hatch.
    val hw = Bench.clampHwScale(5.0)
    assert(hw == 3.0)
    val scaled = Map("d2" -> Bench.scalePrior(0.30, hw))
    val regs = Bench.regressionsAgainst(Seq("d2" -> 1.30), scaled,
      factor = 1.5, minAbs = 0.5, minDelta = 0.75)
    assert(regs.map(_._1) == Seq("d2"), regs.toString)
    // without the cap, a 21x probe reading would scale the prior to 1.30
    // and absolve the jump entirely — exactly the absorber the cap closes
    assert(Bench.regressionsAgainst(Seq("d2" -> 1.30),
      Map("d2" -> Bench.scalePrior(0.30, 21.0)), 1.5, 0.5, 0.75).isEmpty)
  }

  test("hwScale trust bound clamps both directions, passes the sane range through") {
    assert(Bench.clampHwScale(0.1) == 1.0 / 3.0)
    assert(Bench.clampHwScale(10.0) == 3.0)
    // observed real host spread (1.4-2.7x) passes through untouched
    assert(Bench.clampHwScale(0.85) == 0.85)
    assert(Bench.clampHwScale(2.7) == 2.7)
  }

  test("calibration evidence band is two-sided: start probe 2x the retry probe marks flags suspect") {
    // the r16 close: start-of-run probe 0.68 s, retry probe 0.34 s —
    // retry_calibration 0.51, i.e. the FIRST calibration was 2x the retry
    // calibration (a start-of-run burst). The old `> 1.3`-only rule let
    // five flags ship unqualified; the band must catch BOTH directions.
    assert(!Bench.calibrationComparable(0.51))
    assert(!Bench.calibrationComparable(1.54))
    assert(Bench.calibrationComparable(1.0))
    assert(Bench.calibrationComparable(0.8))
    assert(Bench.calibrationComparable(1.29))
    val flags = Seq("t7" -> 2.78, "sp1" -> 1.54)
    // non-comparable probes (either direction) -> the artifact carries the
    // flags under regressions_suspect, and firm regressions stay empty
    val (firmLow, suspectLow) = Bench.splitByCalibrationEvidence(flags, Some(0.51))
    assert(firmLow.isEmpty && suspectLow == flags)
    val (firmHigh, suspectHigh) = Bench.splitByCalibrationEvidence(flags, Some(1.54))
    assert(firmHigh.isEmpty && suspectHigh == flags)
    // comparable probes -> flags are firm
    val (firm, suspect) = Bench.splitByCalibrationEvidence(flags, Some(1.05))
    assert(firm == flags && suspect.isEmpty)
    // no retry probe ever ran (no suspects arose) -> flags pass through firm
    val (firmNone, suspectNone) = Bench.splitByCalibrationEvidence(flags, None)
    assert(firmNone == flags && suspectNone.isEmpty)
  }

  test("faster-host over-correction: scaled-only flags ship annotated, raw-confirmed stay firm") {
    // the hw_scale 0.69 adjudication run: shuffle-bound heavies flagged at
    // ~1.5x against DOWN-scaled allowances while their raw ratios sat at
    // ~1.1 — probe over-correction, not a slowdown
    val flags = Seq("d9" -> 1.67, "lm8" -> 1.61, "real" -> 2.2)
    val rawFlagged = Set("real") // only this one also crossed the raw gate
    val (firm, hwscaled) = Bench.splitByRawEvidence(flags, rawFlagged, 0.69)
    assert(firm == Seq("real" -> 2.2))
    assert(hwscaled.map(_._1) == Seq("d9", "lm8"))
    // slower host: allowances only grow, split is a no-op even when the
    // raw set disagrees
    val (firmSlow, hwSlow) = Bench.splitByRawEvidence(flags, Set.empty, 1.4)
    assert(firmSlow == flags && hwSlow.isEmpty)
  }

  test("raw-evidence factor catches real slowdowns a fast host would absorb (ADVICE r17 #3)") {
    // a real code regression measured on a faster host shows a raw ratio of
    // only hwScale x R: under the old full-1.5 raw factor, a hwScale-0.69
    // host demoted every real slowdown up to 2.17x; at 1.15 the firm
    // threshold drops to 1.67x. Concretely: 6.0 s -> 7.2 s (1.2x raw, a
    // 1.74x real slowdown at hwScale 0.69) must now keep firm standing,
    // while the live over-correction cases (raw <= 1.15x) still demote.
    assert(Bench.RawEvidenceFactor <= 1.2 && Bench.RawEvidenceFactor >= 1.1)
    val raw = Bench.regressionsAgainst(
      Seq("slowed" -> 7.2, "overcorrected" -> 6.6),
      Map("slowed" -> 6.0, "overcorrected" -> 6.0), Bench.RawEvidenceFactor, 0.5)
    assert(raw.map(_._1) == Seq("slowed"), raw.toString)
  }

  test("time gate: ratio escape hatch fires past 3x even under minDelta") {
    // 0.3 s -> 1.0 s is 3.3x but delta 0.7 < 0.75 — must still flag
    // (the minDelta guard otherwise makes fast queries unflaggable forever)
    val regs = Bench.regressionsAgainst(Seq("q" -> 1.0),
      Map("q" -> 0.3), 1.5, 0.25, minDelta = 0.75)
    assert(regs.map(_._1) == Seq("q"), regs.toString)
    // 1.0 -> 1.6 s: 1.6x, delta 0.6 < 0.75, ratio < 3x -> still quiet
    assert(Bench.regressionsAgainst(Seq("q" -> 1.6),
      Map("q" -> 1.0), 1.5, 0.25, minDelta = 0.75).isEmpty)
  }
}
