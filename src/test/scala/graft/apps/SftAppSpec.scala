package graft.apps

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Controlled-input checks of the sft_app composition (the oracle row runs
  * the full fixture; this pins the stage semantics on inputs where every
  * expected count is hand-derivable).
  */
class SftAppSpec extends SparkSpec {
  import spark.implicits._

  test("dedup keeps one pair per (prompt-cluster, response); decontamination drops benchmark overlap; packs partition the survivors") {
    val p = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val pairs = Seq(
      // pairs 1-3: near-identical prompts (shared shingles), two distinct
      // responses -> keep 1 (first of resp A) and 3 (first of resp B)
      (1L, s"please $p", "resp A"),
      (2L, s"kindly $p", "resp A"),
      (3L, s"please $p", "resp B"),
      // pair 4: unique prompt, survives dedup but shares a 3-gram with the
      // benchmark -> dropped by decontamination
      (4L, "mu nu xi omicron pi rho sigma tau", "resp C"),
      // pair 5: unique prompt, no benchmark overlap -> survives everything
      (5L, "one two three four five six seven eight", "resp D")
    ).toDF("pair_id", "prompt", "response")
    val benchmark = Seq((100L, "omicron pi rho held-out eval question"))
      .toDF("id", "text")
    val (manifest, stats) = SftApp.curatePairs(spark, pairs, benchmark,
      packSize = 16L)
    assert(stats == SftApp.Stats(pairs = 5, afterDedup = 4,
      afterDecontam = 3, packs = 3))
    val rows = manifest.orderBy("pack_id")
      .select(col("pack_id"), col("n_pairs"), col("n_tokens"))
      .as[(Long, Long, Long)].collect().toSeq
    // survivors in pair_id order: 1 (11w prompt + 2w resp + 4 = 17),
    // 3 (17), 5 (8 + 2 + 4 = 14) -> offsets 0, 17, 34 -> packs 0, 1, 2
    assert(rows == Seq((0L, 1L, 17L), (1L, 1L, 17L), (2L, 1L, 14L)))
  }
}
