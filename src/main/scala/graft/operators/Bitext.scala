package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Bitext / parallel-corpus mining — the margin-based cross-lingual
  * alignment of Artetxe & Schwenk 2019 ("Margin-based Parallel Corpus
  * Mining with Multilingual Sentence Embeddings", ACL; the LASER/CCMatrix
  * shape): a source-language sentence x and target-language sentence y are
  * a translation-pair candidate not when cos(x, y) is high in absolute
  * terms, but when it is high RELATIVE to the neighborhoods of both —
  *
  *   margin(x, y) = cos(x, y) / ((avgNNk_fwd(x) + avgNNk_bwd(y)) / 2)
  *
  * (the paper's "ratio" margin) — which cancels the hubness that makes raw
  * cosine thresholds useless across languages.
  *
  * Exactness discipline: per-pair cosine rides the house quantized-integer
  * kernel (Similarity.cosineQ — bit-identical to the DuckDB oracle) and is
  * then rounded to integer MICRO-units, so the neighborhood means are exact
  * integer sums under any accumulation order (the lnMicro discipline). The
  * margin itself is ONE double division of two exact integers
  * (2·c·fn·bn / (fsum·bn + bsum·fn) — the avg-of-avgs cross-multiplied),
  * single-rounded identically by both engines, absorbed with round(·, 6).
  * Integer bound: |num| ≤ 2·10^6·k², |den| ≤ 2·10^6·k² — exact in a long
  * (and in a double) up to k ~ 10^6 neighbors, far past any sane k.
  *
  * Scale posture: the operator NEVER does all-pairs work — it scores only
  * the shortlists it is handed. At scale the shortlists come from the
  * persisted IVF-PQ index (AnnIndex.writeIvfPq + searchIvfPq, both
  * directions), so candidate generation is index-served: per query one
  * ADC-ranked probe of nProbe cells, and only (qid, nid) id-pairs ride the
  * joins back to full vectors (k rows per query, independent of corpus
  * size). The two stats aggregates are map-side combinable on 8-byte keys.
  */
object Bitext {

  /** Mine the best target pair per source sentence by the ratio margin.
    *
    * @param src  source-language vectors (idCol, vecCol)
    * @param tgt  target-language vectors (idCol, vecCol)
    * @param fwd  (qid, nid) forward shortlist: per source id qid, its
    *             k-NN candidate target ids nid (index-served at scale)
    * @param bwd  (qid, nid) backward shortlist: per target id qid, its
    *             k-NN candidate source ids nid
    * @return one row per source id with a scoreable candidate:
    *         (src_id, tgt_id, cos_micro, margin) — tgt_id the margin-best
    *         target (ties by tgt_id asc), cos_micro the exact integer
    *         micro-cosine, margin round(·, 6). Zero-norm vectors (cosine
    *         undefined) drop from both the candidates and the
    *         neighborhood means — the Similarity family's NULL contract.
    */
  def minePairs(src: DataFrame, tgt: DataFrame, idCol: String, vecCol: String,
                fwd: DataFrame, bwd: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val sP = Similarity.prepared(src, idCol, vecCol)
      .select(col("sid").as("src_id"), col("qv").as("sqv"))
    val tP = Similarity.prepared(tgt, idCol, vecCol)
      .select(col("sid").as("tgt_id"), col("qv").as("tqv"))
    // exact integer micro-cosine of a shortlist pair, via the ONE house
    // cosine kernel (Similarity.cosineQ — ADVICE r17 #4: a second inline
    // formula could silently diverge from the oracle if the kernel's guard
    // or rounding ever changed); NULL (zero-norm) rows drop so they poison
    // neither the candidate set nor a neighborhood mean
    def microScored(pairs: DataFrame): DataFrame =
      pairs.join(sP, Seq("src_id")).join(tP, Seq("tgt_id"))
        .select(col("src_id"), col("tgt_id"),
          round(Similarity.cosineQ(col("sqv"), col("tqv")) * lit(1000000L), 0)
            .cast("long").as("cmicro"))
        .filter(col("cmicro").isNotNull)
    val fwdScored = microScored(
      fwd.select(col("qid").as("src_id"), col("nid").as("tgt_id")))
    val bwdScored = microScored(
      bwd.select(col("nid").as("src_id"), col("qid").as("tgt_id")))
    val fwdStat = fwdScored.groupBy(col("src_id"))
      .agg(sum(col("cmicro")).as("fsum"), count(lit(1)).as("fn"))
    val bwdStat = bwdScored.groupBy(col("tgt_id"))
      .agg(sum(col("cmicro")).as("bsum"), count(lit(1)).as("bn"))
    val w = Window.partitionBy(col("src_id"))
      .orderBy(col("margin").desc_nulls_last, col("tgt_id").asc)
    fwdScored
      .join(fwdStat, Seq("src_id")).join(bwdStat, Seq("tgt_id"))
      .withColumn("margin",
        round((lit(2L) * col("cmicro") * col("fn") * col("bn")).cast("double") /
          nullif((col("fsum") * col("bn") + col("bsum") * col("fn"))
            .cast("double"), lit(0.0)), 6))
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .select(col("src_id"), col("tgt_id"), col("cmicro").as("cos_micro"),
        col("margin"))
  }
}
