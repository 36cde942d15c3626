package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Heavy-hitters surface over the native Misra-Gries aggregate
  * (graft.plans.MisraGriesSketch — a `TypedImperativeAggregate` with a
  * mutable bounded buffer; see its Scaladoc for the guarantee and the
  * at-scale shape).
  */
object HeavyHitters {

  /** Column form usable in `agg` over any string column; yields a
    * map<string,bigint> of ~k candidate heavy hitters.
    */
  def sketchOf(c: Column, k: Int): Column =
    graft.plans.GraftFunctions.misraGries(c, k)

  /** Heavy-hitter terms over a text column: sketch to find candidates with
    * bounded memory, then ONE semi-joined exact count of just the candidates
    * — the standard two-pass pattern that never shuffles the full term
    * distribution.
    */
  def topTerms(df: DataFrame, textCol: String, k: Int, topN: Int): DataFrame = {
    val toks = df.select(explode(split(col(textCol), " ")).as("__mg_item"))
    val candidates = toks
      .agg(map_keys(sketchOf(col("__mg_item"), k)).as("cand"))
      .head().getSeq[String](0)
    toks.filter(col("__mg_item").isin(candidates.map(lit(_)): _*))
      .groupBy(col("__mg_item").as("term"))
      .agg(count(lit(1)).as("freq"))
      .orderBy(col("freq").desc, col("term").asc)
      .limit(topN)
  }
}
