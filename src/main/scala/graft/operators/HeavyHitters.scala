package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Misra-Gries heavy-hitters sketch as a typed Spark `Aggregator` — the
  * custom-aggregation escape hatch (SURVEY.md §2g "north-star" sketches).
  *
  * Guarantee: any item with true frequency > n/(k+1) is IN the candidate
  * set; reported counts undercount by at most n/(k+1). The buffer is a
  * bounded map of k counters regardless of input size, and two buffers merge
  * by counter addition + decrement — exactly the shape Spark's partial
  * aggregation needs, so a 1000-executor run keeps k counters per partition
  * and one k-sized merge tree, never a per-key shuffle. Use it when the
  * exact groupBy-count (whose shuffle is group-cardinality-sized) is the
  * thing that doesn't fit.
  *
  * The candidate set (not the counts) can depend on merge order — sketch
  * semantics; callers re-count candidates exactly when exact frequencies
  * matter (see `topTerms`).
  */
object HeavyHitters {

  type Sketch = Map[String, Long]

  class MisraGries(k: Int) extends Aggregator[String, Sketch, Sketch] {
    override def zero: Sketch = Map.empty

    override def reduce(buf: Sketch, item: String): Sketch =
      add(buf, item, 1L)

    override def merge(a: Sketch, b: Sketch): Sketch =
      b.foldLeft(a) { case (acc, (item, cnt)) => add(acc, item, cnt) }

    private def add(buf: Sketch, item: String, cnt: Long): Sketch =
      buf.get(item) match {
        case Some(c) => buf.updated(item, c + cnt)
        case None if buf.size < k => buf.updated(item, cnt)
        case None =>
          // decrement-all by the smallest of (cnt, current min); evict zeros
          val dec = math.min(cnt, buf.values.min)
          val survivors = buf.view.mapValues(_ - dec).filter(_._2 > 0).toMap
          val rest = cnt - dec
          if (rest > 0 && survivors.size < k) survivors.updated(item, rest)
          else survivors
      }

    override def finish(buf: Sketch): Sketch = buf
    override def bufferEncoder: Encoder[Sketch] = Encoders.kryo[Sketch]
    override def outputEncoder: Encoder[Sketch] = Encoders.kryo[Sketch]
  }

  /** Column form usable in `agg` over any string column. */
  def sketchOf(c: Column, k: Int): Column =
    udaf(new MisraGries(k), Encoders.STRING).apply(c)

  /** Heavy-hitter terms over a text column: sketch to find candidates with
    * bounded memory, then ONE semi-joined exact count of just the candidates
    * — the standard two-pass pattern that never shuffles the full term
    * distribution.
    */
  def topTerms(df: DataFrame, textCol: String, k: Int, topN: Int): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val toks = df.select(explode(split(col(textCol), " ")).as("__mg_item"))
    val candidates = toks
      .agg(sketchOf(col("__mg_item"), k).as("sk"))
      .as[Sketch](Encoders.kryo[Sketch])
      .head().keys.toSeq
    toks.filter(col("__mg_item").isin(candidates.map(lit(_)): _*))
      .groupBy(col("__mg_item").as("term"))
      .agg(count(lit(1)).as("freq"))
      .orderBy(col("freq").desc, col("term").asc)
      .limit(topN)
  }
}
