package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class HeavyHittersSpec extends SparkSpec {
  import spark.implicits._

  test("MG guarantee: every item above n/(k+1) frequency is in the sketch") {
    // 8 partitions force real partial-buffer merges
    val items = (Seq.fill(500)("hot1") ++ Seq.fill(300)("hot2") ++
      (1 to 400).map(i => s"rare$i")).map(Tuple1(_))
    val df = spark.createDataFrame(items.map(t => Tuple1(t._1))).toDF("__mg_item")
      .repartition(8)
    val sk = df.agg(HeavyHitters.sketchOf(col("__mg_item"), 10).as("sk"))
      .head().getMap[String, Long](0)
    // n = 1200, k = 10 -> anything over ~109 occurrences must survive
    assert(sk.contains("hot1") && sk.contains("hot2"))
    assert(sk.size <= 10)
  }

  test("topTerms: sketch + exact recount matches a full exact count") {
    val docs = graft.core.Tables.documents(spark, sf)
    val viaSketch = HeavyHitters.topTerms(docs, "text", k = 64, topN = 10)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val exact = docs.select(explode(split($"text", " ")).as("term"))
      .groupBy("term").agg(count(lit(1)).as("freq"))
      .orderBy($"freq".desc, $"term".asc).limit(10)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    assert(viaSketch.toSeq == exact.toSeq) // k=64 >> distinct vocab -> lossless here
  }

  test("topTermsByGroup: per-group sketch + recount equals per-group exact top-N") {
    import org.apache.spark.sql.expressions.Window
    val docs = graft.core.Tables.documents(spark, sf)
    val viaSketch = HeavyHitters.topTermsByGroup(docs, "lang", "text", k = 64, topN = 3)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3))).toSet
    val w = Window.partitionBy($"lang").orderBy($"freq".desc, $"term".asc)
    val exact = docs.select($"lang", explode(split($"text", " ")).as("term"))
      .groupBy("lang", "term").agg(count(lit(1)).as("freq"))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter($"rank" <= 3)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3))).toSet
    assert(viaSketch == exact)
    assert(viaSketch.map(_._1).size == 5 * 3 || viaSketch.groupBy(_._1).forall(_._2.size == 3))
  }
}
