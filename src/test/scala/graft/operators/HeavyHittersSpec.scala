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

  test("topValuesByWindow saturation flag: lossless iff window cardinality < k") {
    val t0 = 1704067200000L // 2024-01-01T00:00Z
    // hour 0: 3 distinct values (< k=4 -> lossless); hour 1: 8 distinct
    // values (sketch fills -> flagged)
    val evs =
      (Seq.fill(5)("a") ++ Seq.fill(3)("b") ++ Seq.fill(2)("c")).map((0, _)) ++
      (1 to 8).flatMap(i => Seq.fill(i)(s"v$i")).map((1, _))
    val df = evs.zipWithIndex.map { case ((h, v), i) =>
      (i.toLong, new java.sql.Timestamp(t0 + h * 3600000L), v)
    }.toDF("event_id", "ts", "v")
    val got = HeavyHitters.topValuesByWindow(df, "ts", "v", "1 hour", k = 4, topN = 2)
      .select($"window_start", $"value", $"n_candidates", $"lossless")
      .collect()
      .map(r => (r.getTimestamp(0).getTime, r.getString(1), r.getLong(2), r.getBoolean(3)))
    val hour0 = got.filter(_._1 == t0)
    val hour1 = got.filter(_._1 == t0 + 3600000L)
    assert(hour0.nonEmpty && hour0.forall { case (_, _, n, ok) => n == 3 && ok })
    assert(hour0.map(_._2).toSet == Set("a", "b")) // still exact below k
    assert(hour1.nonEmpty && hour1.forall { case (_, _, n, ok) => n == 4 && !ok })
  }

  test("trendingTerms: growth criterion by hand, new term needs no special case") {
    // before: 3 'a', 1 'b' (N1=4); after: 1 'a', 2 'b', 1 'c' (N2=4)
    // growth_x: a: 1*4-3*4 = -8; b: 2*4-1*4 = 4; c (new): 1*4-0*4 = 4
    val before = Seq("a a a b").toDF("text")
    val after = Seq("a b b c").toDF("text")
    val out = HeavyHitters.trendingTerms(before, after, "text", 10)
      .collect().map(r => (r.getAs[String]("tok"), r.getAs[Long]("growth_x")))
    assert(out.toSeq == Seq(("b", 4L), ("c", 4L), ("a", -8L))) // tie b < c
  }
}
