package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only: time the s9 chain stage by stage (not part of the library API). */
object DebugAnn {
  def main(args: Array[String]): Unit = {
    val b0 = graft.core.Sessions.configure(
      SparkSession.builder().master("local[32]").appName("debug-s9"),
      shufflePartitions = 32)
    val b = sys.env.get("DEBUG_CONF").map(_.split(",").filter(_.nonEmpty))
      .getOrElse(Array.empty[String])
      .foldLeft(b0) { (acc, kv) =>
        val Array(k, v) = kv.split("=", 2); acc.config(k, v)
      }
    val spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val emb = graft.core.Tables.embeddings(spark, dir)
    def time[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[debug] $name: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    time("warmup")(emb.count())
    val queries = SparkEntry.queries
    val names = sys.env.getOrElse("DEBUG_QUERIES",
      "s10_ivfpq_trained,s13_ivfpq_residual,s15_ivfpq_residual_trained," +
        "s17_ivfpq_refine,s9_ivfpq_knn").split(",").map(_.trim).toSeq
    if (sys.env.contains("DEBUG_INLINE")) {
      // replicate ivfPqPlan stage by stage with timing
      import graft.operators.Similarity
      val m = classOf[Similarity.type]
      val plan = Similarity.getClass.getDeclaredMethods
        .find(_.getName == "ivfPqPlan").get
      plan.setAccessible(true)
      var stages = Seq.empty[(String, Long)]
      val pinTimed: org.apache.spark.sql.DataFrame => org.apache.spark.sql.DataFrame = df => {
        val t0 = System.nanoTime()
        val r = graft.core.Storage.cut(df, true)
        stages :+= ("pin", System.nanoTime() - t0)
        println(f"[debug] pin: ${(System.nanoTime() - t0) / 1e9}%.2f s")
        r
      }
      val out = time("ivfPqPlan build")(
        plan.invoke(Similarity, emb, "vec_id", "embedding",
          Int.box(64), Int.box(16), Int.box(0), Int.box(4), Int.box(16),
          Int.box(256), Int.box(5), pinTimed)
          .asInstanceOf[org.apache.spark.sql.DataFrame])
      out.explain("formatted")
      time("final count (window+ADC)")(out.count())
      spark.stop(); return
    }
    for (name <- names) {
      graft.core.Storage.freeAll(spark, blocking = true)
      if (sys.env.contains("DEBUG_EXPLAIN")) {
        val df = time(name + " build")(queries(name)(spark, dir))
        df.explain("formatted")
        time(name + " count")(df.count())
      } else time(name)(queries(name)(spark, dir).count())
    }
    spark.stop()
  }
}
