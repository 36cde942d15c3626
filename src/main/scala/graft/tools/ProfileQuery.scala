package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev-only single-query profiler: runs one named query N times in one
  * session and prints each wall time, separating first-run planning/codegen
  * cost from steady-state execution. Usage:
  *   SPARK_GRAFT_SF_DIR=... SPARK_GRAFT_ONLY=<name> runMain graft.tools.ProfileQuery [reps]
  */
object ProfileQuery {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val name = sys.env.getOrElse("SPARK_GRAFT_ONLY",
      sys.error("set SPARK_GRAFT_ONLY to the query name"))
    val reps = args.headOption.map(_.toInt).getOrElse(4)
    val spark = graft.core.Sessions.configure(
      SparkSession.builder().appName("graft-profile").master("local[32]"),
      shufflePartitions = 32).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.core.Tables.names.foreach { t =>
      val df = if (t == "events") graft.core.Tables.events(spark, sfDir)
               else graft.core.Tables.load(spark, sfDir, t)
      df.limit(1).count()
    }
    if (sys.env.contains("SPARK_GRAFT_ICU_WARM")) {
      graft.Bench.warmCaseMappings(spark) // the bench's exact warm set
      println("[profile] ICU warm block executed")
    }
    val fn = graft.SparkEntry.queries(name)
    import org.apache.spark.metrics.source.CodegenMetrics._
    // count only: the histogram SNAPSHOT is a bounded sampling reservoir,
    // so summing its values across an interval is not time-spent and can
    // even go negative once evictions start (r15 review)
    def compiled = METRIC_COMPILATION_TIME.getCount
    // crude sampler: every 20 ms, record the top interesting frame per thread
    val samples = new java.util.concurrent.ConcurrentHashMap[String, java.lang.Integer]()
    @volatile var sampling = false
    val sampler = new Thread(() => {
      while (true) {
        if (sampling) {
          val idle = Seq("Unsafe.park", "epollWait", "Object.wait",
            "ReferenceQueue", "Thread.sleep", "SocketDispatcher.read",
            "FileDispatcherImpl.read", "poll0")
          Thread.getAllStackTraces.forEach { (t, st) =>
            if (t.getName != "profile-sampler" && st.nonEmpty &&
                !idle.exists(st.head.toString.contains)) {
              val top = st.take(14).map(_.toString).mkString(" <- ")
              samples.merge(top, 1, (a, b) => a + b)
            }
          }
        }
        Thread.sleep(20)
      }
    }, "profile-sampler")
    sampler.setDaemon(true)
    sampler.start()
    // which rep the stack sampler watches (default 1 = cold; set
    // SPARK_GRAFT_PROFILE_REP to a later rep to sample steady state)
    val sampleRep = sys.env.getOrElse("SPARK_GRAFT_PROFILE_REP", "1").toInt
    (1 to reps).foreach { i =>
      graft.core.Storage.freeAll(spark, blocking = true)
      samples.clear()
      sampling = i == sampleRep
      val c0 = compiled
      val t0 = System.nanoTime()
      val df = fn(spark, sfDir)
      val tPlan = System.nanoTime()
      df.queryExecution.executedPlan // force analysis + optimization + planning
      val tOpt = System.nanoTime()
      // same action as Bench (forceFrame): execute the frame's own plan so
      // the profile sees the work the bench row times, not a pruned count
      val n = graft.Bench.forceFrame(df)
      val tEnd = System.nanoTime()
      println(f"[profile] $name rep $i: total ${(tEnd - t0) / 1e9}%.3f s " +
        f"(build ${(tPlan - t0) / 1e9}%.3f, plan ${(tOpt - tPlan) / 1e9}%.3f, " +
        f"exec ${(tEnd - tOpt) / 1e9}%.3f) — codegen ${compiled - c0} units " +
        f"($n rows)")
      if (i == sampleRep) {
        sampling = false
        import scala.jdk.CollectionConverters._
        samples.asScala.toSeq.sortBy(-_._2).take(12).foreach { case (f, c) =>
          println(s"[stack x$c] ${f.take(600)}")
        }
      }
    }
    spark.stop()
  }
}
