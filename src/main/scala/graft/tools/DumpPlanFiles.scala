package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.ExplainMode

/** Dev-only: write `explain("formatted")` for NAMED queries to individual
  * files — the per-query before/after plan artifacts an optimization round
  * commits under plans/rNN/ (DumpPlans writes the whole-suite PLANS.md;
  * this writes one file per name so a plan diff is reviewable in isolation).
  *
  * Usage:
  *   sbt "runMain graft.tools.DumpPlanFiles <outDir> <suffix> <name> [name...]"
  * writes <outDir>/<name>_<suffix>.txt for each query name at sf0.001.
  */
object DumpPlanFiles {
  def main(args: Array[String]): Unit = {
    require(args.length >= 3, "usage: DumpPlanFiles <outDir> <suffix> <name>...")
    val (outDir, suffix, names) = (args(0), args(1), args.drop(2).toSeq)
    val spark = graft.core.Sessions.configure(
      SparkSession.builder().appName("graft-plan-files").master("local[4]"),
      shufflePartitions = 4).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val sf = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir))
    names.foreach { name =>
      graft.core.Storage.freeAll(spark, blocking = true)
      val df = graft.SparkEntry.queries(name)(spark, sf)
      val text = s"## $name ($suffix, $sf)\n\n```\n" + df.queryExecution
        .explainString(ExplainMode.fromString("formatted")).trim + "\n```\n"
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get(outDir, s"${name}_$suffix.txt"), text)
      println(s"wrote $outDir/${name}_$suffix.txt")
    }
    spark.stop()
  }
}
