package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Shared local session for all suites (one JVM-wide session — Spark startup
  * dominates test time otherwise).
  */
object TestSpark {
  lazy val spark: SparkSession = graft.core.Sessions
    .configure(SparkSession.builder().appName("graft-test").master("local[4]"),
      shufflePartitions = 4)
    .getOrCreate()
}

abstract class SparkSpec extends AnyFunSuite {
  lazy val spark: SparkSession = TestSpark.spark
  lazy val sf: String = "/root/testdata/sf0.001"
}
