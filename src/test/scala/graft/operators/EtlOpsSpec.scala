package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class EtlOpsSpec extends SparkSpec {
  import spark.implicits._

  test("cutoffBefore is half-open (strictly before)") {
    val df = Seq(
      (1L, "2024-01-14 23:00:00"),
      (2L, "2024-01-15 00:00:00"),
      (3L, "2024-01-15 01:00:00")
    ).toDF("id", "s").withColumn("ts", to_timestamp($"s"))
    val out = EtlOps.cutoffBefore("ts", java.sql.Timestamp.valueOf("2024-01-15 00:00:00"))(df)
    assert(out.select("id").as[Long].collect().toSet == Set(1L))
  }

  test("semiJoinFilter keeps only rows with a reference match, no duplication") {
    val fact = Seq(("CISO", 1), ("CISO", 2), ("NOPE", 3)).toDF("ba", "v")
    val ref = Seq(("CISO"), ("ERCO"), ("CISO")).toDF("code") // dup in ref must not duplicate facts
    val out = EtlOps.semiJoinFilter(ref, "ba", "code")(fact)
    assert(out.count() == 2)
    assert(out.select("v").as[Int].collect().toSet == Set(1, 2))
  }

  test("lossyTimestamp coerces bad values to null (errors='coerce')") {
    val df = Seq("2024-01-01 05:00:00", "garbage", "2024-02-30 00:00:00").toDF("raw")
    val out = EtlOps.lossyTimestamp("raw", "ts")(df).select("ts").collect()
    assert(out(0).get(0) != null)
    assert(out(1).get(0) == null)
    assert(out(2).get(0) == null) // Feb 30 invalid
  }

  test("pivotSum dropIncomplete reproduces pandas pivot_table + dropna") {
    val df = Seq(
      ("h1", "D", "10"), ("h1", "NG", "5"), ("h2", "D", "3")
    ).toDF("date", "type", "value")
    val full = EtlOps.pivotSum(Seq("date"), "type", Seq("D", "NG"), "value", dropIncomplete = false)(df)
    assert(full.count() == 2)
    val dropped = EtlOps.pivotSum(Seq("date"), "type", Seq("D", "NG"), "value", dropIncomplete = true)(df)
    assert(dropped.count() == 1) // h2 lacks NG
    val r = dropped.collect()(0)
    assert(r.getAs[Double]("D") == 10.0 && r.getAs[Double]("NG") == 5.0)
  }

  test("groupStats std is SAMPLE stddev (ddof=1), matching pandas Series.std") {
    val df = Seq(("a", 2.0), ("a", 4.0), ("a", 4.0), ("a", 4.0), ("a", 5.0),
      ("a", 5.0), ("a", 7.0), ("a", 9.0), ("b", 1.0)).toDF("k", "x")
    val out = EtlOps.groupStats(Seq("k"), Seq("x"), "std")(df).collect()
    val aStd = out.find(_.getString(0) == "a").get.getAs[Double]("x")
    assert(math.abs(aStd - 2.13808993529939) < 1e-12) // sample stddev of the 8 values
    assert(out.find(_.getString(0) == "b").get.isNullAt(1)) // n=1 -> null, like pandas
  }

  test("quarterLabel formats like pandas to_period('Q')") {
    val df = Seq("1996-04-01", "1996-03-31", "1996-12-31").toDF("s")
      .withColumn("d", to_date($"s"))
      .select(EtlOps.quarterLabel($"d").as("q"))
    assert(df.as[String].collect().toSeq == Seq("1996-Q2", "1996-Q1", "1996-Q4"))
  }

  test("numericParsable keeps only parseable rows with coerced value") {
    val df = Seq("1.5", "x", "-2", "1e3", "").toDF("v")
    val out = EtlOps.numericParsable("v", "num")(df).select("num").as[Double].collect()
    assert(out.toSet == Set(1.5, -2.0, 1000.0))
  }

  test("unionPages preserves row count across pages (U1 invariant)") {
    val li = graft.core.Tables.lineitem(spark, sf)
    val pages = Seq(0, 1, 2).map(i => li.filter($"l_orderkey" % 3 === i))
    assert(EtlOps.unionPages(pages).count() == li.count())
  }
}
