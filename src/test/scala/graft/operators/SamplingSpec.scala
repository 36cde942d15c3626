package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SamplingSpec extends SparkSpec {
  import spark.implicits._

  test("hashSample: deterministic, near-rate, and stable under corpus growth") {
    val docs = graft.core.Tables.documents(spark, sf)
    val a = Sampling.hashSample(docs, "doc_id", 0.2, "t").select("doc_id")
      .as[Long].collect().toSet
    val b = Sampling.hashSample(docs, "doc_id", 0.2, "t").select("doc_id")
      .as[Long].collect().toSet
    assert(a == b)
    val n = docs.count().toDouble
    assert(math.abs(a.size / n - 0.2) < 0.08, s"rate ${a.size / n}")
    // membership is per-row: sampling a SUBSET keeps exactly the intersection
    val half = Sampling.hashSample(docs.filter($"doc_id" % 2 === 0), "doc_id", 0.2, "t")
      .select("doc_id").as[Long].collect().toSet
    assert(half == a.filter(_ % 2 == 0))
    // a different salt draws a different sample
    val other = Sampling.hashSample(docs, "doc_id", 0.2, "u").select("doc_id")
      .as[Long].collect().toSet
    assert(other != a)
  }

  test("splitAssign: total, disjoint, near the requested fractions") {
    val docs = graft.core.Tables.documents(spark, sf)
    val splits = Sampling.splitAssign(docs, "doc_id",
      Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1), "sp")
      .groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val n = docs.count().toDouble
    assert(splits.keySet == Set("train", "val", "test"))
    assert(splits.values.sum == n) // total: every row lands in exactly one
    assert(math.abs(splits("train") / n - 0.8) < 0.1, splits.toString)
  }

  test("stratifiedSample keeps every row of rate-1.0 strata, thins the rest") {
    val docs = graft.core.Tables.documents(spark, sf)
    val out = Sampling.stratifiedSample(docs, "doc_id", "lang",
      Map("zh" -> 1.0), defaultRate = 0.2, salt = "st")
    val zhAll = docs.filter($"lang" === "zh").count()
    assert(out.filter($"lang" === "zh").count() == zhAll)
    val restIn = docs.filter($"lang" =!= "zh").count()
    val restOut = out.filter($"lang" =!= "zh").count()
    assert(restOut < restIn / 2, s"$restOut of $restIn kept")
  }
}
