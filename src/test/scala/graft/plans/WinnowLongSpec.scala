package graft.plans

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** WinnowLong vs an independent plain-Scala reference implementation of
  * winnowing (substring + full-digest hash + naive window scan) — the same
  * arithmetic the DuckDB oracle for t5 expresses in SQL.
  */
class WinnowLongSpec extends SparkSpec {
  import spark.implicits._

  /** Naive reference: character substrings, md5 48-bit prefix, min of each
    * w-window by linear scan, distinct. Deliberately shares no code with
    * WinnowLong.compute.
    */
  private def reference(text: String, k: Int, w: Int): Set[Long] = {
    val chars = text.toCharArray // fixtures/tests use BMP-only text
    val n = chars.length - k + 1
    if (n < w) return Set.empty
    val md = java.security.MessageDigest.getInstance("MD5")
    val hashes = (0 until n).map { i =>
      val sub = new String(chars, i, k)
      val d = md.digest(sub.getBytes("UTF-8"))
      BigInt(1, d.take(6)).toLong
    }
    (0 to n - w).map(j => hashes.slice(j, j + w).min).toSet
  }

  private def engine(texts: Seq[String], k: Int, w: Int): Map[String, Set[Long]] =
    texts.zipWithIndex.map { case (t, i) => (i.toString, t) }
      .toDF("id", "text")
      .select(col("id"), WinnowLong.winnowLong(col("text"), k, w).as("fps"))
      .collect()
      .map(r => texts(r.getString(0).toInt) -> r.getSeq[Long](1).toSet)
      .toMap

  test("matches the naive reference on hand-picked texts (incl. multi-byte UTF-8)") {
    val texts = Seq(
      "the quick brown fox jumped over the lazy dog",
      "aaaaaaaaaaaaaaaaaaaaaaaa", // all-equal hashes: one distinct fp
      "short",                    // below w+k-1: empty
      "",                         // empty: empty
      "Übergrößenträger straße ärger 的是了我你 mixed ascii tail padding", // multi-byte
      "exactly-seventeen"         // length == w+k-1 == 17 for (8,10)? 17 chars -> npos=10=w: 1 window
    )
    for ((k, w) <- Seq((8, 10), (4, 4), (1, 1), (2, 5))) {
      val got = engine(texts, k, w)
      for (t <- texts)
        assert(got(t) == reference(t, k, w), s"text='$t' k=$k w=$w")
    }
  }

  test("matches the naive reference on random strings (property)") {
    val gen = for {
      n <- Gen.choose(0, 60)
      cs <- Gen.listOfN(n, Gen.frequency(
        (8, Gen.alphaLowerChar), (2, Gen.const(' ')), (1, Gen.const('ß'))))
    } yield cs.mkString
    var seed = Seed(7L)
    val texts = (1 to 60).flatMap { _ =>
      val t = gen.apply(Gen.Parameters.default, seed)
      seed = seed.next
      t
    }
    val got = engine(texts.distinct, 3, 4)
    for (t <- texts.distinct)
      assert(got(t) == reference(t, 3, 4), s"text='$t'")
  }

  test("shared substrings of length >= w+k-1 share a fingerprint; plan has no shuffle") {
    val df = Seq(
      (1L, "aaaa the quick brown fox jumped over bbbb"),
      (2L, "cccc the quick brown fox jumped over dddd"),
      (3L, "zzzzzzzzzzzzzzzzzzzzzzzzzzzzzzzzzzzzzzzzz")
    ).toDF("doc_id", "text")
    val fps = graft.operators.TextOps.winnowFingerprints(df, "doc_id", "text", k = 8, w = 10)
    val plan = fps.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"winnowing must not shuffle:\n$plan")
    val byDoc = fps.collect().map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    assert((byDoc(1L) intersect byDoc(2L)).nonEmpty)
    assert((byDoc(1L) intersect byDoc(3L)).isEmpty)
  }

  test("null text yields no rows; fingerprints are sorted distinct per doc") {
    val df = Seq((1L, Option("the quick brown fox jumped over the dog")),
      (2L, Option.empty[String])).toDF("doc_id", "text")
    val rows = df.select(col("doc_id"), WinnowLong.winnowLong(col("text"), 4, 4).as("fps"))
      .collect()
    val r1 = rows.find(_.getLong(0) == 1L).get.getSeq[Long](1)
    assert(r1 == r1.sorted && r1.distinct == r1)
    assert(rows.find(_.getLong(0) == 2L).get.isNullAt(1))
    assert(graft.operators.TextOps.winnowFingerprints(df, "doc_id", "text", 4, 4)
      .filter(col("sid") === 2L).count() == 0)
  }
}
