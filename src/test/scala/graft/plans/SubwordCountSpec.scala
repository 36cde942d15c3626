package graft.plans

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SubwordCountSpec extends SparkSpec {
  import spark.implicits._

  test("greedy longest-match: whole words beat bigrams beat chars") {
    val vocab = Seq("data", "ta", "ba", "a", "b", "d", "t", "se")
    val df = Seq(
      "data",       // whole word: 1
      "database",   // data + ba + se = 3
      "tata",       // ta + ta = 2
      "bad",        // ba + d = 2
      "x"           // not in vocab: [UNK] fallback = 1
    ).toDF("w").select($"w", SubwordCount.subwordCount($"w", vocab).as("n"))
    val got = df.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == Map("data" -> 1L, "database" -> 3L, "tata" -> 2L, "bad" -> 2L, "x" -> 1L))
  }

  test("document counting: multiple words, repeated spaces, empty text") {
    val vocab = Seq("ab", "a", "b", "c")
    val df = Seq("ab ab c", "a  b", "", "   ").toDF("t")
      .select(SubwordCount.subwordCount($"t", vocab).as("n"))
    assert(df.as[Long].collect().toSeq == Seq(3L, 2L, 0L, 0L))
  }

  test("subwordVocab: frequent words whole, all corpus chars covered, deterministic") {
    val docs = Seq("the cat the dog", "the bird").toDF("text")
    val v1 = graft.operators.TextOps.subwordVocab(docs, "text", topWords = 2, topBigrams = 2)
    val v2 = graft.operators.TextOps.subwordVocab(docs, "text", topWords = 2, topBigrams = 2)
    assert(v1 == v2)
    assert(v1.contains("the")) // top word
    val chars = "thecatdogbird".toSet.map((c: Char) => c.toString)
    assert(chars.subsetOf(v1.toSet))
    // trained vocab segments its own corpus with zero [UNK]s: every word is
    // coverable, so counts are bounded by word length
    val counts = docs.select(
      SubwordCount.subwordCount($"text", v1).as("n")).as[Long].collect()
    assert(counts.forall(_ > 0))
  }
}
