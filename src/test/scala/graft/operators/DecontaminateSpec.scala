package graft.operators

import graft.SparkSpec

class DecontaminateSpec extends SparkSpec {
  import spark.implicits._

  test("flags corpus docs sharing any n-gram with the benchmark, counts distinct overlaps") {
    val corpus = Seq(
      (1L, "the quick brown fox jumps over dogs"), // shares "the quick brown", "quick brown fox"
      (2L, "completely unrelated corpus text here"),
      (3L, "the quick brown fox" + " again and again") // same overlapping grams as 1
    ).toDF("doc_id", "text")
    val benchmark = Seq(
      (100L, "the quick brown fox is a benchmark item")
    ).toDF("doc_id", "text")

    val out = Dedup.decontaminate(corpus, benchmark, "doc_id", "text", 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out.keySet == Set(1L, 3L), s"got $out")
    assert(out(1L) == 2L) // "the quick brown" + "quick brown fox"
    assert(out(3L) == 2L)
  }

  test("gram multiplicity does not inflate the overlap count (distinct set semantics)") {
    val corpus = Seq((1L, "a b c a b c a b c")).toDF("doc_id", "text")
    val benchmark = Seq((9L, "a b c")).toDF("doc_id", "text")
    val out = Dedup.decontaminate(corpus, benchmark, "doc_id", "text", 3).collect()
    // corpus doc contains gram "a b c" three times, plus "b c a"/"c a b"
    // which the benchmark lacks -> exactly ONE distinct overlapping gram
    assert(out.length == 1 && out(0).getLong(1) == 1L)
  }

  test("clean corpus yields no rows; short docs produce no grams") {
    val corpus = Seq((1L, "x y z w"), (2L, "too short")).toDF("doc_id", "text")
    val benchmark = Seq((9L, "p q r s t")).toDF("doc_id", "text")
    assert(Dedup.decontaminate(corpus, benchmark, "doc_id", "text", 3).count() == 0)
  }
}
