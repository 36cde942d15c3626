package graft.plans

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** LcsTokensLong vs an independent recursive-with-memo LCS reference —
  * the same recurrence the DuckDB oracle for e6 replays as a recursive
  * CTE. Deliberately shares no code with LcsTokensLong.compute (no token
  * interning, no two-row rolling arrays).
  */
class LcsTokensLongSpec extends SparkSpec {
  import spark.implicits._

  private def reference(a: Seq[String], b: Seq[String]): Long = {
    val memo = collection.mutable.Map.empty[(Int, Int), Long]
    def go(i: Int, j: Int): Long =
      if (i == 0 || j == 0) 0L
      else memo.getOrElseUpdate((i, j),
        if (a(i - 1) == b(j - 1)) go(i - 1, j - 1) + 1
        else math.max(go(i - 1, j), go(i, j - 1)))
    go(a.length, b.length)
  }

  test("compute: hand cases") {
    def lcs(a: String, b: String): Long =
      LcsTokensLong.compute(
        org.apache.spark.unsafe.types.UTF8String.fromString(a),
        org.apache.spark.unsafe.types.UTF8String.fromString(b))
    assert(lcs("a b c d", "a b c d") == 4L)     // identity
    assert(lcs("a b c d", "d c b a") == 1L)     // reversal: any single token
    assert(lcs("the cat sat", "a cat sat down") == 2L) // "cat sat"
    assert(lcs("x y", "p q") == 0L)             // disjoint vocabularies
    assert(lcs("a a a b", "a b a a") == 3L)     // repeats: "a a a" beats "a b"
    assert(lcs("", "") == 1L)                   // split("") = [""] both sides
    assert(lcs("a", "") == 0L)                  // "" tokenizes to [""], no "a"
  }

  test("compute: matches the naive recurrence on random token sequences") {
    val tok = Gen.oneOf("a", "b", "c", "dd", "ef", "")
    val seqs = Gen.listOfN(2, Gen.listOf(tok)).map {
      case Seq(x, y) => (x, y)
      case other => (other.head, other.head)
    }
    val params = Gen.Parameters.default.withSize(24)
    (1 to 200).foreach { n =>
      val (a, b) = seqs.pureApply(params, Seed(n.toLong))
      val as = a.mkString(" ")
      val bs = b.mkString(" ")
      val got = LcsTokensLong.compute(
        org.apache.spark.unsafe.types.UTF8String.fromString(as),
        org.apache.spark.unsafe.types.UTF8String.fromString(bs))
      // reference tokenizes the same way the kernel does: split on " "
      val want = reference(as.split(" ", -1).toSeq, bs.split(" ", -1).toSeq)
      assert(got == want, s"lcs('$as', '$bs'): got $got want $want")
    }
  }

  test("rougeL: exact fixed-point ratios and the F1 = 2L/(c+r) identity") {
    import graft.operators.TextOps
    val cand = Seq((1L, "the cat sat"), (2L, "a b c d")).toDF("id", "text")
    val ref = Seq((1L, "a cat sat down"), (2L, "a b c d")).toDF("id", "text")
    val out = TextOps.rougeL(cand, ref, "id", "text")
      .as[(Long, Long, Long, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> (r._2, r._3, r._4, r._5, r._6, r._7)).toMap
    // pair 1: L=2 of c=3, r=4 -> P=2/3, R=1/2, F=2*2/(3+4)=4/7
    assert(out(1L) == (2L, 3L, 4L, 666666L, 500000L, 571428L))
    // pair 2: identical -> all ratios exactly 1e6
    assert(out(2L) == (4L, 4L, 4L, 1000000L, 1000000L, 1000000L))
  }
}
