package graft.operators

import graft.SparkSpec

/** Bitext.minePairs — the Artetxe-Schwenk ratio margin over planted
  * translation pairs.
  */
class BitextSpec extends SparkSpec {
  import spark.implicits._

  private def vec(xs: Double*): Array[Float] = xs.map(_.toFloat).toArray

  private def cos(a: Array[Float], b: Array[Float]): Double = {
    val d = a.zip(b).map { case (x, y) => x.toDouble * y }.sum
    d / (math.sqrt(a.map(x => x.toDouble * x).sum) *
      math.sqrt(b.map(x => x.toDouble * x).sum))
  }

  test("planted translations win on margin where raw cosine picks a wrong neighbor") {
    // Clustered sources along (1, δ): the geometry that defeats raw cosine.
    // Source 2 = (1, 0.3); its planted translation t102 = (1, 0.8) is
    // NOISY, so on raw cosine both t104 = (1, 0.5) (the translation of
    // source 4!) and the hub t200 = (1, 0) outscore it. The margin
    // criterion divides by neighborhood means — t104/t200 sit close to
    // EVERY source, inflating their backward means — and the true pair
    // wins. (Checked by hand: cos(s2,t104)=0.985 > cos(s2,t102)=0.928,
    // but margin(s2,t102)=1.162 > margin(s2,t104)=1.154.)
    val src = Seq(
      (1L, vec(1, -0.3, 0, 0)), (2L, vec(1, 0.3, 0, 0)),
      (3L, vec(1, -0.1, 0, 0)), (4L, vec(1, 0.1, 0, 0)))
      .toDF("vec_id", "embedding")
    val tgt = Seq(
      (101L, vec(1, -0.8, 0, 0)), (102L, vec(1, 0.8, 0, 0)),
      (103L, vec(1, -0.5, 0, 0)), (104L, vec(1, 0.5, 0, 0)),
      (200L, vec(1, 0, 0, 0)))
      .toDF("vec_id", "embedding")
    // exhaustive shortlists: the margin math is the subject under test
    val fwd = (1L to 4L).flatMap(q => Seq(101L, 102L, 103L, 104L, 200L)
      .map(n => (q, n))).toDF("qid", "nid")
    val bwd = Seq(101L, 102L, 103L, 104L, 200L)
      .flatMap(q => (1L to 4L).map(n => (q, n))).toDF("qid", "nid")

    // fixture guard: raw cosine really does prefer a WRONG target for s2
    val s2 = vec(1, 0.3, 0, 0)
    assert(cos(s2, vec(1, 0.5, 0, 0)) > cos(s2, vec(1, 0.8, 0, 0)),
      "fixture drifted: t104 no longer beats the translation on raw cosine")
    assert(cos(s2, vec(1, 0, 0, 0)) > cos(s2, vec(1, 0.8, 0, 0)),
      "fixture drifted: the hub no longer beats the translation on raw cosine")

    val out = Bitext.minePairs(src, tgt, "vec_id", "embedding", fwd, bwd)
      .orderBy("src_id").collect()
      .map(r => r.getAs[Long]("src_id") -> r.getAs[Long]("tgt_id")).toMap
    assert(out(1L) == 101L, s"src 1: $out")
    assert(out(2L) == 102L, s"src 2: $out")
    // every mined margin sits above 1 (above-neighborhood similarity)
    val margins = Bitext.minePairs(src, tgt, "vec_id", "embedding", fwd, bwd)
      .collect().map(_.getAs[Double]("margin"))
    assert(margins.forall(_ > 1.0), margins.toSeq.toString)
  }

  test("zero-norm vectors drop from candidates and neighborhood means") {
    val src = Seq((1L, vec(1, 0, 0, 0)), (2L, vec(0, 0, 0, 0)))
      .toDF("vec_id", "embedding")
    val tgt = Seq((101L, vec(1, 0.1, 0, 0)), (102L, vec(0, 0, 0, 0)))
      .toDF("vec_id", "embedding")
    val fwd = Seq((1L, 101L), (1L, 102L), (2L, 101L)).toDF("qid", "nid")
    val bwd = Seq((101L, 1L), (101L, 2L), (102L, 1L)).toDF("qid", "nid")
    val out = Bitext.minePairs(src, tgt, "vec_id", "embedding", fwd, bwd)
      .collect()
    // src 2 (zero-norm) has no scoreable pair; src 1's only candidate is 101
    assert(out.map(_.getAs[Long]("src_id")).toSeq == Seq(1L))
    assert(out.head.getAs[Long]("tgt_id") == 101L)
  }

  test("margin formula by hand: integer micro-cosine, cross-multiplied mean of means") {
    val src = Seq((1L, vec(1, 0, 0, 0))).toDF("vec_id", "embedding")
    val tgt = Seq((101L, vec(1, 0, 0, 0)), (102L, vec(0, 1, 0, 0)))
      .toDF("vec_id", "embedding")
    val fwd = Seq((1L, 101L), (1L, 102L)).toDF("qid", "nid")
    val bwd = Seq((101L, 1L), (102L, 1L)).toDF("qid", "nid")
    val out = Bitext.minePairs(src, tgt, "vec_id", "embedding", fwd, bwd)
      .collect()
    assert(out.length == 1)
    val r = out.head
    assert(r.getAs[Long]("tgt_id") == 101L)
    assert(r.getAs[Long]("cos_micro") == 1000000L)
    // fwd mean over {1.0, 0.0} = 0.5; bwd(101) mean over {1.0} = 1.0;
    // margin = 1.0 / ((0.5 + 1.0) / 2) = 4/3 -> round(, 6)
    assert(r.getAs[Double]("margin") == 1.333333)
  }
}
