package graft.plans

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** PqEncodeLong / PqAdcDirectLong vs independent plain-Scala references —
  * the argmin/tie-break and sum-of-squares semantics the DuckDB oracles for
  * s9/s13/s15 express in SQL. Also pins the fail-loud contract on malformed
  * inputs (the DotProductLong discipline).
  */
class PqKernelsSpec extends SparkSpec {

  private val dim = 8
  private val m = 4 // sub = 2
  private val k = 3

  /** Deterministic small fixture: vectors and a codebook with a designed
    * tie in subspace 0 (entries 0 and 1 equidistant from vec 0).
    */
  private val cb: Seq[Seq[Seq[Long]]] =
    Seq.tabulate(m)(mm => Seq.tabulate(k)(kk =>
      Seq.tabulate(dim / m)(j => (mm + kk * 2 + j).toLong)))
  private val vecs: Seq[Seq[Long]] = Seq(
    Seq.tabulate(dim)(i => (i % 3).toLong),
    Seq.tabulate(dim)(i => (7 - i).toLong),
    Seq.tabulate(dim)(_ => 1L),
    Seq.tabulate(dim)(i => (i * i % 5).toLong))

  private def refEncode(v: Seq[Long]): Seq[Long] = {
    val sub = dim / m
    (0 until m).map { mm =>
      val sv = v.slice(mm * sub, (mm + 1) * sub)
      val d2s = cb(mm).map(c => sv.zip(c).map { case (a, b) =>
        (a - b) * (a - b) }.sum)
      d2s.zipWithIndex.minBy { case (d2, kk) => (d2, kk) }._2.toLong
    }
  }

  private def refAdc(q: Seq[Long], codes: Seq[Long]): Long = {
    val sub = dim / m
    (0 until m).map { mm =>
      val sv = q.slice(mm * sub, (mm + 1) * sub)
      sv.zip(cb(mm)(codes(mm).toInt)).map { case (a, b) =>
        (a - b) * (a - b) }.sum
    }.sum
  }

  import spark.implicits._
  private def df = vecs.zipWithIndex.map { case (v, i) => (i.toLong, v) }
    .toDF("id", "v")
    .withColumn("cb", typedLit(cb))

  test("pqEncode matches the reference argmin with lowest-code tie break") {
    val got = df.select(col("id"),
        GraftFunctions.pqEncode(col("v"), col("cb")).as("codes"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    for ((v, i) <- vecs.zipWithIndex)
      assert(got(i.toLong) == refEncode(v), s"vec $i")
  }

  test("pqAdcDirect matches the reference sum of squared subspace distances") {
    val got = df.select(col("id"),
        GraftFunctions.pqAdcDirect(col("v"),
          GraftFunctions.pqEncode(col("v"), col("cb")), col("cb")).as("d2"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    for ((v, i) <- vecs.zipWithIndex)
      assert(got(i.toLong) == refAdc(v, refEncode(v)), s"vec $i")
  }

  test("pqAdcDirect agrees with the LUT-form pqAdc on the same pairs") {
    // lut[mm][kk] = d2(query_sub_mm, cb[mm][kk]) built with plain SQL HOFs
    val sub = dim / m
    val lut = transform(sequence(lit(0), lit(m - 1)), mm =>
      transform(element_at(col("cb"), mm + 1), cc =>
        aggregate(
          zip_with(slice(col("v"), mm * sub + 1, lit(sub)), cc,
            (a, b) => (a - b) * (a - b)),
          lit(0L), (acc, x) => acc + x)))
    val rows = df.select(
        GraftFunctions.pqAdcDirect(col("v"),
          GraftFunctions.pqEncode(col("v"), col("cb")), col("cb")).as("direct"),
        GraftFunctions.pqAdc(
          GraftFunctions.pqEncode(col("v"), col("cb")), lut).as("viaLut"))
      .collect()
    rows.foreach(r => assert(r.getLong(0) == r.getLong(1)))
  }

  test("out-of-range code fails loud, not a wrong distance") {
    val bad = df.withColumn("codes", typedLit(Seq(0L, 0L, 0L, 99L)))
    val e = intercept[Exception] {
      bad.select(GraftFunctions.pqAdcDirect(col("v"), col("codes"), col("cb")))
        .collect()
    }
    assert(e.getMessage != null)
  }

  test("dimension mismatch fails loud") {
    val bad = df.withColumn("v3", typedLit(Seq(1L, 2L, 3L))) // 3 % 4 != 0
    val e = intercept[Exception] {
      bad.select(GraftFunctions.pqEncode(col("v3"), col("cb"))).collect()
    }
    assert(e.getMessage != null)
  }
}
