package graft

import graft.operators.Dedup
import org.scalatest.Ignore

/** Throwaway profiling harness (run explicitly; not part of `sbt test`). */
@Ignore
class ProfileDedup extends SparkSpec {
  test("profile d9 phases at sf0.1") {
    val d = "/root/testdata/sf0.1"
    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[profile] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    val docs = graft.core.Tables.documents(spark, d)
    val pairs = time("verifiedPairs count") {
      val p = Dedup.minhashVerifiedPairs(docs, "doc_id", "text", 3, 0.5).cache()
      p.count(); p
    }
    time("connectedComponents") {
      Dedup.connectedComponents(pairs).count()
    }
  }
}
