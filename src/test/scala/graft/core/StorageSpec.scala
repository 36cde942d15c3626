package graft.core

import graft.SparkSpec
import graft.operators.Dedup
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Storage-discipline contract: checkpoint-based operators leave NOTHING in
  * executor storage beyond the single leaf backing their result, the
  * wrapper cleans up even on failure, and `Storage.cut` switches to
  * reliable checkpoints when the session has a checkpoint dir.
  */
class StorageSpec extends SparkSpec {
  import spark.implicits._

  private def persistedIds: Set[Int] =
    spark.sparkContext.getPersistentRDDs.keySet.toSet

  /** Run `op`, materialize its result, and assert the only NEW persisted
    * RDDs are the checkpoint leaves of the result itself; then free those
    * and assert storage is back to the pre-op state.
    */
  private def assertSelfCleaning(op: => DataFrame): Unit = {
    Storage.freeAll(spark, blocking = true)
    val before = persistedIds
    val out = op
    out.count() // materialize lazy results (eager ones are a no-op re-count)
    val kept = Storage.checkpointRddIds(out)
    val leaked = persistedIds -- before -- kept
    assert(leaked.isEmpty,
      s"operator leaked non-result blocks into executor storage: $leaked")
    Storage.freeCheckpoint(out)
    val after = persistedIds -- before
    assert(after.isEmpty, s"blocks survived freeing the result leaf: $after")
  }

  // a 12-node chain (forces the pointer-jump rounds) plus a star cluster
  private def chainPairs =
    ((1L to 11L).map(i => (i, i + 1)) ++ Seq((20L, 21L), (20L, 22L)))
      .toDF("ida", "idb")

  private val docs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog and runs away fast"),
    (2L, "the quick brown fox jumps over the lazy dog and runs away quickly"),
    (3L, "completely different words appear here with nothing shared at all"),
    (4L, "the quick brown fox jumps over the lazy dog and runs away fast")
  ).toDF("doc_id", "text")

  test("connectedComponents labels a chain and a star correctly") {
    val labels = Dedup.connectedComponents(chainPairs)
      .as[(Long, Long)].collect().toMap
    assert((1L to 12L).forall(labels(_) == 1L))
    assert(Seq(20L, 21L, 22L).forall(labels(_) == 20L))
  }

  test("connectedComponents leaves only its result leaf in storage (d9 shape)") {
    assertSelfCleaning(Dedup.connectedComponents(chainPairs))
  }

  test("minhashVerifiedPairs leaves only its result leaf (d4 shape)") {
    assertSelfCleaning(Dedup.minhashVerifiedPairs(docs, "doc_id", "text", 3, 0.5))
  }

  test("editDistanceVerifiedPairs leaves only its result leaf (d13 shape)") {
    assertSelfCleaning(Dedup.editDistanceVerifiedPairs(docs, "doc_id", "text", 3, 1, 4))
  }

  test("dedupCorpus leaves only the component-labels leaf (d10/d16 shape)") {
    assertSelfCleaning(Dedup.dedupCorpus(docs, "doc_id", "text"))
  }

  test("freeingIntermediates frees everything when build throws") {
    Storage.freeAll(spark, blocking = true)
    val before = persistedIds
    intercept[RuntimeException] {
      Storage.freeingIntermediates(spark) {
        Seq((1L, 2L)).toDF("ida", "idb").localCheckpoint()
        sys.error("operator failed mid-flight")
      }
    }
    assert((persistedIds -- before).isEmpty,
      "a failed build leaked its partial checkpoints")
  }

  test("freeCheckpoint reaches blocks Dataset.unpersist does not") {
    Storage.freeAll(spark, blocking = true)
    val before = persistedIds
    val cp = Seq((1L, "a"), (2L, "b")).toDF("id", "v").localCheckpoint()
    assert((persistedIds -- before).nonEmpty)
    cp.unpersist(blocking = true) // documented no-op for checkpoint blocks
    assert((persistedIds -- before).nonEmpty, "Dataset.unpersist freed a checkpoint?")
    Storage.freeCheckpoint(cp)
    assert((persistedIds -- before).isEmpty)
  }

  test("cut produces RELIABLE checkpoints when a checkpoint dir is set") {
    val dir = java.nio.file.Files.createTempDirectory("graft-ckpt").toFile
    val sc = spark.sparkContext
    try {
      sc.setCheckpointDir(dir.getAbsolutePath)
      val cutDf = Storage.cut(Seq((1L, 2L), (2L, 3L)).toDF("ida", "idb"))
      assert(cutDf.count() == 2)
      val files = java.nio.file.Files.walk(dir.toPath).filter(_.toFile.isFile)
        .count()
      assert(files > 0, "no reliable checkpoint files were written")
      // the full iterative operator stays green in reliable mode
      val labels = Dedup.connectedComponents(chainPairs)
        .as[(Long, Long)].collect().toMap
      assert((1L to 12L).forall(labels(_) == 1L))
    } finally {
      // reset the session-global checkpoint dir so later suites (and the
      // shared session) go back to localCheckpoint mode; private[spark] var,
      // hence the reflective setter (public in bytecode)
      classOf[org.apache.spark.SparkContext]
        .getMethod("checkpointDir_$eq", classOf[Option[_]])
        .invoke(sc, None)
      org.apache.commons.io.FileUtils.deleteQuietly(dir)
    }
  }
}
