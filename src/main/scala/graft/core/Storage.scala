package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.LogicalRDD

/** Executor-storage discipline for checkpoint-based operators.
  *
  * `Dataset.localCheckpoint` persists its result RDD in executor storage,
  * but `Dataset.unpersist()` only consults the CacheManager (cache()/persist()
  * entries) and SILENTLY does nothing for checkpoint blocks. Operators that
  * checkpoint internally therefore leak every intermediate into executor
  * storage for the life of the session — harmless in a one-query job,
  * poisonous in a shared session (bench harness, notebook, streaming
  * foreachBatch) where dozens of queries each leave their blocks behind and
  * later queries pay the eviction pressure. These helpers free checkpoint
  * blocks at the RDD layer, where they actually live.
  *
  * Safety contract: a localCheckpoint TRUNCATES lineage — once its blocks are
  * freed the data is gone, not recomputable. Only free a checkpoint nothing
  * will read again: superseded loop iterations, operator-internal
  * intermediates after the result is materialized, or whole-session sweeps
  * between independent queries.
  */
object Storage {

  /** Ids of the checkpoint RDDs backing `df` (the `LogicalRDD` leaves a
    * Dataset.checkpoint/localCheckpoint plan bottoms out in).
    */
  def checkpointRddIds(df: DataFrame): Set[Int] =
    df.queryExecution.analyzed.collect { case l: LogicalRDD => l.rdd.id }.toSet

  /** Free the storage blocks behind a checkpointed DataFrame. Goes to the
    * underlying RDDs, which `Dataset.unpersist()` does not reach. No-op on
    * plans with no checkpoint leaf; for reliable (file-based) checkpoints it
    * drops any persisted blocks but leaves the files, so the data stays
    * recoverable there.
    */
  def freeCheckpoint(df: DataFrame): Unit =
    df.queryExecution.analyzed.foreach {
      case l: LogicalRDD => l.rdd.unpersist(blocking = false)
      case _             => ()
    }

  /** Run `build`, then free every RDD it newly persisted except the blocks
    * backing the returned DataFrame. This is the "operator cleans up after
    * itself" wrapper: callers get one leaf holding the result; the
    * operator's internal checkpoints (candidate sets, shingle tables, loop
    * iterations) are gone. If `build` throws, EVERYTHING it persisted is
    * freed (there is no result to keep) before the exception propagates —
    * a failed operator must not leak its partial state into the session.
    *
    * `build` must either materialize its result (eager checkpoint or an
    * action) before returning, or return a plan whose only persisted inputs
    * are its own checkpoint LEAVES — anything else it persisted is freed
    * here and must not be needed again. Nesting is fine (an outer wrapper
    * sees — and frees — an inner wrapper's kept leaf if the outer result no
    * longer references it).
    *
    * CONCURRENCY CONTRACT: the before/after diff is over the
    * SparkContext-GLOBAL persistent-RDD map, so two storage-disciplined
    * operators running concurrently in one session would free each other's
    * intermediates — including materialized checkpoints whose lineage is
    * already truncated, i.e. unrecoverable data. A session must run at most
    * one wrapped operator at a time (the single-driver-thread shape of
    * Bench/Verify/ETL apps); concurrent-query sessions should serialize
    * these operators behind this lock.
    */
  private[this] val lock = new Object
  def freeingIntermediates(spark: SparkSession)(build: => DataFrame): DataFrame =
   lock.synchronized {
    val sc = spark.sparkContext
    val before = sc.getPersistentRDDs.keySet
    var out: DataFrame = null
    try {
      out = build
      out
    } finally {
      val keep = if (out == null) Set.empty[Int] else checkpointRddIds(out)
      sc.getPersistentRDDs.foreach { case (id, rdd) =>
        if (!before.contains(id) && !keep.contains(id)) rdd.unpersist(blocking = false)
      }
    }
   }

  /** Free ALL persisted RDD blocks in the session — the between-queries
    * sweep for harnesses (Bench, Verify) that run many independent queries
    * in one session and need per-query timings attributable to the query,
    * not to a predecessor's leaked storage. `blocking = true` (the default)
    * waits for the removal so the next query's window doesn't absorb the
    * cleanup.
    */
  def freeAll(spark: SparkSession, blocking: Boolean = true): Unit =
    spark.sparkContext.getPersistentRDDs.valuesIterator
      .foreach(_.unpersist(blocking))

  /** Lineage cut for iterative/reused subtrees: `localCheckpoint` by default
    * (fast, executor-storage-backed), a RELIABLE `checkpoint` when the
    * session has a checkpoint dir set (`sc.setCheckpointDir(...)`). Local
    * checkpoint blocks are NOT fault-tolerant — on a real cluster, losing an
    * executor mid-loop loses non-replicated blocks whose lineage is already
    * truncated, killing the job — so cluster runs of the iterative operators
    * opt in by setting the checkpoint dir; no code change. Reliable mode
    * computes each cut twice (Spark writes checkpoint files by re-running
    * the RDD at job end) and keeps per-cut files until the dir is cleaned —
    * the standard durability tax.
    */
  def cut(df: DataFrame, eager: Boolean = true): DataFrame =
    if (df.sparkSession.sparkContext.getCheckpointDir.isDefined) df.checkpoint(eager)
    else df.localCheckpoint(eager)
}
