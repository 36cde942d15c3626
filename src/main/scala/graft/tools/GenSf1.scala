package graft.tools

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Dev-only sf1 probe-data generator (r14 VERDICT ask #7): derives a
  * 10x-documents / 4x-embeddings / 10x-events dataset from sf0.1 under
  * target/sf1, for a ONE-OFF sf0.1 -> sf1 scaling measurement of the
  * heaviest queries. The driver provides no sf1 testdata, so this is a
  * replication probe, decorrelated so the scaled corpus stresses the same
  * code paths as organically larger data would:
  *
  *  - documents: 10 copies, ids offset; copies > 0 get their words
  *    deterministically PERMUTED (sort positions by a copy-salted hash) —
  *    unigram/token statistics are preserved, but word n-gram shingles
  *    decorrelate, so dedup candidate counts grow ~10x like organic data,
  *    not ~100x like verbatim replication would force.
  *  - embeddings: 4 copies (the embeddings family scales 4x per SF step,
  *    matching the driver's sf0.01 -> sf0.1 ratio); copies > 0 get their
  *    DIMENSIONS cyclically rotated — norms and distributions identical,
  *    cross-copy cosine ~0, so ANN/semdedup neighbor structure scales
  *    like real growth.
  *  - events: 10 copies, event/user ids offset (10x users, same window —
  *    a denser day, the realistic growth axis for ingest twins).
  *  - dimension tables (TPC-H) copy through verbatim — the probe's
  *    queries don't read them, but the bench warmup touches every table.
  */
object GenSf1 {
  def main(args: Array[String]): Unit = {
    val src = sys.env.getOrElse("SPARK_GRAFT_SF_SRC", "/root/testdata/sf0.1")
    val out = sys.env.getOrElse("SPARK_GRAFT_SF1_OUT", "target/sf1")
    val spark = graft.core.Sessions.configure(
      SparkSession.builder().appName("graft-gen-sf1").master("local[32]"),
      shufflePartitions = 32).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    build(spark, src, out, sys.env.getOrElse("SPARK_GRAFT_SF1_MODE", "permute"))
    println(s"[gen-sf1] wrote $out")
    spark.stop()
  }

  /** Build the derived sf1 set under `out` — callable in-process (the
    * bench's gated sf1 tier reuses its session) or via [[main]].
    */
  def build(spark: SparkSession, src: String, out: String, mode: String): Unit = {

    def write(df: DataFrame, name: String): Unit =
      df.write.mode(SaveMode.Overwrite).parquet(s"$out/$name.parquet")

    // documents: 10 copies. Default mode permutes each copy's words by a
    // salted hash (token statistics preserved, shingles decorrelated).
    // That still preserves token MULTISETS, so SET-similarity operators
    // (containment/prefix-filter: d23/d29) see every doc gain 9 exact
    // set-twins — 225,800 twin pairs at sf1 vs 8 at sf0.1, a pair-density
    // artifact organic growth would not have. Mode "disjoint" suffixes
    // every copy's tokens with the copy id instead: copies become 10
    // independent shards (zero cross-copy overlap of any kind) — the
    // organic lower bound for pair-family probes, at the cost of a 10x
    // vocabulary (don't read lm/vocab-growth numbers off this variant).
    locally {
      val docs = spark.read.parquet(s"$src/documents.parquet")
      val copies = (0 until 10).map { c =>
        if (c == 0) docs
        else if (mode == "disjoint") docs.select(
          (col("doc_id") + lit(c * 10000000L)).as("doc_id"),
          array_join(transform(split(col("text"), " "),
            w => concat(w, lit("~" + c))), " ").as("text"),
          col("lang"), col("source"), col("n_chars"))
        else docs.select(
          (col("doc_id") + lit(c * 10000000L)).as("doc_id"),
          array_join(transform(array_sort(zip_with(
            split(col("text"), " "),
            sequence(lit(1), size(split(col("text"), " "))),
            (w, i) => struct(xxhash64(concat_ws("#", w, i, lit(c))).as("h"),
              w.as("w")))),
            s => s.getField("w")), " ").as("text"),
          col("lang"), col("source"), col("n_chars"))
      }
      write(copies.reduce(_ unionByName _), "documents")
    }

    // embeddings: 4 copies, dimensions cyclically rotated per copy
    locally {
      val emb = spark.read.parquet(s"$src/embeddings.parquet")
      val dim = emb.select(size(col("embedding"))).head().getInt(0)
      val copies = (0 until 4).map { c =>
        if (c == 0) emb
        else {
          val shift = c * (dim / 4)
          emb.select(
            (col("vec_id") + lit(c * 10000000L)).as("vec_id"),
            concat(
              slice(col("embedding"), shift + 1, dim - shift),
              slice(col("embedding"), 1, shift)).as("embedding"),
            col("label"))
        }
      }
      write(copies.reduce(_ unionByName _), "embeddings")
    }

    // events: 10 copies, fresh ids and users, same time window (denser day)
    locally {
      val ev = spark.read.parquet(s"$src/events.parquet")
      val copies = (0 until 10).map { c =>
        ev.select(
          (col("event_id") + lit(c * 100000000L)).as("event_id"), col("ts"),
          (col("user_id") + lit(c * 10000000L)).as("user_id"),
          col("event_type"), col("value"), col("props"))
      }
      write(copies.reduce(_ unionByName _), "events")
    }

    // orders: 10 copies, fresh order/customer keys per copy — per-customer
    // window sizes preserved (the organic shape for the SCD2/snapshot-diff
    // family: u4's per-custkey windows and u5's key-hashed full-outer join
    // both scale with rows, not with per-key density). Key steps leave the
    // +1e7 headroom u5's runtime insert synthesis adds within each copy.
    //
    // INTENTIONAL FK BREAK (ADVICE r18 #5): lineitem and customer pass
    // through verbatim, so copies 1-9 DANGLE on every orders-lineitem /
    // orders-customer join — fine for the per-custkey-window family (u4/u5,
    // self-contained in orders) this scaling exists for, but a JOIN-shaped
    // sf1 probe over orders would silently lose ~90% of its matches and
    // measure the wrong thing. Probe orders-joining queries at sf1 only
    // after scaling their join partners too.
    locally {
      val ord = spark.read.parquet(s"$src/orders.parquet")
      val copies = (0 until 10).map { c =>
        ord.withColumn("o_orderkey", col("o_orderkey") + lit(c * 100000000L))
          .withColumn("o_custkey", col("o_custkey") + lit(c * 10000000L))
      }
      write(copies.reduce(_ unionByName _), "orders")
    }

    // dimension tables pass through verbatim (warmup-only at sf1)
    Seq("region", "nation", "customer", "supplier", "part",
      "lineitem").foreach { t =>
      write(spark.read.parquet(s"$src/$t.parquet"), t)
    }
  }
}
