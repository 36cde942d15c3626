package graft.operators

import graft.plans.GraftFunctions.dotLong
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Similarity search over an embedding column (`array<float>`).
  *
  * Exactness strategy: embeddings are quantized to integers
  * (round(x * 1000)) before any arithmetic. Integer dot products are exact
  * under ANY accumulation order (every partial sum is an integer-valued
  * double << 2^53), so Spark and a SQL oracle agree bit-for-bit — floats
  * would differ in the last ulp depending on fold order.
  *
  * Performance strategy: the dot-product kernel is a native codegen'd
  * Catalyst expression (graft.plans.DotProductLong — measured ~50x over
  * `aggregate(zip_with(...))` interpreted lambdas), and per-vector norms are
  * computed once before any pairwise join, so per-pair work is one dot and
  * one division.
  *
  * Scale strategy: brute-force top-k broadcasts the (small) query set and
  * streams the candidate table once — no shuffle of the big side. The LSH
  * variant buckets vectors by random-hyperplane sign bits over multiple
  * tables so candidate generation joins only within (table, bucket);
  * hyperplanes are md5-derived constants, identical on every node (and in
  * tests) with no coordination.
  */
object Similarity {

  val QuantScale = 1000

  /** array<float> -> array<long>, exact integer quantization. */
  def quantize(v: Column): Column =
    transform(v, x => round(x.cast("double") * QuantScale).cast("long"))

  /** Exact integer dot product of two quantized vectors (native codegen). */
  def idot(a: Column, b: Column): Column = dotLong(a, b)

  /** (id, qv, nrm) projection: quantized vector + its L2 norm, computed once
    * per vector — never per pair.
    */
  private def prepared(df: DataFrame, idCol: String, vecCol: String): DataFrame =
    df.select(col(idCol).as("sid"), quantize(col(vecCol)).as("qv"))
      .withColumn("nrm", sqrt(dotLong(col("qv"), col("qv")).cast("double")))

  /** Cosine from a pairwise dot and two precomputed norms. `nullif` guards
    * zero-norm vectors (all components quantize to 0): cosine is undefined
    * there, and under ANSI mode a bare division would abort the job — NULL
    * drops them from thresholds and sorts last in rankings instead.
    */
  private def pairCosine(av: Column, bv: Column, an: Column, bn: Column): Column =
    dotLong(av, bv).cast("double") / nullif(an * bn, lit(0.0))

  /** Cosine of two quantized vectors (self-contained form, for callers
    * without precomputed norms).
    */
  def cosineQ(a: Column, b: Column): Column =
    dotLong(a, b).cast("double") / nullif(
      sqrt(dotLong(a, a).cast("double")) * sqrt(dotLong(b, b).cast("double")),
      lit(0.0))

  /** Brute-force top-k cosine neighbors of each query vector.
    * `queries` must be small (it is broadcast); `candidates` can be any size.
    */
  def bruteForceTopK(queries: DataFrame, candidates: DataFrame, idCol: String,
                     vecCol: String, k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val q = prepared(queries, idCol, vecCol)
      .select(col("sid").as("qid"), col("qv").as("qqv"), col("nrm").as("qnrm"))
    val c = prepared(candidates, idCol, vecCol)
      .select(col("sid").as("nid"), col("qv").as("nqv"), col("nrm").as("nnrm"))
    val scored = c.crossJoin(broadcast(q))
      .filter(col("qid") =!= col("nid"))
      .select(col("qid"), col("nid"),
        pairCosine(col("qqv"), col("nqv"), col("qnrm"), col("nnrm")).as("cosine"))
    val w = Window.partitionBy(col("qid"))
      .orderBy(col("cosine").desc, col("nid").asc)
    scored.withColumn("rank", row_number().over(w).cast("long")).filter(col("rank") <= k)
  }

  /** All pairs with cosine >= threshold — brute-force O(n^2) baseline for
    * embedding near-dup detection (use `lshTopK`'s bucketing at scale).
    */
  def nearDupPairs(df: DataFrame, idCol: String, vecCol: String,
                   threshold: Double): DataFrame = {
    val v = prepared(df, idCol, vecCol)
    v.as("a").join(v.as("b"), col("a.sid") < col("b.sid"))
      .select(col("a.sid").as("ida"), col("b.sid").as("idb"),
        pairCosine(col("a.qv"), col("b.qv"), col("a.nrm"), col("b.nrm")).as("cosine"))
      .filter(col("cosine") >= threshold)
  }

  // ---- IVF (inverted-file) ANN --------------------------------------------

  /** IVF-flat ANN: partition vectors into `nCells` cells around centroid
    * vectors; a query probes its `nProbe` closest cells and ranks only their
    * members. Centroids here are deterministic data samples (the lowest ids)
    * rather than k-means output — the index-build trade is recall for a
    * training-free, reproducible build; swap in Lloyd iterations for real
    * workloads without touching the probe path.
    *
    * Scale shape: the centroid table is tiny and broadcast; assignment is a
    * map-side cross with nCells dots per row; the candidate join is keyed by
    * cell id, so work scales with cell occupancy, not n^2.
    */
  def ivfTopK(df: DataFrame, idCol: String, vecCol: String, nCells: Int,
              nProbe: Int, k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val v = prepared(df, idCol, vecCol)
    val centroids = broadcast(
      v.orderBy(col("sid")).limit(nCells)
        .select(col("sid").as("cid"), col("qv").as("cv"), col("nrm").as("cnrm")))

    val scoredCells = v.crossJoin(centroids)
      .select(col("sid"), col("qv"), col("nrm"), col("cid"),
        pairCosine(col("qv"), col("cv"), col("nrm"), col("cnrm")).as("ccos"))
    val byCell = Window.partitionBy(col("sid"))
      .orderBy(col("ccos").desc, col("cid").asc)
    val ranked = scoredCells.withColumn("crank", row_number().over(byCell))

    val members = ranked.filter(col("crank") === 1) // each vector lives in 1 cell
      .select(col("cid"), col("sid").as("nid"), col("qv").as("nqv"), col("nrm").as("nnrm"))
    val probes = ranked.filter(col("crank") <= nProbe) // each query probes nProbe cells
      .select(col("cid"), col("sid").as("qid"), col("qv").as("qqv"), col("nrm").as("qnrm"))

    // No dedup needed: each nid lives in exactly one cell, so a (qid, nid)
    // pair appears at most once. (A dropDuplicates here shuffled a million
    // array-carrying rows — project down to the cosine BEFORE any shuffle.)
    val scored = probes.join(members, Seq("cid"))
      .filter(col("qid") =!= col("nid"))
      .select(col("qid"), col("nid"),
        pairCosine(col("qqv"), col("nqv"), col("qnrm"), col("nnrm")).as("cosine"))
    val w = Window.partitionBy(col("qid")).orderBy(col("cosine").desc, col("nid").asc)
    scored.withColumn("rank", row_number().over(w).cast("long")).filter(col("rank") <= k)
  }

  // ---- random-hyperplane LSH ----------------------------------------------

  /** Deterministic pseudo-random hyperplane for (table, plane): components in
    * [-1000, 1000] derived from md5 on the DRIVER (same formula as
    * Dedup.hash32) and shipped as a literal — no randomness, no broadcast.
    */
  def plane(t: Int, m: Int, dim: Int): Array[Long] =
    Array.tabulate(dim) { j =>
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(s"plane_${t}_${m}_$j".getBytes("UTF-8"))
      val hex8 = md.take(4).map(b => f"$b%02x").mkString
      java.lang.Long.parseLong(hex8, 16) % 2001 - 1000
    }

  /** Sign-bucket id in table `t`: one codegen'd dot per plane. (Literal-
    * plane form — compact for a few planes; `planesTable` scales better.)
    */
  def lshBucket(v: Column, dim: Int, t: Int, nPlanes: Int): Column =
    (0 until nPlanes).map { m =>
      when(dotLong(v, typedLit(plane(t, m, dim).toSeq)) > 0, lit(1L << m))
        .otherwise(0L)
    }.reduce(_ + _)

  /** All (table, plane, weight-vector) rows as a small broadcastable frame.
    * Inlining nTables x nPlanes literal planes into one expression works but
    * hands janino an enormous method to compile per run; a broadcast join
    * against a planes table keeps every codegen unit small and shifts the
    * bucket computation to a (rows x planes) join + group-by — the same
    * plan shape at 2,000 or 2 billion vectors.
    */
  private def planesTable(spark: org.apache.spark.sql.SparkSession,
                          dim: Int, nTables: Int, nPlanes: Int): DataFrame = {
    import spark.implicits._
    (for { t <- 0 until nTables; m <- 0 until nPlanes }
      yield (t, m, plane(t, m, dim).toSeq)).toDF("tbl", "m", "pv")
  }

  /** (sid, tbl, bucket, qv, nrm): each vector's sign-bucket id in every LSH
    * table — the shared index-build step of `lshTopK` and `lshNearDupPairs`.
    */
  private def lshBuckets(df: DataFrame, idCol: String, vecCol: String,
                         dim: Int, nTables: Int, nPlanes: Int): DataFrame = {
    val v = prepared(df, idCol, vecCol)
    val planes = planesTable(df.sparkSession, dim, nTables, nPlanes)
    v.crossJoin(broadcast(planes))
      .select(col("sid"), col("qv"), col("nrm"), col("tbl"),
        when(dotLong(col("qv"), col("pv")) > 0, expr("shiftleft(CAST(1 AS BIGINT), m)"))
          .otherwise(0L).as("bit"))
      .groupBy(col("sid"), col("tbl"))
      .agg(first(col("qv")).as("qv"), first(col("nrm")).as("nrm"),
        sum(col("bit")).as("bucket"))
  }

  /** Multi-table LSH ANN: `nTables` independent hyperplane tables; candidate
    * pairs share a bucket in ANY table (union -> distinct), then exact
    * cosine ranks the union. More tables = higher recall at linear candidate
    * cost. Joins only happen within (table, bucket) — subquadratic at scale.
    */
  def lshTopK(df: DataFrame, idCol: String, vecCol: String, dim: Int,
              nTables: Int, nPlanes: Int, k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val buckets = lshBuckets(df, idCol, vecCol, dim, nTables, nPlanes)
    val cands = buckets.as("a")
      .join(buckets.as("b"),
        col("a.tbl") === col("b.tbl") && col("a.bucket") === col("b.bucket") &&
          col("a.sid") =!= col("b.sid"))
      .select(col("a.sid").as("qid"), col("a.qv").as("qqv"), col("a.nrm").as("qnrm"),
        col("b.sid").as("nid"), col("b.qv").as("nqv"), col("b.nrm").as("nnrm"))
      .dropDuplicates("qid", "nid")
    val scored = cands.select(col("qid"), col("nid"),
      pairCosine(col("qqv"), col("nqv"), col("qnrm"), col("nnrm")).as("cosine"))
    val w = Window.partitionBy(col("qid")).orderBy(col("cosine").desc, col("nid").asc)
    scored.withColumn("rank", row_number().over(w).cast("long")).filter(col("rank") <= k)
  }

  /** LSH-bucketed near-dup pairs — the SCALE PATH for `nearDupPairs`: exact
    * cosine is computed only for pairs sharing a bucket in some table, so
    * work scales with bucket occupancy instead of corpus². Precision is 1 by
    * construction (every emitted pair passes the exact threshold); recall is
    * the LSH trade — raise `nTables` to buy recall at linear cost.
    */
  def lshNearDupPairs(df: DataFrame, idCol: String, vecCol: String, dim: Int,
                      nTables: Int, nPlanes: Int, threshold: Double): DataFrame = {
    val buckets = lshBuckets(df, idCol, vecCol, dim, nTables, nPlanes)
    buckets.as("a")
      .join(buckets.as("b"),
        col("a.tbl") === col("b.tbl") && col("a.bucket") === col("b.bucket") &&
          col("a.sid") < col("b.sid"))
      .select(col("a.sid").as("ida"), col("a.qv").as("aqv"), col("a.nrm").as("anrm"),
        col("b.sid").as("idb"), col("b.qv").as("bqv"), col("b.nrm").as("bnrm"))
      .dropDuplicates("ida", "idb")
      .select(col("ida"), col("idb"),
        pairCosine(col("aqv"), col("bqv"), col("anrm"), col("bnrm")).as("cosine"))
      .filter(col("cosine") >= threshold)
  }
}
