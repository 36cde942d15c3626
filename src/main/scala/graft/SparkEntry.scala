package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Queries are assembled from the per-domain registries; every entry with an
  * oracle is hash-checked against DuckDB by the driver at sf0.01.
  */
object SparkEntry {

  /** All verifiable query definitions, by domain. */
  def allDefs: Seq[QueryDef] =
    graft.queries.EtlQueries.defs ++ graft.queries.CorpusQueries.defs ++
      graft.queries.MiningQueries.defs ++ graft.queries.AppQueries.defs

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame = {
    val d = "/root/testdata/sf0.001"
    allDefs.head.fn(spark, d)
  }

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    allDefs.map(q => q.name -> q.fn).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops.
    */
  def oracleSql: Map[String, String] =
    allDefs.flatMap(q => q.oracle.map(q.name -> _)).toMap
}
