package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  * The real work lives in [[Queries]] (query battery), [[graft.api.Pipeline]]
  * (dataflow layer) and [[graft.operators]] / [[graft.functions]]
  * (extensions).
  */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    Queries.q03JoinRevenue(spark, "/root/testdata/sf0.001")
  }

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Queries.all

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for xxhash-based/approximate ops
    * (rows-only check).
    */
  def oracleSql: Map[String, String] = Queries.oracles
}
