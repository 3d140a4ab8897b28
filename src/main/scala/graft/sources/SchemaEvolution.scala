package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Schema-evolution reads: one logical table whose parquet files were
  * written by different producer versions (columns added over time) is read
  * as the UNION schema, with caller-supplied backfill expressions for rows
  * from before a column existed — the additive-evolution contract every
  * long-lived 100 TB table ends up needing (the reference reads evolving
  * Beam rows the same way: new fields appear as absent/None on old records).
  *
  * `spark.read.option("mergeSchema")` does the heavy lifting (footer schemas
  * are merged DISTRIBUTEDLY — Spark fans footer reading out to tasks, so a
  * million-file table does not serialize schema discovery on the driver);
  * rows from files that lack a merged column surface it as null, and
  * `defaults` then rewrites exactly those nulls. Contract: evolution must be
  * additive (new columns) or parquet-widening-compatible — a column that
  * CHANGED type across producers fails the merge loudly rather than
  * silently coercing, which is the behavior a data-integrity-minded
  * pipeline wants.
  *
  * A default may reference other columns of the row (e.g. backfill
  * `n_chars` as `length(text)`), not just literals. Columns the caller maps
  * that carry genuine nulls in NEW files are also rewritten — list only
  * columns whose null unambiguously means "predates the column".
  */
object SchemaEvolution {

  def readMergedParquet(spark: SparkSession, paths: Seq[String],
      defaults: Map[String, Column] = Map.empty): DataFrame = {
    require(paths.nonEmpty, "need at least one input path")
    val df = spark.read.option("mergeSchema", "true").parquet(paths: _*)
    val missing = defaults.keySet.diff(df.columns.toSet)
    require(missing.isEmpty,
      s"defaults for columns absent from the merged schema: $missing")
    defaults.foldLeft(df) { case (acc, (c, default)) =>
      acc.withColumn(c, coalesce(col(c), default))
    }
  }
}
