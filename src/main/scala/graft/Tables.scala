package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Loaders for the driver-generated test tables (TESTDATA.md).
  *
  * `events.parquet` carries nanosecond parquet timestamps, which Spark's
  * parquet reader rejects ([PARQUET_TYPE_ILLEGAL]); sessions must set
  * `spark.sql.legacy.parquet.nanosAsLong=true` (see [[GraftSession]]), which
  * surfaces `ts` as BIGINT nanos. [[events]] derives `ts_ms` (epoch millis,
  * integral floor) — the canonical event-time column, chosen because DuckDB's
  * `epoch_ms(ts)` floors identically, so window boundaries hash-match the
  * oracle exactly.
  */
object Tables {
  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame = table(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame = table(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame = table(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = table(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame = table(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame = table(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame = table(s, d, "lineitem")
  def documents(s: SparkSession, d: String): DataFrame = table(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = table(s, d, "embeddings")

  /** events with `ts_ms` BIGINT epoch-millis (ns → ms integral floor). */
  def events(s: SparkSession, d: String): DataFrame =
    table(s, d, "events").withColumn("ts_ms", expr("CAST(ts DIV 1000000 AS BIGINT)"))
}

/** Session factory with the engine's standard config. */
object GraftSession {
  def builder(cpus: Int): SparkSession.Builder =
    SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus.toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.serializer", "org.apache.spark.serializer.KryoSerializer")
      .config("spark.kryo.registrator", "graft.core.GraftKryoRegistrator")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
}
