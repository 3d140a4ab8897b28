package graft

import org.apache.spark.sql.functions._

/** Pin for the events.ts physical-representation adaptivity: the driver's
  * data drops have shipped `ts` as BOTH nanosecond timestamps (surfacing as
  * BIGINT nanos under nanosAsLong) and microsecond timestamps (TIMESTAMP /
  * TIMESTAMP_NTZ) — a round-4→5 regeneration flipped the type and broke 20
  * tests at analysis time. [[Tables.tsMs]] must floor every representation
  * to the SAME epoch-millis value DuckDB's `epoch_ms` produces.
  */
class TablesSpec extends SparkTestBase {

  // 2001-09-09T01:46:40.123456Z plus a sub-ms tail in the nanos form:
  // the .456 µs (and .789 ns) must FLOOR away, never round up
  private val wantMs = 1000000000123L

  test("tsMs floors BIGINT nanos (legacy nanosAsLong representation)") {
    val s = spark
    import s.implicits._
    val df = Seq(1000000000123456789L).toDF("ts")
    assert(df.select(Tables.tsMs(df)).head.getLong(0) == wantMs)
  }

  test("tsMs floors TIMESTAMP_NTZ micros under the pinned-UTC session") {
    val s = spark
    import s.implicits._
    val df = Seq(1000000000123456L).toDF("us")
      .select(expr("make_timestamp_ntz(2001, 9, 9, 1, 46, 40.123456)").as("ts"))
    assert(df.schema("ts").dataType ==
      org.apache.spark.sql.types.TimestampNTZType)
    assert(df.select(Tables.tsMs(df)).head.getLong(0) == wantMs)
  }

  test("tsMs floors TIMESTAMP (ltz) micros") {
    val s = spark
    import s.implicits._
    val df = Seq(1000000000123456L).toDF("us")
      .select(timestamp_micros(col("us")).as("ts"))
    assert(df.schema("ts").dataType ==
      org.apache.spark.sql.types.TimestampType)
    assert(df.select(Tables.tsMs(df)).head.getLong(0) == wantMs)
  }

  test("tsMs rejects an unknown representation loudly") {
    val s = spark
    import s.implicits._
    val df = Seq("2001-09-09").toDF("ts")
    intercept[IllegalStateException] { Tables.tsMs(df) }
  }

  test("the live testdata round-trips through tsMs (whatever this drop's type is)") {
    val ev = Tables.events(spark, "/root/testdata/sf0.001")
    val row = ev.agg(min(col("ts_ms")), max(col("ts_ms"))).head
    // epoch-ms sanity bounds: 2000-01-01 .. 2100-01-01
    assert(row.getLong(0) > 946684800000L && row.getLong(1) < 4102444800000L,
      s"ts_ms out of sane epoch-ms range: $row")
  }
}
