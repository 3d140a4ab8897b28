package graft

import org.apache.spark.sql.functions._

/** Behavior of the text interchange sources (CSV / JSON-lines) on REAL
  * ingest conditions: malformed rows must be quarantined (PERMISSIVE) or
  * fail loudly (FAILFAST) — never silently coerced — and doubles must
  * survive the text round-trip bit-for-bit (the property the d82/d83
  * battery oracles rely on).
  */
class TextSourcesSpec extends SparkTestBase {

  private def tmpDir(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"graft-$tag").toString

  test("CSV PERMISSIVE mode quarantines malformed rows into the corrupt-record column") {
    val dir = tmpDir("csv-corrupt")
    val lines = Seq(
      "id,name,score",
      "1,alice,10.5",
      "2,bob,not_a_number", // malformed double
      "3,carol,7.25")
    java.nio.file.Files.write(java.nio.file.Paths.get(dir, "part.csv"),
      String.join("\n", lines: _*).getBytes("UTF-8"))
    val df = spark.read
      .option("header", "true")
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_bad")
      .schema("id BIGINT, name STRING, score DOUBLE, _bad STRING")
      .csv(dir)
      .cache() // corrupt-record column requires the parsed row to be retained
    val good = df.filter(col("_bad").isNull).select(col("id")).collect().map(_.getLong(0))
    val bad = df.filter(col("_bad").isNotNull).select(col("_bad")).collect().map(_.getString(0))
    assert(good.toSet == Set(1L, 3L))
    assert(bad.toSeq == Seq("2,bob,not_a_number"), s"quarantined: ${bad.toSeq}")
    df.unpersist()
  }

  test("CSV FAILFAST mode refuses malformed rows instead of importing nulls") {
    val dir = tmpDir("csv-failfast")
    java.nio.file.Files.write(java.nio.file.Paths.get(dir, "part.csv"),
      "id,score\n1,ok_this_is_not_a_double\n".getBytes("UTF-8"))
    val ex = intercept[org.apache.spark.SparkException] {
      spark.read.option("header", "true").option("mode", "FAILFAST")
        .schema("id BIGINT, score DOUBLE").csv(dir).collect()
    }
    assert(ex.getMessage.contains("Malformed") || ex.getCause != null)
  }

  test("JSON PERMISSIVE mode quarantines unparseable lines") {
    val dir = tmpDir("json-corrupt")
    val lines = Seq(
      """{"id": 1, "score": 10.5}""",
      """{"id": 2, "score": }""", // invalid JSON
      """{"id": 3, "score": 7.25}""")
    java.nio.file.Files.write(java.nio.file.Paths.get(dir, "part.json"),
      String.join("\n", lines: _*).getBytes("UTF-8"))
    val df = spark.read
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_bad")
      .schema("id BIGINT, score DOUBLE, _bad STRING")
      .json(dir)
      .cache()
    assert(df.filter(col("_bad").isNull).count() == 2)
    assert(df.filter(col("_bad").isNotNull).count() == 1)
    df.unpersist()
  }

  test("doubles survive the CSV text round-trip bit-for-bit") {
    val s = spark
    import s.implicits._
    val dir = tmpDir("csv-doubles")
    // awkward values: shortest-repr edge cases, negative zero, extremes
    val vals = Seq(0.1, 1.0 / 3.0, -0.0, 1.7976931348623157e308,
      4.9e-324, 123456.789012345, -2.2250738585072014e-308)
    vals.toDF("x").write.mode("overwrite").option("header", "true").csv(dir)
    val back = spark.read.option("header", "true").schema("x DOUBLE").csv(dir)
      .collect().map(_.getDouble(0))
    assert(back.map(java.lang.Double.doubleToRawLongBits).sorted.toSeq ==
      vals.map(java.lang.Double.doubleToRawLongBits).sorted.toSeq,
      s"bits changed in round-trip: ${back.toSeq} vs $vals")
  }
}
