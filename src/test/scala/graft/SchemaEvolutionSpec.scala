package graft

import graft.sources.SchemaEvolution
import org.apache.spark.sql.functions._

class SchemaEvolutionSpec extends SparkTestBase {

  test("merged read unions schemas; defaults backfill only pre-evolution rows") {
    val s = spark
    import s.implicits._
    val root = java.nio.file.Files.createTempDirectory("graft-evolve").toString
    try {
      Seq((1L, "alpha"), (2L, "beta")).toDF("id", "name")
        .write.parquet(s"$root/v1")
      Seq((3L, "gamma", "fr"), (4L, null.asInstanceOf[String], "de"))
        .toDF("id", "name", "lang")
        .write.parquet(s"$root/v2")
      val got = SchemaEvolution.readMergedParquet(s, Seq(s"$root/v1", s"$root/v2"),
        Map("lang" -> lit("und")))
      assert(got.columns.toSet == Set("id", "name", "lang"))
      assertMultiset(
        got.select(col("id"), col("name"), col("lang"))
          .as[(Long, String, String)].collect().toSeq,
        Seq((1L, "alpha", "und"), (2L, "beta", "und"),
          (3L, "gamma", "fr"), (4L, null, "de")))
      // a default may compute from other columns of the row
      val computed = SchemaEvolution.readMergedParquet(s, Seq(s"$root/v1", s"$root/v2"),
        Map("lang" -> concat(lit("und-"), col("name"))))
        .filter(col("id") === 1L).select(col("lang")).as[String].collect()
      assert(computed.toSeq == Seq("und-alpha"))
      // a default naming a column absent from the merged schema fails loudly
      intercept[IllegalArgumentException] {
        SchemaEvolution.readMergedParquet(s, Seq(s"$root/v1"), Map("nope" -> lit(1)))
      }
      // a type CONFLICT across producers fails the merge instead of coercing
      Seq(("x", 1L)).toDF("id2", "v").write.parquet(s"$root/c1")
      Seq(("y", "s")).toDF("id2", "v").write.parquet(s"$root/c2")
      intercept[Exception] {
        SchemaEvolution.readMergedParquet(s, Seq(s"$root/c1", s"$root/c2"))
          .collect()
      }
    } finally deleteRecursively(root)
  }
}
