package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** WindowRankToTopK optimizer rule: the row_number-filter idiom must plan
  * through TopKPerKeyExec with identical results, and ineligible shapes must
  * be left alone.
  */
class WindowRankRewriteSpec extends SparkTestBase {

  private def data() = {
    val s = spark
    import s.implicits._
    (1 to 500).map(i => (i % 7, i.toLong, (i * 37 % 101).toDouble)).toDF("k", "id", "v")
      .repartition(8)
  }

  private def usesTopK(df: DataFrame): Boolean =
    df.queryExecution.executedPlan.toString.contains("TopKPerKey")

  /** Driver-side truth: top-k per key under (v desc, id asc), with rank. */
  private def expected(k: Int): Seq[(Int, Long, Long)] =
    data().collect().map(r => (r.getInt(0), r.getLong(1), r.getDouble(2)))
      .groupBy(_._1).toSeq.flatMap { case (_, rows) =>
        rows.sortBy { case (_, id, v) => (-v, id) }.take(k).zipWithIndex
          .map { case ((key, id, _), i) => (key, id, (i + 1).toLong) }
      }

  test("rewrites the idiom (with cast alias) and keeps results + ranks identical") {
    val w = Window.partitionBy("k").orderBy(col("v").desc, col("id"))
    val q = data().withColumn("rnk", row_number().over(w).cast("long"))
      .filter(col("rnk") <= 3)
      .select("k", "id", "rnk")
    assert(usesTopK(q), q.queryExecution.executedPlan.toString)
    val got = q.collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).toSeq
    assertMultiset(got, expected(3))
  }

  test("extra filter conjuncts survive the rewrite") {
    val w = Window.partitionBy("k").orderBy(col("v").desc, col("id"))
    val q = data().withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= 5 && col("id") % 2 === 0)
      .select("k", "id", "rnk")
    assert(usesTopK(q), q.queryExecution.executedPlan.toString)
    val got = q.collect().map(r => (r.getInt(0), r.getLong(1), r.getInt(2).toLong)).toSeq
    assertMultiset(got, expected(5).filter(_._2 % 2 == 0))
  }

  test("rnk = 1 (argmax per key) rewrites") {
    val w = Window.partitionBy("k").orderBy(col("v").desc, col("id"))
    val q = data().withColumn("rnk", row_number().over(w)).filter(col("rnk") === 1)
      .select("k", "id")
    assert(usesTopK(q), q.queryExecution.executedPlan.toString)
    val got = q.collect().map(r => (r.getInt(0), r.getLong(1))).toSeq
    assertMultiset(got, expected(1).map(t => (t._1, t._2)))
  }

  test("ineligible shapes are untouched: rank(), global window, huge k") {
    val w = Window.partitionBy("k").orderBy(col("v").desc, col("id"))
    val rankFn = data().withColumn("r", rank().over(w)).filter(col("r") <= 3)
    assert(!usesTopK(rankFn))
    val global = data()
      .withColumn("r", row_number().over(Window.orderBy(col("v").desc, col("id"))))
      .filter(col("r") <= 3)
    assert(!usesTopK(global))
    val hugeK = data().withColumn("r", row_number().over(w))
      .filter(col("r") <= 10000000)
    assert(!usesTopK(hugeK))
    // orderBy(rand()) DOES rewrite — and is safe: the analyzer pulls the
    // nondeterministic expression into a child Project, so every operator
    // pass reads the same materialized value (row count stays exact)
    val nondet = data()
      .withColumn("r", row_number().over(Window.partitionBy("k").orderBy(rand(7))))
      .filter(col("r") <= 3)
    assert(usesTopK(nondet))
    assert(nondet.count() == 7 * 3)
  }

  test("battery q09 plans through the custom operator") {
    val q = Queries.q09WindowRank(spark, "/root/testdata/sf0.001")
    assert(usesTopK(q), q.queryExecution.executedPlan.toString)
    assert(q.count() > 0)
  }
}
