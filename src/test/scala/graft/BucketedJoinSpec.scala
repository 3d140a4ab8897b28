package graft

import graft.operators.ScaleOps
import org.apache.spark.sql.functions._

/** Bucketing buys shuffle-free joins: write both sides bucketed on the join
  * key, and the join plans without an Exchange — the one-time-shuffle-at-
  * ingest pattern for repeated 100 TB fact joins.
  */
class BucketedJoinSpec extends SparkTestBase {

  test("join of two bucketed tables plans without a shuffle") {
    val s = spark
    import s.implicits._
    val dir = java.nio.file.Files.createTempDirectory("buckets").toString
    val a = (1L to 1000L).map(i => (i, s"a$i")).toDF("id", "av")
    val b = (1L to 1000L).map(i => (i, i * 2.0)).toDF("id", "bv")
    ScaleOps.writeBucketed(a, "bt_a", s"$dir/a", Seq("id"), 4)
    ScaleOps.writeBucketed(b, "bt_b", s"$dir/b", Seq("id"), 4)
    val joined = s.table("bt_a").join(s.table("bt_b"), "id")
    val plan = joined.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange hashpartitioning"),
      s"bucketed join still shuffles:\n$plan")
    assert(joined.count() == 1000)
    s.sql("DROP TABLE bt_a"); s.sql("DROP TABLE bt_b")
  }
}
