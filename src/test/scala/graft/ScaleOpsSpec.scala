package graft

import graft.api.Pipeline
import graft.core._
import graft.operators.ScaleOps
import org.apache.spark.sql.functions._

class ScaleOpsSpec extends SparkTestBase {

  test("saltedAggregate equals plain aggregate on a skewed key") {
    val s = spark
    import s.implicits._
    // one hot key (90% of rows) + long tail
    val df = ((1 to 900).map(i => ("hot", i.toDouble)) ++
      (1 to 100).map(i => (s"k$i", i.toDouble))).toDF("k", "v")
    val salted = ScaleOps.saltedAggregate(df, Seq("k"), 8,
        partials = Seq(count(lit(1)).as("n"), sum(col("v")).as("s")),
        merges = Seq(sum(col("n")).as("n"), round(sum(col("s")), 6).as("s")))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSeq
    val plain = df.groupBy("k")
      .agg(count(lit(1)).as("n"), round(sum(col("v")), 6).as("s"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSeq
    assertMultiset(salted, plain)
  }

  test("bundle finalization runs after task commit, exceptions swallowed (ray_runner_test.py:1021-1081)") {
    val p = Pipeline(spark)
    val fired = p.metrics.counter("fin", "fired-" + System.nanoTime() % 100000)
    val out = p.create(1 to 10).reshuffle(2)
      .parDo(new DoFn[Int, Int] {
        def process(e: Int, ctx: ProcessContext[Int]): Unit = {
          if (e == 1) {
            ctx.registerFinalization(() => fired.add(1L))
            ctx.registerFinalization(() => throw new RuntimeException("swallowed"))
          }
          ctx.output(e)
        }
      }).collect()
    assertMultiset(out, (1 to 10).toSeq)
    // callback ran exactly once (one task registered), and the throwing
    // callback didn't fail the job
    assert(fired.value == 1L)
  }
}
