package graft

/** Isolates the per-job fixed cost of the local-mode scheduler (guide §1:
  * measure before tuning): times batches of minimal jobs of increasing
  * shape — empty-stage actions, 1-task scans, one-shuffle aggregates with
  * AQE on and off — so the ~tens-of-ms per-job floor seen across the
  * battery's tail can be attributed (scheduling vs planning vs AQE stage
  * materialization) instead of guessed at.
  *
  * Usage: runMain graft.JobFloorProbe
  */
object JobFloorProbe {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = GraftSession.builder(cpus).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import org.apache.spark.sql.functions._
    val sc = spark.sparkContext

    def time(name: String, n: Int)(body: => Unit): Unit = {
      body // warm
      val t0 = System.nanoTime()
      (1 to n).foreach(_ => body)
      val dt = (System.nanoTime() - t0) / 1e6 / n
      println(f"[floor] $name%-46s ${dt}%8.2f ms/iter")
    }

    // raw scheduler floor: one job, one empty task
    val one = sc.parallelize(Seq(1), 1)
    time("rdd 1-task count", 50) { one.count() }
    time("rdd 32-task count", 50) { sc.parallelize(1 to 32, 32).count() }
    // SQL no-shuffle action (plan + codegen cache hit + 1 task)
    val r = spark.range(1)
    time("sql range(1) toRdd.foreach (reused plan)", 50) {
      r.queryExecution.toRdd.foreach(_ => ())
    }
    time("sql range(1) fresh plan each iter", 50) {
      spark.range(1).queryExecution.toRdd.foreach(_ => ())
    }
    // one shuffle, AQE on (session default): stage-job per exchange
    time("sql 1-shuffle agg, fresh plan, AQE on", 30) {
      spark.range(100).groupBy((col("id") % 4).as("k"))
        .count().queryExecution.toRdd.foreach(_ => ())
    }
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    time("sql 1-shuffle agg, fresh plan, AQE off", 30) {
      spark.range(100).groupBy((col("id") % 4).as("k"))
        .count().queryExecution.toRdd.foreach(_ => ())
    }
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    // two chained shuffles, AQE on/off
    time("sql 2-shuffle agg+agg, fresh plan, AQE on", 30) {
      spark.range(100).groupBy((col("id") % 8).as("k")).count()
        .groupBy((col("k") % 2).as("j")).sum("count")
        .queryExecution.toRdd.foreach(_ => ())
    }
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    time("sql 2-shuffle agg+agg, fresh plan, AQE off", 30) {
      spark.range(100).groupBy((col("id") % 8).as("k")).count()
        .groupBy((col("k") % 2).as("j")).sum("count")
        .queryExecution.toRdd.foreach(_ => ())
    }
    spark.stop()
  }
}
