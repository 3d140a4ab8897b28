package graft

import org.apache.spark.sql.streaming.StreamingQueryListener

/** Measurement aid for the streaming battery rows (guide §1): registers a
  * StreamingQueryListener that prints every micro-batch's durationMs
  * breakdown (addBatch / getBatch / latestOffset / queryPlanning /
  * walCommit / commitOffsets / stateStore commit times ride inside
  * addBatch) plus batch row counts, then runs the named battery rows once.
  * Separates "fixed AvailableNow restart machinery" from "actual batch
  * work" per row without touching the rows themselves.
  *
  * Usage: runMain graft.StreamProbe <sfDir> <row> [row ...]
  */
object StreamProbe {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: StreamProbe <sfDir> <row> [row ...]")
    val sfDir = args(0)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = GraftSession.builder(cpus).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Tables.lineitem(spark, sfDir).count()
    spark.streams.addListener(new StreamingQueryListener {
      override def onQueryStarted(
          e: StreamingQueryListener.QueryStartedEvent): Unit =
        println(s"[stream] started ${e.id} at ${System.nanoTime() / 1000000}")
      override def onQueryProgress(
          e: StreamingQueryListener.QueryProgressEvent): Unit = {
        val p = e.progress
        println(s"[stream] batch=${p.batchId} rows=${p.numInputRows} " +
          s"durations=${p.durationMs} state=${
            p.stateOperators.map(s => s"rows=${s.numRowsTotal} " +
              s"commitMs=${s.commitTimeMs}").mkString(";")}")
      }
      override def onQueryTerminated(
          e: StreamingQueryListener.QueryTerminatedEvent): Unit =
        println(s"[stream] terminated at ${System.nanoTime() / 1000000}")
    })
    args.drop(1).foreach { name =>
      val fn = SparkEntry.queries(name)
      (1 to 2).foreach { rep =>
        spark.catalog.clearCache()
        val t0 = System.nanoTime()
        fn(spark, sfDir).queryExecution.toRdd.foreach(_ => ())
        println(f"[stream] $name rep$rep wall=${(System.nanoTime() - t0) / 1e9}%.3f")
      }
    }
    spark.stop()
  }
}
