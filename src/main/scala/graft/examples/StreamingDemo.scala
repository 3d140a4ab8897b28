package graft.examples

import graft.core._
import graft.streaming.StreamingOps
import graft.GraftSession
import org.apache.spark.sql.functions._

/** Streaming end-to-end demo on a live rate source: windowed counts with a
  * watermark, session windows, and the stateful ParDo with event-time
  * timers — the unbounded-PCollection surface (SURVEY.md §7.1-5) in one
  * runnable main.
  */
object StreamingDemo {
  def main(args: Array[String]): Unit = {
    val runSeconds = if (args.nonEmpty) args(0).toInt else 10
    val spark = GraftSession.builder(4).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val rate = spark.readStream.format("rate").option("rowsPerSecond", "100").load()
      .select(col("timestamp").as("ts"), (col("value") % 5).cast("string").as("k"),
        (col("value") % 7).cast("double").as("v"))

    // 1. tumbling windowed counts, append mode (closed windows only)
    val windows = StreamingOps.windowedCounts(rate, "ts", "k", "2 seconds",
      watermarkDelay = "1 seconds")
    val q1 = windows.writeStream.format("memory").queryName("win").outputMode("append").start()

    // 2. stateful ParDo: per-key running sum flushed by an event-time timer
    val sums = CombiningStateSpec[Double, (Double, Long), (Double, Long)]("s",
      CombineFns.sumCountDouble)
    val flush = TimerSpec("flush")
    val stateful = StreamingOps.statefulParDo(
      rate.select(col("k"), col("v"), col("ts")).withWatermark("ts", "0 seconds")
        .as[(String, Double, java.sql.Timestamp)],
      new StatefulDoFn[String, Double, (String, Double, Long)] {
        def process(k: String, v: Double, ctx: StatefulContext[(String, Double, Long)]): Unit = {
          ctx.combining(sums).add(v)
          ctx.timer(flush).set(ctx.timestamp + 3000)
        }
        override def onTimer(k: String, spec: TimerSpec, tag: String, fireTs: Long,
            ctx: StatefulContext[(String, Double, Long)]): Unit = {
          val (sum, n) = ctx.combining(sums).read()
          ctx.output((k, sum, n))
        }
      })
    val q2 = stateful.toDF("k", "sum", "n").writeStream.format("memory")
      .queryName("state").outputMode("append").start()

    Thread.sleep(runSeconds * 1000L)
    // stop BEFORE reading the sinks: processAllAvailable on a live rate
    // source can block forever (new data always pending); stopping drains
    // the in-flight micro-batch and leaves the memory tables readable
    q1.stop(); q2.stop()
    println("[streaming] closed windows:")
    spark.sql("SELECT * FROM win ORDER BY window_start, k").show(8, false)
    println("[streaming] timer flushes:")
    spark.sql("SELECT * FROM state ORDER BY k").show(8, false)
    spark.stop()
  }
}
