package graft.examples

import graft.GraftSession
import org.apache.spark.sql.functions._

/** Feature-preprocessing example mirroring the reference's TFT iris pipeline
  * (reference: examples/tft_iris_example/preprocessing.py:38-68 — read the
  * iris CSV, scale each numeric feature to [0,1], keep the label).
  *
  * The TFT "analyze" phase (dataset-wide min/max) is a broadcast aggregate
  * here — the Spark-native analyze-then-transform: one pass computes the
  * stats, a cross join broadcasts them, the scaling projection is codegen'd.
  */
object IrisPreprocess {
  val Features = Seq("sepal_length", "sepal_width", "petal_length", "petal_width")

  def main(args: Array[String]): Unit = {
    val spark = GraftSession.builder(8).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val input = if (args.nonEmpty) args(0) else {
      val f = java.nio.file.Files.createTempFile("iris", ".csv")
      java.nio.file.Files.writeString(f,
        """sepal_length,sepal_width,petal_length,petal_width,target
          |5.1,3.5,1.4,0.2,setosa
          |4.9,3.0,1.4,0.2,setosa
          |7.0,3.2,4.7,1.4,versicolor
          |6.4,3.2,4.5,1.5,versicolor
          |6.3,3.3,6.0,2.5,virginica
          |5.8,2.7,5.1,1.9,virginica
          |""".stripMargin)
      f.toString
    }

    val raw = spark.read.option("header", "true").option("inferSchema", "true").csv(input)
    // analyze phase: per-feature min/max (preprocessing.py:57-68 scale_to_0_1)
    val aggs = Features.flatMap(f =>
      Seq(min(col(f)).as(s"${f}_min"), max(col(f)).as(s"${f}_max")))
    val stats = raw.agg(aggs.head, aggs.tail: _*)
    // transform phase: broadcast the stats row, scale each feature
    val scaled = raw.crossJoin(broadcast(stats))
      .select(
        Features.map { f =>
          val range = col(s"${f}_max") - col(s"${f}_min")
          when(range > 0, (col(f) - col(s"${f}_min")) / range).otherwise(lit(0.0))
            .as(s"${f}_scaled")
        } :+ col("target"): _*)
    scaled.show(10, false)
    val bounds = scaled.agg(
      least(Features.map(f => min(col(s"${f}_scaled"))): _*).as("lo"),
      greatest(Features.map(f => max(col(s"${f}_scaled"))): _*).as("hi")).first()
    println(s"[iris] scaled bounds: lo=${bounds.getDouble(0)} hi=${bounds.getDouble(1)}")
    spark.stop()
  }
}
