package graft

/** BPE trainer probe: driver-round count and wall for sequential
  * (maxBatch=1) vs batched training on the documents corpus — the
  * evidence harness for the batched-merge scale story (a 30k-merge
  * production vocabulary is round-bound, not data-bound).
  *
  * Usage: BpeProbe [sfDir] [nMerges] [maxBatch,maxBatch,...]
  */
object BpeProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val nMerges = if (args.length > 1) args(1).toInt else 12
    val batches = if (args.length > 2) args(2).split(",").map(_.toInt).toSeq
                  else Seq(1, 64)
    val spark = GraftSession.builder(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = Tables.documents(spark, sfDir)
    // warm JVM/footers so the probe compares trainers, not first-touch cost
    graft.operators.Features.bpeTrain(docs, "text", 2, maxBatch = 1).count()
    val out = batches.map { mb =>
      val t0 = System.nanoTime()
      val n = graft.operators.Features
        .bpeTrain(docs, "text", nMerges, maxBatch = mb).count()
      val sec = (System.nanoTime() - t0) / 1e9
      s""""maxBatch_$mb":{"merges":$n,"rounds":${
        graft.operators.Features.lastTrainRounds},"sec":${
        math.round(sec * 100) / 100.0}}"""
    }
    println(s"""{"bpe_probe":"$sfDir","n_merges":$nMerges,${out.mkString(",")}}""")
    spark.stop()
  }
}
