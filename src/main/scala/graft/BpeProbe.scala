package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** BPE trainer probe: driver-round count, wall, and per-round batch-width
  * distribution for sequential (maxBatch=1) vs batched training — the
  * evidence harness for the batched-merge scale story (a 30k-merge
  * production vocabulary is round-bound, not data-bound).
  *
  * Usage: BpeProbe [corpus] [nMerges] [maxBatch,maxBatch,...]
  *
  * `corpus` is either a testdata dir (documents.parquet's `text`) or
  * `zipf:<vocab>:<headCount>` — a deterministic synthetic corpus for
  * budgets the driver corpus cannot reach: the sf0.1 documents table
  * holds only 31 distinct words (sum of (len−1) = 107), so EVERY
  * concatenation of driver data exhausts below ~107 merges; a 30k-merge
  * measurement needs a corpus with real vocabulary breadth. Word i of
  * `vocab` is composed of 2–5 consonant-vowel syllables drawn from i's
  * base-40 digits (heavy shared substructure, the regime where BPE merge
  * interaction is worst-case-ish), with Zipf counts
  * max(1, headCount/(i+1)) — the count shape of natural text, which is
  * what the batch-safety rule's "strictly above every family ceiling"
  * test feeds on.
  */
object BpeProbe {
  private val syllables: IndexedSeq[String] = {
    val cons = "bcdfghjklmnpqrst"
    val vows = "aeiou"
    // 16 x 5 = 80 candidates; the first 40 in a fixed shuffle-free order
    (for (c <- cons; v <- vows) yield s"$c$v").take(40)
  }

  /** word for index i: 2–5 syllables, each drawn near-uniformly by a
    * splitmix64-style hash of (i, position). Uniform syllable usage
    * matters: a base-40-digit scheme concentrated one syllable across
    * the whole vocabulary, which forced every early merge to share a
    * symbol with the argmax and pinned safe-batch widths at ~2-3 — a
    * generator artifact, not a property of Zipf text.
    */
  private[graft] def zipfWord(i: Long): String = {
    val nSyl = 2 + (i % 4).toInt
    val sb = new StringBuilder
    var k = 0
    while (k < nSyl) {
      var x = i * 0x9E3779B97F4A7C15L + (k + 1) * 0xD6E8FEB86659FD93L
      x = (x ^ (x >>> 30)) * 0xBF58476D1CE4E5B9L
      x = (x ^ (x >>> 27)) * 0x94D049BB133111EBL
      x ^= x >>> 31
      sb.append(syllables(((x % 40 + 40) % 40).toInt))
      k += 1
    }
    sb.toString
  }

  /** (word, cnt) rows rendered as text lines, one word repeated cnt
    * times — what bpeTrain's word-frequency shuffle reduces back to the
    * (word, cnt) table. Driver-built (vocab rows), then parallelized.
    */
  private def zipfCorpus(spark: org.apache.spark.sql.SparkSession,
      vocab: Int, headCount: Long): DataFrame = {
    import spark.implicits._
    val rows = (0 until vocab).map { i =>
      (zipfWord(i.toLong), math.max(1L, headCount / (i + 1L)))
    }
    rows.toDF("word", "cnt")
      .select(concat_ws(" ", expr("array_repeat(word, int(cnt))")).as("text"))
  }

  private def pct(sorted: Seq[Int], p: Double): Int =
    if (sorted.isEmpty) 0
    else sorted(math.min(sorted.size - 1, (p * sorted.size).toInt))

  def main(args: Array[String]): Unit = {
    val corpus = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val nMerges = if (args.length > 1) args(1).toInt else 12
    val batches = if (args.length > 2) args(2).split(",").map(_.toInt).toSeq
                  else Seq(1, 64)
    val spark = GraftSession.builder(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = corpus.split(":") match {
      case Array("zipf", vocab, head) =>
        zipfCorpus(spark, vocab.toInt, head.toLong).localCheckpoint()
      case _ => Tables.documents(spark, corpus)
    }
    // warm JVM/footers so the probe compares trainers, not first-touch cost
    graft.operators.Features.bpeTrain(docs, "text", 2, maxBatch = 1).count()
    val out = batches.map { mb =>
      val t0 = System.nanoTime()
      val n = graft.operators.Features
        .bpeTrain(docs, "text", nMerges, maxBatch = mb).count()
      val sec = (System.nanoTime() - t0) / 1e9
      val w = graft.operators.Features.lastTrainBatchWidths
      val ws = w.sorted
      val tail = w.drop(w.size / 2)
      s""""maxBatch_$mb":{"merges":$n,"rounds":${
        graft.operators.Features.lastTrainRounds},"sec":${
        math.round(sec * 100) / 100.0},"width_min":${ws.headOption.getOrElse(0)},"width_p50":${
        pct(ws, 0.5)},"width_p90":${pct(ws, 0.9)},"width_max":${
        ws.lastOption.getOrElse(0)},"width_mean_second_half":${
        if (tail.isEmpty) 0.0 else math.round(tail.sum * 10.0 / tail.size) / 10.0},"first_rounds":[${
        w.take(12).mkString(",")}],"last_rounds":[${
        w.takeRight(12).mkString(",")}]}"""
    }
    println(s"""{"bpe_probe":"$corpus","n_merges":$nMerges,${out.mkString(",")}}""")
    spark.stop()
  }
}
