package graft.examples

import graft.api.Pipeline
import graft.core._
import graft.GraftSession

/** End-to-end example mirroring the reference's word-count-with-metrics app
  * (reference: examples/word_count_metrics.py:109-156 — ReadFromText →
  * ParDo(WordExtractingDoFn) with counter/distribution metrics → pair →
  * GroupByKey → count → format → WriteToText, then metric queries).
  */
object WordCountMetrics {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.builder(8).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val input = if (args.nonEmpty) args(0) else {
      val f = java.nio.file.Files.createTempFile("wordcount", ".txt")
      java.nio.file.Files.writeString(f,
        "the quick brown fox\n\njumps over the lazy dog\nthe end\n")
      f.toString
    }
    val output = if (args.length > 1) args(1) else
      java.nio.file.Files.createTempDirectory("wordcount-out").toString + "/counts"

    val p = Pipeline(spark)
    // metrics mirror word_count_metrics.py:50-83: word lengths distribution,
    // empty-line counter, total-words counter
    val emptyLines = p.metrics.counter("wordcount", "empty_lines")
    val totalWords = p.metrics.counter("wordcount", "total_words")
    val wordLen = p.metrics.distribution("wordcount", "word_len_dist")

    val counts = p.readText(input)
      .parDo(new DoFn[String, String] {
        def process(line: String, ctx: ProcessContext[String]): Unit = {
          if (line.trim.isEmpty) emptyLines.add(1L)
          // reference word regex [\w']+ (word_count_metrics.py:62)
          "[\\w']+".r.findAllIn(line).foreach { w =>
            totalWords.add(1L); wordLen.add(w.length.toLong); ctx.output(w)
          }
        }
      }, name = "extract-words")
      .map(w => (w, ()))
      .countPerKey[String, Unit]
      .map { case (w, n) => s"$w: $n" }

    counts.writeText(output)

    println(s"[wordcount] wrote ${spark.read.text(output).count()} word counts to $output")
    println(s"[wordcount] empty_lines = ${emptyLines.value}")
    println(s"[wordcount] total_words = ${totalWords.value}")
    val d = wordLen.value
    println(s"[wordcount] word_len dist: sum=${d.sum} count=${d.count} min=${d.min} max=${d.max} mean=${d.mean}")
    spark.stop()
  }
}
