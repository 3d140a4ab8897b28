package graft.operators

import graft.functions.TextFunctions
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Benchmark decontamination: find training documents that share verbatim
  * word n-grams with an evaluation/benchmark set, the standard pre-training
  * hygiene step (a training corpus must not contain the eval suite).
  *
  * Builder-prompt extension; the reference has no text operators of its own
  * (SURVEY.md §2.8) — this is part of the engine's training-data surface.
  *
  * Scale shape (100 TB corpus, MB-scale eval set): the eval n-gram set is
  * tiny by contract, so it is broadcast and the corpus side is a map-only
  * scan + broadcast hash semi-probe; the only shuffle is the final per-doc
  * count, which is map-side combinable on (doc, gram)-deduped rows. No
  * corpus self-join, no corpus-side shuffle of text.
  */
object Decontaminate {

  /** Per-train-doc count of distinct word `n`-grams shared with `evalSet`.
    * Returns (idCol, n_shared BIGINT) for docs with n_shared >= minShared.
    *
    * Gram identity is the exact lowercase space-joined token window
    * ([[TextFunctions.wordShingles]] — already distinct per doc, so a plain
    * COUNT after the inner join counts distinct shared grams).
    */
  def overlap(
      train: DataFrame, evalSet: DataFrame, idCol: String, textCol: String,
      n: Int = 8, minShared: Long = 1): DataFrame = {
    // fanOut both shingle explodes (guide §2.5): on a single-row-group
    // bench file each otherwise runs in a 1-task scan stage; no-op on a
    // many-split corpus. The join stays broadcast — fanOut's round-robin
    // exchange is not a hash shuffle of the corpus.
    val evalGrams = ScaleOps.fanOut(evalSet.select(col(textCol)))
      .select(explode(TextFunctions.wordShingles(col(textCol), n)).as("gram"))
      .distinct()
    ScaleOps.fanOut(train.select(col(idCol), col(textCol)))
      .select(col(idCol), explode(TextFunctions.wordShingles(col(textCol), n)).as("gram"))
      .join(broadcast(evalGrams), "gram")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_shared"))
      .filter(col("n_shared") >= minShared)
  }

  /** The removal form: training docs with fewer than `minShared` shared
    * n-grams survive. Anti-join against the flagged set keeps the corpus
    * side streaming (flagged ids are small — contamination is rare).
    */
  def clean(
      train: DataFrame, evalSet: DataFrame, idCol: String, textCol: String,
      n: Int = 8, minShared: Long = 1): DataFrame = {
    val flagged = overlap(train, evalSet, idCol, textCol, n, minShared).select(idCol)
    train.join(broadcast(flagged), Seq(idCol), "left_anti")
  }
}
