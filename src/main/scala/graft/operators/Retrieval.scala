package graft.operators

import graft.functions.TextFunctions
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Exact-match retrieval over a tokenized corpus: the positional
  * inverted-index shapes (reference exposes ranked retrieval through its
  * dataframe ops; BM25 lives in Queries d144 — this is the EXACT side:
  * postings and phrase queries).
  */
object Retrieval {

  /** Positional postings: one row per token occurrence,
    * `(term, <idCol>, pos)` with pos 0-based in token order. This IS the
    * inverted index in its relational form — write it bucketed/sorted by
    * `term` ([[ScaleOps.writeBucketed]]) and term lookups become
    * shuffle-free.
    */
  def postings(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(col(idCol),
        posexplode(TextFunctions.tokens(lower(col(textCol))))
          .as(Seq("pos", "term")))
      .select(col("term"), col(idCol), col("pos"))

  /** Exact phrase search: docs containing `phrase` as consecutive tokens
    * (case-folded), with the number of (possibly overlapping) occurrences.
    * Returns `(<idCol>, n_matches)` for docs with at least one match.
    *
    * Shape: postings are filtered to the phrase's terms AT THE SCAN (an
    * `isin` over ≤ phrase-length literals — map-side, nothing else leaves
    * the executor), each surviving posting maps to the anchor position(s)
    * it could start a match at (`pos - slot` for every slot the term
    * occupies in the phrase), and ONE hash shuffle on (doc, anchor) counts
    * distinct matched slots — a full house (= phrase length) is a match.
    * No self-join chain: the cost is independent of phrase length beyond
    * the slot fan-out, and the shuffle carries only phrase-term postings,
    * not the corpus.
    */
  def phraseSearch(df: DataFrame, idCol: String, textCol: String,
      phrase: Seq[String]): DataFrame = {
    require(phrase.nonEmpty, "empty phrase")
    require(phrase.forall(t => t.nonEmpty && !t.exists(_.isWhitespace)),
      s"phrase tokens must be single non-empty words: $phrase")
    val spark = df.sparkSession
    val terms = phrase.map(_.toLowerCase)
    // (term, slot) — a term may fill several slots ("the cat the hat")
    val slots = spark.createDataFrame(terms.zipWithIndex)
      .toDF("term", "slot")
    postings(df, idCol, textCol)
      .filter(col("term").isin(terms.distinct: _*))
      .join(broadcast(slots), "term")
      .select(col(idCol), (col("pos") - col("slot")).as("anchor"),
        col("slot"))
      .filter(col("anchor") >= 0)
      .groupBy(col(idCol), col("anchor"))
      .agg(countDistinct(col("slot")).as("__k"))
      .filter(col("__k") === phrase.length)
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_matches"))
  }
}
