package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for large-scale training-data pipelines, built
  * entirely from codegen'd `org.apache.spark.sql.functions` (no UDFs in the
  * hot path — every expression here stays inside WholeStageCodegen, so the
  * same plan scales from sf0.001 to 100 TB by partition count alone).
  *
  * The reference has no scalar-function library of its own (SURVEY.md §2.8) —
  * these are the engine extensions the builder prompt requires.
  */
object TextFunctions {

  /** Whitespace tokenization as a native split (codegen'd). */
  def tokens(text: Column): Column =
    filter(split(trim(text), "\\s+"), t => length(t) > 0)

  /** Token count without materializing the token array when only the count
    * is needed.
    */
  def tokenCount(text: Column): Column = size(tokens(text))

  /** BPE-ish subword count: word-piece regex (alphanumeric runs plus
    * individual punctuation marks) — the standard cheap proxy for tokenizer
    * cost.
    */
  def subwordCount(text: Column): Column =
    size(filter(
      split(text, "(?<=[^\\p{L}\\p{N}])|(?=[^\\p{L}\\p{N}])"),
      t => length(trim(t)) > 0))

  /** Punctuation ratio: punctuation chars / total chars. ASCII punctuation
    * spelled as explicit ranges (not `\p{Punct}`) so the same regex text has
    * identical semantics in Java regex and RE2 (the DuckDB oracle).
    */
  def punctRatio(text: Column): Column = {
    val total = greatest(length(text), lit(1))
    (length(text) - length(regexp_replace(text, "[!-/:-@\\[-`{-~]", ""))).cast("double") / total
  }

  /** Uppercase ratio. */
  def upperRatio(text: Column): Column = {
    val total = greatest(length(text), lit(1))
    (length(text) - length(regexp_replace(text, "[A-Z]", ""))).cast("double") / total
  }

  /** Mean token length. */
  def meanTokenLength(text: Column): Column = {
    val ts = tokens(text)
    when(size(ts) > 0,
      aggregate(ts, lit(0L), (acc, t) => acc + length(t)).cast("double") / size(ts))
      .otherwise(lit(0.0))
  }

  /** Gopher rule-set thresholds — the SINGLE definition read by both the
    * batch battery gate (d60) and the streaming twin
    * (`StreamingOps.qualityGateStream`). Retune here, both modes follow.
    */
  object GopherThresholds {
    val MinTokens = 20
    val MinMeanWordLen = 3.0
    val MaxMeanWordLen = 10.0
    val MinStopRatio = 0.05
    val MinDistinctRatio = 0.5
  }

  /** The Gopher rule conjunction as ONE predicate column — the single
    * definition the streaming gate (`StreamingOps.qualityGateStream`)
    * filters on and the streaming funnel (d236) carries as a flag;
    * changing a rule here changes every consumer or none.
    */
  def gopherPass(text: Column,
      minTokens: Int = GopherThresholds.MinTokens,
      minMeanWordLen: Double = GopherThresholds.MinMeanWordLen,
      maxMeanWordLen: Double = GopherThresholds.MaxMeanWordLen,
      minStopRatio: Double = GopherThresholds.MinStopRatio,
      minDistinctRatio: Double = GopherThresholds.MinDistinctRatio): Column =
    tokenCount(text) >= minTokens &&
      meanTokenLength(text).between(minMeanWordLen, maxMeanWordLen) &&
      stopwordRatio(text) >= minStopRatio &&
      distinctTokenRatio(text) >= minDistinctRatio

  private val EnStopwords = Seq(
    "the", "a", "an", "and", "or", "of", "to", "in", "is", "it", "that",
    "for", "on", "with", "as", "at", "by", "be", "this", "are")

  /** Fraction of tokens that are (English) stopwords — a standard quality
    * signal (high = natural prose, near-zero = tables/code/noise).
    */
  def stopwordRatio(text: Column): Column = {
    val ts = tokens(text)
    val stops = filter(ts, t => lower(t).isin(EnStopwords.map(x => x: Any): _*))
    when(size(ts) > 0, size(stops).cast("double") / size(ts)).otherwise(lit(0.0))
  }

  /** Distinct-token ratio — the Gopher-style repetition signal (near 0 =
    * the same tokens looped over and over, a classic crawl-spam shape).
    */
  def distinctTokenRatio(text: Column): Column = {
    val ts = tokens(lower(text))
    when(size(ts) > 0, size(array_distinct(ts)).cast("double") / size(ts))
      .otherwise(lit(0.0))
  }

  /** Composite quality score in [0,1]: favors mid-length documents with
    * prose-like stopword mass and low punctuation noise. Deterministic and
    * fully codegen'd.
    */
  def qualityScore(text: Column): Column = {
    val lenScore = least(tokenCount(text).cast("double") / lit(50.0), lit(1.0))
    val stopScore = least(stopwordRatio(text) * lit(4.0), lit(1.0))
    val punctPenalty = greatest(lit(1.0) - punctRatio(text) * lit(5.0), lit(0.0))
    round((lenScore * lit(0.4) + stopScore * lit(0.4) + punctPenalty * lit(0.2)), 6)
  }

  /** Language ID via stopword-list voting over a fixed per-language lexicon —
    * the classic cheap n-gram/stopword heuristic. Returns the language code
    * with the most hits, 'und' when nothing matches.
    */
  private[graft] val LangLexicon: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "and", "of", "to", "is", "in", "that", "it", "for", "with"),
    "es" -> Seq("el", "la", "de", "que", "y", "en", "los", "del", "las", "por"),
    "fr" -> Seq("le", "la", "de", "et", "les", "des", "un", "une", "du", "est"),
    "de" -> Seq("der", "die", "und", "das", "von", "den", "des", "ein", "mit", "ist"),
    "zh" -> Seq("的", "了", "是", "在", "我", "有", "和", "就", "不", "人"))

  def langId(text: Column): Column =
    graft.plans.NativeExpressions.langIdOver(tokens(lower(text)), LangLexicon)

  /** Column-function formulation of langId, kept as executable documentation
    * of the semantics the native expression implements (identical fold:
    * first strictly-greatest lexicon in order wins; 'und' when all zero).
    */
  def langIdColumns(text: Column): Column = {
    val ts = tokens(lower(text))
    val scores: Seq[(String, Column)] = LangLexicon.map { case (lang, words) =>
      lang -> size(filter(ts, t => t.isin(words.map(x => x: Any): _*)))
    }
    val best = scores.foldLeft((lit("und"), lit(0))) { case ((bl, bs), (lang, s)) =>
      (when(s > bs, lit(lang)).otherwise(bl), greatest(s, bs))
    }
    best._1
  }

  /** 64-bit rolling-hash document fingerprint (hash-chained over normalized
    * tokens, order-sensitive) — cheap near-identity fingerprint for dedup
    * bookkeeping. xxhash64 chaining instead of polynomial multiply so the
    * fold can't overflow under ANSI mode. Fully codegen'd.
    */
  def fingerprint(text: Column): Column =
    aggregate(
      tokens(lower(text)),
      lit(1125899906842597L),
      (acc, t) => xxhash64(acc, t))

  /** Character n-gram set (distinct, for Jaccard similarity). */
  def charNgrams(text: Column, n: Int): Column = {
    val s = lower(regexp_replace(text, "\\s+", " "))
    // guard: sequence(a, b) descends when b < a, so empty-out short strings
    when(length(s) >= n,
      array_distinct(transform(sequence(lit(1), length(s) - (n - 1)),
        i => s.substr(i, lit(n)))))
      .otherwise(array(s))
  }

  /** Word n-gram (shingle) set for MinHash / Jaccard / decontamination —
    * native single-pass expression (graft.plans.WordNgramsExpr). NULL text
    * yields [""] (the empty-document shingle), matching the column
    * formulation: null-text rows must still collapse as duplicates of each
    * other in the dedup paths, not silently vanish from band explosion.
    */
  def wordShingles(text: Column, n: Int): Column =
    graft.plans.NativeExpressions.wordNgrams(
      coalesce(tokens(lower(text)), typedlit(Seq.empty[String])), n)

  /** Column-function formulation of wordShingles, kept as executable
    * documentation of the semantics the native expression implements
    * (distinct space-joined n-token windows; short docs collapse to the
    * whole doc as one gram).
    */
  def wordShinglesColumns(text: Column, n: Int): Column = {
    val ts = tokens(lower(text))
    array_distinct(
      when(size(ts) >= n,
        transform(sequence(lit(0), size(ts) - n),
          i => concat_ws(" ", slice(ts, i + 1, lit(n)))))
        .otherwise(array(concat_ws(" ", ts))))
  }

  /** Overlapping fixed-token chunks (RAG / context-window pre-processing):
    * chunk k covers tokens [k*(chunkSize-overlap), ...+chunkSize); trailing
    * windows adding no new tokens beyond the overlap are dropped. Native
    * single pass (graft.plans.TokenChunksExpr); pair with posexplode for
    * (chunk_id, chunk) rows.
    */
  def tokenChunks(text: Column, chunkSize: Int, overlap: Int): Column = {
    require(overlap >= 0 && overlap < chunkSize,
      s"need 0 <= overlap < chunkSize: chunkSize=$chunkSize overlap=$overlap")
    graft.plans.NativeExpressions.tokenChunks(tokens(text), chunkSize, chunkSize - overlap)
  }

  /** Convenience: attach the standard text-stats columns to a documents DF. */
  def withTextStats(df: DataFrame, textCol: String = "text"): DataFrame = {
    val t = col(textCol)
    df.withColumn("n_tokens", tokenCount(t))
      .withColumn("punct_ratio", round(punctRatio(t), 6))
      .withColumn("stopword_ratio", round(stopwordRatio(t), 6))
      .withColumn("quality", qualityScore(t))
      .withColumn("lang_pred", langId(t))
      .withColumn("fp", fingerprint(t))
  }
}
