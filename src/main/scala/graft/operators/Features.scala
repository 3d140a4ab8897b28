package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Feature-engineering operators for training-data export.
  */
object Features {

  /** Hashing-trick term-frequency vectorizer: every token maps to one of
    * 16^prefixLen feature buckets via its md5 prefix, yielding the sparse
    * triples (id, feature, tf) — the fixed-width, vocabulary-free document
    * representation large-scale training exports use (no global vocab
    * build, no dictionary to ship, collisions bounded by the bucket
    * count).
    *
    * The bucket id IS the md5 hex prefix (a string key): md5 renders
    * identically in every engine, so feature assignment is bit-portable
    * with no hex-to-integer parsing — the same determinism convention as
    * the engine's md5 sampling gates. Map-side only until the final
    * (id, feature) count — one shuffle, bounded by output size.
    */
  def hashingVectorize(df: DataFrame, idCol: String, textCol: String,
                       prefixLen: Int = 3): DataFrame = {
    require(prefixLen >= 1 && prefixLen <= 8,
      s"prefixLen must be in [1, 8]: $prefixLen")
    df.select(col(idCol).as("id"),
        graft.functions.TextFunctions.tokens(lower(col(textCol))).as("__toks"))
      .select(col("id"), explode(col("__toks")).as("__tok"))
      .select(col("id"), substring(md5(col("__tok")), 1, prefixLen).as("feature"))
      .groupBy(col("id"), col("feature"))
      .agg(count(lit(1)).as("tf"))
  }

  /** BPE tokenizer training: learn `nMerges` byte-pair merges from the
    * corpus — the vocabulary-construction step of an LLM data pipeline.
    *
    * The corpus is touched ONCE (tokenize → word-frequency table, one
    * shuffle); every merge iteration then runs on the distinct-word table,
    * which is vocabulary-sized (Heaps' law: millions of rows at 100 TB,
    * never corpus-sized), stays fully distributed (pair stats are one
    * aggregate over exploded adjacent-symbol pairs, weighted by word
    * count), and ships exactly ONE row to the driver per step (the argmax
    * pair) — unlike the textbook in-memory trainer, which collects the
    * whole vocabulary. localCheckpoint per step keeps the iterative plan
    * one-step deep.
    *
    * Determinism: counts are exact integers; the winning pair is the total
    * order (count DESC, left ASC, right ASC), so ties break identically in
    * any engine. Merge application is greedy left-to-right (standard BPE):
    * each word's symbols are rendered `(s1)(s2)...`, and a plain
    * non-overlapping REPLACE of `(a)(b)` → `(ab)` is exact because every
    * occurrence spans whole wrapped symbols that share no characters —
    * sound because the symbol alphabet is [a-z]+ (closed under merging),
    * so the parenthesis markers can never collide with symbol content.
    *
    * Output: (step INT, pair_left, pair_right, merged STRING,
    * pair_count BIGINT) — the ordered merge table a tokenizer ships.
    */
  def bpeTrain(df: DataFrame, textCol: String, nMerges: Int): DataFrame = {
    require(nMerges >= 1, s"nMerges must be positive: $nMerges")
    val spark = df.sparkSession
    var words = df
      .select(explode(
        expr(s"regexp_extract_all(lower($textCol), '[a-z]+', 0)")).as("word"))
      .groupBy(col("word")).agg(count(lit(1)).as("cnt"))
      .select(col("word"), col("cnt"),
        expr("regexp_extract_all(word, '[a-z]', 0)").as("syms"))
      .localCheckpoint()
    val merges = scala.collection.mutable.ListBuffer
      .empty[(Int, String, String, String, Long)]
    var exhausted = false
    for (step <- 1 to nMerges if !exhausted) {
      // adjacent pairs via zip_with over shifted slices — no array
      // indexing, so the expression is ANSI-mode-proof
      val top = words
        .select(col("cnt"), explode(expr(
          """zip_with(slice(syms, 1, size(syms) - 1),
            |         slice(syms, 2, size(syms) - 1),
            |         (x, y) -> struct(x AS a, y AS b))""".stripMargin)).as("p"))
        .groupBy(col("p.a").as("a"), col("p.b").as("b"))
        .agg(sum(col("cnt")).as("c"))
        .orderBy(col("c").desc, col("a"), col("b"))
        .limit(1).collect()
      if (top.isEmpty) exhausted = true // every word is a single symbol
      else {
        val (a, b, c) = (top(0).getString(0), top(0).getString(1),
          top(0).getLong(2))
        merges += ((step, a, b, a + b, c))
        // a and b are [a-z]+ by construction — safe to splice as SQL
        // literals (and unspliceable content cannot reach here)
        words = words
          .withColumn("__r", expr(
            s"""replace(concat('(', array_join(syms, ')('), ')'),
               |        '($a)($b)', '($a$b)')""".stripMargin))
          .select(col("word"), col("cnt"),
            expr("split(substring(__r, 2, length(__r) - 2), '\\\\)\\\\(')")
              .as("syms"))
          .localCheckpoint()
      }
    }
    spark.createDataFrame(merges.toSeq)
      .toDF("step", "pair_left", "pair_right", "merged", "pair_count")
  }

  /** Chi-square feature selection score: for every feature, the χ² statistic
    * of its presence/absence-by-class contingency table against the
    * document label — the classic filter for pruning a hashed feature
    * space before training.
    *
    * Input: sparse presence triples (id, feature) — tf is ignored, presence
    * is what χ² tests — plus each id's single label in `labels`. Zero
    * cells matter: a feature absent from a class still contributes its
    * expected-count term, so the (feature × class) grid densifies via a
    * crossJoin with the broadcast class census before the left join.
    * Expected counts compute in doubles from the start
    * (present_f · n_c / N as CAST-first division) so the arithmetic never
    * overflows at any corpus size and renders identically cross-engine;
    * the per-feature sum over classes is the only order-dependent step —
    * ROUND 6 absorbs it. Cells with zero expected count (a feature present
    * in every document) are skipped by convention.
    *
    * Output: (feature, n_docs_present, chi2 ROUND 6).
    */
  def chiSquareByLabel(features: DataFrame, labels: DataFrame,
                       idCol: String, featureCol: String,
                       labelCol: String): DataFrame = {
    val docLabel = labels.select(col(idCol).as("id"), col(labelCol).as("lbl"))
      // an unlabeled doc would count in the totals but its grid cell could
      // never join (SQL null equality), phantom-zeroing every feature it
      // carries — exclude it from the population entirely
      .filter(col("id").isNotNull && col("lbl").isNotNull)
      .distinct().localCheckpoint() // class census + presence join both read it
    val classes = docLabel.groupBy(col("lbl"))
      .agg(count(lit(1)).as("n_c")).localCheckpoint()
    val totalRow = classes.agg(sum(col("n_c"))).collect().head
    val nTotal = if (totalRow.isNullAt(0)) 0L else totalRow.getLong(0)
    val present = features
      .select(col(idCol).as("id"), col(featureCol).as("feature")).distinct()
      .join(docLabel, "id")
      .groupBy(col("feature"), col("lbl"))
      .agg(count(lit(1)).as("a"))
      .localCheckpoint() // feature totals + the dense grid both read it
    val featTotals = present.groupBy(col("feature"))
      .agg(sum(col("a")).as("pf"))
    featTotals.crossJoin(broadcast(classes))
      .join(present, Seq("feature", "lbl"), "left")
      .na.fill(0L, Seq("a"))
      .withColumn("ep",
        col("pf").cast("double") * col("n_c") / lit(nTotal.toDouble))
      .withColumn("ea",
        (lit(nTotal) - col("pf")).cast("double") * col("n_c") / lit(nTotal.toDouble))
      .withColumn("term",
        (col("a") - col("ep")) * (col("a") - col("ep")) / col("ep") +
          when(col("ea") > 0,
            (col("n_c") - col("a") - col("ea")) * (col("n_c") - col("a") - col("ea")) /
              col("ea")).otherwise(lit(0.0)))
      .groupBy(col("feature"))
      .agg(max(col("pf")).cast("long").as("n_docs_present"),
        round(sum(col("term")), 6).as("chi2"))
  }
}
