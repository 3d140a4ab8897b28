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

  /** Weight-of-Evidence / Information-Value feature evaluation over
    * equi-depth bins — the credit-scoring-style predictive-power report
    * for a numeric feature against a binary label.
    *
    * Binning is exact equi-depth by GLOBAL row rank with a deterministic
    * tie-break: rank = (exclusive prefix count of strictly-smaller feature
    * values, via [[ScaleOps.globalPrefixSum]]'s two-level scan — no
    * single-partition window) + (row_number within the value, ordered by
    * id — a per-value partitioned window). bin = rank · nBins / N in
    * integer arithmetic, so bin assignment is engine-exact.
    *
    * WoE_i = ln( ((g_i + 0.5)/G) / ((b_i + 0.5)/B) ) — the +0.5 Laplace
    * smoothing keeps empty cells finite (the standard convention);
    * iv_term_i = (g_i/G − b_i/B) · WoE_i, Σ iv_term = the feature's IV.
    * Counts are exact integers; the ratios/ln are IEEE on both engines
    * (round on output).
    *
    * Output, one row per bin: (bin BIGINT, n BIGINT, n_good BIGINT,
    * n_bad BIGINT, woe DOUBLE, iv_term DOUBLE — both unrounded).
    */
  /** Exact equi-depth bin assignment by GLOBAL row rank — the shared
    * machinery under [[woeIv]] and the battery's Qini row: rank =
    * (exclusive prefix count of strictly earlier feature values, via
    * [[ScaleOps.globalPrefixSum]]'s two-level scan — no single-partition
    * window) + (row_number within the value, ordered by id). bin = rank ·
    * nBins / N in integer `div` arithmetic (engine-exact; `/` would be
    * DOUBLE division).
    *
    * Rows with a NULL `valueCol` are EXCLUDED (a NULL would silently
    * vanish in the rank equi-join while still inflating N). The cohort
    * size comes from the value census — the input is scanned once.
    * `descending = true` ranks the largest values into bin 0 (score
    * curves); default ascending (feature binning).
    *
    * Output: the non-null input rows + `bin` (LONG in [0, nBins)).
    */
  def equiDepthBins(df: DataFrame, idCol: String, valueCol: String,
                    nBins: Int, descending: Boolean = false): DataFrame = {
    require(nBins >= 2, s"nBins must be >= 2: $nBins")
    val scratch = Seq("__v", "__vn", "__pfx", "__rank", "bin")
    require(!df.columns.exists(scratch.contains),
      s"input columns collide with equiDepthBins scratch names $scratch")
    val dfv = df.filter(col(valueCol).isNotNull)
    val perVal = dfv.groupBy(col(valueCol).as("__v"))
      .agg(count(lit(1)).as("__vn"))
    // r10 (guide §2.4): the prefix-sum frame used to be an unmaterialized
    // plan consumed TWICE — once by the cohort-size aggregation below,
    // once by the rank join — re-running the whole two-level scan. It is
    // now checkpointed once with the cohort size riding the
    // materialization (observe): one scan, one fewer action, same values.
    val (pre, mPre) = graft.operators.GraphOps.checkpointWithProbe(
      ScaleOps.globalPrefixSum(perVal, "__v", Seq("__vn" -> "__pfx"),
        ascending = !descending),
      sum(col("__vn")).as("n"))
    val n = Option(mPre("n").asInstanceOf[java.lang.Long])
      .fold(0L)(_.longValue) // SUM over zero rows is NULL
    require(n > 0,
      "equiDepthBins needs a non-empty input (after NULL exclusion)")
    val wv = org.apache.spark.sql.expressions.Window
      .partitionBy(col(valueCol)).orderBy(col(idCol))
    dfv
      .join(pre.select(col("__v").as(valueCol), col("__pfx")), Seq(valueCol))
      .withColumn("__rank",
        col("__pfx") + row_number().over(wv).cast("long") - 1L)
      .withColumn("bin", expr(s"(__rank * $nBins) div ${n}L"))
      .drop("__pfx", "__rank")
  }

  def woeIv(df: DataFrame, idCol: String, valueCol: String,
            labelCol: String, nBins: Int = 10): DataFrame = {
    // the census feeds BOTH the grand totals and the report — pin it so
    // the rank/bin derivation runs once (the d166 lesson). r10 (guide
    // §2.4): the totals ride the checkpoint materialization (observe)
    // instead of a separate head() action plus a broadcast crossJoin
    // whose plan re-ran the tiny totals aggregate — the class totals are
    // exact Longs, so splicing them as literals is value-identical.
    val (binned, mT) = graft.operators.GraphOps.checkpointWithProbe(
      equiDepthBins(df, idCol, valueCol, nBins)
        .groupBy(col("bin"))
        .agg(count(lit(1)).as("n"),
          sum(when(col(labelCol) === 1, 1L).otherwise(0L)).as("n_good"),
          sum(when(col(labelCol) === 1, 0L).otherwise(1L)).as("n_bad")),
      sum(col("n_good")).as("__g"), sum(col("n_bad")).as("__b"))
    def tot(k: String) = Option(mT(k).asInstanceOf[java.lang.Long])
      .fold(0L)(_.longValue)
    val g = tot("__g"); val b = tot("__b")
    // an entirely one-class cohort has no finite WoE (ln of a zero-total
    // ratio) — fail loudly rather than emit an Infinity/NaN report
    require(g > 0 && b > 0,
      s"woeIv needs both classes present: good=$g bad=$b")
    binned
      .withColumn("__dg", (col("n_good") + lit(0.5)) / lit(g))
      .withColumn("__db", (col("n_bad") + lit(0.5)) / lit(b))
      .withColumn("woe", log(col("__dg") / col("__db")))
      .select(col("bin"), col("n"), col("n_good"), col("n_bad"), col("woe"),
        ((col("n_good").cast("double") / lit(g) -
          col("n_bad").cast("double") / lit(b)) * col("woe"))
          .as("iv_term"))
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
    * == Batched rounds ==
    *
    * A one-merge-per-round trainer costs one Spark job cycle per merge —
    * 30k driver round-trips for a production vocabulary. Each round here
    * instead collects the top-`topM` slice of the pair table once and
    * applies the longest PREFIX of the (count DESC, left ASC, right ASC)
    * order that is provably the sequence the one-merge trainer would
    * produce; the whole prefix splices in ONE nested-replace pass. The
    * prefix is safe because, for each accepted pair p_j after accepted
    * p_1..p_{j-1}:
    *
    *  - no old pair's count ever INCREASES under a merge (merging only
    *    removes old-symbol adjacencies), so pairs ordered after p_j stay
    *    after it;
    *  - p_j's own count is unchanged: a merge of p_i = (a_i, b_i) only
    *    touches pairs containing a_i or b_i, and accepted pairs are
    *    pairwise symbol-disjoint;
    *  - no pair CREATED by p_1..p_{j-1} can preempt p_j: a new pair is
    *    (x, a_ib_i) or (a_ib_i, y), whose count is bounded by the
    *    ORIGINAL count of (x, a_i) resp. (b_i, y) — every new occurrence
    *    consumes one original occurrence of that pair (this also covers
    *    (a_ib_i, a_ib_i) via (b_i, a_i), and a_i = b_i via the families'
    *    own (a, a) membership). The selection requires c_j strictly above
    *    every accepted pair's family ceiling m_i = max(original family
    *    counts, topM floor), where the floor (the last collected count)
    *    bounds every uncollected pair.
    *
    * Selection STOPS at the first unsafe pair rather than skipping it — a
    * skipped-but-unaffected pair would be the sequential trainer's next
    * pick, so a subsequence (rather than a prefix) would reorder merges.
    * MEASURED batch-width shape (r8 BpeProbe, 50k-word Zipf corpus,
    * 10k+ merges): widths peak ~3.8 in the mid-frequency band, then
    * DECAY to ~1.2–1.5 in the count-tie-heavy Zipf tail — the
    * family-ceiling test needs c_j STRICTLY above every accepted
    * ceiling, and among tied counts nothing is strictly above, so
    * provable batching converges toward sequential exactly where most
    * of a 30k-merge budget lives. The strictness is load-bearing: a
    * merge can create a pair EQUAL to the tie count whose merged-symbol
    * name sorts earlier, so a tie-relaxed rule would reorder the
    * sequential trainer's picks. Net: batching buys a measured ~2–3×
    * round reduction (width ~2.4 mean over the first 10k merges), not
    * a vocabulary-batch bound; a caller needing faster 30k-merge
    * training trades exact sequential equivalence for a different
    * (still deterministic) tie-break — out of scope here. The batching
    * law (batched ≡ one-per-round, any corpus) is ScalaCheck-pinned in
    * FeaturesProps.
    *
    * Output: (step INT, pair_left, pair_right, merged STRING,
    * pair_count BIGINT) — the ordered merge table a tokenizer ships.
    */
  def bpeTrain(df: DataFrame, textCol: String, nMerges: Int,
               maxBatch: Int = 64, topM: Int = 4096): DataFrame = {
    require(nMerges >= 1, s"nMerges must be positive: $nMerges")
    require(maxBatch >= 1, s"maxBatch must be positive: $maxBatch")
    require(topM >= 2, s"topM must be >= 2: $topM")
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
    val widths = scala.collection.mutable.ListBuffer.empty[Int]
    var exhausted = false
    var rounds = 0
    while (merges.size < nMerges && !exhausted) {
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
        .limit(topM).collect()
      rounds += 1
      if (top.isEmpty) exhausted = true // every word is a single symbol
      else {
        val pairs = top.toSeq.map(r =>
          (r.getString(0), r.getString(1), r.getLong(2)))
        // anything beyond the collected slice has count <= the last
        // collected count — the conservative bound the ceilings inherit
        val floor = if (pairs.size >= topM) pairs.last._3 else 0L
        val accepted = selectSafeBatch(pairs, floor,
          math.min(maxBatch, nMerges - merges.size))
        widths += accepted.size
        accepted.foreach { case (a, b, c) =>
          merges += ((merges.size + 1, a, b, a + b, c))
        }
        // a and b are [a-z]+ by construction — safe to splice as SQL
        // literals (and unspliceable content cannot reach here). The whole
        // batch folds into one nested-replace expression: batch pairs are
        // symbol-disjoint, so nested application equals sequential.
        val wrapped = "concat('(', array_join(syms, ')('), ')')"
        val foldedR = accepted.foldLeft(wrapped) { case (acc, (a, b, _)) =>
          s"replace($acc, '($a)($b)', '($a$b)')"
        }
        // localCheckpoint is EAGER, so once `next` returns the previous
        // round's checkpoint blocks are dead weight — release them, or a
        // production 30k-merge run (~500 rounds) accretes every round's
        // word table in storage memory. Dataset.unpersist is a NO-OP for
        // localCheckpoint blocks (they live on the checkpoint RDD, never
        // registered with the CacheManager — r8 ADVICE), so the release
        // walks the plan's RDD lineage to the persisted checkpoint RDD
        // and unpersists THAT.
        val next = words
          .withColumn("__r", expr(foldedR))
          .select(col("word"), col("cnt"),
            expr("split(substring(__r, 2, length(__r) - 2), '\\\\)\\\\(')")
              .as("syms"))
          .localCheckpoint()
        releaseCheckpointBlocks(words)
        words = next
        // heartbeat for multi-hour production budgets (stderr, throttled):
        // a 30k-merge run is thousands of driver rounds with no other
        // externally visible progress signal
        if (rounds % 50 == 0)
          System.err.println(
            s"[bpeTrain] round $rounds: ${merges.size}/$nMerges merges")
      }
    }
    releaseCheckpointBlocks(words)
    lastTrainRounds = rounds
    lastTrainBatchWidths = widths.toSeq
    spark.createDataFrame(merges.toSeq)
      .toDF("step", "pair_left", "pair_right", "merged", "pair_count")
  }

  /** Release the localCheckpoint blocks backing `df`. `Dataset.unpersist`
    * cannot do this (it only uncaches CacheManager entries; localCheckpoint
    * blocks are persisted on the checkpoint RDD directly — r8 ADVICE), so
    * walk the plan's RDD lineage to its persisted ancestors (for a
    * checkpointed Dataset: exactly the checkpoint RDD) and unpersist those.
    * Walked from the Dataset itself, never a global getPersistentRDDs diff,
    * so an unrelated concurrent persist can never be dropped.
    */
  private def releaseCheckpointBlocks(df: DataFrame): Unit = {
    // Guard (r9 ADVICE): release ONLY frames whose plan IS a checkpoint
    // (LogicalRDD). Called on a non-checkpointed frame, the lineage walk
    // would find — and silently unpersist — whatever caller-owned persist
    // feeds the plan. bpeTrain always passes a localCheckpoint'ed frame,
    // so this never fires today; it pins the contract for future callers.
    val plan = df.queryExecution.analyzed
    require(plan.nodeName == "LogicalRDD",
      s"releaseCheckpointBlocks expects a checkpointed frame " +
        s"(LogicalRDD plan), got ${plan.nodeName} — releasing through an " +
        "arbitrary plan could drop a caller-owned persist")
    def persisted(r: org.apache.spark.rdd.RDD[_])
        : Seq[org.apache.spark.rdd.RDD[_]] =
      if (r.getStorageLevel != org.apache.spark.storage.StorageLevel.NONE)
        Seq(r)
      else r.dependencies.map(_.rdd).flatMap(persisted)
    persisted(df.queryExecution.toRdd).foreach(_.unpersist(blocking = false))
  }

  /** Driver rounds (pair-table jobs) the last [[bpeTrain]] call took —
    * probe instrumentation only (NOT thread-safe state; the battery and
    * probes call bpeTrain single-threaded).
    */
  @volatile private[graft] var lastTrainRounds: Int = 0

  /** Per-round accepted batch widths of the last [[bpeTrain]] call — the
    * distribution behind the "tail rounds batch wide" claim (same probe
    * -instrumentation caveats as [[lastTrainRounds]]).
    */
  @volatile private[graft] var lastTrainBatchWidths: Seq[Int] = Nil

  /** The pure batch-selection rule under [[bpeTrain]] (see its scaladoc
    * for the safety proof): the longest prefix of `pairs` — already in
    * (count DESC, left ASC, right ASC) order — that the one-merge-per-round
    * trainer provably produces, capped at `cap`. `floor` bounds the count
    * of any pair NOT in `pairs` (the topM truncation bound; pass 0 for a
    * complete table). Factored out so the batching law can be
    * property-tested directly against the sequential reference
    * (FeaturesProps) with no drift from the production path.
    *
    * '''Seeding invariant (r7 ADVICE):''' the proof's first premise ("no
    * old pair's count ever increases under a merge") additionally relies
    * on a live pair (a, b) never coexisting with an already-existing
    * symbol `a+b` — true under [[bpeTrain]]'s single-character seeding
    * (once (a, b) merges, no later merge can recreate an (a, b)
    * adjacency, so `a+b` existing implies count(a, b) = 0). If seeding
    * ever changes to multi-char symbols that invariant could break, so
    * the merged string `a+b` is ALSO added to `usedSyms` below — a
    * no-op under the invariant (batched ≡ sequential stays
    * ScalaCheck-pinned), a sound guard without it.
    */
  private[graft] def selectSafeBatch(pairs: Seq[(String, String, Long)],
      floor: Long, cap: Int): Seq[(String, String, Long)] = {
    val accepted = scala.collection.mutable.ListBuffer
      .empty[(String, String, Long)]
    val usedSyms = scala.collection.mutable.Set.empty[String]
    var ceiling = -1L // max family ceiling m_i over accepted pairs
    var stop = false
    var k = 0
    while (!stop && k < pairs.size && accepted.size < cap) {
      val (a, b, c) = pairs(k)
      // the first pair is the round's true argmax — always safe
      if (accepted.nonEmpty &&
          (usedSyms.contains(a) || usedSyms.contains(b) || c <= ceiling))
        stop = true
      else {
        accepted += ((a, b, c))
        usedSyms += a; usedSyms += b
        usedSyms += (a + b) // defensive: see seeding invariant above
        // family ceiling: original counts of (x, a) and (b, y) bound
        // every pair this merge can create; (a, a) self-family and the
        // a == b case fall out of the same predicate
        val m = pairs.iterator.collect {
          case (x, y, cc) if y == a || x == b => cc
        }.foldLeft(floor)(math.max)
        ceiling = math.max(ceiling, m)
        k += 1
      }
    }
    accepted.toSeq
  }

  /** BPE segmentation: apply a learned merge table (in learned order) to
    * the corpus — the tokenizer-application half of [[bpeTrain]]. Exact
    * token counts per word are what a packing/budgeting pipeline consumes.
    *
    * Map-only after the word-frequency shuffle: the merge list folds into
    * ONE nested codegen'd expression (12 merges = 12 nested REPLACEs over
    * the wrapped-symbol encoding — same soundness argument as training:
    * wrapped symbols share no characters, alphabet closed over [a-z]+).
    * Applying merges in learned order over the initial character split is
    * BY CONSTRUCTION the training chain's final word state, which is what
    * the battery row pins cross-engine.
    *
    * Output: (word, cnt BIGINT, tokens STRING space-joined,
    * n_tokens BIGINT).
    */
  def bpeSegment(df: DataFrame, textCol: String,
                 merges: Seq[(String, String)]): DataFrame = {
    require(merges.nonEmpty, "empty merge table")
    require(merges.forall { case (a, b) =>
      a.matches("[a-z]+") && b.matches("[a-z]+") },
      "merge symbols must be [a-z]+ (the bpeTrain alphabet)")
    val wrapped0 =
      "concat('(', array_join(regexp_extract_all(word, '[a-z]', 0), ')('), ')')"
    val folded = merges.foldLeft(wrapped0) { case (acc, (a, b)) =>
      s"replace($acc, '($a)($b)', '($a$b)')"
    }
    df.select(explode(
        expr(s"regexp_extract_all(lower($textCol), '[a-z]+', 0)")).as("word"))
      .groupBy(col("word")).agg(count(lit(1)).as("cnt"))
      .withColumn("__r", expr(folded))
      .select(col("word"), col("cnt"),
        expr("split(substring(__r, 2, length(__r) - 2), '\\\\)\\\\(')")
          .as("__syms"))
      .select(col("word"), col("cnt"),
        array_join(col("__syms"), " ").as("tokens"),
        size(col("__syms")).cast("long").as("n_tokens"))
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
    // r10 (guide §1.2 job floor): the population total rides the class
    // census checkpoint via observe — one action instead of a checkpoint
    // plus a second aggregation over it
    val (classes, mC) = GraphOps.checkpointWithProbe(
      docLabel.groupBy(col("lbl")).agg(count(lit(1)).as("n_c")),
      sum(col("n_c")).as("__total"))
    val nTotal = Option(mC("__total")).map(_.asInstanceOf[Long]).getOrElse(0L)
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
