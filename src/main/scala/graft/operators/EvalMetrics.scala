package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Evaluation metrics for model/data quality pipelines — the measurement
  * half of a training-data loop (the reference's metric surface stops at
  * counters/distributions, `ray_beam_runner` metrics docs; these are the
  * dataset-level companions a 100 TB eval job needs).
  *
  * Scale notes:
  *  - [[aucExact]] never materializes a global single-partition window:
  *    the rank-sum runs as a two-level prefix sum (range partition →
  *    partition-local window → driver-side offsets over ≤ P scalars).
  *  - [[ndcgAtK]] partitions every window by the query id — per-query
  *    work parallelizes across however many queries exist.
  *  - [[calibrationReport]] is one hash aggregate over nBins groups.
  */
object EvalMetrics {

  /** Exact ROC-AUC by grouped rank-sum (Mann–Whitney U with midrank tie
    * handling), entirely in integer arithmetic until the final division.
    *
    * Identity: with distinct scores s ascending, `negBelow(s)` the count
    * of negatives at strictly smaller scores, `pos(s)`/`neg(s)` the label
    * counts at s,
    *   2·U = Σ_s pos(s) · (2·negBelow(s) + neg(s)),   AUC = U / (P·N).
    * Ties contribute the 1/2 credit via the `neg(s)` term — no float
    * ranks anywhere, so the numerator/denominator pair is exact and
    * hash-comparable cross-engine.
    *
    * Distribution: scores collapse to one row per distinct value (first
    * shuffle, map-side combined); the prefix count of negatives runs as a
    * two-level scan — `repartitionByRange(score)` (RangePartitioner is
    * order-preserving across partition ids), a partition-local window for
    * the intra-partition prefix, and a driver-side prefix over the ≤ P
    * per-partition totals joined back by broadcast. No stage ever sees a
    * single-partition global window, so the shape survives a distinct-score
    * column of any size.
    *
    * Output: one row — n_pos, n_neg, auc_num (= 2U), auc_den (= 2·P·N)
    * as BIGINT, and auc = ROUND(num/den, 6).
    */
  def aucExact(df: DataFrame, scoreCol: String, labelCol: String,
               numPartitions: Int = 0): DataFrame =
    aucFromScoreCounts(
      df.select(col(scoreCol).cast("double").as("score"),
          col(labelCol).cast("long").as("lbl"))
        .filter(col("score").isNotNull && col("lbl").isNotNull)
        .groupBy(col("score"))
        .agg(sum(col("lbl")).as("pos"),
          (count(lit(1)) - sum(col("lbl"))).as("neg")),
      numPartitions)

  /** The AUC finisher over the mergeable sufficient statistic: a
    * (score, pos, neg) count table. The statistic is additive — counts
    * from shards, days, or micro-batches merge by summing per score —
    * which is what makes AUC computable incrementally (see the streaming
    * battery's d170): fold counts as data arrives, finish once at the
    * end. Input rows with a repeated score are re-combined here, so a
    * partially-merged table is accepted.
    */
  def aucFromScoreCounts(counts: DataFrame, numPartitions: Int = 0): DataFrame = {
    val grouped = counts.groupBy(col("score"))
      .agg(sum(col("pos")).as("pos"), sum(col("neg")).as("neg"))
    ScaleOps.globalPrefixSum(grouped, "score", Seq("neg" -> "local_below"),
        numPartitions = numPartitions)
      .agg(
        sum(col("pos")).cast("long").as("n_pos"),
        sum(col("neg")).cast("long").as("n_neg"),
        sum(col("pos") * (lit(2L) * col("local_below") + col("neg")))
          .cast("long").as("auc_num"))
      .withColumn("auc_den", lit(2L) * col("n_pos") * col("n_neg"))
      .withColumn("auc",
        when(col("auc_den") > 0,
          round(col("auc_num").cast("double") / col("auc_den"), 6)))
      .select(col("n_pos"), col("n_neg"), col("auc_num"), col("auc_den"), col("auc"))
  }

  /** Precision/recall curve: one row per distinct score threshold t —
    * TP/FP/FN and precision/recall/F1 of the classifier "predict positive
    * iff score ≥ t". Cumulative counts run DESCENDING through the same
    * two-level scan as [[aucFromScoreCounts]] ([[ScaleOps.globalPrefixSum]]
    * — no single-partition window); ratios are IEEE divisions of exact
    * integers, so raw doubles agree cross-engine and ROUND 6 is cosmetic.
    */
  def prCurve(df: DataFrame, scoreCol: String, labelCol: String,
              numPartitions: Int = 0): DataFrame = {
    val grouped = df
      .select(col(scoreCol).cast("double").as("score"),
        col(labelCol).cast("long").as("lbl"))
      .filter(col("score").isNotNull && col("lbl").isNotNull)
      .groupBy(col("score"))
      .agg(sum(col("lbl")).as("pos"),
        (count(lit(1)) - sum(col("lbl"))).as("neg"))
    val scanned = ScaleOps.globalPrefixSum(grouped, "score",
      Seq("pos" -> "__pos_above", "neg" -> "__neg_above"),
      ascending = false, numPartitions = numPartitions)
      .localCheckpoint() // the total-positives aggregate below re-reads it
    val totals = scanned.agg(sum(col("pos")).cast("long").as("__p"))
    scanned.crossJoin(broadcast(totals))
      .select(
        col("score"),
        (col("__pos_above") + col("pos")).cast("long").as("tp"),
        (col("__neg_above") + col("neg")).cast("long").as("fp"),
        (col("__p") - col("__pos_above") - col("pos")).cast("long").as("fn"))
      .withColumn("__prec", col("tp").cast("double") / (col("tp") + col("fp")))
      .withColumn("__rec", col("tp").cast("double") / (col("tp") + col("fn")))
      .withColumn("prec", round(col("__prec"), 6))
      .withColumn("rec", round(col("__rec"), 6))
      .withColumn("f1",
        when(col("tp") > 0, round(
          lit(2.0) * col("__prec") * col("__rec") /
            (col("__prec") + col("__rec")), 6)))
      .drop("__prec", "__rec")
  }

  /** Per-query NDCG@k over a ranked candidate frame.
    *
    * Input: one row per (query, doc) with a relevance grade and a ranking
    * score. Rank = ROW_NUMBER ordered by (score DESC, id ASC) — callers
    * should pass a score already rounded to its cross-engine-stable
    * precision so the order cannot flip on summation ulps. DCG uses the
    * exponential gain (2^rel − 1) / log2(rank + 1); IDCG re-ranks the SAME
    * candidate set by (rel DESC, id ASC). Every window partitions by the
    * query id, so queries evaluate independently and in parallel; no
    * global sort exists anywhere.
    *
    * Output: one row per query — n_candidates, dcg/idcg/ndcg ROUND 6.
    */
  def ndcgAtK(ranked: DataFrame, queryCol: String, idCol: String,
              scoreCol: String, relCol: String, k: Int): DataFrame = {
    val byScore = Window.partitionBy(col(queryCol))
      .orderBy(col(scoreCol).desc, col(idCol).asc)
    val byRel = Window.partitionBy(col(queryCol))
      .orderBy(col(relCol).desc, col(idCol).asc)
    def gain(rankCol: Column): Column =
      (pow(lit(2.0), col(relCol).cast("double")) - lit(1.0)) /
        (log(rankCol.cast("double") + lit(1.0)) / log(lit(2.0)))
    ranked
      .withColumn("__r_score", row_number().over(byScore))
      .withColumn("__r_ideal", row_number().over(byRel))
      .withColumn("__dcg_term",
        when(col("__r_score") <= k, gain(col("__r_score"))).otherwise(lit(0.0)))
      .withColumn("__idcg_term",
        when(col("__r_ideal") <= k, gain(col("__r_ideal"))).otherwise(lit(0.0)))
      .groupBy(col(queryCol))
      .agg(
        count(lit(1)).cast("long").as("n_candidates"),
        round(sum(col("__dcg_term")), 6).as("dcg"),
        round(sum(col("__idcg_term")), 6).as("idcg"),
        when(sum(col("__idcg_term")) > 0,
          round(sum(col("__dcg_term")) / sum(col("__idcg_term")), 6)).as("ndcg"))
  }

  /** Equal-width calibration report: bin predicted probabilities into
    * nBins buckets (p = 1.0 joins the top bin), report per-bin volume,
    * mean confidence, empirical accuracy, |gap| and the bin's ECE weight
    * — Σ weight·|gap| over the rows is the expected calibration error.
    * One hash-aggregate scan; output is nBins rows regardless of input
    * size. Doubles are rounded AFTER all arithmetic (per-element values
    * are engine-identical; only summation order differs).
    */
  def calibrationReport(df: DataFrame, probCol: String, labelCol: String,
                        nBins: Int = 10): DataFrame = {
    val binned = df
      .select(col(probCol).cast("double").as("p"),
        col(labelCol).cast("long").as("lbl"))
      .filter(col("p").isNotNull && col("lbl").isNotNull)
      .withColumn("bin", // symmetric clamp: p ≤ 0 → bin 0, p ≥ 1 → top bin
        least(greatest(floor(col("p") * nBins), lit(0L)), lit(nBins - 1L))
          .cast("long"))
      .groupBy(col("bin"))
      .agg(
        count(lit(1)).cast("long").as("n"),
        avg(col("p")).as("__conf"),
        avg(col("lbl").cast("double")).as("__acc"))
      // materialized once (nBins rows) — both consumers below read the
      // checkpoint instead of re-running the input scan
      .localCheckpoint()
    // `binned` is nBins rows — the grand total is an aggregate over it, not
    // a second scan of the input.
    val tot = binned.agg(sum(col("n")).cast("double").as("__total"))
    binned.crossJoin(broadcast(tot))
      .select(
        col("bin"), col("n"),
        round(col("__conf"), 6).as("conf"),
        round(col("__acc"), 6).as("acc"),
        round(abs(col("__conf") - col("__acc")), 6).as("abs_gap"),
        round(abs(col("__conf") - col("__acc")) * (col("n") / col("__total")), 6)
          .as("ece_term"))
  }

  /** Kaplan–Meier survival estimator with right-censoring — the standard
    * churn/retention curve:  S(t) = Π_{u ≤ t} (1 − d_u / n_u), where d_u
    * counts observed events at duration u and n_u the subjects still at
    * risk. Input is one row per SUBJECT: (durationCol integral,
    * observedCol 1 = event observed / 0 = censored).
    *
    * Scale shape: one hash aggregation to the per-duration census (the
    * frame everything else touches — its cardinality is the number of
    * DISTINCT durations, calendar-bounded, not subject-count-bounded),
    * then two [[ScaleOps.globalPrefixSum]] two-level scans: the first
    * turns the census into at-risk counts (n_t = N − #{duration < t}),
    * the second accumulates the log-survival terms — no single-partition
    * window anywhere. The product runs as exp(Σ ln(1 − d/n)): each term is
    * IEEE-identical cross-engine; summation-order ulps are absorbed by the
    * caller's output rounding.
    *
    * The d = n boundary (everyone at risk dies at t): ln(0) is dodged by
    * a flag prefix — survival is exactly 0.0 from the first such t on.
    *
    * Output, one row per distinct duration: (t BIGINT, n_risk BIGINT,
    * n_events BIGINT, n_censored BIGINT, survival DOUBLE, unrounded).
    */
  def kaplanMeier(df: DataFrame, durationCol: String,
                  observedCol: String): DataFrame = {
    val perT = df.groupBy(col(durationCol).cast("long").as("t"))
      .agg(sum(when(col(observedCol) === 1, 1L).otherwise(0L)).as("n_events"),
        sum(when(col(observedCol) === 1, 0L).otherwise(1L)).as("n_censored"))
    // r10 (guide §1.2 job floor): the cohort size comes straight from the
    // prefix scan's own per-partition totals — the old separate
    // aggregation re-scanned the prefix-summed frame just to re-add the
    // same per-t counts. Same exact Long sums, one fewer action and pass.
    val (pre, grand) = ScaleOps.globalPrefixSumWithTotals(perT, "t",
      Seq("n_events" -> "__pd", "n_censored" -> "__pc"))
    val n = grand(0).asInstanceOf[Long] + grand(1).asInstanceOf[Long]
    val atRisk = pre
      .withColumn("n_risk", lit(n) - col("__pd") - col("__pc"))
      .withColumn("__term",
        when(col("n_events") < col("n_risk"),
          log(lit(1.0) - col("n_events").cast("double") / col("n_risk")))
          .otherwise(lit(0.0)))
      .withColumn("__dead",
        when(col("n_events") >= col("n_risk"), 1L).otherwise(0L))
    ScaleOps.globalPrefixSum(atRisk, "t",
      Seq("__term" -> "__pterm", "__dead" -> "__pdead"))
      .select(col("t"), col("n_risk"), col("n_events"), col("n_censored"),
        when(col("__pdead") + col("__dead") > 0, lit(0.0))
          .otherwise(exp(col("__pterm") + col("__term"))).as("survival"))
  }

  /** Gini concentration index per group — the full-distribution
    * inequality measure (data-mixture concentration, revenue
    * concentration, token-budget skew), complementing the top-decile
    * share (d113) which reads one point of the same Lorenz curve.
    *
    * With the group's values x_1 ≤ … ≤ x_n (ties broken by `idCol` for a
    * total order) and S = Σx,
    *   G = (2·Σ i·x_i − (n+1)·S) / (n·S)
    * — every sum is exact integer arithmetic (`valueCol` must be
    * integral; scale money to cents first), so numerator and denominator
    * are exact and their single division of integers < 2^53 is correctly
    * rounded cross-engine (a 100 TB deployment with n·S beyond 2^53 swaps
    * the two accumulators to DECIMAL(38,0) — same shape). Zero-sum or
    * single-member groups emit NULL (Gini undefined), not a division
    * artifact.
    *
    * Distribution: the rank window partitions by `groupCol` — parallel
    * across groups, nothing global. When groups are FEW and huge (this
    * battery's 5 regions at 100 TB), the per-group rank inside one window
    * partition becomes the bottleneck; the documented scale path is the
    * [[ScaleOps.globalPrefixSum]] two-level scan ordered by
    * (group, value, id), which yields the same Σ i·x_i per group from
    * running sums — shape available, constant groups just don't need it
    * at tested SFs.
    *
    * Output per group: (groupCol, n BIGINT, total BIGINT, gini DOUBLE
    * ROUND 9).
    */
  def giniByGroup(df: DataFrame, groupCol: String, valueCol: String,
                  idCol: String): DataFrame = {
    val w = Window.partitionBy(col(groupCol))
      .orderBy(col("__x").asc, col(idCol).asc)
    df.select(col(groupCol), col(valueCol).cast("long").as("__x"),
        col(idCol))
      .withColumn("__i", row_number().over(w).cast("long"))
      .groupBy(col(groupCol))
      .agg(count(lit(1)).as("n"), sum(col("__x")).as("total"),
        sum(col("__i") * col("__x")).as("__ix"))
      .select(col(groupCol), col("n").cast("long").as("n"),
        col("total").cast("long").as("total"),
        when(col("n") > 1 && col("total") > 0,
          round((lit(2L) * col("__ix") - (col("n") + lit(1L)) * col("total"))
            .cast("double") /
            (col("n") * col("total")).cast("double"), 9)).as("gini"))
  }

  /** The weighted PAV stack over (xlo, xhi, n, Σy) blocks — the pure
    * kernel both levels of [[isotonicFit]] run (per-partition, then over
    * collected blocks on the driver). Pooling compares means by exact
    * Long cross products; equal means merge (>=). Exposed for the
    * property suite: EvalMetricsProps pins stack == minimax closed form
    * and the two-level decomposition lemma on random censuses.
    */
  private[graft] def pavBlocks(blocks: Iterator[(Double, Double, Long, Long)])
      : collection.mutable.ArrayBuffer[(Double, Double, Long, Long)] = {
    val stack = collection.mutable.ArrayBuffer
      .empty[(Double, Double, Long, Long)]
    blocks.foreach { b =>
      stack += b
      // pool while mean(prev) >= mean(cur), compared exactly
      while (stack.length >= 2 && {
        val p = stack(stack.length - 2); val c = stack.last
        p._4 * c._3 >= c._4 * p._3
      }) {
        val c = stack.remove(stack.length - 1)
        val p = stack.remove(stack.length - 1)
        stack += ((p._1, c._2, p._3 + c._3, p._4 + c._4))
      }
    }
    stack
  }

  /** Isotonic (monotone non-decreasing) regression by pool-adjacent-
    * violators — the exact calibration map behind probability calibration
    * (the step beyond [[calibrationReport]]'s fixed binning: PAV LEARNS
    * the bin boundaries). Returns one row per distinct `xCol` value:
    * `(x, n, sy, fitted)` where `fitted` is the pooled mean the isotonic
    * fit assigns to that x.
    *
    * Scale shape (the Spark MLlib decomposition): the corpus collapses to
    * a per-x census in ONE hash aggregate (value-domain-sized, never
    * row-count-sized), the census range-partitions on x and each
    * partition runs weighted PAV locally (`mapPartitions` — the genuine
    * per-partition-sequential case), and only the surviving BLOCKS
    * (xlo, xhi, n, Σy — one per pool, ≤ census rows, typically far
    * fewer) reach the driver for the final cross-partition PAV pass.
    * PAV-of-PAV-blocks equals PAV of the raw sequence, so the two-level
    * run is exact, and the driver collect is pool-count-bounded, not
    * data-bounded. Fitted values broadcast back as range lookups.
    *
    * Exactness: pool means are compared by Long CROSS PRODUCTS
    * (syA·nB vs syB·nA), never by double division, so pooling decisions
    * are exact; `fitted` is the single correctly-rounded double division
    * Σy/n of exact Longs — identical in any IEEE engine. Bound: the
    * cross products must stay < 2^63 (Σy·n per compared pool pair);
    * corpora past ~3·10^9 labeled rows per pool lift to BigInt.
    *
    * Ties: equal pooled means merge (>=, not >) — the fit is identical
    * either way (equal rationals divide to identical doubles), and
    * merging keeps the block list minimal.
    *
    * `xCol` is compared as DOUBLE internally: integer domains beyond
    * 2^53 should pre-rank to a dense index first.
    */
  def isotonicFit(df: DataFrame, xCol: String, labelCol: String): DataFrame = {
    val spark = df.sparkSession
    // NULL labels are EXCLUDED (they would inflate n without contributing
    // to Σy, silently dragging every pooled mean down — the d182 lesson)
    val census = df.filter(col(labelCol).isNotNull).groupBy(col(xCol))
      .agg(count(lit(1)).as("n"), sum(col(labelCol).cast("long")).as("sy"))
      .localCheckpoint() // feeds the PAV scan AND the fitted join-back
    val sorted = census
      .select(col(xCol).cast("double").as("__x"), col("n").cast("long"),
        col("sy").cast("long"))
      .repartitionByRange(col("__x"))
      .sortWithinPartitions(col("__x"))
    val partBlocks = sorted.rdd.mapPartitions { it =>
      pavBlocks(it.map(r => (r.getDouble(0), r.getDouble(0), r.getLong(1),
        r.getLong(2)))).iterator
    }.collect()
    // partitions are range-ordered but collect order is not guaranteed;
    // re-sort, then one more PAV pass heals the partition boundaries
    // (PAV-of-PAV-blocks == PAV of the raw sequence — the lemma
    // EvalMetricsProps pins against the minimax closed form)
    val fin = pavBlocks(partBlocks.sortBy(_._1).iterator)
    val blocksDf = spark.createDataFrame(fin.map { case (lo, hi, n, sy) =>
      (lo, hi, sy.toDouble / n)
    }.toSeq).toDF("__xlo", "__xhi", "fitted")
    census.join(broadcast(blocksDf),
        col(xCol).cast("double") >= col("__xlo") &&
        col(xCol).cast("double") <= col("__xhi"))
      .select(col(xCol), col("n").cast("long").as("n"),
        col("sy").cast("long").as("sy"), col("fitted"))
  }
}
