package graft.operators

import graft.functions.{Hashing, TextFunctions, VectorFunctions}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deduplication operators for training-data pipelines (builder-prompt
  * extensions; the reference itself has no dedup — SURVEY.md §2.3/§7.1-6).
  *
  * Scale notes (100 TB design point):
  *  - exact dedup is one hash shuffle on the dedup key;
  *  - MinHash-LSH shuffles each doc `bands` times (band-key explode) and
  *    self-joins per bucket — candidate volume is controlled by (bands,
  *    rowsPerBand), never all-pairs;
  *  - SimHash block-probing joins on 16-bit blocks — 4 shuffled copies,
  *    Hamming verification only inside blocks;
  *  - embedding near-dup blocks on a random-hyperplane LSH bucket first.
  * All signatures derive from seeded xxhash64 → deterministic across runs
  * and cluster layouts, so incremental re-runs are stable.
  */
object Dedup {

  /** Free the blocks behind an (eagerly) `localCheckpoint`ed DataFrame.
    * Iterative algorithms checkpoint per round; without an explicit release
    * every round's blocks live until session end. The checkpointed RDD sits
    * directly behind the `LogicalRDD` leaf of the returned Dataset.
    */
  private[graft] def releaseCheckpoint(df: DataFrame): Unit =
    df.queryExecution.analyzed.collectLeaves().foreach {
      case l: org.apache.spark.sql.execution.LogicalRDD => l.rdd.unpersist(false)
      case _ => ()
    }

  /** Exact dedup: keep the row with the smallest `tieBreaker` per key group.
    * Single shuffle (window on the dedup key). `tieBreaker` must be UNIQUE
    * within each key group (a row id) — ties would otherwise fall back to
    * partition arrival order and re-runs could keep different survivors.
    */
  def exact(df: DataFrame, keyCols: Seq[String], tieBreaker: String): DataFrame = {
    val w = Window.partitionBy(keyCols.map(col): _*).orderBy(col(tieBreaker))
    df.withColumn("__rn", row_number().over(w)).filter(col("__rn") === 1).drop("__rn")
  }

  /** Exact-duplicate groups: key -> representative id + duplicate count.
    * (Aggregation form — what you run first on a 100 TB corpus to size the
    * problem; one map-side-combinable shuffle.)
    */
  def exactGroups(df: DataFrame, keyCol: String, idCol: String): DataFrame =
    df.groupBy(col(keyCol))
      .agg(min(col(idCol)).as("rep_id"), count(lit(1)).as("n_dups"))

  /** MinHash signatures for a text column (word shingles → n-hash signature).
    * The per-shingle string hash is materialized as its own projection so the
    * `numHashes` slot expressions re-mix longs instead of re-hashing strings.
    */
  def withMinHash(df: DataFrame, textCol: String, shingleSize: Int, numHashes: Int): DataFrame =
    df.withColumn("__shingles", TextFunctions.wordShingles(col(textCol), shingleSize))
      .withColumn("__sig",
        graft.plans.NativeExpressions.minHashSignature(col("__shingles"), numHashes))

  /** MinHash-LSH near-duplicate candidate pairs with estimated Jaccard ≥
    * `threshold`. Pipeline: shingle → signature → explode band keys →
    * bucket self-join (id1 < id2) → signature-level Jaccard filter.
    * Returns (id1, id2, jaccard_est).
    */
  def minHashLshPairs(
      df: DataFrame, idCol: String, textCol: String,
      shingleSize: Int = 3, numHashes: Int = 128,
      bands: Int = 32, threshold: Double = 0.7,
      maxBucketSize: Int = 5000): DataFrame = {
    require(bands > 0 && numHashes >= bands && numHashes % bands == 0,
      s"numHashes ($numHashes) must be a positive multiple of bands ($bands) — " +
        "a zero rowsPerBand would silently bucket every doc together")
    val rowsPerBand = numHashes / bands
    // signatures feed three plan branches (banding + two pair joins) —
    // cache so the tokenize+hash pass runs once (at cluster scale this is a
    // persisted/checkpointed signature table). The native expression never
    // materializes shingle strings: tokens hash once, windows fold hashes.
    // Exact-duplicate collapse FIRST: docs with identical signatures (exact
    // dups and shingle-set dups) reduce to their min-id representative
    // before any pairing. Without this a corpus with d copies of a doc
    // yields d(d-1)/2 identical pairs per bucket — quadratic in the very
    // duplicates dedup exists to remove. Exact clusters are recovered
    // separately ([[exactGroups]]); the pair output relates representatives.
    // fanOut: the signature pass is the CPU-heavy stage — spread a
    // few-partition scan across all slots (no-op on a many-split corpus).
    // The identical-signature collapse groups by a 128-bit HASH of the
    // signature, not the 128-slot array itself: array grouping keys force
    // sort/object-based aggregation with interpreted comparisons, while two
    // long keys stay in codegen'd HashAggregate. Within a hash group every
    // signature is identical (128-bit collision odds are ~1e-14 even at 1e12
    // distinct signatures), so first(__sig) is deterministic.
    // INDEPENDENCE of the two hashes matters: Spark's multi-arg xxhash64
    // CHAINS column hashes (each column's hash seeds the next), so
    // xxhash64(sig, lit(1)) would be a pure function of xxhash64(sig) and
    // the pair would carry only 64 bits. Putting the lit FIRST —
    // xxhash64(lit(1), sig) — hashes sig under a different effective seed,
    // making the pair genuinely 128-bit.
    val sigs = ScaleOps.fanOut(df.select(col(idCol).as("__docid"), col(textCol)))
      .select(col("__docid"),
        graft.plans.NativeExpressions.minHashShingleSignature(
          TextFunctions.tokens(lower(col(textCol))), shingleSize, numHashes).as("__sig"))
      .groupBy(xxhash64(col("__sig")).as("__h1"),
        xxhash64(lit(1L), col("__sig")).as("__h2"))
      .agg(min(col("__docid")).as("__id"), first(col("__sig")).as("__sig"))
      .select(col("__id"), col("__sig"))
      .persist()
    // band-explode only (id, band, bucket) — the heavy signature array is
    // joined back just once per surviving candidate pair, not shuffled
    // `bands` times. Candidates come from ONE groupBy (not a two-sided
    // self-join): buckets collect their ids and expand pairs in place.
    // Buckets above `maxBucketSize` are dropped — an explicit cap on the
    // quadratic worst case (a degenerate band bucket at corpus scale would
    // otherwise dominate the job); exact-dup collapse above keeps normal
    // buckets tiny, so the cap only trims pathological band collisions.
    val banded = sigs.select(col("__id"),
        posexplode(graft.plans.NativeExpressions.bandBuckets(
          col("__sig"), bands, rowsPerBand)))
      .select(col("__id"), struct(col("pos"), col("col")).as("__bk"))
    // Singleton-bucket prefilter: at corpus scale the vast majority of band
    // buckets hold exactly one doc. Counting first is a map-side-combinable
    // aggregate (tiny shuffle of (bucket, n) partials); only rows in
    // surviving buckets — a small set — reach the collect_list shuffle.
    val liveBuckets = banded.groupBy(col("__bk"))
      .agg(count(lit(1)).as("__n"))
      .filter(col("__n").between(2, maxBucketSize))
      .select(col("__bk"))
    val cand = banded.join(liveBuckets, Seq("__bk"), "left_semi")
      .groupBy(col("__bk"))
      .agg(collect_list(col("__id")).as("ids"))
      .select(explode(graft.plans.NativeExpressions.idPairs(col("ids"))).as("p"))
      .select(col("p.id1").as("id1"), col("p.id2").as("id2"))
      .dropDuplicates("id1", "id2")
    // Join-back strategy is left to AQE: candidate pairs are usually tiny
    // relative to the corpus (AQE broadcasts them and streams the cached
    // sigs side); when a duplicate-heavy corpus makes pairs large, both
    // sides hash-shuffle on id — never broadcast the full signature table.
    val pairs = cand
      .join(sigs.select(col("__id").as("id1"), col("__sig").as("__s1")), "id1")
      .join(sigs.select(col("__id").as("id2"), col("__sig").as("__s2")), "id2")
      .withColumn("jaccard_est", Hashing.minHashJaccard(col("__s1"), col("__s2")))
      .filter(col("jaccard_est") >= threshold)
      .select(col("id1"), col("id2"), round(col("jaccard_est"), 6).as("jaccard_est"))
    // Materialize the (small) pair list eagerly, then RELEASE the signature
    // cache — method-local persists must not leak blocks into later queries
    // (a 48-query battery accumulates them otherwise). localCheckpoint also
    // truncates lineage so callers (connected components, verify stage)
    // re-consume pairs without re-running the LSH pipeline.
    val out = pairs.localCheckpoint()
    sigs.unpersist()
    out
  }

  /** Transitive near-dup clusters from a pair list. Returns (id, cluster_id)
    * where cluster_id = min id of the component.
    *
    * Hybrid execution: the pair list is the OUTPUT of an LSH dedup pass —
    * exact-dup-collapsed and similarity-thresholded, orders of magnitude
    * smaller than the corpus — so up to `maxDriverEdges` edges (16 bytes
    * each; the default bounds the collect at ~64 MB) a driver-side
    * union-find answers in one job. Above the threshold: iterative min-label
    * propagation (each node adopts the smallest id reachable through the
    * pair graph; converges in O(component diameter) rounds, each one
    * edge-join + aggregate — the standard large-scale connected-components
    * loop, lineage-truncated per round).
    */
  def connectedComponents(pairs: DataFrame, maxIter: Int = 20,
      maxDriverEdges: Long = 1L << 22): DataFrame = {
    // ONE bounded collect decides the path AND feeds union-find — a separate
    // count() job would run the (possibly un-checkpointed) pair pipeline
    // twice and open a count/collect consistency window
    val capLimit = math.min(maxDriverEdges, Int.MaxValue.toLong - 1).toInt
    val capped = pairs.select(col("id1"), col("id2")).limit(capLimit + 1).collect()
    if (capped.length <= capLimit) {
      val parent = scala.collection.mutable.LongMap.empty[Long]
      def find(x0: Long): Long = {
        var x = x0
        while (parent.getOrElse(x, x) != x) {
          val p = parent(x)
          parent(x) = parent.getOrElse(p, p) // path halving
          x = parent(x)
        }
        x
      }
      val nodes = scala.collection.mutable.ArrayBuffer.empty[Long]
      capped.foreach { r =>
        val a = r.getLong(0); val b = r.getLong(1)
        if (!parent.contains(a)) { parent(a) = a; nodes += a }
        if (!parent.contains(b)) { parent(b) = b; nodes += b }
        val ra = find(a); val rb = find(b)
        // union by min id so the root IS the cluster label
        if (ra != rb) { if (ra < rb) parent(rb) = ra else parent(ra) = rb }
      }
      val s = pairs.sparkSession
      import s.implicits._
      return nodes.toSeq.map(id => (id, find(id))).toDF("id", "cluster_id")
    }
    val edges = pairs.select(col("id1").as("src"), col("id2").as("dst"))
      .union(pairs.select(col("id2").as("src"), col("id1").as("dst")))
      .distinct().persist()
    var labels = edges.select(col("src").as("id")).distinct()
      .withColumn("label", col("id"))
      .localCheckpoint()
    var iter = 0
    var changed = 1L
    while (changed > 0 && iter < maxIter) {
      val neighborMin = edges.join(labels, edges("dst") === labels("id"))
        .groupBy(col("src")).agg(min(col("label")).as("nl"))
      // carry the previous label through the checkpoint so convergence is
      // observable DURING materialization: the changed-row count rides the
      // checkpoint job itself (r10, same observed-checkpoint fusion as
      // GraphOps) — one action per round instead of checkpoint + a
      // second filter/count pass over the just-written blocks
      val (updated, mCh) = GraphOps.checkpointWithProbe(
        labels.join(neighborMin, labels("id") === neighborMin("src"), "left")
          .select(col("id"),
            least(col("label"), coalesce(col("nl"), col("label"))).as("label"),
            col("label").as("__old")),
        sum(when(col("label") =!= col("__old"), 1L).otherwise(0L))
          .as("changed"))
      changed = Option(mCh("changed").asInstanceOf[java.lang.Long])
        .fold(0L)(_.longValue) // SUM over zero rows is NULL
      releaseCheckpoint(labels) // round i-1's blocks are dead once round i lands
      labels = updated.drop("__old")
      iter += 1
    }
    // hand back a small checkpointed result and free the last round's state
    val out = labels.select(col("id"), col("label").as("cluster_id")).localCheckpoint()
    releaseCheckpoint(labels)
    edges.unpersist()
    out
  }

  /** Near-dedup policy: drop any doc that has a near-dup partner with a
    * smaller id (deterministic, one pass over the pair list).
    */
  def keepMinIdSurvivors(df: DataFrame, idCol: String, pairs: DataFrame): DataFrame = {
    val losers = pairs.select(col("id2").as("__loser")).distinct()
    df.join(losers, col(idCol) === col("__loser"), "left_anti")
  }

  /** Exact n-gram Jaccard verification over candidate pairs (re-score LSH
    * candidates with true shingle-set Jaccard — the verify stage of the
    * standard pipeline).
    */
  def ngramJaccardVerify(
      df: DataFrame, idCol: String, textCol: String,
      pairs: DataFrame, shingleSize: Int = 3, threshold: Double = 0.5): DataFrame = {
    val sh = df.select(col(idCol).as("__id"),
      TextFunctions.wordShingles(col(textCol), shingleSize).as("__sh"))
    pairs.select("id1", "id2")
      .join(sh.withColumnRenamed("__id", "id1").withColumnRenamed("__sh", "__sh1"), "id1")
      .join(sh.withColumnRenamed("__id", "id2").withColumnRenamed("__sh", "__sh2"), "id2")
      .withColumn("jaccard", round(Hashing.jaccard(col("__sh1"), col("__sh2")), 6))
      .filter(col("jaccard") >= threshold)
      .select("id1", "id2", "jaccard")
  }

  /** EXACT Jaccard-threshold self-join via prefix filtering (the PPJoin
    * candidate-generation idea: Xiao et al., "Efficient Similarity Joins
    * for Near Duplicate Detection"; reference ships the approximate
    * MinHash-LSH route — this is its exact-output counterpart). Returns
    * every pair of docs whose `shingleSize`-gram-set Jaccard is ≥
    * tNum/tDen — identical to the brute-force O(n²) join, WITHOUT running
    * it.
    *
    * The threshold is an exact rational: prefix lengths use integer
    * ceil((tNum·n)/tDen) and the verify test is
    * `inter·tDen ≥ (n1+n2−inter)·tNum` — all integers, so the kept SET is
    * deterministic and engine-portable (no double epsilons at the
    * boundary, where real corpora cluster).
    *
    * Shape at 100 TB, in order:
    *  1. grams per doc (map-side, native expression);
    *  2. global gram frequencies (one hash shuffle — the "document
    *     frequency" table, vocabulary-sized);
    *  3. each doc sorts its OWN grams by (freq, gram) — a per-row
    *     sort_array, no global rank table and no global sort: any shared
    *     total order satisfies the prefix-filter lemma, so the (freq,
    *     gram) tuple itself serves as the order;
    *  4. candidates = docs sharing a gram within their length-L prefixes,
    *     L = n − ceil(t·n) + 1 — the rare-first order makes prefix grams
    *     the most selective ones, which is what bounds candidate fan-out
    *     (a stop-gram can never enter a prefix unless the threshold is
    *     tiny);
    *  5. exact verify joins the full gram sets back by doc id.
    * Every shuffle is key-partitioned (gram or id); nothing global.
    * Standing convention applies: exact-dup collapse FIRST ([[exact]]) if
    * the corpus may contain byte-identical copies — c copies share all
    * grams and pay c² verifies.
    */
  def prefixFilteredJaccardPairs(
      df: DataFrame, idCol: String, textCol: String,
      shingleSize: Int = 8, tNum: Int = 1, tDen: Int = 2): DataFrame =
    jaccardJoinCore(
      sideGrams(df, idCol, textCol, shingleSize, 0), tNum, tDen,
      crossSides = false)

  /** The TWO-TABLE form of [[prefixFilteredJaccardPairs]]: every
    * (left, right) pair whose gram-set Jaccard is ≥ tNum/tDen — exact
    * threshold DECONTAMINATION (which eval docs overlap ≥ t with ANY
    * training doc), dataset-overlap audits, supplier-dedup across
    * catalogs. Same prefix-filter algebra; the shared total order that
    * the prefix lemma needs comes from gram frequencies over the UNION of
    * both sides, and candidates pair across sides only — left×left and
    * right×right pairs are never generated, let alone verified. Output:
    * (id1 = left id, id2 = right id, inter, n1, n2, jaccard); id spaces
    * may overlap freely (sides are tracked internally).
    */
  def prefixFilteredJaccardJoin(
      left: DataFrame, right: DataFrame, idCol: String, textCol: String,
      shingleSize: Int = 8, tNum: Int = 1, tDen: Int = 2): DataFrame =
    jaccardJoinCore(
      sideGrams(left, idCol, textCol, shingleSize, 0)
        .unionByName(sideGrams(right, idCol, textCol, shingleSize, 1)),
      tNum, tDen, crossSides = true)

  private def sideGrams(df: DataFrame, idCol: String, textCol: String,
      shingleSize: Int, side: Int): DataFrame =
    df.select(col(idCol).as("__id"), lit(side).as("__side"),
      TextFunctions.wordShingles(col(textCol), shingleSize).as("__gs"))
      // empty/NULL-text docs carry the [""] sentinel shingle — no token
      // evidence to judge similarity on; excluded (they are exact-dup
      // territory, [[exact]]'s job, and engines disagree on NULL grams)
      .filter(size(col("__gs")) > 1 || element_at(col("__gs"), 1) =!= "")

  /** Shared core: `grams` = (__id, __side, __gs). Self mode pairs by
    * id1 < id2 within the single side; cross mode pairs side 0 × side 1
    * only (ids may collide across sides — (__id, __side) is the row key).
    */
  private def jaccardJoinCore(grams0: DataFrame, tNum: Int, tDen: Int,
      crossSides: Boolean): DataFrame = {
    require(tNum > 0 && tDen > 0 && tNum <= tDen,
      s"threshold must be a rational in (0,1]: $tNum/$tDen")
    // fanOut BEFORE the checkpoint: shingle extraction is scan-fused and a
    // single-row-group bench file makes that stage 1 task — and the
    // checkpoint would then hold 1 partition, serializing every downstream
    // map pass too (guide §2.5). Probing here is safe (scan/union upstream,
    // no exchange); no-op on a many-split corpus.
    // r10 A/B (the r9 VERDICT's "weak" rows, re-measured same-box,
    // min-of-3 standalone + JobProbe): WITH fanOut d157 2.248 s / d163
    // 2.288 s (9 jobs, 115 tasks, taskSec 24.7); WITHOUT d157 2.366 s /
    // d163 2.287 s (8 jobs, 21 tasks, taskSec 3.1 ≈ serial downstream).
    // Wall-neutral-to-better with fanOut; the exchange costs ~5x total
    // task-CPU that pays back only through parallelism — which is why a
    // CONTENDED box (r9 driver run, +25-40% drift) can read this shape
    // slower. Kept: parallel headroom at equal wall, and a planning-only
    // no-op on any many-split real corpus.
    val grams = ScaleOps.fanOut(grams0)
      .localCheckpoint(false) // two consumers: prefixes + verify
    val posts = grams.select(col("__id"), col("__side"),
      explode(col("__gs")).as("__g"))
    val freq = posts.groupBy(col("__g")).agg(count(lit(1)).as("__f"))
    // per-doc prefix in rare-first (freq, gram) order; L = n - ceil(tn) + 1
    val prefixes = posts.join(freq, "__g")
      .groupBy(col("__id"), col("__side"))
      .agg(sort_array(collect_list(struct(col("__f"), col("__g"))))
        .as("__sorted"))
      .select(col("__id"), col("__side"),
        expr(s"""slice(transform(__sorted, s -> s.__g), 1,
                 size(__sorted) - CAST(($tNum * size(__sorted) + $tDen - 1)
                   DIV $tDen AS INT) + 1)""").as("__prefix"))
      .select(col("__id"), col("__side"), explode(col("__prefix")).as("__g"))
    val pairCond =
      if (crossSides) col("a.__side") < col("b.__side")
      else col("a.__id") < col("b.__id")
    val cands = prefixes.as("a")
      .join(prefixes.as("b"), col("a.__g") === col("b.__g") && pairCond)
      .select(col("a.__id").as("id1"), col("b.__id").as("id2"))
      .distinct()
    val g1 = grams.filter(col("__side") === 0)
      .select(col("__id").as("id1"), col("__gs").as("__gs1"),
        size(col("__gs")).as("__n1"))
    val g2 = grams.filter(col("__side") === lit(if (crossSides) 1 else 0))
      .select(col("__id").as("id2"), col("__gs").as("__gs2"),
        size(col("__gs")).as("__n2"))
    cands.join(g1, "id1").join(g2, "id2")
      .withColumn("inter",
        size(array_intersect(col("__gs1"), col("__gs2"))).cast("long"))
      .filter(col("inter") * tDen >= (col("__n1") + col("__n2") - col("inter")) * tNum)
      .select(col("id1"), col("id2"), col("inter"),
        col("__n1").cast("long").as("n1"), col("__n2").cast("long").as("n2"),
        round(col("inter").cast("double") /
          (col("__n1") + col("__n2") - col("inter")), 6).as("jaccard"))
  }

  /** Edit-distance near-dup verification: the character-granular verify
    * tier below [[ngramJaccardVerify]]'s token Jaccard. Candidates are
    * generated by equality blocking on `blockCols` (e.g. (lang, n_chars) —
    * the cheap block for same-length near-identical docs) and scored with
    * Levenshtein, keeping pairs with distance ≤ `maxEdit`. Returns
    * (id1, id2, edit_dist, blockCols*) — block values are equal across a
    * pair, so callers can derive similarity from them (e.g. 1 − d/n_chars).
    *
    * Scale shape, in order:
    *  1. exact-dup collapse ([[exact]], min-id representative per identical
    *     text): c copies of a doc would otherwise pay c² Levenshteins per
    *     block (the 10x duplicate-heavy probe grew 54x without it);
    *  2. block census + cap: singleton blocks can't pair and are pruned;
    *     blocks above `maxBlockSize` are DROPPED — the same explicit
    *     quadratic-worst-case cap as [[minHashLshPairs]]/[[simHashPairs]].
    *     Levenshtein (O(L²) per pair) is the heaviest per-pair compute in
    *     the library, so a popular block of *distinct* same-length docs is
    *     the worst possible place to go quadratic at corpus scale;
    *  3. UNCONDITIONAL repartition before the self-join: the collapsed
    *     frame is small enough at bench scale that AQE coalesces its
    *     shuffle output to one partition, which would serialize the
    *     Levenshtein stage onto one task. Moving a few MB to buy full
    *     parallelism in the verify stage is the right trade at every
    *     scale. (A fanOut probe is wrong here: probing df.rdd on a
    *     post-shuffle frame runs the exchange as a planning-time job
    *     under AQE.)
    */
  def editDistancePairs(
      df: DataFrame, idCol: String, textCol: String,
      blockCols: Seq[String], maxEdit: Int = 120,
      maxBlockSize: Int = 1000): DataFrame = {
    val collapsed = exact(df, Seq(textCol), idCol)
    val live = collapsed.groupBy(blockCols.map(col): _*)
      .agg(count(lit(1)).as("__n"))
      .filter(col("__n").between(2, maxBlockSize))
      .drop("__n")
    // `live` is the distinct surviving cells — orders of magnitude smaller
    // than the corpus; AQE picks broadcast for the semi-join at any
    // realistic scale, and a hash semi-join on the block key otherwise.
    val t = collapsed.join(live, blockCols, "left_semi")
      .repartition(df.sparkSession.sparkContext.defaultParallelism)
    val blockEq = blockCols.map(c => col(s"a.$c") === col(s"b.$c")).reduce(_ && _)
    // THRESHOLDED Levenshtein: the banded DP is O(L × maxEdit) with early
    // exit, not O(L²) — on the heaviest per-pair compute in the library
    // that bound is the difference between a verify pass and a cluster
    // bill. Distances over the budget return -1, hence `between`, and the
    // reported distances are identical to the unthresholded form.
    t.as("a").join(t.as("b"), blockEq && col(s"a.$idCol") < col(s"b.$idCol"))
      .select(col(s"a.$idCol").as("id1") +: col(s"b.$idCol").as("id2") +:
        levenshtein(col(s"a.$textCol"), col(s"b.$textCol"), maxEdit).cast("long")
          .as("edit_dist") +:
        blockCols.map(c => col(s"a.$c").as(c)): _*)
      .filter(col("edit_dist").between(0, maxEdit))
  }

  /** SimHash near-dup pairs with Hamming distance ≤ maxHamming, via
    * block-probing: split the 64-bit fingerprint into `maxHamming + 1`
    * blocks; by pigeonhole two fingerprints within the distance share at
    * least one exact block. Same one-sided shape as [[minHashLshPairs]]:
    * singleton-block prefilter (most blocks hold one doc at corpus scale),
    * then ONE groupBy collects each surviving block's (id, fingerprint)
    * members — 16 bytes/doc, cheap to carry — and expands + Hamming-verifies
    * pairs in a single native loop. No self-join, no fingerprint join-back.
    *
    * `maxBlockSize` caps the quadratic worst case of a degenerate block —
    * the same deliberate recall trade [[minHashLshPairs]] makes with
    * `maxBucketSize`: a pair is LOST only if EVERY block the two
    * fingerprints share exceeds the cap (pairs usually share several
    * blocks; collapsed-identical fingerprints never re-inflate a block).
    * The pre-cap pigeonhole guarantee was exact; at corpus scale an
    * uncapped degenerate block (e.g. a zero block from short templated
    * docs) is an O(n²) pair explosion that would dominate the job, so the
    * cap is the scale-safe default. Raise it (≤ 46341, the pair-expansion
    * Int ceiling) where exact recall matters more than the worst case.
    */
  def simHashPairs(
      df: DataFrame, idCol: String, textCol: String,
      maxHamming: Int = 3, maxBlockSize: Int = 5000): DataFrame = {
    // fingerprints are collapsed + paired by the generic 64-bit Hamming
    // engine below; this wrapper only supplies the TEXT fingerprint
    // (one-pass native simHash64 over lowercase tokens). fanOut: the
    // hashing pass is the CPU-heavy stage — spread a few-partition scan
    // across all slots (no-op on a many-split corpus).
    hammingPairs64(
      ScaleOps.fanOut(df.select(col(idCol).as("__docid"), col(textCol)))
        .select(col("__docid").as("__id"),
          graft.plans.NativeExpressions.simHash64(
            TextFunctions.tokens(lower(col(textCol)))).as("__fp")),
      "__id", "__fp", maxHamming, maxBlockSize)
  }

  /** Generic near-dup pairs over ANY precomputed 64-bit signature column
    * with Hamming distance ≤ `maxHamming` — the block-probing core shared
    * by text SimHash ([[simHashPairs]]) and image perceptual dHash
    * ([[Multimodal.imageDHashes]]). Split the 64 bits into `maxHamming + 1`
    * blocks; by pigeonhole two signatures within the distance share at
    * least one exact block. Identical signatures collapse to their min-id
    * representative first (duplicate-heavy inputs otherwise produce
    * quadratic hamming-0 pair lists), then: singleton-block prefilter (most
    * blocks hold one row at corpus scale), ONE groupBy collecting each
    * surviving block's (id, sig) members — 16 bytes/row — and a single
    * native expand-and-verify loop. No self-join, no signature join-back.
    *
    * `maxBlockSize` caps the quadratic worst case of a degenerate block —
    * a pair is LOST only if EVERY block the two signatures share exceeds
    * the cap (pairs usually share several blocks; collapsed-identical
    * signatures never re-inflate a block). The pre-cap pigeonhole guarantee
    * was exact; at corpus scale an uncapped degenerate block (e.g. a zero
    * block from short templated docs) is an O(n²) pair explosion that
    * would dominate the job, so the cap is the scale-safe default. Raise it
    * (≤ 46341, the pair-expansion Int ceiling) where exact recall matters
    * more than the worst case.
    */
  def hammingPairs64(
      sigs: DataFrame, idCol: String, sigCol: String,
      maxHamming: Int = 3, maxBlockSize: Int = 5000): DataFrame = {
    require(maxHamming >= 0 && maxHamming <= 63,
      s"maxHamming must be in [0, 63] (needs >= 1 bit per block): $maxHamming")
    val nBlocks = maxHamming + 1
    val blockBits = 64 / nBlocks
    // JVM shifts are mod 64: a single 64-bit block (maxHamming = 0) needs
    // an explicit all-ones mask, (1L << 64) - 1 would be 0
    val blockMask = if (blockBits == 64) -1L else (1L << blockBits) - 1
    // signatures feed two branches (block census + member collection) —
    // compute once, cache
    val fp = sigs
      .select(col(idCol).cast("long").as("__docid"), col(sigCol).cast("long").as("__fp"))
      .groupBy(col("__fp")).agg(min(col("__docid")).as("__id"))
      .select(col("__id"), col("__fp"))
      .persist()
    val blocked = fp.withColumn("__blk", explode(array((0 until nBlocks).map { b =>
      struct(lit(b).as("i"),
        call_function("shiftright", col("__fp"), lit(b * blockBits))
          .bitwiseAND(lit(blockMask)).as("v"))
    }: _*)))
    val liveBlocks = blocked.groupBy(col("__blk"))
      .agg(count(lit(1)).as("__n"))
      .filter(col("__n").between(2, maxBlockSize))
      .select(col("__blk"))
    val pairs = blocked.join(liveBlocks, Seq("__blk"), "left_semi")
      .groupBy(col("__blk"))
      .agg(collect_list(struct(col("__id").as("id"), col("__fp").as("fp"))).as("members"))
      .select(explode(graft.plans.NativeExpressions.hammingPairs(
        col("members"), maxHamming)).as("p"))
      .select(col("p.id1").as("id1"), col("p.id2").as("id2"),
        col("p.hamming").as("hamming"))
      .dropDuplicates("id1", "id2")
    // materialize the small pair list, release the signature cache (see
    // the minHashLshPairs note on method-local persists)
    val out = pairs.localCheckpoint()
    fp.unpersist()
    out
  }

  /** Embedding near-dup pairs: block on a random-hyperplane LSH bucket, then
    * exact cosine ≥ threshold inside buckets.
    */
  def embeddingNearDupPairs(
      df: DataFrame, idCol: String, vecCol: String,
      lshBits: Int = 12, threshold: Double = 0.95): DataFrame = {
    val v = df.select(col(idCol).as("__id"), col(vecCol).as("__v"))
      .withColumn("__bucket", graft.plans.NativeExpressions.lshBucket(col("__v"), lshBits))
    v.as("a").join(v.as("b"),
        col("a.__bucket") === col("b.__bucket") && col("a.__id") < col("b.__id"))
      .withColumn("cosine",
        round(graft.plans.NativeExpressions.cosine(col("a.__v"), col("b.__v")), 6))
      .filter(col("cosine") >= threshold)
      .select(col("a.__id").as("id1"), col("b.__id").as("id2"), col("cosine"))
  }

  /** Normalized content key: the sorted distinct lowercase token set as one
    * string. Order- and multiplicity-insensitive, so re-worded shuffles of
    * the same bag of words collapse — the cheap "near-exact" key between
    * byte-exact md5 and MinHash.
    */
  def normalizedContentKey(text: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    concat_ws(" ", array_sort(array_distinct(TextFunctions.tokens(lower(text)))))

  /** Incremental exact dedup of a NEW batch against an EXISTING corpus — the
    * steady-state shape of a production ingest (the corpus is 100 TB, the
    * daily batch is not). Returns the new-batch rows whose `keyCol` content
    * key does not appear in the corpus.
    *
    * Plan shape, designed so the corpus is never shuffled:
    *  1. build a Bloom filter over xxhash64(corpus key) — one map-only pass
    *     folded with treeAggregate (in production, built once and persisted
    *     alongside the corpus, then updated incrementally);
    *  2. probe it over the batch's key projection (codegen'd
    *     [[graft.plans.BloomMightContainExpr]]): bloom-negative keys are
    *     PROVEN new and never leave the executor;
    *  3. the positive keys (true dups + ~fpp of the batch, small by
    *     contract) broadcast to a map-only corpus scan that emits only the
    *     keys actually present (`hits`), and one broadcast anti-join of the
    *     batch against `hits` finishes exactly.
    * A 64-bit hash collision can only turn a true negative into a "maybe" —
    * step 3 compares full keys, so the result is exact, not probabilistic.
    */
  def dedupAgainstCorpus(
      newBatch: DataFrame, corpus: DataFrame, idCol: String, keyCol: String,
      expectedCorpusItems: Long = 1 << 20, fpp: Double = 0.03): DataFrame = {
    import org.apache.spark.util.sketch.BloomFilter
    val corpusKeys = corpus.select(col(keyCol).as("__k"))
    val bloom = corpusKeys
      .select(xxhash64(col("__k")).as("__h"))
      .select("__h").as(org.apache.spark.sql.Encoders.scalaLong).rdd
      .treeAggregate(BloomFilter.create(expectedCorpusItems, fpp))(
        (f, h) => { f.putLong(h); f },
        (a, b) => { a.mergeInPlace(b); a })
    // bloom-positive keys (true dups + ~fpp of the batch) — the only slice
    // that needs corpus confirmation. This narrow projection is the ONLY
    // branch that evaluates the bloom probe; the final pass below is a
    // plain anti-join on the key.
    val positiveKeys = newBatch
      .select(col(keyCol).as("__k"))
      .filter(graft.plans.NativeExpressions.bloomMightContain(xxhash64(col("__k")), bloom))
      .distinct()
    // map-only corpus scan: which positive keys actually exist?
    val hits = corpusKeys.join(broadcast(positiveKeys), "__k").distinct()
    // survivors = batch \ hits. Correct for every slice: bloom-negatives are
    // proven absent (never in hits), true dups are in hits, bloom false
    // positives are not. One pass over the batch, no per-row probe here.
    newBatch.join(broadcast(hits), col(keyCol) === col("__k"), "left_anti")
  }

  /** Substring-level dedup ("Deduplicating Training Data Makes Language
    * Models Better"-style span removal, the token-granular step AFTER
    * doc-level dedup): drop every token covered by a word n-gram that
    * occurs at least `minGlobalCount` times corpus-wide — every occurrence
    * counts, including repeats inside one doc. Returns
    * (id, n_tokens, n_masked, text_deduped) for EVERY input doc (clean
    * docs pass through with n_masked = 0).
    *
    * Shape at 100 TB: positional n-grams explode map-side (native
    * [[graft.plans.NativeExpressions.wordNgramsAll]] — one pass, no
    * per-window string re-tokenize); the duplicated-gram table is
    * corpus-sized, so the membership join hash-shuffles BOTH sides on the
    * gram key (d73's inverted-index regime — never broadcast); covered
    * spans come back as one collect_set per doc; the rebuild is per-row.
    * Docs with fewer than n tokens emit their whole text as one gram at
    * position 0 (matching the shingle convention), so a short doc
    * duplicated anywhere is masked in full.
    */
  def maskDuplicatedSpans(
      df: DataFrame, idCol: String, textCol: String,
      n: Int = 8, minGlobalCount: Long = 2): DataFrame = {
    // fanOut: tokenize + the positional n-gram explode feed two consumers
    // (gram census and the rebuild join), each otherwise replaying a
    // 1-task scan stage on a single-row-group bench file (guide §2.5);
    // no-op on a many-split corpus
    val withToks = ScaleOps.fanOut(
        df.select(col(idCol), col(textCol)))
      .select(col(idCol),
        coalesce(TextFunctions.tokens(lower(col(textCol))),
          typedlit(Seq.empty[String])).as("__toks"))
    val grams = withToks
      .select(col(idCol),
        posexplode(graft.plans.NativeExpressions.wordNgramsAll(col("__toks"), n)))
      .withColumnRenamed("pos", "__pos")
      .withColumnRenamed("col", "__gram")
    val dupGrams = grams.groupBy(col("__gram"))
      .agg(count(lit(1)).as("__ng"))
      .filter(col("__ng") >= minGlobalCount)
      .select(col("__gram"))
    val starts = grams.join(dupGrams, Seq("__gram"))
      .groupBy(col(idCol)).agg(collect_set(col("__pos")).as("__starts"))
    withToks.join(starts, Seq(idCol), "left")
      // native two-pointer sweep (a start s covers tokens [s, s + n - 1]);
      // clean docs arrive with NULL starts from the left join → empty
      .withColumn("__kept", graft.plans.NativeExpressions.maskSpans(
        col("__toks"),
        coalesce(col("__starts"), typedlit(Seq.empty[Long])).cast("array<long>"),
        n))
      .select(col(idCol),
        size(col("__toks")).cast("long").as("n_tokens"),
        (size(col("__toks")) - size(col("__kept"))).cast("long").as("n_masked"),
        concat_ws(" ", col("__kept")).as("text_deduped"))
  }

  /** Winnowing fingerprints (the MOSS selection rule, Schleimer et al.):
    * every k-token gram hashes (engine-portable md5), and each w-window
    * of consecutive gram hashes keeps its MINIMUM — the distinct kept
    * hashes are the document's fingerprints. Guarantee: two documents
    * sharing any run of ≥ w + k − 1 identical tokens share ≥ 1
    * fingerprint, at ~1/w the index size of the every-gram posting list
    * (d73). Fingerprint SET semantics make equal-hash-in-window ties
    * irrelevant — either position keeps the same hash VALUE.
    *
    * Deliberate deviation from strict MOSS: the rowsBetween(current,
    * w-1) window includes the PARTIAL tail windows (the last w − 1 gram
    * positions), so the final gram's hash is always selected — a
    * SUPERSET of the full-windows-only selection rule, inflating
    * postings slightly versus the ~1/w subsampling bound but never
    * weakening the ≥ w + k − 1 run guarantee (supersets only add
    * matches). The d224 oracle mirrors the same tail-inclusive window,
    * so engine and oracle cannot drift on it.
    *
    * Output: (idCol, fp). Map-side per doc (one partitioned window);
    * no shuffle beyond the id partition.
    */
  def winnowFingerprints(docs: DataFrame, idCol: String, textCol: String,
      k: Int = 5, w: Int = 4): DataFrame = {
    // fanOut: gram construction + md5 hashing are the heavy map work and
    // otherwise run in the 1-task scan stage of a single-row-group bench
    // file (guide §2.5); no-op on a many-split corpus
    val toks = ScaleOps.fanOut(
        docs.filter(col(textCol).isNotNull)
          .select(col(idCol), col(textCol)))
      .select(col(idCol),
        TextFunctions.tokens(lower(col(textCol))).as("__t"))
      .filter(size(col("__t")) >= k)
    val grams = toks
      .select(col(idCol), posexplode(expr(
        s"transform(sequence(1, size(__t) - ${k - 1}), i -> " +
          s"array_join(slice(__t, i, $k), ' '))")).as(Seq("__pos", "__g")))
      .select(col(idCol), col("__pos"),
        expr("CAST(conv(substring(md5(__g), 1, 15), 16, 10) AS BIGINT)")
          .as("__h"))
    val win = Window.partitionBy(col(idCol)).orderBy(col("__pos"))
      .rowsBetween(Window.currentRow, w - 1)
    grams.withColumn("fp", min(col("__h")).over(win))
      .select(col(idCol), col("fp")).distinct()
  }

  /** Winnowing near-dup pairs: fingerprint, cap hub fingerprints to
    * `maxPosting` docs (the d73 inverted-index regime — a boilerplate
    * fingerprint shared by thousands of docs would explode the join
    * quadratically), self-join on fingerprint, keep pairs sharing
    * ≥ `minShared`. Output: (da, db, n_shared), da < db.
    */
  def winnowingPairs(docs: DataFrame, idCol: String, textCol: String,
      k: Int = 5, w: Int = 4, minShared: Int = 3,
      maxPosting: Int = 50): DataFrame = {
    val fps = winnowFingerprints(docs, idCol, textCol, k, w)
      .localCheckpoint() // feeds the posting census AND both join sides
    val postings = fps.groupBy(col("fp")).agg(count(lit(1)).as("__nd"))
      .filter(col("__nd") >= 2 && col("__nd") <= maxPosting)
    val keep = fps.join(postings.select(col("fp")), "fp")
    keep.select(col("fp"), col(idCol).as("da"))
      .join(keep.select(col("fp"), col(idCol).as("db")), "fp")
      .filter(col("da") < col("db"))
      .groupBy(col("da"), col("db"))
      .agg(count(lit(1)).as("n_shared"))
      .filter(col("n_shared") >= minShared)
  }
}
