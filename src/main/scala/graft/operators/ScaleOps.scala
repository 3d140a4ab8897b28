package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale-out helpers for the patterns a 100 TB run needs beyond what AQE
  * does automatically (SURVEY.md §7.1-6; builder-prompt scale requirements).
  *
  * AQE already handles skewed *joins* (skew-join splitting) and post-shuffle
  * coalescing. What it does NOT fix:
  *  - a single hot key in a high-cardinality aggregation whose per-key state
  *    is large (e.g. collect-style aggs) → [[saltedAggregate]];
  *  - repeated co-located joins on the same key → [[writeBucketed]] (one
  *    shuffle at write time buys shuffle-free joins forever after).
  */
object ScaleOps {

  /** Fan a narrow input out to the cluster's parallelism before heavy
    * per-row compute (signature hashing, feature extraction) when the scan
    * yields fewer partitions than compute slots — a small single-file input
    * is ONE parquet row group, so Spark cannot split it and the whole
    * compute stage runs in one task. At real corpus scale the scan already
    * has thousands of splits and this is a no-op (the partition-count check
    * is planning-only, no job); project to the needed columns BEFORE calling
    * so the repartition only ever moves what the compute reads.
    */
  def fanOut(df: DataFrame): DataFrame = {
    val target = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions >= math.max(2, target / 2)) df
    else df.repartition(target)
  }

  /** Deterministic stratified sampling — the data-mixing primitive of a
    * training corpus (per-language / per-source rebalancing). Each row's
    * fate is a pure function of its id: keep iff
    * `xxhash64(id) mod 1e6 < fraction(stratum) * 1e6`. No RNG state, no
    * shuffle, one codegen'd filter; re-runs and retried tasks pick the SAME
    * rows (sampling that changes under task retry silently corrupts a
    * training mix), and upstream/downstream runs can reproduce the split
    * from the ids alone.
    *
    * `fractions` maps stratum value -> keep fraction [0, 1]; strata not
    * listed keep `defaultFraction`.
    */
  def deterministicStratifiedSample(
      df: DataFrame, stratumCol: String, idCol: String,
      fractions: Map[String, Double], defaultFraction: Double = 0.0): DataFrame = {
    require((fractions.values ++ Seq(defaultFraction)).forall(f => f >= 0 && f <= 1),
      s"fractions must be in [0, 1]: $fractions default=$defaultFraction")
    val Scale = 1000000L
    val threshold = fractions.foldLeft(lit((defaultFraction * Scale).toLong)) {
      case (acc, (stratum, f)) =>
        when(col(stratumCol) === lit(stratum), lit((f * Scale).toLong)).otherwise(acc)
    }
    df.filter(pmod(xxhash64(col(idCol)), lit(Scale)) < threshold)
  }

  /** Deterministic QUALITY-WEIGHTED sampling, portable across engines — the
    * curriculum / data-mixing primitive where each document's keep
    * probability is its own weight (quality score, length ratio, source
    * priority) rather than a per-stratum constant. Keep iff
    * `uniform(id) < weight`, with both sides engine-portable:
    *
    *  - `uniform(id)` = first 6 hex digits of `md5(cast(id as string))`,
    *    compared as a 7-char lowercase hex string (`'0' || prefix`) — md5 is
    *    bit-identical everywhere (the d81 portable-sample contract);
    *  - `weight` must be a RATIONAL `num/den` of nonneg integers (num <=
    *    den): the threshold is `(num * 16^6) div den`, INTEGER division
    *    end-to-end — `div` on BIGINT here, `//` in a DuckDB audit query —
    *    so any engine reproduces it exactly at any count. (An earlier
    *    formulation used double `floor(num*Scale / den)`, which is only
    *    exact while num*16^6 < 2^53 — i.e. strata below ~2^29 rows; the
    *    integer form has no such cliff at the 100 TB design point.)
    *
    * Shuffle-free, no RNG state: one codegen'd filter; task retries and
    * re-runs keep the SAME rows, and any md5-capable system can audit
    * exactly which rows a training mix kept.
    */
  private val Md5GateScale = 16777216L // 16^6: 6-hex-digit md5-prefix space

  /** The engine-portable uniform: '0' + the first 6 hex chars of md5(id),
    * compared as a string against [[hexBound7]]-encoded integer bounds.
    * ONE definition — [[deterministicWeightedSample]] and
    * [[deterministicSplit]] must gate the same key space identically.
    */
  private def md5Prefix(id: Column): Column =
    concat(lit("0"), substring(md5(id.cast("string")), 1, 6))

  /** 7-char zero-padded lowercase hex of an integer bound in
    * [0, [[Md5GateScale]]] — the right-hand side of the gate compare.
    */
  private def hexBound7(v: Column): Column = lpad(lower(hex(v)), 7, "0")

  def deterministicWeightedSample(
      df: DataFrame, idCol: String, weightNum: Column, weightDen: Column): DataFrame = {
    val thr = call_function("div",
      weightNum.cast("bigint") * lit(Md5GateScale), weightDen.cast("bigint"))
      .cast("bigint")
    df.filter(md5Prefix(col(idCol)) < hexBound7(greatest(thr, lit(0L))))
  }

  /** Deterministic, leakage-safe dataset splitting (train/val/test): every
    * row is assigned to EXACTLY one split by the md5 of `keyCol`, with
    * integer-exact bucket boundaries (fraction_i of the 16^6 md5-prefix
    * space, same string-compare gate as [[deterministicWeightedSample]]).
    * Pass a GROUP key (user_id, document cluster, site) and the split is
    * group-coherent — all of a key's rows land in the same split, which is
    * the leakage-prevention contract a train/test split actually needs
    * (near-duplicates of a training doc must not score the test set).
    *
    * Deterministic across engines, retries, and layouts (pure row
    * function, no RNG state); disjoint and exhaustive by construction
    * (CASE over half-open bucket ranges covering the whole space; a NULL
    * key — md5(null) gates nothing — lands deterministically in the LAST
    * split, matching a SQL CASE's ELSE branch, so no row is ever left
    * unlabeled). Map-only — zero shuffles.
    */
  def deterministicSplit(df: DataFrame, keyCol: String,
      splits: Seq[(String, Int)], outCol: String = "split"): DataFrame = {
    require(splits.size >= 2, "need at least two splits")
    require(splits.forall(_._2 > 0), s"weights must be positive: $splits")
    require(splits.map(_._1).distinct.size == splits.size,
      s"duplicate split names: $splits")
    require(!df.columns.contains(outCol),
      s"output column '$outCol' collides with the input schema")
    val den = splits.map(_._2.toLong).sum
    val h = md5Prefix(col(keyCol))
    // cumulative upper bounds, integer-exact; seeding the fold with the
    // LAST split's name makes the CASE exhaustive (last bucket's bound is
    // the full space) AND routes null keys like a SQL ELSE would
    val cums = splits.map(_._2.toLong).scanLeft(0L)(_ + _).tail
    val bounds = cums.map(c => hexBound7(lit(c * Md5GateScale / den)))
    val labeled = splits.zip(bounds).reverse
      .foldLeft(lit(splits.last._1): Column) {
        case (acc, ((name, _), bound)) =>
          when(h < bound, lit(name)).otherwise(acc)
      }
    df.withColumn(outCol, labeled)
  }

  /** BUDGETED mixture sampling: keep a deterministic pseudo-random prefix
    * of each stratum worth at most `budget` units of `costCol` (tokens,
    * chars, bytes) — the "give me N tokens per language" export, where the
    * quota is paid in cost units rather than document counts
    * ([[temperatureMixtureSample]]'s regime).
    *
    * Selection order inside a stratum is (md5(id), id) — the engine's
    * portable shuffle order: bit-identical in any md5-capable system, no
    * RNG state, stable under retries. A document is kept iff the
    * cumulative cost of everything ordered before it is still under
    * budget (contiguous-prefix contract, same as [[packSequences]]: the
    * last kept document may overshoot; none is split).
    *
    * ONE shuffle: a per-stratum window — strata process in parallel, and a
    * stratum must fit one reducer's spillable sort (at 100 TB budget per
    * (source, date), not per corpus, exactly like packSequences streams).
    *
    * Output: input columns + `cum_start` (BIGINT, the exclusive running
    * cost before this row) for kept rows only.
    */
  def budgetedMixtureSample(df: DataFrame, stratumCol: String, idCol: String,
                            costCol: String, budget: Long): DataFrame = {
    require(budget > 0, s"budget must be positive: $budget")
    require(!df.columns.contains("cum_start"),
      "output column 'cum_start' collides with the input schema")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(stratumCol))
      .orderBy(md5(col(idCol).cast("string")), col(idCol))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    df.withColumn("cum_start",
        coalesce(sum(col(costCol)).over(w), lit(0L)).cast("long"))
      .filter(col("cum_start") < budget)
  }

  /** Temperature-weighted mixture downsampling — the standard LLM
    * data-mixture primitive (multilingual/multi-source sampling with
    * p_s ∝ n_s^alpha, alpha < 1 flattening the head so low-resource strata
    * keep more of the budget; alpha = 1 is proportional, alpha = 0
    * uniform-per-stratum). Per stratum s the target is
    * `round(totalTarget · n_s^alpha / Σ_t n_t^alpha)` capped at n_s, and
    * the kept SET is the deterministic md5-gated
    * [[deterministicWeightedSample]] at the exact rational target_s/n_s —
    * bit-reproducible across retries, engines, and cluster layouts.
    *
    * Cross-engine note: the targets go through doubles (pow/sqrt are
    * IEEE-correctly-rounded; the stratum-count SUM is order-sensitive in
    * the last ulp), so a target sitting EXACTLY on a rounding boundary
    * could differ by 1 between engines. Strata counts are corpus facts —
    * at 1e-13 relative noise that requires a boundary hit to ~12
    * significant digits; callers wanting hard determinism across engines
    * pick totalTarget so no x_s lands on .5 (probed for the battery row).
    *
    * Scale shape: stratum counts (one small shuffle) → targets broadcast →
    * ONE map-side gate over the corpus. Nothing corpus-sized shuffles.
    */
  def temperatureMixtureSample(df: DataFrame, stratumCol: String,
      idCol: String, totalTarget: Long, alpha: Double): DataFrame = {
    require(totalTarget > 0, s"totalTarget must be positive: $totalTarget")
    require(alpha >= 0 && alpha <= 1, s"alpha must be in [0,1]: $alpha")
    val counts = df.groupBy(col(stratumCol)).agg(count(lit(1)).as("__n"))
    val denom = counts.agg(
      sum(pow(col("__n").cast("double"), alpha)).as("__denom"))
    val targets = counts.crossJoin(broadcast(denom))
      .select(col(stratumCol).as("__s"),
        col("__n"),
        least(col("__n"),
          round(lit(totalTarget.toDouble) *
            pow(col("__n").cast("double"), alpha) / col("__denom"))
            .cast("long")).as("__t"))
    // null-SAFE stratum match: groupBy keeps a null stratum as a real
    // group, so an equi-join here would silently drop its rows while its
    // weight still shrank everyone else's target — the null stratum is a
    // stratum like any other
    deterministicWeightedSample(
      df.join(broadcast(targets), df(stratumCol) <=> col("__s")),
      idCol, col("__t"), col("__n"))
      .drop("__s", "__n", "__t")
  }

  /** Two-phase salted aggregation for skew-heavy keys: phase 1 aggregates on
    * (key, salt) spreading a hot key over `saltBuckets` reducers; phase 2
    * merges the per-salt partials. Correct for any algebraic aggregate
    * (partial/merge expression pairs supplied by the caller).
    *
    * Example — skew-safe count+sum per key:
    * {{{
    * saltedAggregate(df, Seq("k"), 32,
    *   partials = Seq(count(lit(1)).as("n"), sum($"v").as("s")),
    *   merges   = Seq(sum($"n").as("n"), sum($"s").as("s")))
    * }}}
    */
  def saltedAggregate(
      df: DataFrame, keyCols: Seq[String], saltBuckets: Int,
      partials: Seq[Column], merges: Seq[Column]): DataFrame = {
    val salted = df.withColumn("__salt",
      pmod(spark_partition_id() + monotonically_increasing_id(), lit(saltBuckets.toLong)))
    val phase1 = salted
      .groupBy((keyCols.map(col) :+ col("__salt")): _*)
      .agg(partials.head, partials.tail: _*)
    phase1
      .groupBy(keyCols.map(col): _*)
      .agg(merges.head, merges.tail: _*)
  }

  /** Bucketed write: pre-shuffles `df` into `numBuckets` buckets on
    * `bucketCols` so later joins/aggregations on those columns are
    * shuffle-free (Spark reads bucket metadata and plans SortMergeJoin
    * without Exchange). The 100 TB pattern: bucket the big fact tables once
    * at ingest.
    */
  def writeBucketed(
      df: DataFrame, table: String, path: String,
      bucketCols: Seq[String], numBuckets: Int): Unit =
    df.write.mode("overwrite")
      .option("path", path)
      .bucketBy(numBuckets, bucketCols.head, bucketCols.tail: _*)
      .sortBy(bucketCols.head, bucketCols.tail: _*)
      .saveAsTable(table)

  /** Size-controlled sorted export — the physical file layout a 100 TB
    * training-data handoff needs: hive-partitioned by `partitionCols` (for
    * partition pruning downstream), rows sorted by `sortCols` INSIDE every
    * file (merge-friendly sequential reads), and `maxRecordsPerFile`
    * capping file size so a downstream loader never gets one 500 GB file
    * per partition. One repartition by the partition keys co-locates each
    * output partition's rows; the sort is partition-local (no global sort).
    */
  def writeShards(
      df: DataFrame, path: String, partitionCols: Seq[String],
      sortCols: Seq[String], maxRecordsPerFile: Long): Unit = {
    require(partitionCols.nonEmpty, "need at least one partition column")
    require(maxRecordsPerFile > 0, s"maxRecordsPerFile must be positive: $maxRecordsPerFile")
    df.repartition(partitionCols.map(col): _*)
      .sortWithinPartitions((partitionCols ++ sortCols).map(col): _*)
      .write.mode("overwrite")
      .option("maxRecordsPerFile", maxRecordsPerFile)
      .partitionBy(partitionCols: _*)
      .parquet(path)
  }

  /** CDC merge (upsert/delete): applies a changes frame to a base snapshot
    * and returns the next snapshot — the lakehouse MERGE primitive for
    * incremental 100 TB table maintenance (re-reading and rewriting only
    * what changed, instead of recomputing the world). `opCol` values:
    * 'I' insert, 'U' update (full-row replace), 'D' delete; change rows
    * carry the base schema plus `opCol`.
    *
    * Determinism contract: at most one change per key — or pass `seqCol`
    * (a change-log sequence UNIQUE per key, e.g. the CDC offset) and the
    * highest-sequence change wins, which makes replaying an out-of-order
    * or duplicated change log idempotent.
    *
    * Scale: the base is touched by ONE left-anti hash join on the key
    * (broadcast when the change set is small — the common case — so the
    * 100 TB base never shuffles); survivors union with the accepted
    * changes. The seqCol reduction windows over the CHANGES only, never
    * the base. Append-only ingest with dedup is the cheaper cousin — see
    * [[graft.operators.Dedup.incrementalDedup]]; this operator is for
    * updates and deletes.
    */
  def applyChanges(base: DataFrame, changes: DataFrame, keyCols: Seq[String],
      opCol: String, seqCol: Option[String] = None): DataFrame = {
    require(keyCols.nonEmpty, "need at least one key column")
    val latest = seqCol match {
      case Some(sc) =>
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(keyCols.map(col): _*).orderBy(col(sc).desc)
        changes.withColumn("__rn", row_number().over(w))
          .filter(col("__rn") === 1).drop("__rn", sc)
      case None => changes
    }
    val keep = base.join(latest.select(keyCols.map(col): _*), keyCols, "left_anti")
    keep.unionByName(latest.filter(col(opCol).isin("I", "U")).drop(opCol))
  }

  /** Snapshot diff — the inverse of [[applyChanges]]: compare two keyed
    * snapshots of a table and emit the minimal CDC change log ('I' rows only
    * in `after`, 'D' rows only in `before`, 'U' rows present in both whose
    * non-key columns differ) that replays `before` into `after`:
    * `applyChanges(before, snapshotDiff(before, after, k), k, opCol)` ≡
    * `after` — the round-trip law ScaleOpsSpec pins. The lakehouse use: a
    * producer republishes a full snapshot nightly; downstream consumers of a
    * 100 TB copy want the (small) delta, not the snapshot.
    *
    * Contract: `keyCols` is a primary key of both frames (unique, non-null —
    * null keys never match a full-outer join and would surface as a D+I
    * pair); both frames share a schema with at least one non-key column
    * ('U' detection is a null-safe struct compare over the non-key columns,
    * so pure key-set diffs belong to except/intersect instead). 'I'/'U'
    * rows carry `after`'s values, 'D' rows carry `before`'s.
    *
    * Scale: ONE full-outer hash join on the key — each side shuffles once,
    * unavoidable for a content diff without persisted checksums. On a
    * hive-partitioned 100 TB table, diff per partition directory so
    * untouched partitions are pruned before the join; bucket both snapshots
    * on the key ([[writeBucketed]]) and the join plans with no Exchange at
    * all.
    */
  def snapshotDiff(before: DataFrame, after: DataFrame, keyCols: Seq[String],
      opCol: String = "op"): DataFrame = {
    require(keyCols.nonEmpty, "need at least one key column")
    require(before.columns.sorted.sameElements(after.columns.sorted),
      s"snapshots must share a schema: ${before.columns.toSeq} vs ${after.columns.toSeq}")
    require(!before.columns.contains(opCol),
      s"op column '$opCol' collides with the snapshot schema")
    val nonKey = before.columns.filterNot(keyCols.contains).toSeq
    require(nonKey.nonEmpty,
      "snapshots are all-key: use except/intersect for pure key-set diffs")
    val b = before.select(keyCols.map(col) :+ struct(nonKey.map(col): _*).as("__before"): _*)
    val a = after.select(keyCols.map(col) :+ struct(nonKey.map(col): _*).as("__after"): _*)
    b.join(a, keyCols, "full_outer")
      .withColumn(opCol,
        when(col("__before").isNull, lit("I"))
          .when(col("__after").isNull, lit("D"))
          .when(!(col("__before") <=> col("__after")), lit("U")))
      .filter(col(opCol).isNotNull)
      .withColumn("__row", coalesce(col("__after"), col("__before")))
      .select(keyCols.map(col) ++
        nonKey.map(c => col("__row").getField(c).as(c)) :+ col(opCol): _*)
  }

  /** Small-file compaction — the table-maintenance pass that keeps a 100 TB
    * table scannable after streaming / incremental ingest has littered it
    * with thousands of KB-sized files (each file costs a listing entry, a
    * footer read, and a task): rewrite `inPath` into `outPath` as
    * ~`targetBytes`-sized files, WITHOUT a shuffle — `coalesce` merges scan
    * partitions narrowly, so each output task streams several input files
    * into one output file and no row ever crosses the wire twice. Returns
    * the planned output file count.
    *
    * The input byte size is read from the file listing (driver-side, one
    * RPC per directory page — fine at any file count), not by scanning the
    * data. For a hive-partitioned table, compact per partition directory so
    * the partition column layout is preserved and untouched partitions are
    * left alone. Row order inside output files follows input file order
    * (coalesce concatenates); a layout that needs sorting is
    * [[writeZOrdered]]/[[writeShards]]'s job, not compaction's.
    */
  def compactFiles(spark: SparkSession, inPath: String, outPath: String,
      targetBytes: Long = 128L << 20): Int = {
    require(targetBytes > 0, s"targetBytes must be positive: $targetBytes")
    val p = new org.apache.hadoop.fs.Path(inPath)
    val hconf = spark.sparkContext.hadoopConfiguration
    val fs = p.getFileSystem(hconf)
    // fully qualify BOTH paths (scheme, authority, working dir) before the
    // in-place check: comparing raw strings or bare uri paths lets a
    // relative-vs-absolute spelling of the same directory through — and
    // overwrite mode would then delete the input before the lazy read
    // scans it — while falsely refusing equal paths on DIFFERENT
    // filesystems (a legitimate cross-FS compaction). Containment is as
    // fatal as equality: an outPath ABOVE inPath makes the overwrite
    // delete the input tree; an outPath INSIDE inPath writes output into
    // the source directory.
    val inQ = fs.makeQualified(p)
    val outQ = new org.apache.hadoop.fs.Path(outPath)
      .getFileSystem(hconf).makeQualified(new org.apache.hadoop.fs.Path(outPath))
    def containsPath(anc: org.apache.hadoop.fs.Path,
        desc: org.apache.hadoop.fs.Path): Boolean =
      Iterator.iterate(desc)(_.getParent).takeWhile(_ != null).contains(anc)
    require(!containsPath(outQ, inQ) && !containsPath(inQ, outQ),
      s"compaction is not in-place: $outQ must be disjoint from $inQ")
    val bytes = fs.getContentSummary(p).getLength
    val nFiles = math.max(1L, (bytes + targetBytes - 1) / targetBytes).toInt
    // The scan's own file packing (maxPartitionBytes/openCostInBytes) can
    // merge the small files into FEWER partitions than the target asks for,
    // and coalesce can only shrink — so pin the split confs to the target
    // for the duration of the rewrite (and restore after). Maintenance jobs
    // run on their own session, so the temporary conf is not a conflict in
    // practice; the narrow-coalesce no-shuffle property is untouched.
    val conf = spark.conf
    val saved = Seq("spark.sql.files.maxPartitionBytes", "spark.sql.files.openCostInBytes")
      .map(k => k -> conf.getOption(k))
    conf.set("spark.sql.files.maxPartitionBytes", targetBytes.toString)
    conf.set("spark.sql.files.openCostInBytes",
      math.max(1L, math.min(4L << 20, targetBytes / 16)).toString)
    try {
      spark.read.parquet(inPath)
        .coalesce(nFiles)
        .write.mode("overwrite").parquet(outPath)
    } finally saved.foreach {
      case (k, Some(v)) => conf.set(k, v)
      case (k, None) => conf.unset(k)
    }
    nFiles
  }

  /** Incremental aggregate maintenance — update a keyed sum/count aggregate
    * from a retract-style change log WITHOUT rescanning the base table: the
    * materialized-view primitive that turns "re-aggregate 100 TB nightly"
    * into "fold yesterday's (small) change set into yesterday's (small)
    * aggregate". The change log is a retract stream (the Flink/differential-
    * dataflow model): each row carries the base schema plus `weightCol` =
    * +1 (row added) or -1 (row removed); an update is a -1 old / +1 new
    * pair ([[snapshotDiff]] output converts trivially: D → -1, I → +1,
    * U → both).
    *
    * `prevAgg` must carry `keyCols`, `cntCol`, and one column per entry of
    * `measureCols` holding the maintained SUM of that measure; the result
    * has the same shape, with keys whose count reaches zero dropped (so a
    * fully-deleted key leaves no residue). Counts are exact; sums are exact
    * when the measure type is exact (DECIMAL / integer — use DECIMAL for
    * money, ScaleOpsSpec and d142 pin incremental ≡ full recompute at
    * DECIMAL(18,2)); IEEE double sums accumulate the usual reassociation
    * drift and need periodic recompute, which is true of any incremental
    * view over floats.
    *
    * NULL measures: a key whose maintained sum and delta are BOTH null
    * (no non-null value ever seen) stays null, matching SQL SUM; but a
    * retraction that removes a key's LAST non-null value leaves 0, where a
    * full recompute over the surviving all-null rows would give NULL —
    * distinguishing those needs a per-measure non-null count the schema
    * contract deliberately omits. Exact recompute equivalence therefore
    * assumes non-null measures (enforce upstream, or coalesce at ingest).
    *
    * Scale: one groupBy over the CHANGES (small) and one outer join against
    * the aggregate table (keys × measures — orders of magnitude smaller
    * than the base); the base table is never touched. Bucket the aggregate
    * table on the key and the join is shuffle-free on the big side.
    */
  def incrementalAgg(prevAgg: DataFrame, changes: DataFrame, keyCols: Seq[String],
      weightCol: String, measureCols: Seq[String], cntCol: String = "cnt"): DataFrame = {
    require(keyCols.nonEmpty, "need at least one key column")
    require(measureCols.forall(prevAgg.columns.contains) &&
        prevAgg.columns.contains(cntCol),
      s"prevAgg must carry $cntCol and the maintained sums $measureCols: " +
        prevAgg.columns.toSeq)
    val deltaAggs = sum(col(weightCol)).cast("long").as(cntCol) +:
      measureCols.map(m => sum(col(m) * col(weightCol)).as(m))
    val delta = changes.groupBy(keyCols.map(col): _*)
      .agg(deltaAggs.head, deltaAggs.tail: _*)
    val prev = prevAgg.select(
      keyCols.map(col) ++ (cntCol +: measureCols).map(c => col(c).as("__p_" + c)): _*)
    prev.join(delta.select(
        keyCols.map(col) ++ (cntCol +: measureCols).map(c => col(c).as("__d_" + c)): _*),
        keyCols, "full_outer")
      .withColumn(cntCol,
        coalesce(col("__p_" + cntCol), lit(0L)) + coalesce(col("__d_" + cntCol), lit(0L)))
      .filter(col(cntCol) > 0)
      .select(keyCols.map(col) ++ (col(cntCol) +:
        measureCols.map { m =>
          val p = col("__p_" + m); val dlt = col("__d_" + m)
          when(p.isNull && dlt.isNull, lit(null))
            .otherwise(coalesce(p, lit(0)) + coalesce(dlt, lit(0))).as(m)
        }): _*)
  }

  /** Z-order clustered write: computes a Morton key over `dims`
    * ([[graft.plans.NativeExpressions.zorderKey]]), range-partitions into
    * `numFiles` key ranges and sorts each file by the key, then DROPS the
    * key — the layout, not an extra column, is the product. Every output
    * file's parquet footer then carries tight min/max stats on EVERY
    * dimension simultaneously (a z-contiguous run is a small box in dim
    * space), so a downstream scan with range predicates on any subset of
    * the dims skips whole row groups via plain predicate pushdown — the
    * multi-dimensional analog of [[writePartitionedByDay]], for the 100 TB
    * case where queries slice on several columns and hive-partitioning by
    * all of them would explode the directory count. Measured (not assumed)
    * in ZOrderLayoutSpec: the same box predicate scans ~10x fewer rows than
    * on a round-robin layout of identical data.
    *
    * Scale: one range exchange (sampled bounds, no global sort) + a
    * partition-local sort — the same cost as any sorted export. `dims`
    * values must fit `bitsPerDim` bits (21 default ≈ 2M distinct; larger
    * values are masked, which only weakens clustering, never correctness).
    */
  def writeZOrdered(df: DataFrame, dims: Seq[String], path: String,
      numFiles: Int, bitsPerDim: Int = 21): Unit = {
    require(dims.size >= 2, s"z-ordering needs >= 2 dims, got $dims")
    require(!df.columns.contains("__z"), "input must not carry a __z column")
    df.withColumn("__z",
        graft.plans.NativeExpressions.zorderKey(dims.map(c => col(c).cast("long")), bitsPerDim))
      .repartitionByRange(numFiles, col("__z"))
      .sortWithinPartitions(col("__z"))
      .drop("__z")
      .write.mode("overwrite").parquet(path)
  }

  /** Point-lookup-ready export: parquet bloom filters on `bloomCols`, so an
    * equality probe on a high-cardinality UNSORTED column (doc id, user id,
    * content hash) skips row groups that min/max stats cannot exclude —
    * footer stats prune ranges; blooms prune point lookups. The 100 TB use:
    * "fetch these 10k doc_ids from a 100 TB corpus" touches only the row
    * groups whose bloom admits the key, without re-sorting the corpus by
    * that key. `expectedDistinct` sizes the filter per row group (parquet
    * sizes bits for ~1% false positives at that NDV).
    *
    * Dictionary encoding is disabled on the bloom columns: parquet-mr
    * silently OMITS the bloom when a chunk ends up fully
    * dictionary-encoded (the dictionary itself then serves as the exact
    * filter), which is precisely what happens at test scale and never at
    * 100 TB (a row group's worth of distinct ids overflows the 1 MB
    * dictionary page and falls back to plain). Forcing plain makes the
    * written artifact — bloom present, skip behavior — identical at every
    * scale instead of silently depending on the chunk's NDV.
    */
  def writeWithBloomFilters(df: DataFrame, path: String,
      bloomCols: Seq[String], expectedDistinct: Long): Unit = {
    require(bloomCols.nonEmpty, "need at least one bloom column")
    require(expectedDistinct > 0, s"expectedDistinct must be positive: $expectedDistinct")
    bloomCols.foldLeft(df.write.mode("overwrite")) { (w, c) =>
        w.option(s"parquet.bloom.filter.enabled#$c", "true")
          .option(s"parquet.bloom.filter.expected.ndv#$c", expectedDistinct.toString)
          .option(s"parquet.enable.dictionary#$c", "false")
      }
      .parquet(path)
  }

  /** Forward-fill: replace each null in `fillCols` with the most recent
    * non-null value within its partition, in `orderCols` order — the
    * gap-filling step for sensor/price/state columns before a pipeline
    * treats the table as dense. `orderCols` must be a DETERMINISTIC total
    * order within each partition (add a tiebreaker column if the primary
    * order has ties); with ties the "most recent" row is whichever the
    * sort happened to place last, and re-runs may disagree.
    *
    * Scale: all fill columns share ONE window spec, so Catalyst plans a
    * single partitioned sort-and-scan (one shuffle) no matter how many
    * columns are filled. A partition must fit a reducer's spillable sort —
    * fill per (series, day) or per bucket at 100 TB, never one global
    * series.
    */
  def fillForward(df: DataFrame, partitionCols: Seq[String],
      orderCols: Seq[String], fillCols: Seq[String]): DataFrame = {
    require(partitionCols.nonEmpty, "fillForward needs partition columns")
    require(orderCols.nonEmpty, "fillForward needs an ordering")
    require(fillCols.nonEmpty, "fillForward needs columns to fill")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(partitionCols.map(col): _*)
      .orderBy(orderCols.map(col): _*)
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    fillCols.foldLeft(df)((acc, c) =>
      acc.withColumn(c, last(col(c), ignoreNulls = true).over(w)))
  }

  /** Globally ordered export: range-partition on `sortCols` then sort
    * within each partition — a TOTAL order across the output files (every
    * file's max key ≤ the next file's min key) without funneling the data
    * through one reducer the way a naive `orderBy.coalesce(1)` would. The
    * range boundaries come from Spark's reservoir sample of the input, so
    * the exchange stays balanced under skewless and mildly-skewed keys;
    * the per-file sort makes every file binary-search-friendly and gives
    * parquet tight per-row-group min/max on the sort key, so a range
    * predicate prunes to the few files covering it (the 1-D sibling of
    * [[writeZOrdered]]'s multi-dim clustering).
    */
  def writeSorted(df: DataFrame, sortCols: Seq[String], path: String,
      numFiles: Int): Unit = {
    require(sortCols.nonEmpty, "writeSorted needs at least one sort column")
    require(numFiles > 0, s"numFiles must be positive: $numFiles")
    df.repartitionByRange(numFiles, sortCols.map(col): _*)
      .sortWithinPartitions(sortCols.map(col): _*)
      .write.mode("overwrite").parquet(path)
  }

  /** Column profile: per-column row/null/distinct counts and min/max (as
    * strings, so heterogeneous column types share one long-form schema),
    * the data-quality census a pipeline runs before trusting a new 100 TB
    * drop. min/max are computed on the NATIVE type (numeric order, not
    * lexicographic) and stringified after.
    *
    * Scale: `approxDistinct = true` (HLL via `approx_count_distinct`,
    * rsd 2.5%) is the 100 TB mode — every metric rides ONE Aggregate over
    * ONE scan, and a 2.5%-off distinct count gates exactly as well. Exact
    * mode runs TWO aggregation branches cross-joined as 1×1 rows: the
    * distinct counts alone ride the multi-distinct Expand (all-long
    * buffers → codegen'd hash aggregation), while moments + min/max
    * aggregate the UNEXPANDED input. Fusing them — one agg with both — is
    * the tempting single-scan shape, but any string-typed min/max forces
    * Spark's whole rewritten aggregate (keyed over the k-fold Expand) into
    * an interpreted SortAggregate; measured at sf0.1 the fused plan costs
    * 2× the two branches combined. Exact mode therefore reads the input
    * twice, by design — at scale, use approx.
    */
  def profileColumns(df: DataFrame, cols: Seq[String],
      approxDistinct: Boolean = false): DataFrame = {
    require(cols.nonEmpty, "profileColumns needs at least one column")
    require(cols.distinct.size == cols.size,
      s"duplicate profile columns: ${cols.diff(cols.distinct).mkString(", ")}")
    // exact-name match, deliberately: the __nn_/__nd_ aliases are built
    // from the requested spelling, so a case-folded resolve here would
    // still collide two spellings of one column downstream
    val missing = cols.filterNot(df.columns.contains)
    require(missing.isEmpty, s"columns not in schema (exact match): ${missing.mkString(", ")}")
    val regularAggs = cols.flatMap { c =>
      Seq(
        count(col(c)).as(s"__nn_$c"),
        min(col(c)).cast("string").as(s"__mn_$c"),
        max(col(c)).cast("string").as(s"__mx_$c"))
    }
    val wide =
      if (approxDistinct)
        df.agg(count(lit(1)).as("__n"),
          regularAggs ++ cols.map(c =>
            approx_count_distinct(col(c), rsd = 0.025).as(s"__nd_$c")): _*)
      else
        df.agg(count(lit(1)).as("__n"), regularAggs: _*)
          .crossJoin(df.agg(countDistinct(col(cols.head)).as(s"__nd_${cols.head}"),
            cols.tail.map(c => countDistinct(col(c)).as(s"__nd_$c")): _*))
    val long = cols.map { c =>
      struct(lit(c).as("col_name"),
        col("__n").as("n_rows"),
        (col("__n") - col(s"__nn_$c")).as("n_nulls"),
        col(s"__nd_$c").as("n_distinct"),
        col(s"__mn_$c").as("min_val"),
        col(s"__mx_$c").as("max_val"))
    }
    wide.select(explode(array(long: _*)).as("p")).select("p.*")
  }

  /** Salted equi-join for skewed keys in the regimes AQE's skew handling
    * cannot reach: AQE splits oversized SORT-MERGE partitions at runtime,
    * but a hot key inside a shuffled HASH join, a stream-static join, or a
    * first-shuffle aggregation-free topology still funnels into one task.
    * The left (big, skewed) side gets a deterministic salt in [0, factor);
    * the right side is exploded `factor`-fold so every (key, salt) pair
    * can match — the hot key's rows spread over `factor` tasks at the cost
    * of shipping the right side `factor` times.
    *
    * The salt is a PURE FUNCTION of the full left row (xxhash64 over every
    * column), not `rand()`: a retried or speculatively re-run task
    * re-derives the identical salt, so the join stays exactly-once under
    * failure, and re-runs are byte-reproducible. Identical duplicate rows
    * share a salt — skew relief comes from hot KEYS whose rows differ
    * somewhere, which is what real fact-table skew looks like.
    *
    * `joinType` is limited to inner/left: an outer ROW on the exploded
    * right side would surface once per salt. Right/full-outer needs the
    * dual construction (salt the right, explode the left).
    */
  /** Join-fanout census — the pre-flight a 100 TB join deserves: the exact
    * output size of `left ⋈ right` on `keys` is Σ_k nL(k)·nR(k), computable
    * from the two per-key COUNT tables (key-cardinality-sized — tiny next
    * to the join itself) without running the join. Returns the top
    * `topK` keys by output contribution with their share of the total —
    * the hot-key list that decides whether to [[saltedJoin]] (and with
    * what factor), or to broadcast, or to walk away.
    *
    * Deterministic output: ties broken by key ascending; share is ONE
    * integer division per row (product/total in doubles, rounded).
    */
  def joinFanoutCensus(left: DataFrame, right: DataFrame,
      keys: Seq[String], topK: Int = 10): DataFrame = {
    require(keys.nonEmpty, "joinFanoutCensus needs key columns")
    require(topK > 0, s"topK must be positive: $topK")
    val lc = left.groupBy(keys.map(col): _*).agg(count(lit(1)).as("__ln"))
    val rc = right.groupBy(keys.map(col): _*).agg(count(lit(1)).as("__rn"))
    val prod = lc.join(rc, keys)
      .select(keys.map(col) :+
        (col("__ln") * col("__rn")).as("out_rows") :+
        col("__ln").as("left_rows") :+ col("__rn").as("right_rows"): _*)
      .localCheckpoint(false) // two consumers: total agg + top-K
    // total via a broadcast 1-row aggregate, NOT a window over the full
    // count table (an unpartitioned running window would funnel the key
    // census through one reducer); the top-K sort is bounded by limit
    // pushdown (TakeOrderedAndProject), never a full global sort
    val total = prod.agg(coalesce(sum(col("out_rows")), lit(0L))
      .as("total_rows"))
    prod.orderBy(col("out_rows").desc +: keys.map(col): _*).limit(topK)
      .crossJoin(broadcast(total))
      .withColumn("share", round(col("out_rows").cast("double") /
        col("total_rows"), 6))
  }

  /** Bloom-filter semi-join reduction (sideways information passing): build
    * a Bloom filter over the small side's join-key hashes, broadcast it,
    * and prune the big side BEFORE its shuffle — only rows that might match
    * ever enter the exchange. The closing `left_semi` join makes the result
    * exact: a bloom false positive (or a 64-bit key-hash collision) can
    * only let a non-matching row THROUGH to the join, where the full-key
    * comparison drops it; a true match is never filtered out.
    *
    * When to reach for this at 100 TB: the dim side is too big for a
    * broadcast-hash join (its payload + hashmap would blow the driver/
    * executor budget) but its KEY SET still fits a bloom — n keys cost
    * ~1.44·log2(1/fpp) bits each (~1.2 GB per billion keys at fpp 1e-2),
    * independent of payload width. Spark's own runtime bloom filter
    * (`spark.sql.optimizer.runtime.bloomFilter.*`) covers the planner-
    * visible cases; this operator is the explicit form for when the "small"
    * side is a computed frame the optimizer can't see through, and it
    * composes with any downstream join type the caller wants (the returned
    * frame is just the pruned-and-confirmed big side).
    *
    * `expectedItems` sizes the filter — overshooting wastes broadcast
    * bytes, undershooting degrades fpp toward 1 (never correctness).
    *
    * Key columns must have IDENTICAL types on both sides (enforced):
    * xxhash64 is type-sensitive, so hashing an INT probe against a bloom
    * built from BIGINT keys would silently prune true matches — the one
    * failure mode this operator must never have. Cast explicitly before
    * calling.
    */
  def bloomSemiJoin(big: DataFrame, small: DataFrame, keys: Seq[String],
      expectedItems: Long = 1L << 20, fpp: Double = 0.01): DataFrame = {
    require(keys.nonEmpty, "bloomSemiJoin needs at least one key column")
    require(fpp > 0 && fpp < 1, s"fpp must be in (0,1): $fpp")
    keys.foreach { k =>
      val (bt, st) = (big.schema(k).dataType, small.schema(k).dataType)
      require(bt == st,
        s"bloomSemiJoin key '$k' type mismatch: big=$bt small=$st — " +
          "xxhash64 is type-sensitive; cast one side first")
    }
    import org.apache.spark.util.sketch.BloomFilter
    // one materialization of the (possibly expensive) small side feeds
    // BOTH the bloom build and the closing join; left_semi is duplicate-
    // insensitive, so no distinct() pre-shuffle
    val smallKeys = small.select(keys.map(col): _*).localCheckpoint(false)
    val bloom = smallKeys
      .select(xxhash64(keys.map(col): _*).as("__h"))
      .select("__h").as(org.apache.spark.sql.Encoders.scalaLong).rdd
      .treeAggregate(BloomFilter.create(expectedItems, fpp))(
        (f, h) => { f.putLong(h); f },
        (a, b) => { a.mergeInPlace(b); a })
    big
      .filter(graft.plans.NativeExpressions.bloomMightContain(
        xxhash64(keys.map(col): _*), bloom))
      .join(smallKeys, keys, "left_semi")
  }

  /** Linear interpolation of null gaps: within each partition, order rows
    * by (`xCol`, tiebreak `orderCols`) and replace each null in `fillCols`
    * with the straight line between the nearest non-null neighbors:
    * `prev + (next - prev) · (x - xPrev)/(xNext - xPrev)`. Leading and
    * trailing nulls (no neighbor on one side) STAY null — interpolation
    * never extrapolates; compose with [[fillForward]] if edge fill is
    * wanted. Equal neighbor x (only possible with duplicate x values)
    * degenerates to the previous value rather than 0/0.
    *
    * Scale shape: all four neighbor lookups per column ride ONE window
    * shuffle+sort (same partition/order spec, two frames — Spark plans a
    * single WindowExec), so the cost is [[fillForward]]'s plus nothing.
    */
  def fillInterpolated(df: DataFrame, partitionCols: Seq[String],
      xCol: String, fillCols: Seq[String],
      orderCols: Seq[String] = Nil): DataFrame = {
    require(partitionCols.nonEmpty, "fillInterpolated needs partition columns")
    require(fillCols.nonEmpty, "fillInterpolated needs columns to fill")
    val W = org.apache.spark.sql.expressions.Window
    val order = (xCol +: orderCols).map(col)
    val base = W.partitionBy(partitionCols.map(col): _*).orderBy(order: _*)
    val wPrev = base.rowsBetween(W.unboundedPreceding, W.currentRow)
    val wNext = base.rowsBetween(W.currentRow, W.unboundedFollowing)
    fillCols.foldLeft(df) { (acc, c) =>
      val v = col(c)
      val pv = last(v, ignoreNulls = true).over(wPrev)
      val px = last(when(v.isNotNull, col(xCol)), ignoreNulls = true).over(wPrev)
      val nv = first(v, ignoreNulls = true).over(wNext)
      val nx = first(when(v.isNotNull, col(xCol)), ignoreNulls = true).over(wNext)
      acc.withColumn(c,
        when(v.isNotNull, v)
          .when(pv.isNull || nv.isNull, lit(null))
          .when(nx === px, pv)
          .otherwise(pv + (nv - pv) *
            ((col(xCol) - px).cast("double") / (nx - px).cast("double"))))
    }
  }

  def saltedJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
      saltFactor: Int, joinType: String = "inner"): DataFrame = {
    require(keys.nonEmpty, "saltedJoin needs at least one key column")
    require(saltFactor > 1, s"saltFactor must be > 1: $saltFactor")
    require(Seq("inner", "left", "left_outer").contains(joinType),
      s"saltedJoin supports inner/left joins only: $joinType")
    require(!left.columns.contains("__salt") && !right.columns.contains("__salt"),
      "__salt collides with an input column")
    val l = left.withColumn("__salt",
      pmod(xxhash64(left.columns.toIndexedSeq.map(col): _*), lit(saltFactor)).cast("int"))
    val r = right.withColumn("__salt",
      explode(sequence(lit(0), lit(saltFactor - 1))))
    // r10 (guide §3.1): pin the strategy to sort-merge. Salting only means
    // anything under a SHUFFLE join — it exists to spread one hot key's
    // rows over saltFactor reducers — but Catalyst sees the exploded right
    // side as broadcastable at small scale and then builds a saltFactor×
    // bigger hash relation single-threaded on the driver (measured on
    // d149: the broadcast build was ~60% of the row's wall). A broadcast
    // join has no skew problem, so a caller who can broadcast shouldn't
    // salt at all; given the caller chose salting, the shuffle join is the
    // contract. Sort-merge (not shuffled-hash) because the operator's
    // habitat is skewed 100 TB inputs: SMJ spills gracefully where a hash
    // build can OOM. Results are strategy-independent.
    l.join(r.hint("merge"), keys :+ "__salt", joinType).drop("__salt")
  }

  /** Hive-style partitioned layout write with small-file control.
    *
    * The naive `df.write.partitionBy(p)` opens one file per (task ×
    * partition-value) pair — at 1000 executors × 365 days that is 365k
    * files of a few KB each, the classic small-file explosion. This writer
    * first repartitions on (partition value, file slot), so each partition
    * directory receives AT MOST `filesPerPartition` files (exactly that
    * many when the partition carries enough rows and AQE doesn't coalesce
    * neighboring shuffle partitions — coalescing can merge slots into one
    * writer task, never split one). `filesPerPartition` sizes a day's data
    * to ~128 MiB files at the target scale (1 suffices for the test SFs).
    *
    * The payoff is read-side partition PRUNING: a filter on `partCol`
    * never opens non-matching directories (`PartitionFilters` in the scan,
    * pinned by PartitionedLayoutSpec) — the coarse complement of d136's
    * intra-file z-order skipping.
    */
  def writeHivePartitioned(df: DataFrame, path: String, partCol: String,
                           filesPerPartition: Int = 1,
                           sortWithin: Seq[String] = Nil): Unit = {
    require(filesPerPartition >= 1, s"filesPerPartition: $filesPerPartition")
    val slot = pmod(xxhash64(df.columns.toIndexedSeq.map(col): _*), lit(filesPerPartition))
    val parted = df.repartition(col(partCol), slot)
    // sortWithin restores within-file order after the slot shuffle (the
    // partition column leads so a coalesced task holding several partition
    // values still writes each file internally ordered)
    val laid =
      if (sortWithin.isEmpty) parted
      else parted.sortWithinPartitions((partCol +: sortWithin).map(col): _*)
    laid.write.mode("overwrite").partitionBy(partCol).parquet(path)
  }

  /** Range-partitioned write for time-ordered data: partition pruning on the
    * partition column + ordered files (sorted within, so timestamp
    * row-group stats stay narrow) for merge-friendly scans.
    */
  def writePartitionedByDay(
      df: DataFrame, path: String, tsCol: String): Unit = {
    val withDay =
      df.withColumn("__day", date_format(col(tsCol), "yyyy-MM-dd"))
    writeHivePartitioned(withDay, path, "__day", sortWithin = Seq(tsCol))
  }

  /** OHLC downsampling: per (key, fixed time bucket) open / high / low /
    * close / count — the standard resolution-reduction step for
    * time-series feature tables.
    *
    * ONE hash aggregation (no window, no second shuffle): open and close
    * ride lexicographic `min(struct(ts, value))` / `max(struct(ts, value))`
    * — deterministic even under duplicate timestamps, because the value
    * itself breaks the tie (equivalent to `first_value ... ORDER BY ts,
    * value`, which is the portable SQL spelling an oracle uses). High/low
    * are plain min/max; the value sum runs through the fixed-point SUM so
    * per-bucket totals are summation-order-exact.
    *
    * Input: tsMsCol BIGINT epoch-millis, valCol DOUBLE.
    * Output: key ++ (bucket_start BIGINT, open, high, low, close DOUBLE,
    * n_ticks BIGINT, sum_value DOUBLE with 2-decimal fixed-point).
    */
  def resampleOhlc(df: DataFrame, keyCols: Seq[String], tsMsCol: String,
                   valCol: String, bucketMs: Long): DataFrame = {
    require(bucketMs > 0, s"bucketMs must be positive: $bucketMs")
    df.filter(col(valCol).isNotNull)
      .groupBy(keyCols.map(col) :+
        (floor(col(tsMsCol) / bucketMs).cast("long") * bucketMs)
          .as("bucket_start"): _*)
      .agg(
        min(struct(col(tsMsCol), col(valCol))).getField(valCol).as("open"),
        max(col(valCol)).as("high"),
        min(col(valCol)).as("low"),
        max(struct(col(tsMsCol), col(valCol))).getField(valCol).as("close"),
        count(lit(1)).as("n_ticks"),
        expr(s"CAST(graft_money_sum($valCol, 2) AS DOUBLE)").as("sum_value"))
  }

  /** Sizing guidance, applied: shuffle partition count for a target
    * partition size (default 128 MiB post-compression estimate).
    */
  def shufflePartitionsFor(spark: SparkSession, inputBytes: Long,
      targetBytes: Long = 128L << 20): Int =
    math.max(spark.sparkContext.defaultParallelism,
      (inputBytes / math.max(targetBytes, 1L)).toInt)

  /** Sequence packing: assign each row a training-shard bin of ~`budget`
    * tokens, packing contiguously in `orderCol` order within each
    * `streamCol` stream. bin = token-start-offset div budget, so a document
    * lands in the bin where its first token falls (bins may overflow by at
    * most one document — the standard contiguous-packing contract; no
    * document is split).
    *
    * Deterministic: the assignment is a pure function of the stream's
    * (orderCol, tokens) sequence — re-runs, retries, and different cluster
    * layouts produce identical shards, so shard N can be re-materialized
    * from scratch for a mid-training restart.
    *
    * Scale: one shuffle, `Window.partitionBy(streamCol)` — streams pack in
    * parallel. A stream must fit one reducer's spillable sort, which is what
    * the streams ARE for: at 100 TB you pack per (source, date) or per
    * bucket, never one global stream (a global orderBy would funnel the
    * corpus through one task).
    */
  def packSequences(
      df: DataFrame, streamCol: String, orderCol: String, tokenCount: Column,
      budget: Long, tokenOutCol: String = "n_tokens"): DataFrame = {
    require(budget > 0, s"budget must be positive: $budget")
    require(tokenOutCol != "bin_id" && !df.columns.contains(tokenOutCol) &&
      !df.columns.contains("bin_id"),
      s"output columns ($tokenOutCol, bin_id) collide with the input schema — " +
        "pass a different tokenOutCol or drop/rename the existing columns")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(streamCol)).orderBy(col(orderCol))
    df.withColumn("__ntok", tokenCount)
      .withColumn("__start", sum(col("__ntok")).over(w) - col("__ntok"))
      .withColumn("bin_id", expr(s"__start div ${budget}L"))
      .drop("__start")
      .withColumnRenamed("__ntok", tokenOutCol)
  }

  /** Exclusive global running sums over a totally-ordered frame WITHOUT a
    * single-partition window — the scalable form of
    * `SUM(x) OVER (ORDER BY k ROWS UNBOUNDED PRECEDING AND 1 PRECEDING)`.
    *
    * Two-level scan: `repartitionByRange(orderCol)` (RangePartitioner ids
    * are order-aligned), a partition-local window for the intra-partition
    * prefix, and a driver-side prefix over the ≤ numPartitions per-
    * partition totals broadcast back. No stage ever sees the whole frame
    * in one task, so the shape survives any key cardinality — the thing
    * Spark's own un-partitioned window (Exchange SinglePartition) cannot.
    *
    * Rows must be UNIQUE on `orderCol` (pre-aggregate first): with
    * duplicates the intra-tie prefix order would be nondeterministic.
    * Several sums ride one scan: `sums` maps value column → output column.
    *
    * Value columns may be integral (exact LongType prefixes) or floating
    * (DoubleType prefixes — note the two-level grouping sums in a
    * different order than a sequential scan, so expect the usual
    * summation-order ulps against a single-window reference).
    */
  def globalPrefixSum(df: DataFrame, orderCol: String,
                      sums: Seq[(String, String)], ascending: Boolean = true,
                      numPartitions: Int = 0): DataFrame =
    globalPrefixSumWithTotals(df, orderCol, sums, ascending, numPartitions)._1

  /** [[globalPrefixSum]] that ALSO returns the grand total of every value
    * column (Long for integral columns, Double for floating, in `sums`
    * order). The driver-side prefix over the per-partition totals already
    * holds these — callers that need the cohort/population size (d174,
    * d181) previously paid a whole extra aggregation action over the
    * prefix-summed frame to recompute a number this scan had in hand
    * (r10, guide §1.2 job floor). NB an `observe` on `df` cannot replace
    * this: RangePartitioner's sampling pass scans the child once before
    * the shuffle pass, double-counting any CollectMetrics below it
    * (measured: exactly 2× on every kaplanMeier census).
    */
  def globalPrefixSumWithTotals(df: DataFrame, orderCol: String,
                      sums: Seq[(String, String)], ascending: Boolean = true,
                      numPartitions: Int = 0): (DataFrame, Seq[Any]) = {
    require(sums.nonEmpty, "need at least one (valueCol, outCol) pair")
    val session = df.sparkSession
    val p = if (numPartitions > 0) numPartitions
            else session.sparkContext.defaultParallelism
    val ord = if (ascending) col(orderCol).asc else col(orderCol).desc
    val ranged = df.repartitionByRange(p, ord)
      .sortWithinPartitions(ord)
      .withColumn("__pid", spark_partition_id())
      .localCheckpoint() // pin partition ids for both consumers below
    // driver-side prefix over ≤ p rows × |sums| longs — never data-sized
    // per value column: floating columns accumulate as Double, everything
    // else must be exact-integral Long
    val floating: Seq[Boolean] = sums.map { case (v, _) =>
      df.schema(v).dataType match {
        case org.apache.spark.sql.types.DoubleType |
             org.apache.spark.sql.types.FloatType => true
        case _ => false
      }
    }
    val totals = ranged.groupBy(col("__pid"))
      .agg(sums.map { case (v, _) => sum(col(v)).as(s"__t_$v") }.head,
        sums.drop(1).map { case (v, _) => sum(col(v)).as(s"__t_$v") }: _*)
      .collect()
      .map(r => (r.getInt(0), sums.zip(floating).map {
        case ((v, _), isF) =>
          r.getAs[Any](s"__t_$v") match {
            case null => if (isF) 0.0 else 0L
            case l: Long => l
            case d: Double => d
            case other => throw new IllegalArgumentException(
              s"globalPrefixSum needs integral or double value columns, " +
                s"got $other for $v")
          }
      }.toSeq))
      .sortBy(_._1)
    val zeros: Seq[Any] = floating.map(isF => if (isF) 0.0 else 0L)
    def add(a: Any, b: Any): Any = (a, b) match {
      case (x: Long, y: Long) => x + y
      case (x: Double, y: Double) => x + y
      case other => throw new IllegalStateException(s"mixed sum types: $other")
    }
    val grandTotals: Seq[Any] = totals.foldLeft(zeros) {
      case (acc, (_, tot)) => acc.lazyZip(tot).map(add).toSeq
    }
    val offsets = totals.scanLeft((Int.MinValue, zeros)) {
      case ((_, acc), (pid, tot)) =>
        (pid, acc.lazyZip(tot).map(add).toSeq)
    }.sliding(2).collect {
      case Array((_, acc), (pid, _)) => (pid, acc)
    }.toSeq
    val offsetRows = offsets.map { case (pid, accs) =>
      org.apache.spark.sql.Row.fromSeq(pid +: accs)
    }
    val offsetSchema = org.apache.spark.sql.types.StructType(
      org.apache.spark.sql.types.StructField("__pid",
        org.apache.spark.sql.types.IntegerType) +:
        sums.zip(floating).map { case ((v, _), isF) =>
          org.apache.spark.sql.types.StructField(s"__o_$v",
            if (isF) org.apache.spark.sql.types.DoubleType
            else org.apache.spark.sql.types.LongType)
        })
    val offsetDf = session.createDataFrame(
      session.sparkContext.parallelize(offsetRows, 1), offsetSchema)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("__pid")).orderBy(ord)
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    val out = sums.zip(floating).foldLeft(
      ranged.join(broadcast(offsetDf), Seq("__pid"))) {
      case (acc, ((v, out), isF)) =>
        val zero = if (isF) lit(0.0) else lit(0L)
        acc.withColumn(out,
          coalesce(sum(col(v)).over(w), zero) + col(s"__o_$v"))
    }.drop("__pid" +: sums.map { case (v, _) => s"__o_$v" }: _*)
    (out, grandTotals)
  }

  /** Exact global percent_rank of a column with NO partition key and NO
    * single-partition window: rank arithmetic runs on the distinct-value
    * count table through [[globalPrefixSum]], then joins back by value —
    * two bounded shuffles however large the input. Ties share the rank of
    * their first row (SQL PERCENT_RANK semantics); the ratio
    * below/(n−1) is a ratio of exact integers, so the raw double is
    * engine-portable. Complements d96's per-group percent_rank window
    * (which requires a partition key to parallelize).
    */
  def percentileRank(df: DataFrame, valueCol: String,
                     outCol: String = "pct_rank"): DataFrame = {
    // null values carry no rank: excluded from both the census and the
    // output (engines disagree on null ordering; don't rank what isn't
    // a value)
    val clean = df.filter(col(valueCol).isNotNull)
    // r10 (guide §1.2 job floor): the grand total rides the census
    // checkpoint's own materialization via observe instead of a second
    // aggregation pass over the just-written blocks — one action, one pass
    val (counts, m) = GraphOps.checkpointWithProbe(
      clean.groupBy(col(valueCol)).agg(count(lit(1)).as("__n")),
      sum(col("__n")).as("__total"))
    val total = Option(m("__total")).map(_.asInstanceOf[Long]).getOrElse(0L)
    val ranked = globalPrefixSum(counts, valueCol, Seq("__n" -> "__below"))
      .withColumn(outCol,
        if (total > 1) col("__below").cast("double") / lit((total - 1).toDouble)
        else lit(0.0))
      .drop("__n", "__below")
    clean.join(ranked, valueCol)
  }

  /** 2-D Pareto frontier (skyline): the distinct points p = (x, y) such
    * that no other point q has q.x ≤ p.x ∧ q.y ≥ p.y with one inequality
    * strict — "minimize x, maximize y" (flip signs at the call site for
    * other goal mixes). Duplicate points collapse first and carry their
    * multiplicity, so identical points never eliminate each other.
    *
    * Two-phase distributed sweep: each partition sorts locally by
    * (x ASC, y DESC) and keeps a point iff its y strictly exceeds the best
    * y seen — exact for the partition's own points, because any dominator
    * within the partition precedes its victim in that order. Local
    * skylines are tiny on non-adversarial data (O(log n) expected on
    * independent dims), so the union coalesces into one task for the
    * identical final sweep — no global sort, no quadratic anti-join. The
    * worst case (perfectly anti-correlated dims) degenerates to the full
    * distinct-point set; callers with such data should pre-bucket.
    */
  def skyline2D(df: DataFrame, minCol: String, maxCol: String): DataFrame = {
    val session = df.sparkSession
    import session.implicits._
    val pts = df
      .select(col(minCol).cast("double").as("x"), col(maxCol).cast("double").as("y"))
      .filter(col("x").isNotNull && col("y").isNotNull)
      .groupBy(col("x"), col("y")).agg(count(lit(1)).as("n"))
    def sweep(it: Iterator[(Double, Double, Long)]): Iterator[(Double, Double, Long)] = {
      var best = Double.NegativeInfinity
      it.flatMap { case t @ (_, y, _) =>
        if (y > best) { best = y; Iterator.single(t) } else Iterator.empty
      }
    }
    val local = pts.sortWithinPartitions(col("x").asc, col("y").desc)
      .as[(Double, Double, Long)]
      .mapPartitions(sweep)
    local.toDF("x", "y", "n")
      .coalesce(1)
      .sortWithinPartitions(col("x").asc, col("y").desc)
      .as[(Double, Double, Long)]
      .mapPartitions(sweep)
      .toDF(minCol, maxCol, "n_points")
  }

  /** SCD Type-2 change history: collapse each key's ordered value sequence
    * into runs of consecutive equal values, with effective ranges — the
    * versioned-dimension build every lakehouse needs (who had which status,
    * from when to when). Run boundaries are the gaps-and-islands idiom:
    * a LAG-change flag summed into an island id; both windows plus the
    * per-island aggregation ride ONE (key)-hash partitioning, so however
    * many versions a key has, the whole build is a single shuffle,
    * parallel across keys.
    *
    * `orderCols` must be a total order within each key (include a
    * tie-break id — an ambiguous order makes run membership
    * nondeterministic). Output per run: keyCols, valueCol, `valid_from`
    * (first orderCol value of the run), `valid_to` (the NEXT run's
    * valid_from, NULL for the current run — the half-open [from, to)
    * convention), `n_rows`. NULL values form runs of their own
    * (NULL-safe change detection), so a missing attribute version is a
    * tracked epoch, not a dropped row.
    */
  def changeHistory(df: DataFrame, keyCols: Seq[String],
      orderCols: Seq[String], valueCol: String): DataFrame = {
    require(keyCols.nonEmpty, "changeHistory needs key columns")
    require(orderCols.nonEmpty, "changeHistory needs an ordering")
    val W = org.apache.spark.sql.expressions.Window
    val key = keyCols.map(col)
    val ord = orderCols.map(col)
    val wSeq = W.partitionBy(key: _*).orderBy(ord: _*)
    val flagged = df
      .withColumn("__chg",
        when(lag(col(valueCol), 1).over(wSeq) <=> col(valueCol), lit(0L))
          .otherwise(lit(1L)))
      .withColumn("__island", sum(col("__chg"))
        .over(wSeq.rowsBetween(W.unboundedPreceding, W.currentRow)))
    val runs = flagged
      .groupBy((key :+ col("__island")): _*)
      .agg(first(col(valueCol)).as(valueCol),
        min(col(orderCols.head)).as("valid_from"),
        count(lit(1)).as("n_rows"))
    val wRun = W.partitionBy(key: _*).orderBy(col("__island"))
    runs
      .withColumn("valid_to", lead(col("valid_from"), 1).over(wRun))
      .drop("__island")
  }

  /** Exact bounded EWMA over each key's ordered series, in integer
    * arithmetic end-to-end: weights are powers of two (most recent lag
    * heaviest), so the smoothed value is a ratio of two exact integers —
    * num = Σ_{j=0..depth−1} x_{t−j}·2^(depth−1−j), den = Σ of the weights
    * actually present — and the single final division of two exact
    * integers < 2^53 is correctly rounded, hence bit-identical on any
    * IEEE engine. A float-α recursive EWMA is history-length-dependent
    * and accumulates ulps engine-differently; the bounded power-of-two
    * form is the deterministic twin (α = 1/2, truncated at `depth` lags,
    * re-normalized over available history so early rows are exact too).
    *
    * All `depth` LAGs ride ONE window spec — one hash shuffle on
    * `partitionCols`, parallel across keys, nothing global. `valueCol`
    * must be integral (scale money to cents first); products stay exact
    * while max|x|·2^depth < 2^53.
    */
  def ewmaSmoothed(df: DataFrame, partitionCols: Seq[String],
      orderCols: Seq[String], valueCol: String, depth: Int = 8,
      outCol: String = "ewma"): DataFrame = {
    require(partitionCols.nonEmpty, "ewmaSmoothed needs partition columns")
    require(orderCols.nonEmpty, "ewmaSmoothed needs an ordering")
    require(depth >= 1 && depth <= 32, s"depth out of range: $depth")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(partitionCols.map(col): _*)
      .orderBy(orderCols.map(col): _*)
    val lags = (0 until depth).map(j =>
      if (j == 0) col(valueCol) else lag(col(valueCol), j).over(w))
    val weights = (0 until depth).map(j => 1L << (depth - 1 - j))
    val num = lags.zip(weights).map { case (l, wt) =>
      coalesce(l * lit(wt), lit(0L))
    }.reduce(_ + _)
    val den = lags.zip(weights).map { case (l, wt) =>
      when(l.isNotNull, lit(wt)).otherwise(lit(0L))
    }.reduce(_ + _)
    // a NULL current value with no in-window history gives den = 0; emit
    // NULL, not an engine-dependent division artifact (Spark doubles give
    // Infinity/NaN on /0 where DuckDB gives NULL)
    df.withColumn(outCol,
      when(den > 0, num.cast("double") / den.cast("double")))
  }
}
