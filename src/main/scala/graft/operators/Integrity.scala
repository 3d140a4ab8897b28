package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Merkle-style anti-entropy comparison of two table snapshots — the
  * reconciliation shape for "did replica B drift from replica A" over a
  * 100 TB table, where shipping rows (or even row-level diffing, see
  * [[ScaleOps.snapshotDiff]]) is off the table and only DIGESTS may cross
  * the wire. Rows fold into order-independent per-bucket digests, buckets
  * fold into coarse groups, and the comparison narrows top-down: compare
  * ~dozens of coarse digests first, then fine digests only inside the
  * coarse groups that disagreed. Network cost is O(dirty buckets), not
  * O(rows) — the property that makes cross-datacenter verification of a
  * 1000-executor table feasible.
  *
  * Digest construction is ENGINE-PORTABLE by design (the d81/d162 md5
  * convention): each row hashes to the first 15 hex chars of
  * `md5(concat_ws(sep, key, values))` read as a 60-bit integer, and a
  * bucket's digest is the XOR-fold of its row hashes plus a row count.
  * Any md5-capable system (DuckDB, a Python auditor, another Spark) can
  * recompute the digests bit-for-bit, so the two sides of the comparison
  * never need to share a runtime.
  *
  * Caveats, stated rather than hidden:
  *  - XOR cancels PAIRS of identical rows: a bucket that gained the same
  *    row twice keeps its digest. The row COUNT catches every even-copy
  *    drift except equal-count substitutions that also collide in XOR —
  *    vanishingly unlikely for 60-bit digests under real corruption.
  *  - `concat_ws` skips NULLs, so (NULL,"x") and ("x",NULL) collide;
  *    callers with nullable value columns should pre-coalesce to a
  *    sentinel.
  */
object Integrity {

  /** Per-fine-bucket digest summary: `(coarse, fine, n, digest)`.
    *
    * Keys must be NON-NEGATIVE: bucket assignment uses Spark's `div`
    * (truncation toward zero) while a DuckDB auditor's `//` floors, and
    * the two agree only for k ≥ 0 — a signed key would land in
    * different buckets on the two sides and report phantom drift.
    *
    * Buckets are RANGES of the integer key (`fine = key div fineDiv`,
    * `coarse = fine div groupSize`) rather than hash buckets: range
    * buckets keep localized corruption (a bad scan range, a lost
    * partition file) localized to few buckets, which is what the
    * top-down narrowing exploits. One hash aggregate; the summary is
    * keyspace/fineDiv-sized, never row-count-sized.
    */
  def merkleSummary(df: DataFrame, keyCol: String, valueCols: Seq[String],
      fineDiv: Long, groupSize: Int): DataFrame = {
    require(fineDiv > 0 && groupSize > 0, "fineDiv and groupSize must be positive")
    val rowHash = expr(
      s"CAST(conv(substring(md5(concat_ws(chr(1), ${(keyCol +: valueCols)
        .map(c => s"CAST($c AS STRING)").mkString(", ")})), 1, 15), 16, 10) AS BIGINT)")
    df.select(expr(s"$keyCol div $fineDiv").as("fine"), rowHash.as("__h"))
      .groupBy(col("fine"))
      .agg(count(lit(1)).as("n"), expr("bit_xor(__h)").as("digest"))
      .select(expr(s"fine div $groupSize").as("coarse"), col("fine"),
        col("n"), col("digest"))
  }

  /** Merge two summaries into the summary of the union of their row sets:
    * counts add, digests XOR (both abelian), so summaries fold
    * INCREMENTALLY — a standing ingest can maintain its table digest as
    * data arrives instead of re-scanning 100 TB per verification cycle
    * (the streaming d222 row proves the fold lands bit-identical to the
    * one-shot summary). Buckets absent on one side pass through.
    */
  def mergeSummaries(a: DataFrame, b: DataFrame): DataFrame =
    a.unionByName(b).groupBy(col("coarse"), col("fine"))
      .agg(sum(col("n")).cast("long").as("n"),
        expr("bit_xor(digest)").as("digest"))
      .select(col("coarse"), col("fine"), col("n"), col("digest"))

  /** Two-level narrowing diff: returns the DIRTY fine buckets —
    * `(coarse, fine, n_base, n_after, digest_base, digest_after)` for
    * every fine bucket whose (count, digest) pair differs between the
    * snapshots, restricted to coarse groups that disagreed at the top
    * level. Absent buckets surface with n = 0 / digest = 0 (a bucket
    * present on one side only IS drift). Both summaries are pinned with
    * `localCheckpoint` because each feeds two consumers (its coarse
    * roll-up and the fine compare) — without the pin the row scan would
    * run twice per side, defeating the one-pass contract.
    */
  def merkleDiff(base: DataFrame, after: DataFrame, keyCol: String,
      valueCols: Seq[String], fineDiv: Long, groupSize: Int): DataFrame = {
    val sb = merkleSummary(base, keyCol, valueCols, fineDiv, groupSize)
      .localCheckpoint()
    val sa = merkleSummary(after, keyCol, valueCols, fineDiv, groupSize)
      .localCheckpoint()
    def coarseOf(s: DataFrame) = s.groupBy(col("coarse"))
      .agg(count(lit(1)).as("nb"), sum(col("n")).as("rows"),
        expr("bit_xor(digest)").as("cd"))
    val dirtyCoarse = coarseOf(sb).as("b")
      .join(coarseOf(sa).as("a"), Seq("coarse"), "full_outer")
      .filter(col("b.nb").isNull || col("a.nb").isNull ||
        col("b.nb") =!= col("a.nb") || col("b.rows") =!= col("a.rows") ||
        col("b.cd") =!= col("a.cd"))
      .select(col("coarse"))
    // fine compare only inside disagreed coarse groups — the narrowing
    // step; dirtyCoarse is tiny (bounded by keyspace/fineDiv/groupSize)
    // so it broadcasts as a semi-join filter on both summaries
    def narrowed(s: DataFrame) =
      s.join(broadcast(dirtyCoarse), Seq("coarse"), "left_semi")
    narrowed(sb).as("b")
      .join(narrowed(sa).as("a"), Seq("coarse", "fine"), "full_outer")
      .withColumn("n_base", coalesce(col("b.n"), lit(0L)))
      .withColumn("n_after", coalesce(col("a.n"), lit(0L)))
      .withColumn("digest_base", coalesce(col("b.digest"), lit(0L)))
      .withColumn("digest_after", coalesce(col("a.digest"), lit(0L)))
      .filter(col("n_base") =!= col("n_after") ||
        col("digest_base") =!= col("digest_after"))
      .select(col("coarse"), col("fine"), col("n_base"), col("n_after"),
        col("digest_base"), col("digest_after"))
  }
}
