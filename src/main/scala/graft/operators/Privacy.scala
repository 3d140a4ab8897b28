package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Privacy gates for dataset export — the compliance step a training-data
  * pipeline runs before any corpus leaves the boundary. The reference has no
  * privacy surface (its ParDo layer would express this as a hand-written
  * GroupByKey census + rejoin); here each gate is a declarative census the
  * optimizer plans as ordinary hash shuffles.
  *
  * Scale notes: [[kAnonymize]] does one window census per generalization
  * level over the *still-unresolved remainder only* — level l + 1 never
  * re-shuffles rows already anonymous at level l, so total shuffle volume is
  * bounded by (levels × remainder), and remainders shrink monotonically.
  * All decisions are exact integer counts — deterministic under retries.
  */
object Privacy {

  /** K-anonymity by progressive generalization with terminal suppression.
    *
    * `levels` lists the quasi-identifier tuple from finest to coarsest; all
    * levels must bind the SAME output column names (a level generalizes an
    * attribute by mapping it to a coarser expression, conventionally
    * `lit("*")` for full attribute suppression). Each row is emitted at the
    * finest level at which its equivalence class — computed among rows not
    * already resolved at a finer level — reaches size >= k. Rows anonymous
    * at no level are emitted with every quasi column `"*"` and
    * `level = levels.length`: the row count is preserved (suppressed rows
    * still ship, carrying no quasi information).
    *
    * Output: idCols ++ quasi columns (STRING) ++ `level` (INT).
    */
  def kAnonymize(df: DataFrame, idCols: Seq[String],
                 levels: Seq[Seq[(String, Column)]], k: Int): DataFrame = {
    require(levels.nonEmpty, "at least one generalization level")
    require(k >= 1, s"k must be positive: $k")
    val qNames = levels.head.map(_._1)
    require(levels.forall(_.map(_._1) == qNames),
      s"every level must bind the same quasi columns in order: $qNames")
    val qTags = qNames.map(n => s"__q_$n")
    require(!df.columns.exists(c => qTags.contains(c) || c == "__n"),
      s"input columns collide with kAnonymize scratch names " +
        s"(${qTags.mkString(", ")}, __n)")
    var rest = df
    var out: Option[DataFrame] = None
    for ((level, li) <- levels.zipWithIndex) {
      var withQ = rest
      for (((_, c), t) <- level.zip(qTags))
        withQ = withQ.withColumn(t, c.cast("string"))
      // pin each level's census: kept, the remainder, AND every later
      // level all read `counted` — unpinned, level j's window would
      // recompute once per downstream consumer (O(levels²) shuffles)
      val counted = withQ.withColumn("__n",
        count(lit(1)).over(Window.partitionBy(qTags.map(col): _*)))
        .localCheckpoint()
      val kept = counted.filter(col("__n") >= k)
        .select(idCols.map(col) ++ qTags.zip(qNames).map {
          case (t, n) => col(t).as(n)
        } :+ lit(li).as("level"): _*)
      out = Some(out.fold(kept)(_.unionByName(kept)))
      // the remainder keeps the ORIGINAL columns: the next level's
      // expressions re-derive their quasi view from the raw attributes
      rest = counted.filter(col("__n") < k)
        .drop(qTags :+ "__n": _*)
    }
    val suppressed = rest.select(
      idCols.map(col) ++ qNames.map(n => lit("*").as(n)) :+
        lit(levels.length).as("level"): _*)
    out.get.unionByName(suppressed)
  }

  /** L-diversity audit over an already-anonymized release: for each
    * equivalence class (the quasi tuple as released), the number of
    * distinct sensitive values. Classes with diversity < l are the
    * homogeneity-attack surface k-anonymity alone does not close.
    * One hash aggregation; exact.
    *
    * Output: quasi columns ++ (class_size, diversity, ok BOOLEAN).
    */
  def lDiversityAudit(released: DataFrame, quasiCols: Seq[String],
                      sensitiveCol: String, l: Int): DataFrame = {
    require(l >= 1, s"l must be positive: $l")
    released.groupBy(quasiCols.map(col): _*)
      .agg(count(lit(1)).as("class_size"),
        countDistinct(col(sensitiveCol)).as("diversity"))
      .withColumn("ok", col("diversity") >= l)
  }
}
