package graft.operators

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import scala.collection.mutable

/** Temporal joins Spark has no native operator for (builder-prompt examples:
  * as-of join, range join). Both are built as scalable composites — no
  * cross-product, no driver loops (SURVEY.md §7.5 preference (a): compose
  * existing ops when semantics allow).
  */
object TemporalJoins {

  /** As-of join: for each left row, the single most recent right row with
    * `right.ts <= left.ts` for the same key (DuckDB `ASOF JOIN` semantics,
    * left outer flavor).
    *
    * Plan shape: union both sides tagged, one hash shuffle on the key, sort
    * within groups by (ts, side), then a single forward scan per key carrying
    * the latest right row — O(n log n) per key, no range explosion. This is
    * the 100 TB formulation: the only shuffle is the key shuffle both inputs
    * need anyway.
    *
    * @param left       probe side; all its rows survive (left outer)
    * @param right      quote side; its latest-at-ts row attaches
    * @param keyCol     equality key on both sides
    * @param leftTsCol  BIGINT event time on left
    * @param rightTsCol BIGINT event time on right
    * @param rightCols  right columns to attach (null when no match)
    */
  def asOfJoin(
      spark: SparkSession,
      left: DataFrame, right: DataFrame,
      keyCol: String, leftTsCol: String, rightTsCol: String,
      rightCols: Seq[String]): DataFrame = {
    val rightStruct = StructType(rightCols.map(c => right.schema(c).copy(nullable = true)))
    val leftStruct = StructType(left.schema.fields.map(_.copy(nullable = true)))
    // payloads travel as native nullable structs (Tungsten format — no
    // string round-trip); each side nulls the other's struct
    val leftTagged = left.select(
      col(keyCol), col(leftTsCol).cast("long").as("__ts"), lit(0).as("__side"),
      struct(left.columns.map(col): _*).cast(leftStruct).as("__l"),
      lit(null).cast(rightStruct).as("__r"))
    val rightTagged = right.select(
      col(keyCol), col(rightTsCol).cast("long").as("__ts"), lit(-1).as("__side"),
      lit(null).cast(leftStruct).as("__l"),
      struct(rightCols.map(col): _*).cast(rightStruct).as("__r"))
    // side -1 sorts right rows before left rows at equal ts (a quote at t
    // applies to a trade at t); the tiebreak for duplicate right timestamps
    // orders by a JSON rendering of the payload — structs with non-orderable
    // fields (maps) can't go in ORDER BY directly
    val w = Window.partitionBy(col(keyCol))
      .orderBy(col("__ts"), col("__side"), to_json(col("__r")))
    // the latest right payload at-or-before each row = last non-null right
    // struct in the ordered frame up to the current row
    val matched = leftTagged.unionByName(rightTagged)
      .withColumn("__asof", last(col("__r"), ignoreNulls = true)
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .filter(col("__side") === 0)
    matched.select(left.columns.map(c => col(s"__l.$c")) ++
      rightCols.map(c => col(s"__asof.$c").as(s"asof_$c")): _*)
  }

  /** Range join: pairs (l, r) with the same key and `|l.ts - r.ts| <= width`.
    * Scalable banding: both sides bucket to floor(ts/width); each left row
    * probes its own and the two adjacent buckets, so the equality join does
    * all the pruning and the final filter is exact. Candidate volume is
    * O(rows·density) instead of O(rows²).
    */
  def rangeJoin(
      left: DataFrame, right: DataFrame,
      keyCol: String, leftTsCol: String, rightTsCol: String,
      widthMillis: Long): DataFrame = {
    val l = left.withColumn("__lts", col(leftTsCol).cast("long"))
      .withColumn("__bucket", explode(array(
        (col(leftTsCol).cast("long") / widthMillis).cast("long") - 1,
        (col(leftTsCol).cast("long") / widthMillis).cast("long"),
        (col(leftTsCol).cast("long") / widthMillis).cast("long") + 1)))
    val r = right.withColumn("__rts", col(rightTsCol).cast("long"))
      .withColumn("__bucket", (col(rightTsCol).cast("long") / widthMillis).cast("long"))
    l.join(r, Seq(keyCol, "__bucket"))
      .filter(abs(col("__lts") - col("__rts")) <= widthMillis)
      .drop("__bucket", "__lts", "__rts")
  }
}
