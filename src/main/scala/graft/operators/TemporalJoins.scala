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
      struct(left.columns.toIndexedSeq.map(col): _*).cast(leftStruct).as("__l"),
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
    matched.select(left.columns.toIndexedSeq.map(c => col(s"__l.$c")) ++
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

  /** Last-touch attribution: attach to every conversion row the most
    * recent preceding touch row (same key, strictly earlier in the
    * (ts, tiebreak) total order, within `windowMillis`) — the marketing /
    * experiment-exposure attribution shape, and temporally the in-stream
    * sibling of [[asOfJoin]]: here touches and conversions already live
    * in ONE event stream, so no union is needed and the whole operator is
    * a single key-partitioned window scan (one hash shuffle, parallel
    * across keys, nothing global).
    *
    * The carried touch is a struct of (ts, tiebreak, `touchCols`…) taken
    * via `last(ignoreNulls)` over rows [unbounded, 1 PRECEDING] — the
    * strict precedence means a conversion at the same (ts, tiebreak)
    * instant as a touch does NOT attribute to it (tiebreak order decides
    * simultaneity deterministically). Touches older than the window
    * null out AFTER the scan (exact, per-row), so attributed rows carry
    * the touch payload and stale/absent-touch conversions survive with
    * NULLs — the unattributed remainder is part of the answer.
    *
    * @param df           the event stream (touches + conversions + noise)
    * @param keyCol       attribution scope (user/session)
    * @param tsCol        BIGINT event-time milliseconds
    * @param tieCol       unique tie-break within (key, ts)
    * @param isTouch      predicate marking touch rows
    * @param isConversion predicate marking conversion rows
    * @param touchCols    touch columns to attach (prefixed `touch_`)
    * @param windowMillis max touch age; <= 0 means unbounded
    */
  def lastTouchAttribution(
      df: DataFrame, keyCol: String, tsCol: String, tieCol: String,
      isTouch: org.apache.spark.sql.Column,
      isConversion: org.apache.spark.sql.Column,
      touchCols: Seq[String], windowMillis: Long): DataFrame = {
    require(touchCols.nonEmpty, "lastTouchAttribution needs touch columns")
    val payload = struct(
      (Seq(col(tsCol).cast("long").as("__tts"), col(tieCol).as("__ttie")) ++
        touchCols.map(col)): _*)
    val w = Window.partitionBy(col(keyCol))
      .orderBy(col(tsCol).cast("long").asc, col(tieCol).asc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val scanned = df
      .withColumn("__touch",
        last(when(isTouch, payload), ignoreNulls = true).over(w))
      .filter(isConversion)
    val fresh = if (windowMillis > 0)
      col("__touch").isNotNull &&
        col("__touch.__tts") >= col(tsCol).cast("long") - windowMillis
    else col("__touch").isNotNull
    val attributed = scanned.withColumn("__t", when(fresh, col("__touch")))
    attributed.select(
      (df.columns.toIndexedSeq.map(col) ++
        touchCols.map(c => col(s"__t.$c").as(s"touch_$c")) :+
        col("__t.__tts").as("touch_ts")): _*)
  }
}
