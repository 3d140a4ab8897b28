package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality validation (the Deequ/"expectations" surface a
  * pipeline runs before trusting a new 100 TB drop — the check-and-gate
  * step between landing and training; complements [[ScaleOps.profileColumns]]
  * which *describes* rather than *judges*).
  *
  * Every check reports into one long-form frame
  * `(check_name, column_name, n_rows, n_violations, passed)` so a gate is
  * a single `filter(!passed)` over the report.
  *
  * Scale shape, by check class:
  *  - row-local checks ([[Constraints.notNull]], [[Constraints.inRange]],
  *    [[Constraints.inSet]], [[Constraints.satisfies]]) fold into ONE
  *    aggregate over ONE scan regardless of how many there are — each is a
  *    conditional count riding the same partial-aggregation pass;
  *  - [[Constraints.unique]] needs its key's distribution: one hash
  *    shuffle per distinct key set (`n_rows` rides the same aggregate —
  *    the input is never re-scanned);
  *  - [[Constraints.foreignKey]] confirms membership against a parent key
  *    set small enough to broadcast (dims-by-contract): one broadcast
  *    left-outer + the shared conditional-count pass, no shuffle of the
  *    child.
  */
object Constraints {
  sealed trait Check { def name: String; def columnLabel: String }
  /** Column must have no nulls. */
  final case class NotNull(column: String) extends Check {
    val name = "not_null"; val columnLabel = column
  }
  /** Non-null values must fall in [lo, hi] (inclusive both ends). */
  final case class InRange(column: String, lo: Double, hi: Double)
      extends Check { val name = "in_range"; val columnLabel = column }
  /** Non-null values must be one of `allowed`. */
  final case class InSet(column: String, allowed: Seq[String]) extends Check {
    require(allowed.nonEmpty, s"in_set($column) needs a non-empty set")
    val name = "in_set"; val columnLabel = column
  }
  /** Rows must satisfy an arbitrary boolean SQL predicate (null = violation
    * — a predicate that cannot evaluate is not satisfied).
    */
  final case class Satisfies(label: String, predicateSql: String)
      extends Check { val name = "satisfies"; val columnLabel = label }
  /** `columns` must be unique across rows (a null key counts as a value —
    * two all-null keys collide, matching SQL DISTINCT semantics rather
    * than UNIQUE-index semantics, which is what dedup pipelines mean).
    */
  final case class Unique(columns: Seq[String]) extends Check {
    require(columns.nonEmpty, "unique needs key columns")
    val name = "unique"; val columnLabel = columns.mkString(",")
  }
  /** Non-null child values must exist in `parentKeys`' single column (the
    * referential-integrity orphan check). `parentKeys` must be
    * broadcast-small (a key projection of a dim table).
    */
  final case class ForeignKey(column: String, parentKeys: DataFrame,
      parentLabel: String) extends Check {
    val name = "foreign_key"; val columnLabel = s"$column->$parentLabel"
  }

  private def violationCond(c: Check): Column = c match {
    case NotNull(col0) => col(col0).isNull
    case InRange(col0, lo, hi) =>
      col(col0).isNotNull && !col(col0).between(lo, hi)
    case InSet(col0, allowed) =>
      col(col0).isNotNull && !col(col0).isin(allowed: _*)
    case Satisfies(_, sql) => !coalesce(expr(sql), lit(false))
    case _ => throw new IllegalArgumentException(s"not row-local: $c")
  }

  /** Run every check; returns the long-form report sorted by
    * (check_name, column_name) so the output is deterministic.
    */
  def check(df: DataFrame, checks: Seq[Check]): DataFrame = {
    require(checks.nonEmpty, "no checks given")
    val rowLocal = checks.collect {
      case c @ (_: NotNull | _: InRange | _: InSet | _: Satisfies) => c
    }
    val reports = scala.collection.mutable.ArrayBuffer.empty[DataFrame]

    if (rowLocal.nonEmpty) {
      // one scan, one aggregate row: [n_rows, viol_0, viol_1, ...]
      val aggCols = count(lit(1)).as("__n") +: rowLocal.zipWithIndex.map {
        case (c, i) => // coalesce: SUM over zero rows is NULL, not 0
          coalesce(sum(when(violationCond(c), 1L).otherwise(0L)), lit(0L))
            .as(s"__v$i")
      }
      val one = df.agg(aggCols.head, aggCols.tail: _*)
      // long form by exploding TYPED literal structs over the 1-row
      // aggregate — no SQL-string splicing, so names/labels containing
      // quotes (or anything else) can never break or inject into the plan
      reports += one.select(
        explode(array(rowLocal.zipWithIndex.map { case (c, i) =>
          struct(lit(c.name).as("check_name"),
            lit(c.columnLabel).as("column_name"),
            col(s"__v$i").as("n_violations"))
        }: _*)).as("__r"), col("__n").as("n_rows"))
        .select(col("__r.check_name"), col("__r.column_name"),
          col("n_rows"), col("__r.n_violations"))
    }

    checks.collect { case u: Unique => u }.foreach { u =>
      // n_rows = sum of group sizes — total rides the same shuffle
      reports += df.groupBy(u.columns.map(col): _*)
        .agg(count(lit(1)).as("__c"))
        .agg(lit(u.name).as("check_name"),
          lit(u.columnLabel).as("column_name"),
          coalesce(sum(col("__c")), lit(0L)).as("n_rows"),
          coalesce(sum(when(col("__c") > 1, col("__c")).otherwise(0L)),
            lit(0L)).as("n_violations"))
    }

    checks.collect { case f: ForeignKey => f }.foreach { f =>
      val parent = f.parentKeys.columns match {
        case Array(single) =>
          f.parentKeys.select(col(single).as("__pk")).distinct()
        case other => throw new IllegalArgumentException(
          s"parentKeys must be a single-column frame, got ${other.mkString(",")}")
      }
      reports += df
        .join(broadcast(parent.withColumn("__hit", lit(1))),
          col(f.column) === col("__pk"), "left_outer")
        .agg(lit(f.name).as("check_name"),
          lit(f.columnLabel).as("column_name"),
          count(lit(1)).as("n_rows"),
          coalesce(sum(when(col(f.column).isNotNull && col("__hit").isNull,
            1L).otherwise(0L)), lit(0L)).as("n_violations"))
    }

    reports.reduce(_ unionByName _)
      .withColumn("passed", col("n_violations") === 0L)
      .orderBy(col("check_name"), col("column_name"))
  }
}
