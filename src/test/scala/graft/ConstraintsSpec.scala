package graft

import graft.operators.Constraints
import graft.operators.Constraints._
import org.apache.spark.sql.functions._

class ConstraintsSpec extends SparkTestBase {

  private def report(rows: Seq[org.apache.spark.sql.Row]) =
    rows.map(r => (r.getString(0), r.getString(1)) ->
      (r.getLong(2), r.getLong(3), r.getBoolean(4))).toMap

  test("row-local checks: violation counts and polarity per check type") {
    val s = spark
    import s.implicits._
    val df = Seq(
      (1L, Some(10.0), Some("a")),
      (2L, Some(50.0), Some("b")),
      (3L, None, Some("z")), // null price: not a range violation; null label? no
      (4L, Some(-5.0), None), // range violation + null label
      (5L, Some(200.0), Some("a")) // range violation
    ).toDF("id", "price", "label")
    val out = report(Constraints.check(df, Seq(
      NotNull("label"),
      InRange("price", 0.0, 100.0),
      InSet("label", Seq("a", "b")),
      Satisfies("id_lt_5", "id < 5"))).collect().toSeq)
    assert(out(("not_null", "label")) == (5L, 1L, false))
    assert(out(("in_range", "price")) == (5L, 2L, false))
    // null label is NOT an in_set violation (not-null-ness is NotNull's job)
    assert(out(("in_set", "label")) == (5L, 1L, false))
    assert(out(("satisfies", "id_lt_5")) == (5L, 1L, false))
  }

  test("labels with quotes survive (typed literals, not SQL splicing)") {
    val s = spark
    import s.implicits._
    val df = Seq(1.0, -2.0).toDF("v")
    val out = report(Constraints.check(df,
      Seq(Satisfies("can't be negative", "v >= 0"))).collect().toSeq)
    assert(out(("satisfies", "can't be negative")) == (2L, 1L, false))
  }

  test("satisfies: an unevaluable (null) predicate is a violation") {
    val s = spark
    import s.implicits._
    val df = Seq(Some(1.0), None, Some(3.0)).toDF("v")
    val out = report(Constraints.check(df,
      Seq(Satisfies("v_pos", "v > 0"))).collect().toSeq)
    assert(out(("satisfies", "v_pos")) == (3L, 1L, false))
  }

  test("unique: counts every row of every colliding group; null keys collide like values") {
    val s = spark
    import s.implicits._
    val df = Seq(Some("a"), Some("a"), Some("a"), Some("b"), None, None)
      .toDF("k")
    val out = report(Constraints.check(df,
      Seq(Unique(Seq("k")))).collect().toSeq)
    // 3×a + 2×null = 5 rows living in colliding groups
    assert(out(("unique", "k")) == (6L, 5L, false))
  }

  test("foreign_key: orphans counted, null children exempt, duplicate parent keys harmless") {
    val s = spark
    import s.implicits._
    val child = Seq(Some(1L), Some(2L), Some(9L), None).toDF("fk")
    // duplicated parent key must not multiply child rows
    val parent = Seq(1L, 1L, 2L, 3L).toDF("pk")
    val out = report(Constraints.check(child,
      Seq(ForeignKey("fk", parent, "parent"))).collect().toSeq)
    assert(out(("foreign_key", "fk->parent")) == (4L, 1L, false))
  }

  test("passing checks report passed=true with zero violations") {
    val s = spark
    import s.implicits._
    val df = Seq((1L, "x"), (2L, "y")).toDF("id", "tag")
    val rows = Constraints.check(df, Seq(
      NotNull("id"), Unique(Seq("id")), InSet("tag", Seq("x", "y"))))
      .collect()
    assert(rows.length == 3)
    assert(rows.forall(r => r.getBoolean(4) && r.getLong(3) == 0L))
  }

  test("empty input: zero rows, zero violations, everything passes") {
    val s = spark
    import s.implicits._
    val df = Seq.empty[(Long, String)].toDF("id", "tag")
    val rows = Constraints.check(df, Seq(
      NotNull("tag"), Unique(Seq("id")),
      ForeignKey("id", Seq(1L).toDF("pk"), "p"))).collect()
    assert(rows.length == 3)
    assert(rows.forall(r => r.getLong(2) == 0L && r.getLong(3) == 0L &&
      r.getBoolean(4)))
  }

  test("all row-local checks share ONE aggregate scan (single-pass plan)") {
    val s = spark
    import s.implicits._
    val df = Seq((1L, 2.0, "a")).toDF("id", "v", "t")
    val rowLocalOnly = Constraints.check(df, Seq(
      NotNull("id"), InRange("v", 0, 10), InSet("t", Seq("a")),
      Satisfies("p", "v > 0")))
    rowLocalOnly.queryExecution.toRdd.foreach(_ => ()) // run so AQE finalizes
    // exactly one scan of the input: the stacked report rides one
    // (partial, final) aggregate pair regardless of check count. (AQE's
    // string repeats the tree under "== Initial Plan ==" — count the
    // final section only.)
    val scans = rowLocalOnly.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
      .linesIterator.count(_.contains("LocalTableScan"))
    assert(scans == 1, s"row-local checks must share one scan, saw $scans")
  }
}
