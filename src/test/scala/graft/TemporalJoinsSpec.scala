package graft

import graft.operators.TemporalJoins
import org.apache.spark.sql.functions._

class TemporalJoinsSpec extends SparkTestBase {

  test("asOfJoin picks the latest right row at-or-before each left ts") {
    val s = spark
    import s.implicits._
    val trades = Seq(("A", 10L, "t1"), ("A", 25L, "t2"), ("B", 5L, "t3"))
      .toDF("k", "ts", "trade")
    val quotes = Seq(("A", 5L, 1.0), ("A", 10L, 2.0), ("A", 20L, 3.0), ("B", 50L, 9.0))
      .toDF("k", "qts", "price")
    val out = TemporalJoins.asOfJoin(spark, trades, quotes, "k", "ts", "qts",
        Seq("qts", "price"))
      .select("trade", "asof_qts", "asof_price")
      .collect().map(r => (r.getString(0), Option(r.get(1)), Option(r.get(2)))).toSeq
    assertMultiset(out, Seq(
      ("t1", Some(10L), Some(2.0)),  // quote AT the trade ts applies
      ("t2", Some(20L), Some(3.0)),  // latest at-or-before 25
      ("t3", None, None)))           // no quote before ts=5 → left outer null
  }

  test("rangeJoin matches pairs within width, across bucket boundaries") {
    val s = spark
    import s.implicits._
    // width 10: bucket boundary at 10/20; pair (9, 11) spans buckets
    val l = Seq(("u", 1L, 9L), ("u", 2L, 50L)).toDF("k", "lid", "lts")
    val r = Seq(("u", 10L, 11L), ("u", 20L, 58L), ("u", 30L, 200L)).toDF("k", "rid", "rts")
    val out = TemporalJoins.rangeJoin(l, r, "k", "lts", "rts", 10L)
      .select("lid", "rid").collect().map(x => (x.getLong(0), x.getLong(1))).toSeq
    assertMultiset(out, Seq((1L, 10L), (2L, 20L)))
  }

  test("lastTouchAttribution: latest touch wins, window staleness nulls, strict precedence") {
    val s = spark
    import s.implicits._
    val rows = Seq(
      // user A: touch(camp 1) @10, touch(camp 2) @20, conv @25 -> camp 2
      ("A", 10L, 1L, "click", 1L), ("A", 20L, 2L, "click", 2L),
      ("A", 25L, 3L, "buy", 0L),
      // user B: touch @10, conv @200 with window 100 -> stale, NULL
      ("B", 10L, 4L, "click", 3L), ("B", 200L, 5L, "buy", 0L),
      // user C: conv with NO touch ever -> NULL
      ("C", 50L, 6L, "buy", 0L),
      // user D: touch and conv at the SAME ts — tiebreak id orders the
      // touch first, so the conv DOES attribute (strictly-preceding row)
      ("D", 30L, 7L, "click", 4L), ("D", 30L, 8L, "buy", 0L),
      // user E: conv BEFORE its touch in tiebreak order at equal ts ->
      // the touch is not preceding, NULL
      ("E", 30L, 9L, "buy", 0L), ("E", 30L, 10L, "click", 5L))
      .toDF("u", "ts", "id", "ty", "camp")
    val got = TemporalJoins.lastTouchAttribution(rows, "u", "ts", "id",
        col("ty") === "click", col("ty") === "buy",
        Seq("camp"), windowMillis = 100L)
      .select("u", "touch_camp", "touch_ts").collect()
      .map(r => (r.getString(0), Option(r.get(1)), Option(r.get(2)))).toSeq
    assertMultiset(got, Seq(
      ("A", Some(2L), Some(20L)),
      ("B", None, None),
      ("C", None, None),
      ("D", Some(4L), Some(30L)),
      ("E", None, None)))
    // unbounded window (<= 0): B's stale touch now attributes
    val unb = TemporalJoins.lastTouchAttribution(rows, "u", "ts", "id",
        col("ty") === "click", col("ty") === "buy",
        Seq("camp"), windowMillis = 0L)
      .select("u", "touch_camp").collect()
      .map(r => (r.getString(0), Option(r.get(1)))).toSeq
    assert(unb.contains(("B", Some(3L))))
  }

  test("lastTouchAttribution: non-touch non-conv rows never attribute nor emit") {
    val s = spark
    import s.implicits._
    // noise rows between touch and conv must not break the carry; noise
    // rows are not emitted
    val rows = Seq(
      ("A", 10L, 1L, "click", 1L), ("A", 15L, 2L, "view", 9L),
      ("A", 20L, 3L, "buy", 0L))
      .toDF("u", "ts", "id", "ty", "camp")
    val got = TemporalJoins.lastTouchAttribution(rows, "u", "ts", "id",
        col("ty") === "click", col("ty") === "buy",
        Seq("camp"), windowMillis = 1000L)
      .select("id", "touch_camp").collect()
      .map(r => (r.getLong(0), Option(r.get(1)))).toSeq
    assertMultiset(got, Seq((3L, Some(1L))))
  }
}
