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
}
