package graft

import graft.operators.Privacy
import org.apache.spark.sql.functions._

/** K-anonymity cascade and l-diversity audit. The battery row (d176) pins
  * the full release against the oracle's windowed-CTE cascade; these tests
  * pin the CONTRACT on hand-built frames: the anonymity guarantee itself,
  * row-count preservation, the remainder-only census semantics, and the
  * monotone response to k.
  */
class PrivacySpec extends SparkTestBase {

  private def release(k: Int) = {
    val sp = spark; import sp.implicits._
    // 12 rows: one big (a,x) cell, a small (a,y) cell that pools at level
    // 1, and a (b,*) remainder too small even pooled -> suppressed
    val df = Seq(
      ("r1", "a", "x"), ("r2", "a", "x"), ("r3", "a", "x"), ("r4", "a", "x"),
      ("r5", "a", "y"), ("r6", "a", "z"),
      ("r7", "b", "x"), ("r8", "b", "y"),
      ("r9", "a", "y"), ("r10", "a", "z"), ("r11", "a", "y"), ("r12", "a", "z")
    ).toDF("id", "g1", "g2")
    Privacy.kAnonymize(df, Seq("id"),
      Seq(
        Seq("g1" -> col("g1"), "g2" -> col("g2")),
        Seq("g1" -> col("g1"), "g2" -> lit("*"))),
      k)
  }

  test("every released class reaches k; rows preserved; levels correct") {
    val out = release(4).collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2), r.getInt(3)))
    assert(out.length == 12, "suppression must preserve row count")
    // the anonymity guarantee: group by the RELEASED quasi view (per
    // level); every non-suppressed class has >= k members
    out.groupBy(t => (t._2, t._3, t._4)).foreach { case (cls, rows) =>
      if (cls._3 < 2) // 2 = suppression level here
        assert(rows.length >= 4, s"class $cls leaked with ${rows.length} < k")
      else
        assert(cls._1 == "*" && cls._2 == "*", s"suppressed class $cls")
    }
    val byId = out.map(t => t._1 -> ((t._2, t._3, t._4))).toMap
    // (a,x) is 4-strong at level 0
    assert(byId("r1") == (("a", "x", 0)) && byId("r4") == (("a", "x", 0)))
    // (a,y)/(a,z) are 3+3 -> pool to (a,*) at level 1
    assert(byId("r5") == (("a", "*", 1)) && byId("r6") == (("a", "*", 1)))
    // (b,*) pools to only 2 -> suppressed
    assert(byId("r7") == (("*", "*", 2)) && byId("r8") == (("*", "*", 2)))
  }

  test("census is remainder-only: resolved rows never pad a coarser class") {
    // with k = 5 the (a,x) cell (4 rows) fails level 0 and joins the level-1
    // pool: (a,*) remainder = 4 + 6 = 10 >= 5 -> released at level 1. Had
    // level 1 counted ALL rows of (a,*) (12 - 2), the same answer would
    // arise; distinguish via k = 4: (a,x) resolves at level 0, so level 1
    // pools only 6 (not 10) — still >= 4. The discriminating case is k = 7:
    // remainder (a,*) = 6 + ... let the engine speak:
    val out7 = release(7).collect()
      .map(r => (r.getString(0), r.getInt(3))).toMap
    // level 0: no cell reaches 7. level 1 pools ALL 10 of (a,*) -> released;
    // (b,*) = 2 -> suppressed
    assert(out7("r1") == 1 && out7("r5") == 1)
    assert(out7("r7") == 2 && out7("r8") == 2)
    val out4 = release(4).collect()
      .map(r => (r.getString(0), r.getInt(3))).toMap
    // k=4: (a,x) resolves at level 0; remainder (a,*) = 6 >= 4 at level 1
    assert(out4("r1") == 0 && out4("r5") == 1)
  }

  test("monotone in k: raising k never un-suppresses a row") {
    val s4 = release(4).filter(col("level") === 2).count()
    val s7 = release(7).filter(col("level") === 2).count()
    assert(s4 <= s7, s"suppression must grow with k: $s4 -> $s7")
  }

  test("empty input and level-name mismatch are rejected cleanly") {
    val sp = spark; import sp.implicits._
    val empty = Seq.empty[(String, String)].toDF("id", "g1")
    val out = Privacy.kAnonymize(empty, Seq("id"),
      Seq(Seq("g1" -> col("g1"))), 2)
    assert(out.count() == 0)
    intercept[IllegalArgumentException] {
      Privacy.kAnonymize(empty, Seq("id"),
        Seq(Seq("g1" -> col("g1")), Seq("other" -> lit("*"))), 2)
    }
  }

  test("lDiversityAudit flags homogeneous classes") {
    val sp = spark; import sp.implicits._
    val released = Seq(
      ("a", "x", "flu"), ("a", "x", "flu"), ("a", "x", "flu"),
      ("b", "y", "flu"), ("b", "y", "cold"), ("b", "y", "ok")
    ).toDF("g1", "g2", "diagnosis")
    // columns: g1, g2, class_size, diversity, ok
    val audit = Privacy.lDiversityAudit(released, Seq("g1", "g2"),
      "diagnosis", l = 2).collect()
      .map(r => r.getString(0) -> ((r.getLong(3), r.getBoolean(4)))).toMap
    assert(audit("a") == ((1L, false)), "homogeneous class must fail l=2")
    assert(audit("b") == ((3L, true)))
  }
}
