package graft

import graft.operators.Integrity
import org.apache.spark.sql.functions._

/** Merkle anti-entropy diff laws: digest portability, drift-class
  * signatures, the narrowing protocol's containment, and the documented
  * count-catches-even-copies property.
  */
class IntegritySpec extends SparkTestBase {
  import SparkTestBase.spark.implicits._

  private def mk(rows: Seq[(Long, String)]) =
    rows.toDF("k", "v")

  test("identical snapshots diff to zero rows") {
    val a = mk(Seq((1L, "a"), (2L, "b"), (100L, "c")))
    assert(Integrity.merkleDiff(a, mk(Seq((1L, "a"), (2L, "b"), (100L, "c"))),
      "k", Seq("v"), 10L, 4).count() == 0L)
  }

  test("row digest is the documented md5 construction — portable by hand") {
    // one row, one bucket: the bucket digest IS the row digest, which any
    // md5-capable auditor must be able to recompute from the contract
    val s = Integrity.merkleSummary(mk(Seq((5L, "x"))), "k", Seq("v"), 10L, 4)
      .collect().head
    val md = java.security.MessageDigest.getInstance("MD5")
      .digest("5\u0001x".getBytes("UTF-8"))
      .map("%02x".format(_)).mkString.take(15)
    assert(s.getAs[Long]("digest") == java.lang.Long.parseLong(md, 16))
    assert(s.getAs[Long]("fine") == 0L && s.getAs[Long]("coarse") == 0L)
    assert(s.getAs[Long]("n") == 1L)
  }

  test("each drift class carries its signature in the dirty bucket row") {
    // buckets of width 10: corruption in bucket 0, deletion in bucket 1,
    // insertion in bucket 2; bucket 3 stays clean
    val base = mk(Seq((1L, "a"), (11L, "b"), (21L, "c"), (31L, "d")))
    val after = mk(Seq((1L, "A"), (21L, "c"), (25L, "new"), (31L, "d")))
    val out = Integrity.merkleDiff(base, after, "k", Seq("v"), 10L, 2)
      .collect().map(r => r.getAs[Long]("fine") ->
        ((r.getAs[Long]("n_base"), r.getAs[Long]("n_after"),
          r.getAs[Long]("digest_base") == r.getAs[Long]("digest_after"))))
      .toMap
    assert(out.keySet == Set(0L, 1L, 2L), s"dirty buckets: ${out.keySet}")
    assert(out(0L) == ((1L, 1L, false)), "corruption: counts equal, digest differs")
    assert(out(1L)._1 == 1L && out(1L)._2 == 0L, "deletion: bucket emptied")
    assert(out(2L) == ((1L, 2L, false)), "insertion: count grew")
  }

  test("an even number of identical phantom copies is caught by the count") {
    // XOR alone cancels a duplicated pair; the count term must flag it
    val base = mk(Seq((1L, "a")))
    val after = mk(Seq((1L, "a"), (1L, "a"), (1L, "a")))
    val out = Integrity.merkleDiff(base, after, "k", Seq("v"), 10L, 4).collect()
    assert(out.length == 1)
    assert(out.head.getAs[Long]("n_base") == 1L &&
      out.head.getAs[Long]("n_after") == 3L)
    // and the digests indeed XOR-cancelled — the documented weakness the
    // count exists to cover
    assert(out.head.getAs[Long]("digest_base") ==
      out.head.getAs[Long]("digest_after"))
  }

  test("battery drift recipe: every dirty bucket traces to a mutated key range") {
    val d = "/root/testdata/sf0.001"
    val out = Queries.d218MerkleDiff(spark, d).collect()
    assert(out.nonEmpty, "no drift found: recipe vacuous")
    // inserts land above 2e9: their buckets must show n_base = 0
    val insertBuckets = out.filter(_.getAs[Long]("fine") >= 2000000000L / 64)
    assert(insertBuckets.nonEmpty && insertBuckets.forall(_.getAs[Long]("n_base") == 0L))
    // every dirty original-range bucket contains a key hit by the recipe
    val lows = out.map(_.getAs[Long]("fine")).filter(_ < 2000000000L / 64)
    assert(lows.nonEmpty)
    val mutated = Tables.orders(spark, d)
      .filter(col("o_orderkey") % 997 === 5 || col("o_orderkey") % 997 === 17)
      .select(expr("o_orderkey div 64")).collect().map(_.getLong(0)).toSet
    lows.foreach(f => assert(mutated.contains(f),
      s"dirty bucket $f has no mutated key"))
  }

  test("narrowing containment: reported fine buckets sit in dirty coarse groups") {
    val d = "/root/testdata/sf0.001"
    val out = Queries.d218MerkleDiff(spark, d).collect()
    out.foreach { r =>
      assert(r.getAs[Long]("coarse") == r.getAs[Long]("fine") / 16,
        "coarse/fine relation broken")
    }
  }

  test("mergeSummaries of split halves equals the one-shot summary") {
    val rows = (1L to 200L).map(k => (k, s"v$k"))
    val full = Integrity.merkleSummary(mk(rows), "k", Seq("v"), 16L, 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).toSet
    val even = mk(rows.filter(_._1 % 2 == 0))
    val odd = mk(rows.filter(_._1 % 2 == 1))
    val merged = Integrity.mergeSummaries(
        Integrity.merkleSummary(even, "k", Seq("v"), 16L, 4),
        Integrity.merkleSummary(odd, "k", Seq("v"), 16L, 4))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).toSet
    assert(merged == full,
      "the incremental fold must land bit-identical to the one-shot summary")
  }
}
