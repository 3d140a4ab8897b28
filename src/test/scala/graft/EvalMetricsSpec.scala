package graft

import graft.operators.EvalMetrics
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

/** EvalMetrics: exact AUC (vs brute-force pair model), NDCG@k (vs an
  * in-memory replica), calibration report invariants.
  */
class EvalMetricsSpec extends SparkTestBase {
  import SparkTestBase.spark.implicits._

  /** Brute-force Mann–Whitney: 2U counted pair by pair (2 per win, 1 per
    * tie) — the integer the engine's two-level scan must reproduce.
    */
  private def bruteAucNum2(rows: Seq[(Double, Long)]): (Long, Long, Long) = {
    val pos = rows.filter(_._2 == 1L).map(_._1)
    val neg = rows.filter(_._2 == 0L).map(_._1)
    val num2 = (for (p <- pos; n <- neg) yield {
      if (p > n) 2L else if (p == n) 1L else 0L
    }).sum
    (pos.size.toLong, neg.size.toLong, num2)
  }

  private val seeded: Seq[(Double, Long)] = {
    val rnd = new scala.util.Random(42)
    // deliberately tie-heavy: scores quantized to halves
    Seq.fill(300) {
      val s = math.floor(rnd.nextDouble() * 20) / 2.0
      val lbl = if (rnd.nextDouble() < 0.3 + s / 20) 1L else 0L
      (s, lbl)
    }
  }

  test("aucExact matches the brute-force pair count on tie-heavy data") {
    val (np, nn, num2) = bruteAucNum2(seeded)
    val r = EvalMetrics.aucExact(seeded.toDF("score", "lbl"), "score", "lbl")
      .collect().head
    assert(r.getLong(0) == np && r.getLong(1) == nn)
    assert(r.getLong(2) == num2, "auc_num must equal 2U from pair counting")
    assert(r.getLong(3) == 2L * np * nn)
    assert(math.abs(r.getDouble(4) - num2.toDouble / (2L * np * nn)) < 1e-6)
  }

  test("aucExact is partition-count invariant (two-level scan correctness)") {
    val df = seeded.toDF("score", "lbl")
    val rs = Seq(1, 3, 7, 32).map { p =>
      EvalMetrics.aucExact(df, "score", "lbl", numPartitions = p)
        .collect().head.toSeq
    }
    assert(rs.distinct.size == 1,
      s"results must not depend on the range-partition count: $rs")
  }

  test("aucExact endpoints: perfect, inverted, and constant scorers") {
    val perfect = Seq((1.0, 0L), (2.0, 0L), (3.0, 1L), (4.0, 1L))
    assert(EvalMetrics.aucExact(perfect.toDF("score", "lbl"), "score", "lbl")
      .collect().head.getDouble(4) == 1.0)
    val inverted = perfect.map { case (s, l) => (s, 1L - l) }
    assert(EvalMetrics.aucExact(inverted.toDF("score", "lbl"), "score", "lbl")
      .collect().head.getDouble(4) == 0.0)
    val constant = Seq((5.0, 0L), (5.0, 1L), (5.0, 0L), (5.0, 1L))
    assert(EvalMetrics.aucExact(constant.toDF("score", "lbl"), "score", "lbl")
      .collect().head.getDouble(4) == 0.5)
  }

  test("aucExact single-class input yields null auc, not a crash") {
    val onlyPos = Seq((1.0, 1L), (2.0, 1L))
    val r = EvalMetrics.aucExact(onlyPos.toDF("score", "lbl"), "score", "lbl")
      .collect().head
    assert(r.getLong(0) == 2L && r.getLong(1) == 0L)
    assert(r.isNullAt(4))
  }

  test("prCurve matches the brute-force threshold sweep") {
    val got = EvalMetrics.prCurve(seeded.toDF("score", "lbl"), "score", "lbl")
      .collect().map(r => r.getDouble(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    val thresholds = seeded.map(_._1).distinct
    assert(got.keySet == thresholds.toSet)
    val p = seeded.count(_._2 == 1L)
    for (t <- thresholds) {
      val tp = seeded.count { case (s, l) => s >= t && l == 1L }.toLong
      val fp = seeded.count { case (s, l) => s >= t && l == 0L }.toLong
      assert(got(t) == ((tp, fp, p - tp)), s"threshold $t")
    }
  }

  test("prCurve is partition-count invariant") {
    val df = seeded.toDF("score", "lbl")
    val rs = Seq(1, 7, 32).map { p =>
      EvalMetrics.prCurve(df, "score", "lbl", numPartitions = p)
        .collect().map(_.toSeq).sortBy(_.head.asInstanceOf[Double]).toSeq
    }
    assert(rs.distinct.size == 1)
  }

  /** In-memory NDCG replica — same gain/discount, same tie-breaks. */
  private def modelNdcg(rows: Seq[(Long, Double, Long)], k: Int): (Double, Double) = {
    def dcgOf(ordered: Seq[Long]): Double =
      ordered.take(k).zipWithIndex.map { case (rel, i) =>
        (math.pow(2.0, rel.toDouble) - 1.0) /
          (math.log(i + 2.0) / math.log(2.0))
      }.sum
    val byScore = rows.sortBy { case (id, s, _) => (-s, id) }.map(_._3)
    val byRel = rows.sortBy { case (id, _, r) => (-r, id) }.map(_._3)
    (dcgOf(byScore), dcgOf(byRel))
  }

  private val rankedRows: Seq[(String, Long, Double, Long)] = {
    val rnd = new scala.util.Random(7)
    for {
      q <- Seq("a", "b", "c")
      id <- 1L to 40L
    } yield (q, id, math.floor(rnd.nextDouble() * 1000) / 10.0,
      rnd.nextInt(4).toLong)
  }

  test("ndcgAtK matches the in-memory replica per query") {
    val out = EvalMetrics.ndcgAtK(
      rankedRows.toDF("q", "id", "score", "rel"), "q", "id", "score", "rel", 10)
      .collect().map(r => r.getString(0) -> r).toMap
    for (q <- Seq("a", "b", "c")) {
      val rows = rankedRows.filter(_._1 == q).map(t => (t._2, t._3, t._4))
      val (dcg, idcg) = modelNdcg(rows, 10)
      val r = out(q)
      assert(r.getLong(1) == rows.size)
      assert(math.abs(r.getDouble(2) - dcg) < 1e-6, s"dcg($q)")
      assert(math.abs(r.getDouble(3) - idcg) < 1e-6, s"idcg($q)")
      assert(math.abs(r.getDouble(4) - dcg / idcg) < 1e-5, s"ndcg($q)")
    }
  }

  test("ndcgAtK: a perfectly-ordered ranking scores exactly 1.0") {
    val rows = (1L to 20L).map(i => ("q", i, 100.0 - i, 20L - i))
    val r = EvalMetrics.ndcgAtK(rows.toDF("q", "id", "score", "rel"),
      "q", "id", "score", "rel", 10).collect().head
    assert(r.getDouble(4) == 1.0)
  }

  test("ndcgAtK: candidates beyond rank k contribute nothing") {
    // two frames identical in the top-k, divergent rel below it
    val base = (1L to 15L).map(i => ("q", i, 100.0 - i, (15L - i) % 4))
    val noisy = base.map { case t @ (q, id, s, rel) =>
      if (id > 10) (q, id, s, 0L) else t
    }
    def dcgOf(rows: Seq[(String, Long, Double, Long)]): Double =
      EvalMetrics.ndcgAtK(rows.toDF("q", "id", "score", "rel"),
        "q", "id", "score", "rel", 10).collect().head.getDouble(2)
    assert(dcgOf(base) == dcgOf(noisy))
  }

  test("calibrationReport clamps out-of-range probabilities into the edge bins") {
    val rows = Seq((-0.25, 0L), (0.05, 0L), (1.5, 1L), (0.95, 1L))
    val out = EvalMetrics.calibrationReport(rows.toDF("p", "lbl"), "p", "lbl")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out == Map(0L -> 2L, 9L -> 2L),
      s"p<0 joins bin 0, p>1 joins the top bin: $out")
  }

  test("calibrationReport: bin edges, totals, and the ECE identity") {
    val rnd = new scala.util.Random(11)
    val rows = Seq.fill(500) {
      val p = rnd.nextDouble()
      (p, if (rnd.nextDouble() < p * 0.8) 1L else 0L)
    } ++ Seq((1.0, 1L), (0.0, 0L)) // exact endpoints
    val out = EvalMetrics.calibrationReport(rows.toDF("p", "lbl"), "p", "lbl")
      .collect()
    assert(out.map(_.getLong(1)).sum == rows.size)
    // p = 1.0 joins the top bin; p = 0.0 the bottom
    assert(out.map(_.getLong(0)).toSet.subsetOf((0L to 9L).toSet))
    for (r <- out) {
      val (bin, n, conf, acc, gap, ece) =
        (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3),
          r.getDouble(4), r.getDouble(5))
      assert(conf >= bin / 10.0 - 1e-9 && conf <= (bin + 1) / 10.0 + 1e-9,
        s"bin $bin mean confidence outside its edges: $conf")
      assert(acc >= 0.0 && acc <= 1.0)
      assert(math.abs(gap - math.abs(conf - acc)) < 2e-6)
      assert(math.abs(ece - gap * n / rows.size) < 2e-6)
    }
    // the probed generator undershoots p, so the report must show it:
    // overall ECE strictly positive
    assert(out.map(_.getDouble(5)).sum > 0.01)
  }

  /** Textbook KM reference: sequential product over sorted durations. */
  private def modelKm(subjects: Seq[(Long, Int)])
      : Seq[(Long, Long, Long, Long, Double)] = {
    val byT = subjects.groupBy(_._1).toSeq.sortBy(_._1)
    var atRisk = subjects.size.toLong
    var surv = 1.0
    byT.map { case (t, ss) =>
      val d = ss.count(_._2 == 1).toLong
      val c = ss.size - d
      val row =
        if (d >= atRisk) (t, atRisk, d, c, 0.0)
        else { surv *= 1.0 - d.toDouble / atRisk; (t, atRisk, d, c, surv) }
      if (d >= atRisk) surv = 0.0
      atRisk -= ss.size
      row
    }
  }

  test("kaplanMeier matches the sequential product, censoring included") {
    val s = spark; import s.implicits._
    val rnd = new scala.util.Random(13)
    val subjects = (1 to 400).map { i =>
      (1L + rnd.nextInt(12), if (rnd.nextBoolean()) 1 else 0)
    }
    val got = EvalMetrics.kaplanMeier(
      subjects.toDF("t", "obs"), "t", "obs")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4))).sortBy(_._1)
    val want = modelKm(subjects)
    got.zip(want).foreach { case (g, w) =>
      assert(g._1 == w._1 && g._2 == w._2 && g._3 == w._3 && g._4 == w._4,
        s"census diverges: $g vs $w")
      assert(math.abs(g._5 - w._5) < 1e-9, s"survival diverges: $g vs $w")
    }
    // monotone non-increasing, starts <= 1
    assert(got.map(_._5).toSeq.sliding(2).forall {
      case Seq(a, b) => b <= a + 1e-12; case _ => true })
  }

  test("kaplanMeier: everyone dying at the last time pins survival to zero") {
    val s = spark; import s.implicits._
    // 3 die at t=1 (of 6 at risk), 1 censored at t=2, 2 die at t=3 (= all
    // remaining at risk) -> S(3) exactly 0.0, no ln(0) anywhere
    val subjects = Seq((1L, 1), (1L, 1), (1L, 1), (2L, 0), (3L, 1), (3L, 1))
    val got = EvalMetrics.kaplanMeier(subjects.toDF("t", "obs"), "t", "obs")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4))).sortBy(_._1)
    assert(got(0) == ((1L, 6L, 3L, 0L, 0.5)))
    assert(got(1) == ((2L, 3L, 0L, 1L, 0.5)))
    assert(got(2) == ((3L, 2L, 2L, 0L, 0.0)))
  }

  test("giniByGroup: closed-form extremes and the exact-integer formula") {
    val s = spark
    import s.implicits._
    val rows =
      // group "eq": perfect equality -> G = 0
      (1L to 4L).map(i => ("eq", i, 100L)) ++
      // group "one": one member holds everything -> G = (n-1)/n = 0.75
      Seq(("one", 1L, 0L), ("one", 2L, 0L), ("one", 3L, 0L),
        ("one", 4L, 400L)) ++
      // group "mix": hand-computed — x = (1,2,3,4) ascending,
      // G = (2*(1+4+9+16) - 5*10) / (4*10) = 10/40 = 0.25
      Seq(("mix", 10L, 1L), ("mix", 11L, 2L), ("mix", 12L, 3L),
        ("mix", 13L, 4L)) ++
      // degenerate groups: all-zero total and a single member -> NULL
      Seq(("zero", 1L, 0L), ("zero", 2L, 0L), ("solo", 1L, 42L))
    val got = EvalMetrics.giniByGroup(
        rows.toDF("g", "id", "v"), "g", "v", "id")
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), Option(r.get(3))))).toMap
    assert(got("eq") == ((4L, 400L, Some(0.0))))
    assert(got("one") == ((4L, 400L, Some(0.75))))
    assert(got("mix") == ((4L, 10L, Some(0.25))))
    assert(got("zero") == ((2L, 0L, None)))
    assert(got("solo") == ((1L, 42L, None)))
  }

  test("giniByGroup: tie-break id makes equal values deterministic; order-free") {
    val s = spark
    import s.implicits._
    // heavy ties: rank assignment among equals is id-ordered, but Gini is
    // rank-sum based so ANY consistent tie order gives the same answer —
    // assert invariance under input permutation and repartitioning
    val base = Seq(("g", 1L, 5L), ("g", 2L, 5L), ("g", 3L, 5L),
      ("g", 4L, 85L))
    val a = EvalMetrics.giniByGroup(base.toDF("g", "id", "v"),
      "g", "v", "id").collect().map(_.toSeq).toSeq
    val b = EvalMetrics.giniByGroup(
        base.reverse.toDF("g", "id", "v").repartition(7),
        "g", "v", "id").collect().map(_.toSeq).toSeq
    assert(a == b)
  }

  test("giniByGroup equals the independent mean-absolute-difference formula") {
    val s = spark
    import s.implicits._
    // G = Σᵢⱼ|xᵢ−xⱼ| / (2n²μ) — a DIFFERENT closed form than the
    // rank-sum the operator computes; agreement on seeded random groups
    // pins the algebra, not the implementation
    val rnd = new scala.util.Random(11)
    val rows = for (g <- 0 until 6; i <- 0 until (5 + rnd.nextInt(40)))
      yield (s"g$g", (g * 1000 + i).toLong, rnd.nextInt(1000000).toLong)
    val got = EvalMetrics.giniByGroup(rows.toDF("g", "id", "v"),
        "g", "v", "id")
      .collect().map(r => r.getString(0) -> r.getDouble(3)).toMap
    for ((g, rs) <- rows.groupBy(_._1)) {
      val xs = rs.map(_._3)
      val n = xs.size
      val sumAbs = (for (a <- xs; b <- xs) yield math.abs(a - b))
        .map(BigInt(_)).sum
      val want = sumAbs.toDouble / (2.0 * n * n * (xs.map(BigInt(_)).sum
        .toDouble / n))
      assert(math.abs(got(g) - want) < 1e-9, s"$g: ${got(g)} vs $want")
    }
  }

  /** In-memory weighted PAV with exact cross-product comparisons — the
    * single-pass reference the two-level distributed fit must equal.
    */
  private def refPav(census: Seq[(Double, Long, Long)]): Map[Double, Double] = {
    val stack = collection.mutable.ArrayBuffer.empty[(Double, Double, Long, Long)]
    census.sortBy(_._1).foreach { case (x, n, sy) =>
      stack += ((x, x, n, sy))
      while (stack.length >= 2 && {
        val p = stack(stack.length - 2); val c = stack.last
        p._4 * c._3 >= c._4 * p._3
      }) {
        val c = stack.remove(stack.length - 1)
        val p = stack.remove(stack.length - 1)
        stack += ((p._1, c._2, p._3 + c._3, p._4 + c._4))
      }
    }
    census.map { case (x, _, _) =>
      val b = stack.find(bl => bl._1 <= x && x <= bl._2).get
      x -> b._4.toDouble / b._3
    }.toMap
  }

  test("isotonicFit pools a hand fixture to the known blocks") {
    // means 0.2, 0.6, 0.4, 0.8: the middle pair violates and pools to 0.5
    val df = Seq.tabulate(4) { i => (i.toDouble, 10L, Seq(2L, 6L, 4L, 8L)(i)) }
      .flatMap { case (x, n, sy) =>
        (0L until n).map(j => (x, if (j < sy) 1L else 0L))
      }.toDF("x", "y")
    val got = EvalMetrics.isotonicFit(df, "x", "y")
      .collect().map(r => r.getDouble(0) -> r.getDouble(3)).toMap
    assert(got == Map(0.0 -> 0.2, 1.0 -> 0.5, 2.0 -> 0.5, 3.0 -> 0.8))
  }

  test("isotonicFit equals single-pass reference PAV on the battery census") {
    val d = "/root/testdata/sf0.001"
    val e = Tables.events(spark, d).select(
      expr("CAST(conv(substring(md5(CAST(event_id AS STRING)), 1, 6)" +
        ", 16, 10) AS BIGINT) % 32").as("b"),
      when(col("event_type") === "purchase", 1L).otherwise(0L).as("y"))
    val got = EvalMetrics.isotonicFit(e, "b", "y").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(got.length == 32, "expected all 32 bins")
    val census = got.map(r => (r._1.toDouble, r._2, r._3)).toSeq
    val want = refPav(census)
    got.foreach { case (b, _, _, f) => assert(f == want(b.toDouble),
      s"bin $b: $f vs ${want(b.toDouble)}") }
    // non-vacuity: the hash bins must actually pool somewhere
    assert(got.map(_._4).distinct.length < 32, "no pooling happened")
  }

  test("isotonicFit output is monotone and conserves label mass per pool") {
    val d = "/root/testdata/sf0.001"
    val e = Tables.events(spark, d).select(
      expr("CAST(conv(substring(md5(CAST(event_id AS STRING)), 1, 6)" +
        ", 16, 10) AS BIGINT) % 32").as("b"),
      when(col("event_type") === "purchase", 1L).otherwise(0L).as("y"))
    val got = EvalMetrics.isotonicFit(e, "b", "y").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      .sortBy(_._1)
    got.sliding(2).foreach { w =>
      assert(w(0)._4 <= w(1)._4, s"fit not monotone at ${w(1)._1}")
    }
    // Σ n·fitted == Σ sy exactly per pool (fitted is the pool mean)
    got.groupBy(_._4).values.foreach { pool =>
      val n = pool.map(_._2).sum; val sy = pool.map(_._3).sum
      assert(sy.toDouble / n == pool.head._4, "pool mean drifted")
    }
  }

  test("isotonicFit excludes NULL labels and survives an already-monotone input") {
    val df = Seq((0.0, Some(0L)), (0.0, None), (1.0, Some(1L)),
      (1.0, Some(1L)), (2.0, Some(1L))).toDF("x", "y")
    val got = EvalMetrics.isotonicFit(df, "x", "y")
      .collect().map(r => r.getDouble(0) -> ((r.getLong(1), r.getDouble(3))))
      .toMap
    // the NULL row vanished from n; already-monotone means stay unpooled
    assert(got(0.0) == ((1L, 0.0)) && got(1.0) == ((2L, 1.0)) &&
      got(2.0) == ((1L, 1.0)))
  }
}
