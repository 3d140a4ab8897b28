package graft

import graft.functions.FrequencySketch
import org.apache.spark.sql.functions._

/** Laws of the Misra-Gries heavy-hitters sketch: the guarantees hold for
  * EVERY partition layout, so the distributed runs assert the same bounds
  * as the sequential reference.
  */
class FrequencySketchSpec extends SparkTestBase {

  // 1000 "noise" singletons + heavy items well above the n/(k+1) floor
  private def corpus: Seq[String] = {
    val noise = (0 until 1000).map(i => s"noise$i")
    val heavyA = Seq.fill(400)("alpha")
    val heavyB = Seq.fill(250)("beta")
    noise ++ heavyA ++ heavyB
  }

  test("sequential reference: heavy items survive, estimates undercount within n/(k+1)") {
    val k = 20
    val items = corpus
    val buf = FrequencySketch.sketch(items, k)
    val exact = items.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val bound = items.size.toDouble / (k + 1)
    assert(buf.n == items.size)
    assert(buf.counts.size <= k)
    for ((t, est) <- buf.counts) {
      assert(est <= exact(t), s"$t overcounted: $est > ${exact(t)}")
      assert(exact(t) - est <= bound, s"$t undercounted past n/(k+1): $est vs ${exact(t)}")
    }
    assert(buf.counts.contains("alpha") && buf.counts.contains("beta"),
      s"heavy items lost: ${buf.counts.keys}")
  }

  test("distributed: same guarantees regardless of partition count") {
    val s = spark
    import s.implicits._
    val k = 20
    val items = corpus
    val exact = items.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val bound = items.size.toDouble / (k + 1)
    for (parts <- Seq(1, 7, 32)) {
      val df = items.toDF("term").repartition(parts)
      val m = df.select(FrequencySketch.heavyHitters(k)(col("term")).as("hh"))
        .first().getMap[String, Long](0)
      assert(m.size <= k, s"parts=$parts: ${m.size} counters exceed k")
      for ((t, est) <- m) {
        assert(est <= exact(t), s"parts=$parts: $t overcounted")
        assert(exact(t) - est <= bound, s"parts=$parts: $t undercounted past bound")
      }
      assert(m.contains("alpha") && m.contains("beta"),
        s"parts=$parts: heavy items lost: ${m.keys}")
    }
  }

  test("merge compaction: over-full union subtracts the (k+1)-st count, keeps <= k, never overcounts") {
    val agg = new FrequencySketch.MisraGriesAgg(5)
    // both inputs hold exactly k counters with DISTINCT exact counts (only k
    // distinct items each, so no decrement noise) — the union has 2k
    // counters and MUST take the compaction branch, not the early return
    val a = FrequencySketch.sketch(
      (0 until 5).flatMap(i => Seq.fill((i + 1) * 10)(s"a$i")), 5)
    val b = FrequencySketch.sketch(
      (0 until 5).flatMap(i => Seq.fill((i + 1) * 10 + 5)(s"b$i")), 5)
    assert(a.counts.size == 5 && b.counts.size == 5)
    val m = agg.merge(a, b)
    // counts: a 10,20,30,40,50; b 15,25,35,45,55 → 6th largest = 30 is the
    // cut; survivors are exactly the five counts above it, reduced by 30
    assert(m.counts.size <= 5, s"compaction kept ${m.counts.size} counters")
    assert(m.n == a.n + b.n)
    assert(m.counts == Map("b4" -> 25L, "a4" -> 20L, "b3" -> 15L, "a3" -> 10L, "b2" -> 5L),
      s"unexpected compaction result: ${m.counts}")
    // one-sided error: every estimate undercounts its true frequency
    val exact = Map("b4" -> 55L, "a4" -> 50L, "b3" -> 45L, "a3" -> 40L, "b2" -> 35L)
    for ((t, est) <- m.counts) assert(est <= exact(t), s"$t overcounted")
  }
}
