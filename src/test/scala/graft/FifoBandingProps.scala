package graft

import org.scalacheck.{Gen, Prop, Properties, Test => ScTest}
import org.scalacheck.Prop.forAll

/** The d205 banding law: the banded FIFO interval-overlap join is
  * output-identical to the UNBANDED reference join for EVERY band width —
  * width is a pure tuning constant (retuned 2^16 → 2^20 in round 6), so a
  * future retune can never change results. Generated queues deliberately
  * include: multiple parts, empty queues (one parity missing), qty far
  * larger than the band width (intervals spanning many bands — the
  * multi-band dedup path), qty smaller than the width (shared-band path),
  * equal lo/hi touch points (half-open: NOT an overlap), and zero
  * quantities (empty intervals — must allocate nothing and not corrupt
  * the band sequence; the r6 ADVICE failure mode).
  *
  * Spark job per sample, so the sample count is tuned down (25) — the
  * generator's density makes each sample cover many parts and widths.
  */
object FifoBandingProps extends Properties("FifoBanding") {

  override def overrideParameters(p: ScTest.Parameters): ScTest.Parameters =
    p.withMinSuccessfulTests(25)

  private lazy val spark = SparkTestBase.spark

  // (part, supp, order, line, ship, qty) — tuples, not a nested case
  // class: Spark's product-encoder codegen can't instantiate a private
  // inner case class from generated java
  private type Li = (Long, Long, Long, Long, Long, Long)

  private val rowGen: Gen[Li] = for {
    part <- Gen.chooseNum(1L, 3L)
    supp <- Gen.chooseNum(1L, 8L) // parity splits the two queues
    ship <- Gen.chooseNum(1L, 5L)
    qty <- Gen.frequency(
      8 -> Gen.chooseNum(1L, 40L), // spans several small bands
      2 -> Gen.const(0L)) // empty interval — must be inert
  } yield (part, supp, 0L, 0L, ship, qty)

  private val queueGen: Gen[Seq[Li]] =
    Gen.chooseNum(0, 24).flatMap(n => Gen.listOfN(n, rowGen))
      // (order, line) must be a PK for the FIFO total order — index them
      .map(_.zipWithIndex.map { case ((p, sp, _, _, sh, q), i) =>
        (p, sp, i / 3 + 1L, i % 3 + 1L, sh, q)
      })

  private val widthGen: Gen[Long] =
    Gen.oneOf(1L, 2L, 3L, 7L, 16L, 64L, 1048576L)

  private def run(rows: Seq[Li], bandWidth: Long): Seq[(Long, Long, Long, Long, Long, Long)] = {
    val s = spark; import s.implicits._
    val df = rows.toDF("l_partkey", "l_suppkey", "l_orderkey",
      "l_linenumber", "l_shipdate", "qty_c")
    Queries.fifoMatch(df, bandWidth).collect().toSeq
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
      .sorted
  }

  property("banded == unbanded for any band width") =
    forAll(queueGen, widthGen) { (rows, width) =>
      val banded = run(rows, width)
      val unbanded = run(rows, -1L)
      Prop(banded == unbanded) :| s"width=$width banded=$banded unbanded=$unbanded"
    }

  property("zero-quantity rows are inert: dropping them changes nothing") =
    forAll(queueGen, widthGen) { (rows, width) =>
      val withZeros = run(rows, width)
      val preFiltered = run(rows.filter(_._6 > 0), width)
      Prop(withZeros == preFiltered) :| s"width=$width with=$withZeros pre=$preFiltered"
    }

  property("every allocation is positive and bounded by both intervals") =
    forAll(queueGen, widthGen) { (rows, width) =>
      val qty = rows.map(r => (r._1, r._3, r._4) -> r._6).toMap
      run(rows, width).forall { case (p, dOrd, dLin, sOrd, sLin, alloc) =>
        alloc > 0 && alloc <= qty(p, dOrd, dLin) && alloc <= qty(p, sOrd, sLin)
      }
    }
}
