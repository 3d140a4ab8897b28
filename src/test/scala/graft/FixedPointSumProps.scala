package graft

import graft.plans.DoubleUnscaled
import org.apache.spark.sql.types.{Decimal, DecimalType}
import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

/** DoubleUnscaled must equal Spark's own double->DECIMAL(18,s) cast on EVERY
  * double — the fast path may only fire where it provably agrees. The
  * generators aim straight at the danger zones: tie boundaries (x.xx5 where
  * shortest-repr and true-value rounding diverge), huge magnitudes past the
  * double-exact integer range, overflow, subnormals, and negatives.
  */
object FixedPointSumProps extends Properties("FixedPointSum") {

  /** Reference: exactly what Spark's Cast(double -> DECIMAL(18, s)) yields. */
  private def sparkCast(d: Double, scale: Int): Option[Long] = {
    if (d.isNaN || d.isInfinite) return None
    val dec = Decimal(d)
    if (dec.changePrecision(18, scale)) Some(dec.toUnscaledLong) else None
  }

  private def agree(d: Double, scale: Int): Boolean = {
    val got = Option(DoubleUnscaled.toUnscaled(d, scale)).map(_.longValue)
    val want = sparkCast(d, scale)
    got == want
  }

  private val scales = Gen.oneOf(0, 2, 4, 6)

  property("agrees on ordinary magnitudes") =
    forAll(Gen.chooseNum(-1e9, 1e9), scales)(agree)

  property("agrees on tie boundaries k/10^s + 0.5ulp-ish") =
    forAll(Gen.chooseNum(-100000000L, 100000000L), scales) { (k, s) =>
      // values exactly AT the decimal tie for this scale, plus neighbors
      val tie = (k.toDouble + 0.5) / math.pow(10, s)
      agree(tie, s) && agree(math.nextUp(tie), s) && agree(math.nextDown(tie), s)
    }

  property("agrees on classic shortest-repr ties (x.xx5 literals)") = {
    val cases = Seq(1.005, 2.675, 0.015, 1234567.005, -1.005, -2.675, 8.835,
      0.045, 99999999.995, -99999999.995)
    cases.forall(d => Seq(0, 2, 4, 6).forall(s => agree(d, s)))
  }

  property("agrees on huge magnitudes and overflow edges") =
    forAll(Gen.oneOf(
      Gen.chooseNum(1e15, 1e20), Gen.chooseNum(-1e20, -1e15),
      Gen.const(9.99999999999999e17), Gen.const(1e18), Gen.const(-1e18)), scales)(agree)

  property("agrees on tiny/subnormal values") =
    forAll(Gen.oneOf(Gen.chooseNum(-1e-3, 1e-3), Gen.const(Double.MinPositiveValue),
      Gen.const(-Double.MinPositiveValue), Gen.const(0.0), Gen.const(-0.0)), scales)(agree)

  property("NaN and infinities are null both ways") =
    Seq(Double.NaN, Double.PositiveInfinity, Double.NegativeInfinity)
      .forall(d => DoubleUnscaled.toUnscaled(d, 2) == null && sparkCast(d, 2).isEmpty)

  property("agrees on full random bit patterns") =
    forAll(Gen.long, scales) { (bits, s) =>
      val d = java.lang.Double.longBitsToDouble(bits)
      d.isNaN || agree(d, s)
    }
}
