package graft

import graft.operators.KMeansLite
import org.scalatest.funsuite.AnyFunSuite

/** The IVF coarse-quantizer trainer: separation, determinism, degenerate
  * inputs (fewer distinct points than k).
  */
class KMeansLiteSpec extends AnyFunSuite {

  private def near(a: Array[Double], b: Array[Double], eps: Double = 0.5): Boolean =
    a.zip(b).map { case (x, y) => math.abs(x - y) }.max < eps

  test("separates two obvious clusters") {
    val rnd = new scala.util.Random(7)
    val points =
      Array.fill(50)(Array(10.0 + rnd.nextGaussian() * 0.1, 10.0 + rnd.nextGaussian() * 0.1)) ++
        Array.fill(50)(Array(-10.0 + rnd.nextGaussian() * 0.1, -10.0 + rnd.nextGaussian() * 0.1))
    val cs = KMeansLite.fit(points, k = 2, maxIter = 10, seed = 42L)
    assert(cs.length == 2)
    assert(cs.exists(near(_, Array(10.0, 10.0))) && cs.exists(near(_, Array(-10.0, -10.0))),
      cs.map(_.mkString("(", ",", ")")).mkString(" "))
  }

  test("deterministic: same sample + seed -> same centroids") {
    val rnd = new scala.util.Random(11)
    val points = Array.fill(200)(Array.fill(8)(rnd.nextDouble()))
    val a = KMeansLite.fit(points, k = 5, seed = 42L)
    val b = KMeansLite.fit(points.map(_.clone()), k = 5, seed = 42L)
    assert(a.map(_.toSeq).toSeq == b.map(_.toSeq).toSeq)
  }

  test("fewer distinct points than k -> one center per distinct point") {
    val points = Array(Array(1.0, 1.0), Array(1.0, 1.0), Array(2.0, 2.0), Array(1.0, 1.0))
    val cs = KMeansLite.fit(points, k = 8, seed = 42L)
    assert(cs.length <= 8 && cs.nonEmpty)
    // every training point must be representable exactly
    assert(points.forall(p => cs.exists(c => c.toSeq == p.toSeq)))
  }
}
