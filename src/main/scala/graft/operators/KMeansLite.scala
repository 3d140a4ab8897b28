package graft.operators

/** Seeded in-JVM Lloyd's k-means for IVF coarse-quantizer training.
  *
  * An IVF index needs `nlist` representative centroids, not a full MLlib
  * fit: training data is a bounded sample (a few hundred points per cell is
  * the standard sizing), so the fit runs on the driver in milliseconds
  * instead of launching `maxIter` distributed jobs over the sample. At
  * 100 TB the flow is identical — sample a few MB, train here, broadcast
  * the centroid array into the assignment expression.
  *
  * Deterministic: k-means++ seeding and Lloyd's iterations are sequential
  * with a fixed-seed RNG — same sample, same seed, same centroids.
  */
object KMeansLite {

  private def sqDist(a: Array[Double], b: Array[Double]): Double = {
    val n = math.min(a.length, b.length)
    var d = 0.0
    var i = 0
    while (i < n) { val x = a(i) - b(i); d += x * x; i += 1 }
    d
  }

  /** Train `k` centroids (fewer iff the sample has fewer distinct points).
    * Empty clusters keep their previous centroid (standard Lloyd's).
    */
  def fit(points: Array[Array[Double]], k: Int, maxIter: Int = 10,
      seed: Long = 42L): Array[Array[Double]] = {
    require(points.nonEmpty, "k-means needs a non-empty training sample")
    require(k > 0, s"k must be positive, got $k")
    val rnd = new scala.util.Random(seed)

    // --- k-means++ init: first center uniform, then D^2-weighted ---
    val centers = scala.collection.mutable.ArrayBuffer[Array[Double]]()
    centers += points(rnd.nextInt(points.length)).clone()
    val d2 = Array.fill(points.length)(Double.MaxValue)
    var exhausted = false
    while (centers.size < k && !exhausted) {
      val last = centers.last
      var total = 0.0
      var i = 0
      while (i < points.length) {
        val d = sqDist(points(i), last)
        if (d < d2(i)) d2(i) = d
        total += d2(i); i += 1
      }
      if (total <= 0) exhausted = true // every point coincides with a center
      else {
        var r = rnd.nextDouble() * total
        var pick = 0
        var acc = d2(0)
        while (acc < r && pick < points.length - 1) { pick += 1; acc += d2(pick) }
        centers += points(pick).clone()
      }
    }

    // --- Lloyd's iterations ---
    val kk = centers.size
    val cs = centers.toArray
    val dim = points(0).length
    var iter = 0
    var moved = true
    while (iter < maxIter && moved) {
      val sums = Array.fill(kk)(new Array[Double](dim))
      val counts = new Array[Long](kk)
      var i = 0
      while (i < points.length) {
        val p = points(i)
        var best = 0; var bestD = Double.MaxValue
        var c = 0
        while (c < kk) {
          val d = sqDist(p, cs(c))
          if (d < bestD) { bestD = d; best = c }
          c += 1
        }
        val s = sums(best)
        val n = math.min(dim, p.length)
        var j = 0
        while (j < n) { s(j) += p(j); j += 1 }
        counts(best) += 1
        i += 1
      }
      moved = false
      var c = 0
      while (c < kk) {
        if (counts(c) > 0) {
          val next = sums(c)
          var j = 0
          while (j < dim) { next(j) /= counts(c); j += 1 }
          if (!java.util.Arrays.equals(next, cs(c))) { cs(c) = next; moved = true }
        } // empty cluster: keep the previous centroid
        c += 1
      }
      iter += 1
    }
    cs
  }
}
