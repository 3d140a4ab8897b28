package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Dense-vector math over `array<float>` embedding columns using native
  * higher-order functions (`zip_with`/`aggregate`) — codegen'd, no UDF, so
  * similarity scans stay inside WholeStageCodegen at any scale.
  */
object VectorFunctions {

  /** Dot product of two array<numeric> columns (double result). */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)

  /** L2 norm. */
  def norm(a: Column): Column = sqrt(dot(a, a))

  /** Cosine similarity; 0.0 for zero vectors. */
  def cosine(a: Column, b: Column): Column = {
    val denom = norm(a) * norm(b)
    when(denom > 0, dot(a, b) / denom).otherwise(lit(0.0))
  }

  /** Squared euclidean distance. */
  def l2Sq(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => {
      val d = x.cast("double") - y.cast("double"); d * d
    }), lit(0.0), (acc, v) => acc + v)

  /** Pre-normalized copy of a vector (array<double>); pre-normalizing the
    * corpus once turns every cosine into a dot product — the right trade at
    * 100 TB where the corpus side is scanned repeatedly.
    */
  def normalized(a: Column): Column = {
    val n = norm(a)
    when(n > 0, transform(a, x => x.cast("double") / n))
      .otherwise(transform(a, x => x.cast("double")))
  }

  /** Dimension-wise mean of an `array<double>` column as a typed
    * `Aggregator` — THE way to aggregate vectors at corpus scale: the
    * buffer is one running (sum[dim], count) per group, so the aggregation
    * is a single map-side-combinable shuffle of `numGroups × dim` doubles.
    * The posexplode formulation shuffles `rows × dim` exploded rows — 64×
    * more shuffle bytes at dim=64 — and is kept only as the oracle's
    * reference semantics.
    *
    * Mixed-length inputs are a data error; the aggregator fails fast rather
    * than silently truncating to a common prefix.
    */
  class VectorAvgAgg extends org.apache.spark.sql.expressions.Aggregator[
      Seq[Double], VectorAvgAgg.Buf, Seq[Double]] {
    import VectorAvgAgg.Buf
    def zero: Buf = Buf(Array.empty, 0L)
    def reduce(b: Buf, v: Seq[Double]): Buf = {
      require(v != null, "null vector in vectorAvg input — filter or impute nulls first")
      add(b, v.toArray, 1L)
    }
    def merge(a: Buf, b: Buf): Buf =
      if (b.n == 0) a else add(a, b.sum, b.n)
    private def add(b: Buf, v: Array[Double], n: Long): Buf = {
      if (b.n == 0) Buf(v.clone(), n)
      else {
        require(b.sum.length == v.length,
          s"vector length mismatch: ${b.sum.length} vs ${v.length}")
        var i = 0
        while (i < v.length) { b.sum(i) += v(i); i += 1 }
        Buf(b.sum, b.n + n)
      }
    }
    def finish(b: Buf): Seq[Double] =
      if (b.n == 0) Seq.empty
      else b.sum.map(_ / b.n).toSeq
    def bufferEncoder: org.apache.spark.sql.Encoder[Buf] =
      org.apache.spark.sql.Encoders.product[Buf]
    def outputEncoder: org.apache.spark.sql.Encoder[Seq[Double]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Double]]()
  }
  object VectorAvgAgg {
    case class Buf(sum: Array[Double], n: Long)
  }

  /** DataFrame-facing column function for [[VectorAvgAgg]]. */
  lazy val vectorAvg: org.apache.spark.sql.expressions.UserDefinedFunction =
    udaf(new VectorAvgAgg,
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Double]]())

  /** Deterministic random-hyperplane LSH bit-signature for cosine similarity:
    * `bits` hyperplanes are derived from xxhash64(seed, dim-index) — no
    * stored model needed, any executor regenerates the same planes. Returns
    * a bigint bucket key. Collisions preserve angular proximity.
    */
  def cosineLshBucket(vec: Column, bits: Int, seed: Int = 42): Column = {
    require(bits <= 63, "bucket key is a single long")
    val bitCols = (0 until bits).map { p =>
      // pseudo-random +-1 plane component per (plane, dim) from a hash
      val proj = aggregate(
        zip_with(vec, sequence(lit(0), size(vec) - 1),
          (x, i) => when(xxhash64(lit(s"plane$p"), i, lit(seed)).bitwiseAND(1) === 1,
            x.cast("double")).otherwise(-x.cast("double"))),
        lit(0.0), (acc, v) => acc + v)
      when(proj >= 0, lit(1L << p)).otherwise(lit(0L))
    }
    bitCols.reduce((a, b) => a.bitwiseOR(b))
  }
}
