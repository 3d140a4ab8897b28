package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Misra-Gries heavy-hitters sketch as a typed `Aggregator` — the
  * bounded-memory answer to "which terms dominate a 100 TB corpus?".
  *
  * The exact global term count (d78's shape) shuffles one row per DISTINCT
  * term; on web-scale text that cardinality is itself unbounded. This sketch
  * caps the state at `k` counters per partial aggregate, combines map-side
  * like any other aggregation (one shuffle of at most `k` counters per
  * partition), and carries the classic guarantees:
  *
  *  - NO FALSE NEGATIVES above the noise floor: any item with true
  *    frequency > n/(k+1) (n = stream length) survives every decrement
  *    round and is present in the final counters.
  *  - ONE-SIDED ERROR: est <= true, and true - est <= n/(k+1). The merge
  *    keeps both properties (Agarwal et al., "Mergeable Summaries",
  *    PODS'12: add counters, subtract the (k+1)-st largest, keep positive).
  *
  * The output is therefore a CANDIDATE set: filter by an application floor
  * and/or re-score candidates exactly with one cheap semi-join pass when
  * exact counts matter. Results depend on partition layout by a bounded
  * amount (the error bound holds for every layout), so the battery entry is
  * rows-only — the structural laws live in FrequencySketchSpec.
  */
object FrequencySketch {

  /** Bounded counter map; `n` tracks the total items absorbed so callers
    * can compute the error bound n/(k+1) without a second pass.
    */
  case class MGBuf(counts: Map[String, Long], n: Long)

  class MisraGriesAgg(k: Int) extends Aggregator[String, MGBuf, Map[String, Long]] {
    require(k >= 1, s"sketch capacity must be positive: $k")

    def zero: MGBuf = MGBuf(Map.empty, 0L)

    def reduce(b: MGBuf, item: String): MGBuf = {
      require(item != null, "null item in heavy-hitters input — filter nulls first")
      val m = b.counts
      m.get(item) match {
        case Some(c) => MGBuf(m.updated(item, c + 1), b.n + 1)
        case None if m.size < k => MGBuf(m.updated(item, 1L), b.n + 1)
        case None =>
          // classic MG step: a full table and an unseen item decrement
          // every counter; zeros vacate their slots
          MGBuf(m.collect { case (t, c) if c > 1 => (t, c - 1) }, b.n + 1)
      }
    }

    def merge(a: MGBuf, b: MGBuf): MGBuf = {
      if (a.counts.isEmpty) return MGBuf(b.counts, a.n + b.n)
      if (b.counts.isEmpty) return MGBuf(a.counts, a.n + b.n)
      val combined = b.counts.foldLeft(a.counts) { case (m, (t, c)) =>
        m.updated(t, m.getOrElse(t, 0L) + c)
      }
      if (combined.size <= k) MGBuf(combined, a.n + b.n)
      else {
        // mergeable-summaries compaction: subtract the (k+1)-st largest
        // count from everything, keep strictly positive — at most k remain
        val cut = combined.valuesIterator.toArray.sortInPlace()(
          Ordering[Long].reverse).apply(k)
        MGBuf(combined.collect { case (t, c) if c > cut => (t, c - cut) },
          a.n + b.n)
      }
    }

    def finish(b: MGBuf): Map[String, Long] = b.counts

    def bufferEncoder: Encoder[MGBuf] = Encoders.product[MGBuf]
    def outputEncoder: Encoder[Map[String, Long]] =
      ExpressionEncoder[Map[String, Long]]()
  }

  /** DataFrame-facing heavy-hitters aggregate: `map<string, bigint>` of at
    * most `k` candidate counters.
    */
  def heavyHitters(k: Int): org.apache.spark.sql.expressions.UserDefinedFunction =
    udaf(new MisraGriesAgg(k), Encoders.STRING)

  /** Pure-Scala reference run (spec + driver-side use on small data). */
  def sketch(items: Iterable[String], k: Int): MGBuf = {
    val agg = new MisraGriesAgg(k)
    items.foldLeft(agg.zero)(agg.reduce)
  }
}
