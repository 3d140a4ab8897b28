package graft.api

import graft.core.WindowedValue
import scala.collection.mutable

/** Splittable-DoFn analog for bounded work (reference: SDF restriction
  * provider/tracker + try_claim loop, ray_runner_test.py:604-655; SURVEY.md
  * §2.7).
  *
  * Spark already plans source splits natively, so SDF here is an API shape,
  * not an execution mechanism: `initialRestriction` + `split` expand each
  * element into claimable ranges, a shuffle redistributes ranges across the
  * cluster (the analog of Beam handing residuals to other workers), and
  * `process` runs the claim loop. Checkpoint/resume (`defer_remainder`) maps
  * to Spark lineage + micro-batch offsets — deliberately not replicated
  * (SURVEY.md §7.4).
  */
final case class OffsetRange(start: Long, end: Long) {
  require(end >= start)
  def size: Long = end - start
}

/** Claim-based tracker: positions must be claimed monotonically; claims past
  * the range end fail (mirrors Beam's OffsetRangeTracker contract).
  */
final class RestrictionTracker(val restriction: OffsetRange) {
  private var lastClaimed: Long = restriction.start - 1
  def tryClaim(pos: Long): Boolean = {
    require(pos > lastClaimed, s"claims must be monotonic: $pos after $lastClaimed")
    if (pos >= restriction.end) false
    else { lastClaimed = pos; true }
  }
  def currentPosition: Long = lastClaimed
}

trait SplittableDoFn[I, O] extends Serializable {
  def initialRestriction(element: I): OffsetRange
  /** Initial splitting for parallelism (bundle-size hint is up to the fn). */
  def split(element: I, r: OffsetRange): Seq[OffsetRange] = Seq(r)
  /** Claim positions from the tracker; emit via `out`. Stop when tryClaim
    * fails.
    */
  def process(element: I, tracker: RestrictionTracker, out: O => Unit): Unit
}

object Sdf {
  /** Expand elements through a SplittableDoFn: restriction expansion, a
    * reshuffle so ranges process anywhere in the cluster, then the claim
    * loop.
    */
  def splittableParDo[I, O](in: PCollection[I], fn: SplittableDoFn[I, O]): PCollection[O] = {
    val expanded: PCollection[(I, OffsetRange)] = in.flatMap { e =>
      fn.split(e, fn.initialRestriction(e)).map(r => (e, r))
    }
    expanded.reshuffle().flatMap { case (e, r) =>
      val tracker = new RestrictionTracker(r)
      val buf = mutable.ArrayBuffer.empty[O]
      fn.process(e, tracker, buf += _)
      buf
    }
  }
}
