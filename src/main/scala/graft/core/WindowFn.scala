package graft.core

/** Window assignment / merging strategies. The reference routes WindowInto
  * through the window_fn's `assign` (ray_beam_runner/translator.py:393-416)
  * and supports merging WindowFns through Beam's GroupAlsoByWindow
  * (overrides.py:72-79); custom merging fns appear in
  * ray_runner_test.py:2028-2047.
  *
  * Spark mapping: standard fns (Fixed/Sliding/Sessions) take the native
  * `window()` / `session_window()` fast path in relational queries; the
  * generic dataflow path assigns windows per element then groups by
  * (key, window) — sessions/custom-merging merge per key at group time.
  */
trait WindowFn extends Serializable {
  def assign(timestampMillis: Long): Seq[BoundedWindow]
  def isMerging: Boolean = false

  /** Merge a key's set of windows. Returns the merged window for each input
    * window (identity for non-merging fns). Only IntervalWindows merge.
    */
  def mergeWindows(windows: Seq[BoundedWindow]): Map[BoundedWindow, BoundedWindow] =
    windows.map(w => w -> w).toMap
}

case object GlobalWindows extends WindowFn {
  def assign(ts: Long): Seq[BoundedWindow] = Seq(GlobalWindow)
}

/** Tumbling windows of `sizeMillis` (reference test ray_runner_test.py:220-251). */
final case class FixedWindows(sizeMillis: Long, offsetMillis: Long = 0L) extends WindowFn {
  require(sizeMillis > 0)
  def assign(ts: Long): Seq[BoundedWindow] = {
    val start = ts - Math.floorMod(ts - offsetMillis, sizeMillis)
    Seq(IntervalWindow(start, start + sizeMillis))
  }
}

/** Sliding windows: each element lands in size/period windows (the reference
  * models multi-window membership as a window *list* per element,
  * translator.py:64-66 — same explode-per-window semantics as Spark's
  * `window(col, size, slide)`).
  */
final case class SlidingWindows(sizeMillis: Long, periodMillis: Long) extends WindowFn {
  require(sizeMillis > 0 && periodMillis > 0)
  def assign(ts: Long): Seq[BoundedWindow] = {
    val lastStart = ts - Math.floorMod(ts, periodMillis)
    // all window starts s with s <= ts < s + size, stepping by period
    Iterator.iterate(lastStart)(_ - periodMillis)
      .takeWhile(s => s + sizeMillis > ts)
      .map(s => IntervalWindow(s, s + sizeMillis))
      .toSeq
  }
}

/** Session windows with a fixed gap (reference test ray_runner_test.py:880-890:
  * gap 10 groups [1,2] and [100,101,102]).
  */
final case class Sessions(gapMillis: Long) extends WindowFn {
  require(gapMillis > 0)
  def assign(ts: Long): Seq[BoundedWindow] = Seq(IntervalWindow(ts, ts + gapMillis))
  override def isMerging: Boolean = true
  override def mergeWindows(windows: Seq[BoundedWindow]): Map[BoundedWindow, BoundedWindow] =
    WindowFn.mergeOverlapping(windows)
}

object WindowFn {
  /** Standard overlap-merge used by Sessions and available to custom merging
    * fns: sort by start, union transitively-overlapping interval windows.
    */
  def mergeOverlapping(windows: Seq[BoundedWindow]): Map[BoundedWindow, BoundedWindow] = {
    val intervals = windows.collect { case iw: IntervalWindow => iw }.distinct.sortBy(w => (w.start, w.end))
    val out = Map.newBuilder[BoundedWindow, BoundedWindow]
    var group = List.empty[IntervalWindow]
    var merged: IntervalWindow = null
    def flush(): Unit = if (merged != null) { group.foreach(w => out += (w -> merged)) }
    intervals.foreach { w =>
      if (merged == null || !merged.intersects(w)) { flush(); merged = w; group = List(w) }
      else { merged = merged.span(w); group = w :: group }
    }
    flush()
    windows.collect { case GlobalWindow => GlobalWindow -> GlobalWindow }.foreach(out += _)
    out.result()
  }
}
