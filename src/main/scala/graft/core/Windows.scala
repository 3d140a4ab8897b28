package graft.core

/** Window model mirroring the reference's WindowedValue 4-tuple row model
  * (reference: ray_beam_runner/translator.py:57-70 normalizes every element to
  * `WindowedValue(value, timestamp, windows, pane_info)`).
  *
  * Timestamps are epoch millis (the reference uses Beam micro-second
  * `Timestamp`s; milliseconds are sufficient for the conformance surface and
  * map 1:1 onto Spark's `TimestampType` without ns/us truncation surprises).
  */
@org.apache.spark.sql.types.SQLUserDefinedType(udt = classOf[BoundedWindowUDT])
sealed trait BoundedWindow extends Serializable {
  /** Inclusive max timestamp of data in this window (millis). */
  def maxTimestamp: Long
}

/** The single global window (reference: translator.py:63 assigns
  * `(GlobalWindow(),)` to un-windowed values).
  */
case object GlobalWindow extends BoundedWindow {
  // Beam's GlobalWindow.maxTimestamp = end-of-time minus 1 day; any large
  // sentinel works — it only orders against interval windows.
  val maxTimestamp: Long = Long.MaxValue / 2
}

/** Half-open interval [start, end) in epoch millis (reference:
  * ray_runner_test.py:2028-2047 custom WindowFn emits IntervalWindows).
  */
final case class IntervalWindow(start: Long, end: Long) extends BoundedWindow {
  require(end > start, s"empty window [$start,$end)")
  def maxTimestamp: Long = end - 1
  def intersects(other: IntervalWindow): Boolean =
    start < other.end && other.start < end
  def span(other: IntervalWindow): IntervalWindow =
    IntervalWindow(math.min(start, other.start), math.max(end, other.end))
}

/** Pane metadata. The reference never populates panes (no triggers:
  * ray_fn_runner.py:92-93 rejects TestStream; pane_info defaulted), so this is
  * a fixed stub kept for API parity.
  */
final case class PaneInfo(isFirst: Boolean = true, isLast: Boolean = true, index: Long = 0L)
object PaneInfo { val NoFiring: PaneInfo = PaneInfo() }

/** The engine's element envelope (reference: translator.py:57-70). */
final case class WindowedValue[T](
    value: T,
    timestamp: Long,
    windows: Seq[BoundedWindow],
    pane: PaneInfo = PaneInfo.NoFiring) {
  def withValue[U](u: U): WindowedValue[U] = WindowedValue(u, timestamp, windows, pane)
  /** One copy of the element per assigned window (multi-window elements are
    * exploded before grouping, like Spark's `window()` does for sliding).
    * An element assigned to zero windows vanishes (Beam semantics).
    */
  def explode: Seq[WindowedValue[T]] =
    if (windows.lengthCompare(1) == 0) Seq(this)
    else windows.map(w => WindowedValue(value, timestamp, Seq(w), pane))
}

object WindowedValue {
  /** Bare values enter the pipeline at timestamp 0 in the global window
    * (reference: translator.py:57-63).
    */
  def of[T](v: T): WindowedValue[T] =
    WindowedValue(v, 0L, Seq(GlobalWindow))
  def timestamped[T](v: T, ts: Long): WindowedValue[T] =
    WindowedValue(v, ts, Seq(GlobalWindow))
}
