package graft

import graft.api.Pipeline
import graft.core._

/** Windowing conformance (reference: WindowInto translator.py:393-416, fixed
  * windows ray_runner_test.py:220-251, sessions :880-890, custom merging
  * WindowFn :892-908 + :2028-2047).
  */
class WindowingSpec extends SparkTestBase {

  test("fixed windows partition a GBK by window (ray_runner_test.py:220-251)") {
    val p = Pipeline(spark)
    val out = p.createTimestamped(Seq(("k", 1), ("k", 2), ("k", 3)).zip(Seq(1L, 5L, 12L)).map {
        case ((k, v), ts) => ((k, v), ts)
      })
      .windowInto(FixedWindows(10L))
      .groupByKey[String, Int]
      .map { case (k, vs) => (k, vs.toSeq.sorted) }
      .collect()
    assertMultiset(out, Seq(("k", Seq(1, 2)), ("k", Seq(3))))
  }

  test("sessions merge with gap (ray_runner_test.py:880-890: gap 10 → [1,2] and [100,101,102])") {
    val p = Pipeline(spark)
    val out = p.createTimestamped(Seq(1L, 2L, 100L, 101L, 102L).map(ts => (("k", ts.toInt), ts)))
      .windowInto(Sessions(10L))
      .groupByKey[String, Int]
      .map { case (k, vs) => (k, vs.toSeq.sorted) }
      .collect()
    assertMultiset(out, Seq(("k", Seq(1, 2)), ("k", Seq(100, 101, 102))))
  }

  test("session window bounds are [minTs, lastTs+gap)") {
    val p = Pipeline(spark)
    val out = p.createTimestamped(Seq((("k", 1), 5L), (("k", 2), 9L)))
      .windowInto(Sessions(10L))
      .groupByKey[String, Int]
      .mapWindowed { wv =>
        val w = wv.windows.head.asInstanceOf[IntervalWindow]
        (w.start, w.end)
      }
      .collect()
    assertMultiset(out, Seq((5L, 19L)))
  }

  test("sliding windows multi-assign (translator.py:64-66)") {
    val p = Pipeline(spark)
    // size 10, period 5: ts=7 lands in [0,10) and [5,15)
    val out = p.createTimestamped(Seq((("k", 7), 7L)))
      .windowInto(SlidingWindows(10L, 5L))
      .groupByKey[String, Int]
      .mapWindowed(wv => wv.windows.head.asInstanceOf[IntervalWindow].start)
      .collect()
    assertMultiset(out, Seq(0L, 5L))
  }

  test("custom merging WindowFn (ray_runner_test.py:2028-2047 analog)") {
    // merge everything into one window per key (the reference's custom fn
    // merges all windows into a single session-like span)
    val mergeAll = new WindowFn {
      def assign(ts: Long): Seq[BoundedWindow] = Seq(IntervalWindow(ts, ts + 1))
      override def isMerging: Boolean = true
      override def mergeWindows(ws: Seq[BoundedWindow]): Map[BoundedWindow, BoundedWindow] = {
        val iws = ws.collect { case w: IntervalWindow => w }
        val span = iws.reduce(_ span _)
        iws.map(w => (w: BoundedWindow) -> (span: BoundedWindow)).toMap
      }
    }
    val p = Pipeline(spark)
    val out = p.createTimestamped(Seq((("k", 1), 1L), (("k", 2), 50L), (("k", 3), 99L)))
      .windowInto(mergeAll)
      .groupByKey[String, Int]
      .mapWindowed { wv =>
        val w = wv.windows.head.asInstanceOf[IntervalWindow]
        (w.start, w.end, wv.value._2.toSeq.sorted)
      }
      .collect()
    assertMultiset(out, Seq((1L, 100L, Seq(1, 2, 3))))
  }

  test("GBK output timestamp is window max (Beam end-of-window combiner)") {
    val p = Pipeline(spark)
    val out = p.createTimestamped(Seq((("k", 1), 3L)))
      .windowInto(FixedWindows(10L))
      .groupByKey[String, Int]
      .collectWindowed()
    assert(out.head.timestamp == 9L)
  }

  test("withTimestamps + global window GBK groups everything (translator.py:57-63)") {
    val p = Pipeline(spark)
    val out = p.create(Seq(("k", 1), ("k", 2)))
      .withTimestamps(_ => 123L)
      .groupByKey[String, Int]
      .map { case (k, vs) => (k, vs.toSeq.sorted) }
      .collect()
    assertMultiset(out, Seq(("k", Seq(1, 2))))
  }
}
