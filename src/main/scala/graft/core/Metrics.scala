package graft.core

import org.apache.spark.SparkContext
import org.apache.spark.util.{AccumulatorV2, LongAccumulator}
import scala.collection.concurrent.TrieMap

/** User metrics: counters, distributions, gauges (reference: metric plumbing
  * ray_fn_runner.py:462-507, tests ray_runner_test.py:985-1019 — counter
  * summed across bundles, distribution tracks sum/count/min/max, gauge keeps
  * the latest value).
  *
  * Spark mapping: Spark `AccumulatorV2`s registered per (namespace, name).
  * Caveat (SURVEY.md §7.4): Spark accumulators are at-least-once under task
  * retry; the reference consolidates per successful bundle
  * (execution.py:528-551). For conformance tests (no retries) the values
  * match exactly.
  */
final case class DistributionResult(sum: Long, count: Long, min: Long, max: Long) {
  def mean: Double = if (count == 0) 0.0 else sum.toDouble / count
}

final class DistributionAccumulator
  extends AccumulatorV2[Long, DistributionResult] {
  private var _sum = 0L; private var _count = 0L
  private var _min = Long.MaxValue; private var _max = Long.MinValue
  def isZero: Boolean = _count == 0
  def copy(): DistributionAccumulator = {
    val c = new DistributionAccumulator
    c._sum = _sum; c._count = _count; c._min = _min; c._max = _max; c
  }
  def reset(): Unit = { _sum = 0; _count = 0; _min = Long.MaxValue; _max = Long.MinValue }
  def add(v: Long): Unit = {
    _sum += v; _count += 1; _min = math.min(_min, v); _max = math.max(_max, v)
  }
  def merge(other: AccumulatorV2[Long, DistributionResult]): Unit = other match {
    case o: DistributionAccumulator =>
      _sum += o._sum; _count += o._count
      _min = math.min(_min, o._min); _max = math.max(_max, o._max)
  }
  def value: DistributionResult = DistributionResult(_sum, _count, _min, _max)
}

/** Gauge: latest value wins. "Latest" is true wall-clock
  * (`System.currentTimeMillis` — NOT `nanoTime`, whose origin is arbitrary
  * per JVM, making cross-executor comparison meaningless), so merging copies
  * from different tasks picks the most recent SET, not the copy with the
  * most set calls. Cross-executor clock skew makes this approximate — same
  * as the reference's latest-wins consolidation.
  */
final class GaugeAccumulator extends AccumulatorV2[Long, Long] {
  private var _v = 0L; private var _at = Long.MinValue
  def isZero: Boolean = _at == Long.MinValue
  def copy(): GaugeAccumulator = { val c = new GaugeAccumulator; c._v = _v; c._at = _at; c }
  def reset(): Unit = { _v = 0; _at = Long.MinValue }
  def add(v: Long): Unit = { _v = v; _at = System.currentTimeMillis() }
  def merge(other: AccumulatorV2[Long, Long]): Unit = other match {
    case o: GaugeAccumulator => if (o._at >= _at) { _v = o._v; _at = o._at }
  }
  def value: Long = _v
}

/** Per-pipeline metric registry; the query surface mirrors the reference's
  * `pipeline_result.metrics().query(...)` (examples/word_count_metrics.py:144-156).
  *
  * Deliberately NOT Serializable: the registry is a driver-side factory
  * holding the SparkContext. Obtain metric HANDLES (counter/distribution/
  * gauge — each a serializable accumulator) on the driver and capture those
  * in DoFn closures; capturing the registry itself fails fast at closure
  * serialization with a clear error instead of a confusing executor-side NPE.
  */
final class MetricsRegistry(sc: SparkContext) {
  private val _counters = TrieMap.empty[(String, String), LongAccumulator]
  private val _dists = TrieMap.empty[(String, String), DistributionAccumulator]
  private val _gauges = TrieMap.empty[(String, String), GaugeAccumulator]

  def counter(ns: String, name: String): LongAccumulator =
    _counters.getOrElseUpdate((ns, name), {
      val a = new LongAccumulator; sc.register(a, s"$ns.$name"); a
    })
  def distribution(ns: String, name: String): DistributionAccumulator =
    _dists.getOrElseUpdate((ns, name), {
      val a = new DistributionAccumulator; sc.register(a, s"$ns.$name"); a
    })
  def gauge(ns: String, name: String): GaugeAccumulator =
    _gauges.getOrElseUpdate((ns, name), {
      val a = new GaugeAccumulator; sc.register(a, s"$ns.$name"); a
    })

  def counterValue(ns: String, name: String): Long = counter(ns, name).value
  def distributionValue(ns: String, name: String): DistributionResult =
    distribution(ns, name).value
  def gaugeValue(ns: String, name: String): Long = gauge(ns, name).value
}
