package graft

import graft.api.Pipeline
import graft.core._

/** Metrics conformance (reference: ray_runner_test.py:985-1019 — counter
  * summed to 6 over [1,2,3], distribution over (4,2,1,3) reports
  * sum/count/min/max, gauge keeps a value; query surface
  * ray_fn_runner.py:462-507).
  */
class MetricsSpec extends SparkTestBase {

  test("counter accumulates across elements (ray_runner_test.py:985-996)") {
    val p = Pipeline(spark)
    val c = p.metrics.counter("ns", "counter-" + System.nanoTime())
    p.create(Seq(1, 2, 3)).parDo(new DoFn[Int, Int] {
      def process(e: Int, ctx: ProcessContext[Int]): Unit = { c.add(e.toLong); ctx.output(e) }
    }).collect()
    assert(c.value == 6L)
  }

  test("distribution tracks sum/count/min/max (ray_runner_test.py:998-1009)") {
    val p = Pipeline(spark)
    val d = p.metrics.distribution("ns", "dist-" + System.nanoTime())
    p.create(Seq(4L, 2L, 1L, 3L)).parDo(new DoFn[Long, Long] {
      def process(e: Long, ctx: ProcessContext[Long]): Unit = { d.add(e); ctx.output(e) }
    }).collect()
    val r = d.value
    assert(r == DistributionResult(10L, 4L, 1L, 4L))
    assert(r.mean == 2.5)
  }

  test("gauge keeps a set value (ray_runner_test.py:1011-1019)") {
    val p = Pipeline(spark)
    val g = p.metrics.gauge("ns", "gauge-" + System.nanoTime())
    p.create(Seq(3L)).parDo(new DoFn[Long, Long] {
      def process(e: Long, ctx: ProcessContext[Long]): Unit = { g.add(e); ctx.output(e) }
    }).collect()
    assert(g.value == 3L)
  }

  test("system metrics: element count and sampled byte size per op (ray_runner_test.py:1285-1514)") {
    val p = Pipeline(spark)
    p.create(Seq("a", "bb", "ccc")).parDo(new DoFn[String, String] {
      def process(e: String, ctx: ProcessContext[String]): Unit = ctx.output(e)
    }, name = "sysmetrics").collect()
    assert(p.metrics.counterValue("graft.system", "elements.sysmetrics") == 3L)
    val bytes = p.metrics.distributionValue("graft.system", "sampledByteSize.sysmetrics")
    assert(bytes.count == 3L, s"sampled all 3 (below head threshold): $bytes")
    assert(bytes.min > 0L && bytes.sum >= bytes.count * bytes.min)
  }

  test("per-phase bundle msecs: start/process/finish report separately (ray_runner_test.py:1285-1514)") {
    val p = Pipeline(spark)
    // real work in each phase so every phase's msec sample is nonzero (the
    // phase SPLIT is what's under test, not the magnitudes); the process
    // sleep is 5x the others so the leak check below has scheduler-jitter
    // headroom (sleep guarantees a minimum, not a maximum)
    val fn = new DoFn[Int, Int] {
      override def startBundle(): Unit = Thread.sleep(8)
      def process(e: Int, ctx: ProcessContext[Int]): Unit = {
        Thread.sleep(120); ctx.output(e)
      }
      override def finishBundle(emit: Int => Unit): Unit = Thread.sleep(8)
    }
    p.create(Seq(1, 2, 3)).parDo(fn, name = "phases").collect()
    val start = p.metrics.distributionValue("graft.system", "msecsStart.phases")
    val proc = p.metrics.distributionValue("graft.system", "msecsProcess.phases")
    val finish = p.metrics.distributionValue("graft.system", "msecsFinish.phases")
    // one sample per bundle per phase; bundles with elements slept in
    // process, and EVERY bundle slept in start/finish
    assert(start.count >= 1 && start.sum >= 8, s"start: $start")
    assert(proc.count >= 1 && proc.sum >= 120 * 3 - 3, s"process: $proc")
    assert(finish.count >= 1 && finish.sum >= 8, s"finish: $finish")
    // phases are DISJOINT slices: a process leak into finish would add >=
    // one 120ms element sleep to a finish sample; a 100ms bound on an 8ms
    // sleep leaves a GC pause or scheduler stall an order of magnitude of
    // headroom while still catching any leaked element
    assert(finish.max < 100, s"process leaked into finish: $finish")
  }
}
