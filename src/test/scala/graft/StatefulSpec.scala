package graft

import graft.api.Pipeline
import graft.core._

/** State & timer conformance (reference: ray_runner_test.py:363-602 —
  * value/bag/combining state, event-time timers with overwrite, clears,
  * dynamic tags, per-window state partitioning; timer loop
  * ray_fn_runner.py:385-459).
  */
/** Specs live outside the suite class: closures referencing them must not
  * capture the (non-serializable) ScalaTest suite instance.
  */
object StatefulSpecFixtures {
  val bagSpec: BagStateSpec[Int] = BagStateSpec[Int]("bag")
  val valSpec: ValueStateSpec[Int] = ValueStateSpec[Int]("val")
  val sumSpec: CombiningStateSpec[Int, Int, Int] = CombiningStateSpec[Int, Int, Int]("sum",
    new CombineFn[Int, Int, Int] {
      def createAccumulator(): Int = 0
      def addInput(a: Int, v: Int): Int = a + v
      def mergeAccumulators(a: Int, b: Int): Int = a + b
      def extractOutput(a: Int): Int = a
    })
}

class StatefulSpec extends SparkTestBase {
  import StatefulSpecFixtures._

  test("bag read on an empty cell does not materialize state (store stays cleanable)") {
    val cells = new graft.core.StateCells
    assert(cells.bag(BagStateSpec[Int]("b")).read().isEmpty)
    assert(cells.cells.isEmpty, "read-only access must not create a state entry")
    cells.bag(BagStateSpec[Int]("b")).add(1)
    assert(cells.cells.nonEmpty)
  }

  test("bag state add/read/clear (ray_runner_test.py:508-575)") {
    val p = Pipeline(spark)
    val out = p.create(Seq(("k", 1), ("k", 2), ("k", 3)))
      .withTimestamps(kv => kv._2.toLong)
      .statefulParDo[String, Int, Seq[Int]](new StatefulDoFn[String, Int, Seq[Int]] {
        def process(k: String, v: Int, ctx: StatefulContext[Seq[Int]]): Unit = {
          val bag = ctx.bag(bagSpec)
          bag.add(v)
          if (v == 3) {
            ctx.output(bag.read().toSeq.sorted)
            bag.clear()
            ctx.output(bag.read().toSeq)
          }
        }
      }).collect()
    assertMultiset(out, Seq(Seq(1, 2, 3), Seq.empty))
  }

  test("read-modify-write value state (ray_runner_test.py:364-379)") {
    val p = Pipeline(spark)
    val out = p.create(Seq(("k", 10), ("k", 20)))
      .withTimestamps(kv => kv._2.toLong)
      .statefulParDo[String, Int, Int](new StatefulDoFn[String, Int, Int] {
        def process(k: String, v: Int, ctx: StatefulContext[Int]): Unit = {
          val cell = ctx.value(valSpec)
          val prev = cell.read().getOrElse(0)
          cell.write(prev + v)
          ctx.output(prev + v)
        }
      }).collect()
    assertMultiset(out, Seq(10, 30))
  }

  test("combining state folds (ray_runner_test.py:363-393)") {
    val p = Pipeline(spark)
    val out = p.create(Seq(("k", 1), ("k", 2), ("k", 3)))
      .withTimestamps(kv => kv._2.toLong)
      .statefulParDo[String, Int, Int](new StatefulDoFn[String, Int, Int] {
        def process(k: String, v: Int, ctx: StatefulContext[Int]): Unit = {
          ctx.combining(sumSpec).add(v)
          if (v == 3) ctx.output(ctx.combining(sumSpec).read())
        }
      }).collect()
    assertMultiset(out, Seq(6))
  }

  test("timers fire in timestamp order; callbacks can chain (ray_runner_test.py:428-459)") {
    val p = Pipeline(spark)
    val t = TimerSpec("t")
    val out = p.create(Seq(("k", 0)))
      .statefulParDo[String, Int, Long](new StatefulDoFn[String, Int, Long] {
        def process(k: String, v: Int, ctx: StatefulContext[Long]): Unit = {
          ctx.timer(t).setWithTag("a", 20L)
          ctx.timer(t).setWithTag("b", 200L)
        }
        override def onTimer(k: String, spec: TimerSpec, tag: String, fireTs: Long,
            ctx: StatefulContext[Long]): Unit = {
          ctx.output(fireTs)
          // chain: 20 → 40; 40 fires BEFORE the pending 200
          if (fireTs == 20L) ctx.timer(spec).setWithTag("c", 40L)
        }
      }).collect()
    assert(out == Seq(20L, 40L, 200L) || out.sorted == Seq(20L, 40L, 200L))
  }

  test("setting a timer twice overwrites (ray_fn_runner.py:422-442 dedup)") {
    val p = Pipeline(spark)
    val t = TimerSpec("t")
    val out = p.create(Seq(("k", 0)))
      .statefulParDo[String, Int, Long](new StatefulDoFn[String, Int, Long] {
        def process(k: String, v: Int, ctx: StatefulContext[Long]): Unit = {
          ctx.timer(t).set(100L)
          ctx.timer(t).set(50L)
        }
        override def onTimer(k: String, spec: TimerSpec, tag: String, fireTs: Long,
            ctx: StatefulContext[Long]): Unit = ctx.output(fireTs)
      }).collect()
    assertMultiset(out, Seq(50L))
  }

  test("timer clear cancels (ray_runner_test.py:461-497)") {
    val p = Pipeline(spark)
    val t = TimerSpec("t")
    val out = p.create(Seq(("k", 1), ("k", 2)))
      .withTimestamps(kv => kv._2.toLong)
      .statefulParDo[String, Int, String](new StatefulDoFn[String, Int, String] {
        def process(k: String, v: Int, ctx: StatefulContext[String]): Unit = {
          if (v == 1) ctx.timer(t).set(100L)
          if (v == 2) ctx.timer(t).clear()
        }
        override def onTimer(k: String, spec: TimerSpec, tag: String, fireTs: Long,
            ctx: StatefulContext[String]): Unit = ctx.output("fired")
      }).collect()
    assertMultiset(out, Seq.empty)
  }

  test("dynamic timer tags are independent (ray_runner_test.py:577-602)") {
    val p = Pipeline(spark)
    val t = TimerSpec("t")
    val out = p.create(Seq(("k", 0)))
      .statefulParDo[String, Int, (String, Long)](new StatefulDoFn[String, Int, (String, Long)] {
        def process(k: String, v: Int, ctx: StatefulContext[(String, Long)]): Unit = {
          ctx.timer(t).setWithTag("x", 10L)
          ctx.timer(t).setWithTag("y", 20L)
          ctx.timer(t).clearTag("x")
          ctx.timer(t).setWithTag("z", 5L)
        }
        override def onTimer(k: String, spec: TimerSpec, tag: String, fireTs: Long,
            ctx: StatefulContext[(String, Long)]): Unit = ctx.output((tag, fireTs))
      }).collect()
    assertMultiset(out, Seq(("z", 5L), ("y", 20L)))
  }

  test("state is partitioned per (key, window) (ray_runner_test.py:505-575)") {
    val p = Pipeline(spark)
    val out = p.createTimestamped(Seq((("k", 1), 1L), (("k", 2), 3L), (("k", 10), 15L)))
      .windowInto(FixedWindows(10L))
      .statefulParDo[String, Int, Int](new StatefulDoFn[String, Int, Int] {
        def process(k: String, v: Int, ctx: StatefulContext[Int]): Unit = {
          ctx.combining(sumSpec).add(v)
          ctx.timer(TimerSpec("flush")).set(ctx.window.maxTimestamp)
        }
        override def onTimer(k: String, spec: TimerSpec, tag: String, fireTs: Long,
            ctx: StatefulContext[Int]): Unit = ctx.output(ctx.combining(sumSpec).read())
      }).collect()
    // window [0,10) sums 1+2=3; window [10,20) sums 10
    assertMultiset(out, Seq(3, 10))
  }

  test("buffered flush: bag + size threshold + end-of-window timer (ray_runner_test.py:508-575)") {
    val p = Pipeline(spark)
    val bufSpec = BagStateSpec[String]("buffer")
    val flush = TimerSpec("flush")
    // chars of "abcdefgh" windowed by parity of their char code (the
    // reference's buffered-chars fixture): two windows, buffer size 3
    val elems = "abcdefgh".map(c => (("key", c.toString), c.toInt.toLong))
    val out = p.createTimestamped(elems)
      .windowInto(new WindowFn {
        def assign(ts: Long): Seq[BoundedWindow] = {
          val par = ts % 2
          Seq(IntervalWindow(par * 1000, par * 1000 + 1000))
        }
      })
      .statefulParDo[String, String, String](new StatefulDoFn[String, String, String] {
        def process(k: String, v: String, ctx: StatefulContext[String]): Unit = {
          val bag = ctx.bag(bufSpec)
          bag.add(v)
          ctx.timer(flush).set(ctx.window.maxTimestamp)
          if (bag.read().size >= 3) {
            ctx.output(bag.read().toSeq.sorted.mkString)
            bag.clear()
          }
        }
        override def onTimer(k: String, spec: TimerSpec, tag: String, fireTs: Long,
            ctx: StatefulContext[String]): Unit = {
          val rest = ctx.bag(bufSpec).read().toSeq.sorted
          if (rest.nonEmpty) ctx.output(rest.mkString)
          ctx.bag(bufSpec).clear()
        }
      }).collect()
    // evens window: b,d,f,h → flush "bdf" at size 3, timer flushes "h";
    // odds window: a,c,e,g → "ace" then "g"
    assertMultiset(out, Seq("bdf", "h", "ace", "g"))
  }

  test("elements process in timestamp order within a key") {
    val p = Pipeline(spark)
    val out = p.createTimestamped(Seq((("k", 3), 30L), (("k", 1), 10L), (("k", 2), 20L)))
      .statefulParDo[String, Int, Seq[Int]](new StatefulDoFn[String, Int, Seq[Int]] {
        def process(k: String, v: Int, ctx: StatefulContext[Seq[Int]]): Unit = {
          val bag = ctx.bag(bagSpec)
          bag.add(v)
          if (bag.read().size == 3) ctx.output(bag.read().toSeq)
        }
      }).collect()
    assertMultiset(out, Seq(Seq(1, 2, 3)))
  }
}
