package graft

import graft.api.Pipeline
import graft.core._

/** Side-input conformance (reference: ray_runner_test.py:163-361 —
  * AsList cross-product, AsDict/AsMultiMap, side inputs from Flatten and
  * from GBK, windowed side inputs).
  */
class SideInputSpec extends SparkTestBase {

  test("AsList side input: cross product (ray_runner_test.py:163-183)") {
    val p = Pipeline(spark)
    val side = p.create(Seq("x", "y")).asList
    val out = p.create(Seq(1, 2)).parDo(new DoFn[Int, (Int, String)] {
      def process(e: Int, ctx: ProcessContext[(Int, String)]): Unit =
        ctx.sideInput(side).foreach(s => ctx.output((e, s)))
    }).collect()
    assertMultiset(out, Seq((1, "x"), (1, "y"), (2, "x"), (2, "y")))
  }

  test("AsDict side input (ray_runner_test.py:285-318)") {
    val p = Pipeline(spark)
    val dict = p.create(Seq((1, "one"), (2, "two"))).asDict[Int, String]
    val out = p.create(Seq(1, 2, 3)).parDo(new DoFn[Int, String] {
      def process(e: Int, ctx: ProcessContext[String]): Unit =
        ctx.output(ctx.sideInput(dict).getOrElse(e, "?"))
    }).collect()
    assertMultiset(out, Seq("one", "two", "?"))
  }

  test("AsMultimap side input (execution.py:493-525)") {
    val p = Pipeline(spark)
    val mm = p.create(Seq((1, "a"), (1, "b"), (2, "c"))).asMultimap[Int, String]
    val out = p.create(Seq(1, 2)).parDo(new DoFn[Int, (Int, Int)] {
      def process(e: Int, ctx: ProcessContext[(Int, Int)]): Unit =
        ctx.output((e, ctx.sideInput(mm).getOrElse(e, Seq.empty).size))
    }).collect()
    assertMultiset(out, Seq((1, 2), (2, 1)))
  }

  test("AsIterable side input + empty side input yields empty view") {
    val p = Pipeline(spark)
    val it = p.create(Seq(1, 2, 3)).asIterable
    val emptySide = p.create(Seq.empty[Int]).asList
    val out = p.create(Seq(0)).parDo(new DoFn[Int, (Int, Int)] {
      def process(e: Int, ctx: ProcessContext[(Int, Int)]): Unit =
        ctx.output((ctx.sideInput(it).sum, ctx.sideInput(emptySide).size))
    }).collect()
    assertMultiset(out, Seq((6, 0)))
  }

  test("AsSingleton side input") {
    val p = Pipeline(spark)
    val one = p.create(Seq(42)).asSingleton
    val out = p.create(Seq(1, 2)).parDo(new DoFn[Int, Int] {
      def process(e: Int, ctx: ProcessContext[Int]): Unit =
        ctx.output(e + ctx.sideInput(one))
    }).collect()
    assertMultiset(out, Seq(43, 44))
  }

  test("side input from a Flatten (ray_runner_test.py:253-274)") {
    val p = Pipeline(spark)
    val side = p.create(Seq(1)).union(p.create(Seq(2))).asList
    val out = p.create(Seq(0)).parDo(new DoFn[Int, Int] {
      def process(e: Int, ctx: ProcessContext[Int]): Unit =
        ctx.output(ctx.sideInput(side).sum)
    }).collect()
    assertMultiset(out, Seq(3))
  }

  test("side input from a GBK result (ray_runner_test.py:276-283)") {
    val p = Pipeline(spark)
    val grouped = p.create(Seq(("a", 1), ("a", 2)))
      .groupByKey[String, Int].map { case (k, vs) => (k, vs.sum) }
    val side = grouped.asDict[String, Int]
    val out = p.create(Seq("a")).parDo(new DoFn[String, Int] {
      def process(e: String, ctx: ProcessContext[Int]): Unit =
        ctx.output(ctx.sideInput(side)(e))
    }).collect()
    assertMultiset(out, Seq(3))
  }

  test("windowed side input maps main window → side window (ray_runner_test.py:220-251)") {
    val p = Pipeline(spark)
    // side values in fixed 10ms windows: [0,10) → 1; [10,20) → 2
    val side = p.createTimestamped(Seq((1, 5L), (2, 15L)))
      .windowInto(FixedWindows(10L))
      .asList
    val out = p.createTimestamped(Seq(("m1", 3L), ("m2", 13L)))
      .windowInto(FixedWindows(10L))
      .parDo(new DoFn[String, (String, Seq[Int])] {
        def process(e: String, ctx: ProcessContext[(String, Seq[Int])]): Unit =
          ctx.output((e, ctx.sideInput(side)))
      }).collect()
    assertMultiset(out, Seq(("m1", Seq(1)), ("m2", Seq(2))))
  }
}
