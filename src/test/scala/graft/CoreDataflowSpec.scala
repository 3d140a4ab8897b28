package graft

import graft.api.Pipeline
import graft.core._

/** ParDo family conformance (reference: ray_runner_test.py:102-161 —
  * create/map/flatMap/filter/multi-output; DoFn lifecycle translator.py:157-338).
  */
class CoreDataflowSpec extends SparkTestBase {

  test("create + collect round-trips") {
    val p = Pipeline(spark)
    assertMultiset(p.create(Seq(1, 2, 3)).collect(), Seq(1, 2, 3))
  }

  test("impulse emits a single seed element (translator.py:95-102)") {
    val p = Pipeline(spark)
    assert(Pipeline(spark).impulse().collect().size == 1)
    assert(p.impulse().collect().head.isEmpty)
  }

  test("map / flatMap / filter (ray_runner_test.py:118-141)") {
    val p = Pipeline(spark)
    assertMultiset(p.create(Seq(1, 2, 3)).map(_ * 2).collect(), Seq(2, 4, 6))
    assertMultiset(
      p.create(Seq("a b", "c")).flatMap(_.split(" ")).collect(),
      Seq("a", "b", "c"))
    assertMultiset(p.create(1 to 10).filter(_ % 2 == 0).collect(), Seq(2, 4, 6, 8, 10))
  }

  test("parDo full lifecycle runs per bundle (translator.py:208-281)") {
    val p = Pipeline(spark)
    val out = p.create(Seq(1, 2, 3, 4)).reshuffle(2)
      .parDo(new DoFn[Int, String] {
        private var events: List[String] = Nil
        override def setup(): Unit = { events = "setup" :: events }
        override def startBundle(): Unit = { events = "start" :: events }
        def process(e: Int, ctx: ProcessContext[String]): Unit = ctx.output(s"v$e")
        override def finishBundle(emit: String => Unit): Unit = {
          assert(events.contains("setup") && events.contains("start"))
          emit("bundle-end")
        }
      }).collect()
    // 2 partitions → 2 bundle-end markers, all 4 elements processed
    assertMultiset(out.filter(_.startsWith("v")), Seq("v1", "v2", "v3", "v4"))
    assert(out.count(_ == "bundle-end") == 2)
  }

  test("multi-output tagged ParDo demuxes (ray_runner_test.py:128-161)") {
    val p = Pipeline(spark)
    val odd = Tag[Int]("odd")
    val (evens, tagged) = p.create(1 to 6).parDoTagged(
      new DoFn[Int, Int] {
        def process(e: Int, ctx: ProcessContext[Int]): Unit =
          if (e % 2 == 0) ctx.output(e) else ctx.outputTagged(odd, e)
      }, Seq(odd))
    assertMultiset(evens.collect(), Seq(2, 4, 6))
    assertMultiset(tagged("odd").collect().map(_.asInstanceOf[Int]), Seq(1, 3, 5))
  }

  test("flatten unions incl. duplicates + heterogeneous types (ray_runner_test.py:838-855)") {
    val p = Pipeline(spark)
    val a = p.create(Seq(1, 2))
    assertMultiset(a.union(a, a).collect(), Seq(1, 1, 1, 2, 2, 2))
    val strs: api.PCollection[Any] = p.create(Seq[Any]("x"))
    val ints: api.PCollection[Any] = p.create(Seq[Any](7))
    assertMultiset(strs.union(ints).collect(), Seq[Any]("x", 7))
  }

  test("heterogeneous flatten flows through GBK (ray_runner_test.py:838-850)") {
    val p = Pipeline(spark)
    val strs: api.PCollection[(String, Any)] = p.create(Seq(("k", "s": Any)))
    val ints: api.PCollection[(String, Any)] = p.create(Seq(("k", 7: Any)))
    val out = strs.union(ints).groupByKey[String, Any]
      .map { case (k, vs) => (k, vs.map(_.toString).toSeq.sorted) }
      .collect()
    assertMultiset(out, Seq(("k", Seq("7", "s"))))
  }

  test("empty PCollection flows through every operator without error") {
    val p = Pipeline(spark)
    val empty = p.create(Seq.empty[(String, Int)])
    assert(empty.groupByKey[String, Int].collect().isEmpty)
    assert(empty.countPerKey[String, Int].collect().isEmpty)
    assert(empty.distinct().collect().isEmpty)
    assert(empty.coGroupByKey[String, Int, Int](p.create(Seq.empty[(String, Int)]))
      .collect().isEmpty)
    assert(empty.statefulParDo[String, Int, Int](new StatefulDoFn[String, Int, Int] {
      def process(k: String, v: Int, ctx: StatefulContext[Int]): Unit = ctx.output(v)
    }).collect().isEmpty)
  }

  test("reshuffle preserves elements (ray_runner_test.py:832-836)") {
    val p = Pipeline(spark)
    assertMultiset(p.create(1 to 100).reshuffle(7).collect(), (1 to 100).toSeq)
  }

  test("distinct (engine extension)") {
    val p = Pipeline(spark)
    assertMultiset(p.create(Seq(1, 1, 2, 3, 3, 3)).distinct().collect(), Seq(1, 2, 3))
  }

  test("intersect / except (engine extensions, SQL set semantics)") {
    val p = Pipeline(spark)
    val a = p.create(Seq(1, 1, 2, 3, 4))
    val b = p.create(Seq(2, 2, 3, 5))
    assertMultiset(a.intersect(b).collect(), Seq(2, 3))
    assertMultiset(a.except(b).collect(), Seq(1, 4))
    assertMultiset(b.except(a).collect(), Seq(5))
    // empty sides
    val e = p.create(Seq.empty[Int])
    assert(a.intersect(e).collect().isEmpty)
    assertMultiset(a.except(e).collect(), Seq(1, 2, 3, 4))
  }

  test("intersect respects windows (per-window set semantics)") {
    val p = Pipeline(spark)
    // 7 appears in both inputs but in DIFFERENT fixed windows -> no match;
    // 1 appears in the same window on both sides -> kept once
    val a = p.createTimestamped(Seq((1, 5L), (7, 5L))).windowInto(FixedWindows(10L))
    val b = p.createTimestamped(Seq((1, 7L), (7, 15L))).windowInto(FixedWindows(10L))
    assertMultiset(a.intersect(b).collect(), Seq(1))
  }

  test("error propagation surfaces user exception (ray_runner_test.py:951-973)") {
    val p = Pipeline(spark)
    val ex = intercept[Exception] {
      p.create(Seq(1)).map[Int](_ => throw new IllegalStateException("user boom")).collect()
    }
    def chain(t: Throwable): List[Throwable] =
      if (t == null) Nil else t :: chain(t.getCause)
    assert(chain(ex).exists(_.getMessage != null) &&
      chain(ex).exists(t => Option(t.getMessage).exists(_.contains("user boom"))))
  }

  test("readText + skip_header_lines + writeText round-trip (translator.py:122-144)") {
    val dir = java.nio.file.Files.createTempDirectory("graft-text").toFile
    val f = new java.io.File(dir, "in.txt")
    java.nio.file.Files.writeString(f.toPath, "header\nline1\nline2\n")
    val p = Pipeline(spark)
    assertMultiset(p.readText(f.getPath).collect(), Seq("header", "line1", "line2"))
    assertMultiset(p.readText(f.getPath, skipHeaderLines = 1).collect(), Seq("line1", "line2"))
    val outDir = new java.io.File(dir, "out").getPath
    p.readText(f.getPath, skipHeaderLines = 1).map(_.toUpperCase).writeText(outDir)
    assertMultiset(p.readText(outDir + "/*.txt").collect(), Seq("LINE1", "LINE2"))
  }

  test("system element counters per ParDo (ray_runner_test.py:1285-1514 analog)") {
    val p = Pipeline(spark)
    val nm = "probe-elems"
    p.create(Seq(1, 2)).parDo(new DoFn[Int, Int] {
      def process(e: Int, ctx: ProcessContext[Int]): Unit = ctx.output(e)
    }, name = nm).collect()
    assert(p.metrics.counterValue("graft.system", s"elements.$nm") == 2L)
  }

  test("viaDataset: hop into Catalyst mid-pipeline and back") {
    val s = spark
    import s.implicits._
    val p = Pipeline(spark)
    val out = p.create(Seq(1, 2, 3, 4))
      .viaDataset(ds => ds.filter(_ % 2 == 0).map(_ * 10))
      .map(_ + 1)
      .collect()
    assertMultiset(out, Seq(21, 41))
  }

  test("composite transform returning existing PCollection (ray_runner_test.py:975-983)") {
    val p = Pipeline(spark)
    def doubled(in: api.PCollection[Int]): api.PCollection[Int] = in.map(_ * 2)
    val base = p.create(Seq(1, 2))
    assertMultiset(doubled(base).union(base).collect(), Seq(1, 2, 2, 4))
  }
}
