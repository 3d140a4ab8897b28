package graft

import graft.api.Pipeline
import graft.core._

/** GBK / Combine conformance (reference: RayGroupByKey translator.py:341-390,
  * combines ray_runner_test.py:857-864, 1113-1185, GBK :821-829).
  */
class GroupCombineSpec extends SparkTestBase {

  private val mean = new CombineFn[Double, (Double, Long), Double] {
    def createAccumulator(): (Double, Long) = (0.0, 0L)
    def addInput(a: (Double, Long), v: Double): (Double, Long) = (a._1 + v, a._2 + 1)
    def mergeAccumulators(a: (Double, Long), b: (Double, Long)): (Double, Long) =
      (a._1 + b._1, a._2 + b._2)
    def extractOutput(a: (Double, Long)): Double = if (a._2 == 0) 0 else a._1 / a._2
  }

  test("groupByKey collects values per key (ray_runner_test.py:821-829)") {
    val p = Pipeline(spark)
    val out = p.create(Seq(("a", 1), ("b", 2), ("a", 3)))
      .groupByKey[String, Int]
      .map { case (k, vs) => (k, vs.toSeq.sorted) }
      .collect()
    assertMultiset(out, Seq(("a", Seq(1, 3)), ("b", Seq(2))))
  }

  test("groupByKey supports tuple keys (translator.py:352-360 KeyWrapper — free in Spark)") {
    val p = Pipeline(spark)
    val out = p.create(Seq(((1, "x"), 10), ((1, "x"), 20), ((2, "y"), 30)))
      .groupByKey[(Int, String), Int]
      .map { case (k, vs) => (k, vs.sum) }
      .collect()
    assertMultiset(out, Seq(((1, "x"), 30), ((2, "y"), 30)))
  }

  test("groupByKey supports unit/None-ish keys (translator.py:346-350 void keys)") {
    val p = Pipeline(spark)
    val out = p.create(Seq(((), 1), ((), 2)))
      .groupByKey[Unit, Int]
      .map { case (_, vs) => vs.sum }
      .collect()
    assertMultiset(out, Seq(3))
  }

  test("combinePerKey mean (MeanCombineFn test ray_runner_test.py:857-864)") {
    val p = Pipeline(spark)
    val out = p.create(Seq(("a", 1.0), ("a", 2.0), ("b", 6.0)))
      .combinePerKey[String, Double, (Double, Long), Double](mean)
      .collect()
    assertMultiset(out, Seq(("a", 1.5), ("b", 6.0)))
  }

  test("combineGlobally (Count.Globally ray_runner_test.py:1113-1115)") {
    val p = Pipeline(spark)
    val count = new CombineFn[Int, Long, Long] {
      def createAccumulator(): Long = 0L
      def addInput(a: Long, v: Int): Long = a + 1
      def mergeAccumulators(a: Long, b: Long): Long = a + b
      def extractOutput(a: Long): Long = a
    }
    assertMultiset(
      p.create(1 to 10).combineGlobally(count).collect(), Seq(10L))
  }

  test("packed min+max combine on same input (ray_runner_test.py:1133-1185)") {
    val p = Pipeline(spark)
    val in = p.create(Seq(5, 1, 9, 3))
    val minFn = new CombineFn[Int, Int, Int] {
      def createAccumulator(): Int = Int.MaxValue
      def addInput(a: Int, v: Int): Int = math.min(a, v)
      def mergeAccumulators(a: Int, b: Int): Int = math.min(a, b)
      def extractOutput(a: Int): Int = a
    }
    val maxFn = new CombineFn[Int, Int, Int] {
      def createAccumulator(): Int = Int.MinValue
      def addInput(a: Int, v: Int): Int = math.max(a, v)
      def mergeAccumulators(a: Int, b: Int): Int = math.max(a, b)
      def extractOutput(a: Int): Int = a
    }
    assertMultiset(in.combineGlobally(minFn).collect(), Seq(1))
    assertMultiset(in.combineGlobally(maxFn).collect(), Seq(9))
  }

  test("coGroupByKey joins two keyed collections (translator.py:446 composite)") {
    val p = Pipeline(spark)
    val left = p.create(Seq(("a", 1), ("a", 2), ("b", 3)))
    val right = p.create(Seq(("a", "x"), ("c", "y")))
    val out = left.coGroupByKey[String, Int, String](right)
      .map { case (k, (is, ss)) => (k, is.toSeq.sorted, ss.toSeq.sorted) }
      .collect()
    assertMultiset(out, Seq(
      ("a", Seq(1, 2), Seq("x")),
      ("b", Seq(3), Seq.empty[String]),
      ("c", Seq.empty[Int], Seq("y"))))
  }

  test("coGroupByKeyTagged: 3-input cogroup, every tag present per key, one pass") {
    val p = Pipeline(spark)
    val a = p.create(Seq(("k1", 1), ("k1", 2), ("k2", 3)))
    val b = p.create(Seq(("k1", 10), ("k3", 30)))
    val c = p.create(Seq(("k2", 100), ("k3", 300), ("k3", 301)))
    val out = a.coGroupByKeyTagged[String, Int]("a", "b" -> b, "c" -> c)
      .map { case (k, m) =>
        (k, m("a").toSeq.sorted, m("b").toSeq.sorted, m("c").toSeq.sorted)
      }
      .collect()
    // every key appears ONCE with all three tags — a key absent from an
    // input yields an empty bag for that tag (Beam CoGBK contract)
    assertMultiset(out, Seq(
      ("k1", Seq(1, 2), Seq(10), Seq.empty[Int]),
      ("k2", Seq(3), Seq.empty[Int], Seq(100)),
      ("k3", Seq.empty[Int], Seq(30), Seq(300, 301))))
  }

  test("coGroupByKeyTagged: duplicate tags and mixed merging windowing rejected") {
    val p = Pipeline(spark)
    val a = p.create(Seq(("k", 1)))
    val b = p.create(Seq(("k", 2)))
    intercept[IllegalArgumentException] {
      a.coGroupByKeyTagged[String, Int]("t", "t" -> b)
    }
    val sessions = p.createTimestamped(Seq((("k", 1), 5L))).windowInto(Sessions(10L))
    intercept[IllegalArgumentException] {
      sessions.coGroupByKeyTagged[String, Int]("s", "g" -> b)
    }
  }

  test("coGroupByKeyTagged with merging sessions merges windows across all inputs") {
    val p = Pipeline(spark)
    val a = p.createTimestamped(Seq((("k", 1), 5L))).windowInto(Sessions(10L))
    val b = p.createTimestamped(Seq((("k", 2), 8L))).windowInto(Sessions(10L))
    val c = p.createTimestamped(Seq((("k", 3), 100L))).windowInto(Sessions(10L))
    val out = a.coGroupByKeyTagged[String, Int]("a", "b" -> b, "c" -> c)
      .map { case (k, m) =>
        (k, m("a").toSeq.sorted, m("b").toSeq.sorted, m("c").toSeq.sorted)
      }
      .collect()
    // ts 5 and 8 share a session (gap 10) across DIFFERENT inputs; ts 100
    // sessions alone — its row still carries all three tags
    assertMultiset(out, Seq(
      ("k", Seq(1), Seq(2), Seq.empty[Int]),
      ("k", Seq.empty[Int], Seq.empty[Int], Seq(3))))
  }

  test("KV composites: keys/values/mapValues/swap/top/sumPerKey") {
    val p = Pipeline(spark)
    val kv = p.create(Seq(("a", 1.0), ("b", 2.0), ("a", 3.0)))
    assertMultiset(kv.keys[String, Double].collect(), Seq("a", "b", "a"))
    assertMultiset(kv.values[String, Double].collect(), Seq(1.0, 2.0, 3.0))
    assertMultiset(kv.mapValues[String, Double, Double](_ * 10).collect(),
      Seq(("a", 10.0), ("b", 20.0), ("a", 30.0)))
    assertMultiset(kv.swap[String, Double].collect(),
      Seq((1.0, "a"), (2.0, "b"), (3.0, "a")))
    assertMultiset(kv.sumPerKey[String].collect(), Seq(("a", 4.0), ("b", 2.0)))
    assertMultiset(p.create(Seq(5, 1, 9, 3, 7)).top(2).collect(), Seq(Seq(9, 7)))
    assertMultiset(p.create(Seq(1, 2)).withKeys(_ % 2).collect(),
      Seq((1, 1), (0, 2)))
  }

  test("coGroupByKey with a merging (session) side merges windows across both inputs") {
    val p = Pipeline(spark)
    // left: fixed-window-free (global assign) ts'd elements; right: sessions
    val left = p.createTimestamped(Seq((("k", 1), 5L)))
      .windowInto(Sessions(10L))
    val right = p.createTimestamped(Seq((("k", "a"), 8L), (("k", "b"), 100L)))
      .windowInto(Sessions(10L))
    val out = left.coGroupByKey[String, Int, String](right)
      .map { case (k, (is, ss)) => (k, is.toSeq.sorted, ss.toSeq.sorted) }
      .collect()
    // ts 5 and 8 merge into one session (gap 10); ts 100 is its own session
    assertMultiset(out, Seq(
      ("k", Seq(1), Seq("a")),
      ("k", Seq.empty[Int], Seq("b"))))
  }

  test("groupIntoBatches bounds batch size per key") {
    val p = Pipeline(spark)
    val out = p.create((1 to 7).map(i => ("k", i)))
      .groupIntoBatches[String, Int](3)
      .collect()
    assert(out.map(_._2.size).sorted == Seq(1, 3, 3))
    assertMultiset(out.flatMap(_._2), (1 to 7).toSeq)
  }

  test("readParquet into the dataflow layer") {
    val p = Pipeline(spark)
    val rows = p.readParquet("/root/testdata/sf0.001/region.parquet")
      .map(_.getString(1)).collect()
    assert(rows.size == 5)
  }

  test("csv / json / orc round-trip through the dataflow layer") {
    val p = Pipeline(spark)
    val base = Tables.region(spark, "/root/testdata/sf0.001")
      .select("r_regionkey", "r_name")
    val dir = java.nio.file.Files.createTempDirectory("graft-fmt").toString
    base.write.mode("overwrite").option("header", "true").csv(s"$dir/csv")
    base.write.mode("overwrite").json(s"$dir/json")
    base.write.mode("overwrite").orc(s"$dir/orc")
    val expected = base.collect().map(_.getString(1)).toSeq
    assertMultiset(p.readCsv(s"$dir/csv").map(_.getString(1)).collect(), expected)
    assertMultiset(p.readJson(s"$dir/json")
      .map(r => r.getString(r.fieldIndex("r_name"))).collect(), expected)
    assertMultiset(p.readOrc(s"$dir/orc").map(_.getString(1)).collect(), expected)
  }

  test("countPerKey composite") {
    val p = Pipeline(spark)
    assertMultiset(
      p.create(Seq(("a", ()), ("a", ()), ("b", ()))).countPerKey[String, Unit].collect(),
      Seq(("a", 2L), ("b", 1L)))
  }
}
