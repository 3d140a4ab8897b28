package graft

import graft.api.Pipeline
import graft.core._
import graft.operators.ScaleOps
import org.apache.spark.sql.functions._

class ScaleOpsSpec extends SparkTestBase {

  test("writeShards: hive partitions, bounded file sizes, sorted within every file") {
    val s = spark
    import s.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-shards").toString
    val df = Tables.events(s, "/root/testdata/sf0.01")
      .select(col("event_type"), col("event_id"), col("ts_ms"))
    ScaleOps.writeShards(df, dir, Seq("event_type"), Seq("ts_ms"),
      maxRecordsPerFile = 500)
    // hive layout: one directory per event_type
    val partDirs = new java.io.File(dir).listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("event_type="))
    assert(partDirs.length == 5, s"expected 5 partitions, got ${partDirs.map(_.getName).toSeq}")
    // every data file respects the record cap AND is internally sorted
    for (pd <- partDirs; f <- pd.listFiles() if f.getName.endsWith(".parquet")) {
      val rows = s.read.parquet(f.getAbsolutePath).select(col("ts_ms"))
        .collect().map(_.getLong(0))
      assert(rows.length <= 500, s"${f.getName}: ${rows.length} rows exceed cap")
      assert(rows.sameElements(rows.sorted), s"${f.getName} not sorted by ts_ms")
    }
    // nothing lost in the reshaping
    assert(s.read.parquet(dir).count() == df.count())
  }

  test("saltedAggregate equals plain aggregate on a skewed key") {
    val s = spark
    import s.implicits._
    // one hot key (90% of rows) + long tail
    val df = ((1 to 900).map(i => ("hot", i.toDouble)) ++
      (1 to 100).map(i => (s"k$i", i.toDouble))).toDF("k", "v")
    val salted = ScaleOps.saltedAggregate(df, Seq("k"), 8,
        partials = Seq(count(lit(1)).as("n"), sum(col("v")).as("s")),
        merges = Seq(sum(col("n")).as("n"), round(sum(col("s")), 6).as("s")))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSeq
    val plain = df.groupBy("k")
      .agg(count(lit(1)).as("n"), round(sum(col("v")), 6).as("s"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSeq
    assertMultiset(salted, plain)
  }

  test("deterministicStratifiedSample: reproducible, fraction-accurate, stratum-scoped") {
    val s = spark
    import s.implicits._
    val df = (1L to 20000L).map(i => (i, if (i % 3 == 0) "en" else if (i % 3 == 1) "de" else "xx"))
      .toDF("id", "lang")
    def run() = ScaleOps.deterministicStratifiedSample(df, "lang", "id",
        Map("en" -> 0.5, "de" -> 0.1), defaultFraction = 0.0)
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    val a = run(); val b = run()
    assert(a == b, "sampling must be deterministic across runs")
    // zero-fraction stratum fully excluded
    assert(!a.exists(_._2 == "xx"))
    // per-stratum rates within a loose tolerance (hash-gate binomial)
    val en = a.count(_._2 == "en").toDouble / (20000 / 3)
    val de = a.count(_._2 == "de").toDouble / (20000 / 3 + 1)
    assert(math.abs(en - 0.5) < 0.05, s"en rate $en")
    assert(math.abs(de - 0.1) < 0.05, s"de rate $de")
  }

  test("approx_percentile stays within sketch tolerance of the exact answer (d56 vs d40)") {
    val d = "/root/testdata/sf0.001"
    val exact = Queries.d40Percentiles(spark, d).collect()
      .map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    Queries.d56ApproxPercentiles(spark, d).collect().foreach { r =>
      val (p50, p95) = exact(r.getString(0))
      // GK sketch with accuracy 1000 -> rank error <= 1/1000; on this data
      // a generous value-space tolerance of 10% relative
      assert(math.abs(r.getDouble(1) - p50) <= math.abs(p50) * 0.1 + 1e-6,
        s"${r.getString(0)} p50 ${r.getDouble(1)} vs $p50")
      assert(math.abs(r.getDouble(2) - p95) <= math.abs(p95) * 0.1 + 1e-6,
        s"${r.getString(0)} p95 ${r.getDouble(2)} vs $p95")
    }
  }

  test("deterministicWeightedSample: reproducible, monotone in weight, exact at the extremes") {
    val s = spark
    import s.implicits._
    val rows = (1L to 2000L).map(i => (i, (i % 100) + 1)).toDF("id", "w")
    def keep(num: org.apache.spark.sql.Column, den: org.apache.spark.sql.Column) =
      ScaleOps.deterministicWeightedSample(rows, "id", num, den)
        .select("id").collect().map(_.getLong(0)).toSet
    // weight 0 keeps nothing; weight 1 (num == den) keeps everything
    assert(keep(lit(0L), lit(100L)).isEmpty)
    assert(keep(col("w"), col("w")).size == 2000)
    // reproducible: same rows on a re-run (no RNG state)
    val a = keep(col("w"), lit(100L))
    assert(a == keep(col("w"), lit(100L)))
    // monotone: halving every weight can only shrink the kept set, and the
    // smaller set is a SUBSET (same per-id uniform, lower threshold)
    val half = keep(col("w"), lit(200L))
    assert(half.subsetOf(a), "lower weight must keep a subset")
    assert(half.size < a.size)
    // fraction accuracy: E[keep] = mean(w)/100 = 50.5% ± a few points
    assert(math.abs(a.size / 2000.0 - 0.505) < 0.05, s"kept ${a.size}/2000")
  }

  test("bundle finalization runs after task commit, exceptions swallowed (ray_runner_test.py:1021-1081)") {
    val p = Pipeline(spark)
    val fired = p.metrics.counter("fin", "fired-" + System.nanoTime() % 100000)
    val out = p.create(1 to 10).reshuffle(2)
      .parDo(new DoFn[Int, Int] {
        def process(e: Int, ctx: ProcessContext[Int]): Unit = {
          if (e == 1) {
            ctx.registerFinalization(() => fired.add(1L))
            ctx.registerFinalization(() => throw new RuntimeException("swallowed"))
          }
          ctx.output(e)
        }
      }).collect()
    assertMultiset(out, (1 to 10).toSeq)
    // callback ran exactly once (one task registered), and the throwing
    // callback didn't fail the job
    assert(fired.value == 1L)
  }

  test("applyChanges: insert adds, update replaces, delete removes, untouched survive") {
    val s = spark
    import s.implicits._
    val base = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("k", "v")
    val changes = Seq((2L, "B", "U"), (3L, "c", "D"), (4L, "d", "I"))
      .toDF("k", "v", "op")
    assertMultiset(
      ScaleOps.applyChanges(base, changes, Seq("k"), "op")
        .as[(Long, String)].collect().toSeq,
      Seq((1L, "a"), (2L, "B"), (4L, "d")))
  }

  test("applyChanges: seqCol makes a duplicated, out-of-order change log last-wins") {
    val s = spark
    import s.implicits._
    val base = Seq((1L, "a"), (2L, "b")).toDF("k", "v")
    // key 1: update then delete (delete is latest); key 2: two updates out
    // of order (seq 5 must win); key 3: insert then update (update wins)
    val log = Seq(
      (1L, "A", "U", 1L), (1L, "A", "D", 2L),
      (2L, "B2", "U", 5L), (2L, "B1", "U", 3L),
      (3L, "c0", "I", 1L), (3L, "c1", "U", 2L))
      .toDF("k", "v", "op", "seq")
    val got = ScaleOps.applyChanges(base, log, Seq("k"), "op", seqCol = Some("seq"))
      .as[(Long, String)].collect().toSeq
    assertMultiset(got, Seq((2L, "B2"), (3L, "c1")))
    // idempotent under replay: applying the same log to the result of a
    // prefix replay converges to the same snapshot
    val prefix = ScaleOps.applyChanges(base,
      log.filter(col("seq") <= 2), Seq("k"), "op", seqCol = Some("seq"))
    val replayed = ScaleOps.applyChanges(prefix, log, Seq("k"), "op",
      seqCol = Some("seq")).as[(Long, String)].collect().toSeq
    assertMultiset(replayed, Seq((2L, "B2"), (3L, "c1")))
  }
}
