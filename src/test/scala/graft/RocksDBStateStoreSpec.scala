package graft

import graft.core._
import graft.streaming.StreamingOps
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** The StreamingSpec stateful paths again, under the RocksDB state store
  * provider — the spill-capable backend a 100 TB stream actually runs on
  * (the default HDFSBackedStateStoreProvider keeps every key in executor
  * heap; RocksDB is the out-of-core option). What the default provider
  * cannot prove and this spec does: `StreamState`'s kryo-serialized state
  * rows survive the RocksDB byte-store round-trip (encode → native store →
  * decode, not just an in-heap map reference), and TTL timeout callbacks
  * evict rows from the native store.
  */
class RocksDBStateStoreSpec extends SparkTestBase {
  import StreamingSpecFixtures._

  // isolated SQLConf (shared SparkContext): the provider is read from the
  // session conf at query start, so only these queries use RocksDB
  private lazy val rocks: SparkSession = {
    val s = spark.newSession()
    s.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    s
  }

  test("stateful ParDo state + timers round-trip through the RocksDB store") {
    val s = rocks
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val mem = MemoryStream[(String, Double, Long)]
    val input = mem.toDS()
      .select(col("_1"), col("_2"), timestamp_millis(col("_3")).as("et"))
      .withWatermark("et", "0 seconds")
      .as[(String, Double, java.sql.Timestamp)]
    val fn = new StatefulDoFn[String, Double, (String, Double, Long)] {
      def process(k: String, v: Double, ctx: StatefulContext[(String, Double, Long)]): Unit = {
        ctx.combining(sumSpec).add(v)
        ctx.timer(flushSpec).set(ctx.timestamp + 5000)
      }
      override def onTimer(k: String, spec: TimerSpec, tag: String, fireTs: Long,
          ctx: StatefulContext[(String, Double, Long)]): Unit = {
        val (sum, n) = ctx.combining(sumSpec).read()
        ctx.output((k, sum, n))
      }
    }
    val out = StreamingOps.statefulParDo(input, fn)
    val q = out.toDF("k", "sum", "n").writeStream.format("memory")
      .queryName("rocks_stateful_" + System.nanoTime()).outputMode("append").start()
    try {
      // the accumulating state for key a crosses TWO micro-batch commits
      // before the timer flushes it — each commit is a full RocksDB
      // write/reload of the kryo-encoded accumulator
      mem.addData(("a", 1.0, 1000L))
      q.processAllAvailable()
      mem.addData(("a", 2.0, 2000L))
      q.processAllAvailable()
      mem.addData(("b", 9.0, 60000L))
      q.processAllAvailable()
      mem.addData(("c", 1.0, 120000L))
      q.processAllAvailable()
      val rows = s.sql(s"SELECT k, sum, n FROM ${q.name}")
        .collect().map(r => (r.getString(0), r.getDouble(1), r.getLong(2))).toSeq
      assert(rows.contains(("a", 3.0, 2L)), s"missing a-flush in $rows")
      assert(rows.contains(("b", 9.0, 1L)), s"missing b-flush in $rows")
      // provider sanity: the running query really is on RocksDB
      assert(s.conf.get("spark.sql.streaming.stateStore.providerClass")
        .contains("RocksDBStateStoreProvider"))
    } finally q.stop()
  }

  test("near-dup LSH state TTL-evicts from the RocksDB store") {
    val s = rocks
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val mem = MemoryStream[(Long, String, Long)]
    val text1 = "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu"
    val text2 = "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda nu"
    val stream = mem.toDS()
      .select(col("_1").as("doc_id"), col("_2").as("text"),
        timestamp_millis(col("_3")).as("et"))
    val pairs = StreamingOps.nearDupCandidatesStream(
      stream, "doc_id", "text", "et", "0 seconds",
      shingleSize = 2, numHashes = 64, bands = 16, threshold = 0.3,
      stateTtlMs = 1000L)
    val q = pairs.writeStream.format("memory")
      .queryName("rocks_ttl_" + System.nanoTime()).outputMode("append").start()
    try {
      // fresh state pairs (proves positives work on this backend) ...
      mem.addData((1L, text1, 1000L))
      q.processAllAvailable()
      mem.addData((2L, text2, 2000L))
      q.processAllAvailable()
      val early = s.sql(s"SELECT DISTINCT id1, id2 FROM ${q.name}")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(early.contains((1L, 2L)), s"fresh near-dup not paired on RocksDB: $early")
      // ... then the watermark runs past the TTL and the bucket state is
      // evicted from the native store: a third near-dup finds nothing old
      mem.addData((50L, "totally different words entirely unrelated content here", 100000L))
      q.processAllAvailable()
      mem.addData((51L, "still nothing in common with anything else at all", 200000L))
      q.processAllAvailable()
      mem.addData((3L, text1, 201000L))
      q.processAllAvailable()
      val got = s.sql(s"SELECT DISTINCT id1, id2 FROM ${q.name}")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(!got.contains((1L, 3L)) && !got.contains((2L, 3L)),
        s"expired member still paired on RocksDB: $got")
    } finally q.stop()
  }

  test("checkpoint RESUME reloads dedup state from the RocksDB store") {
    // d146's two-run topology under RocksDB: run 2 must RECOVER run 1's
    // dropDuplicatesWithinWatermark state from the checkpoint's RocksDB
    // files (not an in-heap map) to suppress the straddling keys — the
    // restart-recovery path the TTL/timer tests above never exercise
    val s = rocks
    val got = graft.streaming.StreamingBattery
      .d146StreamResume(s, "/root/testdata/sf0.001")
    val want = Tables.events(s, "/root/testdata/sf0.001")
      .select(col("user_id"), col("event_type"),
        expr("ts_ms div 3600000").as("hr"))
      .distinct()
      .groupBy(col("event_type"))
      .agg(expr("CAST(COUNT(*) AS BIGINT)").as("n_keys"),
        expr("CAST(COUNT(DISTINCT user_id) AS BIGINT)").as("n_users"))
    assertMultiset(
      got.collect().map(_.toSeq).toSeq, want.collect().map(_.toSeq).toSeq)
  }

  test("ewmaStream's kryo ring buffer survives the RocksDB byte store across batches") {
    val s = rocks
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val mem = MemoryStream[(Long, Long, Long, Long)]
    val out = StreamingOps.ewmaStream(mem.toDS(), depth = 4)
    val sink = "rocks_ewma_" + System.nanoTime()
    val q = out.writeStream.format("memory").queryName(sink)
      .outputMode("append").start()
    try {
      mem.addData((1L, 1L, 1L, 100L), (1L, 2L, 1L, 200L))
      q.processAllAvailable()
      // the ring (200, 100) must come back from the NATIVE store, not a
      // heap reference — a kryo decode failure or lost update here is
      // exactly what the default provider cannot catch
      mem.addData((1L, 3L, 1L, 400L))
      q.processAllAvailable()
      val got = s.table(sink)
        .as[(Long, Long, Long, Long, Double)].collect()
        .map(r => r._2 -> r._5).toMap
      assert(got(3L) == (8 * 400 + 4 * 200 + 2 * 100) / 14.0)
    } finally q.stop()
  }

  test("scd2Stream's open run survives the RocksDB byte store across batches") {
    val s = rocks
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val mem = MemoryStream[(Long, Long, Long, String, Int)]
    val out = StreamingOps.scd2Stream(mem.toDS())
    val sink = "rocks_scd2_" + System.nanoTime()
    val q = out.writeStream.format("memory").queryName(sink)
      .outputMode("append").start()
    try {
      mem.addData((1L, 10L, 1L, "A", 0), (1L, 20L, 2L, "A", 0))
      q.processAllAvailable()
      // the open run (A, 10, 2) must decode back from the native store
      // and EXTEND — then close with the full three-row span
      mem.addData((1L, 30L, 3L, "A", 0), (1L, 40L, 4L, "B", 0),
        (1L, Long.MaxValue, 9L, "", 1))
      q.processAllAvailable()
      val got = s.table(sink)
        .as[(Long, String, Long, Option[Long], Long)].collect().toSet
      assert(got == Set(
        (1L, "A", 10L, Some(40L), 3L),
        (1L, "B", 40L, None, 1L)))
    } finally q.stop()
  }

  test("sprtStream's absorbed decision survives the RocksDB store across batches") {
    val s = rocks
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val mem = MemoryStream[(Long, Long, Long, Long, Int)]
    val out = StreamingOps.sprtStream(mem.toDS(), hi = 5L, lo = -5L)
    val sink = "rocks_sprt_" + System.nanoTime()
    val q = out.writeStream.format("memory").queryName(sink)
      .outputMode("append").start()
    try {
      // walk to +4 (open) — the (cum, n, decided) tuple must round-trip
      // the native store, then cross in batch 2
      mem.addData((1L, 10L, 1L, 4L, 0))
      q.processAllAvailable()
      mem.addData((1L, 20L, 2L, 3L, 0))
      q.processAllAvailable()
      // batch 3: the ABSORBED flag itself must have survived the store —
      // a lost flag would re-decide on this re-crossing row
      mem.addData((1L, 30L, 3L, 5L, 0), (1L, Long.MaxValue, 4L, 0L, 1))
      q.processAllAvailable()
      val got = s.table(sink)
        .as[(Long, String, Long, Long)].collect().toSeq
      assert(got == Seq((1L, "accept", 2L, 7L)), s"got $got")
    } finally q.stop()
  }

  test("curationFunnelStream's seen flag survives the RocksDB store across batches") {
    val s = rocks
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val mem = MemoryStream[(String, Long, String, Boolean, Boolean)]
    val out = StreamingOps.curationFunnelStream(mem.toDS())
    val sink = "rocks_cur_" + System.nanoTime()
    val q = out.writeStream.format("memory").queryName(sink)
      .outputMode("append").start()
    try {
      mem.addData(("k", 1L, "s1", true, true))
      q.processAllAvailable()
      // the duplicate arrives a batch later: a seen flag lost in the
      // store round-trip would double-count the dedup survivor
      mem.addData(("k", 2L, "s2", true, true))
      q.processAllAvailable()
      val got = s.table(sink).as[(String, String)].collect()
        .groupBy(identity).view.mapValues(_.length).toMap
      assert(got == Map(("s1", "input") -> 1, ("s1", "dedup") -> 1,
        ("s1", "quality") -> 1, ("s1", "clean") -> 1,
        ("s2", "input") -> 1), s"got $got")
    } finally q.stop()
  }
}
