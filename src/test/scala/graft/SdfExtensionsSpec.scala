package graft

import graft.api.{OffsetRange, Pipeline, RestrictionTracker, Sdf, SplittableDoFn}

/** SDF-analog expansion (ray_runner_test.py:604-655: strings expanded
  * char-by-char through restriction claims) + SQL function registration via
  * SparkSessionExtensions.
  */
class SdfExtensionsSpec extends SparkTestBase {

  test("splittableParDo expands strings char-by-char via claim loop") {
    val p = Pipeline(spark)
    val fn = new SplittableDoFn[String, Char] {
      def initialRestriction(e: String): OffsetRange = OffsetRange(0, e.length.toLong)
      // split into 2-char sub-ranges to exercise initial splitting
      override def split(e: String, r: OffsetRange): Seq[OffsetRange] =
        (r.start until r.end by 2).map(s => OffsetRange(s, math.min(s + 2, r.end)))
      def process(e: String, tracker: RestrictionTracker, out: Char => Unit): Unit = {
        var i = tracker.restriction.start
        while (tracker.tryClaim(i)) { out(e(i.toInt)); i += 1 }
      }
    }
    val out = Sdf.splittableParDo(p.create(Seq("abc", "defghijklmno", "pqrstuv", "wxyz")), fn)
      .collect()
    assertMultiset(out, "abcdefghijklmnopqrstuvwxyz".toSeq)
  }

  test("tracker rejects claims past the range end") {
    val t = new RestrictionTracker(OffsetRange(0, 3))
    assert(t.tryClaim(0) && t.tryClaim(1) && t.tryClaim(2))
    assert(!t.tryClaim(3))
  }

  test("DSv2 growing-range source: incremental micro-batch progress + checkpoint resume") {
    val s = spark
    val dir = java.nio.file.Files.createTempDirectory("graft-range").toFile
    val control = new java.io.File(dir, "control.txt").getAbsolutePath
    val ckpt = new java.io.File(dir, "ckpt").getAbsolutePath
    def publish(v: String): Unit =
      java.nio.file.Files.write(java.nio.file.Paths.get(control), v.getBytes)
    def startQuery(qn: String) =
      s.readStream.format("graft.sources.GrowingRangeSource")
        .option("controlPath", control).option("numPartitions", 3)
        .option("maxRowsPerBatch", 4L)
        .load()
        .writeStream.format("memory").queryName(qn)
        .option("checkpointLocation", ckpt).outputMode("append").start()
    def rows(qn: String): Seq[Long] =
      s.sql(s"SELECT value FROM $qn").collect().map(_.getLong(0)).toSeq

    publish("5")
    val qn = "range_" + System.nanoTime()
    val q = startQuery(qn)
    q.processAllAvailable()
    assertMultiset(rows(qn), (0L until 5L).toSeq)
    // the restriction GROWS; only the residual is claimed (defer_remainder)
    publish("12")
    q.processAllAvailable()
    assertMultiset(rows(qn), (0L until 12L).toSeq)
    // admission control truncated each claim to <= 4 rows per micro-batch
    val batches = q.recentProgress.filter(_.numInputRows > 0)
    assert(batches.nonEmpty && batches.forall(_.numInputRows <= 4),
      s"batch sizes: ${batches.map(_.numInputRows).mkString(",")}")
    q.stop()
    // restart from the SAME checkpoint: resumes at the committed offset —
    // the re-queued residual — with no duplicates (execution.py:211-241).
    // (memory sink cannot recover a checkpoint; collect via foreachBatch)
    publish("15")
    val resumed = new java.util.concurrent.ConcurrentLinkedQueue[Long]()
    val q2 = s.readStream.format("graft.sources.GrowingRangeSource")
      .option("controlPath", control).option("numPartitions", 3)
      .load()
      .writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        batch.collect().foreach(r => resumed.add(r.getLong(0)))
      }
      .option("checkpointLocation", ckpt).outputMode("append").start()
    q2.processAllAvailable()
    // resumed stream must emit ONLY the residual 12..14
    assertMultiset(resumed.toArray(Array.empty[java.lang.Long]).toSeq.map(_.toLong),
      Seq(12L, 13L, 14L))
    // truncate-on-drain: freeze the range at 15; the stream quiesces with
    // no new rows, and the published data stays readable afterwards
    publish("drain 15")
    q2.processAllAvailable()
    assertMultiset(resumed.toArray(Array.empty[java.lang.Long]).toSeq.map(_.toLong),
      Seq(12L, 13L, 14L))
    q2.stop()
    val afterDrain = s.read.format("graft.sources.GrowingRangeSource")
      .option("controlPath", control).load()
    assert(afterDrain.count() == 15L, "drained source must keep published data readable")
  }

  test("DSv2 growing-range source: batch read covers the published range") {
    val dir = java.nio.file.Files.createTempDirectory("graft-range-b").toFile
    val control = new java.io.File(dir, "control.txt").getAbsolutePath
    java.nio.file.Files.write(java.nio.file.Paths.get(control), "7".getBytes)
    val df = spark.read.format("graft.sources.GrowingRangeSource")
      .option("controlPath", control).load()
    assertMultiset(df.collect().map(_.getLong(0)).toSeq, (0L until 7L).toSeq)
  }

  test("SQL functions registered via GraftExtensions") {
    val r1 = spark.sql("SELECT graft_simhash64(array('the','quick','fox')) AS h").first()
    assert(r1.getLong(0) != 0L)
    val r2 = spark.sql(
      "SELECT graft_cosine(array(1.0D, 0.0D), array(1.0D, 0.0D)) AS c").first()
    assert(r2.getDouble(0) == 1.0)
    val r3 = spark.sql(
      "SELECT graft_minhash(array('a','b','c'), 16) AS sig").first()
    assert(r3.getSeq[Long](0).size == 16)
    val r4 = spark.sql(
      "SELECT graft_lang_id(array('the','cat','is','here')) AS lang").first()
    assert(r4.getString(0) == "en")
    val r5 = spark.sql(
      "SELECT graft_band_buckets(graft_minhash(array('a','b'), 16), 4, 4) AS bb").first()
    assert(r5.getSeq[Long](0).size == 4)
    val r6 = spark.sql(
      "SELECT graft_word_ngrams(array('a','b','c','d'), 3) AS g").first()
    assert(r6.getSeq[String](0) == Seq("a b c", "b c d"))
    val r7 = spark.sql(
      "SELECT graft_token_chunks(array('a','b','c','d','e'), 3, 2) AS c").first()
    assert(r7.getSeq[String](0) == Seq("a b c", "c d e"))
    val r8 = spark.sql(
      "SELECT graft_repetition_stats(array('a','b','a','b','a')) AS r").first()
    val rep = r8.getStruct(0)
    assert((rep.getInt(0), rep.getInt(1), rep.getInt(2)) == ((5, 2, 2)))
    val r9 = spark.sql(
      "SELECT graft_mask_spans(array('a','b','c','d','e'), array(1L), 3) AS k").first()
    assert(r9.getSeq[String](0) == Seq("a", "e"))
    val r10 = spark.sql("SELECT graft_char_entropy('aabb') AS e").first()
    assert(math.abs(r10.getDouble(0) - math.log(2.0)) < 1e-12)
    val r11 = spark.sql(
      "SELECT graft_jaro_winkler('martha', 'marhta') AS j").first()
    assert(r11.getDouble(0) == 0.9611111111111111) // the DuckDB-exact value
  }

  test("SQL functions reject wrong-typed arguments at analysis time") {
    // int arrays must be an analysis error, not an unsafe-buffer misread
    intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql("SELECT graft_cosine(array(1, 2), array(3, 4))").collect()
    }
    intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql("SELECT graft_simhash64(array(1, 2))").collect()
    }
    // signature too short for the banding scheme: clear runtime error
    val ex = intercept[Exception] {
      spark.sql("SELECT graft_band_buckets(graft_minhash(array('a'), 8), 4, 4)").collect()
    }
    def chain(t: Throwable): List[Throwable] = if (t == null) Nil else t :: chain(t.getCause)
    assert(chain(ex).exists(t => Option(t.getMessage).exists(_.contains("slots"))))
  }
}
