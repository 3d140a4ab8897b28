package graft

import graft.operators.{Decontaminate, Dedup, ScaleOps}
import graft.functions.TextFunctions
import org.apache.spark.sql.functions._

/** Training-corpus hygiene operators: eval-set decontamination, incremental
  * bloom-prefiltered dedup, sequence packing, rule-based quality gating.
  */
class PipelineHygieneSpec extends SparkTestBase {

  private def df(rows: Seq[(Long, String)]) = {
    val s = spark
    import s.implicits._
    rows.toDF("doc_id", "text")
  }

  test("decontaminate flags verbatim n-gram overlap with the eval set") {
    val evalSet = df(Seq(
      (100L, "alpha beta gamma delta epsilon zeta eta theta iota kappa")))
    val train = df(Seq(
      // contains the eval 8-gram "alpha beta ... theta" verbatim
      (1L, "prefix words alpha beta gamma delta epsilon zeta eta theta suffix"),
      (2L, "totally unrelated content with no overlap whatsoever in any window"),
      // shares tokens but no 8-token window
      (3L, "alpha beta gamma then something else entirely delta epsilon zeta")))
    val flagged = Decontaminate.overlap(train, evalSet, "doc_id", "text",
        n = 8, minShared = 1)
      .select("doc_id").collect().map(_.getLong(0)).toSeq
    assertMultiset(flagged, Seq(1L))

    val survivors = Decontaminate.clean(train, evalSet, "doc_id", "text",
        n = 8, minShared = 1)
      .select("doc_id").collect().map(_.getLong(0)).toSeq
    assertMultiset(survivors, Seq(2L, 3L))
  }

  test("decontaminate short-doc branch: whole doc is the gram") {
    val evalSet = df(Seq((100L, "tiny eval doc")))
    val train = df(Seq((1L, "tiny eval doc"), (2L, "another small doc")))
    val flagged = Decontaminate.overlap(train, evalSet, "doc_id", "text",
        n = 8, minShared = 1)
      .select("doc_id").collect().map(_.getLong(0)).toSeq
    assertMultiset(flagged, Seq(1L))
  }

  test("dedupAgainstCorpus drops content present in the corpus, exactly") {
    val corpus = df(Seq(
      (10L, "the quick brown fox jumps over the lazy dog"),
      (11L, "an entirely different corpus document about spark"),
      (12L, "yet another standing corpus entry with its own words")))
      .withColumn("__key", Dedup.normalizedContentKey(col("text")))
    val newBatch = df(Seq(
      (1L, "the quick brown fox jumps over the lazy dog"), // exact dup
      (2L, "dog lazy the over jumps fox brown quick the"), // word-shuffle dup (same token set)
      (3L, "genuinely new material never seen before anywhere"),
      (4L, "spark about document corpus different entirely an"))) // shuffle of 11
      .withColumn("__key", Dedup.normalizedContentKey(col("text")))
    val out = Dedup.dedupAgainstCorpus(newBatch, corpus, "doc_id", "__key")
      .select("doc_id").collect().map(_.getLong(0)).toSeq
    assertMultiset(out, Seq(3L))
  }

  test("dedupAgainstCorpus verify path: saturated bloom still yields the exact answer") {
    val s = spark
    import s.implicits._
    // expectedItems=1 with 200 corpus keys saturates the filter — nearly
    // every probe is a bloom positive, forcing the broadcast verify join
    val corpus = (0L until 200L).map(i => (i, s"corpus document number $i unique words"))
      .toDF("doc_id", "text").withColumn("__key", Dedup.normalizedContentKey(col("text")))
    val newBatch = (Seq((500L, "corpus document number 7 unique words")) ++
        (501L to 520L).map(i => (i, s"fresh new document $i with novel content")))
      .toDF("doc_id", "text").withColumn("__key", Dedup.normalizedContentKey(col("text")))
    val out = Dedup.dedupAgainstCorpus(newBatch, corpus, "doc_id", "__key",
        expectedCorpusItems = 1, fpp = 0.5)
      .select("doc_id").collect().map(_.getLong(0)).toSeq
    assertMultiset(out, (501L to 520L).toSeq)
  }

  test("bloomMightContain has no false negatives and survives codegen-strict mode") {
    val s = spark
    import s.implicits._
    val prev = s.conf.getOption("spark.sql.codegen.fallback")
    s.conf.set("spark.sql.codegen.fallback", "false")
    try {
      val bloom = org.apache.spark.util.sketch.BloomFilter.create(100, 0.01)
      (0L until 50L).foreach(bloom.putLong)
      val probed = (0L until 100L).toDF("h")
        .select(col("h"),
          graft.plans.NativeExpressions.bloomMightContain(col("h"), bloom).as("maybe"))
        .collect().map(r => (r.getLong(0), r.getBoolean(1)))
      // inserted values MUST hit; non-inserted may rarely false-positive
      assert(probed.filter(_._1 < 50).forall(_._2), "false negative — bloom contract broken")
      assert(probed.count(p => p._1 >= 50 && p._2) <= 5, "implausible false-positive rate")
    } finally {
      prev.fold(s.conf.unset("spark.sql.codegen.fallback"))(
        v => s.conf.set("spark.sql.codegen.fallback", v))
    }
  }

  test("packSequences: contiguous bins, no split docs, deterministic") {
    val s = spark
    import s.implicits._
    // token counts 4,4,4,4 in one stream at budget 10 -> starts 0,4,8,12 -> bins 0,0,0,1
    val rows = Seq(
      ("a", 1L, "w w w w"), ("a", 2L, "x x x x"), ("a", 3L, "y y y y"), ("a", 4L, "z z z z"),
      ("b", 1L, "only one stream b doc"))
      .toDF("source", "doc_id", "text")
    val packed = ScaleOps.packSequences(rows, "source", "doc_id",
        TextFunctions.tokenCount(col("text")).cast("long"), budget = 10)
      .select("source", "doc_id", "bin_id")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    assertMultiset(packed, Seq(
      ("a", 1L, 0L), ("a", 2L, 0L), ("a", 3L, 0L), ("a", 4L, 1L), ("b", 1L, 0L)))
  }

  test("wordShingles on NULL text yields the empty-doc shingle, not NULL") {
    val s = spark
    import s.implicits._
    val rows = Seq((1L, null: String), (2L, null: String), (3L, "real text here"))
      .toDF("doc_id", "text")
      .select(col("doc_id"), TextFunctions.wordShingles(col("text"), 8).as("sh"))
      .collect().map(r => (r.getLong(0), r.getSeq[String](1))).toMap
    // null-text docs must still collapse as duplicates of each other in the
    // dedup paths (shared [""] shingle), not vanish from band explosion
    assert(rows(1L) == Seq(""))
    assert(rows(2L) == Seq(""))
    assert(rows(3L) == Seq("real text here"))
  }

  test("native wordShingles matches the column formulation on edge shapes") {
    val s = spark
    import s.implicits._
    val texts = Seq(
      "", " ", "one", "one two", "a b c d e f g h",      // below/at n boundary
      "a b c d e f g h i j k",                            // above n
      "x x x x x x x x x x x x",                          // all-duplicate grams
      "  padded   whitespace  runs   between   tokens  here  now  ok  fine ")
    val df = texts.toDF("text")
    val rows = df.select(
        TextFunctions.wordShingles(col("text"), 8).as("native"),
        TextFunctions.wordShinglesColumns(col("text"), 8).as("cols"))
      .collect()
    rows.foreach { r =>
      assert(r.getSeq[String](0).sorted == r.getSeq[String](1).sorted,
        s"native=${r.getSeq[String](0)} cols=${r.getSeq[String](1)}")
    }
  }

  test("vectorAvg aggregator: dimension-wise mean across partitions") {
    val s = spark
    import s.implicits._
    val df2 = Seq(
      (0, Seq(1.0, 2.0, 3.0)), (0, Seq(3.0, 2.0, 1.0)),
      (1, Seq(10.0, 0.0, -10.0)))
      .toDF("label", "v").repartition(3) // force partial/merge across partitions
    val out = df2.groupBy(col("label"))
      .agg(graft.functions.VectorFunctions.vectorAvg(col("v")).as("c"))
      .collect().map(r => (r.getInt(0), r.getSeq[Double](1))).toMap
    assert(out(0) == Seq(2.0, 2.0, 2.0))
    assert(out(1) == Seq(10.0, 0.0, -10.0))
  }

  test("vectorAvg fails fast on mismatched vector lengths") {
    val s = spark
    import s.implicits._
    val bad = Seq((0, Seq(1.0, 2.0)), (0, Seq(1.0, 2.0, 3.0))).toDF("label", "v")
    val e = intercept[Exception] {
      bad.groupBy(col("label"))
        .agg(graft.functions.VectorFunctions.vectorAvg(col("v")).as("c")).collect()
    }
    assert(e.getMessage != null)
  }

  test("tokenChunks: stride coverage, clamped tail, no overlap-only windows") {
    val s = spark
    import s.implicits._
    // 10 tokens, chunkSize 4, overlap 1 (stride 3): [0,4) [3,7) [6,10); the
    // start-9 window would add nothing beyond the overlap and is dropped
    val ten = (1 to 10).map(i => s"t$i").mkString(" ")
    val out = Seq((1L, ten), (2L, "a b"), (3L, ""))
      .toDF("doc_id", "text")
      .select(col("doc_id"),
        posexplode(TextFunctions.tokenChunks(col("text"), chunkSize = 4, overlap = 1)))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2))).toSeq
    assertMultiset(out, Seq(
      (1L, 0, "t1 t2 t3 t4"), (1L, 1, "t4 t5 t6 t7"), (1L, 2, "t7 t8 t9 t10"),
      (2L, 0, "a b"), (3L, 0, "")))
    // every token appears in at least one chunk; consecutive chunks share
    // exactly `overlap` tokens when full-width
    val chunks = out.filter(_._1 == 1L).sortBy(_._2).map(_._3.split(" ").toSeq)
    assert(chunks.flatten.distinct.size == 10)
    assert(chunks.sliding(2).forall { case Seq(a, b) => a.takeRight(1) == b.take(1) })
  }

  test("gopher signals: distinct-token ratio catches repetition") {
    val s = spark
    import s.implicits._
    val out = Seq(
      ("looped", "spam spam spam spam spam spam spam spam spam spam"),
      ("prose", "the quick brown fox jumps over a lazy dog today"))
      .toDF("id", "text")
      .select(col("id"), TextFunctions.distinctTokenRatio(col("text")).as("dr"))
      .collect().map(r => (r.getString(0), r.getDouble(1))).toMap
    assert(out("looped") == 0.1)
    assert(out("prose") == 1.0)
  }
}
