package graft

import graft.operators.Retrieval
import org.apache.spark.sql.functions._

class RetrievalSpec extends SparkTestBase {

  test("postings: one row per occurrence, 0-based positions, case-folded") {
    val s = spark
    import s.implicits._
    val df = Seq((1L, "The cat  sat"), (2L, "cat")).toDF("id", "text")
    val rows = Retrieval.postings(df, "id", "text").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getInt(2))).toSet
    assert(rows == Set(("the", 1L, 0), ("cat", 1L, 1), ("sat", 1L, 2),
      ("cat", 2L, 0)))
  }

  test("phraseSearch: overlapping matches counted, non-matching docs absent") {
    val s = spark
    import s.implicits._
    val df = Seq(
      (1L, "a b a b a"), // "a b a" matches at 0 and 2 (overlap)
      (2L, "a b"), // prefix only
      (3L, "b a b a"), // match at 1
      (4L, "x y z")).toDF("id", "text")
    val out = Retrieval.phraseSearch(df, "id", "text", Seq("a", "b", "a"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out == Map(1L -> 2L, 3L -> 1L))
  }

  test("phraseSearch: repeated-term phrase and case folding") {
    val s = spark
    import s.implicits._
    val df = Seq(
      (1L, "the CAT the hat"),
      (2L, "the cat sat the hat")).toDF("id", "text")
    val out = Retrieval.phraseSearch(df, "id", "text",
      Seq("the", "cat", "the", "hat"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out == Map(1L -> 1L))
  }

  test("phraseSearch: single-token phrase degenerates to term frequency") {
    val s = spark
    import s.implicits._
    val df = Seq((1L, "a b a"), (2L, "b")).toDF("id", "text")
    val out = Retrieval.phraseSearch(df, "id", "text", Seq("a"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out == Map(1L -> 2L))
  }

  test("phraseSearch matches a brute-force sliding window on the real corpus") {
    val s = spark
    import s.implicits._
    val docs = Tables.documents(s, "/root/testdata/sf0.001")
    val phrase = Seq("data", "join", "scan")
    val got = Retrieval.phraseSearch(docs, "doc_id", "text", phrase)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val brute = docs.select(col("doc_id"), lower(col("text")).as("t"))
      .collect().flatMap { r =>
        val toks = r.getString(1).trim.split("\\s+").filter(_.nonEmpty)
        val n = toks.sliding(phrase.length)
          .count(w => w.sameElements(phrase))
        if (n > 0) Some(r.getLong(0) -> n.toLong) else None
      }.toMap
    assert(got == brute)
    // non-vacuity: the probe phrase occurs at sf0.001 (the battery phrase
    // "slow hash batch" only appears from sf0.01 up — probed)
    assert(got.nonEmpty, "probe phrase absent at sf0.001 — check is vacuous")
  }

  test("phraseSearch plan: postings filtered to phrase terms BEFORE the shuffle") {
    val s = spark
    import s.implicits._
    val df = Seq((1L, "a b c d")).toDF("id", "text")
    val out = Retrieval.phraseSearch(df, "id", "text", Seq("a", "b"))
    out.queryExecution.toRdd.foreach(_ => ()) // run so AQE finalizes
    // count only the FINAL plan (AQE's string repeats the tree under
    // "== Initial Plan ==")
    val lines = out.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head.linesIterator.toSeq
    // tree print is parent-first: the phrase-term Filter must print after
    // (= sit below) the DEEPEST exchange — the anchor-grouping shuffle —
    // proving map-side term pruning (after the topmost exchange alone
    // would also pass for a post-shuffle filter, the exact regression
    // this pin exists to catch)
    val lastExchange = lines.lastIndexWhere(_.contains("Exchange hashpartitioning"))
    assert(lastExchange >= 0, lines.mkString("\n"))
    val termFilter = lines.indexWhere(l =>
      l.contains("Filter") && l.contains("term"))
    assert(termFilter > lastExchange,
      "phrase-term filter did not push below the shuffle:\n" + lines.mkString("\n"))
  }
}
