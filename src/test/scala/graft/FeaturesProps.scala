package graft

import graft.operators.Features
import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

/** The BPE batching law: a trainer that applies [[Features.selectSafeBatch]]
  * prefixes per round produces EXACTLY the merge table of the
  * one-merge-per-round greedy trainer — for any corpus, any batch cap, and
  * any pair-table truncation (topM), including truncations small enough
  * that the floor bound binds. Runs the production selection code against
  * a pure sequential reference over a pure corpus simulator, so the law
  * exercises the real rule (shared body with bpeTrain) thousands of times
  * per second where a per-sample Spark job could afford dozens.
  *
  * Alphabet is deliberately tiny (a/b/c/d) and words short: that maximizes
  * pair interaction — shared symbols, ties, self-pairs (aa), chained
  * occurrences (abab) — which is exactly where an unsound batch rule
  * diverges from the sequential trainer.
  */
object FeaturesProps extends Properties("FeaturesBpe") {

  private def mergeSeq(syms: Vector[String], a: String,
                       b: String): Vector[String] = {
    val acc = Vector.newBuilder[String]
    var i = 0
    while (i < syms.length) {
      if (i + 1 < syms.length && syms(i) == a && syms(i + 1) == b) {
        acc += (a + b); i += 2
      } else { acc += syms(i); i += 1 }
    }
    acc.result()
  }

  private def pairStats(words: Map[Vector[String], Long])
      : Seq[(String, String, Long)] = {
    val stats = scala.collection.mutable.Map.empty[(String, String), Long]
      .withDefaultValue(0L)
    for ((syms, c) <- words; w <- syms.sliding(2) if w.length == 2)
      stats((w(0), w(1))) += c
    stats.toSeq.map { case ((a, b), c) => (a, b, c) }
      .sortBy { case (a, b, c) => (-c, a, b) }
  }

  /** One-merge-per-round greedy reference (the semantics bpeTrain pins). */
  private def sequential(words0: Map[Vector[String], Long],
                         n: Int): Seq[(String, String, Long)] = {
    var words = words0
    val out = Seq.newBuilder[(String, String, Long)]
    var step = 0
    var done = false
    while (step < n && !done) {
      val stats = pairStats(words)
      if (stats.isEmpty) done = true
      else {
        val (a, b, c) = stats.head
        out += ((a, b, c))
        words = words.toSeq.map { case (syms, cc) =>
          mergeSeq(syms, a, b) -> cc
        }.groupMapReduce(_._1)(_._2)(_ + _)
        step += 1
      }
    }
    out.result()
  }

  /** Batched trainer over the same simulator, using the PRODUCTION
    * selection rule with a truncated pair table (the bpeTrain round
    * structure minus Spark).
    */
  private def batched(words0: Map[Vector[String], Long], n: Int,
                      maxBatch: Int, topM: Int): Seq[(String, String, Long)] = {
    var words = words0
    val out = Seq.newBuilder[(String, String, Long)]
    var got = 0
    var done = false
    while (got < n && !done) {
      val full = pairStats(words)
      if (full.isEmpty) done = true
      else {
        val pairs = full.take(topM)
        val floor = if (pairs.size >= topM) pairs.last._3 else 0L
        val batch = Features.selectSafeBatch(pairs, floor,
          math.min(maxBatch, n - got))
        for ((a, b, c) <- batch) {
          out += ((a, b, c))
          words = words.toSeq.map { case (syms, cc) =>
            mergeSeq(syms, a, b) -> cc
          }.groupMapReduce(_._1)(_._2)(_ + _)
        }
        got += batch.size
      }
    }
    out.result()
  }

  private val wordGen: Gen[String] =
    Gen.chooseNum(1, 8).flatMap(n =>
      Gen.listOfN(n, Gen.oneOf("a", "b", "c", "d")).map(_.mkString))
  private val corpusGen: Gen[Map[Vector[String], Long]] =
    Gen.chooseNum(1, 12).flatMap(n => Gen.listOfN(n,
        Gen.zip(wordGen, Gen.chooseNum(1L, 9L))))
      .map(_.map { case (w, c) => w.map(_.toString).toVector -> c }
        .groupMapReduce(_._1)(_._2)(_ + _))

  property("batched merge table == one-merge-per-round, any cap/topM") =
    forAll(corpusGen, Gen.chooseNum(1, 20), Gen.chooseNum(1, 64),
           Gen.chooseNum(2, 50)) { (corpus, nMerges, maxBatch, topM) =>
      batched(corpus, nMerges, maxBatch, topM) ==
        sequential(corpus, nMerges)
    }

  property("batch prefixes are symbol-disjoint and count-dominant") =
    forAll(corpusGen, Gen.chooseNum(2, 50)) { (corpus, topM) =>
      val full = pairStats(corpus)
      val pairs = full.take(topM)
      val floor = if (pairs.size >= topM) pairs.last._3 else 0L
      val batch = Features.selectSafeBatch(pairs, floor, Int.MaxValue)
      val isPrefixOfOrder = batch == pairs.take(batch.size)
      // pairwise symbol-disjoint across pairs (a self-pair (a,a) is fine)
      val disjoint = {
        val sets = batch.map { case (a, b, _) => Set(a, b) }
        sets.combinations(2).forall(ss => (ss(0) & ss(1)).isEmpty)
      }
      (full.isEmpty || (batch.nonEmpty && isPrefixOfOrder && disjoint))
    }
}
