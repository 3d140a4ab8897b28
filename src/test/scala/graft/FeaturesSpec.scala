package graft

import graft.operators.Features

/** Hashing-trick vectorizer vs an in-memory md5 model. */
class FeaturesSpec extends SparkTestBase {
  import SparkTestBase.spark.implicits._

  private def md5Hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  private def model(docs: Seq[(Long, String)], p: Int): Map[(Long, String), Long] =
    docs.flatMap { case (id, text) =>
      text.toLowerCase.split("\\s+").filter(_.nonEmpty)
        .map(tok => (id, md5Hex(tok).take(p)))
    }.groupBy(identity).view.mapValues(_.size.toLong).toMap

  test("hashingVectorize matches the in-memory md5 model (tf + collisions)") {
    val docs = Seq(
      (1L, "alpha beta alpha gamma"),
      (2L, "Beta GAMMA beta"),
      (3L, "delta epsilon zeta eta theta iota kappa"),
      (4L, "alpha alpha alpha"))
    for (p <- Seq(1, 3)) {
      val got = Features.hashingVectorize(docs.toDF("doc_id", "text"),
        "doc_id", "text", prefixLen = p)
        .as[(Long, String, Long)].collect()
        .map { case (id, f, tf) => (id, f) -> tf }.toMap
      assert(got == model(docs, p), s"prefixLen=$p")
    }
    // prefixLen = 1 must actually merge distinct tokens into one bucket
    // somewhere (16 buckets over 10 distinct tokens): per-doc bucket count
    // strictly below per-doc distinct-token count for doc 3 would be luck-
    // dependent; assert the global census instead
    val all = model(docs, 1)
    val distinctTokens = docs.flatMap(_._2.toLowerCase.split("\\s+")).distinct.size
    val distinctBuckets = all.keys.map(_._2).toSet.size
    assert(distinctBuckets <= distinctTokens)
  }

  test("hashingVectorize: case folding and tf accumulation") {
    val got = Features.hashingVectorize(
      Seq((1L, "Word word WORD")).toDF("doc_id", "text"),
      "doc_id", "text", prefixLen = 4)
      .as[(Long, String, Long)].collect()
    assert(got.toSeq == Seq((1L, md5Hex("word").take(4), 3L)))
  }

  test("hashingVectorize rejects out-of-range prefix lengths") {
    val df = Seq((1L, "x")).toDF("doc_id", "text")
    intercept[IllegalArgumentException] {
      Features.hashingVectorize(df, "doc_id", "text", prefixLen = 0)
    }
    intercept[IllegalArgumentException] {
      Features.hashingVectorize(df, "doc_id", "text", prefixLen = 9)
    }
  }
}
