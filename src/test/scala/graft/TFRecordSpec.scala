package graft

import graft.sources.{TFExample, TFRecordIO}
import org.apache.spark.sql.functions._

/** TFRecord container + tf.train.Example proto round-trips (reference sink:
  * examples/tft_iris_example/preprocessing.py:108-118).
  */
class TFRecordSpec extends SparkTestBase {

  test("TFRecord frame/parse round-trip with CRC verification") {
    val payloads = Seq("hello".getBytes, Array.emptyByteArray, Array.fill(1000)(42.toByte))
    val framed = payloads.map(TFRecordIO.frame).reduce(_ ++ _)
    val back = TFRecordIO.readStreamFully(
      new java.io.ByteArrayInputStream(framed)).toSeq
    assert(back.map(_.toSeq) == payloads.map(_.toSeq))
    // corrupt one payload byte -> CRC failure, not silent garbage
    val corrupted = framed.clone()
    corrupted(12 + 2) = (corrupted(14) ^ 0x01).toByte // inside first payload
    val ex = intercept[java.io.IOException] {
      TFRecordIO.readStreamFully(new java.io.ByteArrayInputStream(corrupted)).toSeq
    }
    assert(ex.getMessage.contains("CRC"))
  }

  test("tf.train.Example encode/decode round-trips all feature kinds") {
    val features = Map[String, TFExample.Feature](
      "text" -> TFExample.BytesList(Seq("doc body".getBytes)),
      "embedding" -> TFExample.FloatList(Seq(0.5f, -1.25f, 3.0f)),
      "n_tokens" -> TFExample.Int64List(Seq(7L, 300L, 1234567890123L)))
    val decoded = TFExample.decode(TFExample.encode(features))
    assert(decoded.keySet == features.keySet)
    (decoded("text"), features("text")) match {
      case (TFExample.BytesList(a), TFExample.BytesList(b)) =>
        assert(a.map(_.toSeq) == b.map(_.toSeq))
      case other => fail(s"wrong shape $other")
    }
    assert(decoded("embedding") == features("embedding"))
    assert(decoded("n_tokens") == features("n_tokens"))
  }

  test("documents -> Example -> TFRecord -> read-back pipeline (distributed write)") {
    val s = spark
    import s.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-tfr").toFile.getAbsolutePath
    val docs = Tables.documents(s, "/root/testdata/sf0.001")
      .select(col("doc_id").cast("long"), col("text"), col("n_chars").cast("long"))
      .as[(Long, String, Long)]
    val n = docs.count()
    val payloads = docs.map { case (id, text, nChars) =>
      TFExample.encode(Map(
        "doc_id" -> TFExample.Int64List(Seq(id)),
        "text" -> TFExample.BytesList(Seq(text.getBytes("UTF-8"))),
        "n_chars" -> TFExample.Int64List(Seq(nChars))))
    }
    TFRecordIO.write(payloads, dir)
    // one file per partition
    val files = new java.io.File(dir).listFiles().filter(_.getName.endsWith(".tfrecord"))
    assert(files.nonEmpty)
    val back = TFRecordIO.read(s, dir).collect().toSeq
    assert(back.size.toLong == n)
    // dataflow-layer bridge sees the same records
    assert(graft.api.Pipeline(s).readTFRecords(dir).count() == n)
    val ids = back.map { bytes =>
      TFExample.decode(bytes)("doc_id") match {
        case TFExample.Int64List(Seq(id)) => id
        case other => fail(s"bad doc_id feature: $other")
      }
    }
    assertMultiset(ids, docs.collect().map(_._1).toSeq)
  }
}
