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

  // --- proto helpers for forging what OTHER producers legally emit ---
  private def varint(v0: Long): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    var v = v0
    while ((v & ~0x7fL) != 0) { out.write(((v & 0x7f) | 0x80).toInt); v >>>= 7 }
    out.write(v.toInt)
    out.toByteArray
  }
  private def lenDelim(field: Int, body: Array[Byte]): Array[Byte] =
    varint((field.toLong << 3) | 2) ++ varint(body.length.toLong) ++ body
  private def fixed32(field: Int, f: Float): Array[Byte] =
    varint((field.toLong << 3) | 5) ++ java.nio.ByteBuffer.allocate(4)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN).putFloat(f).array()
  private def varintField(field: Int, v: Long): Array[Byte] =
    varint(field.toLong << 3) ++ varint(v)

  test("decode tolerates foreign producers: unknown fields, unpacked scalars, split chunks") {
    // FloatList written UNPACKED (legal proto2 repeated fixed32), plus an
    // unknown field the decoder must skip
    val floatFeature = lenDelim(2, // Feature.float_list
      fixed32(1, 1.5f) ++ fixed32(1, -2.5f) ++ varintField(9, 7L))
    // Int64List split across a packed chunk and an unpacked varint, then the
    // whole int64_list repeated as a second chunk (proto merge concatenates)
    val int64Feature =
      lenDelim(3, lenDelim(1, varint(1L) ++ varint(2L)) ++ varintField(1, 3L)) ++
        lenDelim(3, lenDelim(1, varint(4L)))
    // BytesList with an unknown sibling field inside the Feature
    val bytesFeature = varintField(8, 99L) ++
      lenDelim(1, lenDelim(1, "abc".getBytes))
    def entry(name: String, feat: Array[Byte]): Array[Byte] =
      lenDelim(1, lenDelim(1, name.getBytes) ++ lenDelim(2, feat))
    val example =
      varintField(5, 42L) ++ // unknown Example field
        lenDelim(1, entry("f", floatFeature) ++ entry("i", int64Feature) ++
          entry("b", bytesFeature))
    val decoded = TFExample.decode(example)
    assert(decoded("f") == TFExample.FloatList(Seq(1.5f, -2.5f)))
    assert(decoded("i") == TFExample.Int64List(Seq(1L, 2L, 3L, 4L)))
    decoded("b") match {
      case TFExample.BytesList(vs) => assert(vs.map(_.toSeq) == Seq("abc".getBytes.toSeq))
      case other => fail(s"wrong shape $other")
    }
  }

  test("write cleans stale part files from a previous run with more partitions") {
    val s = spark
    import s.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-tfr-ow").toFile.getAbsolutePath
    TFRecordIO.write(s.range(100).map(i => s"old-$i".getBytes).repartition(8), dir)
    assert(new java.io.File(dir).listFiles().count(_.getName.endsWith(".tfrecord")) == 8)
    TFRecordIO.write(s.range(3).map(i => s"new-$i".getBytes).repartition(1), dir)
    // stale part-00001..7 must be gone; read() sees only the new records
    assert(new java.io.File(dir).listFiles().count(_.getName.endsWith(".tfrecord")) == 1)
    val back = TFRecordIO.read(s, dir).collect().map(new String(_)).toSeq.sorted
    assert(back == Seq("new-0", "new-1", "new-2"))
  }
}
