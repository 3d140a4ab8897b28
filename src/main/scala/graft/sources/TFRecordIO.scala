package graft.sources

import java.io.{BufferedInputStream, BufferedOutputStream, DataInputStream, EOFException}
import java.nio.{ByteBuffer, ByteOrder}
import java.util.zip.CRC32C
import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{Dataset, Encoders, SparkSession}

/** Pure-JVM TFRecord container I/O (reference exercises a TFRecord sink in
  * its TFT example, `examples/tft_iris_example/preprocessing.py:108-118`).
  *
  * Wire format (public TensorFlow spec): per record
  * `uint64 length (LE) | uint32 masked_crc32c(length) | payload |
  * uint32 masked_crc32c(payload)`; masked crc = `rotr15(crc) + 0xa282ead8`.
  *
  * Scale shape: the writer runs inside `foreachPartition` against the Hadoop
  * FileSystem API — one `part-NNNNN.tfrecord` per partition, no driver
  * funnel, works on HDFS/S3A the same as local; the reader streams records
  * per file (files are the split unit — TFRecord has no sync markers, so
  * intra-file splits are not possible in the format itself; write many
  * moderate files for parallelism, which partition-per-file does).
  */
object TFRecordIO {

  private val MaskDelta = 0xa282ead8L

  private def maskedCrc(bytes: Array[Byte]): Int = {
    val c = new CRC32C
    c.update(bytes)
    val crc = c.getValue
    val rot = ((crc >>> 15) | (crc << 17)) & 0xffffffffL
    ((rot + MaskDelta) & 0xffffffffL).toInt
  }

  /** Frame one record. */
  def frame(payload: Array[Byte]): Array[Byte] = {
    val lenBuf = ByteBuffer.allocate(8).order(ByteOrder.LITTLE_ENDIAN)
      .putLong(payload.length.toLong).array()
    val out = ByteBuffer.allocate(8 + 4 + payload.length + 4)
      .order(ByteOrder.LITTLE_ENDIAN)
    out.put(lenBuf).putInt(maskedCrc(lenBuf)).put(payload).putInt(maskedCrc(payload))
    out.array()
  }

  /** Write a dataset of payloads as one TFRecord file per partition.
    * Overwrite semantics: stale `part-*.tfrecord` files from a previous run
    * into the same dir are deleted first — otherwise a re-run with fewer
    * partitions would leave old part files that `read()`'s glob silently
    * mixes back into the dataset.
    */
  def write(ds: Dataset[Array[Byte]], dir: String): Unit = {
    val conf = new org.apache.spark.util.SerializableConfiguration(
      ds.sparkSession.sparkContext.hadoopConfiguration)
    val dirPath = dir
    val outDir = new Path(dir)
    val fs = outDir.getFileSystem(conf.value)
    if (fs.exists(outDir))
      fs.globStatus(new Path(outDir, "part-*.tfrecord"))
        .foreach(st => fs.delete(st.getPath, false))
    ds.foreachPartition { (it: Iterator[Array[Byte]]) =>
      val pid = org.apache.spark.TaskContext.getPartitionId()
      val path = new Path(dirPath, f"part-$pid%05d.tfrecord")
      val fs = path.getFileSystem(conf.value)
      val os = new BufferedOutputStream(fs.create(path, true), 1 << 16)
      try it.foreach(payload => os.write(frame(payload)))
      finally os.close()
    }
  }

  /** Parse all records of one stream; throws on CRC mismatch or truncation. */
  def readStreamFully(in: java.io.InputStream): Iterator[Array[Byte]] = {
    val din = new DataInputStream(new BufferedInputStream(in, 1 << 16))
    new Iterator[Array[Byte]] {
      private var nextRec: Array[Byte] = null
      private var done = false
      private def advance(): Unit = if (!done && nextRec == null) {
        val lenBytes = new Array[Byte](8)
        val first = din.read()
        if (first < 0) { done = true; return }
        lenBytes(0) = first.toByte
        din.readFully(lenBytes, 1, 7)
        val lenCrc = readIntLE(din)
        if (lenCrc != maskedCrc(lenBytes))
          throw new java.io.IOException("TFRecord length CRC mismatch")
        val len = ByteBuffer.wrap(lenBytes).order(ByteOrder.LITTLE_ENDIAN).getLong
        if (len < 0 || len > Int.MaxValue)
          throw new java.io.IOException(s"TFRecord length out of range: $len")
        val payload = new Array[Byte](len.toInt)
        din.readFully(payload)
        val dataCrc = readIntLE(din)
        if (dataCrc != maskedCrc(payload))
          throw new java.io.IOException("TFRecord payload CRC mismatch")
        nextRec = payload
      }
      private def readIntLE(d: DataInputStream): Int = {
        val b = new Array[Byte](4)
        try d.readFully(b)
        catch { case e: EOFException => throw new java.io.IOException("truncated TFRecord", e) }
        ByteBuffer.wrap(b).order(ByteOrder.LITTLE_ENDIAN).getInt
      }
      def hasNext: Boolean = { advance(); nextRec != null }
      def next(): Array[Byte] = {
        advance()
        if (nextRec == null) throw new NoSuchElementException
        val r = nextRec; nextRec = null; r
      }
    }
  }

  /** Read a TFRecord directory back as payload bytes — file per task. */
  def read(spark: SparkSession, dir: String): Dataset[Array[Byte]] = {
    val rdd = spark.sparkContext
      .binaryFiles(s"$dir/part-*.tfrecord")
      .flatMap { case (_, pds) =>
        val in = pds.open()
        // close at task end even if the iterator is not fully drained —
        // leaked handles accumulate across thousands of part files
        Option(org.apache.spark.TaskContext.get()).foreach(_.addTaskCompletionListener(
          new org.apache.spark.util.TaskCompletionListener {
            override def onTaskCompletion(c: org.apache.spark.TaskContext): Unit =
              try in.close() catch { case _: Exception => () }
          }))
        readStreamFully(in)
      }
    spark.createDataset(rdd)(Encoders.BINARY)
  }
}

/** Minimal hand-rolled `tf.train.Example` protobuf encoder/decoder (public
  * TensorFlow schema): `Example{ features: Features{ feature:
  * map<string, Feature> } }`, `Feature` = oneof bytes_list / float_list /
  * int64_list. Covers the feature types a training pipeline writes; wire
  * format is plain proto2 (tag varints + length-delimited messages), no
  * protobuf dependency.
  */
object TFExample {

  sealed trait Feature
  final case class BytesList(values: Seq[Array[Byte]]) extends Feature
  final case class FloatList(values: Seq[Float]) extends Feature
  final case class Int64List(values: Seq[Long]) extends Feature

  // --- varint / field helpers ---
  private def writeVarint(out: java.io.ByteArrayOutputStream, v0: Long): Unit = {
    var v = v0
    while ((v & ~0x7fL) != 0) { out.write(((v & 0x7f) | 0x80).toInt); v >>>= 7 }
    out.write(v.toInt)
  }
  private def keyOf(field: Int, wire: Int): Long = (field.toLong << 3) | wire
  private def writeLenDelim(out: java.io.ByteArrayOutputStream, field: Int,
      payload: Array[Byte]): Unit = {
    writeVarint(out, keyOf(field, 2))
    writeVarint(out, payload.length.toLong)
    out.write(payload)
  }

  private def encodeFeature(f: Feature): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    f match {
      case BytesList(vs) => // Feature.bytes_list = 1; BytesList.value = 1
        val bl = new java.io.ByteArrayOutputStream()
        vs.foreach(b => writeLenDelim(bl, 1, b))
        writeLenDelim(out, 1, bl.toByteArray)
      case FloatList(vs) => // Feature.float_list = 2; FloatList.value = 1 packed
        val fl = new java.io.ByteArrayOutputStream()
        val packed = ByteBuffer.allocate(4 * vs.size).order(ByteOrder.LITTLE_ENDIAN)
        vs.foreach(packed.putFloat)
        writeLenDelim(fl, 1, packed.array())
        writeLenDelim(out, 2, fl.toByteArray)
      case Int64List(vs) => // Feature.int64_list = 3; Int64List.value = 1 packed
        val il = new java.io.ByteArrayOutputStream()
        val packed = new java.io.ByteArrayOutputStream()
        vs.foreach(writeVarint(packed, _))
        writeLenDelim(il, 1, packed.toByteArray)
        writeLenDelim(out, 3, il.toByteArray)
    }
    out.toByteArray
  }

  /** Encode a feature map as a serialized `tf.train.Example`. */
  def encode(features: Map[String, Feature]): Array[Byte] = {
    // Features.feature = 1 (map<string, Feature>): repeated entry
    // { key = 1 (string), value = 2 (Feature) }
    val featuresMsg = new java.io.ByteArrayOutputStream()
    features.toSeq.sortBy(_._1).foreach { case (name, f) =>
      val entry = new java.io.ByteArrayOutputStream()
      writeLenDelim(entry, 1, name.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      writeLenDelim(entry, 2, encodeFeature(f))
      writeLenDelim(featuresMsg, 1, entry.toByteArray)
    }
    // Example.features = 1
    val example = new java.io.ByteArrayOutputStream()
    writeLenDelim(example, 1, featuresMsg.toByteArray)
    example.toByteArray
  }

  // --- decoding: a tolerant proto walker ---
  // Valid tf.train.Example payloads from OTHER producers may carry unknown
  // fields, non-packed repeated scalars, or value lists split across several
  // length-delimited chunks (proto merge semantics concatenate repeated
  // fields). The walker dispatches on (field number, wire type), skips what
  // it does not know, accepts both packed and unpacked scalar encodings, and
  // concatenates repeated chunks. Malformed input (truncated varint,
  // out-of-range length) raises a clean IOException — never an
  // ArrayIndexOutOfBounds from a task.
  private def malformed(msg: String): Nothing = throw new java.io.IOException(
    s"malformed tf.train.Example: $msg")

  private final class Reader(bytes: Array[Byte], var pos: Int, val end: Int) {
    def readVarint(): Long = {
      var shift = 0; var v = 0L
      var more = true
      while (more) {
        if (pos >= end) malformed("truncated varint")
        if (shift > 63) malformed("varint over 10 bytes")
        val b = bytes(pos); pos += 1
        v |= (b & 0x7fL) << shift; shift += 7; more = (b & 0x80) != 0
      }
      v
    }
    def readLen(): Int = {
      val n = readVarint()
      if (n < 0 || pos + n > end) malformed(s"length $n exceeds remaining ${end - pos}")
      n.toInt
    }
    def readBytes(n: Int): Array[Byte] = {
      if (n < 0 || pos + n > end) malformed(s"length $n exceeds remaining ${end - pos}")
      val r = java.util.Arrays.copyOfRange(bytes, pos, pos + n); pos += n; r
    }
    /** Skip one value of the given wire type (unknown-field tolerance). */
    def skip(wire: Int): Unit = wire match {
      case 0 => readVarint(); ()
      case 1 => if (pos + 8 > end) malformed("truncated fixed64"); pos += 8
      case 2 => val n = readLen(); pos += n
      case 5 => if (pos + 4 > end) malformed("truncated fixed32"); pos += 4
      case w => malformed(s"unsupported wire type $w") // 3/4 (groups) deprecated
    }
    def hasMore: Boolean = pos < end
  }

  /** Walk a submessage's fields, dispatching each (field, wire) pair. */
  private def walkFields(body: Array[Byte])(f: (Int, Int, Reader) => Boolean): Unit = {
    val r = new Reader(body, 0, body.length)
    while (r.hasMore) {
      val key = r.readVarint()
      val field = (key >>> 3).toInt
      val wire = (key & 7).toInt
      if (!f(field, wire, r)) r.skip(wire)
    }
  }

  private def decodeFeature(bytes: Array[Byte]): Feature = {
    // Feature is a oneof; proto merge semantics say a later member of a
    // DIFFERENT kind clears the earlier one, while repeated chunks of the
    // SAME kind concatenate.
    val bl = scala.collection.mutable.ArrayBuffer.empty[Array[Byte]]
    val fl = scala.collection.mutable.ArrayBuffer.empty[Float]
    val il = scala.collection.mutable.ArrayBuffer.empty[Long]
    var kind = 0
    def switchTo(k: Int): Unit =
      if (kind != k) { bl.clear(); fl.clear(); il.clear(); kind = k }
    walkFields(bytes) {
      case (1, 2, r) => // bytes_list
        switchTo(1)
        walkFields(r.readBytes(r.readLen())) {
          case (1, 2, br) => bl += br.readBytes(br.readLen()); true
          case _ => false
        }
        true
      case (2, 2, r) => // float_list: packed chunk(s) or unpacked fixed32
        switchTo(2)
        walkFields(r.readBytes(r.readLen())) {
          case (1, 2, br) =>
            val packed = br.readBytes(br.readLen())
            if (packed.length % 4 != 0) malformed("packed float chunk not 4-aligned")
            val bb = ByteBuffer.wrap(packed).order(ByteOrder.LITTLE_ENDIAN)
            var i = 0
            while (i < packed.length / 4) { fl += bb.getFloat; i += 1 }
            true
          case (1, 5, br) =>
            fl += ByteBuffer.wrap(br.readBytes(4)).order(ByteOrder.LITTLE_ENDIAN).getFloat
            true
          case _ => false
        }
        true
      case (3, 2, r) => // int64_list: packed chunk(s) or unpacked varints
        switchTo(3)
        walkFields(r.readBytes(r.readLen())) {
          case (1, 2, br) =>
            val chunk = br.readBytes(br.readLen())
            val pr = new Reader(chunk, 0, chunk.length)
            while (pr.hasMore) il += pr.readVarint()
            true
          case (1, 0, br) => il += br.readVarint(); true
          case _ => false
        }
        true
      case _ => false
    }
    kind match {
      case 1 => BytesList(bl.toSeq)
      case 2 => FloatList(fl.toSeq)
      case 3 => Int64List(il.toSeq)
      case _ => BytesList(Nil) // empty/unknown-only Feature
    }
  }

  /** Decode a serialized `tf.train.Example` back to its feature map.
    * Tolerant of unknown fields and producer variations (see walker note);
    * repeated map entries for the same key keep the last value (proto map
    * merge semantics). Raises IOException on malformed bytes.
    */
  def decode(bytes: Array[Byte]): Map[String, Feature] = {
    val out = scala.collection.mutable.LinkedHashMap.empty[String, Feature]
    walkFields(bytes) {
      case (1, 2, r) => // Example.features
        walkFields(r.readBytes(r.readLen())) {
          case (1, 2, fr) => // Features.feature map entry
            var name: String = null
            var feat: Feature = null
            walkFields(fr.readBytes(fr.readLen())) {
              case (1, 2, er) =>
                name = new String(er.readBytes(er.readLen()),
                  java.nio.charset.StandardCharsets.UTF_8)
                true
              case (2, 2, er) => feat = decodeFeature(er.readBytes(er.readLen())); true
              case _ => false
            }
            if (name != null) out += (name -> (if (feat != null) feat else BytesList(Nil)))
            true
          case _ => false
        }
        true
      case _ => false
    }
    out.toMap
  }
}
