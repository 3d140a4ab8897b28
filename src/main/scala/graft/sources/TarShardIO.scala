package graft.sources

import org.apache.commons.compress.archivers.tar.{TarArchiveEntry, TarArchiveInputStream, TarArchiveOutputStream}
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import java.io.{BufferedInputStream, BufferedOutputStream}

/** WebDataset-style tar shard sink/source — the interchange format the
  * image/text training stack standardized on (a dataset is a directory of
  * POSIX tar files; each sample is one or more adjacently-stored entries
  * sharing a key, e.g. `000123.jpg` + `000123.txt`). The reference hands
  * training data off through TFRecord/Avro (covered by [[TFRecordIO]] /
  * [[AvroIO]]); tar shards are the third leg every multimodal pipeline
  * eventually needs, and plain `tar` on any machine can inspect them.
  *
  * Scale shape: one hash exchange on the sample key to place each sample
  * in exactly one shard (a sample split across shards would break
  * sequential-read training), a partition-local sort so a key's entries
  * sit adjacent (the WebDataset contract), then a file-per-partition
  * write with the temp+rename commit protocol ([[AvroIO.write]]'s —
  * speculative duplicates discard, first rename wins). Readers stream
  * entry-at-a-time; shards are the parallelism unit.
  */
object TarShardIO {

  /** Write `(keyCol, extCol, payloadCol)` rows as `numShards` tar files
    * (`shard-NNNNN.tar`). Keys become entry names `<key>.<ext>`; all of a
    * key's entries land in ONE shard, adjacently, sorted by (key, ext).
    * Payload must be BINARY (cast strings with `encode(col, 'UTF-8')` or
    * `cast('binary')` for UTF-8 bytes).
    */
  def write(df: DataFrame, dir: String, keyCol: String, extCol: String,
      payloadCol: String, numShards: Int): Unit = {
    require(numShards > 0, s"numShards must be positive: $numShards")
    val payloadType = df.schema(payloadCol).dataType
    require(payloadType == org.apache.spark.sql.types.BinaryType,
      s"payload column '$payloadCol' must be BINARY, got $payloadType — " +
        "encode strings explicitly so the byte contract is the caller's")
    val rows = df.select(col(keyCol).cast("string").as("__k"),
        col(extCol).cast("string").as("__e"), col(payloadCol).as("__p"))
      .repartition(numShards, col("__k"))
      .sortWithinPartitions(col("__k"), col("__e"))
    val conf = new org.apache.spark.util.SerializableConfiguration(
      df.sparkSession.sparkContext.hadoopConfiguration)
    val outDir = new Path(dir)
    val fs = outDir.getFileSystem(conf.value)
    fs.mkdirs(outDir)
    fs.globStatus(new Path(outDir, "shard-*.tar"))
      .foreach(st => fs.delete(st.getPath, false))
    fs.globStatus(new Path(outDir, ".shard-*.tar.tmp"))
      .foreach(st => fs.delete(st.getPath, false))
    val dirStr = dir
    rows.rdd.foreachPartition { it =>
      val tc = org.apache.spark.TaskContext.get()
      val pid = tc.partitionId(); val attempt = tc.taskAttemptId()
      val finalPath = new Path(dirStr, f"shard-$pid%05d.tar")
      val tmpPath = new Path(dirStr, f".shard-$pid%05d-$attempt.tar.tmp")
      val fsLocal = finalPath.getFileSystem(conf.value)
      val out = new TarArchiveOutputStream(
        new BufferedOutputStream(fsLocal.create(tmpPath, true), 1 << 16),
        "UTF-8")
      out.setLongFileMode(TarArchiveOutputStream.LONGFILE_POSIX)
      // PAX headers: non-ASCII keys keep their real names (the ustar
      // header field would %U-escape them)
      out.setAddPaxHeadersForNonAsciiNames(true)
      var committed = false
      try {
        // rows arrive sorted by (key, ext), so a duplicate entry name is
        // ALWAYS adjacent — catch it here rather than let tar tools and
        // readers keep an arbitrary one of two same-named entries
        var prevName: String = null
        it.foreach { r =>
          val name = s"${r.getString(0)}.${r.getString(1)}"
          if (name == prevName) throw new java.io.IOException(
            s"duplicate tar entry '$name': two input rows share (key, ext)")
          prevName = name
          val bytes = r.getAs[Array[Byte]](2)
          val e = new TarArchiveEntry(name)
          e.setSize(bytes.length.toLong)
          out.putArchiveEntry(e)
          out.write(bytes)
          out.closeArchiveEntry()
        }
        out.close()
        val renamed = fsLocal.rename(tmpPath, finalPath)
        committed = renamed || fsLocal.exists(finalPath)
        if (!renamed && committed)
          try fsLocal.delete(tmpPath, false) catch { case _: Throwable => () }
        if (!committed) throw new java.io.IOException(
          s"TarShardIO commit failed: could not rename $tmpPath to $finalPath")
      } finally if (!committed) {
        try out.close() catch { case _: Throwable => () }
        try fsLocal.delete(tmpPath, false) catch { case _: Throwable => () }
      }
    }
  }

  /** Read a shard directory back as `(shard, name, payload)` — one task
    * per shard (the shard IS the parallelism unit; producers size shards
    * via `numShards`, the WebDataset norm is ~100 MB-1 GB each).
    */
  def read(spark: SparkSession, dir: String): DataFrame = {
    val conf = new org.apache.spark.util.SerializableConfiguration(
      spark.sparkContext.hadoopConfiguration)
    val fs = new Path(dir).getFileSystem(conf.value)
    val shards = fs.globStatus(new Path(dir, "shard-*.tar"))
      .map(_.getPath.toString).sorted
    val rdd = spark.sparkContext
      .parallelize(shards.toSeq, math.max(1, shards.length))
      .flatMap { p =>
        val path = new Path(p)
        val fsLocal = path.getFileSystem(conf.value)
        val shardId = "shard-(\\d+)\\.tar$".r.findFirstMatchIn(p)
          .map(_.group(1).toInt).getOrElse(-1)
        val in = new TarArchiveInputStream(
          new BufferedInputStream(fsLocal.open(path), 1 << 16), "UTF-8")
        // read eagerly: tar is sequential and entries are sample-sized by
        // contract; closing at iterator exhaustion would leak under limit()
        val buf = scala.collection.mutable.ArrayBuffer.empty[Row]
        try {
          var e = in.getNextEntry
          while (e != null) {
            if (e.getSize > Int.MaxValue - 8) throw new java.io.IOException(
              s"tar entry '${e.getName}' in $p is ${e.getSize} bytes — " +
                "beyond the single-array payload limit; shard smaller samples")
            val bytes = in.readNBytes(e.getSize.toInt)
            if (bytes.length != e.getSize) throw new java.io.EOFException(
              s"truncated shard $p: entry '${e.getName}' declared " +
                s"${e.getSize} bytes, got ${bytes.length}")
            buf += Row(shardId, e.getName, bytes)
            e = in.getNextEntry
          }
        } finally in.close()
        buf
      }
    spark.createDataFrame(rdd, org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("shard",
        org.apache.spark.sql.types.IntegerType, nullable = false),
      org.apache.spark.sql.types.StructField("name",
        org.apache.spark.sql.types.StringType, nullable = false),
      org.apache.spark.sql.types.StructField("payload",
        org.apache.spark.sql.types.BinaryType, nullable = false))))
  }
}
