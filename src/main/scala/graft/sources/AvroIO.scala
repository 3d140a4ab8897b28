package graft.sources

import java.io.BufferedOutputStream
import org.apache.avro.{LogicalTypes, Schema}
import org.apache.avro.file.{DataFileStream, DataFileWriter}
import org.apache.avro.generic.{GenericData, GenericDatumReader, GenericDatumWriter, GenericRecord}
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._
import scala.jdk.CollectionConverters._

/** Avro container-file source/sink on avro-core alone (the reference reads
  * Avro through Beam's avroio; Spark's own connector is a separate
  * `spark-avro` artifact that is not on this classpath, but the Avro
  * *format* library is — `DataFileStream`/`DataFileWriter` are all a
  * distributed reader needs).
  *
  * Scale shape mirrors [[TFRecordIO]]: the writer runs per partition against
  * the Hadoop FileSystem API (one `part-NNNNN.avro` per partition, written
  * through a task-attempt temp file and renamed on success, no driver
  * funnel, HDFS/S3A-compatible); the reader splits every file on Avro's
  * sync-marker block boundaries into byte ranges (so one giant container
  * file still fans out across the cluster) and packs the splits into at
  * most `4 × defaultParallelism` tasks (so a million-file directory does
  * not become a million-entry scheduler queue).
  *
  * Type mapping (both directions):
  *   struct↔record, string↔string, long↔long, int↔int, double↔double,
  *   float↔float, boolean↔boolean, binary↔bytes, array↔array,
  *   map[string,_]↔map, nullable↔union(null,T),
  *   timestamp↔long+timestamp-micros, date↔int+date,
  *   decimal(p,s)↔bytes+decimal (two's-complement unscaled per the Avro
  *   spec; fixed+decimal from foreign writers reads back too); Avro
  *   enum/fixed read back as string/binary. Interval is out of scope
  *   (documented, not silently wrong: the schema converter rejects it).
  */
object AvroIO {

  // ---------------------------------------------------------------- schema

  /** Catalyst → Avro. `name` seeds record names (Avro requires them). */
  def toAvro(dt: DataType, name: String, nullable: Boolean): Schema = {
    val base = dt match {
      case StringType => Schema.create(Schema.Type.STRING)
      case LongType => Schema.create(Schema.Type.LONG)
      case IntegerType | ShortType | ByteType => Schema.create(Schema.Type.INT)
      case DoubleType => Schema.create(Schema.Type.DOUBLE)
      case FloatType => Schema.create(Schema.Type.FLOAT)
      case BooleanType => Schema.create(Schema.Type.BOOLEAN)
      case BinaryType => Schema.create(Schema.Type.BYTES)
      case TimestampType =>
        LogicalTypes.timestampMicros().addToSchema(Schema.create(Schema.Type.LONG))
      case DateType =>
        LogicalTypes.date().addToSchema(Schema.create(Schema.Type.INT))
      case dt: DecimalType =>
        LogicalTypes.decimal(dt.precision, dt.scale)
          .addToSchema(Schema.create(Schema.Type.BYTES))
      case ArrayType(et, en) => Schema.createArray(toAvro(et, name + "_item", en))
      case MapType(StringType, vt, vn) => Schema.createMap(toAvro(vt, name + "_value", vn))
      case st: StructType => toAvroRecord(st, name)
      case other => throw new IllegalArgumentException(
        s"AvroIO does not map Catalyst type $other (column '$name')")
    }
    if (nullable) Schema.createUnion(Schema.create(Schema.Type.NULL), base) else base
  }

  def toAvroRecord(st: StructType, name: String): Schema = {
    val fields = st.fields.map { f =>
      new Schema.Field(f.name, toAvro(f.dataType, name + "_" + f.name, f.nullable),
        null, if (f.nullable) Schema.Field.NULL_DEFAULT_VALUE else null)
    }
    Schema.createRecord(name, null, "graft.avro", false, fields.toList.asJava)
  }

  /** Avro → Catalyst. Unions must be (null | T); enum→string, fixed→binary. */
  def toCatalyst(schema: Schema): (DataType, Boolean) = schema.getType match {
    case Schema.Type.UNION =>
      val branches = schema.getTypes.asScala.toSeq
      val nonNull = branches.filter(_.getType != Schema.Type.NULL)
      require(nonNull.size == 1,
        s"AvroIO reads only (null | T) unions, got: $schema")
      val (dt, _) = toCatalyst(nonNull.head)
      (dt, branches.size > nonNull.size)
    case Schema.Type.STRING | Schema.Type.ENUM => (StringType, false)
    case Schema.Type.LONG =>
      schema.getLogicalType match {
        case _: LogicalTypes.TimestampMicros | _: LogicalTypes.TimestampMillis =>
          (TimestampType, false)
        case _ => (LongType, false)
      }
    case Schema.Type.INT =>
      schema.getLogicalType match {
        case _: LogicalTypes.Date => (DateType, false)
        case _ => (IntegerType, false)
      }
    case Schema.Type.DOUBLE => (DoubleType, false)
    case Schema.Type.FLOAT => (FloatType, false)
    case Schema.Type.BOOLEAN => (BooleanType, false)
    case Schema.Type.BYTES | Schema.Type.FIXED =>
      schema.getLogicalType match {
        case d: LogicalTypes.Decimal => (DecimalType(d.getPrecision, d.getScale), false)
        case _ => (BinaryType, false)
      }
    case Schema.Type.ARRAY =>
      val (et, en) = toCatalyst(schema.getElementType)
      (ArrayType(et, en), false)
    case Schema.Type.MAP =>
      val (vt, vn) = toCatalyst(schema.getValueType)
      (MapType(StringType, vt, vn), false)
    case Schema.Type.RECORD =>
      (StructType(schema.getFields.asScala.toSeq.map { f =>
        val (dt, n) = toCatalyst(f.schema())
        StructField(f.name(), dt, n)
      }), false)
    case other => throw new IllegalArgumentException(
      s"AvroIO does not map Avro type $other")
  }

  // ---------------------------------------------------------------- values

  /** Catalyst value → Avro datum (driven by the Catalyst type). */
  private[graft] def toDatum(v: Any, dt: DataType, schema: Schema): Any = {
    if (v == null) return null
    // a nullable field's schema is union(null, T): unwrap to T for nesting
    val s = if (schema.getType == Schema.Type.UNION)
      schema.getTypes.asScala.find(_.getType != Schema.Type.NULL).get else schema
    dt match {
      case StringType | LongType | IntegerType | DoubleType | FloatType |
           BooleanType => v
      case ShortType => v.asInstanceOf[Short].toInt
      case ByteType => v.asInstanceOf[Byte].toInt
      case BinaryType => java.nio.ByteBuffer.wrap(v.asInstanceOf[Array[Byte]])
      case dec: DecimalType =>
        // Avro decimal = two's-complement unscaled bytes at the SCHEMA's
        // scale; rescale first (exact — Catalyst already enforced p/s)
        val bd = (v match {
          case d: java.math.BigDecimal => d
          case d: BigDecimal => d.bigDecimal
          case d: org.apache.spark.sql.types.Decimal => d.toJavaBigDecimal
        }).setScale(dec.scale)
        java.nio.ByteBuffer.wrap(bd.unscaledValue().toByteArray)
      // java.sql and java.time both accepted: with
      // spark.sql.datetime.java8API.enabled=true, df.rdd yields
      // Instant/LocalDate instead of Timestamp/Date
      case TimestampType => v match {
        case ts: java.sql.Timestamp =>
          Math.floorDiv(ts.getTime, 1000L) * 1000000L + ts.getNanos / 1000L
        case i: java.time.Instant =>
          Math.addExact(Math.multiplyExact(i.getEpochSecond, 1000000L), i.getNano / 1000L)
      }
      case DateType => v match {
        case d: java.sql.Date => d.toLocalDate.toEpochDay.toInt
        case d: java.time.LocalDate => d.toEpochDay.toInt
      }
      case ArrayType(et, _) =>
        v.asInstanceOf[scala.collection.Seq[Any]]
          .map(toDatum(_, et, s.getElementType)).asJava
      case MapType(StringType, vt, _) =>
        v.asInstanceOf[scala.collection.Map[String, Any]]
          .map { case (k, mv) => k -> toDatum(mv, vt, s.getValueType) }.asJava
      case st: StructType =>
        val row = v.asInstanceOf[Row]
        val rec = new GenericData.Record(s)
        var i = 0
        while (i < st.fields.length) {
          rec.put(i, toDatum(row.get(i), st.fields(i).dataType, s.getFields.get(i).schema()))
          i += 1
        }
        rec
      case other => throw new IllegalArgumentException(s"unsupported write type $other")
    }
  }

  /** Avro datum → Catalyst external value. Driven by the Catalyst type WITH
    * the Avro schema alongside — `toCatalyst` maps BOTH timestamp-micros and
    * timestamp-millis to TimestampType, so the scale must come from the
    * source schema (decoding a millis file as micros would be silently
    * 1000× off).
    */
  private[graft] def fromDatum(v: Any, dt: DataType, schema: Schema): Any = {
    if (v == null) return null
    val s = if (schema.getType == Schema.Type.UNION)
      schema.getTypes.asScala.find(_.getType != Schema.Type.NULL).get else schema
    dt match {
      case StringType => v.toString // Utf8 / enum symbol → String
      case LongType | IntegerType | DoubleType | FloatType | BooleanType => v
      case BinaryType => v match {
        case bb: java.nio.ByteBuffer =>
          val a = new Array[Byte](bb.remaining()); bb.duplicate().get(a); a
        case fixed: org.apache.avro.generic.GenericFixed => fixed.bytes().clone()
      }
      case dec: DecimalType =>
        val unscaled = v match {
          case bb: java.nio.ByteBuffer =>
            val a = new Array[Byte](bb.remaining()); bb.duplicate().get(a); a
          case fixed: org.apache.avro.generic.GenericFixed => fixed.bytes()
        }
        // scale comes from the SOURCE schema (a foreign writer's scale may
        // differ from ours); Catalyst widens to the mapped DecimalType
        val srcScale = s.getLogicalType.asInstanceOf[LogicalTypes.Decimal].getScale
        new java.math.BigDecimal(new java.math.BigInteger(unscaled), srcScale)
          .setScale(dec.scale)
      case TimestampType =>
        val micros = s.getLogicalType match {
          case _: LogicalTypes.TimestampMillis => v.asInstanceOf[Long] * 1000L
          case _ => v.asInstanceOf[Long]
        }
        val ts = new java.sql.Timestamp(Math.floorDiv(micros, 1000000L) * 1000L)
        ts.setNanos((Math.floorMod(micros, 1000000L) * 1000L).toInt)
        ts
      case DateType =>
        java.sql.Date.valueOf(java.time.LocalDate.ofEpochDay(v.asInstanceOf[Int].toLong))
      case ArrayType(et, _) =>
        v.asInstanceOf[java.util.Collection[Any]].asScala.toSeq
          .map(fromDatum(_, et, s.getElementType))
      case MapType(StringType, vt, _) =>
        v.asInstanceOf[java.util.Map[Any, Any]].asScala.map {
          case (k, mv) => k.toString -> fromDatum(mv, vt, s.getValueType)
        }.toMap
      case st: StructType =>
        val rec = v.asInstanceOf[GenericRecord]
        Row.fromSeq(st.fields.toSeq.map(f =>
          fromDatum(rec.get(f.name), f.dataType, s.getField(f.name).schema())))
      case other => throw new IllegalArgumentException(s"unsupported read type $other")
    }
  }

  // ------------------------------------------------------------------- I/O

  /** Write one Avro container file per partition (overwrite semantics: stale
    * `part-*.avro` from a previous run are deleted first, same contract as
    * [[TFRecordIO.write]]). Empty partitions still write a header-only file —
    * and a ZERO-partition DataFrame gets a driver-written schema-only part —
    * so the directory stays schema-discoverable for an empty dataset.
    *
    * Commit protocol: each task writes `.part-NNNNN-<attempt>.avro.tmp` and
    * renames into place only after a successful close, so a task killed
    * mid-write (or a speculative duplicate attempt) can never leave a
    * truncated container under the final name; the first attempt to rename
    * wins and later attempts discard their temp file. Dot-prefixed temp
    * names are invisible to [[read]]'s glob and are swept on overwrite.
    *
    * `codec`: "deflate" (default — the one compression codec the Avro SPEC
    * requires every implementation to support, and it rides the JDK's
    * zlib, so the module's avro-core-alone contract holds for producers
    * AND for whoever reads the handoff), "snappy"/"zstandard" (faster, but
    * the READER needs snappy-java/zstd-jni on its classpath — Spark
    * bundles both; a bare avro-core consumer does not), "bzip2", or
    * "null". Block codecs are container metadata, decoded transparently.
    */
  def write(df: DataFrame, dir: String, codec: String = "deflate"): Unit = {
    val catalystSchema = df.schema
    val avroSchema = toAvroRecord(catalystSchema, "graft_row")
    val schemaJson = avroSchema.toString // Schema is not Serializable; ship JSON
    val conf = new org.apache.spark.util.SerializableConfiguration(
      df.sparkSession.sparkContext.hadoopConfiguration)
    val outDir = new Path(dir)
    val fs = outDir.getFileSystem(conf.value)
    if (fs.exists(outDir)) {
      fs.globStatus(new Path(outDir, "part-*.avro"))
        .foreach(st => fs.delete(st.getPath, false))
      fs.globStatus(new Path(outDir, ".part-*.avro.tmp"))
        .foreach(st => fs.delete(st.getPath, false))
    }
    val dirStr = dir
    val codecStr = codec
    org.apache.avro.file.CodecFactory.fromString(codecStr) // fail on the driver, not per task

    // one closure for task AND the driver-side zero-partition fallback
    def writePart(pid: Int, attempt: Long, rows: Iterator[Row]): Unit = {
      val schema = new Schema.Parser().parse(schemaJson)
      val finalPath = new Path(dirStr, f"part-$pid%05d.avro")
      val tmpPath = new Path(dirStr, f".part-$pid%05d-$attempt.avro.tmp")
      val fsLocal = finalPath.getFileSystem(conf.value)
      val writer = new DataFileWriter(new GenericDatumWriter[GenericRecord](schema))
      writer.setCodec(org.apache.avro.file.CodecFactory.fromString(codecStr))
      var committed = false
      try {
        writer.create(schema,
          new BufferedOutputStream(fsLocal.create(tmpPath, true), 1 << 16))
        rows.foreach { row =>
          writer.append(toDatum(row, catalystSchema, schema).asInstanceOf[GenericRecord])
        }
        writer.close()
        // first finished attempt wins; a speculative duplicate that lost
        // the race (rename fails because the final name exists) discards
        // its temp — the committed file is complete by definition
        val renamed = fsLocal.rename(tmpPath, finalPath)
        committed = renamed || fsLocal.exists(finalPath)
        if (!renamed && committed)
          try fsLocal.delete(tmpPath, false) catch { case _: Throwable => () }
        if (!committed) throw new java.io.IOException(
          s"AvroIO commit failed: could not rename $tmpPath to $finalPath")
      } finally if (!committed) {
        try writer.close() catch { case _: Throwable => () }
        try fsLocal.delete(tmpPath, false) catch { case _: Throwable => () }
      }
    }

    if (df.rdd.getNumPartitions == 0) {
      // e.g. an empty LocalRelation: no tasks would run, so the driver
      // writes the schema-only part itself
      writePart(0, 0L, Iterator.empty)
    } else df.rdd.foreachPartition { it =>
      val tc = org.apache.spark.TaskContext.get()
      writePart(tc.partitionId(), tc.taskAttemptId(), it)
    }
  }

  /** Read a directory of Avro container files as a DataFrame: schema from
    * the first file's header.
    *
    * Parallelism at both extremes of file-size distribution:
    *  - files LARGER than `splitBytes` are split into byte ranges on Avro's
    *    sync-marker block boundaries (`DataFileReader.sync/pastSync` — the
    *    container format's designed split protocol: each range reads the
    *    blocks whose sync lands inside it, so ranges partition the file
    *    exactly, any codec);
    *  - the split list is packed into at most `4 × defaultParallelism`
    *    tasks, so a directory of a million small files does not become a
    *    million-entry scheduler queue.
    */
  def read(spark: SparkSession, dir: String,
           splitBytes: Long = 128L * 1024 * 1024): DataFrame = {
    require(splitBytes > 0, s"splitBytes must be positive: $splitBytes")
    val conf = new org.apache.spark.util.SerializableConfiguration(
      spark.sparkContext.hadoopConfiguration)
    val fs = new Path(dir).getFileSystem(conf.value)
    val statuses = fs.globStatus(new Path(dir, "*.avro")).sortBy(_.getPath.toString)
    require(statuses.nonEmpty, s"no .avro files under $dir")
    val headSchema = {
      val in = fs.open(statuses.head.getPath)
      val stream = new DataFileStream(in, new GenericDatumReader[GenericRecord]())
      try stream.getSchema.toString finally stream.close()
    }
    val (dt, _) = toCatalyst(new Schema.Parser().parse(headSchema))
    val catalystSchema = dt.asInstanceOf[StructType]
    // (file, rangeStart, rangeEnd): a reader claims the blocks whose sync
    // marker lies in [start, end) — the standard Avro split contract
    val splits: Seq[(String, Long, Long)] = statuses.toSeq.flatMap { st =>
      val len = st.getLen
      val n = math.max(1L, (len + splitBytes - 1) / splitBytes)
      (0L until n).map(i =>
        (st.getPath.toString, i * splitBytes, math.min(len, (i + 1) * splitBytes)))
    }
    val numTasks = math.min(splits.length,
      math.max(1, 4 * spark.sparkContext.defaultParallelism))
    val rows = spark.sparkContext.parallelize(splits, numTasks)
      .flatMap { case (f, start, end) =>
        val schema = new Schema.Parser().parse(headSchema)
        val path = new Path(f)
        // expected schema = head schema: readers of a mixed-version
        // directory get Avro schema resolution per file instead of silent
        // column drift
        val reader = org.apache.avro.file.DataFileReader.openReader(
          new org.apache.avro.mapred.FsInput(path, conf.value),
          new GenericDatumReader[GenericRecord](null, schema))
        reader.sync(start) // seek to the first block at-or-after `start`
        // close EAGERLY when the split is exhausted — a task owns many
        // packed splits, so deferring every close to task completion would
        // accumulate one open descriptor per split (fd exhaustion at the
        // million-file scale the packing exists for). The completion
        // listener stays as the error-path backstop: a downstream
        // limit/take or mid-decode exception never drains the iterator.
        var closed = false
        def closeOnce(): Unit = if (!closed) {
          closed = true
          try reader.close() catch { case _: Throwable => () }
        }
        Option(org.apache.spark.TaskContext.get()).foreach(_.addTaskCompletionListener(
          new org.apache.spark.util.TaskCompletionListener {
            override def onTaskCompletion(c: org.apache.spark.TaskContext): Unit =
              closeOnce()
          }))
        val sType: StructType = catalystSchema
        new Iterator[Row] {
          def hasNext: Boolean = {
            val more = !closed && reader.hasNext && !reader.pastSync(end)
            if (!more) closeOnce()
            more
          }
          def next(): Row = fromDatum(reader.next(), sType, schema).asInstanceOf[Row]
        }
      }
    spark.createDataFrame(rows, catalystSchema)
  }
}
