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
  * the Hadoop FileSystem API (one `part-NNNNN.avro` per partition, no driver
  * funnel, HDFS/S3A-compatible); the reader schedules one task per file and
  * streams records (Avro's sync-marker blocks would allow intra-file splits,
  * but per-file parallelism is the 100 TB default anyway — a big corpus is
  * many moderate files, and one task per file keeps the reader trivial and
  * checksum-verified by the container itself).
  *
  * Type mapping (both directions):
  *   struct↔record, string↔string, long↔long, int↔int, double↔double,
  *   float↔float, boolean↔boolean, binary↔bytes, array↔array,
  *   map[string,_]↔map, nullable↔union(null,T),
  *   timestamp↔long+timestamp-micros, date↔int+date; Avro enum/fixed read
  *   back as string/binary. Decimal/interval are out of scope (documented,
  *   not silently wrong: the schema converter rejects them).
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
    case Schema.Type.BYTES | Schema.Type.FIXED => (BinaryType, false)
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
      case TimestampType =>
        val ts = v.asInstanceOf[java.sql.Timestamp]
        Math.floorDiv(ts.getTime, 1000L) * 1000000L + ts.getNanos / 1000L
      case DateType =>
        v.asInstanceOf[java.sql.Date].toLocalDate.toEpochDay.toInt
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
    * [[TFRecordIO.write]]). Empty partitions still write a header-only file
    * so the directory stays schema-discoverable for an empty dataset.
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
    if (fs.exists(outDir))
      fs.globStatus(new Path(outDir, "part-*.avro"))
        .foreach(st => fs.delete(st.getPath, false))
    val dirStr = dir
    val codecStr = codec
    org.apache.avro.file.CodecFactory.fromString(codecStr) // fail on the driver, not per task
    df.rdd.foreachPartition { it =>
      val schema = new Schema.Parser().parse(schemaJson)
      val pid = org.apache.spark.TaskContext.getPartitionId()
      val path = new Path(dirStr, f"part-$pid%05d.avro")
      val fsLocal = path.getFileSystem(conf.value)
      val writer = new DataFileWriter(new GenericDatumWriter[GenericRecord](schema))
      writer.setCodec(org.apache.avro.file.CodecFactory.fromString(codecStr))
      writer.create(schema, new BufferedOutputStream(fsLocal.create(path, true), 1 << 16))
      try it.foreach { row =>
        writer.append(toDatum(row, catalystSchema, schema).asInstanceOf[GenericRecord])
      } finally writer.close()
    }
  }

  /** Read a directory of Avro container files as a DataFrame: schema from
    * the first file's header, one task per file.
    */
  def read(spark: SparkSession, dir: String): DataFrame = {
    val conf = new org.apache.spark.util.SerializableConfiguration(
      spark.sparkContext.hadoopConfiguration)
    val fs = new Path(dir).getFileSystem(conf.value)
    val files = fs.globStatus(new Path(dir, "*.avro")).map(_.getPath.toString).sorted
    require(files.nonEmpty, s"no .avro files under $dir")
    val headSchema = {
      val in = fs.open(new Path(files.head))
      val stream = new DataFileStream(in, new GenericDatumReader[GenericRecord]())
      try stream.getSchema.toString finally stream.close()
    }
    val (dt, _) = toCatalyst(new Schema.Parser().parse(headSchema))
    val catalystSchema = dt.asInstanceOf[StructType]
    val rows = spark.sparkContext.parallelize(files.toSeq, files.length).flatMap { f =>
      val schema = new Schema.Parser().parse(headSchema)
      val path = new Path(f)
      val in = path.getFileSystem(conf.value).open(path)
      // expected schema = head schema: readers of a mixed-version directory
      // get Avro schema resolution per file instead of silent column drift
      val stream = new DataFileStream(in,
        new GenericDatumReader[GenericRecord](null, schema))
      // close on task completion, not on iterator exhaustion: a downstream
      // limit/take (or an exception mid-decode) never drains the iterator,
      // which would leak one open input stream per task
      Option(org.apache.spark.TaskContext.get()).foreach(_.addTaskCompletionListener(
        new org.apache.spark.util.TaskCompletionListener {
          override def onTaskCompletion(c: org.apache.spark.TaskContext): Unit =
            try stream.close() catch { case _: Throwable => () }
        }))
      val sType: StructType = catalystSchema
      new Iterator[Row] {
        def hasNext: Boolean = stream.hasNext
        def next(): Row = fromDatum(stream.next(), sType, schema).asInstanceOf[Row]
      }
    }
    spark.createDataFrame(rows, catalystSchema)
  }
}
