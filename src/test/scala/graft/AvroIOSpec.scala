package graft

import graft.sources.AvroIO
import java.sql.{Date, Timestamp}
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

/** Avro container round-trip on avro-core (no spark-avro connector on this
  * classpath — AvroIO is the engine's own reader/writer).
  */
class AvroIOSpec extends SparkTestBase {

  private def tmpDir(tag: String) =
    new java.io.File(System.getProperty("java.io.tmpdir"),
      s"graft_avro_${tag}_${System.nanoTime()}").getAbsolutePath

  test("mixed-type round-trip: primitives, temporal, binary, array, map, nested struct, nulls") {
    val s = spark
    val schema = StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("name", StringType, nullable = true),
      StructField("score", DoubleType, nullable = true),
      StructField("flag", BooleanType, nullable = false),
      StructField("blob", BinaryType, nullable = true),
      StructField("ts", TimestampType, nullable = true),
      StructField("day", DateType, nullable = true),
      StructField("tags", ArrayType(StringType, containsNull = true), nullable = true),
      StructField("props", MapType(StringType, LongType, valueContainsNull = true), nullable = true),
      StructField("inner", StructType(Seq(
        StructField("a", IntegerType, nullable = true),
        StructField("b", StringType, nullable = true))), nullable = true)
    ))
    val ts = new Timestamp(1723500000123L); ts.setNanos(123456000) // micros survive
    val rows = Seq(
      Row(1L, "alpha", 1.5, true, Array[Byte](1, 2, 3), ts, Date.valueOf("2026-08-13"),
        Seq("x", null, "y"), Map("k" -> 7L), Row(4, "in")),
      Row(2L, null, null, false, null, null, null, null, null, null)
    )
    val df = s.createDataFrame(s.sparkContext.parallelize(rows, 2), schema)
    val dir = tmpDir("mixed")
    AvroIO.write(df, dir)
    val back = AvroIO.read(s, dir)
    assert(back.schema == schema, s"schema drifted: ${back.schema} vs $schema")
    val got = back.collect().sortBy(_.getLong(0))
    assert(got.length == 2)
    val r0 = got(0)
    assert(r0.getString(1) == "alpha" && r0.getDouble(2) == 1.5 && r0.getBoolean(3))
    assert(r0.getAs[Array[Byte]](4).toSeq == Seq[Byte](1, 2, 3))
    assert(r0.getAs[Timestamp](5) == ts, s"timestamp micros lost: ${r0.getAs[Timestamp](5)}")
    assert(r0.getAs[Date](6).toString == "2026-08-13")
    assert(r0.getSeq[String](7).toSeq == Seq("x", null, "y"))
    assert(r0.getAs[Map[String, Long]](8) == Map("k" -> 7L))
    assert(r0.getAs[Row](9) == Row(4, "in"))
    val r1 = got(1)
    // field 3 (flag) is non-nullable; every nullable field round-trips null
    Seq(1, 2, 4, 5, 6, 7, 8, 9).foreach(i =>
      assert(r1.isNullAt(i), s"field $i should be null"))
  }

  test("real corpus round-trip preserves every row; overwrite clears stale parts") {
    val s = spark
    val docs = Tables.documents(s, "/root/testdata/sf0.001")
      .select("doc_id", "lang", "n_chars", "text")
    val dir = tmpDir("docs")
    AvroIO.write(docs.repartition(8), dir)
    val back8 = AvroIO.read(s, dir)
    assert(back8.count() == docs.count())
    // the dataflow layer reads the same directory (Pipeline.readAvro)
    val pc = graft.api.Pipeline(s).readAvro(dir)
    assert(pc.count() == docs.count())
    // re-write the same dir with FEWER partitions: stale part files must not
    // leak rows back into the read
    AvroIO.write(docs.limit(10).repartition(2), dir)
    assert(AvroIO.read(s, dir).count() == 10)
  }

  test("timestamp-millis files decode at millis scale (foreign-writer compatibility)") {
    // our own writer emits timestamp-micros; a file from another system may
    // carry timestamp-millis, which toCatalyst also maps to TimestampType —
    // the decoder must scale by the SOURCE schema, not assume micros
    import org.apache.avro.generic.{GenericData, GenericDatumWriter, GenericRecord}
    val schema = new org.apache.avro.Schema.Parser().parse(
      """{"type":"record","name":"r","fields":[
        |{"name":"id","type":"long"},
        |{"name":"ts","type":{"type":"long","logicalType":"timestamp-millis"}}]}"""
        .stripMargin)
    val dir = new java.io.File(tmpDir("millis")); dir.mkdirs()
    val w = new org.apache.avro.file.DataFileWriter(
      new GenericDatumWriter[GenericRecord](schema))
    w.create(schema, new java.io.File(dir, "part-00000.avro"))
    val rec = new GenericData.Record(schema)
    rec.put(0, 1L); rec.put(1, 1723500000123L)
    w.append(rec); w.close()
    val back = AvroIO.read(spark, dir.getAbsolutePath).collect()
    assert(back.length == 1)
    assert(back(0).getAs[java.sql.Timestamp](1).getTime == 1723500000123L,
      s"millis misdecoded: ${back(0)}")
  }

  test("unsupported Catalyst type rejected at schema time, not silently mangled") {
    intercept[IllegalArgumentException] {
      AvroIO.toAvroRecord(StructType(Seq(
        StructField("d", org.apache.spark.sql.types.CalendarIntervalType,
          nullable = true))), "r")
    }
  }

  test("decimal round-trip: bytes+decimal logical type, negatives, nulls, high precision") {
    val s = spark
    val schema = StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("money", DecimalType(18, 2), nullable = true),
      StructField("wide", DecimalType(38, 10), nullable = true)))
    val rows = Seq(
      Row(1L, new java.math.BigDecimal("12345.67"),
        new java.math.BigDecimal("-98765432109876543210.0123456789")),
      Row(2L, new java.math.BigDecimal("-0.01"), new java.math.BigDecimal("0E-10")),
      Row(3L, null, null))
    val df = s.createDataFrame(s.sparkContext.parallelize(rows, 2), schema)
    val dir = tmpDir("decimal")
    AvroIO.write(df, dir)
    val back = AvroIO.read(s, dir)
    assert(back.schema == schema, s"schema drifted: ${back.schema}")
    val got = back.collect().sortBy(_.getLong(0))
    assert(got(0).getDecimal(1) == new java.math.BigDecimal("12345.67"))
    assert(got(0).getDecimal(2) ==
      new java.math.BigDecimal("-98765432109876543210.0123456789"))
    assert(got(1).getDecimal(1) == new java.math.BigDecimal("-0.01"))
    assert(got(1).getDecimal(2).compareTo(java.math.BigDecimal.ZERO) == 0)
    assert(got(2).isNullAt(1) && got(2).isNullAt(2))
  }

  test("foreign-writer fixed+decimal decodes at the source schema's scale") {
    // a handoff partner (e.g. Beam avroio) may carry decimals as
    // fixed+decimal rather than bytes+decimal — both must read back
    import org.apache.avro.generic.{GenericData, GenericDatumWriter, GenericRecord}
    val schema = new org.apache.avro.Schema.Parser().parse(
      """{"type":"record","name":"r","fields":[
        |{"name":"id","type":"long"},
        |{"name":"amt","type":{"type":"fixed","name":"amt_fixed","size":8,
        |  "logicalType":"decimal","precision":18,"scale":4}}]}""".stripMargin)
    val dir = new java.io.File(tmpDir("fixdec")); dir.mkdirs()
    val w = new org.apache.avro.file.DataFileWriter(
      new GenericDatumWriter[GenericRecord](schema))
    w.create(schema, new java.io.File(dir, "part-00000.avro"))
    val unscaled = new java.math.BigDecimal("1234.5678").unscaledValue()
    val padded = new Array[Byte](8) // sign-extend into the 8-byte fixed
    val raw = unscaled.toByteArray
    java.util.Arrays.fill(padded, if (unscaled.signum() < 0) (-1).toByte else 0.toByte)
    System.arraycopy(raw, 0, padded, 8 - raw.length, raw.length)
    val rec = new GenericData.Record(schema)
    rec.put(0, 1L)
    rec.put(1, new GenericData.Fixed(schema.getField("amt").schema(), padded))
    w.append(rec); w.close()
    val back = AvroIO.read(spark, dir.getAbsolutePath).collect()
    assert(back.length == 1)
    assert(back(0).getDecimal(1) == new java.math.BigDecimal("1234.5678"),
      s"fixed decimal misdecoded: ${back(0)}")
  }

  test("one large multi-block file splits across >1 task; splits partition exactly") {
    // a single giant container (foreign writer, tiny sync interval -> many
    // blocks) must fan out: each byte range claims the blocks whose sync
    // marker lands inside it — no record lost, none duplicated
    import org.apache.avro.generic.{GenericData, GenericDatumWriter, GenericRecord}
    val schema = new org.apache.avro.Schema.Parser().parse(
      """{"type":"record","name":"r","fields":[
        |{"name":"id","type":"long"},{"name":"payload","type":"string"}]}"""
        .stripMargin)
    val dir = new java.io.File(tmpDir("bigfile")); dir.mkdirs()
    val w = new org.apache.avro.file.DataFileWriter(
      new GenericDatumWriter[GenericRecord](schema))
    w.setSyncInterval(1 << 10) // ~1 KiB blocks -> hundreds of sync points
    w.create(schema, new java.io.File(dir, "part-00000.avro"))
    val payload = "x" * 100
    (0L until 5000L).foreach { i =>
      val rec = new GenericData.Record(schema)
      rec.put(0, i); rec.put(1, payload); w.append(rec)
    }
    w.close()
    val back = AvroIO.read(spark, dir.getAbsolutePath, splitBytes = 64L * 1024)
    assert(back.rdd.getNumPartitions > 1,
      s"expected intra-file splits, got ${back.rdd.getNumPartitions} partition(s)")
    val ids = back.select("id").collect().map(_.getLong(0))
    assert(ids.length == 5000, s"split ranges lost/duplicated rows: ${ids.length}")
    assert(ids.toSet.size == 5000)
  }

  test("zero-partition DataFrame writes a schema-only part; read recovers the schema") {
    val s = spark
    val schema = StructType(Seq(
      StructField("k", LongType, nullable = false),
      StructField("v", StringType, nullable = true)))
    val empty = s.createDataFrame(s.sparkContext.emptyRDD[Row], schema)
    assert(empty.rdd.getNumPartitions == 0) // the edge this test pins
    val dir = tmpDir("empty")
    AvroIO.write(empty, dir)
    val back = AvroIO.read(s, dir)
    assert(back.schema == schema)
    assert(back.count() == 0)
  }

  test("write with java.time row types (spark.sql.datetime.java8API.enabled)") {
    val s = spark.newSession() // isolated SQLConf; shared SparkContext
    s.conf.set("spark.sql.datetime.java8API.enabled", "true")
    val schema = StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("ts", TimestampType, nullable = true),
      StructField("day", DateType, nullable = true)))
    val inst = java.time.Instant.ofEpochSecond(1723500000L, 123456000L)
    val rows = Seq(Row(1L, inst, java.time.LocalDate.of(2026, 8, 13)))
    val df = s.createDataFrame(s.sparkContext.parallelize(rows, 1), schema)
    // df.rdd now yields Instant/LocalDate — the write path must accept both
    val dir = tmpDir("java8")
    AvroIO.write(df, dir)
    val back = AvroIO.read(spark, dir).collect() // default session: java.sql types
    assert(back.length == 1)
    assert(back(0).getAs[Timestamp](1).getTime == 1723500000123L)
    assert(back(0).getAs[Timestamp](1).getNanos == 123456000)
    assert(back(0).getAs[Date](2).toString == "2026-08-13")
  }

  test("commit protocol leaves no temp files; reread sees only committed parts") {
    val s = spark
    val docs = Tables.documents(s, "/root/testdata/sf0.001").select("doc_id", "text")
    val dir = tmpDir("commit")
    AvroIO.write(docs.repartition(4), dir)
    val names = new java.io.File(dir).listFiles().map(_.getName).sorted
    assert(names.count(_.endsWith(".avro")) == 4, names.mkString(","))
    assert(!names.exists(_.endsWith(".tmp")), s"temp leaked: ${names.mkString(",")}")
    // a stranded temp from a crashed earlier run is swept on overwrite and
    // invisible to read (dot-prefixed, outside the *.avro glob)
    val stranded = new java.io.File(dir, ".part-99999-7.avro.tmp")
    java.nio.file.Files.write(stranded.toPath, Array[Byte](1, 2, 3))
    assert(AvroIO.read(s, dir).count() == docs.count())
    AvroIO.write(docs.limit(5).repartition(1), dir)
    assert(!stranded.exists(), "stale temp not swept on overwrite")
    assert(AvroIO.read(s, dir).count() == 5)
  }
}
