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
        StructField("d", DecimalType(18, 2), nullable = true))), "r")
    }
  }
}
