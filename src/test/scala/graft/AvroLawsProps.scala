package graft

import graft.sources.AvroIO
import org.apache.avro.Schema
import org.apache.avro.generic.{GenericDatumReader, GenericDatumWriter, GenericRecord}
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

/** Schema- and value-mapping laws for [[AvroIO]], exercised through REAL
  * Avro binary encode/decode (not just the in-memory converters): the
  * decoder sees `Utf8` strings, `ByteBuffer`s and boxed unions exactly as a
  * file read produces them. Complements AvroIOSpec's end-to-end file tests
  * with generated nesting/nullability shapes.
  */
object AvroLawsProps extends Properties("AvroLaws") {

  private val tsGen: Gen[java.sql.Timestamp] =
    Gen.chooseNum(-10000000000000L, 10000000000000L).map { micros =>
      val ts = new java.sql.Timestamp(Math.floorDiv(micros, 1000000L) * 1000L)
      ts.setNanos((Math.floorMod(micros, 1000000L) * 1000L).toInt)
      ts
    }
  private val dateGen: Gen[java.sql.Date] =
    Gen.chooseNum(-100000L, 100000L)
      .map(d => java.sql.Date.valueOf(java.time.LocalDate.ofEpochDay(d)))

  private val leafTypeGen: Gen[DataType] = Gen.oneOf(
    LongType, IntegerType, DoubleType, BooleanType, StringType, BinaryType,
    TimestampType, DateType, DecimalType(18, 2), DecimalType(38, 10))

  private def dataTypeGen(depth: Int): Gen[DataType] =
    if (depth <= 0) leafTypeGen
    else Gen.frequency(
      5 -> leafTypeGen,
      1 -> leafTypeGen.map(ArrayType(_, containsNull = true)),
      1 -> leafTypeGen.map(MapType(StringType, _, valueContainsNull = true)),
      1 -> structTypeGen(depth - 1).map(identity[DataType]))

  private def structTypeGen(depth: Int): Gen[StructType] =
    for {
      n <- Gen.chooseNum(1, 4)
      types <- Gen.listOfN(n, dataTypeGen(depth))
      nulls <- Gen.listOfN(n, Gen.oneOf(true, false))
    } yield StructType(types.zip(nulls).zipWithIndex.map { case ((dt, nl), i) =>
      StructField(s"f$i", dt, nl)
    })

  private def valueGen(dt: DataType, nullable: Boolean): Gen[Any] = {
    val base: Gen[Any] = dt match {
      case LongType => Gen.long.map(x => x: Any)
      case IntegerType => Gen.chooseNum(Int.MinValue, Int.MaxValue).map(x => x: Any)
      // finite doubles: NaN breaks == (and is not a value Spark hashes stably)
      case DoubleType => Gen.chooseNum(-1e12, 1e12).map(x => x: Any)
      case BooleanType => Gen.oneOf(true: Any, false: Any)
      case StringType => Gen.listOf(Gen.alphaNumChar).map(_.mkString: Any)
      case BinaryType =>
        Gen.listOf(Gen.choose(Byte.MinValue, Byte.MaxValue)).map(_.toArray: Any)
      case TimestampType => tsGen.map(x => x: Any)
      case DateType => dateGen.map(x => x: Any)
      case d: DecimalType =>
        // bounded so the unscaled value honors the declared precision (a
        // full-range Long has 19 digits — out of contract for (18,2))
        Gen.chooseNum(-1000000000000000L, 1000000000000000L).map(n =>
          new java.math.BigDecimal(java.math.BigInteger.valueOf(n), d.scale): Any)
      case ArrayType(et, cn) =>
        Gen.listOfN(3, valueGen(et, cn)).map(_.toSeq: Any)
      case MapType(StringType, vt, vn) =>
        Gen.mapOfN(3, Gen.zip(Gen.identifier, valueGen(vt, vn))).map(x => x: Any)
      case st: StructType =>
        Gen.sequence[List[Any], Any](
          st.fields.toList.map(f => valueGen(f.dataType, f.nullable)))
          .map(vs => Row.fromSeq(vs): Any)
      case other => sys.error(s"no generator for $other")
    }
    if (nullable) Gen.frequency(4 -> base, 1 -> Gen.const(null: Any)) else base
  }

  private val schemaAndRow: Gen[(StructType, Row)] = for {
    st <- structTypeGen(1)
    row <- valueGen(st, nullable = false)
  } yield (st, row.asInstanceOf[Row])

  /** Deep equality that treats Array[Byte] by content (Java arrays compare
    * by reference) and recurses into rows/containers.
    */
  private def eqv(a: Any, b: Any): Boolean = (a, b) match {
    case (null, null) => true
    case (x: Array[Byte], y: Array[Byte]) => java.util.Arrays.equals(x, y)
    case (x: scala.collection.Seq[_], y: scala.collection.Seq[_]) =>
      x.size == y.size && x.zip(y).forall { case (p, q) => eqv(p, q) }
    case (x: scala.collection.Map[_, _], y: scala.collection.Map[_, _]) =>
      x.size == y.size && x.forall { case (k, v) =>
        y.asInstanceOf[scala.collection.Map[Any, Any]].get(k).exists(eqv(v, _))
      }
    case (x: Row, y: Row) =>
      x.size == y.size && (0 until x.size).forall(i => eqv(x.get(i), y.get(i)))
    case _ => a == b
  }

  private def binaryRoundTrip(rec: GenericRecord, schema: Schema): GenericRecord = {
    val out = new java.io.ByteArrayOutputStream()
    val enc = org.apache.avro.io.EncoderFactory.get().binaryEncoder(out, null)
    new GenericDatumWriter[GenericRecord](schema).write(rec, enc)
    enc.flush()
    val dec = org.apache.avro.io.DecoderFactory.get()
      .binaryDecoder(out.toByteArray, null)
    new GenericDatumReader[GenericRecord](schema).read(null, dec)
  }

  property("Catalyst->Avro->Catalyst schema mapping is the identity") =
    forAll(structTypeGen(1)) { st =>
      AvroIO.toCatalyst(AvroIO.toAvroRecord(st, "r")) == ((st: DataType, false))
    }

  property("value round-trip through real Avro binary is the identity") =
    forAll(schemaAndRow) { case (st, row) =>
      val schema = AvroIO.toAvroRecord(st, "r")
      val datum = AvroIO.toDatum(row, st, schema).asInstanceOf[GenericRecord]
      val back = AvroIO.fromDatum(binaryRoundTrip(datum, schema), st, schema)
      eqv(back, row)
    }
}
