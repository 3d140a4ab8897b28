package graft.core

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.types._
import scala.reflect.runtime.universe.TypeTag

/** Struct encoding for [[BoundedWindow]]: `(start, end)` longs, with the
  * global window as a sentinel interval. Lets Catalyst treat window columns
  * as plain comparable structs — shuffle keys on (key, window) become native
  * binary comparisons instead of opaque Kryo blobs (the MLlib `VectorUDT`
  * pattern).
  */
final class BoundedWindowUDT extends UserDefinedType[BoundedWindow] {
  override def sqlType: DataType =
    StructType(Seq(StructField("start", LongType), StructField("end", LongType)))
  // shared row for the (immutable) global-window encoding: downstream
  // projections copy values out, so one instance serves every row
  private val globalRow = InternalRow(Long.MinValue, Long.MaxValue)
  override def serialize(w: BoundedWindow): InternalRow = w match {
    case GlobalWindow => globalRow
    case IntervalWindow(s, e) => InternalRow(s, e)
  }
  override def deserialize(datum: Any): BoundedWindow = datum match {
    case r: InternalRow =>
      val s = r.getLong(0); val e = r.getLong(1)
      if (s == Long.MinValue && e == Long.MaxValue) GlobalWindow
      else IntervalWindow(s, e)
  }
  override def userClass: Class[BoundedWindow] = classOf[BoundedWindow]
  override def equals(o: Any): Boolean = o.isInstanceOf[BoundedWindowUDT]
  override def hashCode(): Int = classOf[BoundedWindowUDT].getName.hashCode
}

/** Encoder-or-Kryo typeclass: resolves a native Catalyst `ExpressionEncoder`
  * whenever the type is reflection-encodable (products, primitives, the
  * window UDT, and any nesting thereof), and falls back to Kryo otherwise
  * (`Any`, `Row`, `Iterable`, user classes).
  *
  * This is the dataflow layer's "product fast path": a
  * `PCollection[(String, Long)]` moves Tungsten rows
  * `struct(value, timestamp, windows, pane)` through every shuffle —
  * in-place binary comparison, no per-record Kryo of window objects — while
  * erased/opaque element types keep the old behavior. Resolution is
  * implicit-priority based: concrete types at user call sites get the native
  * encoder; generic internal code (no TypeTag) lands on the Kryo fallback.
  */
final class GEnc[X](val enc: Encoder[X], val native: Boolean) extends Serializable

trait GEncLowPriority {
  implicit def gencKryo[X]: GEnc[X] =
    new GEnc[X](Encoders.kryo(classOf[Any]).asInstanceOf[Encoder[X]], false)
}

object GEnc extends GEncLowPriority {
  implicit def gencNative[X](implicit tt: TypeTag[X]): GEnc[X] =
    try new GEnc[X](ExpressionEncoder[X](), true)
    catch { case scala.util.control.NonFatal(_) => gencKryo[X] }
}
