package graft.core

import com.esotericsoftware.kryo.{Kryo, Serializer}
import com.esotericsoftware.kryo.io.{Input, Output}
import org.apache.spark.serializer.KryoRegistrator

/** Registers the dataflow layer's envelope classes so Kryo writes small
  * class ids instead of fully-qualified class-name strings on every shuffled
  * element — the wire format of the opaque-value path (SURVEY.md §1.3 coder
  * mapping). WindowedValue gets a hand-rolled compact serializer: the
  * common shapes (global window / one interval window, default pane) cost
  * one tag byte + timestamp + value instead of nested object graphs.
  */
class GraftKryoRegistrator extends KryoRegistrator {

  private final class WindowedValueSerializer extends Serializer[WindowedValue[Any]] {
    override def write(kryo: Kryo, out: Output, wv: WindowedValue[Any]): Unit = {
      // tag: 0 = global window, 1 = single interval window, 2 = general
      val tag =
        if (wv.windows == Seq(GlobalWindow) && wv.pane == PaneInfo.NoFiring) 0
        else if (wv.windows.sizeIs == 1 && wv.windows.head.isInstanceOf[IntervalWindow]
          && wv.pane == PaneInfo.NoFiring) 1
        else 2
      out.writeByte(tag)
      out.writeVarLong(wv.timestamp, false)
      tag match {
        case 0 => ()
        case 1 =>
          val w = wv.windows.head.asInstanceOf[IntervalWindow]
          out.writeVarLong(w.start, false); out.writeVarLong(w.end, false)
        case _ =>
          kryo.writeClassAndObject(out, wv.windows)
          kryo.writeClassAndObject(out, wv.pane)
      }
      kryo.writeClassAndObject(out, wv.value)
    }
    override def read(kryo: Kryo, in: Input, t: Class[WindowedValue[Any]]): WindowedValue[Any] = {
      val tag = in.readByte()
      val ts = in.readVarLong(false)
      tag match {
        case 0 =>
          WindowedValue(kryo.readClassAndObject(in), ts, Seq(GlobalWindow))
        case 1 =>
          val s = in.readVarLong(false); val e = in.readVarLong(false)
          WindowedValue(kryo.readClassAndObject(in), ts, Seq(IntervalWindow(s, e)))
        case _ =>
          val ws = kryo.readClassAndObject(in).asInstanceOf[Seq[BoundedWindow]]
          val pane = kryo.readClassAndObject(in).asInstanceOf[PaneInfo]
          WindowedValue(kryo.readClassAndObject(in), ts, ws, pane)
      }
    }
  }

  override def registerClasses(kryo: Kryo): Unit = {
    kryo.register(classOf[WindowedValue[_]],
      new WindowedValueSerializer().asInstanceOf[Serializer[_]])
    kryo.register(classOf[IntervalWindow])
    kryo.register(GlobalWindow.getClass)
    kryo.register(classOf[PaneInfo])
    kryo.register(classOf[Array[BoundedWindow]])
    kryo.register(classOf[List[_]])
    kryo.register(classOf[Vector[_]])
    kryo.register(classOf[scala.collection.immutable.$colon$colon[_]])
    kryo.register(scala.collection.immutable.Nil.getClass)
    kryo.register(classOf[Tuple2[_, _]])
    kryo.register(classOf[Tuple3[_, _, _]])
    kryo.register(classOf[Tuple4[_, _, _, _]])
    kryo.register(classOf[Array[AnyRef]])
    kryo.register(classOf[java.lang.Long])
    kryo.register(classOf[java.lang.Double])
  }
}
