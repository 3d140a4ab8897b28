package graft.core

import com.esotericsoftware.kryo.Kryo
import org.apache.spark.serializer.KryoRegistrator

/** Registers the dataflow layer's envelope classes so Kryo writes small
  * class ids instead of fully-qualified class-name strings on every shuffled
  * element — the wire format of the opaque-value path (SURVEY.md §1.3 coder
  * mapping).
  */
class GraftKryoRegistrator extends KryoRegistrator {
  override def registerClasses(kryo: Kryo): Unit = {
    kryo.register(classOf[WindowedValue[_]])
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
