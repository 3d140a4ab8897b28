package graft.api

import graft.core._
import org.apache.spark.sql.{Dataset, Encoder, Encoders, SparkSession}
import org.apache.spark.sql.expressions.Aggregator
import scala.collection.mutable

/** A PCollection: unordered bag of windowed elements, backed by a lazy
  * `Dataset[WindowedValue[T]]` (reference model: SURVEY.md §1.1;
  * collection.py:24-35). Values are opaque (Kryo-encoded) exactly as the
  * reference moves coder-encoded bytes (execution.py:100-106); schema-full
  * relational work belongs in the DataFrame layer, this layer carries the
  * Beam-semantics surface: ParDo lifecycle, tagged outputs, side inputs,
  * GBK/Combine, windowing incl. merging, stateful ParDo with timers.
  */
final class PCollection[T](
    val pipeline: Pipeline,
    private[graft] val data: Dataset[WindowedValue[T]],
    private[graft] val windowFn: WindowFn) {

  private def spark: SparkSession = pipeline.spark
  private implicit def wvEnc[U]: Encoder[WindowedValue[U]] =
    Encoders.kryo(classOf[WindowedValue[Any]]).asInstanceOf[Encoder[WindowedValue[U]]]
  private def tupEnc[A, B]: Encoder[(A, B)] =
    Encoders.tuple(Encoders.kryo(classOf[Any]), Encoders.kryo(classOf[Any]))
      .asInstanceOf[Encoder[(A, B)]]

  private def next[U](ds: Dataset[WindowedValue[U]], wfn: WindowFn = windowFn): PCollection[U] =
    new PCollection[U](pipeline, ds, wfn)

  /** One row per (element, window) then grouped on (key, window) — the
    * shared keying step of every keyed operator.
    */
  private def keyedByWindow[K, V](implicit ev: T <:< (K, V)) = {
    val exploded = data.mapPartitions(_.flatMap(_.explode))(wvEnc[T])
    exploded.groupByKey { wv: WindowedValue[T] =>
      (ev(wv.value)._1, wv.windows.head): (K, BoundedWindow)
    }(tupEnc[K, BoundedWindow])
  }

  // -------------------------------------------------------------------------
  // ParDo family (reference: RayParDo translator.py:157-338)
  // -------------------------------------------------------------------------

  /** Full-lifecycle ParDo: one Spark partition = one bundle
    * (setup → startBundle → process* → finishBundle → teardown,
    * translator.py:208-281). Each ParDo gets a system element counter
    * (reference tracks per-PCollection element counts,
    * ray_runner_test.py:1285-1514) queryable as
    * `metrics.counterValue("graft.system", "elements.<name>")`.
    */
  def parDo[O](fn: DoFn[T, O], name: String = ""): PCollection[O] = {
    val opName = if (name.nonEmpty) name else s"op${PCollection.nextOpId()}"
    val elems = pipeline.metrics.counter("graft.system", s"elements.$opName")
    val msecs = pipeline.metrics.counter("graft.system", s"msecs.$opName")
    val ds = data.mapPartitions { it0 =>
      val t0 = System.nanoTime()
      val it = it0.map { e => elems.add(1L); e }
      Option(org.apache.spark.TaskContext.get()).foreach(_.addTaskCompletionListener(
        new org.apache.spark.util.TaskCompletionListener {
          override def onTaskCompletion(c: org.apache.spark.TaskContext): Unit =
            msecs.add((System.nanoTime() - t0) / 1000000L)
        }))
      fn.setup()
      fn.startBundle()
      val ctx = new BufferingContext[O](0L, Seq(GlobalWindow))
      val out = mutable.ArrayBuffer.empty[WindowedValue[O]]
      it.foreach { wv =>
        ctx.currentTs = wv.timestamp; ctx.currentWindows = wv.windows
        ctx.buf.clear()
        fn.process(wv.value, ctx)
        ctx.buf.foreach(o => out += o.asInstanceOf[WindowedValue[O]])
      }
      fn.finishBundle(o => out += WindowedValue.of(o))
      fn.teardown()
      // bundle finalization: after the task commits its outputs, at-least-
      // once, exceptions swallowed (execution.py:131-139)
      if (ctx.finalizers.nonEmpty) {
        val cbs = ctx.finalizers.toList
        Option(org.apache.spark.TaskContext.get()).foreach(_.addTaskCompletionListener(
          new org.apache.spark.util.TaskCompletionListener {
            override def onTaskCompletion(c: org.apache.spark.TaskContext): Unit =
              cbs.foreach(cb => try cb() catch { case _: Throwable => () })
          }))
      }
      out.iterator
    }(wvEnc[O])
    next(ds)
  }

  /** Multi-output ParDo: emits (tag, value) once, then one filter per tag
    * over a cached intermediate — the same demux strategy as the reference
    * (TaggingReceiver translator.py:180-206; demux translator.py:559-576).
    */
  def parDoTagged[O](fn: DoFn[T, O], tags: Seq[Tag[_]],
      name: String = ""): (PCollection[O], Map[String, PCollection[Any]]) = {
    val opName = if (name.nonEmpty) name else s"op${PCollection.nextOpId()}"
    val elems = pipeline.metrics.counter("graft.system", s"elements.$opName")
    val tagged: Dataset[(String, WindowedValue[Any])] = data.mapPartitions { it0 =>
      val it = it0.map { e => elems.add(1L); e }
      fn.setup(); fn.startBundle()
      val ctx = new BufferingContext[O](0L, Seq(GlobalWindow))
      val out = mutable.ArrayBuffer.empty[(String, WindowedValue[Any])]
      it.foreach { wv =>
        ctx.currentTs = wv.timestamp; ctx.currentWindows = wv.windows
        ctx.buf.clear(); ctx.taggedBuf.clear()
        fn.process(wv.value, ctx)
        ctx.buf.foreach(o => out += (("", o)))
        ctx.taggedBuf.foreach(out += _)
      }
      fn.finishBundle(o => out += (("", WindowedValue.of(o))))
      fn.teardown()
      if (ctx.finalizers.nonEmpty) {
        val cbs = ctx.finalizers.toList
        Option(org.apache.spark.TaskContext.get()).foreach(_.addTaskCompletionListener(
          new org.apache.spark.util.TaskCompletionListener {
            override def onTaskCompletion(c: org.apache.spark.TaskContext): Unit =
              cbs.foreach(cb => try cb() catch { case _: Throwable => () })
          }))
      }
      out.iterator
    }(tupEnc[String, WindowedValue[Any]]).persist()
    val main = next(tagged.filter(_._1 == "").map(_._2.asInstanceOf[WindowedValue[O]])(wvEnc[O]))
    val sides = tags.map { t =>
      t.name -> next(tagged.filter(_._1 == t.name).map(_._2)(wvEnc[Any]))
    }.toMap
    (main, sides)
  }

  def map[O](f: T => O): PCollection[O] =
    next(data.mapPartitions(_.map(wv => wv.withValue(f(wv.value))))(wvEnc[O]))

  /** Map with access to the full windowed envelope (timestamp + window) —
    * how window bounds surface into relational output.
    */
  def mapWindowed[O](f: WindowedValue[T] => O): PCollection[O] =
    next(data.mapPartitions(_.map(wv => wv.withValue(f(wv))))(wvEnc[O]))

  def flatMap[O](f: T => IterableOnce[O]): PCollection[O] =
    next(data.mapPartitions(_.flatMap(wv => f(wv.value).iterator.map(wv.withValue)))(wvEnc[O]))

  def filter(p: T => Boolean): PCollection[T] =
    next(data.filter((wv: WindowedValue[T]) => p(wv.value)))

  // -------------------------------------------------------------------------
  // Timestamps & windowing (reference: translator.py:393-416, tests §2.5)
  // -------------------------------------------------------------------------

  /** Attach event timestamps (reference TimestampedValue translator.py:62-66). */
  def withTimestamps(f: T => Long): PCollection[T] =
    next(data.mapPartitions(_.map { wv =>
      val ts = f(wv.value)
      WindowedValue(wv.value, ts, wv.windows, wv.pane)
    })(wvEnc[T]))

  /** Assign windows from the element's timestamp (reference RayWindowInto
    * translator.py:393-416 — assignment only; merging happens at GBK, like
    * Beam's GroupAlsoByWindow, overrides.py:72-79).
    */
  def windowInto(wfn: WindowFn): PCollection[T] =
    next(data.mapPartitions(_.map { wv =>
      WindowedValue(wv.value, wv.timestamp, wfn.assign(wv.timestamp), wv.pane)
    })(wvEnc[T]), wfn)

  // -------------------------------------------------------------------------
  // Grouping (reference: RayGroupByKey translator.py:341-390 + GroupAlsoByWindow)
  // -------------------------------------------------------------------------

  /** GroupByKey with full windowing semantics. Non-merging windows shuffle on
    * (key, window) — one Spark hash shuffle, no driver involvement. Merging
    * windows (Sessions / custom WindowFn) shuffle on key, then merge windows
    * inside the group (SURVEY.md §7.4). Output timestamp = window max
    * (Beam's default end-of-window timestamp combiner).
    */
  def groupByKey[K, V](implicit ev: T <:< (K, V)): PCollection[(K, Iterable[V])] = {
    val wfn = windowFn
    val exploded = data.mapPartitions(_.flatMap(_.explode))(wvEnc[T])
    val ds: Dataset[WindowedValue[(K, Iterable[V])]] =
      if (!wfn.isMerging) {
        keyedByWindow[K, V]
          .mapGroups { (kw: (K, BoundedWindow), it: Iterator[WindowedValue[T]]) =>
            val (k, w) = kw
            val vs: Iterable[V] = it.map(wv => ev(wv.value)._2).toList
            WindowedValue((k, vs), w.maxTimestamp, Seq(w))
          }(wvEnc[(K, Iterable[V])])
      } else {
        exploded
          .groupByKey((wv: WindowedValue[T]) => ev(wv.value)._1.asInstanceOf[Any])(
            Encoders.kryo(classOf[Any]))
          .flatMapGroups { (k: Any, it: Iterator[WindowedValue[T]]) =>
            val elems = it.toVector
            val mapping = wfn.mergeWindows(elems.map(_.windows.head))
            elems
              .groupBy(wv => mapping(wv.windows.head))
              .iterator.map { case (mw, group) =>
                val vs: Iterable[V] = group.map(wv => ev(wv.value)._2).toList
                WindowedValue((k.asInstanceOf[K], vs), mw.maxTimestamp, Seq(mw))
              }
          }(wvEnc[(K, Iterable[V])])
      }
    next(ds)
  }

  /** Keyed combine via a Spark `Aggregator` — Catalyst plans partial
    * (map-side) + final aggregation, which is exactly the reference's
    * `lift_combiners` optimization (ray_fn_runner.py:178) done natively.
    */
  def combinePerKey[K, V, A, O](fn: CombineFn[V, A, O])(
      implicit ev: T <:< (K, V)): PCollection[(K, O)] = {
    val wfn = windowFn
    if (!wfn.isMerging) {
      val agg = new Aggregator[WindowedValue[T], A, O] {
        def zero: A = fn.createAccumulator()
        def reduce(a: A, wv: WindowedValue[T]): A = fn.addInput(a, ev(wv.value)._2)
        def merge(a: A, b: A): A = fn.mergeAccumulators(a, b)
        def finish(a: A): O = fn.extractOutput(a)
        def bufferEncoder: Encoder[A] = Encoders.kryo(classOf[Any]).asInstanceOf[Encoder[A]]
        def outputEncoder: Encoder[O] = Encoders.kryo(classOf[Any]).asInstanceOf[Encoder[O]]
      }
      val ds = keyedByWindow[K, V]
        .agg(agg.toColumn)
        .map { case ((k, w), o) => WindowedValue((k, o), w.maxTimestamp, Seq(w)) }(
          wvEnc[(K, O)])
      next(ds)
    } else {
      // merging windows: group by key, merge windows, fold in-group
      groupByKey[K, V].map { case (k, vs) =>
        val acc = vs.foldLeft(fn.createAccumulator())(fn.addInput)
        (k, fn.extractOutput(acc))
      }
    }
  }

  /** Global combine (reference: CombineGlobally tests
    * ray_runner_test.py:1113-1185). Partial per-partition accumulation is
    * automatic via the Aggregator; keyed by window to stay correct under
    * windowing.
    */
  def combineGlobally[A, O](fn: CombineFn[T, A, O]): PCollection[O] =
    map(v => ((), v)).combinePerKey[Unit, T, A, O](fn).map(_._2)

  /** Per-key count — common composite. */
  def countPerKey[K, V](implicit ev: T <:< (K, V)): PCollection[(K, Long)] =
    combinePerKey[K, V, Long, Long](new CombineFn[V, Long, Long] {
      def createAccumulator(): Long = 0L
      def addInput(acc: Long, i: V): Long = acc + 1
      def mergeAccumulators(a: Long, b: Long): Long = a + b
      def extractOutput(acc: Long): Long = acc
    })

  // -------------------------------------------------------------------------
  // Set-ish ops (reference: RayFlatten translator.py:419-433, Reshuffle :147-154)
  // -------------------------------------------------------------------------

  /** Flatten/union; heterogeneous element types are legal because values are
    * opaque (reference transcoding test ray_runner_test.py:838-850). Spark's
    * UnionExec is a zero-shuffle partition concat — no `repartition(1)` like
    * the reference needs (translator.py:426).
    */
  def union(others: PCollection[T]*): PCollection[T] =
    next(others.foldLeft(data)((d, o) => d.union(o.data)))

  /** Redistribute (reference random_shuffle translator.py:147-154); Spark
    * lineage makes the checkpoint-barrier purpose unnecessary — this is a
    * plain round-robin repartition.
    */
  def reshuffle(numPartitions: Int = -1): PCollection[T] =
    next(if (numPartitions > 0) data.repartition(numPartitions)
    else data.repartition(data.sparkSession.sessionState.conf.numShufflePartitions))

  /** CoGroupByKey (reference declares it via composite expansion,
    * translator.py:446). Non-merging windows use Spark's native
    * `KeyValueGroupedDataset.cogroup` — one shuffle per side, no tagging
    * wrapper re-serialization; merging windows fall back to the
    * tag+flatten+GBK composite.
    */
  def coGroupByKey[K, V, W](other: PCollection[(K, W)])(
      implicit ev: T <:< (K, V)): PCollection[(K, (Iterable[V], Iterable[W]))] = {
    val wfn = windowFn
    if (!wfn.isMerging && !other.windowFn.isMerging) {
      val lg = keyedByWindow[K, V]
      val rg = other.keyedByWindow[K, W]
      val ds = lg.cogroup(rg) { (kw, ls, rs) =>
        val (k, w) = kw
        val vs: Iterable[V] = ls.map(wv => ev(wv.value)._2).toList
        val ws: Iterable[W] = rs.map(_.value._2).toList
        Iterator.single(WindowedValue((k, (vs, ws)), w.maxTimestamp, Seq(w)))
      }(wvEnc[(K, (Iterable[V], Iterable[W]))])
      next(ds)
    } else {
      // merging windows: group the union under the MERGING side's windowFn
      // so both inputs' windows merge together (Beam CoGBK requires
      // compatible windowing across inputs; mixing two different merging
      // fns is rejected)
      val mergingWfn =
        if (wfn.isMerging && other.windowFn.isMerging) {
          require(wfn == other.windowFn,
            s"coGroupByKey inputs have incompatible merging WindowFns: $wfn vs ${other.windowFn}")
          wfn
        } else if (wfn.isMerging) wfn else other.windowFn
      val left: PCollection[(K, Either[V, W])] =
        map { t => val kv = ev(t); (kv._1, Left(kv._2): Either[V, W]) }
      val right: PCollection[(K, Either[V, W])] =
        other.map { case (k, w) => (k, Right(w): Either[V, W]) }
      new PCollection(pipeline, left.data.union(right.data), mergingWfn)
        .groupByKey[K, Either[V, W]].map { case (k, es) =>
          val vs = es.collect { case Left(v) => v }
          val ws = es.collect { case Right(w) => w }
          (k, (vs, ws))
        }
    }
  }

  /** Distinct elements (engine extension; reference has no translated
    * Distinct — SURVEY.md §2.3 note).
    */
  def distinct(): PCollection[T] =
    map(v => (v, ())).groupByKey[T, Unit].map(_._1)

  // --- Beam library composites (KV helpers, Top/Mean/Sum analogs) ---

  def keys[K, V](implicit ev: T <:< (K, V)): PCollection[K] = map(t => ev(t)._1)
  def values[K, V](implicit ev: T <:< (K, V)): PCollection[V] = map(t => ev(t)._2)
  def mapValues[K, V, W](f: V => W)(implicit ev: T <:< (K, V)): PCollection[(K, W)] =
    map { t => val kv = ev(t); (kv._1, f(kv._2)) }
  def flatMapValues[K, V, W](f: V => IterableOnce[W])(
      implicit ev: T <:< (K, V)): PCollection[(K, W)] =
    flatMap { t => val kv = ev(t); f(kv._2).iterator.map(w => (kv._1, w)) }
  def withKeys[K](f: T => K): PCollection[(K, T)] = map(t => (f(t), t))
  def swap[K, V](implicit ev: T <:< (K, V)): PCollection[(V, K)] =
    map { t => val kv = ev(t); (kv._2, kv._1) }

  /** Largest n elements (Beam Top.largest composite). */
  def top(n: Int)(implicit ord: Ordering[T]): PCollection[Seq[T]] =
    combineGlobally(new CombineFn[T, List[T], Seq[T]] {
      def createAccumulator(): List[T] = Nil
      def addInput(acc: List[T], v: T): List[T] = (v :: acc).sorted(ord.reverse).take(n)
      def mergeAccumulators(a: List[T], b: List[T]): List[T] =
        (a ++ b).sorted(ord.reverse).take(n)
      def extractOutput(acc: List[T]): Seq[T] = acc
    })

  /** Batches of at most `batchSize` values per key — the model-inference
    * batching primitive of a training-data pipeline (Beam GroupIntoBatches).
    * Each (key, window) group emits ceil(n/batchSize) batches.
    */
  def groupIntoBatches[K, V](batchSize: Int)(
      implicit ev: T <:< (K, V)): PCollection[(K, Seq[V])] = {
    require(batchSize > 0)
    groupByKey[K, V].flatMap { case (k, vs) =>
      vs.iterator.grouped(batchSize).map(b => (k, b.toSeq))
    }
  }

  def sumPerKey[K](implicit ev: T <:< (K, Double)): PCollection[(K, Double)] =
    combinePerKey[K, Double, Double, Double](new CombineFn[Double, Double, Double] {
      def createAccumulator(): Double = 0.0
      def addInput(a: Double, v: Double): Double = a + v
      def mergeAccumulators(a: Double, b: Double): Double = a + b
      def extractOutput(a: Double): Double = a
    })

  // -------------------------------------------------------------------------
  // Side inputs (reference: translator.py:506-524, execution.py:469-525;
  // tests ray_runner_test.py:163-361)
  // -------------------------------------------------------------------------

  private def collectByWindow(): Map[BoundedWindow, Seq[WindowedValue[T]]] =
    data.collect().toSeq.flatMap(_.explode).groupBy(_.windows.head)

  private def view[S](materialize: Seq[WindowedValue[T]] => S, empty: () => S): SideInputView[S] = {
    val byWindow: Map[BoundedWindow, S] =
      collectByWindow().map { case (w, wvs) => w -> materialize(wvs) }
    val bc = spark.sparkContext.broadcast(byWindow)
    val sideWfn = windowFn
    new SideInputView[S](SideInputView.nextId(), { mainWin =>
      val m = bc.value
      // Window mapping (reference windowed side inputs
      // ray_runner_test.py:220-251): global side serves all windows; else the
      // side window containing the main window's max timestamp.
      m.get(GlobalWindow)
        .orElse {
          val ts = mainWin.maxTimestamp
          m.collectFirst {
            case (iw: IntervalWindow, s) if iw.start <= ts && ts < iw.end => s
          }
        }
        .orElse(sideWfn.assign(mainWin.maxTimestamp).headOption.flatMap(m.get))
        .getOrElse(empty())
    })
  }

  /** AsList (broadcast; the Spark analog of the reference's IterableSideInput
    * state commit, execution.py:493-521).
    */
  def asList: SideInputView[Seq[T]] = view(_.map(_.value), () => Seq.empty)
  def asIterable: SideInputView[Iterable[T]] = view(_.map(_.value), () => Seq.empty)
  /** Exactly-one-element view. */
  def asSingleton: SideInputView[T] =
    view(wvs => { require(wvs.size == 1, s"singleton side input had ${wvs.size} elements"); wvs.head.value },
      () => throw new IllegalStateException("empty singleton side input"))
  def asDict[K, V](implicit ev: T <:< (K, V)): SideInputView[Map[K, V]] =
    view(_.map(wv => ev(wv.value)).toMap, () => Map.empty)
  /** AsMultimap (reference MultimapSideInput execution.py:493-525). */
  def asMultimap[K, V](implicit ev: T <:< (K, V)): SideInputView[Map[K, Seq[V]]] =
    view(_.map(wv => ev(wv.value)).groupBy(_._1).map { case (k, kvs) => k -> kvs.map(_._2) },
      () => Map.empty)

  // -------------------------------------------------------------------------
  // Stateful ParDo (batch watermark sweep — SURVEY.md §7.1-4; the streaming
  // variant lives in graft.streaming)
  // -------------------------------------------------------------------------

  /** Stateful ParDo keyed by (key, window): state cells + event-time timer
    * heap. Batch semantics = the reference's end-of-input timer loop
    * (ray_fn_runner.py:268-297): elements process in timestamp order, then
    * the watermark jumps to +inf and pending timers fire in (ts, name, tag)
    * order; timer callbacks may set further timers (re-fire chain test
    * ray_runner_test.py:428-459).
    */
  def statefulParDo[K, V, O](fn: StatefulDoFn[K, V, O])(
      implicit ev: T <:< (K, V)): PCollection[O] = {
    val ds = keyedByWindow[K, V]
      .flatMapGroups { (kw: (K, BoundedWindow), it: Iterator[WindowedValue[T]]) =>
        PCollection.runStatefulGroup(fn, kw._1, kw._2,
          it.map(wv => (ev(wv.value)._2, wv.timestamp)))
      }(wvEnc[O])
    next(ds)
  }

  // -------------------------------------------------------------------------
  // Materialization / bridges
  // -------------------------------------------------------------------------

  def collect(): Seq[T] = data.collect().toSeq.map(_.value)

  def collectAsMultiset(): Map[T, Int] =
    collect().groupBy(identity).map { case (k, vs) => k -> vs.size }
  def collectWindowed(): Seq[WindowedValue[T]] = data.collect().toSeq
  def count(): Long = data.count()

  /** Bridge back to a typed Dataset (drops window metadata). */
  def toDataset(implicit enc: Encoder[T]): Dataset[T] =
    data.mapPartitions(_.map(_.value))(enc)

  /** Typed Dataset of (value, timestampMillis). */
  def toTimestampedDataset(implicit enc: Encoder[(T, Long)]): Dataset[(T, Long)] =
    data.mapPartitions(_.map(wv => (wv.value, wv.timestamp)))(enc)

  /** Escape hatch into codegen land mid-pipeline: run a typed Dataset
    * transformation (full Catalyst/Tungsten optimization) and come back to
    * the dataflow layer. Window metadata resets to the global window — use
    * before windowing or re-assign after.
    */
  def viaDataset[U](f: Dataset[T] => Dataset[U])(implicit enc: Encoder[T]): PCollection[U] =
    pipeline.fromDataset(f(toDataset))

  /** Line-oriented text sink (reference WriteToText analog,
    * examples/word_count_metrics.py:134).
    */
  def writeText(path: String)(implicit ev: T <:< String): Unit =
    toDataset(Encoders.STRING.asInstanceOf[Encoder[T]])
      .write.mode("overwrite").text(path)
}

private[graft] object PCollection {

  private val opCounter = new java.util.concurrent.atomic.AtomicInteger(0)
  def nextOpId(): Int = opCounter.incrementAndGet()

  /** Per-(key, window) context; top-level class so Spark closures carry no
    * reference to the (non-serializable) PCollection instance.
    */
  private final class GroupContext[O](k: Any, w: BoundedWindow, cells: StateCells)
    extends StatefulContext[O] {
    var curTs: Long = 0L
    val out = mutable.ArrayBuffer.empty[WindowedValue[O]]
    def key: Any = k
    def window: BoundedWindow = w
    def timestamp: Long = curTs
    def output(o: O): Unit = out += WindowedValue(o, curTs, Seq(w))
    def outputWithTimestamp(o: O, ts: Long): Unit = out += WindowedValue(o, ts, Seq(w))
    def bag[U](spec: BagStateSpec[U]): BagState[U] = cells.bag(spec)
    def value[U](spec: ValueStateSpec[U]): ValueState[U] = cells.value(spec)
    def combining[I, A, OO](spec: CombiningStateSpec[I, A, OO]): CombiningState[I, OO] =
      cells.combining(spec)
    def timer(spec: TimerSpec): Timer = cells.timer(spec)
  }

  /** Batch stateful sweep for one (key, window) group: elements in timestamp
    * order, then end-of-input timer pop-min loop (SURVEY.md §7.1-4; mirrors
    * the reference's bundle re-feed loop ray_fn_runner.py:268-297).
    */
  def runStatefulGroup[K, V, O](
      fn: StatefulDoFn[K, V, O], k: K, w: BoundedWindow,
      elems: Iterator[(V, Long)]): Iterator[WindowedValue[O]] = {
    val cells = new StateCells
    val ctx = new GroupContext[O](k, w, cells)
    elems.toVector.sortBy(_._2).foreach { case (v, ts) =>
      ctx.curTs = ts
      fn.process(k, v, ctx)
    }
    while (cells.timers.nonEmpty) {
      val ((name, tag), ts) = cells.timers.minBy { case ((n, t), ts0) => (ts0, n, t) }
      cells.timers.remove((name, tag))
      ctx.curTs = ts
      fn.onTimer(k, TimerSpec(name), tag, ts, ctx)
    }
    ctx.out.iterator
  }
}
