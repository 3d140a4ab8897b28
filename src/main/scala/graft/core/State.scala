package graft.core

import scala.collection.mutable

/** State & timer specs for stateful ParDo (reference surface:
  * BagStateSpec / CombiningValueStateSpec / ReadModifyWriteStateSpec and
  * event-time TimerSpecs with dynamic tags + clears —
  * ray_runner_test.py:363-602, state backend portability/state.py:58-134,
  * timer loop ray_fn_runner.py:385-459).
  *
  * Spark mapping: in batch, state lives in-memory per (key, window) group
  * during a `mapGroups` sweep; in streaming it is the case-class state of
  * `flatMapGroupsWithState` persisted in the state store. Timers are kept as
  * a heap *inside* the state because Spark exposes only a single timeout per
  * key (SURVEY.md §7.4).
  */
sealed trait StateSpec[T] extends Serializable { def name: String }
final case class BagStateSpec[T](name: String) extends StateSpec[T]
final case class ValueStateSpec[T](name: String) extends StateSpec[T]
final case class CombiningStateSpec[I, A, O](name: String, fn: CombineFn[I, A, O])
  extends StateSpec[O]

final case class TimerSpec(name: String) extends Serializable

/** Runtime handle for a bag state cell (append/read/clear —
  * reference test ray_runner_test.py:508-575).
  */
trait BagState[T] { def add(t: T): Unit; def read(): Iterable[T]; def clear(): Unit }
/** Read-modify-write cell (ray_runner_test.py:364-379). */
trait ValueState[T] { def write(t: T): Unit; def read(): Option[T]; def clear(): Unit }
/** Combining cell (ray_runner_test.py:363-393). */
trait CombiningState[I, O] { def add(i: I): Unit; def read(): O; def clear(): Unit }

/** Timer handle. Setting overwrites; dynamic tags give one logical timer per
  * (spec, tag) (ray_runner_test.py:577-602); clear cancels
  * (ray_runner_test.py:461-497).
  */
trait Timer {
  def set(fireTsMillis: Long): Unit
  def setWithTag(tag: String, fireTsMillis: Long): Unit
  def clear(): Unit
  def clearTag(tag: String): Unit
}

/** Context available inside a stateful DoFn's process/onTimer. */
trait StatefulContext[O] {
  def key: Any
  def window: BoundedWindow
  def timestamp: Long
  def output(o: O): Unit
  def outputWithTimestamp(o: O, ts: Long): Unit
  def bag[T](spec: BagStateSpec[T]): BagState[T]
  def value[T](spec: ValueStateSpec[T]): ValueState[T]
  def combining[I, A, OO](spec: CombiningStateSpec[I, A, OO]): CombiningState[I, OO]
  def timer(spec: TimerSpec): Timer
}

/** Stateful DoFn: per-(key, window) state cells + event-time timers.
  * Processing-time timers are rejected, matching the reference
  * (ray_fn_runner.py:98-100 allows EVENT_TIME only).
  */
trait StatefulDoFn[K, I, O] extends Serializable {
  def process(key: K, element: I, ctx: StatefulContext[O]): Unit
  /** Called when an event-time timer fires; `tag` is the dynamic timer tag
    * ("" for plain timers), `fireTs` the timer's firing timestamp.
    */
  def onTimer(key: K, spec: TimerSpec, tag: String, fireTs: Long, ctx: StatefulContext[O]): Unit = ()
}

// ---------------------------------------------------------------------------
// In-memory state cell implementation shared by the batch sweep runner and
// the streaming flatMapGroupsWithState wrapper (which persists `cells` and
// `timers` in the group state).
// ---------------------------------------------------------------------------
private[graft] final class StateCells extends Serializable {
  val cells: mutable.Map[String, Any] = mutable.Map.empty
  /** (timerName, tag) -> fire timestamp; the in-state timer heap. */
  val timers: mutable.Map[(String, String), Long] = mutable.Map.empty

  def bag[T](spec: BagStateSpec[T]): BagState[T] = new BagState[T] {
    private def cur: mutable.ArrayBuffer[T] =
      cells.getOrElseUpdate(spec.name, mutable.ArrayBuffer.empty[T])
        .asInstanceOf[mutable.ArrayBuffer[T]]
    def add(t: T): Unit = cur += t
    // read must NOT materialize an empty cell: the streaming wrapper
    // persists `cells`, so a read-only key would otherwise carry state
    // forever and the store would grow with every key ever observed
    def read(): Iterable[T] = cells.get(spec.name) match {
      case Some(b) => b.asInstanceOf[mutable.ArrayBuffer[T]].toList
      case None => Nil
    }
    def clear(): Unit = cells.remove(spec.name)
  }
  def value[T](spec: ValueStateSpec[T]): ValueState[T] = new ValueState[T] {
    def write(t: T): Unit = cells(spec.name) = t
    def read(): Option[T] = cells.get(spec.name).map(_.asInstanceOf[T])
    def clear(): Unit = cells.remove(spec.name)
  }
  def combining[I, A, O](spec: CombiningStateSpec[I, A, O]): CombiningState[I, O] =
    new CombiningState[I, O] {
      private def acc: A =
        cells.getOrElse(spec.name, spec.fn.createAccumulator()).asInstanceOf[A]
      def add(i: I): Unit = cells(spec.name) = spec.fn.addInput(acc, i)
      def read(): O = spec.fn.extractOutput(acc)
      def clear(): Unit = cells.remove(spec.name)
    }
  def timer(spec: TimerSpec): Timer = new Timer {
    def set(ts: Long): Unit = timers((spec.name, "")) = ts
    def setWithTag(tag: String, ts: Long): Unit = timers((spec.name, tag)) = ts
    def clear(): Unit = timers.remove((spec.name, ""))
    def clearTag(tag: String): Unit = timers.remove((spec.name, tag))
  }
}
