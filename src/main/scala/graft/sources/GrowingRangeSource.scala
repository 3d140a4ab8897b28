package graft.sources

import java.util
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset, ReadLimit, ReadMaxRows, SupportsAdmissionControl}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** DataSource V2 micro-batch source over a GROWING offset range — the
  * engine's analog of the reference's SDF checkpoint/resume machinery
  * (SURVEY.md §2.7; reference `defer_remainder`/residual re-queue,
  * execution.py:211-241, tests ray_runner_test.py:724-762):
  *
  *  - the *restriction* is the offset range `[0, N)` where `N` is read from
  *    a control file that an external writer advances (the growing input);
  *  - `latestOffset` claims the unprocessed remainder — bounded by
  *    `maxRowsPerBatch` (admission control), which is the runner-side
  *    truncation of a claim exactly where the reference defers the
  *    remainder of a restriction to a later bundle;
  *  - Spark's offset log persists the claimed position, so a stopped query
  *    restarted from the same checkpoint resumes from the committed offset —
  *    the residual is re-queued, never re-read (at-least-once becomes
  *    exactly-once through the commit log);
  *  - `planInputPartitions` splits each claimed span into `numPartitions`
  *    sub-ranges — initial splitting for parallelism, like the SDF's
  *    `split` (ray_runner_test.py:604-655);
  *  - truncate-on-drain (reference `OffsetRangeProviderWithTruncate`,
  *    ray_runner_test.py:764-819, :2017-2024): writing `drain <N>` into the
  *    control file freezes the range at N — `latestOffset` stops growing,
  *    every in-flight claim completes, the stream quiesces at a clean
  *    offset, and the published data stays readable (drain truncates
  *    growth, it does not zero the range).
  *
  * Options: `controlPath` (required — text file holding the current range
  * end `<N>`, or `drain <N>` to freeze), `numPartitions` (default 4),
  * `maxRowsPerBatch` (default unlimited). Schema: `value BIGINT`.
  *
  * Usage: `spark.readStream.format("graft.sources.GrowingRangeSource")
  * .option("controlPath", f).load()`.
  */
class GrowingRangeSource extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    GrowingRangeSource.schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new GrowingRangeTable(properties)
}

object GrowingRangeSource {
  val schema: StructType = StructType(Seq(StructField("value", LongType, nullable = false)))

  /** Current committed end of the range. Control file grammar:
    * `<N>` publishes end N; `drain <N>` freezes the range AT N (truncate on
    * drain: the published data stays readable, growth stops — reference
    * `OffsetRangeProviderWithTruncate` freezes, it does not zero); bare
    * `drain` (or a missing/garbled file) freezes at `fallback`.
    */
  def readControl(path: String, fallback: Long): Long =
    try {
      val toks = new String(java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get(path))).trim.split("\\s+")
      toks match {
        case Array(n) if !n.equalsIgnoreCase("drain") => n.toLong
        case Array(d, n) if d.equalsIgnoreCase("drain") => n.toLong
        case _ => fallback
      }
    } catch { case _: Exception => fallback }
}

final class GrowingRangeTable(properties: util.Map[String, String])
  extends Table with SupportsRead {
  override def name(): String = s"graft-growing-range(${properties.get("controlpath")})"
  override def schema(): StructType = GrowingRangeSource.schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.MICRO_BATCH_READ, TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder with Scan {
      override def build(): Scan = this
      override def readSchema(): StructType = GrowingRangeSource.schema
      override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
        new GrowingRangeMicroBatchStream(
          options.get("controlPath"),
          options.getInt("numPartitions", 4),
          options.getLong("maxRowsPerBatch", Long.MaxValue))
      override def toBatch: Batch = new Batch {
        private val end = GrowingRangeSource.readControl(options.get("controlPath"), 0L)
        private val n = math.max(1, options.getInt("numPartitions", 4))
        override def planInputPartitions(): Array[InputPartition] =
          GrowingRangeMicroBatchStream.splitRange(0L, end, n)
        override def createReaderFactory(): PartitionReaderFactory =
          GrowingRangePartitionReaderFactory
      }
    }
}

/** Offset = how far into the range the stream has claimed. */
final case class RangeOffset(end: Long) extends Offset {
  override def json(): String = end.toString
}

final class GrowingRangeMicroBatchStream(
    controlPath: String, numPartitions: Int, maxRowsPerBatch: Long)
  extends MicroBatchStream with SupportsAdmissionControl {

  require(controlPath != null, "graft-range source requires option controlPath")

  override def initialOffset(): Offset = RangeOffset(0L)
  override def deserializeOffset(json: String): Offset = RangeOffset(json.toLong)

  /** Unbounded claim (no admission control): everything the control file
    * has published.
    */
  override def latestOffset(): Offset =
    throw new UnsupportedOperationException(
      "latestOffset(Offset, ReadLimit) is used (SupportsAdmissionControl)")

  override def getDefaultReadLimit: ReadLimit =
    if (maxRowsPerBatch == Long.MaxValue) ReadLimit.allAvailable()
    else ReadLimit.maxRows(maxRowsPerBatch)

  /** Claim the next span of the restriction: up to the published end,
    * truncated by the read limit — the `defer_remainder` point.
    */
  override def latestOffset(startOffset: Offset, limit: ReadLimit): Offset = {
    val start = startOffset.asInstanceOf[RangeOffset].end
    val published = math.max(GrowingRangeSource.readControl(controlPath, start), start)
    limit match {
      case mr: ReadMaxRows => RangeOffset(math.min(published, start + mr.maxRows()))
      case _ => RangeOffset(published)
    }
  }

  override def reportLatestOffset(): Offset =
    RangeOffset(GrowingRangeSource.readControl(controlPath, 0L))

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] =
    GrowingRangeMicroBatchStream.splitRange(
      start.asInstanceOf[RangeOffset].end, end.asInstanceOf[RangeOffset].end,
      numPartitions)

  override def createReaderFactory(): PartitionReaderFactory =
    GrowingRangePartitionReaderFactory

  override def commit(end: Offset): Unit = () // offset log is the commit
  override def stop(): Unit = ()
}

object GrowingRangeMicroBatchStream {
  /** Split `[start, end)` into up to `n` contiguous sub-ranges (SDF initial
    * splitting).
    */
  def splitRange(start: Long, end: Long, n: Int): Array[InputPartition] = {
    val total = math.max(0L, end - start)
    if (total == 0) Array.empty
    else {
      val k = math.min(n.toLong, total).toInt
      val step = total / k
      (0 until k).map { i =>
        val s = start + i * step
        val e = if (i == k - 1) end else s + step
        RangePartition(s, e): InputPartition
      }.toArray
    }
  }
}

final case class RangePartition(start: Long, end: Long) extends InputPartition

object GrowingRangePartitionReaderFactory extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[RangePartition]
    new PartitionReader[InternalRow] {
      // the claim loop: monotone positions over the assigned sub-range
      private var pos = p.start - 1
      override def next(): Boolean = { pos += 1; pos < p.end }
      override def get(): InternalRow = new GenericInternalRow(Array[Any](pos))
      override def close(): Unit = ()
    }
  }
}
