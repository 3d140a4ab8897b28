package graft

import java.nio.file.Files

import scala.jdk.CollectionConverters._

import graft.operators.ScaleOps
import graft.plans.NativeExpressions
import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{Path => HPath}
import org.apache.parquet.hadoop.ParquetFileReader
import org.apache.parquet.hadoop.util.HadoopInputFile
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.functions._

/** Data-layout operators: the z-order clustered write and the bloom-indexed
  * export. The battery rows (d136/d137) pin content fidelity against the
  * DuckDB oracle; these tests pin the part an output-content oracle cannot
  * see — that the LAYOUT actually buys row-group skipping. "Buys" is
  * MEASURED from the scan's numOutputRows metric (rows surviving parquet
  * row-group/page pruning, before Spark's re-applied filter), comparing the
  * clustered layout against a round-robin twin of identical content.
  */
class ZOrderLayoutSpec extends SparkTestBase {

  private val d = "/root/testdata/sf0.001"

  /** Sum of numOutputRows over the plan's parquet scans, post-execution. */
  private def scannedRows(df: DataFrame): Long = {
    df.queryExecution.toRdd.foreach(_ => ())
    def scans(p: SparkPlan): Seq[FileSourceScanExec] = p match {
      case a: AdaptiveSparkPlanExec => scans(a.executedPlan)
      case s: FileSourceScanExec => Seq(s)
      case other => other.children.flatMap(scans)
    }
    scans(df.queryExecution.executedPlan).map(_.metrics("numOutputRows").value).sum
  }

  test("zorderKey matches an independent bit-interleave reference") {
    val sp = spark; import sp.implicits._
    val ref = (x: Long, y: Long) => {
      val mask = (1L << 21) - 1
      (0 until 21).foldLeft(0L) { (z, i) =>
        z | (((x & mask) >> i) & 1L) << (2 * i) | (((y & mask) >> i) & 1L) << (2 * i + 1)
      }
    }
    val samples = Seq((0L, 0L), (1L, 0L), (0L, 1L), (mask21, mask21),
      (123456L, 654321L), (mask21 + 5L, 7L), (-1L, 2L))
    val got = samples.toDF("x", "y")
      .select(NativeExpressions.zorderKey(Seq(col("x"), col("y"))).as("z"))
      .as[Long].collect().toSeq
    assert(got == samples.map { case (x, y) => ref(x, y) },
      s"expression disagrees with reference on $samples")
    // interleave is order-preserving per dim at fixed other-dims: x < x'
    // with equal y must give z < z' (the property range pruning relies on)
    assert(ref(10, 99) < ref(11, 99) && ref(500, 3) < ref(501, 3))
  }
  private val mask21 = (1L << 21) - 1

  test("zorderKey: null dim -> null key; >2 dims place bits round-robin") {
    val sp = spark; import sp.implicits._
    val z3 = Seq((1L, 1L, 1L)).toDF("a", "b", "c")
      .select(NativeExpressions.zorderKey(Seq(col("a"), col("b"), col("c"))).as("z"))
      .as[Long].head()
    assert(z3 == 7L, s"bit 0 of three dims must land at output bits 0,1,2: $z3")
    val withNull = Seq((Some(1L), Option.empty[Long])).toDF("a", "b")
      .select(NativeExpressions.zorderKey(Seq(col("a"), col("b"))).as("z"))
      .collect().head
    assert(withNull.isNullAt(0), "null dimension must yield a null key")
  }

  test("z-order layout prunes row groups a round-robin layout cannot") {
    val root = Files.createTempDirectory("graft-zorder-spec").toString
    val data = Tables.lineitem(spark, d)
      .select(col("l_orderkey"), col("l_partkey"), col("l_quantity"))
    ScaleOps.writeZOrdered(data, Seq("l_orderkey", "l_partkey"),
      s"$root/zorder", numFiles = 64)
    // round-robin twin: identical rows, every file spans the full range of
    // both keys, so footer min/max can exclude nothing
    data.repartition(64).write.parquet(s"$root/shuffled")

    // a ~10% x ~10% box on the two clustered dims
    val boxFilter = (df: DataFrame) => df.filter(
      col("l_orderkey").between(100, 250) && col("l_partkey").between(20, 40))
    val zRead = spark.read.parquet(s"$root/zorder")
    val sRead = spark.read.parquet(s"$root/shuffled")

    // identical query results on both layouts (layout must never change WHAT)
    assertMultiset(
      boxFilter(zRead).collect().map(r => (r.getLong(0), r.getLong(1))).toSeq,
      boxFilter(sRead).collect().map(r => (r.getLong(0), r.getLong(1))).toSeq)

    val zScanned = scannedRows(boxFilter(zRead))
    val sScanned = scannedRows(boxFilter(sRead))
    val total = data.count()
    assert(sScanned == total,
      s"round-robin layout should scan everything: $sScanned of $total")
    assert(zScanned * 4 <= sScanned,
      s"z-order layout should scan <= 1/4 of the round-robin rows " +
        s"(got $zScanned vs $sScanned)")
    deleteRecursively(root)
  }

  test("writeSorted: total order across files, sorted within, range scan prunes") {
    val root = Files.createTempDirectory("graft-sorted-spec").toString
    val data = Tables.lineitem(spark, d)
      .select(col("l_orderkey"), col("l_extendedprice"))
    ScaleOps.writeSorted(data, Seq("l_orderkey"), s"$root/sorted", numFiles = 16)
    data.repartition(16).write.parquet(s"$root/shuffled")

    // content preserved row-for-row
    val read = spark.read.parquet(s"$root/sorted")
    assert(read.count() == data.count())
    assert(read.except(data).isEmpty && data.except(read).isEmpty)

    // every file internally sorted, and file fences form a TOTAL order:
    // part files sort lexicographically in partition order, so
    // max(file_i) <= min(file_{i+1})
    val parts = new java.io.File(s"$root/sorted").listFiles
      .filter(_.getName.endsWith(".parquet")).sortBy(_.getName)
    assert(parts.length > 4, s"expected several part files, got ${parts.length}")
    val fences = parts.toSeq.map { f =>
      val ks = spark.read.parquet(f.getAbsolutePath)
        .select(col("l_orderkey")).collect().map(_.getLong(0))
      assert(ks.sameElements(ks.sorted), s"${f.getName} not internally sorted")
      (ks.min, ks.max)
    }
    fences.sliding(2).foreach {
      case Seq((_, prevMax), (nextMin, _)) =>
        assert(prevMax <= nextMin,
          s"file fences overlap: max $prevMax > next min $nextMin")
      case _ =>
    }

    // the layout's point: a narrow range reads a few files' rows, the
    // round-robin twin reads everything
    val range = (df: DataFrame) =>
      df.filter(col("l_orderkey").between(100, 250))
    assertMultiset(
      range(spark.read.parquet(s"$root/sorted"))
        .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq,
      range(spark.read.parquet(s"$root/shuffled"))
        .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq)
    // FRESH plans for the metric reads: numOutputRows accumulates across
    // executions of one DataFrame instance, so reusing the collect()'d
    // frames would double-count
    val pruned = scannedRows(range(spark.read.parquet(s"$root/sorted")))
    val full = scannedRows(range(spark.read.parquet(s"$root/shuffled")))
    assert(full == data.count(), s"twin should scan everything: $full")
    assert(pruned * 4 <= full,
      s"sorted layout should scan <= 1/4 of the twin (got $pruned vs $full)")
    deleteRecursively(root)
  }

  test("bloom export: footer carries the filter; point lookup skips row groups") {
    val root = Files.createTempDirectory("graft-bloom-spec").toString
    val data = Tables.orders(spark, d)
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
    // several row groups: repartition so each file's bloom covers few keys
    ScaleOps.writeWithBloomFilters(data.repartitionByRange(8, col("o_orderkey")),
      s"$root/bloom", Seq("o_custkey"), expectedDistinct = 200)
    // twin without blooms: same layout AND same (plain) encoding on the
    // probe column, so the reader has only min/max stats to skip with —
    // with dictionary encoding left on, parquet's dictionary filter would
    // already skip absent keys exactly and mask what the bloom buys
    data.repartitionByRange(8, col("o_orderkey"))
      .write.option("parquet.enable.dictionary#o_custkey", "false")
      .parquet(s"$root/plain")

    val parts = new java.io.File(s"$root/bloom").listFiles
      .filter(_.getName.endsWith(".parquet"))
    assert(parts.length > 1, "expected multiple part files")
    val footer = ParquetFileReader.open(
      HadoopInputFile.fromPath(new HPath(parts.head.toURI), new Configuration()))
    try {
      val cols = footer.getFooter.getBlocks.get(0).getColumns.asScala
      val byName = cols.map(c => c.getPath.toDotString -> c).toMap
      assert(byName("o_custkey").getBloomFilterOffset >= 0,
        "o_custkey column chunk must carry a bloom filter")
      assert(byName("o_orderkey").getBloomFilterOffset < 0,
        "columns not asked for must not pay for a bloom filter")
    } finally footer.close()

    // a custkey that EXISTS (correctness baseline on the bloom-written data)
    val k = data.select(max(col("o_custkey"))).head.getLong(0)
    val bloomRead = spark.read.parquet(s"$root/bloom")
    assertMultiset(
      bloomRead.filter(col("o_custkey") === k).select(col("o_orderkey"))
        .collect().map(_.getLong(0)).toSeq,
      data.filter(col("o_custkey") === k).select(col("o_orderkey"))
        .collect().map(_.getLong(0)).toSeq)

    // skip measurement needs an absent key INSIDE every row group's
    // [min,max] (outside, plain stats already exclude it; orders' dense
    // custkeys have no in-range hole) — synthesize EVEN spread keys and
    // probe an ODD one: stats see nothing, only the bloom can skip
    val sp = spark; import sp.implicits._
    val even = (0 until 20000)
      .map(i => (i.toLong, (i * 2654435761L % 100000L) * 2L)).toDF("id", "key")
    ScaleOps.writeWithBloomFilters(even.repartitionByRange(8, col("id")),
      s"$root/evenbloom", Seq("key"), expectedDistinct = 3000)
    even.repartitionByRange(8, col("id"))
      .write.option("parquet.enable.dictionary#key", "false")
      .parquet(s"$root/evenplain")
    val absent = 77777L // odd -> absent; within [0, 200000) -> inside stats
    val plainScanned = scannedRows(
      spark.read.parquet(s"$root/evenplain").filter(col("key") === absent))
    val bloomScanned = scannedRows(
      spark.read.parquet(s"$root/evenbloom").filter(col("key") === absent))
    assert(plainScanned > 0,
      s"stats-only layout should be unable to skip: scanned $plainScanned")
    assert(bloomScanned == 0,
      s"bloom should skip every row group for an absent key: $bloomScanned")
    deleteRecursively(root)
  }

}
