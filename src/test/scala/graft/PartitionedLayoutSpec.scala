package graft

import java.nio.file.Files

import graft.operators.ScaleOps
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.functions._

/** Hive-partitioned layout ([[ScaleOps.writeHivePartitioned]]): the battery
  * row (d178) pins content under a partition filter; these tests pin what a
  * content oracle cannot see — that the writer controls the file count (no
  * task × partition small-file explosion) and that a partition filter
  * PRUNES at the directory level (the scan lists only matching partitions).
  */
class PartitionedLayoutSpec extends SparkTestBase {

  private val d = "/root/testdata/sf0.001"

  private def fileScan(df: DataFrame): FileSourceScanExec = {
    def scans(p: SparkPlan): Seq[FileSourceScanExec] = p match {
      case a: AdaptiveSparkPlanExec => scans(a.executedPlan)
      case s: FileSourceScanExec => Seq(s)
      case other => other.children.flatMap(scans)
    }
    val found = scans(df.queryExecution.executedPlan)
    assert(found.size == 1, s"expected exactly one file scan: $found")
    found.head
  }

  test("one file per partition dir; filter prunes to matching dirs only") {
    val root = Files.createTempDirectory("graft-hivepart-spec").toString
    val ev = Tables.events(spark, d)
      .select(col("event_type"), col("value"),
        date_format(timestamp_millis(col("ts_ms")), "yyyy-MM-dd").as("day"))
    ScaleOps.writeHivePartitioned(ev, s"$root/t", "day")

    // layout: each day=... dir holds exactly ONE parquet file — the writer
    // repartitioned on the partition value, so the naive task×partition
    // explosion (32 tasks × 30 days = 960 files) cannot happen
    val dirs = new java.io.File(s"$root/t").listFiles
      .filter(f => f.isDirectory && f.getName.startsWith("day="))
    assert(dirs.length > 5, s"expected many day partitions: ${dirs.length}")
    dirs.foreach { dir =>
      val parts = dir.listFiles.filter(_.getName.endsWith(".parquet"))
      assert(parts.length == 1,
        s"${dir.getName}: expected 1 file, got ${parts.length}")
    }

    // pruning: a 3-day filter must plan PartitionFilters and list only the
    // 3 matching directories' files
    val read = spark.read.parquet(s"$root/t")
      .filter(col("day") >= "2024-01-05" && col("day") <= "2024-01-07")
    val scan = fileScan(read)
    assert(scan.partitionFilters.nonEmpty,
      "day bounds must become partition filters, not data filters")
    val listed = scan.relation.location.listFiles(
      scan.partitionFilters, scan.dataFilters).map(_.files.size).sum
    assert(listed == 3, s"must list exactly the 3 pruned files: $listed")

    // content identical to an unpartitioned filter of the source
    assertMultiset(
      read.select(col("event_type"), col("value"), col("day").cast("string"))
        .collect().map(r => (r.getString(0), r.getDouble(1), r.getString(2)))
        .toSeq,
      ev.filter(col("day") >= "2024-01-05" && col("day") <= "2024-01-07")
        .collect().map(r => (r.getString(0), r.getDouble(1), r.getString(2)))
        .toSeq)
    deleteRecursively(root)
  }

  test("writePartitionedByDay: files internally time-sorted (narrow ts stats)") {
    val root = Files.createTempDirectory("graft-hivepart-sorted").toString
    val ev = Tables.events(spark, d)
      .select(col("event_type"), col("value"),
        timestamp_millis(col("ts_ms")).as("t"))
    ScaleOps.writePartitionedByDay(ev, s"$root/t", "t")
    val dirs = new java.io.File(s"$root/t").listFiles
      .filter(f => f.isDirectory && f.getName.startsWith("__day="))
    assert(dirs.nonEmpty)
    for (dir <- dirs.take(5);
         f <- dir.listFiles.filter(_.getName.endsWith(".parquet"))) {
      val ts = spark.read.parquet(f.getAbsolutePath)
        .select(col("t")).collect().map(_.getTimestamp(0).getTime)
      assert(ts.sameElements(ts.sorted),
        s"${dir.getName}/${f.getName} not internally time-sorted")
    }
    deleteRecursively(root)
  }

  test("filesPerPartition > 1 spreads each partition over that many files") {
    val root = Files.createTempDirectory("graft-hivepart-n").toString
    val df = Tables.orders(spark, d)
      .select(col("o_orderkey"), col("o_orderpriority").as("p"))
    // AQE partition coalescing may legally merge hash slots into one writer
    // task (the contract is AT MOST filesPerPartition); pin the exact slot
    // spread with coalescing off
    val key = "spark.sql.adaptive.coalescePartitions.enabled"
    val saved = spark.conf.get(key)
    try {
      spark.conf.set(key, "false")
      ScaleOps.writeHivePartitioned(df, s"$root/t", "p", filesPerPartition = 3)
    } finally spark.conf.set(key, saved)
    val dirs = new java.io.File(s"$root/t").listFiles
      .filter(f => f.isDirectory && f.getName.startsWith("p="))
    assert(dirs.nonEmpty)
    dirs.foreach { dir =>
      val n = dir.listFiles.count(_.getName.endsWith(".parquet"))
      assert(n >= 2 && n <= 3,
        s"${dir.getName}: expected 2-3 files (hash slots), got $n")
    }
    // round-trip content
    assert(spark.read.parquet(s"$root/t").count() == df.count())
    deleteRecursively(root)
  }
}
