package graft

import org.apache.spark.sql.functions._

/** Skew probe for the d205 banded FIFO interval join — the measurement the
  * uniform TPC-H corpus cannot produce: ONE Zipf-hot part holding both
  * queues. Unbanded, that part's overlap join is a single n² task (the
  * 100 TB straggler the banding exists to kill); banded, candidates are
  * confined to (part, cum-band) groups of ~bandWidth/avgQty rows each.
  * Prints one JSON line with both walls and the (equal) output sizes —
  * equality doubles as the FifoBandingProps law on real volume.
  *
  * Usage: FifoSkewProbe [rowsPerQueue] (default 20000; 20k x 20k
  * unbanded = 4x10^8 candidate pairs in ONE task)
  */
object FifoSkewProbe {
  def main(args: Array[String]): Unit = {
    val n = if (args.nonEmpty) args(0).toInt else 20000
    val spark = GraftSession.builder(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // one hot part: 2n rows, suppkey parity splits the queues, qty_c in
    // [100, 5000] via a deterministic hash — the lineitem shape, skewed
    val li = spark.range(0, 2L * n)
      .select(lit(1L).as("l_partkey"),
        (col("id") % 2).as("l_suppkey"),
        (col("id") / 2).as("l_orderkey"),
        lit(1L).as("l_linenumber"),
        (col("id") % 97).as("l_shipdate"),
        (pmod(xxhash64(col("id")), lit(50)) * 100 + 100).as("qty_c"))
      .localCheckpoint(true)
    def time(label: String, bandWidth: Long): (Double, Long) = {
      val t0 = System.nanoTime()
      val acc = spark.sparkContext.longAccumulator(label)
      Queries.fifoMatch(li, bandWidth)
        .queryExecution.toRdd.foreach(_ => acc.add(1L))
      ((System.nanoTime() - t0) / 1e9, acc.value)
    }
    val (bSec, bRows) = time("banded", 1048576L)
    val (uSec, uRows) = time("unbanded", -1L)
    require(bRows == uRows,
      s"banded/unbanded outputs differ: $bRows vs $uRows")
    println(s"""{"fifo_skew_probe":{"rows_per_queue":$n,"banded_sec":${
      math.round(bSec * 100) / 100.0},"unbanded_sec":${
      math.round(uSec * 100) / 100.0},"out_rows":$bRows}}""")
    spark.stop()
  }
}
