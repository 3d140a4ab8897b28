package graft

/** Benchmark main: runs the query battery on SPARK_GRAFT_SF_DIR and prints
  * one JSON line with per-query wall seconds.
  *
  * Each query runs twice and reports the min: single-shot numbers on a
  * shared box swing 3-5x with interference/JIT noise, and the baseline this
  * writes is compared across rounds. The cache is cleared between passes so
  * operator-internal persists (LSH signature tables) don't leak a warm
  * second run.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val reps = sys.env.getOrElse("SPARK_GRAFT_BENCH_REPS", "2").toInt
    val spark = GraftSession.builder(cpus).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Benchmark honesty: disable cross-query work sharing (d23/d45 MinHash
    // pair memo) so each query's wall time is its FULL standalone pipeline,
    // comparable across rounds regardless of battery order.
    Queries.pairMemoEnabled = false
    // warm the JVM + parquet footers once so per-query numbers measure the
    // queries, not first-touch setup
    Tables.lineitem(spark, sfDir).count()
    // SPARK_GRAFT_BENCH_ONLY=d139,d124 runs just the named prefixes — an
    // iteration aid; the driver's full run leaves it unset. The short
    // totals line still prints but only sums the filtered subset.
    val only = sys.env.get("SPARK_GRAFT_BENCH_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSeq)
    val selected = only match {
      case Some(prefixes) =>
        val hit = SparkEntry.queries.filter { case (n, _) => prefixes.exists(n.startsWith) }
        // a typo'd prefix must fail loudly, not print a plausible 0-second
        // bench (same contract as Verify's unknown-query check)
        require(hit.nonEmpty,
          s"SPARK_GRAFT_BENCH_ONLY matched no queries: ${prefixes.mkString(",")}")
        hit
      case None => SparkEntry.queries
    }
    val repTimes = selected.toSeq.sortBy(_._1).map { case (name, fn) =>
      val times = (1 to reps).flatMap { _ =>
        spark.catalog.clearCache()
        val t0 = System.nanoTime()
        // Consume the FULL plan distributed-side: `toRdd.foreach` materializes
        // every output row (count() would let Catalyst prune projections and
        // under-measure map-heavy queries — NOTES.md "performance lessons").
        try {
          fn(spark, sfDir).queryExecution.toRdd.foreach(_ => ())
          Some((System.nanoTime() - t0) / 1e9)
        } catch {
          case e: Throwable =>
            System.err.println(s"[bench] $name failed: ${e.getMessage}")
            None // a failed rep must NOT contribute a bogus-fast wall time
        }
      }
      name -> times
    }
    // all reps failed -> -1.0 sentinel: unmistakably broken in the
    // baseline, never a silently-improved total
    val results = repTimes.map { case (name, times) =>
      name -> (if (times.nonEmpty) times.min else -1.0)
    }
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    // every rep's raw wall per row, so the artifact itself distinguishes
    // box drift (one slow rep, one quiet rep) from a real regression (all
    // reps slow) — a single-number row can't tell the two apart
    def fmt(v: Double) =
      String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))
    val repsJson = repTimes.map { case (k, ts) =>
      "\"" + k + "\":[" + ts.map(fmt).mkString(",") + "]"
    }.mkString("{", ",", "}")
    val total = results.map(_._2).sum
    // split three regimes so each trend stays legible across rounds:
    // _check_ rows re-run the operator under test PLUS an independent
    // brute-force reference by design (cost tracks verification depth);
    // _stream_ rows pay a full AvailableNow query start/stop (~2 s fixed)
    // per execution (cost tracks streaming-restart overhead, amortized to
    // nothing on a standing production stream); the rest is the batch
    // engine itself.
    val (checkRows, rest) = results.partition(_._1.contains("_check_"))
    val (streamRows, opRows) = rest.partition(_._1.contains("_stream_"))
    val opsTotal = opRows.map(_._2).sum
    val streamTotal = streamRows.map(_._2).sum
    val checksTotal = checkRows.map(_._2).sum
    val full =
      s"""{"metric":"total","value":$total,"unit":"sec","reps_per_query":$reps,"operators_sec":$opsTotal,"streaming_sec":$streamTotal,"verification_sec":$checksTotal,"rep_times":$repsJson,"queries":$qs,"sf":"$sfDir"}"""
    println(full)
    // The driver's tail capture clipped the single ~6 KB line from the FRONT
    // in r2 and r3 ("parsed": null in BENCH_r*.json), losing the totals. So:
    // (1) persist the full per-query JSON to a file, and (2) print a SHORT
    // final line — total + the 10 slowest — that survives any tail window.
    try java.nio.file.Files.writeString(
      java.nio.file.Paths.get("bench_out.json"), full + "\n")
    catch { case e: Throwable =>
      System.err.println(s"[bench] bench_out.json write failed: ${e.getMessage}")
    }
    // Locale.ROOT: a comma-decimal default locale would render 1,234 and
    // break the JSON this line exists to keep parseable
    val slowest = results.sortBy(-_._2).take(10)
      .map { case (k, v) =>
        "\"" + k + "\":" + String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))
      }.mkString("{", ",", "}")
    println(s"""{"metric":"total","value":$total,"unit":"sec","n":${results.size},"operators_sec":$opsTotal,"streaming_sec":$streamTotal,"verification_sec":$checksTotal,"slowest":$slowest,"sf":"$sfDir","full":"bench_out.json"}""")
    spark.stop()
  }
}
