package graft
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Writes an N-x key-shifted copy of sf0.1 to exercise scale-up behavior:
  * fact keys disjoint per copy; documents/embeddings keep identical payloads
  * (a deliberately duplicate-heavy corpus — the dedup stress case).
  *
  * Usage: MakeScaled [outDir] [copies] [table,table,...] [densekeys]
  * (default /tmp/sfscaled, 10 copies, all tables — the per-round 10x probe;
  * a table subset makes the 30x pair-growth probe cheap).
  *
  * `densekeys`: shift customer/orders custkeys by i·(max_custkey+1)
  * instead of i·10^6, keeping the scaled custkey space CONTIGUOUS
  * (0..n·15000−1 at sf0.1). The synthetic referral forest behind
  * d204/d227 derives parent(c) = md5(c) mod c, which lands anywhere
  * below c — valid only when every lower key exists. The default
  * sparse shift leaves inter-copy holes, so those rows' dangling-parent
  * guard fires (by design); dense mode makes the forest well-formed at
  * any copy count, closing the one scale-probe hole in the tree family
  * while leaving the guard armed for genuinely sparse input.
  */
object MakeScaled {
  def main(args: Array[String]): Unit = {
    val out = if (args.nonEmpty) args(0) else "/tmp/sfscaled"
    val nCopies = if (args.length > 1) args(1).toInt else 10
    val knownTables = Set("lineitem", "orders", "customer", "supplier",
      "part", "events", "documents", "embeddings", "nation", "region")
    // "densekeys" is a flag wherever it appears — standalone arg OR inside
    // the comma-list (r7 ADVICE: positional parsing silently half-applied
    // 'densekeys,customer' as a bogus table filter with dense mode off) —
    // and unknown table names fail loudly instead of filtering to nothing
    val rest = args.drop(2).flatMap(_.split(",")).map(_.trim).filter(_.nonEmpty)
    val denseKeys = rest.contains("densekeys")
    val only: Set[String] = rest.filterNot(_ == "densekeys").toSet
    val unknown = only -- knownTables
    require(unknown.isEmpty, s"MakeScaled: unknown table(s) " +
      s"${unknown.mkString(",")}; known: ${knownTables.toSeq.sorted.mkString(",")}")
    def wanted(name: String) = only.isEmpty || only.contains(name)
    val in = "/root/testdata/sf0.1"
    val spark = GraftSession.builder(32).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // dense custkey stride: one past the base max, so copy i occupies
    // [i*stride, (i+1)*stride) with no holes
    lazy val custStride: Long = Tables.customer(spark, in)
      .agg(max(col("c_custkey")).cast("long")).head().getLong(0) + 1L
    val custShift: Long = if (denseKeys) custStride else 1000000L
    def copies(name: String, shift: DataFrame => Int => DataFrame): Unit =
      if (wanted(name)) {
        val base = Tables.table(spark, in, name)
        val all = (0 until nCopies).map(i => shift(base)(i)).reduce(_ union _)
        all.write.mode("overwrite").parquet(s"$out/$name.parquet")
        println(s"[scaled] $name -> ${all.count()} rows")
      }
    def id(c: String, step: Long) = (df: DataFrame) => (i: Int) =>
      df.withColumn(c, col(c) + lit(i * step))
    copies("lineitem", df => i => df
      .withColumn("l_orderkey", col("l_orderkey") + lit(i * 1000000000L)))
    copies("orders", df => i => df
      .withColumn("o_orderkey", col("o_orderkey") + lit(i * 1000000000L))
      .withColumn("o_custkey", col("o_custkey") + lit(i * custShift)))
    copies("customer", id("c_custkey", custShift))
    copies("supplier", id("s_suppkey", 1000000L))
    copies("part", id("p_partkey", 1000000L))
    copies("events", df => i => df
      .withColumn("event_id", col("event_id") + lit(i * 1000000000L))
      .withColumn("user_id", col("user_id") + lit(i * 1000000L))
      // shift each copy +i hours in the column's physical representation
      .withColumn("ts", df.schema("ts").dataType match {
        case org.apache.spark.sql.types.LongType =>
          col("ts") + lit(i * 3600000000000L) // nanos-as-long
        case _ => col("ts") + expr(s"INTERVAL '$i' HOUR")
      }))
    copies("documents", id("doc_id", 1000000L))
    copies("embeddings", id("vec_id", 1000000L))
    Seq("nation", "region").filter(wanted).foreach { n =>
      Tables.table(spark, in, n).write.mode("overwrite").parquet(s"$out/$n.parquet")
    }
    spark.stop()
  }
}
