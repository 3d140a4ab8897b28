package graft

import graft.plans.NativeExpressions
import org.apache.spark.sql.functions._

/** graft_money_sum must be VALUE-IDENTICAL to the engine's decimal-sum
  * convention `SUM(CAST(x AS DECIMAL(18,s)))` — it is a faster evaluation
  * strategy, not a different number.
  */
class FixedPointSumSpec extends SparkTestBase {

  test("matches SUM(CAST AS DECIMAL) on mixed-sign data across partitions") {
    val s = spark
    import s.implicits._
    // fail loudly if the generated aggregate code does not COMPILE — a
    // Janino error here would otherwise silently fall back to interpreted
    // eval and defeat the whole point of the expression (regression guard
    // for the undeclared-isNull bug in Int128ToDecimal's codegen)
    spark.conf.set("spark.sql.codegen.fallback", "false")
    try {
    val rnd = new scala.util.Random(3)
    // mixed magnitudes and signs; 64 partitions forces partial/final merges
    val data = Seq.fill(20000)((rnd.nextInt(5), (rnd.nextDouble() - 0.5) * 2e6))
    val df = data.toDF("g", "x").repartition(64)
    for (scale <- Seq(2, 4, 6)) {
      val got = df.groupBy($"g")
        .agg(NativeExpressions.moneySum($"x", scale).cast("double").as("s"))
        .collect().map(r => r.getInt(0) -> r.getDouble(1)).toMap
      val want = df.groupBy($"g")
        .agg(expr(s"CAST(SUM(CAST(x AS DECIMAL(18,$scale))) AS DOUBLE)").as("s"))
        .collect().map(r => r.getInt(0) -> r.getDouble(1)).toMap
      assert(got == want, s"scale $scale")
    }
    // global (no grouping key) aggregation takes a different codegen path
    // for evaluateExpression — cover it under fallback=false too
    val g = df.agg(NativeExpressions.moneySum($"x", 2).cast("double")).head().getDouble(0)
    val w = df.agg(expr("CAST(SUM(CAST(x AS DECIMAL(18,2))) AS DOUBLE)")).head().getDouble(0)
    assert(g == w)
    } finally spark.conf.unset("spark.sql.codegen.fallback")
  }

  test("null handling matches SUM: nulls skipped, all-null group -> NULL") {
    val s = spark
    import s.implicits._
    val df = Seq[(Int, Option[Double])]((1, Some(1.25)), (1, None), (2, None))
      .toDF("g", "x")
    val rows = df.groupBy($"g")
      .agg(NativeExpressions.moneySum($"x", 2).as("fp"),
        expr("SUM(CAST(x AS DECIMAL(18,2)))").as("ref"))
      .collect().map(r => (r.getInt(0), Option(r.getDecimal(1)), Option(r.getDecimal(2))))
    rows.foreach { case (g, fp, ref) =>
      assert(fp.map(_.doubleValue) == ref.map(_.doubleValue), s"group $g")
    }
    assert(rows.find(_._1 == 2).get._2.isEmpty)
  }

  test("SQL surface: graft_money_sum registered via extensions") {
    val s = spark
    import s.implicits._
    Seq(1.005, 2.015).toDF("x").createOrReplaceTempView("fps_t")
    val got = spark.sql(
      "SELECT CAST(graft_money_sum(x, 2) AS DOUBLE) AS v FROM fps_t").head().getDouble(0)
    val want = spark.sql(
      "SELECT CAST(SUM(CAST(x AS DECIMAL(18,2))) AS DOUBLE) AS v FROM fps_t").head().getDouble(0)
    assert(got == want) // includes the HALF_UP cast rounding of .005 cents
  }

  test("sums past Long.MaxValue unscaled (the 128-bit headroom argument)") {
    val s = spark
    import s.implicits._
    // 40 rows of ~4.6e15 at scale 2 -> unscaled total ~1.8e19 > 2^63
    val big = Long.MaxValue / 20 / 100 // unscaled fits DECIMAL(18) per row
    val df = Seq.fill(40)(big.toDouble).toDF("x").repartition(8)
    val got = df.agg(NativeExpressions.moneySum($"x", 2).as("v"))
      .head().getDecimal(0)
    val want = new java.math.BigDecimal(
      java.math.BigInteger.valueOf(big).multiply(java.math.BigInteger.valueOf(40L * 100)), 2)
    assert(got.compareTo(want.setScale(2)) == 0, s"got $got want $want")
  }
}
