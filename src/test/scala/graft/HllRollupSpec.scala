package graft

import org.apache.spark.sql.functions._

/** Laws of the mergeable HLL distinct-count infrastructure behind
  * d84_hll_rollup: exactness inside the sparse regime (what makes the
  * battery entry oracle-checkable), bounded error beyond it, and the
  * merge property that makes pre-aggregated sketch tables useful.
  */
class HllRollupSpec extends SparkTestBase {

  test("coupon regime: estimate is exact at lgK=14 up to the test-SF cardinality (the d84 oracle contract)") {
    val s = spark
    import s.implicits._
    val est = (1 to 1500).toDF("id")
      .agg(expr("CAST(hll_sketch_estimate(hll_sketch_agg(id, 14)) AS BIGINT)"))
      .first().getLong(0)
    assert(est == 1500L, s"coupon-regime estimate drifted: $est")
  }

  test("coupon regime survives the union: disjoint per-day sketches merge to the exact total") {
    val s = spark
    import s.implicits._
    // the d84 shape: per-day sketches over disjoint-ish user slices, unioned
    val unioned = (1 to 1500).map(i => (i, i % 30)).toDF("id", "day")
      .groupBy(col("day")).agg(expr("hll_sketch_agg(id, 14)").as("sk"))
      .agg(expr("CAST(hll_sketch_estimate(hll_union_agg(sk, false)) AS BIGINT)"))
      .first().getLong(0)
    assert(unioned == 1500L, s"merged coupon-regime estimate drifted: $unioned")
  }

  test("dense regime: 50k distinct ids estimated within 5% at lgK=12") {
    val s = spark
    import s.implicits._
    val est = (1 to 50000).toDF("id")
      .agg(expr("CAST(hll_sketch_estimate(hll_sketch_agg(id, 12)) AS BIGINT)"))
      .first().getLong(0)
    assert(math.abs(est - 50000L) <= 2500, s"estimate off by >5%: $est")
  }

  test("merge law: union of disjoint half-sketches estimates the full set") {
    val s = spark
    import s.implicits._
    val halves = (1 to 50000).map(i => (i, i % 2)).toDF("id", "half")
    val unioned = halves
      .groupBy(col("half")).agg(expr("hll_sketch_agg(id, 12)").as("sk"))
      .agg(expr("CAST(hll_sketch_estimate(hll_union_agg(sk, false)) AS BIGINT)"))
      .first().getLong(0)
    assert(math.abs(unioned - 50000L) <= 2500,
      s"merged estimate off by >5%: $unioned")
  }
}
