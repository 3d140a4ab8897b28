package graft

import graft.api.{OffsetRange, Pipeline, RestrictionTracker, Sdf, SplittableDoFn}

/** SDF-analog expansion (ray_runner_test.py:604-655: strings expanded
  * char-by-char through restriction claims) + SQL function registration via
  * SparkSessionExtensions.
  */
class SdfExtensionsSpec extends SparkTestBase {

  test("splittableParDo expands strings char-by-char via claim loop") {
    val p = Pipeline(spark)
    val fn = new SplittableDoFn[String, Char] {
      def initialRestriction(e: String): OffsetRange = OffsetRange(0, e.length.toLong)
      // split into 2-char sub-ranges to exercise initial splitting
      override def split(e: String, r: OffsetRange): Seq[OffsetRange] =
        (r.start until r.end by 2).map(s => OffsetRange(s, math.min(s + 2, r.end)))
      def process(e: String, tracker: RestrictionTracker, out: Char => Unit): Unit = {
        var i = tracker.restriction.start
        while (tracker.tryClaim(i)) { out(e(i.toInt)); i += 1 }
      }
    }
    val out = Sdf.splittableParDo(p.create(Seq("abc", "defghijklmno", "pqrstuv", "wxyz")), fn)
      .collect()
    assertMultiset(out, "abcdefghijklmnopqrstuvwxyz".toSeq)
  }

  test("tracker rejects claims past the range end") {
    val t = new RestrictionTracker(OffsetRange(0, 3))
    assert(t.tryClaim(0) && t.tryClaim(1) && t.tryClaim(2))
    assert(!t.tryClaim(3))
  }

  test("SQL functions registered via GraftExtensions") {
    val r1 = spark.sql("SELECT graft_simhash64(array('the','quick','fox')) AS h").first()
    assert(r1.getLong(0) != 0L)
    val r2 = spark.sql(
      "SELECT graft_cosine(array(1.0D, 0.0D), array(1.0D, 0.0D)) AS c").first()
    assert(r2.getDouble(0) == 1.0)
    val r3 = spark.sql(
      "SELECT graft_minhash(array('a','b','c'), 16) AS sig").first()
    assert(r3.getSeq[Long](0).size == 16)
    val r4 = spark.sql(
      "SELECT graft_lang_id(array('the','cat','is','here')) AS lang").first()
    assert(r4.getString(0) == "en")
    val r5 = spark.sql(
      "SELECT graft_band_buckets(graft_minhash(array('a','b'), 16), 4, 4) AS bb").first()
    assert(r5.getSeq[Long](0).size == 4)
  }
}
