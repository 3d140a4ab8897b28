package graft

/** Battery bookkeeping invariants — the drift class of bug where the code,
  * the oracle map, and the docs disagree about what exists.
  */
class BatterySpec extends SparkTestBase {

  test("every oracle entry names a registered query; counts are consistent") {
    val dangling = Queries.oracles.keySet -- Queries.all.keySet
    assert(dangling.isEmpty, s"oracle SQL for unregistered queries: $dangling")
    assert(Queries.all.size >= 119, s"battery shrank to ${Queries.all.size}")
    assert(Queries.oracles.size >= 103, s"oracle coverage shrank to ${Queries.oracles.size}")
  }

  test("query names follow the qNN_/dNN_ convention with unique numbers") {
    val ids = Queries.all.keySet.map(_.takeWhile(_ != '_'))
    assert(ids.size == Queries.all.size, "duplicate query number prefixes")
    assert(Queries.all.keySet.forall(_.matches("[qd]\\d{2,3}_[a-z0-9_]+")))
  }

  test("d202's reflection identity equals the sequential Lindley fold on real data") {
    // the closed form b_t = S_t - min(0, runmin(S)) is the load-bearing
    // claim — pin it against the literal recursion b_t = max(0, b + δ)
    val rows = Queries.d202ClampedBalance(spark, "/root/testdata/sf0.001")
      .select("user_id", "ts_ms", "event_id", "delta", "balance")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    assert(rows.nonEmpty)
    var clampedSomewhere = false
    rows.groupBy(_._1).values.foreach { rs =>
      var bal = 0L
      rs.sortBy(r => (r._2, r._3)).foreach { case (_, _, _, delta, got) =>
        bal = math.max(0L, bal + delta)
        if (bal == 0L && delta < 0L) clampedSomewhere = true
        assert(got == bal)
      }
    }
    assert(clampedSomewhere, "no row ever hit the floor: identity untested")
  }
}
