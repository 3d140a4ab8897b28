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
}
