package graft

/** Every registered query must run at sf0.001 and return rows; every
  * oracle key must be a registered query (driver-contract invariants). */
class QueriesSmokeSpec extends SparkSuite {

  test("entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("oracle keys are a subset of query keys") {
    assert(SparkEntry.oracleSql.keySet.subsetOf(SparkEntry.queries.keySet))
  }

  Registry.all.foreach { case (name, d) =>
    test(s"$name runs non-empty at sf0.001") {
      assert(d.fn(spark, sf0001).count() > 0)
    }
  }
}
