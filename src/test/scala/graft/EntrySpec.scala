package graft

/** The driver's first smoke check: entry() must return rows. */
class EntrySpec extends SparkSpec {
  test("SparkEntry.entry returns rows on sf0.001") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every registered query has a distinct, well-formed key") {
    val keys = SparkEntry.registry.keys.toSeq
    assert(keys.size == keys.distinct.size)
    assert(keys.forall(_.matches("q\\d+[a-z]?_[a-z0-9_]+")))
    assert(SparkEntry.oracleSql.keySet.subsetOf(SparkEntry.queries.keySet))
  }
}
