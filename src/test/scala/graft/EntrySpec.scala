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
    // exactly the documented approximate/hash-specific queries lack an oracle
    val noOracle = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    // only the true merge-sketches remain (HLL, GK, ItemsSketch,
    // sketch-profile) — every deterministic query, including the whole
    // ANN family, is DuckDB-oracled as of round 8
    assert(noOracle == Set("q06b_approx_distinct",
      "q38b_approx_percentiles",
      "q70_topk_sketch", "q78_hll_shards", "q82b_profile_approx"), noOracle)
    // every oracle references a known table and is runnable-looking SQL
    val tables = graft.engine.Tables.names
    SparkEntry.oracleSql.foreach { case (k, sql) =>
      assert(sql.trim.toUpperCase.startsWith("SELECT") || sql.trim.toUpperCase.startsWith("WITH"), k)
      assert(tables.exists(t => sql.contains(t)), s"$k oracle references no table")
    }
  }
}
