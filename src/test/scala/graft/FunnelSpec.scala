package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.queries.Funnel

/** q80 cogroup attribution: edge-case semantics the sf0.01 oracle can't
  * guarantee to exercise, plus the secondary-sort plan shape that makes
  * the operator safe for mega-users at 100 TB. */
class FunnelSpec extends SparkSpec {

  private def ts(sec: Long) = new Timestamp(sec * 1000L)

  test("q80 walk: tie-break at equal timestamps, purchase-first, clicks-only users") {
    import spark.implicits._
    val events = Seq(
      // user 1: click(eid 1) and purchase(eid 2) at the SAME timestamp —
      // the (us, event_id) order puts the click first, so it converts
      (1L, ts(100), 1L, "click"),
      (1L, ts(100), 2L, "purchase"),
      // user 2: same instant but the purchase has the LOWER event_id —
      // click orders after it, purchase must NOT convert
      (2L, ts(100), 4L, "click"),
      (2L, ts(100), 3L, "purchase"),
      // user 3: purchase before any click, then click → purchase; the
      // second converts, the first doesn't, and the click is not
      // double-counted by a later third purchase with no new click
      (3L, ts(50), 5L, "purchase"),
      (3L, ts(60), 6L, "click"),
      (3L, ts(70), 7L, "purchase"),
      (3L, ts(80), 8L, "purchase"),
      // user 4: clicks only → no output row
      (4L, ts(10), 9L, "click"),
      // user 5: view events must be ignored entirely
      (5L, ts(10), 10L, "view"),
      (5L, ts(20), 11L, "purchase"))
      .toDF("user_id", "ts", "event_id", "event_type")
    val got = Funnel.cogroupAttribution(spark, events)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got == Seq((1L, 1L, 1L), (2L, 1L, 0L), (3L, 3L, 1L), (5L, 1L, 0L)))
  }

  test("q80 plans a secondary-sort cogroup: partition-local sorts, one exchange per side, pushed filters") {
    val df = Funnel.q80_cogroup_attribution.fn(spark, "/root/testdata/sf0.001")
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("CoGroup"), "must plan a CoGroup")
    // the (us, event_id) sort must be PARTITION-LOCAL (secondary sort
    // inside the keyed shuffle, `Sort [...], false`), never a global
    // sort — that's what keeps per-group state O(1) for mega-users
    val localSorts = plan.linesIterator.count(l =>
      l.contains("Sort [") && l.contains("us#") && l.contains("], false"))
    assert(localSorts == 2, s"expected 2 partition-local secondary sorts, got $localSorts")
    val hashExchanges = plan.linesIterator.count(_.contains("Exchange hashpartitioning"))
    assert(hashExchanges == 2, s"expected one keyed exchange per side, got $hashExchanges")
    // event-type filters must reach the parquet scan
    assert(plan.contains("PushedFilters: [IsNotNull(event_type), EqualTo(event_type,click)]"))
    assert(plan.contains("PushedFilters: [IsNotNull(event_type), EqualTo(event_type,purchase)]"))
  }
}
