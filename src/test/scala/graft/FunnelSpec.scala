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
  test("q104 token bucket equals a sequential replay; throttling is non-vacuous; one exchange + in-shuffle sort") {
    val dir = "/root/testdata/sf0.001"
    val Cap = 21600000000L; val Cost = 10800000000L
    val ev = graft.engine.Tables.table(spark, dir, "events")
      .select(col("user_id"), unix_micros(col("ts")).as("us"), col("event_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val brute = ev.groupBy(_._1).map { case (u, es) =>
      var tokens = Cap; var prev = 0L; var n = 0L; var thr = 0L
      es.sortBy(e => (e._2, e._3)).foreach { e =>
        if (n > 0) tokens = math.min(Cap, tokens + (e._2 - prev))
        if (tokens >= Cost) tokens -= Cost else thr += 1
        prev = e._2; n += 1
      }
      u -> ((n, thr, tokens))
    }
    val got = Funnel.q104_rate_limit.fn(spark, dir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(got == brute, "bucket states equal the sequential replay")
    assert(got.values.map(_._2).sum > 0, "the fixture actually throttles")
    assert(got.values.map(_._2).sum < got.values.map(_._1).sum, "and actually admits")
    // one user-keyed exchange; the (us, event_id) order is a sort INSIDE
    // the shuffle partition, never a global sort
    val p = Funnel.q104_rate_limit.fn(spark, dir).queryExecution
      .explainString(org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    // the typed groupByKey key is projected as `value`
    assert(p.contains("hashpartitioning(value"),
      s"key-hashed exchange expected:\n$p")
    assert(p.contains("FlatMapGroups") || p.contains("MapGroups"),
      "sorted-group fold operator expected")
    // the only range partitioning is the presentation sort of the
    // result (one row per user), never the event stream
    assert(!p.contains("rangepartitioning(us#"), "no global sort of the event stream")
  }
}
