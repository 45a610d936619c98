package graft

import org.apache.spark.sql.execution.ExplainMode

import graft.queries.Relational

/** Physical-plan assertions (SURVEY.md §4): the optimizations we rely on
  * must actually appear in the plan — filter/column pushdown to the
  * parquet scan, join strategy selection, and top-k via
  * TakeOrderedAndProject. Guards against silent plan regressions. */
class PlanSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def plan(q: graft.queries.Query): String = {
    val df = q.fn(spark, dir)
    df.queryExecution.explainString(ExplainMode.fromString("formatted"))
  }

  test("q01: predicate and projection reach the parquet scan") {
    val p = plan(Relational.q01_filter_project)
    assert(p.contains("GreaterThan(l_discount,0.05)"), p)
    assert(p.contains("LessThan(l_quantity,25.0)"), p)
    assert(p.contains("GreaterThanOrEqual(l_shipdate"), p)
    // projection pruning: untouched columns must not be read
    assert(!p.contains("l_suppkey"), "unused column in ReadSchema")
    assert(!p.contains("l_tax"), "unused column in ReadSchema")
  }

  test("q03: dimension side is broadcast") {
    val p = plan(Relational.q03_segment_orders)
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin"), "fact side must not shuffle for a broadcast dim")
  }

  test("q04: no cartesian/nested-loop anywhere in the 5-way join") {
    val p = plan(Relational.q04_revenue_by_nation)
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("q09: global top-10 plans as TakeOrderedAndProject, not a full sort") {
    val p = plan(Relational.q09_top10_orders)
    assert(p.contains("TakeOrderedAndProject"), p)
  }

  test("q02: aggregation is partial+final hash aggregate") {
    val p = plan(Relational.q02_pricing_summary)
    assert("HashAggregate".r.findAllIn(p).length >= 2, "expected partial and final stages")
  }

  test("q25 candidate generation has no partition-less window (scale guard)") {
    // round-1 VERDICT: a global Window.orderBy ran the whole shingle
    // vocabulary through one partition. The rarest-first order is now a
    // per-doc window over the global (df, g) order — every Window node in
    // the candidate plan must carry a partition spec.
    val sh = graft.queries.TextOps.shingles(spark, dir)
    val (cand, prefix) = graft.queries.TextOps.ppjoinCandidates(sh)
    prefix.unpersist() // so cache substitution can't hide the window subtree
    val wins = cand.queryExecution.analyzed.collect {
      case w: org.apache.spark.sql.catalyst.plans.logical.Window => w
    }
    assert(wins.nonEmpty, "expected the per-doc ranking window in the plan")
    assert(wins.forall(_.partitionSpec.nonEmpty),
      "a partition-less Window would serialize the vocabulary through one task")
  }

  test("whole-stage codegen spans the scalar battery") {
    val df = Relational.q12_scalar_battery.fn(spark, dir)
    df.collect() // finalize the adaptive plan so codegen stages materialize
    val p = df.queryExecution.explainString(ExplainMode.fromString("formatted"))
    assert(p.contains("* Project") || p.contains("[codegen id"), p)
  }
}
