package graft

import org.apache.spark.sql.execution.ExplainMode

import graft.queries.Graph

/** Gates for the graph surface (q85 PageRank): an exact sequential
  * replay of the synchronous iteration (same per-round rounding and
  * decimal summation, so equality is BITWISE, not tolerance), mass
  * conservation, and the edge-builder's plan shape. */
class GraphSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def cround12(x: Double): Double = math.floor(x * 1e12 + 0.5) / 1e12

  test("q85 equals a sequential driver-side replay, bitwise") {
    val edges = Graph.coPurchaseEdges(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val nodes = edges.map(_._1).distinct.sorted
    val n = nodes.length
    val outdeg = edges.groupBy(_._1).map { case (k, v) => k -> v.head._3 }
    var rank = nodes.map(_ -> 1.0 / n).toMap
    for (_ <- 1 to 3) {
      // mirror the distributed round exactly: per-edge contribution =
      // cround12(r/outdeg) cast to DECIMAL(30,12) (Spark's double cast
      // rounds the SHORTEST repr, which BigDecimal(d) reproduces),
      // exact decimal sum, then the damped update rounded to 12 digits
      val mail = edges.groupBy(_._2).map { case (dst, es) =>
        val s = es.map { case (src, _, _) =>
          BigDecimal(cround12(rank(src) / outdeg(src))).setScale(12, BigDecimal.RoundingMode.HALF_UP)
        }.sum
        dst -> cround12(0.15 / n + 0.85 * s.toDouble)
      }
      rank = mail
    }
    val got = Graph.q85_pagerank.fn(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getDouble(1))
    assert(got.length == n)
    got.foreach { case (node, r) =>
      assert(r == rank(node), s"node $node: $r != sequential ${rank(node)}")
    }
  }

  test("q85 conserves rank mass (sums to ~1 up to per-node rounding)") {
    val got = Graph.q85_pagerank.fn(spark, dir).collect().map(_.getDouble(1))
    val mass = got.sum
    assert(math.abs(mass - 1.0) < got.length * 1e-12 + 1e-9, s"mass=$mass")
    assert(got.forall(r => r > 0 && r < 1))
  }

  test("q85 edge builder plans equi-joins only (no product) and is symmetric") {
    val e = Graph.coPurchaseEdges(spark, dir)
    val p = e.queryExecution.explainString(ExplainMode.fromString("formatted"))
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"co-purchase candidates must come from the order-key equi-join:\n$p")
    val set = e.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(set.nonEmpty && set.forall { case (a, b) => set((b, a)) },
      "symmetrized edges: every (src,dst) has its reverse")
  }

  test("q85 edge builder shuffles only at the explicit repartitions") {
    // the explicit repartitions (l_orderkey — appearing once per self-join
    // branch in the static plan, AQE-reused at runtime — then src) must be
    // the ONLY exchanges: both dropDuplicates and the outdegree window
    // reuse them because hashpartitioning on a subset of the grouping
    // keys satisfies the clustering requirement
    val p = Graph.coPurchaseEdges(spark, dir).queryExecution
      .explainString(ExplainMode.fromString("formatted"))
    val n = "Exchange hashpartitioning".r.findAllIn(p).size
    assert(n <= 3, s"dedups/window must not add exchanges, got $n:\n$p")
    assert(p.contains("Window"), s"outdegree window missing:\n$p")
  }
}
