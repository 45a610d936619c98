package graft.tools

/** Throwaway: both gate sides of every gated graph query, interleaved
  * A/B/A/B with the shared edge frame prewarmed — decides whether the
  * node-broadcast mail path actually beats the rank-shuffle path at
  * bench scale (round-9 q85 question, extended to the whole family). */
object ProbeGraphGate {
  def main(args: Array[String]): Unit = {
    val spark = graft.engine.GraftSession.get()
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", graft.Bench.DriverSfDir)
    import graft.queries.Graph
    import org.apache.spark.sql.functions._
    def t(label: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime(); f
      println(f"[gate] $label ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    val edges = Graph.coPurchaseEdges(spark, dir)
    edges.count()
    val edgesW = Graph.coPurchaseEdgesW(spark, dir)
    edgesW.count()
    val knownN = Graph.graphStat("coPurchaseEdges", spark, dir).map(_._2)
    def pr(limit: Long): Unit =
      noop(Graph.pagerankGated(edges, Graph.nodeDegrees(edges),
        r => floor(r / col("outdeg") * 1e12 + 0.5).cast("long"), limit, knownN))
    // the shuffle paths memoize per-generation persists — evict them
    // between runs or every iteration after the first reuses round 1's
    // materialized generations and the A/B is fake
    def evictGens(): Unit =
      for (q <- Seq("q90", "q98"); r <- 1 to 4)
        graft.queries.TextOps.evict(s"$q.gen$r", spark, dir)
    for (i <- 1 to 3) {
      t(s"q85  bcast $i")(pr(Long.MaxValue))
      t(s"q85  shuf  $i")(pr(0L))
      t(s"q90  bcast $i")(noop(Graph.ssspGated(spark, dir, Long.MaxValue)))
      t(s"q90  shuf  $i") { noop(Graph.ssspGated(spark, dir, 0L)); evictGens() }
      t(s"q98  bcast $i")(noop(Graph.labelPropGated(spark, dir, Long.MaxValue)))
      t(s"q98  shuf  $i") { noop(Graph.labelPropGated(spark, dir, 0L)); evictGens() }
    }
    spark.stop()
  }
}
