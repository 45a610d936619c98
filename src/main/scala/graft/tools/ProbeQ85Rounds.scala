package graft.tools

/** Throwaway: q85 per-round-path A/B — broadcast mail (per-round
  * BroadcastExchange barrier) vs rank-shuffle (all rounds pipelined in
  * one job on the edge cache's src partitioning). Edge frame prewarmed
  * so both sides time ONLY the rounds, the round-9 rider accounting. */
object ProbeQ85Rounds {
  def main(args: Array[String]): Unit = {
    val spark = graft.engine.GraftSession.get()
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", graft.Bench.DriverSfDir)
    import graft.queries.Graph
    def t(label: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime(); f
      println(f"[q85r] $label ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    val edges = Graph.coPurchaseEdges(spark, dir)
    edges.count()
    import org.apache.spark.sql.functions._
    def run(limit: Long): Unit =
      Graph.pagerankGated(edges, Graph.nodeDegrees(edges),
        r => floor(r / col("outdeg") * 1e12 + 0.5).cast("long"),
        limit, Graph.graphStat("coPurchaseEdges", spark, dir).map(_._2))
        .write.format("noop").mode("overwrite").save()
    // interleaved A/B/A/B
    for (i <- 1 to 3) {
      t(s"broadcast $i")(run(Long.MaxValue))
      t(s"shuffle   $i")(run(0L))
    }
    spark.stop()
  }
}
