package graft.tools

import org.apache.spark.sql.functions._

/** Throwaway: q85 round-1 plan + edge count — is the per-round agg
  * codegen'd, does the partial agg combine, what does the cache scan
  * actually read? */
object ProbeQ85Plan {
  def main(args: Array[String]): Unit = {
    val spark = graft.engine.GraftSession.get()
    spark.sparkContext.setLogLevel("WARN")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", graft.Bench.DriverSfDir)
    import graft.queries.Graph
    val edges = Graph.coPurchaseEdges(spark, dir)
    println(s"[q85plan] edges=${edges.count()} nodes=${Graph.graphStat("coPurchaseEdges", spark, dir)}")
    val n = Graph.graphStat("coPurchaseEdges", spark, dir).get._2
    val round1 = edges
      .select(col("dst"), floor(lit(1.0 / n) / col("outdeg") * 1e12 + 0.5).cast("long").as("k"))
      .groupBy("dst").agg(sum(col("k")).as("s"))
    round1.write.format("noop").mode("overwrite").save()
    println(round1.queryExecution.executedPlan.toString.take(4000))
    spark.stop()
  }
}
