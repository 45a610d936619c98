package graft.tools
import graft.queries.Graph
object ProbeGraphSize {
  def main(args: Array[String]): Unit = {
    val spark = graft.engine.GraftSession.get()
    val dir = args.headOption.getOrElse("/tmp/scaleall100")
    val edges = Graph.coPurchaseEdges(spark, dir)
    val nE = edges.count()
    val nN = edges.select("src").distinct().count()
    println(s"[gsize] dir=$dir edges=$nE nodes=$nN " +
      s"edgeGate=${Graph.EdgeBroadcastLimit} nodeGate=${Graph.NodeBroadcastLimit} " +
      s"csrGate=${Graph.TriangleCsrEdgeLimit}")
    spark.stop()
  }
}
