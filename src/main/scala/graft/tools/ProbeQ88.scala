package graft.tools

/** Throwaway: q88 adjacency-intersect vs wedge-join, paired in one warm
  * JVM (bench-style cache reset before each timed run, alternating so
  * host noise hits both forms equally). */
object ProbeQ88 {
  def main(args: Array[String]): Unit = {
    val spark = graft.engine.GraftSession.get()
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", graft.Bench.DriverSfDir)
    def t(label: String)(f: => Unit): Unit = {
      graft.queries.TextOps.resetCaches(); spark.catalog.clearCache()
      val t0 = System.nanoTime(); f
      println(f"[q88] $label ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    def e = graft.queries.Graph.coPurchaseEdges(spark, dir)
    def intersect(): Unit = graft.queries.Graph.trianglesOf(e)
      .write.format("noop").mode("overwrite").save()
    def wedge(): Unit = graft.queries.Graph.trianglesWedgeJoin(e, Long.MaxValue)
      .write.format("noop").mode("overwrite").save()
    t("warmup intersect")(intersect())
    t("warmup wedge")(wedge())
    for (i <- 1 to 3) {
      t(s"intersect r$i")(intersect())
      t(s"wedge     r$i")(wedge())
    }
    spark.stop()
  }
}
