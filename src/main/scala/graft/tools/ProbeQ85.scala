package graft.tools

/** Throwaway: q85 cost split — edge build vs PR rounds, bench-style
  * noop-write materialization. */
object ProbeQ85 {
  def main(args: Array[String]): Unit = {
    val spark = graft.engine.GraftSession.get()
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", graft.Bench.DriverSfDir)
    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[q85] $label ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    def noop(q: String): Unit =
      graft.SparkEntry.queries(q)(spark, dir).write.format("noop").mode("overwrite").save()
    t("warmup (cold jvm)")(noop("q85_pagerank"))
    graft.queries.TextOps.resetCaches(); spark.catalog.clearCache()
    t("bench-style q85")(noop("q85_pagerank"))
    graft.queries.TextOps.resetCaches(); spark.catalog.clearCache()
    t("bench-style q85 run2")(noop("q85_pagerank"))
    t("warm rounds only")(noop("q85_pagerank"))
    graft.queries.TextOps.resetCaches(); spark.catalog.clearCache()
    t("edge build only")(graft.queries.Graph.coPurchaseEdges(spark, dir).count())
    t("rounds after build")(noop("q85_pagerank"))
    spark.stop()
  }
}
