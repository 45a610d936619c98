package graft.tools
import graft.queries.TextOps
import graft.engine.GraftSession
object ProbeQ54 {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.get()
    val dir = graft.Bench.DriverSfDir
    for (round <- 1 to 6) {
      TextOps.resetCaches(); spark.catalog.clearCache()
      val t0 = System.nanoTime()
      TextOps.q54_passage_dedup.fn(spark, dir)
        .write.format("noop").mode("overwrite").save()
      println(f"[q54] round $round wall=${(System.nanoTime()-t0)/1e9}%.2f")
    }
    spark.stop()
  }
}
