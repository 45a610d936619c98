package graft.tools
import graft.queries.TextOps
import graft.engine.GraftSession

/** Times q54b's two exact candidate plans (counted join vs PPJoin) in
  * isolation at the driver fixture (round 12 perf work). */
object ProbeQ54bSides {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.get()
    val dir = graft.Bench.DriverSfDir
    def run(name: String, force: Boolean): Unit = {
      for (round <- 1 to 3) {
        TextOps.resetCaches(); spark.catalog.clearCache()
        val t0 = System.nanoTime()
        TextOps.passageNearDupPairs(spark, dir, forcePpjoin = force)
          .write.format("noop").mode("overwrite").save()
        val wall = (System.nanoTime()-t0)/1e9
        org.apache.spark.graft.BusDrain.drain(spark.sparkContext)
        println(f"[sides] $name round $round wall=$wall%.2f")
      }
    }
    run("counted", force = false)
    run("ppjoin ", force = true)
    run("counted", force = false)
    spark.stop()
  }
}
