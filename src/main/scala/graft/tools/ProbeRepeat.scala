package graft.tools

/** Ad-hoc: run one query N times in a warm JVM (caches reset between
  * runs) to separate JIT/first-codegen cost from the steady-state floor. */
object ProbeRepeat {
  def main(args: Array[String]): Unit = {
    val spark = graft.engine.GraftSession.get()
    val dir = args.headOption.getOrElse(graft.Bench.DriverSfDir)
    val name = if (args.length > 1) args(1) else "q30_ann_lsh"
    val n = if (args.length > 2) args(2).toInt else 5
    (1 to n).foreach { i =>
      graft.queries.TextOps.resetCaches()
      spark.catalog.clearCache()
      val t0 = System.nanoTime()
      graft.SparkEntry.queries(name)(spark, dir).write.format("noop").mode("overwrite").save()
      println(f"[rep] $name run$i ${(System.nanoTime()-t0)/1e9}%.2f s")
    }
    spark.stop()
  }
}
