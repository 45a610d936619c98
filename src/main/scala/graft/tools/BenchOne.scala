package graft.tools
import graft.SparkEntry
/** Ad-hoc single-query timing helper (not part of the driver contract). */
object BenchOne {
  def main(args: Array[String]): Unit = {
    val spark = graft.engine.GraftSession.get()
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", graft.Bench.DriverSfDir)
    args.foreach { name =>
      val t0 = System.nanoTime()
      SparkEntry.queries(name)(spark, dir).write.format("noop").mode("overwrite").save()
      println(f"$name ${(System.nanoTime()-t0)/1e9}%.2f s")
    }
    spark.stop()
  }
}
