package graft.tools

import graft.SparkEntry

/** Ad-hoc helper (not part of the driver contract): dump named queries'
  * results to parquet for a local DuckDB oracle diff without running the
  * full Verify sweep. usage: ProbeDump <sfDir> <outDir> <name>... */
object ProbeDump {
  def main(args: Array[String]): Unit = {
    val spark = graft.engine.GraftSession.get()
    val dir = args(0)
    args.drop(2).foreach { name =>
      SparkEntry.queries(name)(spark, dir).coalesce(1)
        .write.mode("overwrite").parquet(s"${args(1)}/$name")
      println(s"[dump] $name ok")
    }
    spark.stop()
  }
}
