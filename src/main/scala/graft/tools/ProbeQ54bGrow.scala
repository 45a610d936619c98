package graft.tools
import org.apache.spark.sql.functions._
import graft.queries.TextOps
import graft.engine.GraftSession

/** Which operation on the cached reps frame costs 5 CPU-s? */
object ProbeQ54bGrow {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.get()
    val dir = graft.Bench.DriverSfDir
    val sc = spark.sparkContext
    var cpuAcc = 0L
    sc.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onStageCompleted(
          e: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit =
        cpuAcc += e.stageInfo.taskMetrics.executorCpuTime
    })
    def timed(name: String)(body: => Unit): Unit = {
      val t0 = System.nanoTime(); val c0 = cpuAcc
      body
      org.apache.spark.graft.BusDrain.drain(sc)
      println(f"[gr] $name%-28s wall=${(System.nanoTime()-t0)/1e9}%5.2f cpu=${(cpuAcc-c0)/1e9}%5.2f")
    }
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    val reps = TextOps.passageReps(spark, dir)
    reps.count()
    for (r <- 1 to 3) {
      println(s"[gr] --- round $r ---")
      timed("count") { reps.count() }
      timed("proj_noop") { noop(reps.select(expr("doc_id div 1048576").as("d"))) }
      timed("proj_gs_noop") { noop(reps.select(col("gs"))) }
      timed("agg_count") { noop(reps.groupBy(expr("doc_id div 1048576").as("d")).agg(count(lit(1)))) }
      timed("agg_on_fresh_range") {
        noop(spark.range(15000).select((col("id") % 5000).as("d")).groupBy("d").agg(count(lit(1))))
      }
    }
    spark.stop()
  }
}
