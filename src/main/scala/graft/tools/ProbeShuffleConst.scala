package graft.tools
import org.apache.spark.sql.functions._
import org.apache.spark.sql.SparkSession

/** Bisect the fixed CPU cost of a tiny shuffle aggregate (round 12):
  * a groupBy-count over range(15k) costs ~5 executor-CPU-s regardless
  * of data — which knob owns it? */
object ProbeShuffleConst {
  def main(args: Array[String]): Unit = {
    val overrides = args.grouped(2).collect { case Array(k, v) => (k, v) }.toSeq
    var b = graft.engine.GraftSession.builder()
    overrides.foreach { case (k, v) => b = b.config(k, v) }
    val spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val sc = spark.sparkContext
    var cpuAcc = 0L
    sc.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onStageCompleted(
          e: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit =
        cpuAcc += e.stageInfo.taskMetrics.executorCpuTime
    })
    for (r <- 1 to 5) {
      val t0 = System.nanoTime(); val c0 = cpuAcc
      spark.range(15000).select((col("id") % 5000).as("d"))
        .groupBy("d").agg(count(lit(1)))
        .write.format("noop").mode("overwrite").save()
      org.apache.spark.graft.BusDrain.drain(sc)
      println(f"[sc] iter $r wall=${(System.nanoTime()-t0)/1e9}%5.2f cpu=${(cpuAcc-c0)/1e9}%5.2f overrides=${overrides.mkString(",")}")
    }
    spark.stop()
  }
}
