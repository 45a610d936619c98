package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}

/** Throwaway: per-STAGE accounting of q85's timed window (rider form:
  * edge frame prewarmed) — names which stage carries the 40 cpu-s /
  * 45 MB shuffle the bench listener attributes to a query whose rounds
  * should be node-sized. */
object ProbeQ85Stages {
  def main(args: Array[String]): Unit = {
    val spark = graft.engine.GraftSession.get()
    spark.sparkContext.setLogLevel("WARN")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", graft.Bench.DriverSfDir)
    import graft.queries.Graph
    val stages = scala.collection.mutable.ArrayBuffer.empty[String]
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        val i = sc.stageInfo
        val m = i.taskMetrics
        stages += f"stage ${i.stageId}%3d tasks=${i.numTasks}%3d " +
          f"cpu=${m.executorCpuTime / 1e9}%7.2f run=${m.executorRunTime / 1e3}%7.2f " +
          f"shufR=${m.shuffleReadMetrics.totalBytesRead / 1e6}%8.2f " +
          f"shufW=${m.shuffleWriteMetrics.bytesWritten / 1e6}%8.2f  ${i.name.take(70)}"
      }
    })
    // PROBE_WARM=1 replays the bench's JMH discipline: run the same
    // query once untimed against sf0.001 (janino + JIT warm), then a
    // full cache reset so the timed window still pays its own builds —
    // without it the stage profile measures compilation, not the plan
    if (sys.env.get("PROBE_WARM").contains("1")) {
      val warmDir = java.nio.file.Paths.get(dir).getParent.resolve("sf0.001").toString
      graft.SparkEntry.queries(sys.env.getOrElse("PROBE_Q", "q85_pagerank"))(spark, warmDir)
        .write.format("noop").mode("overwrite").save()
      graft.queries.TextOps.resetCaches()
      graft.engine.Tables.clearCache()
      spark.catalog.clearCache()
    }
    // prewarm exactly like the bench rider
    if (sys.env.getOrElse("PROBE_Q","").contains("85b")) () else Graph.coPurchaseEdges(spark, dir)
    Thread.sleep(500)
    stages.clear()
    val t0 = System.nanoTime()
    graft.SparkEntry.queries(sys.env.getOrElse("PROBE_Q", "q85_pagerank"))(spark, dir)
      .write.format("noop").mode("overwrite").save()
    val wall = (System.nanoTime() - t0) / 1e9
    Thread.sleep(500)
    stages.foreach(println)
    println(f"[q85stages] wall $wall%.2f s")
    spark.stop()
  }
}
