package graft.tools
import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import graft.queries.TextOps
import graft.engine.GraftSession
object ProbeQ54bStages {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.get()
    val dir = args.headOption.getOrElse(graft.Bench.DriverSfDir)
    val stages = scala.collection.mutable.ArrayBuffer.empty[(Int, Double, Double, Int, String)]
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        val si = sc.stageInfo
        val m = si.taskMetrics
        stages += ((si.stageId, m.executorCpuTime / 1e9, m.executorRunTime / 1e3,
          si.numTasks, si.name.take(60)))
      }
    })
    for (round <- 1 to 3) {
      TextOps.resetCaches(); spark.catalog.clearCache()
      stages.clear()
      val t0 = System.nanoTime()
      TextOps.q54b_passage_neardup.fn(spark, dir).write.format("noop").mode("overwrite").save()
      org.apache.spark.graft.BusDrain.drain(spark.sparkContext)
      println(f"[probe] round $round wall=${(System.nanoTime()-t0)/1e9}%.2f cpu=${stages.map(_._2).sum}%.1f")
      if (round == 3) stages.sortBy(-_._3).take(15).foreach { case (id, cpu, run, nt, nm) =>
        println(f"[probe] $id%5d cpu=$cpu%5.2f run=$run%6.2f tasks=$nt%3d $nm")
      }
    }
    spark.stop()
  }
}
