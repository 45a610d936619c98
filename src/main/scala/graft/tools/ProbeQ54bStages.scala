package graft.tools
import org.apache.spark.scheduler._
import graft.queries.TextOps
import graft.engine.GraftSession

/** Named-stage CPU/timeline breakdown for the FULL q54b (round 12). */
object ProbeQ54bStages {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.get()
    val dir = graft.Bench.DriverSfDir
    val ev = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Int, Int, Double)]
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        val si = sc.stageInfo
        ev += ((si.submissionTime.getOrElse(0L), si.completionTime.getOrElse(0L),
          si.stageId, si.numTasks, si.taskMetrics.executorCpuTime/1e9))
      }
    })
    TextOps.q54b_passage_neardup.fn(spark, dir)
      .write.format("noop").mode("overwrite").save()  // warm, fill caches
    for (round <- 1 to 3) {
      ev.clear()
      val t0j = System.currentTimeMillis()
      val t0 = System.nanoTime()
      TextOps.q54b_passage_neardup.fn(spark, dir)
        .write.format("noop").mode("overwrite").save()
      val wall = (System.nanoTime()-t0)/1e9
      org.apache.spark.graft.BusDrain.drain(spark.sparkContext)
      println(f"[st] round $round wall=$wall%.2f")
      if (round == 3) ev.sortBy(_._1).foreach { case (sub, comp, id, nt, cpu) =>
        println(f"[st]   stage $id%4d t+${(sub-t0j)/1000.0}%5.2f..${(comp-t0j)/1000.0}%5.2f (${(comp-sub)/1000.0}%5.2f s) tasks=$nt%3d cpu=$cpu%5.2f")
      }
    }
    spark.stop()
  }
}
