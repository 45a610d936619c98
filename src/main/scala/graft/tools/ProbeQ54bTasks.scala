package graft.tools
import org.apache.spark.scheduler._
import graft.queries.TextOps
import graft.engine.GraftSession

/** Per-task CPU for q54b's fat union stage (round 12). */
object ProbeQ54bTasks {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.get()
    val dir = graft.Bench.DriverSfDir
    val tasks = scala.collection.mutable.ArrayBuffer.empty[(Int, Long, Double, Double, Double)]
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onTaskEnd(e: SparkListenerTaskEnd): Unit = {
        val m = e.taskMetrics
        tasks += ((e.stageId, e.taskInfo.taskId, m.executorCpuTime/1e9,
          m.executorDeserializeCpuTime/1e9, m.executorRunTime/1e3))
      }
    })
    TextOps.q54b_passage_neardup.fn(spark, dir)
      .write.format("noop").mode("overwrite").save()
    tasks.clear()
    TextOps.q54b_passage_neardup.fn(spark, dir)
      .write.format("noop").mode("overwrite").save()
    org.apache.spark.graft.BusDrain.drain(spark.sparkContext)
    val byStage = tasks.groupBy(_._1).toSeq.sortBy(_._1)
    byStage.foreach { case (sid, ts) =>
      val cpu = ts.map(_._3).sum; val des = ts.map(_._4).sum; val run = ts.map(_._5).sum
      println(f"[tk] stage $sid tasks=${ts.size}%3d cpu=$cpu%6.2f deserCpu=$des%6.2f run=$run%6.2f")
      if (cpu > 1.0) ts.sortBy(-_._3).take(8).foreach { case (_, tid, c, d, r) =>
        println(f"[tk]    task $tid cpu=$c%5.3f deser=$d%5.3f run=$r%5.3f")
      }
    }
    spark.stop()
  }
}
