package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}

/** Throwaway: the REAL q25 pipeline at the given dir — write-sorted
  * stage table + the full final adaptive plan to /tmp/q25plan.txt. */
object ProbeQ25Plan {
  def main(args: Array[String]): Unit = {
    val spark = graft.engine.GraftSession.get()
    val dir = args.headOption.getOrElse(graft.Bench.DriverSfDir)
    val stages = scala.collection.mutable.ArrayBuffer.empty[(Int, Double, Long, Long, Long)]
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        val m = sc.stageInfo.taskMetrics
        stages += ((sc.stageInfo.stageId, m.executorCpuTime / 1e9,
          m.shuffleWriteMetrics.bytesWritten,
          m.memoryBytesSpilled + m.diskBytesSpilled, sc.stageInfo.numTasks))
      }
    })
    val t0 = System.nanoTime()
    val pairs = graft.queries.TextOps.jaccardPairs(spark, dir)
    val n = pairs.count()
    println(f"[plan] pairs=$n wall=${(System.nanoTime() - t0) / 1e9}%.1f s")
    org.apache.spark.graft.BusDrain.drain(spark.sparkContext)
    println("[plan] stage  cpu_s  writeMB  spillMB tasks   (by write)")
    stages.sortBy(-_._3).take(10).foreach { case (id, cpu, w, sp, nt) =>
      println(f"[plan] $id%5d $cpu%6.1f ${w / 1e6}%8.1f ${sp / 1e6}%8.1f $nt%5d")
    }
    java.nio.file.Files.writeString(java.nio.file.Paths.get("/tmp/q25plan.txt"),
      pairs.queryExecution.executedPlan.toString)
    spark.stop()
  }
}
