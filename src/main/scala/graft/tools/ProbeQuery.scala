package graft.tools

import graft.SparkEntry
import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}

import graft.engine.GraftSession

/** Generic diagnostic: run one registered query and attribute CPU,
  * runtime, and shuffle-write per stage. Usage:
  * `runMain graft.ProbeQuery <sfDir> <queryName>` */
object ProbeQuery {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.get()
    val dir = args.headOption.getOrElse(graft.Bench.DriverSfDir)
    val name = if (args.length > 1) args(1) else "q25_jaccard_neardup"
    val stages = scala.collection.mutable.ArrayBuffer.empty[(Int, Double, Double, Long, Long, Int)]
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        val si = sc.stageInfo
        val m = si.taskMetrics
        stages += ((si.stageId, m.executorCpuTime / 1e9, m.executorRunTime / 1e3,
          m.shuffleWriteMetrics.bytesWritten, m.inputMetrics.recordsRead +
            m.shuffleReadMetrics.recordsRead, si.numTasks))
      }
    })
    val t0 = System.nanoTime()
    val n = SparkEntry.queries(name)(spark, dir).count()
    println(f"[probe] $name rows=$n wall=${(System.nanoTime() - t0) / 1e9}%.2f")
    org.apache.spark.graft.BusDrain.drain(spark.sparkContext)
    println("[probe] stageId  cpu_s  run_s  shufMB    rowsIn tasks")
    stages.sortBy(-_._2).take(12).foreach { case (id, cpu, run, sh, rows, nt) =>
      println(f"[probe] $id%7d $cpu%6.1f $run%6.1f ${sh / 1e6}%7.1f $rows%9d $nt%5d")
    }
    spark.stop()
  }
}
