package graft.tools

import org.apache.spark.sql.functions._
import graft.engine.{GraftSession, Tables}
import graft.queries.TextOps

/** Throwaway diagnostic: q71 stage timing at a given SF. */
object ProbeQ71 {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.get()
    val stages = scala.collection.mutable.ArrayBuffer.empty[(Int, Double, Double, Long)]
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onStageCompleted(sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
        val m = sc.stageInfo.taskMetrics
        stages += ((sc.stageInfo.stageId, m.executorCpuTime / 1e9,
          m.executorRunTime / 1e3, m.shuffleWriteMetrics.bytesWritten))
      }
    })
    val dir = args.headOption.getOrElse(graft.Bench.DriverSfDir)
    def mark(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"[probe] $label%-14s rows=$n%-9d wall=${(System.nanoTime() - t0) / 1e9}%.2fs")
    }
    val d = Tables.table(spark, dir, "documents")
    mark("lshPairs")(TextOps.lshJaccardPairs(spark, dir).count())
    mark("toks")(TextOps.substringToks(d).count())
    mark("windows")(TextOps.substringWindows(TextOps.substringToks(d)).count())
    mark("q73full")(TextOps.substringDedupOf(d).count())
    mark("q71full")(graft.queries.Pipeline.q71_curate_corpus.fn(spark, dir).count())
    stages.clear()
    mark("q71again")(graft.queries.Pipeline.q71_curate_corpus.fn(spark, dir).count())
    org.apache.spark.graft.BusDrain.drain(spark.sparkContext)
    println(f"[probe] q71again stages: n=${stages.size} cpuSum=${stages.map(_._2).sum}%.1f runSum=${stages.map(_._3).sum}%.1f")
    stages.sortBy(-_._3).take(10).foreach { case (id, cpu, run, sh) =>
      println(f"[probe]   stage $id%4d cpu=$cpu%5.2f run=$run%5.2f shufMB=${sh/1e6}%7.2f") }
    spark.stop()
  }
}
