package graft.tools

import org.apache.spark.sql.functions._
import graft.queries.TextOps
import graft.engine.GraftSession

/** Sub-frame CPU/wall breakdown for q54b (round 12) — cache filled
  * UNTIMED first so each part measures only its own work. */
object ProbeQ54bParts {
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

    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    def timed(name: String)(body: => Unit): Unit = {
      val t0 = System.nanoTime()
      val before = cpuAcc
      body
      org.apache.spark.graft.BusDrain.drain(sc)
      println(f"[parts] $name%-28s wall=${(System.nanoTime()-t0)/1e9}%6.2f cpu=${(cpuAcc-before)/1e9}%6.2f")
    }

    val norm = trim(regexp_replace(lower(col("text")), "\\s+", " "))
    for (round <- 1 to 3) {
      println(s"[parts] --- round $round ---")
      TextOps.resetCaches(); spark.catalog.clearCache()
      timed("reps_fill") { TextOps.passageReps(spark, dir).count() }
      timed("perDoc") {
        noop(spark.read.parquet(s"$dir/documents.parquet")
          .select(col("doc_id"), size(split(norm, " ")).as("nw")))
      }
      timed("repRows_hot") {
        noop(TextOps.passageReps(spark, dir)
          .select(expr("doc_id div 1048576").as("doc_id")))
      }
      timed("ndKernel_hot") {
        noop(TextOps.nearDupRepsKernel(spark, dir))
      }
      timed("pairsKernel_hot") {
        noop(TextOps.countedPairsKernel(spark, dir))
      }
      timed("full_hotcache") { noop(TextOps.q54b_passage_neardup.fn(spark, dir)) }
      timed("full_again") { noop(TextOps.q54b_passage_neardup.fn(spark, dir)) }
    }
    spark.stop()
  }
}
