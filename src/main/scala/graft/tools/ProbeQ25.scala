package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}

import graft.engine.GraftSession

/** Throwaway diagnostic: q25 candidate-volume and per-stage CPU
  * accounting at a given SF — how many PPJoin candidates survive each
  * exact filter, what the verify join ships, and which stages burn the
  * CPU budget. */
object ProbeQ25 {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.get()
    val dir = args.headOption.getOrElse(graft.Bench.DriverSfDir)
    import org.apache.spark.sql.functions._
    val stages = scala.collection.mutable.ArrayBuffer.empty[(Int, String, Double, Double, Long, Long)]
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        val si = sc.stageInfo
        val m = si.taskMetrics
        stages += ((si.stageId, si.name.takeWhile(_ != '('),
          m.executorCpuTime / 1e9, m.executorRunTime / 1e3,
          m.shuffleWriteMetrics.bytesWritten, si.numTasks))
      }
    })
    def mark(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"[probe] $label%-12s rows=$n%-9d wall=${(System.nanoTime() - t0) / 1e9}%.2fs")
    }
    mark("docSets")(graft.queries.TextOps.shingleSets(spark, dir).count())
    // sub-plan isolation: explode, df join, windows
    val sh = graft.queries.TextOps.shingles(spark, dir)
    mark("explode")(sh.count())
    val dfTab = sh.groupBy("g").agg(count(lit(1)).as("df"))
    mark("dfTab")(dfTab.count())
    mark("dfJoin")(sh.join(dfTab, "g").count())
    val w = org.apache.spark.sql.expressions.Window.partitionBy("doc_id").orderBy(col("df"), col("g"))
    mark("ranked")(sh.join(dfTab, "g")
      .withColumn("pos", row_number().over(w))
      .withColumn("n", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window.partitionBy("doc_id"))).count())
    val tau = 0.8
    val rankedDf = sh.join(dfTab, "g")
      .withColumn("pos", row_number().over(w))
      .withColumn("n", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window.partitionBy("doc_id")))
    mark("prefixNP")(rankedDf
      .filter(col("pos") <= col("n") - ceil(lit(tau) * col("n")) + 1)
      .filter(col("pos") >= 0).count())
    val (cand, prefix) = graft.queries.TextOps.ppjoinCandidates(
      graft.queries.TextOps.shingles(spark, dir))
    mark("prefix")(prefix.count())
    mark("preAgg")(prefix.select(col("doc_id").as("d1"), col("g"), col("pos").as("pa"), col("n").as("na"))
      .join(prefix.select(col("doc_id").as("d2"), col("g"), col("pos").as("pb"), col("n").as("nb")), "g")
      .filter(col("d1") < col("d2"))
      .filter(col("na") >= lit(tau) * col("nb") && col("nb") >= lit(tau) * col("na"))
      .count())
    val candCached = cand.persist()
    mark("candidates")(candCached.count())
    mark("verified")(graft.queries.TextOps.rawJaccard(
      graft.queries.TextOps.shingleSets(spark, dir), candCached).count())
    org.apache.spark.graft.BusDrain.drain(spark.sparkContext)
    println("[probe] stageId  cpu_s  run_s  shufMB tasks  name")
    stages.sortBy(-_._3).take(12).foreach { case (id, name, cpu, run, sh, nt) =>
      println(f"[probe] $id%7d $cpu%6.1f $run%6.1f ${sh / 1e6}%7.1f $nt%5d  $name")
    }
    spark.stop()
  }
}
