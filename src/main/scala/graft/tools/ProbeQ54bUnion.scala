package graft.tools
import org.apache.spark.sql.functions._
import graft.queries.TextOps
import graft.engine.GraftSession

/** Union-stage cost isolation for q54b (round 12). */
object ProbeQ54bUnion {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.get()
    val dir = graft.Bench.DriverSfDir
    val sc = spark.sparkContext
    var cpuAcc = 0L
    var verbose = false
    sc.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onStageCompleted(
          e: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
        cpuAcc += e.stageInfo.taskMetrics.executorCpuTime
        if (verbose) {
          val si = e.stageInfo
          println(f"[un]     stage ${si.stageId}%4d tasks=${si.numTasks}%3d cpu=${si.taskMetrics.executorCpuTime/1e9}%5.2f gc=${si.taskMetrics.jvmGCTime/1e3}%5.2f  ${si.name.take(60)}")
        }
      }
    })
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    def timed(name: String)(body: => Unit): Unit = {
      val t0 = System.nanoTime(); val before = cpuAcc
      body
      org.apache.spark.graft.BusDrain.drain(sc)
      println(f"[un] $name%-24s wall=${(System.nanoTime()-t0)/1e9}%6.2f cpu=${(cpuAcc-before)/1e9}%6.2f")
    }
    TextOps.passageReps(spark, dir).count() // fill cache
    val nullL = lit(null).cast("long")
    def perDoc = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"),
        ceil(size(split(trim(regexp_replace(lower(col("text")), "\\s+", " ")), " ")) / 20.0).cast("long").as("n_pass"),
        nullL.as("rep"), nullL.as("nd_okey"))
    def repRows = TextOps.passageReps(spark, dir)
      .select(expr("doc_id div 1048576").as("doc_id"), nullL.as("n_pass"),
        lit(1L).as("rep"), nullL.as("nd_okey"))
    def agg(df: org.apache.spark.sql.DataFrame) =
      df.groupBy("doc_id").agg(max("n_pass").as("n_pass"),
        count(col("rep")).as("n_rep"), count(col("nd_okey")).as("n_nd"))
    for (r <- 1 to 3) {
      println(s"[un] --- round $r ---")
      timed("agg(perDoc only)") { noop(agg(perDoc)) }
      verbose = r == 3
      timed("agg(repRows only)") { noop(agg(repRows)) }
      verbose = false
      timed("agg(perDoc+repRows)") { noop(agg(perDoc.unionByName(repRows))) }
      timed("full_q54b") { noop(TextOps.q54b_passage_neardup.fn(spark, dir)) }
    }
    spark.stop()
  }
}
