package graft.tools

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}

/** Throwaway: per-stage spill attribution for the near-dup pipeline. */
object ProbeSpill {
  def main(args: Array[String]): Unit = {
    val spark = graft.engine.GraftSession.get()
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", graft.Bench.DriverSfDir)
    val spill = new AtomicLong
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
        val m = t.taskMetrics
        if (m != null) spill.addAndGet(m.memoryBytesSpilled + m.diskBytesSpilled)
      }
    })
    def step(name: String)(f: => Long): Unit = {
      org.apache.spark.graft.BusDrain.drain(spark.sparkContext)
      spill.set(0)
      val t0 = System.nanoTime()
      val n = f
      org.apache.spark.graft.BusDrain.drain(spark.sparkContext)
      println(f"[probe] $name%-22s rows=$n%10d  ${(System.nanoTime() - t0) / 1e9}%6.2f s  spill=${spill.get()}%,14d")
    }
    val sh = graft.queries.TextOps.shingles(spark, dir).persist()
    step("shingles")(sh.count())
    val (cand, prefix) = graft.queries.TextOps.ppjoinCandidates(sh)
    val c = cand.persist()
    step("candidates")(c.count())
    prefix.unpersist()
    val sets = graft.queries.TextOps.shingleSets(spark, dir)
    step("verify")(graft.queries.TextOps.rawJaccard(sets, c).count())
    sh.unpersist(); c.unpersist()
    graft.queries.TextOps.resetCaches()
    graft.engine.Tables.clearCache()
    spark.catalog.clearCache()
    step("q25 unified")(graft.queries.TextOps.q25_jaccard_neardup.fn(spark, dir).count())
    val df = graft.queries.TextOps.q25_jaccard_neardup.fn(spark, dir)
    println(df.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted")))
    spark.stop()
  }
}
