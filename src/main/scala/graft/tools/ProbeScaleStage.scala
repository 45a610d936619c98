package graft.tools

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}

/** Stage-by-stage spill attribution for the ProbeScale 10x run. */
object ProbeScaleStage {
  def main(args: Array[String]): Unit = {
    val spark = graft.engine.GraftSession.get()
    val dir = args.headOption.getOrElse("/tmp/scale10")
    val spill = new AtomicLong; val shuffle = new AtomicLong
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
        val m = t.taskMetrics
        if (m != null) {
          spill.addAndGet(m.memoryBytesSpilled + m.diskBytesSpilled)
          shuffle.addAndGet(m.shuffleReadMetrics.totalBytesRead + m.shuffleWriteMetrics.bytesWritten)
        }
      }
    })
    def stage[T](label: String)(f: => T): T = {
      spill.set(0); shuffle.set(0)
      val t0 = System.nanoTime(); val r = f
      println(f"[stage] $label wall=${(System.nanoTime() - t0) / 1e9}%.1f s " +
        f"shuffle=${shuffle.get / 1e6}%.1f MB spill=${spill.get / 1e6}%.1f MB")
      r
    }
    val sh = stage("shingles")(graft.queries.TextOps.shingles(spark, dir))
    val (cand, prefix) = graft.queries.TextOps.ppjoinCandidates(sh)
    val candP = cand.persist()
    stage("candidates")(println("  n_cand=" + candP.count()))
    val sets = stage("shingleSets-build")(graft.queries.TextOps.shingleSets(spark, dir))
    stage("verify")(println("  n_pairs=" +
      graft.queries.TextOps.rawJaccard(sets, candP).count()))
    prefix.unpersist()
    spark.stop()
  }
}
