package graft.tools

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}

/** Measure, don't argue (VERDICT r12 item 3): the 100× campaign saw an
  * 82.9 GB spill in q88's co-purchase EDGE BUILD (the basket self-join
  * exchange) under local[32] @ 64g — 2 GB of execution memory per core.
  * The diagnosis was "memory-class artifact of local mode: a cluster
  * slot has 4-8 GB/core, and the exchange would hold". This tool turns
  * that into a measurement: it materializes ONLY the edge frame (the
  * same memoized persist q85/q88/q90/q98 consume) and reports
  * wall/spill/shuffle/peak-mem for the (threads, heap) the caller set
  * via SPARK_GRAFT_CPUS / SPARK_DRIVER_MEM — run it at 32 threads to
  * reproduce the campaign figure, then at 8-16 threads (same heap) for
  * the cluster-slot memory-per-core points.
  */
object ProbeQ88Edges {
  def main(args: Array[String]): Unit = {
    val spark = graft.engine.GraftSession.get()
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", graft.Bench.DriverSfDir)
    val spill = new AtomicLong
    val shuffle = new AtomicLong
    val peak = new AtomicLong
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
        val m = t.taskMetrics
        if (m != null) {
          spill.addAndGet(m.memoryBytesSpilled + m.diskBytesSpilled)
          shuffle.addAndGet(m.shuffleReadMetrics.totalBytesRead
            + m.shuffleWriteMetrics.bytesWritten)
          peak.getAndAccumulate(m.peakExecutionMemory, math.max)
        }
      }
    })
    val threads = graft.engine.GraftSession.cpus
    val heapMb = Runtime.getRuntime.maxMemory() / (1024 * 1024)
    val t0 = System.nanoTime()
    // the production build: memoized persist + stats action (count)
    val edges = graft.queries.Graph.coPurchaseEdges(spark, dir)
    val nEdges = edges.count()
    org.apache.spark.graft.BusDrain.drain(spark.sparkContext)
    val secs = (System.nanoTime() - t0) / 1e9
    println(f"""{"probe":"q88_edge_build","sf":"$dir","threads":$threads,""" +
      f""""heap_mb":$heapMb,"edges":$nEdges,"wall_s":$secs%.1f,""" +
      f""""spill_bytes":${spill.get()},"shuffle_bytes":${shuffle.get()},""" +
      f""""peak_mem_bytes":${peak.get()}}""")
    spark.stop()
  }
}
