package graft.tools
import graft.SparkEntry

/** Phase decomposition for q85b: pair build+fold vs dense rewrite vs
  * rounds — wall + executor CPU per phase, two repetitions. */
object ProbeQ85bPhases {
  def main(args: Array[String]): Unit = {
    val s = graft.engine.GraftSession.get()
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpu = new java.util.concurrent.atomic.AtomicLong(0)
    s.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onTaskEnd(te: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit =
        Option(te.taskMetrics).foreach(m => cpu.addAndGet(m.executorCpuTime))
    })
    def time(tag: String)(body: => Unit): Unit = {
      s.sparkContext.setJobDescription(s"q85b $tag")
      val c0 = cpu.get; val t0 = System.nanoTime()
      body
      val dt = (System.nanoTime() - t0) / 1e9
      Thread.sleep(200)
      println(f"[q85b] $tag wall $dt%.2f s cpu ${(cpu.get - c0) / 1e9}%.2f s")
    }
    (1 to 3).foreach { i =>
      graft.queries.TextOps.resetCaches()
      time(s"r$i pairs-only")(graft.queries.Graph.coPurchasePairs(s, dir)
        .write.format("noop").mode("overwrite").save())
      graft.queries.TextOps.resetCaches()
      time(s"r$i full")(SparkEntry.queries("q85b_weighted_pagerank")(s, dir)
        .write.format("noop").mode("overwrite").save())
      time(s"r$i warm-rerun")(SparkEntry.queries("q85b_weighted_pagerank")(s, dir)
        .write.format("noop").mode("overwrite").save())
    }
    s.stop()
  }
}
