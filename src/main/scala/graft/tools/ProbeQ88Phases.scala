package graft.tools

import org.apache.spark.sql.functions._

/** Round-13: decompose q88's standalone wall (edge build + stats +
  * orientation + CSR pack + intersect sweep) with bench-style cache
  * resets, reporting wall AND executor cpu per phase. */
object ProbeQ88Phases {
  def main(args: Array[String]): Unit = {
    val s = graft.engine.GraftSession.get()
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", graft.Bench.DriverSfDir)
    val cpu = new java.util.concurrent.atomic.AtomicLong
    s.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onTaskEnd(t: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit =
        if (t.taskMetrics != null) cpu.addAndGet(t.taskMetrics.executorCpuTime)
    })
    def t(label: String)(f: => Unit): Unit = {
      cpu.set(0)
      val t0 = System.nanoTime(); f
      org.apache.spark.graft.BusDrain.drain(s.sparkContext)
      println(f"[q88p] $label%-34s wall ${(System.nanoTime() - t0) / 1e9}%.2f s  cpu ${cpu.get / 1e9}%.2f s")
    }
    def reset(): Unit = { graft.queries.TextOps.resetCaches(); s.catalog.clearCache() }
    // warm codegen/JIT once
    graft.SparkEntry.queries("q88_triangles")(s, dir).write.format("noop").mode("overwrite").save()
    (1 to 2).foreach { i =>
      reset()
      t(s"r$i edge build (memo persist+stats)") {
        graft.queries.Graph.coPurchaseEdges(s, dir).count()
      }
      t(s"r$i q88 increment (orient+csr+sweep)") {
        graft.SparkEntry.queries("q88_triangles")(s, dir)
          .write.format("noop").mode("overwrite").save()
      }
      reset()
      t(s"r$i q88 standalone (carrier cost)") {
        graft.SparkEntry.queries("q88_triangles")(s, dir)
          .write.format("noop").mode("overwrite").save()
      }
    }
    s.stop()
  }
}
