package graft.tools
import org.apache.spark.sql.functions._
import graft.queries.TextOps

/** A/B probe for q73's spreadScan decision: alternate the plain
  * one-split scan against the spread variant in one JVM, min-of-3. */
object ProbeQ73AB {
  def main(args: Array[String]): Unit = {
    val s = graft.engine.GraftSession.get()
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpu = new java.util.concurrent.atomic.AtomicLong(0)
    val spill = new java.util.concurrent.atomic.AtomicLong(0)
    s.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onTaskEnd(te: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
        Option(te.taskMetrics).foreach { m =>
          cpu.addAndGet(m.executorCpuTime); spill.addAndGet(m.memoryBytesSpilled)
        }
      }
    })
    def time(tag: String)(mk: => org.apache.spark.sql.DataFrame): Double = {
      s.sparkContext.setJobDescription(s"q73ab $tag")
      val c0 = cpu.get; val sp0 = spill.get
      val t0 = System.nanoTime()
      mk.write.format("noop").mode("overwrite").save()
      val dt = (System.nanoTime() - t0) / 1e9
      Thread.sleep(200) // drain listener
      println(f"[q73ab] $tag wall $dt%.2f s cpu ${(cpu.get - c0) / 1e9}%.2f s spill ${(spill.get - sp0) / 1e6}%.0f MB")
      dt
    }
    val base = graft.engine.Tables.table(s, dir, "documents")
    (1 to 4).foreach { i =>
      time(s"plain$i")(TextOps.substringDedupOf(base))
      time(s"spread$i")(TextOps.substringDedupOf(
        base.repartition(s.sparkContext.defaultParallelism, col("doc_id"))))
    }
    s.stop()
  }
}
