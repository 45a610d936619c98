package graft.tools
import org.apache.spark.sql.functions._
import org.apache.spark.sql.DataFrame
import graft.SparkEntry

/** r13 mid-tier sweep: steady-state wall+CPU for the not-yet-examined
  * queries, plus a q04 spreadScan A/B (same one-split lineitem shape the
  * q02 family fixed). Alternated in one JVM, min-of-N. */
object ProbeMidTier {
  def main(args: Array[String]): Unit = {
    val s = graft.engine.GraftSession.get()
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpu = new java.util.concurrent.atomic.AtomicLong(0)
    s.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onTaskEnd(te: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit =
        Option(te.taskMetrics).foreach(m => cpu.addAndGet(m.executorCpuTime))
    })
    def time(tag: String)(mk: => DataFrame): Unit = {
      s.sparkContext.setJobDescription(s"midtier $tag")
      val c0 = cpu.get; val t0 = System.nanoTime()
      mk.write.format("noop").mode("overwrite").save()
      val dt = (System.nanoTime() - t0) / 1e9
      Thread.sleep(150)
      println(f"[mid] $tag%-26s wall $dt%6.2f s cpu ${(cpu.get - c0) / 1e9}%6.2f s")
    }
    val names = if (args.nonEmpty) args.toSeq else Seq(
      "q04_revenue_by_nation", "q103_ks_test", "q13b_map_props",
      "q96_range_frame", "q47_contamination", "q47b_contamination_bloom",
      "q98_label_prop", "q26_minhash_lsh", "q38b_approx_percentiles")
    (1 to 3).foreach { i =>
      names.foreach { n =>
        graft.queries.TextOps.resetCaches()
        graft.engine.Tables.clearCache()
        s.catalog.clearCache()
        time(s"$n#$i")(SparkEntry.queries(n)(s, dir))
      }
    }
    s.stop()
  }
}
