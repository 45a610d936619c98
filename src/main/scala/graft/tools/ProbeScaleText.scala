package graft.tools

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}

/** 10×/1× wall ratios for the documents-only text family, against the
  * ProbeScale "sparse" fixture (run ProbeScale first). A claimed
  * near-linear operator should land well under 10× wall at 10× data
  * on 32 cores (the 1× runs are partially constant-bound). */
object ProbeScaleText {
  def main(args: Array[String]): Unit = {
    val spark = graft.engine.GraftSession.get()
    val base = graft.Bench.DriverSfDir
    val big = args.headOption.getOrElse("/tmp/scale10sparse")
    val spill = new AtomicLong
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
        val m = t.taskMetrics
        if (m != null) spill.addAndGet(m.memoryBytesSpilled + m.diskBytesSpilled)
      }
    })
    val qs = Seq("q16_dedup_exact", "q21_lang_id", "q22_quality_score",
      "q23_token_stats", "q24_fingerprint", "q57_bm25", "q59_inverted_index",
      "q63_quality_curation", "q73_substring_dedup", "q29_tfidf")
    def time(name: String, dir: String): Double = {
      graft.queries.TextOps.resetCaches()
      spark.catalog.clearCache()
      val t0 = System.nanoTime()
      graft.SparkEntry.queries(name)(spark, dir)
        .write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    qs.foreach(q => time(q, base)) // warm
    qs.foreach { q =>
      val t1 = time(q, base)
      spill.set(0)
      val t10 = time(q, big)
      println(f"[tscale] $q 1x=$t1%.1f s 10x=$t10%.1f s ratio=${t10 / t1}%.1f spill10x=${spill.get} B")
    }
    spark.stop()
  }
}
