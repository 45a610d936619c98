package graft

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}

import graft.engine.GraftSession

/** Benchmark main: runs every declared query against
  * SPARK_GRAFT_SF_DIR and prints one JSON line with per-query wall
  * seconds. Results are materialized through the noop sink so the full
  * plan (all projected columns) executes — `count()` would let Catalyst
  * prune most of the work and flatter the numbers.
  *
  * Hygiene: ALL caches (memoized tables, near-dup intermediates, any
  * persisted block) are cleared between queries, so every number is the
  * query's own self-contained cost — order-independent and free of
  * accumulated memory pressure. A failed query records NO time; failures
  * are listed in the JSON, `n_ok` counts the timed queries (so totals
  * are only compared across equal query sets), and the exit code flips
  * to 1 (loud, but the artifact still lands).
  *
  * Per-query `spill_bytes` / `shuffle_bytes` / `peak_mem_bytes` come
  * from a TaskEnd listener (memory+disk spill, shuffle read+write, max
  * per-task peak execution memory): wall time alone can't distinguish a
  * bad plan from environment memory pressure — the round-2 bench showed
  * one query swinging 21 s → 252 s on spill alone, with identical plans.
  */
object Bench {

  /** Sums task metrics between [[reset]] calls (single-JVM local mode:
    * one bus, benchmark runs queries strictly sequentially). */
  private final class MetricsListener extends SparkListener {
    val spill = new AtomicLong
    val shuffle = new AtomicLong
    val peakMem = new AtomicLong
    override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
      val m = t.taskMetrics
      if (m != null) {
        spill.addAndGet(m.memoryBytesSpilled + m.diskBytesSpilled)
        shuffle.addAndGet(m.shuffleReadMetrics.totalBytesRead
          + m.shuffleWriteMetrics.bytesWritten)
        peakMem.getAndAccumulate(m.peakExecutionMemory, math.max)
      }
    }
    def reset(): Unit = { spill.set(0); shuffle.set(0); peakMem.set(0) }
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.get()
    val listener = new MetricsListener
    spark.sparkContext.addSparkListener(listener)
    def reset(): Unit = {
      graft.queries.TextOps.resetCaches()
      graft.engine.Tables.clearCache()
      spark.catalog.clearCache()
    }
    // Warm the JVM once (classloading, codegen compiler, shuffle machinery)
    // so per-query numbers measure the queries, not first-touch costs.
    graft.engine.Tables.names.foreach(n =>
      graft.engine.Tables.table(spark, sfDir, n).schema)
    try SparkEntry.queries("q02_pricing_summary")(spark, sfDir)
      .write.format("noop").mode("overwrite").save()
    catch { case e: Throwable =>
      System.err.println(s"[bench] warmup failed: ${e.getMessage}")
    }
    val failures = scala.collection.mutable.ListBuffer.empty[String]
    val results = SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
      reset()
      org.apache.spark.graft.BusDrain.drain(spark.sparkContext)
      listener.reset()
      val t0 = System.nanoTime()
      try {
        fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        val secs = (System.nanoTime() - t0) / 1e9
        org.apache.spark.graft.BusDrain.drain(spark.sparkContext)
        Some((name, secs, listener.spill.get(), listener.shuffle.get(),
          listener.peakMem.get()))
      } catch { case e: Throwable =>
        System.err.println(s"[bench] $name FAILED: ${e.getMessage}")
        failures += name
        None
      }
    }
    def obj[T](f: ((String, Double, Long, Long, Long)) => T): String =
      results.map(r => "\"" + r._1 + "\":" + f(r)).mkString("{", ",", "}")
    val total = results.map(_._2).sum
    val errs = failures.map("\"" + _ + "\"").mkString("[", ",", "]")
    val fullJson = s"""{"metric":"total","value":$total,"unit":"sec","n_ok":${results.size},""" +
      s""""queries":${obj(_._2)},"spill_bytes":${obj(_._3)},""" +
      s""""shuffle_bytes":${obj(_._4)},"peak_mem_bytes":${obj(_._5)},""" +
      s""""errors":$errs,"sf":"$sfDir"}"""
    println(fullJson)
    // artifact self-defense: a tail-truncated capture of the (long) full
    // JSON loses the headline numbers, so ALSO end with a compact summary
    // line (itself a valid {"metric":"total",...} object) and persist the
    // full JSON to a committed path
    val slowest = results.sortBy(-_._2).take(5)
      .map(r => "\"" + r._1 + "\":" + r._2).mkString("{", ",", "}")
    try {
      java.nio.file.Files.createDirectories(java.nio.file.Paths.get("docs"))
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get("docs/BENCH_driver_last.json"), fullJson + "\n")
    } catch { case e: Throwable =>
      System.err.println(s"[bench] could not write docs/BENCH_driver_last.json: ${e.getMessage}")
    }
    println(s"""{"metric":"total","value":$total,"unit":"sec","n_ok":${results.size},""" +
      s""""errors":$errs,"slowest":$slowest,"full_json":"docs/BENCH_driver_last.json","sf":"$sfDir"}""")
    spark.stop()
    if (failures.nonEmpty) sys.exit(1)
  }
}
