package graft.tools

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.functions._

/** Scale probe for the flagship near-dup pipeline: replicate the sf0.1
  * documents corpus K× (shard-tagged every 8th word, so cross-shard
  * similarity falls below the q25 threshold and the corpus is K× the
  * DISTINCT near-dup structure, not a pathological clique) and run the
  * exact PPJoin pipeline at 1× and K×, reporting wall, executor CPU,
  * shuffle bytes and — the claim under test — spill bytes (SCALING.md
  * says the pipeline is candidate-volume bound and spill-free at any
  * corpus size; this measures it at 10× instead of asserting it).
  *
  * This writes DERIVED data to /tmp purely as a perf fixture — queries
  * and oracles continue to run only against the driver's testdata. */
object ProbeScale {
  def main(args: Array[String]): Unit = {
    val spark = graft.engine.GraftSession.get()
    val k = args.headOption.map(_.toInt).getOrElse(10)
    // mode "dense" (default): tag every 8th word — replicas stay NEAR-DUPS
    // of each other (~10 near-copies per doc, the extreme-density stress).
    // mode "sparse": tag every 2nd word — cross-replica similarity dies,
    // the corpus is K× the DISTINCT near-dup structure (the normal-density
    // 10× claim: near-linear, spill-free).
    val mode = if (args.length > 1) args(1) else "dense"
    val step = if (mode == "sparse") 2 else 8
    val base = graft.Bench.DriverSfDir
    val out = s"/tmp/scale$k$mode"
    val spill = new AtomicLong; val shuffle = new AtomicLong; val cpuNs = new AtomicLong
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
        val m = t.taskMetrics
        if (m != null) {
          spill.addAndGet(m.memoryBytesSpilled + m.diskBytesSpilled)
          shuffle.addAndGet(m.shuffleReadMetrics.totalBytesRead + m.shuffleWriteMetrics.bytesWritten)
          cpuNs.addAndGet(m.executorCpuTime)
        }
      }
    })
    val docs = graft.engine.Tables.table(spark, base, "documents")
    spark.range(k).crossJoin(docs)
      .select((col("doc_id") + col("id") * 10000000L).as("doc_id"),
        array_join(expr("transform(split(text, ' '), (w, i) -> " +
          s"CASE WHEN i % $step = 0 THEN concat(w, '_s', id) ELSE w END)"), " ").as("text"),
        col("lang"), col("source"), col("n_chars"))
      .repartition(32)
      .write.mode("overwrite").parquet(s"$out/documents.parquet")

    def run(dir: String, label: String)(pairs: String => Long): Unit = {
      graft.queries.TextOps.resetCaches()
      spark.catalog.clearCache()
      spill.set(0); shuffle.set(0); cpuNs.set(0)
      val t0 = System.nanoTime()
      val n = pairs(dir)
      val secs = (System.nanoTime() - t0) / 1e9
      println(f"[scale] $label pairs=$n wall=$secs%.1f s cpu=${cpuNs.get / 1e9}%.1f s " +
        f"shuffle=${shuffle.get / 1e6}%.1f MB spill=${spill.get} B")
    }
    def exact(dir: String) = graft.queries.TextOps.jaccardPairs(spark, dir).count()
    def lsh(dir: String) = graft.queries.TextOps.lshJaccardPairs(spark, dir).count()
    // optional third arg "lsh": fixture + LSH runs only — the exact
    // path's candidate volume is Σ prefdf² ∝ K², so at K = 30 its
    // verify spill would exceed the sandbox disk; the LSH finder is
    // the documented path at that density and is what the probe checks
    val lshOnly = args.length > 2 && args(2) == "lsh"
    if (!lshOnly) {
      run(base, "exact-1x(warm-up)")(exact)
      run(base, "exact-1x")(exact)
      run(out, s"exact-${k}x-$mode")(exact)
    }
    run(base, "lsh-1x(warm-up)")(lsh)
    run(base, "lsh-1x")(lsh)
    run(out, s"lsh-${k}x-$mode")(lsh)
    spark.stop()
  }
}
