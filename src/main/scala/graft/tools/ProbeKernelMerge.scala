package graft.tools

import org.apache.spark.sql.functions._
import graft.engine.GraftSession

/** Measures the DRIVER-side cost of the graph kernels' per-round
  * node-sized merges at the NodeBroadcastLimit ceiling (VERDICT r11
  * item 4: Graph.scala's kernelRounds collects a (i:Int, sk:Long) Row
  * per mailed node and minPropKernel collects typed (Int, Long) tuples
  * every round — fine on paper at 4M nodes ≈ 32 MB of payload, but the
  * q88 episode showed paper budgets hide boxing).
  *
  * Method (the ProbeCsrPack discipline): synthesize the exact merge
  * input each kernel collects — a shuffled aggregate of n (i, v) rows —
  * force GC, snapshot heap, run the collect + array scatter exactly as
  * the kernel does, sample peak heap at 50 ms, report bytes/node for
  * BOTH collect shapes plus the per-round rank-array broadcast.
  * Usage: runMain graft.tools.ProbeKernelMerge [nodesM] (default 4 =
  * the NodeBroadcastLimit ceiling). */
object ProbeKernelMerge {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.get()
    import spark.implicits._
    val n = args.headOption.map(_.toInt * 1000000).getOrElse(4000000)

    def usedHeap(): Long = {
      System.gc(); Thread.sleep(300); System.gc(); Thread.sleep(200)
      val r = Runtime.getRuntime
      r.totalMemory() - r.freeMemory()
    }
    def sampled[T](body: => T): (T, Long, Double) = {
      val peak = new java.util.concurrent.atomic.AtomicLong
      val sampler = new Thread(new Runnable {
        override def run(): Unit =
          while (!Thread.currentThread().isInterrupted) {
            val r = Runtime.getRuntime
            peak.getAndAccumulate(r.totalMemory() - r.freeMemory(), math.max)
            try Thread.sleep(50) catch { case _: InterruptedException => return }
          }
      })
      val before = usedHeap()
      sampler.setDaemon(true); sampler.start()
      val t0 = System.nanoTime()
      val out = body
      val wall = (System.nanoTime() - t0) / 1e9
      sampler.interrupt()
      (out, peak.get - before, wall)
    }

    // the merge input both kernels collect: one (i, v) row per node,
    // arriving through a real exchange + final aggregate
    val partials = spark.range(n.toLong)
      .select(col("id").cast("int").as("i"),
        (col("id") * 37L % 1000003L).as("k"))
      .groupBy("i").agg(sum(col("k")).as("sk"))
    partials.count() // warm the plan + cache nothing

    // kernelRounds shape: DataFrame Row collect + array scatter
    val (_, rowPeak, rowWall) = sampled {
      val sums = partials.collect()
      val nr = Array.fill(n)(Double.NaN)
      sums.foreach(row => nr(row.getInt(0)) = row.getLong(1).toDouble)
      nr.length
    }
    println(f"[kmerge] rows_collect n=$n wall=$rowWall%.1f s " +
      f"peak_delta=${rowPeak} (${rowPeak.toDouble / n}%.1f B/node transient)")

    // minPropKernel shape: typed Dataset collect of (Int, Long)
    val (_, tupPeak, tupWall) = sampled {
      val merged = partials.as[(Int, Long)].collect()
      val nv = Array.fill(n.toLong.toInt)(Long.MaxValue)
      merged.foreach { case (i, mv) => nv(i) = mv }
      nv.length
    }
    println(f"[kmerge] typed_collect n=$n wall=$tupWall%.1f s " +
      f"peak_delta=${tupPeak} (${tupPeak.toDouble / n}%.1f B/node transient)")

    // the round-12 production shape: primitive-packed per-partition
    // blocks (Graph.collectPackedIntLong — the packCsr discipline)
    val (_, packPeak, packWall) = sampled {
      val blocks = graft.queries.Graph.collectPackedIntLong(partials)
      val nv = Array.fill(n)(Long.MaxValue)
      blocks.foreach { case (is, vs) =>
        var j = 0
        while (j < is.length) { nv(is(j)) = vs(j); j += 1 }
      }
      nv.length
    }
    println(f"[kmerge] packed_collect n=$n wall=$packWall%.1f s " +
      f"peak_delta=${packPeak} (${packPeak.toDouble / n}%.1f B/node transient)")

    // per-round rank broadcast (kernelRounds broadcasts Array[Double],
    // minPropKernel Array[Long] — same 8 B/node payload)
    val r = Array.fill(n)(1.0 / n)
    val (_, bcPeak, bcWall) = sampled {
      val b = spark.sparkContext.broadcast(r)
      b.value.length // force serialization path setup
      spark.range(1).rdd.map(_ => b.value.length).collect() // ship it
      b.destroy()
    }
    println(f"[kmerge] rank_broadcast n=$n wall=$bcWall%.1f s " +
      f"peak_delta=${bcPeak} (${bcPeak.toDouble / n}%.1f B/node transient)")
    println(s"[kmerge] NOTE peak is JVM-wide (local mode: includes the " +
      s"32 executor-side agg maps a cluster spreads out); the driver-" +
      s"only retained state is the 8 B/node scatter array each round.")
    spark.stop()
  }
}
