package graft.tools

import graft.engine.GraftSession

/** Measures the DRIVER-side transient footprint of the q88 CSR pack
  * ([[graft.queries.Graph.packCsr]]) at synthetic near-gate sizes —
  * VERDICT r10 item 4: the 128M-edge TriangleCsrEdgeLimit was justified
  * by the packed 4 B/edge CSR alone, while the collect that precedes it
  * shipped boxed (Int, Array[Int]) tuples whose real driver cost was
  * never measured. The round-11 pack collects primitive-packed
  * per-partition blocks instead; this probe puts a number on it.
  *
  * Method: generate a deterministic synthetic oriented edge RDD
  * (LCG-seeded per partition, sqrt-bounded src universe like the degree
  * orientation produces), force a full GC, snapshot used heap, run
  * packCsr, snapshot used heap again holding BOTH the packed blocks'
  * result (transient) and the CSR (retained), and report bytes/edge.
  * Usage: runMain graft.tools.ProbeCsrPack [edgesM] [nodesM]
  * (defaults 64 and 4; pass 128 4 for the gate ceiling — needs
  * SPARK_DRIVER_MEM comfortably above 2 GB for the blocks + CSR). */
object ProbeCsrPack {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.get()
    val sc = spark.sparkContext
    val edges = args.headOption.map(_.toLong * 1000000L).getOrElse(64000000L)
    val nNodes = args.drop(1).headOption.map(_.toInt * 1000000).getOrElse(4000000)
    val parts = 32
    val perPart = edges / parts
    // node ids: dense 0..n-1 as longs (binarySearch degenerates to an
    // index probe — same code path, same memory shape)
    val ids = Array.tabulate(nNodes)(_.toLong)
    val bIds = sc.broadcast(ids)
    val rdd = sc.parallelize(0 until parts, parts).mapPartitions { pit =>
      val p = pit.next()
      var x = 0x9E3779B97F4A7C15L ^ (p * 0xBF58476D1CE4E5B9L)
      def nxt(): Long = { // splitmix64 — deterministic per partition
        x += 0x9E3779B97F4A7C15L
        var z = x
        z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
        z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
        z ^ (z >>> 31)
      }
      Iterator.fill(perPart.toInt) {
        val s = math.floorMod(nxt(), nNodes.toLong)
        val t = math.floorMod(nxt(), nNodes.toLong)
        (s, t)
      }
    }
    def usedHeap(): Long = {
      System.gc(); Thread.sleep(300); System.gc(); Thread.sleep(200)
      val r = Runtime.getRuntime
      r.totalMemory() - r.freeMemory()
    }
    val peak = new java.util.concurrent.atomic.AtomicLong
    val sampler = new Thread(() => {
      while (!Thread.currentThread().isInterrupted) {
        val r = Runtime.getRuntime
        peak.getAndAccumulate(r.totalMemory() - r.freeMemory(), math.max)
        try Thread.sleep(50) catch { case _: InterruptedException => return }
      }
    })
    val before = usedHeap()
    sampler.setDaemon(true)
    sampler.start()
    val t0 = System.nanoTime()
    val (indptr, indices) = graft.queries.Graph.packCsr(rdd, bIds, nNodes)
    val wall = (System.nanoTime() - t0) / 1e9
    sampler.interrupt()
    val retained = usedHeap()
    val e = indices.length.toLong
    println(f"[csrpack] edges=$e nodes=$nNodes wall=$wall%.1f s")
    println(f"[csrpack] csr_bytes=${4L * (indptr.length + indices.length)} " +
      f"(${4.0 * (indptr.length + indices.length) / e}%.2f B/edge retained-by-design)")
    println(f"[csrpack] retained_delta=${retained - before} " +
      f"(${(retained - before).toDouble / e}%.2f B/edge after pack, incl. CSR)")
    println(f"[csrpack] peak_heap_delta=${peak.get - before} " +
      f"(${(peak.get - before).toDouble / e}%.2f B/edge transient peak during pack)")
    // NOTE: peak is JVM-WIDE — in local mode it includes the 32
    // concurrent executor-side grouping maps, which a real cluster
    // spreads across executors. The DRIVER-only transient is the
    // collected blocks + CSR, computed exactly from the block shape:
    val partDistinct = rdd.mapPartitions { it =>
      val seen = new java.util.HashSet[Long]()
      it.foreach { case (s0, _) => seen.add(s0) }
      Iterator.single(seen.size.toLong)
    }.sum().toLong
    val driverBytes = 4L * e + 8L * partDistinct + 4L * (indptr.length + indices.length)
    println(f"[csrpack] driver_only=${driverBytes} " +
      f"(${driverBytes.toDouble / e}%.2f B/edge = 4 B/edge dsts + " +
      f"8 B x $partDistinct partition-distinct srcs + CSR)")
    // keep the CSR reachable so 'retained' measures it, not GC luck
    if (indptr(0) == Int.MinValue) println(indices.length)
    spark.stop()
  }
}
