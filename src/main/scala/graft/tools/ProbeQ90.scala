package graft.tools

import org.apache.spark.sql.functions._

/** Throwaway: q90 SSSP — round-8 unrolled single-action plan vs the
  * old Iterate-style frontier loop (per-round persist + count), paired
  * in one warm JVM with bench-style cache resets, alternating so host
  * noise hits both forms equally. */
object ProbeQ90 {
  def main(args: Array[String]): Unit = {
    val spark = graft.engine.GraftSession.get()
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", graft.Bench.DriverSfDir)
    def t(label: String)(f: => Unit): Unit = {
      graft.queries.TextOps.resetCaches(); spark.catalog.clearCache()
      val t0 = System.nanoTime(); f
      println(f"[q90] $label ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    def unrolled(): Unit = graft.SparkEntry.queries("q90_sssp")(spark, dir)
      .write.format("noop").mode("overwrite").save()
    // the pre-round-8 shape: frontier loop, one count barrier per round
    def frontierLoop(): Unit = {
      val edges = graft.queries.Graph.coPurchaseEdges(spark, dir).select("src", "dst")
      val source = edges.agg(min(col("src"))).first().getLong(0)
      import spark.implicits._
      var cur = Seq((source, 0)).toDF("node", "dist").persist()
      for (_ <- 1 to 4) {
        val next = cur.union(
          edges.join(cur, edges("src") === cur("node"))
            .select(col("dst").as("node"), (col("dist") + 1).as("dist")))
          .groupBy("node").agg(min(col("dist")).as("dist")).persist()
        next.count()
        cur = next
      }
      cur.orderBy("node").write.format("noop").mode("overwrite").save()
    }
    t("warmup unrolled")(unrolled())
    t("warmup frontier")(frontierLoop())
    for (i <- 1 to 3) {
      t(s"unrolled r$i")(unrolled())
      t(s"frontier r$i")(frontierLoop())
    }
    spark.stop()
  }
}
