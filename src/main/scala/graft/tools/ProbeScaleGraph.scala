package graft.tools

import org.apache.spark.sql.functions._

/** Scale probe for the graph family: replicate sf0.1 lineitem K×
  * (order AND part keys offset per replica, so the co-purchase graph
  * becomes K disjoint copies — K× nodes, K× edges) and time q85 PageRank
  * at 1× and K×. The claim under test is SCALING.md's "per-round
  * barrier + JVM decimal path is a FIXED cost — weak on wall at sf0.1,
  * sound at scale, because rounds become data-bound": if true, the
  * wall ratio K×/1× must come in well under K (the constant amortizes)
  * and the engine-vs-DuckDB gap must shrink (run the oracle on the
  * same parquet with tools/duckbench.py or duckdb directly to
  * compare). Derived data goes to /tmp purely as a perf fixture. */
object ProbeScaleGraph {
  def main(args: Array[String]): Unit = {
    val spark = graft.engine.GraftSession.get()
    val k = args.headOption.map(_.toInt).getOrElse(10)
    val base = graft.Bench.DriverSfDir
    val out = s"/tmp/scaleg$k"
    graft.engine.Tables.table(spark, base, "lineitem")
      .crossJoin(spark.range(k).select(col("id").as("rep")))
      .withColumn("l_orderkey", col("l_orderkey") + col("rep") * 100000000L)
      .withColumn("l_partkey", col("l_partkey") + col("rep") * 10000000L)
      .drop("rep")
      .repartition(32)
      .write.mode("overwrite").parquet(s"$out/lineitem.parquet")

    val family = Seq("q85_pagerank", "q85b_weighted_pagerank",
      "q88_triangles", "q90_sssp", "q98_label_prop")
    def run(dir: String, label: String): Unit = {
      family.foreach { q =>
        graft.queries.TextOps.resetCaches()
        spark.catalog.clearCache()
        val t0 = System.nanoTime()
        val n = graft.SparkEntry.queries(q)(spark, dir).count()
        println(f"[gscale] $label $q rows=$n wall=${(System.nanoTime() - t0) / 1e9}%.1f s")
      }
      graft.queries.TextOps.resetCaches()
      spark.catalog.clearCache()
      val e = graft.queries.Graph.coPurchaseEdges(spark, dir).count()
      println(s"[gscale] $label edges=$e")
    }
    run(base, "1x(warm-up)")
    run(base, "1x")
    run(out, s"${k}x")
    spark.stop()
  }
}
