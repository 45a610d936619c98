package graft.tools

import org.apache.spark.sql.functions._

/** Throwaway: what does ONE pass over the 2.4M-row cached edge frame
  * actually cost, and against what baselines? Separates cache-scan
  * overhead from aggregation overhead from ambient machine noise. */
object ProbeCacheScan {
  def main(args: Array[String]): Unit = {
    val spark = graft.engine.GraftSession.get()
    spark.sparkContext.setLogLevel("WARN")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", graft.Bench.DriverSfDir)
    import graft.queries.Graph
    val edges = Graph.coPurchaseEdges(spark, dir)
    edges.count()
    def t(label: String)(f: => Any): Unit =
      for (i <- 1 to 3) {
        val t0 = System.nanoTime()
        f
        println(f"[cachescan] $label $i ${(System.nanoTime() - t0) / 1e9}%.3f s")
      }
    t("edges.agg(sum dst)        ")(edges.agg(sum(col("dst"))).collect())
    t("edges.select(dst).count   ")(edges.select("dst").groupBy().count().collect())
    t("edges groupBy dst sum k   ")(
      edges.select(col("dst"), floor(lit(5e-5) / col("outdeg") * 1e12 + 0.5).cast("long").as("k"))
        .groupBy("dst").agg(sum("k")).write.format("noop").mode("overwrite").save())
    t("range(2.4M).agg(sum)      ")(spark.range(2390000).agg(sum(col("id"))).collect())
    val ds = edges.select("src", "dst", "outdeg").as[(Long, Long, Long)](
      org.apache.spark.sql.Encoders.tuple(org.apache.spark.sql.Encoders.scalaLong,
        org.apache.spark.sql.Encoders.scalaLong, org.apache.spark.sql.Encoders.scalaLong))
    t("edges.mapPartitions count ")(
      println("  n=" + ds.mapPartitions(it => Iterator.single(it.length))(
        org.apache.spark.sql.Encoders.scalaInt).collect().sum))
    spark.stop()
  }
}
