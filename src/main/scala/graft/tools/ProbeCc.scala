package graft.tools

import org.apache.spark.sql.functions._

import graft.engine.GraftSession

/** Throwaway diagnostic: phase-by-phase timing of q37's connected
  * components (pair build / union-find contraction / propagation loop)
  * to attribute its wall time. */
object ProbeCc {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.get()
    val dir = args.headOption.getOrElse(graft.Bench.DriverSfDir)
    def t[A](tag: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[probe] $tag: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    val pairs = t("build jaccardPairs")(graft.queries.TextOps.jaccardPairs(spark, dir))
    println(s"[probe] pairs rows=${pairs.count()} partitions=${pairs.rdd.getNumPartitions}")
    val (labels, rounds) = t("connectedComponents")(
      graft.queries.TextOps.connectedComponents(pairs.select("d1", "d2")))
    println(s"[probe] rounds=$rounds labels=${labels.count()}")
    t("final agg")(
      labels.groupBy(col("lbl")).agg(count(lit(1))).write.format("noop").mode("overwrite").save())
    spark.stop()
  }
}
