package graft.tools

import org.apache.spark.sql.functions._

/** Throwaway stage profile for q59 (inverted index): times each pipeline
  * prefix to locate where the wall-clock goes at sf0.1. */
object ProbeQ59 {
  def main(args: Array[String]): Unit = {
    val spark = graft.engine.GraftSession.get()
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", graft.Bench.DriverSfDir)
    val docs = graft.engine.Tables.table(spark, dir, "documents")
    val norm = expr("trim(regexp_replace(lower(text), '\\\\s+', ' '))")

    def time(tag: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"[probe] $tag%-40s ${(System.nanoTime() - t0) / 1e9}%6.2f s  rows=$n")
    }

    time("norm only") { docs.select(norm.as("n")).agg(sum(length(col("n")))).head(); 0L }
    time("split")(docs.select(explode(split(norm, " ")).as("t")).count())
    time("split+array_distinct")(docs.select(explode(array_distinct(split(norm, " "))).as("t")).count())
    val t = docs.select(col("doc_id"), explode(array_distinct(split(norm, " "))).as("term"))
      .filter(length(col("term")) >= 4)
    time("agg count only")(t.withColumn("shard", expr("doc_id div 100"))
      .groupBy("term", "shard").agg(count(lit(1))).count())
    time("agg collect_list")(t.withColumn("shard", expr("doc_id div 100"))
      .groupBy("term", "shard")
      .agg(expr("array_join(transform(sort_array(collect_list(doc_id)), x -> cast(x AS string)), ',')"))
      .count())
    time("full q59")(graft.queries.TextOps.q59_inverted_index.fn(spark, dir).count())
    spark.stop()
  }
}
