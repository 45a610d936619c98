package graft.tools
import org.apache.spark.sql.functions._
import graft.queries.TextOps
import graft.engine.GraftSession
object ProbeQ54bTg {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.get()
    val dir = graft.Bench.DriverSfDir
    val psets = TextOps.passageRepSets(spark, dir).persist()
    val tg = psets.select(col("doc_id"), explode(col("gs")).as("g"))
    println("[tg] exploded rows = " + tg.count())
    val df = tg.groupBy("g").agg(count(lit(1)).as("df"))
    println("[tg] distinct trigrams = " + df.count())
    val stats = df.agg(max("df").as("max_df"), sum(col("df")*col("df")).as("sum_df2"),
      sum(col("df")*(col("df")-1)/2).as("pairs")).collect()(0)
    println(s"[tg] max_df=${stats.get(0)} sum_df2=${stats.get(1)} candidate_pairs=${stats.get(2)}")
    df.orderBy(desc("df")).limit(10).collect().foreach(r => println(s"[tg] top df=${r.get(1)}"))
    spark.stop()
  }
}
