package graft.tools
import org.apache.spark.sql.functions._
import graft.queries.TextOps
object ProbeQ54bVolume {
  def main(args: Array[String]): Unit = {
    val spark = graft.engine.GraftSession.get()
    val dir = args.headOption.getOrElse(graft.Bench.DriverSfDir)
    val psets = TextOps.passageRepSets(spark, dir).persist()
    println(s"[vol] reps=${psets.count()}")
    val tg = psets.select(col("doc_id"), explode(col("gs")).as("g"))
    println(s"[vol] trigram rows=${tg.count()}")
    val df = tg.groupBy("g").agg(count(lit(1)).as("df"))
    println("[vol] top df: " + df.orderBy(desc("df")).limit(5).collect().mkString(" "))
    println("[vol] sum df^2 = " + df.agg(sum(col("df")*col("df"))).first().getLong(0))
    spark.stop()
  }
}
