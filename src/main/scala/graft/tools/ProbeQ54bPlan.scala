package graft.tools
import org.apache.spark.sql.execution.ExplainMode
import graft.queries.TextOps
import graft.engine.GraftSession
object ProbeQ54bPlan {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.get()
    val dir = graft.Bench.DriverSfDir
    val pairs = TextOps.q54b_passage_neardup.fn(spark, dir)
    pairs.collect()
    println("[plan] === pairs executed ===")
    println(pairs.queryExecution.explainString(ExplainMode.fromString("simple")))
    spark.stop()
  }
}
