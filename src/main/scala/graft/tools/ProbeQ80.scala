package graft.tools
object ProbeQ80 {
  def main(args: Array[String]): Unit = {
    val s = graft.engine.GraftSession.get()
    val df = graft.queries.Funnel.q80_cogroup_attribution.fn(s, "/root/testdata/sf0.001")
    println(df.queryExecution.executedPlan.toString)
  }
}
