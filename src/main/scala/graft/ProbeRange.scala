package graft
object ProbeRange {
  def main(args: Array[String]): Unit = {
    val s = graft.engine.GraftSession.builder(Some("local[8]")).getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    val df = graft.queries.RangeOps.q53_range_join.fn(s, "/root/testdata/sf0.01")
    df.collect().foreach(r => println("ROW|" + r.mkString("|")))
  }
}
