package graft.tools
import org.apache.spark.sql.functions._
object ProbePq {
  def main(args: Array[String]): Unit = {
    val s = graft.engine.GraftSession.get()
    val dir = graft.Bench.DriverSfDir
    def t[A](n: String)(f: => A): A = { val t0=System.nanoTime; val r=f; println(f"[probe] $n%-20s ${(System.nanoTime-t0)/1e9}%.2f s"); r }
    val e = t("load")(graft.engine.Tables.table(s, dir, "embeddings"))
    t("count")(e.count())
    val cb = t("fitPq")(graft.queries.VectorOps.fitPq(e.select(col("vec_id"), col("embedding")), 8, 256, 3))
    t("fitPq warm")(graft.queries.VectorOps.fitPq(e.select(col("vec_id"), col("embedding")), 8, 256, 3))
    t("query")(graft.queries.VectorOps.q79_pq_ann.fn(s, dir).write.format("noop").mode("overwrite").save())
    t("query2")(graft.queries.VectorOps.q79_pq_ann.fn(s, dir).write.format("noop").mode("overwrite").save())
  }
}
