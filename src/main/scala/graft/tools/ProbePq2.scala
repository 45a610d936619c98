package graft.tools

import org.apache.spark.sql.functions._

/** Round-13: decompose q79's warm wall into fit / encode / ADC-score /
  * shortlist / rerank phases (each timed via noop on the cumulative
  * prefix, min of 3 after a warm run). */
object ProbePq2 {
  def main(args: Array[String]): Unit = {
    val s = graft.engine.GraftSession.get()
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", graft.Bench.DriverSfDir)
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    def t(n: String)(f: => Unit): Unit = {
      f
      val walls = (1 to 3).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }
      println(f"[pq2] $n%-28s min ${walls.min}%.3f s  (all ${walls.map(w => f"$w%.2f").mkString(" ")})")
    }
    import graft.queries.VectorOps
    import graft.functions.DotProduct.dot
    val e = graft.engine.Tables.table(s, dir, "embeddings")
      .select(col("vec_id"), col("embedding"),
        sqrt(dot(col("embedding"), col("embedding"))).as("nrm"))
    val m = 8; val ksub = 256
    var cb: Array[Array[Array[Long]]] = null
    t("fitPq") { cb = VectorOps.fitPq(e.select(col("vec_id"), col("embedding")), m, ksub, 3) }
    val codes = e.select(col("vec_id"), VectorOps.encodePqUdf(cb)(col("embedding")).as("codes"))
      .withColumn("rnrm", greatest(VectorOps.pqRecNormUdf(cb)(col("codes")), lit(1e-30)))
    t("emb scan only")(noop(e))
    val codesOnly = e.select(col("vec_id"), VectorOps.encodePqUdf(cb)(col("embedding")).as("codes"))
    t("encode only (no rnrm)")(noop(codesOnly))
    t("encode (codes noop)")(noop(codes))
    val probes = e.filter(col("vec_id") < 10)
      .select(col("vec_id").as("probe_id"), VectorOps.pqLutUdf(cb)(col("embedding")).as("lut"))
    val scored = codes.join(broadcast(probes), col("vec_id") =!= col("probe_id"))
      .select(col("probe_id"), col("vec_id").as("cand_id"),
        (VectorOps.adcDotUdf(ksub)(col("lut"), col("codes")).cast("double") / col("rnrm")).as("adc"))
    t("adc scored noop")(noop(scored))
    import org.apache.spark.sql.expressions.Window
    val wAdc = Window.partitionBy("probe_id").orderBy(col("adc").desc, col("cand_id"))
    val short = scored.withColumn("rn", row_number().over(wAdc))
      .filter(col("rn") <= 40).select("probe_id", "cand_id")
    t("shortlist noop")(noop(short))
    t("full q79")(noop(graft.SparkEntry.queries("q79_pq_ann")(s, dir)))
    s.stop()
  }
}
