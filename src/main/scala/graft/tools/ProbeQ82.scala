package graft.tools

import org.apache.spark.sql.functions._

/** Round-13: bisect q82's executor CPU (committed ~15-19 cpu-s for a
  * 600k-row 4-column profile). Variants isolate the Expand (exact
  * distinct), the decimal sums, and the spread exchange. */
object ProbeQ82 {
  def main(args: Array[String]): Unit = {
    val s = graft.engine.GraftSession.get()
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", graft.Bench.DriverSfDir)
    val listener = new org.apache.spark.scheduler.SparkListener {
      val cpu = new java.util.concurrent.atomic.AtomicLong
      override def onTaskEnd(t: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit =
        if (t.taskMetrics != null) cpu.addAndGet(t.taskMetrics.executorCpuTime)
    }
    s.sparkContext.addSparkListener(listener)
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    def t(n: String)(f: => Unit): Unit = {
      f
      val walls = (1 to 3).map { _ =>
        listener.cpu.set(0)
        val t0 = System.nanoTime(); f
        org.apache.spark.graft.BusDrain.drain(s.sparkContext)
        ((System.nanoTime() - t0) / 1e9, listener.cpu.get / 1e9)
      }
      val best = walls.minBy(_._1)
      println(f"[q82] $n%-36s wall ${best._1}%.3f s  cpu ${best._2}%.2f s")
    }
    val cols = Seq("l_quantity", "l_extendedprice", "l_discount", "tax_nz")
    def base = graft.engine.Tables.table(s, dir, "lineitem").select(
      col("l_quantity"), col("l_extendedprice"), col("l_discount"),
      nullif(col("l_tax"), lit(0.0)).as("tax_nz"))
    def spread(df: org.apache.spark.sql.DataFrame) =
      df.repartition(s.sparkContext.defaultParallelism, col("l_extendedprice"))
    def profile(li: org.apache.spark.sql.DataFrame,
        distinctOf: org.apache.spark.sql.Column => org.apache.spark.sql.Column,
        withSums: Boolean) = {
      import graft.queries.dsum
      val aggs = count(lit(1)).as("n_rows") +: cols.flatMap { c =>
        Seq(count(col(c)).as(s"nv_$c"), distinctOf(col(c)).as(s"nd_$c")) ++
          (if (withSums) Seq(min(col(c)).cast("double").as(s"mn_$c"),
            max(col(c)).cast("double").as(s"mx_$c"), dsum(col(c)).as(s"sm_$c"))
           else Seq.empty)
      }
      li.agg(aggs.head, aggs.tail: _*)
    }
    t("scan+nullif only")(noop(base))
    t("spread only")(noop(spread(base)))
    t("count-only agg (no distinct/sums)")(noop(spread(base).agg(count(lit(1)))))
    t("exact distinct, no sums")(noop(profile(spread(base), countDistinct(_), withSums = false)))
    t("exact distinct + dsums")(noop(profile(spread(base), countDistinct(_), withSums = true)))
    t("approx distinct + dsums")(noop(profile(spread(base), approx_count_distinct(_, 0.02), withSums = true)))
    t("exact distinct NO spread")(noop(profile(base, countDistinct(_), withSums = true)))
    t("full q82")(noop(graft.SparkEntry.queries("q82_profile")(s, dir)))
    t("full q82b")(noop(graft.SparkEntry.queries("q82b_profile_approx")(s, dir)))
    t("approx 1col rsd.02 no sums")(noop(spread(base).agg(approx_count_distinct(col("l_extendedprice"), 0.02))))
    t("approx 1col rsd.05 no sums")(noop(spread(base).agg(approx_count_distinct(col("l_extendedprice"), 0.05))))
    t("approx 4col rsd.02 no sums")(noop(spread(base).agg(
      approx_count_distinct(col("l_quantity"), 0.02),
      approx_count_distinct(col("l_extendedprice"), 0.02),
      approx_count_distinct(col("l_discount"), 0.02),
      approx_count_distinct(col("tax_nz"), 0.02))))
    t("exact 4col distinct no sums 2")(noop(profile(spread(base), countDistinct(_), withSums = false)))
    s.stop()
  }
}
