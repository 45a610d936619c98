package graft.tools

import org.apache.spark.sql.functions._

/** Round-13 measurement: decompose q02-family cost — how much of a
  * lineitem aggregation query is (a) the serial single-row-group scan,
  * (b) double sums, (c) the exact-decimal dsum casts — and whether a
  * narrow-projection hash repartition (the q82 pattern) buys wall time
  * by spreading the aggregation across cores. Pure measurement, no
  * production code path. */
object ProbeDsum {
  def main(args: Array[String]): Unit = {
    val s = graft.engine.GraftSession.get()
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", graft.Bench.DriverSfDir)
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    def t(n: String)(f: => Unit): Unit = {
      // steady state: 1 warm + 3 timed, report min (JMH discipline)
      f
      val walls = (1 to 3).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }
      println(f"[dsum] $n%-34s min ${walls.min}%.3f s  (all ${walls.map(w => f"$w%.2f").mkString(" ")})")
    }
    val li = graft.engine.Tables.table(s, dir, "lineitem")
    val proj = li.select(col("l_returnflag"), col("l_linestatus"),
      col("l_quantity"), col("l_extendedprice"), col("l_discount"), col("l_tax"),
      col("l_shipdate"))
    t("scan only (7 cols)")(noop(proj))
    def aggs(dsumF: (org.apache.spark.sql.Column, Int) => org.apache.spark.sql.Column) = {
      import graft.queries._
      proj.filter(col("l_shipdate") <= lit("2001-09-02").cast("timestamp_ntz"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          dsumF(col("l_quantity"), 2).as("sum_qty"),
          dsumF(col("l_extendedprice"), 2).as("sum_base_price"),
          dsumF(col("l_extendedprice") * (lit(1) - col("l_discount")), 6).as("sum_disc_price"),
          dsumF(col("l_extendedprice") * (lit(1) - col("l_discount")) * (lit(1) + col("l_tax")), 6).as("sum_charge"),
          count(lit(1)).as("count_order"))
    }
    import graft.queries.dsum
    t("q02-shape double sums")(noop(aggs((c, _) => sum(c).cast("double"))))
    t("q02-shape dsum (decimal30)")(noop(aggs((c, sc) => dsum(c, sc))))
    t("q02-shape dsum decimal18")(noop(aggs((c, sc) =>
      sum(c.cast(org.apache.spark.sql.types.DecimalType(18, sc))).cast("double"))))
    val spread = proj.repartition(s.sparkContext.defaultParallelism, col("l_extendedprice"))
    t("q02-shape dsum + repartition") {
      import graft.queries._
      noop(spread.filter(col("l_shipdate") <= lit("2001-09-02").cast("timestamp_ntz"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(dsum(col("l_quantity")).as("sum_qty"),
          dsum(col("l_extendedprice")).as("sum_base_price"),
          dsum(col("l_extendedprice") * (lit(1) - col("l_discount")), 6).as("sum_disc_price"),
          dsum(col("l_extendedprice") * (lit(1) - col("l_discount")) * (lit(1) + col("l_tax")), 6).as("sum_charge"),
          count(lit(1)).as("count_order")))
    }
    t("full q02")(noop(graft.SparkEntry.queries("q02_pricing_summary")(s, dir)))
    s.stop()
  }
}
