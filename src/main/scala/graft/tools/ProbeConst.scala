package graft.tools

object ProbeConst {
  def main(args: Array[String]): Unit = {
    val spark = graft.engine.GraftSession.get()
    val dir = graft.Bench.DriverSfDir
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[const] $label ${(System.nanoTime()-t0)/1e9}%.3f s"); r
    }
    // warm everything
    (1 to 3).foreach { _ =>
      spark.catalog.clearCache()
      graft.SparkEntry.queries("q04_revenue_by_nation")(spark, dir).write.format("noop").mode("overwrite").save()
    }
    (1 to 3).foreach { _ => time("range1 noop")(spark.range(1).write.format("noop").mode("overwrite").save()) }
    (1 to 3).foreach { i =>
      spark.catalog.clearCache()
      val df = time(s"build$i")(graft.SparkEntry.queries("q04_revenue_by_nation")(spark, dir))
      time(s"plan$i")(df.queryExecution.executedPlan)
      time(s"exec$i")(df.write.format("noop").mode("overwrite").save())
    }
    // how many jobs does one execution submit?
    val jc = new java.util.concurrent.atomic.AtomicInteger
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(j: org.apache.spark.scheduler.SparkListenerJobStart): Unit = jc.incrementAndGet()
    })
    spark.catalog.clearCache()
    graft.SparkEntry.queries("q04_revenue_by_nation")(spark, dir).write.format("noop").mode("overwrite").save()
    org.apache.spark.graft.BusDrain.drain(spark.sparkContext)
    println(s"[const] jobs per q04 execution: ${jc.get()}")
    spark.stop()
  }
}
