package graft

import graft.engine.GraftSession

/** Benchmark main: runs every declared query against
  * SPARK_GRAFT_SF_DIR and prints one JSON line with per-query wall
  * seconds. Results are materialized through the noop sink so the full
  * plan (all projected columns) executes — `count()` would let Catalyst
  * prune most of the work and flatter the numbers.
  *
  * Hygiene: ALL caches (memoized tables, near-dup intermediates, any
  * persisted block) are cleared between queries, so every number is the
  * query's own self-contained cost — order-independent and free of
  * accumulated memory pressure. A failed query records NO time; failures
  * are listed in the JSON and flip the exit code to 1 (loud, but the
  * artifact still lands).
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.get()
    def reset(): Unit = {
      graft.queries.TextOps.resetCaches()
      graft.engine.Tables.clearCache()
      spark.catalog.clearCache()
    }
    // Warm the JVM once (classloading, codegen compiler, shuffle machinery)
    // so per-query numbers measure the queries, not first-touch costs.
    graft.engine.Tables.names.foreach(n =>
      graft.engine.Tables.table(spark, sfDir, n).schema)
    try SparkEntry.queries("q02_pricing_summary")(spark, sfDir)
      .write.format("noop").mode("overwrite").save()
    catch { case e: Throwable =>
      System.err.println(s"[bench] warmup failed: ${e.getMessage}")
    }
    val failures = scala.collection.mutable.ListBuffer.empty[String]
    val results = SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
      reset()
      val t0 = System.nanoTime()
      try {
        fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        Some(name -> (System.nanoTime() - t0) / 1e9)
      } catch { case e: Throwable =>
        System.err.println(s"[bench] $name FAILED: ${e.getMessage}")
        failures += name
        None
      }
    }
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    val errs = failures.map("\"" + _ + "\"").mkString("[", ",", "]")
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"errors":$errs,"sf":"$sfDir"}""")
    spark.stop()
    if (failures.nonEmpty) sys.exit(1)
  }
}
