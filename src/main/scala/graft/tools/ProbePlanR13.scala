package graft.tools

import java.nio.file.{Files, Paths}

import graft.SparkEntry

/** Round-13 optimization evidence: dump `.explain("formatted")` for the
  * named queries to plans/r13/<name>_<phase>.txt (phase = before|after).
  * The query is EXECUTED through the noop sink first so the dumped plan
  * is the AQE FINAL plan — the shape the bench actually ran, not the
  * isFinalPlan=false initial guess. usage: ProbePlanR13 <phase> <name>...
  * (env SPARK_GRAFT_SF_DIR selects the fixture, default = driver sf0.1). */
object ProbePlanR13 {
  def main(args: Array[String]): Unit = {
    val spark = graft.engine.GraftSession.get()
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", graft.Bench.DriverSfDir)
    val phase = args.head
    Files.createDirectories(Paths.get("plans/r13"))
    args.drop(1).foreach { name =>
      val df = SparkEntry.queries(name)(spark, dir)
      df.write.format("noop").mode("overwrite").save()
      val p = df.queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
      // formatted = numbered tree + per-operator details; keep both, cap
      // pathological iterative dumps (persisted generations re-print
      // their full lineage) at 600 lines.
      val lines = p.linesIterator.toSeq
      val capped = if (lines.size <= 600) p
        else (lines.take(600) :+ s"... truncated (${lines.size} lines)").mkString("\n")
      Files.writeString(Paths.get(s"plans/r13/${name}_$phase.txt"),
        s"# $name ($phase, $dir, AQE final)\n$capped\n")
      println(s"[plan] $name -> plans/r13/${name}_$phase.txt")
    }
    spark.stop()
  }
}
