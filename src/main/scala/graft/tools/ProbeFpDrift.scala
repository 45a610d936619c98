package graft.tools
import graft.PlanFingerprints
object ProbeFpDrift {
  def main(args: Array[String]): Unit = {
    val spark = graft.engine.GraftSession.get()
    // mimic `twice` but capture preimages per pass
    def pass(): Map[String, String] = {
      graft.queries.TextOps.resetCaches()
      graft.engine.Tables.clearCache()
      spark.catalog.clearCache()
      graft.SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
        val df = fn(spark, PlanFingerprints.SfDir)
        name -> PlanFingerprints.preimage(df,
          PlanFingerprints.auxPlan(name, spark, PlanFingerprints.SfDir))
      }.toMap
    }
    val a = pass(); val b = pass()
    val drift = a.keys.filter(k => a(k) != b(k)).toSeq.sorted
    println(s"[drift] drifted: $drift")
    drift.headOption.foreach { k =>
      val al = a(k).linesIterator.toSeq; val bl = b(k).linesIterator.toSeq
      println(s"[drift] $k: lines ${al.size} vs ${bl.size}")
      al.zipAll(bl, "<missing>", "<missing>").zipWithIndex
        .filter { case ((x, y), _) => x != y }
        .take(3).foreach { case ((x, y), i) =>
          val d = x.zip(y).indexWhere { case (c1, c2) => c1 != c2 }
          val from = math.max(0, d - 60)
          println(s"[drift] line $i diff at char $d:\n  A: ...${x.slice(from, d + 100)}\n  B: ...${y.slice(from, d + 100)}")
        }
    }
    spark.stop()
  }
}
