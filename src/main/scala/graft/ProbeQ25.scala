package graft

import graft.engine.GraftSession

/** Throwaway diagnostic: q25 candidate-volume and stage accounting at a
  * given SF — how many PPJoin candidates survive each exact filter, and
  * what the verify join therefore ships. */
object ProbeQ25 {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.get()
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    import org.apache.spark.sql.functions._
    val sets = graft.queries.TextOps.shingleSets(spark, dir)
    val nDocs = sets.count()
    val avgN = sets.agg(avg(col("n"))).head.getDouble(0)
    val (cand, prefix) = graft.queries.TextOps.ppjoinCandidates(
      graft.queries.TextOps.shingles(spark, dir))
    val nPrefix = prefix.count()
    val nCand = cand.count()
    val verified = graft.queries.TextOps.jaccardPairs(spark, dir).count()
    println(s"docs=$nDocs avg_shingles=${avgN.round} prefix_rows=$nPrefix " +
      s"candidates=$nCand verified_pairs=$verified " +
      s"verify_ship_MB=${(nCand * avgN * 8 * 2 / 1e6).round}")
    spark.stop()
  }
}
