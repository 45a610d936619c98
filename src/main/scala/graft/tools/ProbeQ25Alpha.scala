package graft.tools

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Exactness cross-check for the PPJoin candidate pruning (the round-7
  * τ-boundary find): the production path (per-row positional filter +
  * aggregated bound, integer τ arithmetic) must produce EXACTLY the
  * same verified pair set as the same pipeline WITHOUT the per-row
  * filter. A mismatch means one of the bounds is unsound again. The
  * float-ceil forms this tool originally exposed rejected 45
  * jac-exactly-0.8 pairs on the 10× dense fixture. */
object ProbeQ25Alpha {
  def main(args: Array[String]): Unit = {
    val spark = graft.engine.GraftSession.get()
    val dir = args.headOption.getOrElse("/tmp/scale10dense")
    import graft.queries.TextOps
    val sh = TextOps.shingles(spark, dir)
    import org.apache.spark.sql.expressions.Window
    // integer τ = 4/5 arithmetic, mirroring TextOps.ppjoinCandidates
    def ceilDiv(x: org.apache.spark.sql.Column, num: Long, den: Long) =
      floor((lit(num) * x + lit(den - 1)) / lit(den.toDouble))
    val dfTab = sh.groupBy("g").agg(count(lit(1)).as("df"))
    val ranked = sh.join(dfTab, "g")
      .withColumn("pos", row_number().over(
        Window.partitionBy("doc_id").orderBy(col("df"), col("g"))))
      .withColumn("n", count(lit(1)).over(Window.partitionBy("doc_id")))
    val prefix = ranked
      .filter(col("pos") <= col("n") - ceilDiv(col("n"), 4, 5) + 1)
      .select("doc_id", "g", "pos", "n").persist()
    val minOverlap = ceilDiv(col("na") + col("nb"), 4, 9)
    def cands(rowFilter: Boolean): DataFrame = {
      val joined = prefix.select(col("doc_id").as("d1"), col("g"), col("pos").as("pa"), col("n").as("na"))
        .join(prefix.select(col("doc_id").as("d2"), col("g"), col("pos").as("pb"), col("n").as("nb")), "g")
        .filter(col("d1") < col("d2"))
        .filter(lit(5) * col("na") >= lit(4) * col("nb") && lit(5) * col("nb") >= lit(4) * col("na"))
      val pre = if (rowFilter)
        joined.filter(lit(1) + least(col("na") - col("pa"), col("nb") - col("pb")) >= minOverlap)
      else joined
      pre.groupBy("d1", "d2", "na", "nb")
        .agg(count(lit(1)).as("cnt"), max(col("pa")).as("pam"), max(col("pb")).as("pbm"))
        .filter(col("cnt") + least(col("na") - col("pam"), col("nb") - col("pbm")) >= minOverlap)
        .select("d1", "d2")
    }
    val sets = TextOps.shingleSets(spark, dir)
    def verified(c: DataFrame): Set[(Long, Long)] =
      TextOps.rawJaccard(sets, c).select("d1", "d2").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    val filtered = verified(cands(rowFilter = true))
    val unfiltered = verified(cands(rowFilter = false))
    println(s"[alpha] filtered=${filtered.size} unfiltered=${unfiltered.size} " +
      s"onlyFiltered=${(filtered -- unfiltered).size} onlyUnfiltered=${(unfiltered -- filtered).size}")
    val prod = TextOps.jaccardPairs(spark, dir).select("d1", "d2").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    println(s"[alpha] production=${prod.size} equalsFiltered=${prod == filtered} " +
      s"equalsUnfiltered=${prod == unfiltered}")
    spark.stop()
  }
}
