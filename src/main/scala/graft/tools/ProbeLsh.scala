package graft.tools

import org.apache.spark.sql.functions._

import graft.engine.{GraftSession, Tables}
import graft.queries.VectorOps

/** Throwaway diagnostic: measured LSH candidate volume + neighbor cosine
  * profile on the sf0.001 fixture, to size (k, L) against the recall
  * gate. Not part of the declared surface. */
object ProbeLsh {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.get()
    val dir = "/root/testdata/sf0.001"
    val e = Tables.table(spark, dir, "embeddings")
    val n = e.count()
    val cells = VectorOps.lshCells(e.select(col("vec_id"), col("embedding"), lit(1.0).as("nrm")))
    val cand = cells.filter(col("vec_id") < 10)
      .select(col("vec_id").as("probe_id"), col("tbl"), col("bkt"))
      .join(cells.select(col("vec_id").as("cand_id"), col("tbl"), col("bkt")), Seq("tbl", "bkt"))
      .filter(col("cand_id") =!= col("probe_id"))
      .select("probe_id", "cand_id").distinct()
      .groupBy("probe_id").count().collect().map(r => r.getLong(0) -> r.getLong(1))
    println(s"[probe-lsh] corpus=$n candPerProbe=${cand.sortBy(_._1).mkString(", ")}")
    println(f"[probe-lsh] maxFrac=${cand.map(_._2).max.toDouble / n}%.3f")
    val exact = VectorOps.q17_cosine_topk.fn(spark, dir).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
    println(s"[probe-lsh] top5 cosines per probe:")
    exact.groupBy(_._1).toSeq.sortBy(_._1).foreach { case (p, rows) =>
      println(f"[probe-lsh]   probe $p%2d: ${rows.sortBy(_._2).map(r => f"${r._4}%.3f").mkString(" ")}")
    }
    spark.stop()
  }
}
