package graft.tools
import graft.SparkEntry
import graft.engine.{GraftSession, Tables}
/** Sweep: which oracle SQLs run on Spark SQL with identical results?
  * Prints PORTABLE / MISMATCH / ERROR per uncovered query — the feed
  * for SqlParitySpec's portable list. */
object ProbeSqlParity {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.get()
    val dir = "/root/testdata/sf0.001"
    Tables.registerAll(spark, dir)
    val covered = Set(
      "q01_filter_project","q02_pricing_summary","q03_segment_orders",
      "q04_revenue_by_nation","q05_semi_anti","q06_count_distinct",
      "q07_rank_segment_top3","q08_order_windows","q09_top10_orders",
      "q10_setops","q10b_setops_bag","q11_rollup_pricing","q11b_cube_pricing",
      "q01b_predicates","q09b_limit_offset","q33_heroic_on_orders",
      "q40_global_argmax","q41_frequent_customers","q42_role_counts",
      "q11c_grouping_sets","q44_pivot_events","q44b_unpivot_lineitem",
      "q45_smoothed_avg","q07c_window_battery","q33b_heroic_deep",
      "q66_corpus_upsert","q81_fuzzy_match","q82_profile",
      "q85_pagerank","q85b_weighted_pagerank","q86_ab_ttest","q90_sssp",
      "q95_chisq","q97_dq_checks","q98_label_prop","q100_psi_drift",
      "q48_chunk_pack","q48b_pack_spans","q49_split_assign","q50_pii_mask",
      "q52_mixture_weights","q59_inverted_index","q68_chunk_overlap","q67_lm_score")
    def canon(df: org.apache.spark.sql.DataFrame): Seq[String] = {
      val cols = df.columns.sorted
      df.select(cols.head, cols.tail: _*).collect()
        .map(_.toSeq.map {
          case d: Double => f"$d%.6f"
          case x => String.valueOf(x)
        }.mkString("\t")).toSeq.sorted
    }
    def duckToSpark(sql: String): String = sql
      .replace("epoch_us(", "unix_micros(")
      .replace(" // ", " div ")
      .replace("string_split(", "split(")
      .replace(", 'g')", ")")
      .replace("quantile_cont(", "percentile(")
      .replace("arg_max(", "max_by(")
      .replace(" IGNORE NULLS)", ") IGNORE NULLS")
    SparkEntry.registry.toSeq.sortBy(_._1).foreach { case (name, q) =>
      if (!covered(name)) q.oracle.foreach { sql =>
        try {
          val viaSql = canon(spark.sql(duckToSpark(sql)))
          val viaDf = canon(q.fn(spark, dir))
          println(if (viaSql == viaDf) s"[parity] PORTABLE $name"
                  else s"[parity] MISMATCH $name")
        } catch {
          case e: Exception =>
            println(s"[parity] ERROR $name: ${e.getMessage.linesIterator.find(_.trim.nonEmpty).getOrElse("").take(110)}")
        }
      }
    }
    spark.stop()
  }
}
