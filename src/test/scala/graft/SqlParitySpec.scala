package graft

import org.apache.spark.sql.DataFrame

import graft.engine.Tables

/** SQL-API parity (SURVEY.md §7.4): the declared queries exist as both
  * DataFrame pipelines and SQL text. For every oracle whose SQL is
  * ANSI-portable (no DuckDB-only functions), run the SQL through
  * spark.sql over the registered views and assert it returns exactly the
  * DataFrame pipeline's result. */
class SqlParitySpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  /** Oracle SQL that parses and runs identically on Spark SQL. The rest
    * use DuckDB-specific functions (epoch_us, string_split, list_*, //,
    * json_extract_string, isodow, unnest-zip) — their Spark forms are the
    * DataFrame pipelines themselves. */
  private val portable = Seq(
    "q01_filter_project", "q02_pricing_summary", "q03_segment_orders",
    "q04_revenue_by_nation", "q05_semi_anti", "q06_count_distinct",
    "q07_rank_segment_top3", "q08_order_windows", "q09_top10_orders",
    "q10_setops", "q10b_setops_bag", "q11_rollup_pricing", "q11b_cube_pricing",
    "q01b_predicates", "q09b_limit_offset", "q33_heroic_on_orders",
    "q40_global_argmax", "q41_frequent_customers", "q42_role_counts",
    "q11c_grouping_sets", "q44_pivot_events", "q44b_unpivot_lineitem",
    "q45_smoothed_avg", "q07c_window_battery", "q33b_heroic_deep")

  private def canon(df: DataFrame): Seq[String] = {
    val cols = df.columns.sorted
    df.select(cols.head, cols.tail: _*).collect()
      .map(_.toSeq.map {
        case d: Double => f"$d%.6f"
        case x => String.valueOf(x)
      }.mkString("\t")).toSeq.sorted
  }

  test("portable oracle SQL executes on Spark SQL with identical results") {
    Tables.registerAll(spark, dir)
    val failures = portable.flatMap { name =>
      val q = SparkEntry.registry(name)
      val sql = q.oracle.get
      try {
        val viaSql = canon(spark.sql(sql))
        val viaDf = canon(q.fn(spark, dir))
        if (viaSql == viaDf) None else Some(s"$name: result mismatch")
      } catch {
        case e: Exception => Some(s"$name: ${e.getMessage.linesIterator.next()}")
      }
    }
    assert(failures.isEmpty, failures.mkString("\n"))
  }
}
