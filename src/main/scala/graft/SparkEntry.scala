package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.queries.{EventOps, Funnel, Graph, Layout, Linkage, Multimodal, Pipeline, Query, RangeOps, Relational, Relational2, Relational3, Relational4, Temporal, TextOps, VectorOps}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` is the full declared operator surface (SURVEY.md §2.11);
  * every entry with an oracle is hash-checked against DuckDB running
  * `oracleSql` on the same parquet tables at sf0.01.
  */
object SparkEntry {

  /** All declared queries, keyed by their SURVEY.md §2.11 id. */
  def registry: Map[String, Query] =
    Relational.all ++ Relational2.all ++ Relational3.all ++ Relational4.all ++ EventOps.all ++ Funnel.all ++ TextOps.all ++ VectorOps.all ++ Multimodal.all ++ Pipeline.all ++ RangeOps.all ++ Layout.all ++ Linkage.all ++ Temporal.all ++ Graph.all

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Relational.q04_revenue_by_nation.fn(spark, "/root/testdata/sf0.001")

  /** One per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    registry.map { case (k, q) => k -> q.fn }

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    registry.collect { case (k, Query(_, Some(sql))) => k -> sql }
}
