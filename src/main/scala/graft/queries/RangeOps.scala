package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.engine.Tables

/** Range-join surface: inner joins whose only predicate is
  * point-within-interval (no equi key). Written in the naive,
  * obviously-correct form — `points.join(intervals, x >= lo && x <= hi)`
  * — which stock Spark would plan as a BroadcastNestedLoopJoin; the
  * engine's [[graft.plans.RangeJoinBinning]] optimizer rule rewrites it
  * into a binned equi-join at plan time, so query code never encodes the
  * binning by hand (contrast q14, where a user key exists and an
  * ordinary equi-join with a range residual is already optimal).
  */
object RangeOps {

  private def t(s: SparkSession, dir: String, n: String): DataFrame = Tables.table(s, dir, n)

  /** Q53 — band lookup without a join key: count customers whose account
    * balance falls inside each nation's supplier entry band
    * [min(s_acctbal), min(s_acctbal) + 2500]. Band bounds are min/max
    * style aggregates (plus an exact double add), so the band edges are
    * bit-identical across engines and membership at the boundary cannot
    * drift. The only join predicate is the containment itself —
    * exercising the RangeJoinBinning rewrite end to end against the
    * DuckDB IEJoin oracle. */
  val q53_range_join: Query = Query(
    s"""WITH bands AS (SELECT s_nationkey, min(s_acctbal) AS lo,
       |                      min(s_acctbal) + 2500.0e0 AS hi
       |               FROM supplier GROUP BY s_nationkey)
       |SELECT b.s_nationkey AS nationkey, count(*) AS n_cust,
       |       ${davgSql("c.c_acctbal")} AS avg_bal
       |FROM customer c JOIN bands b
       |  ON c.c_acctbal >= b.lo AND c.c_acctbal <= b.hi
       |GROUP BY 1 ORDER BY 1""") { (s, dir) =>
    val bands = t(s, dir, "supplier").groupBy("s_nationkey")
      .agg(min(col("s_acctbal")).as("lo"), (min(col("s_acctbal")) + 2500.0).as("hi"))
    t(s, dir, "customer")
      .join(bands, col("c_acctbal") >= col("lo") && col("c_acctbal") <= col("hi"))
      .groupBy(col("s_nationkey").as("nationkey"))
      .agg(count(lit(1)).as("n_cust"), davg(col("c_acctbal")).as("avg_bal"))
      .orderBy("nationkey")
  }

  val all: Map[String, Query] = Map(
    "q53_range_join" -> q53_range_join)
}
