package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.engine.Tables

/** Third batch: remaining SURVEY §2 checklist rows — ranking-function
  * battery, limit/offset pagination, array-function battery, and the
  * reference's heroic-score iteration (R6) re-expressed over testdata so
  * the DuckDB oracle gates the iterative semantics too. */
object Relational3 {

  private def t(s: SparkSession, dir: String, n: String): DataFrame = Tables.table(s, dir, n)

  /** Q7b — ranking battery: dense_rank, ntile, percent-style rank over
    * customer balances per segment. */
  val q07b_rank_battery: Query = Query(
    """SELECT c_mktsegment, c_custkey,
      |       CAST(rank()       OVER w AS INT) AS rk,
      |       CAST(dense_rank() OVER w AS INT) AS drk,
      |       CAST(ntile(4)     OVER w AS INT) AS quartile
      |FROM customer
      |WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal DESC, c_custkey)
      |ORDER BY c_mktsegment, c_custkey""") { (s, dir) =>
    val w = Window.partitionBy("c_mktsegment").orderBy(col("c_acctbal").desc, col("c_custkey"))
    t(s, dir, "customer")
      .select(col("c_mktsegment"), col("c_custkey"),
        rank().over(w).as("rk"),
        dense_rank().over(w).as("drk"),
        ntile(4).over(w).as("quartile"))
      .orderBy("c_mktsegment", "c_custkey")
  }

  /** Q7c — distribution-analytic window battery: percent_rank,
    * cume_dist, first_value, nth_value over customer balances per
    * segment — the distribution side of the ranking surface that q07b's
    * rank/dense_rank/ntile doesn't cover. nth_value needs an explicit
    * full frame: its default frame stops at CURRENT ROW, where rows
    * ranked above the 3rd would see NULL. */
  val q07c_window_battery: Query = Query(
    s"""SELECT c_mktsegment, c_custkey,
       |       ${croundSql("percent_rank() OVER w")} AS pct_rk,
       |       ${croundSql("cume_dist() OVER w")} AS cume,
       |       first_value(c_custkey) OVER w AS top_key,
       |       nth_value(c_custkey, 3) OVER (PARTITION BY c_mktsegment
       |                                     ORDER BY c_acctbal DESC, c_custkey
       |                                     ROWS BETWEEN UNBOUNDED PRECEDING
       |                                              AND UNBOUNDED FOLLOWING) AS third_key
       |FROM customer
       |WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal DESC, c_custkey)
       |ORDER BY c_mktsegment, c_custkey""") { (s, dir) =>
    val w = Window.partitionBy("c_mktsegment").orderBy(col("c_acctbal").desc, col("c_custkey"))
    val wFull = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    t(s, dir, "customer")
      .select(col("c_mktsegment"), col("c_custkey"),
        cround(percent_rank().over(w)).as("pct_rk"),
        cround(cume_dist().over(w)).as("cume"),
        first_value(col("c_custkey")).over(w).as("top_key"),
        nth_value(col("c_custkey"), 3).over(wFull).as("third_key"))
      .orderBy("c_mktsegment", "c_custkey")
  }

  /** Q9b — pagination: deterministic ORDER BY + LIMIT/OFFSET. */
  val q09b_limit_offset: Query = Query(
    """SELECT o_orderkey, o_totalprice
      |FROM orders
      |ORDER BY o_totalprice DESC, o_orderkey
      |LIMIT 20 OFFSET 40""") { (s, dir) =>
    t(s, dir, "orders")
      .select("o_orderkey", "o_totalprice")
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      .offset(40)
      .limit(20)
  }

  /** Q12c — array-function battery over the embeddings table: size,
    * element_at, slice, array_contains-style predicate, sort_array,
    * higher-order transform/aggregate. */
  val q12c_array_battery: Query = Query(
    """SELECT vec_id,
      |       CAST(len(embedding) AS INT) AS dim,
      |       floor(embedding[1]::DOUBLE * 10000 + 0.5e0) / 10000 AS first_v,
      |       floor(embedding[64]::DOUBLE * 10000 + 0.5e0) / 10000 AS last_v,
      |       floor(list_sum(list_transform(embedding[1:8], x -> x::DOUBLE)) * 10000 + 0.5e0) / 10000 AS head_sum,
      |       floor(list_max(embedding)::DOUBLE * 10000 + 0.5e0) / 10000 AS max_v,
      |       floor(list_min(embedding)::DOUBLE * 10000 + 0.5e0) / 10000 AS min_v,
      |       CAST(len(list_filter(embedding, x -> x > 0)) AS INT) AS n_pos
      |FROM embeddings
      |ORDER BY vec_id""") { (s, dir) =>
    t(s, dir, "embeddings").select(
      col("vec_id"),
      size(col("embedding")).as("dim"),
      cround(element_at(col("embedding"), 1).cast("double")).as("first_v"),
      cround(element_at(col("embedding"), 64).cast("double")).as("last_v"),
      cround(aggregate(transform(slice(col("embedding"), 1, 8), x => x.cast("double")),
        lit(0.0), (a, x) => a + x)).as("head_sum"),
      cround(array_max(col("embedding")).cast("double")).as("max_v"),
      cround(array_min(col("embedding")).cast("double")).as("min_v"),
      size(filter(col("embedding"), x => x > 0)).as("n_pos"))
      .orderBy("vec_id")
  }

  /** Q33 — the reference's heroic-score iteration (SURVEY R6) over a
    * duels table derived deterministically from orders, so the DuckDB
    * oracle gates the iterative semantics: smoothed averages with
    * zero-seeded challenged players, distinct edges, two α-blend
    * iterations with missing-score default 1.0 (left join + coalesce). */
  val q33_heroic_on_orders: Query = heroicAtDepth(2)

  /** Synthetic duels derived from orders — the input the whole
    * heroic-on-orders family (q33/q33b/q34) shares. */
  private def duelsFromOrders(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders").select(
      (col("o_custkey") % 97).as("challenger"),
      ((col("o_custkey") + col("o_orderkey")) % 97).as("challenged"),
      (floor(col("o_totalprice")).cast("long") % 5000).as("score"),
      lit(0L).as("duration"))

  /** hs1..hsK generations of the heroic recurrence over
    * [[duelsFromOrders]] (lazy DataFrames; element i is generation i+1). */
  private def heroicChain(s: SparkSession, dir: String, k: Int): Seq[DataFrame] = {
    import graft.ops.Heroic
    val duels = duelsFromOrders(s, dir)
    val static = Heroic.staticJoin(duels)
    (2 to k).scanLeft(Heroic.iterate(static, Heroic.initScores(duels))) {
      (hs, _) => Heroic.iterate(static, hs)
    }
  }

  /** Oracle CTE preamble producing hs1..hsK — ONE copy of the duels/
    * seed/avg/edges/st chain shared by the family's oracle SQL. */
  private def heroicCtesSql(k: Int): String = {
    val base =
      """WITH duels AS (SELECT o_custkey % 97 AS challenger,
        |                      (o_custkey + o_orderkey) % 97 AS challenged,
        |                      CAST(floor(o_totalprice) AS BIGINT) % 5000 AS score
        |               FROM orders),
        |     seed AS (SELECT challenger AS player, score, 1 AS w FROM duels
        |              UNION ALL
        |              SELECT challenged, 0, 0 FROM duels),
        |     avg AS (SELECT player,
        |                    CAST(sum(score) + 1 AS DOUBLE) / (sum(w) + 1) AS avg
        |             FROM seed GROUP BY player),
        |     edges AS (SELECT DISTINCT challenged, challenger FROM duels),
        |     st AS (SELECT e.challenged, e.challenger, ad.avg AS avg_d, ar.avg AS avg_r
        |            FROM edges e JOIN avg ad ON ad.player = e.challenged
        |                         JOIN avg ar ON ar.player = e.challenger),
        |     hs1 AS (SELECT challenger AS player,
        |                    0.1e0 * sum(1e0 * avg_r / avg_d) + 0.9e0 AS hs
        |             FROM st GROUP BY challenger)""".stripMargin
    val iters = (2 to k).map { i =>
      s"""|     hs$i AS (SELECT st.challenger AS player,
          |                    0.1e0 * sum(coalesce(h.hs, 1e0) * st.avg_r / st.avg_d) + 0.9e0 AS hs
          |             FROM st LEFT JOIN hs${i - 1} h ON h.player = st.challenged
          |             GROUP BY st.challenger)""".stripMargin
    }
    (base +: iters).mkString(",\n")
  }

  /** The k-generation heroic query (Spark fold ≡ generated CTE chain). */
  private def heroicAtDepth(k: Int): Query = Query(
    s"""${heroicCtesSql(k)}
       |SELECT player, ${croundSql("hs")} AS hs
       |FROM hs$k
       |ORDER BY player""") { (s, dir) =>
    heroicChain(s, dir, k).last
      .select(col("player"), cround(col("hs")).as("hs")).orderBy("player")
  }

  /** Q33b — the heroic iteration unrolled to FOUR generations. Validates
    * that the iterative numerics stay engine-identical at depth: scores
    * grow ~60× per generation on this synthetic graph (≈4.7e3 at k=4),
    * and cross-engine float summation noise grows ≈ k·n·ε ≈ 1e-10
    * absolute — six orders under the 1e-4 rounding grid. k=8 would reach
    * ~1.7e7 with ~1e-6 noise and a material chance of a rounding-boundary
    * flip, so 4 is the deepest safely-oracled depth (measured). */
  val q33b_heroic_deep: Query = heroicAtDepth(4)

  /** Q15 — top-5 parts per brand by retail price (SURVEY §2.11): ranked
    * window + filter, partkey tiebreak. */
  val q15_topk_parts_per_brand: Query = Query(
    """SELECT p_brand, rn, p_partkey, p_retailprice
      |FROM (SELECT p_brand, p_partkey, p_retailprice,
      |             CAST(row_number() OVER (PARTITION BY p_brand
      |                                     ORDER BY p_retailprice DESC, p_partkey) AS INT) AS rn
      |      FROM part) x
      |WHERE rn <= 5
      |ORDER BY p_brand, rn""") { (s, dir) =>
    val w = Window.partitionBy("p_brand").orderBy(col("p_retailprice").desc, col("p_partkey"))
    t(s, dir, "part")
      .select(col("p_brand"), col("p_partkey"), col("p_retailprice"),
        row_number().over(w).as("rn"))
      .filter(col("rn") <= 5)
      .select("p_brand", "rn", "p_partkey", "p_retailprice")
      .orderBy("p_brand", "rn")
  }

  /** Q34 — the reference's convergence MSE (SURVEY R7) under the oracle:
    * full-outer join of two successive heroic-score generations with
    * coalesce-0 on the absent side, mean of squared differences. */
  val q34_mse_on_orders: Query = Query(
    s"""${heroicCtesSql(2)},
       |     d AS (SELECT pow(coalesce(a.hs, 0e0) - coalesce(b.hs, 0e0), 2e0) AS sq
       |           FROM hs1 a FULL OUTER JOIN hs2 b ON a.player = b.player)
       |SELECT ${croundSql("avg(sq)")} AS mse FROM d""") { (s, dir) =>
    val Seq(hs1, hs2) = heroicChain(s, dir, 2)
    import s.implicits._
    Seq(graft.ops.Heroic.mse(hs1, hs2)).toDF("mse").select(cround(col("mse")).as("mse"))
  }

  /** Q38 — exact interpolated percentiles per group (Spark `percentile`
    * ≡ DuckDB `quantile_cont`, both linear interpolation). */
  val q38_percentiles: Query = Query(
    s"""SELECT l_returnflag,
       |       ${croundSql("quantile_cont(l_quantity, 0.5)")} AS med_qty,
       |       ${croundSql("quantile_cont(l_quantity, 0.9)")} AS p90_qty,
       |       ${croundSql("quantile_cont(l_discount, 0.25)")} AS p25_disc,
       |       ${croundSql("quantile_cont(l_discount, 0.99)")} AS p99_disc
       |FROM lineitem
       |GROUP BY l_returnflag
       |ORDER BY l_returnflag""") { (s, dir) =>
    t(s, dir, "lineitem")
      .groupBy("l_returnflag")
      .agg(
        cround(expr("percentile(l_quantity, 0.5)")).as("med_qty"),
        cround(expr("percentile(l_quantity, 0.9)")).as("p90_qty"),
        cround(expr("percentile(l_discount, 0.25)")).as("p25_disc"),
        cround(expr("percentile(l_discount, 0.99)")).as("p99_disc"))
      .orderBy("l_returnflag")
  }

  /** Q38b — approx percentiles via the GK sketch (`approx_percentile`,
    * accuracy 10000 ⇒ rank error ≤ 1/10000): the 100 TB path for
    * quantiles — the sketch is mergeable, so partial aggregation
    * distributes where exact `percentile` must gather all values per
    * group. Sketch-specific ⇒ no SQL oracle; PropertySpec bounds the
    * error vs exact q38. */
  val q38b_approx_percentiles: Query = Query.noOracle { (s, dir) =>
    t(s, dir, "lineitem")
      .groupBy("l_returnflag")
      .agg(
        cround(expr("approx_percentile(l_quantity, 0.5, 10000)")).as("med_qty"),
        cround(expr("approx_percentile(l_quantity, 0.9, 10000)")).as("p90_qty"),
        cround(expr("approx_percentile(l_discount, 0.25, 10000)")).as("p25_disc"),
        cround(expr("approx_percentile(l_discount, 0.99, 10000)")).as("p99_disc"))
      .orderBy("l_returnflag")
  }

  /** Q39 — statistical moment aggregates per group (stddev/variance/
    * correlation/covariance) over small-magnitude columns so the
    * canonical 1e-4 rounding absorbs summation-order noise. */
  val q39_stats_moments: Query = Query(
    s"""SELECT l_returnflag,
       |       ${croundSql("stddev_samp(l_quantity)")} AS sd_qty,
       |       ${croundSql("var_samp(l_quantity)")} AS var_qty,
       |       ${croundSql("corr(l_quantity, l_discount)")} AS corr_qd,
       |       ${croundSql("covar_samp(l_quantity, l_discount)")} AS cov_qd,
       |       ${davgSql("l_discount", 6)} AS avg_disc
       |FROM lineitem
       |GROUP BY l_returnflag
       |ORDER BY l_returnflag""") { (s, dir) =>
    t(s, dir, "lineitem")
      .groupBy("l_returnflag")
      .agg(
        cround(stddev_samp(col("l_quantity"))).as("sd_qty"),
        cround(var_samp(col("l_quantity"))).as("var_qty"),
        cround(corr(col("l_quantity"), col("l_discount"))).as("corr_qd"),
        cround(covar_samp(col("l_quantity"), col("l_discount"))).as("cov_qd"),
        davg(col("l_discount"), 6).as("avg_disc"))
      .orderBy("l_returnflag")
  }

  val all: Map[String, Query] = Map(
    "q38_percentiles" -> q38_percentiles,
    "q38b_approx_percentiles" -> q38b_approx_percentiles,
    "q39_stats_moments" -> q39_stats_moments,
    "q07b_rank_battery" -> q07b_rank_battery,
    "q07c_window_battery" -> q07c_window_battery,
    "q09b_limit_offset" -> q09b_limit_offset,
    "q12c_array_battery" -> q12c_array_battery,
    "q15_topk_parts_per_brand" -> q15_topk_parts_per_brand,
    "q33_heroic_on_orders" -> q33_heroic_on_orders,
    "q33b_heroic_deep" -> q33b_heroic_deep,
    "q34_mse_on_orders" -> q34_mse_on_orders)
}
