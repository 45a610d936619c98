package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.engine.Tables

/** Oracle twins for the remaining reference MapReduce shapes plus the
  * GROUPING SETS general form (round-1 VERDICT items 5/6).
  *
  * R1/R2/R5 (reference exercise_1.py:9-87, exercise_3.py:25-51) were
  * gated only by GoldenSpec against the reference's own outputs;
  * these twins re-express the same operator shapes on the driver's
  * orders/lineitem tables so the DuckDB oracle hash-checks them too.
  */
object Relational4 {

  private def t(s: SparkSession, dir: String, n: String): DataFrame = Tables.table(s, dir, n)

  /** Q40 — R2/A3 twin: GLOBAL ARGMAX as one aggregation (`max_by` over a
    * (cnt, -key) ordering struct), not a sort+limit — partial aggregation
    * distributes, so a 1000-executor run reduces a single row per
    * partition. Tie rule: lowest key wins (the canonicalized reference
    * behavior, exercise_1.py:70-73 / SURVEY A3). The oracle expresses the
    * same semantics as ORDER BY cnt DESC, key LIMIT 1. */
  val q40_global_argmax: Query = Query(
    """WITH c AS (SELECT o_custkey, count(*) AS cnt FROM orders GROUP BY 1)
      |SELECT o_custkey AS player, cnt FROM c
      |ORDER BY cnt DESC, o_custkey LIMIT 1""") { (s, dir) =>
    t(s, dir, "orders")
      .groupBy("o_custkey").agg(count(lit(1)).as("cnt"))
      // min over (-cnt, key) = max cnt with lowest-key tiebreak; only the
      // count is negated (count(*) >= 1, so no overflow) — negating the
      // KEY would overflow for Long.MinValue under an arbitrary signed
      // key domain
      .agg(min_by(
        struct(col("o_custkey").as("player"), col("cnt")),
        struct((col("cnt") * -1).as("neg_cnt"), col("o_custkey"))).as("s"))
      // a global agg always emits one row; drop the all-null row on empty
      // input so the shape matches the oracle's LIMIT 1 (zero rows)
      .where(col("s").isNotNull)
      .select(col("s.player").as("player"), col("s.cnt").as("cnt"))
  }

  /** Q41 — R5 twin (distinct + HAVING, threshold 12 like the reference's
    * H_VAL, exercise_3.py:7): customers active on >= 12 distinct order
    * days. Distinct-pair dedup then grouped count then HAVING — the exact
    * exercise_3 pipeline shape. */
  val q41_frequent_customers: Query = Query(
    """WITH d AS (SELECT DISTINCT o_custkey, CAST(o_orderdate AS DATE) AS dd FROM orders)
      |SELECT o_custkey AS player, count(*) AS cnt
      |FROM d GROUP BY 1 HAVING count(*) >= 12
      |ORDER BY player""") { (s, dir) =>
    t(s, dir, "orders")
      .select(col("o_custkey"), col("o_orderdate").cast("date").as("dd"))
      .distinct()
      .groupBy(col("o_custkey").as("player")).agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") >= 12)
      .orderBy("player")
  }

  /** Q42 — R1 twin: the two-sided grouped count (challenges per
    * challenger AND per challenged, exercise_1.py:9-52) as role-tagged
    * counts over lineitem's part/supplier keys. */
  val q42_role_counts: Query = Query(
    """SELECT 'part' AS role, l_partkey AS key, count(*) AS cnt FROM lineitem GROUP BY 2
      |UNION ALL
      |SELECT 'supp' AS role, l_suppkey AS key, count(*) AS cnt FROM lineitem GROUP BY 2
      |ORDER BY role, key""") { (s, dir) =>
    val li = t(s, dir, "lineitem")
    li.groupBy(col("l_partkey").as("key")).agg(count(lit(1)).as("cnt"))
      .select(lit("part").as("role"), col("key"), col("cnt"))
      .unionAll(li.groupBy(col("l_suppkey").as("key")).agg(count(lit(1)).as("cnt"))
        .select(lit("supp").as("role"), col("key"), col("cnt")))
      .orderBy("role", "key")
  }

  /** Q11c — GROUPING SETS general form (SURVEY §2.4, alongside rollup
    * q11 / cube q11b): independent per-returnflag and per-linestatus
    * subtotals in one pass; the absent column surfaces as 'ALL'. */
  val q11c_grouping_sets: Query = Query(
    s"""SELECT coalesce(l_returnflag, 'ALL') AS returnflag,
       |       coalesce(l_linestatus, 'ALL') AS linestatus,
       |       ${dsumSql("l_quantity")} AS sum_qty,
       |       ${dsumSql("l_extendedprice")} AS sum_price,
       |       count(*) AS n
       |FROM lineitem
       |GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus))
       |ORDER BY returnflag, linestatus""") { (s, dir) =>
    // spreadScan: the grouping-sets Expand + decimal partial aggregation
    // run in the scan stage — serial on a one-split file (q11's note);
    // exact sums/counts are partition-invariant.
    spreadScan(s, dir, "lineitem",
      t(s, dir, "lineitem")
        .select("l_returnflag", "l_linestatus", "l_quantity", "l_extendedprice"),
      col("l_extendedprice"))
      .groupingSets(Seq(Seq(col("l_returnflag")), Seq(col("l_linestatus"))),
        col("l_returnflag"), col("l_linestatus"))
      .agg(dsum(col("l_quantity")).as("sum_qty"),
        dsum(col("l_extendedprice")).as("sum_price"),
        count(lit(1)).as("n"))
      .select(
        coalesce(col("l_returnflag"), lit("ALL")).as("returnflag"),
        coalesce(col("l_linestatus"), lit("ALL")).as("linestatus"),
        col("sum_qty"), col("sum_price"), col("n"))
      .orderBy("returnflag", "linestatus")
  }

  /** Q45 — R3 twin: the reference's smoothed average `(Σ+1)/(n+1)`
    * (exercise_2.py:9-40 / exercise_4.py:10-34) over orders — customers
    * appearing only in lineitem-less orders... here: every customer in
    * orders gets (Σ totalprice + 1)/(n + 1), and customers with no orders
    * surface at exactly 1.0 via the zero-seed union, the same trick the
    * reference uses for challenged-only players. */
  val q45_smoothed_avg: Query = Query(
    s"""WITH seeded AS (
       |  SELECT o_custkey AS player, CAST(o_totalprice AS DECIMAL(30,2)) AS v, 1 AS w FROM orders
       |  UNION ALL
       |  SELECT c_custkey, CAST(0 AS DECIMAL(30,2)), 0 FROM customer)
       |SELECT player,
       |       ${croundSql("(CAST(sum(v) AS DOUBLE) + 1e0) / (sum(w) + 1)")} AS sm_avg
       |FROM seeded GROUP BY player
       |ORDER BY player""") { (s, dir) =>
    val orders = t(s, dir, "orders")
      .select(col("o_custkey").as("player"),
        col("o_totalprice").cast("decimal(30,2)").as("v"), lit(1L).as("w"))
    val seed = t(s, dir, "customer")
      .select(col("c_custkey").as("player"),
        lit(0).cast("decimal(30,2)").as("v"), lit(0L).as("w"))
    orders.unionAll(seed)
      .groupBy("player")
      .agg(cround((sum(col("v")).cast("double") + 1.0) / (sum(col("w")) + 1)).as("sm_avg"))
      .orderBy("player")
  }

  /** Q44 — pivot (long → wide): per-user event counts spread into one
    * column per event type. The pivot value list is explicit, so the
    * output schema is static and the plan is a single groupBy — no
    * distinct-values pre-pass. Oracle = conditional aggregation. */
  val q44_pivot_events: Query = Query(
    """SELECT user_id,
      |       count(*) FILTER (WHERE event_type = 'view') AS n_view,
      |       count(*) FILTER (WHERE event_type = 'click') AS n_click,
      |       count(*) FILTER (WHERE event_type = 'purchase') AS n_purchase,
      |       count(*) FILTER (WHERE event_type = 'signup') AS n_signup,
      |       count(*) FILTER (WHERE event_type = 'error') AS n_error
      |FROM events GROUP BY user_id
      |ORDER BY user_id""") { (s, dir) =>
    t(s, dir, "events")
      .groupBy("user_id")
      .pivot("event_type", Seq("view", "click", "purchase", "signup", "error"))
      .agg(count(lit(1)))
      // scoped fill: an unscoped fill would also rewrite a null group key
      .na.fill(0L, Seq("view", "click", "purchase", "signup", "error"))
      .select(col("user_id"), col("view").as("n_view"), col("click").as("n_click"),
        col("purchase").as("n_purchase"), col("signup").as("n_signup"),
        col("error").as("n_error"))
      .orderBy("user_id")
  }

  /** Q44b — unpivot/melt (wide → long): three lineitem measures to
    * (measure, val) rows. Narrow transform, no shuffle at all until the
    * presentation sort. Oracle = UNION ALL of per-measure selects. */
  val q44b_unpivot_lineitem: Query = Query(
    """SELECT l_orderkey, l_linenumber, 'l_quantity' AS measure, l_quantity AS val FROM lineitem
      |UNION ALL
      |SELECT l_orderkey, l_linenumber, 'l_extendedprice', l_extendedprice FROM lineitem
      |UNION ALL
      |SELECT l_orderkey, l_linenumber, 'l_discount', l_discount FROM lineitem
      |ORDER BY l_orderkey, l_linenumber, measure""") { (s, dir) =>
    // spreadScan: the unpivot Expand triples the rows INSIDE the scan
    // stage, and on a one-split file one task then sorts/ships 3n rows
    // into the range exchange; spreading the pre-Expand rows parallelizes
    // both. Row-multiplying ops, not aggregates — the total ORDER BY on
    // the unique (orderkey, linenumber, measure) key pins the output
    // regardless of partitioning.
    spreadScan(s, dir, "lineitem",
      t(s, dir, "lineitem")
        .select("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice", "l_discount"),
      col("l_orderkey"))
      .unpivot(
        Array(col("l_orderkey"), col("l_linenumber")),
        Array(col("l_quantity"), col("l_extendedprice"), col("l_discount")),
        "measure", "val")
      .orderBy("l_orderkey", "l_linenumber", "measure")
  }

  val all: Map[String, Query] = Map(
    "q40_global_argmax" -> q40_global_argmax,
    "q41_frequent_customers" -> q41_frequent_customers,
    "q42_role_counts" -> q42_role_counts,
    "q11c_grouping_sets" -> q11c_grouping_sets,
    "q44_pivot_events" -> q44_pivot_events,
    "q44b_unpivot_lineitem" -> q44b_unpivot_lineitem,
    "q45_smoothed_avg" -> q45_smoothed_avg)
}
