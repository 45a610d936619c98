package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.engine.Tables

/** Event-table surface: JSON extraction, interval/as-of joins, and the
  * batch forms of the streaming window aggregates (SURVEY.md §2.9; the
  * same expressions run unchanged under Structured Streaming — see
  * graft.streaming.Streams and its ScalaTest batch≡stream assertion).
  *
  * All timestamps surface as epoch microseconds (BIGINT) so the oracle
  * comparison never depends on engine timestamp precision (events.parquet
  * is TIMESTAMP(NANOS); both engines truncate to micros).
  */
object EventOps {

  private def ev(s: SparkSession, dir: String): DataFrame = Tables.table(s, dir, "events")

  private val HourUs = 3600L * 1000000L

  /** Q13 — JSON property extraction + grouped aggregate over events.props. */
  val q13_json_props: Query = Query(
    s"""SELECT event_type,
       |       count(*) AS n,
       |       ${davgSql("value")} AS avg_value,
       |       floor(CAST(sum(CAST(json_extract_string(props, '$$.k') AS INTEGER)) AS DOUBLE) / count(*) * 10000 + 0.5e0) / 10000 AS avg_k,
       |       min(CAST(json_extract_string(props, '$$.k') AS INTEGER)) AS min_k,
       |       max(CAST(json_extract_string(props, '$$.k') AS INTEGER)) AS max_k
       |FROM events
       |GROUP BY event_type
       |ORDER BY event_type""") { (s, dir) =>
    val k = get_json_object(col("props"), "$.k").cast("int")
    ev(s, dir)
      .select(col("event_type"), col("value"), k.as("k"))
      .groupBy("event_type")
      .agg(
        count(lit(1)).as("n"),
        davg(col("value")).as("avg_value"),
        cround(sum(col("k")).cast("double") / count(lit(1))).as("avg_k"),
        min(col("k")).as("min_k"),
        max(col("k")).as("max_k"))
      .orderBy("event_type")
  }

  /** Q14 — interval self-join: click→purchase pairs of the same user
    * within one hour. Planned as an equi-join on user_id with the time
    * range as residual — stays a sort-merge join at any scale (never a
    * cartesian). */
  val q14_interval_selfjoin: Query = Query(
    """WITH c AS (SELECT user_id, epoch_us(ts) AS cus FROM events WHERE event_type = 'click'),
      |     p AS (SELECT user_id, epoch_us(ts) AS pus FROM events WHERE event_type = 'purchase')
      |SELECT c.user_id AS user_id,
      |       count(*) AS n_pairs,
      |       CAST(sum(p.pus - c.cus) AS BIGINT) AS sum_gap_us,
      |       min(p.pus - c.cus) AS min_gap_us,
      |       max(p.pus - c.cus) AS max_gap_us
      |FROM c JOIN p ON c.user_id = p.user_id
      |              AND p.pus > c.cus AND p.pus <= c.cus + 3600000000
      |GROUP BY c.user_id
      |ORDER BY c.user_id""") { (s, dir) =>
    val e = ev(s, dir)
    val clicks = e.filter(col("event_type") === "click")
      .select(col("user_id"), unix_micros(col("ts")).as("cus"))
    val purchases = e.filter(col("event_type") === "purchase")
      .select(col("user_id").as("p_user"), unix_micros(col("ts")).as("pus"))
    clicks.join(purchases,
        col("user_id") === col("p_user")
          && col("pus") > col("cus") && col("pus") <= col("cus") + HourUs)
      .groupBy("user_id")
      .agg(
        count(lit(1)).as("n_pairs"),
        sum(col("pus") - col("cus")).as("sum_gap_us"),
        min(col("pus") - col("cus")).as("min_gap_us"),
        max(col("pus") - col("cus")).as("max_gap_us"))
      .orderBy("user_id")
  }

  /** Q14b — as-of join: for each purchase, the latest click of the same
    * user at or before it. Implemented the scalable way: union-tag both
    * sides, one sort per user, `last(_, ignoreNulls)` propagates the most
    * recent click — a single shuffle, no range explosion (SURVEY §2.3). */
  val q14b_asof_click_purchase: Query = Query(
    """WITH p AS (SELECT event_id, user_id, epoch_us(ts) AS purchase_us
      |           FROM events WHERE event_type = 'purchase'),
      |     c AS (SELECT user_id, epoch_us(ts) AS cus FROM events WHERE event_type = 'click')
      |SELECT p.event_id, p.user_id, p.purchase_us, max(c.cus) AS last_click_us
      |FROM p LEFT JOIN c ON c.user_id = p.user_id AND c.cus <= p.purchase_us
      |GROUP BY p.event_id, p.user_id, p.purchase_us
      |ORDER BY event_id""") { (s, dir) =>
    val e = ev(s, dir).filter(col("event_type").isin("click", "purchase"))
      .select(col("event_id"), col("user_id"), unix_micros(col("ts")).as("us"),
        when(col("event_type") === "click", 0).otherwise(1).as("tag"))
    // clicks sort before purchases at equal timestamps => a same-instant
    // click counts as "at or before" the purchase (matches the <= oracle).
    val w = Window.partitionBy("user_id").orderBy(col("us"), col("tag"), col("event_id"))
    e.withColumn("click_us", when(col("tag") === 0, col("us")))
      .withColumn("last_click_us", last(col("click_us"), ignoreNulls = true).over(w))
      .filter(col("tag") === 1)
      .select(col("event_id"), col("user_id"), col("us").as("purchase_us"), col("last_click_us"))
      .orderBy("event_id")
  }

  /** Q19 — tumbling 1-hour window aggregate per event type (batch form of
    * the streaming query; window().start == hour truncation). */
  val q19_tumbling_hour: Query = Query(
    s"""SELECT epoch_us(date_trunc('hour', ts)) AS win_us, event_type,
       |       count(*) AS n,
       |       ${dsumSql("value")} AS sum_value
       |FROM events
       |GROUP BY 1, 2
       |ORDER BY win_us, event_type""") { (s, dir) =>
    ev(s, dir)
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"), dsum(col("value")).as("sum_value"))
      .select(unix_micros(col("window.start")).as("win_us"),
        col("event_type"), col("n"), col("sum_value"))
      .orderBy("win_us", "event_type")
  }

  /** Q19b — sliding window (1 h length, 15 min slide): each event lands in
    * exactly 4 windows; starts are slide-aligned like Spark's window(). */
  val q19b_sliding_15m: Query = Query(
    """WITH w AS (SELECT epoch_us(ts) AS us, user_id FROM events),
      |     x AS (SELECT (us // 900000000) * 900000000 - k.k * 900000000 AS win_us, user_id
      |           FROM w CROSS JOIN (SELECT unnest(range(4)) AS k) k)
      |SELECT win_us, count(*) AS n, count(DISTINCT user_id) AS n_users
      |FROM x GROUP BY win_us
      |ORDER BY win_us""") { (s, dir) =>
    ev(s, dir)
      .groupBy(window(col("ts"), "1 hour", "15 minutes"))
      .agg(count(lit(1)).as("n"), countDistinct(col("user_id")).as("n_users"))
      .select(unix_micros(col("window.start")).as("win_us"), col("n"), col("n_users"))
      .orderBy("win_us")
  }

  /** Q20 — session windows (30-minute inactivity gap) per user; batch form
    * of session_window, equivalent to gaps-and-islands. */
  val q20_sessionize: Query = Query(
    s"""WITH e AS (SELECT user_id, epoch_us(ts) AS us, value FROM events),
       |     l AS (SELECT user_id, us, value,
       |                  CASE WHEN us - lag(us) OVER (PARTITION BY user_id ORDER BY us)
       |                            >= 1800000000
       |                         OR lag(us) OVER (PARTITION BY user_id ORDER BY us) IS NULL
       |                       THEN 1 ELSE 0 END AS new_s
       |           FROM e),
       |     s AS (SELECT user_id, us, value,
       |                  sum(new_s) OVER (PARTITION BY user_id ORDER BY us
       |                                   ROWS UNBOUNDED PRECEDING) AS sid
       |           FROM l)
       |SELECT user_id, min(us) AS sess_start_us, count(*) AS n,
       |       ${dsumSql("value")} AS sum_value
       |FROM s GROUP BY user_id, sid
       |ORDER BY user_id, sess_start_us""") { (s, dir) =>
    ev(s, dir)
      .groupBy(col("user_id"), session_window(col("ts"), "30 minutes"))
      .agg(count(lit(1)).as("n"), dsum(col("value")).as("sum_value"))
      .select(col("user_id"), unix_micros(col("session_window.start")).as("sess_start_us"),
        col("n"), col("sum_value"))
      .orderBy("user_id", "sess_start_us")
  }

  /** Q13b — MapType surface: parse props into a map column, then
    * map_keys / element_at / explode (SURVEY §2.8 map functions). The
    * oracle reproduces the same output from the JSON text directly. */
  val q13b_map_props: Query = Query(
    """SELECT event_type, 'k' AS key,
      |       count(*) AS n,
      |       CAST(sum(CAST(json_extract_string(props, '$.k') AS INTEGER)) AS BIGINT) AS sum_v,
      |       min(CAST(json_extract_string(props, '$.k') AS INTEGER)) AS min_v,
      |       max(CAST(json_extract_string(props, '$.k') AS INTEGER)) AS max_v
      |FROM events
      |GROUP BY event_type
      |ORDER BY event_type, key""") { (s, dir) =>
    import org.apache.spark.sql.types.{IntegerType, MapType, StringType}
    val m = from_json(col("props"), MapType(StringType, IntegerType))
    ev(s, dir)
      .select(col("event_type"), m.as("props_map"))
      .filter(size(map_keys(col("props_map"))) === 1)
      .select(col("event_type"), explode(col("props_map")))
      .groupBy("event_type", "key")
      .agg(count(lit(1)).as("n"),
        sum(col("value")).as("sum_v"),
        min(col("value")).as("min_v"),
        max(col("value")).as("max_v"))
      .orderBy("event_type", "key")
  }

  /** Q105 — conversion-delay percentiles per market segment: each
    * purchase attributes to the user's LATEST click in the preceding
    * hour (q14b's as-of semantics, expressed as the per-purchase max
    * over the candidate window so the oracle is engine-portable), the
    * delay lands in seconds, and per customer segment the query reports
    * pair count, median and p90 delay — the funnel-latency readout
    * every growth dashboard runs.
    *
    * Scale posture: clicks⋈purchases is an equi-join on user_id with
    * the 1-hour band as residual (candidates per purchase = that user's
    * clicks in the hour); the per-purchase max is a map-side-combinable
    * groupBy riding the same user-keyed exchange; the customer segment
    * is a broadcast dimension (the enrichment posture); the exact
    * percentile aggregates over segment groups (q38's posture — at
    * extreme group cardinality the documented swap is
    * approx_percentile). */
  val q105_conversion_delay: Query = Query(
    s"""WITH c AS (SELECT user_id, epoch_us(ts) AS us FROM events
       |           WHERE event_type = 'click'),
       |     p AS (SELECT event_id, user_id, epoch_us(ts) AS us FROM events
       |           WHERE event_type = 'purchase'),
       |     pair AS (SELECT p.event_id, p.user_id, p.us, max(c.us) AS c_us
       |              FROM p JOIN c ON c.user_id = p.user_id
       |                AND c.us <= p.us AND c.us >= p.us - $HourUs
       |              GROUP BY p.event_id, p.user_id, p.us),
       |     seg AS (SELECT cu.c_mktsegment AS segment,
       |                    (pair.us - pair.c_us) / 1e6 AS delay_s
       |             FROM pair JOIN customer cu ON pair.user_id = cu.c_custkey)
       |SELECT segment, CAST(count(*) AS BIGINT) AS n_pairs,
       |       ${croundSql("quantile_cont(delay_s, 0.5)")} AS med_delay_s,
       |       ${croundSql("quantile_cont(delay_s, 0.9)")} AS p90_delay_s
       |FROM seg GROUP BY segment ORDER BY segment""") { (s, dir) =>
    val e = ev(s, dir)
    val clicks = e.filter(col("event_type") === "click")
      .select(col("user_id").as("c_user"), unix_micros(col("ts")).as("c_us"))
    val purchases = e.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), unix_micros(col("ts")).as("us"))
    val pairs = purchases.join(clicks,
      col("c_user") === col("user_id") &&
        col("c_us") <= col("us") && col("c_us") >= col("us") - HourUs)
      .groupBy("event_id", "user_id", "us")
      .agg(max(col("c_us")).as("c_us"))
    val cust = Tables.table(s, dir, "customer")
      .select(col("c_custkey"), col("c_mktsegment").as("segment"))
    pairs.join(broadcast(cust), col("user_id") === col("c_custkey"))
      .select(col("segment"), ((col("us") - col("c_us")) / lit(1e6)).as("delay_s"))
      .groupBy("segment")
      .agg(count(lit(1)).as("n_pairs"),
        cround(expr("percentile(delay_s, 0.5)")).as("med_delay_s"),
        cround(expr("percentile(delay_s, 0.9)")).as("p90_delay_s"))
      .orderBy("segment")
  }

  val all: Map[String, Query] = Map(
    "q105_conversion_delay" -> q105_conversion_delay,
    "q13_json_props" -> q13_json_props,
    "q13b_map_props" -> q13b_map_props,
    "q14_interval_selfjoin" -> q14_interval_selfjoin,
    "q14b_asof_click_purchase" -> q14b_asof_click_purchase,
    "q19_tumbling_hour" -> q19_tumbling_hour,
    "q19b_sliding_15m" -> q19b_sliding_15m,
    "q20_sessionize" -> q20_sessionize)
}
