package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.engine.Tables

/** Behavioral-analytics surface: conversion funnel and stratified
  * sampling over the events table. */
object Funnel {

  private def ev(s: SparkSession, dir: String): DataFrame = Tables.table(s, dir, "events")

  /** Q36 — ordered conversion funnel per user: view → click (after first
    * view) → purchase (after first qualifying click). One aggregation
    * pass per stage over per-user minima — no self-joins on the raw
    * events. */
  val q36_funnel: Query = Query(
    """WITH v AS (SELECT user_id, min(epoch_us(ts)) AS v_us FROM events
      |           WHERE event_type = 'view' GROUP BY user_id),
      |     c AS (SELECT e.user_id, min(epoch_us(ts)) AS c_us
      |           FROM events e JOIN v ON v.user_id = e.user_id
      |           WHERE e.event_type = 'click' AND epoch_us(e.ts) > v.v_us
      |           GROUP BY e.user_id),
      |     p AS (SELECT e.user_id, min(epoch_us(ts)) AS p_us
      |           FROM events e JOIN c ON c.user_id = e.user_id
      |           WHERE e.event_type = 'purchase' AND epoch_us(e.ts) > c.c_us
      |           GROUP BY e.user_id)
      |SELECT 'stage1_view' AS stage, count(*) AS n_users FROM v
      |UNION ALL SELECT 'stage2_click', count(*) FROM c
      |UNION ALL SELECT 'stage3_purchase', count(*) FROM p
      |ORDER BY stage""") { (s, dir) =>
    val e = ev(s, dir).select(col("user_id"), col("event_type"), unix_micros(col("ts")).as("us"))
    val v = e.filter(col("event_type") === "view")
      .groupBy("user_id").agg(min(col("us")).as("v_us"))
    val c = e.filter(col("event_type") === "click")
      .join(v, "user_id").filter(col("us") > col("v_us"))
      .groupBy("user_id").agg(min(col("us")).as("c_us"))
    val p = e.filter(col("event_type") === "purchase")
      .join(c, "user_id").filter(col("us") > col("c_us"))
      .groupBy("user_id").agg(min(col("us")).as("p_us"))
    v.agg(count(lit(1)).as("n_users")).select(lit("stage1_view").as("stage"), col("n_users"))
      .unionAll(c.agg(count(lit(1)).as("n_users")).select(lit("stage2_click").as("stage"), col("n_users")))
      .unionAll(p.agg(count(lit(1)).as("n_users")).select(lit("stage3_purchase").as("stage"), col("n_users")))
      .orderBy("stage")
  }

  /** Q35 — stratified sampling per event type (sampleBy): the
    * training-data downsampling primitive. Seeded and deterministic
    * within Spark, but RNG-specific → rows-only for the driver; the
    * PropertySpec asserts per-stratum fraction tolerance. */
  val q35_stratified_sample: Query = Query.noOracle { (s, dir) =>
    val fractions = Map("view" -> 0.1, "click" -> 0.5, "purchase" -> 1.0,
      "signup" -> 1.0, "error" -> 0.25)
    ev(s, dir)
      .stat.sampleBy("event_type", fractions, seed = 42L)
      .groupBy("event_type")
      .agg(count(lit(1)).as("n_sampled"))
      .orderBy("event_type")
  }

  val all: Map[String, Query] = Map(
    "q35_stratified_sample" -> q35_stratified_sample,
    "q36_funnel" -> q36_funnel)
}
