package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.engine.Tables
import graft.ops.Iterate

/** Graph analytics over relational facts: PageRank on the part
  * co-purchase graph (parts are linked when they appear in the same
  * order) — the "related items" centrality signal a catalog pipeline
  * derives from order history. Fourth user of the [[Iterate]] driver-
  * loop combinator (after R8's heroic fixed point, q37's connected
  * components and q69's BPE merge learning); the per-round dataflow is
  * the classic Pregel-as-joins shape expressed declaratively.
  */
object Graph {

  private def t(s: SparkSession, dir: String, n: String): DataFrame = Tables.table(s, dir, n)

  private val Rounds = 3
  private val Damping = 0.85
  /** Per-iteration canonical rounding (12 digits, inside [[cround]]'s
    * exactness domain for rank values <= 1): each generation's ranks are
    * rounded, and edge contributions are rounded-then-DECIMAL-summed, so
    * every generation is bit-identical across engines AND across
    * partitionings — the q64/q67 determinism posture applied to an
    * iterative dataflow. */
  private val Digits = 12

  /** Symmetrized co-purchase edge list (src, dst, outdeg): distinct
    * (order, part) incidences self-joined on the order key, both
    * directions kept, outdegree attached via a src-partitioned window
    * (the distinct already clustered rows by (src, dst), so the window
    * reuses that exchange — no separate degree aggregation + join-back
    * pass over the edges). Repartitioned by src before persisting so
    * each iteration's rank join reuses this partitioning
    * (InMemoryTableScan preserves outputPartitioning — only the
    * generation's small rank table shuffles per round, never the
    * edges). */
  private[graft] def coPurchaseEdges(s: SparkSession, dir: String): DataFrame = {
    // Two explicit exchanges total, each reused by everything downstream
    // of it (hashpartitioning on a SUBSET of the grouping keys satisfies
    // the clustering requirement, so neither distinct re-shuffles and the
    // self-join runs on co-located partitions):
    //   1. by l_orderkey — (order, part) dedup + the pair self-join;
    //   2. by src — (src, dst) dedup + the outdegree window + the persist
    //      layout every iteration's rank join banks on.
    val op = t(s, dir, "lineitem").select("l_orderkey", "l_partkey")
      .repartition(col("l_orderkey"))
      .dropDuplicates("l_orderkey", "l_partkey")
    op.select(col("l_orderkey"), col("l_partkey").as("src"))
      .join(op.select(col("l_orderkey"), col("l_partkey").as("dst")), "l_orderkey")
      .filter(col("src") =!= col("dst"))
      .select("src", "dst")
      .repartition(col("src"))
      .dropDuplicates("src", "dst")
      .withColumn("outdeg", count(lit(1)).over(Window.partitionBy("src")))
  }

  /** One row per node with its outdegree — derived from the persisted
    * edge frame by a src-local aggregation (first(outdeg) rides the
    * edge partitioning; no second scan of lineitem). */
  private[graft] def nodeDegrees(edges: DataFrame): DataFrame =
    edges.groupBy(col("src").as("node")).agg(first(col("outdeg")).as("outdeg"))

  /** Q85 — PageRank (damping 0.85, 3 synchronous rounds from a uniform
    * start) over [[coPurchaseEdges]]. The graph is symmetric by
    * construction, so every node has outdegree >= 1 — no dangling-mass
    * correction term is needed and every node receives mail each round.
    *
    * Scale posture: the edge list is built once, persisted partitioned
    * by src; each round is rank-join (only the n-node rank table
    * shuffles to the edge partitioning) + a map-side-combinable sum by
    * dst — two exchanges of rank-sized data per round, with the
    * combinator supplying the persist/localCheckpoint/one-action
    * discipline. The one driver-side value is the node COUNT (graph
    * metadata, the IVF-centroid precedent); ranks themselves never
    * leave the cluster. The oracle unrolls the same three rounds as
    * chained CTEs. */
  val q85_pagerank: Query = {
    def roundCte(k: Int): String = {
      val contrib = croundSql(s"r.r / d.outdeg", Digits)
      s"""r$k AS (SELECT e.dst AS node,
         |        ${croundSql(
            s"0.15e0 / (SELECT n FROM nn) + ${Damping}e0 * " +
            s"CAST(sum(CAST($contrib AS DECIMAL(30,$Digits))) AS DOUBLE)", Digits)} AS r
         |        FROM e JOIN r${k - 1} r ON e.src = r.node JOIN deg d ON e.src = d.src
         |        GROUP BY e.dst)""".stripMargin
    }
    Query(
      s"""WITH op AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
         |     e AS (SELECT DISTINCT a.l_partkey AS src, b.l_partkey AS dst
         |           FROM op a JOIN op b
         |             ON a.l_orderkey = b.l_orderkey AND a.l_partkey <> b.l_partkey),
         |     deg AS (SELECT src, count(*) AS outdeg FROM e GROUP BY src),
         |     nn AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM deg),
         |     r0 AS (SELECT src AS node, 1.0e0 / (SELECT n FROM nn) AS r FROM deg),
         |     ${(1 to Rounds).map(roundCte).mkString(",\n")}
         |SELECT node, r AS pagerank FROM r$Rounds ORDER BY node""") { (s, dir) =>
      val edges = coPurchaseEdges(s, dir).persist()
      val deg = nodeDegrees(edges).persist()
      val n = deg.count()
      val init = deg.select(col("node"), lit(1.0 / n).as("r")).persist()
      val fix = Iterate.loop(init, maxRounds = Rounds) { (cur, _) =>
        edges.join(cur, edges("src") === cur("node"))
          .select(col("dst"),
            cround(col("r") / col("outdeg"), Digits).cast(DecimalType(30, Digits)).as("c"))
          .groupBy("dst")
          .agg(cround(lit(0.15 / n) + lit(Damping) * sum(col("c")).cast("double"), Digits).as("r"))
          .select(col("dst").as("node"), col("r"))
      } { (_, next) => next.count(); false }
      val out = fix.cur.select(col("node"), col("r").as("pagerank")).orderBy("node")
      edges.unpersist(); deg.unpersist()
      out
    }
  }

  val all: Map[String, Query] = Map("q85_pagerank" -> q85_pagerank)
}
