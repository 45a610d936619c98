package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.engine.Tables

/** Graph analytics over relational facts: PageRank (uniform and
  * co-purchase-weighted), triangle counting, and bounded shortest
  * paths on the part co-purchase graph (parts are linked when they
  * appear in the same order) — the "related items" signals a catalog
  * pipeline derives from order history. Every member runs a FIXED
  * round count, so the rounds unroll into one lazy plan (one action,
  * no per-generation barriers — see [[pagerankGated]]); a
  * data-dependent iteration (convergence loops like q37's) would keep
  * the [[graft.ops.Iterate]] driver-loop discipline instead. Either
  * way the per-round dataflow is the classic Pregel-as-joins shape
  * expressed declaratively.
  */
object Graph {

  private def t(s: SparkSession, dir: String, n: String): DataFrame = Tables.table(s, dir, n)

  private val Rounds = 3
  private val Damping = 0.85
  /** q88's closure-check broadcast gate: below this many directed edges
    * the (src < dst) half broadcasts (~16 bytes/row → ≤ ~64 MB at the
    * gate) and the much larger wedge stream — W ≈ E^1.5 worst case, 17×
    * E on this corpus — never shuffles; above it the closure check is a
    * plain shuffle equi-join. The q28/q46 runtime-size-gate pattern
    * (PlanSpec exempts q88 on the same grounds; GraphSpec forces both
    * sides and equates them). */
  private[graft] val EdgeBroadcastLimit = 8000000L
  /** q88's CSR-kernel gate (round 10), deliberately far above
    * [[EdgeBroadcastLimit]]: the kernel broadcasts the oriented
    * adjacency as a CSR at 4 BYTES/edge (int indices + node-sized
    * indptr — 512 MB at this limit, a standard high-memory-executor
    * broadcast budget), while the past-gate intersect dataflow's
    * adjacency-attach exchange moves Σ outdeg⁺² LONGS — measured
    * 28 GB of spill at 72M edges (30× replica), growing superlinearly
    * with density. Up to this limit the 4 B/edge broadcast is strictly
    * the cheaper side of that trade; past it (≫512 MB/executor) the
    * shuffle dataflow remains the only shape that needs no replicated
    * adjacency.
    *
    * Driver budget at the ceiling, MEASURED (round 11,
    * tools/ProbeCsrPack 128 4 — a synthetic 128M-edge / 4M-node graph,
    * the probe's documented gate-ceiling invocation; the 8 B-per-
    * partition-distinct-src term scales with node count, so the node
    * figure matters):
    * the pack collects primitive-packed per-partition blocks —
    * 4 B/edge of dst indexes + 8 B per partition-distinct src — and
    * retains the CSR at 4.2 B/edge, totaling 10.0 B/edge ≈ 1.28 GB of
    * driver heap at this limit (the boxed-tuple collect this replaced
    * was unmeasured and a multiple of that). JVM-wide transient in
    * local mode is 112 B/edge ≈ 14.4 GB — the 32 concurrent
    * executor-side grouping maps, which a real cluster spreads across
    * executors and the 32 GB local harness heap absorbs. */
  private[graft] val TriangleCsrEdgeLimit = 128000000L
  /** Per-iteration canonical rounding (12 digits, inside [[cround]]'s
    * exactness domain for rank values <= 1): each generation's ranks are
    * rounded, and edge contributions are rounded-then-DECIMAL-summed, so
    * every generation is bit-identical across engines AND across
    * partitionings — the q64/q67 determinism posture applied to an
    * iterative dataflow. */
  private val Digits = 12
  /** The ORACLE's contribution decimal precision 17 (not 30): values
    * are <= 1.0 at scale 12, so precision 17 loses nothing — and DuckDB
    * keeps the decimals in its int64 fast path. The Spark side goes one
    * step further and sums the long numerators directly (see
    * [[pagerankOf]]) — identical values, no decimal at all. */

  /** Symmetrized co-purchase edge list (src, dst, outdeg): distinct
    * (order, part) incidences self-joined on the order key, both
    * directions kept, plus THE SRC NODE'S OUTDEGREE folded onto each
    * edge row (round-8: one wide persist instead of a per-round
    * node-sized degree join — each PageRank round's mail is now the
    * bare (node, rank) table and the per-edge contribution numerator
    * reads outdeg straight off the cached frame; q88's orientation
    * reads du the same way and joins degrees only for the dst side).
    * The fold itself is free of new exchanges: degrees are a
    * src-local map-side-combinable count over the deduped pair frame,
    * and the degree join runs src-to-src on the partitioning the
    * frame already has. Repartitioned by src before persisting so
    * each iteration's rank join reuses this partitioning
    * (InMemoryTableScan preserves outputPartitioning — only the
    * generation's small rank table shuffles per round, never the
    * edges). */
  private[graft] def coPurchaseEdges(s: SparkSession, dir: String): DataFrame =
    // memoized per (session, dir) like the TextOps shingle frames: q85,
    // q88 and q90 all consume this graph, so a session builds it once
    // (the bench's cache reset still charges each query its full
    // standalone cost)
    TextOps.memo("coPurchaseEdges", s, dir) {
      // ONE pass, ONE materialization: the dedup output is already
      // src-partitioned, so the degree fold is a window count whose only
      // cost is the per-partition sort by src (measured cheaper than the
      // double-persist variant this replaced: materializing a bare edge
      // cache just to join degrees back cost a full extra E-row write).
      import org.apache.spark.sql.expressions.Window
      val out = coPurchasePairs(s, dir).dropDuplicates("src", "dst")
        .withColumn("outdeg", count(lit(1)).over(Window.partitionBy("src")))
        .persist()
      recordGraphStats("coPurchaseEdges", s, dir, out)
      out
    }

  /** The graph metadata every consumer needs — edge count (q88's
    * broadcast gate), node count (the PageRank/label-prop init and
    * gate), min node id (q90's source) — computed in the ONE action
    * that materializes the edge cache, instead of a separate barrier
    * job per consumer. The counts are pure functions of the fixture,
    * so the cache never goes stale; it survives resetCaches harmlessly
    * (the next build recomputes and overwrites the same values). */
  private val graphStats =
    scala.collection.mutable.Map[(String, String, String), (Long, Long, Long)]()

  /** Node/edge-sized kernel broadcasts whose lifetime matches the memo
    * caches (ADVICE r10: the final-round rank vectors, dense-id maps
    * and the q88 CSR were never released, so a long-lived session
    * accumulated them until ContextCleaner GC). [[TextOps.resetCaches]]
    * releases them together with the memoized frames they belong to.
    * Released via unpersist(blocking = false) + dropping the strong
    * ref — NOT destroy(): the memoized RDDs' recompute lineage closes
    * over some of these (an evicted adjacency partition re-reads bIds),
    * and unpersist keeps re-fetch-from-driver legal until GC finishes
    * the job, while destroy would poison the lineage. */
  private val trackedBroadcasts =
    scala.collection.mutable.Buffer.empty[org.apache.spark.broadcast.Broadcast[_]]

  private[graft] def track[T](b: org.apache.spark.broadcast.Broadcast[T])
      : org.apache.spark.broadcast.Broadcast[T] =
    trackedBroadcasts.synchronized { trackedBroadcasts += b; b }

  private[graft] def destroyTrackedBroadcasts(): Unit =
    trackedBroadcasts.synchronized {
      trackedBroadcasts.foreach(_.unpersist(blocking = false))
      trackedBroadcasts.clear()
    }

  /** Session identity for the stats key: a fresh UUID minted per
    * SparkSession, held in a WeakHashMap so the tag dies with the
    * session (round-9 advice — the previous identityHashCode string
    * could collide between a live and a dead session, letting a stale
    * entry answer for a regenerated fixture at the same dir; a UUID
    * key can never be revived by a later session). The weak reference
    * keeps the multi-session-embedding guarantee the round-8 fix was
    * for: nothing here pins a session for the JVM's lifetime.
    * (sessionUUID would be the canonical key, but it is private[sql].) */
  private val sessionTags =
    new java.util.WeakHashMap[SparkSession, String]()
  private def sid(s: SparkSession): String = sessionTags.synchronized {
    var tag = sessionTags.get(s)
    if (tag == null) {
      tag = java.util.UUID.randomUUID().toString
      sessionTags.put(s, tag)
    }
    tag
  }

  private def recordGraphStats(tag: String, s: SparkSession, dir: String,
      edges: DataFrame): Unit = {
    // distinct src rides the frame's src partitioning (partial distinct
    // per partition); min folds in for free — one job materializes the
    // persist AND yields all three scalars
    val r = edges.agg(count(lit(1)), count_distinct(col("src")), min(col("src"))).first()
    // min over an EMPTY edge set is NULL (the q88 empty-aggregate class,
    // round-9 advice): record a Long.MaxValue sentinel instead of NPEing
    // the memo build — consumers see n = 0 and return their documented
    // empty-graph value (see EmptyInputSpec)
    val minSrc = if (r.isNullAt(2)) Long.MaxValue else r.getLong(2)
    graphStats.synchronized {
      graphStats((tag, sid(s), dir)) = (r.getLong(0), r.getLong(1), minSrc)
    }
  }

  /** (nEdges, nNodes, minNode) recorded when `tag`'s edge memo was
    * built this session; None only if the memo was never built. */
  private[graft] def graphStat(tag: String, s: SparkSession, dir: String): Option[(Long, Long, Long)] =
    graphStats.synchronized(graphStats.get((tag, sid(s), dir)))

  /** The raw directed pair stream (one row per order co-containing a
    * part pair, both directions), delivered REPARTITIONED BY src — the
    * shared first half of both edge builds. Two explicit exchanges
    * total, each reused by everything downstream (hashpartitioning on a
    * SUBSET of the grouping keys satisfies the clustering requirement,
    * so the dedups/aggregates/windows above it never re-shuffle and the
    * self-join runs on co-located partitions):
    *   1. by l_orderkey — (order, part) dedup + the pair self-join;
    *   2. by src — the (src, dst) dedup/weight-count + degree window +
    *      the persist layout every iteration's rank join banks on. */
  private[graft] def coPurchasePairs(s: SparkSession, dir: String): DataFrame = {
    val op = t(s, dir, "lineitem").select("l_orderkey", "l_partkey")
      .repartition(col("l_orderkey"))
      .dropDuplicates("l_orderkey", "l_partkey")
    op.select(col("l_orderkey"), col("l_partkey").as("src"))
      .join(op.select(col("l_orderkey"), col("l_partkey").as("dst")), "l_orderkey")
      .filter(col("src") =!= col("dst"))
      .select("src", "dst")
      .repartition(col("src"))
  }

  /** The bare (src, dst) edge set — plan-shape test surface; the
    * memoized production frame additionally folds outdeg on. */
  private[graft] def buildCoPurchaseEdges(s: SparkSession, dir: String): DataFrame =
    coPurchasePairs(s, dir).dropDuplicates("src", "dst")

  /** The Catalyst dataflow feeding each below-gate kernel query, plus a
    * static kernel tag, for [[graft.PlanFingerprints]] (ADVICE r10: the
    * kernels run eagerly in RDD land, so the returned frames' trivial
    * plans made four fingerprints identical and vacuous). These are the
    * UNMEMOIZED builder plans — pure plan constructions, no persist
    * state and no jobs — so the fingerprint is cache-state-free. q85
    * and q90/q98 share the same adjacency build by design (the memoized
    * co-purchase edge frame); their tags keep the committed hashes
    * distinct, and the object-land differences between their kernels
    * are pinned by GraphSpec's bitwise kernel≡dataflow equivalences,
    * not by any plan hash. */
  private[graft] def kernelAuxPlan(name: String, s: SparkSession,
      dir: String): Option[(String, DataFrame)] = {
    // the unmemoized equivalent of coPurchaseEdges' build (bare edges +
    // the outdeg window) — same plan shape, no persist in the tree
    def widened = {
      import org.apache.spark.sql.expressions.Window
      buildCoPurchaseEdges(s, dir)
        .withColumn("outdeg", count(lit(1)).over(Window.partitionBy("src")))
    }
    name match {
      case "q85_pagerank" =>
        Some(("pagerankKernelUniform over coPurchaseEdges", widened))
      case "q85b_weighted_pagerank" =>
        Some(("pagerankKernelWeighted over coPurchasePairs", coPurchasePairs(s, dir)))
      case "q90_sssp" =>
        Some(("minPropKernel(sssp) over coPurchaseEdges", widened))
      case "q98_label_prop" =>
        Some(("minPropKernel(labelprop) over coPurchaseEdges", widened))
      case "q88_triangles" =>
        Some(("trianglesKernel over orientOf(edges)", orientOf(widened)))
      case _ => None
    }
  }

  /** One row per node with its outdegree — a src-local map-side-
    * combinable count over the persisted edge frame (rides the edge
    * partitioning; no second scan of lineitem, no window sort). */
  private[graft] def nodeDegrees(edges: DataFrame): DataFrame =
    edges.groupBy(col("src").as("node")).agg(count(lit(1)).as("outdeg"))

  /** The shared synchronous-PageRank skeleton both variants run: the
    * chained SQL round CTEs (parameterized on the contribution
    * expression and the per-round FROM clause) and the Spark driver
    * loop (parameterized on the edge frame, the contribution column,
    * and the node set). A fix to the iteration discipline — rounding
    * placement, the teleport term, the Iterate.loop protocol — lands in
    * ONE place for q85 and q85b. */
  private def prRoundCtes(contribSql: String, fromSql: Int => String): String =
    (1 to Rounds).map { k =>
      s"""r$k AS (SELECT e.dst AS node,
         |        ${croundSql(
            s"0.15e0 / (SELECT n FROM nn) + ${Damping}e0 * " +
            s"CAST(sum(CAST(${croundSql(contribSql, Digits)} AS DECIMAL(17,$Digits))) AS DOUBLE)", Digits)} AS r
         |        FROM ${fromSql(k)}
         |        GROUP BY e.dst)""".stripMargin
    }.mkString(",\n")

  /** Per-edge contribution numerator on the 12-digit grid:
    * k = floor(x·10^12 + 0.5), an exact-integer double (contributions
    * are <= 1, so k <= 10^12 < 2^53) cast losslessly to long. */
  private def kOf(contrib: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    floor(contrib * math.pow(10, Digits) + 0.5).cast("long")

  /** The shared per-round dataflow. `stats` is the node-sized static
    * table (outdeg or wsum); each round joins it onto the RANK table —
    * node-sized work, never edge-sized — then `msg` shapes the per-node
    * mail and `kExpr` gives each edge's contribution numerator.
    *
    * Contributions are summed as LONG numerators of the 12-digit grid,
    * not DECIMAL(17,12): the decimal sum of k_i/10^12 is (Σk_i)/10^12,
    * so summing the k_i as longs and dividing once is VALUE-IDENTICAL
    * to the oracle's decimal path (both convert the same rational to
    * its nearest double — long→double exact below 2^53, 10^12 exact,
    * IEEE division correctly rounded; total rank mass is ~1, so
    * Σk ~ 10^12 — no overflow at any graph size) while the hash
    * aggregate updates a plain long instead of allocating a BigDecimal
    * per edge. Same exactness, same order-invariance (GraphSpec's
    * bitwise replay), a fraction of the CPU. */
  /** Rank-table broadcast gate: below this many NODES the per-round
    * mail table (node, long numerator — ~16 bytes/row, ≤ ~64 MB at the
    * gate) broadcasts and each round is a stateless map over the
    * partitioned edge cache; above it the rank table shuffles to the
    * edge partitioning (the classic Pregel posture — edges never move
    * either way). The q28/q88 runtime-size-gate pattern; GraphSpec
    * forces both sides and equates them bitwise. */
  private[graft] val NodeBroadcastLimit = 4000000L

  /** Round-9 gate measurements ([[graft.tools.ProbeGraphGate]],
    * interleaved A/B/A/B, edge frame prewarmed, per-generation memos
    * evicted between runs) split by query AND by methodology:
    * steady-state (one hot JVM, repeated runs) has the mail-SHUFFLE
    * side winning everywhere — q85 3.3–3.5 s vs 4.0–4.2 broadcast,
    * q90 3.4–3.7 vs 4.6–5.0, q98 3.8–4.2 vs 4.9–5.4 — because each
    * broadcast round is a sequential driver-collect barrier. But
    * bench-style (fresh JVM, per-query sf0.001 warmup, one timed shot)
    * INVERTS for PageRank only: q85 3.5 s broadcast vs 3.9–4.0
    * shuffle, q85b 4.1 vs 5.2–5.6 across three fresh-JVM runs — the
    * shuffle chain's extra AQE stage boundaries cost more than the
    * collect barriers until the stage shapes are hot, and PageRank has
    * the most per-round plan (the contribution numerator) to warm.
    * q90/q98's pure min-propagation rounds win on the shuffle side in
    * BOTH methodologies, so their defaults flipped (see their bodies);
    * PageRank keeps the node-gated broadcast default, with the
    * steady-state evidence on file here for an embedder running a hot
    * loop (pass broadcastLimit = 0 to [[pagerankGated]]). GraphSpec
    * continues to force BOTH sides and equate them bitwise. */
  /** The shared dataflow, rounds UNROLLED into one lazy plan exactly
    * like the oracle's chained CTEs: generation k is a subplan over
    * generation k-1, and the whole 3-round vector materializes in a
    * SINGLE action — no per-round persist/count barriers (the
    * driver-loop [[Iterate]] discipline is for data-dependent
    * convergence; a fixed round count doesn't need it). The edge cache
    * is scanned once per round inside that one job; the only
    * driver-side value is the node count (graph metadata).
    *
    * `stats` is the node-sized static table (outdeg or wsum); each
    * round joins it onto the RANK table — node-sized work, never
    * edge-sized — then `msg` shapes the per-node mail and `kExpr` gives
    * each edge's contribution numerator.
    *
    * Contributions are summed as LONG numerators of the 12-digit grid,
    * not DECIMAL(17,12): cround(x,12) is exactly k/10^12 with
    * k = floor(x·10^12 + 0.5) an exact-integer double (contributions
    * are <= 1, so k <= 10^12 < 2^53), and the decimal sum of k_i/10^12
    * is (Σk_i)/10^12 — so summing the k_i as longs and dividing once is
    * VALUE-IDENTICAL to the oracle's decimal path (both convert the
    * same rational to its nearest double: long→double exact below 2^53,
    * 10^12 exact, IEEE division correctly rounded; total rank mass is
    * ~1, so Σk ~ 10^12 — no overflow at any graph size) while the hash
    * aggregate updates a plain long instead of allocating a BigDecimal
    * per edge. Same exactness, same order-invariance (GraphSpec's
    * bitwise replay), a fraction of the CPU. */
  private[graft] def pagerankGated(edges: DataFrame, stats: DataFrame,
      kExprOf: org.apache.spark.sql.Column => org.apache.spark.sql.Column,
      broadcastLimit: Long,
      knownN: Option[Long] = None): DataFrame = {
    // round-8: the mail is the BARE (node, rank) table — the per-node
    // static divisor (outdeg / wsum) lives ON the persisted edge frame
    // (see coPurchaseEdges), so the old per-round node-sized stats join
    // (one exchange + one join job per round) is gone and kExprOf
    // computes the grid numerator per edge from cached columns.
    // Value-identity: the numerator is a pure function of (r, static),
    // both unchanged, so every contribution — and hence every round —
    // is bitwise identical to the joined form (GraphSpec's sequential
    // replay pins it). `stats` is only the n fallback now — when the
    // caller already knows n from the edge-memo action ([[graphStat]]),
    // no stats job runs at all.
    val n = knownN.getOrElse {
      val statsP = stats.persist()
      try statsP.count() finally statsP.unpersist()
    }
    val scaleF = math.pow(10, Digits)
    var cur: DataFrame = null
    for (round <- 1 to Rounds) {
      // round 1 (round 9): the start is uniform, so its mail is the
      // LITERAL 1/n for every src — the rank join AND its broadcast/
      // exchange fuse into a pure map over the cached edge frame (one
      // whole stage cascade gone; with knownN the init's node-universe
      // scan disappears too). Bitwise identical: the old inner join
      // matched every edge exactly once (the node universe IS distinct
      // src) and delivered the same double 1.0/n into the same kExprOf.
      val contrib =
        if (round == 1) edges.select(col("dst"), kExprOf(lit(1.0 / n)).as("k"))
        else {
          val m = if (n <= broadcastLimit) broadcast(cur) else cur
          edges.join(m, edges("src") === m("node"))
            .select(col("dst"), kExprOf(col("r")).as("k"))
        }
      cur = contrib
        .groupBy("dst")
        .agg(cround(lit(0.15 / n) +
          lit(Damping) * (sum(col("k")).cast("double") / scaleF), Digits).as("r"))
        .select(col("dst").as("node"), col("r"))
    }
    cur.select(col("node"), col("r").as("pagerank")).orderBy("node")
  }

  // ── Round-10: the below-gate PageRank KERNEL ──
  // The round-9 profile showed each unrolled round paying ~10 executor-
  // cpu-s to push the E-row edge stream (2.39M rows at sf0.1) through a
  // per-row hash aggregate whose OUTPUT is only node-sized — the per-row
  // row-ization constant, not the arithmetic, was the whole cost. Below
  // the node gate the rank vector already crosses the driver every round
  // (that is what broadcasting it MEANS), so the kernel spends the same
  // memory budget better: the edge list is compacted ONCE into an
  // index-space adjacency (one array row per node instead of outdeg flat
  // rows — built inside the query's own timed window and memoized like
  // every shared frame), and each round is a mapPartitions over those
  // node rows accumulating long numerators into a dense n-sized array —
  // tens of ns per edge instead of μs — followed by a node-sized
  // groupBy(i).sum merge. Per-partition partial rows are ≤ min(n, edges
  // in partition), never MORE than the flat form shuffled, and the
  // accumulator (8n bytes ≤ 32 MB at the 4M gate) is exactly the
  // broadcast budget the gate already grants. Arithmetic is bit-for-bit
  // the Column path's: per-edge k = floor(contrib·10^12 + 0.5) as a
  // long (same IEEE ops), long sums are order-invariant, and the rank
  // update replays the same cround expression — GraphSpec equates the
  // kernel against the shuffle side and the sequential BigDecimal
  // replay. Past the gate the shuffle path is untouched.

  /** Adjacency partition count sized to the WORK, not to the input's
    * partitioning: the per-round kernel does ~E cheap long-adds, and the
    * cache-scan probe measured each local task carrying ~5-15 ms of
    * fixed cost — so a node-sized adjacency split 32 ways pays 32
    * schedulings for microseconds of work each. Target ~4M edge entries
    * per task (≈ 10-20 ms of adds), floor 1, cap at 4× the cluster's
    * parallelism so a 100B-edge graph still fans wide. */
  private def adjParts(s: SparkSession, nEdges: Long): Int =
    math.max(1, math.min(4 * s.sparkContext.defaultParallelism,
      (nEdges / 4000000L).toInt))

  /** Node universe as a SORTED id array (driver-side, node-sized — the
    * budget the broadcast mail already spent): the kernel's index
    * space. distinct(src) rides the persisted src partitioning (partial
    * distinct per partition, no exchange of edge-sized data). */
  private def nodeIds(edges: DataFrame): Array[Long] = {
    val ids = edges.select("src").distinct().collect().map(_.getLong(0))
    java.util.Arrays.sort(ids)
    ids
  }

  /** The shared round loop: `partials` maps a broadcast rank vector to
    * the (node-index, long-numerator-partial) frame for one round;
    * rounds 1..R-1 merge node-sized sums on the cluster and update the
    * rank vector on the driver (the same IEEE expression the Column
    * path evaluates — floor((tele + 0.85·(Σk/10^12))·10^12 + 0.5)/10^12);
    * the final round stays distributed through the SAME Catalyst cround
    * so the output plan ends in-cluster. A node that received no mail
    * is ABSENT from the oracle's generation (inner join semantics):
    * the kernel marks it NaN and its out-edges go silent next round. */
  /** Primitive-packed collect of a two-column (Int, Long) frame — ONE
    * (indexes, values) block per partition instead of n boxed Rows.
    * The packCsr lesson applied to the per-round kernel merges
    * (VERDICT r11 item 4, measured by tools/ProbeKernelMerge at the
    * 4M-node NodeBroadcastLimit ceiling): the boxed Row collect cost
    * ~505 B/node of transient driver heap (~2.0 GB per round; the
    * typed Tuple2 collect was worse at ~683 B/node) against the
    * 12 B/node the payload actually needs. */
  private[graft] def collectPackedIntLong(df: DataFrame)
      : Array[(Array[Int], Array[Long])] =
    df.queryExecution.toRdd.mapPartitions { it =>
      val is = new scala.collection.mutable.ArrayBuilder.ofInt
      val vs = new scala.collection.mutable.ArrayBuilder.ofLong
      it.foreach { r => is += r.getInt(0); vs += r.getLong(1) }
      Iterator.single((is.result(), vs.result()))
    }.collect()

  private def kernelRounds(s: SparkSession, ids: Array[Long], n: Long,
      partials: org.apache.spark.broadcast.Broadcast[Array[Double]] => DataFrame): DataFrame = {
    val tele = 0.15 / n
    val scaleF = math.pow(10, Digits)
    var r = Array.fill(ids.length)(1.0 / n)
    for (_ <- 1 until Rounds) {
      val bR = s.sparkContext.broadcast(r)
      val blocks = collectPackedIntLong(
        partials(bR).groupBy("i").agg(sum(col("k")).as("sk")))
      val nr = Array.fill(ids.length)(Double.NaN)
      blocks.foreach { case (is, vs) =>
        var j = 0
        while (j < is.length) {
          nr(is(j)) = math.floor(
            (tele + Damping * (vs(j).toDouble / scaleF)) * scaleF + 0.5) / scaleF
          j += 1
        }
      }
      bR.destroy()
      r = nr
    }
    val bIds = track(s.sparkContext.broadcast(ids))
    val idOf = udf((i: Int) => bIds.value(i))
    partials(track(s.sparkContext.broadcast(r)))
      .groupBy("i").agg(sum(col("k")).as("sk"))
      .select(idOf(col("i")).as("node"),
        cround(lit(tele) + lit(Damping) * (col("sk").cast("double") / scaleF), Digits)
          .as("pagerank"))
      .orderBy("node")
  }

  /** Uniform-share kernel. The adjacency is built by RUN-GROUPING a
    * single typed pass over the flat edge cache — not by collect_list,
    * whose ObjectHashAggregate measured ~18 executor-cpu-s on the same
    * 2.4M rows (per-row append + array re-copies). The cached frame is
    * src-contiguous within partitions (the outdeg window sorted it),
    * so runs are maximal in practice; correctness does NOT depend on
    * it — a src split across runs contributes through two run rows
    * whose k is the same pure function of (r, outdeg), and long sums
    * are order-invariant. Node ids resolve to dense indexes ONCE at
    * build (binary search per edge); rounds are then direct-indexed
    * long adds. */
  /** The SHARED below-gate adjacency over [[coPurchaseEdges]]:
    * (srcIdx, outdeg, dstIdxs) object rows, memoized per session+dir so
    * q85/q90/q98 build it once (in the bench each rider pays it inside
    * its own timed window after the cache reset). Round 10.2: persists
    * as a DESERIALIZED object RDD, not a Dataset — the stage profile
    * showed each round's dominant cost was Tungsten UnsafeArrayData
    * DECODE of the persisted array rows (~180 ns/edge/round; the
    * arithmetic itself is single-digit ns/edge) and the Dataset persist
    * paid a matching one-time encode. Object rows hand the rounds raw
    * Array[Int]s. The run-grouping builds in the edge cache's full
    * parallelism; callers take a coalesce()d view (no shuffle, reads
    * local cached blocks) at the work-sized task count — 32 tasks of
    * microseconds each measured 5-15 ms of fixed cost apiece. */
  private def adjacencyUniform(s: SparkSession, dir: String,
      edges: DataFrame, ids: Array[Long]): org.apache.spark.rdd.RDD[(Int, Long, Array[Int])] = {
    import s.implicits._
    TextOps.memoRdd("coPurchase.adj", s, dir) {
      // broadcast INSIDE the memo build (ADVICE r10: on a memo hit the
      // id array was re-broadcast on every call and never read); the
      // persisted RDD's recompute lineage closes over it, so it is
      // tracked and released together with the memo entry
      val bIds = track(s.sparkContext.broadcast(ids))
      val built = edges.select("src", "dst", "outdeg").as[(Long, Long, Long)].rdd
        .mapPartitions { it =>
          val idsL = bIds.value
          val out = scala.collection.mutable.ArrayBuffer.empty[(Int, Long, Array[Int])]
          var curSrc = Long.MinValue
          var curDeg = 0L
          var buf: scala.collection.mutable.ArrayBuilder.ofInt = null
          def flush(): Unit = if (buf != null) {
            out += ((java.util.Arrays.binarySearch(idsL, curSrc), curDeg, buf.result()))
            buf = null
          }
          it.foreach { case (src, dst, outdeg) =>
            if (src != curSrc) { flush(); curSrc = src; curDeg = outdeg
              buf = new scala.collection.mutable.ArrayBuilder.ofInt }
            buf += java.util.Arrays.binarySearch(idsL, dst)
          }
          flush()
          out.iterator
        }.persist(org.apache.spark.storage.StorageLevel.MEMORY_ONLY)
      // materialize the cache at the BUILD's parallelism — the
      // coalesced round view would otherwise compute the whole parent
      // lazily inside its own few tasks on the first round
      built.count()
      built
    }
  }

  private[graft] def pagerankKernelUniform(s: SparkSession, dir: String,
      edges: DataFrame, n: Long, nEdges: Long): DataFrame = {
    import s.implicits._
    val ids = nodeIds(edges)
    val adj = adjacencyUniform(s, dir, edges, ids).coalesce(adjParts(s, nEdges))
    kernelRounds(s, ids, n, bR => adj.mapPartitions { it =>
      val rL = bR.value
      val acc = new Array[Long](rL.length)
      val touched = new Array[Long]((rL.length + 63) >> 6)
      it.foreach { case (si, outdeg, dsts) =>
        val rs = rL(si)
        if (!java.lang.Double.isNaN(rs)) {
          // same IEEE ops as kOf(r / outdeg): long→double exact divide,
          // ×10^12, +0.5, floor, exact long cast
          val k = math.floor(rs / outdeg * 1e12 + 0.5).toLong
          var i = 0
          while (i < dsts.length) {
            val d = dsts(i)
            acc(d) += k
            touched(d >> 6) |= 1L << (d & 63)
            i += 1
          }
        }
      }
      Iterator.range(0, rL.length)
        .filter(i => ((touched(i >> 6) >>> (i & 63)) & 1L) == 1L)
        .map(i => (i, acc(i)))
    }.toDF("i", "k"))
  }

  /** Weighted kernel, built STRAIGHT from the pair stream — it never
    * materializes the flat (src, dst, w, wsum) frame at all. The
    * (src, dst) weight count rides the pair stream's hash(src)
    * partitioning (subset-key clustering), which also means ALL rows of
    * a src land in one partition — so wsum is a per-partition hash-map
    * fold instead of the E-row window sort the flat frame paid, and
    * the adjacency groups in the same single pass. Node ids and the
    * edge count are then read off the NODE-sized adjacency (one small
    * collect) and a node-sized second pass rewrites ids to dense
    * indexes for the rounds. Per edge k = floor(r·w/wsum·10^12 + 0.5) —
    * the exact kOf(r*w/wsum) ops; GraphSpec equates this kernel against
    * the flat-frame shuffle dataflow bitwise. */
  private[graft] def pagerankKernelWeighted(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    // round 10.2: object-RDD adjacency, same rationale as the uniform
    // kernel — the Dataset persist paid ~10 cpu-s of UnsafeArrayData
    // encode and every round paid the matching decode
    val rawAdj = TextOps.memoRdd("q85b.adjRaw", s, dir) {
      val built = coPurchasePairs(s, dir)
        .as[(Long, Long)].rdd
        .mapPartitions { it =>
          // raw pairs arrive src-CLUSTERED (the repartition(src) the
          // pair builder already pays), and per order each (src,dst)
          // appears once (the (order,part) dedup upstream) — so the
          // multiplicity count w = #shared orders folds into the SAME
          // object-land pass that groups the adjacency. The Catalyst
          // groupBy(src,dst).count this replaces measured ~12 cpu-s of
          // partial+final UnsafeRow hash agg for node-sized output.
          final class E {
            val m = new java.util.HashMap[Long, Long]()
            var wsum = 0L
          }
          val bySrc = new java.util.HashMap[Long, E]()
          it.foreach { case (src, dst) =>
            var e = bySrc.get(src)
            if (e == null) { e = new E; bySrc.put(src, e) }
            e.m.put(dst, e.m.getOrDefault(dst, 0L) + 1L)
            e.wsum += 1L
          }
          import scala.jdk.CollectionConverters._
          bySrc.entrySet().iterator().asScala.map { kv =>
            val n = kv.getValue.m.size()
            val dsts = new Array[Long](n)
            val ws = new Array[Long](n)
            var i = 0
            val dit = kv.getValue.m.entrySet().iterator()
            while (dit.hasNext) {
              val de = dit.next(); dsts(i) = de.getKey; ws(i) = de.getValue; i += 1
            }
            (kv.getKey, kv.getValue.wsum, dsts, ws)
          }
        }.persist(org.apache.spark.storage.StorageLevel.MEMORY_ONLY)
      built.count() // materialize at the pair shuffle's parallelism
      built
    }
    // node ids + edge count off the node-sized adjacency — no second
    // E-row scan; srcs are globally unique (one partition owns a src)
    val meta = rawAdj.map(r => (r._1, r._3.length)).collect()
    val ids = meta.map(_._1).distinct.sorted
    val nEdges = meta.map(_._2.toLong).sum
    val n = ids.length.toLong
    val bIds = track(s.sparkContext.broadcast(ids))
    // dense-index rewrite persisted ONCE (a per-round rewrite view
    // measured ~0.35 s/round — the binary searches plus array realloc
    // dominate the rounds' own arithmetic), coalesced without shuffle
    // to the work-sized task count for the round passes
    val adjDense = TextOps.memoRdd("q85b.adj", s, dir) {
      val built = rawAdj.mapPartitions { it =>
        val idsL = bIds.value
        it.map { case (src, wsum, dsts, ws) =>
          (java.util.Arrays.binarySearch(idsL, src), wsum,
            dsts.map(d => java.util.Arrays.binarySearch(idsL, d)), ws)
        }
      }.persist(org.apache.spark.storage.StorageLevel.MEMORY_ONLY)
      built.count() // materialize at the raw cache's parallelism
      built
    }
    val adj = adjDense.coalesce(adjParts(s, nEdges))
    kernelRounds(s, ids, n, bR => adj.mapPartitions { it =>
      val rL = bR.value
      val acc = new Array[Long](rL.length)
      val touched = new Array[Long]((rL.length + 63) >> 6)
      it.foreach { case (si, wsum, dsts, ws) =>
        val rs = rL(si)
        if (!java.lang.Double.isNaN(rs)) {
          val wsumD = wsum.toDouble
          var i = 0
          while (i < dsts.length) {
            val k = math.floor(rs * ws(i) / wsumD * 1e12 + 0.5).toLong
            val d = dsts(i)
            acc(d) += k
            touched(d >> 6) |= 1L << (d & 63)
            i += 1
          }
        }
      }
      Iterator.range(0, rL.length)
        .filter(i => ((touched(i >> 6) >>> (i & 63)) & 1L) == 1L)
        .map(i => (i, acc(i)))
    }.toDF("i", "k"))
  }

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
  val q85_pagerank: Query = Query(
    s"""WITH op AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
       |     e AS (SELECT DISTINCT a.l_partkey AS src, b.l_partkey AS dst
       |           FROM op a JOIN op b
       |             ON a.l_orderkey = b.l_orderkey AND a.l_partkey <> b.l_partkey),
       |     deg AS (SELECT src, count(*) AS outdeg FROM e GROUP BY src),
       |     nn AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM deg),
       |     r0 AS (SELECT src AS node, 1.0e0 / (SELECT n FROM nn) AS r FROM deg),
       |     ${prRoundCtes("r.r / d.outdeg",
          k => s"e JOIN r${k - 1} r ON e.src = r.node JOIN deg d ON e.src = d.src")}
       |SELECT node, r AS pagerank FROM r$Rounds ORDER BY node""") { (s, dir) =>
    val edges = coPurchaseEdges(s, dir)
    val stat = graphStat("coPurchaseEdges", s, dir)
    val nEdges = stat.map(_._1).getOrElse(edges.count())
    val n = stat.map(_._2).getOrElse {
      val deg = nodeDegrees(edges).persist()
      try deg.count() finally deg.unpersist()
    }
    // below the gate: the round-10 kernel (see the kernel block above);
    // past it: the unchanged rank-shuffle dataflow — r/outdeg reads the
    // outdeg column already cached on the edge frame, giving the SAME
    // grid numerator as the once-per-node join form
    if (n <= NodeBroadcastLimit) pagerankKernelUniform(s, dir, edges, n, nEdges)
    else pagerankGated(edges, nodeDegrees(edges),
      kExprOf = r => kOf(r / col("outdeg")), 0L, knownN = Some(n))
  }

  /** WEIGHTED co-purchase edges (src, dst, w): w counts the orders
    * containing both parts (the edge's support). Same build discipline
    * as [[buildCoPurchaseEdges]] — the (src, dst) count reuses the src
    * repartition; src's total outgoing weight lives in the node-sized
    * [[weightSums]] table, not on the edges. */
  private[graft] def coPurchaseEdgesW(s: SparkSession, dir: String): DataFrame =
    TextOps.memo("coPurchaseEdgesW", s, dir) {
      // same single-pass window fold as [[coPurchaseEdges]]: wsum (the
      // src's total outgoing weight) folds onto the edge rows so q85b's
      // rounds need no per-round stats join either
      import org.apache.spark.sql.expressions.Window
      val out = coPurchasePairs(s, dir)
        .groupBy("src", "dst").agg(count(lit(1)).as("w"))
        .withColumn("wsum", sum(col("w")).over(Window.partitionBy("src")))
        .persist()
      recordGraphStats("coPurchaseEdgesW", s, dir, out)
      out
    }

  /** One row per node with its total outgoing edge weight — src-local
    * map-side-combinable sum riding the edge partitioning. */
  private[graft] def weightSums(edges: DataFrame): DataFrame =
    edges.groupBy(col("src").as("node")).agg(sum(col("w")).as("wsum"))

  /** Q85b — WEIGHTED PageRank: like [[q85_pagerank]] but each
    * neighbor's share of a node's rank is proportional to the edge's
    * co-purchase support (how many orders contained both parts) rather
    * than uniform — the form recommendation systems actually run, where
    * a pair bought together 50 times should pull harder than a one-off.
    * Same determinism discipline: integer weights are exact, the
    * contribution r·w/wsum is rounded to the 12-digit grid and summed
    * exactly (long numerators — see [[pagerankOf]]), so every
    * generation is bit-identical across engines and partitionings. Same
    * per-round dataflow and scale posture as q85 (only the rank table
    * shuffles; edge support w lives in the persisted edge frame, wsum
    * rides the rank table). */
  val q85b_weighted_pagerank: Query = Query(
    s"""WITH op AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
       |     ew AS (SELECT a.l_partkey AS src, b.l_partkey AS dst, count(*) AS w
       |            FROM op a JOIN op b
       |              ON a.l_orderkey = b.l_orderkey AND a.l_partkey <> b.l_partkey
       |            GROUP BY 1, 2),
       |     ws AS (SELECT src, sum(w) AS wsum FROM ew GROUP BY src),
       |     nn AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM ws),
       |     r0 AS (SELECT src AS node, 1.0e0 / (SELECT n FROM nn) AS r FROM ws),
       |     ${prRoundCtes("r.r * e.w / s.wsum",
          k => s"ew e JOIN r${k - 1} r ON e.src = r.node JOIN ws s ON e.src = s.src")}
       |SELECT node, r AS pagerank FROM r$Rounds ORDER BY node""") { (s, dir) =>
    // gate on the PART-table row count — a parquet-metadata-cheap UPPER
    // bound on the node count (nodes ⊆ parts), decidable before any
    // graph artifact is built: below it the kernel never touches the
    // flat weighted frame at all; past it the exact n comes with the
    // frame build as before
    if (t(s, dir, "part").count() <= NodeBroadcastLimit)
      pagerankKernelWeighted(s, dir)
    else {
      val edges = coPurchaseEdgesW(s, dir)
      val stat = graphStat("coPurchaseEdgesW", s, dir)
      val n = stat.map(_._2).getOrElse {
        val ws = weightSums(edges).persist()
        try ws.count() finally ws.unpersist()
      }
      // the unchanged rank-shuffle dataflow — w and wsum live on the
      // cached edge frame and the expression keeps the oracle's
      // (r*w)/wsum association exactly
      pagerankGated(edges, weightSums(edges),
        kExprOf = r => kOf(r * col("w") / col("wsum")), 0L, knownN = Some(n))
    }
  }

  /** The edge CTE block shared by every graph oracle: distinct (order,
    * part) incidences, self-joined into the symmetric co-purchase edge
    * list. */
  private val edgeCtes =
    """op AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
      |     e AS (SELECT DISTINCT a.l_partkey AS src, b.l_partkey AS dst
      |           FROM op a JOIN op b
      |             ON a.l_orderkey = b.l_orderkey AND a.l_partkey <> b.l_partkey)""".stripMargin

  /** Q88 — triangle counting with degree orientation (the classic
    * compact-forward algorithm): each undirected edge is oriented from
    * its lower-(degree, id) endpoint to the higher one, two-paths are
    * generated ONLY from each pivot's oriented out-neighbors, and a
    * triangle is counted exactly once — at its minimum-(degree, id)
    * vertex. Reports the triangle count, the oriented wedge count
    * (candidate volume), and the global clustering coefficient
    * 3·triangles / open wedges.
    *
    * Scale posture: orientation is THE standard scale trick for
    * triangle enumeration — the two-path fanout per pivot is its
    * oriented out-degree, which is O(sqrt(E)) for any graph (a
    * high-degree hub receives edges instead of emitting them), so
    * candidate volume is O(E^1.5) worst case instead of Σ deg².
    * Round-8: the candidates are COUNTED, never materialized — each
    * oriented edge (s, t) carries the sorted out-neighbor arrays of
    * both endpoints and a codegen'd merge-walk
    * ([[graft.functions.SortedLongIntersect]]) counts
    * |N⁺(s) ∩ N⁺(t)| in place (each triangle closes at exactly one
    * oriented edge under an acyclic orientation), so the E^1.5-sized
    * wedge stream of the join formulation never exists as rows: the
    * biggest dataflow is the E-row adjacency build + two node-keyed
    * equi-joins with arrays bounded by the O(√E) oriented out-degree.
    * The wedge-join form survives as [[trianglesWedgeJoin]], the
    * spec's independent recomputation. */
  val q88_triangles: Query = Query(
    s"""WITH $edgeCtes,
       |     und AS (SELECT src AS u, dst AS v FROM e WHERE src < dst),
       |     deg AS (SELECT src AS node, count(*) AS d FROM e GROUP BY src),
       |     orient AS (SELECT CASE WHEN da.d < db.d OR (da.d = db.d AND w.u < w.v)
       |                            THEN w.u ELSE w.v END AS s,
       |                       CASE WHEN da.d < db.d OR (da.d = db.d AND w.u < w.v)
       |                            THEN w.v ELSE w.u END AS t
       |                FROM und w JOIN deg da ON w.u = da.node
       |                           JOIN deg db ON w.v = db.node),
       |     wedge AS (SELECT o1.s, CASE WHEN o1.t < o2.t THEN o1.t ELSE o2.t END AS a,
       |                            CASE WHEN o1.t < o2.t THEN o2.t ELSE o1.t END AS b
       |               FROM orient o1 JOIN orient o2 ON o1.s = o2.s AND o1.t < o2.t),
       |     tri AS (SELECT count(*) AS n_triangles
       |             FROM wedge w JOIN und u ON w.a = u.u AND w.b = u.v),
       |     wn AS (SELECT count(*) AS n_wedges FROM wedge),
       |     opn AS (SELECT CAST(sum((d * (d - 1)) // 2) AS BIGINT) AS n_open
       |             FROM deg)
       |SELECT t.n_triangles, w.n_wedges,
       |       ${croundSql("3.0e0 * t.n_triangles / o.n_open")} AS global_cc
       |FROM tri t, wn w, opn o""") { (s, dir) =>
    // round 10: below the CSR gate the kernel (see [[trianglesKernel]]
    // and the [[TriangleCsrEdgeLimit]] trade note); past it the
    // intersect dataflow unchanged
    val e = coPurchaseEdges(s, dir)
    val nEdges = graphStat("coPurchaseEdges", s, dir).map(_._1)
      .getOrElse(e.count())
    if (nEdges <= TriangleCsrEdgeLimit) trianglesKernel(s, dir, e)
    else trianglesOf(e)
  }

  /** q88's Spark body — the adjacency-intersect form at every size:
    * paired same-JVM A/B puts it 2.2× ahead of the wedge join at
    * sf0.1 (4.1–4.8 s vs 9.2–10.7 s) AND ~3× ahead on the 23.9M-edge
    * 10× replica (19–21 s vs 58–76 s): it moves the same asymptotic
    * bytes (Σ outdeg⁺² longs as carried arrays ≡ the wedge stream's
    * rows) through 34× fewer rows, and the merge-walk replaces 410M
    * hash probes. The wedge-join form stays as the spec's independent
    * recomputation ([[trianglesWedgeJoin]]). */
  private[graft] def trianglesOf(e: DataFrame): DataFrame = trianglesIntersect(e)

  /** q88's below-gate KERNEL (round 10): the same compact-forward
    * merge-walk, with the oriented adjacency packed into a broadcast
    * CSR (indptr + int indices — 4 B/edge; gate and trade analysis at
    * [[TriangleCsrEdgeLimit]]) and the pivot sweep distributed over
    * index ranges. Rationale: the production intersect dataflow's
    * ~112 executor-cpu-s at sf0.1 is ~99% row machinery — the
    * collect_list ObjectHashAggregate, the exploded edges each CARRYING
    * their pivot's array through a shuffle (Σ outdeg⁺² longs encoded
    * AND decoded), and per-row UnsafeArrayData access in the codegen'd
    * intersect — while the merge-walk itself is ~400M int comparisons
    * ≈ well under 1 cpu-s on primitive arrays. The kernel does ONE
    * distributed pass over the oriented edges (local per-partition
    * grouping; partial per-pivot groups are fine — they merge at CSR
    * pack time on the driver, then each pivot's slice sorts once), and
    * counts triangles + oriented wedges in a parallelize()d sweep over
    * broadcast CSR slices. Pure integer counts — bit-determinism free;
    * GraphSpec equates kernel ≡ intersect ≡ wedge-join (both gate
    * sides) ≡ brute force. Past the gate the intersect dataflow is
    * unchanged (its shuffle-hash shape is the 100 TB path). */
  /** Distributed-group-then-pack of an oriented edge RDD into a driver
    * CSR (indptr, indices over dense node indexes). Exposed separately
    * from [[trianglesKernel]] so tools/ProbeCsrPack can measure the
    * REAL pack path's driver footprint at synthetic near-gate sizes —
    * the measurement [[TriangleCsrEdgeLimit]]'s budget is justified by. */
  private[graft] def packCsr(edges: org.apache.spark.rdd.RDD[(Long, Long)],
      bIds: org.apache.spark.broadcast.Broadcast[Array[Long]], n: Int)
      : (Array[Int], Array[Int]) = {
    val packedBlocks = edges
      .mapPartitions { it =>
        val idsL = bIds.value
        val m = new java.util.HashMap[Long, scala.collection.mutable.ArrayBuilder.ofInt]()
        it.foreach { case (sN, tN) =>
          var b = m.get(sN)
          if (b == null) { b = new scala.collection.mutable.ArrayBuilder.ofInt; m.put(sN, b) }
          b += java.util.Arrays.binarySearch(idsL, tN)
        }
        val srcsB = new scala.collection.mutable.ArrayBuilder.ofInt
        val lensB = new scala.collection.mutable.ArrayBuilder.ofInt
        val dstsB = new scala.collection.mutable.ArrayBuilder.ofInt
        val eIt = m.entrySet().iterator()
        while (eIt.hasNext) {
          val kv = eIt.next()
          val a = kv.getValue.result()
          srcsB += java.util.Arrays.binarySearch(idsL, kv.getKey)
          lensB += a.length
          dstsB ++= a
        }
        Iterator.single((srcsB.result(), lensB.result(), dstsB.result()))
      }.collect()
    // CSR pack on the driver — edge-sized, the budget the gate grants
    val indptr = new Array[Int](n + 1)
    packedBlocks.foreach { case (srcs, lens, _) =>
      var i = 0
      while (i < srcs.length) { indptr(srcs(i) + 1) += lens(i); i += 1 }
    }
    var i = 0
    while (i < n) { indptr(i + 1) += indptr(i); i += 1 }
    val indices = new Array[Int](indptr(n))
    val cursor = java.util.Arrays.copyOf(indptr, n)
    packedBlocks.foreach { case (srcs, lens, dsts) =>
      var j = 0
      var off = 0
      while (j < srcs.length) {
        System.arraycopy(dsts, off, indices, cursor(srcs(j)), lens(j))
        cursor(srcs(j)) += lens(j)
        off += lens(j)
        j += 1
      }
    }
    i = 0
    while (i < n) { // the merge-walk needs each slice sorted
      java.util.Arrays.sort(indices, indptr(i), indptr(i + 1)); i += 1
    }
    (indptr, indices)
  }

  private[graft] def trianglesKernel(s: SparkSession, dir: String,
      e: DataFrame): DataFrame = {
    import s.implicits._
    val ids = nodeIds(e)
    val n = ids.length
    val bIds = track(s.sparkContext.broadcast(ids))
    // one pass over the oriented edges: per-partition grouping, then
    // each partition ships ONE primitive-packed block (srcIdx[], len[],
    // concatenated dstIdx[]) — NO repartition; a pivot split across
    // partitions just yields partial runs in two blocks that merge at
    // pack time. Round 11 (VERDICT item 4 / ADVICE): the previous
    // boxed (Int, Array[Int])-tuple collect cost the driver a transient
    // several times the packed 4 B/edge budget (boxed tuple + per-src
    // array headers); the packed blocks are 4 B/edge + 8 B per
    // (partition-local distinct src), measured 10.0 B/edge total
    // transient incl. the final CSR at the synthetic gate ceiling
    // (tools/ProbeCsrPack — the number the 128M-edge gate's budget is
    // now justified by: 10.0 B/edge ≈ 1.28 GB driver at the ceiling).
    val (indptr, indices) = packCsr(orientOf(e).as[(Long, Long)].rdd, bIds, n)
    val bCsr = track(s.sparkContext.broadcast((indptr, indices)))
    // pivot sweep sized to the INTERSECT work (~Σ walk lengths), not the
    // node count — contiguous index ranges are fine under the degree
    // orientation (out-degrees are sqrt-bounded, no head pivot)
    val parts = math.max(1, math.min(4 * s.sparkContext.defaultParallelism,
      indices.length / 250000))
    val counts = s.sparkContext.parallelize(0 until n, parts)
      .mapPartitions { it =>
        val (ip, ix) = bCsr.value
        var tri = 0L
        var wed = 0L
        it.foreach { si =>
          val b0 = ip(si); val e0 = ip(si + 1); val len = e0 - b0
          wed += len.toLong * (len - 1) / 2
          var j = b0
          while (j < e0) {
            val ti = ix(j)
            var p = b0; var q = ip(ti); val qe = ip(ti + 1)
            while (p < e0 && q < qe) {
              val a = ix(p); val b = ix(q)
              if (a == b) { tri += 1; p += 1; q += 1 }
              else if (a < b) p += 1
              else q += 1
            }
            j += 1
          }
        }
        Iterator((tri, wed))
      }.toDF("tri", "wed")
    val tw = counts.agg(coalesce(sum(col("tri")), lit(0L)).as("n_triangles"),
      coalesce(sum(col("wed")), lit(0L)).as("n_wedges"))
    val opn = nodeDegrees(e).agg(coalesce(
      sum(expr("outdeg * (outdeg - 1) DIV 2")), lit(0L)).as("n_open"))
    tw.crossJoin(opn)
      .select(col("n_triangles"), col("n_wedges"),
        // same documented NULL-when-no-open-wedges as trianglesIntersect
        when(col("n_open") > 0,
          cround(lit(3.0) * col("n_triangles") / col("n_open"))).as("global_cc"))
  }

  /** Degree-oriented directed edges (s, t): each undirected (u < v)
    * edge oriented from its lower-(degree, id) endpoint. du rides the
    * widened edge frame (outdeg = degree of src); only the dst side's
    * degree needs the node-sized join. The coalesce is a nullability
    * cast only (part keys are never null, but the parquet schema says
    * nullable and the sorted-intersect expression requires
    * array<bigint NOT NULL> elements downstream). */
  private def orientOf(e: DataFrame): DataFrame = {
    val deg = nodeDegrees(e)
    val undD = e.filter(col("src") < col("dst"))
      .select(col("src").as("u"), col("dst").as("v"), col("outdeg").as("du"))
    val db = deg.select(col("node").as("v"), col("outdeg").as("dv"))
    val fwd = col("du") < col("dv") || (col("du") === col("dv") && col("u") < col("v"))
    undD.join(db, "v")
      .select(coalesce(when(fwd, col("u")).otherwise(col("v")), lit(-1L)).as("s"),
        coalesce(when(fwd, col("v")).otherwise(col("u")), lit(-1L)).as("t"))
  }

  /** The adjacency-intersect compact-forward form: per oriented edge
    * (s, t), count |N⁺(s) ∩ N⁺(t)| with the codegen'd sorted
    * merge-walk; under an acyclic orientation every triangle has
    * exactly one node with two out-edges, and it is counted at the
    * out-edge toward that wedge's closing endpoint — once. The wedge
    * count Σ C(outdeg⁺, 2) and the open-wedge denominator come from
    * the node-sized degree frames, so nothing wedge-ROW-sized is
    * materialized — but the exploded edges each CARRY their pivot's
    * array, so the adjacency-attach exchange still moves Σ outdeg⁺²
    * longs. Those are the same asymptotic bytes the wedge stream moves
    * as rows, through ~34× fewer of them — which is why round 8 made
    * this the ONLY production path at every size (2.2× at sf0.1, ~3×
    * at 23.9M edges); [[trianglesWedgeJoin]] survives as the spec's
    * independent recomputation. GraphSpec equates it against brute
    * force and against the wedge join on both of the latter's gate
    * sides. */
  private[graft] def trianglesIntersect(e: DataFrame): DataFrame = {
    import graft.functions.SortedLongIntersect.sortedIntersect
    val orient = orientOf(e)
    val adj = orient.groupBy("s").agg(sort_array(collect_list(col("t"))).as("nbrs"))
    // re-derive the oriented edges by exploding the adjacency arrays:
    // N⁺(s) comes attached for free instead of via a second join
    val edgesNs = adj.select(col("s"), col("nbrs").as("ns"), explode(col("nbrs")).as("t"))
    // SHUFFLE_HASH on the node-sized adjacency side: a sort-merge join
    // would SORT the exploded array-carrying stream (the rawJaccard /
    // q88-wedge 16 GB-sort-spill lesson); the hash build side is the
    // adjacency table, which shrinks with partition count
    val withT = edgesNs.join(
      adj.select(col("s").as("t"), col("nbrs").as("nt")).hint("shuffle_hash"),
      Seq("t"), "left")
    // outer coalesce: sum() over zero rows is NULL, but the empty graph
    // must report 0 triangles / 0 wedges like the count()-based form and
    // the SQL oracle do (round-8 advice)
    val tri = withT.agg(coalesce(
      sum(coalesce(sortedIntersect(col("ns"), col("nt")), lit(0L))), lit(0L))
      .as("n_triangles"))
    val wn = adj.agg(coalesce(
      sum(expr("CAST(size(nbrs) AS BIGINT) * (size(nbrs) - 1) DIV 2")), lit(0L))
      .as("n_wedges"))
    val opn = nodeDegrees(e).agg(coalesce(
      sum(expr("outdeg * (outdeg - 1) DIV 2")), lit(0L)).as("n_open"))
    tri.crossJoin(wn).crossJoin(opn)
      .select(col("n_triangles"), col("n_wedges"),
        // a graph with NO open wedges has an undefined clustering
        // coefficient: documented empty-case value NULL (ANSI division
        // by zero would abort the job — the empty-aggregate class,
        // EmptyInputSpec); any graph with >= 1 edge has n_open >= 1
        when(col("n_open") > 0,
          cround(lit(3.0) * col("n_triangles") / col("n_open"))).as("global_cc"))
  }

  /** The wedge-JOIN formulation (materialize two-paths, close them
    * against the edge set), parameterized on the closure-check
    * broadcast gate — kept as the spec's independent recomputation of
    * [[trianglesOf]] and as the documented shape for engines without a
    * fused array intersect. `knownEdges` is the edge count from the
    * memo-build action ([[graphStat]]) — without it the gate pays its
    * own (cheap, cache-backed) count job. */
  private[graft] def trianglesWedgeJoin(e: DataFrame, broadcastLimit: Long,
      knownEdges: Option[Long] = None): DataFrame = {
    val und = e.filter(col("src") < col("dst")).select(col("src").as("u"), col("dst").as("v"))
    val deg = nodeDegrees(e)
    val orient = orientOf(e)
    val o1 = orient.select(col("s"), col("t").as("t1"))
    val o2 = orient.select(col("s"), col("t").as("t2"))
    val wedge = o1.join(o2, "s").filter(col("t1") < col("t2"))
      .select(least(col("t1"), col("t2")).as("a"), greatest(col("t1"), col("t2")).as("b"))
    // closure check: if the edge key set fits the broadcast gate, ship
    // it to the W-sized wedge stream (W >> E — 41M wedges vs 750k edges
    // at sf0.1) so the wedges never shuffle and the count partial-
    // aggregates map-side; past the gate the check degrades to a plain
    // shuffle equi-join on (a, b) — the q28 runtime-size-gate pattern,
    // with the W-vs-E asymmetry deciding the broadcast side. The count
    // is free: the edge frame is already persisted and counted by the
    // memoizer.
    // ONE pass over the wedge stream (the dominant O(E^1.5)-worst-case
    // term): a LEFT join against the edge key set — unique per (u, v),
    // so at most one match per wedge — counts triangles (matched) and
    // wedges (all) in the same aggregation instead of enumerating the
    // wedges twice for the two counts.
    // Past the gate the edge side carries the SHUFFLE_HASH hint (the
    // rawJaccard posture): a sort-merge join would SORT the W-sized
    // wedge stream — measured 16 GB of sort spill at a 24M-edge /
    // 410M-wedge scale probe — while the hash build side is the
    // compact edge keys, shrinking with partition count.
    val counts = wedge.join(
      if (knownEdges.getOrElse(e.count()) <= broadcastLimit) broadcast(und)
      else und.hint("shuffle_hash"),
      col("a") === col("u") && col("b") === col("v"), "left")
      .agg(count(col("u")).as("n_triangles"), count(lit(1)).as("n_wedges"))
    val opn = deg.agg(sum(expr("outdeg * (outdeg - 1) DIV 2")).as("n_open"))
    counts.crossJoin(opn)
      .select(col("n_triangles"), col("n_wedges"),
        // same documented NULL-when-no-open-wedges as trianglesIntersect
        when(col("n_open") > 0,
          cround(lit(3.0) * col("n_triangles") / col("n_open"))).as("global_cc"))
  }

  /** Q90 — single-source shortest paths (hop distance, 4 synchronous
    * relaxation rounds) from the minimum part id. Each round is the
    * min-plus step: dist' = min of the node's own distance and
    * (neighbor distance + 1) — pure integer arithmetic, so the result
    * is exactly deterministic with no rounding discipline needed. The
    * oracle unrolls the same 4 rounds as chained CTEs.
    *
    * Scale posture: the FIXED round count unrolls into one lazy plan
    * exactly like q98 (round-8 — this was the last graph query still
    * paying [[Iterate]]'s per-round persist/count barriers for a
    * round count that is not data-dependent; on a real cluster each
    * barrier is a full-cluster sync). The (own dist ∪ mail) double
    * reference is restated so each generation is referenced ONCE: real
    * edges carry increment 1 and per-node SELF-LOOPS carry increment 0,
    * so a reached node's own distance re-enters the min as its
    * self-mail and the unrolled plan stays linear in rounds. Below the
    * node gate each round is a broadcast map stage over the edge cache;
    * past it the mail join rides the bare edge partitioning with q98's
    * lazy per-generation persist. A full-diameter SSSP (data-dependent
    * rounds) would keep the Iterate driver-loop discipline like q37. */
  /** Shared below-gate MIN-PROPAGATION kernel (round 10): q90 (SSSP,
    * mail = dist+1) and q98 (label propagation, mail = lbl+0) run the
    * same 4 synchronous rounds of v[d] ← min(v[d], min over in-edges of
    * v[src]+inc) — pure integer min, so bit-determinism is free. Below
    * the node gate the value vector already crosses the driver (the
    * budget broadcasting it means), so the rounds run over the SAME
    * object-RDD adjacency as [[pagerankKernelUniform]] ([[adjacencyUniform]],
    * memoized: one build serves all three queries in a session):
    * each round is a mapPartitions folding mins into a dense long array
    * (Long.MaxValue = unreached/absent — no mail sent, none recorded),
    * partition 0 seeding the OWN values (min is idempotent, but seeding
    * once keeps partials touched-sized instead of n-sized per
    * partition); rounds 1..3 merge node-sized mins on the driver, the
    * final round stays distributed through the same groupBy(i).min so
    * the output plan ends in-cluster (the [[kernelRounds]] discipline).
    * Past the gate the callers keep their measured mail-shuffle
    * dataflows ([[ssspGated]]/[[labelPropGated]], round-9 ProbeGraphGate
    * evidence) — the kernel replaces only the below-gate regime, where
    * the round-10 profile showed codec and scheduling constants, not
    * arithmetic, dominating node-sized rounds. GraphSpec equates the
    * kernel against both Catalyst dataflows and the sequential replays. */
  private[graft] def minPropKernel(s: SparkSession, dir: String,
      edges: DataFrame, nEdges: Long, ids: Array[Long],
      init: Int => Long, inc: Int): DataFrame = {
    import s.implicits._
    val adj = adjacencyUniform(s, dir, edges, ids).coalesce(adjParts(s, nEdges))
    val n = ids.length
    def partials(bV: org.apache.spark.broadcast.Broadcast[Array[Long]]) =
      adj.mapPartitionsWithIndex { (pi, it) =>
        val vL = bV.value
        val acc = emptyAcc(n)
        val touched = new Array[Long]((n + 63) >> 6)
        if (pi == 0) {
          var i = 0
          while (i < n) {
            if (vL(i) != Long.MaxValue) {
              acc(i) = vL(i); touched(i >> 6) |= 1L << (i & 63)
            }
            i += 1
          }
        }
        it.foreach { case (si, _, dsts) =>
          val sv = vL(si)
          if (sv != Long.MaxValue) {
            val m = sv + inc
            var i = 0
            while (i < dsts.length) {
              val d = dsts(i)
              if (m < acc(d)) { acc(d) = m; touched(d >> 6) |= 1L << (d & 63) }
              i += 1
            }
          }
        }
        Iterator.range(0, n)
          .filter(i => ((touched(i >> 6) >>> (i & 63)) & 1L) == 1L)
          .map(i => (i, acc(i)))
      }
    var v = Array.tabulate(n)(init)
    for (_ <- 1 until 4) { // rounds 1-3: node-sized driver merges
      val bV = s.sparkContext.broadcast(v)
      // primitive-packed merge collect (see [[collectPackedIntLong]] —
      // the typed Tuple2 collect this replaced measured ~683 B/node of
      // transient driver heap at the 4M-node gate ceiling)
      val blocks = collectPackedIntLong(partials(bV).toDF("i", "v")
        .groupBy("i").agg(min(col("v")).as("v")))
      val nv = Array.fill(n)(Long.MaxValue)
      blocks.foreach { case (is, vs) =>
        var j = 0
        while (j < is.length) { nv(is(j)) = vs(j); j += 1 }
      }
      bV.destroy()
      v = nv
    }
    // round 4 stays distributed so the output plan ends in-cluster
    // (the kernelRounds discipline); idOf maps dense indexes back to
    // node ids in the same pass
    val bIds = track(s.sparkContext.broadcast(ids))
    val idOf = udf((i: Int) => bIds.value(i))
    partials(track(s.sparkContext.broadcast(v))).toDF("i", "v")
      .groupBy("i").agg(min(col("v")).as("v"))
      .select(idOf(col("i")).as("node"), col("v"))
      .orderBy("node")
  }

  /** A fresh MaxValue-filled accumulator (Arrays.fill beats
    * Array.fill's per-element closure on multi-million-slot arrays). */
  private def emptyAcc(n: Int): Array[Long] = {
    val a = new Array[Long](n)
    java.util.Arrays.fill(a, Long.MaxValue)
    a
  }

  val q90_sssp: Query = {
    def roundCte(k: Int): String =
      s"""d$k AS (SELECT node, min(dist) AS dist FROM (
         |        SELECT node, dist FROM d${k - 1}
         |        UNION ALL
         |        SELECT e.dst AS node, d.dist + 1 AS dist
         |        FROM e JOIN d${k - 1} d ON e.src = d.node) u
         |        GROUP BY node)""".stripMargin
    Query(
      s"""WITH $edgeCtes,
         |     d0 AS (SELECT min(src) AS node, 0 AS dist FROM e),
         |     ${(1 to 4).map(roundCte).mkString(",\n")}
         |SELECT node, dist FROM d4 ORDER BY node""") { (s, dir) =>
      // round 10: below the node gate, the shared min-propagation
      // KERNEL over the object-RDD adjacency (see [[minPropKernel]]);
      // past it, the round-9 mail-shuffle default — the measured winner
      // for the min-propagation rounds among the CATALYST dataflows in
      // both methodologies (ProbeGraphGate steady-state 3.4-3.7 s vs
      // 4.6-5.0 broadcast, bench-style 3.2 vs 3.7) and the
      // 1000-executor posture (mail moves once to the persisted edge
      // partitioning instead of through a per-round driver collect)
      val edges = coPurchaseEdges(s, dir)
      val stat = graphStat("coPurchaseEdges", s, dir)
      val n = stat.map(_._2).getOrElse(
        edges.select("src").distinct().count())
      if (n <= NodeBroadcastLimit) {
        val nEdges = stat.map(_._1).getOrElse(edges.count())
        val ids = nodeIds(edges)
        // ids are sorted ascending, so the min-id source is index 0
        minPropKernel(s, dir, edges, nEdges, ids,
          init = i => if (i == 0) 0L else Long.MaxValue, inc = 1)
          .select(col("node"), col("v").cast("int").as("dist"))
          .orderBy("node")
      } else ssspGated(s, dir, 0L)
    }
  }

  /** q90's dataflow with the broadcast gate exposed (GraphSpec forces
    * both sides and equates them, the q98 pattern). */
  private[graft] def ssspGated(s: SparkSession, dir: String,
      broadcastLimit: Long): DataFrame = {
    val edges = coPurchaseEdges(s, dir).select("src", "dst")
    // min node id and node count came free with the edge-memo action
    val stat = graphStat("coPurchaseEdges", s, dir)
    val source = stat.map(_._3).getOrElse {
      // same empty-aggregate guard as recordGraphStats: NULL min (no
      // edges) becomes the inert MaxValue sentinel, so an empty graph
      // yields an EMPTY distance table (documented: no source exists)
      val r = edges.agg(min(col("src"))).first()
      if (r.isNullAt(0)) Long.MaxValue else r.getLong(0)
    }
    // INVARIANT (round-8 advice): the node universe is derived from the
    // src column alone, and the broadcast branch's 0-increment self-loop
    // union below relies on it covering every reachable node — both hold
    // ONLY because [[coPurchaseEdges]] emits both directions of every
    // edge (src and dst column sets are identical). An asymmetric edge
    // frame would silently drop a reached-but-srcless node's distance;
    // derive nodes from union(src, dst) before reusing this dataflow on
    // a directed graph.
    val nodes = edges.select(col("src").as("node")).distinct()
    val n = stat.map(_._2).getOrElse(nodes.count())
    import s.implicits._
    var cur = Seq((source, 0)).toDF("node", "dist")
    if (n <= broadcastLimit) {
      // self-loops with increment 0: min(own, mail+1) without a second
      // reference to the generation (the q98 union-linearization, with
      // the increment column carrying the "+1 only for real edges" rule)
      val edgesPlus = edges.select(col("src"), col("dst"), lit(1).as("inc"))
        .unionByName(nodes.select(col("node").as("src"), col("node").as("dst"),
          lit(0).as("inc")))
      for (_ <- 1 to 4) {
        val m = broadcast(cur)
        cur = edgesPlus.join(m, edgesPlus("src") === m("node"))
          .select(col("dst").as("node"), (col("dist") + col("inc")).as("dist"))
          .groupBy("node").agg(min(col("dist")).as("dist"))
      }
    } else {
      // past the gate: bare persisted edge partitioning + q98's lazy
      // per-generation persist for the double reference
      for (round <- 1 to 4) {
        val c = TextOps.memo(s"q90.gen$round", s, dir)(cur.persist())
        cur = c.unionByName(
          edges.join(c, edges("src") === c("node"))
            .select(col("dst").as("node"), (col("dist") + 1).as("dist")))
          .groupBy("node").agg(min(col("dist")).as("dist"))
      }
    }
    cur.orderBy("node")
  }

  /** Q98 — community detection by bounded synchronous min-label
    * propagation: every node starts labeled with its own id, and each of
    * the 4 rounds relabels a node with the minimum label among itself
    * and its in-neighbors. After k rounds a node carries the minimum
    * node id within its k-hop neighborhood — the standard label-
    * propagation community signal (and, run to convergence, exactly
    * connected components; q37's union-find posture is the
    * to-convergence form, this is the bounded-round one a scheduled
    * pipeline runs). Pure integer min-arithmetic: deterministic with no
    * rounding discipline, like q90. The oracle unrolls the same 4
    * rounds as chained CTEs.
    *
    * Scale posture: the node-sized label table joins the persisted
    * src-partitioned edge cache each round (only labels shuffle, never
    * edges) and min() partial-aggregates map-side. Unlike q90 (whose
    * frontier is data-dependent and keeps the [[Iterate]] discipline),
    * the FIXED round count here unrolls into one lazy plan with zero
    * per-round actions — below the node gate each round is a broadcast
    * map stage over edges ∪ self-loops; past it the mail join rides the
    * bare edge partitioning and a lazy per-generation persist makes the
    * (own ∪ mail) double reference compute once. Bounded rounds =
    * bounded barriers — and after the unroll, ONE barrier total. */
  val q98_label_prop: Query = {
    def roundCte(k: Int): String =
      s"""l$k AS (SELECT node, min(lbl) AS lbl FROM (
         |        SELECT node, lbl FROM l${k - 1}
         |        UNION ALL
         |        SELECT e.dst AS node, l.lbl AS lbl
         |        FROM e JOIN l${k - 1} l ON e.src = l.node) u
         |        GROUP BY node)""".stripMargin
    Query(
      s"""WITH $edgeCtes,
         |     l0 AS (SELECT DISTINCT src AS node, src AS lbl FROM e),
         |     ${(1 to 4).map(roundCte).mkString(",\n")}
         |SELECT node, lbl AS community FROM l4 ORDER BY node""") { (s, dir) =>
      // round 10: below the node gate, the shared min-propagation
      // KERNEL (labels propagate with increment 0; see
      // [[minPropKernel]]); past it, the round-9 mail-shuffle default —
      // winner among the Catalyst dataflows in both methodologies like
      // q90 (ProbeGraphGate steady-state 3.8-4.2 s vs 4.9-5.4
      // broadcast, bench-style 3.7 vs 4.0; see the pagerankOf note)
      val edges = coPurchaseEdges(s, dir)
      val stat = graphStat("coPurchaseEdges", s, dir)
      val n = stat.map(_._2).getOrElse(
        edges.select("src").distinct().count())
      if (n <= NodeBroadcastLimit) {
        val nEdges = stat.map(_._1).getOrElse(edges.count())
        val ids = nodeIds(edges)
        minPropKernel(s, dir, edges, nEdges, ids,
          init = i => ids(i), inc = 0)
          .select(col("node"), col("v").as("community"))
          .orderBy("node")
      } else labelPropGated(s, dir, 0L)
    }
  }

  /** q98's dataflow with the broadcast gate exposed (GraphSpec forces
    * both sides and equates them, the q85 fallback-test pattern).
    *
    * ROUNDS UNROLLED into one lazy plan (the q85 discipline): a FIXED
    * 4-round count needs none of Iterate.loop's per-round persist/count
    * barriers — on a real cluster each barrier is a full-cluster sync,
    * and locally the 4 extra jobs were most of q98's wall.
    * distinct(src) rides the persisted src partitioning (no exchange),
    * so nodes is a local agg scan per use. */
  private[graft] def labelPropGated(s: SparkSession, dir: String,
      broadcastLimit: Long): DataFrame = {
    val edges = coPurchaseEdges(s, dir).select("src", "dst")
    val nodes = edges.select(col("src").as("node")).distinct()
    val init = nodes.select(col("node"), col("node").as("lbl"))
    // graph metadata (the q85 gate precedent) — free from the edge-memo
    // action when this session built the memo ([[graphStat]])
    val n = graphStat("coPurchaseEdges", s, dir).map(_._2).getOrElse(nodes.count())
    var cur = init
    for (round <- 1 to 4) {
      cur =
        if (n <= broadcastLimit) {
          // below the gate: the oracle's (own label ∪ mail) min is
          // restated as mail over edges ∪ SELF-LOOPS so each
          // generation is referenced exactly ONCE and the unrolled
          // plan stays linear in rounds (the union form references it
          // twice → 2^k subplans); the union costs nothing here
          // because the whole mail join is a broadcast map stage
          val edgesPlus = edges.unionByName(
            nodes.select(col("node").as("src"), col("node").as("dst")))
          val m = broadcast(cur)
          edgesPlus.join(m, edgesPlus("src") === m("node"))
            .select(col("dst").as("node"), col("lbl"))
            .groupBy("node").agg(min(col("lbl")).as("lbl"))
        } else {
          // past the gate: keep the mail join on the BARE persisted
          // edge frame (a union would discard its src partitioning
          // and re-exchange edge-sized data every round); the second
          // reference to the generation is made safe by a LAZY
          // persist — within the one final action each generation
          // computes once and its cache serves both references, with
          // no extra job and no barrier. Memoized (not bare-persisted)
          // so repeated session calls reuse the generations instead of
          // accumulating orphaned blocks, and resetCaches covers them.
          val c = TextOps.memo(s"q98.gen$round", s, dir)(cur.persist())
          c.unionByName(
            edges.join(c, edges("src") === c("node"))
              .select(col("dst").as("node"), col("lbl")))
            .groupBy("node").agg(min(col("lbl")).as("lbl"))
        }
    }
    cur.select(col("node"), col("lbl").as("community")).orderBy("node")
  }

  val all: Map[String, Query] = Map(
    "q85_pagerank" -> q85_pagerank,
    "q85b_weighted_pagerank" -> q85b_weighted_pagerank,
    "q88_triangles" -> q88_triangles,
    "q90_sssp" -> q90_sssp,
    "q98_label_prop" -> q98_label_prop)
}
