package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.engine.Tables
import graft.ops.Iterate

/** Text-analysis + deduplication surface over the `documents` table
  * (SURVEY.md §2.10 and the training-data-pipeline operators).
  *
  * Normalization shared by every operator: lowercase, collapse
  * whitespace, trim. All heuristics (language-ID markers, quality
  * formula, fingerprint hash) are pure arithmetic over the normalized
  * text so the DuckDB oracle can reproduce them bit-for-bit.
  *
  * Scale posture: the only quadratic-risk operator is the shingle
  * self-join in q25; its 100 TB path is q26 (MinHash+LSH banding), which
  * produces the same verified output with candidate generation bounded by
  * band-bucket sizes instead of raw shingle frequency.
  */
object TextOps {

  private def docs(s: SparkSession, dir: String): DataFrame = Tables.table(s, dir, "documents")

  /** lower + collapse whitespace + trim; identical to the oracle's
    * trim(regexp_replace(lower(text), '\s+', ' ', 'g')). */
  private[graft] val normExpr = "trim(regexp_replace(lower(text), '\\\\s+', ' '))"
  private def norm: Column = expr(normExpr)
  private val normSql = """trim(regexp_replace(lower(text), '\s+', ' ', 'g'))"""

  /** Number of non-overlapping occurrences of `pat` in ' '||norm||' '.
    * replace() is leftmost-non-overlapping in both engines. */
  private def hitsExpr(pat: String): String =
    s"CAST((length(padded) - length(replace(padded, ' $pat '))) / ${pat.length + 2} AS INT)"
  private def hitsSql(pat: String): String =
    s"CAST((length(padded) - length(replace(padded, ' $pat ', ''))) / ${pat.length + 2} AS INT)"

  /** Q16 — exact deduplication accounting per source: total docs vs
    * distinct normalized texts (hash-groupBy dedup; SURVEY §2.10). */
  val q16_dedup_exact: Query = Query(
    s"""SELECT source,
       |       count(*) AS n_docs,
       |       count(DISTINCT $normSql) AS n_distinct,
       |       count(DISTINCT substring($normSql, 1, 64)) AS n_distinct_prefix
       |FROM documents
       |GROUP BY source
       |ORDER BY source""") { (s, dir) =>
    docs(s, dir)
      .select(col("source"), norm.as("norm"))
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"),
        countDistinct(col("norm")).as("n_distinct"),
        countDistinct(substring(col("norm"), 1, 64)).as("n_distinct_prefix"))
      .orderBy("source")
  }

  /** Q18b — top-5 terms per language by frequency (tokenize → explode →
    * count → ranked window). */
  val q18b_top_terms: Query = Query(
    s"""WITH tok AS (SELECT lang, unnest(string_split($normSql, ' ')) AS w FROM documents),
       |     cnt AS (SELECT lang, w, count(*) AS n FROM tok WHERE length(w) >= 4 GROUP BY 1, 2),
       |     rk AS (SELECT lang, w, n,
       |                   CAST(row_number() OVER (PARTITION BY lang ORDER BY n DESC, w) AS INT) AS rn
       |            FROM cnt)
       |SELECT lang, rn, w, n FROM rk WHERE rn <= 5
       |ORDER BY lang, rn""") { (s, dir) =>
    import org.apache.spark.sql.expressions.Window
    val tok = docs(s, dir)
      .select(col("lang"), explode(split(norm, " ")).as("w"))
      .filter(length(col("w")) >= 4)
    val cnt = tok.groupBy("lang", "w").agg(count(lit(1)).as("n"))
    val w = Window.partitionBy("lang").orderBy(col("n").desc, col("w"))
    cnt.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 5)
      .select("lang", "rn", "w", "n")
      .orderBy("lang", "rn")
  }

  /** Q70 — per-language top-5 terms via the frequent-items SKETCH
    * (approx_top_k = DataSketches ItemsSketch), q18b's approximate twin
    * and the missing member of the sketch family (q06b HLL distinct,
    * q38b GK percentiles). The scale argument is the whole point: q18b's
    * exact form shuffles the ENTIRE (lang, w) token stream into a
    * count aggregation, while the sketch keeps a bounded 8192-item
    * summary per group that merges map-side — at 100 TB the exchange
    * carries kilobytes of sketch per partition instead of terabytes of
    * tokens. With vocabulary ≤ the tracked capacity the counts are
    * exact (no evictions ever happen) and BpeSpec-style gating applies:
    * DedupSpec asserts every returned count equals the exact count and
    * the returned 5 are a valid top-5 (tie-agnostic — the sketch's
    * tie order within equal counts is not the lexicographic one q18b
    * pins, which is why this is no_oracle). */
  val q70_topk_sketch: Query = Query.noOracle { (s, dir) =>
    docs(s, dir)
      .select(col("lang"), explode(split(norm, " ")).as("w"))
      .filter(length(col("w")) >= 4)
      .groupBy("lang")
      .agg(expr("approx_top_k(w, 5, 8192)").as("tk"))
      .select(col("lang"), explode(col("tk")).as("e"))
      .select(col("lang"), col("e.item").as("w"), col("e.count").as("n"))
      .orderBy(col("lang"), col("n").desc, col("w"))
  }

  /** Marker words per language for the stopword language-ID heuristic. */
  private val langMarkers: Seq[(String, Seq[String])] = Seq(
    "de" -> Seq("der", "und", "die"),
    "en" -> Seq("the", "a", "of"),
    "es" -> Seq("el", "los", "y"),
    "fr" -> Seq("le", "la", "et"),
    "zh" -> Seq("de", "shi", "le"))

  /** Q21 — stopword/marker-based language identification: score each
    * language by marker-token hits, argmax with lexicographic tiebreak,
    * 'und' when no marker fires. Confusion matrix vs the labeled lang. */
  val q21_lang_id: Query = {
    val scoreSqls = langMarkers.map { case (l, ms) =>
      l -> ms.map(hitsSql).mkString(" + ")
    }
    val scoreExprs = langMarkers.map { case (l, ms) =>
      l -> ms.map(hitsExpr).mkString(" + ")
    }
    def argmax(scores: Seq[(String, String)]): String = {
      // pred = first lang (asc) whose score equals the max and > 0
      val maxExpr = s"greatest(${scores.map(_._2).mkString(", ")})"
      val cases = scores.map { case (l, e) => s"WHEN ($e) = mx THEN '$l'" }.mkString(" ")
      s"CASE WHEN mx <= 0 THEN 'und' $cases END"
    }
    val sql =
      s"""WITH p AS (SELECT lang, ' ' || $normSql || ' ' AS padded FROM documents),
         |     sc AS (SELECT lang, padded,
         |                   greatest(${scoreSqls.map(s => s"(${s._2})").mkString(", ")}) AS mx
         |            FROM p)
         |SELECT lang, ${argmax(scoreSqls)} AS pred, count(*) AS n
         |FROM sc GROUP BY 1, 2 ORDER BY lang, pred""".stripMargin
    Query(sql) { (s, dir) =>
      val padded = docs(s, dir).select(col("lang"), concat(lit(" "), norm, lit(" ")).as("padded"))
      val sc = padded.withColumn("mx",
        greatest(scoreExprs.map(e => expr(s"(${e._2})")): _*))
      sc.withColumn("pred", expr(argmax(scoreExprs)))
        .groupBy("lang", "pred").agg(count(lit(1)).as("n"))
        .orderBy("lang", "pred")
    }
  }

  /** Shared per-document quality signals (doc_id, source, n_tok,
    * avg_tok_len, stop_ratio, all unrounded) — the single source of truth
    * for q22 scoring and q63 curation, so the two can't drift. Pure
    * per-row maps, no shuffle. */
  private[graft] def qualitySignals(s: SparkSession, dir: String): DataFrame = {
    val p = docs(s, dir).select(col("doc_id"), col("source"), norm.as("norm"),
      concat(lit(" "), norm, lit(" ")).as("padded"))
    val stopHits = expr(Seq("the", "a", "of", "and").map(hitsExpr).mkString(" + "))
    p.select(
      col("doc_id"), col("source"),
      size(split(col("norm"), " ")).as("n_tok"),
      (length(regexp_replace(col("norm"), " ", "")) * lit(1.0)
        / size(split(col("norm"), " "))).as("avg_tok_len"),
      (stopHits * lit(1.0) / size(split(col("norm"), " "))).as("stop_ratio"))
  }

  /** Composite quality in [0,1] over [[qualitySignals]] columns,
    * canonically rounded so rank ties are engine-stable. */
  private[graft] def qualityCol: Column =
    cround(lit(0.4) * least(lit(1.0), col("n_tok") / 100.0)
      + lit(0.3) * least(lit(1.0), col("avg_tok_len") / 8.0)
      + lit(0.3) * least(lit(1.0), col("stop_ratio") * 5.0))

  /** Oracle twin of [[qualitySignals]]: CTEs `p` and `f` (f carries
    * doc_id, source, n_tok, avg_tok_len, stop_ratio). */
  private val qualitySignalsSql: String =
    s"""p AS (SELECT doc_id, source, $normSql AS norm, ' ' || $normSql || ' ' AS padded
       |           FROM documents),
       |     f AS (SELECT doc_id, source,
       |                  CAST(len(string_split(norm, ' ')) AS INT) AS n_tok,
       |                  length(replace(norm, ' ', '')) * 1e0
       |                    / len(string_split(norm, ' ')) AS avg_tok_len,
       |                  (${Seq("the", "a", "of", "and").map(hitsSql).mkString(" + ")}) * 1e0
       |                    / len(string_split(norm, ' ')) AS stop_ratio
       |           FROM p)"""

  /** Oracle twin of [[qualityCol]]. */
  private val qualityColSql: String =
    """floor((0.4e0 * least(1e0, n_tok / 100e0)
      |           + 0.3e0 * least(1e0, avg_tok_len / 8e0)
      |           + 0.3e0 * least(1e0, stop_ratio * 5e0)) * 10000 + 0.5e0) / 10000"""
      .stripMargin

  /** Q22 — per-document quality scoring: token count, mean token length,
    * stopword ratio, composite quality in [0,1]. */
  val q22_quality_score: Query = Query(
    s"""WITH $qualitySignalsSql
       |SELECT doc_id, n_tok,
       |       floor(avg_tok_len * 10000 + 0.5e0) / 10000 AS avg_tok_len,
       |       floor(stop_ratio * 10000 + 0.5e0) / 10000 AS stop_ratio,
       |       $qualityColSql AS quality
       |FROM f
       |ORDER BY doc_id""") { (s, dir) =>
    qualitySignals(s, dir).select(
      col("doc_id"), col("n_tok"),
      cround(col("avg_tok_len")).as("avg_tok_len"),
      cround(col("stop_ratio")).as("stop_ratio"),
      qualityCol.as("quality"))
      .orderBy("doc_id")
  }

  /** Q63 — per-domain quality CURATION (the data-selection step after
    * scoring): rank every document within its source domain by the q22
    * composite quality (ties broken by doc_id, so the cut is total and
    * deterministic) and keep the top quarter — `rn * 4 <= cnt` keeps
    * exactly floor(cnt/4) docs per source with no float/ceil edge cases
    * across engines.
    *
    * Scale posture: the signals are per-row maps; the only shuffle is the
    * window's partition-by-source exchange, and each source group sorts
    * independently (no global sort). A skewed mega-domain makes that one
    * group's sort the straggler — at 100 TB you'd first compute each
    * source's quality threshold from a per-source quantile sketch
    * (q38b's GK pattern), broadcast the tiny (source, cutoff) table, and
    * keep the selection itself map-side; the window form here is the
    * exact-rank semantics the sketch variant approximates. */
  val q63_quality_curation: Query = Query(
    s"""WITH $qualitySignalsSql,
       |     q AS (SELECT source, doc_id, $qualityColSql AS quality FROM f),
       |     r AS (SELECT source, doc_id, quality,
       |                  CAST(row_number() OVER (PARTITION BY source
       |                                          ORDER BY quality DESC, doc_id) AS INT) AS rn,
       |                  count(*) OVER (PARTITION BY source) AS cnt
       |           FROM q)
       |SELECT source, doc_id, quality, rn
       |FROM r WHERE rn * 4 <= cnt
       |ORDER BY source, rn""") { (s, dir) =>
    val q = qualitySignals(s, dir).select(col("source"), col("doc_id"), qualityCol.as("quality"))
    val w = Window.partitionBy("source").orderBy(col("quality").desc, col("doc_id"))
    val cw = Window.partitionBy("source")
    q.withColumn("rn", row_number().over(w))
      .withColumn("cnt", count(lit(1)).over(cw))
      .filter(col("rn") * 4 <= col("cnt"))
      .select("source", "doc_id", "quality", "rn")
      .orderBy("source", "rn")
  }

  /** Q23 — token-count statistics per source (whitespace tokenizer). */
  val q23_token_stats: Query = Query(
    s"""WITH t AS (SELECT source, CAST(len(string_split($normSql, ' ')) AS INT) AS n_tok
       |           FROM documents)
       |SELECT source, count(*) AS n_docs,
       |       CAST(sum(n_tok) AS BIGINT) AS sum_tok,
       |       floor(CAST(sum(n_tok) AS DOUBLE) / count(*) * 10000 + 0.5e0) / 10000 AS avg_tok,
       |       min(n_tok) AS min_tok, max(n_tok) AS max_tok
       |FROM t GROUP BY source
       |ORDER BY source""") { (s, dir) =>
    docs(s, dir)
      .select(col("source"), size(split(norm, " ")).as("n_tok"))
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_tok")).as("sum_tok"),
        cround(sum(col("n_tok")).cast("double") / count(lit(1))).as("avg_tok"),
        min(col("n_tok")).as("min_tok"),
        max(col("n_tok")).as("max_tok"))
      .orderBy("source")
  }

  /** Q23b — BPE-ish regex tokenization: alnum runs and single
    * non-alnum marks as separate tokens (the pre-tokenizer split most
    * BPE vocabularies assume), compared against the whitespace count as
    * a fertility ratio. Pattern stays ASCII-class so Java regex (UTF-16)
    * and RE2 (UTF-8) agree codepoint-for-codepoint. */
  val q23b_bpe_tokens: Query = Query(
    s"""WITH t AS (SELECT doc_id,
       |                  CAST(len(regexp_extract_all($normSql, '[a-z0-9]+|[^a-z0-9 ]')) AS INT) AS n_bpe,
       |                  CAST(len(string_split($normSql, ' ')) AS INT) AS n_ws
       |           FROM documents)
       |SELECT doc_id, n_bpe, n_ws,
       |       ${croundSql("n_bpe * 1e0 / n_ws")} AS fertility
       |FROM t
       |ORDER BY doc_id""") { (s, dir) =>
    docs(s, dir)
      .select(col("doc_id"),
        size(regexp_extract_all(norm, lit("[a-z0-9]+|[^a-z0-9 ]"), lit(0))).as("n_bpe"),
        size(split(norm, " ")).as("n_ws"))
      .select(col("doc_id"), col("n_bpe"), col("n_ws"),
        cround(col("n_bpe") * lit(1.0) / col("n_ws")).as("fertility"))
      .orderBy("doc_id")
  }

  /** Q24 — document fingerprint: position-weighted rolling hash over
    * tokens, pure integer arithmetic (engine-portable, unlike xxhash64).
    * fp = Σ (pos+1)·(31·len(w) + ascii(w[0]))  mod 1e9+7. */
  val q24_fingerprint: Query = Query(
    s"""WITH t AS (SELECT doc_id,
       |                  unnest(string_split($normSql, ' ')) AS w,
       |                  unnest(range(len(string_split($normSql, ' ')))) AS pos
       |           FROM documents)
       |SELECT doc_id,
       |       CAST(sum((pos + 1) * (31 * length(w) + ascii(substring(w, 1, 1))))
       |            % 1000000007 AS BIGINT) AS fp
       |FROM t GROUP BY doc_id
       |ORDER BY doc_id""") { (s, dir) =>
    docs(s, dir)
      .select(col("doc_id"), posexplode(split(norm, " ")))
      .select(col("doc_id"),
        ((col("pos") + 1).cast("long")
          * (lit(31) * length(col("col")) + ascii(substring(col("col"), 1, 1))))
          .as("contrib"))
      .groupBy("doc_id")
      .agg((sum(col("contrib")) % 1000000007L).as("fp"))
      .orderBy("doc_id")
  }

  /** Session-scoped persisted-DataFrame memoizer: near-dup operators
    * share expensive intermediates (shingles, signatures, verified pairs)
    * instead of recomputing them per query. synchronized so a concurrent
    * first call cannot double-build and leak a persisted copy. */
  private val dfCache =
    scala.collection.mutable.Map.empty[(String, SparkSession, String), DataFrame]

  private[graft] def memo(tag: String, s: SparkSession, dir: String)(build: => DataFrame): DataFrame =
    dfCache.synchronized(dfCache.getOrElseUpdate((tag, s, dir), build))

  /** Object-RDD sibling of [[memo]], for the graph kernels' adjacency
    * caches. A Dataset persist stores Tungsten rows, so every pass over
    * an array-typed adjacency pays UnsafeArrayData decode (~180 ns/edge
    * measured on the PageRank rounds) and the persist itself pays the
    * encode (~10 cpu-s at sf0.1); a deserialized MEMORY_ONLY RDD stores
    * the JVM arrays themselves — rounds read Array[Int]/Array[Long]
    * directly. Same lifecycle as dfCache: session-scoped, cleared (and
    * unpersisted) by [[resetCaches]]. */
  private val rddCache =
    scala.collection.mutable.Map.empty[(String, SparkSession, String), org.apache.spark.rdd.RDD[_]]

  private[graft] def memoRdd[T](tag: String, s: SparkSession, dir: String)(
      build: => org.apache.spark.rdd.RDD[T]): org.apache.spark.rdd.RDD[T] =
    rddCache.synchronized(rddCache.getOrElseUpdate((tag, s, dir), build))
      .asInstanceOf[org.apache.spark.rdd.RDD[T]]

  /** Unpersist and forget ONE memoized intermediate — for callers that
    * know they are done with a shared frame (e.g. a blob builder handing
    * state to a long-lived streaming job) and must not pin it for the
    * session. The next query needing it simply rebuilds + re-memoizes. */
  private[graft] def evict(tag: String, s: SparkSession, dir: String): Unit =
    dfCache.synchronized(dfCache.remove((tag, s, dir))).foreach(_.unpersist())

  /** Unpersist and forget every memoized intermediate. The bench calls
    * this between queries so each one pays its own full cost (per-query
    * times stay order-independent) and no persisted blocks accumulate
    * across the 50-query run. */
  private[graft] def resetCaches(): Unit = {
    dfCache.synchronized {
      dfCache.values.foreach(_.unpersist())
      dfCache.clear()
    }
    rddCache.synchronized {
      rddCache.values.foreach(_.unpersist(blocking = false))
      rddCache.clear()
    }
    // forget the q54b partner-index broadcast handle; its DESTRUCTION
    // rides destroyTrackedBroadcasts below (it is Graph.track'd)
    partnerIdxCache.synchronized(partnerIdxCache.clear())
    // the graph kernels' node/edge-sized broadcasts share the memo
    // lifecycle (ADVICE r10: a long-lived session otherwise accumulates
    // them until ContextCleaner GC)
    graft.queries.Graph.destroyTrackedBroadcasts()
  }

  /** Distinct 5-gram character shingle hashes of the normalized text,
    * exploded to (doc_id, g) rows. Derived from the persisted
    * [[shingleSets]] arrays — one scan + one hash pass feeds BOTH forms
    * (re-exploding from the cached arrays is a single Generate, far
    * cheaper than a second normalization + hash pass over the corpus). */
  private[graft] def shingles(s: SparkSession, dir: String): DataFrame =
    memo("shingles", s, dir)(
      shingleSets(s, dir).select(col("doc_id"), explode(col("gs")).as("g")))

  /** Per-doc sorted distinct shingle-hash SETS, straight off the table
    * scan: graft_shingle_hashes emits the whole per-doc array in one
    * codegen pass, so building doc sets needs no explode and no groupBy
    * exchange at all. This is the ONE materialized shingle frame per
    * (session, dir); [[shingles]] and the verify step both read it. */
  private[graft] def shingleSetsOf(docsDf: DataFrame): DataFrame =
    docsDf
      .select(col("doc_id"), norm.as("norm"))
      .filter(length(col("norm")) >= 5)
      .select(col("doc_id"), expr("graft_shingle_hashes(norm, 5)").as("gs"))
      .select(col("doc_id"), col("gs"), size(col("gs")).cast("long").as("n"))

  private[graft] def shingleSets(s: SparkSession, dir: String): DataFrame =
    memo("shingleSets", s, dir)(shingleSetsOf(docs(s, dir)).persist())

  /** The exact shingling q25/q26/q37 run — distinct 5-gram character
    * shingles of the normalized text of any (doc_id, text) frame.
    * Exposed so tests planting synthetic docs exercise the SAME
    * normalization/gram-size as the production pipeline. */
  // Three deliberate choices in the shingle pipeline, each worth seconds
  // at sf0.1 and an exchange (or a few million allocations) at corpus
  // scale:
  // 1. per-doc dedup BEFORE explode — doc_id is unique per row, so it IS
  //    the global (doc_id, g) distinct, without the multi-million-row
  //    shuffle + hash aggregate an explode-then-.distinct() costs (that
  //    shuffle was 7.4 s of q25's 12 s).
  // 2. g is the shingle's xxhash64, never the string — every downstream
  //    df-count, rank, band, and join key is an 8-byte long instead of a
  //    heap string; deterministic under stage retries; collisions merge
  //    two grams with odds ~n²/2⁶⁴ (the round-2-accepted verify
  //    argument, now applied uniformly: candidates and verify see the
  //    SAME hashed universe, so the pipeline is internally consistent by
  //    construction).
  // 3. the window-hash + dedup runs as ONE native codegen pass
  //    ([[graft.functions.ShingleHashes]]) — the equivalent
  //    transform(...xxhash64(substring)...) HOF is interpreted and
  //    allocates a UTF8String per window (measured ~6 s of q25's 9 s for
  //    ~5.7M evals at sf0.1).
  private[graft] def shinglesOf(docsDf: DataFrame): DataFrame =
    shingleSetsOf(docsDf).select(col("doc_id"), explode(col("gs")).as("g"))

  /** Jaccard threshold shared by q25/q26/q37 (Scala and oracle SQL). */
  private[graft] val JaccardTau = 0.8

  /** τ as the exact rational TauNum/TauDen — the PPJoin pruning bounds
    * (prefix length, length-ratio, minimum overlap) must be computed in
    * INTEGER arithmetic. The float forms are off-by-one at exact
    * boundaries: 0.8d is the double just ABOVE 4/5, so ceil(0.8d·n)
    * exceeds ceil(4n/5) whenever 5 | n, and ceil((τ/(1+τ))d·s) exceeds
    * ceil(4s/9) whenever 9 | 4s — measured on the 10× dense fixture as
    * 45 jac-exactly-0.8 true pairs REJECTED by the (otherwise sound)
    * aggregated positional bound. Verification compares jac >= 0.8d
    * identically in both engines (same nearest-double of the same
    * rational), so only the integer pruning bounds needed fixing. */
  private val TauNum = 4L
  private val TauDen = 5L
  assert(TauNum.toDouble / TauDen == JaccardTau)

  /** ceil(num·x / den) over a nonneg long column, exactly: the double
    * division is correctly rounded and num·x + den − 1 < 2^52, so
    * floor((num·x + den − 1) / den) hits the true integer quotient. */
  private def ceilDiv(x: Column, num: Long, den: Long): Column =
    floor((lit(num) * x + lit(den - 1)) / lit(den.toDouble))

  /** Shared oracle CTE chain: exact near-dup pairs (d1, d2) at
    * jac >= JaccardTau over distinct 5-gram shingles. */
  private[graft] val pairCtesSql =
    s"""sh AS (SELECT doc_id, norm, unnest(range(length(norm) - 4)) AS i
       |        FROM (SELECT doc_id, $normSql AS norm FROM documents) d
       |        WHERE length(norm) >= 5),
       | s2 AS (SELECT DISTINCT doc_id, substr(norm, i + 1, 5) AS g FROM sh),
       | cnt AS (SELECT doc_id, count(*) AS n FROM s2 GROUP BY 1),
       | pairs AS (SELECT a.doc_id AS d1, b.doc_id AS d2, count(*) AS inter
       |           FROM s2 a JOIN s2 b ON a.g = b.g AND a.doc_id < b.doc_id
       |           GROUP BY 1, 2),
       | j AS (SELECT d1, d2, inter * 1e0 / (ca.n + cb.n - inter) AS jac
       |       FROM pairs JOIN cnt ca ON ca.doc_id = d1 JOIN cnt cb ON cb.doc_id = d2)""".stripMargin

  private val jaccardSql =
    s"""WITH $pairCtesSql
       |SELECT d1, d2, ${croundSql("jac")} AS jaccard FROM j
       |WHERE jac >= $JaccardTau
       |ORDER BY d1, d2"""

  /** Exact pairwise jaccard ≥ [[JaccardTau]] over distinct 5-gram shingle
    * sets for the given candidate pairs (cols d1, d2), unrounded. This is
    * THE verify step for every near-dup operator. `docSets` is the
    * (doc_id, gs, n) frame from [[shingleSetsOf]] — per-doc SORTED
    * DISTINCT shingle-hash arrays computed in one codegen pass on the
    * scan side, so attaching them here is two plain equi-joins with no
    * groupBy exchange anywhere; a fused codegen merge walk
    * ([[graft.functions.SortedLongIntersect]]) counts each pair's
    * overlap. Cost scales with candidate volume × doc size — the same
    * asymptotics as a row-level (doc, shingle) equi-join, but without
    * exploding each pair into per-shingle rows through a shuffle+groupBy.
    *
    * The arrays hold SORTED `xxhash64(g)` longs, not the shingle strings:
    * ~2-3× smaller shuffle payload (the round-2 driver bench showed the
    * string form spilling under memory pressure — 252 s vs 21-37 s
    * local), long-vs-long comparisons inside codegen, and still fully
    * deterministic under stage retries (xxhash64 is a pure function of
    * the shingle bytes, unlike monotonically_increasing_id which can
    * re-assign ids when a lost shuffle block is recomputed). Collision
    * odds over an n-shingle vocabulary are ≈ n²/2⁶⁴ — negligible at any
    * realistic corpus scale, and a collision only perturbs one pair's
    * count by 1. graft_shingle_hashes dedups inside the expression, so
    * numerator and denominator stay consistent by construction. */
  private[graft] def rawJaccard(docSets: DataFrame, cand: DataFrame,
      adaptive: Boolean = false): DataFrame = {
    import graft.functions.SortedLongIntersect.sortedIntersect
    // Default (adaptive=false) — SHUFFLE_HASH on the docSets side: the
    // streamed side carries the (growing) shingle arrays, and a
    // sort-merge join would SORT that fat stream — measured 570 MB of
    // sort spill at sf0.1, and exactly the memory-pressure sensitivity
    // that blew q25 up 12× on the round-2 driver. A shuffled hash join
    // builds its per-partition table from the compact docSets side
    // (rows/shuffle-partitions arrays each) and streams the fat side
    // without sorting — spill-free by construction at any scale, since
    // the build side shrinks with partition count. That is the right
    // shape when cand is the dominant stream (q25/q26's doc-level
    // pipelines: candidate volume >> docSets).
    // adaptive=true — no hint: when cand is a runtime-sized shuffle
    // output (q54b's rep-level stage: 192 pairs at sf0.1), AQE's
    // runtime stats convert the join to a broadcast of the SKINNY cand
    // side, and the array-carrying docSets frame is never exchanged at
    // all; at larger cand volumes AQE keeps the exchange and the plan
    // degrades to exactly the default shape.
    def side(df: DataFrame) = if (adaptive) df else df.hint("shuffle_hash")
    val hashed1 = side(docSets)
      .select(col("doc_id").as("d1"), col("gs").as("g1"), col("n").as("n1"))
    val hashed2 = side(docSets)
      .select(col("doc_id").as("d2"), col("gs").as("g2"), col("n").as("n2"))
    cand
      .join(hashed1, "d1")
      .join(hashed2, "d2")
      .select(col("d1"), col("d2"),
        sortedIntersect(col("g1"), col("g2")).as("inter"),
        col("n1"), col("n2"))
      .select(col("d1"), col("d2"),
        (col("inter") * lit(1.0) / (col("n1") + col("n2") - col("inter"))).as("jac"))
      .filter(col("jac") >= JaccardTau)
  }

  /** [[rawJaccard]] behind a bucketed-count signature sift — the exact
    * path's answer to the sparse-regime near-miss band (SCALE10X.md:
    * ~10⁸ candidate pairs at jaccard 0.5-0.8 that no prefix/positional
    * bound can reject, whose array shipping was the 26 GB write /
    * 36.7 GB spill "architectural floor"). Before any shingle array
    * moves, each candidate is tested against the SOUND intersection
    * upper bound S = Σ min of the pair's [[graft.functions
    * .BucketCountSig]] byte histograms: S >= |A∩B| (shared shingles
    * share buckets), and x/(c-x) is monotone, so
    * TauDen·S >= TauNum·(n1+n2-S) is implied by jac >= τ in exact
    * integer arithmetic — no true pair is ever dropped (the TauNum
    * discipline; a NULL signature = saturated counts = cannot reject).
    * The per-pair exchange thus carries 1-2 bytes per shingle instead
    * of 8, near-misses below ~0.78 die before the fat exchange, and
    * [[rawJaccard]]'s array attach runs over survivors only — same
    * join/partitioning shape (skinny pair exchange + doc-frame-local
    * shuffle-hash attaches), so the no-repartition fusion that is
    * load-bearing in this pipeline is preserved. */
  private[graft] def siftedJaccard(docSets: DataFrame, cand: DataFrame): DataFrame = {
    import graft.functions.BucketSig.{bucketSig, sigMinSum}
    val sigs = docSets.select(col("doc_id"), col("n"), bucketSig(col("gs")).as("sig"))
    val s1 = sigs.hint("shuffle_hash")
      .select(col("doc_id").as("d1"), col("sig").as("sig1"), col("n").as("sn1"))
    val s2 = sigs.hint("shuffle_hash")
      .select(col("doc_id").as("d2"), col("sig").as("sig2"), col("n").as("sn2"))
    val pass = cand.select("d1", "d2")
      .join(s1, "d1")
      .join(s2, "d2")
      .withColumn("ub", sigMinSum(col("sig1"), col("sig2")))
      .filter(col("ub").isNull ||
        lit(TauDen) * col("ub") >= lit(TauNum) * (col("sn1") + col("sn2") - col("ub")))
      .select("d1", "d2")
    rawJaccard(docSets, pass)
  }

  /** [[rawJaccard]] with the canonical output shape (rounded, ordered). */
  private def verifiedJaccard(docSets: DataFrame, cand: DataFrame): DataFrame =
    rawJaccard(docSets, cand)
      .select(col("d1"), col("d2"), cround(col("jac")).as("jaccard"))
      .orderBy("d1", "d2")

  /** Q25 — n-gram Jaccard near-duplicate pairs (exact), PPJoin-style:
    * a naive shingle self-join explodes as Σ df(g)² on frequent shingles,
    * so candidates come from *prefix filtering* instead — rank each doc's
    * shingles rarest-first (global df order), keep only the first
    * |A| − ⌈τ·|A|⌉ + 1 per doc (jac ≥ τ forces |A∩B| ≥ ⌈τ·max|A|,|B|⌉,
    * so the prefixes of any qualifying pair must intersect — Chaudhuri et
    * al.'s prefix-filter theorem), join on those rare shingles only, then
    * verify the exact jaccard. Same exact output, near-linear candidate
    * volume — the property that keeps this runnable at 100 TB. */
  val q25_jaccard_neardup: Query = Query(jaccardSql) { (s, dir) =>
    jaccardPairs(s, dir)
      .select(col("d1"), col("d2"), cround(col("jac")).as("jaccard"))
      .orderBy("d1", "d2")
  }

  /** Exact near-dup pairs (d1, d2, jac >= JaccardTau), memoized +
    * persisted per (session, dir): q25 formats them, q37 consumes them as
    * edges. */

  private[graft] def jaccardPairs(s: SparkSession, dir: String): DataFrame =
    memo("jaccardPairs", s, dir)(buildJaccardPairs(s, dir))

  /** PPJoin candidate pairs (d1 < d2) from prefix filtering over the
    * given (doc_id, g) shingle set. Returns (candidates, prefixHandle) —
    * the prefix table is persisted because the self-join scans it twice;
    * the caller unpersists it once candidates are materialized.
    *
    * Scale shape (the round-1 VERDICT's two q25 scale-killers are gone):
    * the global rarest-first order is (df(g), g) — df is a global
    * property of each shingle, so ordering by it gives every doc the SAME
    * total order over the universe (the prefix-filter theorem's
    * requirement) without assigning dense ids, hence NO single-partition
    * window anywhere; and nothing is ever broadcast by construction (the
    * df join is a plain equi-join on g that AQE broadcasts only when the
    * vocabulary is actually small). */
  private[graft] def ppjoinCandidates(sh: DataFrame,
      sigs: Option[DataFrame] = None): (DataFrame, DataFrame) = {
    import org.apache.spark.sql.expressions.Window
    val dfTab = sh.groupBy("g").agg(count(lit(1)).as("df"))
    // per-doc rank in the global (df, g) order — partitioned by doc_id
    val ranked = sh.join(dfTab, "g")
      .withColumn("pos", row_number().over(
        Window.partitionBy("doc_id").orderBy(col("df"), col("g"))))
      .withColumn("n", count(lit(1)).over(Window.partitionBy("doc_id")))
    // prefix filter: jac >= tau forces the rarest-first prefixes of any
    // qualifying pair to intersect, so only the first n - ceil(tau*n) + 1
    // shingles per doc can seed a candidate (Chaudhuri et al.)
    val prefix = ranked
      // n - ceil(τ·n) + 1 in exact integer arithmetic (see TauNum note:
      // the float ceil truncated the prefix by one whenever 5 | n)
      .filter(col("pos") <= col("n") - ceilDiv(col("n"), TauNum, TauDen) + 1)
      .select("doc_id", "g", "pos", "n")
      .persist()
    // prefix-filter candidates + size filter + the AGGREGATED positional
    // bound (PPJoin): per pair, count every shared prefix shingle and
    // take the positions of the LAST one in the global order. Any common
    // shingle ordered before it lies in BOTH prefixes (the order is
    // global, and its positions are below pa/pb which are within the
    // prefixes), so it is already counted in cnt; anything after it is
    // bounded by the remaining suffix lengths. Hence
    // |A∩B| <= cnt + min(na - max_pa, nb - max_pb) — exact, and strictly
    // tighter than the per-row form 1 + min(na - pa, nb - pb), which a
    // single early-position match nearly always passes (measured 1.53M
    // candidates from 5k docs at sf0.1 before this; the aggregation
    // replaces the old .distinct() with the SAME exchange shape, so the
    // tightening is free).
    // ceil(τ/(1+τ)·(na+nb)) = ceil(TauNum·(na+nb) / (TauNum+TauDen)),
    // exact (the float form rejected jac-exactly-τ pairs — TauNum note)
    val minOverlap = ceilDiv(col("na") + col("nb"), TauNum, TauNum + TauDen)
    val cand0 = prefix.select(col("doc_id").as("d1"), col("g"), col("pos").as("pa"), col("n").as("na"))
      .join(prefix.select(col("doc_id").as("d2"), col("g"), col("pos").as("pb"), col("n").as("nb")), "g")
      .filter(col("d1") < col("d2"))
      // na >= τ·nb ⇔ TauDen·na >= TauNum·nb — integer, boundary-exact
      .filter(lit(TauDen) * col("na") >= lit(TauNum) * col("nb") &&
        lit(TauDen) * col("nb") >= lit(TauNum) * col("na"))
      // PPJoin's PER-ROW positional filter, applied MAP-SIDE between the
      // join and the pair aggregation — this is what tames df-inflation
      // (SCALING.md's Σ prefdf(g)² law): a hot shingle is by definition
      // LATE in the rarest-first order, so its join rows carry
      // end-of-prefix positions and fail 1 + min(suffix) >= minOverlap
      // right here, before they ever reach the partial-agg hash map — a
      // pair whose EVERY common shingle is that hot never enters the map
      // at all (the 60-83 GB → ~1 GB dense-regime spill fix).
      // Soundness: within one pair, positions increase together along
      // the global (df, g) order, so min(na-pa, nb-pb) is DECREASING
      // along it and survival is prefix-closed — (a) a qualifying
      // pair's FIRST common shingle row always survives (|A∩B| <= 1 +
      // min suffix past it), so no true candidate is lost, and (b)
      // every dropped common shingle is ordered after the last
      // surviving one, i.e. it still lies inside the suffix that
      // cnt + min(na - pam, nb - pbm) already budgets for — the
      // aggregated test stays a valid upper bound on the survivors.
      // Cost profile (SCALE10X.md round-7 table): the filter trades a
      // somewhat looser aggregated bound (dropped late rows shrink cnt)
      // for bounded partial-agg memory — dense 10× goes 99 s/60-83 GB
      // spill → 44 s/~1 GB; sparse 10× keeps more near-miss pairs into
      // the verify (165 s vs 84 s unfiltered) but at a QUARTER of the
      // unfiltered spill. Bounded memory is the 100 TB-relevant
      // property; replicated corpora should use the LSH-banded finder.
      .filter(lit(1) + least(col("na") - col("pa"), col("nb") - col("pb")) >= minOverlap)
    // MAP-SIDE signature sift (when the caller supplied a broadcastable
    // (doc_id, sig) table): the sparse df-inflation regime's ~10⁸
    // near-miss candidate ROWS all survive the sound positional bounds
    // (their jaccard sits in the 0.5-0.8 band — SCALE10X.md), so without
    // this they flood the pair-aggregation hash map, whose sort-fallback
    // was measured as THE remaining spill (36.9 GB of the sparse-10×
    // probe's 36.4 GB total, stage-attributed). Attaching both docs'
    // [[graft.functions.BucketCountSig]] histograms via two broadcast
    // hash joins keeps everything inside the same whole-stage-codegen
    // span as the candidate join (broadcast joins preserve the streamed
    // side's doc_id partitioning, so the no-exchange aggregation fusion
    // below is untouched), and the sound Σ-min bound kills near-misses
    // BEFORE they enter the aggregation map. Soundness: identical test
    // to [[siftedJaccard]] (S >= |A∩B| and x/(c-x) monotone, null =
    // saturated = cannot reject), and it is a per-PAIR property, so
    // applying it per candidate row drops only rows of pairs the
    // post-agg sift would have dropped anyway. The aggregated positional
    // bound below stays valid: it only ever REJECTS more.
    val rows = sigs match {
      case Some(sg) =>
        cand0
          .join(broadcast(sg.select(col("doc_id").as("d1"), col("sig").as("sig1"))), Seq("d1"))
          .join(broadcast(sg.select(col("doc_id").as("d2"), col("sig").as("sig2"))), Seq("d2"))
          // the FUSED test expression: one evaluation of the Σ-min bound
          // per row (the compositional isnull/min_sum form triple-
          // evaluated after predicate inlining), zero-allocation
          // equal-width fast path, early accept — see SigTauOk
          .filter(graft.functions.SigTauOk.sigTauOk(
            col("sig1"), col("sig2"), col("na") + col("nb"), TauNum.toInt, TauDen.toInt))
          .drop("sig1", "sig2")
      case None => cand0
    }
    val cand = rows
      .groupBy("d1", "d2", "na", "nb")
      .agg(count(lit(1)).as("cnt"), max(col("pa")).as("pam"), max(col("pb")).as("pbm"))
      .filter(col("cnt") + least(col("na") - col("pam"), col("nb") - col("pbm")) >= minOverlap)
      .select("d1", "d2")
    (cand, prefix)
  }

  /** Doc-count gate for broadcasting the per-doc signature table into
    * the candidate stage (sig ≈ next-pow2(|gs|) bytes, so ~1M docs is a
    * few hundred MB — comfortable on production executors; the 10×/30×
    * probe fixtures at 50k/150k docs are far inside). Past the gate the
    * exact path falls back to the post-aggregation [[siftedJaccard]] —
    * same bound, pair-linear shuffle instead of broadcast — and the
    * LSH-banded finder is the documented default at that scale anyway. */
  private[graft] val SigBroadcastGate = 1000000L

  /** Doc-count mark above which the LSH path's exact verify runs behind
    * the BucketCountSig sift instead of the raw array attach — between
    * the 30× fixture (150k docs, raw verify zero-spill) and the 100×
    * fixture (500k docs, raw verify spilled 68.6 GB; sift-verified run
    * in SCALE100X.md). Lossless either side. */
  private[graft] val LshRawVerifyMax = 200000L

  private def buildJaccardPairs(s: SparkSession, dir: String): DataFrame = {
    // shingles() is memoized AND persisted per (session, dir) — all three
    // consumers here (df ranking, prefix window, verify docSets) plus any
    // later query share one materialization
    val sh = shingles(s, dir)
    val sets = shingleSets(s, dir)
    // count() on the persisted frame: one cheap job, and the
    // materialization is needed by every consumer below anyway
    val inGate = sets.count() <= SigBroadcastGate
    val sigTab =
      if (inGate) Some(sets.select(col("doc_id"),
        graft.functions.BucketSig.bucketSig(col("gs")).as("sig")))
      else None
    val (cand, prefix) = ppjoinCandidates(sh, sigTab)
    // exact verification via doc-set equi-joins — candidate-volume-bound,
    // nothing broadcast by construction, sets computed scan-side. In-gate
    // the map-side sift already applied the Σ-min bound per row, so the
    // post-agg sift would be pure redundancy (identical per-pair test);
    // past the gate it still kills near-misses before the array attach.
    val verified = if (inGate) rawJaccard(sets, cand) else siftedJaccard(sets, cand)
    val out = verified.persist()
    // materialize once (this builder runs once per session/dir), then drop
    // the prefix intermediate — only the tiny pair set stays cached
    out.count()
    prefix.unpersist()
    out
  }

  /** Deterministic MinHash permutation constants under p = 2^31-1;
    * products stay below 2^62 so ANSI-mode Long arithmetic never
    * overflows. Single source of truth is the codegen expression
    * ([[graft.functions.MinHashSignature]]) so the fused array path and
    * this aggregation path cannot drift apart. */
  private val MhP = graft.functions.MinHashSignature.P
  private val mhA = graft.functions.MinHashSignature.a
  private val mhB = graft.functions.MinHashSignature.b

  /** Q26 — MinHash + LSH banding near-dup detection, the 100 TB path for
    * q25: 48 minhashes per doc (single aggregation pass), 8 bands × 6
    * rows, candidates from band-bucket equi-joins, then exact-jaccard
    * verification. 6-row bands matter on this corpus: its baseline
    * cross-doc similarity is ~0.3, so 4-row bands collide at 0.3⁴ ≈ 0.8%
    * of all pairs while 6-row bands cut that ~40× (recall at jac ≥ 0.95
    * stays ≥ 1−1e-7). With the corpus's similarity margin the verified
    * output equals q25's exact result, so it shares q25's oracle. */
  /** (doc_id, band, bh) LSH band buckets from exploded shingle hashes:
    * 48 minhashes in one aggregation pass, 8 bands × 6 rows. Shared by
    * q26 and the streaming near-dup dedup
    * ([[graft.streaming.Streams.startNearDupDedup]]) so batch and stream
    * bucket documents identically. */
  private[graft] def bandedOf(sh: DataFrame): DataFrame = {
    val rBand = 6
    val nBands = 8
    val hashed = sh.select(col("doc_id"), pmod(xxhash64(col("g")), lit(MhP)).as("h"))
    val minhashes = (0 until rBand * nBands).map(i =>
      min((col("h") * lit(mhA(i)) + lit(mhB(i))) % MhP).as(s"m$i"))
    val sig = hashed.groupBy("doc_id").agg(minhashes.head, minhashes.tail: _*)
    val bands = (0 until nBands).map(j =>
      xxhash64(lit(j) +: (0 until rBand).map(r => col(s"m${rBand * j + r}")): _*).as(s"b$j"))
    sig.select(col("doc_id") +: bands: _*)
      .select(col("doc_id"), posexplode(array((0 until nBands).map(j => col(s"b$j")): _*)))
      .withColumnRenamed("pos", "band").withColumnRenamed("col", "bh")
  }

  /** [[bandedOf]] computed directly from per-doc hash-set ARRAYS
    * (doc_id, gs, ...): the fused graft_minhashes expression
    * ([[graft.functions.MinHashSignature]]) replaces the explode +
    * 48-min aggregation, so banding becomes a pure map stage with NO
    * shuffle at all — the arrays were already materialized for the
    * verify path, and only the 8 (doc_id, band, bh) rows per doc leave
    * the stage. Bitwise-identical buckets to bandedOf over the exploded
    * arrays: the expression fuses the same per-element xxhash64 + pmod +
    * permutation minima, and the band hash is the same xxhash64 over the
    * same (j, m…) longs. Empty sets are filtered exactly as the
    * aggregation form's no-rows behavior. */
  private[graft] def bandedOfSets(docSets: DataFrame): DataFrame = {
    import graft.functions.MinHashSignature.minhashes
    val rBand = 6
    val nBands = 8
    val sig = docSets.filter(size(col("gs")) > 0)
      .select(col("doc_id"), minhashes(col("gs")).as("m"))
    val bands = (0 until nBands).map(j =>
      xxhash64(lit(j) +: (0 until rBand).map(r => col("m").getItem(rBand * j + r)): _*).as(s"b$j"))
    sig.select(col("doc_id") +: bands: _*)
      .select(col("doc_id"), posexplode(array((0 until nBands).map(j => col(s"b$j")): _*)))
      .withColumnRenamed("pos", "band").withColumnRenamed("col", "bh")
  }

  /** Near-dup pairs via MinHash banding + exact jaccard verification —
    * the same (d1, d2, jac) set as [[jaccardPairs]] wherever banding
    * recall is total (the 8×6 band parameters are sized for tau = 0.8;
    * q26's oracle — identical to q25's — pins the equality at the gate
    * scales), found with ~10× less shuffle: the signature is one codegen
    * pass over the persisted shingle-set arrays, so nothing
    * (doc_id, g)-shaped is ever exchanged — only (band, bh, doc_id)
    * triples and the verified candidate pairs move. Memoized like
    * [[jaccardPairs]]; q26 formats it, and q71's composed pipeline uses
    * it as its dedup edge source (the PPJoin path stays the EXACT
    * operator, q25/q37). */
  private[graft] def lshJaccardPairs(s: SparkSession, dir: String): DataFrame =
    memo("lshJaccardPairs", s, dir) {
      val sets = shingleSets(s, dir)
      val banded = bandedOfSets(sets)
      val cand = banded.select(col("doc_id").as("d1"), col("band"), col("bh"))
        .join(banded.select(col("doc_id").as("d2"), col("band"), col("bh")), Seq("band", "bh"))
        .filter(col("d1") < col("d2"))
        .select("d1", "d2").distinct()
      // Round 12 (100× campaign): above ~LshRawVerifyMax docs the band
      // collisions mint enough near-miss candidates that the raw
      // shingle-array attach spills — measured 68.6 GB at 500k docs,
      // zero at 150k — while the LOSSLESS BucketCountSig sift kills
      // them before any array moves (identical pair set by the Σ-min
      // soundness bound, the q25 machinery). Below the mark the two
      // extra sift joins are pure overhead on a spill-free plan.
      val verified = if (sets.count() <= LshRawVerifyMax)
        rawJaccard(sets, cand) else siftedJaccard(sets, cand)
      val out = verified.persist()
      out.count()
      out
    }

  val q26_minhash_lsh: Query = Query(jaccardSql) { (s, dir) =>
    lshJaccardPairs(s, dir)
      .select(col("d1"), col("d2"), cround(col("jac")).as("jaccard"))
      .orderBy("d1", "d2")
  }

  /** Q27 — SimHash near-dup: 64-bit signature from token hashes, banded
    * into 4×16-bit chunks (pigeonhole-exact for hamming ≤ 3), hamming
    * verification on chunk-collision candidates.
    *
    * Hash-ORACLED since the token hash moved to md5-first-8-bytes
    * ([[graft.functions.SimHash]], the q73 digest precedent): the oracle
    * rebuilds the same signatures bit-by-bit in DuckDB — per-token
    * UBIGINT from the md5 hex prefix, 64 per-(doc, bit) majority votes
    * (bit set iff 2·ones >= n, i.e. the ±1 counter >= 0), 16-bit chunk
    * values by arithmetic packing (no 1<<63 overflow, signatures never
    * materialize as a single integer), the same chunk-collision
    * candidate join, and hamming as the count of disagreeing bit rows.
    * The banding is pigeonhole-EXACT (4 chunks, radius 3), so both
    * engines enumerate identical pair sets — a hash match, not a
    * recall bound. */
  val q27_simhash: Query = Query(
    s"""WITH d AS (SELECT doc_id,
       |                  list_distinct(list_filter(string_split($normSql, ' '),
       |                                            w -> len(w) > 0)) AS toks
       |           FROM documents),
       |     th AS (SELECT doc_id, CAST('0x' || substr(md5(w), 1, 16) AS UBIGINT) AS h
       |            FROM (SELECT doc_id, unnest(toks) AS w FROM d WHERE len(toks) > 0)),
       |     bits AS (SELECT doc_id, k,
       |                     CASE WHEN 2 * sum((h >> k) & 1) >= count(*) THEN 1 ELSE 0 END AS b
       |              FROM th, (SELECT unnest(range(64)) AS k) ks
       |              GROUP BY doc_id, k),
       |     chunks AS (SELECT doc_id, k // 16 AS ci, sum(b << (k % 16)) AS chunk
       |                FROM bits GROUP BY 1, 2),
       |     cand AS (SELECT DISTINCT c1.doc_id AS d1, c2.doc_id AS d2
       |              FROM chunks c1 JOIN chunks c2 ON c1.ci = c2.ci AND c1.chunk = c2.chunk
       |              WHERE c1.doc_id < c2.doc_id),
       |     ham AS (SELECT d1, d2,
       |                    CAST(sum(CASE WHEN b1.b <> b2.b THEN 1 ELSE 0 END) AS INT) AS hamming
       |             FROM cand
       |             JOIN bits b1 ON b1.doc_id = cand.d1
       |             JOIN bits b2 ON b2.doc_id = cand.d2 AND b2.k = b1.k
       |             GROUP BY d1, d2)
       |SELECT d1, d2, hamming FROM ham WHERE hamming <= 3 ORDER BY d1, d2""") { (s, dir) =>
    val sigs = simhashSignatures(s, dir)
    val chunks = sigs.select(col("doc_id"), col("sig"),
      posexplode(array((0 until 4).map(j =>
        shiftrightunsigned(col("sig"), 16 * j).bitwiseAND(lit(0xFFFFL))): _*)))
      .withColumnRenamed("pos", "ci").withColumnRenamed("col", "chunk")
    val cand = chunks.select(col("doc_id").as("d1"), col("sig").as("s1"), col("ci"), col("chunk"))
      .join(chunks.select(col("doc_id").as("d2"), col("sig").as("s2"), col("ci"), col("chunk")),
        Seq("ci", "chunk"))
      .filter(col("d1") < col("d2"))
      .select("d1", "d2", "s1", "s2").distinct()
    cand
      .select(col("d1"), col("d2"),
        bit_count(col("s1").bitwiseXOR(col("s2"))).as("hamming"))
      .filter(col("hamming") <= 3)
      .orderBy("d1", "d2")
  }

  /** 64-bit SimHash per document over distinct whitespace tokens
    * (memoized + persisted per (session, dir), like [[shingles]]). */
  private[graft] def simhashSignatures(s: SparkSession, dir: String): DataFrame =
    memo("simhash", s, dir)(buildSimhash(s, dir).persist())

  private def buildSimhash(s: SparkSession, dir: String): DataFrame =
    // one fused map pass ([[graft.functions.SimHash]]): per-token md5-64 +
    // 64 ±1 counters + sign-pack, computed where the token array lives.
    // The explode + 64-buffer HashAggregate it replaced was q27's CPU
    // (~22 s of 27 s at sf0.1); this leaves NO shuffle before banding.
    // array_distinct stays on the STRING tokens (dedup-then-hash, the
    // aggregation form's exact semantics — SimHashSpec pins bitwise
    // equality); empty token sets are filtered as before (the
    // aggregation emitted no row for them).
    docs(s, dir)
      .select(col("doc_id"),
        array_distinct(expr(s"filter(split($normExpr, ' '), w -> length(w) > 0)")).as("toks"))
      .filter(size(col("toks")) > 0)
      .select(col("doc_id"), expr("graft_simhash(toks)").as("sig"))

  /** Q37 — duplicate clusters: connected components over the exact
    * near-dup graph (q25 edges), the canonical output of a training-data
    * dedup pass (keep one doc per cluster). Spark side =
    * [[connectedComponents]] (min-label propagation with pointer
    * doubling, O(log diameter) rounds); the oracle computes the same
    * components with a recursive CTE. */
  /** Connected components over an undirected edge list (cols d1, d2),
    * in two phases.
    *
    * Phase 1 — partition-local union-find contraction (long-typed edges
    * only): each partition runs a classic union-find (path compression +
    * union by min) over ITS edges and emits its spanning forest as
    * (v → local-component-min) pointer edges. A spanning forest
    * preserves the connectivity of its partition's edge subset, and
    * connectivity over a union of subgraphs follows from the union of
    * their forests — so the forest union is connectivity-equivalent to
    * the input. This is ONE narrow pass (mapPartitions, no shuffle, the
    * expensive upstream edge producer consumed exactly once), and since
    * near-dup components are cliques that rarely straddle many
    * partitions it collapses almost all structure immediately: the
    * global loop then typically needs 1 real round + 1 detection round.
    * Memory: per-partition table is O(distinct vertices in partition) —
    * linear in partition bytes, the same budget as a hash-join build
    * side, so partition sizing already bounds it at 100 TB.
    *
    * Phase 2 — min-label propagation with a pointer-doubling shortcut
    * over the forest edges, via [[graft.ops.Iterate.loop]]. Each round
    * does (1) a one-hop min over neighbors — propagated rows carry
    * old = null, the labels side carries each vertex's previous label,
    * so one groupBy yields the new label AND (min ignores nulls) the
    * previous one for the convergence check — then from round 4
    * (2) lbl := lbl(lbl), an equi-join of the label table with itself.
    * Doubling halves label-chain depth each round, so a pathological
    * CHAIN of diameter n (which defeats the local pre-pass when sliced
    * across partitions) still converges in O(log n) rounds (DedupSpec
    * pins the bound on a diameter-100 path). Monotonicity: lbl(v) is
    * always the id of a vertex in v's component and only decreases, so
    * the fixpoint labels every component with its min vertex. The
    * convergence check is folded into the round's single materializing
    * action — no separate "did anything change" pass.
    *
    * Between the phases sits a size gate (`driverFinishMax`, the q28
    * pattern): a pointer forest of ≤2M edges (~100 MB collected) is
    * finished by ONE driver-side union-find instead of 2+ full-cluster
    * barrier rounds — the forest is already contracted, so its size is
    * #duplicate-involved docs minus #local components, tiny relative to
    * any corpus. Past the gate (billions of near-dup docs at 100 TB)
    * the distributed loop below takes over unchanged; tests force it
    * with driverFinishMax = 0 so the scale path stays exercised.
    *
    * Returns (labels (v, lbl), rounds executed — 0 on the driver-finish
    * path). */
  private[graft] def connectedComponents(edges: DataFrame,
      driverFinishMax: Long = 2L << 20): (DataFrame, Int) = {
    import org.apache.spark.sql.types.LongType
    val Array(c1, c2) = edges.columns
    val sess = edges.sparkSession
    import sess.implicits._
    val allLong = edges.schema.fields.forall(_.dataType == LongType)
    val contracted: DataFrame =
      if (allLong) {
        edges.select(col(c1).as("_1"), col(c2).as("_2")).as[(Long, Long)]
          .mapPartitions { it =>
            val parent = scala.collection.mutable.LongMap.empty[Long]
            def find(x: Long): Long = {
              var r = x
              while (parent(r) != r) r = parent(r)
              var c = x
              while (c != r) { val n = parent(c); parent(c) = r; c = n }
              r
            }
            it.foreach { case (a, b) =>
              if (!parent.contains(a)) parent(a) = a
              if (!parent.contains(b)) parent(b) = b
              val ra = find(a)
              val rb = find(b)
              if (ra < rb) parent(rb) = ra else if (rb < ra) parent(ra) = rb
            }
            // every vertex that is not a local root points at its root;
            // roots of >=2-vertex components reappear as edge targets, so
            // the vertex set survives the contraction
            parent.keysIterator
              .map(v => (v, find(v)))
              .filter { case (v, r) => v != r }
          }.toDF("a", "b")
      } else {
        // non-long label types skip the pre-pass (no test/query uses
        // them today; the loop below is type-generic and still correct)
        edges.select(col(c1).as("a"), col(c2).as("b"))
      }
    val forest = contracted.persist()
    val nForest = forest.count()
    if (allLong && nForest <= driverFinishMax) {
      // driver finish: merge the per-partition forests with one more
      // union-find pass (same algorithm, all edges), emit (v, root).
      // Roots are included because every root of a >=2-vertex component
      // appears as a pointer target.
      val parent = scala.collection.mutable.LongMap.empty[Long]
      def find(x: Long): Long = {
        var r = x
        while (parent(r) != r) r = parent(r)
        var c = x
        while (c != r) { val n = parent(c); parent(c) = r; c = n }
        r
      }
      forest.as[(Long, Long)].collect().foreach { case (a, b) =>
        if (!parent.contains(a)) parent(a) = a
        if (!parent.contains(b)) parent(b) = b
        val ra = find(a)
        val rb = find(b)
        if (ra < rb) parent(rb) = ra else if (rb < ra) parent(ra) = rb
      }
      forest.unpersist()
      val labels = parent.keysIterator.map(v => (v, find(v))).toSeq
      return (labels.toDF("v", "lbl"), 0)
    }
    val bi = forest.unionAll(forest.select(col("b").as("a"), col("a").as("b"))).persist()
    val labels0 = bi.select(col("a").as("v")).distinct()
      .withColumn("lbl", col("v")).persist()
    // the vertex count bounds the rounds (generously — doubling needs
    // only ~log2(diameter)), so non-convergence within the bound is
    // impossible rather than silently tolerated
    val maxRounds = labels0.count().max(1L)
    val lblType = labels0.schema("lbl").dataType
    val fix = Iterate.loop(labels0, maxRounds) { (labels, it) =>
      val prop = bi.join(labels, col("a") === col("v"))
        .select(col("b").as("v"), col("lbl"), lit(null).cast(lblType).as("old"))
      val hop = labels.select(col("v"), col("lbl"), col("lbl").as("old"))
        .unionAll(prop)
        .groupBy("v").agg(min(col("lbl")).as("lbl"), min(col("old")).as("old"))
      // Pointer doubling costs a second shuffle join per round — pure
      // overhead on the common (pre-contracted, diameter 1-2) case, so:
      // plain propagation first, doubling from round 4. Reach then grows
      // d -> 2d+1 per round (3, 7, 15, ...), keeping the worst case
      // logarithmic (diameter-100 spec: <= 10 rounds incl. detection).
      // The self-join is total because every lbl value is itself a vertex
      // (ids only ever come from the vertex set).
      if (it < 4) hop
      else {
        val ptr = hop.select(col("v").as("pv"), col("lbl").as("plbl"))
        hop.join(ptr, col("lbl") === col("pv"))
          .select(col("v"), col("plbl").as("lbl"), col("old"))
      }
    } { (_, next) => next.filter(col("lbl") =!= col("old")).count() == 0L }
    bi.unpersist()
    forest.unpersist()
    if (fix.prev != null) fix.prev.unpersist()
    (fix.cur.select("v", "lbl"), fix.rounds)
  }

  val q37_dup_clusters: Query = Query(
    s"""WITH RECURSIVE
       | $pairCtesSql,
       | e AS (SELECT d1, d2 FROM j WHERE jac >= $JaccardTau),
       | bi AS (SELECT d1 AS a, d2 AS b FROM e UNION SELECT d2, d1 FROM e),
       | verts AS (SELECT DISTINCT a AS v FROM bi),
       | reach(v, r) AS (SELECT v, v FROM verts
       |                 UNION
       |                 SELECT bi.b, reach.r FROM reach JOIN bi ON bi.a = reach.v),
       | comp AS (SELECT v AS doc_id, min(r) AS cluster_id FROM reach GROUP BY v)
       |SELECT cluster_id, count(*) AS n_docs, min(doc_id) AS min_doc, max(doc_id) AS max_doc
       |FROM comp GROUP BY cluster_id
       |ORDER BY cluster_id""") { (s, dir) =>
    val (labels, _) = connectedComponents(jaccardPairs(s, dir).select("d1", "d2"))
    labels
      .groupBy(col("lbl").as("cluster_id"))
      .agg(count(lit(1)).as("n_docs"), min(col("v")).as("min_doc"), max(col("v")).as("max_doc"))
      .orderBy("cluster_id")
  }

  /** Q37b — dedup-cluster representative selection: q37's connected
    * components decide WHICH documents are mutual near-dups; this decides
    * WHICH ONE survives. Instead of q46/q25's keep-first-by-id policy,
    * each cluster keeps its highest-q22-quality member (ties broken by
    * doc_id, so the choice is total and engine-stable) — the retention
    * policy the curation literature actually recommends, since the
    * first-by-id doc is often the worst OCR scan of the group.
    *
    * Scale posture: the cluster labels come from the same contracted
    * label propagation as q37 (one partition-local union-find pass plus
    * O(log diameter) global rounds); quality is a per-row map over the
    * documents scan; the representative choice is one window keyed by
    * cluster_id — cluster-sized partitions, never a global sort. Joining
    * labels (tiny: only docs that HAVE a near-dup) to quality broadcasts
    * the label side at any scale where dup clusters are rare relative to
    * the corpus. */
  val q37b_cluster_reps: Query = Query(
    s"""WITH RECURSIVE
       | $pairCtesSql,
       | e AS (SELECT d1, d2 FROM j WHERE jac >= $JaccardTau),
       | bi AS (SELECT d1 AS a, d2 AS b FROM e UNION SELECT d2, d1 FROM e),
       | verts AS (SELECT DISTINCT a AS v FROM bi),
       | reach(v, r) AS (SELECT v, v FROM verts
       |                 UNION
       |                 SELECT bi.b, reach.r FROM reach JOIN bi ON bi.a = reach.v),
       | comp AS (SELECT v AS doc_id, min(r) AS cluster_id FROM reach GROUP BY v),
       | $qualitySignalsSql,
       | q AS (SELECT doc_id, $qualityColSql AS quality FROM f),
       | scored AS (SELECT c.cluster_id, c.doc_id, q.quality,
       |                   count(*) OVER (PARTITION BY c.cluster_id) AS n_docs,
       |                   row_number() OVER (PARTITION BY c.cluster_id
       |                                      ORDER BY q.quality DESC, c.doc_id) AS rn
       |            FROM comp c JOIN q ON q.doc_id = c.doc_id)
       |SELECT cluster_id, doc_id AS rep_doc, quality AS rep_quality, n_docs
       |FROM scored WHERE rn = 1
       |ORDER BY cluster_id""") { (s, dir) =>
    import org.apache.spark.sql.expressions.Window
    val (labels, _) = connectedComponents(jaccardPairs(s, dir).select("d1", "d2"))
    val quality = qualitySignals(s, dir).select(col("doc_id"), qualityCol.as("quality"))
    val w = Window.partitionBy("cluster_id")
    labels.select(col("lbl").as("cluster_id"), col("v").as("doc_id"))
      .join(quality, "doc_id")
      .withColumn("n_docs", count(lit(1)).over(w))
      .withColumn("rn", row_number().over(w.orderBy(col("quality").desc, col("doc_id"))))
      .where(col("rn") === 1)
      .select(col("cluster_id"), col("doc_id").as("rep_doc"),
        col("quality").as("rep_quality"), col("n_docs"))
      .orderBy("cluster_id")
  }

  /** Q54 — passage-level exact dedup (the practical middle ground between
    * q16's whole-doc dedup and q25/q26's near-dup detection; cf. Lee et
    * al., "Deduplicating Training Data Makes Language Models Better",
    * which dedups repeated spans rather than whole documents). Each doc
    * is cut into non-overlapping 20-word passages; a passage occurrence
    * is a duplicate unless it is the globally-first occurrence of that
    * passage text, ordered by (doc_id, passage_idx). Emits per-doc
    * passage/duplicate accounting.
    *
    * Shapes: one groupBy(passage) with map-side-combinable min() finds
    * first occurrences; the join back is SHUFFLE_HASH so the fat passage
    * stream is never sorted (q47's pattern). The global order key packs
    * (doc_id, idx) into one long — exact while idx < 2^20 (docs under
    * ~21M words) and doc_id < 2^43. Grouping keys are the passage strings
    * themselves: exact by construction; at petabyte scale swap the key
    * for xxhash64(passage) (2^-64 collision odds) or re-verify matches
    * exactly like q25's merge-walk — same plan shape either way. */
  /** (doc_id, i, ptext, okey) — every document cut into non-overlapping
    * 20-word passages; okey packs (doc_id, idx) into one long (exact
    * while idx < 2^20 and doc_id < 2^43). Shared by q54 (exact) and
    * q54b (near-dup). */
  private[graft] def passagesOf(s: SparkSession, dir: String): DataFrame = {
    val P = 20
    // no size(a) > 0 guard: split() never yields an empty array (the
    // oracle's WHERE len(a) > 0 is equally vacuous in DuckDB), and the
    // pushed-down filter would re-run the regex-normalize+split in the
    // scan stage just to test a tautology
    // tiny fixtures arrive as ONE parquet row group, so the scan (and
    // with it the regex normalize + split + passage build, the query's
    // single biggest CPU block) would run on ONE core. Below the
    // broadcast gate the raw text is at most ~2 MB — an exchange of it
    // is ~free and buys 32-way passage building. Past the gate the
    // fixture has many row groups and the repartition would only add an
    // exchange of the full corpus text, so it stays out of the plan.
    // text IS NOT NULL: a null-text doc has no passages on either engine
    // (the oracle's inner join from p2 omits it), but without the guard
    // the per-doc accounting frames in q54/q54b would emit it with null
    // n_pass — a row-count divergence. The filter is on the RAW column
    // (parquet-pushable null check, no regex re-run); fixtures happen to
    // never mint null text, so this is belt-and-braces for real corpora.
    val base = docs(s, dir).filter(col("text").isNotNull)
    val scan =
      if (parquetBytes(dir, "documents") <= PassageBroadcastGate)
        base.repartition(col("doc_id")) else base
    scan
      .select(col("doc_id"), split(norm, " ").as("a"))
      .select(col("doc_id"), posexplode(expr(
        s"transform(sequence(0, cast(ceil(size(a)/$P.0) as int) - 1)," +
          s" i -> array_join(slice(a, i*$P+1, $P), ' '))")).as(Seq("i", "ptext")))
      .withColumn("okey", col("doc_id") * 1048576L + col("i"))
  }

  /** Shared q54/q54b oracle CTE prefix: passages (p2, with okey and the
    * word array) and the exact first-occurrence table (f). */
  private val passageCtesSql =
    s"""d AS (SELECT doc_id, string_split($normSql, ' ') AS a FROM documents),
       | p0 AS (SELECT doc_id, unnest(range(0, CAST(ceil(len(a)/20.0) AS BIGINT))) AS i, a
       |        FROM d WHERE len(a) > 0),
       | p2 AS (SELECT doc_id, i, array_to_string(a[i*20+1 : i*20+20], ' ') AS ptext,
       |               doc_id*1048576 + i AS okey
       |        FROM p0),
       | f AS (SELECT ptext, min(okey) AS first_okey FROM p2 GROUP BY ptext)""".stripMargin

  val q54_passage_dedup: Query = Query(
    s"""WITH $passageCtesSql,
       |     j AS (SELECT p2.doc_id,
       |                  CASE WHEN p2.okey = f.first_okey THEN 0 ELSE 1 END AS dup
       |           FROM p2 JOIN f USING (ptext))
       |SELECT doc_id, count(*) AS n_pass, CAST(sum(dup) AS BIGINT) AS n_dup,
       |       ${croundSql("sum(dup) * 1.0e0 / count(*)")} AS dup_ratio
       |FROM j GROUP BY 1 ORDER BY 1""") { (s, dir) =>
    // Round 12: the okey arithmetic q54b's accounting proved out — okey
    // encodes its owning doc (okey div 2^20) and each distinct ptext
    // contributes exactly ONE non-duplicate passage, at its first okey —
    // applied to the exact-dup rollup itself: n_dup(doc) = n_pass(doc) −
    // #(first okeys the doc owns), with n_pass a SCALAR of the document
    // (ceil(#words/20)). The oracle's fat p2⋈f ptext equi-join (both
    // engines' dominant cost) disappears entirely; the only corpus-scale
    // exchange left is the [[passageReps]] groupBy — SHARED with q54b in
    // any real session, so a pipeline running both pays it once.
    val nullL = lit(null).cast("long")
    // text IS NOT NULL mirrors passagesOf's guard: the oracle's inner
    // join omits null-text docs entirely, so the scalar n_pass side
    // must too (raw-column null check, no regex re-run)
    val perDoc = docs(s, dir).filter(col("text").isNotNull)
      .select(col("doc_id"), size(split(norm, " ")).as("nw"))
      .select(col("doc_id"),
        expr("cast(ceil(nw / 20.0) as bigint)").as("n_pass"), nullL.as("rep"))
    val repRows = passageReps(s, dir)
      .select(expr("doc_id div 1048576").as("doc_id"),
        nullL.as("n_pass"), lit(1L).as("rep"))
    perDoc.unionByName(repRows)
      .groupBy("doc_id")
      .agg(max(col("n_pass")).as("n_pass"), count(col("rep")).as("n_rep"))
      .select(col("doc_id"), col("n_pass"),
        (col("n_pass") - col("n_rep")).as("n_dup"))
      .withColumn("dup_ratio",
        cround(col("n_dup").cast("double") / col("n_pass")))
      .orderBy("doc_id")
  }

  /** q54b's ONE persisted intermediate: one row per DISTINCT passage
    * text — (doc_id = its globally-first okey, gs = sorted distinct
    * word-trigram xxhash64 set, n = |gs|). Word trigrams (not char
    * 5-grams): a 20-word passage yields ≤18 of them, and cross-text
    * trigram sharing is sparse enough that both the candidate joins and
    * the oracle's shared-shingle join stay near-linear. Passages under
    * 3 words have no trigram (gs = [], n = 0) and are exempt from
    * near-dup detection (can't score a jaccard; both engines skip them
    * identically) — they stay IN this frame because the per-doc exact
    * accounting counts every rep, trigram-bearing or not.
    *
    * Round 12: built in ONE pass over the passage stream (groupBy(ptext)
    * min(okey), then the trigram projection over the ~|distinct| result
    * rows) instead of the round-11 firsts-persist → repSets-persist
    * chain — q54b paid two persisted frames and an extra stage boundary
    * for data this single aggregation already had in hand. SHARED with
    * q54, whose exact-dup rollup needs only the per-doc first-okey
    * counts (the okey arithmetic): a session running the full Lee-et-al
    * pipeline pays the one fat groupBy(ptext) exchange once. The
    * trigram column costs q54 ~0.4 executor-CPU-s at sf0.1 — noise next
    * to the ptext join it replaced. */
  private[graft] def passageReps(s: SparkSession, dir: String): DataFrame =
    memo("q54b.reps", s, dir) {
      passagesOf(s, dir)
        .groupBy("ptext").agg(min(col("okey")).as("doc_id"))
        // fused codegen trigram hashing (WordNgramHashesSpec pins
        // equality with the interpreted
        // array_sort(array_distinct(transform(...))) form this replaced
        // — measured 7.6 s CPU in q54b's rep stage); <3-word passages
        // yield [] inside the expression itself, keeping the element
        // type non-null for the sorted-intersect consumer
        .select(col("doc_id"),
          expr("graft_word_ngram_hashes(split(ptext, ' '), 3)").as("gs"))
        .select(col("doc_id"), col("gs"), size(col("gs")).cast("long").as("n"))
        .persist()
    }

  /** The trigram-bearing reps (n ≥ 1) — the near-dup candidate universe.
    * A filter over the persisted [[passageReps]] blocks, not its own
    * persist. */
  private[graft] def passageRepSets(s: SparkSession, dir: String): DataFrame =
    passageReps(s, dir).filter(col("n") > 0)

  /** Byte size of one table's parquet (file or Spark-written directory)
    * — a gate input decidable from filesystem metadata alone, before
    * any job runs (the q85b parquet-metadata gate pattern). */
  private def parquetBytes(dir: String, table: String): Long = {
    def sizeOf(p: java.io.File): Long =
      if (p.isDirectory) Option(p.listFiles()).map(_.map(sizeOf).sum).getOrElse(0L)
      else p.length()
    sizeOf(new java.io.File(s"$dir/$table.parquet"))
  }

  /** Gate for q54b's candidate stage: below it the counted shared-
    * trigram self-join (exact |A∩B| straight from the join — no verify
    * attach, no df ranking; the DuckDB statement's own plan, 2 + 2
    * exchanges total); past it the PPJoin prefix filter, whose
    * near-linear candidate volume is the 100 TB property the counted
    * join lacks (Σ df(g)² blowup on hot trigrams). 256 MB of documents
    * parquet ≈ 10× the 30× fixture, where the counted join still runs
    * in seconds with zero spill; both sides are EXACT, and DedupSpec
    * equates them on the fixture. */
  private[graft] val PassageCountJoinGate = 256L * 1024 * 1024

  /** Sub-gate inside the counted tier: below it the candidate stage runs
    * as [[countedPairsKernel]] — the rep trigram lists ride ONE driver
    * collect + broadcast and the whole intersection count happens in a
    * single narrow map stage over the cached reps, emitting only the
    * ~dozens of surviving pairs. The declarative counted join was
    * measured at 5 executor-CPU-s + a ~1M-row partial-agg exchange at
    * sf0.1 for output of 192 rows — all of it Spark machinery around
    * arithmetic the kernel does in <0.2 s. Budget: 2 MB of documents
    * parquet ≈ 3.5× the sf0.1 fixture; sf0.1 measures 230k exploded
    * (g, doc, n) rows, so the ceiling is ~800k ≈ 13 MB interleaved
    * longs — trivial for driver and broadcast alike. Past the gate the
    * shuffle-counted join takes over (same exact semantics, distributed
    * end to end), then PPJoin past [[PassageCountJoinGate]]. */
  private[graft] val PassageBroadcastGate = 2L * 1024 * 1024

  /** Verified near-dup rep pairs (o1 < o2 by okey, jac ≥ [[JaccardTau]])
    * — EXACT at every size, gated between two exact plans by
    * [[PassageCountJoinGate]]. Round 11: this was MinHash banding (the
    * q26 pattern) until the 30× campaign caught banding's recall
    * against the exact oracle — 8 bands × 6 rows catches a jac≈τ pair
    * with p ≈ 0.91, and at 30× the replica perturbation minted enough
    * near-τ rep pairs that some landed in the missing 9%
    * (n_neardup_rep under-reported on ~150 of 150k docs; sf0.01/sf0.1
    * simply never had a marginal pair). q54b's declared semantics are
    * exact-τ (the oracle brute-forces all pairs), so the candidate
    * stage must be exact too. Banding remains the right tool where the
    * semantics are declared approximate (q26/q30/q60). */
  /** Broadcast-tier exact counted intersection (below
    * [[PassageBroadcastGate]]): collect the rep trigram lists once
    * (driver budget in the gate note), broadcast g → interleaved
    * [d, n, d, n, …] partner lists keyed by a sorted array
    * (binary-search probes, zero boxing), and count each pair's
    * |A∩B| in ONE narrow map pass over the cached reps — rep d1's
    * partition-local accumulator sees every shared trigram exactly once
    * because gs is distinct, so the count IS the intersection and the
    * τ test emits final pairs with no join, no aggregation exchange,
    * and no candidate materialization. Deterministic under stage
    * retries: output is a pure function of the broadcast and the
    * partition's rows, emitted in sorted-d2 order per rep. Exactness is
    * pinned against both distributed tiers (DedupSpec: kernel ≡
    * shuffle-counted ≡ PPJoin ≡ brute force). */
  /** g → interleaved [d, n, d, n, …] partner lists over the trigram-
    * bearing reps, collected once (driver budget: the
    * [[PassageBroadcastGate]] note) and broadcast keyed by a sorted
    * array — binary-search probes, zero boxing. Shares the graph
    * kernels' broadcast lifecycle (released by resetCaches together
    * with the memoized frames). */
  private val partnerIdxCache =
    scala.collection.mutable.Map.empty[(SparkSession, String),
      org.apache.spark.broadcast.Broadcast[(Array[Long], Array[Int], Array[Long])]]

  /** Memoized per (session, dir) like the q54b.reps frame it derives
    * from (ADVICE r12: the eager collect + broadcast ran on EVERY q54b
    * plan construction, accumulating tracked broadcasts until
    * resetCaches); destruction rides the tracked-broadcast lifecycle,
    * the map is forgotten in the same [[resetCaches]] call. */
  private def trigramPartnerIndex(s: SparkSession, dir: String)
      : org.apache.spark.broadcast.Broadcast[(Array[Long], Array[Int], Array[Long])] =
    partnerIdxCache.synchronized(partnerIdxCache.getOrElseUpdate((s, dir),
      buildTrigramPartnerIndex(s, passageRepSets(s, dir))))

  private def buildTrigramPartnerIndex(s: SparkSession, psets: DataFrame)
      : org.apache.spark.broadcast.Broadcast[(Array[Long], Array[Int], Array[Long])] = {
    import s.implicits._
    val reps = psets.select(col("doc_id"), col("n"), col("gs"))
      .as[(Long, Long, Array[Long])].collect()
    // CSR layout (keys / offsets / flat interleaved [d, n, …]) instead
    // of 230k tiny Array[Long] objects: three primitive arrays
    // serialize in one block, probe with one pointer chase, and cost
    // the driver zero per-entry headers. Two counting passes beat a
    // builder-per-key map at this shape.
    val keyList = new scala.collection.mutable.LongMap[Int]() // g -> slot
    reps.foreach(r => r._3.foreach(g => keyList.getOrElseUpdate(g, keyList.size)))
    val keys = keyList.keysIterator.toArray
    java.util.Arrays.sort(keys)
    val slot = new scala.collection.mutable.LongMap[Int](keys.length)
    keys.indices.foreach(i => slot(keys(i)) = i)
    val counts = new Array[Int](keys.length)
    reps.foreach(r => r._3.foreach(g => counts(slot(g)) += 2))
    val offsets = new Array[Int](keys.length + 1)
    keys.indices.foreach(i => offsets(i + 1) = offsets(i) + counts(i))
    val flat = new Array[Long](offsets(keys.length))
    val cursor = offsets.clone()
    reps.foreach { case (d, n, gs) =>
      gs.foreach { g =>
        val si = slot(g)
        flat(cursor(si)) = d; flat(cursor(si) + 1) = n; cursor(si) += 2
      }
    }
    Graph.track(s.sparkContext.broadcast((keys, offsets, flat)))
  }

  private[graft] def countedPairsKernel(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val psets = passageRepSets(s, dir)
    val bc = trigramPartnerIndex(s, dir)
    psets.select(col("doc_id"), col("n"), col("gs"))
      .as[(Long, Long, Array[Long])]
      .mapPartitions { it =>
        val (ks, offs, flat) = bc.value
        it.flatMap { case (d1, n1, gs) =>
          // d2 → (n2 << 32) | count; n ≤ 18 trigrams per 20-word
          // passage, so the packing has ~2^28 headroom
          val acc = new scala.collection.mutable.LongMap[Long]()
          var i = 0
          while (i < gs.length) {
            val gi = java.util.Arrays.binarySearch(ks, gs(i))
            if (gi >= 0) {
              var j = offs(gi)
              val end = offs(gi + 1)
              while (j < end) {
                val d2 = flat(j)
                if (d2 > d1) {
                  val cur = acc.getOrElse(d2, 0L)
                  acc(d2) = if (cur == 0L) (flat(j + 1) << 32) | 1L else cur + 1L
                }
                j += 2
              }
            }
            i += 1
          }
          val out = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Double)]
          acc.foreach { case (d2, packed) =>
            val inter = packed & 0xffffffffL
            val n2 = packed >>> 32
            if (TauDen * inter >= TauNum * (n1 + n2 - inter))
              out += ((d1, d2, inter * 1.0 / (n1 + n2 - inter)))
          }
          out.sortBy(_._2)
        }
      }
      .toDF("d1", "d2", "jac")
  }

  /** Broadcast-tier accounting kernel: the near-dup REPS themselves —
    * every trigram-bearing rep r with an EARLIER τ-similar rep (∃ d < r,
    * jac(d, r) ≥ τ) — emitted one row per such rep, so the accounting
    * needs no pair materialization and no DISTINCT: it is
    * [[countedPairsKernel]]'s loop with the comparison flipped (d < r
    * instead of d > r), answering q54b's actual question ("is this rep
    * dominated?") directly. Equality with the pair route is pinned by
    * DedupSpec (flags ≡ distinct d2 of the pairs frame). */
  private[graft] def nearDupRepsKernel(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val psets = passageRepSets(s, dir)
    val bc = trigramPartnerIndex(s, dir)
    psets.select(col("doc_id"), col("n"), col("gs"))
      .as[(Long, Long, Array[Long])]
      .mapPartitions { it =>
        val (ks, offs, flat) = bc.value
        it.flatMap { case (r, n1, gs) =>
          val acc = new scala.collection.mutable.LongMap[Long]()
          var i = 0
          while (i < gs.length) {
            val gi = java.util.Arrays.binarySearch(ks, gs(i))
            if (gi >= 0) {
              var j = offs(gi)
              val end = offs(gi + 1)
              while (j < end) {
                val d = flat(j)
                if (d < r) {
                  val cur = acc.getOrElse(d, 0L)
                  acc(d) = if (cur == 0L) (flat(j + 1) << 32) | 1L else cur + 1L
                }
                j += 2
              }
            }
            i += 1
          }
          val nd = acc.exists { case (_, packed) =>
            val inter = packed & 0xffffffffL
            val n2 = packed >>> 32
            TauDen * inter >= TauNum * (n1 + n2 - inter)
          }
          if (nd) Iterator.single(Tuple1(r)) else Iterator.empty
        }
      }
      .toDF("nd_okey")
  }

  private[graft] def passageNearDupPairs(s: SparkSession, dir: String,
      forcePpjoin: Boolean = false, forceCountShuffle: Boolean = false): DataFrame =
    memo(if (forcePpjoin) "q54b.pairsPp"
         else if (forceCountShuffle) "q54b.pairsCs"
         else "q54b.pairs", s, dir) {
      // the rep frame is the memo-registered persist ([[passageReps]]);
      // psets is a filter over its cached blocks. resetCaches() owns
      // the lifecycle exactly as for the doc-level shingle frames.
      val psets = passageRepSets(s, dir)
      val docBytes = parquetBytes(dir, "documents")
      if (!forcePpjoin && !forceCountShuffle && docBytes <= PassageBroadcastGate) {
        countedPairsKernel(s, dir)
      } else if (!forcePpjoin && docBytes <= PassageCountJoinGate) {
        // counted join: gs holds DISTINCT trigram hashes per rep, so the
        // per-pair row count of the shared-trigram self-join IS |A∩B|;
        // n rides the exploded rows (no cnt-table rejoin), the size-
        // ratio prefilter kills mismatched pairs before the aggregation,
        // and the τ test is exact integer arithmetic (TauNum note).
        val tg = psets.select(col("doc_id"), col("n"), explode(col("gs")).as("g"))
        tg.select(col("doc_id").as("d1"), col("n").as("n1"), col("g"))
          .join(tg.select(col("doc_id").as("d2"), col("n").as("n2"), col("g")), "g")
          .filter(col("d1") < col("d2"))
          .filter(lit(TauDen) * col("n1") >= lit(TauNum) * col("n2") &&
            lit(TauDen) * col("n2") >= lit(TauNum) * col("n1"))
          .groupBy("d1", "d2", "n1", "n2").agg(count(lit(1)).as("inter"))
          .filter(lit(TauDen) * col("inter") >= lit(TauNum) * (col("n1") + col("n2") - col("inter")))
          .select(col("d1"), col("d2"),
            (col("inter") * lit(1.0) / (col("n1") + col("n2") - col("inter"))).as("jac"))
      } else {
        val sh = psets.select(col("doc_id"), explode(col("gs")).as("g"))
        val (cand, prefix) = ppjoinCandidates(sh)
        memo("q54b.prefix", s, dir)(prefix)
        // adaptive=true: rep-level candidate volume is a runtime
        // quantity — let AQE pick broadcast-vs-shuffle from the
        // candidate aggregation's actual shuffle stats instead of
        // forcing the doc-level shuffle-hash shape, which paid two full
        // exchanges of the rep arrays to attach 192 rows.
        rawJaccard(psets, cand, adaptive = true)
      }
    }

  /** Q54b — passage dedup at near-dup strength (the Lee et al. pipeline
    * shape, fuzzy variant): exact dedup first collapses every repeated
    * passage text onto its first occurrence (q54's accounting), THEN
    * EXACT near-dup detection runs over the surviving representatives
    * only ([[passageNearDupPairs]]: counted shared-trigram join below
    * [[PassageCountJoinGate]], PPJoin prefix filtering past it — both
    * exact) — a rep is additionally dropped when an earlier rep is
    * jaccard-similar (word trigrams, τ = [[JaccardTau]]). Composing
    * exact-then-fuzzy is what keeps this scale-sane: an exact-dup
    * clique of k passages contributes ONE rep to the candidate join
    * instead of k²/2 pairs, and past the gate prefix filtering keeps
    * the candidate volume near-linear (Chaudhuri et al.). Emits
    * per-doc accounting: exact dups, rep near-dups, combined ratio. */
  val q54b_passage_neardup: Query = Query(
    s"""WITH $passageCtesSql,
       |     reps AS (SELECT f.first_okey AS okey, string_split(f.ptext, ' ') AS w FROM f),
       |     tg AS (SELECT DISTINCT okey, array_to_string(w[k : k+2], ' ') AS g
       |            FROM reps, unnest(range(1, len(w) - 1)) AS t(k)
       |            WHERE len(w) >= 3),
       |     cnt AS (SELECT okey, count(*) AS n FROM tg GROUP BY 1),
       |     prs AS (SELECT a.okey AS o1, b.okey AS o2, count(*) AS inter
       |             FROM tg a JOIN tg b ON a.g = b.g AND a.okey < b.okey
       |             GROUP BY 1, 2),
       |     nd AS (SELECT DISTINCT o2
       |            FROM prs JOIN cnt ca ON ca.okey = o1 JOIN cnt cb ON cb.okey = o2
       |            WHERE inter * 1e0 / (ca.n + cb.n - inter) >= $JaccardTau),
       |     j AS (SELECT p2.doc_id,
       |                  CASE WHEN p2.okey <> f.first_okey THEN 1 ELSE 0 END AS exact_dup,
       |                  CASE WHEN p2.okey = f.first_okey AND nd.o2 IS NOT NULL
       |                       THEN 1 ELSE 0 END AS near_dup
       |           FROM p2 JOIN f USING (ptext) LEFT JOIN nd ON nd.o2 = p2.okey)
       |SELECT doc_id, count(*) AS n_pass,
       |       CAST(sum(exact_dup) AS BIGINT) AS n_exact_dup,
       |       CAST(sum(near_dup) AS BIGINT) AS n_neardup_rep,
       |       ${croundSql("(sum(exact_dup) + sum(near_dup)) * 1.0e0 / count(*)")} AS dup_ratio
       |FROM j GROUP BY 1 ORDER BY 1""") { (s, dir) =>
    // Round 11 accounting WITHOUT the passages⋈firsts rejoin: okey
    // encodes its owning doc (okey div 2^20), and each distinct ptext
    // contributes exactly ONE non-duplicate occurrence — at its first
    // okey. So per doc: n_exact_dup = n_pass − (#reps whose first_okey
    // the doc owns), and n_neardup_rep = #near-dup rep okeys the doc
    // owns. That removes the TWO fat exchanges the ptext equi-join paid
    // (r10's committed 2.9-3.9× of the DuckDB statement was mostly this
    // plumbing): the only passage-text exchange left is the
    // [[passageReps]] groupBy itself, the per-doc passage count
    // collapses map-side (passages arrive doc-contiguous from the
    // scan), and the remaining joins are doc-sized.
    // n_pass is a SCALAR of the document — ceil(#words/20) — so the
    // per-doc passage count needs no explode and no exchange at all.
    // Round 12: the three doc-keyed facts (n_pass, rep count, distinct
    // near-dup rep count) arrive as ONE tagged union into ONE grouped
    // aggregate instead of two aggregates + two left joins — every doc
    // with passages owns exactly one n_pass row (max() picks it), the
    // rep/nd sides contribute count()/count(DISTINCT) rows, and the
    // whole accounting costs a single doc_id exchange.
    val nullL = lit(null).cast("long")
    // the oracle's len(a) > 0 guard is vacuous on BOTH engines
    // (string_split of "" yields [""], so every doc has ≥1 "word") —
    // dropping it here saves a second regex-normalize+split pass the
    // pushed-down filter would otherwise pay in the scan stage. The
    // text IS NOT NULL guard is NOT vacuous (q54's note) and stays.
    val perDoc = docs(s, dir).filter(col("text").isNotNull)
      .select(col("doc_id"), size(split(norm, " ")).as("nw"))
      .select(col("doc_id"),
        expr("cast(ceil(nw / 20.0) as bigint)").as("n_pass"),
        nullL.as("rep"), nullL.as("nd_okey"))
    val repRows = passageReps(s, dir)
      .select(expr("doc_id div 1048576").as("doc_id"),
        nullL.as("n_pass"), lit(1L).as("rep"), nullL.as("nd_okey"))
    // the near-dup rep okeys, already DISTINCT: one flags-kernel row per
    // dominated rep below the broadcast gate; a 192-row-scale distinct
    // over the pair frame's d2 past it. Either way the final aggregate
    // is a plain count — no count(DISTINCT) double-aggregation rewrite
    // inflating the 20k-row union into an Expand.
    val ndDistinct =
      if (parquetBytes(dir, "documents") <= PassageBroadcastGate)
        nearDupRepsKernel(s, dir)
      else passageNearDupPairs(s, dir).select(col("d2").as("nd_okey")).distinct()
    val ndRows = ndDistinct
      .select(expr("nd_okey div 1048576").as("doc_id"),
        nullL.as("n_pass"), nullL.as("rep"), lit(1L).as("nd_okey"))
    perDoc.unionByName(repRows).unionByName(ndRows)
      .groupBy("doc_id")
      .agg(max(col("n_pass")).as("n_pass"), count(col("rep")).as("n_rep"),
        count(col("nd_okey")).as("n_nd"))
      .select(col("doc_id"), col("n_pass"),
        (col("n_pass") - col("n_rep")).as("n_exact_dup"),
        col("n_nd").as("n_neardup_rep"))
      .withColumn("dup_ratio",
        cround((col("n_exact_dup") + col("n_neardup_rep")).cast("double")
          / col("n_pass")))
      .orderBy("doc_id")
  }

  /** Q57 — BM25 retrieval scoring (Robertson k1 = 1.2, b = 0.75, Lucene
    * idf = ln(1 + (N − df + 0.5)/(df + 0.5))): top-10 documents for a
    * fixed 3-term keyword query — the retrieval primitive a
    * training-data curation stack uses for targeted corpus slicing.
    *
    * Shapes for 100 TB: the query-term filter runs BEFORE the tf
    * aggregation (map-side prune of the token stream to ≤|query| terms
    * per doc), df and the (N, avgdl) stats are 3-row/1-row broadcasts,
    * the per-doc length table joins on doc_id as a plain equi-join
    * (both sides shrink with the term filter via the tf side), and the
    * global top-10 is TakeOrderedAndProject — nothing quadratic,
    * nothing collected. Ordering is on the ROUNDED score with doc_id
    * tiebreak so both engines rank identically even at float-ulp
    * score ties. */
  val q57_bm25: Query = {
    val terms = Seq("merge", "window", "stream")
    val termsSql = terms.map(t => s"'$t'").mkString(", ")
    Query(
      s"""WITH tok AS (SELECT doc_id, unnest(string_split($normSql, ' ')) AS w FROM documents),
         |     dl AS (SELECT doc_id, count(*) AS dl FROM tok GROUP BY 1),
         |     stats AS (SELECT CAST(count(*) AS BIGINT) AS n, avg(dl * 1e0) AS avgdl FROM dl),
         |     tf AS (SELECT doc_id, w, count(*) AS tf FROM tok
         |            WHERE w IN ($termsSql) GROUP BY 1, 2),
         |     df AS (SELECT w, count(*) AS df FROM tf GROUP BY 1),
         |     sc AS (SELECT tf.doc_id,
         |                   sum(ln(1e0 + (n - df + 0.5e0) / (df + 0.5e0)) *
         |                       tf * 2.2e0 / (tf + 1.2e0 * (0.25e0 + 0.75e0 * dl.dl / avgdl))) AS score
         |            FROM tf JOIN df USING (w) JOIN dl USING (doc_id) CROSS JOIN stats
         |            GROUP BY 1)
         |SELECT doc_id, ${croundSql("score")} AS bm25
         |FROM sc ORDER BY bm25 DESC, doc_id LIMIT 10""") { (s, dir) =>
      val tok = docs(s, dir).select(col("doc_id"), explode(split(norm, " ")).as("w"))
      val dl = tok.groupBy("doc_id").agg(count(lit(1)).as("dl"))
      val stats = dl.agg(count(lit(1)).cast("long").as("n"),
        avg(col("dl") * lit(1.0)).as("avgdl"))
      val tf = tok.filter(col("w").isin(terms: _*))
        .groupBy("doc_id", "w").agg(count(lit(1)).as("tf"))
      val dfT = tf.groupBy("w").agg(count(lit(1)).as("df"))
      tf.join(broadcast(dfT), "w")
        .join(dl, "doc_id")
        .crossJoin(broadcast(stats))
        .select(col("doc_id"),
          (log(lit(1.0) + (col("n") - col("df") + lit(0.5)) / (col("df") + lit(0.5))) *
            col("tf") * lit(2.2) /
            (col("tf") + lit(1.2) * (lit(0.25) + lit(0.75) * col("dl") / col("avgdl"))))
            .as("contrib"))
        .groupBy("doc_id").agg(sum(col("contrib")).as("score"))
        .select(col("doc_id"), cround(col("score")).as("bm25"))
        .orderBy(col("bm25").desc, col("doc_id")).limit(10)
    }
  }

  /** Q59 — doc-sharded inverted index: term → per-shard posting lists
    * plus the term's global document frequency. Sharding postings by
    * doc_id range (shard = doc_id div 100) is the load-bearing scale
    * decision: a flat `groupBy(term).collect_list(doc_id)` puts a
    * stopword's entire posting list — billions of ids at corpus scale —
    * into ONE aggregation group, while here every (term, shard) group is
    * bounded by the shard's document count no matter how common the term
    * is (the same doc-partitioned layout every search engine shards its
    * index by). The global df then costs only a window-sum over the
    * already-tiny (term, shard) rows, never a second pass over the token
    * stream. Postings are sorted within shard, so the full ordered list
    * is the shard-order concatenation. */
  val q59_inverted_index: Query = Query(
    s"""WITH tok AS (SELECT DISTINCT unnest(string_split($normSql, ' ')) AS term, doc_id
       |             FROM documents),
       |     t AS (SELECT term, doc_id FROM tok WHERE length(term) >= 4)
       |SELECT term, doc_id // 100 AS shard, count(*) AS n,
       |       CAST(sum(count(*)) OVER (PARTITION BY term) AS BIGINT) AS df,
       |       array_to_string(list(doc_id ORDER BY doc_id), ',') AS postings
       |FROM t GROUP BY 1, 2 ORDER BY term, shard""") { (s, dir) =>
    import org.apache.spark.sql.expressions.Window
    // distinct BEFORE explode is free here: doc_id is unique per input
    // row, so array_distinct on the per-doc token array IS the global
    // (term, doc_id) distinct — no extra exchange (the q25 shingle
    // lesson applied to words)
    val t = docs(s, dir)
      .select(col("doc_id"),
        explode(array_distinct(split(norm, " "))).as("term"))
      .filter(length(col("term")) >= 4)
    t.withColumn("shard", expr("doc_id div 100"))
      .groupBy("term", "shard")
      .agg(count(lit(1)).as("n"),
        expr("array_join(transform(sort_array(collect_list(doc_id)), x -> cast(x AS string)), ',')")
          .as("postings"))
      .withColumn("df", sum(col("n")).over(Window.partitionBy("term")))
      .select(col("term"), col("shard"), col("n"), col("df"), col("postings"))
      .orderBy("term", "shard")
  }

  /** Sources forming the "incoming batch" in q60 (the rest of the corpus
    * is the already-accepted snapshot). */
  private[graft] val incomingSources = Seq("src18", "src19")

  /** Q60 — incremental near-dup deduplication: dedup an INCOMING batch
    * against an existing corpus snapshot (the crawl-over-crawl pattern —
    * Lee et al.'s dedup applied incrementally instead of corpus-wide).
    * An incoming doc is dropped when it is jaccard-near-dup
    * (≥ [[JaccardTau]]) of ANY corpus doc, or of an EARLIER (smaller
    * doc_id) incoming doc; kept docs pass through with their source.
    *
    * Scale shape — the reason this operator exists apart from q25/q37:
    * full-corpus dedup recomputes corpus×corpus pairs every run, but the
    * incremental form only needs incoming×(corpus ∪ incoming)
    * candidates. Both sides carry the SAME LSH band keys as q26
    * ([[bandedOf]]), so candidates come from a (band, bh) equi-join of
    * the small incoming band table against the full band table — at
    * 100 TB the corpus side is a maintained artifact (written once,
    * appended per batch; cf. the streaming seen-store,
    * streaming/Streams.scala), and per-batch cost scales with the BATCH,
    * not the corpus. Verification is the shared exact-jaccard merge-walk
    * ([[rawJaccard]]) over candidate volume. */
  val q60_incremental_neardup: Query = {
    val incSql = incomingSources.map(s => s"'$s'").mkString(", ")
    Query(
      s"""WITH $pairCtesSql,
         | inc AS (SELECT doc_id FROM documents WHERE source IN ($incSql)),
         | dup AS (SELECT d2 AS doc FROM j WHERE jac >= $JaccardTau
         |           AND d2 IN (SELECT doc_id FROM inc)
         |         UNION
         |         SELECT d1 FROM j WHERE jac >= $JaccardTau
         |           AND d1 IN (SELECT doc_id FROM inc)
         |           AND d2 NOT IN (SELECT doc_id FROM inc))
         |SELECT doc_id, source FROM documents
         |WHERE source IN ($incSql) AND doc_id NOT IN (SELECT doc FROM dup)
         |ORDER BY doc_id""") { (s, dir) =>
      val d = docs(s, dir)
      val flags = d.select(col("doc_id"),
        col("source").isin(incomingSources: _*).as("inc"))
      val banded = bandedOfSets(shingleSets(s, dir)).join(flags, "doc_id")
      // incoming side vs everything: corpus partners in any id order,
      // incoming partners only when strictly earlier (first-wins)
      val cand = banded.filter(col("inc"))
        .select(col("doc_id").as("d1"), col("band"), col("bh"))
        .join(banded.select(col("doc_id").as("d2"), col("inc").as("inc2"),
          col("band"), col("bh")), Seq("band", "bh"))
        .filter(!col("inc2") || col("d2") < col("d1"))
        .filter(col("d1") =!= col("d2"))
        .select("d1", "d2").distinct()
      val dups = rawJaccard(shingleSets(s, dir), cand)
        .select(col("d1").as("doc_id")).distinct()
      d.filter(col("source").isin(incomingSources: _*))
        .join(dups, Seq("doc_id"), "left_anti")
        .select("doc_id", "source")
        .orderBy("doc_id")
    }
  }

  /** Greedy leftmost non-overlapping merge of one (l, r) symbol pair —
    * the BPE training inner loop. A UDF by the q30/q43 justification: a
    * fused primitive while-loop over a small array, where the HOF
    * equivalent (aggregate over indices with conditional skip-ahead) is
    * interpreted, allocation-heavy, and cannot express the skip cleanly. */
  private val bpeMergeUdf = udf { (syms: Seq[String], l: String, r: String) =>
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var i = 0
    while (i < syms.length) {
      if (i + 1 < syms.length && syms(i) == l && syms(i + 1) == r) {
        out += (l + r); i += 2
      } else { out += syms(i); i += 1 }
    }
    out.toSeq
  }

  /** BPE merge-rule learning (Sennrich et al. 2016) over the corpus word
    * frequencies — the tokenizer-training half of q23b's fertility
    * metric, and the third user of the [[graft.ops.Iterate]] discipline.
    *
    * Distributed shape: the only corpus-scale pass is the initial word
    * count (one token explode + one groupBy); every round after that
    * runs on the VOCABULARY table (|distinct words| rows — millions at
    * 100 TB, not the corpus's trillions of tokens), exploding each
    * word's adjacent symbol pairs (fanout < word length), aggregating
    * (l, r) sums, and taking the global argmax via TakeOrdered(1). The
    * argmax row is model state crossing the driver (the IVF-centroid
    * exemption); the k serial rounds are inherent — each merge rule
    * depends on the table the previous one rewrote — so k, not bytes,
    * is the cost to mind at scale, exactly Iterate's contract. Per
    * round: ONE materializing action (the argmax doubles as the
    * convergence check — stop when no pair repeats).
    *
    * Determinism: pair counts are exact long sums and ties break on
    * (count DESC, l ASC, r ASC), so the learned rules are a pure
    * function of the corpus. */
  /** Driver-local merge loop for the size-gated finish below: the same
    * argmax tie-break ((cnt DESC, l ASC, r ASC) — exact long sums) and
    * the same greedy leftmost non-overlapping rewrite as the
    * distributed rounds, so the two paths are interchangeable bit for
    * bit (BpeSpec runs both against the sequential reference). */
  private def bpeMergeLocal(vocab: Array[(Array[String], Long)],
      maxMerges: Int): Seq[(Int, String, String, Long)] = {
    var table = vocab
    val merges = scala.collection.mutable.ArrayBuffer.empty[(Int, String, String, Long)]
    var done = false
    while (!done && merges.length < maxMerges) {
      val counts = scala.collection.mutable.HashMap.empty[(String, String), Long]
      table.foreach { case (syms, f) =>
        var i = 1
        while (i < syms.length) {
          val k = (syms(i - 1), syms(i))
          counts(k) = counts.getOrElse(k, 0L) + f
          i += 1
        }
      }
      val best = counts.foldLeft(Option.empty[((String, String), Long)]) {
        case (acc, e @ ((l, r), c)) =>
          if (acc.forall { case ((al, ar), ac) =>
            c > ac || (c == ac && (l < al || (l == al && r < ar)))
          }) Some(e) else acc
      }
      best match {
        case Some(((l, r), c)) if c >= 2 =>
          merges += ((merges.length + 1, l, r, c))
          table = table.map { case (syms, f) =>
            val out = Array.newBuilder[String]
            var i = 0
            while (i < syms.length) {
              if (i + 1 < syms.length && syms(i) == l && syms(i + 1) == r) {
                out += (l + r); i += 2
              } else { out += syms(i); i += 1 }
            }
            (out.result(), f)
          }
        case _ => done = true
      }
    }
    merges.toSeq
  }

  /** BPE's corpus-scale feeder: word frequencies split into symbol
    * arrays — the ONE distributed pass both the driver-finish and the
    * Iterate-loop merge learners consume (also the fingerprint aux plan
    * for q69/q72, whose merge rules are driver-side state). */
  private[graft] def bpeInitVocab(s: SparkSession, dir: String): DataFrame =
    docs(s, dir)
      .select(explode(expr(s"regexp_extract_all($normExpr, '[a-z]+', 0)")).as("w"))
      .groupBy("w").agg(count(lit(1)).as("freq"))
      .select(split(col("w"), "").as("syms"), col("freq"))

  /** Fingerprint feeder plans for this file's driver-eager stages
    * (VERDICT r11 item 6 — a query whose heavy lifting happens before
    * a driver-side collect would otherwise hash only its trivial
    * post-collect plan): q37/q37b's clustering runs eagerly over the
    * verified pair frame (labels return as a LocalRelation below the
    * driver-finish gate), q69/q72's merge rules are a driver loop over
    * the collected vocabulary. The object-land halves (union-find,
    * local merge loop) have no plan to hash — DedupSpec/GoldenSpec
    * equivalences pin those. */
  private[graft] def fingerprintAuxPlan(name: String, s: SparkSession,
      dir: String): Option[(String, DataFrame)] = name match {
    case "q37_dup_clusters" | "q37b_cluster_reps" | "q71_curate_corpus" =>
      // q71 joined the list in round 12: its near-dup stage (exact pair
      // frame + connectedComponents) executes eagerly during plan
      // construction, so the labels enter q71's own plan as a
      // LocalRelation and the finder was invisible to the fingerprint
      Some(("connectedComponents over verified q25 jaccard pairs " +
        "(contracted union-find, driver-finish gate)",
        jaccardPairs(s, dir).select("d1", "d2")))
    case "q69_bpe_merges" | "q72_bpe_encode" =>
      Some(("bpe init vocab (corpus word-freq pass, collect gate)",
        bpeInitVocab(s, dir)))
    case _ => None
  }

  private[graft] def bpeMergeRules(s: SparkSession, dir: String,
      maxMerges: Int = 12,
      driverFinishMax: Long = 1L << 20): Seq[(Int, String, String, Long)] = {
    val pairs = expr(
      "transform(sequence(1, size(syms) - 1), i -> struct(syms[i-1] AS l, syms[i] AS r))")
    def bestPair(gen: DataFrame): Option[(String, String, Long)] =
      gen.filter(size(col("syms")) >= 2)
        .select(explode(pairs).as("p"), col("freq"))
        .groupBy(col("p.l").as("l"), col("p.r").as("r"))
        .agg(sum("freq").as("cnt"))
        .orderBy(col("cnt").desc, col("l").asc, col("r").asc)
        .limit(1).collect().headOption
        .map(row => (row.getString(0), row.getString(1), row.getLong(2)))
    val init = bpeInitVocab(s, dir).persist()
    // Size-gated driver finish (the q37 forest gate / IVF-centroid
    // exemption): after the one corpus-scale pass, the state is the
    // VOCABULARY table. When it fits the driver budget (~tens of MB at
    // the default gate), 12 serial distributed rounds — each a full
    // explode + exchange + argmax job — collapse into one collect and a
    // microsecond-scale local loop. Past the gate (100 TB corpora with
    // unbounded token universes) the Iterate rounds below run unchanged.
    val nVocab = init.count()
    if (nVocab <= driverFinishMax) {
      val vocab = init.collect().map(r =>
        (r.getSeq[String](0).toArray, r.getLong(1)))
      init.unpersist()
      return bpeMergeLocal(vocab, maxMerges)
    }
    val merges = scala.collection.mutable.ArrayBuffer.empty[(Int, String, String, Long)]
    // argmax over generation g is computed as generation g's single
    // action (in measure) and APPLIED in the next round's step — so the
    // loop body stays one-action-per-round with no extra barrier
    var pending = bestPair(init)
    if (pending.exists(_._3 >= 2)) {
      val fix = Iterate.loop(init, maxRounds = maxMerges) { (cur, it) =>
        val (l, r, f) = pending.get
        merges += ((it, l, r, f))
        cur.select(bpeMergeUdf(col("syms"), lit(l), lit(r)).as("syms"), col("freq"))
      } { (_, next) =>
        pending = if (merges.length == maxMerges) None else bestPair(next)
        pending.forall(_._3 < 2)
      }
      fix.cur.unpersist()
      if (fix.prev != null) fix.prev.unpersist()
    }
    init.unpersist()
    merges.toSeq
  }

  /** Oracle SQL for [[q69_bpe_merges]]: the 12-round merge loop unrolled
    * as chained CTEs (the q71 replay pattern, but iteration is unrolled
    * since each round's argmax feeds the next round's rewrite). Each
    * word's segmentation is encoded as `<sym><sym>...`; applying merge
    * (l, r) is then a plain left-to-right `replace('<l><r>' -> '<lr>')`,
    * which is exactly the greedy leftmost non-overlapping merge of the
    * Spark UDF (matches can't straddle symbols because every symbol is
    * delimiter-bounded, and replace() never overlaps matches). Ties
    * break (count DESC, l ASC, r ASC) in both engines, so the merge
    * list is a pure function of the corpus. */
  /** The shared unrolled CTE chain: word frequencies, encoded
    * generation tables v0..v{maxMerges} (each carrying the original
    * word through the rewrites), and per-round argmax rows
    * p1..p{maxMerges}. q69's tail unions the p_k; q72's tail reads the
    * FINAL generation's segmentation. */
  private def bpeChainCtes(maxMerges: Int): String = {
    // every v{k-1} is referenced TWICE (by p$k and v$k); DuckDB inlines
    // plain CTEs, which makes the un-hinted chain exponential in
    // maxMerges (judge-measured 361 s at sf0.01; >120 s even at
    // sf0.001). AS MATERIALIZED evaluates each generation once and
    // makes the whole replay sub-second without changing any value.
    val head = Seq(
      s"""words AS MATERIALIZED (SELECT w, count(*) AS freq FROM (
         |  SELECT unnest(regexp_extract_all($normSql, '[a-z]+')) AS w FROM documents) GROUP BY w)""",
      """v0 AS MATERIALIZED (SELECT w, regexp_replace(w, '(.)', '<\1>', 'g') AS enc, freq FROM words)""")
    val rounds = (1 to maxMerges).flatMap { k =>
      Seq(
        s"""p$k AS MATERIALIZED (
           |  SELECT l, r, cnt FROM (
           |    SELECT s[i] AS l, s[i+1] AS r, sum(freq) AS cnt
           |    FROM (SELECT regexp_extract_all(enc, '<([a-z]+)>', 1) AS s, freq,
           |                 unnest(range(1, len(regexp_extract_all(enc, '<([a-z]+)>', 1)))) AS i
           |          FROM v${k - 1})
           |    GROUP BY 1, 2 HAVING sum(freq) >= 2)
           |  ORDER BY cnt DESC, l ASC, r ASC LIMIT 1)""",
        s"""v$k AS MATERIALIZED (
           |  SELECT w, CASE WHEN p.l IS NOT NULL
           |              THEN replace(enc, '<'||p.l||'><'||p.r||'>', '<'||p.l||p.r||'>')
           |              ELSE enc END AS enc, freq
           |  FROM v${k - 1} LEFT JOIN p$k p ON TRUE)""")
    }
    (head ++ rounds).map(_.stripMargin).mkString(",\n")
  }

  private def bpeOracleSql(maxMerges: Int): String = {
    val union = (1 to maxMerges).map { k =>
      s"""SELECT CAST($k AS INT) AS "rank", l AS "left", r AS "right", CAST(cnt AS BIGINT) AS freq FROM p$k"""
    }.mkString("\nUNION ALL ")
    s"WITH ${bpeChainCtes(maxMerges)}\n" +
      s"""SELECT * FROM ($union) ORDER BY "rank""""
  }

  /** Oracle for [[q72_bpe_encode]]: the same learned chain, then the
    * final generation's per-word piece count joined back to the doc
    * token stream. */
  private def bpeEncodeOracleSql(maxMerges: Int): String =
    s"""WITH ${bpeChainCtes(maxMerges)},
       | seg AS (SELECT w, len(regexp_extract_all(enc, '<([a-z]+)>', 1)) AS n_pieces
       |         FROM v$maxMerges),
       | dw AS (SELECT doc_id, unnest(regexp_extract_all($normSql, '[a-z]+')) AS w
       |        FROM documents)
       |SELECT doc_id, count(*) AS n_words,
       |       CAST(sum(n_pieces) AS BIGINT) AS n_bpe_tokens,
       |       ${croundSql("CAST(sum(n_pieces) AS DOUBLE) / count(*)")} AS fertility
       |FROM dw JOIN seg USING (w)
       |GROUP BY doc_id ORDER BY doc_id""".stripMargin

  /** Q69 — the learned BPE merge table: (rank, left, right, freq) for
    * the first 12 merges. Oracled via the unrolled CTE replay above;
    * BpeSpec additionally gates the loop against a sequential reference
    * implementation (exact merge-list equality) and pins determinism. */
  val q69_bpe_merges: Query = Query(bpeOracleSql(maxMerges = 12)) { (s, dir) =>
    import s.implicits._
    bpeMergeRules(s, dir).toDF("rank", "left", "right", "freq")
      .orderBy("rank")
  }

  /** Q73 — exact substring-level dedup (the "dedup makes LMs better"
    * mode, at rolling-window granularity): a 20-token window is
    * duplicated when its text occurs ≥ 2 times anywhere in the corpus;
    * a token is duplicated when any duplicated window covers it. Emits
    * per-doc token counts and the duplicated-token fraction — the
    * number a curation pass thresholds to drop boilerplate-heavy docs.
    *
    * Distributed shape: windows travel as 16-byte md5 digests (the
    * q16 digest-key move — the 20-word text never leaves the scan),
    * the ≥2 count is a partial-agg'd groupBy on the digest, and
    * coverage is a ±k position explode + distinct with NO join wider
    * than (doc_id, digest). The digest exchange is ~n_tok rows × 16 B —
    * the inherent cost of exact substring dedup; at 100 TB the standard
    * prefilter (seen-digest bloom from a first pass) bolts onto the
    * same plan in front of the exchange, exactly like q47b's. */
  /** Engine body of q73 over an arbitrary documents frame (PropertySpec
    * drives it with shuffled partitionings: the collect_list in the
    * duplicate-window aggregation is order-nondeterministic, but only
    * its SET of elements is consumed, so the output must be invariant). */
  /** (doc_id, a, n) token frame for the substring-window family. */
  private[graft] def substringToks(docsDf: DataFrame): DataFrame =
    docsDf
      .select(col("doc_id"), split(norm, " ").as("a"))
      .select(col("doc_id"), col("a"), size(col("a")).as("n"))

  /** Rolling k-token windows as (doc_id, i, h) with h = 16-byte md5 of
    * the window text — computed scan-side off the token frame; the text
    * never leaves the projection. Shared by q73 and its streaming face. */
  private[graft] def substringWindows(toks: DataFrame, k: Int = 20): DataFrame =
    toks.filter(col("n") >= k)
      .select(col("doc_id"), explode(expr(
        s"transform(sequence(1, n - ${k - 1}), i -> struct(i AS i, unhex(md5(array_join(slice(a, i, $k), ' '))) AS h))")).as("w"))
      .select(col("doc_id"), col("w.i").as("i"), col("w.h").as("h"))

  private[graft] def substringDedupOf(docsDf: DataFrame, k: Int = 20): DataFrame = {
    val toks = substringToks(docsDf)
    val wins = substringWindows(toks, k)
    // one aggregation finds the duplicated digests AND carries their
    // window positions through, so the expensive window-digest scan runs
    // once (a count-then-join formulation re-scans it); groups are ~1-2
    // windows each, so the collected lists stay row-sized
    val covered = wins.groupBy("h")
      .agg(collect_list(struct(col("doc_id"), col("i"))).as("ws"))
      .filter(size(col("ws")) >= 2)
      .select(explode(col("ws")).as("w"))
      .select(col("w.doc_id").as("doc_id"),
        explode(sequence(col("w.i"), col("w.i") + lit(k - 1))).as("tp"))
      .distinct()
      .groupBy("doc_id").agg(count(lit(1)).as("n_dup_tok"))
    toks.select(col("doc_id"), col("n"))
      .join(covered, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n").cast("long").as("n_tok"),
        coalesce(col("n_dup_tok"), lit(0L)).as("n_dup_tok"),
        cround(coalesce(col("n_dup_tok"), lit(0L)).cast("double") / col("n")).as("dup_frac"))
      .orderBy("doc_id")
  }

  val q73_substring_dedup: Query = Query(
    s"""WITH d AS (SELECT doc_id, string_split($normSql, ' ') AS a FROM documents),
       |     t AS (SELECT doc_id, a, len(a) AS n FROM d),
       |     w AS (SELECT doc_id, i, md5(array_to_string(a[i:i+19], ' ')) AS h
       |           FROM (SELECT doc_id, a, unnest(range(1, n - 18)) AS i FROM t WHERE n >= 20)),
       |     dh AS (SELECT h FROM w GROUP BY h HAVING count(*) >= 2),
       |     dw AS (SELECT doc_id, i FROM w JOIN dh USING (h)),
       |     cov AS (SELECT DISTINCT doc_id, tp
       |             FROM (SELECT doc_id, unnest(range(i, i + 20)) AS tp FROM dw)),
       |     cnt AS (SELECT doc_id, count(*) AS n_dup_tok FROM cov GROUP BY 1)
       |SELECT t.doc_id, CAST(n AS BIGINT) AS n_tok,
       |       CAST(coalesce(n_dup_tok, 0) AS BIGINT) AS n_dup_tok,
       |       ${croundSql("coalesce(n_dup_tok, 0) * 1e0 / n")} AS dup_frac
       |FROM t LEFT JOIN cnt USING (doc_id)
       |ORDER BY doc_id""") { (s, dir) =>
    // spreadScan examined and REJECTED here (round 13, ProbeQ73AB):
    // unlike the q02-family numeric spreads, the exchange must move the
    // full text column, and min-of-4 CPU went 1.67 s plain -> 11.0 s
    // spread (wall 1.98 -> 4.33 s) — the exchange + 32-way partial agg
    // costs more than the serial scan it parallelizes.
    substringDedupOf(docs(s, dir))
  }

  /** Q72 — tokenizer APPLICATION: encode the corpus with the q69-learned
    * merge table and report per-doc word/BPE-piece counts and fertility
    * (pieces per word), the metric that decides whether a trained
    * tokenizer fits a corpus.
    *
    * Distributed shape: the merge rules are model state (≤ 12 tiny rows,
    * the IVF-centroid exemption) carried in the UDF closure; encoding is
    * applied to the DISTINCT-WORD table, not the token stream — the
    * rank-ordered greedy merges run once per vocabulary entry (millions
    * at 100 TB), and the corpus-scale side is one equi-join of (doc_id,
    * w) tokens against the encoded vocab (AQE broadcasts it while it
    * fits) plus one per-doc sum. No round barriers, no corpus-width
    * rewrites. */
  val q72_bpe_encode: Query = Query(bpeEncodeOracleSql(maxMerges = 12)) { (s, dir) =>
    val rules = bpeMergeRules(s, dir).map { case (_, l, r, _) => (l, r) }
    val nPieces = udf { (w: String) =>
      var syms: Array[String] = w.split("")
      rules.foreach { case (l, r) =>
        val out = Array.newBuilder[String]
        var i = 0
        while (i < syms.length) {
          if (i + 1 < syms.length && syms(i) == l && syms(i + 1) == r) {
            out += (l + r); i += 2
          } else { out += syms(i); i += 1 }
        }
        syms = out.result()
      }
      syms.length
    }
    val words = docs(s, dir).select(col("doc_id"),
      explode(expr(s"regexp_extract_all($normExpr, '[a-z]+', 0)")).as("w"))
    val vocabEnc = words.select("w").distinct()
      .withColumn("n_pieces", nPieces(col("w")))
    words.join(vocabEnc, "w")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_words"),
        sum("n_pieces").cast("long").as("n_bpe_tokens"))
      .withColumn("fertility",
        cround(col("n_bpe_tokens").cast("double") / col("n_words")))
      .select("doc_id", "n_words", "n_bpe_tokens", "fertility")
      .orderBy("doc_id")
  }

  val all: Map[String, Query] = Map(
    "q16_dedup_exact" -> q16_dedup_exact,
    "q59_inverted_index" -> q59_inverted_index,
    "q60_incremental_neardup" -> q60_incremental_neardup,
    "q54_passage_dedup" -> q54_passage_dedup,
    "q54b_passage_neardup" -> q54b_passage_neardup,
    "q37_dup_clusters" -> q37_dup_clusters,
    "q37b_cluster_reps" -> q37b_cluster_reps,
    "q18b_top_terms" -> q18b_top_terms,
    "q21_lang_id" -> q21_lang_id,
    "q22_quality_score" -> q22_quality_score,
    "q63_quality_curation" -> q63_quality_curation,
    "q23_token_stats" -> q23_token_stats,
    "q23b_bpe_tokens" -> q23b_bpe_tokens,
    "q24_fingerprint" -> q24_fingerprint,
    "q25_jaccard_neardup" -> q25_jaccard_neardup,
    "q26_minhash_lsh" -> q26_minhash_lsh,
    "q27_simhash" -> q27_simhash,
    "q57_bm25" -> q57_bm25,
    "q69_bpe_merges" -> q69_bpe_merges,
    "q72_bpe_encode" -> q72_bpe_encode,
    "q73_substring_dedup" -> q73_substring_dedup,
    "q70_topk_sketch" -> q70_topk_sketch)
}
