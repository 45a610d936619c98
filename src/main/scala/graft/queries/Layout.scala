package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.engine.Tables

/** Corpus physical-layout and subset-selection operators (SURVEY.md
  * §2.12): weighted priority sampling, Z-order storage clustering,
  * vocabulary-id encoding, and robust outlier clipping. These are the
  * steps between a curated corpus
  * ([[Pipeline]]/[[TextOps]]) and the bytes a training job actually
  * reads: WHICH documents ship (q74), HOW the files are clustered for
  * scan pruning (q75), and WHAT the text becomes on disk (q76).
  *
  * Scale posture: q74 is a per-group top-k whose window carries a
  * rank-limit predicate, so Spark plans a map-side WindowGroupLimit —
  * each task forwards at most k+1 rows per group and the shuffle is
  * bounded by groups×(k+1), not corpus size (pinned in LayoutSpec).
  * q75 is a pure per-row map + one bounded aggregation (≤ 2^4 z-range
  * buckets). q76's vocabulary is bounded by construction (top-V
  * TakeOrdered), so the id-assignment window runs over ≤ V rows and the
  * encode join broadcasts the vocab.
  */
object Layout {

  private def docs(s: SparkSession, dir: String): DataFrame = Tables.table(s, dir, "documents")
  private def t(s: SparkSession, dir: String, n: String): DataFrame = Tables.table(s, dir, n)

  /** Q74 — weighted priority sampling per language group (Duffield,
    * Lund & Thorup, "Priority sampling for estimation of arbitrary
    * subset sums", JACM 2007): each doc draws priority w/u with
    * u ~ U(0,1]; the k highest-priority docs per group form a
    * without-replacement, weight-favoring sample, and max(w, tau) —
    * tau the (k+1)-th priority — is an unbiased per-item estimator of
    * its weight contribution, so the sample alone estimates any
    * subset's total weight.
    *
    * Determinism/oracle-ability: u comes from the shared arithmetic
    * [[Pipeline.mixExpr]] hash (u = (h + 0.5)/2^16), so the priority
    * 2w/(2h+1) is a single IEEE division of two exact small integers —
    * correctly rounded and therefore bit-identical in Spark and DuckDB,
    * making the sample membership, order, and estimator all exactly
    * hash-checkable. Groups smaller than k+1 have no tau (every doc is
    * sampled; the estimator degenerates to the true weight, per the
    * paper).
    *
    * Scale: the rank-limit predicate under the window triggers
    * Spark's InferWindowGroupLimit, planning a partial (map-side)
    * WindowGroupLimit before the shuffle — per-task state is k+1 rows
    * per group, so a 100 TB corpus shuffles O(groups·k) rows, not n.
    * tau comes from a second unbounded-frame window over the SAME lang
    * partitioning of the already-pruned k+1 rows, so the whole query is
    * one corpus scan and one exchange — no tau re-scan, no extra
    * shuffle (LayoutSpec pins one Exchange + map-side group limit). */
  val q74_priority_sample: Query = {
    val K = 40
    val priSql = s"CAST(2 * n_chars AS DOUBLE) / (2 * ${Pipeline.mixSql("doc_id")} + 1)"
    val priExpr = s"CAST(2 * n_chars AS DOUBLE) / (2 * ${Pipeline.mixExpr("doc_id")} + 1)"
    Query(
      s"""WITH d AS (SELECT doc_id, lang, n_chars, $priSql AS pri
         |           FROM documents),
         |     r AS (SELECT lang, doc_id, n_chars, pri,
         |                  CAST(row_number() OVER (PARTITION BY lang
         |                                          ORDER BY pri DESC, doc_id) AS INT) AS rn
         |           FROM d),
         |     tau AS (SELECT lang, max(CASE WHEN rn = ${K + 1} THEN pri END) AS tau
         |             FROM r WHERE rn <= ${K + 1} GROUP BY lang)
         |SELECT r.lang AS lang, r.rn AS rn, r.doc_id AS doc_id, r.n_chars AS w,
         |       ${croundSql("greatest(CAST(r.n_chars AS DOUBLE), coalesce(tau.tau, CAST(r.n_chars AS DOUBLE)))")} AS est_w
         |FROM r JOIN tau ON r.lang = tau.lang
         |WHERE r.rn <= $K
         |ORDER BY lang, rn""") { (s, dir) =>
      val win = Window.partitionBy("lang").orderBy(col("pri").desc, col("doc_id"))
      docs(s, dir)
        .select(col("doc_id"), col("lang"), col("n_chars"), expr(priExpr).as("pri"))
        .withColumn("rn", row_number().over(win))
        .filter(col("rn") <= K + 1)
        .withColumn("tau",
          max(when(col("rn") === K + 1, col("pri"))).over(Window.partitionBy("lang")))
        .filter(col("rn") <= K)
        .select(col("lang"), col("rn"), col("doc_id"), col("n_chars").as("w"),
          cround(greatest(col("n_chars").cast("double"),
            coalesce(col("tau"), col("n_chars").cast("double")))).as("est_w"))
        .orderBy("lang", "rn")
    }
  }

  /** Z-value (Morton interleave) of x and y over equal `bits`-wide
    * budgets: y's bit i lands at position 2i, x's at 2i+1 — pure
    * integer arithmetic ((v div 2^i) % 2, shared Spark/DuckDB shape
    * like [[Pipeline.mixExpr]]) so the curve is oracle-checkable
    * without either engine's bit-op builtins. Equal budgets matter: if
    * one dimension held more high bits than the other, coarse z-range
    * cuts would constrain only that dimension and pruning on the other
    * column would get nothing (the mistake this helper's signature
    * forbids). */
  private[graft] def zVal(x: String, y: String, bits: Int, intDiv: String): String = {
    val terms = (0 until bits).flatMap { i =>
      Seq(s"((($y) $intDiv ${1L << i}) % 2) * ${1L << (2 * i)}",
        s"((($x) $intDiv ${1L << i}) % 2) * ${1L << (2 * i + 1)}")
    }
    terms.mkString("(", " + ", ")")
  }

  /** The z-order WRITE path q75 audits: range-partition the rows into
    * `nFiles` contiguous z-ranges, sort within each, and write parquet —
    * the Delta/Iceberg OPTIMIZE ZORDER shape. Because each output file
    * covers one contiguous slice of the space-filling curve, its parquet
    * footer min/max box in the ORIGINAL dimensions is tight in BOTH, and
    * a stats-pruning reader touches only files whose box intersects the
    * predicate — LayoutSpec writes both this and a single-column control
    * layout and pins the touched-file counts from the real footers.
    *
    * Scale posture: the z-value is a per-row map; repartitionByRange is
    * ONE range-sampled exchange and the sort is partition-local — the
    * same cost as any clustered write, no driver state. */
  private[graft] def zorderWrite(df: DataFrame, zc: Column, nFiles: Int,
      path: String): Unit =
    df.withColumn("graft_z", zc)
      .repartitionByRange(nFiles, col("graft_z"))
      .sortWithinPartitions("graft_z")
      .drop("graft_z")
      .write.mode("overwrite").parquet(path)

  /** Q75 — Z-order storage layout audit (the Delta/Iceberg OPTIMIZE
    * ZORDER story): cluster `part` on the interleaved-bit Morton code
    * of (p_size, price cell), cut the curve into equal z-ranges (= the
    * files a writer would emit), and report each bucket's min/max
    * extent in BOTH dimensions — exactly the footer stats a reader's
    * min/max pruning consults. Both dims get a 6-bit budget (price
    * quantized to 64 two-unit cells over the [900, 1028) band the
    * column stats show, clamped above), so a z-range of 2^8 fixes the
    * top two bits of EACH dim: every bucket is confined to a 16-wide
    * p_size range AND a 32-unit price range (asserted in LayoutSpec,
    * distribution-independent). The `size_only` single-column
    * layout is the control: its buckets bound p_size tightly but span
    * the whole price range — why single-column sorting can't serve
    * two-column predicates.
    *
    * At 100 TB the identical plan shape applies: the z-value is a
    * per-row map (no shuffle), the writer becomes
    * repartitionByRange(z).sortWithinPartitions(z) + parquet write, and
    * this audit query is the verification that the layout actually
    * tightened per-file extents. */
  val q75_zorder_layout: Query = {
    // y = whole currency units above the 900 floor (clamped to 7 bits so
    // the span guarantee is absolute); y div 2 = its two-unit cell, the
    // 6-bit budget entering the interleave
    val ySql = "greatest(0, least(127, CAST(floor(p_retailprice) AS BIGINT) - 900))"
    def stats(layout: String, src: String): String =
      s"""SELECT '$layout' AS layout, bucket, CAST(count(*) AS BIGINT) AS n,
         |       CAST(min(x) AS INT) AS min_size, CAST(max(x) AS INT) AS max_size,
         |       CAST(max(x) - min(x) AS INT) AS size_span,
         |       min(y) AS min_pb, max(y) AS max_pb, max(y) - min(y) AS price_span
         |FROM $src GROUP BY bucket""".stripMargin
    Query(
      s"""WITH b AS (SELECT p_size AS x, $ySql AS y FROM part),
         |     zb AS (SELECT CAST(${zVal("x", "y // 2", 6, "//")} // 256 AS INT) AS bucket, x, y FROM b),
         |     sb AS (SELECT CAST((x - 1) // 4 AS INT) AS bucket, x, y FROM b)
         |${stats("zorder", "zb")}
         |UNION ALL
         |${stats("size_only", "sb")}
         |ORDER BY layout, bucket""") { (s, dir) =>
      val b = t(s, dir, "part").select(col("p_size").as("x"), expr(ySql).as("y"))
      def grouped(layout: String, bucket: Column): DataFrame =
        b.withColumn("bucket", bucket.cast("int"))
          .groupBy("bucket")
          .agg(count(lit(1)).as("n"),
            min(col("x")).cast("int").as("min_size"), max(col("x")).cast("int").as("max_size"),
            (max(col("x")) - min(col("x"))).cast("int").as("size_span"),
            min(col("y")).as("min_pb"), max(col("y")).as("max_pb"),
            (max(col("y")) - min(col("y"))).as("price_span"))
          .select(lit(layout).as("layout"), col("bucket"), col("n"),
            col("min_size"), col("max_size"), col("size_span"),
            col("min_pb"), col("max_pb"), col("price_span"))
      grouped("zorder", expr(s"${zVal("x", "y div 2", 6, "div")} div 256"))
        .unionAll(grouped("size_only", expr("(x - 1) div 4")))
        .orderBy("layout", "bucket")
    }
  }

  /** Q76 — vocabulary build + token-id encoding (the tokenizer's
    * vocab-lookup half, downstream of q69's BPE merge learning): rank
    * terms by corpus frequency (ties by term), keep the top V as the
    * vocabulary with contiguous ids 1..V, and rewrite every document as
    * its id sequence with OOV → 0 — the step that turns curated text
    * into the integer tensors a trainer memory-maps. Output per doc:
    * token count, OOV count, and the id sequence (comma-joined, the
    * q59 convention for oracle-hashable lists).
    *
    * V is 24 here so the OOV path is live at test scale (the synthetic
    * corpus has ~31 distinct terms); a real run sets V = 32k/50k —
    * still broadcast-sized, which is the point: the vocab is bounded by
    * TakeOrdered(V) BEFORE the id window, so rank assignment runs over
    * ≤ V rows (the lone single-partition window is V-bounded by
    * construction) and the per-token lookup is a broadcast hash join,
    * never a shuffle of the exploded corpus. */
  val q76_vocab_encode: Query = {
    val V = 24
    Query(
      s"""WITH d AS (SELECT doc_id, coalesce(text, '') AS text FROM documents),
         |     n AS (SELECT doc_id, string_split(${Pipeline.normSql}, ' ') AS toks FROM d),
         |     tk AS (SELECT doc_id, unnest(toks) AS term, generate_subscripts(toks, 1) AS pos FROM n),
         |     tf AS (SELECT term, count(*) AS cnt FROM tk GROUP BY term),
         |     v AS (SELECT term, CAST(row_number() OVER (ORDER BY cnt DESC, term) AS INT) AS id
         |           FROM (SELECT * FROM tf ORDER BY cnt DESC, term LIMIT $V))
         |SELECT tk.doc_id AS doc_id, CAST(count(*) AS BIGINT) AS n_tok,
         |       CAST(sum(CASE WHEN v.id IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_oov,
         |       array_to_string(list(coalesce(v.id, 0) ORDER BY tk.pos), ',') AS ids
         |FROM tk LEFT JOIN v ON tk.term = v.term
         |GROUP BY tk.doc_id
         |ORDER BY doc_id""") { (s, dir) =>
      val norm = expr(Pipeline.normExprStr)
      val tk = docs(s, dir)
        .select(col("doc_id"), coalesce(col("text"), lit("")).as("text"))
        .select(col("doc_id"), posexplode(split(norm, " ")).as(Seq("pos", "term")))
      val tf = tk.groupBy("term").agg(count(lit(1)).as("cnt"))
      val v = tf.orderBy(col("cnt").desc, col("term")).limit(V)
        .withColumn("id", row_number().over(Window.orderBy(col("cnt").desc, col("term"))).cast("int"))
        .select("term", "id")
      tk.join(broadcast(v), Seq("term"), "left")
        .withColumn("tid", coalesce(col("id"), lit(0)))
        .groupBy("doc_id")
        .agg(count(lit(1)).cast("long").as("n_tok"),
          sum(when(col("id").isNull, 1).otherwise(0)).cast("long").as("n_oov"),
          expr("array_join(transform(sort_array(collect_list(struct(pos, tid))), s -> CAST(s.tid AS STRING)), ',')").as("ids"))
        .orderBy("doc_id")
    }
  }

  /** Q77 — robust per-group length hygiene (median/MAD fences, the
    * classic data-cleaning pass before length-sensitive training
    * stats): per language, the document-length median and median
    * absolute deviation define Tukey-style fences — outliers are
    * FLAGGED beyond the outer fence med ± 3·1.4826·MAD (1.4826 ≈ the
    * MAD→σ consistency constant) and the mean is WINSORIZED at the
    * inner fence med ± 1.4826·MAD, the robust location estimate a
    * quality dashboard trends (the inner fence guarantees the clip path
    * is live even on light-tailed length distributions).
    *
    * Cross-engine exactness: n_chars is integral, so the interpolated
    * medians land on .0/.5 exactly in both engines (the q38 argument);
    * the fence edges are the same IEEE multiply/adds either side, and
    * the winsorized mean is a 4-decimal DECIMAL sum ([[davg]]) —
    * bit-stable under any partitioning. Group medians are exact
    * (per-group sort) — right for audit-scale group counts; at 100 TB
    * the q38b GK-sketch percentile swaps in with the same query shape.
    * Two bounded aggregations + broadcast joins of the groups-sized
    * stats — the corpus itself never shuffles. */
  val q77_robust_clip: Query = {
    val C1 = "1.4826e0" // one robust sigma (inner fence, winsorize)
    val C3 = "4.4478e0" // 3 * 1.4826 (outer fence, outlier flag)
    Query(
      s"""WITH d AS (SELECT lang, n_chars FROM documents),
         |     m AS (SELECT lang, quantile_cont(n_chars, 0.5) AS med FROM d GROUP BY lang),
         |     md AS (SELECT d.lang, max(m.med) AS med,
         |                   quantile_cont(abs(d.n_chars - m.med), 0.5) AS mad
         |            FROM d JOIN m ON d.lang = m.lang GROUP BY d.lang),
         |     b AS (SELECT d.lang, d.n_chars, md.med, md.mad,
         |                  md.med - md.mad * $C1 AS lo1, md.med + md.mad * $C1 AS hi1,
         |                  md.med - md.mad * $C3 AS lo3, md.med + md.mad * $C3 AS hi3
         |           FROM d JOIN md ON d.lang = md.lang)
         |SELECT lang, CAST(count(*) AS BIGINT) AS n,
         |       ${croundSql("max(med)")} AS med, ${croundSql("max(mad)")} AS mad,
         |       CAST(sum(CASE WHEN n_chars < lo3 THEN 1 ELSE 0 END) AS BIGINT) AS n_low,
         |       CAST(sum(CASE WHEN n_chars > hi3 THEN 1 ELSE 0 END) AS BIGINT) AS n_high,
         |       CAST(sum(CASE WHEN n_chars < lo1 OR n_chars > hi1 THEN 1 ELSE 0 END) AS BIGINT) AS n_winsorized,
         |       ${davgSql("greatest(lo1, least(hi1, n_chars * 1e0))", 4)} AS wins_mean
         |FROM b GROUP BY lang
         |ORDER BY lang""") { (s, dir) =>
      val d = docs(s, dir).select(col("lang"), col("n_chars"))
      val m = d.groupBy("lang").agg(expr("percentile(n_chars, 0.5)").as("med"))
      val md = d.join(broadcast(m), "lang")
        .withColumn("dev", abs(col("n_chars") - col("med")))
        .groupBy("lang").agg(max(col("med")).as("med"), expr("percentile(dev, 0.5)").as("mad"))
      d.join(broadcast(md), "lang")
        .withColumn("lo1", col("med") - col("mad") * expr(C1))
        .withColumn("hi1", col("med") + col("mad") * expr(C1))
        .withColumn("lo3", col("med") - col("mad") * expr(C3))
        .withColumn("hi3", col("med") + col("mad") * expr(C3))
        .groupBy("lang")
        .agg(count(lit(1)).cast("long").as("n"),
          cround(max(col("med"))).as("med"), cround(max(col("mad"))).as("mad"),
          sum(when(col("n_chars") < col("lo3"), 1).otherwise(0)).cast("long").as("n_low"),
          sum(when(col("n_chars") > col("hi3"), 1).otherwise(0)).cast("long").as("n_high"),
          sum(when(col("n_chars") < col("lo1") || col("n_chars") > col("hi1"), 1).otherwise(0))
            .cast("long").as("n_winsorized"),
          davg(greatest(col("lo1"), least(col("hi1"), col("n_chars") * lit(1.0))), 4).as("wins_mean"))
        .orderBy("lang")
    }
  }

  def all: Map[String, Query] = Map(
    "q74_priority_sample" -> q74_priority_sample,
    "q75_zorder_layout" -> q75_zorder_layout,
    "q76_vocab_encode" -> q76_vocab_encode,
    "q77_robust_clip" -> q77_robust_clip)
}
