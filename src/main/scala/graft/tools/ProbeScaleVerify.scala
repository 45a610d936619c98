package graft.tools

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Engine-internal correctness signal AT SCALE for the vector family
  * whose DuckDB oracles are infeasible at 10× (VERDICT r9 item 7:
  * q62/q79/q79b hash-match at sf0.01 but DuckDB dies at 25-30 min on
  * the 10× replica, so the three had no correctness signal at scale).
  * Runs against the K× fixture (default /tmp/scaleall10) and
  * cross-checks each query against EXACT brute-force cosine computed
  * independently with the codegen dot product — the DedupSpec pattern
  * moved to the scale fixture:
  *
  *   q79 / q79b — exact top-5 per probe over the FULL replica corpus;
  *     reports recall@5 of the ANN result (floor: 0.8 / 0.7, the
  *     committed DedupSpec floors at sf0.001).
  *   q62 — SOUNDNESS: every reported (vec_id, n_dups, best_cos) row is
  *     re-proven by brute force against all earlier vectors (n_dups
  *     never exceeds the exact earlier-neighbor count at tau;
  *     best_cos ≤ exact best + rounding; exact best ≥ tau).
  *     COMPLETENESS (sampled): a deterministic stride-sample of vectors
  *     is brute-forced for earlier tau-neighbors; the fraction whose
  *     duplicate status q62 reproduces is the measured recall
  *     (floor 0.5, the committed DedupSpec floor — 2-probe k-means
  *     assignment is approximate by construction).
  *
  * Prints one JSON line per check; non-zero exit on any floor breach.
  */
object ProbeScaleVerify {

  /** Stride-sampled exact truth for q46's completeness side: sampled
    * vec_ids that HAVE an earlier τ-neighbor (so must appear in the
    * exact drop list). Independent broadcast-join plan, ~200 probes. */
  private def hasEarlierDup46(e: org.apache.spark.sql.DataFrame,
      dot: (org.apache.spark.sql.Column, org.apache.spark.sql.Column) => org.apache.spark.sql.Column,
      tau: Double): Set[Long] = {
    val ids = e.select("vec_id").orderBy("vec_id").collect().map(_.getLong(0))
    val stride = math.max(1, ids.length / 200)
    val sample = ids.indices.by(stride).map(ids).toArray
    val sDf = e.filter(col("vec_id").isin(sample: _*))
      .select(col("vec_id").as("sid"), col("embedding").as("s_emb"), col("nrm").as("s_nrm"))
    e.join(broadcast(sDf), col("vec_id") < col("sid"))
      .select(col("sid"), (dot(col("embedding"), col("s_emb")) / (col("nrm") * col("s_nrm"))).as("cos"))
      .filter(col("cos") >= tau).select("sid").distinct()
      .collect().map(_.getLong(0)).toSet
  }

  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/scaleall10")
    // label the artifact rows with the fixture actually read (round 11:
    // the hardcoded "@10x" lied when the 30x replica was supplied)
    val fix = dir.split('/').last
    val spark = graft.engine.GraftSession.get()
    spark.sparkContext.setLogLevel("WARN")
    import graft.queries.VectorOps
    val dot = graft.functions.DotProduct.dot _
    def norm2(c: org.apache.spark.sql.Column) = sqrt(dot(c, c))
    val e = graft.engine.Tables.table(spark, dir, "embeddings")
      .select(col("vec_id"), col("embedding"), norm2(col("embedding")).as("nrm"))
      .persist()
    val nVecs = e.count()
    var failures = 0

    // ── exact top-5 per probe (ground truth for q79/q79b) ──
    val probes = e.filter(col("vec_id") < 10)
      .select(col("vec_id").as("probe_id"), col("embedding").as("p_emb"), col("nrm").as("p_nrm"))
    val w = Window.partitionBy("probe_id").orderBy(col("cos").desc, col("cand_id"))
    val exactTop = e.select(col("vec_id").as("cand_id"), col("embedding").as("c_emb"), col("nrm").as("c_nrm"))
      .join(broadcast(probes), col("cand_id") =!= col("probe_id"))
      .select(col("probe_id"), col("cand_id"),
        (dot(col("p_emb"), col("c_emb")) / (col("p_nrm") * col("c_nrm"))).as("cos"))
      .withColumn("rn", row_number().over(w)).filter(col("rn") <= 5)
      .select("probe_id", "cand_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

    def recallOf(name: String, floor: Double): Unit = {
      val ann = graft.SparkEntry.queries(name)(spark, dir)
        .select("probe_id", "cand_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      val recall = (ann & exactTop).size.toDouble / exactTop.size
      val ok = recall >= floor
      if (!ok) failures += 1
      println(s"""{"check":"$name@$fix","n_vecs":$nVecs,"recall_at_5":$recall,"floor":$floor,"ok":$ok}""")
    }
    recallOf("q79_pq_ann", 0.8)
    recallOf("q79b_ivf_pq", 0.7)
    // round 13 (VERDICT r12 item 4): q30 was the last ANN statement with
    // no at-scale recall row — same exact-top-5 ground truth, DedupSpec's
    // sf0.01 floor (the 30×/100× replicas' near-copy neighbors sit at
    // cos≈1 where sign-LSH selectivity is far better than the fixture's
    // 0.27-0.39 design point, so the measured value should exceed it)
    recallOf("q30_ann_lsh", 0.78)

    // ── q62 soundness: brute-force every reported dup row ──
    val tau = VectorOps.EmbedDupTau
    val sem = graft.SparkEntry.queries("q62_semdedup")(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val dupIds = sem.map(_._1)
    val dupSet = dupIds.toSet
    // exact earlier-neighbor profile for every reported id in one pass
    val rep = e.filter(col("vec_id").isin(dupIds: _*))
      .select(col("vec_id").as("rid"), col("embedding").as("r_emb"), col("nrm").as("r_nrm"))
    val exactProf = e.join(broadcast(rep), col("vec_id") < col("rid"))
      .select(col("rid"), (dot(col("embedding"), col("r_emb")) / (col("nrm") * col("r_nrm"))).as("cos"))
      .filter(col("cos") >= tau)
      .groupBy("rid").agg(count(lit(1)).as("n_exact"), max(col("cos")).as("best_exact"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    val soundBad = sem.filter { case (id, nDups, bestCos) =>
      exactProf.get(id) match {
        case None => true // reported dup with NO exact tau-neighbor
        case Some((nExact, bestExact)) =>
          nDups > nExact || bestCos > math.floor(bestExact * 10000 + 0.5) / 10000 + 1e-9
      }
    }
    if (soundBad.nonEmpty) failures += 1
    println(s"""{"check":"q62_soundness@$fix","n_reported":${sem.length},""" +
      s""""n_unsound":${soundBad.length},"ok":${soundBad.isEmpty}}""")

    // ── q62 sampled completeness: stride-sample, brute-force, compare ──
    val allIds = e.select("vec_id").orderBy("vec_id").collect().map(_.getLong(0))
    val stride = math.max(1, allIds.length / 200)
    val sample = allIds.indices.by(stride).map(allIds).toArray
    val sampleDf = e.filter(col("vec_id").isin(sample: _*))
      .select(col("vec_id").as("sid"), col("embedding").as("s_emb"), col("nrm").as("s_nrm"))
    val hasEarlierDup = e.join(broadcast(sampleDf), col("vec_id") < col("sid"))
      .select(col("sid"), (dot(col("embedding"), col("s_emb")) / (col("nrm") * col("s_nrm"))).as("cos"))
      .filter(col("cos") >= tau).select("sid").distinct()
      .collect().map(_.getLong(0)).toSet
    val found = hasEarlierDup.count(dupSet)
    val recall = if (hasEarlierDup.isEmpty) 1.0 else found.toDouble / hasEarlierDup.size
    val ok = recall >= 0.5
    if (!ok) failures += 1
    println(s"""{"check":"q62_completeness@$fix","sampled":${sample.length},""" +
      s""""with_exact_dup":${hasEarlierDup.size},"found_by_q62":$found,""" +
      s""""recall":$recall,"floor":0.5,"ok":$ok}""")

    // ── q46 at scale: EXACT drop-list, soundness + sampled completeness ──
    // (round 13: q46's 30×/100× vector counts sit on the brute-force
    // side of BruteForceBroadcastLimit, so unlike q62 the semantics here
    // are exact — both floors are hard: zero unsound rows, sampled
    // completeness 1.0. Recompute uses the independent broadcast-join
    // plan, not the gated cosinePairs generator under test.)
    {
      val tau46 = VectorOps.EmbedDupTau
      val rep46 = graft.SparkEntry.queries("q46_embed_dedup")(spark, dir).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      val ids46 = rep46.map(_._1)
      val set46 = ids46.toSet
      val repDf = e.filter(col("vec_id").isin(ids46: _*))
        .select(col("vec_id").as("rid"), col("embedding").as("r_emb"), col("nrm").as("r_nrm"))
      val prof46 = e.join(broadcast(repDf), col("vec_id") < col("rid"))
        .select(col("rid"), (dot(col("embedding"), col("r_emb")) / (col("nrm") * col("r_nrm"))).as("cos"))
        .filter(col("cos") >= tau46)
        .groupBy("rid").agg(count(lit(1)).as("n_exact"), max(col("cos")).as("best_exact"))
        .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
      val bad46 = rep46.filter { case (id, nDups, bestCos) =>
        prof46.get(id) match {
          case None => true
          case Some((nExact, bestExact)) =>
            nDups != nExact ||
              math.abs(bestCos - math.floor(bestExact * 10000 + 0.5) / 10000) > 1e-9
        }
      }
      val missing46 = hasEarlierDup46(e, dot, tau46) -- set46
      val ok46 = bad46.isEmpty && missing46.isEmpty
      if (!ok46) failures += 1
      println(s"""{"check":"q46_exact_sound_complete@$fix","n_reported":${rep46.length},""" +
        s""""n_unsound":${bad46.length},"sampled_missing":${missing46.size},"ok":$ok46}""")
    }

    // ── q85 at scale: kernel ≡ rank-shuffle dataflow, bitwise ──
    // (GraphSpec pins this at sf0.001; this is the same equivalence on
    // the 10× replica — the two paths share only the edge cache, so a
    // kernel indexing slip or a non-order-invariant sum would diverge)
    import graft.queries.Graph
    val edges = Graph.coPurchaseEdges(spark, dir)
    val kExprOf = (r: org.apache.spark.sql.Column) =>
      floor(r / col("outdeg") * 1e12 + 0.5).cast("long")
    val shuffled = Graph.pagerankGated(edges, Graph.nodeDegrees(edges), kExprOf, 0L)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val kernel = graft.SparkEntry.queries("q85_pagerank")(spark, dir)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val graphOk = kernel == shuffled
    if (!graphOk) failures += 1
    println(s"""{"check":"q85_kernel_vs_shuffle@$fix","n_nodes":${kernel.size},"bitwise_equal":$graphOk,"ok":$graphOk}""")

    // ── q88 at scale: CSR kernel ≡ intersect dataflow (round 10) ──
    // the 24M-edge replica sits below the TriangleCsrEdgeLimit gate, so
    // the production path is the broadcast-CSR kernel; equate it here
    // against the shuffle-attach intersect dataflow on the same edges
    // (integer counts + the same cround — any CSR pack/merge-walk slip
    // diverges)
    val triK = Graph.trianglesKernel(spark, dir, edges).collect().head
    val triF = Graph.trianglesIntersect(edges).collect().head
    val triOk = triK.getLong(0) == triF.getLong(0) &&
      triK.getLong(1) == triF.getLong(1) &&
      triK.getDouble(2) == triF.getDouble(2)
    if (!triOk) failures += 1
    println(s"""{"check":"q88_kernel_vs_intersect@$fix","n_triangles":${triK.getLong(0)},""" +
      s""""n_wedges":${triK.getLong(1)},"bitwise_equal":$triOk,"ok":$triOk}""")

    // ── q37 at scale: gate side ≡ distributed loop on the exact pairs ──
    // (round 12, VERDICT r11 item 3: q37 rested on sf-small oracles +
    // the DedupSpec synthetic-edge theorem; this equates the production
    // driver-finish union-find against the full distributed label
    // propagation on the REAL pair frame at this fixture's scale)
    import graft.queries.TextOps
    val pairs = TextOps.jaccardPairs(spark, dir).select("d1", "d2").persist()
    val nPairs = pairs.count()
    val (viaGate, gateRounds) = TextOps.connectedComponents(pairs)
    val gateMap = viaGate.collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val (viaLoop, _) = TextOps.connectedComponents(pairs, driverFinishMax = 0L)
    val loopMap = viaLoop.collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val ccOk = gateMap == loopMap && gateMap.nonEmpty
    if (!ccOk) failures += 1
    println(s"""{"check":"q37_gate_vs_loop@$fix","n_pairs":$nPairs,""" +
      s""""n_labeled":${gateMap.size},"gate_rounds":$gateRounds,"ok":$ccOk}""")

    // ── q37b at scale: rep selection ≡ independent recompute ──
    // (round 13: labels from the DISTRIBUTED loop — not the gated
    // driver finish under test above — and the representative choice
    // via a groupBy max(struct) argmax instead of the production
    // window row_number; quality is the same q22 signal both engines
    // hash-matched at 30×. Any gate/window/tie-break slip diverges.)
    {
      val (loopLabels, _) = TextOps.connectedComponents(pairs, driverFinishMax = 0L)
      val quality = TextOps.qualitySignals(spark, dir)
        .select(col("doc_id"), TextOps.qualityCol.as("quality"))
      val truth37b = loopLabels
        .select(col("lbl").as("cluster_id"), col("v").as("doc_id"))
        .join(quality, "doc_id")
        .groupBy("cluster_id")
        .agg(count(lit(1)).as("n_docs"),
          max(struct(col("quality"), (-col("doc_id")).as("ng"))).as("top"))
        .select(col("cluster_id"), (-col("top.ng")).as("rep_doc"),
          col("top.quality").as("rep_quality"), col("n_docs"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3))).toSet
      val got37b = graft.SparkEntry.queries("q37b_cluster_reps")(spark, dir)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3))).toSet
      val ok37b = got37b == truth37b && got37b.nonEmpty
      if (!ok37b) failures += 1
      println(s"""{"check":"q37b_reps_vs_recompute@$fix","n_clusters":${got37b.size},""" +
        s""""equal":${got37b == truth37b},"ok":$ok37b}""")
    }

    // ── banded finder recall vs the exact PPJoin frame (q26's floor; ──
    // q71 consumes the exact frame since round 12, so a miss here costs
    // only the declared-approximate MinHash demo)
    val exactPairs = pairs.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val bandedPairs = TextOps.lshJaccardPairs(spark, dir).select("d1", "d2")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val extras = bandedPairs -- exactPairs // impossible unless verify broke
    val missed = exactPairs -- bandedPairs
    val bandRecall =
      if (exactPairs.isEmpty) 1.0
      else 1.0 - missed.size.toDouble / exactPairs.size
    val bandOk = extras.isEmpty && bandRecall >= 0.9
    if (!bandOk) failures += 1
    println(s"""{"check":"q26_band_recall@$fix","n_exact":${exactPairs.size},""" +
      s""""n_missed":${missed.size},"n_extra":${extras.size},""" +
      s""""recall":$bandRecall,"floor":0.9,"ok":$bandOk}""")

    // ── q27 at scale: chunk-join completeness + hamming soundness ──
    // (round 13: q27's candidates come from the 4×16-bit chunk banding,
    // pigeonhole-EXACT for hamming ≤ 3 given the signatures — so both
    // floors are hard: every reported pair's hamming re-derived from
    // the signature XOR, and a stride-sampled brute-force sweep finds
    // NO pair the chunk join missed. The signature expression itself is
    // pinned bitwise by SimHashSpec against the DuckDB bit-by-bit
    // oracle at sf0.01/sf0.1; at scale the risk is the banding join,
    // which is what this probes.)
    {
      val sigs = TextOps.simhashSignatures(spark, dir)
      val rep27 = graft.SparkEntry.queries("q27_simhash")(spark, dir).persist()
      val nRep27 = rep27.count()
      val nBadHam = rep27
        .join(sigs.select(col("doc_id").as("d1"), col("sig").as("s1")), "d1")
        .join(sigs.select(col("doc_id").as("d2"), col("sig").as("s2")), "d2")
        .filter(bit_count(col("s1").bitwiseXOR(col("s2"))) =!= col("hamming")
          || col("hamming") > 3)
        .count()
      val sigIds = sigs.select("doc_id").orderBy("doc_id").collect().map(_.getLong(0))
      val stride27 = math.max(1, sigIds.length / 200)
      val sample27 = sigIds.indices.by(stride27).map(sigIds).toArray
      val sDf = sigs.filter(col("doc_id").isin(sample27: _*))
        .select(col("doc_id").as("sid"), col("sig").as("s_sig"))
      val truth27 = sigs.join(broadcast(sDf), col("doc_id") =!= col("sid"))
        .filter(bit_count(col("sig").bitwiseXOR(col("s_sig"))) <= 3)
        .select(least(col("doc_id"), col("sid")).as("d1"),
          greatest(col("doc_id"), col("sid")).as("d2"))
        .distinct()
      val nTruth27 = truth27.count()
      val nMissed27 = truth27.join(rep27, Seq("d1", "d2"), "left_anti").count()
      rep27.unpersist()
      val ok27 = nBadHam == 0 && nMissed27 == 0
      if (!ok27) failures += 1
      println(s"""{"check":"q27_sound_complete@$fix","n_pairs":$nRep27,""" +
        s""""n_bad_hamming":$nBadHam,"sample_true_pairs":$nTruth27,""" +
        s""""n_missed":$nMissed27,"ok":$ok27}""")
    }

    // ── q60 at scale: dropped-doc soundness (exact) + completeness ──
    // soundness: every incoming doc q60 DROPPED must have a valid
    // exact τ-partner (a corpus doc, or an earlier incoming doc);
    // completeness: over a stride-sample of incoming docs, the ones
    // with an exact valid partner must actually have been dropped
    // (banding recall, declared approximate — floor 0.9).
    {
      val docsT = graft.engine.Tables.table(spark, dir, "documents")
      val out60 = graft.SparkEntry.queries("q60_incremental_neardup")(spark, dir)
        .select("doc_id").collect().map(_.getLong(0)).toSet
      val incoming = docsT
        .filter(col("source").isin(TextOps.incomingSources: _*))
        .select("doc_id").collect().map(_.getLong(0)).toSet
      val dropped = (incoming -- out60).toArray.sorted
      val stride = math.max(1, incoming.size / 200)
      val sampled = incoming.toArray.sorted.indices.by(stride)
        .map(incoming.toArray.sorted).toArray
      val tau = TextOps.JaccardTau
      // ids → subset with ≥1 exact valid partner, via a counted
      // shared-shingle join (check side broadcast — dropped+sample is
      // small at any duplication rate the fixtures mint)
      def withValidPartner(ids: Array[Long]): Set[Long] = {
        if (ids.isEmpty) return Set.empty
        val sets = TextOps.shingleSets(spark, dir)
          .join(docsT.select(col("doc_id"),
            col("source").isin(TextOps.incomingSources: _*).as("inc")), "doc_id")
        val cs = sets.filter(col("doc_id").isin(ids: _*))
          .select(col("doc_id").as("cid"), col("n").as("n1"), explode(col("gs")).as("g"))
        sets.select(col("doc_id").as("pid"), col("inc"), col("n").as("n2"), explode(col("gs")).as("g"))
          .join(broadcast(cs), "g")
          .filter(col("pid") =!= col("cid"))
          .filter(!col("inc") || col("pid") < col("cid"))
          .groupBy("cid", "pid", "n1", "n2").agg(count(lit(1)).as("inter"))
          .filter(col("inter") * 1.0 / (col("n1") + col("n2") - col("inter")) >= tau)
          .select("cid").distinct().collect().map(_.getLong(0)).toSet
      }
      val droppedValid = withValidPartner(dropped)
      val unsound = dropped.filterNot(droppedValid)
      val sampleTruth = withValidPartner(sampled)
      val caught = sampleTruth.count(id => !out60.contains(id))
      val recall60 =
        if (sampleTruth.isEmpty) 1.0 else caught.toDouble / sampleTruth.size
      val ok60 = unsound.isEmpty && recall60 >= 0.9
      if (!ok60) failures += 1
      println(s"""{"check":"q60_sound_complete@$fix","n_incoming":${incoming.size},""" +
        s""""n_dropped":${dropped.length},"n_unsound":${unsound.length},""" +
        s""""sampled":${sampled.length},"sample_true_dups":${sampleTruth.size},""" +
        s""""caught":$caught,"recall":$recall60,"floor":0.9,"ok":$ok60}""")
    }

    // ── q71 at scale: composition invariants + dup_exact recompute ──
    // (the full statement's DuckDB oracle is infeasible here; these are
    // the composition's load-bearing properties, each re-derived with
    // an INDEPENDENT plan: statuses partition the corpus exactly once;
    // the eval cut is precisely the id-range rule; the dup_exact set
    // equals a window-based recompute of "non-min doc of its normalized
    // text among pre-cut docs"; splits exist iff kept)
    {
      val docsT = graft.engine.Tables.table(spark, dir, "documents")
      val nDocs = docsT.count()
      val rows = graft.SparkEntry.queries("q71_curate_corpus")(spark, dir)
        .collect().map(r => (r.getLong(0), r.getString(1), if (r.isNullAt(2)) null else r.getString(2)))
      val partitionOk = rows.length == nDocs && rows.map(_._1).distinct.length == nDocs
      val cut = docsT.agg(expr("(max(doc_id)+1) * 96 div 100")).head.getLong(0)
      val evalOk = rows.forall { case (id, st, _) =>
        (st == "eval_holdout") == (id >= cut)
      }
      val splitOk = rows.forall { case (_, st, sp) =>
        (st == "kept") == (sp != null)
      }
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy("nrm")
      val dupExactTruth = docsT
        .select(col("doc_id"), expr(
          "trim(regexp_replace(lower(text), '\\\\s+', ' '))").as("nrm"))
        .filter(col("doc_id") < cut)
        .withColumn("mn", min(col("doc_id")).over(w))
        .filter(col("doc_id") =!= col("mn"))
        .select("doc_id").collect().map(_.getLong(0)).toSet
      val dupExactGot = rows.filter(_._2 == "dup_exact").map(_._1).toSet
      val dupOk = dupExactGot == dupExactTruth
      val ok71 = partitionOk && evalOk && splitOk && dupOk
      if (!ok71) failures += 1
      println(s"""{"check":"q71_composition@$fix","n_docs":$nDocs,""" +
        s""""partition_ok":$partitionOk,"eval_cut_ok":$evalOk,""" +
        s""""split_ok":$splitOk,"n_dup_exact":${dupExactGot.size},""" +
        s""""dup_exact_recompute_equal":$dupOk,"ok":$ok71}""")
    }

    spark.stop()
    if (failures > 0) sys.exit(1)
  }
}
