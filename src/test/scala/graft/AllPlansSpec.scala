package graft

import org.apache.spark.sql.execution.ExplainMode

/** Blanket scale guard: NO registered query may plan a CartesianProduct
  * or BroadcastNestedLoopJoin unless it is on the explicit whitelist of
  * scalar/size-gated cross joins. PlanSpec pins individual queries'
  * shapes; this catches the scale-killer class across the whole surface,
  * including queries added later. */
class AllPlansSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  /** Queries whose cross/nested-loop node is an AUDITED bounded side —
    * a broadcast scalar (corpus total, cut, avgdl), a ≤10-row probe
    * set, or a one-row model frame — never a data×data product:
    * q17/q61 broadcast the 10 probe vectors; q28 is the size-gated
    * all-pairs kernel (driver-checked row cap); q29/q52/q56/q57/q64
    * cross a single aggregate row (N, totals, avgdl); q46 broadcasts
    * the scalar threshold frame; q47/q47b/q71 cross the one-row cut;
    * q67 (and q67b via the shared scorer) cross the one-row vocab
    * (PlanSpec-pinned); q91 crosses the one-row corpus totals; q78's grand-total
    * row crosses the one-row exact-distinct frame; q79's ADC scan
    * broadcasts the 10 probe LUT rows (the code table side streams);
    * q84 crosses the one-row (min_day, max_day) spine bounds; q99
    * crosses the one-row grand total N; q100 crosses the one-row
    * reference min/max/count and current-count frames; q103 crosses
    * the one-row (nr, nc) totals twice (CDF shares + p-value). */
  private val boundedCross = Set(
    "q17_cosine_topk", "q28_cosine_top_pairs", "q29_tfidf",
    "q46_embed_dedup", "q47_contamination", "q47b_contamination_bloom",
    "q52_mixture_weights", "q56_mixture_resample", "q57_bm25",
    "q61_int8_topk", "q64_dsir_score", "q67_lm_score", "q67b_ppl_buckets",
    "q71_curate_corpus",
    "q78_hll_shards", "q79_pq_ann", "q84_gapfill_ffill", "q88_triangles",
    "q91_collocations", "q31d_frame_ann", "q95_chisq",
    "q99_rank_histogram", "q100_psi_drift", "q103_ks_test")

  test("no registered query plans a cartesian or nested-loop join (whitelisted scalar crosses aside)") {
    val offenders = SparkEntry.queries.toSeq.sortBy(_._1)
      .filterNot(q => boundedCross(q._1)).flatMap { case (name, fn) =>
      try {
        val p = fn(spark, dir).queryExecution
          .explainString(ExplainMode.fromString("formatted"))
        val bad = p.contains("CartesianProduct") || p.contains("BroadcastNestedLoopJoin")
        if (bad) Some(name) else None
      } catch {
        case e: Throwable => Some(s"$name (failed to plan: ${e.getMessage.linesIterator.next()})")
      }
    }
    assert(offenders.isEmpty, s"scale-killer joins in: ${offenders.mkString(", ")}")
  }
}
