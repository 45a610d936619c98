package graft

import org.apache.spark.sql.functions._

import graft.queries.{TextOps, VectorOps}

/** Consistency checks for the hash-based near-dup / ANN operators that
  * have no SQL oracle (SURVEY.md §5.2.1-2): each approximate/banded
  * implementation is compared against its exact counterpart. */
class DedupSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("q26 MinHash+LSH verified pairs equal the exact jaccard pairs") {
    val exact = TextOps.q25_jaccard_neardup.fn(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val lsh = TextOps.q26_minhash_lsh.fn(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(exact.nonEmpty, "fixture should contain near-dup pairs")
    assert(lsh == exact)
  }

  test("q27 SimHash chunk-banded pairs equal brute-force hamming pairs") {
    val sigs = TextOps.simhashSignatures(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getLong(1))
    val brute = (for {
      (d1, s1) <- sigs; (d2, s2) <- sigs if d1 < d2
      h = java.lang.Long.bitCount(s1 ^ s2) if h <= 3
    } yield (d1, d2, h)).toSet
    val banded = TextOps.q27_simhash.fn(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(banded == brute)
  }

  test("q30 LSH ANN reaches >= 0.6 recall vs exact q17 top-5") {
    val exact = VectorOps.q17_cosine_topk.fn(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(2))).toSet
    val ann = VectorOps.q30_ann_lsh.fn(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(2))).toSet
    val recall = (exact & ann).size.toDouble / exact.size
    assert(recall >= 0.6, s"recall $recall")
  }

  test("q43 IVF ANN reaches >= 0.6 recall vs exact q17 top-5") {
    val exact = VectorOps.q17_cosine_topk.fn(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(2))).toSet
    val ivf = VectorOps.q43_ann_ivf.fn(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(2))).toSet
    val recall = (exact & ivf).size.toDouble / exact.size
    assert(recall >= 0.6, s"recall $recall")
  }

  test("q28 past-the-gate LSH fallback recovers >= 0.8 of the brute-force top-50") {
    val e = graft.engine.Tables.table(spark, dir, "embeddings")
    val brute = VectorOps.topCosinePairs(e, broadcastLimit = Long.MaxValue).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val fallback = VectorOps.topCosinePairs(e, broadcastLimit = 0L)
    val got = fallback.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (brute & got).size.toDouble / brute.size
    assert(recall >= 0.8, s"recall $recall")
    // the fallback path must not broadcast the corpus — no hint at all
    val hints = fallback.queryExecution.analyzed.collect {
      case h: org.apache.spark.sql.catalyst.plans.logical.ResolvedHint => h
    }
    assert(hints.isEmpty, "past the gate nothing may be broadcast-hinted")
  }

  test("PPJoin pipeline finds exactly the planted near-dup pairs") {
    import spark.implicits._
    // adversarial set: near-identical pair, case-variant exact dup,
    // multi-edit sibling below threshold, unrelated doc — truth computed
    // brute-force on the driver, pipeline must match it exactly
    val base = "the quick brown fox jumps over the lazy dog while the rain " +
      "in spain falls mainly on the plain and all good men come to the aid of the party"
    val docsDf = Seq(
      1L -> base,
      2L -> (base + " tail"),
      3L -> base.replace("quick", "slow").replace("lazy", "busy")
        .replace("rain", "snow").replace("plain", "hill").replace("party", "town"),
      4L -> base.toUpperCase,
      5L -> ("completely different content about spark partitions shuffles " +
        "and codegen stages for analytics engines running at cluster scale"))
      .toDF("doc_id", "text")
    // production shingling + threshold, not a copy — so this test keeps
    // exercising exactly what q25 runs if either ever changes
    val sh = TextOps.shinglesOf(docsDf)
    // g is the shingle's xxhash64 (long); hashed sets have the same
    // jaccard as string sets absent collisions, which the 5-doc fixture
    // cannot produce
    val sets = sh.collect().groupBy(_.getLong(0))
      .map { case (id, rs) => id -> rs.map(_.getLong(1)).toSet }
    val want = (for {
      a <- sets.keys; b <- sets.keys if a < b
      j = (sets(a) & sets(b)).size.toDouble / (sets(a) | sets(b)).size
      if j >= TextOps.JaccardTau
    } yield (a, b)).toSet
    assert(want.nonEmpty, "test must plant at least one true near-dup pair")
    val (cand, prefix) = TextOps.ppjoinCandidates(sh)
    val got = TextOps.rawJaccard(TextOps.shingleSetsOf(docsDf), cand)
      .select("d1", "d2").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    prefix.unpersist()
    assert(got == want, s"pipeline $got vs brute force $want")
  }

  test("exact dedup drops a planted duplicate") {
    import spark.implicits._
    val docs = Seq(
      (1L, "Hello   World", "en", "s", 11L),
      (2L, "hello world", "en", "s", 11L),
      (3L, "different doc", "en", "s", 13L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val norm = trim(regexp_replace(lower(col("text")), "\\s+", " "))
    val n = docs.select(norm.as("n")).distinct().count()
    assert(n == 2, "case/whitespace variants must normalize together")
  }
}
