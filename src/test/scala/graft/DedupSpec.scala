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
