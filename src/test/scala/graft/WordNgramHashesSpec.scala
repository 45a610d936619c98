package graft

import org.apache.spark.sql.functions._

/** Bitwise gate for the fused graft_word_ngram_hashes expression: its
  * hash SET must equal the HOF form it replaced — same per-gram value
  * (XXH64 seed 42 over the space-joined window's UTF-8 bytes), sorted
  * here vs first-occurrence there, so compare as sorted sets. */
class WordNgramHashesSpec extends SparkSpec {

  private val hofForm =
    """CASE WHEN size(a) >= 3 THEN sort_array(array_distinct(transform(
      |  sequence(0, size(a) - 3),
      |  i -> xxhash64(concat_ws(' ', a[i], a[i+1], a[i+2])))))
      |ELSE CAST(array() AS ARRAY<BIGINT>) END""".stripMargin

  test("fused trigram hashes equal the HOF form on the fixture") {
    val d = engine.Tables.table(spark, "/root/testdata/sf0.001", "documents")
      .select(col("doc_id"),
        split(expr(graft.queries.Pipeline.normExprStr), " ").as("a"))
    val fused = d.select(col("doc_id"), expr("graft_word_ngram_hashes(a, 3)").as("g"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    val hof = d.select(col("doc_id"), expr(hofForm).as("g"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(fused.nonEmpty && fused == hof)
    assert(fused.values.exists(_.nonEmpty), "fixture must produce grams")
  }

  test("fused trigram hashes edge cases: short arrays, unicode, n=1") {
    import spark.implicits._
    val df = Seq(
      (1L, Seq("a", "b")),                        // shorter than n -> empty
      (2L, Seq("héllo", "wörld", "日本語", "x")), // unicode byte boundaries
      (3L, Seq("t", "t", "t", "t")))              // dup grams collapse
      .toDF("doc_id", "toks")
      .select(col("doc_id"), expr("transform(toks, x -> coalesce(x, ''))").as("a"))
    val fused = df.select(col("doc_id"), expr("graft_word_ngram_hashes(a, 3)").as("g"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    val hof = df.select(col("doc_id"), expr(hofForm).as("g"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(fused == hof)
    assert(fused(1L).isEmpty && fused(3L).length == 1)
    // n=1 degenerates to per-token hashes
    val one = df.filter($"doc_id" === 2L)
      .select(expr("graft_word_ngram_hashes(a, 1)")).head.getSeq[Long](0)
    val direct = df.filter($"doc_id" === 2L)
      .select(expr("sort_array(array_distinct(transform(a, x -> xxhash64(x))))"))
      .head.getSeq[Long](0)
    assert(one == direct)
  }
}
