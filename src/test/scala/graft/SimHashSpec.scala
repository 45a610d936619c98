package graft

import org.apache.spark.sql.functions._

/** Bitwise gate for the fused graft_simhash expression: it must equal
  * the exploded 64-column aggregation form it replaced, value for
  * value — same per-token xxhash64 (XXH64 seed 42 over UTF-8 bytes),
  * same ±1 counters, same >= 0 sign packing. */
class SimHashSpec extends SparkSpec {

  /** The aggregation form q27 originally shipped with, verbatim. */
  private def aggSimhash(tokens: org.apache.spark.sql.DataFrame) = {
    val toks = tokens.select(col("doc_id"), explode(col("toks")).as("w"))
      .select(col("doc_id"), xxhash64(col("w")).as("th"))
    val bitSums = (0 until 64).map(k =>
      sum(shiftrightunsigned(col("th"), k).bitwiseAND(lit(1L)) * 2 - 1).as(s"s$k"))
    val sig = (0 until 64)
      .map(k => when(col(s"s$k") >= 0, shiftleft(lit(1L), k)).otherwise(lit(0L)))
      .reduce(_.bitwiseOR(_))
    toks.groupBy("doc_id").agg(bitSums.head, bitSums.tail: _*)
      .select(col("doc_id"), sig.as("sig"))
  }

  test("graft_simhash equals the 64-column aggregation form bitwise on the fixture") {
    val tokens = engine.Tables.table(spark, "/root/testdata/sf0.001", "documents")
      .select(col("doc_id"),
        array_distinct(expr(
          s"filter(split(${graft.queries.TextOps.normExpr}, ' '), w -> length(w) > 0)")).as("toks"))
      .filter(size(col("toks")) > 0)
    val fused = tokens.select(col("doc_id"), expr("graft_simhash(toks)").as("sig"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val agg = aggSimhash(tokens).collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(fused.nonEmpty && fused == agg)
  }

  test("graft_simhash edge cases: unicode tokens, single token, empty array") {
    import spark.implicits._
    val df = Seq(
      (1L, Seq("héllo", "wörld", "日本語")),
      (2L, Seq("x")),
      (3L, Seq.empty[String]))
      .toDF("doc_id", "toks")
      // toDF infers containsNull=true for Seq[String]; the expression
      // demands non-null slots, so assert that coalesce satisfies it
      .select(col("doc_id"), expr("transform(toks, x -> coalesce(x, ''))").as("toks"))
    val fused = df.select(col("doc_id"), expr("graft_simhash(toks)").as("sig"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val agg = aggSimhash(df.filter(size(col("toks")) > 0))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(fused(1L) == agg(1L) && fused(2L) == agg(2L))
    // empty set: all counters 0 => every bit passes >= 0 (documented)
    assert(fused(3L) == -1L)
    // single token: signature IS the token's hash bit pattern
    val h = df.filter($"doc_id" === 2L)
      .select(xxhash64(element_at(col("toks"), 1))).head().getLong(0)
    assert(fused(2L) == h)
  }
}
