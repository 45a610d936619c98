package graft

import org.apache.spark.sql.functions._

import graft.engine.Tables

/** graft_shingle_hashes must be bit-identical to the declarative HOF form
  * `sort_array(array_distinct(transform(..., i -> xxhash64(substring))))`
  * — same XXH64 seed-42 bytes hashing, same sort, same dedup — on both
  * the real corpus and planted multi-byte UTF-8 (the fused pass walks
  * char boundaries itself, which ASCII-only corpus data never
  * exercises). */
class ShingleHashesSpec extends SparkSpec {

  private val hofForm =
    "sort_array(array_distinct(transform(sequence(0, length(norm) - 5), " +
      "i -> xxhash64(substring(norm, i + 1, 5)))))"

  private def mismatches(df: org.apache.spark.sql.DataFrame): Long =
    df.select(expr("graft_shingle_hashes(norm, 5)").as("fused"), expr(hofForm).as("hof"))
      .filter(expr("fused != hof")).count()

  test("fused expression equals the HOF form bitwise on the corpus") {
    val docs = Tables.table(spark, "/root/testdata/sf0.001", "documents")
      .select(expr("trim(regexp_replace(lower(text), '\\\\s+', ' '))").as("norm"))
      .filter(length(col("norm")) >= 5)
    assert(docs.count() > 0)
    assert(mismatches(docs) == 0L)
  }

  test("fused expression equals the HOF form on multi-byte UTF-8") {
    import spark.implicits._
    val planted = Seq(
      "héllo wörld ünïcode garçon café naïve",
      "日本語のテキストで五文字のシングルを検証する",
      "mixed ascii und ümlaute ähnlich übel",
      "emoji 😀😃😄😁 inside 🌍 text",
      "exact").toDF("norm").filter(length(col("norm")) >= 5)
    assert(mismatches(planted) == 0L)
  }

  test("strings shorter than the width yield an empty array") {
    import spark.implicits._
    val r = Seq("abcd").toDF("norm")
      .select(size(expr("graft_shingle_hashes(norm, 5)")).as("n")).head().getInt(0)
    assert(r == 0)
  }
}
