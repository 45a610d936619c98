package graft

import org.apache.spark.sql.functions._

/** Native MinHashSignature expression: the fused array path must be
  * BITWISE equal to the exploded 48-min-aggregation form it replaces —
  * on random arrays and on the real corpus via bandedOfSets ≡ bandedOf
  * (the invariant that keeps q26/q54b/q60 buckets and the streaming
  * seen-store stable across the switch). */
class MinHashSignatureSpec extends SparkSpec {

  import graft.functions.MinHashSignature

  private val dir = "/root/testdata/sf0.001"

  test("fused signature equals the exploded min-aggregation form bitwise") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    val rows = Seq.tabulate(100) { i =>
      (i.toLong, Array.fill(1 + rnd.nextInt(80))(rnd.nextLong()))
    }
    val df = rows.toDF("doc_id", "gs")
    val fused = df.select(col("doc_id"), MinHashSignature.minhashes(col("gs")).as("m"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    // the aggregation form bandedOf runs: explode, xxhash64 the BIGINT
    // column, pmod into [0, P), 48 permutation minima
    val p = MinHashSignature.P
    val mins = (0 until MinHashSignature.K).map(i =>
      min((col("h") * lit(MinHashSignature.a(i)) + lit(MinHashSignature.b(i))) % p).as(s"m$i"))
    val agg = df.select(col("doc_id"), explode(col("gs")).as("g"))
      .select(col("doc_id"), pmod(xxhash64(col("g")), lit(p)).as("h"))
      .groupBy("doc_id").agg(mins.head, mins.tail: _*)
      .collect().map(r => r.getLong(0) -> (1 to MinHashSignature.K).map(r.getLong(_))).toMap
    assert(fused.keySet == agg.keySet)
    fused.foreach { case (id, m) => assert(m == agg(id), s"doc $id signature differs") }
  }

  test("bandedOfSets equals bandedOf on the real corpus (bucket stability)") {
    val viaSets = graft.queries.TextOps.bandedOfSets(
        graft.queries.TextOps.shingleSets(spark, dir))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    val viaAgg = graft.queries.TextOps.bandedOf(
        graft.queries.TextOps.shingles(spark, dir))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    assert(viaSets.nonEmpty)
    assert(viaSets == viaAgg)
  }

  test("graft_minhashes resolves in SQL, returns 48 minima, empty for empty") {
    import spark.implicits._
    Seq((1L, Array(7L, 9L)), (2L, Array.empty[Long]))
      .toDF("doc_id", "gs").createOrReplaceTempView("mh_t")
    val rows = spark.sql("SELECT doc_id, graft_minhashes(gs) AS m FROM mh_t")
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(rows(1L).length == MinHashSignature.K)
    assert(rows(1L).forall(v => v >= 0 && v < MinHashSignature.P))
    assert(rows(2L).isEmpty)
  }
}
