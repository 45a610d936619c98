package graft

import org.apache.spark.sql.functions._

import graft.engine.Skew

/** Salted-join equivalence: the skew tool must be a pure plan rewrite —
  * identical results to the plain join on skewed data. */
class SkewSpec extends SparkSpec {

  test("saltedJoin equals plain join on heavily skewed keys") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    // 90% of fact rows share one hot key
    val fact = (1 to 20000).map { i =>
      val k = if (rnd.nextDouble() < 0.9) 1L else rnd.nextInt(100).toLong + 2
      (k, i.toLong)
    }.toDF("key", "payload")
    val dim = (1L to 101L).map(k => (k, s"dim$k")).toDF("key", "attr")
    val plain = fact.join(dim, Seq("key"))
    val salted = Skew.saltedJoin(fact, dim, "key", salts = 8)
    assert(salted.count() == plain.count())
    assert(salted.exceptAll(plain).count() == 0)
    assert(plain.exceptAll(salted).count() == 0)
    // the hot key's rows really are spread across several salt sub-keys
    val spread = fact.withColumn("__salt",
        pmod(xxhash64(monotonically_increasing_id()), lit(8)).cast("int"))
      .filter(col("key") === 1).select("__salt").distinct().count()
    assert(spread >= 6, s"hot key only spread over $spread salts")
  }
}
