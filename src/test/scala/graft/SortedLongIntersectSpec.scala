package graft

import org.apache.spark.sql.functions._

/** Native SortedLongIntersect expression: the merge-walk count must equal
  * size(array_intersect(...)) on sorted distinct arrays — randomized over
  * many overlap shapes — and the SQL registry name must resolve. */
class SortedLongIntersectSpec extends SparkSpec {

  import graft.functions.SortedLongIntersect.sortedIntersect

  test("merge-walk count equals size(array_intersect) on sorted distinct arrays") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val rows = Seq.fill(200) {
      val a = Array.fill(rnd.nextInt(60))(rnd.nextLong() % 50).distinct.sorted
      val b = Array.fill(rnd.nextInt(60))(rnd.nextLong() % 50).distinct.sorted
      (a, b)
    } :+ ((Array.empty[Long], Array(1L, 2L, 3L))) :+ ((Array.empty[Long], Array.empty[Long]))
    val df = rows.toDF("a", "b")
    val out = df.select(
      sortedIntersect(col("a"), col("b")).as("native"),
      size(array_intersect(col("a"), col("b"))).cast("long").as("ref")).collect()
    out.foreach(r => assert(r.getLong(0) == r.getLong(1)))
  }

  test("graft_sorted_intersect resolves in SQL via the session extension") {
    import spark.implicits._
    Seq((Array(1L, 3L, 5L), Array(2L, 3L, 5L, 9L))).toDF("a", "b")
      .createOrReplaceTempView("sli_t")
    val v = spark.sql("SELECT graft_sorted_intersect(a, b) AS n FROM sli_t")
      .collect()(0).getLong(0)
    assert(v == 2L)
  }

  test("graft_sorted_intersect rejects non-long-array inputs at analysis time") {
    import spark.implicits._
    Seq((1, 2)).toDF("a", "b").createOrReplaceTempView("sli_bad")
    val e = intercept[Exception] {
      spark.sql("SELECT graft_sorted_intersect(a, b) FROM sli_bad").collect()
    }
    assert(e.getMessage.toLowerCase.contains("array"))
  }
}
