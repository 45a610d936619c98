package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.queries.RangeOps

/** RangeJoinBinning rule: semantics (binned ≡ stock nested-loop result on
  * every edge shape), plan shape (equi-join on bins, never a nested loop,
  * even with broadcast disabled — the 100 TB shape), and scope (joins
  * that already have an equi key are left untouched). */
class RangeJoinSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def withConf[A](pairs: (String, String)*)(body: => A): A = {
    val olds = pairs.map { case (k, _) => k -> spark.conf.getOption(k) }
    pairs.foreach { case (k, v) => spark.conf.set(k, v) }
    try body
    finally olds.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }

  private def sortedRows(df: DataFrame): Seq[String] =
    df.collect().map(_.toString).toSeq.sorted

  /** Points with nulls/negatives/boundary values; intervals with empty
    * (lo > hi), degenerate (lo == hi), null-bounded, and many-bin spans. */
  private def synthetic: (DataFrame, DataFrame) = {
    import spark.implicits._
    val points = Seq[Option[Double]](
      Some(-3000.0), Some(-1024.0), Some(-1.0), Some(0.0), Some(1.0),
      Some(1023.999), Some(1024.0), Some(5000.0), Some(99999.0), None)
      .toDF("x").withColumn("pid", monotonically_increasing_id())
    val intervals = Seq[(Option[Double], Option[Double], String)](
      (Some(0.0), Some(1024.0), "unit"),          // exactly one bin + boundary
      (Some(-2048.0), Some(-1.0), "negative"),
      (Some(5.0), Some(5.0), "degenerate"),
      (Some(10.0), Some(-10.0), "empty"),         // lo > hi: matches nothing
      (Some(-5000.0), Some(100000.0), "wide"),    // spans ~100 bins
      (None, Some(50.0), "null_lo"),
      (Some(50.0), None, "null_hi"))
      .toDF("lo", "hi", "iname")
    (points, intervals)
  }

  test("q53 binned range join ≡ stock Spark nested-loop result") {
    val on = sortedRows(RangeOps.q53_range_join.fn(spark, dir))
    val off = withConf("spark.graft.rangeJoin.enabled" -> "false") {
      sortedRows(RangeOps.q53_range_join.fn(spark, dir))
    }
    assert(on.nonEmpty && on == off)
  }

  test("q53 plans as an equi-join on bins; stock plan is a nested loop") {
    val p = RangeOps.q53_range_join.fn(spark, dir).queryExecution.executedPlan.toString
    assert(p.contains("graft_bin"), "bin columns must appear in the plan")
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"))
    // De-vacuify: without the rule this query IS a nested loop, so the
    // assertion above can't pass by accident.
    withConf("spark.graft.rangeJoin.enabled" -> "false") {
      val stock = RangeOps.q53_range_join.fn(spark, dir).queryExecution.executedPlan.toString
      assert(stock.contains("BroadcastNestedLoopJoin"))
    }
  }

  test("edge shapes: nulls, empty/degenerate/wide intervals, boundaries") {
    val (points, intervals) = synthetic
    val joined = points.join(intervals, col("x") >= col("lo") && col("x") <= col("hi"))
    val on = sortedRows(joined)
    val off = withConf("spark.graft.rangeJoin.enabled" -> "false")(sortedRows(joined))
    assert(on == off)
    // Ground a few semantics directly: boundary values are inclusive,
    // empty and null-bounded intervals match nothing.
    val byName = joined.groupBy("iname").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byName("unit") == 4L)      // 0, 1, 1023.999, 1024 — both ends inclusive
    assert(byName("negative") == 2L)  // -1024, -1
    assert(!byName.contains("degenerate")) // [5,5] holds no point in the set
    assert(!byName.contains("empty") && !byName.contains("null_lo") && !byName.contains("null_hi"))
  }

  test("strict bounds and point-on-right both rewrite and agree with stock") {
    val (points, intervals) = synthetic
    val strict = points.join(intervals, col("x") > col("lo") && col("x") < col("hi"))
    val flipped = intervals.join(points, col("x") >= col("lo") && col("x") <= col("hi"))
    for (df <- Seq(strict, flipped)) {
      val p = df.queryExecution.executedPlan.toString
      assert(p.contains("graft_bin"), s"rule must fire:\n$p")
      val on = sortedRows(df)
      val off = withConf("spark.graft.rangeJoin.enabled" -> "false")(sortedRows(df))
      assert(on == off)
    }
  }

  test("with broadcast disabled the join is still hash-based, never a nested loop") {
    val (points, intervals) = synthetic
    withConf("spark.sql.autoBroadcastJoinThreshold" -> "-1") {
      val joined = points.join(intervals, col("x") >= col("lo") && col("x") <= col("hi"))
      val p = joined.queryExecution.executedPlan.toString
      assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
        s"expected a shuffled equi-join on bins at any scale:\n$p")
      assert(p.contains("SortMergeJoin") || p.contains("ShuffledHashJoin"))
    }
  }

  test("bin width only tunes replication, never the result") {
    val (points, intervals) = synthetic
    val joined = points.join(intervals, col("x") >= col("lo") && col("x") <= col("hi"))
    val base = sortedRows(joined)
    for (w <- Seq("7.5", "100000"))
      withConf("spark.graft.rangeJoin.binWidth" -> w) {
        assert(sortedRows(joined) == base, s"binWidth=$w changed the result")
      }
  }

  test("joins with an equi key are left untouched") {
    import spark.implicits._
    val a = Seq((1L, 10.0), (2L, 20.0)).toDF("k", "x")
    val b = Seq((1L, 0.0, 100.0), (2L, 15.0, 30.0)).toDF("k2", "lo", "hi")
    val j = a.join(b, col("k") === col("k2") && col("x") >= col("lo") && col("x") <= col("hi"))
    assert(!j.queryExecution.optimizedPlan.toString.contains("graft_bin"))
    assert(j.count() == 2)
  }
}
