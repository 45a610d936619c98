package graft

import org.apache.spark.sql.functions._

import graft.ops.Iterate

/** The shared driver-loop combinator's contract (graft.ops.Iterate):
  * both iterative operators (Heroic.fixedPoint, connectedComponents)
  * lean on these properties, so they are pinned once here rather than
  * re-proven per operator. */
class IterateSpec extends SparkSpec {

  import spark.implicits._

  private def inc(df: org.apache.spark.sql.DataFrame) =
    df.select((col("x") + 1).as("x"))

  test("loop runs until the measure converges, then exactly `extra` more rounds") {
    var measured = 0
    val fix = Iterate.loop(Seq(0).toDF("x").persist(), maxRounds = 100, extra = 2) {
      (cur, _) => inc(cur)
    } { (_, next) =>
      measured += 1
      next.head().getInt(0) >= 5 // converges on round 5
    }
    assert(fix.rounds == 7, s"5 converging + 2 extra, got ${fix.rounds}")
    assert(measured == 7, "measure must also run on extra rounds (MSE trajectories)")
    assert(fix.cur.head().getInt(0) == 7)
    assert(fix.prev.head().getInt(0) == 6, "second-to-last generation retained")
  }

  test("maxRounds bounds a non-converging loop") {
    val fix = Iterate.loop(Seq(0).toDF("x").persist(), maxRounds = 4) {
      (cur, _) => inc(cur)
    } { (_, _) => false }
    assert(fix.rounds == 4 && fix.cur.head().getInt(0) == 4)
  }

  test("localCheckpoint cadence truncates lineage (plan becomes an RDD scan)") {
    // Catalyst collapses the per-round Projects either way, so plan DEPTH
    // can't distinguish the two; what the cadence changes is the plan's
    // LEAF — a checkpointed generation scans a materialized RDD
    // (LogicalRDD), severing recompute lineage, while an uncheckpointed
    // one still bottoms out in the original relation.
    def rddScan(df: org.apache.spark.sql.DataFrame): Boolean =
      df.queryExecution.optimizedPlan.collect {
        case p if p.nodeName == "LogicalRDD" => p
      }.nonEmpty
    val shallow = Iterate.loop(Seq(0).toDF("x").persist(), 5, checkpointEvery = 5) {
      (cur, _) => inc(cur)
    } { (_, _) => false }
    val deep = Iterate.loop(Seq(0).toDF("x").persist(), 5, checkpointEvery = 1000) {
      (cur, _) => inc(cur)
    } { (_, _) => false }
    assert(rddScan(shallow.cur), "round-5 checkpoint must leave a LogicalRDD leaf")
    assert(!rddScan(deep.cur), "no checkpoint => no LogicalRDD leaf")
    assert(shallow.cur.head().getInt(0) == deep.cur.head().getInt(0))
  }

  test("only the last two generations stay persisted") {
    val sc = spark.sparkContext
    val before = sc.getPersistentRDDs.size
    val fix = Iterate.loop(Seq(0).toDF("x").persist(), 6, checkpointEvery = 1000) {
      (cur, _) => inc(cur)
    } { (_, next) => next.count(); false }
    val during = sc.getPersistentRDDs.size
    // init was unpersisted by the loop once generation 2 landed; only
    // prev + cur remain beyond whatever was persisted before the test
    assert(during - before <= 2, s"expected <= 2 new persisted RDDs, got ${during - before}")
    fix.cur.unpersist(); fix.prev.unpersist()
  }
}
