package graft

import org.apache.spark.sql.functions._

import graft.functions.NearestCells.nearestCells

/** Native NearestCells expression (graft.functions.NearestCells): the
  * codegen'd IVF assignment/probe kernel must reproduce the interpreted
  * argmax / stable-sort-desc-take-k UDF semantics it replaced EXACTLY —
  * the IVF index layout and every recall gate downstream (q43, q62,
  * q79b) depend on deterministic cell ids. */
class NearestCellsSpec extends SparkSpec {

  private def mkCents(n: Int, dim: Int, seed: Int): Array[Array[Double]] = {
    val rnd = new scala.util.Random(seed)
    Array.fill(n)(Array.fill(dim)(rnd.nextGaussian()))
  }

  /** The interpreted reference: dots, stable sort by -dot, take k. */
  private def refCells(cs: Array[Array[Double]], v: Array[Float], k: Int): Seq[Int] =
    cs.indices.map { c =>
      val ct = cs(c); var d = 0.0; var i = 0
      while (i < ct.length) { d += ct(i) * v(i).toDouble; i += 1 }
      (c, d)
    }.sortBy(-_._2).take(k).map(_._1)

  test("graft_nearest_cells equals the interpreted stable top-k on random data") {
    import spark.implicits._
    val cents = mkCents(16, 64, 11)
    val rnd = new scala.util.Random(13)
    val rows = Seq.tabulate(200)(i => (i.toLong, Array.fill(64)(rnd.nextFloat() * 2 - 1)))
    val got = rows.toDF("id", "v")
      .select(col("id"), nearestCells(col("v"), cents, 4).as("cells"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    rows.foreach { case (id, v) =>
      assert(got(id) == refCells(cents, v, 4), s"vector $id")
    }
  }

  test("ties break toward the lower cell id (duplicate centroids)") {
    import spark.implicits._
    val c = Array.fill(8)(1.0)
    // cells 1 and 3 are identical; both beat the zero cell
    val cents = Array(Array.fill(8)(0.0), c, Array.fill(8)(-1.0), c.clone())
    val out = Seq(Tuple1(Array.fill(8)(1.0f))).toDF("v")
      .select(nearestCells(col("v"), cents, 3).as("cells"))
      .head().getSeq[Int](0)
    assert(out == Seq(1, 3, 0), s"stable tie order violated: $out")
  }

  test("the expression resolves through SQL and k=1 matches the argmax form") {
    import spark.implicits._
    val cents = mkCents(8, 16, 3)
    val rnd = new scala.util.Random(17)
    Seq.tabulate(50)(i => (i.toLong, Array.fill(16)(rnd.nextFloat())))
      .toDF("id", "v").createOrReplaceTempView("nc_t")
    val lit = cents.map(_.map(v => s"${v}D").mkString("array(", ",", ")"))
      .mkString("array(", ",", ")")
    val viaSql = spark.sql(
      s"SELECT id, element_at(graft_nearest_cells(v, $lit, 1), 1) AS cell FROM nc_t")
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val viaCol = spark.table("nc_t")
      .select(col("id"), element_at(nearestCells(col("v"), cents, 1), 1).as("cell"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(viaSql == viaCol)
    viaSql.foreach { case (id, cell) =>
      // argmax = head of the full ranking
      val v = spark.table("nc_t").filter(col("id") === id)
        .head().getSeq[Float](1).toArray
      assert(cell == refCells(cents, v, 1).head)
    }
  }

  test("robustness: all-NaN vectors fall back to lowest cells; long vectors clamp to centroid dim") {
    import spark.implicits._
    val cents = mkCents(4, 8, 7)
    // NaN embedding: every dot is NaN, no comparison fires — the old
    // interpreted UDF returned cell 0; the k>1 form must keep emitting
    // lowest-unused ids, never index used(-1)
    val nan = Seq(Tuple1(Array.fill(8)(Float.NaN))).toDF("v")
      .select(nearestCells(col("v"), cents, 3).as("cells"))
      .head().getSeq[Int](0)
    assert(nan == Seq(0, 1, 2), s"NaN fallback must be lowest unused ids: $nan")
    // vector longer than the centroid dim: iterate min(dims), as the
    // UDF's ct.length loop did — must not throw AIOOBE
    val long = Seq(Tuple1(Array.fill(12)(1.0f))).toDF("v")
      .select(nearestCells(col("v"), cents, 1).as("cells"))
      .head().getSeq[Int](0)
    assert(long == refCells(cents, Array.fill(8)(1.0f), 1), s"clamped dot mismatch: $long")
  }

  test("the IVF build scan stays whole-stage codegen (no BatchEvalPython/ScalaUDF)") {
    val cents = mkCents(16, 64, 5)
    val e = graft.engine.Tables.table(spark, "/root/testdata/sf0.001", "embeddings")
      .select(col("vec_id"), nearestCells(col("embedding"), cents, 1).as("cells"))
    val p = e.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    assert(!p.contains("ScalaUDF") && !p.contains("BatchEval"),
      s"assignment must be a native expression:\n$p")
    // formatted explain marks whole-stage-codegen operators with '*'
    assert(p.contains("* Project"), s"assignment must stay codegen'd:\n$p")
  }
}
