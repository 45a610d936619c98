package graft

import org.apache.spark.sql.functions._

/** Native DotProduct expression (graft.functions.DotProduct): codegen
  * evaluation must be bit-identical to the HOF formulation it replaced,
  * and the SQL registry name must resolve via SparkSessionExtensions. */
class DotProductSpec extends SparkSpec {

  test("graft_dot equals the HOF zip_with/aggregate formulation bitwise") {
    import spark.implicits._
    val rnd = new scala.util.Random(5)
    val rows = Seq.fill(100)((
      Array.fill(64)(rnd.nextFloat() * 2 - 1),
      Array.fill(64)(rnd.nextFloat() * 2 - 1)))
    val df = rows.toDF("a", "b")
    val out = df.select(
      graft.functions.DotProduct.dot(col("a"), col("b")).as("native"),
      aggregate(zip_with(col("a"), col("b"), (x, y) => x.cast("double") * y.cast("double")),
        lit(0.0), (acc, v) => acc + v).as("hof")).collect()
    out.foreach { r =>
      assert(java.lang.Double.doubleToLongBits(r.getDouble(0))
        == java.lang.Double.doubleToLongBits(r.getDouble(1)))
    }
  }

  test("graft_dot on tinyint arrays equals the HOF formulation bitwise") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    // Seq[Byte], not Array[Byte]: the latter encodes as BinaryType
    val rows = Seq.fill(100)((
      Seq.fill(64)((rnd.nextInt(255) - 127).toByte),
      Seq.fill(64)((rnd.nextInt(255) - 127).toByte)))
    val out = rows.toDF("a", "b").select(
      graft.functions.DotProduct.dot(col("a"), col("b")).as("native"),
      aggregate(zip_with(col("a"), col("b"), (x, y) => x.cast("double") * y.cast("double")),
        lit(0.0), (acc, v) => acc + v).as("hof")).collect()
    out.foreach { r =>
      assert(java.lang.Double.doubleToLongBits(r.getDouble(0))
        == java.lang.Double.doubleToLongBits(r.getDouble(1)))
    }
  }

  test("graft_dot rejects mixed float/tinyint arrays at analysis time") {
    import spark.implicits._
    Seq((Seq(1.0f, 2.0f), Seq(3.toByte, 4.toByte))).toDF("a", "b")
      .createOrReplaceTempView("dot_mixed")
    val e = intercept[Exception] {
      spark.sql("SELECT graft_dot(a, b) FROM dot_mixed").collect()
    }
    assert(e.getMessage.toLowerCase.contains("array"))
  }

  test("graft_dot resolves in SQL via the session extension") {
    import spark.implicits._
    Seq((Array(1.0f, 2.0f), Array(3.0f, 4.0f))).toDF("a", "b")
      .createOrReplaceTempView("dot_t")
    val v = spark.sql("SELECT graft_dot(a, b) AS d FROM dot_t").collect()(0).getDouble(0)
    assert(v == 11.0)
  }

  test("graft_dot rejects non-float-array inputs at analysis time") {
    import spark.implicits._
    Seq((1, 2)).toDF("a", "b").createOrReplaceTempView("dot_bad")
    val e = intercept[Exception] {
      spark.sql("SELECT graft_dot(a, b) FROM dot_bad").collect()
    }
    assert(e.getMessage.toLowerCase.contains("array"))
  }
}
