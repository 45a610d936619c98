package graft

import org.apache.spark.sql.execution.ExplainMode
import org.apache.spark.sql.functions._

import graft.queries.Multimodal

/** Gates for the batched-columnar embedding-inference stage
  * (graft.plans.EmbedInference): plan shape (the stage consumes the
  * parquet scan's ColumnarBatch directly — no ColumnarToRow below it),
  * bitwise equality with the declarative per-row formulation, and
  * null/empty payload handling through the RowToColumnar path. */
class MultimodalSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def payloads = graft.engine.Tables.table(spark, dir, "documents")
    .select(col("doc_id"), col("text"))

  test("embed stage runs columnar directly on the scan: no ColumnarToRow below it") {
    val p = Multimodal.embedStub(payloads, 8).queryExecution
      .explainString(ExplainMode.fromString("formatted"))
    val tree = p.split("\n\n").head
    val lines = tree.linesIterator.toVector
    val stage = lines.indexWhere(_.contains("EmbedInference"))
    val scan = lines.indexWhere(_.contains("Scan parquet"))
    assert(stage >= 0, s"columnar stage missing from plan:\n$tree")
    assert(scan > stage, s"scan must feed the stage:\n$tree")
    // tree prints parents first: anything between the stage and the scan
    // would be an extra operator under the stage — in particular a
    // ColumnarToRow, which would mean the batches were row-ified first
    assert(!lines.slice(stage + 1, scan + 1).exists(_.contains("ColumnarToRow")),
      s"stage must consume the scan's ColumnarBatch directly:\n$tree")
    assert(lines.take(stage).exists(_.contains("ColumnarToRow")),
      s"rows should first materialize ABOVE the stage:\n$tree")
  }

  test("columnar kernel equals the declarative per-row formulation bitwise") {
    val got = Multimodal.embedStub(payloads, 8)
      .select(col("doc_id"), col("embedding")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    val ref = payloads.select(col("doc_id"),
      transform(sequence(lit(0), lit(7)), k =>
        // Spark's / promotes to double; the final float cast matches the
        // kernel's single-rounded float division (m/127 is never a float
        // halfway point, so double-then-float == direct float division)
        (((octet_length(col("text")) + k * 31) % 127) / lit(127.0d)).cast("float")))
      .collect().map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    assert(got.keySet == ref.keySet && got.nonEmpty)
    got.foreach { case (id, v) => assert(v == ref(id), s"doc $id") }
  }

  test("null and empty payloads embed as length 0 (through RowToColumnar)") {
    import spark.implicits._
    val df = Seq((1L, "x".getBytes), (2L, Array.empty[Byte]), (3L, null: Array[Byte]))
      .toDF("doc_id", "payload")
    val out = Multimodal.embedStub(df, 4).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](2)).toMap
    def cellRef(len: Int) = (0 until 4).map(k => ((len + 31 * k) % 127) / 127.0f)
    assert(out(1L) == cellRef(1))
    assert(out(2L) == cellRef(0))
    assert(out(3L) == cellRef(0), "null payload must embed deterministically, not NPE")
  }
}
