package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, AttributeReference}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}
import org.apache.spark.sql.execution.vectorized.OnHeapColumnVector
import org.apache.spark.sql.types.{ArrayType, BinaryType, FloatType, StringType}
import org.apache.spark.sql.vectorized.{ColumnVector, ColumnarBatch}

/** Batched-columnar "embedding inference" stage: a whole-operator
  * extension (`LogicalPlan` + `SparkStrategy` + columnar `SparkPlan`,
  * registered via SparkSessionExtensions) that appends an
  * `array<float>` embedding column computed batch-at-a-time.
  *
  * This is the shape a production embedding-inference stage runs —
  * hand the accelerator a COLUMNAR batch, get a columnar batch of
  * vectors back — demonstrated Scala-native: `supportsColumnar=true`,
  * `doExecuteColumnar` consumes the parquet scan's ColumnarBatch
  * directly (MultimodalSpec pins the plan: NO ColumnarToRow below the
  * stage; rows first materialize above it), writes the vectors into an
  * OnHeapColumnVector, and never materializes a row. The Python-side
  * equivalent is `mapInArrow`/`mapInPandas`; in a JVM pipeline the
  * batch API is ColumnarBatch itself. The payload column may be
  * `string` or `binary` — reading the string column directly keeps the
  * child a bare column-pruned scan (a cast would interpose a row-wise
  * Project and force a RowToColumnar round trip).
  *
  * The MODEL is a deterministic stub, like the Multimodal codecs (this
  * container ships no inference runtime): embedding[k] =
  * ((octet_length(payload) + 31k) mod 127) / 127 in float — arithmetic
  * a SQL oracle reproduces exactly, so the whole stage is oracled end
  * to end (q31e). A real deployment swaps ONLY the per-batch kernel
  * body for a model call; the operator contract (schema, batch shape,
  * columnar I/O, row fallback) is what this node locks in.
  *
  * The output attribute is a constructor field (with its fixed exprId),
  * not a derived val: tree transforms copy() the node, and a re-minted
  * attribute would orphan downstream references. */
case class EmbedInference(dim: Int, child: LogicalPlan,
    embedAttr: AttributeReference = AttributeReference("embedding",
      ArrayType(FloatType, containsNull = false), nullable = false)())
    extends UnaryNode {
  override def output: Seq[Attribute] = child.output :+ embedAttr
  // embedding is GENERATED here, not consumed — without this,
  // CheckAnalysis reports it missing from the child's output
  override def producedAttributes: org.apache.spark.sql.catalyst.expressions.AttributeSet =
    org.apache.spark.sql.catalyst.expressions.AttributeSet(embedAttr :: Nil)
  // the kernel reads the payload column even when no parent projects it,
  // so the whole child output is required — otherwise ColumnPruning
  // strips the payload from under the stage. Callers project the frame
  // down to (keys, payload) BEFORE embedding (the q31e shape).
  override def references: org.apache.spark.sql.catalyst.expressions.AttributeSet =
    org.apache.spark.sql.catalyst.expressions.AttributeSet(child.output)
  override protected def withNewChildInternal(newChild: LogicalPlan): EmbedInference =
    copy(child = newChild)
}

object EmbedInference {
  /** embedding[k] for a payload of `len` bytes — the stub model, shared
    * by the columnar kernel, the row fallback, and the spec's reference. */
  @inline def cell(len: Int, k: Int): Float = ((len + 31 * k) % 127) / 127.0f
}

case class EmbedInferenceExec(dim: Int, embedAttr: AttributeReference,
    child: SparkPlan) extends UnaryExecNode {

  override def output: Seq[Attribute] = child.output :+ embedAttr
  override def producedAttributes: org.apache.spark.sql.catalyst.expressions.AttributeSet =
    org.apache.spark.sql.catalyst.expressions.AttributeSet(embedAttr :: Nil)
  override def outputPartitioning: org.apache.spark.sql.catalyst.plans.physical.Partitioning =
    child.outputPartitioning

  /** The payload column: the child's last string/binary column. */
  private def payloadIdx: Int = {
    val i = child.output.lastIndexWhere(a =>
      a.dataType == BinaryType || a.dataType == StringType)
    require(i >= 0, "EmbedInference child must expose a string or binary payload column")
    i
  }

  private def isString: Boolean = child.output(payloadIdx).dataType == StringType

  override def supportsColumnar: Boolean = true

  override protected def doExecuteColumnar(): RDD[ColumnarBatch] = {
    val d = dim
    val pIdx = payloadIdx
    val str = isString
    child.executeColumnar().map { batch =>
      val n = batch.numRows()
      val vec = new OnHeapColumnVector(n, ArrayType(FloatType, containsNull = false))
      val data = vec.arrayData()
      data.reserve(n * d)
      val pay = batch.column(pIdx)
      var r = 0
      while (r < n) {
        val len =
          if (pay.isNullAt(r)) 0
          else if (str) pay.getUTF8String(r).numBytes
          else pay.getBinary(r).length
        var k = 0
        while (k < d) {
          data.putFloat(r * d + k, EmbedInference.cell(len, k))
          k += 1
        }
        vec.putArray(r, r * d, d)
        r += 1
      }
      val cols = Array.tabulate[ColumnVector](batch.numCols())(batch.column) :+ vec
      new ColumnarBatch(cols, n)
    }
  }

  /** Row fallback (the contract when a child can't produce batches):
    * same kernel per row. */
  override protected def doExecute(): RDD[InternalRow] = {
    val d = dim
    val pIdx = payloadIdx
    val str = isString
    val childOutput = child.output
    val nFields = childOutput.length
    val outTypes = output.map(_.dataType).toArray
    child.execute().mapPartitions { it =>
      val proj = org.apache.spark.sql.catalyst.expressions.UnsafeProjection
        .create(outTypes)
      val joined = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(nFields + 1)
      it.map { row =>
        var i = 0
        while (i < nFields) {
          joined.update(i, row.get(i, childOutput(i).dataType)); i += 1
        }
        val len =
          if (row.isNullAt(pIdx)) 0
          else if (str) row.getUTF8String(pIdx).numBytes
          else row.getBinary(pIdx).length
        joined.update(nFields,
          new GenericArrayData(Array.tabulate(d)(k => EmbedInference.cell(len, k))))
        proj(joined)
      }
    }
  }

  override protected def withNewChildInternal(newChild: SparkPlan): EmbedInferenceExec =
    copy(child = newChild)
}

/** Planner strategy: EmbedInference → EmbedInferenceExec (injected via
  * GraftExtensions.injectPlannerStrategy). */
object EmbedInferenceStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case e @ EmbedInference(dim, child, attr) =>
      EmbedInferenceExec(dim, attr, planLater(child)) :: Nil
    case _ => Nil
  }
}
