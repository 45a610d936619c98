package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Native Catalyst expression: the 48-element MinHash signature of a
  * long-array column, as one fused per-row pass.
  *
  * Semantically identical to the exploded-aggregation form
  * `explode(gs).groupBy(doc_id).agg(min((pmod(xxhash64(g), P) * A(i) +
  * B(i)) % P) for i <- 0 until 48)` (TextOps.bandedOf's shape over a
  * BIGINT g column) — the per-element `xxhash64` (XXH64 of the long's 8
  * bytes, seed 42, exactly what SQL xxhash64 computes for a BIGINT
  * input) and the pmod fold into [0, P) are fused into the loop, so the
  * minima are bit-identical — but computed where the array already
  * lives: no explode, no shuffle, no 48-column aggregate. For callers
  * that already materialize per-doc shingle-hash arrays
  * (TextOps.shingleSets, passageRepSets), banding becomes a pure map
  * stage.
  *
  * Returns an EMPTY array for an empty input — callers must filter
  * empty sets out BEFORE banding (an "empty signature" would bucket all
  * empty docs together; the aggregation form naturally emitted no row
  * for them).
  */
case class MinHashSignature(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    // containsNull is rejected: the loop reads primitive slots, and a
    // null element would silently read as 0 — fail at analysis instead
    case ArrayType(LongType, containsNull) if !containsNull =>
      TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_minhashes expects array<bigint NOT NULL>, got ${t.catalogString}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def prettyName: String = "graft_minhashes"

  override protected def nullSafeEval(a: Any): Any =
    MinHashSignature.compute(a.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.MinHashSignature.compute($a);")

  override protected def withNewChildInternal(newChild: Expression): MinHashSignature =
    copy(child = newChild)
}

object MinHashSignature {

  /** Mersenne prime 2^31 − 1: products (P−1)·A(i) stay below 2^62, so
    * the arithmetic never overflows Long — the same domain argument the
    * aggregation form documents. */
  val P = 2147483647L

  /** Signature width: 8 bands × 6 rows (TextOps banding layout). */
  val K = 48

  /** Deterministic permutation constants — THE single source of truth
    * (TextOps references these; the derivation is pinned because changing
    * it silently re-buckets every LSH consumer, including the streaming
    * seen-store whose persisted buckets must stay valid across restarts). */
  val (a, b) = {
    val rnd = new scala.util.Random(42)
    val ja = Array.fill(K)(1L + math.abs(rnd.nextLong()) % (P - 1))
    val jb = Array.fill(K)(math.abs(rnd.nextLong()) % P)
    (ja, jb)
  }

  /** One fused pass: xxhash64 each element (the aggregation form hashed
    * the exploded BIGINT column), fold into [0, P) (pmod semantics),
    * update all 48 running minima. 48 multiply-adds per element — the
    * identical arithmetic the aggregation form ran, minus the row
    * machinery around it. */
  def compute(arr: ArrayData): ArrayData = {
    val n = arr.numElements()
    if (n == 0) return UnsafeArrayData.fromPrimitiveArray(Array.empty[Long])
    val mins = new Array[Long](K)
    java.util.Arrays.fill(mins, Long.MaxValue)
    var i = 0
    while (i < n) {
      var h = org.apache.spark.sql.catalyst.expressions.XXH64
        .hashLong(arr.getLong(i), 42L) % P
      if (h < 0) h += P
      var k = 0
      while (k < K) {
        val v = (h * a(k) + b(k)) % P
        if (v < mins(k)) mins(k) = v
        k += 1
      }
      i += 1
    }
    UnsafeArrayData.fromPrimitiveArray(mins)
  }

  import org.apache.spark.sql.Column
  import org.apache.spark.sql.functions.call_function

  /** Column API (resolves via [[graft.functions.GraftExtensions]]). */
  def minhashes(c: Column): Column = call_function("graft_minhashes", c)
}
