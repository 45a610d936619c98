package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** Native Catalyst expression: the 64-bit SimHash of a string-array
  * column, as one fused per-row pass.
  *
  * Semantically identical to the exploded-aggregation form q27 shipped
  * with — `explode(toks)` → `xxhash64(w)` → 64 per-bit
  * `sum(((h >> k) & 1) * 2 - 1)` aggregate columns → sign-pack — bit
  * for bit: the per-token hash is XXH64 over the token's UTF-8 bytes
  * with seed 42 (exactly SQL `xxhash64` on a STRING), each hash bit
  * contributes ±1 to its counter, and bit k of the result is set iff
  * counter k >= 0 (the aggregation form's `when(s_k >= 0, ...)`).
  * SimHashSpec pins the equivalence bitwise.
  *
  * What the fusion removes is not arithmetic but machinery: the
  * explode, the exchange it forces, and a 64-buffer HashAggregate whose
  * per-row update cost dominated q27 (measured ~22 s CPU of q27's
  * ~27 s at sf0.1). Here the whole signature is computed where the
  * token array already lives — a pure map stage, no shuffle at all
  * before the chunk-banding join.
  *
  * Token DEDUP stays the caller's job (`array_distinct` on the strings,
  * as before): dedup on tokens and dedup on hashes differ if two
  * distinct tokens ever collide, and keeping it outside preserves the
  * aggregation form's exact semantics. Empty arrays: all counters are 0,
  * so every bit passes `>= 0` and the signature is -1L — callers filter
  * empty token sets BEFORE hashing (the aggregation form naturally
  * emitted no row for them), which TextOps does.
  */
case class SimHash(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    // containsNull rejected: a null slot would hash as an empty string
    // silently — fail at analysis instead (filter() output is non-null)
    case ArrayType(StringType, containsNull) if !containsNull =>
      TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_simhash expects array<string NOT NULL>, got ${t.catalogString}")
  }

  override def dataType: DataType = LongType

  override def prettyName: String = "graft_simhash"

  override protected def nullSafeEval(a: Any): Any =
    SimHash.compute(a.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.SimHash.compute($a);")

  override protected def withNewChildInternal(newChild: Expression): SimHash =
    copy(child = newChild)
}

object SimHash {

  def compute(arr: ArrayData): Long = {
    val n = arr.numElements()
    val sums = new Array[Int](64)
    var i = 0
    while (i < n) {
      val s = arr.getUTF8String(i)
      // XXH64 over the token's UTF-8 bytes, seed 42 — bit-identical to
      // SQL xxhash64(stringCol) (the ShingleHashes-verified identity)
      val h = org.apache.spark.sql.catalyst.expressions.XXH64
        .hashUnsafeBytes(s.getBaseObject, s.getBaseOffset, s.numBytes, 42L)
      var k = 0
      while (k < 64) {
        if (((h >>> k) & 1L) != 0L) sums(k) += 1 else sums(k) -= 1
        k += 1
      }
      i += 1
    }
    var sig = 0L
    var k = 0
    while (k < 64) {
      if (sums(k) >= 0) sig |= 1L << k
      k += 1
    }
    sig
  }
}
