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
  * with — `explode(toks)` → 64-bit token hash → 64 per-bit
  * `sum(((h >> k) & 1) * 2 - 1)` aggregate columns → sign-pack — bit
  * for bit: the per-token hash is the FIRST 8 BYTES of md5 over the
  * token's UTF-8 bytes, read big-endian (exactly DuckDB
  * `CAST('0x' || substr(md5(w), 1, 16) AS UBIGINT)` — same 64 bits,
  * signedness aside), each hash bit contributes ±1 to its counter, and
  * bit k of the result is set iff counter k >= 0 (the aggregation
  * form's `when(s_k >= 0, ...)`). SimHashSpec pins the equivalence
  * bitwise against an independent ByteBuffer-based reference.
  *
  * md5 (not xxhash64) is deliberate: it is the one 64-bit token hash
  * BOTH engines compute identically from SQL, which is what lets q27
  * carry a full DuckDB hash oracle (the q73 md5-digest precedent)
  * instead of a spec-only gate. Cost: ~0.3 µs/token of digest work in
  * the map stage — linear, shuffle-free, irrelevant next to the
  * banding join it feeds.
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

  // MessageDigest is stateful and not thread-safe; one per task thread
  private val digest = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** First 8 bytes of md5(bytes), big-endian — the oracle-shared token
    * hash (DuckDB: `CAST('0x' || substr(md5(w), 1, 16) AS UBIGINT)`). */
  def tokenHash(bytes: Array[Byte]): Long = {
    val d = digest.get()
    d.reset()
    val dig = d.digest(bytes)
    var h = 0L
    var i = 0
    while (i < 8) { h = (h << 8) | (dig(i) & 0xFFL); i += 1 }
    h
  }

  def compute(arr: ArrayData): Long = {
    val n = arr.numElements()
    val sums = new Array[Int](64)
    var i = 0
    while (i < n) {
      val h = tokenHash(arr.getUTF8String(i).getBytes)
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
