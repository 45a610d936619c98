package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: the SORTED DISTINCT `xxhash64` values of
  * every `width`-character window of a string, as one fused pass over the
  * UTF-8 bytes.
  *
  * Semantically identical to
  * `sort_array(array_distinct(transform(sequence(0, length(s)-w),
  * i -> xxhash64(substring(s, i+1, w)))))` — same hash function (XXH64,
  * seed 42, over the window's UTF-8 bytes), the property DedupSpec pins
  * bitwise — but with none of that form's costs: higher-order lambdas are
  * interpreted (no codegen) and each window allocates a UTF8String, which
  * made shingling the single largest stage of the near-dup family
  * (~6 s of q25's 9 s at sf0.1 for ~5.7M interpreted evals). Here the
  * char-boundary offsets are walked once and each window is hashed in
  * place from the original byte buffer; sort + dedup happen on the
  * primitive long[] before it ever becomes a row value.
  *
  * Returns an empty array for strings shorter than `width`; `width` must
  * be a positive foldable INT. Used by TextOps.shinglesOf (exploded form)
  * and rawJaccard's doc-set arrays (direct form — which also removes the
  * verify step's groupBy exchange, since the per-doc set is computed on
  * the scan side).
  */
case class ShingleHashes(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (StringType, IntegerType) if right.foldable =>
        // width is foldable, so its value is known at analysis — reject
        // non-positive/null widths here instead of crashing executors
        right.eval(null) match {
          case w: java.lang.Integer if w > 0 => TypeCheckResult.TypeCheckSuccess
          case w => TypeCheckResult.TypeCheckFailure(
            s"graft_shingle_hashes width must be a positive int, got $w")
        }
      case _ => TypeCheckResult.TypeCheckFailure(
        s"graft_shingle_hashes expects (string, foldable int), got " +
          s"${left.dataType.catalogString}, ${right.dataType.catalogString}")
    }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def prettyName: String = "graft_shingle_hashes"

  override protected def nullSafeEval(s: Any, w: Any): Any =
    ShingleHashes.compute(s.asInstanceOf[UTF8String], w.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (s, w) =>
      s"${ev.value} = graft.functions.ShingleHashes.compute($s, $w);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ShingleHashes =
    copy(left = newLeft, right = newRight)
}

object ShingleHashes {

  /** One fused pass: char-offset walk, per-window XXH64 (seed 42 — the
    * exact bytes+seed SQL `xxhash64` uses, so values are bit-identical to
    * xxhash64(substring(...))), then sort + dedup on the primitive array. */
  def compute(s: UTF8String, width: Int): ArrayData = {
    val bytes = s.getBytes
    val nBytes = bytes.length
    // char start offsets (UTF-8 boundary walk); ASCII fast path is just
    // offset[i] = i, but multi-byte text needs the real boundaries
    var nChars = 0
    var i = 0
    while (i < nBytes) {
      i += numBytesForFirstByte(bytes(i))
      nChars += 1
    }
    if (nChars < width) return UnsafeArrayData.fromPrimitiveArray(Array.empty[Long])
    val offsets = new Array[Int](nChars + 1)
    var c = 0
    i = 0
    while (i < nBytes) {
      offsets(c) = i
      i += numBytesForFirstByte(bytes(i))
      c += 1
    }
    offsets(nChars) = nBytes
    val n = nChars - width + 1
    val out = new Array[Long](n)
    var k = 0
    while (k < n) {
      val start = offsets(k)
      val len = offsets(k + width) - start
      out(k) = org.apache.spark.sql.catalyst.expressions.XXH64
        .hashUnsafeBytes(bytes, org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET + start, len, 42L)
      k += 1
    }
    java.util.Arrays.sort(out)
    // in-place dedup of the sorted array
    var m = 0
    var j = 0
    while (j < n) {
      if (m == 0 || out(j) != out(m - 1)) { out(m) = out(j); m += 1 }
      j += 1
    }
    // UnsafeArrayData.fromPrimitiveArray keeps the longs unboxed —
    // GenericArrayData(Array[Long]) would box every element, re-adding
    // the per-shingle allocation this expression exists to remove
    UnsafeArrayData.fromPrimitiveArray(
      if (m == n) out else java.util.Arrays.copyOf(out, m))
  }

  /** UTF-8 sequence length from the lead byte — the EXACT table Spark's
    * UTF8String uses (numBytesForFirstByte), including its malformed-byte
    * behavior: continuation bytes (0x80–0xBF) and the invalid leads
    * 0xF5–0xFF step 1. Matching Spark byte-for-byte is what keeps this
    * expression bit-identical to the length()/substring() HOF form even
    * on malformed UTF-8 (Parquet does not validate string bytes). */
  private def numBytesForFirstByte(b: Byte): Int = {
    val u = b & 0xFF
    if (u < 0xC0) 1        // ASCII, continuation bytes, and < C0 invalids
    else if (u < 0xE0) 2   // C0–DF
    else if (u < 0xF0) 3   // E0–EF
    else if (u < 0xF5) 4   // F0–F4
    else 1                 // F5–FF: invalid leads, Spark steps 1
  }
}
