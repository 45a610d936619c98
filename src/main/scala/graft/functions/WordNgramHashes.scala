package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType, StringType}

/** Native Catalyst expression: the SORTED DISTINCT `xxhash64` values of
  * every `n`-token word window of a string array, joined by single
  * spaces — one fused pass, no per-gram allocation.
  *
  * Value-identical (as a set) to the HOF form it replaces,
  * `array_distinct(transform(sequence(0, size(a)-n),
  * i -> xxhash64(concat_ws(' ', a[i], …, a[i+n-1]))))`: UTF-8
  * concatenation is byte concatenation, so hashing the window's token
  * bytes with 0x20 separators in a reused buffer produces the EXACT
  * XXH64(seed 42) value SQL xxhash64 gives the concat_ws string —
  * WordNgramHashesSpec pins that bitwise. Higher-order lambdas are
  * interpreted (no codegen) and allocate a UTF8String per gram, which
  * made the gram build the CPU floor of the whole contamination family
  * (q47/q47b/q71 + the streaming decontamination filter share this
  * fragment). Element ORDER differs from the HOF form (sorted here,
  * first-occurrence there) — every consumer explodes into joins,
  * groupBys, or bloom probes, so only the set matters.
  *
  * Arrays shorter than `n` yield an empty array (the CASE branch the
  * HOF form needed for Spark's descending sequence(0, -1)).
  */
case class WordNgramHashes(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(StringType, containsNull), IntegerType)
          if !containsNull && right.foldable =>
        right.eval(null) match {
          case n: java.lang.Integer if n > 0 => TypeCheckResult.TypeCheckSuccess
          case n => TypeCheckResult.TypeCheckFailure(
            s"graft_word_ngram_hashes n must be a positive int, got $n")
        }
      case _ => TypeCheckResult.TypeCheckFailure(
        s"graft_word_ngram_hashes expects (array<string NOT NULL>, foldable int), got " +
          s"${left.dataType.catalogString}, ${right.dataType.catalogString}")
    }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def prettyName: String = "graft_word_ngram_hashes"

  override protected def nullSafeEval(a: Any, n: Any): Any =
    WordNgramHashes.compute(a.asInstanceOf[ArrayData], n.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, n) =>
      s"${ev.value} = graft.functions.WordNgramHashes.compute($a, $n);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): WordNgramHashes =
    copy(left = newLeft, right = newRight)
}

object WordNgramHashes {

  def compute(arr: ArrayData, n: Int): ArrayData = {
    val nTok = arr.numElements()
    if (nTok < n) return UnsafeArrayData.fromPrimitiveArray(Array.empty[Long])
    val toks = new Array[org.apache.spark.unsafe.types.UTF8String](nTok)
    var i = 0
    while (i < nTok) { toks(i) = arr.getUTF8String(i); i += 1 }
    val m = nTok - n + 1
    val out = new Array[Long](m)
    var buf = new Array[Byte](64)
    var k = 0
    while (k < m) {
      var len = n - 1 // the separators
      var j = k
      while (j < k + n) { len += toks(j).numBytes; j += 1 }
      if (buf.length < len) buf = new Array[Byte](java.lang.Math.max(len, buf.length * 2))
      var pos = 0L + org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET
      j = k
      while (j < k + n) {
        if (j > k) { org.apache.spark.unsafe.Platform.putByte(buf, pos, ' '.toByte); pos += 1 }
        toks(j).writeToMemory(buf, pos)
        pos += toks(j).numBytes
        j += 1
      }
      out(k) = org.apache.spark.sql.catalyst.expressions.XXH64
        .hashUnsafeBytes(buf, org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET, len, 42L)
      k += 1
    }
    java.util.Arrays.sort(out)
    var w = 0
    var r = 0
    while (r < m) {
      if (w == 0 || out(r) != out(w - 1)) { out(w) = out(r); w += 1 }
      r += 1
    }
    UnsafeArrayData.fromPrimitiveArray(
      if (w == m) out else java.util.Arrays.copyOf(out, w))
  }
}
