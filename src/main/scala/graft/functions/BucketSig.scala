package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, BinaryType, BooleanType, DataType, IntegerType, LongType}

/** Bucketed-count signature of a shingle-hash set: a B-bucket byte
  * histogram of the set's elements, B the smallest power of two >= the
  * set size (clamped to [64, 65536]), bucket = low bits of the xxhash64
  * shingle hash.
  *
  * The point (serving the exact-jaccard near-dup semantics of
  * /root/reference/exercise_3.py:10-22's distinct-pair shape, as
  * generalized in SURVEY §2.10 Q16/Q25): for any two sets, every SHARED
  * element lands
  * in the same bucket on both sides, so
  * S = Σ_i min(cntA_i, cntB_i) >= |A ∩ B| — a sound, deterministic
  * upper bound on intersection size from payloads ~8× smaller than the
  * sorted hash arrays themselves (1-2 bytes per element vs 8). The
  * near-dup sift ships THESE through the per-pair exchange, rejects
  * every candidate whose bound already fails τ (S/(n1+n2-S) >= jac by
  * monotonicity of x/(c-x), so the test never drops a true pair), and
  * reserves the fat array exchange for the survivors. Tightness: the
  * overshoot is Σ min over the NON-shared elements' collisions,
  * E ≈ uniqueA·uniqueB/B — with B >= n that is ~1% of n at jaccard
  * 0.75, so the 0.5-0.78 near-miss band that no prefix/positional
  * bound can touch (SCALE10X.md sparse regime) is rejected almost
  * entirely.
  *
  * Returns NULL when any bucket would exceed 255 (saturated counts
  * could under-count the intersection and break soundness) — callers
  * must treat a null signature as "cannot reject". With B >= n the
  * expected bucket load is <= 1, so saturation needs 256 of a doc's
  * shingle hashes to collide in their low bits — astronomically rare,
  * but guarded anyway because correctness here is load-bearing. */
case class BucketCountSig(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    // containsNull rejected at analysis: a null element would read as 0
    // and shift a phantom count into bucket 0 — fail loudly instead
    case ArrayType(LongType, false) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_bucket_sig expects array<bigint NOT NULL>, got ${other.catalogString}")
  }

  override def dataType: DataType = BinaryType

  // nullable even over non-null input: saturation returns null
  override def nullable: Boolean = true

  override def prettyName: String = "graft_bucket_sig"

  override protected def nullSafeEval(a: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val n = x.numElements()
    var b = 64
    while (b < n && b < 65536) b <<= 1
    val counts = new Array[Int](b)
    val mask = b - 1
    var i = 0
    while (i < n) {
      val j = (x.getLong(i) & mask).toInt
      counts(j) += 1
      if (counts(j) > 255) return null
      i += 1
    }
    val out = new Array[Byte](b)
    i = 0
    while (i < b) { out(i) = counts(i).toByte; i += 1 }
    out
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val n = ctx.freshName("n"); val b = ctx.freshName("b")
      val counts = ctx.freshName("counts"); val mask = ctx.freshName("mask")
      val i = ctx.freshName("i"); val j = ctx.freshName("j")
      val out = ctx.freshName("out"); val sat = ctx.freshName("sat")
      s"""
         |int $n = $a.numElements();
         |int $b = 64;
         |while ($b < $n && $b < 65536) { $b <<= 1; }
         |int[] $counts = new int[$b];
         |int $mask = $b - 1;
         |boolean $sat = false;
         |for (int $i = 0; $i < $n && !$sat; $i++) {
         |  int $j = (int) ($a.getLong($i) & $mask);
         |  $counts[$j] += 1;
         |  if ($counts[$j] > 255) { $sat = true; }
         |}
         |if ($sat) {
         |  ${ev.isNull} = true;
         |} else {
         |  byte[] $out = new byte[$b];
         |  for (int $i = 0; $i < $b; $i++) { $out[$i] = (byte) $counts[$i]; }
         |  ${ev.value} = $out;
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): BucketCountSig =
    copy(child = newChild)
}

/** S = Σ_i min(cntA_i, cntB_i) over two [[BucketCountSig]] signatures —
  * the intersection-size upper bound. Signatures of different widths
  * (both powers of two) are FOLDED to the narrower one by summing
  * congruent buckets: m | B and both are low-bit masks, so
  * (g mod B) mod m = g mod m — the fold is exactly the coarser
  * bucketing, and the bound stays sound across any pair of doc sizes.
  * Folded sums accumulate in ints (the byte cap is a storage property;
  * exact counts were proven <= 255 at write time, and their fold-sums
  * fit trivially).
  *
  * The fold's congruence argument REQUIRES power-of-two widths — the
  * function is SQL-registered and user-callable, so a non-power-of-two
  * input (any binary that didn't come from graft_bucket_sig) throws a
  * clear error rather than silently folding into a meaningless
  * in-bounds number. An empty signature (the empty set) short-circuits
  * to bound 0 — sound, since the empty set intersects nothing. */
case class SigMinSum(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == BinaryType && right.dataType == BinaryType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_sig_min_sum expects two binary arguments, got " +
        s"${left.dataType.catalogString}, ${right.dataType.catalogString}")

  override def dataType: DataType = LongType

  override def prettyName: String = "graft_sig_min_sum"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[Array[Byte]]
    val y = b.asInstanceOf[Array[Byte]]
    val m = math.min(x.length, y.length)
    if (m == 0) return 0L
    SigMinSum.requirePow2(x.length)
    SigMinSum.requirePow2(y.length)
    val fa = new Array[Int](m)
    val fb = new Array[Int](m)
    val mask = m - 1
    var i = 0
    while (i < x.length) { fa(i & mask) += x(i) & 0xFF; i += 1 }
    i = 0
    while (i < y.length) { fb(i & mask) += y(i) & 0xFF; i += 1 }
    var s = 0L
    i = 0
    while (i < m) { s += math.min(fa(i), fb(i)); i += 1 }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val m = ctx.freshName("m"); val mask = ctx.freshName("mask")
      val fa = ctx.freshName("fa"); val fb = ctx.freshName("fb")
      val i = ctx.freshName("i"); val s = ctx.freshName("s")
      s"""
         |int $m = java.lang.Math.min($a.length, $b.length);
         |long $s = 0L;
         |if ($m > 0) {
         |  graft.functions.SigMinSum.requirePow2($a.length);
         |  graft.functions.SigMinSum.requirePow2($b.length);
         |  int $mask = $m - 1;
         |  int[] $fa = new int[$m];
         |  int[] $fb = new int[$m];
         |  for (int $i = 0; $i < $a.length; $i++) { $fa[$i & $mask] += $a[$i] & 0xFF; }
         |  for (int $i = 0; $i < $b.length; $i++) { $fb[$i & $mask] += $b[$i] & 0xFF; }
         |  for (int $i = 0; $i < $m; $i++) { $s += java.lang.Math.min($fa[$i], $fb[$i]); }
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SigMinSum =
    copy(left = newLeft, right = newRight)
}

object SigMinSum {
  /** Called from interpreted eval AND generated code (hence public +
    * JVM-static-friendly): rejects signatures whose width can't have
    * come from graft_bucket_sig. */
  def requirePow2(len: Int): Unit =
    if ((len & (len - 1)) != 0)
      throw new IllegalArgumentException(
        s"graft_sig_min_sum: signature length $len is not a power of two — " +
          "inputs must be graft_bucket_sig outputs (the width fold is only " +
          "sound between power-of-two bucket counts)")
}

/** graft_sig_tau_ok(sig1, sig2, total, num, den) — the WHOLE per-pair
  * sift test den·S >= num·(total − S) fused into one boolean expression
  * (S = the [[SigMinSum]] bound, total = n1+n2, num/den = τ as an exact
  * rational). True = "cannot reject at jaccard >= num/den".
  *
  * Exists because the map-side sift runs this test once per CANDIDATE
  * ROW on the hot q25 path, where the compositional
  * isnull(min_sum) OR den·min_sum >= num·(total−min_sum) form evaluated
  * graft_sig_min_sum up to three times per row after predicate inlining
  * and allocated two fold arrays per call (measured ~1960 s CPU at the
  * sparse-10× probe). This form:
  *   - evaluates S exactly once;
  *   - equal-width signatures (the overwhelmingly common case — widths
  *     only differ across ~2× doc-size ratios, which the PPJoin length
  *     filter has already bounded) take a ZERO-ALLOCATION single pass
  *     of min(b1_i, b2_i);
  *   - unequal widths fold only the wider signature (one int array);
  *   - the scan EARLY-ACCEPTS once the running sum crosses the
  *     threshold ceil(num·total/(num+den)) — S only grows, so the
  *     verdict is already decided (true pairs exit after ~τ of the
  *     mass; rejected rows — the common case — scan fully, which is
  *     the information-theoretic minimum for a sound bound).
  * NULL handling is "cannot reject": a null signature (saturated
  * counts) or null total yields TRUE, never null — so the expression is
  * non-nullable and safe directly under a Filter. */
case class SigTauOk(children: Seq[Expression]) extends Expression {

  override def checkInputDataTypes(): TypeCheckResult = {
    val Seq(a, b, t, n, d) = children
    if (a.dataType != BinaryType || b.dataType != BinaryType)
      TypeCheckResult.TypeCheckFailure("graft_sig_tau_ok: sig1/sig2 must be binary")
    else if (t.dataType != LongType)
      TypeCheckResult.TypeCheckFailure("graft_sig_tau_ok: total must be bigint")
    else if (!n.foldable || !d.foldable ||
      n.dataType != IntegerType || d.dataType != IntegerType)
      TypeCheckResult.TypeCheckFailure("graft_sig_tau_ok: num/den must be int literals")
    else TypeCheckResult.TypeCheckSuccess
  }

  override def dataType: DataType = BooleanType
  override def nullable: Boolean = false
  override def prettyName: String = "graft_sig_tau_ok"

  private lazy val num: Int = children(3).eval(null).asInstanceOf[Int]
  private lazy val den: Int = children(4).eval(null).asInstanceOf[Int]

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val a = children(0).eval(input)
    val b = children(1).eval(input)
    val t = children(2).eval(input)
    if (a == null || b == null || t == null) return true
    java.lang.Boolean.valueOf(SigTauOk.passes(
      a.asInstanceOf[Array[Byte]], b.asInstanceOf[Array[Byte]],
      t.asInstanceOf[Long], num, den))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val a = children(0).genCode(ctx)
    val b = children(1).genCode(ctx)
    val t = children(2).genCode(ctx)
    val code =
      code"""
        |${a.code}
        |${b.code}
        |${t.code}
        |boolean ${ev.value} = true;
        |if (!${a.isNull} && !${b.isNull} && !${t.isNull}) {
        |  ${ev.value} = graft.functions.SigTauOk.passes(
        |    ${a.value}, ${b.value}, ${t.value}, $num, $den);
        |}
       """.stripMargin
    ev.copy(code = code, isNull = org.apache.spark.sql.catalyst.expressions.codegen.FalseLiteral)
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): SigTauOk = copy(children = newChildren)
}

object SigTauOk {
  import org.apache.spark.sql.Column
  import org.apache.spark.sql.functions.call_function

  /** Shared by interpreted eval and generated code. */
  def passes(x: Array[Byte], y: Array[Byte], total: Long, num: Int, den: Int): Boolean = {
    // threshold: den·S >= num·(total−S) ⇔ S·(den+num) >= num·total
    // ⇔ S >= ceil(num·total / (den+num)) — exact integer arithmetic
    val dn = (den + num).toLong
    val thr = (num * total + dn - 1) / dn
    if (thr <= 0) return true
    var s = 0L
    if (x.length == y.length) {
      // equal widths: same masking on both sides — direct bucketwise min,
      // no fold, no allocation
      var i = 0
      while (i < x.length) {
        val mx = x(i) & 0xFF; val my = y(i) & 0xFF
        s += (if (mx < my) mx else my)
        if (s >= thr) return true
        i += 1
      }
    } else {
      val (narrow, wide) = if (x.length < y.length) (x, y) else (y, x)
      if (narrow.length == 0) return false // empty set: S = 0 < thr
      SigMinSum.requirePow2(narrow.length)
      SigMinSum.requirePow2(wide.length)
      val m = narrow.length
      val mask = m - 1
      val fw = new Array[Int](m)
      var i = 0
      while (i < wide.length) { fw(i & mask) += wide(i) & 0xFF; i += 1 }
      i = 0
      while (i < m) {
        val mn = narrow(i) & 0xFF; val mw = fw(i)
        s += (if (mn < mw) mn else mw)
        if (s >= thr) return true
        i += 1
      }
    }
    false
  }

  /** Column API (resolves via [[graft.functions.GraftExtensions]]). */
  def sigTauOk(sig1: Column, sig2: Column, total: Column,
      num: Int, den: Int): Column =
    call_function("graft_sig_tau_ok", sig1, sig2, total,
      org.apache.spark.sql.functions.lit(num), org.apache.spark.sql.functions.lit(den))
}

object BucketSig {
  import org.apache.spark.sql.Column
  import org.apache.spark.sql.functions.call_function

  /** Column API (resolves via [[graft.functions.GraftExtensions]]). */
  def bucketSig(gs: Column): Column = call_function("graft_bucket_sig", gs)

  def sigMinSum(a: Column, b: Column): Column =
    call_function("graft_sig_min_sum", a, b)
}
