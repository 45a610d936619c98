package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, ByteType, DataType, DoubleType, FloatType}

/** Native Catalyst expression: dot product of two float-array (or two
  * int8-array) columns in double precision (SURVEY.md §4.3's reserved
  * custom-expression slot).
  *
  * Semantically identical to
  * `aggregate(zip_with(a, b, (x,y) -> double(x)*double(y)), 0d, +)` —
  * same element order, same double accumulation, hence bit-identical
  * results — but evaluated as a fused primitive loop with real codegen
  * (`doGenCode`), so the similarity-search queries stay inside
  * whole-stage codegen with no per-element lambda allocation.
  *
  * The `array<tinyint>` form serves the quantized-embedding path (q61):
  * symmetric per-vector int8 quantization leaves cosine invariant to the
  * scale, so similarity search runs entirely on the 4×-smaller bytes —
  * and the byte loop stays codegen'd exactly like the float one.
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  private def elemType: DataType =
    left.dataType.asInstanceOf[ArrayType].elementType

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = Seq(FloatType, ByteType).exists(t =>
      Seq(left, right).forall(_.dataType match {
        case ArrayType(et, _) => et == t
        case _ => false
      }))
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_dot expects two array<float> or two array<tinyint> arguments, got " +
        s"${left.dataType.catalogString}, ${right.dataType.catalogString}")
  }

  override def dataType: DataType = DoubleType

  // mismatched dimensions yield NULL (matching zip_with's null padding),
  // so the result can be null even for non-null inputs
  override def nullable: Boolean = true

  override def prettyName: String = "graft_dot"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    if (x.numElements() != y.numElements()) null
    else {
      val n = x.numElements()
      val bytes = elemType == ByteType
      var acc = 0.0
      var i = 0
      while (i < n) {
        acc +=
          (if (bytes) x.getByte(i).toDouble * y.getByte(i).toDouble
           else x.getFloat(i).toDouble * y.getFloat(i).toDouble)
        i += 1
      }
      acc
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      val get = if (elemType == ByteType) "getByte" else "getFloat"
      s"""
         |if ($a.numElements() != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  int $n = $a.numElements();
         |  double $acc = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    $acc += ((double) $a.$get($i)) * ((double) $b.$get($i));
         |  }
         |  ${ev.value} = $acc;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProduct =
    copy(left = newLeft, right = newRight)
}

object DotProduct {
  import org.apache.spark.sql.Column
  import org.apache.spark.sql.functions.call_function

  /** Column API for the expression (resolves through the session's
    * function registry — see [[graft.functions.GraftExtensions]]). */
  def dot(a: Column, b: Column): Column = call_function("graft_dot", a, b)
}
