package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, ByteType, DataType, IntegerType, LongType}

/** Native Catalyst expression: the PQ asymmetric-distance (ADC) dot —
  * `graft_adc_dot(lut, codes, ksub)` = Σⱼ lut[j·ksub + codes[j]] with
  * codes read back unsigned, EXACT long arithmetic end to end
  * (VectorOps.pqLutUdf's bound: |Σ| ≤ m·8e14 < 2^53).
  *
  * Replaces the q79/q79b scoring UDF (round 13): the Scala-closure form
  * forced a per-row materialization of the 2048-entry LUT column into a
  * boxed Seq — ~16 KB copied and garbage per (probe, candidate) row,
  * measured ~1 s of the q79 ADC stage at sf0.1 for 8 lookups of actual
  * work. As a codegen expression the m lookups index the Tungsten
  * ArrayData in place: no copy, no boxing, whole-stage-codegen'd.
  * AdcDotSpec pins bitwise equality with the UDF it replaced. */
case class AdcDot(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    val lutOk = first.dataType match {
      case ArrayType(LongType, _) => true
      case _ => false
    }
    val codesOk = second.dataType match {
      case ArrayType(ByteType, _) => true
      case _ => false
    }
    val kOk = third.dataType == IntegerType
    if (!lutOk || !codesOk || !kOk)
      TypeCheckResult.TypeCheckFailure(
        "graft_adc_dot expects (array<bigint>, array<tinyint>, int), got " +
          Seq(first, second, third).map(_.dataType.catalogString).mkString(", "))
    else if (!third.foldable)
      TypeCheckResult.TypeCheckFailure(
        "graft_adc_dot ksub must be foldable (codebook geometry, not data)")
    else TypeCheckResult.TypeCheckSuccess
  }

  override def dataType: DataType = LongType

  override def prettyName: String = "graft_adc_dot"

  @transient private lazy val ksub: Int = third.eval().asInstanceOf[Int]

  override protected def nullSafeEval(l: Any, c: Any, k: Any): Any = {
    val lut = l.asInstanceOf[ArrayData]
    val codes = c.asInstanceOf[ArrayData]
    var acc = 0L
    var j = 0
    val m = codes.numElements()
    while (j < m) {
      acc += lut.getLong(j * ksub + (codes.getByte(j) & 0xff))
      j += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (l, c, _) => {
      val j = ctx.freshName("j")
      val m = ctx.freshName("m")
      val acc = ctx.freshName("acc")
      s"""
         |long $acc = 0L;
         |int $m = $c.numElements();
         |for (int $j = 0; $j < $m; $j++) {
         |  $acc += $l.getLong($j * $ksub + ($c.getByte($j) & 0xff));
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression, newThird: Expression): AdcDot =
    copy(first = newFirst, second = newSecond, third = newThird)
}

object AdcDot {
  import org.apache.spark.sql.Column
  import org.apache.spark.sql.functions.{call_function, lit}

  /** Column API: ADC dot of a probe's flattened m×ksub LUT against a
    * candidate's m byte codes. */
  def adcDot(lut: Column, codes: Column, ksub: Int): Column =
    call_function("graft_adc_dot", lut, codes, lit(ksub))
}
