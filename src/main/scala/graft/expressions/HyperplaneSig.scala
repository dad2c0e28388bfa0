package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/**
 * Native Catalyst expression: random-hyperplane LSH signature of a numeric
 * vector — bit i of the result long is `sign(v · planes(i))`.
 *
 * Replaces the higher-order-function form (one interpreted
 * `aggregate(zip_with(vec, plane, …))` per plane plus an OR-chain): the
 * plane matrix rides along as a reference object and the generated code is a
 * two-level loop fused into whole-stage codegen. Float semantics are
 * IDENTICAL to the HOF form (HyperplaneSigSpec proves bit-for-bit bucket
 * equality): each plane's dot folds `double(v_j) * p_j` ascending from 0.0,
 * the sign test is `dot > 0`, and bit i contributes `1L << i`.
 *
 * The dot runs over `min(|v|, dim)` elements — the HOF `zip_with` pads the
 * shorter side with nulls, which nulls the fold; operators always pass
 * vectors of exactly `dim` elements, where both forms agree.
 */
case class HyperplaneSig(child: Expression, planes: Array[Array[Double]])
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType | DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires an array<float> or array<double> input, got ${other.simpleString}")
  }

  override def dataType: DataType = LongType
  override def prettyName: String = "graft_hyperplane_sig"

  private def elementType: DataType =
    child.dataType.asInstanceOf[ArrayType].elementType

  override protected def nullSafeEval(v: Any): Any = {
    val x = v.asInstanceOf[ArrayData]
    val isFloat = elementType == FloatType
    var sig = 0L
    var p = 0
    while (p < planes.length) {
      val plane = planes(p)
      val n = math.min(x.numElements(), plane.length)
      var dot = 0d
      var j = 0
      while (j < n) {
        val xj = if (isFloat) x.getFloat(j).toDouble else x.getDouble(j)
        dot += xj * plane(j)
        j += 1
      }
      if (dot > 0) sig |= (1L << p)
      p += 1
    }
    sig
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      val planesRef = ctx.addReferenceObj("planes", planes, "double[][]")
      val sig = ctx.freshName("sig")
      val p = ctx.freshName("p")
      val j = ctx.freshName("j")
      val n = ctx.freshName("n")
      val dot = ctx.freshName("dot")
      val plane = ctx.freshName("plane")
      val getter = elementType match {
        case FloatType => s"(double) $v.getFloat($j)"
        case _         => s"$v.getDouble($j)"
      }
      s"""
         |long $sig = 0L;
         |for (int $p = 0; $p < $planesRef.length; $p++) {
         |  double[] $plane = $planesRef[$p];
         |  int $n = java.lang.Math.min($v.numElements(), $plane.length);
         |  double $dot = 0.0;
         |  for (int $j = 0; $j < $n; $j++) {
         |    $dot += $getter * $plane[$j];
         |  }
         |  if ($dot > 0) $sig |= (1L << $p);
         |}
         |${ev.value} = $sig;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
