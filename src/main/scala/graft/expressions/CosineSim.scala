package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/**
 * Native Catalyst expression: cosine similarity of two numeric-array columns,
 * computed in DOUBLE with a single ascending-index pass.
 *
 * Purpose-built replacement for the higher-order-function form
 * (`aggregate(zip_with(a, b, _*_), 0.0, _+_) / (sqrt(...) * sqrt(...))`):
 * Spark's higher-order functions are INTERPRETED (each lambda evaluation
 * walks an expression tree per element), while this expression participates
 * in WHOLE-STAGE CODEGEN — the generated Java is the three-accumulator loop
 * below, fused into the surrounding operator.
 *
 * Float semantics are IDENTICAL to the HOF form (proven bit-for-bit by
 * CosineSimSpec and by every ANN oracle query staying hash-matched): both
 * fold `double(a_i) * double(b_i)` ascending from 0.0, square-sums the same
 * way, and divide by the product of `java.lang.Math.sqrt`s — the exact same
 * IEEE operation sequence, only compiled instead of interpreted.
 *
 * Accepts float or double arrays (elements are widened to double either
 * way, matching the HOF's explicit casts). A NULL element in either array
 * nulls the whole similarity, exactly as the HOF's null-propagating fold
 * does (the [[L2Sq]] rule). Mismatched lengths fold over the shorter array
 * (the operators always pass equal-dimension vectors; the HOF's zip_with
 * null-pads instead — the one documented divergence).
 */
case class CosineSim(left: Expression, right: Expression)
    extends BinaryExpression {

  /** Nullable also when either array TYPE admits null elements — see
    * [[L2Sq.nullable]]. */
  override def nullable: Boolean = left.nullable || right.nullable ||
    elementsNullable

  private def elementsNullable: Boolean =
    Seq(left, right).exists(_.dataType match {
      case ArrayType(_, cn) => cn
      case _ => false
    })

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(dt: DataType): Boolean = dt match {
      case ArrayType(FloatType | DoubleType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<float> or array<double> inputs, " +
        s"got ${left.dataType.simpleString} and ${right.dataType.simpleString}")
  }

  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_cosine"

  private def elementType(e: Expression): DataType =
    e.dataType.asInstanceOf[ArrayType].elementType

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val (xt, yt) = (elementType(left), elementType(right))
    def get(arr: ArrayData, et: DataType, i: Int): Double = et match {
      case FloatType => arr.getFloat(i).toDouble
      case _         => arr.getDouble(i)
    }
    val n = math.min(x.numElements(), y.numElements())
    var dot = 0d; var na = 0d; var nb = 0d; var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      val xi = get(x, xt, i)
      val yi = get(y, yt, i)
      dot += xi * yi; na += xi * xi; nb += yi * yi
      i += 1
    }
    dot / (java.lang.Math.sqrt(na) * java.lang.Math.sqrt(nb))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      def getter(arr: String, et: DataType, idx: String): String = et match {
        case FloatType => s"(double) $arr.getFloat($idx)"
        case _         => s"$arr.getDouble($idx)"
      }
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val dot = ctx.freshName("dot")
      val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      val xi = ctx.freshName("xi")
      val yi = ctx.freshName("yi")
      val nullBreak =
        if (elementsNullable)
          s"""if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }"""
        else ""
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $dot = 0.0, $na = 0.0, $nb = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $nullBreak
         |  double $xi = ${getter(a, elementType(left), i)};
         |  double $yi = ${getter(b, elementType(right), i)};
         |  $dot += $xi * $yi;
         |  $na += $xi * $xi;
         |  $nb += $yi * $yi;
         |}
         |${ev.value} = $dot / (java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb));
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
