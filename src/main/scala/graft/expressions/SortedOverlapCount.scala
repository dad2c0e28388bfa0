package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.trees.BinaryLike
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/**
 * Kernel for [[SortedOverlapCount]]: the MULTISET product-overlap of two
 * SORTED long arrays — `|{ (i, j) : larr[i] == rarr[j] }|`, the same
 * join-count semantics as [[SuffixOverlapKernels.overlap]] over whole arrays,
 * specialized for pre-sorted primitive input.
 *
 * A two-pointer merge over runs: equal runs of lengths a and b contribute
 * a·b matches and both pointers jump the run, so the whole count is
 * O(n + m) primitive comparisons with zero allocation — vs the generic
 * kernel's O(n·m) UTF8String byte-equality loop (or its HashMap path's
 * boxing + murmur churn). On the 8× stress corpus's MinHash verification
 * (18.4M pairs × ~40-token docs) the generic kernel's 1600-comparison
 * string loop was the whole stage's CPU; sorting each doc's hashed tokens
 * ONCE (sort_array at aggregation time, not per pair) buys the merge here
 * ~20× fewer comparisons per pair, each a long compare instead of a byte
 * scan.
 *
 * Sortedness is the caller's contract (produced via `sort_array`); unsorted
 * input silently undercounts. Nulls never match, mirroring the generic
 * kernel; the verify pipelines hash non-null tokens so none occur.
 */
object SortedOverlapKernels {

  def overlap(larr: ArrayData, rarr: ArrayData): Long = {
    val ln = larr.numElements()
    val rn = rarr.numElements()
    var i = 0
    var j = 0
    var cnt = 0L
    while (i < ln && j < rn) {
      if (larr.isNullAt(i)) i += 1
      else if (rarr.isNullAt(j)) j += 1
      else {
        val a = larr.getLong(i)
        val b = rarr.getLong(j)
        if (a < b) i += 1
        else if (b < a) j += 1
        else {
          var ri = i + 1
          while (ri < ln && !larr.isNullAt(ri) && larr.getLong(ri) == a) ri += 1
          var rj = j + 1
          while (rj < rn && !rarr.isNullAt(rj) && rarr.getLong(rj) == a) rj += 1
          cnt += (ri - i).toLong * (rj - j).toLong
          i = ri
          j = rj
        }
      }
    }
    cnt
  }
}

/**
 * Native Catalyst expression: multiset product-overlap count of two SORTED
 * long arrays. See [[SortedOverlapKernels.overlap]]. Participates in
 * whole-stage codegen via a static kernel call — the per-candidate hot
 * instruction of the hashed (xxhash64-family) MinHash verification path.
 */
case class SortedOverlapCount(left: Expression, right: Expression)
    extends BinaryExpression with BinaryLike[Expression] {

  override def checkInputDataTypes(): TypeCheckResult = {
    def isLongArr(e: Expression): Boolean = e.dataType match {
      case ArrayType(LongType, _) => true
      case _ => false
    }
    if (isLongArr(left) && isLongArr(right)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (array<bigint>, array<bigint>), got " +
        children.map(_.dataType.simpleString).mkString(", "))
  }

  override def dataType: DataType = LongType
  override def prettyName: String = "graft_sorted_overlap"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    SortedOverlapKernels.overlap(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.expressions.SortedOverlapKernels.overlap($a, $b);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
