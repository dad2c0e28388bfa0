package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/**
 * Shared kernel for [[LevenshteinBounded]]: exact Levenshtein distance when
 * it is ≤ `bound`, else -1 — same contract as Spark's thresholded
 * `levenshtein(l, r, threshold)`, but ~10× cheaper on the realistic case:
 *
 *   1. common PREFIX and SUFFIX are stripped first with two byte scans —
 *      structured corpora (IDs, codes, templated names) share long affixes,
 *      so the DP usually runs on a tiny core ("Customer#000001234" vs
 *      "...1235" leaves a 1-char core);
 *   2. the DP is BANDED (width 2·bound+1) over bytes, two flat int arrays,
 *      no per-call boxing;
 *   3. byte-wise stripping and DP are exact only for ASCII, so non-ASCII
 *      inputs take Spark's own `UTF8String.levenshteinDistance(other,
 *      bound)` — identical contract, codepoint-correct.
 */
object FuzzyKernels {

  def boundedLevenshtein(a: UTF8String, b: UTF8String, bound: Int): Int = {
    if (!a.isFullAscii || !b.isFullAscii) return a.levenshteinDistance(b, bound)
    val ab = a.getBytes
    val bb = b.getBytes
    var lo = 0
    var aHi = ab.length
    var bHi = bb.length
    while (lo < aHi && lo < bHi && ab(lo) == bb(lo)) lo += 1
    while (aHi > lo && bHi > lo && ab(aHi - 1) == bb(bHi - 1)) { aHi -= 1; bHi -= 1 }
    val n = aHi - lo
    val m = bHi - lo
    if (math.abs(n - m) > bound) return -1
    if (n == 0) return m // |n-m| <= bound already holds
    if (m == 0) return n
    val inf = bound + 1
    var prev = new Array[Int](m + 1)
    var curr = new Array[Int](m + 1)
    var j = 0
    while (j <= m) { prev(j) = if (j <= bound) j else inf; j += 1 }
    var i = 1
    while (i <= n) {
      val from = math.max(1, i - bound)
      val to = math.min(m, i + bound)
      curr(0) = if (i <= bound) i else inf
      if (from > 1) curr(from - 1) = inf // left band edge: outside = unreachable
      var rowMin = inf
      j = from
      while (j <= to) {
        val cost = if (ab(lo + i - 1) == bb(lo + j - 1)) 0 else 1
        var v = prev(j - 1) + cost
        val del = prev(j) + 1
        if (del < v) v = del
        val ins = curr(j - 1) + 1
        if (ins < v) v = ins
        if (v > inf) v = inf // clamp: keeps band-edge arithmetic overflow-free
        curr(j) = v
        if (v < rowMin) rowMin = v
        j += 1
      }
      if (to < m) curr(to + 1) = inf // right band edge for the next row's j-1 read
      if (rowMin >= inf) return -1 // whole band over bound: distance can only grow
      val t = prev; prev = curr; curr = t
      i += 1
    }
    val d = prev(m)
    if (d > bound) -1 else d
  }
}

/**
 * Native Catalyst expression wrapping [[FuzzyKernels.boundedLevenshtein]]:
 * `graft_levenshtein(l, r, bound)` — exact distance if ≤ bound, else -1.
 *
 * Purpose-built for [[graft.operators.FuzzyJoin]]'s verification step, where
 * the built-in thresholded `levenshtein` measured 2.8 µs/pair on 18-char
 * fixed-format names (112M pairs → 311 CPU-seconds at sf0.1): the generic
 * implementation can't exploit the long shared affixes that dominate such
 * corpora. Participates in whole-stage codegen via a static kernel call.
 */
case class LevenshteinBounded(left: Expression, right: Expression, bound: Int)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == StringType && right.dataType == StringType && bound >= 0)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two string inputs and a non-negative bound, " +
        s"got ${left.dataType.simpleString}, ${right.dataType.simpleString}, bound=$bound")

  override def dataType: DataType = IntegerType
  override def prettyName: String = "graft_levenshtein"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    FuzzyKernels.boundedLevenshtein(
      a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String], bound)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.expressions.FuzzyKernels.boundedLevenshtein($a, $b, $bound);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
