package graft.expressions

import java.io.{ByteArrayOutputStream, DataInputStream, DataOutputStream}

import scala.collection.mutable

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/**
 * Bounded distributed TOP-K aggregate: the `k` smallest `(dist, id)` pairs of
 * a group, emitted ascending — the scale-correct form of
 * `row_number() OVER (PARTITION BY group ORDER BY dist, id) <= k`.
 *
 * The window form is a straggler factory at corpus scale: the exchange it
 * plans funnels EVERY scored row of a group into the single task that ranks
 * that group, so a 10-query ANN search over 1e9 corpus rows becomes 10 tasks
 * of 1e9 rows each (the round-10 verdict's one flagged scale-killer,
 * `pqTopK`). As a TypedImperativeAggregate this ranks in two bounded steps
 * instead: the PARTIAL aggregate keeps a k-capped heap per group per input
 * partition (state ≤ k pairs, updated in O(log k) per row map-side), the
 * exchange ships only those partial heaps (≤ k rows per group per partition
 * — independent of corpus size), and the FINAL merge folds them back to the
 * global top k. Same TakeOrdered idea that `ORDER BY … LIMIT k` plans get,
 * made per-group.
 *
 * Deterministic: (dist, id) is a total order (ids are unique per group in
 * every caller, ties in dist break by id) and a top-k SET under a total
 * order is unique regardless of partitioning or merge order, so the output
 * is hash-stable and oracle-checkable against the window form. Descending
 * rankings (cosine similarity) negate the score: `sim DESC, id` ==
 * `-sim ASC, id` (IEEE negation is exact).
 *
 * Null `dist`/`id` rows are skipped (the callers' join keys are non-null;
 * a null cosine from a null embedding element must simply not rank).
 */
case class DistTopK(dist: Expression, id: Expression, k: Int,
                    mutableAggBufferOffset: Int = 0,
                    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[mutable.PriorityQueue[(Double, Long)]] {

  require(k > 0, s"top-k needs k > 0, got $k")

  /** Ascending total order; the max-heap surfaces the WORST retained pair. */
  private val ord: Ordering[(Double, Long)] =
    Ordering.Tuple2(Ordering.Double.TotalOrdering, Ordering.Long)

  override def createAggregationBuffer(): mutable.PriorityQueue[(Double, Long)] =
    mutable.PriorityQueue.empty[(Double, Long)](ord)

  private def offer(buf: mutable.PriorityQueue[(Double, Long)],
                    e: (Double, Long)): Unit = {
    if (buf.size < k) buf.enqueue(e)
    else if (ord.lt(e, buf.head)) { buf.dequeue(); buf.enqueue(e) }
  }

  override def update(buf: mutable.PriorityQueue[(Double, Long)],
                      input: InternalRow): mutable.PriorityQueue[(Double, Long)] = {
    val d = dist.eval(input)
    val i = id.eval(input)
    if (d != null && i != null)
      offer(buf, (d.asInstanceOf[Double], i.asInstanceOf[Long]))
    buf
  }

  override def merge(buf: mutable.PriorityQueue[(Double, Long)],
                     other: mutable.PriorityQueue[(Double, Long)]): mutable.PriorityQueue[(Double, Long)] = {
    other.foreach(offer(buf, _))
    buf
  }

  override def eval(buf: mutable.PriorityQueue[(Double, Long)]): Any =
    new GenericArrayData(buf.toArray.sorted(ord)
      .map { case (d, i) => InternalRow(d, i) })

  override def serialize(buf: mutable.PriorityQueue[(Double, Long)]): Array[Byte] = {
    val bos = new ByteArrayOutputStream(8 + 16 * buf.size)
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    buf.foreach { case (d, i) => out.writeDouble(d); out.writeLong(i) }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): mutable.PriorityQueue[(Double, Long)] = {
    val in = new DataInputStream(new java.io.ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = createAggregationBuffer()
    var i = 0
    while (i < n) { buf.enqueue((in.readDouble(), in.readLong())); i += 1 }
    buf
  }

  override def dataType: DataType = ArrayType(
    StructType(Seq(StructField("dist", DoubleType, nullable = false),
      StructField("id", LongType, nullable = false))), containsNull = false)
  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(dist, id)
  override def prettyName: String = "graft_dist_topk"

  override def withNewMutableAggBufferOffset(newOffset: Int): DistTopK =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): DistTopK =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(dist = newChildren(0), id = newChildren(1))
}
