package graft.plans

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Bounded top-k-per-group aggregate: keeps the k (score, id) pairs with
  * the highest score (ties broken by LOWER id — the same total order as
  * `row_number() over (order by score desc, id asc)`), returned as a
  * sorted `array<struct<score double, id bigint>>`.
  *
  * Why not the Window form: `row_number().over(partitionBy(q)) <= k` plans
  * as Sort → WindowGroupLimit(Partial) → shuffle → Sort →
  * WindowGroupLimit(Final) → Window — every map partition SORTS its full
  * per-key row set before the partial limit prunes it, and the shuffle
  * still carries k rows per key per map partition into one more sort. This
  * aggregate replaces all of that with a size-k min-heap per key: map-side
  * partials are O(rows · log k) with NO sort, the shuffle carries one
  * k-pair buffer per key per map partition, and merge is heap-into-heap —
  * the two-phase bounded top-k VERDICT r12 asked for (q26g). At 100× data
  * the per-partition cost grows linearly in rows scanned and the shuffled
  * bytes stay O(keys · k · maps), independent of corpus size.
  *
  * The heap head is the current WORST kept pair, so the common case (row
  * doesn't beat the floor) is one comparison, no allocation.
  */
case class TopKByScore(score: Expression, id: Expression, k: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[TopKByScore.Buf] {

  require(k > 0, s"top_k_by_score needs k > 0, got $k")

  override def children: Seq[Expression] = Seq(score, id)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): TopKByScore =
    copy(score = newChildren(0), id = newChildren(1))

  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("score", DoubleType, nullable = false),
    StructField("id", LongType, nullable = false))), containsNull = false)
  override def prettyName: String = "top_k_by_score"

  override def createAggregationBuffer(): TopKByScore.Buf =
    new TopKByScore.Buf(k)

  override def update(buf: TopKByScore.Buf, input: InternalRow): TopKByScore.Buf = {
    val s = score.eval(input)
    val i = id.eval(input)
    if (s != null && i != null)
      buf.insert(s.asInstanceOf[Double], i.asInstanceOf[Long])
    buf
  }

  override def merge(buf: TopKByScore.Buf, other: TopKByScore.Buf): TopKByScore.Buf = {
    val it = other.pq.iterator()
    while (it.hasNext) { val e = it.next(); buf.insert(e._1, e._2) }
    buf
  }

  override def eval(buf: TopKByScore.Buf): Any = {
    val arr = buf.pq.toArray(new Array[(Double, Long)](buf.pq.size))
    // best-first: score desc, id asc
    java.util.Arrays.sort(arr, (a: (Double, Long), b: (Double, Long)) => {
      val c = java.lang.Double.compare(b._1, a._1)
      if (c != 0) c else java.lang.Long.compare(a._2, b._2)
    })
    new GenericArrayData(arr.map(e => InternalRow(e._1, e._2)): Array[Any])
  }

  override def serialize(buf: TopKByScore.Buf): Array[Byte] = {
    val n = buf.pq.size
    val bb = ByteBuffer.allocate(4 + 16 * n)
    bb.putInt(n)
    val it = buf.pq.iterator()
    while (it.hasNext) { val e = it.next(); bb.putDouble(e._1); bb.putLong(e._2) }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): TopKByScore.Buf = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = new TopKByScore.Buf(k)
    var i = 0
    while (i < n) { buf.insert(bb.getDouble, bb.getLong); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKByScore =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKByScore =
    copy(inputAggBufferOffset = newOffset)
}

object TopKByScore {
  /** Size-bounded keep-best heap; head = worst kept pair. */
  final class Buf(k: Int) {
    val pq = new java.util.PriorityQueue[(Double, Long)](math.max(1, k),
      (a: (Double, Long), b: (Double, Long)) => {
        // worst first: lower score, then HIGHER id (id asc wins ties)
        val c = java.lang.Double.compare(a._1, b._1)
        if (c != 0) c else java.lang.Long.compare(b._2, a._2)
      })
    def insert(s: Double, i: Long): Unit = {
      if (pq.size < k) { pq.add((s, i)); () }
      else {
        val w = pq.peek()
        if (s > w._1 || (s == w._1 && i < w._2)) { pq.poll(); pq.add((s, i)); () }
      }
    }
  }
}
