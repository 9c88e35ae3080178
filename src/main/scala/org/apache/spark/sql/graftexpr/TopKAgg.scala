package org.apache.spark.sql.graftexpr

import java.nio.ByteBuffer

import scala.collection.mutable

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Bounded top-k aggregate: keeps the k (score, id) pairs with the highest
  * score (ties broken by smallest id), as `array<struct<score,id>>` sorted
  * score-desc, id-asc.
  *
  * This is the scale path for per-group top-k (SURVEY §4, ANN L6): a
  * `TypedImperativeAggregate` participates in partial aggregation, so each
  * map task reduces its partition to ≤ k rows per group BEFORE the shuffle
  * — with p partitions and g groups the shuffle carries at most p·g·k
  * rows, independent of input size. The window-function alternative
  * (`row_number() over (partition by group)`) shuffles EVERY input row to
  * the group's partition, which at 100 TB with a handful of groups is a
  * straight-to-OOM plan.
  *
  * Buffer is a bounded min-heap ordered "most evictable first" (lowest
  * score, then largest id), so update/merge are O(log k) and the result is
  * deterministic regardless of partition merge order.
  */
final case class TopKByScore(
    score: Expression,
    id: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0,
) extends TypedImperativeAggregate[mutable.PriorityQueue[(Double, Long)]]
    with ImplicitCastInputTypes {

  require(k > 0 && k <= (1 << 20), s"k out of range: $k")

  // Misuse (int ids, decimal scores) coerces — or fails analysis with a
  // type message — instead of ClassCastException deep inside update().
  override def inputTypes: Seq[AbstractDataType] = Seq(DoubleType, LongType)

  // Head of the queue = the element to evict first: lowest score wins,
  // then largest id (so ties keep the smallest ids).
  private val evictFirst: Ordering[(Double, Long)] = new Ordering[(Double, Long)] {
    def compare(x: (Double, Long), y: (Double, Long)): Int = {
      val c = java.lang.Double.compare(y._1, x._1)
      if (c != 0) c else java.lang.Long.compare(x._2, y._2)
    }
  }

  override def createAggregationBuffer(): mutable.PriorityQueue[(Double, Long)] =
    mutable.PriorityQueue.empty[(Double, Long)](evictFirst)

  private def add(buf: mutable.PriorityQueue[(Double, Long)], e: (Double, Long)): Unit = {
    if (buf.size < k) buf.enqueue(e)
    else if (evictFirst.compare(e, buf.head) < 0) { buf.dequeue(); buf.enqueue(e) }
  }

  override def update(
      buf: mutable.PriorityQueue[(Double, Long)], input: InternalRow): mutable.PriorityQueue[(Double, Long)] = {
    val s = score.eval(input)
    val i = id.eval(input)
    // NaN would rank above every real score under Double.compare — skip
    // it like NULL (cosine_sim already surfaces undefined as NULL; this
    // guards arbitrary user score expressions too).
    if (s != null && i != null && !java.lang.Double.isNaN(s.asInstanceOf[Double]))
      add(buf, (s.asInstanceOf[Double], i.asInstanceOf[Long]))
    buf
  }

  override def merge(
      buf: mutable.PriorityQueue[(Double, Long)],
      other: mutable.PriorityQueue[(Double, Long)]): mutable.PriorityQueue[(Double, Long)] = {
    other.foreach(add(buf, _))
    buf
  }

  override def eval(buf: mutable.PriorityQueue[(Double, Long)]): Any = {
    // Best first: least-evictable (highest score, then smallest id) sorts first.
    val sorted = buf.toArray.sortWith((a, b) => evictFirst.compare(a, b) < 0)
    new GenericArrayData(sorted.map { case (s, i) =>
      InternalRow(s, i)
    }.asInstanceOf[Array[Any]])
  }

  override def serialize(buf: mutable.PriorityQueue[(Double, Long)]): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + 16 * buf.size)
    bb.putInt(buf.size)
    buf.foreach { case (s, i) => bb.putDouble(s); bb.putLong(i) }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): mutable.PriorityQueue[(Double, Long)] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = createAggregationBuffer()
    var i = 0
    while (i < n) { buf.enqueue((bb.getDouble, bb.getLong)); i += 1 }
    buf
  }

  override def children: Seq[Expression] = Seq(score, id)
  override def nullable: Boolean = false
  override def dataType: DataType = TopKByScore.resultType
  override def prettyName: String = "top_k_by_score"

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKByScore =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKByScore =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): TopKByScore =
    copy(score = newChildren(0), id = newChildren(1))
}

object TopKByScore {
  val resultType: DataType = ArrayType(
    StructType(Seq(StructField("score", DoubleType, nullable = false),
      StructField("id", LongType, nullable = false))),
    containsNull = false)
}
