package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.BinaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Per-group top-k as a native aggregate (`graft_topk(key, payload, k)`):
  * keeps the k smallest (key, payload) pairs per group in a bounded
  * ordered buffer — the per-GROUP analog of TakeOrderedAndProject, the
  * operator Spark lacks: `row_number().over(window) <= k` must ORDER the
  * whole fan-out inside each partition even with WindowGroupLimit's
  * partial pruning, and on a 160M-row candidate fan-out (PqProbe, 80k
  * corpus × 2k queries) that sort was 75 s where scoring the same rows
  * took 1.7 s — 97% of the query inside the ranking machinery.
  *
  * As a TypedImperativeAggregate the ranking instead rides the existing
  * hash-aggregate path: map-side partial top-k per task (O(k) state per
  * group, heap-bounded inserts), one k-row-per-group shuffle, merge.
  * No row is ever sorted except the ≤ k survivors per (task, group).
  *
  * Ordering is the total order (key asc, payload asc) — with key = a
  * fixed-point distance (or negated similarity) and payload = the
  * neighbor id, this reproduces EXACTLY the deterministic
  * `ORDER BY key, id` ranking the oracles specify, so swapping a window
  * for this aggregate cannot change any oracled result (PqSpec + q99/q100
  * re-verified). Emits array<struct<key, payload>> sorted ascending;
  * posexplode gives (rank-1, pair) back. */
case class TopKRows(
    left: Expression, right: Expression, k: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.TreeSet[(Long, Long)]]
  with BinaryLike[Expression] {

  require(k >= 1, s"k must be >= 1: $k")

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == LongType && right.dataType == LongType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_topk needs (BIGINT key, BIGINT payload), got " +
        s"${left.dataType.simpleString}, ${right.dataType.simpleString}")
  override def nullable: Boolean = false
  override def dataType: DataType = TopKRows.outType

  private val ord: Ordering[(Long, Long)] = Ordering.Tuple2[Long, Long]

  override def createAggregationBuffer(): java.util.TreeSet[(Long, Long)] =
    new java.util.TreeSet[(Long, Long)](ord)

  private def add(buf: java.util.TreeSet[(Long, Long)], key: Long, p: Long): Unit = {
    // cheap reject: full buffer and the candidate is past the current kth
    if (buf.size < k || ord.lt((key, p), buf.last())) {
      buf.add((key, p))
      if (buf.size > k) buf.pollLast()
    }
  }

  override def update(buf: java.util.TreeSet[(Long, Long)],
                      input: InternalRow): java.util.TreeSet[(Long, Long)] = {
    val kv = left.eval(input)
    val pv = right.eval(input)
    if (kv != null && pv != null)
      add(buf, kv.asInstanceOf[Long], pv.asInstanceOf[Long])
    buf
  }

  override def merge(buf: java.util.TreeSet[(Long, Long)],
                     other: java.util.TreeSet[(Long, Long)]): java.util.TreeSet[(Long, Long)] = {
    val it = other.iterator()
    while (it.hasNext) {
      val e = it.next()
      add(buf, e._1, e._2)
    }
    buf
  }

  override def eval(buf: java.util.TreeSet[(Long, Long)]): Any = {
    val out = new Array[Any](buf.size)
    val it = buf.iterator()
    var i = 0
    while (it.hasNext) {
      val e = it.next()
      out(i) = InternalRow(e._1, e._2)
      i += 1
    }
    new GenericArrayData(out)
  }

  override def serialize(buf: java.util.TreeSet[(Long, Long)]): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + 16 * buf.size)
    bb.putInt(buf.size)
    val it = buf.iterator()
    while (it.hasNext) {
      val e = it.next()
      bb.putLong(e._1); bb.putLong(e._2)
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): java.util.TreeSet[(Long, Long)] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val s = new java.util.TreeSet[(Long, Long)](ord)
    var i = 0
    while (i < n) { s.add((bb.getLong, bb.getLong)); i += 1 }
    s
  }

  override def withNewMutableAggBufferOffset(o: Int): TopKRows =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): TopKRows =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): TopKRows = copy(left = l, right = r)
  override def prettyName: String = "graft_topk"
}

object TopKRows {
  val outType: DataType = ArrayType(StructType(Seq(
    StructField("key", LongType, nullable = false),
    StructField("payload", LongType, nullable = false))), containsNull = false)
}
