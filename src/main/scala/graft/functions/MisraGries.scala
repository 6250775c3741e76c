package graft.functions

import java.nio.ByteBuffer
import java.nio.charset.StandardCharsets

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Misra–Gries frequent-items sketch as a native Catalyst aggregate
  * (`graft_mg(item, capacity)`): tracks at most `capacity` candidate items
  * per group in a bounded counter map — O(capacity) memory per group
  * regardless of how many DISTINCT items the group holds, partial-aggregated
  * map-side and merged across partitions like any built-in aggregate.
  *
  * Guarantee (Misra & Gries 1982; merge rule and its preserved error bound
  * from Agarwal et al., "Mergeable Summaries", PODS'12): after any
  * update/merge tree over n total items, every item whose true frequency
  * exceeds n/(capacity+1) is present in the final map. The counts are
  * lower bounds (undercount ≤ n/(capacity+1)) and depend on partition
  * order, so [[eval]] deliberately emits ONLY the candidate item set
  * (sorted, order-independent membership guarantee) — exact counts come
  * from a second pass; see `TextAnalysis.heavyHitters` for the always-exact
  * two-pass operator built on this.
  *
  * Why it matters at scale: an exact `groupBy(item).count.orderBy.limit(k)`
  * over 100 TB of tokens shuffles EVERY distinct item (billions of keys).
  * This sketch reduces pass 1 to one bounded buffer per partition plus a
  * `capacity`-entry merge — the shuffle carries ≤ capacity counters per
  * map task — and pass 2 aggregates only the ≤ capacity candidates.
  *
  * Reference capability: corpus-level term statistics (vocabulary /
  * top-token reporting in the reference's profiling step) restated at a
  * scale where the exact global shuffle is the bottleneck.
  */
case class MisraGries(
    child: Expression, capacity: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.HashMap[String, java.lang.Long]]
  with UnaryLike[Expression] {

  require(capacity >= 1, s"capacity must be >= 1: $capacity")

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_mg needs a STRING item input, got ${child.dataType.simpleString}")
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def createAggregationBuffer(): java.util.HashMap[String, java.lang.Long] =
    new java.util.HashMap[String, java.lang.Long]()

  override def update(buf: java.util.HashMap[String, java.lang.Long],
                      input: InternalRow): java.util.HashMap[String, java.lang.Long] = {
    val v = child.eval(input)
    if (v != null) {
      val item = v.toString
      val cur = buf.get(item)
      if (cur != null) buf.put(item, cur + 1L)
      else if (buf.size < capacity) buf.put(item, 1L)
      else {
        // Classic MG step: a miss on a full map decrements every counter.
        // Amortized O(1) per input: each decrement event cancels capacity+1
        // units of accumulated count, and only n units ever enter the map.
        val it = buf.entrySet().iterator()
        while (it.hasNext) {
          val e = it.next()
          val nv = e.getValue - 1L
          if (nv <= 0L) it.remove() else e.setValue(nv)
        }
      }
    }
    buf
  }

  override def merge(buf: java.util.HashMap[String, java.lang.Long],
                     other: java.util.HashMap[String, java.lang.Long])
      : java.util.HashMap[String, java.lang.Long] = {
    val it = other.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val cur = buf.get(e.getKey)
      buf.put(e.getKey, if (cur == null) e.getValue else java.lang.Long.valueOf(cur + e.getValue))
    }
    if (buf.size > capacity) {
      // Mergeable-summaries rule: subtract the (capacity+1)-th largest
      // count from every counter and drop the non-positive — size returns
      // to ≤ capacity and the n/(capacity+1) undercount bound is preserved
      // across any merge tree.
      val counts = new Array[Long](buf.size)
      var i = 0
      val vit = buf.values().iterator()
      while (vit.hasNext) { counts(i) = vit.next(); i += 1 }
      java.util.Arrays.sort(counts)
      val d = counts(counts.length - capacity - 1)
      val eit = buf.entrySet().iterator()
      while (eit.hasNext) {
        val e = eit.next()
        val nv = e.getValue - d
        if (nv <= 0L) eit.remove() else e.setValue(nv)
      }
    }
    buf
  }

  /** Candidate items only, sorted lexicographically. Counts are withheld on
    * purpose: they are order-dependent lower bounds, while the MEMBERSHIP of
    * every over-threshold item is guaranteed on any partitioning. */
  override def eval(buf: java.util.HashMap[String, java.lang.Long]): Any = {
    val keys = new Array[String](buf.size)
    buf.keySet().toArray(keys)
    java.util.Arrays.sort(keys, java.util.Comparator.naturalOrder[String]())
    new GenericArrayData(keys.map(UTF8String.fromString(_)))
  }

  override def serialize(buf: java.util.HashMap[String, java.lang.Long]): Array[Byte] = {
    var bytes = 4
    val sit = buf.entrySet().iterator()
    val entries = new Array[(Array[Byte], Long)](buf.size)
    var i = 0
    while (sit.hasNext) {
      val e = sit.next()
      val b = e.getKey.getBytes(StandardCharsets.UTF_8)
      entries(i) = (b, e.getValue)
      bytes += 4 + b.length + 8
      i += 1
    }
    val bb = ByteBuffer.allocate(bytes)
    bb.putInt(entries.length)
    entries.foreach { case (b, c) => bb.putInt(b.length); bb.put(b); bb.putLong(c) }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): java.util.HashMap[String, java.lang.Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val m = new java.util.HashMap[String, java.lang.Long](n * 2)
    var i = 0
    while (i < n) {
      val len = bb.getInt
      val b = new Array[Byte](len)
      bb.get(b)
      m.put(new String(b, StandardCharsets.UTF_8), bb.getLong)
      i += 1
    }
    m
  }

  override def withNewMutableAggBufferOffset(o: Int): MisraGries =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): MisraGries =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildInternal(c: Expression): MisraGries =
    copy(child = c)
  override def prettyName: String = "graft_mg"
}
