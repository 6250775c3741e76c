package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.types._

/** KMV (k-minimum-values) distinct-count sketch as a native Catalyst
  * aggregate (`graft_kmv(hash_col, k)`): keeps the k smallest DISTINCT
  * values of a 60-bit hash column per group in a bounded tree-set buffer —
  * O(k) memory per group regardless of cardinality, partial-aggregated
  * map-side and merged across partitions like any built-in aggregate
  * (contrast with an exact `count_distinct`, which shuffles every distinct
  * value). Emits struct(kth_hash, n_seen, estimate) where estimate is the
  * classic KMV estimator (k−1)·2⁶⁰/kth (exact n_seen when the group has
  * fewer than k distinct hashes).
  *
  * Because the hash is md5-derived (callers pass
  * `conv(substr(md5(x),1,15),16,10)` — 60 bits), the sketch is a PURE
  * FUNCTION of the input SET: same rows ⇒ bit-identical kth hash and
  * estimate on any engine, any partitioning — so unlike
  * `approx_count_distinct` (HLL, implementation-defined) this
  * approximation IS DuckDB-oracle-checkable (q74).
  *
  * Reference capability: distinct-count analytics (`silver_validation
  * .py:120` uniqueness checks) at cardinalities where exact counting is
  * the bottleneck.
  */
case class KMinValues(
    child: Expression, k: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.TreeSet[java.lang.Long]]
  with UnaryLike[Expression] {

  require(k >= 2, s"k must be >= 2: $k")

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_kmv needs a BIGINT hash input, got ${child.dataType.simpleString}")
  override def nullable: Boolean = false
  override def dataType: DataType = KMinValues.outType

  override def createAggregationBuffer(): java.util.TreeSet[java.lang.Long] =
    new java.util.TreeSet[java.lang.Long]()

  // set-semantics insert, bounded at the k smallest
  private def add(buf: java.util.TreeSet[java.lang.Long], v: Long): Unit = {
    buf.add(v)
    if (buf.size > k) buf.pollLast()
  }

  override def update(buf: java.util.TreeSet[java.lang.Long],
                      input: InternalRow): java.util.TreeSet[java.lang.Long] = {
    val v = child.eval(input)
    if (v != null) add(buf, v.asInstanceOf[Long])
    buf
  }

  override def merge(buf: java.util.TreeSet[java.lang.Long],
                     other: java.util.TreeSet[java.lang.Long]): java.util.TreeSet[java.lang.Long] = {
    val it = other.iterator()
    while (it.hasNext) add(buf, it.next())
    buf
  }

  override def eval(buf: java.util.TreeSet[java.lang.Long]): Any = {
    val n = buf.size
    if (n >= k) {
      val kth = buf.last().longValue()
      InternalRow(kth, n.toLong,
        (k - 1).toDouble * KMinValues.Domain60 / kth.toDouble)
    } else {
      InternalRow(null, n.toLong, n.toDouble)
    }
  }

  override def serialize(buf: java.util.TreeSet[java.lang.Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + 8 * buf.size)
    bb.putInt(buf.size)
    val it = buf.iterator()
    while (it.hasNext) bb.putLong(it.next())
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): java.util.TreeSet[java.lang.Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val s = new java.util.TreeSet[java.lang.Long]()
    var i = 0
    while (i < n) { s.add(bb.getLong); i += 1 }
    s
  }

  override def withNewMutableAggBufferOffset(o: Int): KMinValues =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): KMinValues =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildInternal(c: Expression): KMinValues =
    copy(child = c)
  override def prettyName: String = "graft_kmv"
}

object KMinValues {
  /** Hash domain: callers feed 60-bit md5-derived hashes (15 hex chars). */
  val Domain60: Double = 1152921504606846976.0 // 2^60, exact in double
  val outType: StructType = StructType(Seq(
    StructField("kth_hash", LongType, nullable = true),
    StructField("n_seen", LongType, nullable = false),
    StructField("estimate", DoubleType, nullable = false)))
}
