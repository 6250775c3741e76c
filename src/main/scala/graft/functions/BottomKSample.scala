package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.BinaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Bottom-k uniform sample as a native Catalyst aggregate
  * (`graft_bks(hash_col, value_col, k)`): keeps the values carried by the
  * k SMALLEST row hashes per group — the classic mergeable bottom-k
  * sampling scheme (the sampling member of this engine's sketch family,
  * next to KMV for distinct counts and Misra–Gries for frequencies). The
  * buffer is a bounded tree map, O(k) memory per group regardless of
  * group size, partial-aggregated map-side and merged across partitions
  * like any built-in aggregate.
  *
  * Because the hash is md5-derived (callers pass
  * `conv(substr(md5(row_key),1,15),16,10)` — 60 bits), the SAMPLE ITSELF
  * is a pure function of the input set: same rows ⇒ the same k rows
  * sampled on any engine, any partitioning, any arrival order. So unlike
  * reservoir sampling (RNG-state-dependent) or `percentile_approx`
  * (KLL, implementation-defined), every statistic computed from this
  * sample — quantiles included — is DuckDB-oracle-checkable (q102).
  *
  * Emits struct(n_seen, vals) with vals ordered by hash ascending. A
  * group with ≤ k rows is sampled WHOLE, so downstream statistics on such
  * groups are exact (spec-asserted). On the (contract-violating) event of
  * two rows sharing a hash, the smaller value survives — deterministic
  * either way.
  *
  * Scale: one pass, O(k)/group state, vs exact `percentile`'s
  * collect-and-sort of every group value — the quantile path for groups
  * too large to sort, and the third leg of the sketch family's
  * 100 TB story (all three are mergeable, so tier rollups compose:
  * shard → day → global without touching rows again). */
case class BottomKSample(
    left: Expression, right: Expression, k: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.TreeMap[java.lang.Long, java.lang.Long]]
  with BinaryLike[Expression] {

  require(k >= 1, s"k must be >= 1: $k")

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == LongType && right.dataType == LongType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_bks needs (BIGINT hash, BIGINT value), got " +
        s"${left.dataType.simpleString}, ${right.dataType.simpleString}")
  override def nullable: Boolean = false
  override def dataType: DataType = BottomKSample.outType

  override def createAggregationBuffer(): java.util.TreeMap[java.lang.Long, java.lang.Long] =
    new java.util.TreeMap[java.lang.Long, java.lang.Long]()

  private def add(buf: java.util.TreeMap[java.lang.Long, java.lang.Long],
                  h: Long, v: Long): Unit = {
    val prev = buf.get(h)
    if (prev == null || prev.longValue() > v) buf.put(h, v)
    if (buf.size > k) buf.pollLastEntry()
  }

  override def update(buf: java.util.TreeMap[java.lang.Long, java.lang.Long],
                      input: InternalRow): java.util.TreeMap[java.lang.Long, java.lang.Long] = {
    val h = left.eval(input)
    val v = right.eval(input)
    if (h != null && v != null)
      add(buf, h.asInstanceOf[Long], v.asInstanceOf[Long])
    buf
  }

  override def merge(buf: java.util.TreeMap[java.lang.Long, java.lang.Long],
                     other: java.util.TreeMap[java.lang.Long, java.lang.Long]): java.util.TreeMap[java.lang.Long, java.lang.Long] = {
    val it = other.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      add(buf, e.getKey.longValue(), e.getValue.longValue())
    }
    buf
  }

  // n_seen counts ONLY sampled rows' survivorship, not the stream length:
  // a separate count(1) in the same agg is free and avoids widening the
  // buffer — callers wanting the group size add it themselves (q102 does).
  override def eval(buf: java.util.TreeMap[java.lang.Long, java.lang.Long]): Any = {
    val vals = new Array[Long](buf.size)
    val it = buf.values().iterator()
    var i = 0
    while (it.hasNext) { vals(i) = it.next().longValue(); i += 1 }
    InternalRow(buf.size.toLong, new GenericArrayData(vals))
  }

  override def serialize(buf: java.util.TreeMap[java.lang.Long, java.lang.Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + 16 * buf.size)
    bb.putInt(buf.size)
    val it = buf.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      bb.putLong(e.getKey.longValue()); bb.putLong(e.getValue.longValue())
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): java.util.TreeMap[java.lang.Long, java.lang.Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val m = new java.util.TreeMap[java.lang.Long, java.lang.Long]()
    var i = 0
    while (i < n) { m.put(bb.getLong, bb.getLong); i += 1 }
    m
  }

  override def withNewMutableAggBufferOffset(o: Int): BottomKSample =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): BottomKSample =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): BottomKSample = copy(left = l, right = r)
  override def prettyName: String = "graft_bks"
}

object BottomKSample {
  val outType: StructType = StructType(Seq(
    StructField("n_sampled", LongType, nullable = false),
    StructField("vals", ArrayType(LongType, containsNull = false), nullable = false)))
}
