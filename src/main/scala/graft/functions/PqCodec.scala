package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Native Catalyst expressions for Product Quantization (Jégou et al.,
  * "Product Quantization for Nearest Neighbor Search", TPAMI 2011 — the
  * standard compressed-vector ANN path: split the vector into M subspaces,
  * quantize each against a per-subspace codebook of K centroids, and score
  * queries against the M-byte codes via per-subspace distance-table lookups
  * (ADC) instead of full-dimension arithmetic).
  *
  * All three expressions work on [[graft.operators.Similarity.quantize]]'s
  * fixed-point long vectors with exact integer arithmetic — squared-L2
  * distances are exact BIGINTs end to end, so the whole pipeline (training
  * included) is bit-reproducible and DuckDB-oracle-checkable, like the IVF
  * and k-means families. Magnitude check: components are |x| ≤ 2^20, so a
  * squared diff is ≤ 2^42 and a subspace sum over ≤2^10 dims stays ≤ 2^52 —
  * no overflow anywhere near long range.
  *
  * The codebook argument is a CONSTANT 3-level literal
  * (`array<array<array<bigint>>>`, cb[m][c][j]) injected via `typedLit` —
  * one Literal node, codegen references it as a static `long[][][]`
  * (the [[LongMatrixDot]] discipline: generated code size constant in M·K).
  */
object PqCodec {
  private[functions] def okCb(t: DataType): Boolean = t match {
    case ArrayType(ArrayType(ArrayType(LongType, _), _), _) => true
    case _ => false
  }
  private[functions] def okVec(t: DataType): Boolean = t match {
    case ArrayType(LongType, _) => true
    case _ => false
  }
  /** Materialize a foldable codebook expression as long[][][]. */
  private[functions] def cbValue(e: Expression): Array[Array[Array[Long]]] = {
    val ad = e.eval().asInstanceOf[ArrayData]
    Array.tabulate(ad.numElements()) { m =>
      val sub = ad.getArray(m)
      Array.tabulate(sub.numElements()) { c =>
        val row = sub.getArray(c)
        Array.tabulate(row.numElements())(row.getLong)
      }
    }
  }
}

/** `graft_pqenc(vec, codebook)` → `array<bigint>` of M code ids: per
  * subspace m, the codebook row minimizing exact squared L2 distance to the
  * vector's m-th slice (subspace m covers positions [m·dSub, (m+1)·dSub)
  * where dSub = len(cb[m][0])). Strictly-less comparison scanning codes in
  * ascending order ⇒ first-min ≡ smallest-code-id tiebreak, matching the
  * oracle's `row_number() OVER (ORDER BY dist, code)`. */
case class LongPqEncode(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (!PqCodec.okVec(left.dataType) || !PqCodec.okCb(right.dataType))
      TypeCheckResult.TypeCheckFailure(
        s"graft_pqenc requires (array<bigint>, array<array<array<bigint>>>), got " +
          s"${left.dataType.simpleString} and ${right.dataType.simpleString}")
    else if (!right.foldable)
      TypeCheckResult.TypeCheckFailure(
        "graft_pqenc requires a constant (foldable) codebook argument")
    else TypeCheckResult.TypeCheckSuccess

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_pqenc"

  @transient private lazy val cb: Array[Array[Array[Long]]] = PqCodec.cbValue(right)

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val out = new Array[Long](cb.length)
    var off = 0
    var m = 0
    while (m < cb.length) {
      val codes = cb(m)
      val dSub = if (codes.isEmpty) 0 else codes(0).length
      var best = 0L
      var bestD = Long.MaxValue
      var c = 0
      while (c < codes.length) {
        val row = codes(c)
        var s = 0L
        var j = 0
        while (j < dSub) {
          val d = x.getLong(off + j) - row(j)
          s += d * d
          j += 1
        }
        if (s < bestD) { bestD = s; best = c }
        c += 1
      }
      out(m) = best
      off += dSub
      m += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, _) => {
      val mat = ctx.addReferenceObj("pqcb", cb, "long[][][]")
      val out = ctx.freshName("out")
      val off = ctx.freshName("off")
      val m = ctx.freshName("m")
      val c = ctx.freshName("c")
      val j = ctx.freshName("j")
      val s = ctx.freshName("s")
      val best = ctx.freshName("best")
      val bestD = ctx.freshName("bestD")
      val d = ctx.freshName("d")
      s"""
         |final long[] $out = new long[$mat.length];
         |int $off = 0;
         |for (int $m = 0; $m < $mat.length; $m++) {
         |  final long[][] __codes = $mat[$m];
         |  final int __dSub = __codes.length == 0 ? 0 : __codes[0].length;
         |  long $best = 0L; long $bestD = Long.MAX_VALUE;
         |  for (int $c = 0; $c < __codes.length; $c++) {
         |    final long[] __row = __codes[$c];
         |    long $s = 0L;
         |    for (int $j = 0; $j < __dSub; $j++) {
         |      final long $d = $a.getLong($off + $j) - __row[$j];
         |      $s += $d * $d;
         |    }
         |    if ($s < $bestD) { $bestD = $s; $best = $c; }
         |  }
         |  $out[$m] = $best;
         |  $off += __dSub;
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): LongPqEncode =
    copy(left = newLeft, right = newRight)
}

/** `graft_pqtab(vec, codebook)` → `array<bigint>`: the query's ADC
  * distance tables, FLAT row-major (tab[m·ks + c] = exact squared L2
  * between the vector's m-th slice and codebook row (m, c); every
  * subspace must share one ks, checked at build). Computed ONCE per query
  * row; every (query, code) score downstream is then a table lookup.
  *
  * Flat, not nested, deliberately: `array<array<bigint>>` made the ADC
  * join EVAL `getArray(m)` per subspace per candidate pair — an
  * UnsafeArrayData wrapper allocation ×M on the hottest path in the
  * family — and the 80k-corpus stress table measured full-corpus ADC
  * SLOWER than the brute-force dot because of it. One flat buffer is one
  * base-offset `getLong` per subspace, allocation-free. */
case class LongPqTables(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (!PqCodec.okVec(left.dataType) || !PqCodec.okCb(right.dataType))
      TypeCheckResult.TypeCheckFailure(
        s"graft_pqtab requires (array<bigint>, array<array<array<bigint>>>), got " +
          s"${left.dataType.simpleString} and ${right.dataType.simpleString}")
    else if (!right.foldable)
      TypeCheckResult.TypeCheckFailure(
        "graft_pqtab requires a constant (foldable) codebook argument")
    else TypeCheckResult.TypeCheckSuccess

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_pqtab"

  @transient private lazy val cb: Array[Array[Array[Long]]] = {
    val v = PqCodec.cbValue(right)
    require(v.map(_.length).distinct.length <= 1,
      "graft_pqtab: all subspaces must have the same code count")
    v
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val ks = if (cb.isEmpty) 0 else cb(0).length
    val flat = new Array[Long](cb.length * ks)
    var off = 0
    var m = 0
    while (m < cb.length) {
      val codes = cb(m)
      val dSub = if (codes.isEmpty) 0 else codes(0).length
      var c = 0
      while (c < codes.length) {
        val row = codes(c)
        var s = 0L
        var j = 0
        while (j < dSub) {
          val d = x.getLong(off + j) - row(j)
          s += d * d
          j += 1
        }
        flat(m * ks + c) = s
        c += 1
      }
      off += dSub
      m += 1
    }
    new GenericArrayData(flat)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, _) => {
      val mat = ctx.addReferenceObj("pqcb", cb, "long[][][]")
      val flat = ctx.freshName("flat")
      val ks = ctx.freshName("ks")
      val off = ctx.freshName("off")
      val m = ctx.freshName("m")
      val c = ctx.freshName("c")
      val j = ctx.freshName("j")
      val s = ctx.freshName("s")
      val d = ctx.freshName("d")
      s"""
         |final int $ks = $mat.length == 0 ? 0 : $mat[0].length;
         |final long[] $flat = new long[$mat.length * $ks];
         |int $off = 0;
         |for (int $m = 0; $m < $mat.length; $m++) {
         |  final long[][] __codes = $mat[$m];
         |  final int __dSub = __codes.length == 0 ? 0 : __codes[0].length;
         |  for (int $c = 0; $c < __codes.length; $c++) {
         |    final long[] __row = __codes[$c];
         |    long $s = 0L;
         |    for (int $j = 0; $j < __dSub; $j++) {
         |      final long $d = $a.getLong($off + $j) - __row[$j];
         |      $s += $d * $d;
         |    }
         |    $flat[$m * $ks + $c] = $s;
         |  }
         |  $off += __dSub;
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($flat);
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): LongPqTables =
    copy(left = newLeft, right = newRight)
}

/** `graft_pqadc(tables, codes)` → bigint: Σ_m tables[m·ks + codes[m]]
  * (ks inferred as len(tables)/len(codes)) — the asymmetric-distance-
  * computation inner loop. This lookup chain replaces the O(D)
  * multiply-accumulate of a full-precision dot with O(M) flat array reads
  * per (query, neighbor) pair — the entire point of PQ at corpus scale,
  * and the hot path of [[graft.operators.Similarity.pqAdcTopK]], so it is
  * a codegen'd allocation-free loop fused into whole-stage codegen. A
  * code outside [0, ks) is a contract violation (codes and tables must
  * come from the same codebook) and raises loudly in both eval paths. */
case class LongPqAdc(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (PqCodec.okVec(left.dataType) && PqCodec.okVec(right.dataType))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_pqadc requires (array<bigint> flat tables, array<bigint> codes), got " +
        s"${left.dataType.simpleString} and ${right.dataType.simpleString}")
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_pqadc"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val tab = a.asInstanceOf[ArrayData]
    val codes = b.asInstanceOf[ArrayData]
    val n = codes.numElements()
    val ks = if (n == 0) 0 else tab.numElements() / n
    var s = 0L
    var m = 0
    while (m < n) {
      s += tab.getLong(m * ks + codes.getLong(m).toInt)
      m += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val ks = ctx.freshName("ks")
      val m = ctx.freshName("m")
      val s = ctx.freshName("s")
      s"""
         |final int $n = $b.numElements();
         |final int $ks = $n == 0 ? 0 : $a.numElements() / $n;
         |long $s = 0L;
         |for (int $m = 0; $m < $n; $m++) {
         |  $s += $a.getLong($m * $ks + (int) $b.getLong($m));
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): LongPqAdc =
    copy(left = newLeft, right = newRight)
}
