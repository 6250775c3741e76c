package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** `graft_minspan(positions, gis, qpack)` → the MINIMAL token span of a
  * document window containing at least one occurrence of EVERY query term,
  * or NULL when no such window exists — the inner loop of
  * [[graft.operators.LexIndex.proximityTopK]] (Lucene SpanNearQuery's slop
  * scoring) as one codegen'd scan.
  *
  *  - `positions`: array<bigint> — the document's occurrence positions over
  *    the QUERY BATCH's terms, sorted ascending (one shared event stream
  *    per document, built once per batch).
  *  - `gis`: array<int> — parallel global term indexes (batch-wide).
  *  - `qpack`: array<int> — the query's terms as `gi * 16 + ti` entries,
  *    where `ti` ∈ 0..m−1 is the query-local term index; m = qpack length.
  *
  * Algorithm: the classic minimal-window-ending-here sweep — keep each
  * query term's last-seen position; whenever all m have been seen, the
  * smallest window ending at the current event is `pos − min(last) + 1`.
  * O(events · m) with m ≤ 16 (packing budget), zero allocation beyond two
  * m-length scratch arrays per ROW. This exists as a native expression
  * because the same sweep as a SQL `aggregate(...)` HOF rebuilds an
  * m-element array three times per EVENT (the lambda cannot let-bind its
  * intermediate), which at the sf1 step turned a ~2 s scan into ~90 s of
  * allocation churn.
  *
  * Events whose `gi` is not in `qpack` pass through untouched — that is
  * what lets ONE per-document event stream serve every query in the batch.
  */
case class MinWindowSpan(first: Expression, second: Expression,
                         third: Expression) extends TernaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (first.dataType, second.dataType, third.dataType) match {
      case (ArrayType(LongType, _), ArrayType(IntegerType, _),
            ArrayType(IntegerType, _)) => TypeCheckResult.TypeCheckSuccess
      case (a, b, c) => TypeCheckResult.TypeCheckFailure(
        s"graft_minspan requires (array<bigint>, array<int>, array<int>), " +
          s"got ${a.simpleString}, ${b.simpleString}, ${c.simpleString}")
    }

  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_minspan"

  override def nullSafeEval(p: Any, g: Any, q: Any): Any = {
    val pos = p.asInstanceOf[ArrayData]
    val gis = g.asInstanceOf[ArrayData]
    val qp = q.asInstanceOf[ArrayData]
    val m = qp.numElements()
    if (m == 0) return null
    val qgi = new Array[Int](m)
    val qti = new Array[Int](m)
    var j = 0
    while (j < m) {
      val e = qp.getInt(j); qgi(j) = e >> 4; qti(j) = e & 15; j += 1
    }
    val last = Array.fill[Long](m)(-1L)
    var seen = 0
    var best = Long.MaxValue
    val n = math.min(pos.numElements(), gis.numElements())
    var i = 0
    while (i < n) {
      val gi = gis.getInt(i)
      var local = -1
      var t = 0
      while (t < m && local < 0) { if (qgi(t) == gi) local = qti(t); t += 1 }
      if (local >= 0) {
        if (last(local) < 0L) seen += 1
        last(local) = pos.getLong(i)
        if (seen == m) {
          var mn = Long.MaxValue
          var u = 0
          while (u < m) { if (last(u) < mn) mn = last(u); u += 1 }
          val span = pos.getLong(i) - mn + 1L
          if (span < best) best = span
        }
      }
      i += 1
    }
    if (best == Long.MaxValue) null else java.lang.Long.valueOf(best)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (p, g, q) => {
      val m = ctx.freshName("m")
      val qgi = ctx.freshName("qgi")
      val qti = ctx.freshName("qti")
      val last = ctx.freshName("last")
      val seen = ctx.freshName("seen")
      val best = ctx.freshName("best")
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val t = ctx.freshName("t")
      val u = ctx.freshName("u")
      val e = ctx.freshName("e")
      val gi = ctx.freshName("gi")
      val local = ctx.freshName("local")
      val mn = ctx.freshName("mn")
      val span = ctx.freshName("span")
      s"""
         |final int $m = $q.numElements();
         |long $best = Long.MAX_VALUE;
         |if ($m > 0) {
         |  final int[] $qgi = new int[$m];
         |  final int[] $qti = new int[$m];
         |  for (int $j = 0; $j < $m; $j++) {
         |    final int $e = $q.getInt($j);
         |    $qgi[$j] = $e >> 4; $qti[$j] = $e & 15;
         |  }
         |  final long[] $last = new long[$m];
         |  java.util.Arrays.fill($last, -1L);
         |  int $seen = 0;
         |  final int $n = java.lang.Math.min($p.numElements(), $g.numElements());
         |  for (int $i = 0; $i < $n; $i++) {
         |    final int $gi = $g.getInt($i);
         |    int $local = -1;
         |    for (int $t = 0; $t < $m && $local < 0; $t++) {
         |      if ($qgi[$t] == $gi) $local = $qti[$t];
         |    }
         |    if ($local >= 0) {
         |      if ($last[$local] < 0L) $seen++;
         |      $last[$local] = $p.getLong($i);
         |      if ($seen == $m) {
         |        long $mn = Long.MAX_VALUE;
         |        for (int $u = 0; $u < $m; $u++) {
         |          if ($last[$u] < $mn) $mn = $last[$u];
         |        }
         |        final long $span = $p.getLong($i) - $mn + 1L;
         |        if ($span < $best) $best = $span;
         |      }
         |    }
         |  }
         |}
         |if ($best == Long.MAX_VALUE) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = $best;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression,
      newThird: Expression): MinWindowSpan =
    copy(first = newFirst, second = newSecond, third = newThird)
}
