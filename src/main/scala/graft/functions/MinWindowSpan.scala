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

/** `graft_phrasefreq(positions, gis, qpack)` → the document's PHRASE
  * FREQUENCY: how many anchor occurrences extend to a full consecutive
  * phrase match — [[graft.operators.LexIndex.phraseTopK]]'s inner loop as
  * one codegen'd scan over the same shared per-document event stream
  * [[MinWindowSpan]] reads (positions sorted ascending, parallel batch
  * term indexes).
  *
  * `qpack` entries are `gi * 16 + offset` — the phrase's (term, position-
  * offset) requirements, offset 0 being the anchor (repeated terms at
  * different offsets are separate entries). For each anchor event, every
  * requirement (p + offset, gi) is located by binary search over the
  * sorted positions; the anchor counts when all m hit. O(anchors · m ·
  * log events), zero allocation beyond two m-length scratch arrays per
  * row. Returns 0 when nothing matches; null only when an INPUT is null
  * (nullability derives from the children, so raw-SQL callers on
  * nullable columns get the standard null-in/null-out contract instead
  * of a codegen NPE — the internal call sites feed non-null
  * collect_list outputs and keep the null checks codegen'd away).
  */
case class PhraseFreq(first: Expression, second: Expression,
                      third: Expression) extends TernaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (first.dataType, second.dataType, third.dataType) match {
      case (ArrayType(LongType, _), ArrayType(IntegerType, _),
            ArrayType(IntegerType, _)) => TypeCheckResult.TypeCheckSuccess
      case (a, b, c) => TypeCheckResult.TypeCheckFailure(
        s"graft_phrasefreq requires (array<bigint>, array<int>, array<int>), " +
          s"got ${a.simpleString}, ${b.simpleString}, ${c.simpleString}")
    }

  override def dataType: DataType = LongType
  override def nullable: Boolean =
    first.nullable || second.nullable || third.nullable
  override def prettyName: String = "graft_phrasefreq"

  override def nullSafeEval(p: Any, g: Any, q: Any): Any = {
    val pos = p.asInstanceOf[ArrayData]
    val gis = g.asInstanceOf[ArrayData]
    val qp = q.asInstanceOf[ArrayData]
    val m = qp.numElements()
    if (m == 0) return 0L
    val qgi = new Array[Int](m)
    val qoff = new Array[Int](m)
    var anchorGi = -1
    var j = 0
    while (j < m) {
      val e = qp.getInt(j); qgi(j) = e >> 4; qoff(j) = e & 15
      if (qoff(j) == 0) anchorGi = qgi(j)
      j += 1
    }
    if (anchorGi < 0) return 0L
    val n = math.min(pos.numElements(), gis.numElements())
    // binary search for position `target`; true when present with term `gi`
    def hit(target: Long, gi: Int): Boolean = {
      var lo = 0; var hi = n - 1
      while (lo <= hi) {
        val mid = (lo + hi) >>> 1
        val v = pos.getLong(mid)
        if (v < target) lo = mid + 1
        else if (v > target) hi = mid - 1
        else return gis.getInt(mid) == gi
      }
      false
    }
    var pf = 0L
    var i = 0
    while (i < n) {
      if (gis.getInt(i) == anchorGi) {
        val base = pos.getLong(i)
        var ok = true
        var t = 0
        while (ok && t < m) {
          if (!hit(base + qoff(t), qgi(t))) ok = false
          t += 1
        }
        if (ok) pf += 1L
      }
      i += 1
    }
    pf
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (p, g, q) => {
      val m = ctx.freshName("m")
      val qgi = ctx.freshName("qgi")
      val qoff = ctx.freshName("qoff")
      val anchorGi = ctx.freshName("anchorGi")
      val n = ctx.freshName("n")
      val pf = ctx.freshName("pf")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val t = ctx.freshName("t")
      val e = ctx.freshName("e")
      val base = ctx.freshName("base")
      val ok = ctx.freshName("ok")
      val target = ctx.freshName("target")
      val lo = ctx.freshName("lo")
      val hi = ctx.freshName("hi")
      val mid = ctx.freshName("mid")
      val v = ctx.freshName("v")
      val found = ctx.freshName("found")
      s"""
         |final int $m = $q.numElements();
         |long $pf = 0L;
         |int $anchorGi = -1;
         |if ($m > 0) {
         |  final int[] $qgi = new int[$m];
         |  final int[] $qoff = new int[$m];
         |  for (int $j = 0; $j < $m; $j++) {
         |    final int $e = $q.getInt($j);
         |    $qgi[$j] = $e >> 4; $qoff[$j] = $e & 15;
         |    if ($qoff[$j] == 0) $anchorGi = $qgi[$j];
         |  }
         |  final int $n = java.lang.Math.min($p.numElements(), $g.numElements());
         |  if ($anchorGi >= 0) {
         |    for (int $i = 0; $i < $n; $i++) {
         |      if ($g.getInt($i) == $anchorGi) {
         |        final long $base = $p.getLong($i);
         |        boolean $ok = true;
         |        for (int $t = 0; $ok && $t < $m; $t++) {
         |          final long $target = $base + (long) $qoff[$t];
         |          int $lo = 0; int $hi = $n - 1;
         |          boolean $found = false;
         |          while ($lo <= $hi) {
         |            final int $mid = ($lo + $hi) >>> 1;
         |            final long $v = $p.getLong($mid);
         |            if ($v < $target) $lo = $mid + 1;
         |            else if ($v > $target) $hi = $mid - 1;
         |            else { $found = $g.getInt($mid) == $qgi[$t]; break; }
         |          }
         |          if (!$found) $ok = false;
         |        }
         |        if ($ok) $pf += 1L;
         |      }
         |    }
         |  }
         |}
         |${ev.value} = $pf;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression,
      newThird: Expression): PhraseFreq =
    copy(first = newFirst, second = newSecond, third = newThird)
}
