package graft

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.BoundReference
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StringType
import org.apache.spark.unsafe.types.UTF8String

import graft.functions.{GraftFunctions, MisraGries}
import graft.operators.TextAnalysis

/** Misra–Gries sketch + exact-top-k operator: the membership guarantee
  * under adversarial partitioning/merge orders, the runtime exactness
  * proof (both the guaranteed path and the exact fallback), and the plan
  * shapes that make the two passes scale (partial-aggregated sketch,
  * broadcast semi probe, top-k without a global sort). */
class MisraGriesSpec extends SparkSpec {

  private def row(s: String): InternalRow = InternalRow(UTF8String.fromString(s))

  test("aggregate semantics: decrement wave, merge rule, serde roundtrip") {
    val mg = MisraGries(BoundReference(0, StringType, nullable = true), 3)
    val b = mg.createAggregationBuffer()
    Seq("a", "a", "b", "c", "d", "e").foreach(s => mg.update(b, row(s)))
    // a,a,b,c fill the map; d hits a full map -> decrement wave leaves {a:1};
    // e then enters a non-full map.
    assert(b.size == 2 && b.get("a") == 1L && b.get("e") == 1L)

    // merge overflow: subtract the (capacity+1)-th largest and drop <= 0
    val x = mg.createAggregationBuffer()
    Seq("p", "p", "p", "q", "q", "r").foreach(s => mg.update(x, row(s)))
    val y = mg.createAggregationBuffer()
    Seq("s", "s", "s", "t", "t", "u").foreach(s => mg.update(y, row(s)))
    val m = mg.merge(x, y) // {p3 q2 r1 s3 t2 u1} -> d = 2 -> {p1, s1}
    assert(m.size <= 3)
    assert(m.get("p") == 1L && m.get("s") == 1L)

    val rt = mg.deserialize(mg.serialize(m))
    assert(rt == m)
    // nulls are no-ops
    val before = new java.util.HashMap(m)
    mg.update(m, InternalRow(null))
    assert(m == before)
  }

  test("membership guarantee holds across adversarial partition layouts") {
    import spark.implicits._
    GraftFunctions.register(spark)
    // 3 planted heavy hitters over a long distinct-noise tail
    val heavy = Seq.fill(400)("alpha") ++ Seq.fill(300)("beta") ++ Seq.fill(200)("gamma")
    val noise = (0 until 2000).map(i => s"noise_$i")
    val all = heavy ++ noise
    val n = all.size
    val cap = 16
    val threshold = n.toDouble / (cap + 1) // 2900/17 ~ 170.6
    for (df <- Seq(
        all.toDF("token").repartition(7),
        all.sorted.toDF("token").repartition(1),
        all.reverse.toDF("token").repartition(13, col("token")))) {
      val cands = df.agg(expr(s"graft_mg(token, $cap)")).head().getSeq[String](0)
      assert(cands.size <= cap)
      // every item with true frequency > n/(cap+1) must survive any layout
      assert(Seq("alpha", "beta", "gamma").forall(cands.contains),
        s"lost a guaranteed heavy hitter: $cands")
      assert(threshold < 200) // the test is actually exercising the bound
    }
  }

  test("heavyHitters: exact on Zipf data (guaranteed path) and plan shape") {
    import spark.implicits._
    // Zipf-ish: token t_i appears ceil(600/i) times, i = 1..80
    val corpus = (1 to 80).flatMap(i => Seq.fill((600 + i - 1) / i)(s"t_$i"))
    val rows = corpus.toDF("token").repartition(9)
    val got = TextAnalysis.heavyHitters(rows, "token", k = 10, capacity = 64)
    val expect = rows.groupBy($"token").agg(count(lit(1)).as("cnt"))
      .orderBy($"cnt".desc, $"token").limit(10)
    assert(got.collect().toSeq == expect.collect().toSeq)
    // guaranteed path: pass 2 is a broadcast semi probe + top-k, no global sort
    val p = got.queryExecution.executedPlan.toString
    assert(p.contains("BroadcastHashJoin") && p.contains("LeftSemi"), p)
    assert(p.contains("TakeOrderedAndProject"), p)
  }

  test("heavyHitters: flat data routes through the exact fallback, still exact") {
    import spark.implicits._
    // near-flat: 50 tokens x 4 each — capacity 6 can never certify k=5
    val corpus = (0 until 50).flatMap(i => Seq.fill(4)(f"u_$i%02d"))
    val rows = corpus.toDF("token").repartition(5)
    val got = TextAnalysis.heavyHitters(rows, "token", k = 5, capacity = 6)
    val expect = rows.groupBy($"token").agg(count(lit(1)).as("cnt"))
      .orderBy($"cnt".desc, $"token").limit(5)
    assert(got.collect().toSeq == expect.collect().toSeq)
    // fallback must NOT carry the candidate probe join
    val p = got.queryExecution.executedPlan.toString
    assert(!p.contains("LeftSemi"), p)
  }

  test("heavyHitters: empty input and null items") {
    import spark.implicits._
    val empty = Seq.empty[String].toDF("token")
    assert(TextAnalysis.heavyHitters(empty, "token", k = 3, capacity = 8).count() == 0L)
    val withNulls = Seq(Some("a"), Some("a"), None, Some("b"), None)
      .toDF("token")
    val out = TextAnalysis.heavyHitters(withNulls, "token", k = 3, capacity = 8).collect()
    assert(out.map(r => r.getString(0) -> r.getLong(1)).toSeq == Seq("a" -> 2L, "b" -> 1L))
  }

  test("sketch pass is partial-aggregated: two ObjectHashAggregate phases") {
    import spark.implicits._
    GraftFunctions.register(spark)
    val df = (0 until 1000).map(i => s"w_${i % 37}").toDF("token").repartition(4)
    val p = df.agg(expr("graft_mg(token, 16)"))
      .queryExecution.executedPlan.toString
    assert("ObjectHashAggregate".r.findAllIn(p).size >= 2, p)
  }
}
