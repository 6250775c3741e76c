package graft

import org.apache.spark.sql.functions._

/** Sketch-aggregate accuracy (no SQL oracle — engines' sketch algorithms
  * differ): HLL distinct within its configured error, quantile sketch
  * bracketed by exact quantiles at generous accuracy. */
class AnalyticsSpec extends SparkSpec {

  private lazy val li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")

  test("approx_count_distinct within 2% of exact") {
    val exact = li.select(countDistinct(col("l_orderkey"))).head().getLong(0)
    val approx = li.select(approx_count_distinct(col("l_orderkey"), 0.01)).head().getLong(0)
    assert(math.abs(approx - exact).toDouble / exact < 0.02)
  }

  test("percentile_approx brackets the exact median") {
    val exact = li.stat.approxQuantile("l_extendedprice", Array(0.5), 0.0).head
    val approx = li.select(
      percentile_approx(col("l_extendedprice"), lit(0.5), lit(10000))).head().getDouble(0)
    assert(math.abs(approx - exact) / exact < 0.01)
  }

  // INTERSECT/EXCEPT operator coverage: the set-op form must produce exactly
  // the segments q27's registered one-scan conditional-aggregation plan does.
  test("intersect/except set ops agree with the one-scan q27 plan") {
    val o = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
    val highVal = o.filter(col("o_totalprice") > 200000).select(col("o_custkey"))
    val urgent = o.filter(col("o_orderpriority") === "1-URGENT").select(col("o_custkey"))
    val setForm = highVal.intersect(urgent).withColumn("segment", lit("high_and_urgent"))
      .unionByName(highVal.except(urgent).withColumn("segment", lit("high_only")))
      .select(col("segment"), col("o_custkey").as("custkey"))
    val oneScan = queries.AnalyticsQueries.all.find(_.name == "q27_set_ops").get
      .fn(spark, "/root/testdata/sf0.001")
    val a = setForm.collect().map(r => (r.getString(0), r.getLong(1))).toSet
    val b = oneScan.collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(a == b && a.nonEmpty)
  }

  test("graft_kmv: estimate accuracy, exact small-group path, partitioning invariance") {
    graft.functions.GraftFunctions.register(spark)
    val hashed = spark.range(20000)
      .select((col("id") % 4).as("g"), col("id"))
      // planted duplicates: each value appears twice — set semantics must dedupe
      .unionByName(spark.range(20000).select((col("id") % 4).as("g"), col("id")))
      .select(col("g"),
        expr("CAST(conv(substr(md5(CAST(id AS STRING)), 1, 15), 16, 10) AS BIGINT)")
          .as("h"))
    def run(df: org.apache.spark.sql.DataFrame) =
      df.groupBy(col("g")).agg(expr("graft_kmv(h, 128)").as("s"))
        .select(col("g"), col("s.kth_hash"), col("s.n_seen"), col("s.estimate"))
        .collect().map(r => r.getLong(0) ->
          (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    val out = run(hashed)
    out.values.foreach { case (_, n, est) =>
      assert(n == 128L)
      // 5000 distinct per group; KMV k=128 has ~9% stddev — allow 30%
      assert(math.abs(est - 5000.0) / 5000.0 < 0.30, s"estimate $est")
    }
    // bit-identical under a different partitioning (merge path re-exercised)
    assert(run(hashed.repartition(17)) == out)
    // below-k group: exact count, null kth
    val small = spark.range(50).select(lit(0L).as("g"),
      expr("CAST(conv(substr(md5(CAST(id AS STRING)), 1, 15), 16, 10) AS BIGINT)").as("h"))
    val s = small.groupBy(col("g")).agg(expr("graft_kmv(h, 128)").as("s"))
      .select(col("s.kth_hash"), col("s.n_seen"), col("s.estimate")).collect().head
    assert(s.isNullAt(0) && s.getLong(1) == 50L && s.getDouble(2) == 50.0)
  }

  test("graft_bks / sampledQuantiles: exact whole-group path, invariance, accuracy, merge rule") {
    import graft.operators.Quality
    graft.functions.GraftFunctions.register(spark)
    // 100k rows, two groups; value = a deterministic uniform-ish spread
    val df = spark.range(100000).select(
      (col("id") % 2).as("g").cast("string").as("g"),
      col("id"),
      ((col("id") * 37 % 10000).cast("double") / 100).as("v"))
    def run(d: org.apache.spark.sql.DataFrame) =
      Quality.sampledQuantiles(d, Seq("g"), "v", "id", k = 256,
        qs = Seq("p50" -> 0.5, "p90" -> 0.9))
        .collect().map(r => r.getString(0) ->
          (r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4))).toMap
    val out = run(df)
    out.values.foreach { case (n, ns, p50, p90) =>
      assert(n == 50000L && ns == 256L)
      // true p50 = ~49.99, p90 = ~89.99 on the 0..99.99 spread; a k=256
      // uniform sample's quantile stderr ~ sqrt(q(1-q)/k)·range ≈ 3.1
      assert(math.abs(p50 - 50.0) < 10.0, s"p50 $p50")
      assert(math.abs(p90 - 90.0) < 10.0, s"p90 $p90")
    }
    // mergeable: bit-identical across partitionings (partial-agg merge path)
    assert(run(df.repartition(17)) == out)
    // group sampled whole (n <= k) -> estimates EXACT vs percentile
    val small = df.filter(col("id") < 300)
    val got = run(small)
    val exact = small
      .select(col("g"), expr("CAST(round(v * 100) AS BIGINT)").as("c"))
      .groupBy("g")
      .agg(round(expr("percentile(c, 0.5D)") / 100, 6).as("p50"),
        round(expr("percentile(c, 0.9D)") / 100, 6).as("p90"))
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    got.foreach { case (g, (_, _, p50, p90)) =>
      assert((p50, p90) == exact(g), s"group $g: ($p50,$p90) vs ${exact(g)}")
    }
    // duplicate hash keeps the SMALLER value (deterministic collision rule)
    val bks = graft.functions.BottomKSample(
      org.apache.spark.sql.catalyst.expressions.BoundReference(
        0, org.apache.spark.sql.types.LongType, nullable = true),
      org.apache.spark.sql.catalyst.expressions.BoundReference(
        1, org.apache.spark.sql.types.LongType, nullable = true), 4)
    val b = bks.createAggregationBuffer()
    import org.apache.spark.sql.catalyst.InternalRow
    Seq((7L, 50L), (7L, 20L), (7L, 90L), (3L, 10L)).foreach { case (h, v) =>
      bks.update(b, InternalRow(h, v))
    }
    assert(b.size() == 2 && b.get(7L) == 20L && b.get(3L) == 10L)
    // eval orders values by hash ascending
    val row = bks.eval(b).asInstanceOf[InternalRow]
    assert(row.getLong(0) == 2L)
    assert(row.getArray(1).toLongArray.toSeq == Seq(10L, 20L))
    // sketch pass is partial-aggregated (two ObjectHashAggregate phases)
    val p = df.repartition(4)
      .select(expr("CAST(conv(substr(md5(CAST(id AS STRING)),1,15),16,10) AS BIGINT)").as("h"),
        expr("CAST(round(v*100) AS BIGINT)").as("c"))
      .agg(expr("graft_bks(h, c, 64)"))
      .queryExecution.executedPlan.toString
    assert("ObjectHashAggregate".r.findAllIn(p).size >= 2, p)
  }
}
