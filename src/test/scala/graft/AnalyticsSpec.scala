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
}
