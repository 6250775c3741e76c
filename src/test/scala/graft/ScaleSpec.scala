package graft

import org.apache.spark.sql.functions._
import graft.operators.Scale

/** Scale patterns: salted ops must equal their plain counterparts; bucketed
  * joins must plan without an exchange. */
class ScaleSpec extends SparkSpec {

  private lazy val d = "/root/testdata/sf0.001"
  private lazy val orders = spark.read.parquet(s"$d/orders.parquet")
  private lazy val lineitem = spark.read.parquet(s"$d/lineitem.parquet")

  test("saltedJoin result equals plain join") {
    val l = lineitem.select(col("l_orderkey"), col("l_linenumber"), col("l_partkey"))
    val o = orders.select(col("o_orderkey").as("l_orderkey"), col("o_custkey"))
    val plain = l.join(o, Seq("l_orderkey"), "inner").count()
    val salted = Scale.saltedJoin(l, o, "l_orderkey", "l_linenumber", 8).count()
    assert(salted == plain)
  }

  test("saltedDistinctCount equals plain countDistinct per key") {
    val plain = lineitem.groupBy(col("l_returnflag"))
      .agg(countDistinct(col("l_partkey")).as("n_distinct"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val salted = Scale.saltedDistinctCount(lineitem, "l_returnflag", "l_partkey", 16)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(salted == plain)
  }

  test("spread widens an under-partitioned frame and is identity otherwise") {
    val narrow = spark.range(100).toDF("id").coalesce(1)
    val p = spark.sparkContext.defaultParallelism
    val widened = Scale.spread(narrow)
    assert(widened.rdd.getNumPartitions == p)
    assert(widened.agg(sum(col("id"))).head().getLong(0) == 4950L)
    val wide = spark.range(100).toDF("id").repartition(p)
    // already at session parallelism: no Repartition injected (same object)
    assert(Scale.spread(wide) eq wide)
  }

  test("spread: filters and column pruning push through the Repartition") {
    val docs = Scale.spread(
      spark.read.parquet(s"/root/testdata/sf0.001/documents.parquet"))
    val q = docs.filter(col("doc_id") < 10).select(col("doc_id"), col("lang"))
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [IsNotNull(doc_id), LessThan(doc_id,10)"),
      s"filter did not reach the scan:\n$plan")
    assert(!plan.contains("text"), "pruned column still read through spread")
  }

  test("bucketed join on the bucket key plans without a shuffle exchange") {
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")
    Scale.writeBucketed(orders.select(col("o_orderkey"), col("o_custkey")),
      "b_orders", "o_orderkey", 8)
    Scale.writeBucketed(
      lineitem.select(col("l_orderkey").as("o_orderkey"), col("l_quantity")),
      "b_lineitem", "o_orderkey", 8)
    val joined = spark.table("b_orders").join(spark.table("b_lineitem"), "o_orderkey")
    val plan = joined.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange hashpartitioning"))
    assert(joined.count() == lineitem.count())
  }

  /** Run `body` with the given SQL confs set, restoring prior values after —
    * the shared test session must not leak config into other suites. */
  private def withConf(confs: (String, String)*)(body: => Unit): Unit = {
    val saved = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    try { confs.foreach { case (k, v) => spark.conf.set(k, v) }; body }
    finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }

  test("AQE splits a skewed join partition (skew=true in the adaptive plan)") {
    import spark.implicits._
    withConf(
      "spark.sql.adaptive.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      "spark.sql.adaptive.coalescePartitions.enabled" -> "false",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "1.2",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "20KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "16KB",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1") {
      val pad = "x" * 128
      // 1/4 of the left rows share key 0 → one shuffle partition dwarfs the
      // median and AQE must split it instead of running one straggler task
      val left = spark.range(0, 40000)
        .select(when($"id" % 4 === 0, 0L).otherwise($"id").as("k"), lit(pad).as("pad"))
      val right = spark.range(0, 2000).select($"id".as("k"), ($"id" * 2).as("v"))
      val joined = left.join(right, "k")
      // materialize THIS dataframe's query execution (count() would plan a
      // separate one and the adaptive plan would never finalize here)
      val n = joined.collect().length
      // key 0 matches its 10k left rows; left keys 1..1999 not div by 4
      // (1500 of them) match once each
      assert(n == 10000 + 1500)
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("skew=true"), s"no skew split in plan:\n$plan")
    }
  }

  test("runtime bloom filter from the selective dim side prunes the fact scan") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("bloom").toString
    spark.range(0, 200000).select($"id".as("k"), ($"id" % 97).as("v"))
      .write.parquet(s"$dir/fact")
    spark.range(0, 5000).select($"id".as("k"), ($"id" % 7).as("cat"))
      .write.parquet(s"$dir/dim")
    withConf(
      "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "true",
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold" -> "10MB",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "1B",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1") {
      val fact = spark.read.parquet(s"$dir/fact")
      val dim = spark.read.parquet(s"$dir/dim").filter($"cat" === 3)
      val joined = fact.join(dim, "k")
      val plan = joined.queryExecution.optimizedPlan.toString
      assert(plan.contains("might_contain") && plan.contains("bloom_filter_agg"),
        s"no runtime bloom filter in plan:\n$plan")
      assert(joined.count() == 714L) // cat==3: ids 3, 10, …, 4998 → 714 dims
    }
  }
}
