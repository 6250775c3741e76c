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
}
