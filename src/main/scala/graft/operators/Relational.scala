package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Core relational operators re-expressed Spark-first.
  *
  * Each function mirrors an operator family from SURVEY.md §2 (citations into
  * /root/reference). The implementations are declarative DataFrame transforms
  * so Catalyst handles pushdown, pruning and join planning; explicit
  * `broadcast()` hints are used exactly where the reference hinted
  * (`scripts/batch/gold_fact_orders.py:114-116`).
  */
object Relational {

  /** J1 + J5 + P2 + F1 — star-schema fact assembly.
    *
    * Mirrors `scripts/batch/gold_fact_orders.py:80-128`: fact-fact inner join
    * (orders ⋈ lineitem, `:113`), three broadcast dim lookups (`:114-116`),
    * year/month/day partition-column derivation (`bronze_dimension_fact_load
    * .py:85-87`) and the final fact-grain projection (`:118-122`).
    *
    * Scale notes: the orders⋈lineitem join shuffles on orderkey (both sides
    * huge at 100 TB — correct); all three dim joins are broadcast so they add
    * no shuffle. Dims are pre-projected to the needed columns before the
    * broadcast so only the pruned columns ship to executors.
    */
  def factAssembly(orders: DataFrame, lineitem: DataFrame, part: DataFrame,
                   supplier: DataFrame, customer: DataFrame): DataFrame = {
    val p = part.select(col("p_partkey"), col("p_name"), col("p_retailprice"))
    val s = supplier.select(col("s_suppkey"), col("s_name"))
    val c = customer.select(col("c_custkey"), col("c_name"), col("c_mktsegment"))
    orders
      .join(lineitem, orders("o_orderkey") === lineitem("l_orderkey"), "inner")
      .join(broadcast(p), lineitem("l_partkey") === p("p_partkey"), "inner")
      .join(broadcast(s), lineitem("l_suppkey") === s("s_suppkey"), "inner")
      .join(broadcast(c), orders("o_custkey") === c("c_custkey"), "inner")
      .select(
        year(col("o_orderdate")).as("order_year"),
        month(col("o_orderdate")).as("order_month"),
        dayofmonth(col("o_orderdate")).as("order_day"),
        to_date(col("o_orderdate")).as("order_date"),
        col("o_orderkey").as("order_id"),
        col("l_linenumber").as("line_number"),
        col("c_custkey").as("customer_id"),
        col("c_mktsegment").as("customer_segment"),
        col("p_partkey").as("product_key"),
        col("s_suppkey").as("supplier_key"),
        col("l_quantity").as("quantity"),
        (col("l_extendedprice") * (lit(1) - col("l_discount"))).as("net_amount"))
  }

  /** J2 — left-outer dim enrichment chain.
    *
    * Mirrors `scripts/batch/silver_dimensions.py:73-77` (products ⟕
    * product_category): supplier ⟕ nation ⟕ region, disambiguated by
    * pre-projection, broadcast on the tiny lookup sides.
    */
  def dimEnrich(supplier: DataFrame, nation: DataFrame, region: DataFrame): DataFrame = {
    val n = nation.select(col("n_nationkey"), col("n_name"), col("n_regionkey"))
    val r = region.select(col("r_regionkey"), col("r_name"))
    supplier
      .join(broadcast(n), supplier("s_nationkey") === n("n_nationkey"), "left")
      .join(broadcast(r), n("n_regionkey") === r("r_regionkey"), "left")
      .select(
        col("s_suppkey").as("supplier_id"),
        col("s_name").as("supplier_name"),
        upper(col("n_name")).as("nation"),
        col("r_name").as("region"),
        col("s_acctbal").as("acct_balance"))
  }

  /** P6 + A1 — incremental load by max-timestamp watermark.
    *
    * Mirrors `bronze_dimension_fact_load.py:73-74`: the watermark is a single
    * scalar collected on the driver (`.agg(max).first()`), then applied as a
    * filter that Catalyst pushes into the parquet scan. Only two driver
    * round-trips total, independent of data size.
    */
  def watermarkCutoff(df: DataFrame, tsCol: String, lookbackDays: Int): java.sql.Timestamp = {
    // Spark 4 returns java.time.LocalDateTime when the Java-8 datetime API is
    // enabled (the default); accept either representation.
    val mx = df.agg(max(col(tsCol))).first().get(0) match {
      case t: java.sql.Timestamp      => t
      case ldt: java.time.LocalDateTime => java.sql.Timestamp.valueOf(ldt)
      case i: java.time.Instant       => java.sql.Timestamp.from(i)
      case other => throw new IllegalStateException(s"unexpected watermark type: $other")
    }
    new java.sql.Timestamp(mx.getTime - lookbackDays.toLong * 86400000L)
  }

  def incrementalSlice(df: DataFrame, tsCol: String, cutoff: java.sql.Timestamp): DataFrame =
    df.filter(col(tsCol) > lit(cutoff))

  /** P9 + P10 — conditional recode with isin/when/otherwise and casts.
    * Mirrors `silver_dimensions.py:97-105` ("null" string → real NULL) and
    * the ENUM-ish recodes.
    */
  def priorityRecode(orders: DataFrame): DataFrame =
    orders
      .withColumn("priority_clean",
        when(col("o_orderpriority").isin("4-NOT SPECIFIED"), lit(null))
          .otherwise(col("o_orderpriority")))
      .withColumn("priority_code",
        substring(col("o_orderpriority"), 1, 1).cast("int"))
      .withColumn("urgency",
        when(col("o_orderpriority").isin("1-URGENT", "2-HIGH"), lit("high"))
          .when(col("o_orderpriority") === "3-MEDIUM", lit("medium"))
          .otherwise(lit("low")))

  /** F4 + P1 — string cleaning: regexp_replace / trim / upper / extract.
    * Mirrors `silver_dimensions.py:50,103` (\r-strip regexes).
    */
  def stringClean(part: DataFrame): DataFrame =
    part.select(
      col("p_partkey"),
      upper(trim(col("p_name"))).as("name_upper"),
      regexp_replace(col("p_name"), "[aeiou]", "").as("name_novowels"),
      regexp_replace(col("p_name"), "\\s+$", "").as("name_rstrip"),
      regexp_extract(col("p_brand"), "#(\\d+)", 1).cast("int").as("brand_num"),
      concat_ws("|", col("p_brand"), col("p_type")).as("brand_type"),
      col("p_size"))

  /** U1 — positional/by-name union append.
    * Mirrors `silver_facts.py:87` (order_details ∪ accepted-suggestion rows).
    */
  def unionAppend(lineitem: DataFrame): DataFrame = {
    val base = lineitem.select(
      col("l_orderkey"), col("l_linenumber"), col("l_partkey"),
      col("l_quantity"), lit(false).as("is_suggestion"))
    val suggestions = lineitem.filter(col("l_discount") > 0.09).select(
      col("l_orderkey"), col("l_linenumber"), col("l_partkey"),
      col("l_quantity"), lit(true).as("is_suggestion"))
    base.unionByName(suggestions)
  }
}
