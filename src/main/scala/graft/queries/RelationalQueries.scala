package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.sources.Tables
import graft.operators.Relational

/** One registered query = a Spark implementation + (optionally) the
  * equivalent ANSI SQL the driver runs in DuckDB on the same parquet.
  * Column names/aliases MUST match between the two (driver sorts columns by
  * name and hash-compares values); every query ends in a deterministic
  * total ORDER BY on both sides so row order can never diverge.
  */
final case class Q(name: String,
                   fn: (SparkSession, String) => DataFrame,
                   oracle: Option[String])

/** SURVEY.md §2.1–§2.7 operator coverage: scans, projections, filters,
  * joins, aggregations, set ops, scalar functions, sorts/limits/windows.
  */
object RelationalQueries {

  val all: Seq[Q] = Seq(

    // S2+P1+P10: scan → filter → project with pushdown-friendly predicates.
    Q("q01_scan_filter_project",
      (s, d) => Tables.lineitem(s, d)
        .filter(col("l_shipdate") >= to_timestamp(lit("1995-06-01")) && col("l_quantity") > 45)
        .select(
          col("l_orderkey"), col("l_linenumber"), col("l_partkey"), col("l_quantity"),
          (col("l_extendedprice") * (lit(1) - col("l_discount"))).as("net_price"))
        .orderBy(col("l_orderkey"), col("l_linenumber")),
      Some("""SELECT l_orderkey, l_linenumber, l_partkey, l_quantity,
             l_extendedprice * (1 - l_discount) AS net_price
             FROM lineitem
             WHERE l_shipdate >= TIMESTAMP '1995-06-01' AND l_quantity > 45
             ORDER BY l_orderkey, l_linenumber""")),

    // A-series: hash aggregate with multiple measures (TPC-H Q1 shape; the
    // reference's DQ/agg ops A3–A6 generalized).
    // Money is aggregated TWO-PHASE: per-partition partial sums in exact
    // long "cents" (prices/discounts are 2-dp values, so round(x*100) is
    // their exact scaled integer), then a final merge over the tiny partial
    // frame in DECIMAL. Per-row work is integer-only (the all-decimal form
    // paid a per-row BigDecimal conversion + decimal add — measured ~2×
    // slower); overflow safety at 100 TB is preserved because a long
    // partial would need ~1e9 rows × max-price in ONE task partition to
    // overflow (ANSI would still fail loudly, never wrap) and the
    // cross-partition total — the sum that genuinely reaches ~6e20 at
    // 600B rows — is carried in DECIMAL(38). Values are bit-identical to
    // the all-decimal form: every partial is exact, the decimal merge is
    // exact, and the final double cast rounds the same exact rational.
    Q("q02_pricing_summary",
      (s, d) => {
        val partial = Tables.lineitem(s, d)
          .select(col("l_returnflag"), col("l_linestatus"), col("l_quantity"),
            expr("CAST(round(l_extendedprice * 100) AS BIGINT)").as("__pc"),
            expr("CAST(round(l_discount * 100) AS BIGINT)").as("__dc"),
            spark_partition_id().as("__pid"))
          .groupBy(col("l_returnflag"), col("l_linestatus"), col("__pid"))
          .agg(
            sum(col("l_quantity")).as("__q"),
            sum(col("__pc")).as("__p"),
            sum(expr("__pc * (100 - __dc)")).as("__dp"),
            sum(col("__dc")).as("__d"),
            count(lit(1)).as("__n"))
        partial
          .groupBy(col("l_returnflag"), col("l_linestatus"))
          .agg(
            sum(col("__q")).as("sum_qty"),
            (sum(col("__p").cast("decimal(38,0)")) / 100).cast("double").as("sum_base_price"),
            (sum(col("__dp").cast("decimal(38,0)")) / 10000).cast("double").as("sum_disc_price"),
            (sum(col("__q")) / sum(col("__n"))).as("avg_qty"),
            ((sum(col("__d").cast("decimal(38,0)")) / 100).cast("double") / sum(col("__n")))
              .as("avg_disc"),
            sum(col("__n")).as("count_order"))
          .orderBy(col("l_returnflag"), col("l_linestatus"))
      },
      Some("""SELECT l_returnflag, l_linestatus,
             SUM(l_quantity) AS sum_qty,
             CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
             CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS sum_disc_price,
             AVG(l_quantity) AS avg_qty,
             CAST(SUM(CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_disc,
             CAST(COUNT(*) AS BIGINT) AS count_order
             FROM lineitem
             GROUP BY l_returnflag, l_linestatus
             ORDER BY l_returnflag, l_linestatus""")),

    // J1+J5: the flagship fact assembly (gold_fact_orders mirror).
    Q("q03_fact_assembly",
      (s, d) => Relational.factAssembly(
          Tables.orders(s, d), Tables.lineitem(s, d), Tables.part(s, d),
          Tables.supplier(s, d), Tables.customer(s, d))
        .orderBy(col("order_id"), col("line_number")),
      Some("""SELECT CAST(year(o_orderdate) AS INTEGER) AS order_year,
             CAST(month(o_orderdate) AS INTEGER) AS order_month,
             CAST(day(o_orderdate) AS INTEGER) AS order_day,
             CAST(o_orderdate AS DATE) AS order_date,
             o_orderkey AS order_id, l_linenumber AS line_number,
             c_custkey AS customer_id, c_mktsegment AS customer_segment,
             p_partkey AS product_key, s_suppkey AS supplier_key,
             l_quantity AS quantity,
             l_extendedprice * (1 - l_discount) AS net_amount
             FROM orders
             JOIN lineitem ON o_orderkey = l_orderkey
             JOIN part ON l_partkey = p_partkey
             JOIN supplier ON l_suppkey = s_suppkey
             JOIN customer ON o_custkey = c_custkey
             ORDER BY order_id, line_number""")),

    // J2: left-outer dim enrichment chain (silver_dimensions mirror).
    Q("q04_dim_enrich",
      (s, d) => Relational.dimEnrich(
          Tables.supplier(s, d), Tables.nation(s, d), Tables.region(s, d))
        .orderBy(col("supplier_id")),
      Some("""SELECT s_suppkey AS supplier_id, s_name AS supplier_name,
             UPPER(n_name) AS nation, r_name AS region,
             s_acctbal AS acct_balance
             FROM supplier
             LEFT JOIN nation ON s_nationkey = n_nationkey
             LEFT JOIN region ON n_regionkey = r_regionkey
             ORDER BY supplier_id""")),

    // P6+A1: incremental watermark slice — scalar max collected on the
    // driver, filter pushed to the scan (bronze incremental mirror).
    Q("q05_incremental_watermark",
      (s, d) => {
        val li = Tables.lineitem(s, d)
        val cutoff = Relational.watermarkCutoff(li, "l_shipdate", 90)
        Relational.incrementalSlice(li, "l_shipdate", cutoff)
          .groupBy(to_date(col("l_shipdate")).as("ship_date"))
          .agg(count(lit(1)).as("n_lines"), sum(col("l_quantity")).as("qty"))
          .orderBy(col("ship_date"))
      },
      Some("""SELECT CAST(l_shipdate AS DATE) AS ship_date,
             CAST(COUNT(*) AS BIGINT) AS n_lines, SUM(l_quantity) AS qty
             FROM lineitem
             WHERE l_shipdate > (SELECT MAX(l_shipdate) - INTERVAL 90 DAY FROM lineitem)
             GROUP BY 1 ORDER BY ship_date""")),

    // P9+P10: isin/when/otherwise recode + casts ("null"-string cleanup mirror).
    Q("q06_priority_recode",
      (s, d) => Relational.priorityRecode(Tables.orders(s, d))
        .groupBy(col("urgency"), col("priority_clean"), col("priority_code"))
        .agg(count(lit(1)).as("n_orders"))
        .orderBy(col("urgency"), col("priority_code")),
      Some("""SELECT CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH') THEN 'high'
                    WHEN o_orderpriority = '3-MEDIUM' THEN 'medium'
                    ELSE 'low' END AS urgency,
             CASE WHEN o_orderpriority IN ('4-NOT SPECIFIED') THEN NULL
                  ELSE o_orderpriority END AS priority_clean,
             CAST(substr(o_orderpriority, 1, 1) AS INTEGER) AS priority_code,
             CAST(COUNT(*) AS BIGINT) AS n_orders
             FROM orders GROUP BY 1, 2, 3 ORDER BY urgency, priority_code""")),

    // F4+P1: string-cleaning battery (regexp_replace / extract / concat_ws).
    Q("q07_string_clean",
      (s, d) => Relational.stringClean(Tables.part(s, d)).orderBy(col("p_partkey")),
      Some("""SELECT p_partkey,
             UPPER(TRIM(p_name)) AS name_upper,
             regexp_replace(p_name, '[aeiou]', '', 'g') AS name_novowels,
             regexp_replace(p_name, '\s+$', '') AS name_rstrip,
             CAST(regexp_extract(p_brand, '#(\d+)', 1) AS INTEGER) AS brand_num,
             concat_ws('|', p_brand, p_type) AS brand_type,
             p_size
             FROM part ORDER BY p_partkey""")),

    // U1: union-by-name append (silver_facts suggestion-append mirror).
    Q("q08_union_append",
      (s, d) => Relational.unionAppend(Tables.lineitem(s, d))
        .orderBy(col("l_orderkey"), col("l_linenumber"), col("is_suggestion")),
      Some("""SELECT l_orderkey, l_linenumber, l_partkey, l_quantity,
             FALSE AS is_suggestion FROM lineitem
             UNION ALL
             SELECT l_orderkey, l_linenumber, l_partkey, l_quantity,
             TRUE AS is_suggestion FROM lineitem WHERE l_discount > 0.09
             ORDER BY l_orderkey, l_linenumber, is_suggestion""")),

    // A4+Q3: duplicate detection — groupBy/count/HAVING (bronze_validation mirror).
    Q("q09_dup_detection",
      (s, d) => Tables.orders(s, d)
        .groupBy(col("o_custkey")).agg(count(lit(1)).as("n"))
        .filter(col("n") > 1)
        .orderBy(col("o_custkey")),
      Some("""SELECT o_custkey, CAST(COUNT(*) AS BIGINT) AS n
             FROM orders GROUP BY o_custkey HAVING COUNT(*) > 1
             ORDER BY o_custkey""")),

    // A5: exact distinct-count / uniqueness ratio (silver_validation mirror).
    Q("q11_uniqueness_ratio",
      (s, d) => Tables.orders(s, d).agg(
          count(lit(1)).as("total_rows"),
          countDistinct(col("o_orderkey")).as("distinct_keys"),
          countDistinct(col("o_custkey")).as("distinct_custs"))
        .select(col("total_rows"), col("distinct_keys"), col("distinct_custs"),
          round(col("distinct_keys").cast("double") / col("total_rows"), 6).as("uniqueness")),
      Some("""SELECT CAST(COUNT(*) AS BIGINT) AS total_rows,
             CAST(COUNT(DISTINCT o_orderkey) AS BIGINT) AS distinct_keys,
             CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS distinct_custs,
             ROUND(CAST(COUNT(DISTINCT o_orderkey) AS DOUBLE) / COUNT(*), 6) AS uniqueness
             FROM orders""")),

    // Sorts/limits (§2.11 gap, implemented as first-class): top-k with
    // deterministic tiebreak. TakeOrderedAndProject at the physical level —
    // no global sort materialization.
    Q("q16_topk_orders",
      (s, d) => Tables.orders(s, d)
        .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice").as("total"),
          to_date(col("o_orderdate")).as("order_date"))
        .orderBy(col("total").desc, col("o_orderkey"))
        .limit(100),
      Some("""SELECT o_orderkey, o_custkey, o_totalprice AS total,
             CAST(o_orderdate AS DATE) AS order_date
             FROM orders ORDER BY total DESC, o_orderkey LIMIT 100""")),

    // Window functions (§2.11 gap): ranking + running aggregate frames.
    Q("q17_window_analytics",
      (s, d) => {
        val w = Window.partitionBy(col("o_custkey"))
          .orderBy(col("o_orderdate"), col("o_orderkey"))
        Tables.orders(s, d)
          .select(
            col("o_custkey"), col("o_orderkey"),
            row_number().over(w).as("order_seq"),
            sum(col("o_totalprice").cast("decimal(18,2)")).over(
              w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
              .cast("double").as("running_spend"),
            lag(col("o_totalprice"), 1, 0.0).over(w).as("prev_total"))
          .orderBy(col("o_custkey"), col("order_seq"))
      },
      Some("""SELECT o_custkey, o_orderkey,
             CAST(row_number() OVER w AS INTEGER) AS order_seq,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER (w ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_spend,
             lag(o_totalprice, 1, 0.0) OVER w AS prev_total
             FROM orders
             WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
             ORDER BY o_custkey, order_seq"""))
  )
}
