package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.sources.Tables
import graft.operators.{Quality, Scd2}

/** Pipeline-semantics coverage: the reference's JSON ingestion (F5), SCD2
  * merge (§2.8) and data-quality suite (§2.10), each oracle-checked.
  */
object PipelineQueries {

  val all: Seq[Q] = Seq(

    // F5+F6: declared-schema JSON parsing + flatten + aggregate — mirrors the
    // Kafka batch drain (`bronze_dimension_fact_load.py:110-140`). Decimal
    // sums keep the double outputs bit-identical to the oracle.
    Q("q10_events_json",
      (s, d) => {
        val schema = StructType(Seq(StructField("k", IntegerType)))
        Tables.events(s, d)
          .withColumn("k", from_json(col("props"), schema).getField("k"))
          .groupBy(col("event_type"))
          .agg(
            count(lit(1)).as("n_events"),
            sum(col("k").cast("long")).as("sum_k"),
            sum(col("value").cast("decimal(25,10)")).cast("double").as("sum_value"),
            (sum(col("value").cast("decimal(25,10)")).cast("double") / count(lit(1))).as("avg_value"))
          .orderBy(col("event_type"))
      },
      Some("""SELECT event_type,
             CAST(COUNT(*) AS BIGINT) AS n_events,
             CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
             CAST(SUM(CAST(value AS DECIMAL(25,10))) AS DOUBLE) AS sum_value,
             CAST(SUM(CAST(value AS DECIMAL(25,10))) AS DOUBLE) / COUNT(*) AS avg_value
             FROM events GROUP BY event_type ORDER BY event_type""")),

    // §2.8: SCD2 merge on two synthesized generations of a `part`-derived
    // dimension. Gen1 = price change for key%10==0 (real change), plus a
    // no-op re-delivery for key%13==1 (hash-equal, must NOT version).
    // Deterministic row_number surrogate keys make it oracle-checkable.
    // WARNING (do not copy into production): deterministicKey is a GLOBAL
    // single-partition window — chosen here ONLY because the cross-engine
    // oracle needs reproducible keys. Production keying is
    // Scd2.scalableKey (collision-checked hash, fully parallel).
    Q("q12_scd2_merge",
      (s, d) => {
        val gen0 = Tables.part(s, d).select(
          col("p_partkey").as("part_id"), col("p_name").as("name"),
          col("p_brand").as("brand"), col("p_retailprice").as("price"))
        val target = Scd2.initialLoad(gen0, lit("1994-01-01"))
        val changedSrc = gen0.filter(col("part_id") % 10 === 0)
          .withColumn("price", col("price") + lit(100.0d))
        val noopSrc = gen0.filter(col("part_id") % 13 === 1 && col("part_id") % 10 =!= 0)
        val source = changedSrc.unionByName(noopSrc)
        val merged = Scd2.merge(target, source, "part_id",
          Seq("name", "brand", "price"), lit("1995-01-01"))
        Scd2.deterministicKey(merged, "part_id", "dim_key")
          .select(col("part_id"), col("name"), col("brand"), col("price"),
            col("start_date"), col("end_date"), col("is_current"), col("dim_key"))
          .orderBy(col("part_id"), col("start_date"))
      },
      Some("""WITH gen0 AS (
               SELECT p_partkey AS part_id, p_name AS name, p_brand AS brand,
                      p_retailprice AS price FROM part),
             src AS (
               SELECT part_id, name, brand, price + 100.0 AS price
               FROM gen0 WHERE part_id % 10 = 0
               UNION ALL
               SELECT part_id, name, brand, price
               FROM gen0 WHERE part_id % 13 = 1 AND part_id % 10 <> 0),
             changes AS (
               SELECT s.* FROM src s LEFT JOIN gen0 g ON s.part_id = g.part_id
               WHERE g.part_id IS NULL
                  OR s.name IS DISTINCT FROM g.name
                  OR s.brand IS DISTINCT FROM g.brand
                  OR s.price IS DISTINCT FROM g.price),
             merged AS (
               SELECT g.part_id, g.name, g.brand, g.price,
                      DATE '1994-01-01' AS start_date,
                      CASE WHEN c.part_id IS NULL THEN NULL
                           ELSE DATE '1995-01-01' END AS end_date,
                      c.part_id IS NULL AS is_current
               FROM gen0 g
               LEFT JOIN (SELECT DISTINCT part_id FROM changes) c
                 ON g.part_id = c.part_id
               UNION ALL
               SELECT part_id, name, brand, price, DATE '1995-01-01', NULL, TRUE
               FROM changes)
             SELECT part_id, name, brand, price, start_date, end_date, is_current,
                    CAST(row_number() OVER (ORDER BY part_id, start_date) AS BIGINT) AS dim_key
             FROM merged ORDER BY part_id, start_date""")),

    // §2.10 Q2–Q4: the whole DQ suite — completeness / min / max /
    // uniqueness / null-rate across three tables, one scan per table.
    Q("q13_dq_suite",
      (s, d) => {
        val checks = Seq(
          Quality.Completeness("lineitem", "l_orderkey", 1.0),
          Quality.MinValue("lineitem", "l_quantity", 0.0),
          Quality.MaxValue("lineitem", "l_discount", 0.11),
          Quality.NullRate("lineitem", "l_shipdate", 0.05),
          Quality.Uniqueness("orders", "o_orderkey", 1.0),
          Quality.Completeness("orders", "o_custkey", 1.0),
          Quality.MinValue("part", "p_retailprice", 0.0))
        Quality.evaluateSuite(
          Map("lineitem" -> Tables.lineitem(s, d),
              "orders" -> Tables.orders(s, d),
              "part" -> Tables.part(s, d)),
          checks)
          .orderBy(col("check_id"))
      },
      Some("""SELECT 'lineitem.completeness.l_orderkey' AS check_id,
                    CAST(SUM(CASE WHEN l_orderkey IS NOT NULL THEN 1 ELSE 0 END) AS DOUBLE) / COUNT(*) AS metric,
                    CAST(SUM(CASE WHEN l_orderkey IS NOT NULL THEN 1 ELSE 0 END) AS DOUBLE) / COUNT(*) >= 1.0 AS passed
             FROM lineitem
             UNION ALL
             SELECT 'lineitem.min.l_quantity',
                    CAST(MIN(l_quantity) AS DOUBLE),
                    CAST(MIN(l_quantity) AS DOUBLE) >= 0.0 FROM lineitem
             UNION ALL
             SELECT 'lineitem.max.l_discount',
                    CAST(MAX(l_discount) AS DOUBLE),
                    CAST(MAX(l_discount) AS DOUBLE) <= 0.11 FROM lineitem
             UNION ALL
             SELECT 'lineitem.null_rate.l_shipdate',
                    CAST(SUM(CASE WHEN l_shipdate IS NULL THEN 1 ELSE 0 END) AS DOUBLE) / COUNT(*),
                    CAST(SUM(CASE WHEN l_shipdate IS NULL THEN 1 ELSE 0 END) AS DOUBLE) / COUNT(*) <= 0.05
             FROM lineitem
             UNION ALL
             SELECT 'orders.uniqueness.o_orderkey',
                    CAST(COUNT(DISTINCT o_orderkey) AS DOUBLE) / COUNT(*),
                    CAST(COUNT(DISTINCT o_orderkey) AS DOUBLE) / COUNT(*) >= 1.0 FROM orders
             UNION ALL
             SELECT 'orders.completeness.o_custkey',
                    CAST(SUM(CASE WHEN o_custkey IS NOT NULL THEN 1 ELSE 0 END) AS DOUBLE) / COUNT(*),
                    CAST(SUM(CASE WHEN o_custkey IS NOT NULL THEN 1 ELSE 0 END) AS DOUBLE) / COUNT(*) >= 1.0
             FROM orders
             UNION ALL
             SELECT 'part.min.p_retailprice',
                    CAST(MIN(p_retailprice) AS DOUBLE),
                    CAST(MIN(p_retailprice) AS DOUBLE) >= 0.0 FROM part
             ORDER BY check_id""")),

    // S3/K6 over the graft-log DataSourceV2 (`sources/LogSource.scala`): a
    // bounded slice of `events` is PRODUCED onto a 4-partition topic through
    // the V2 batch write (key = event id, value = JSON payload, explicit
    // partition routing), then read back through the V2 scan and decoded —
    // the full Kafka produce→consume contract as one oracled roundtrip. The
    // oracle aggregates the same slice straight off parquet: any loss,
    // duplication, or byte corruption in the log path breaks the hash match.
    Q("q96_log_roundtrip",
      (s, d) => {
        val root = graft.Scratch.tempDir("graft-log-q96")
        Tables.events(s, d).filter(col("event_id") % 20 === 0)
          .select(
            col("event_id").cast("string").cast("binary").as("key"),
            to_json(struct(col("event_id"), col("event_type"), col("value")))
              .cast("binary").as("value"),
            pmod(col("event_id"), lit(4)).cast("int").as("partition"),
            col("ts").as("timestamp"))
          .write.format("graft-log").option("path", root).option("subscribe", "ev")
          .option("log.partitions", "4").mode("append").save()
        val payload = StructType(Seq(
          StructField("event_id", LongType), StructField("event_type", StringType),
          StructField("value", DoubleType)))
        s.read.format("graft-log").option("path", root).option("subscribe", "ev").load()
          .select(from_json(col("value").cast("string"), payload).as("j"))
          .select(col("j.*"))
          .groupBy(col("event_type"))
          .agg(
            count(lit(1)).as("n_events"),
            sum(col("event_id")).as("sum_id"),
            sum(col("value").cast("decimal(25,10)")).cast("double").as("sum_value"))
          .orderBy(col("event_type"))
      },
      Some("""SELECT event_type,
                    CAST(COUNT(*) AS BIGINT) AS n_events,
                    CAST(SUM(event_id) AS BIGINT) AS sum_id,
                    CAST(SUM(CAST(value AS DECIMAL(25,10))) AS DOUBLE) AS sum_value
             FROM events WHERE event_id % 20 = 0
             GROUP BY event_type ORDER BY event_type""")),

    // Beyond-reference storage layout (SURVEY §2.2 K3 + §4): z-order
    // clustering (`Scale.zorderBy`) + per-file stats manifest
    // (`pipeline/DataSkipping`) over a versioned gold publish — the
    // Delta/Iceberg data-skipping design the reference gets from Delta
    // (`gold_dim_payment.py:108-122`) rebuilt on plain parquet. The query
    // publishes a z-ordered copy of `orders`, indexes the committed
    // version, then answers a two-dimensional range predicate through the
    // skipping reader; the oracle aggregates the same predicate straight
    // off the source table, so a single wrongly-pruned file breaks the
    // hash match. File-skip effectiveness is asserted in DataSkippingSpec;
    // here the oracle pins SOUNDNESS end to end.
    Q("q97_zorder_skipping",
      (s, d) => {
        import graft.pipeline.{DataSkipping, Medallion}
        val root = graft.Scratch.tempDir("graft-q97") + "/gold_orders"
        val src = Tables.orders(s, d).select(
          col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
        val files = math.max(8, s.sparkContext.defaultParallelism)
        Medallion.publishGold(s,
          graft.operators.Scale.zorderBy(
            src, Seq("o_custkey", "o_totalprice"), files), root)
        DataSkipping.indexGoldCurrent(s, root, Seq("o_custkey", "o_totalprice"))
        DataSkipping.readGoldSkipping(s, root,
          col("o_custkey") <= lit(500L) && col("o_totalprice") > lit(150000.0d))
          .groupBy()
          .agg(count(lit(1)).as("n_orders"),
            sum(col("o_orderkey")).as("sum_key"),
            sum(col("o_totalprice").cast("decimal(18,2)")).cast("double")
              .as("sum_price"))
      },
      Some("""SELECT CAST(COUNT(*) AS BIGINT) AS n_orders,
                    CAST(SUM(o_orderkey) AS BIGINT) AS sum_key,
                    CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
             FROM orders
             WHERE o_custkey <= 500 AND o_totalprice > 150000""")),

    // Incremental aggregate-view maintenance: lineitem arrives as three
    // append batches; each one is reduced to a partial state and folded
    // into the view with the O(batch + |groups|) algebraic merge — history
    // is never re-scanned. The oracle is DuckDB's ONE-SHOT full aggregate:
    // incremental ≡ full recompute is the operator's contract.
    Q("q101_incremental_agg",
      (s, d) => {
        import graft.pipeline.IncrementalAgg
        val keys = Seq("l_returnflag", "l_linestatus")
        val ms = Seq("l_quantity", "l_extendedprice")
        val li = Tables.lineitem(s, d)
        val state = (0 until 3)
          .map(i => IncrementalAgg.partialState(
            li.filter(col("l_orderkey") % 3 === i), keys, ms))
          .reduce(IncrementalAgg.mergeState(_, _, keys, ms))
        IncrementalAgg.finalizeView(state, keys, ms)
          .orderBy(col("l_returnflag"), col("l_linestatus"))
      },
      Some("""SELECT l_returnflag, l_linestatus,
               COUNT(*) AS n_rows,
               CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_l_quantity,
               CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*)
                 AS avg_l_quantity,
               CAST(MIN(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS min_l_quantity,
               CAST(MAX(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS max_l_quantity,
               CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
                 AS sum_l_extendedprice,
               CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*)
                 AS avg_l_extendedprice,
               CAST(MIN(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
                 AS min_l_extendedprice,
               CAST(MAX(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
                 AS max_l_extendedprice
             FROM lineitem
             GROUP BY l_returnflag, l_linestatus
             ORDER BY l_returnflag, l_linestatus"""))
  )
}
