package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.sources.Tables

/** Analytics-surface completion beyond the reference (SURVEY.md §2.11 lists
  * these as absent there): rollup/cube multi-level aggregation, set
  * operations, and approximate sketch aggregates.
  */
object AnalyticsQueries {

  val all: Seq[Q] = Seq(

    // ROLLUP: region → nation → total revenue hierarchy in one pass
    // (grouping-sets shuffle is a single exchange; each level map-combines).
    // lineitem is pre-aggregated to (orderkey, n, revenue) BEFORE the orders
    // join: the fact-side shuffle then carries one row per order instead of
    // one per line (~4× fewer bytes), and the orders join reuses the
    // pre-agg's orderkey partitioning — the shrink that matters identically
    // at 100 TB, where neither side is broadcastable.
    Q("q26_rollup_revenue",
      (s, d) => {
        val li = Tables.lineitem(s, d)
        val o = Tables.orders(s, d).select(col("o_orderkey"), col("o_custkey"))
        val r = Tables.region(s, d).select(col("r_regionkey"), col("r_name"))
        // q02's two-phase money trick: the 600k-row pre-agg sums exact long
        // cents (pure integer codegen); only the per-order partials — 4×
        // fewer rows — are widened to DECIMAL at the rollup, where the
        // 100 TB-scale total genuinely needs 38 digits.
        val liAgg = li.groupBy(col("l_orderkey"))
          .agg(
            count(lit(1)).as("__n"),
            sum(expr("CAST(round(l_extendedprice * 100) AS BIGINT)")).as("__revc"))
        liAgg.join(o, col("l_orderkey") === col("o_orderkey"))
          .join(broadcast(Tables.customer(s, d)
            .select(col("c_custkey"), col("c_nationkey"))),
            col("o_custkey") === col("c_custkey"))
          .join(broadcast(Tables.nation(s, d)
            .select(col("n_nationkey"), col("n_name"), col("n_regionkey"))),
            col("c_nationkey") === col("n_nationkey"))
          .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
          .rollup(col("r_name"), col("n_name"))
          .agg(
            sum(col("__n")).as("n_lines"),
            (sum(col("__revc").cast("decimal(38,0)")) / 100).cast("double").as("revenue"))
          .select(col("r_name"), col("n_name"), col("n_lines"), col("revenue"))
          .orderBy(col("r_name").asc_nulls_first, col("n_name").asc_nulls_first)
      },
      Some("""SELECT r_name, n_name, CAST(COUNT(*) AS BIGINT) AS n_lines,
                    CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
             FROM lineitem
             JOIN orders ON l_orderkey = o_orderkey
             JOIN customer ON o_custkey = c_custkey
             JOIN nation ON c_nationkey = n_nationkey
             JOIN region ON n_regionkey = r_regionkey
             GROUP BY ROLLUP (r_name, n_name)
             ORDER BY r_name NULLS FIRST, n_name NULLS FIRST""")),

    // CUBE: all 2^2 grouping combinations of (priority, year) in one
    // grouping-sets pass — completes the rollup/cube pair with q26.
    Q("q39_cube_revenue",
      (s, d) => Tables.orders(s, d)
        .withColumn("yr", year(col("o_orderdate")))
        .cube(col("o_orderpriority"), col("yr"))
        .agg(
          count(lit(1)).as("n_orders"),
          sum(col("o_totalprice").cast("decimal(18,2)")).cast("double").as("revenue"))
        .select(col("o_orderpriority"), col("yr"), col("n_orders"), col("revenue"))
        .orderBy(col("o_orderpriority").asc_nulls_first, col("yr").asc_nulls_first),
      Some("""SELECT o_orderpriority, CAST(year(o_orderdate) AS INTEGER) AS yr,
                    CAST(COUNT(*) AS BIGINT) AS n_orders,
                    CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
             FROM orders
             GROUP BY CUBE (o_orderpriority, year(o_orderdate))
             ORDER BY o_orderpriority NULLS FIRST, yr NULLS FIRST""")),

    // Customer segmentation with INTERSECT/EXCEPT semantics, computed as ONE
    // scan + ONE shuffle: groupBy(custkey) with two conditional max flags
    // derives both segments, where the literal intersect/except plan scans
    // orders four times and shuffles per set-op (the operators themselves are
    // covered by AnalyticsSpec, which asserts this plan ≡ the set-op form).
    Q("q27_set_ops",
      (s, d) => Tables.orders(s, d)
        .groupBy(col("o_custkey"))
        .agg(
          max(when(col("o_totalprice") > 200000, 1).otherwise(0)).as("__hv"),
          max(when(col("o_orderpriority") === "1-URGENT", 1).otherwise(0)).as("__ur"))
        .filter(col("__hv") === 1)
        .select(
          when(col("__ur") === 1, lit("high_and_urgent"))
            .otherwise(lit("high_only")).as("segment"),
          col("o_custkey").as("custkey"))
        .orderBy(col("segment"), col("custkey")),
      Some("""WITH hv AS (SELECT o_custkey FROM orders WHERE o_totalprice > 200000),
                  ur AS (SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT')
             SELECT 'high_and_urgent' AS segment, o_custkey AS custkey
             FROM (SELECT o_custkey FROM hv INTERSECT SELECT o_custkey FROM ur)
             UNION ALL
             SELECT 'high_only', o_custkey
             FROM (SELECT o_custkey FROM hv EXCEPT SELECT o_custkey FROM ur)
             ORDER BY segment, custkey""")),

    // PIVOT: order-priority revenue matrix by year (explicit value list →
    // deterministic columns; one hash-agg pass, no per-value scans).
    Q("q33_pivot_revenue",
      (s, d) => {
        val vals = Seq("1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW")
        val names = Seq("urgent", "high", "medium", "notspec", "low")
        val pivoted = Tables.orders(s, d)
          .withColumn("yr", year(col("o_orderdate")))
          .groupBy(col("yr"))
          .pivot("o_orderpriority", vals)
          .agg(sum(col("o_totalprice").cast("decimal(18,2)")).cast("double"))
        vals.zip(names).foldLeft(pivoted) { case (df, (v, n)) =>
          df.withColumnRenamed(v, n)
        }.orderBy(col("yr"))
      },
      Some("""SELECT CAST(year(o_orderdate) AS INTEGER) AS yr,
                CAST(SUM(CASE WHEN o_orderpriority = '1-URGENT' THEN CAST(o_totalprice AS DECIMAL(18,2)) END) AS DOUBLE) AS urgent,
                CAST(SUM(CASE WHEN o_orderpriority = '2-HIGH' THEN CAST(o_totalprice AS DECIMAL(18,2)) END) AS DOUBLE) AS high,
                CAST(SUM(CASE WHEN o_orderpriority = '3-MEDIUM' THEN CAST(o_totalprice AS DECIMAL(18,2)) END) AS DOUBLE) AS medium,
                CAST(SUM(CASE WHEN o_orderpriority = '4-NOT SPECIFIED' THEN CAST(o_totalprice AS DECIMAL(18,2)) END) AS DOUBLE) AS notspec,
                CAST(SUM(CASE WHEN o_orderpriority = '5-LOW' THEN CAST(o_totalprice AS DECIMAL(18,2)) END) AS DOUBLE) AS low
             FROM orders GROUP BY 1 ORDER BY yr""")),

    // EXACT quantiles (the companion to q28's sketches): interpolated
    // percentile over the full sorted distribution. Quantities are
    // integer-valued, and results are rounded to 6 decimals pre-compare so
    // the one interpolation multiply can't diverge by an ulp across
    // engines (Spark percentile ≡ DuckDB quantile_cont definition).
    Q("q44_exact_quantiles",
      (s, d) => Tables.lineitem(s, d)
        .groupBy(col("l_returnflag"))
        .agg(
          round(expr("percentile(l_quantity, 0.5)"), 6).as("median_qty"),
          round(expr("percentile(l_quantity, 0.9)"), 6).as("p90_qty"),
          round(expr("percentile(l_quantity, 0.99)"), 6).as("p99_qty"),
          count(lit(1)).as("n_lines"))
        .orderBy(col("l_returnflag")),
      Some("""SELECT l_returnflag,
                    ROUND(quantile_cont(l_quantity, 0.5), 6) AS median_qty,
                    ROUND(quantile_cont(l_quantity, 0.9), 6) AS p90_qty,
                    ROUND(quantile_cont(l_quantity, 0.99), 6) AS p99_qty,
                    CAST(COUNT(*) AS BIGINT) AS n_lines
             FROM lineitem GROUP BY 1 ORDER BY l_returnflag""")),

    // Approximate sketches, built from DETERMINISTIC primitives so the
    // approximations themselves are oracled (the judge-graded alternative
    // to Spark's approx_count_distinct / percentile_approx, whose HLL/KLL
    // internals are implementation-defined and can never value-match
    // another engine): distinct orders via the native graft_kmv
    // TypedImperativeAggregate at k=128 (q74 oracles the same sketch at
    // k=256), and p50/p99 price via an equi-width histogram sketch —
    // exact integer $100-cent bins, cumulative counts, first bin reaching
    // ceil(q·n), midpoint estimate. Both are one map-side-combining
    // aggregate over the corpus; the quantile windows run on the tiny
    // per-flag bin frame, never on rows.
    Q("q28_sketches",
      (s, d) => {
        graft.functions.GraftFunctions.register(s)
        val li = Tables.lineitem(s, d)
        val kmv = li
          .select(col("l_returnflag"),
            expr("CAST(conv(substr(md5(CAST(l_orderkey AS STRING)), 1, 15), 16, 10) AS BIGINT)")
              .as("__h"))
          .groupBy(col("l_returnflag"))
          .agg(expr("graft_kmv(__h, 128)").as("__s"))
          .select(col("l_returnflag"), col("__s.estimate").as("kmv_orders"))
        val binned = li
          .select(col("l_returnflag"),
            expr("CAST(round(l_extendedprice * 100) AS BIGINT) div 10000L").as("__bin"))
          .groupBy(col("l_returnflag"), col("__bin"))
          .agg(count(lit(1)).as("__c"))
        val wCum = Window.partitionBy(col("l_returnflag")).orderBy(col("__bin"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val wAll = Window.partitionBy(col("l_returnflag"))
        val hist = binned
          .withColumn("__cum", sum(col("__c")).over(wCum))
          .withColumn("__n", sum(col("__c")).over(wAll))
          .groupBy(col("l_returnflag"))
          .agg(
            min(when(col("__cum") >= ceil(col("__n") * 0.5), col("__bin"))).as("__b50"),
            min(when(col("__cum") >= ceil(col("__n") * 0.99), col("__bin"))).as("__b99"))
          .select(col("l_returnflag"),
            ((col("__b50") * 10000L + 5000L).cast("double") / 100).as("p50_price"),
            ((col("__b99") * 10000L + 5000L).cast("double") / 100).as("p99_price"))
        kmv.join(hist, "l_returnflag").orderBy(col("l_returnflag"))
      },
      Some("""WITH hx AS (
               SELECT l_returnflag AS g,
                 substr(md5(CAST(l_orderkey AS VARCHAR)), 1, 15) AS h
               FROM lineitem),
             dh AS (SELECT DISTINCT g, h FROM hx),
             hv AS (SELECT g,
                      CAST(list_sum(list_transform(range(1, 16),
                        i -> (CAST(strpos('0123456789abcdef',
                                substr(h, CAST(i AS INT), 1)) - 1 AS BIGINT)
                             << CAST(4 * (15 - i) AS INT)))) AS BIGINT) AS v
                    FROM dh),
             rk AS (SELECT g, v,
                      row_number() OVER (PARTITION BY g ORDER BY v) AS rk
                    FROM hv),
             ag AS (SELECT g, MAX(CASE WHEN rk = 128 THEN v END) AS kth_hash,
                      CAST(COUNT(*) AS BIGINT) AS n_seen
                    FROM rk WHERE rk <= 128 GROUP BY g),
             km AS (SELECT g,
                      CASE WHEN n_seen < 128 THEN CAST(n_seen AS DOUBLE)
                           ELSE CAST(127 AS DOUBLE) * 1152921504606846976.0
                                / CAST(kth_hash AS DOUBLE)
                      END AS kmv_orders
                    FROM ag),
             b AS (SELECT l_returnflag AS g,
                     CAST(round(l_extendedprice * 100) AS BIGINT) // 10000 AS bin
                   FROM lineitem),
             bc AS (SELECT g, bin, CAST(COUNT(*) AS BIGINT) AS c
                    FROM b GROUP BY 1, 2),
             cm AS (SELECT g, bin,
                      SUM(c) OVER (PARTITION BY g ORDER BY bin
                        ROWS UNBOUNDED PRECEDING) AS cum,
                      SUM(c) OVER (PARTITION BY g) AS n
                    FROM bc),
             h2 AS (SELECT g,
                      MIN(CASE WHEN cum >= CAST(ceil(n * 0.5) AS BIGINT)
                        THEN bin END) AS b50,
                      MIN(CASE WHEN cum >= CAST(ceil(n * 0.99) AS BIGINT)
                        THEN bin END) AS b99
                    FROM cm GROUP BY g)
             SELECT km.g AS l_returnflag, km.kmv_orders,
               CAST(h2.b50 * 10000 + 5000 AS DOUBLE) / 100 AS p50_price,
               CAST(h2.b99 * 10000 + 5000 AS DOUBLE) / 100 AS p99_price
             FROM km JOIN h2 ON h2.g = km.g ORDER BY l_returnflag""")),

    // Equi-width price histogram in exact integer cents ($1000 bins).
    Q("q73_price_histogram",
      (s, d) => graft.operators.Quality.histogramCents(Tables.lineitem(s, d),
          "l_extendedprice", binWidthCents = 100000L)
        .orderBy(col("bin")),
      Some("""WITH b AS (
               SELECT CAST(round(l_extendedprice * 100) AS BIGINT) // 100000
                 AS bin
               FROM lineitem)
             SELECT bin, CAST(bin * 100000 AS DOUBLE) / 100 AS lo,
               CAST((bin + 1) * 100000 AS DOUBLE) / 100 AS hi,
               CAST(COUNT(*) AS BIGINT) AS n_rows
             FROM b GROUP BY bin ORDER BY bin""")),

    // KMV distinct sketch (native TypedImperativeAggregate, graft_kmv):
    // md5-derived hashes make the approximation a pure function of the
    // input set, so — unlike HLL — the sketch itself is oracled, estimate
    // included, next to the exact count.
    Q("q74_kmv_sketch",
      (s, d) => {
        graft.functions.GraftFunctions.register(s)
        Tables.lineitem(s, d)
          .select(col("l_returnflag"), col("l_orderkey"),
            expr("CAST(conv(substr(md5(CAST(l_orderkey AS STRING)), 1, 15), 16, 10) AS BIGINT)")
              .as("__h"))
          .groupBy(col("l_returnflag"))
          .agg(expr("graft_kmv(__h, 256)").as("__s"),
            countDistinct(col("l_orderkey")).as("n_exact"))
          .select(col("l_returnflag"), col("__s.kth_hash").as("kth_hash"),
            col("__s.n_seen").as("n_seen"), col("__s.estimate").as("estimate"),
            col("n_exact"))
          .orderBy(col("l_returnflag"))
      },
      Some("""WITH hx AS (
               SELECT l_returnflag AS g,
                 substr(md5(CAST(l_orderkey AS VARCHAR)), 1, 15) AS h
               FROM lineitem),
             dh AS (SELECT DISTINCT g, h FROM hx),
             hv AS (SELECT g,
                      CAST(list_sum(list_transform(range(1, 16),
                        i -> (CAST(strpos('0123456789abcdef',
                                substr(h, CAST(i AS INT), 1)) - 1 AS BIGINT)
                             << CAST(4 * (15 - i) AS INT)))) AS BIGINT) AS v
                    FROM dh),
             rk AS (SELECT g, v,
                      row_number() OVER (PARTITION BY g ORDER BY v) AS rk
                    FROM hv),
             ag AS (SELECT g, MAX(CASE WHEN rk = 256 THEN v END) AS kth_hash,
                      CAST(COUNT(*) AS BIGINT) AS n_seen
                    FROM rk WHERE rk <= 256 GROUP BY g),
             ex AS (SELECT l_returnflag AS g,
                      CAST(COUNT(DISTINCT l_orderkey) AS BIGINT) AS n_exact
                    FROM lineitem GROUP BY 1)
             SELECT ag.g AS l_returnflag, ag.kth_hash, ag.n_seen,
               CASE WHEN ag.n_seen < 256 THEN CAST(ag.n_seen AS DOUBLE)
                    ELSE CAST(255 AS DOUBLE) * 1152921504606846976.0
                         / CAST(ag.kth_hash AS DOUBLE)
               END AS estimate,
               ex.n_exact
             FROM ag JOIN ex ON ex.g = ag.g ORDER BY l_returnflag""")),

    // Robust outliers per return flag: |x − median| / MAD at 3.5 —
    // medians/MADs are exact interpolated percentiles (round-6).
    Q("q78_robust_outliers",
      // fixed-point (cents-histogram) percentile path: l_extendedprice is
      // 2-dp money, so the exact median/MAD read off a (flag, cents)
      // histogram + cumulative window instead of percentile's per-group
      // value-multiset buffering — same round-6 values (QualitySpec pins
      // equality with the generic path), distributed state bounded by
      // distinct cents rather than rows
      (s, d) => graft.operators.Quality.robustOutliersFixedPoint(
          Tables.lineitem(s, d).select(col("l_returnflag"), col("l_extendedprice")),
          "l_returnflag", "l_extendedprice", threshold = 3.5)
        .orderBy(col("l_returnflag"), col("l_extendedprice")),
      Some("""WITH med AS (
               SELECT l_returnflag AS g,
                 round(quantile_cont(l_extendedprice, 0.5), 6) AS med
               FROM lineitem GROUP BY 1),
             wm AS (
               SELECT l.l_returnflag AS g, l.l_extendedprice AS v, m.med
               FROM lineitem l JOIN med m ON m.g = l.l_returnflag),
             mad AS (
               SELECT g, round(quantile_cont(abs(v - med), 0.5), 6) AS mad
               FROM wm GROUP BY g)
             SELECT wm.g AS l_returnflag, wm.v AS l_extendedprice,
               wm.med, mad.mad,
               CASE WHEN mad.mad > 0 THEN (wm.v - wm.med) / mad.mad END
                 AS robust_z,
               COALESCE(abs(CASE WHEN mad.mad > 0
                 THEN (wm.v - wm.med) / mad.mad END) > 3.5, false) AS is_outlier
             FROM wm JOIN mad USING (g)
             ORDER BY l_returnflag, l_extendedprice""")),

    // One-pass Pearson correlation matrix over the lineitem measures:
    // every moment for all 6 pairs comes out of a single map-side-combining
    // aggregate (exact DECIMAL(38) integer sums — Σx² overflows BIGINT at
    // real scale); the correlations are a fixed IEEE sequence on those
    // exact sums, round-6 stable.
    Q("q85_correlation_matrix",
      (s, d) => graft.operators.Quality.correlationMatrix(
        Tables.lineitem(s, d),
        Seq("l_quantity" -> 1L, "l_extendedprice" -> 100L,
            "l_discount" -> 100L, "l_tax" -> 100L)),
      Some("""WITH q AS (
               SELECT CAST(round(l_quantity * 1) AS BIGINT) AS xq,
                 CAST(round(l_extendedprice * 100) AS BIGINT) AS xe,
                 CAST(round(l_discount * 100) AS BIGINT) AS xd,
                 CAST(round(l_tax * 100) AS BIGINT) AS xt
               FROM lineitem),
             m AS (
               SELECT CAST(COUNT(*) AS DOUBLE) AS n,
                 CAST(SUM(CAST(xq AS HUGEINT)) AS DOUBLE) AS s_q,
                 CAST(SUM(CAST(xe AS HUGEINT)) AS DOUBLE) AS s_e,
                 CAST(SUM(CAST(xd AS HUGEINT)) AS DOUBLE) AS s_d,
                 CAST(SUM(CAST(xt AS HUGEINT)) AS DOUBLE) AS s_t,
                 CAST(SUM(CAST(xq AS HUGEINT) * xq) AS DOUBLE) AS ss_q,
                 CAST(SUM(CAST(xe AS HUGEINT) * xe) AS DOUBLE) AS ss_e,
                 CAST(SUM(CAST(xd AS HUGEINT) * xd) AS DOUBLE) AS ss_d,
                 CAST(SUM(CAST(xt AS HUGEINT) * xt) AS DOUBLE) AS ss_t,
                 CAST(SUM(CAST(xq AS HUGEINT) * xe) AS DOUBLE) AS sp_q_e,
                 CAST(SUM(CAST(xq AS HUGEINT) * xd) AS DOUBLE) AS sp_q_d,
                 CAST(SUM(CAST(xq AS HUGEINT) * xt) AS DOUBLE) AS sp_q_t,
                 CAST(SUM(CAST(xe AS HUGEINT) * xd) AS DOUBLE) AS sp_e_d,
                 CAST(SUM(CAST(xe AS HUGEINT) * xt) AS DOUBLE) AS sp_e_t,
                 CAST(SUM(CAST(xd AS HUGEINT) * xt) AS DOUBLE) AS sp_d_t
               FROM q)
             SELECT col_x, col_y, corr FROM (
               SELECT 'l_quantity' AS col_x, 'l_extendedprice' AS col_y,
                 round((n * sp_q_e - s_q * s_e) /
                   (sqrt(n * ss_q - s_q * s_q) * sqrt(n * ss_e - s_e * s_e)), 6) AS corr
               FROM m
               UNION ALL SELECT 'l_quantity', 'l_discount',
                 round((n * sp_q_d - s_q * s_d) /
                   (sqrt(n * ss_q - s_q * s_q) * sqrt(n * ss_d - s_d * s_d)), 6) FROM m
               UNION ALL SELECT 'l_quantity', 'l_tax',
                 round((n * sp_q_t - s_q * s_t) /
                   (sqrt(n * ss_q - s_q * s_q) * sqrt(n * ss_t - s_t * s_t)), 6) FROM m
               UNION ALL SELECT 'l_extendedprice', 'l_discount',
                 round((n * sp_e_d - s_e * s_d) /
                   (sqrt(n * ss_e - s_e * s_e) * sqrt(n * ss_d - s_d * s_d)), 6) FROM m
               UNION ALL SELECT 'l_extendedprice', 'l_tax',
                 round((n * sp_e_t - s_e * s_t) /
                   (sqrt(n * ss_e - s_e * s_e) * sqrt(n * ss_t - s_t * s_t)), 6) FROM m
               UNION ALL SELECT 'l_discount', 'l_tax',
                 round((n * sp_d_t - s_d * s_t) /
                   (sqrt(n * ss_d - s_d * s_d) * sqrt(n * ss_t - s_t * s_t)), 6) FROM m)
             ORDER BY col_x, col_y""")),

    // Benford first-digit audit of the money column: expected shares are
    // shared engine-independent literals; deviations fix-point to integer
    // micros so the headline total is an exact integer sum.
    Q("q88_benford_audit",
      (s, d) => graft.operators.Quality.benfordAudit(
        Tables.lineitem(s, d), "l_extendedprice"),
      Some(s"""WITH dg AS (
               SELECT CAST(substr(CAST(CAST(round(l_extendedprice * 100) AS BIGINT)
                 AS VARCHAR), 1, 1) AS INTEGER) AS digit
               FROM lineitem
               WHERE CAST(round(l_extendedprice * 100) AS BIGINT) > 0),
             g AS (SELECT digit, CAST(COUNT(*) AS BIGINT) AS n_obs
                   FROM dg GROUP BY digit),
             e(digit, exp_share) AS (VALUES
               ${graft.operators.Quality.benfordExpected
                 .map { case (dd, ee) => s"($dd, CAST($ee AS DOUBLE))" }
                 .mkString(", ")}),
             t AS (
               SELECT g.digit, g.n_obs,
                 CAST(g.n_obs AS DOUBLE) / CAST(SUM(g.n_obs) OVER () AS DOUBLE)
                   AS obs_share,
                 e.exp_share
               FROM g JOIN e USING (digit)),
             t2 AS (
               SELECT digit, n_obs, obs_share, exp_share,
                 CAST(round(abs(obs_share - exp_share) * 1e6) AS BIGINT)
                   AS dev_micros
               FROM t)
             SELECT digit, n_obs, round(obs_share, 6) AS obs_share, exp_share,
               dev_micros,
               CAST(SUM(dev_micros) OVER () AS BIGINT) AS total_dev_micros
             FROM t2 ORDER BY digit""")),

    // PSI distribution drift between two corpus snapshots on the
    // token-count feature: smoothed shares, integer-micros ln terms, exact
    // integer total (the q79/q55 fixed-pointing recipe).
    Q("q87_psi_drift",
      (s, d) => {
        val toks = Tables.documents(s, d).select(col("doc_id"),
          size(split(trim(lower(col("text"))), "\\s+")).as("n_toks"))
        graft.operators.Quality.psiDrift(
          toks.filter(col("doc_id") % 2 === 0),
          toks.filter(col("doc_id") % 2 === 1),
          "n_toks", binWidth = 8L, nBins = 10)
      },
      Some("""WITH tk AS (
               SELECT doc_id,
                 CAST(len(string_split_regex(trim(lower(text)), '\s+')) AS BIGINT)
                   AS n_toks
               FROM documents),
             a AS (SELECT GREATEST(LEAST(n_toks // 8, 9), 0) AS bin,
                     CAST(COUNT(*) AS BIGINT) AS c_a
                   FROM tk WHERE doc_id % 2 = 0 GROUP BY 1),
             b AS (SELECT GREATEST(LEAST(n_toks // 8, 9), 0) AS bin,
                     CAST(COUNT(*) AS BIGINT) AS c_b
                   FROM tk WHERE doc_id % 2 = 1 GROUP BY 1),
             bins AS (SELECT CAST(range AS BIGINT) AS bin FROM range(10)),
             j AS (SELECT bin, COALESCE(c_a, 0) AS c_a, COALESCE(c_b, 0) AS c_b
                   FROM bins LEFT JOIN a USING (bin) LEFT JOIN b USING (bin)),
             w AS (SELECT bin, c_a, c_b,
                     CAST(SUM(c_a) OVER () AS BIGINT) AS na,
                     CAST(SUM(c_b) OVER () AS BIGINT) AS nb
                   FROM j),
             t AS (SELECT bin, c_a, c_b,
                     CAST(c_a + 1 AS DOUBLE) / CAST(na + 10 AS DOUBLE) AS p,
                     CAST(c_b + 1 AS DOUBLE) / CAST(nb + 10 AS DOUBLE) AS q,
                     ln(CAST((c_a + 1) * (nb + 10) AS DOUBLE)
                        / CAST((c_b + 1) * (na + 10) AS DOUBLE)) AS lnr
                   FROM w),
             t2 AS (SELECT bin, c_a, c_b, round(p, 6) AS p_a, round(q, 6) AS p_b,
                      CAST(round((p - q) * lnr * 1e6) AS BIGINT)
                        AS psi_term_micros
                    FROM t)
             SELECT bin, c_a, c_b, p_a, p_b, psi_term_micros,
               CAST(SUM(psi_term_micros) OVER () AS BIGINT) AS psi_total_micros
             FROM t2 ORDER BY bin""")),

    // Sample-sketched quantiles: the sampling member of the sketch family
    // (KMV q74 = distinct, Misra–Gries q95 = frequency, bottom-k = any
    // order statistic) — quantile estimates from the k rows with the
    // smallest md5 hashes, one O(k)-state mergeable pass instead of exact
    // percentile's collect-and-sort per group. The sample is a pure
    // function of the input set, so the oracle re-derives the IDENTICAL k
    // rows (rank by fixed-width hex = rank by value) and interpolation.
    Q("q102_sample_quantiles",
      (s, d) => {
        graft.functions.GraftFunctions.register(s)
        graft.operators.Quality.sampledQuantiles(
            Tables.lineitem(s, d), Seq("l_returnflag"), "l_extendedprice",
            "concat(l_orderkey, '-', l_linenumber)", k = 64,
            qs = Seq("p50_price" -> 0.5, "p90_price" -> 0.9))
          .orderBy(col("l_returnflag"))
      },
      Some("""WITH hx AS (
               SELECT l_returnflag AS g,
                 substr(md5(CAST(l_orderkey AS VARCHAR) || '-'
                            || CAST(l_linenumber AS VARCHAR)), 1, 15) AS h,
                 CAST(round(l_extendedprice * 100) AS BIGINT) AS c
               FROM lineitem),
             dh AS (SELECT g, h, MIN(c) AS c FROM hx GROUP BY g, h),
             rk AS (SELECT g, c,
                      row_number() OVER (PARTITION BY g ORDER BY h) AS rk
                    FROM dh),
             smp AS (SELECT g, c FROM rk WHERE rk <= 64),
             ag AS (SELECT g, CAST(COUNT(*) AS BIGINT) AS n_sampled,
                      ROUND(quantile_cont(c, 0.5) / 100, 6) AS p50_price,
                      ROUND(quantile_cont(c, 0.9) / 100, 6) AS p90_price
                    FROM smp GROUP BY g),
             nn AS (SELECT l_returnflag AS g, CAST(COUNT(*) AS BIGINT) AS n_rows
                    FROM lineitem GROUP BY 1)
             SELECT nn.g AS l_returnflag, nn.n_rows, ag.n_sampled,
               ag.p50_price, ag.p90_price
             FROM nn JOIN ag USING (g) ORDER BY l_returnflag"""))
  )
}
