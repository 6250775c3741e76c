package graft.queries

import org.apache.spark.sql.functions._
import graft.sources.Tables
import graft.operators.Temporal

/** Temporal-operator coverage: sessionization (native session_window) and
  * the composed distributed as-of join, both oracle-checked — the oracle
  * re-derives sessions with gaps-and-islands SQL and the as-of with the
  * same tagged-union window, so semantics match to the microsecond.
  */
object TemporalQueries {

  val all: Seq[Q] = Seq(

    // Interval (range) join: campaign windows x order timestamps via the
    // bucketized equi-join (a raw theta join would be a nested loop over
    // the cross product). Campaign intervals derive purely from testdata.
    Q("q41_range_join",
      (s, d) => {
        val campaigns = Tables.nation(s, d).select(
            col("n_nationkey").as("campaign_id"),
            date_add(to_date(lit("1995-01-01")),
              (col("n_nationkey") * 90).cast("int")).as("start_d"))
          .withColumn("end_d", date_add(col("start_d"), 10))
        Temporal.rangeJoin(Tables.orders(s, d), campaigns,
            "o_orderdate", "start_d", "end_d", bucketSeconds = 14L * 86400L)
          .groupBy(col("campaign_id"))
          .agg(
            count(lit(1)).as("n_orders"),
            sum(col("o_totalprice").cast("decimal(18,2)")).cast("double").as("revenue"))
          .orderBy(col("campaign_id"))
      },
      Some("""WITH c2 AS (
               SELECT n_nationkey AS campaign_id,
                      DATE '1995-01-01' + n_nationkey * 90 AS start_d,
                      DATE '1995-01-01' + n_nationkey * 90 + 10 AS end_d
               FROM nation),
             j AS (
               SELECT campaign_id, o_totalprice
               FROM orders JOIN c2
                 ON o_orderdate >= start_d AND o_orderdate <= end_d)
             SELECT campaign_id, CAST(COUNT(*) AS BIGINT) AS n_orders,
                    CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
             FROM j GROUP BY campaign_id ORDER BY campaign_id""")),

    // Sessionization: 30-minute-gap sessions per user over the event stream.
    Q("q29_sessionization",
      (s, d) => Temporal.sessionize(Tables.events(s, d), "user_id", "ts", "30 minutes")
        .orderBy(col("user_id"), col("first_event")),
      Some("""WITH m AS (
               SELECT user_id, ts,
                 CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
                       OR ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
                          >= INTERVAL 30 MINUTE
                      THEN 1 ELSE 0 END AS brk
               FROM events),
             g AS (
               SELECT user_id, ts,
                 SUM(brk) OVER (PARTITION BY user_id ORDER BY ts
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
               FROM m)
             SELECT user_id, MIN(ts) AS first_event, MAX(ts) AS last_event,
                    CAST(COUNT(*) AS BIGINT) AS n_events
             FROM g GROUP BY user_id, sid
             ORDER BY user_id, first_event""")),

    // As-of join: odd orders look up the customer's most recent even order
    // at-or-before their date (split derived purely from testdata).
    Q("q30_asof_join",
      (s, d) => {
        val o = Tables.orders(s, d)
        val leftO = o.filter(col("o_orderkey") % 2 === 1)
          .select(col("o_orderkey"), col("o_custkey"), col("o_orderdate"))
        val rightO = o.filter(col("o_orderkey") % 2 === 0)
          .select(col("o_custkey"), col("o_orderdate"))
        Temporal.asofJoin(leftO, rightO, "o_custkey", "o_orderdate")
          .select(
            col("o_orderkey").as("order_id"),
            col("o_custkey").as("custkey"),
            to_date(col("o_orderdate")).as("order_date"),
            to_date(col("asof_ts")).as("asof_date"))
          .orderBy(col("order_id"))
      },
      Some("""WITH u AS (
               SELECT o_custkey AS k, o_orderdate AS ts, 1 AS tag, o_orderkey
               FROM orders WHERE o_orderkey % 2 = 1
               UNION ALL
               SELECT o_custkey, o_orderdate, 0, NULL
               FROM orders WHERE o_orderkey % 2 = 0),
             w AS (
               SELECT k, ts, tag, o_orderkey,
                 MAX(CASE WHEN tag = 0 THEN ts END) OVER (PARTITION BY k
                   ORDER BY ts, tag
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS asof_ts
               FROM u)
             SELECT o_orderkey AS order_id, k AS custkey,
                    CAST(ts AS DATE) AS order_date,
                    CAST(asof_ts AS DATE) AS asof_date
             FROM w WHERE tag = 1 ORDER BY order_id""")),

    // Event-rate anomaly: daily counts per type z-scored against the
    // type's own distribution — exact integer moment sums, IEEE sqrt.
    Q("q72_rate_anomaly",
      (s, d) => Temporal.rateAnomaly(Tables.events(s, d), "event_type", "ts",
          zThreshold = 2.0)
        .orderBy(col("event_type"), col("day")),
      Some("""WITH daily AS (
               SELECT event_type, CAST(ts AS DATE) AS day,
                 CAST(COUNT(*) AS BIGINT) AS n_events
               FROM events GROUP BY 1, 2),
             st AS (
               SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
                 CAST(SUM(n_events) AS BIGINT) AS s,
                 CAST(SUM(n_events * n_events) AS BIGINT) AS s2
               FROM daily GROUP BY 1),
             j AS (
               SELECT d.event_type, d.day, d.n_events,
                 CAST(st.s AS DOUBLE) / st.n AS mean_daily,
                 CAST(st.n * st.s2 - st.s * st.s AS DOUBLE) / (st.n * st.n)
                   AS var_daily,
                 CASE WHEN st.n * st.s2 - st.s * st.s > 0 THEN
                   (CAST(d.n_events AS DOUBLE) - CAST(st.s AS DOUBLE) / st.n)
                     / sqrt(CAST(st.n * st.s2 - st.s * st.s AS DOUBLE)
                            / (st.n * st.n))
                 END AS z
               FROM daily d JOIN st USING (event_type))
             SELECT event_type, day, n_events, mean_daily, var_daily, z,
               COALESCE(abs(z) >= 2.0, false) AS is_anomaly
             FROM j ORDER BY event_type, day""")),

    // Gap-fill + linear interpolation: high-value events are sparse (2-6
    // of 30 days per type at sf0.01), so the scaffold genuinely fills and
    // the interpolation paths (interior gap, boundary null) all execute.
    // Fixed-point micros sums; interpolation is IEEE on exact integers.
    Q("q86_gap_fill",
      (s, d) => Temporal.gapFill(
          Tables.events(s, d).filter(col("value") >= 300.0),
          "event_type", "ts", "value")
        .orderBy(col("event_type"), col("day")),
      Some("""WITH daily AS (
               SELECT event_type, CAST(ts AS DATE) AS day,
                 CAST(COUNT(*) AS BIGINT) AS n_events,
                 CAST(SUM(CAST(round(value * 1000000) AS BIGINT)) AS BIGINT)
                   AS sum_micros
               FROM events WHERE value >= 300.0 GROUP BY 1, 2),
             b AS (SELECT MIN(day) AS lo, MAX(day) AS hi FROM daily),
             ks AS (SELECT DISTINCT event_type FROM daily),
             scaffold AS (
               SELECT ks.event_type, CAST(u.day AS DATE) AS day
               FROM ks, b, UNNEST(generate_series(b.lo, b.hi, INTERVAL 1 DAY))
                 AS u(day)),
             j AS (
               SELECT s.event_type, s.day,
                 COALESCE(d.n_events, 0) AS n_events, d.sum_micros
               FROM scaffold s LEFT JOIN daily d
                 ON d.event_type = s.event_type AND d.day = s.day),
             w AS (
               SELECT event_type, day, n_events, sum_micros,
                 last_value(sum_micros IGNORE NULLS) OVER
                   (PARTITION BY event_type ORDER BY day
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pv,
                 last_value(CASE WHEN sum_micros IS NOT NULL THEN day END
                   IGNORE NULLS) OVER
                   (PARTITION BY event_type ORDER BY day
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pd,
                 first_value(sum_micros IGNORE NULLS) OVER
                   (PARTITION BY event_type ORDER BY day
                    ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING) AS nv,
                 first_value(CASE WHEN sum_micros IS NOT NULL THEN day END
                   IGNORE NULLS) OVER
                   (PARTITION BY event_type ORDER BY day
                    ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING) AS nd
               FROM j)
             SELECT event_type, day, n_events, sum_micros,
               CASE WHEN sum_micros IS NOT NULL THEN CAST(sum_micros AS DOUBLE)
                 ELSE round(CAST(pv AS DOUBLE) + CAST(nv - pv AS DOUBLE)
                   * CAST(day - pd AS DOUBLE) / CAST(nd - pd AS DOUBLE), 6)
                 END AS interp_micros,
               sum_micros IS NULL AS is_filled
             FROM w ORDER BY event_type, day"""))
  )
}
