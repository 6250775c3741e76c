package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Temporal operators beyond the reference's surface: sessionization and
  * as-of (most-recent-match) joins — staples of event/time-series analytics
  * the reference cannot express (SURVEY.md §2.11: no event-time semantics).
  *
  * Both are composed from built-ins per the preference order (compose >
  * custom Expression > custom plan): the as-of join is a tagged union + one
  * running-max window — a single shuffle on the join key, no point lookups,
  * no broadcast of the big side; sessionization uses Spark's native
  * `session_window` (streaming-capable) — both scale linearly.
  */
object Temporal {

  /** As-of join: for each left row, attach the greatest right timestamp ≤
    * the left timestamp within the same key (and optionally a right payload
    * aggregated at that instant).
    *
    * Implementation: tag right rows 0 / left rows 1, sort within key by
    * (ts, tag) — a running max over right-timestamps then lands the latest
    * right ts at-or-before each left row (ties resolve to "right first", so
    * equal timestamps match, i.e. `>=` semantics). One exchange on the key;
    * window is per-key ordered — the classic distributed as-of shape.
    */
  def asofJoin(left: DataFrame, right: DataFrame, key: String, tsCol: String,
               asofCol: String = "asof_ts"): DataFrame = {
    val l = left.withColumn("__tag", lit(1))
    val r = right.select(col(key), col(tsCol)).withColumn("__tag", lit(0))
    val w = Window.partitionBy(col(key)).orderBy(col(tsCol), col("__tag"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    l.unionByName(r, allowMissingColumns = true)
      .withColumn(asofCol,
        max(when(col("__tag") === 0, col(tsCol))).over(w))
      .filter(col("__tag") === 1)
      .drop("__tag")
  }

  /** Interval (range) join: point rows ⋈ [start, end] intervals with
    * point ∈ [start, end] (inclusive). A raw theta join degenerates to a
    * nested-loop over the full cross product; here both sides are
    * bucketized on a fixed time width — each interval explodes to the
    * buckets it covers, each point lands in exactly one — so the join is a
    * plain equi-join on the bucket id refined by the exact predicate. No
    * duplicate pairs are produced (a point's single bucket meets each
    * covering interval once), so no distinct is needed.
    *
    * `bucketSeconds` should be near the typical interval length: an
    * interval explodes into (length/bucket + 1) rows, and a bucket's
    * contents bound the refinement fan-out — the same coverage/width
    * trade every distributed range-join optimizer makes. */
  def rangeJoin(points: DataFrame, intervals: DataFrame,
                pointTs: String, startCol: String, endCol: String,
                bucketSeconds: Long): DataFrame = {
    require(bucketSeconds > 0, "bucketSeconds must be positive")
    val pb = points.withColumn("__bucket",
      floor(unix_timestamp(col(pointTs).cast("timestamp")) / bucketSeconds))
    // degenerate intervals (end < start) match nothing by definition; they
    // are dropped up front because sequence(hi, lo) would throw instead
    val ib = intervals
      .filter(col(endCol) >= col(startCol))
      .withColumn("__bucket",
        explode(sequence(
          floor(unix_timestamp(col(startCol).cast("timestamp")) / bucketSeconds),
          floor(unix_timestamp(col(endCol).cast("timestamp")) / bucketSeconds))))
    pb.join(ib, Seq("__bucket"))
      .filter(col(pointTs) >= col(startCol) && col(pointTs) <= col(endCol))
      .drop("__bucket")
  }

  /** Event-rate anomaly detection: each (type, day) event count z-scored
    * against the type's own daily-count distribution — the standard
    * "traffic spiked / pipeline went quiet" monitor over an event table.
    * Every cross-partition sum is an integer (n days, Σc, Σc²), so
    * mean = Σc/n and var = (n·Σc² − Σc²)/n² are exact integer-division
    * doubles, and the z-score (c − mean)/√var is bit-stable cross-engine
    * (IEEE sqrt is correctly rounded — unlike ln, it needs no
    * fixed-pointing). Two hash aggregations + one broadcast join of the
    * per-type stats frame; the daily frame is persisted because the stats
    * aggregation and the final join consume it on different keys. */
  def rateAnomaly(events: DataFrame, typeCol: String, tsCol: String,
                  zThreshold: Double): DataFrame = {
    require(zThreshold > 0, s"zThreshold must be > 0: $zThreshold")
    val daily = events
      .groupBy(col(typeCol), to_date(col(tsCol)).as("day"))
      .agg(count(lit(1)).as("n_events"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val stats = daily.groupBy(col(typeCol)).agg(
      count(lit(1)).as("__n"),
      sum(col("n_events")).as("__s"),
      sum(col("n_events") * col("n_events")).as("__s2"))
    daily.join(broadcast(stats), Seq(typeCol))
      .withColumn("mean_daily", col("__s").cast("double") / col("__n"))
      .withColumn("var_daily",
        (col("__n") * col("__s2") - col("__s") * col("__s")).cast("double") /
          (col("__n") * col("__n")))
      .withColumn("z", when(col("var_daily") > 0,
        (col("n_events").cast("double") - col("mean_daily")) / sqrt(col("var_daily"))))
      .withColumn("is_anomaly", coalesce(abs(col("z")) >= zThreshold, lit(false)))
      .select(col(typeCol), col("day"), col("n_events"),
        col("mean_daily"), col("var_daily"), col("z"), col("is_anomaly"))
  }

  /** Gap-fill + linear interpolation of a per-key daily series — the
    * resample step every time-series consumer (dashboards, anomaly models,
    * forecasting features) needs before a regular-grid algorithm can run.
    *
    * Aggregates `events` to (key, day, n_events, sum_micros) where
    * sum_micros fix-points `valueCol` per row (round(v·10⁶) — exact
    * integer sums, never a cross-partition double sum), scaffolds EVERY
    * day in the global [min, max] range for EVERY key (sequence() explode —
    * no driver loop), left-joins the observed frame, and linearly
    * interpolates missing days between their nearest observed neighbors:
    * interp = prev + (next−prev)·(day−prevDay)/(nextDay−prevDay), a fixed
    * IEEE sequence on exact integers → round-6 cross-engine stable.
    * Boundary gaps (before first / after last observation) stay null.
    *
    * Scale: one hash aggregate over the raw events; the scaffold is
    * |keys|·|days| rows of three longs (tiny next to the event table);
    * interpolation is two per-key ordered windows — a single shuffle by
    * key. The global day bounds are a 1-row broadcast. */
  def gapFill(events: DataFrame, keyCol: String, tsCol: String,
              valueCol: String): DataFrame = {
    val daily = events
      .groupBy(col(keyCol), to_date(col(tsCol)).as("day"))
      .agg(count(lit(1)).as("n_events"),
        sum(expr(s"CAST(round(($valueCol) * 1000000) AS BIGINT)")).as("sum_micros"))
    val bounds = daily.agg(min(col("day")).as("__lo"), max(col("day")).as("__hi"))
    val scaffold = daily.select(col(keyCol)).distinct()
      .crossJoin(broadcast(bounds))
      .select(col(keyCol),
        explode(expr("sequence(__lo, __hi, interval 1 day)")).as("day"))
    val wPrev = Window.partitionBy(col(keyCol)).orderBy(col("day"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val wNext = Window.partitionBy(col(keyCol)).orderBy(col("day"))
      .rowsBetween(1, Window.unboundedFollowing)
    scaffold.join(daily, Seq(keyCol, "day"), "left")
      .withColumn("n_events", coalesce(col("n_events"), lit(0L)))
      .withColumn("__pv", last(col("sum_micros"), ignoreNulls = true).over(wPrev))
      .withColumn("__pd", last(when(col("sum_micros").isNotNull, col("day")),
        ignoreNulls = true).over(wPrev))
      .withColumn("__nv", first(col("sum_micros"), ignoreNulls = true).over(wNext))
      .withColumn("__nd", first(when(col("sum_micros").isNotNull, col("day")),
        ignoreNulls = true).over(wNext))
      .withColumn("interp_micros",
        when(col("sum_micros").isNotNull, col("sum_micros").cast("double"))
          .otherwise(round(
            col("__pv").cast("double") +
              (col("__nv") - col("__pv")).cast("double") *
                datediff(col("day"), col("__pd")).cast("double") /
                datediff(col("__nd"), col("__pd")).cast("double"), 6)))
      .withColumn("is_filled", col("sum_micros").isNull)
      .select(col(keyCol), col("day"), col("n_events"), col("sum_micros"),
        col("interp_micros"), col("is_filled"))
  }

  /** Sessionization: group events into sessions separated by ≥ `gap` of
    * inactivity, via Spark's native `session_window`. Batch by default;
    * pass `watermark` to run the SAME operator under Structured Streaming
    * (append mode requires one so closed sessions can be finalized —
    * exercised end-to-end in TemporalSpec). */
  def sessionize(events: DataFrame, userCol: String, tsCol: String,
                 gap: String, watermark: Option[String] = None): DataFrame =
    watermark.fold(events)(w => events.withWatermark(tsCol, w))
      .groupBy(col(userCol), session_window(col(tsCol), gap).as("session"))
      .agg(
        count(lit(1)).as("n_events"),
        min(col(tsCol)).as("first_event"),
        max(col(tsCol)).as("last_event"))
      .select(col(userCol), col("first_event"), col("last_event"), col("n_events"))
}
