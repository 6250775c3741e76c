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
