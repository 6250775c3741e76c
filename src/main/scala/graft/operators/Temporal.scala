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

  /** Batch sessionization: group events into sessions separated by ≥ `gap`
    * of inactivity, via Spark's native `session_window` (works identically
    * under Structured Streaming with a watermark). */
  def sessionize(events: DataFrame, userCol: String, tsCol: String,
                 gap: String): DataFrame =
    events
      .groupBy(col(userCol), session_window(col(tsCol), gap).as("session"))
      .agg(
        count(lit(1)).as("n_events"),
        min(col(tsCol)).as("first_event"),
        max(col(tsCol)).as("last_event"))
      .select(col(userCol), col("first_event"), col("last_event"), col("n_events"))
}
