package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Readers for the harness testdata tables (TESTDATA.md / FIXTURES.md §2).
  *
  * Mirrors the reference's scan operators (SURVEY.md §2.1 S2: plain parquet
  * directory scans, `bronze_dimension_fact_load.py:72`). Schemas come from
  * parquet footers; column pruning / predicate pushdown is left to Catalyst —
  * callers `select`/`filter` and the optimizer pushes into the scan.
  */
object Tables {
  def read(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame     = read(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame     = read(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame   = read(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame   = read(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame       = read(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame     = read(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame   = read(s, d, "lineitem")
  /** `events.ts` has shipped under three parquet encodings across driver
    * testdata generations — TIMESTAMP(NANOS) (which Spark's vectorized
    * reader surfaces only as INT64 via `nanosAsLong`), TIMESTAMP_MICROS
    * (isAdjustedToUTC=false → TIMESTAMP_NTZ), and plain TIMESTAMP. Branch on
    * the dtype the scan actually produced and normalize every shape to
    * session-zoned `TimestampType` so downstream `window`/`session_window`/
    * `unix_timestamp` queries and the DuckDB oracle see identical values
    * (sessions pin spark.sql.session.timeZone=UTC, so the NTZ→TZ cast is
    * value-preserving). Covered by SchemaRobustnessSpec against all three
    * encodings. */
  def events(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.functions.{col, expr, timestamp_micros}
    import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
    // Harmless on µs/tz files; required to read nanos-era files at all.
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = read(s, d, "events")
    df.schema("ts").dataType match {
      case LongType         => // nanos-as-long: truncate to µs like DuckDB does
        df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case TimestampNTZType => df.withColumn("ts", col("ts").cast(TimestampType))
      case _                => df
    }
  }
  /** documents/embeddings feed per-row-HEAVY pipelines (regex tokenization,
    * shingle md5 chains, matdot fan-outs), and both ship as single small
    * files here — a single-split scan would serialize all of that map-side
    * work on one core no matter the session's parallelism (measured in the
    * round-7 sf1 sweep: cpu ≈ wall on an idle 32-core box). Scale.spread
    * repartitions only when the scan has fewer partitions than the session
    * — on a production many-file layout it is a no-op, and filters/pruning
    * still push through the Repartition node into the scan. */
  def documents(s: SparkSession, d: String): DataFrame  =
    graft.operators.Scale.spread(read(s, d, "documents"))
  def embeddings(s: SparkSession, d: String): DataFrame =
    graft.operators.Scale.spread(read(s, d, "embeddings"))
}
