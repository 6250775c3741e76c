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
  /** `events.ts` is parquet TIMESTAMP(NANOS) which Spark's vectorized reader
    * rejects; read nanos as long and rebuild a microsecond timestamp
    * (truncation matches DuckDB's internal ns→µs behavior). */
  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    read(s, d, "events")
      .withColumn("ts", org.apache.spark.sql.functions.timestamp_micros(
        org.apache.spark.sql.functions.expr("ts div 1000")))
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
