package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Scale patterns for skew and co-location — the knobs a 100 TB deployment
  * turns when AQE's automatic handling isn't enough.
  *
  * - Salted joins: a hot key (one customer with 10^9 rows) funnels into one
  *   task under hash partitioning. Salting splinters the hot side into
  *   `salts` subkeys and replicates the other side across them, restoring
  *   parallelism at the cost of a bounded fan-out. AQE's skew-join split
  *   handles sort-merge inputs; salting also covers aggregations and
  *   hash joins AQE won't split.
  * - Bucketed tables: pre-shuffling both fact tables into the same bucket
  *   layout turns every subsequent equi-join/groupBy on that key into a
  *   zero-exchange local join — the amortized answer when one join key
  *   dominates a workload (the reference re-shuffles orders ⋈ details every
  *   run, `silver_facts.py:77-84`).
  */
object Scale {

  /** Local-parallelism guard for per-row-heavy pipelines (matdot chains,
    * regex tokenization, all-pairs fan-outs): when the input has fewer
    * partitions than the session's parallelism — a single-split small-file
    * scan, an in-memory synthesis — the expensive per-row stage would run
    * on one core, so repartition up front (the shuffle moves the narrow
    * input once and is trivia next to the per-row work it unlocks). No-op
    * when the source is already partitioned, which is the normal cluster
    * case: at 100 TB the file count provides scan parallelism and this
    * must NOT inject a shuffle. The round-7 sf1 sweep measured the failure
    * mode directly: single-row-group single-file tables ran every scan
    * stage as one task (exact embedding near-dup q21: 17.9 s wall ≈ cpu,
    * i.e. one core of an idle 32-core box). */
  def spread(df: DataFrame): DataFrame = {
    val p = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions < p) df.repartition(p) else df
  }

  /** Deterministic salt in [0, salts) for the skewed (large) side. */
  private def saltOf(c: Column, salts: Int): Column =
    pmod(xxhash64(c), lit(salts))

  /** Skew-safe inner equi-join: the large side gets a derived salt from a
    * secondary column; the small-but-not-broadcastable side is replicated
    * `salts`× via an exploded sequence. Result equals a plain join. */
  def saltedJoin(large: DataFrame, small: DataFrame, key: String,
                 saltSource: String, salts: Int): DataFrame = {
    val l = large.withColumn("__salt", saltOf(col(saltSource), salts))
    val s = small.withColumn("__salt",
      explode(sequence(lit(0L), lit(salts - 1L)))) // long-typed: a cast around a generator is rejected
    l.join(s, Seq(key, "__salt"), "inner").drop("__salt")
  }

  /** Two-phase (salted) aggregation for skewed group keys: partial
    * aggregate on (key, salt), then final aggregate on key. For algebraic
    * aggregates Spark's own partial aggregation already does this —
    * this shape is for the non-algebraic cases (e.g. collect_set-like
    * state too large for one task's final agg, here: exact distinct). */
  def saltedDistinctCount(df: DataFrame, key: String, distinctCol: String,
                          salts: Int): DataFrame =
    df
      .withColumn("__salt", saltOf(col(distinctCol), salts))
      .groupBy(col(key), col("__salt"))
      .agg(countDistinct(col(distinctCol)).as("__partial"))
      .groupBy(col(key))
      .agg(sum(col("__partial")).as("n_distinct")) // salts partition the value space → partial counts are disjoint

  /** Write both sides bucketed by the join key so later joins/groupBys on
    * that key run with zero exchange. Requires a session with a warehouse
    * dir (saveAsTable); bucket counts must match on both sides. */
  def writeBucketed(df: DataFrame, table: String, key: String, buckets: Int): Unit =
    df.write.mode("overwrite")
      .bucketBy(buckets, key).sortBy(key)
      .format("parquet")
      .saveAsTable(table)
}
