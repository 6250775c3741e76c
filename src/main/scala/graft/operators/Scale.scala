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

  /** [[spread]] that also CO-LOCATES by `keys` (hash repartition to the
    * session's full width, then sort within partitions): for a stage that
    * fans rows out and re-aggregates on a superset of `keys`, key-hashed
    * input means `ClusteredDistribution` is already satisfied and the
    * planner drops the post-fan-out exchange — the aggregation finishes
    * inside the fan-out's own stage. The q112 sf10 adjudication measured
    * the difference at a 732M-row fan-out aggregating 244M (query, doc)
    * groups: round-robin input paid a second 244M-row exchange + final
    * aggregation stage (205 s); doc_id-clustered input fused it (116 s).
    * (The one-shot bm25TopK has since moved to an aggregation-derived
    * SortMergeJoin feed that fuses AND halves the stage's per-row cost —
    * STRESS.md round-13; this helper remains the right tool where the
    * pre-fan-out frame is a cache or an on-disk index, e.g. LexIndex.)
    * Explicit partition COUNT (REPARTITION_BY_NUM) so AQE cannot coalesce
    * the small pre-fan-out frame to a handful of partitions and serialize
    * the wide stage behind it (the q35 straggler shape). */
  def spreadBy(df: DataFrame, keys: Column*): DataFrame = {
    val p = df.sparkSession.sparkContext.defaultParallelism
    df.repartition(p, keys: _*).sortWithinPartitions(keys: _*)
  }

  /** Input-proportional partition count for a frame DERIVED from `src`
    * that is about to be persisted and fanned out to many consumers: the
    * number of `src` scan splits, clamped to [1, defaultParallelism].
    *
    * Why (r13 optimization): cached plans are exempt from AQE partition
    * coalescing (their output partitioning is frozen), so a persisted
    * aggregation output materializes at the session's full
    * shuffle.partitions regardless of size — and then EVERY consumer
    * stage pays one near-empty task per partition (~100 ms fixed cpu per
    * task measured on the dedup probe chain; at serving SFs that overhead
    * dominated whole operators). Scan splits follow input bytes
    * ([[spread]]'s signal, inverted), so a small corpus collapses its
    * cached intermediates to a handful of tasks while a 100 TB corpus
    * keeps (and needs) its width — this is the cache-side analogue of
    * AQE's own byte-proportional coalescing. */
  def inputPartitions(src: DataFrame): Int =
    math.max(1, math.min(src.rdd.getNumPartitions,
      src.sparkSession.sparkContext.defaultParallelism))

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

  /** Z-order (Morton-curve) clustering across several columns, so that
    * per-file [min,max] ranges come out tight on ALL of them at once — the
    * layout that makes [[graft.pipeline.DataSkipping]] manifests selective
    * for multi-dimensional predicates (Delta's OPTIMIZE ZORDER BY; a linear
    * sort gives tight ranges on its leading column only, and a predicate on
    * any other column then skips nothing).
    *
    * Rank-based, not value-based: each column is first mapped to a bucket
    * index by its position among `2^bitsPerDim` approximate quantile
    * boundaries (one `approx_percentile` job), so skewed distributions
    * still spread across the full bucket range — value-linear scaling would
    * collapse a Zipf column into one bucket. Bucket indices are then
    * bit-interleaved into the z-value and rows range-partitioned + locally
    * sorted on it (`repartitionByRange` samples once; its partition bounds
    * become file bounds on write).
    *
    * Scale: two extra passes over the frame being laid out (quantiles +
    * range sampling) and one shuffle — paid once at write time, amortized
    * over every pruned read. The boundary arrays (`2^bitsPerDim − 1` values
    * per column, driver-collected then re-broadcast as literals) follow the
    * bounded-collect discipline: 8 bits → 255 doubles per column.
    *
    * Supported column types: numeric, date, timestamp (rank space is
    * doubles; a NULL ranks as bucket 0). Rows are returned clustered —
    * write with `.parquet(...)` and `targetFiles` becomes the file count. */
  def zorderBy(df: DataFrame, cols: Seq[String], targetFiles: Int,
               bitsPerDim: Int = 8): DataFrame = {
    import org.apache.spark.sql.types._
    require(cols.size >= 2, s"z-order needs >= 2 columns (use a plain sort for 1): $cols")
    require(targetFiles >= 1, s"targetFiles must be >= 1: $targetFiles")
    require(bitsPerDim >= 1 && bitsPerDim * cols.size <= 62,
      s"bitsPerDim * dims must fit a long: $bitsPerDim * ${cols.size}")
    val buckets = 1 << bitsPerDim
    def rankSpace(c: String): Column = df.schema(c).dataType match {
      case DateType                         => unix_date(col(c)).cast("double")
      case TimestampType                    => unix_micros(col(c)).cast("double")
      case TimestampNTZType                 =>
        unix_micros(col(c).cast("timestamp")).cast("double")
      case _: NumericType                   => col(c).cast("double")
      case dt => throw new IllegalArgumentException(
        s"z-order on $c: $dt is not rankable (numeric/date/timestamp only)")
    }
    val probs = (1 until buckets).map(i => i.toDouble / buckets)
    val bounds: Seq[Seq[Double]] = {
      val row = df
        .select(cols.zipWithIndex.map { case (c, i) => rankSpace(c).as(s"__z$i") }: _*)
        .select(cols.indices.map { i =>
          expr(s"approx_percentile(__z$i, array(${probs.mkString(",")}), 10000)")
            .as(s"__b$i")
        }: _*)
        .head()
      cols.indices.map { i =>
        if (row.isNullAt(i)) Seq.empty[Double]
        else row.getSeq[Double](i).filter(d => !d.isNaN)
      }
    }
    // bucket = #boundaries <= value via the codegen'd binary search
    // (graft_ubound); the interleave below references each bucket index
    // once per bit, and projection-level subexpression elimination keeps
    // that at ONE search per row per dim — the interpreted HOF fold this
    // replaces re-ran its 255 lambda steps per reference and per
    // range-partitioner sample, dominating the whole publish
    // (DataSkippingSpec pins fold ≡ search on nulls and duplicates).
    // NULL value -> bucket 0, exactly as when(null >= b, ...) folded to 0.
    graft.functions.GraftFunctions.register(df.sparkSession)
    def bucketOf(v: Column, bs: Seq[Double]): Column =
      if (bs.isEmpty) lit(0L)
      else coalesce(call_function("graft_ubound", v, lit(bs.toArray)), lit(0L))
    val zCol = {
      val bucketCols = cols.zipWithIndex.map { case (c, i) =>
        bucketOf(rankSpace(c), bounds(i))
      }
      val d = bucketCols.size
      val terms = for {
        bit <- 0 until bitsPerDim
        (bc, i) <- bucketCols.zipWithIndex
      } yield shiftleft(shiftright(bc, bit).bitwiseAND(lit(1L)), bit * d + i)
      terms.reduce(_.bitwiseOR(_))
    }
    df.withColumn("__zorder", zCol)
      .repartitionByRange(targetFiles, col("__zorder"))
      .sortWithinPartitions("__zorder")
      .drop("__zorder")
  }
}
