package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Incremental aggregate-view maintenance: keep a gold aggregate current
  * under append-only ingestion by folding each batch's PARTIAL aggregate
  * into a compact state table instead of re-scanning history.
  *
  * The state for `keys` and money-ish `measures` is one row per group:
  * `n_rows` plus per measure an exact-integer-cents running sum
  * (DECIMAL(38,0) — never a float accumulator, so the fold is
  * order-independent and bit-stable) and cents min/max. count/sum/min/max
  * are ALGEBRAIC — merge(state(A), state(B)) = state(A ∪ B) — which makes
  * the view self-maintainable for inserts: each refresh costs O(batch +
  * |groups|), not O(history). That asymmetry is the whole point at 100 TB:
  * a daily fact append re-aggregates gigabytes, not the petabyte of
  * history (the view-maintenance half of the lakehouse story next to
  * [[Medallion.bronzeIncremental]]'s O(delta) ingest; same shape as
  * Spark's own partial/final hash aggregate, lifted across batches).
  *
  * Deletes/updates are NOT supported: min/max are not invertible under
  * retraction (sum/count are; a delete-tolerant view must drop min/max or
  * re-aggregate affected groups). Derived values (averages, floats) live
  * only in [[finalizeView]] — state never stores anything non-mergeable.
  *
  * Oracle: q101 folds lineitem in three batches and must match DuckDB's
  * one-shot full aggregate — incremental ≡ full recompute is the
  * operator's correctness contract, asserted cross-engine. */
object IncrementalAgg {

  /** Partial state of one batch: exact per-group counters. Cents
    * quantization (`round(x·100)`) matches DECIMAL(18,2) ingestion (q02's
    * proven idiom), so sums are exact integers cross-engine. */
  def partialState(batch: DataFrame, keys: Seq[String],
                   measures: Seq[String]): DataFrame = {
    val cents = measures.map(m =>
      expr(s"CAST(round($m * 100) AS BIGINT)").as(s"__c_$m"))
    val aggs = count(lit(1)).as("n_rows") +: measures.flatMap(m => Seq(
      sum(col(s"__c_$m").cast("decimal(38,0)")).as(s"__sum_$m"),
      min(col(s"__c_$m")).as(s"__min_$m"),
      max(col(s"__c_$m")).as(s"__max_$m")))
    batch.select(keys.map(col) ++ cents: _*)
      .groupBy(keys.map(col): _*)
      .agg(aggs.head, aggs.tail: _*)
  }

  /** Algebraic merge of two states (either may be a fresh
    * [[partialState]]): union → one hash aggregate over |groups| rows.
    * Associative and commutative — batch arrival order can never change
    * the view (spec-asserted), which is what makes retries/replays safe. */
  def mergeState(a: DataFrame, b: DataFrame, keys: Seq[String],
                 measures: Seq[String]): DataFrame = {
    val aggs = sum(col("n_rows")).as("n_rows") +: measures.flatMap(m => Seq(
      sum(col(s"__sum_$m")).as(s"__sum_$m"),
      min(col(s"__min_$m")).as(s"__min_$m"),
      max(col(s"__max_$m")).as(s"__max_$m")))
    a.unionByName(b)
      .groupBy(keys.map(col): _*)
      .agg(aggs.head, aggs.tail: _*)
  }

  /** Structured-Streaming maintainer: a `foreachBatch` sink that folds
    * each micro-batch into a [[Medallion.publishGold]]-versioned state
    * table. Replay-idempotent exactly-once: the state rows carry the batch
    * id that produced them, and a re-delivered batch (restart-from-
    * checkpoint always re-runs the last uncommitted one) is detected by
    * `batchId <= stored` and skipped — fold-once even though delivery is
    * at-least-once. The atomic versioned publish means readers never see a
    * half-merged state, and the previous version survives for in-flight
    * reads (the StreamingMedallion gold discipline, applied to a VIEW that
    * is itself incremental — each micro-batch costs O(batch + groups),
    * so view freshness no longer depends on history size).
    *
    * One maintainer per state table: the streaming engine serializes
    * foreachBatch calls within a query, and publishGold's claim lease
    * turns an accidental second writer into a loud failure, not a silent
    * lost update. */
  def streamingMaintainer(spark: org.apache.spark.sql.SparkSession,
                          stateRoot: String, keys: Seq[String],
                          measures: Seq[String]): (DataFrame, Long) => Unit =
    (batch: DataFrame, batchId: Long) => {
      val cur =
        try Some(Medallion.readGold(spark, stateRoot))
        catch { case scala.util.control.NonFatal(_) => None }
      val last = cur.flatMap { df =>
        val r = df.agg(max(col("__batch_id"))).head()
        if (r.isNullAt(0)) None else Some(r.getLong(0))
      }
      if (!last.exists(_ >= batchId)) {
        val part = partialState(batch, keys, measures)
        val merged = cur match {
          case Some(st) => mergeState(st.drop("__batch_id"), part, keys, measures)
          case None => part
        }
        Medallion.publishGold(spark,
          merged.withColumn("__batch_id", lit(batchId)), stateRoot)
        ()
      }
    }

  /** Read the maintained state table back as the reader-facing view. */
  def readView(spark: org.apache.spark.sql.SparkSession, stateRoot: String,
               keys: Seq[String], measures: Seq[String]): DataFrame =
    finalizeView(Medallion.readGold(spark, stateRoot).drop("__batch_id"),
      keys, measures)

  /** Reader-facing view: per measure sum/avg/min/max in natural units
    * (exact cents → DECIMAL scale-down → double, the q02 parity idiom;
    * avg divides the exact sum by the exact count). */
  def finalizeView(state: DataFrame, keys: Seq[String],
                   measures: Seq[String]): DataFrame = {
    val outs = col("n_rows") +: measures.flatMap { m =>
      val sumNat = (col(s"__sum_$m") / 100).cast("double")
      Seq(
        sumNat.as(s"sum_$m"),
        (sumNat / col("n_rows")).as(s"avg_$m"),
        (col(s"__min_$m").cast("decimal(38,0)") / 100).cast("double").as(s"min_$m"),
        (col(s"__max_$m").cast("decimal(38,0)") / 100).cast("double").as(s"max_$m"))
    }
    state.select(keys.map(col) ++ outs: _*)
  }
}
