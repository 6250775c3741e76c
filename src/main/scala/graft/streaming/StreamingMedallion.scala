package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import org.apache.spark.sql.types._
import graft.pipeline.Medallion
import graft.streaming.Realtime.{CompletedOrder, OrderEvent, OrderHeader, OrderLine}

/** The reference's T8 streaming→batch handoff as ONE continuous pipeline:
  * file-source CDC events → bronze (raw tee) → silver (stateful
  * completeness join / curation gates) → gold (atomic versioned publish),
  * all driven by Structured Streaming checkpoints so a killed-and-resumed
  * query neither loses nor duplicates a row.
  *
  * Reference shape: `bronze_dimension_fact_load.py:106-144` lands Kafka
  * batches to bronze, then separate daily jobs derive silver/gold. Here the
  * layers advance together per micro-batch, and exactly-once is structural:
  *
  *  - Every layer write is keyed by micro-batch id and written with
  *    OVERWRITE into `batch_id=N` directories: a batch replayed after a
  *    crash rewrites the same directory byte-for-byte instead of appending
  *    duplicates (idempotent sink, the standard foreachBatch discipline).
  *  - Stateful silver (the transformWithState completeness join) restores
  *    its RocksDB state from the checkpoint on restart, so an order whose
  *    header arrived before the kill completes correctly when its lines
  *    arrive after resume — and completes ONCE.
  *  - Gold is recomputed from the full silver table each batch and
  *    committed via [[Medallion.publishGold]] — an atomic pointer flip with
  *    lease-guarded single-writer semantics, so readers only ever see a
  *    complete, consistent version (and retain gives time travel).
  *
  * Scale notes: bronze/silver writes are per-batch appends partitioned by
  * batch id (no global rewrite); the stateful join's state is partitioned
  * by order id across executors; gold recompute is the only full-table
  * pass — at real scale it would aggregate incrementally (the per-batch
  * deltas are already on disk), which changes this one closure, not the
  * pipeline.
  */
object StreamingMedallion {

  /** CDC after-image schema of the merged order event stream: `kind`
    * discriminates header vs line rows (one topic-like source, as the
    * reference's two consumers see after their union). */
  val orderAfterSchema: StructType = StructType(Seq(
    StructField("kind", StringType),
    StructField("order_id", LongType),
    StructField("customer_id", LongType),
    StructField("num_products", IntegerType),
    StructField("product_id", LongType)))

  /** Flattened CDC rows → the typed event union the completeness join keys. */
  def toOrderEvents(decoded: DataFrame): Dataset[OrderEvent] = {
    import decoded.sparkSession.implicits._
    decoded.select(col("kind"), col("order_id"), col("customer_id"),
        col("num_products"), col("product_id"))
      .as[(String, Long, Option[Long], Option[Int], Option[Long])]
      .map { case (kind, oid, cust, n, pid) =>
        if (kind == "header")
          OrderEvent(oid, Some(OrderHeader(oid, cust.getOrElse(-1L),
            n.getOrElse(0))), None)
        else
          OrderEvent(oid, None, Some(OrderLine(oid, pid.getOrElse(-1L))))
      }
  }

  /** Idempotent layer write: OVERWRITE this batch's partition directory.
    * Replay after a crash rewrites the same data instead of duplicating. */
  private def writeBatchDir(batch: DataFrame, dir: String, batchId: Long): Unit =
    batch.write.mode("overwrite").parquet(s"$dir/batch_id=$batchId")

  /** File-CDC transport: JSON lines carrying a Kafka-style `value` column
    * (the test/dev source; same downstream shape as [[logCdcSource]]). */
  def fileCdcSource(spark: SparkSession, inDir: String): DataFrame =
    spark.readStream.schema(StructType(Seq(StructField("value", StringType))))
      .json(inDir)

  /** graft-log transport: the reference's ACTUAL topology — Debezium
    * envelopes on a Kafka-contract topic (`sources/LogSource.scala`) —
    * feeding the identical downstream pipeline. The medallion only ever
    * touches the `value` column, so file, graft-log, and a real Kafka
    * source are interchangeable here; `maxPerTrigger` bounds each
    * micro-batch via the source's admission control. */
  def logCdcSource(spark: SparkSession, logRoot: String, topic: String,
                   maxPerTrigger: Option[Long] = None): DataFrame = {
    val r = spark.readStream.format("graft-log")
      .option("path", logRoot).option("subscribe", topic)
      .option("startingOffsets", "earliest")
    maxPerTrigger.foreach(m => r.option("maxOffsetsPerTrigger", m.toString))
    r.load()
  }

  /** Bronze tee over any CDC transport exposing a `value` column. */
  def startBronzeFrom(raw: DataFrame, bronzeDir: String,
                      checkpoint: String): StreamingQuery =
    Realtime.decodeCdc(raw, orderAfterSchema)
      .writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        writeBatchDir(batch, bronzeDir, batchId)
      }
      .start()

  /** Bronze tee: raw decoded CDC rows land as they arrive, batch-keyed. */
  def startBronze(spark: SparkSession, inDir: String, bronzeDir: String,
                  checkpoint: String): StreamingQuery =
    startBronzeFrom(fileCdcSource(spark, inDir), bronzeDir, checkpoint)

  /** Gold recompute from the full silver table: ONE row per orderId first
    * (hash-aggregate max — a re-delivered order carries identical header
    * values), then the per-customer rollup. The dedup is what keeps gold
    * exactly-once beyond checkpoint replay: if completeness-join state is
    * run with a production TTL, an order whose state expired and was then
    * fully re-delivered emits into a NEW batch_id dir — batch-keyed
    * overwrite can't collapse that, so the recompute must. */
  private[graft] def goldFromSilver(silver: DataFrame): DataFrame =
    silver.groupBy(col("orderId"))
      .agg(max(col("customerId")).as("customerId"),
        max(col("numProducts").cast("long")).as("numProducts"))
      .groupBy(col("customerId"))
      .agg(count(lit(1)).as("n_orders"),
        sum(col("numProducts")).as("n_products"))

  /** Silver + gold: the stateful completeness join emits consolidated
    * orders; each micro-batch lands its completions idempotently in silver
    * and republishes gold (per-customer completed-order rollup) as a new
    * atomic version. Requires the RocksDB state store provider (Spark 4
    * transformWithState contract). */
  def startSilverGold(spark: SparkSession, inDir: String, silverDir: String,
                      goldRoot: String, checkpoint: String): StreamingQuery =
    startSilverGoldFrom(fileCdcSource(spark, inDir), silverDir, goldRoot, checkpoint)

  /** [[startSilverGold]] over any CDC transport exposing a `value` column
    * (file, graft-log, or a real Kafka source — see [[logCdcSource]]). */
  def startSilverGoldFrom(raw: DataFrame, silverDir: String,
                          goldRoot: String, checkpoint: String): StreamingQuery = {
    val events = toOrderEvents(Realtime.decodeCdc(raw, orderAfterSchema))
    val completed = Realtime.completenessJoinTws(events, ttl = None)
    completed.toDF()
      .writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        // silver first (idempotent), then gold from the WHOLE silver table:
        // a crash between the two replays the batch, rewrites the same
        // silver dir, and republishes an identical-content gold version.
        // Empty batches (no completions this trigger) publish nothing —
        // no version churn.
        if (!batch.isEmpty) {
        writeBatchDir(batch, silverDir, batchId)
        val silver = batch.sparkSession.read.parquet(silverDir)
        Medallion.publishGold(batch.sparkSession, goldFromSilver(silver),
          goldRoot, retain = 2)
        }
        ()
      }
      .start()
  }

  // ------------------------------------------------ curated-documents flavor

  /** Raw document file schema for [[startCuratedDocs]]. */
  val docSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("source", StringType),
    StructField("text", StringType)))

  /** The same medallion discipline for a DOCUMENT stream, with
    * [[CurationStream.rowSignals]] as the silver gate: bronze = raw tee,
    * silver = gate-passing docs with their quality signals, gold = a
    * per-source curation scorecard, atomically versioned. Stateless gates
    * ⇒ no state store requirement; exactly-once comes from the same
    * batch-keyed overwrite + atomic publish. */
  def startCuratedDocs(spark: SparkSession, inDir: String, bronzeDir: String,
                       silverDir: String, goldRoot: String, checkpoint: String,
                       stopwords: Seq[String], minTokens: Long, maxTokens: Long,
                       minStopRatio: Double, maxRepetition: Double): StreamingQuery =
    spark.readStream.schema(docSchema).json(inDir)
      .writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        if (!batch.isEmpty) {
          writeBatchDir(batch, bronzeDir, batchId)
          val gated = CurationStream.rowSignals(batch, "doc_id", "text",
            stopwords, minTokens, maxTokens, minStopRatio, maxRepetition)
          writeBatchDir(gated.filter(col("keep")), silverDir, batchId)
          val silver = batch.sparkSession.read.parquet(silverDir)
          val gold = silver.groupBy(col("source"))
            .agg(count(lit(1)).as("n_docs"),
              sum(col("n_tokens")).as("n_tokens"))
          Medallion.publishGold(batch.sparkSession, gold, goldRoot, retain = 2)
        }
        ()
      }
      .start()
}
