package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.types._

/** The reference's real-time layer (SURVEY.md §2.9), re-expressed as
  * Structured Streaming. The reference hand-rolls this with kafka-python
  * consumer loops + Redis state (the `scripts/real-time` consumers); here
  * each piece
  * is a declarative streaming construct:
  *
  *  - T1 CDC envelope decode  → `from_json` + `select("payload.after.*")`
  *  - T2 completeness join    → `flatMapGroupsWithState` keyed by order id
  *  - T3 once-only emission   → `emitted` flag in group state (single-writer
  *    per key — fixes the reference's check-then-set race,
  *    `orders_consumer.py:33-51`)
  *  - state TTL 120 s         → `GroupStateTimeout.ProcessingTimeTimeout`
  *    (replaces Redis `EXPIRE 120`, `orders_consumer.py:76`)
  *  - T4 eligibility          → stream-static `left_semi` joins against
  *    broadcast dimension filters (replaces Redis SISMEMBER,
  *    `check_and_recommend_consumer.py:32-51`)
  *  - T5 recommendation       → deterministic md5-hash pick over the
  *    broadcast product list (seeded variant of `:54-74`)
  *
  * Scale notes: state is partitioned by order id across executors (RocksDB/
  * HDFS state store in production); the eligibility dims are broadcast so
  * the stream never shuffles; exactly-once via checkpointing is strictly
  * stronger than the reference's at-least-once consumer groups (T7).
  */
object Realtime {

  // ---------------------------------------------------------------- T1: CDC

  /** Debezium-style envelope schema `{payload: {after: {...}}}`
    * (`orders_consumer.py:61`; declared-schema pattern from
    * `bronze_dimension_fact_load.py:120-127`). */
  def cdcEnvelope(after: StructType): StructType =
    StructType(Seq(StructField("payload", StructType(Seq(
      StructField("after", after))))))

  /** Decode a CDC JSON `value` column into the flattened `after` row. */
  def decodeCdc(raw: DataFrame, after: StructType): DataFrame =
    raw.select(from_json(col("value").cast("string"), cdcEnvelope(after)).as("j"))
      .select(col("j.payload.after.*"))

  // ----------------------------------------------- T2/T3: completeness join

  /** Order header event: the order row with its expected line count
    * (`orders` CDC stream, `orders_consumer.py:60-65`). */
  case class OrderHeader(orderId: Long, customerId: Long, numProducts: Int)

  /** Order line event (`order_details` CDC stream). */
  case class OrderLine(orderId: Long, productId: Long)

  /** Union type for the merged keyed stream. */
  case class OrderEvent(orderId: Long, header: Option[OrderHeader], line: Option[OrderLine])

  /** Mutable-free group state: header (if seen), distinct products so far,
    * and the once-only emission flag (T3). */
  case class OrderState(header: Option[OrderHeader], products: Set[Long], emitted: Boolean)

  /** Consolidated output emitted exactly once when |products| == numProducts
    * (`orders_consumer.py:41-54`). */
  case class CompletedOrder(orderId: Long, customerId: Long, numProducts: Int,
                            productIds: Seq[Long])

  val StateTtl = "120 seconds" // Redis EXPIRE parity (`orders_consumer.py:76`)

  /** State transition for one key. `ttl` = None disables timeout
    * registration (for NoTimeout runs — e.g. tests and batch mode). */
  def updateOrderState(ttl: Option[String])(
      orderId: Long, events: Iterator[OrderEvent],
      state: GroupState[OrderState]): Iterator[CompletedOrder] = {
    if (state.hasTimedOut) { // TTL: drop incomplete state, emit nothing
      state.remove()
      return Iterator.empty
    }
    val prev = state.getOption.getOrElse(OrderState(None, Set.empty, emitted = false))
    val next = events.foldLeft(prev) { (st, ev) =>
      st.copy(
        header = ev.header.orElse(st.header),
        products = ev.line.map(l => st.products + l.productId).getOrElse(st.products))
    }
    val complete = next.header.exists(h => next.products.size >= h.numProducts)
    if (complete && !next.emitted) {
      state.update(next.copy(emitted = true))
      ttl.foreach(state.setTimeoutDuration)
      val h = next.header.get
      Iterator.single(CompletedOrder(orderId, h.customerId, h.numProducts,
        next.products.toSeq.sorted))
    } else {
      state.update(next)
      ttl.foreach(state.setTimeoutDuration)
      Iterator.empty
    }
  }

  /** Keyed completeness join over the unioned header+line stream. Works on
    * both streaming and batch Datasets (Spark supports
    * flatMapGroupsWithState in batch, where timeouts never fire).
    *
    * Note: with a TTL, a processing-time-timeout streaming query re-triggers
    * micro-batches continuously to service timers (so `processAllAvailable`
    * never idles); pass `ttl = None` where that matters and the state simply
    * lives until the query stops. */
  def completenessJoin(events: Dataset[OrderEvent],
                       ttl: Option[String] = Some(StateTtl)): Dataset[CompletedOrder] = {
    import events.sparkSession.implicits._
    val timeoutConf =
      if (ttl.isDefined) GroupStateTimeout.ProcessingTimeTimeout
      else GroupStateTimeout.NoTimeout
    events
      .groupByKey(_.orderId)
      .flatMapGroupsWithState(OutputMode.Append, timeoutConf)(updateOrderState(ttl))
  }

  // ------------------------- T2/T3 on the Spark-4 transformWithState API

  /** [[completenessJoin]]'s semantics on `transformWithState` — Spark 4's
    * successor to flatMapGroupsWithState: typed named state with NATIVE
    * per-state TTL (`TTLConfig`) instead of hand-managed timeout timers,
    * evolvable state schema, and the RocksDB state store in streaming.
    * Same transition logic; the TTL that took explicit
    * `setTimeoutDuration` + `hasTimedOut` plumbing above is one config
    * object here (the Redis `EXPIRE 120` parity, `orders_consumer.py:76`).
    */
  class OrderCompletenessProcessor(ttl: Option[java.time.Duration])
      extends org.apache.spark.sql.streaming.StatefulProcessor[
        Long, OrderEvent, CompletedOrder] {
    import org.apache.spark.sql.streaming.{TTLConfig, TimerValues, ValueState}
    @transient private var state: ValueState[OrderState] = _

    override def init(outputMode: OutputMode,
                      timeMode: org.apache.spark.sql.streaming.TimeMode): Unit = {
      val ttlConf = ttl.map(TTLConfig.apply).getOrElse(TTLConfig.NONE)
      state = getHandle.getValueState[OrderState](
        "orderState", org.apache.spark.sql.Encoders.product[OrderState], ttlConf)
    }

    override def handleInputRows(key: Long, rows: Iterator[OrderEvent],
                                 timerValues: TimerValues): Iterator[CompletedOrder] = {
      val prev = Option(state.get()).getOrElse(
        OrderState(None, Set.empty, emitted = false))
      val next = rows.foldLeft(prev) { (st, ev) =>
        st.copy(
          header = ev.header.orElse(st.header),
          products = ev.line.map(l => st.products + l.productId).getOrElse(st.products))
      }
      val complete = next.header.exists(h => next.products.size >= h.numProducts)
      if (complete && !next.emitted) {
        state.update(next.copy(emitted = true))
        val h = next.header.get
        Iterator.single(CompletedOrder(key, h.customerId, h.numProducts,
          next.products.toSeq.sorted))
      } else {
        state.update(next)
        Iterator.empty
      }
    }
  }

  /** Keyed completeness join via [[OrderCompletenessProcessor]]. TTL
    * requires processing-time mode; `ttl = None` runs in TimeMode.None
    * (state lives until the query stops). Streaming requires the RocksDB
    * state store provider (`spark.sql.streaming.stateStore.providerClass`).
    */
  def completenessJoinTws(events: Dataset[OrderEvent],
                          ttl: Option[java.time.Duration] =
                            Some(java.time.Duration.ofSeconds(120))): Dataset[CompletedOrder] = {
    import events.sparkSession.implicits._
    import org.apache.spark.sql.streaming.TimeMode
    val timeMode =
      if (ttl.isDefined) TimeMode.ProcessingTime() else TimeMode.None()
    events
      .groupByKey(_.orderId)
      .transformWithState(new OrderCompletenessProcessor(ttl),
        timeMode, OutputMode.Append())
  }

  // ------------------- state rescale: drain a checkpoint, replay at a new
  // partition count (StateRescaleSpec pins that live re-sharding does not
  // exist — the checkpoint's state layout is immutable, so a REAL
  // re-partitioning is drain → read state offline → seed a fresh query)

  /** [[OrderCompletenessProcessor]] that additionally accepts DRAINED
    * state as its initial state — the replay half of [[rescaledCompletenessJoinTws]].
    * `handleInitialState` writes the drained value verbatim (including the
    * `emitted` flag, so an order that completed before the drain is not
    * re-emitted after it), before any input row of the first batch. */
  class OrderCompletenessProcessorWithInit(ttl: Option[java.time.Duration])
      extends org.apache.spark.sql.streaming.StatefulProcessorWithInitialState[
        Long, OrderEvent, CompletedOrder, OrderState] {
    import org.apache.spark.sql.streaming.{TTLConfig, TimerValues, ValueState}
    @transient private var state: ValueState[OrderState] = _

    override def init(outputMode: OutputMode,
                      timeMode: org.apache.spark.sql.streaming.TimeMode): Unit = {
      val ttlConf = ttl.map(TTLConfig.apply).getOrElse(TTLConfig.NONE)
      state = getHandle.getValueState[OrderState](
        "orderState", org.apache.spark.sql.Encoders.product[OrderState], ttlConf)
    }

    override def handleInitialState(
        key: Long, initial: OrderState,
        timerValues: org.apache.spark.sql.streaming.TimerValues): Unit =
      state.update(initial)

    override def handleInputRows(key: Long, rows: Iterator[OrderEvent],
                                 timerValues: TimerValues): Iterator[CompletedOrder] = {
      val prev = Option(state.get()).getOrElse(
        OrderState(None, Set.empty, emitted = false))
      val next = rows.foldLeft(prev) { (st, ev) =>
        st.copy(
          header = ev.header.orElse(st.header),
          products = ev.line.map(l => st.products + l.productId).getOrElse(st.products))
      }
      val complete = next.header.exists(h => next.products.size >= h.numProducts)
      if (complete && !next.emitted) {
        state.update(next.copy(emitted = true))
        val h = next.header.get
        Iterator.single(CompletedOrder(key, h.customerId, h.numProducts,
          next.products.toSeq.sorted))
      } else {
        state.update(next)
        Iterator.empty
      }
    }
  }

  /** OFFLINE drain of a stopped [[completenessJoinTws]] checkpoint's keyed
    * state via the `statestore` data source — one (orderId, [[OrderState]])
    * row per live key, read directly from the RocksDB/HDFS state files
    * with no query running. The read is distributed (one task per state
    * partition); null-valued TTL tombstones are dropped. */
  def drainOrderState(spark: SparkSession,
                      checkpoint: String): Dataset[(Long, OrderState)] = {
    import spark.implicits._
    // the statestore source exposes the value as a struct mirroring the
    // state encoder's schema; map through Rows into the typed state
    spark.read.format("statestore")
      .option("stateVarName", "orderState")
      .load(checkpoint)
      .select(col("key.value").as("orderId"),
        col("value.header").as("header"),
        col("value.products").as("products"),
        col("value.emitted").as("emitted"))
      .map { r =>
        val header = Option(r.getAs[org.apache.spark.sql.Row]("header"))
          .map(h => OrderHeader(h.getAs[Long]("orderId"),
            h.getAs[Long]("customerId"), h.getAs[Int]("numProducts")))
        (r.getAs[Long]("orderId"),
          OrderState(header, r.getAs[Seq[Long]]("products").toSet,
            r.getAs[Boolean]("emitted")))
      }
  }

  /** The REPLAY half of a state rescale: [[completenessJoinTws]] seeded
    * with drained state. Start it against a FRESH checkpoint under the new
    * `spark.sql.shuffle.partitions` — the first micro-batch lays state out
    * at the new partition count with every drained key re-hashed to its
    * new owner, and in-flight orders complete exactly once when their
    * remaining events arrive (already-complete orders carry `emitted` and
    * stay silent). Source position handoff is the caller's: resume the
    * source from the offsets the drained checkpoint had committed. */
  def rescaledCompletenessJoinTws(events: Dataset[OrderEvent],
                                  initial: Dataset[(Long, OrderState)],
                                  ttl: Option[java.time.Duration] = None): Dataset[CompletedOrder] = {
    import events.sparkSession.implicits._
    import org.apache.spark.sql.streaming.TimeMode
    val timeMode =
      if (ttl.isDefined) TimeMode.ProcessingTime() else TimeMode.None()
    events
      .groupByKey(_.orderId)
      .transformWithState(new OrderCompletenessProcessorWithInit(ttl),
        timeMode, OutputMode.Append(),
        initial.groupByKey(_._1).mapValues(_._2))
  }

  // --------------------------------------------------------- T4: eligibility

  /** Stream-static membership filter: keep events whose customer is in the
    * static eligible set and whose payment matches — semi-joins against
    * broadcast dims (replaces the two Redis SISMEMBER calls). */
  def eligibility(events: DataFrame, eligibleCustomers: DataFrame,
                  eligiblePayments: DataFrame): DataFrame =
    events
      .join(broadcast(eligibleCustomers), Seq("customerId"), "left_semi")
      .join(broadcast(eligiblePayments), Seq("paymentId"), "left_semi")

  // ------------------------------------------------------ T5: recommendation

  /** Deterministic product recommendation: md5-rank the catalog per order
    * and pick the best-ranked product NOT already in the basket — the
    * seeded, distributed variant of the reference's `random.choice` loop
    * (`check_and_recommend_consumer.py:54-74`). products: (productId). */
  def recommend(completed: DataFrame, products: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val scored = completed
      .join(broadcast(products))
      .filter(!array_contains(col("productIds"), col("productId")))
      .withColumn("__r", md5(concat(col("orderId").cast("string"), lit(":"),
        col("productId").cast("string"))))
    val w = Window.partitionBy(col("orderId")).orderBy(col("__r"), col("productId"))
    scored.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__r", "__rn")
      .withColumnRenamed("productId", "suggestedProductId")
  }

  // -------------------------------- event-time windows (beyond reference)

  /** Watermarked tumbling-window aggregation — the event-time capability the
    * reference lacks entirely (SURVEY.md §2.9 note). */
  def windowedCounts(events: DataFrame, tsCol: String, window: String,
                     watermark: String): DataFrame =
    events
      .withWatermark(tsCol, watermark)
      .groupBy(org.apache.spark.sql.functions.window(col(tsCol), window),
        col("event_type"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("window.start").as("window_start"), col("event_type"), col("n_events"))

  /** Watermarked streaming dedup — once-only semantics for re-delivered
    * events (T3's dropDuplicates form). */
  def dedupStream(events: DataFrame, idCol: String, tsCol: String,
                  watermark: String): DataFrame =
    events.withWatermark(tsCol, watermark).dropDuplicates(idCol, tsCol)

  /** Key-only streaming dedup on Spark 4's `dropDuplicatesWithinWatermark`:
    * re-deliveries of the same id are dropped even when their event
    * timestamps DIFFER (retry storms re-stamp events; the (id, ts) form
    * above would pass those through). State for an id is evictable once the
    * watermark passes its first-seen timestamp + delay — bounded, unlike a
    * batch-style global `dropDuplicates(id)` which would grow state forever. */
  def dedupStreamById(events: DataFrame, idCol: String, tsCol: String,
                      watermark: String): DataFrame =
    events.withWatermark(tsCol, watermark).dropDuplicatesWithinWatermark(idCol)

  /** True watermarked stream-stream inner join (beyond the reference's
    * hand-rolled state machine): headers ⋈ lines on the order id with a
    * time-range bound so both sides' state is evictable. State size is
    * bounded by watermark + range — the scalable alternative to J6 when
    * per-key custom logic isn't needed. */
  def streamStreamJoin(headers: DataFrame, lines: DataFrame,
                       keyCol: String, headerTs: String, lineTs: String,
                       watermark: String, range: String): DataFrame = {
    val h = headers.withWatermark(headerTs, watermark)
    val l = lines.withWatermark(lineTs, watermark)
      .withColumnRenamed(keyCol, s"__l_$keyCol")
    h.join(l,
      expr(s"$keyCol = __l_$keyCol AND " +
        s"$lineTs >= $headerTs AND $lineTs <= $headerTs + interval $range"),
      "inner").drop(s"__l_$keyCol")
  }

  /** K6 — streaming sink via foreachBatch: idempotent partitioned parquet
    * append keyed by batch id (the Kafka-producer stand-in; swapping the
    * body for a producer changes one closure). */
  def parquetSink(out: DataFrame, path: String, checkpoint: String)
      : org.apache.spark.sql.streaming.StreamingQuery =
    out.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        batch.withColumn("batch_id", lit(batchId))
          .write.mode("append").parquet(path)
      }
      .start()
}
