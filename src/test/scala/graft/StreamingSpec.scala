package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupStateTimeout, TestGroupState}
import graft.streaming.Realtime
import graft.streaming.Realtime._

/** Streaming semantics that the DuckDB oracle can't see: once-only emission
  * under redelivery, TTL state expiry, arrival-order independence,
  * eligibility joins and deterministic recommendation (FIXTURES.md §1
  * streaming fixture). */
class StreamingSpec extends SparkSpec {

  private def header(o: Long, c: Long, n: Int) =
    OrderEvent(o, Some(OrderHeader(o, c, n)), None)
  private def line(o: Long, p: Long) =
    OrderEvent(o, None, Some(OrderLine(o, p)))

  test("completeness join emits exactly one consolidated event per complete order") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val input = MemoryStream[OrderEvent]
    val q = Realtime.completenessJoin(input.toDS(), ttl = None)
      .writeStream.format("memory").queryName("cj1").outputMode("append").start()
    try {
      // detail-before-header arrival, interleaved orders
      input.addData(line(1, 101), header(2, 21, 1))
      q.processAllAvailable()
      assert(spark.table("cj1").count() == 0) // nothing complete yet
      input.addData(header(1, 11, 2), line(2, 201), line(1, 102))
      q.processAllAvailable()
      val rows = spark.table("cj1").as[CompletedOrder].collect().sortBy(_.orderId)
      assert(rows.map(_.orderId).toSeq == Seq(1L, 2L))
      assert(rows.head.productIds == Seq(101L, 102L))
      // duplicate redelivery after emission → suppressed (T3)
      input.addData(line(1, 101), header(1, 11, 2))
      q.processAllAvailable()
      assert(spark.table("cj1").count() == 2)
    } finally q.stop()
  }

  test("transformWithState completeness join matches flatMapGroupsWithState (RocksDB store)") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    // Spark 4's new state API requires the RocksDB provider for streaming
    val prevProvider = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val input = MemoryStream[OrderEvent]
    val q = Realtime.completenessJoinTws(input.toDS(), ttl = None)
      .writeStream.format("memory").queryName("tws1").outputMode("append").start()
    try {
      input.addData(line(1, 101), header(2, 21, 1))
      q.processAllAvailable()
      assert(spark.table("tws1").count() == 0) // nothing complete yet
      input.addData(header(1, 11, 2), line(2, 201), line(1, 102))
      q.processAllAvailable()
      val rows = spark.table("tws1").as[CompletedOrder].collect().sortBy(_.orderId)
      assert(rows.map(_.orderId).toSeq == Seq(1L, 2L))
      assert(rows.head.productIds == Seq(101L, 102L))
      // duplicate redelivery after emission → suppressed (same T3 contract)
      input.addData(line(1, 101), header(1, 11, 2))
      q.processAllAvailable()
      assert(spark.table("tws1").count() == 2)
    } finally {
      q.stop()
      prevProvider match {
        case Some(p) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", p)
        case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
  }

  test("incomplete orders emit nothing; extra lines beyond expected don't re-emit") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val input = MemoryStream[OrderEvent]
    val q = Realtime.completenessJoin(input.toDS(), ttl = None)
      .writeStream.format("memory").queryName("cj2").outputMode("append").start()
    try {
      input.addData(header(5, 50, 3), line(5, 1), line(5, 2))
      q.processAllAvailable()
      assert(spark.table("cj2").count() == 0)
      input.addData(line(5, 3), line(5, 4)) // completes, then overshoots
      q.processAllAvailable()
      assert(spark.table("cj2").count() == 1)
    } finally q.stop()
  }

  /** Poll until `cond` holds (the ProcessingTimeTimeout query re-triggers
    * micro-batches to service timers, so `processAllAvailable` can spin —
    * observe the memory sink instead). */
  private def eventually(timeoutMs: Long)(cond: => Boolean): Boolean = {
    val deadline = System.currentTimeMillis() + timeoutMs
    while (System.currentTimeMillis() < deadline) {
      if (cond) return true
      Thread.sleep(100)
    }
    cond
  }

  test("TTL under a real streaming query: expired state is dropped, allowing re-emission") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val input = MemoryStream[OrderEvent]
    val q = Realtime.completenessJoin(input.toDS(), ttl = Some("1 second"))
      .writeStream.format("memory").queryName("cjttl").outputMode("append")
      .trigger(org.apache.spark.sql.streaming.Trigger.ProcessingTime("100 milliseconds"))
      .start()
    try {
      input.addData(header(9, 90, 1), line(9, 901))
      assert(eventually(30000)(spark.table("cjttl").count() == 1), "first emission")
      // same redelivery INSIDE the TTL window is suppressed by the emitted flag
      input.addData(header(9, 90, 1), line(9, 901))
      Thread.sleep(500)
      assert(spark.table("cjttl").count() == 1)
      // let the 1s processing-time timer fire: state (incl. emitted flag) is
      // removed by the hasTimedOut branch while the query keeps running
      Thread.sleep(4000)
      // redelivery AFTER expiry finds no state -> consolidates and re-emits
      input.addData(header(9, 90, 1), line(9, 901))
      assert(eventually(30000)(spark.table("cjttl").count() == 2),
        "re-emission after TTL dropped the state")
    } finally q.stop()
  }

  test("state update logic: TTL timeout drops state without emitting") {
    val state = TestGroupState.create[OrderState](
      org.apache.spark.api.java.Optional.of(OrderState(Some(OrderHeader(1, 11, 2)), Set(101L), emitted = false)),
      GroupStateTimeout.ProcessingTimeTimeout, 1000L,
      org.apache.spark.api.java.Optional.empty[Long](), hasTimedOut = true)
    val out = Realtime.updateOrderState(Some(Realtime.StateTtl))(1L, Iterator.empty, state)
    assert(out.isEmpty)
    assert(state.isRemoved)
  }

  test("state update logic: completion emits once and sets the emitted flag") {
    val state = TestGroupState.create[OrderState](
      org.apache.spark.api.java.Optional.of(OrderState(Some(OrderHeader(1, 11, 2)), Set(101L), emitted = false)),
      GroupStateTimeout.ProcessingTimeTimeout, 1000L,
      org.apache.spark.api.java.Optional.empty[Long](), hasTimedOut = false)
    val out = Realtime.updateOrderState(Some(Realtime.StateTtl))(1L, Iterator(line(1, 102)), state).toSeq
    assert(out.map(_.orderId) == Seq(1L))
    assert(state.get.emitted)
    // re-delivery with state already emitted → nothing
    val out2 = Realtime.updateOrderState(Some(Realtime.StateTtl))(1L, Iterator(line(1, 102)), state).toSeq
    assert(out2.isEmpty)
  }

  test("eligibility keeps only diamond-customer + allowed-payment events") {
    import spark.implicits._
    val events = Seq((1L, 10L, "acb"), (2L, 10L, "visa"), (3L, 20L, "acb"), (4L, 30L, "acb"))
      .toDF("eventId", "customerId", "paymentId")
    val diamond = Seq(10L, 30L).toDF("customerId")
    val pays = Seq("acb").toDF("paymentId")
    val kept = Realtime.eligibility(events, diamond, pays)
      .select("eventId").collect().map(_.getLong(0)).sorted
    assert(kept.sameElements(Array(1L, 4L)))
  }

  test("recommendation picks a deterministic product outside the basket") {
    import spark.implicits._
    val completed = Seq((1L, Seq(100L, 101L)), (2L, Seq(102L)))
      .toDF("orderId", "productIds")
    val products = Seq(100L, 101L, 102L, 103L, 104L).toDF("productId")
    val rec = Realtime.recommend(completed, products)
    val byOrder = rec.collect().map(r =>
      r.getAs[Long]("orderId") -> r.getAs[Long]("suggestedProductId")).toMap
    assert(byOrder.size == 2)
    assert(!Seq(100L, 101L).contains(byOrder(1L)))
    assert(byOrder(2L) != 102L)
    // deterministic across runs
    val again = Realtime.recommend(completed, products).collect().map(r =>
      r.getAs[Long]("orderId") -> r.getAs[Long]("suggestedProductId")).toMap
    assert(again == byOrder)
  }

  test("watermarked tumbling windows aggregate a file stream end-to-end") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val input = MemoryStream[(java.sql.Timestamp, String)]
    val df = input.toDF().toDF("ts", "event_type")
    val q = Realtime.windowedCounts(df, "ts", "1 hour", "2 hours")
      .writeStream.format("memory").queryName("wc").outputMode("append").start()
    try {
      def t(s: String) = java.sql.Timestamp.valueOf(s)
      input.addData((t("2024-01-01 10:05:00"), "click"), (t("2024-01-01 10:55:00"), "click"),
        (t("2024-01-01 11:10:00"), "view"))
      q.processAllAvailable()
      // advance watermark far enough to close the 10:00 window
      input.addData((t("2024-01-01 14:00:00"), "click"))
      q.processAllAvailable()
      val closed = spark.table("wc").filter(col("event_type") === "click")
        .filter(col("window_start") === t("2024-01-01 10:00:00"))
      assert(closed.head().getAs[Long]("n_events") == 2L)
    } finally q.stop()
  }

  test("watermarked stream-stream join matches lines to their header within range") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    def t(x: String) = java.sql.Timestamp.valueOf(x)
    val hIn = MemoryStream[(Long, java.sql.Timestamp)]
    val lIn = MemoryStream[(Long, java.sql.Timestamp, Long)]
    val headers = hIn.toDF().toDF("oid", "hts")
    val lines = lIn.toDF().toDF("oid", "lts", "product")
    val joined = Realtime.streamStreamJoin(headers, lines, "oid", "hts", "lts",
      watermark = "1 hour", range = "1 hour")
    val q = joined.writeStream.format("memory").queryName("ssj").outputMode("append").start()
    try {
      hIn.addData((1L, t("2024-01-01 10:00:00")))
      lIn.addData(
        (1L, t("2024-01-01 10:10:00"), 7L),   // in range
        (1L, t("2024-01-01 12:30:00"), 8L),   // beyond 1h range -> dropped
        (2L, t("2024-01-01 10:05:00"), 9L))   // no header -> dropped
      q.processAllAvailable()
      val rows = spark.table("ssj").collect()
      assert(rows.length == 1)
      assert(rows.head.getAs[Long]("product") == 7L)
    } finally q.stop()
  }

  test("checkpointed restart resumes from committed offsets without reprocessing (T7)") {
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("restart").toString
    def writeBatch(ids: Seq[Long], file: String): Unit =
      ids.toDF("v").coalesce(1).write.mode("append").json(s"$root/in/$file")
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("v", org.apache.spark.sql.types.LongType)))
    def startQuery() = Realtime.parquetSink(
      spark.readStream.schema(schema).json(s"$root/in/*"),
      s"$root/out", s"$root/ckpt")

    writeBatch(Seq(1L, 2L, 3L), "b1")
    val q1 = startQuery()
    try { q1.processAllAvailable() } finally q1.stop()
    assert(spark.read.parquet(s"$root/out").count() == 3)

    // new data lands while the query is DOWN; restart from the checkpoint
    writeBatch(Seq(4L, 5L), "b2")
    val q2 = startQuery()
    try { q2.processAllAvailable() } finally q2.stop()
    val out = spark.read.parquet(s"$root/out")
    // batch 1 was not reprocessed (no duplicates), batch 2 arrived
    assert(out.count() == 5)
    assert(out.select("v").as[Long].collect().sorted.toSeq == Seq(1L, 2L, 3L, 4L, 5L))
  }

  test("dropDuplicatesWithinWatermark: re-stamped re-deliveries of an id emit once") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    def t(x: String) = java.sql.Timestamp.valueOf(x)
    val in = MemoryStream[(Long, java.sql.Timestamp)]
    val df = in.toDF().toDF("event_id", "ts")
    val q = Realtime.dedupStreamById(df, "event_id", "ts", "10 minutes")
      .writeStream.format("memory").queryName("dwm").outputMode("append").start()
    try {
      in.addData((1L, t("2024-01-01 10:00:00")), (1L, t("2024-01-01 10:03:00")),
        (2L, t("2024-01-01 10:01:00")))
      q.processAllAvailable()
      in.addData((1L, t("2024-01-01 10:06:00"))) // retry storm: same id, new stamp
      q.processAllAvailable()
      val got = spark.table("dwm").select("event_id").collect().map(_.getLong(0)).sorted
      // the (id, ts) dedup form would emit id 1 three times here
      assert(got.sameElements(Array(1L, 2L)))
    } finally q.stop()
  }

  test("foreachBatch parquet sink lands streaming output idempotently") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("sink").toString
    val in = MemoryStream[Long]
    val q = Realtime.parquetSink(in.toDF().toDF("v"), s"$dir/data", s"$dir/ckpt")
    try {
      in.addData(1L, 2L, 3L)
      q.processAllAvailable()
      in.addData(4L)
      q.processAllAvailable()
      val out = spark.read.parquet(s"$dir/data")
      assert(out.count() == 4)
      assert(out.select("batch_id").distinct().count() >= 2)
    } finally q.stop()
  }
}
