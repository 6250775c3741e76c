package graft

import org.apache.spark.sql.functions._
import graft.streaming.{Realtime, StreamingMedallion}
import graft.pipeline.Medallion

/** End-to-end streaming medallion (the reference's T8 handoff as ONE
  * continuous pipeline): file-source CDC → bronze tee → stateful silver →
  * atomically versioned gold, with the query KILLED mid-stream and resumed
  * from its checkpoint. Exactly-once is asserted on the final gold content:
  * no completed order lost (state spanning the kill recovers) and none
  * duplicated (batch-keyed idempotent writes). */
class StreamingMedallionSpec extends SparkSpec {

  /** One source line: the Kafka-style `value` column carrying a
    * Debezium-envelope JSON string (double-encoded, as decodeCdc sees it). */
  private def cdcLine(kind: String, oid: Long, cust: Long = -1, n: Int = 0,
                      pid: Long = -1): String = {
    val after = kind match {
      case "header" =>
        s"""{"kind":"header","order_id":$oid,"customer_id":$cust,"num_products":$n}"""
      case _ =>
        s"""{"kind":"line","order_id":$oid,"product_id":$pid}"""
    }
    val envelope = s"""{"payload":{"after":$after}}"""
    val escaped = envelope.replace("\\", "\\\\").replace("\"", "\\\"")
    s"""{"value":"$escaped"}"""
  }

  private def writeFile(dir: String, name: String, lines: Seq[String]): Unit = {
    val p = java.nio.file.Paths.get(dir, name)
    java.nio.file.Files.createDirectories(p.getParent)
    java.nio.file.Files.writeString(p, lines.mkString("\n"))
  }

  test("kill-and-resume: state spans the outage, gold counts are exactly-once") {
    val root = java.nio.file.Files.createTempDirectory("smed").toString
    val in = s"$root/in"
    val prevProvider = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      // phase 1: order 1 completes fully; order 2's header arrives but its
      // line does NOT — its state must survive the kill
      writeFile(in, "f1.json", Seq(
        cdcLine("header", 1, cust = 10, n = 2),
        cdcLine("line", 1, pid = 101),
        cdcLine("line", 1, pid = 102),
        cdcLine("header", 2, cust = 20, n = 1)))
      val bronze1 = StreamingMedallion.startBronze(spark, in,
        s"$root/bronze", s"$root/ckpt_bronze")
      val sg1 = StreamingMedallion.startSilverGold(spark, in,
        s"$root/silver", s"$root/gold", s"$root/ckpt_silver")
      try { bronze1.processAllAvailable(); sg1.processAllAvailable() }
      finally { sg1.stop(); bronze1.stop() } // KILL mid-stream

      val goldV1 = Medallion.readGold(spark, s"$root/gold")
      assert(goldV1.count() == 1) // only customer 10's order completed
      assert(goldV1.filter(col("customerId") === 10).head()
        .getAs[Long]("n_orders") == 1L)

      // phase 2 lands while the pipeline is DOWN: order 2 completes (its
      // header lives only in checkpointed state), order 1's events are
      // RE-DELIVERED (producer retry), order 3 completes fresh
      writeFile(in, "f2.json", Seq(
        cdcLine("line", 2, pid = 201),
        cdcLine("header", 1, cust = 10, n = 2), // duplicate re-delivery
        cdcLine("line", 1, pid = 101),          // duplicate re-delivery
        cdcLine("header", 3, cust = 20, n = 1),
        cdcLine("line", 3, pid = 301)))

      val bronze2 = StreamingMedallion.startBronze(spark, in,
        s"$root/bronze", s"$root/ckpt_bronze")
      val sg2 = StreamingMedallion.startSilverGold(spark, in,
        s"$root/silver", s"$root/gold", s"$root/ckpt_silver")
      try { bronze2.processAllAvailable(); sg2.processAllAvailable() }
      finally { sg2.stop(); bronze2.stop() }

      // gold: exactly-once — order 1 counted ONCE despite re-delivery,
      // order 2 completed across the outage, order 3 completed after it
      val gold = Medallion.readGold(spark, s"$root/gold")
        .collect().map(r => r.getAs[Long]("customerId") ->
          (r.getAs[Long]("n_orders"), r.getAs[Long]("n_products"))).toMap
      assert(gold == Map(10L -> ((1L, 2L)), 20L -> ((2L, 2L))),
        s"gold=$gold")

      // silver: one consolidated row per completed order, never duplicated
      val silver = spark.read.parquet(s"$root/silver")
      assert(silver.count() == 3)
      assert(silver.select("orderId").distinct().count() == 3)

      // bronze: the raw tee holds every delivered event incl. duplicates
      // (bronze preserves the wire truth; dedup is silver's job)
      assert(spark.read.parquet(s"$root/bronze").count() == 9)

      // time travel: the previous gold version is still readable
      val vs = Medallion.goldVersions(spark, s"$root/gold")
      assert(vs.size >= 2)
      assert(Medallion.readGoldAt(spark, s"$root/gold", vs.init.last)
        .count() >= 1)
    } finally {
      prevProvider match {
        case Some(p) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", p)
        case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
  }

  test("medallion over graft-log transport: kill-and-resume stays exactly-once") {
    // the reference's ACTUAL topology — Debezium envelopes on a
    // Kafka-contract topic — through the identical downstream pipeline:
    // only the transport closure changes (logCdcSource vs fileCdcSource)
    val root = java.nio.file.Files.createTempDirectory("smedlog").toString
    val logRoot = s"$root/log"
    def envelope(kind: String, oid: Long, cust: Long = -1, n: Int = 0,
                 pid: Long = -1): Array[Byte] = {
      val after = kind match {
        case "header" =>
          s"""{"kind":"header","order_id":$oid,"customer_id":$cust,"num_products":$n}"""
        case _ => s"""{"kind":"line","order_id":$oid,"product_id":$pid}"""
      }
      s"""{"payload":{"after":$after}}""".getBytes("UTF-8")
    }
    val fs = new org.apache.hadoop.fs.Path(logRoot)
      .getFileSystem(spark.sessionState.newHadoopConf())
    def produce(partition: Int, txn: String, msgs: Seq[Array[Byte]]): Unit =
      graft.sources.LogFormat.append(fs, logRoot, "orders", partition,
        msgs.zipWithIndex.map { case (v, i) => (i.toLong, null, v) }, txn)
    def runPipeline(): Unit = {
      val sg = StreamingMedallion.startSilverGoldFrom(
        StreamingMedallion.logCdcSource(spark, logRoot, "orders",
          maxPerTrigger = Some(2)), // several admission-capped micro-batches
        s"$root/silver", s"$root/gold", s"$root/ckpt")
      try sg.processAllAvailable() finally sg.stop()
    }
    val prevProvider = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      // phase 1: order 1 completes (events split ACROSS topic partitions);
      // order 2's header arrives but its line does not
      produce(0, "p1a", Seq(
        envelope("header", 1, cust = 10, n = 2),
        envelope("line", 1, pid = 101)))
      produce(1, "p1b", Seq(
        envelope("line", 1, pid = 102),
        envelope("header", 2, cust = 20, n = 1)))
      runPipeline()
      val goldV1 = Medallion.readGold(spark, s"$root/gold")
      assert(goldV1.count() == 1)

      // phase 2 lands while the pipeline is DOWN: order 2 completes from
      // checkpointed state, order 3 completes fresh
      produce(0, "p2a", Seq(
        envelope("line", 2, pid = 201),
        envelope("header", 3, cust = 20, n = 1),
        envelope("line", 3, pid = 301)))
      runPipeline()
      val gold = Medallion.readGold(spark, s"$root/gold")
        .collect().map(r => r.getAs[Long]("customerId") ->
          (r.getAs[Long]("n_orders"), r.getAs[Long]("n_products"))).toMap
      assert(gold == Map(10L -> ((1L, 2L)), 20L -> ((2L, 2L))), s"gold=$gold")
      val silver = spark.read.parquet(s"$root/silver")
      assert(silver.count() == 3 && silver.select("orderId").distinct().count() == 3)
    } finally {
      prevProvider match {
        case Some(p) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", p)
        case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
  }

  test("curated-docs flavor: gate applied in-stream, restart keeps gold exact") {
    val root = java.nio.file.Files.createTempDirectory("smedd").toString
    val in = s"$root/in"
    def doc(id: Long, source: String, text: String): String =
      s"""{"doc_id":$id,"source":"$source","text":"$text"}"""
    def start() = StreamingMedallion.startCuratedDocs(spark, in,
      s"$root/bronze", s"$root/silver", s"$root/gold", s"$root/ckpt",
      stopwords = Seq("the", "a", "of"), minTokens = 3, maxTokens = 100,
      minStopRatio = 0.0, maxRepetition = 0.9)

    writeFile(in, "d1.json", Seq(
      doc(1, "web", "the quick brown fox jumps over the lazy dog"),
      doc(2, "web", "too short"))) // fails the length gate
    val q1 = start()
    try q1.processAllAvailable() finally q1.stop()
    assert(Medallion.readGold(spark, s"$root/gold").count() == 1)

    writeFile(in, "d2.json", Seq(
      doc(3, "books", "a tale of two cities and a revolution in france")))
    val q2 = start()
    try q2.processAllAvailable() finally q2.stop()

    val gold = Medallion.readGold(spark, s"$root/gold")
      .collect().map(r => r.getString(0) -> r.getAs[Long]("n_docs")).toMap
    assert(gold == Map("web" -> 1L, "books" -> 1L), s"gold=$gold")
    // bronze kept the rejected doc; silver did not
    assert(spark.read.parquet(s"$root/bronze").count() == 3)
    assert(spark.read.parquet(s"$root/silver").count() == 2)
  }

  test("gold recompute counts a TTL-expired fully-re-delivered order once") {
    import spark.implicits._
    // Simulate the post-TTL shape directly: completeness-join state for
    // order 7 expired, the producer re-delivered it in full, and the join
    // re-emitted it into a NEW batch_id dir. Silver then holds the same
    // orderId in two batch partitions — batch-keyed overwrite cannot
    // collapse that; the gold recompute must.
    val root = java.nio.file.Files.createTempDirectory("gold-dedup").toString
    val b0 = Seq((7L, 100L, 3), (8L, 100L, 2)).toDF("orderId", "customerId", "numProducts")
    val b5 = Seq((7L, 100L, 3)).toDF("orderId", "customerId", "numProducts")
    b0.write.parquet(s"$root/silver/batch_id=0")
    b5.write.parquet(s"$root/silver/batch_id=5")
    val gold = StreamingMedallion.goldFromSilver(spark.read.parquet(s"$root/silver"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(gold == Map(100L -> (2L, 5L)), s"gold=$gold") // 2 orders, 3+2 products
  }
}
