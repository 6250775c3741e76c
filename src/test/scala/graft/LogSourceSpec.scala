package graft

import java.nio.charset.StandardCharsets.UTF_8
import java.nio.file.Files
import java.util.concurrent.{CountDownLatch, Executors, TimeUnit}

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.sources.{LogFormat, ObjectStoreFileSystem, S3gAbstractFs}
import graft.streaming.Realtime
import graft.streaming.Realtime.{OrderEvent, OrderHeader, OrderLine}

/** Decoded CDC `after` row for the graft-log swap-in test. */
case class LsAfter(orderId: Long, customerId: Option[Long],
                   numProducts: Option[Int], productId: Option[Long])

/** The `graft-log` DataSourceV2 (VERDICT r7 "What's missing" #1): Kafka's
  * topic/partition/offset contract, admission control, checkpointed
  * exactly-once reads, the OCC producer, and the two-phase exactly-once
  * sink — including the whole thing running over the s3g object store. */
class LogSourceSpec extends SparkSpec {

  private def newRoot(): String =
    Files.createTempDirectory("graft-log").toString

  private def fsFor(root: String) =
    new Path(root).getFileSystem(spark.sessionState.newHadoopConf())

  /** value "v<partition>:<i>", key "k<i>", ts = i micros. */
  private def produce(root: String, topic: String, partition: Int,
                      ids: Range, txn: String): Unit =
    LogFormat.append(fsFor(root), root, topic, partition,
      ids.map(i => (i.toLong, s"k$i".getBytes(UTF_8), s"v$partition:$i".getBytes(UTF_8))),
      txn)

  private def readTopic(root: String, topic: String): DataFrame =
    spark.read.format("graft-log").option("path", root).option("subscribe", topic).load()

  test("kafka-shaped batch read: schema, dense offsets, byte roundtrip") {
    val root = newRoot()
    produce(root, "t", 0, 0 until 30, "a")
    produce(root, "t", 0, 30 until 50, "b") // second segment, same partition
    produce(root, "t", 1, 0 until 20, "c")
    val df = readTopic(root, "t")
    assert(df.schema == LogFormat.schema)
    assert(df.count() == 70)
    // offsets are dense per partition, starting at 0
    val offs = df.groupBy("partition")
      .agg(min("offset").as("lo"), max("offset").as("hi"), count(lit(1)).as("n"))
      .collect().map(r => r.getInt(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(offs(0) == (0L, 49L, 50L) && offs(1) == (0L, 19L, 20L))
    // key/value bytes and the micros timestamp roundtrip exactly
    val row = df.filter(col("partition") === 0 && col("offset") === 31)
      .select(col("key").cast("string"), col("value").cast("string"),
        unix_micros(col("timestamp")), col("topic"), col("timestampType"))
      .first()
    assert(row.getString(0) == "k31" && row.getString(1) == "v0:31")
    assert(row.getLong(2) == 31L && row.getString(3) == "t" && row.getInt(4) == 0)
  }

  test("startingOffsets/endingOffsets JSON slice the batch read") {
    val root = newRoot()
    produce(root, "t", 0, 0 until 40, "a")
    produce(root, "t", 1, 0 until 40, "b")
    val sliced = spark.read.format("graft-log")
      .option("path", root).option("subscribe", "t")
      .option("startingOffsets", """{"0":10,"1":35}""")
      .option("endingOffsets", """{"0":25}""") // p1 defaults to latest
      .load()
    val got = sliced.groupBy("partition").agg(count(lit(1)).as("n"),
      min("offset").as("lo"), max("offset").as("hi"))
      .collect().map(r => r.getInt(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(got(0) == (15L, 10L, 24L))
    assert(got(1) == (5L, 35L, 39L))
  }

  test("producer OCC: racing appends never lose records; txn replay is skipped") {
    val root = newRoot()
    val fs = fsFor(root)
    val pool = Executors.newFixedThreadPool(8)
    val gate = new CountDownLatch(1)
    try {
      val futures = (0 until 8).map { w =>
        pool.submit(new Runnable {
          override def run(): Unit = {
            gate.await()
            for (b <- 0 until 5) {
              val ids = (w * 1000 + b * 100) until (w * 1000 + b * 100 + 10)
              LogFormat.append(fs, root, "race", 0,
                ids.map(i => (i.toLong, null, s"w$w:$i".getBytes(UTF_8))), s"w$w-b$b")
            }
          }
        })
      }
      gate.countDown()
      futures.foreach(_.get(120, TimeUnit.SECONDS))
    } finally pool.shutdown()
    val df = readTopic(root, "race")
    assert(df.count() == 400, "a racing append lost records")
    assert(df.select("offset").distinct().count() == 400, "offset collision")
    assert(df.agg(max("offset")).first().getLong(0) == 399L, "offset gap")
    // a replayed txn is a no-op
    val skipped = LogFormat.append(fs, root, "race", 0,
      Seq((0L, null, "dup".getBytes(UTF_8))), "w0-b0")
    assert(skipped == -1L && readTopic(root, "race").count() == 400)
  }

  test("log rolling: offsets and bytes identical, txn dedup survives, appends continue") {
    val root = newRoot()
    val fs = fsFor(root)
    val txns = Seq("a", "b", "c", "d", "e", "f")
    txns.zipWithIndex.foreach { case (t, i) =>
      produce(root, "t", 0, i * 10 until (i + 1) * 10, t)
    }
    def canon = readTopic(root, "t")
      .select(col("offset"), col("key").cast("string"), col("value").cast("string"),
        unix_micros(col("timestamp")))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3)))
      .sortBy(_._1).toSeq
    val before = canon
    val absorbed = LogFormat.roll(fs, root, "t", 0, minBytes = 1 << 20)
    assert(absorbed == 6)
    val dir = new java.io.File(s"$root/t/p0")
    val segNames = dir.listFiles().map(_.getName).filter(_.endsWith(".seg")).toSeq
    assert(segNames == Seq(LogFormat.rolledSegmentName(0L, 60L)),
      s"expected one rolled segment, got $segNames")
    assert(canon == before, "rolling changed visible records or offsets")
    // replay of an absorbed producer txn still no-ops
    assert(LogFormat.append(fs, root, "t", 0,
      Seq((0L, null, "dup".getBytes(UTF_8))), "c") == -1L)
    // fresh appends continue at the rolled end
    produce(root, "t", 0, 60 until 70, "g")
    assert(canon.size == 70 && canon.last._1 == 69L)
    // an offset slice that starts INSIDE the rolled span reads correctly
    val sliced = spark.read.format("graft-log").option("path", root)
      .option("subscribe", "t").option("startingOffsets", """{"0":37}""").load()
    assert(sliced.agg(min("offset"), count(lit(1))).collect().head.toSeq == Seq(37L, 33L))
  }

  test("log rolling: big segments stay put; runs merge around them") {
    val root = newRoot()
    val fs = fsFor(root)
    produce(root, "t", 0, 0 until 5, "a")
    produce(root, "t", 0, 5 until 10, "b")
    produce(root, "t", 0, 10 until 2000, "big") // well past minBytes
    produce(root, "t", 0, 2000 until 2005, "c")
    produce(root, "t", 0, 2005 until 2010, "d")
    val absorbed = LogFormat.roll(fs, root, "t", 0, minBytes = 1024)
    assert(absorbed == 4, s"expected the four small segments absorbed, got $absorbed")
    val names = new java.io.File(s"$root/t/p0").listFiles().map(_.getName).sorted.toSeq
    assert(names.contains(LogFormat.segmentName(10L)), "large segment was rewritten")
    assert(names.count(_.endsWith(".r.seg")) == 2)
    assert(readTopic(root, "t").count() == 2010)
    // idempotent: nothing left to merge (single spans are left alone)
    assert(LogFormat.roll(fs, root, "t", 0, minBytes = 1024) == 0)
  }

  test("log rolling: a crashed roller's half-state reads dense and is swept up") {
    val root = newRoot()
    val fs = fsFor(root)
    Seq("a", "b", "c").zipWithIndex.foreach { case (t, i) =>
      produce(root, "t", 0, i * 10 until (i + 1) * 10, t)
    }
    val before = readTopic(root, "t").count()
    // simulate a roller that crashed after publishing the span [0, 30) but
    // before deleting the originals: hand-write the rolled object
    val p0 = java.nio.file.Paths.get(s"$root/t/p0")
    val bodies = Seq(0L, 10L, 20L).flatMap { b =>
      val lines = java.nio.file.Files.readAllLines(
        p0.resolve(LogFormat.segmentName(b))).toArray.toSeq.map(_.toString)
      lines.drop(1)
    }
    java.nio.file.Files.write(p0.resolve(LogFormat.rolledSegmentName(0L, 30L)),
      (("30\ta,b,c") +: bodies).mkString("", "\n", "\n").getBytes(UTF_8))
    // both the span and the originals are present: reads stay dense
    assert(readTopic(root, "t").count() == before)
    assert(readTopic(root, "t").select("offset").distinct().count() == before)
    // the next roll pass (nothing small enough to merge) sweeps the covered
    // originals; the fresh-appender guard keeps anything beyond the span
    produce(root, "t", 0, 30 until 40, "late")
    assert(LogFormat.roll(fs, root, "t", 0, minBytes = 0) == 0)
    val names = p0.toFile.listFiles().map(_.getName).filter(_.endsWith(".seg")).sorted.toSeq
    assert(names == Seq(LogFormat.rolledSegmentName(0L, 30L), LogFormat.segmentName(30L)),
      s"covered originals should be gone, fresh segment kept: $names")
    assert(readTopic(root, "t").count() == before + 10)
  }

  test("admission control: maxOffsetsPerTrigger bounds every micro-batch; " +
       "new partitions join at earliest") {
    val root = newRoot()
    produce(root, "t", 0, 0 until 60, "a")
    produce(root, "t", 1, 0 until 40, "b")
    val q = spark.readStream.format("graft-log")
      .option("path", root).option("subscribe", "t")
      .option("maxOffsetsPerTrigger", "25")
      .load()
      .select(col("partition"), col("offset"), col("value").cast("string").as("v"))
      .writeStream.format("memory").queryName("adm").outputMode("append").start()
    try {
      q.processAllAvailable()
      val got = spark.table("adm")
      assert(got.count() == 100)
      assert(got.select("v").distinct().count() == 100)
      val batches = q.recentProgress.filter(_.numInputRows > 0)
      assert(batches.length >= 4, s"expected >=4 admission-capped batches, got ${batches.length}")
      assert(batches.forall(_.numInputRows <= 25),
        batches.map(_.numInputRows).mkString("batch sizes: ", ",", ""))
      // a partition created mid-stream is discovered and read from earliest
      produce(root, "t", 2, 0 until 15, "c")
      q.processAllAvailable()
      val p2 = spark.table("adm").filter(col("partition") === 2)
      assert(p2.count() == 15)
      assert(p2.agg(min("offset"), max("offset")).first() ==
        org.apache.spark.sql.Row(0L, 14L))
    } finally q.stop()
  }

  test("checkpointed restart resumes exactly-once from committed offsets") {
    val root = newRoot()
    produce(root, "t", 0, 0 until 50, "a")
    def run(): Unit = {
      val q = Realtime.parquetSink(
        spark.readStream.format("graft-log")
          .option("path", root).option("subscribe", "t")
          .load()
          .select(col("value").cast("string").as("v")),
        s"$root/out", s"$root/ckpt")
      try q.processAllAvailable() finally q.stop()
    }
    run()
    assert(spark.read.parquet(s"$root/out").count() == 50)
    // data lands while the query is DOWN; the restart reads ONLY the delta
    produce(root, "t", 0, 50 until 80, "b")
    run()
    val out = spark.read.parquet(s"$root/out").select("v")
      .collect().map(_.getString(0))
    assert(out.length == 80, "restart replayed already-committed offsets")
    assert(out.toSet == (0 until 80).map(i => s"v0:$i").toSet)
  }

  test("streaming sink: topic-to-topic copy is exactly-once across a restart") {
    val root = newRoot()
    val cp = Files.createTempDirectory("log-sink-cp").toString
    produce(root, "in", 0, 0 until 30, "a")
    produce(root, "in", 1, 0 until 20, "b")
    def copyOnce(): Unit = {
      val q = spark.readStream.format("graft-log")
        .option("path", root).option("subscribe", "in")
        .load()
        .select(col("key"), col("value"), col("partition"), col("timestamp"))
        .writeStream.format("graft-log")
        .option("path", root).option("subscribe", "out")
        .option("log.partitions", "2")
        .option("checkpointLocation", cp).outputMode("append").start()
      try q.processAllAvailable() finally q.stop()
    }
    copyOnce()
    produce(root, "in", 0, 30 until 45, "c")
    copyOnce() // restart from checkpoint: must append ONLY the 15 new records
    val out = readTopic(root, "out")
    assert(out.count() == 65, "sink replayed or dropped an epoch")
    assert(out.select(col("value").cast("string")).distinct().count() == 65)
    // dense output offsets per partition — the log's contract held under 2PC
    val dense = out.groupBy("partition")
      .agg(count(lit(1)).as("n"), max("offset").as("hi")).collect()
      .forall(r => r.getLong(2) == r.getLong(1) - 1)
    assert(dense, "output offsets are not dense")
    // routing respected the explicit partition column
    val perPart = out.groupBy("partition").count().collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(perPart == Map(0 -> 45L, 1 -> 20L))
  }

  test("CDC completeness pipeline runs unchanged over graft-log (T1/T2 swap-in)") {
    import spark.implicits._
    val root = newRoot()
    // Debezium-style envelopes: headers declare numProducts, lines add items;
    // order 9 stays incomplete
    def env(after: String): Array[Byte] =
      s"""{"payload":{"after":$after}}""".getBytes(UTF_8)
    val headers = (0L until 10L).map(o =>
      env(s"""{"orderId":$o,"customerId":${100 + o},"numProducts":2}"""))
    val lines = (0L until 10L).flatMap { o =>
      val n = if (o == 9L) 1 else 2
      (0 until n).map(i => env(s"""{"orderId":$o,"productId":${o * 10 + i}}"""))
    }
    val fs = fsFor(root)
    LogFormat.append(fs, root, "cdc", 0, headers.zipWithIndex.map {
      case (v, i) => (i.toLong, null, v) }, "h")
    LogFormat.append(fs, root, "cdc", 1, lines.zipWithIndex.map {
      case (v, i) => (i.toLong, null, v) }, "l")

    val after = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("orderId", org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("customerId", org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("numProducts", org.apache.spark.sql.types.IntegerType),
      org.apache.spark.sql.types.StructField("productId", org.apache.spark.sql.types.LongType)))
    val raw = spark.readStream.format("graft-log")
      .option("path", root).option("subscribe", "cdc").load()
    val events = Realtime.decodeCdc(raw, after).as[LsAfter].map { r =>
      OrderEvent(r.orderId,
        r.numProducts.map(n => OrderHeader(r.orderId, r.customerId.getOrElse(0L), n)),
        r.productId.map(p => OrderLine(r.orderId, p)))
    }
    val q = Realtime.completenessJoin(events, ttl = None)
      .writeStream.format("memory").queryName("cdclog").outputMode("append").start()
    try q.processAllAvailable() finally q.stop()
    val done = spark.table("cdclog").as[Realtime.CompletedOrder].collect()
      .map(c => c.orderId -> c.productIds).toMap
    assert(done.keySet == (0L until 9L).toSet, "completed set wrong (order 9 must be absent)")
    assert(done(3L) == Seq(30L, 31L))
  }

  test("the log runs unchanged over the s3g object store") {
    val hc = spark.sparkContext.hadoopConfiguration
    hc.set("fs.s3g.impl", classOf[ObjectStoreFileSystem].getName)
    hc.set("fs.AbstractFileSystem.s3g.impl", classOf[S3gAbstractFs].getName)
    if (hc.get("graft.s3g.base") == null)
      hc.set("graft.s3g.base", Files.createTempDirectory("s3g-base").toString)
    val root = "s3g://logtopics"
    produce(root, "t", 0, 0 until 25, "a")
    produce(root, "t", 1, 0 until 25, "b")
    val df = readTopic(root, "t")
    assert(df.count() == 50)
    assert(df.agg(sum(unix_micros(col("timestamp")))).first().getLong(0) ==
      2L * (0 until 25).sum)
    // conditional-PUT append + all-or-nothing GET are the only primitives
    // used; a replayed txn stays idempotent on the store too
    assert(LogFormat.append(fsFor(root), root, "t", 0,
      Seq((0L, null, "x".getBytes(UTF_8))), "a") == -1L)
  }
}
