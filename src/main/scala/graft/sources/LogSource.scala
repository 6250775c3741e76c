package graft.sources

import java.io.{BufferedReader, InputStreamReader, OutputStream}
import java.nio.charset.StandardCharsets.UTF_8
import java.util.Base64

import scala.collection.mutable
import scala.util.matching.Regex

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileAlreadyExistsException, FileSystem, Path}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, SupportsWrite, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset, ReadLimit, SupportsAdmissionControl}
import org.apache.spark.sql.connector.write.{BatchWrite, DataWriter, DataWriterFactory, LogicalWriteInfo, PhysicalWriteInfo, Write, WriteBuilder, WriterCommitMessage}
import org.apache.spark.sql.connector.write.streaming.{StreamingDataWriterFactory, StreamingWrite}
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.util.SerializableConfiguration

/** `graft-log` — a Kafka-semantics message log as a full DataSourceV2,
  * backed by any Hadoop `FileSystem` (local disk here; the s3g object store
  * of [[ObjectStoreFileSystem]] in ObjectStore tests; S3A in production).
  *
  * The reference's entire real-time layer hangs off Kafka topics
  * (`/root/reference/scripts/real-time/kafka_handler.py:14-28`; topic
  * wiring `docker-compose-realtime.yaml:66-68`), and this environment has
  * no Kafka broker or connector jar. Rather than stub the gap with a file
  * glob, this implements the part of Kafka that the ENGINE actually
  * depends on — the contract, not the broker:
  *
  *  - '''Topics / partitions / offsets''': records live under
  *    `<root>/<topic>/p<partition>/`, totally ordered per partition by a
  *    dense offset sequence. The read schema is byte-for-byte the Kafka
  *    source's: `key binary, value binary, topic string, partition int,
  *    offset long, timestamp timestamp, timestampType int`.
  *  - '''Micro-batch offset tracking''': `initialOffset` honors
  *    `startingOffsets = earliest | latest | {"<partition>":<offset>,…}`,
  *    progress is a per-partition offset map checkpointed by the engine,
  *    and replay of a committed range is deterministic — exactly-once
  *    end-to-end with any idempotent sink.
  *  - '''Admission control''': `maxOffsetsPerTrigger` caps each
  *    micro-batch via [[SupportsAdmissionControl]], allocated across
  *    partitions proportionally to lag (min 1 per lagging partition) —
  *    the Kafka source's behavior.
  *  - '''Producer OCC''': a segment append is a conditional PUT of
  *    `%020d-<count>-<txn>.seg` keyed by the base offset. Two racing
  *    producers pick the same base; exactly one create(overwrite=false)
  *    wins and the loser re-lists and retries — the same If-None-Match
  *    primitive [[ObjectStoreFileSystem]] provides and `Medallion.publishGoldOcc`
  *    commits on, so the log works unchanged on object storage.
  *  - '''Exactly-once sink''' (stronger than Kafka's at-least-once
  *    producer): the streaming write stages per-task segments, and the
  *    driver commit folds them into ONE object per (epoch, partition)
  *    whose name carries the epoch txn id. A replayed epoch sees its txn
  *    already published and skips — idempotent under crash-recovery at
  *    any point (a half-written object is never visible: PUT is
  *    all-or-nothing on the store).
  *
  * Scale notes: a partition's listing is O(#segments) and segments are
  * bounded by producer batch size — [[roll]] bounds the segment count
  * exactly as Kafka's log cleaner does (merge adjacent small segments,
  * offsets and producer-txn dedup preserved); the scan plans one Spark
  * input partition per (topic-partition × offset range), so source
  * parallelism equals topic parallelism, and the per-record decode is a
  * straight base64 loop with no driver round-trips.
  */
object LogFormat {
  /** Kafka source read schema (field-for-field). */
  val schema: StructType = StructType(Seq(
    StructField("key", BinaryType),
    StructField("value", BinaryType),
    StructField("topic", StringType),
    StructField("partition", IntegerType),
    StructField("offset", LongType),
    StructField("timestamp", TimestampType),
    StructField("timestampType", IntegerType)))

  /** CreateTime, the only timestamp type this log stamps. */
  val TsCreate = 0

  /** Segment files are named by base offset ALONE — `%020d.seg` — exactly
    * as Kafka names log segments. That makes the base offset the CAS key:
    * two producers that both computed base B race on ONE object name, and
    * the store's exclusive-create decides the winner. (An earlier design
    * carried the txn id in the name; the OCC race test caught that two
    * same-base segments could then both publish under different names.)
    * The record count and producer txn id live in the segment's first
    * line, and successive bases are dense, so a listing alone yields every
    * count except the last segment's — one 1-line read closes that. */
  private val SegName: Regex = """^(\d{20})\.seg$""".r

  /** Rolled (compacted) segments carry their record count in the name —
    * `%020d-<count>.r.seg` — so a listing alone resolves their span and a
    * mid-roll directory (rolled span published, covered originals not yet
    * deleted) is readable without extra header fetches. See [[roll]]. */
  private val RolledName: Regex = """^(\d{20})-(\d+)\.r\.seg$""".r

  case class Segment(base: Long, count: Long, path: String) {
    def end: Long = base + count
  }

  def segmentName(base: Long): String = f"$base%020d.seg"
  def rolledSegmentName(base: Long, count: Long): String = f"$base%020d-$count.r.seg"

  def topicPath(root: String, topic: String): Path = new Path(root, topic)
  def partitionPath(root: String, topic: String, partition: Int): Path =
    new Path(topicPath(root, topic), s"p$partition")

  /** `<count>\t<txn>` — the segment's first line. */
  private def encodeHeader(count: Long, txn: String): String = s"$count\t$txn"

  /** Read a segment's (count, txn) header. */
  def readHeader(fs: FileSystem, path: Path): (Long, String) = {
    val r = new BufferedReader(new InputStreamReader(fs.open(path), UTF_8), 4096)
    try {
      val h = r.readLine()
      if (h == null) throw new java.io.IOException(s"empty segment: $path")
      val t = h.indexOf('\t')
      (h.substring(0, t).toLong, h.substring(t + 1))
    } finally r.close()
  }

  /** List a partition's segments, offset-ordered, counts resolved (rolled
    * segments carry their count in the name; raw counts are the delta of
    * successive bases, one header read for a raw last segment).
    *
    * Coverage sweep: a roll publishes its merged span before deleting the
    * originals, so a listing can transiently see both. Entries are taken
    * base-ascending (same base: widest rolled span first — racing rollers
    * can publish nested spans, never partially-overlapping ones, because
    * rolls merge whole segments from a common listing) and any entry whose
    * base sits inside an already-kept span is a covered duplicate, dropped.
    * The result is always a dense, non-overlapping cover of the log. */
  def listSegments(fs: FileSystem, root: String, topic: String, partition: Int): Seq[Segment] = {
    val dir = partitionPath(root, topic, partition)
    if (!fs.exists(dir)) return Seq.empty
    val entries = fs.listStatus(dir).toSeq
      .flatMap(st => st.getPath.getName match {
        case SegName(b)       => Some((b.toLong, None: Option[Long], st.getPath))
        case RolledName(b, c) => Some((b.toLong, Some(c.toLong), st.getPath))
        case _ => None
      })
      .sortBy { case (b, c, _) => (b, -c.getOrElse(0L)) }
    if (entries.isEmpty) return Seq.empty
    var covered = Long.MinValue
    val kept = entries.flatMap { case (b, c, p) =>
      if (b < covered) None
      else {
        c.foreach(n => covered = b + n)
        if (c.isEmpty) covered = b // raw: span unknown; next base decides
        Some((b, c, p))
      }
    }
    val counts = kept.indices.map { i =>
      kept(i)._2.getOrElse {
        if (i < kept.length - 1) kept(i + 1)._1 - kept(i)._1
        else readHeader(fs, kept(i)._3)._1
      }
    }
    kept.indices.map(i => Segment(kept(i)._1, counts(i), kept(i)._3.toString))
  }

  /** Partition ids present under a topic (dirs named p<k>). */
  def listPartitions(fs: FileSystem, root: String, topic: String): Seq[Int] = {
    val dir = topicPath(root, topic)
    if (!fs.exists(dir)) Seq.empty
    else fs.listStatus(dir).toSeq.map(_.getPath.getName)
      .collect { case n if n.startsWith("p") && n.drop(1).forall(_.isDigit) => n.drop(1).toInt }
      .sorted
  }

  /** (earliest, latest) offset per partition; empty partition = (0, 0). */
  def offsetRange(fs: FileSystem, root: String, topic: String): Map[Int, (Long, Long)] =
    listPartitions(fs, root, topic).map { p =>
      val segs = listSegments(fs, root, topic, p)
      if (segs.isEmpty) p -> (0L, 0L)
      else p -> (segs.head.base, segs.map(_.end).max)
    }.toMap

  // ------------------------------------------------------------ record codec

  /** One record per line: `tsMicros<TAB>keyB64<TAB>valueB64` ("" = null
    * key). Base64 keeps arbitrary bytes line-safe; the codec never touches
    * a JSON parser. */
  def encodeRecord(ts: Long, key: Array[Byte], value: Array[Byte]): String = {
    val k = if (key == null) "" else Base64.getEncoder.encodeToString(key)
    val v = Base64.getEncoder.encodeToString(if (value == null) Array.emptyByteArray else value)
    s"$ts\t$k\t$v"
  }

  def decodeRecord(line: String): (Long, Array[Byte], Array[Byte]) = {
    val t1 = line.indexOf('\t')
    val t2 = line.indexOf('\t', t1 + 1)
    val ts = line.substring(0, t1).toLong
    val k = if (t2 == t1 + 1) null else Base64.getDecoder.decode(line.substring(t1 + 1, t2))
    val v = Base64.getDecoder.decode(line.substring(t2 + 1))
    (ts, k, v)
  }

  /** Append `records` as one segment: the base offset is reserved by an
    * exclusive create of `%020d.seg` (a conditional PUT on object stores, a
    * hard-link publish on local disk — each store's native atomic-exclusive
    * primitive), retried with a fresh base on loss. If `txn` was already
    * published in this partition the append is skipped (idempotent replay)
    * and -1 returns; the check reads each segment's 1-line header —
    * [[roll]] bounds that scan exactly as Kafka's cleaner bounds segment
    * counts (measured in STRESS.md `log`: the 200-segment append cost
    * collapses back to the 1-segment cost after a roll). Returns the base
    * offset written. */
  def append(fs: FileSystem, root: String, topic: String, partition: Int,
             records: Seq[(Long, Array[Byte], Array[Byte])], txn: String): Long = {
    require(records.nonEmpty, "empty append")
    require(!txn.exists(c => c == ',' || c == '\t' || c == '\n'),
      s"txn id must not contain ',', tab, or newline: $txn")
    val dir = partitionPath(root, topic, partition)
    fs.mkdirs(dir)
    var attempts = 0
    while (attempts < 64) {
      attempts += 1
      val segs = listSegments(fs, root, topic, partition)
      // a rolled segment's header carries the comma-joined txns of every
      // segment it absorbed, so producer idempotency survives compaction
      if (segs.exists(sg =>
        readHeader(fs, new Path(sg.path))._2.split(',').contains(txn))) return -1L
      val base = if (segs.isEmpty) 0L else segs.map(_.end).max
      val target = new Path(dir, segmentName(base))
      val lines = Iterator.single(encodeHeader(records.length.toLong, txn)) ++
        records.iterator.map { case (t, k, v) => encodeRecord(t, k, v) }
      if (exclusiveCreate(fs, target, lines)) return base
      // lost the CAS: re-list, retry
    }
    throw new IllegalStateException(s"log append lost the offset CAS 64 times: $topic/p$partition")
  }

  /** Kafka-cleaner-style log rolling: merge runs of adjacent SMALL segments
    * (file length < `minBytes`) into one rolled segment per run, bounding
    * the O(#segments) listing + header scan that every [[append]]'s txn
    * dedup pays — the documented cost lever of the OCC producer. Contract:
    *
    *  - '''Offsets are untouched.''' A rolled segment covers exactly the
    *    original [base, end) span; consumers see identical records at
    *    identical offsets (the name carries base AND count, so listings
    *    resolve rolled spans without header reads).
    *  - '''Producer idempotency survives.''' The rolled header's txn field
    *    is the comma-join of every absorbed txn id; [[append]] checks
    *    membership, so a replayed producer epoch still no-ops.
    *  - '''Safe under races.''' The rolled object publishes via the same
    *    exclusive-create CAS appends use, the originals are deleted only
    *    after it is visible, and [[listSegments]]' coverage sweep makes any
    *    intermediate state (span + originals both present; nested spans
    *    from racing rollers) read as the dense log. A crashed roller's
    *    leftovers are swept up by the next roll via `dropCovered`.
    *  - '''Bounded memory.''' Bodies are stream-copied line-by-line —
    *    records are never decoded, buffered, or re-encoded.
    *
    * Returns the number of segments absorbed into rolled spans. Runs of one
    * are left alone; already-large segments are never rewritten (no
    * re-copy amplification on stable data). */
  def roll(fs: FileSystem, root: String, topic: String, partition: Int,
           minBytes: Long, maxRun: Int = 256): Int = {
    val dir = partitionPath(root, topic, partition)
    if (!fs.exists(dir)) return 0
    val sizes: Map[String, Long] =
      fs.listStatus(dir).map(st => st.getPath.toString -> st.getLen).toMap
    val segs = listSegments(fs, root, topic, partition)
    dropCovered(fs, dir, segs)
    // maximal runs of adjacent small segments, capped at maxRun per span
    val runs = Iterator.unfold(segs.toList) {
      case Nil => None
      case rest =>
        val (small, tail) = rest.span(sg => sizes.getOrElse(sg.path, Long.MaxValue) < minBytes)
        if (small.isEmpty) Some((Nil, tail.drop(1)))
        else Some((small, tail))
    }.flatMap(_.grouped(maxRun)).filter(_.length >= 2).toSeq
    var absorbed = 0
    runs.foreach { run =>
      val base = run.head.base
      val total = run.map(_.count).sum
      val txns = run.map(sg => readHeader(fs, new Path(sg.path))._2).mkString(",")
      val target = new Path(dir, rolledSegmentName(base, total))
      val lines = Iterator.single(encodeHeader(total, txns)) ++
        run.iterator.flatMap { sg =>
          val r = new BufferedReader(
            new InputStreamReader(fs.open(new Path(sg.path)), UTF_8), 1 << 16)
          r.readLine() // skip the absorbed segment's header
          new Iterator[String] {
            private var nextLine = r.readLine()
            def hasNext: Boolean = nextLine != null || { r.close(); false }
            def next(): String = { val l = nextLine; nextLine = r.readLine(); l }
          }
        }
      if (exclusiveCreate(fs, target, lines)) {
        run.foreach(sg => fs.delete(new Path(sg.path), false))
        absorbed += run.length
      }
    }
    absorbed
  }

  /** Delete leftovers of a crashed roller: segments fully inside a
    * surviving rolled span no longer appear in `kept` (the coverage sweep
    * dropped them) but still occupy the directory. Deletion demands PROOF
    * of coverage — a raw segment's base inside a span implies its whole
    * extent is (runs merge whole segments, so span ends are segment
    * boundaries), a rolled leftover must fit by its name-carried count,
    * and a racing appender's fresh segment has base ≥ every kept end so it
    * can never qualify. */
  private def dropCovered(fs: FileSystem, dir: Path, kept: Seq[Segment]): Unit = {
    val keptPaths = kept.map(_.path).toSet
    val spans = kept.filter(_.path.contains(".r.seg")).map(sg => (sg.base, sg.end))
    def covered(base: Long, endOpt: Option[Long]): Boolean =
      spans.exists { case (s, e) => base >= s && base < e && endOpt.forall(_ <= e) }
    fs.listStatus(dir).foreach { st =>
      if (!keptPaths.contains(st.getPath.toString)) {
        val drop = st.getPath.getName match {
          case SegName(b)       => covered(b.toLong, None)
          case RolledName(b, c) => covered(b.toLong, Some(b.toLong + c.toLong))
          case _ => false
        }
        if (drop) fs.delete(st.getPath, false)
      }
    }
  }

  /** All-or-nothing, atomically-exclusive publish of `lines` at `target`.
    * Object stores / HDFS: `create(overwrite = false)` is their conditional
    * PUT ([[ObjectStoreFileSystem]] links the staged object exclusively at
    * close). The local filesystem's Hadoop `create` is a non-atomic
    * exists-then-create, so there the bytes go to a hidden temp file and
    * publish via `Files.createLink` — the one POSIX op that is atomically
    * exclusive. Returns false if the name was taken (CAS lost). */
  private def exclusiveCreate(fs: FileSystem, target: Path, lines: Iterator[String]): Boolean =
    if (fs.getScheme == "file") {
      val t = java.nio.file.Paths.get(target.toUri.getPath)
      java.nio.file.Files.createDirectories(t.getParent)
      val tmp = t.getParent.resolve(s".tmp-${java.util.UUID.randomUUID().toString.take(12)}")
      try {
        val out = java.nio.file.Files.newOutputStream(tmp)
        try writeLines(out, lines) finally out.close()
        try { java.nio.file.Files.createLink(t, tmp); true }
        catch { case _: java.nio.file.FileAlreadyExistsException => false }
      } finally java.nio.file.Files.deleteIfExists(tmp)
    } else {
      try {
        val out = fs.create(target, false)
        try writeLines(out, lines) finally out.close()
        true
      } catch { case _: FileAlreadyExistsException => false }
    }

  private def writeLines(out: OutputStream, lines: Iterator[String]): Unit = {
    val w = new java.io.BufferedWriter(new java.io.OutputStreamWriter(out, UTF_8), 1 << 16)
    lines.foreach { l => w.write(l); w.write('\n') }
    w.flush()
  }

  // -------------------------------------------------------- offset map codec

  /** `{"0":12,"1":7}` — the Kafka-source per-partition offset JSON. */
  def offsetsToJson(m: Map[Int, Long]): String =
    m.toSeq.sortBy(_._1).map { case (p, o) => s""""$p":$o""" }.mkString("{", ",", "}")

  private val OffsetEntry: Regex = """"(\d+)"\s*:\s*(-?\d+)""".r

  def offsetsFromJson(s: String): Map[Int, Long] =
    OffsetEntry.findAllMatchIn(s).map(m => m.group(1).toInt -> m.group(2).toLong).toMap
}

/** Engine-checkpointed stream position: next offset to read per partition. */
case class LogOffset(parts: Map[Int, Long]) extends Offset {
  override def json(): String = LogFormat.offsetsToJson(parts)
}

/** `spark.read/readStream.format("graft-log").option("path", root)
  * .option("subscribe", topic)` — see [[LogFormat]] for semantics. */
class LogSourceProvider extends TableProvider with DataSourceRegister {
  override def shortName(): String = "graft-log"
  override def inferSchema(options: CaseInsensitiveStringMap): StructType = LogFormat.schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: java.util.Map[String, String]): Table = {
    val opts = new CaseInsensitiveStringMap(properties)
    val root = Option(opts.get("path")).getOrElse(
      throw new IllegalArgumentException("graft-log requires option 'path'"))
    val topic = Option(opts.get("subscribe")).getOrElse(
      throw new IllegalArgumentException("graft-log requires option 'subscribe'"))
    new LogTable(root, topic)
  }
}

class LogTable(root: String, topic: String) extends Table with SupportsRead with SupportsWrite {
  override def name(): String = s"graft-log:$topic"
  override def schema(): StructType = LogFormat.schema
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_READ, TableCapability.MICRO_BATCH_READ,
      TableCapability.BATCH_WRITE, TableCapability.STREAMING_WRITE,
      TableCapability.ACCEPT_ANY_SCHEMA)

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder = {
    val conf = new SerializableConfiguration(
      SparkSession.active.sessionState.newHadoopConf())
    new ScanBuilder {
      override def build(): Scan = new LogScan(root, topic, options, conf)
    }
  }

  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder = {
    val conf = new SerializableConfiguration(
      SparkSession.active.sessionState.newHadoopConf())
    new WriteBuilder {
      override def build(): Write = new LogWrite(root, topic, info, conf)
    }
  }
}

class LogScan(root: String, topic: String, options: CaseInsensitiveStringMap,
              conf: SerializableConfiguration) extends Scan {
  override def readSchema(): StructType = LogFormat.schema
  override def description(): String = s"graft-log topic=$topic root=$root"

  private def fs: FileSystem = new Path(root).getFileSystem(conf.value)

  /** earliest|latest|JSON → concrete per-partition offsets over the topic's
    * current partitions (absent partitions of a JSON map fall back to
    * `ifAbsent`). */
  private def resolve(spec: String, range: Map[Int, (Long, Long)],
                      ifAbsent: ((Long, Long)) => Long): Map[Int, Long] =
    spec.trim.toLowerCase match {
      case "earliest" => range.map { case (p, r) => p -> r._1 }
      case "latest" => range.map { case (p, r) => p -> r._2 }
      case js =>
        val m = LogFormat.offsetsFromJson(js)
        range.map { case (p, r) => p -> m.getOrElse(p, ifAbsent(r)) }
    }

  override def toBatch: Batch = {
    val range = LogFormat.offsetRange(fs, root, topic)
    val start = resolve(Option(options.get("startingOffsets")).getOrElse("earliest"), range, _._1)
    val end = resolve(Option(options.get("endingOffsets")).getOrElse("latest"), range, _._2)
    val parts = planParts(start, end)
    new Batch {
      override def planInputPartitions(): Array[InputPartition] = parts
      override def createReaderFactory(): PartitionReaderFactory = new LogReaderFactory(conf)
    }
  }

  override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
    new LogMicroBatchStream(root, topic, options, conf)

  private def planParts(start: Map[Int, Long], end: Map[Int, Long]): Array[InputPartition] =
    LogScan.planParts(fs, root, topic, start, end)
}

object LogScan {
  /** One Spark partition per (topic-partition, offset range), carrying the
    * covering segment list so executors never re-list the directory. Keyed
    * by the END offsets: a partition created mid-stream appears in `end`
    * before any checkpoint mentions it, and starts at its earliest offset. */
  def planParts(fs: FileSystem, root: String, topic: String,
                start: Map[Int, Long], end: Map[Int, Long]): Array[InputPartition] =
    end.keys.toSeq.sorted.flatMap { p =>
      val segs = LogFormat.listSegments(fs, root, topic, p)
      val s = start.getOrElse(p, segs.headOption.map(_.base).getOrElse(0L))
      val e = end(p)
      if (e <= s) None
      else Some(LogInputPartition(topic, p, s, e,
        segs.filter(sg => sg.end > s && sg.base < e).toArray))
    }.toArray
}

case class LogInputPartition(topic: String, partition: Int, start: Long, end: Long,
                             segments: Array[LogFormat.Segment]) extends InputPartition

class LogReaderFactory(conf: SerializableConfiguration) extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
    new LogPartitionReader(partition.asInstanceOf[LogInputPartition], conf.value)
}

/** Streams the covering segments, skipping records below `start` and
  * stopping at `end`; offsets are dense so position = base + line index. */
class LogPartitionReader(part: LogInputPartition, conf: Configuration)
    extends PartitionReader[InternalRow] {
  private val topicUtf8 = UTF8String.fromString(part.topic)
  private val segs = part.segments.sortBy(_.base).iterator
  private var reader: BufferedReader = _
  private var segPos = 0L
  private var segEnd = 0L
  private var current: InternalRow = _

  private def openNext(): Boolean = {
    close()
    if (!segs.hasNext) return false
    val sg = segs.next()
    val p = new Path(sg.path)
    reader = new BufferedReader(new InputStreamReader(p.getFileSystem(conf).open(p), UTF_8), 1 << 16)
    reader.readLine() // `<count>\t<txn>` header line
    segPos = sg.base
    segEnd = math.min(sg.end, part.end)
    // skip records below the range start
    while (segPos < part.start && segPos < segEnd) { reader.readLine(); segPos += 1 }
    true
  }

  override def next(): Boolean = {
    while (true) {
      if (reader == null || segPos >= segEnd) {
        if (!openNext()) return false
      } else {
        val line = reader.readLine()
        if (line == null) {
          throw new java.io.IOException(
            s"truncated segment: ${part.topic}/p${part.partition} offset $segPos")
        }
        val (ts, k, v) = LogFormat.decodeRecord(line)
        current = new GenericInternalRow(Array[Any](
          k, v, topicUtf8, part.partition, segPos, ts, LogFormat.TsCreate))
        segPos += 1
        return true
      }
    }
    false
  }

  override def get(): InternalRow = current
  override def close(): Unit = { if (reader != null) { reader.close(); reader = null } }
}

/** Micro-batch stream with Kafka-style admission control. */
class LogMicroBatchStream(root: String, topic: String, options: CaseInsensitiveStringMap,
                          conf: SerializableConfiguration)
    extends MicroBatchStream with SupportsAdmissionControl {

  private def fs: FileSystem = new Path(root).getFileSystem(conf.value)
  private val maxPerTrigger: Option[Long] =
    Option(options.get("maxOffsetsPerTrigger")).map(_.toLong)

  override def initialOffset(): Offset = {
    val range = LogFormat.offsetRange(fs, root, topic)
    val spec = Option(options.get("startingOffsets")).getOrElse("earliest").trim
    val m = spec.toLowerCase match {
      case "earliest" => range.map { case (p, r) => p -> r._1 }
      case "latest" => range.map { case (p, r) => p -> r._2 }
      case _ =>
        val js = LogFormat.offsetsFromJson(spec)
        range.map { case (p, r) => p -> js.getOrElse(p, r._1) }
    }
    LogOffset(m)
  }

  override def getDefaultReadLimit: ReadLimit =
    maxPerTrigger.map(ReadLimit.maxRows).getOrElse(ReadLimit.allAvailable())

  override def latestOffset(): Offset =
    throw new UnsupportedOperationException("admission-controlled; engine calls latestOffset(start, limit)")

  /** Cap the batch at the read limit, allocating the budget across
    * partitions proportionally to lag with min 1 per lagging partition
    * (the Kafka source's allocation), and fold in partitions created
    * since the last batch (they start at earliest). */
  override def latestOffset(start: Offset, limit: ReadLimit): Offset = {
    val range = LogFormat.offsetRange(fs, root, topic)
    val from = start.asInstanceOf[LogOffset].parts
    val begin = range.map { case (p, r) => p -> from.getOrElse(p, r._1) }
    val lag = range.map { case (p, r) => p -> math.max(0L, r._2 - begin(p)) }
    val total = lag.values.sum
    val cap = limit match {
      case rl: org.apache.spark.sql.connector.read.streaming.ReadMaxRows => Some(rl.maxRows())
      case _ => None
    }
    val next = cap match {
      case Some(n) if total > n =>
        val scaled = lag.map { case (p, l) =>
          p -> (if (l == 0) 0L else math.max(1L, l * n / total))
        }
        // proportional floors can overshoot n by < #partitions; trim from the
        // largest allocations so the cap is honored exactly
        var over = scaled.values.sum - n
        val trimmed = mutable.Map(scaled.toSeq: _*)
        for ((p, _) <- scaled.toSeq.sortBy(-_._2) if over > 0) {
          val cut = math.min(over, trimmed(p) - math.min(1L, trimmed(p)))
          trimmed(p) -= cut; over -= cut
        }
        begin.map { case (p, b) => p -> (b + trimmed.getOrElse(p, 0L)) }
      case _ => begin.map { case (p, b) => p -> (b + lag(p)) }
    }
    LogOffset(next)
  }

  override def reportLatestOffset(): Offset =
    LogOffset(LogFormat.offsetRange(fs, root, topic).map { case (p, r) => p -> r._2 })

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] =
    LogScan.planParts(fs, root, topic,
      start.asInstanceOf[LogOffset].parts, end.asInstanceOf[LogOffset].parts)

  override def createReaderFactory(): PartitionReaderFactory = new LogReaderFactory(conf)
  override def deserializeOffset(json: String): Offset = LogOffset(LogFormat.offsetsFromJson(json))
  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()
}

// ---------------------------------------------------------------- write path

/** Producer-side write: tasks stage per-partition segments; the driver
  * commit folds each partition's staged data into ONE `-e<epoch>` object
  * via the same conditional-PUT append producers use. Replayed epochs see
  * their txn already on the log and skip — exactly-once, per partition,
  * under crash-recovery at any point. */
class LogWrite(root: String, topic: String, info: LogicalWriteInfo,
               conf: SerializableConfiguration) extends Write {
  override def description(): String = s"graft-log write topic=$topic"
  override def toBatch: BatchWrite = new LogBatchWrite(this, s"q.${info.queryId()}")
  override def toStreaming: StreamingWrite = new LogStreamingWrite(this)

  private[sources] val numPartitions: Int = {
    val opt = Option(info.options().get("log.partitions")).map(_.toInt)
    opt.getOrElse {
      val fs = new Path(root).getFileSystem(conf.value)
      math.max(1, LogFormat.listPartitions(fs, root, topic).size)
    }
  }

  private[sources] def writerFactory = new LogWriterFactory(
    root, topic, numPartitions, info.schema(), conf)

  /** Publish all staged task outputs as one segment per partition. */
  private[sources] def publish(txn: String, messages: Array[WriterCommitMessage]): Unit = {
    val fs = new Path(root).getFileSystem(conf.value)
    val byPartition = messages.collect { case m: LogStagedMessage => m }
      .flatMap(m => m.staged.map { case (p, path, n) => (p, m.taskId, path, n) })
      .groupBy(_._1)
    for ((p, staged) <- byPartition.toSeq.sortBy(_._1)) {
      val ordered = staged.sortBy(_._2) // deterministic: task order
      val records = ordered.iterator.flatMap { case (_, _, path, _) =>
        val sp = new Path(path)
        val r = new BufferedReader(new InputStreamReader(fs.open(sp), UTF_8), 1 << 16)
        try Iterator.continually(r.readLine()).takeWhile(_ != null)
          .map(LogFormat.decodeRecord).toSeq
        finally r.close()
      }.toSeq
      if (records.nonEmpty) LogFormat.append(fs, root, topic, p, records, txn)
    }
    dropStaged(fs, messages)
  }

  private[sources] def dropStaged(fs: FileSystem, messages: Array[WriterCommitMessage]): Unit =
    messages.collect { case m: LogStagedMessage => m }
      .foreach(_.staged.foreach { case (_, path, _) => fs.delete(new Path(path), false) })
}

class LogBatchWrite(w: LogWrite, txn: String) extends BatchWrite {
  override def createBatchWriterFactory(info: PhysicalWriteInfo): DataWriterFactory =
    w.writerFactory
  override def commit(messages: Array[WriterCommitMessage]): Unit = w.publish(txn, messages)
  override def abort(messages: Array[WriterCommitMessage]): Unit = ()
}

class LogStreamingWrite(w: LogWrite) extends StreamingWrite {
  override def createStreamingWriterFactory(info: PhysicalWriteInfo): StreamingDataWriterFactory =
    w.writerFactory
  override def commit(epochId: Long, messages: Array[WriterCommitMessage]): Unit =
    w.publish(s"e$epochId", messages)
  override def abort(epochId: Long, messages: Array[WriterCommitMessage]): Unit = ()
}

case class LogStagedMessage(taskId: Long, staged: Seq[(Int, String, Long)])
  extends WriterCommitMessage

class LogWriterFactory(root: String, topic: String, numPartitions: Int,
                       writeSchema: StructType, conf: SerializableConfiguration)
    extends DataWriterFactory with StreamingDataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long): DataWriter[InternalRow] =
    new LogDataWriter(root, topic, numPartitions, writeSchema, conf.value, taskId)
  override def createWriter(partitionId: Int, taskId: Long, epochId: Long): DataWriter[InternalRow] =
    new LogDataWriter(root, topic, numPartitions, writeSchema, conf.value, taskId)
}

/** Task-side producer: routes rows to log partitions (explicit `partition`
  * column, else a key hash, else partition 0) and streams each partition's
  * records to a staged object — no task-side buffering beyond the write
  * buffer, no driver collect. */
class LogDataWriter(root: String, topic: String, numPartitions: Int,
                    writeSchema: StructType, conf: Configuration, taskId: Long)
    extends DataWriter[InternalRow] {
  private val fs = new Path(root).getFileSystem(conf)
  private val stagedDir = new Path(LogFormat.topicPath(root, topic), ".staged")

  private def idx(name: String): Option[Int] = {
    val i = writeSchema.fieldIndex _
    try Some(i(name)) catch { case _: IllegalArgumentException => None }
  }
  private val keyIdx = idx("key")
  private val valueIdx = idx("value").getOrElse(
    throw new IllegalArgumentException("graft-log write requires a 'value' column"))
  private val partIdx = idx("partition")
  private val tsIdx = idx("timestamp")
  private def bytesAt(row: InternalRow, i: Int): Array[Byte] =
    writeSchema.fields(i).dataType match {
      case BinaryType => row.getBinary(i)
      case StringType => row.getUTF8String(i).toString.getBytes(UTF_8)
      case dt => throw new IllegalArgumentException(
        s"graft-log write column '${writeSchema.fields(i).name}' must be binary or string, got $dt")
    }

  private case class Open(path: Path, out: java.io.BufferedWriter, var n: Long)
  private val open = mutable.Map.empty[Int, Open]

  override def write(row: InternalRow): Unit = {
    val key = keyIdx.filterNot(row.isNullAt).map(bytesAt(row, _)).orNull
    val value = if (row.isNullAt(valueIdx)) Array.emptyByteArray else bytesAt(row, valueIdx)
    val ts = tsIdx.filterNot(row.isNullAt).map(row.getLong).getOrElse(0L)
    val p = partIdx.filterNot(row.isNullAt).map(row.getInt).getOrElse {
      if (key == null) 0
      else math.floorMod(scala.util.hashing.MurmurHash3.bytesHash(key, 42), numPartitions)
    }
    val o = open.getOrElseUpdate(p, {
      val path = new Path(stagedDir,
        s"t$taskId-p$p-${java.util.UUID.randomUUID().toString.take(8)}.stage")
      fs.mkdirs(stagedDir)
      Open(path, new java.io.BufferedWriter(
        new java.io.OutputStreamWriter(fs.create(path, true), UTF_8), 1 << 16), 0L)
    })
    o.out.write(LogFormat.encodeRecord(ts, key, value)); o.out.write('\n'); o.n += 1
  }

  override def commit(): WriterCommitMessage = {
    open.values.foreach(_.out.close())
    LogStagedMessage(taskId, open.toSeq.sortBy(_._1)
      .map { case (p, o) => (p, o.path.toString, o.n) })
  }

  override def abort(): Unit = {
    open.values.foreach { o => o.out.close(); fs.delete(o.path, false) }
    open.clear()
  }

  override def close(): Unit = ()
}
