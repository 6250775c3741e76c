package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Dataset, Row}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: image/audio/video payloads as opaque
  * `binary` columns with typed metadata, plus partition-parallel
  * decode/feature-extract/frame-sample operators.
  *
  * Training-data-pipeline extension (the reference is text/relational
  * only). The codec is a REAL image format: binary PGM ("P5" portable
  * graymap — Netpbm's fixed-layout grayscale format, parseable with zero
  * dependencies), decoded byte-for-byte by [[decodePgm]] with the
  * malformed-input policy a production ingest needs (bad magic, torn
  * header, truncated/padded raster, out-of-range maxval → a typed reject,
  * never a crash or a silent wrong image). [[synthesizePgm]] builds valid
  * PGM files from the documents corpus as pure column expressions, so the
  * decode → pixel-stats pipeline is oracle-checkable end to end (q126:
  * DuckDB re-derives header arithmetic + cyclic raster and matches the
  * DECODED stats exactly). A JPEG/WAV deployment swaps [[decodePgm]] for
  * the codec call; every operator around it is format-agnostic.
  *
  * Scale notes: payloads never hit the driver; decode streams through
  * `mapPartitions`/`map` exactly the way a vectorized UDF would, and
  * frame sampling is pure column expressions (codegen, no JVM object
  * churn).
  */
object Multimodal {

  /** Typed metadata carried alongside every payload. */
  case class MediaMeta(format: String, width: Int, height: Int, nFrames: Int)

  case class MediaRow(id: Long, blob: Array[Byte], format: String)

  /** Decoded-feature row: `ok` is the malformed-bytes policy surface —
    * an undecodable payload yields ok=false and zeroed features, it never
    * poisons the batch. */
  case class MediaFeatures(id: Long, nBytes: Int, ok: Boolean,
                           features: Array[Float])

  /** A decoded P5 graymap: `pixels` row-major, one byte per pixel. */
  final case class PgmImage(width: Int, height: Int, pixels: Array[Byte])

  /** Synthesize a deterministic media payload per document: the UTF-8 bytes
    * of the text stand in for an encoded image/audio blob; metadata derives
    * arithmetically from the id. This is the fixture generator for the
    * binary pipeline — real ingestion would read files into the same schema. */
  def synthesizeMedia(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(
      col(idCol),
      encode(col(textCol), "UTF-8").as("blob"),
      struct(
        element_at(lit(Array("jpeg", "png", "wav", "mp4")), (col(idCol) % 4 + 1).cast("int"))
          .as("format"),
        (col(idCol) % 64 * 16 + 128).cast("int").as("width"),
        (col(idCol) % 48 * 16 + 96).cast("int").as("height"),
        (expr(s"octet_length($textCol) div 256") + 1).cast("int").as("n_frames"))
        .as("meta"))

  /** Decode a binary ("P5") PGM payload. Netpbm's actual grammar: magic
    * `P5`, then three whitespace-separated decimal tokens — width, height,
    * maxval — where any amount of whitespace may appear between tokens and
    * `#`-to-end-of-line comments may precede any token; after maxval,
    * exactly ONE whitespace byte, then width·height raster bytes (maxval
    * ≤ 255 → one byte per pixel).
    *
    * Malformed-bytes policy — None, never a throw or a misread, for:
    * wrong/missing magic (a P6 color PPM is rejected, not misdecoded),
    * a header token that is absent or non-numeric, dimensions or maxval
    * of 0, maxval > 255 (two-byte rasters are out of scope — reject, do
    * not halve the image), an absurd dimension token (overflow guard),
    * and a raster whose byte count is not EXACTLY width·height (both a
    * truncated and a padded payload are corrupt — a decoder that accepts
    * either serves shifted pixels downstream). */
  def decodePgm(blob: Array[Byte]): Option[PgmImage] = {
    if (blob == null || blob.length < 2 || blob(0) != 'P' || blob(1) != '5')
      return None
    var i = 2
    def isWs(b: Byte): Boolean =
      b == ' ' || b == '\n' || b == '\r' || b == '\t' || b == '\f' || b == 11
    // at least one whitespace (or comment) must separate header tokens
    def skipSeparators(): Boolean = {
      val start = i
      var cont = true
      while (cont && i < blob.length) {
        if (isWs(blob(i))) i += 1
        else if (blob(i) == '#') { while (i < blob.length && blob(i) != '\n') i += 1 }
        else cont = false
      }
      i > start
    }
    def readToken(): Option[Int] = {
      if (!skipSeparators()) return None
      if (i >= blob.length || blob(i) < '0' || blob(i) > '9') return None
      var v = 0
      while (i < blob.length && blob(i) >= '0' && blob(i) <= '9') {
        v = v * 10 + (blob(i) - '0')
        if (v > (1 << 20)) return None // overflow/absurd-dimension guard
        i += 1
      }
      Some(v)
    }
    for {
      w <- readToken()
      h <- readToken()
      maxv <- readToken()
      if w > 0 && h > 0 && maxv > 0 && maxv <= 255
      if i < blob.length && isWs(blob(i)) // the single post-maxval byte
      raster = i + 1
      if blob.length - raster == w.toLong * h // exact — no truncate, no pad
    } yield PgmImage(w, h,
      java.util.Arrays.copyOfRange(blob, raster, blob.length))
  }

  /** Encode a PGM payload (the [[decodePgm]] inverse) — fixture/ingest
    * helper; round-trip identity is pinned in MultimodalSpec. */
  def encodePgm(img: PgmImage): Array[Byte] = {
    require(img.width > 0 && img.height > 0,
      s"dims must be positive: ${img.width}x${img.height}")
    // Long product: an Int multiply overflows for caller-supplied dims
    // (decodePgm caps each dim at 2^20; this entry point takes any PgmImage)
    require(img.pixels.length.toLong == img.width.toLong * img.height,
      s"raster ${img.pixels.length} != ${img.width}x${img.height}")
    val header = s"P5\n${img.width} ${img.height}\n255\n".getBytes("US-ASCII")
    val out = new Array[Byte](header.length + img.pixels.length)
    System.arraycopy(header, 0, out, 0, header.length)
    System.arraycopy(img.pixels, 0, out, header.length, img.pixels.length)
    out
  }

  /** Partition-parallel feature extraction over the binary column — the
    * Spark-side shape of a batched decode UDF: iterator in, iterator out,
    * constant memory per partition, no driver involvement. Features are
    * the unit-L1 `bins`-bin luminance histogram of the DECODED raster;
    * an undecodable payload yields ok=false with zeroed features. */
  def extractFeatures(media: DataFrame, idCol: String, blobCol: String,
                      bins: Int = 16): Dataset[MediaFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col(idCol).cast("long"), col(blobCol)).as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, blob) =>
        val nBytes = if (blob == null) 0 else blob.length
        decodePgm(blob) match {
          case Some(img) =>
            val hist = new Array[Float](bins)
            var i = 0
            while (i < img.pixels.length) {
              hist((img.pixels(i) & 0xff) * bins / 256) += 1f; i += 1
            }
            val n = img.pixels.length.toFloat
            var b = 0
            while (b < bins) { hist(b) /= n; b += 1 }
            MediaFeatures(id, nBytes, ok = true, hist)
          case None =>
            MediaFeatures(id, nBytes, ok = false, new Array[Float](bins))
        }
      })
  }

  /** Synthesize a VALID binary-PGM payload per document as pure column
    * expressions (no UDF, no driver): dimensions from id arithmetic
    * (width 8–23, height 6–17), raster = the document's UTF-8 bytes
    * cycled to width·height (empty text → a single space). Every `% 97 ==
    * 3` id gets a `P6` magic instead — a real color-PPM header the P5
    * decoder must REJECT, so the malformed policy is exercised (and
    * oracled) inside the same frame. The cyclic raster makes decoded
    * pixel stats re-derivable from `text` by an independent engine —
    * q126's oracle recomputes header math + cycle bytes in SQL. */
  def synthesizePgm(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(col(idCol), pgmBlobExpr(idCol, textCol).as("blob"))

  /** The PGM payload as a pure column expression — shared by
    * [[synthesizePgm]] and the mixed-media fixture. */
  private def pgmBlobExpr(idCol: String, textCol: String): Column = {
    val w = (col(idCol) % 16 + 8).cast("int")
    val h = (col(idCol) % 12 + 6).cast("int")
    val np = (w * h).cast("int")
    val t = when(length(coalesce(col(textCol), lit(""))) === 0, lit(" "))
      .otherwise(col(textCol))
    val reps = ceil(np.cast("double") /
      greatest(call_function("octet_length", t), lit(1)).cast("double"))
      .cast("int")
    val raster = call_function("substring",
      encode(call_function("repeat", t, reps), "UTF-8"), lit(1), np)
    val magic = when(col(idCol) % 97 === 3, lit("P6")).otherwise(lit("P5"))
    concat(
      encode(concat(magic, lit("\n"), w.cast("string"), lit(" "),
        h.cast("string"), lit("\n255\n")), "UTF-8"),
      raster)
  }

  /** Decode + exact integer pixel statistics — the oracle-able face of the
    * REAL codec: per payload, (ok, width, height, n_pixels, sum_lum,
    * min_lum, max_lum, mean_lum) from the decoded raster; malformed
    * payloads surface as ok=false with NULL stats (the reject-not-crash
    * policy as data, so downstream curation can filter or quarantine). */
  def pixelStats(media: DataFrame, idCol: String, blobCol: String): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col(idCol).cast("long"), col(blobCol)).as[(Long, Array[Byte])]
      .map { case (id, blob) =>
        decodePgm(blob) match {
          case Some(img) =>
            var s = 0L; var mn = 255; var mx = 0; var i = 0
            while (i < img.pixels.length) {
              val v = img.pixels(i) & 0xff
              s += v; if (v < mn) mn = v; if (v > mx) mx = v; i += 1
            }
            val np = img.pixels.length.toLong
            (id, true, Some(img.width), Some(img.height), Some(np),
              Some(s), Some(mn), Some(mx), Some(s.toDouble / np))
          case None =>
            (id, false, None: Option[Int], None: Option[Int],
              None: Option[Long], None: Option[Long], None: Option[Int],
              None: Option[Int], None: Option[Double])
        }
      }
      .toDF(idCol, "ok", "width", "height", "n_pixels", "sum_lum",
        "min_lum", "max_lum", "mean_lum")
  }

  /** Integer byte-bin histogram in long form (id, bin, n) — the oracle-able
    * face of the binary pipeline: same mapPartitions batch shape as
    * [[extractFeatures]], but exact integer counts, so an independent
    * engine can recompute it bit-for-bit from the payload bytes. */
  def histogramCounts(media: DataFrame, idCol: String, blobCol: String,
                      bins: Int = 16): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col(idCol).cast("long"), col(blobCol)).as[(Long, Array[Byte])]
      .flatMap { case (id, blob) =>
        val hist = new Array[Long](bins)
        if (blob != null) {
          var i = 0
          while (i < blob.length) { hist((blob(i) & 0xff) * bins / 256) += 1L; i += 1 }
        }
        (0 until bins).iterator.filter(hist(_) > 0).map(b => (id, b, hist(b)))
      }
      .toDF(idCol, "bin", "n")
  }

  /** Frame sampling as pure column expressions: fixed-size byte windows
    * every `stride` bytes (substring on binary is codegen'd — no UDF). */
  def frameSample(media: DataFrame, blobCol: String,
                  frameSize: Int, stride: Int): DataFrame =
    media.withColumn("frames",
      expr(s"transform(sequence(0, greatest((octet_length($blobCol) - $frameSize) div $stride, 0)), " +
        s"i -> substring($blobCol, i * $stride + 1, $frameSize))"))

  // ——————————————————————— audio: RIFF/WAVE PCM16 ———————————————————————
  // The second real modality. Same contract as the PGM image path: an
  // actual fixed-layout binary format parsed byte-for-byte, with the
  // reject-not-crash policy for every malformed shape, and a synthesized
  // corpus whose DECODED stats an independent engine re-derives from
  // `text` (q127). Demonstrates "swap the decoder" as a pattern, not a
  // claim: wavStats/pixelStats, extractFeatures, and the synthesize
  // fixtures are the same plumbing around a different codec.

  /** Decoded PCM16 audio: `samples` channel-interleaved, one Short per
    * sample, little-endian as stored. */
  final case class WavAudio(sampleRate: Int, nChannels: Int,
                            samples: Array[Short])

  /** Decode a canonical RIFF/WAVE payload carrying 16-bit integer PCM.
    * The actual RIFF grammar: `RIFF` magic, LE-u32 riff size (must equal
    * file length − 8 — a torn download fails here, not mid-raster),
    * `WAVE` form type, then a chunk walk (4-byte id, LE-u32 size, payload,
    * odd sizes padded to word alignment) in which `fmt ` must precede
    * `data` (the canonical ordering; a `data` met first is rejected, not
    * buffered). Chunks after `data` (LIST/INFO metadata) are tolerated —
    * they are common in the wild and the riff-size check still bounds
    * them.
    *
    * Malformed-bytes policy — None, never a throw or a misread, for:
    * wrong magic (an `RIFX` big-endian file is rejected, not
    * byte-swapped), riff size ≠ file length − 8, a chunk overrunning the
    * file, a `fmt ` chunk under 16 bytes, an audio format other than 1
    * (compressed/float WAVs are out of scope — reject, do not misdecode),
    * bits-per-sample ≠ 16 (an 8-bit raster decoded as 16-bit would serve
    * half the samples at garbage amplitudes), zero/absurd channel count
    * or rate, a blockAlign/byteRate inconsistent with the declared
    * layout, and a data size that is not a whole number of frames. */
  def decodeWav(blob: Array[Byte]): Option[WavAudio] = {
    if (blob == null || blob.length < 44) return None
    def u8(i: Int): Int = blob(i) & 0xff
    def le16(i: Int): Int = u8(i) | (u8(i + 1) << 8)
    def le32(i: Int): Long =
      u8(i) | (u8(i + 1) << 8) | (u8(i + 2) << 16) | (u8(i + 3).toLong << 24)
    def tag(i: Int, s: String): Boolean =
      i + 4 <= blob.length && (0 until 4).forall(j => blob(i + j) == s.charAt(j).toByte)
    if (!tag(0, "RIFF") || le32(4) != blob.length - 8L || !tag(8, "WAVE"))
      return None
    var i = 12L
    var fmt: Option[(Int, Int)] = None // (nChannels, sampleRate), validated
    var data: Option[(Int, Int)] = None // (offset, size)
    while (i + 8 <= blob.length && (fmt.isEmpty || data.isEmpty)) {
      val at = i.toInt
      val size = le32(at + 4)
      if (size < 0 || i + 8 + size > blob.length) return None
      if (tag(at, "fmt ")) {
        if (size < 16) return None
        val audioFormat = le16(at + 8)
        val nCh = le16(at + 10)
        val rate = le32(at + 12)
        val byteRate = le32(at + 16)
        val blockAlign = le16(at + 20)
        val bits = le16(at + 22)
        if (audioFormat != 1 || bits != 16) return None
        if (nCh < 1 || nCh > 8 || rate < 1 || rate > 1000000) return None
        if (blockAlign != nCh * 2 || byteRate != rate * blockAlign) return None
        fmt = Some((nCh, rate.toInt))
      } else if (tag(at, "data")) {
        if (fmt.isEmpty) return None
        data = Some((at + 8, size.toInt))
      }
      i += 8 + size + (size & 1) // odd chunk sizes carry a pad byte
    }
    for {
      (nCh, rate) <- fmt
      (off, sz) <- data
      if sz % (nCh * 2) == 0
    } yield {
      val n = sz / 2
      val samples = new Array[Short](n)
      var j = 0
      while (j < n) {
        samples(j) = (u8(off + 2 * j) | (u8(off + 2 * j + 1) << 8)).toShort
        j += 1
      }
      WavAudio(rate, nCh, samples)
    }
  }

  /** Encode a PCM16 WAV payload (the [[decodeWav]] inverse) — fixture/
    * ingest helper; round-trip identity is pinned in MultimodalSpec. */
  def encodeWav(a: WavAudio): Array[Byte] = {
    require(a.nChannels >= 1 && a.nChannels <= 8,
      s"channels out of range: ${a.nChannels}")
    require(a.sampleRate >= 1 && a.sampleRate <= 1000000,
      s"rate out of range: ${a.sampleRate}")
    require(a.samples.length % a.nChannels == 0,
      s"${a.samples.length} samples is not whole ${a.nChannels}-channel frames")
    // RIFF sizes are u32 and ByteBuffer.allocate takes an Int: validate the
    // Long product up front (the encodePgm overflow class — a ~1.07B-sample
    // input would otherwise allocate negative or stamp a corrupt size)
    require(a.samples.length.toLong * 2 <= Int.MaxValue - 44,
      s"${a.samples.length} samples exceed the 4 GiB RIFF/ByteBuffer bound")
    val dataSize = a.samples.length * 2
    val buf = java.nio.ByteBuffer.allocate(44 + dataSize)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataSize)
      .put("WAVEfmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1).putShort(a.nChannels.toShort).putInt(a.sampleRate)
      .putInt(a.sampleRate * a.nChannels * 2)
      .putShort((a.nChannels * 2).toShort).putShort(16)
      .put("data".getBytes("US-ASCII")).putInt(dataSize)
    a.samples.foreach(buf.putShort)
    buf.array()
  }

  /** `n`-byte little-endian encoding of a non-negative integral column,
    * as pure expressions (hex per byte → unhex): the binary-header
    * construction primitive [[synthesizeWav]] builds RIFF fields with. */
  private def leBin(c: Column, n: Int): Column =
    unhex(concat((0 until n).map(i =>
      lpad(hex(shiftright(c.cast("long"), 8 * i).bitwiseAND(lit(255L))),
        2, "0")): _*))

  /** Synthesize a VALID mono PCM16 WAV payload per document as pure column
    * expressions (no UDF, no driver): n_samples = id%200+50, rate =
    * 8000 + id%4·4000, and each sample's two little-endian bytes are the
    * document's UTF-8 bytes cycled (empty text → a single space) — so the
    * decoded amplitude of sample i is byte(2i) + 256·byte(2i+1), re-
    * derivable from `text` by an independent engine (q127's oracle
    * recomputes header arithmetic + cycle bytes in SQL; documents are
    * ASCII, pinned by q36's byte/char identity). Every `% 89 == 5` id gets
    * an `RIFX` magic instead — the real big-endian RIFF variant, which the
    * little-endian decoder must REJECT rather than byte-swap. */
  def synthesizeWav(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(col(idCol), wavBlobExpr(idCol, textCol).as("blob"))

  /** The WAV payload as a pure column expression — shared by
    * [[synthesizeWav]] and the mixed-media fixture. */
  private def wavBlobExpr(idCol: String, textCol: String): Column = {
    val ns = (col(idCol) % 200 + 50).cast("long")
    val dataSize = (ns * 2).cast("int")
    val rate = (col(idCol) % 4 * 4000 + 8000).cast("long")
    val t = when(length(coalesce(col(textCol), lit(""))) === 0, lit(" "))
      .otherwise(col(textCol))
    val reps = ceil(dataSize.cast("double") /
      greatest(call_function("octet_length", t), lit(1)).cast("double"))
      .cast("int")
    val pcm = call_function("substring",
      encode(call_function("repeat", t, reps), "UTF-8"), lit(1), dataSize)
    val magic = when(col(idCol) % 89 === 5, lit("RIFX")).otherwise(lit("RIFF"))
    concat(
      encode(magic, "UTF-8"), leBin(dataSize + 36, 4),
      encode(lit("WAVEfmt "), "UTF-8"), leBin(lit(16), 4),
      leBin(lit(1), 2), leBin(lit(1), 2), // PCM, mono
      leBin(rate, 4), leBin(rate * 2, 4), // byteRate = rate·blockAlign
      leBin(lit(2), 2), leBin(lit(16), 2), // blockAlign, bits
      encode(lit("data"), "UTF-8"), leBin(dataSize, 4),
      pcm)
  }

  /** A column of MIXED media — even ids carry binary-PGM images, odd ids
    * RIFF/WAVE PCM16 audio (both fixtures' corruption policies included:
    * every 97th-[3] even id is a P6, every 89th-[5] odd id an RIFX). The
    * production shape a multi-source ingest lands: one `binary` column,
    * format knowable only from the payload itself. */
  def synthesizeMixedMedia(docs: DataFrame, idCol: String,
                           textCol: String): DataFrame =
    docs.select(col(idCol),
      when(col(idCol) % 2 === 0, pgmBlobExpr(idCol, textCol))
        .otherwise(wavBlobExpr(idCol, textCol)).as("blob"))

  /** Decode + exact integer amplitude statistics — the oracle-able face of
    * the audio codec, [[pixelStats]]' twin: per payload (ok, sample_rate,
    * n_channels, n_samples, duration_micros, sum_amp, min_amp, max_amp,
    * sum_sq, mean_amp, rms) from the decoded samples; malformed payloads
    * surface as ok=false with NULL stats. duration_micros is integer
    * arithmetic (frames·10⁶ div rate); mean/rms are single IEEE operations
    * over exact integers, so they hash-match across engines. */
  def wavStats(media: DataFrame, idCol: String, blobCol: String): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col(idCol).cast("long"), col(blobCol)).as[(Long, Array[Byte])]
      .map { case (id, blob) =>
        decodeWav(blob) match {
          case Some(a) if a.samples.nonEmpty =>
            var s = 0L; var sq = 0L; var mn = Int.MaxValue; var mx = Int.MinValue
            var i = 0
            while (i < a.samples.length) {
              val v: Int = a.samples(i)
              s += v; sq += v.toLong * v
              if (v < mn) mn = v; if (v > mx) mx = v
              i += 1
            }
            val n = a.samples.length.toLong
            val frames = n / a.nChannels
            (id, true, Some(a.sampleRate), Some(a.nChannels), Some(n),
              Some(frames * 1000000L / a.sampleRate), Some(s), Some(mn),
              Some(mx), Some(sq), Some(s.toDouble / n),
              Some(math.sqrt(sq.toDouble / n)))
          case Some(a) => // decoded but empty data chunk: ok, all-zero stats
            (id, true, Some(a.sampleRate), Some(a.nChannels), Some(0L),
              Some(0L), Some(0L), None: Option[Int], None: Option[Int],
              Some(0L), None: Option[Double], None: Option[Double])
          case None =>
            (id, false, None: Option[Int], None: Option[Int],
              None: Option[Long], None: Option[Long], None: Option[Long],
              None: Option[Int], None: Option[Int], None: Option[Long],
              None: Option[Double], None: Option[Double])
        }
      }
      .toDF(idCol, "ok", "sample_rate", "n_channels", "n_samples",
        "duration_micros", "sum_amp", "min_amp", "max_amp", "sum_sq",
        "mean_amp", "rms")
  }

  // ————————————————— unified dispatch over mixed media —————————————————

  /** Container family from the payload's magic bytes — DETECTION only,
    * never validation: a `P6` color PPM sniffs as the Netpbm family and a
    * big-endian `RIFX` as the RIFF family, and it is the family's decoder
    * that then rejects them (ok=false). Anything else is `unknown`. */
  def sniffFormat(blob: Array[Byte]): String =
    if (blob == null || blob.length < 4) "unknown"
    else if (blob(0) == 'P' && blob(1) >= '1' && blob(1) <= '6') "pgm"
    else if (blob(0) == 'R' && blob(1) == 'I' && blob(2) == 'F') "wav"
    else "unknown"

  /** Decode a column of MIXED media: sniff each payload's container
    * family ([[sniffFormat]]), dispatch to that family's real decoder,
    * and emit one unified exact-integer stats row — (format, ok, n_units,
    * sum_val, min_val, max_val, mean_val), where a unit is a pixel
    * (luminance 0–255) for images and a sample (signed PCM16 amplitude)
    * for audio. Malformed payloads keep their detected format with
    * ok=false/NULL stats; unrecognized payloads are `unknown`. The entry
    * point the next codec plugs into: add a magic prefix and a decoder
    * arm, every caller is already format-agnostic. */
  def mediaStats(media: DataFrame, idCol: String, blobCol: String): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    def rejected(id: Long, fmt: String): (Long, String, Boolean,
        Option[Long], Option[Long], Option[Int], Option[Int], Option[Double]) =
      (id, fmt, false, None, None, None, None, None)
    media.select(col(idCol).cast("long"), col(blobCol)).as[(Long, Array[Byte])]
      .map { case (id, blob) =>
        sniffFormat(blob) match {
          case "pgm" => decodePgm(blob) match {
            case Some(img) =>
              var s = 0L; var mn = 255; var mx = 0; var i = 0
              while (i < img.pixels.length) {
                val v = img.pixels(i) & 0xff
                s += v; if (v < mn) mn = v; if (v > mx) mx = v; i += 1
              }
              val n = img.pixels.length.toLong
              (id, "pgm", true, Some(n), Some(s), Some(mn), Some(mx),
                Some(s.toDouble / n))
            case None => rejected(id, "pgm")
          }
          case "wav" => decodeWav(blob) match {
            case Some(a) if a.samples.nonEmpty =>
              var s = 0L; var mn = Int.MaxValue; var mx = Int.MinValue; var i = 0
              while (i < a.samples.length) {
                val v: Int = a.samples(i)
                s += v; if (v < mn) mn = v; if (v > mx) mx = v; i += 1
              }
              val n = a.samples.length.toLong
              (id, "wav", true, Some(n), Some(s), Some(mn), Some(mx),
                Some(s.toDouble / n))
            case Some(_) => // valid container, empty data chunk
              (id, "wav", true, Some(0L), Some(0L), None, None, None)
            case None => rejected(id, "wav")
          }
          case fmt => rejected(id, fmt)
        }
      }
      .toDF(idCol, "format", "ok", "n_units", "sum_val", "min_val",
        "max_val", "mean_val")
  }
}
