package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: image/audio/video payloads as opaque
  * `binary` columns with typed metadata, plus partition-parallel
  * decode/feature-extract/frame-sample operators.
  *
  * Training-data-pipeline extension (the reference is text/relational only).
  * The Spark-side plumbing — schema, batch iteration, partitioning — is
  * real; the codec itself is STUBBED with a deterministic byte-level fake
  * (`decodeStub`), because no image/audio libraries exist in this
  * environment. Swapping in a real codec changes ONE function.
  *
  * Scale notes: payloads never hit the driver; `mapPartitions` streams
  * batches through the "decoder" exactly the way a vectorized UDF would, and
  * frame sampling is pure column expressions (codegen, no JVM object churn).
  */
object Multimodal {

  /** Typed metadata carried alongside every payload. */
  case class MediaMeta(format: String, width: Int, height: Int, nFrames: Int)

  case class MediaRow(id: Long, blob: Array[Byte], format: String)
  case class MediaFeatures(id: Long, nBytes: Int, features: Array[Float])

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

  /** Deterministic stand-in for a codec: byte-value histogram normalized to
    * unit L1 mass. Replace with a real decoder (JPEG → pixels, WAV → PCM)
    * without touching the pipeline around it. */
  def decodeStub(blob: Array[Byte], bins: Int): Array[Float] = {
    val hist = new Array[Float](bins)
    if (blob == null || blob.isEmpty) return hist
    var i = 0
    while (i < blob.length) { hist((blob(i) & 0xff) * bins / 256) += 1f; i += 1 }
    val n = blob.length.toFloat
    var b = 0
    while (b < bins) { hist(b) /= n; b += 1 }
    hist
  }

  /** Partition-parallel feature extraction over the binary column — the
    * Spark-side shape of a batched decode UDF: iterator in, iterator out,
    * constant memory per partition, no driver involvement. */
  def extractFeatures(media: DataFrame, idCol: String, blobCol: String,
                      bins: Int = 16): Dataset[MediaFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col(idCol).cast("long"), col(blobCol)).as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, blob) =>
        MediaFeatures(id, if (blob == null) 0 else blob.length, decodeStub(blob, bins))
      })
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
}
