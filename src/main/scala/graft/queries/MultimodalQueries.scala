package graft.queries

import org.apache.spark.sql.functions._
import graft.sources.Tables
import graft.operators.Multimodal

/** Multimodal binary-column coverage: payload synthesis, typed metadata and
  * frame-sampling arithmetic are oracle-checked; the mapPartitions feature
  * extraction (decoder stub) is covered by ScalaTest — a byte histogram has
  * no natural SQL oracle.
  */
object MultimodalQueries {

  val all: Seq[Q] = Seq(

    Q("q25_multimodal_meta",
      (s, d) => {
        val media = Multimodal.synthesizeMedia(Tables.documents(s, d), "doc_id", "text")
        Multimodal.frameSample(media, "blob", frameSize = 64, stride = 32)
          .select(
            col("doc_id"),
            octet_length(col("blob")).as("n_bytes"),
            col("meta.format").as("format"),
            col("meta.width").as("width"),
            col("meta.height").as("height"),
            col("meta.n_frames").as("n_frames"),
            size(col("frames")).as("n_sampled_frames"))
          .orderBy(col("doc_id"))
      },
      Some("""SELECT doc_id,
                    octet_length(encode(text)) AS n_bytes,
                    (['jpeg','png','wav','mp4'])[CAST(doc_id % 4 + 1 AS INT)] AS format,
                    CAST(doc_id % 64 * 16 + 128 AS INTEGER) AS width,
                    CAST(doc_id % 48 * 16 + 96 AS INTEGER) AS height,
                    CAST(octet_length(encode(text)) // 256 + 1 AS INTEGER) AS n_frames,
                    CAST(greatest((octet_length(encode(text)) - 64) // 32, 0) + 1 AS INTEGER)
                      AS n_sampled_frames
             FROM documents ORDER BY doc_id"""))
  )
}
