package graft.queries

import org.apache.spark.sql.functions._
import graft.sources.Tables
import graft.operators.Multimodal

/** Multimodal binary-column coverage: payload synthesis, typed metadata and
  * frame-sampling arithmetic are oracle-checked (q25), and the mapPartitions
  * batch-decode path is oracle-checked end-to-end via exact byte-bin
  * histograms (q36); the normalized float features remain ScalaTest-covered
  * (float division isn't bit-portable across engines).
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
             FROM documents ORDER BY doc_id""")),

    // The binary decode pipeline's oracle-able face: exact byte-bin
    // histograms from the mapPartitions batch path, recomputed by DuckDB
    // from the codepoints (payloads are ASCII text bytes, so
    // ascii(char) == byte value — asserted by the hash compare itself).
    Q("q36_media_histogram",
      (s, d) => {
        val media = Multimodal.synthesizeMedia(Tables.documents(s, d), "doc_id", "text")
        Multimodal.histogramCounts(media, "doc_id", "blob", bins = 16)
          .orderBy(col("doc_id"), col("bin"))
      },
      Some("""WITH bytes AS (
               SELECT doc_id,
                      unnest(list_transform(range(1, length(text) + 1),
                             i -> ascii(substr(text, i, 1)) // 16)) AS bin
               FROM documents)
             SELECT doc_id, CAST(bin AS INTEGER) AS bin,
                    CAST(COUNT(*) AS BIGINT) AS n
             FROM bytes GROUP BY doc_id, bin ORDER BY doc_id, bin"""))
  )
}
