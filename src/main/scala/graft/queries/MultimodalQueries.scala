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

    // The REAL codec end to end: synthesize valid binary-PGM files (P5
    // header + cyclic-text raster, every 97th-[3] id corrupted to a P6
    // magic), DECODE them with the actual format parser, and emit exact
    // integer pixel stats. The oracle re-derives header arithmetic and
    // the cyclic raster from `text` in SQL (docs are ASCII — pinned by
    // q36's byte/char identity) and must match the DECODED values; the
    // corrupted ids must come back ok=false with NULL stats — the
    // malformed-bytes policy as data, hash-checked.
    Q("q126_pgm_decode",
      (s, d) => {
        val media = Multimodal.synthesizePgm(Tables.documents(s, d), "doc_id", "text")
        Multimodal.pixelStats(media, "doc_id", "blob")
          .orderBy(col("doc_id"))
      },
      Some("""WITH p AS (
               SELECT doc_id,
                 CASE WHEN length(coalesce(text, '')) = 0 THEN ' ' ELSE text END AS t,
                 CAST(doc_id % 16 + 8 AS INTEGER) AS w,
                 CAST(doc_id % 12 + 6 AS INTEGER) AS h
               FROM documents),
             d AS (SELECT doc_id, t, w, h, w * h AS np,
                     length(t) AS lt FROM p),
             px AS (
               SELECT doc_id,
                 ascii(substr(t, CAST(i % lt AS INTEGER) + 1, 1)) AS v
               FROM d, UNNEST(range(0, np)) AS u(i)
               WHERE doc_id % 97 <> 3),
             ag AS (
               SELECT doc_id, CAST(SUM(v) AS BIGINT) AS sum_lum,
                 CAST(MIN(v) AS INTEGER) AS min_lum,
                 CAST(MAX(v) AS INTEGER) AS max_lum
               FROM px GROUP BY doc_id)
             SELECT d.doc_id, (d.doc_id % 97 <> 3) AS ok,
               CASE WHEN d.doc_id % 97 <> 3 THEN d.w END AS width,
               CASE WHEN d.doc_id % 97 <> 3 THEN d.h END AS height,
               CASE WHEN d.doc_id % 97 <> 3 THEN CAST(d.np AS BIGINT) END
                 AS n_pixels,
               ag.sum_lum, ag.min_lum, ag.max_lum,
               CAST(ag.sum_lum AS DOUBLE) / d.np AS mean_lum
             FROM d LEFT JOIN ag USING (doc_id)
             ORDER BY doc_id""")),

    // The SECOND real codec, same contract as q126: synthesize valid
    // RIFF/WAVE PCM16 files (44-byte canonical header + cyclic-text
    // little-endian samples, every 89th-[5] id corrupted to an RIFX
    // magic), DECODE them with the actual RIFF chunk-walk parser, and
    // emit exact integer amplitude stats. The oracle re-derives header
    // arithmetic and sample values (byte(2i) + 256·byte(2i+1) over the
    // text cycle) in SQL; corrupted ids come back ok=false/NULL —
    // the malformed-bytes policy as data, hash-checked.
    Q("q127_wav_decode",
      (s, d) => {
        val media = Multimodal.synthesizeWav(Tables.documents(s, d), "doc_id", "text")
        Multimodal.wavStats(media, "doc_id", "blob")
          .orderBy(col("doc_id"))
      },
      Some("""WITH p AS (
               SELECT doc_id,
                 CASE WHEN length(coalesce(text, '')) = 0 THEN ' ' ELSE text END AS t,
                 CAST(doc_id % 200 + 50 AS BIGINT) AS ns,
                 CAST(doc_id % 4 * 4000 + 8000 AS INTEGER) AS rate
               FROM documents),
             d AS (SELECT doc_id, t, ns, rate, length(t) AS lt FROM p),
             sm AS (
               SELECT doc_id,
                 ascii(substr(t, CAST((2*i) % lt AS INTEGER) + 1, 1))
                   + 256 * ascii(substr(t, CAST((2*i+1) % lt AS INTEGER) + 1, 1))
                   AS v
               FROM d, UNNEST(range(0, ns)) AS u(i)
               WHERE doc_id % 89 <> 5),
             ag AS (
               SELECT doc_id, CAST(SUM(v) AS BIGINT) AS sum_amp,
                 CAST(MIN(v) AS INTEGER) AS min_amp,
                 CAST(MAX(v) AS INTEGER) AS max_amp,
                 CAST(SUM(CAST(v AS BIGINT) * v) AS BIGINT) AS sum_sq
               FROM sm GROUP BY doc_id)
             SELECT d.doc_id, (d.doc_id % 89 <> 5) AS ok,
               CASE WHEN d.doc_id % 89 <> 5 THEN d.rate END AS sample_rate,
               CASE WHEN d.doc_id % 89 <> 5 THEN 1 END AS n_channels,
               CASE WHEN d.doc_id % 89 <> 5 THEN d.ns END AS n_samples,
               CASE WHEN d.doc_id % 89 <> 5 THEN d.ns * 1000000 // d.rate END
                 AS duration_micros,
               ag.sum_amp, ag.min_amp, ag.max_amp, ag.sum_sq,
               CAST(ag.sum_amp AS DOUBLE) / d.ns AS mean_amp,
               sqrt(CAST(ag.sum_sq AS DOUBLE) / d.ns) AS rms
             FROM d LEFT JOIN ag USING (doc_id)
             ORDER BY doc_id""")),

    // Unified media dispatch over a MIXED binary column (VERDICT r12 #7):
    // one column interleaving PGM images (even ids) and WAV audio (odd
    // ids), format knowable only from the payload. mediaStats sniffs each
    // payload's magic bytes, dispatches to that family's real decoder,
    // and emits one unified exact-integer stats row; both fixtures'
    // corruption policies ride along (P6 / RIFX → detected format kept,
    // ok=false, NULL stats). The oracle re-derives the parity split, both
    // headers' arithmetic, and both families' cyclic-text values in SQL.
    Q("q128_media_dispatch",
      (s, d) => {
        val media = Multimodal.synthesizeMixedMedia(
          Tables.documents(s, d), "doc_id", "text")
        Multimodal.mediaStats(media, "doc_id", "blob")
          .orderBy(col("doc_id"))
      },
      Some("""WITH p AS (
               SELECT doc_id,
                 CASE WHEN length(coalesce(text, '')) = 0 THEN ' ' ELSE text END AS t,
                 CAST(doc_id % 16 + 8 AS INTEGER) * CAST(doc_id % 12 + 6 AS INTEGER) AS np,
                 CAST(doc_id % 200 + 50 AS BIGINT) AS ns
               FROM documents),
             d AS (
               SELECT doc_id, t, length(t) AS lt,
                 doc_id % 2 = 0 AS is_pgm,
                 CASE WHEN doc_id % 2 = 0 THEN doc_id % 97 <> 3
                      ELSE doc_id % 89 <> 5 END AS ok,
                 CASE WHEN doc_id % 2 = 0 THEN CAST(np AS BIGINT) ELSE ns END
                   AS n_units
               FROM p),
             vals AS (
               SELECT doc_id,
                 CASE WHEN is_pgm
                   THEN ascii(substr(t, CAST(i % lt AS INTEGER) + 1, 1))
                   ELSE ascii(substr(t, CAST((2*i) % lt AS INTEGER) + 1, 1))
                     + 256 * ascii(substr(t, CAST((2*i+1) % lt AS INTEGER) + 1, 1))
                 END AS v
               FROM d, UNNEST(range(0, n_units)) AS u(i)
               WHERE ok),
             ag AS (
               SELECT doc_id, CAST(SUM(v) AS BIGINT) AS sum_val,
                 CAST(MIN(v) AS INTEGER) AS min_val,
                 CAST(MAX(v) AS INTEGER) AS max_val
               FROM vals GROUP BY doc_id)
             SELECT d.doc_id,
               CASE WHEN d.is_pgm THEN 'pgm' ELSE 'wav' END AS format,
               d.ok,
               CASE WHEN d.ok THEN d.n_units END AS n_units,
               ag.sum_val, ag.min_val, ag.max_val,
               CAST(ag.sum_val AS DOUBLE) / d.n_units AS mean_val
             FROM d LEFT JOIN ag USING (doc_id)
             ORDER BY doc_id""")),

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
