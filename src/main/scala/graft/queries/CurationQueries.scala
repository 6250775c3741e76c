package graft.queries

import org.apache.spark.sql.functions._
import graft.sources.Tables
import graft.operators.Curation

/** Round-4 corpus-curation coverage: shard packing, vocabulary,
  * stratified sampling, int8 embedding quantization, dedup-aware
  * splitting, and the composed quality gate. All arithmetic is exact
  * integer math or integer-division doubles → bit-stable oracles.
  */
object CurationQueries {

  private val stopwords = Seq("the", "a", "of", "and", "to", "in")

  /** Raw (non-distinct) 3-shingle rows over `rel` — mirrors
    * Dedup.shingleRowsRaw; the distinct variant lives in
    * [[TextQueries.tokCtesOver]]. */
  private def rawShingleCte(rel: String) =
    s"""rsh AS (
       |  SELECT doc_id, s
       |  FROM (SELECT doc_id, string_split_regex(trim(lower(text)), '\\s+') AS w
       |        FROM $rel),
       |       UNNEST(list_transform(range(1, len(w) - 1),
       |         i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) AS t(s)
       |  WHERE len(w) >= 3)""".stripMargin

  /** The q52 quality-gate CTE chain (corpus = doc_id % 50 <> 0, eval =
    * the held-out rows) ending in a `gate` CTE with the full per-gate
    * attribution — shared by q52 (row-level) and q53 (per-source rollup). */
  private def gateSql(finalSelect: String) =
    s"""WITH c AS (SELECT * FROM documents WHERE doc_id % 50 <> 0),
       toks AS (
         SELECT doc_id, string_split_regex(trim(lower(text)), '\\s+') AS w
         FROM c),
       tr AS (SELECT doc_id, unnest(w) AS tok FROM toks),
       stats AS (
         SELECT doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_tokens,
           CAST(SUM(CASE WHEN tok IN ('the','a','of','and','to','in') THEN 1 ELSE 0 END) AS DOUBLE) / COUNT(*) AS stop_ratio
         FROM tr GROUP BY doc_id),
       ${rawShingleCte("c")},
       rep AS (
         SELECT doc_id,
           1.0 - CAST(COUNT(DISTINCT s) AS DOUBLE) / COUNT(*) AS repetition_ratio
         FROM rsh GROUP BY doc_id),
       etoks AS (
         SELECT string_split_regex(trim(lower(text)), '\\s+') AS w
         FROM documents WHERE doc_id % 50 = 0),
       esh AS (
         SELECT DISTINCT s
         FROM etoks, UNNEST(list_transform(range(1, len(w) - 1),
              i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) AS t(s)
         WHERE len(w) >= 3),
       ov AS (
         SELECT doc_id, COUNT(*) AS n_overlap
         FROM (SELECT DISTINCT doc_id, s FROM rsh)
         WHERE s IN (SELECT s FROM esh) GROUP BY doc_id),
       canon AS (SELECT md5(text) AS h, MIN(doc_id) AS k FROM c GROUP BY 1),
       base AS (
         SELECT s.doc_id, s.n_tokens, s.stop_ratio,
           COALESCE(r.repetition_ratio, 0.0) AS repetition_ratio,
           COALESCE(o.n_overlap, 0) > 0 AS contaminated,
           (d.doc_id = cn.k) AS is_canonical
         FROM stats s
         JOIN c d ON d.doc_id = s.doc_id
         JOIN canon cn ON md5(d.text) = cn.h
         LEFT JOIN rep r ON r.doc_id = s.doc_id
         LEFT JOIN ov o ON o.doc_id = s.doc_id),
       gate AS (
         SELECT doc_id, n_tokens, stop_ratio, repetition_ratio,
           contaminated, is_canonical,
           (n_tokens >= 30 AND n_tokens <= 10000) AS pass_length,
           (stop_ratio >= 0.02) AS pass_stopwords,
           (repetition_ratio <= 0.05) AS pass_repetition,
           ((n_tokens >= 30 AND n_tokens <= 10000)
            AND stop_ratio >= 0.02
            AND repetition_ratio <= 0.05
            AND NOT contaminated AND is_canonical) AS keep
         FROM base)
       $finalSelect"""

  val all: Seq[Q] = Seq(

    // Concat-and-chunk token packing into fixed-budget shards. The Spark
    // side computes the global prefix sum two-level (range partition →
    // per-partition offsets → local windows); the oracle is the plain
    // single-window definition — identical values prove the decomposition.
    Q("q47_pack_shards",
      (s, d) => Curation.packShards(Tables.documents(s, d), "doc_id", "text",
          tokensPerShard = 500L)
        .orderBy(col("doc_id")),
      Some("""WITH t AS (
               SELECT doc_id,
                 CAST(len(string_split_regex(trim(lower(text)), '\s+')) AS BIGINT) AS n_tokens
               FROM documents),
             o AS (
               SELECT doc_id, n_tokens,
                 CAST(COALESCE(SUM(n_tokens) OVER (ORDER BY doc_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS start_offset
               FROM t)
             SELECT doc_id, n_tokens, start_offset,
               CAST(start_offset // 500 AS BIGINT) AS shard
             FROM o ORDER BY doc_id""")),

    // Top-100 vocabulary by collection frequency with document frequency.
    Q("q48_vocabulary",
      (s, d) => Curation.vocabulary(Tables.documents(s, d), "doc_id", "text",
          topK = 100)
        .withColumnRenamed("rank", "rnk")
        .orderBy(col("rnk")),
      Some("""WITH tr AS (
               SELECT doc_id, unnest(string_split_regex(trim(lower(text)), '\s+')) AS term
               FROM documents),
             v AS (
               SELECT term, CAST(COUNT(*) AS BIGINT) AS cf,
                 CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS df
               FROM tr GROUP BY term),
             r AS (
               SELECT *, CAST(row_number() OVER (ORDER BY cf DESC, term) AS BIGINT) AS rnk
               FROM v)
             SELECT term, cf, df, rnk FROM r WHERE rnk <= 100 ORDER BY rnk""")),

    // Deterministic stratified sample: 20 docs per language by md5-rank.
    Q("q49_stratified_sample",
      (s, d) => Curation.stratifiedSample(Tables.documents(s, d), "lang", "doc_id",
          nPerStratum = 20)
        .select(col("doc_id"), col("lang"), col("source"))
        .orderBy(col("doc_id")),
      Some("""SELECT doc_id, lang, source FROM documents
             QUALIFY row_number() OVER (PARTITION BY lang
               ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) <= 20
             ORDER BY doc_id""")),

    // Symmetric int8 embedding quantization — the full quantized vector
    // (as CSV), its scale, and the exact integer error numerator are all
    // hash-compared cross-engine.
    Q("q50_quantize_int8",
      (s, d) => Curation.quantizeInt8(Tables.embeddings(s, d), "vec_id", "embedding")
        .orderBy(col("vec_id")),
      Some("""WITH fx AS (
               SELECT vec_id,
                 list_transform(embedding,
                   x -> CAST(floor(CAST(x AS DOUBLE) * 1048576.0) AS BIGINT)) AS f
               FROM embeddings),
             sc AS (
               SELECT vec_id, f,
                 CAST(list_max(list_transform(f, v -> abs(v))) AS BIGINT) AS scale_fp
               FROM fx),
             q AS (
               SELECT vec_id, f, scale_fp,
                 list_transform(f, v -> CASE WHEN scale_fp = 0 THEN 0
                   WHEN v < 0 THEN -(((-v) * 127) // scale_fp)
                   ELSE (v * 127) // scale_fp END) AS qv
               FROM sc)
             SELECT vec_id, scale_fp,
               CAST(len(f) AS BIGINT) AS n_dims,
               array_to_string(list_transform(qv, v -> CAST(v AS VARCHAR)), ',') AS qvec_csv,
               CAST(list_sum(list_transform(range(1, len(f) + 1),
                 i -> abs(f[i] * 127 - qv[i] * scale_fp))) AS BIGINT) AS err_num
             FROM q ORDER BY vec_id""")),

    // Dedup-aware split: near-dup clusters (q15 pair graph → q38
    // components) share one split via the canonical id's hash bucket.
    Q("q51_dedup_split",
      (s, d) => Curation.dedupAwareSplit(Tables.documents(s, d), "doc_id", "text",
          trainPct = 80, valPct = 10)
        .orderBy(col("doc_id")),
      Some(s"""WITH RECURSIVE ${TextQueries.minhashPairCtesOver("documents")},
             nodes AS (
               SELECT DISTINCT v FROM (
                 SELECT doc_a AS v FROM pairs
                 UNION ALL SELECT doc_b FROM pairs)),
             e2 AS (
               SELECT doc_a AS src, doc_b AS dst FROM pairs
               UNION ALL SELECT doc_b, doc_a FROM pairs),
             reach(v, r) AS (
               SELECT v, v FROM nodes
               UNION
               SELECT reach.v, e2.dst FROM reach JOIN e2 ON e2.src = reach.r),
             comp AS (
               SELECT v AS id, MIN(r) AS component FROM reach GROUP BY v),
             canon AS (
               SELECT d.doc_id, COALESCE(c.component, d.doc_id) AS canonical_id
               FROM documents d LEFT JOIN comp c ON c.id = d.doc_id)
             SELECT doc_id, canonical_id,
               CASE WHEN b < 80 THEN 'train' WHEN b < 90 THEN 'val'
                    ELSE 'test' END AS split
             FROM (
               SELECT doc_id, canonical_id,
                 ((strpos('0123456789abcdef', substr(md5(CAST(canonical_id AS VARCHAR)), 1, 1)) - 1) * 16
                  + (strpos('0123456789abcdef', substr(md5(CAST(canonical_id AS VARCHAR)), 2, 1)) - 1)) % 100 AS b
               FROM canon)
             ORDER BY doc_id""")),

    // The composed quality gate over the corpus (eval set = doc_id % 50 = 0
    // holdout, as q42): length, stopword, repetition, contamination and
    // exact-dup gates with full per-gate attribution.
    Q("q52_curate",
      (s, d) => {
        val docs = Tables.documents(s, d)
        Curation.curate(
            docs.filter(col("doc_id") % 50 =!= 0),
            docs.filter(col("doc_id") % 50 === 0),
            "doc_id", "text", stopwords,
            minTokens = 30L, maxTokens = 10000L,
            minStopRatio = 0.02, maxRepetition = 0.05)
          .orderBy(col("doc_id"))
      },
      Some(gateSql("""SELECT doc_id, n_tokens, stop_ratio, repetition_ratio,
               contaminated, is_canonical, pass_length, pass_stopwords,
               pass_repetition, keep
             FROM gate ORDER BY doc_id"""))),

    // Per-source curation scorecard: the q52 gate rolled up by ingestion
    // source with per-failure-mode counts — which crawls/feeds to
    // deprioritize. Pure integer counts + one integer-division rate.
    Q("q53_source_quality",
      (s, d) => {
        val docs = Tables.documents(s, d)
        val gated = Curation.curate(
          docs.filter(col("doc_id") % 50 =!= 0),
          docs.filter(col("doc_id") % 50 === 0),
          "doc_id", "text", stopwords,
          minTokens = 30L, maxTokens = 10000L,
          minStopRatio = 0.02, maxRepetition = 0.05)
        Curation.sourceQuality(gated, docs, "doc_id", "source")
          .orderBy(col("source"))
      },
      Some(gateSql("""SELECT d.source,
               CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(SUM(CASE WHEN g.keep THEN 1 ELSE 0 END) AS BIGINT) AS n_keep,
               CAST(SUM(CASE WHEN NOT g.pass_length THEN 1 ELSE 0 END) AS BIGINT) AS n_bad_length,
               CAST(SUM(CASE WHEN NOT g.pass_stopwords THEN 1 ELSE 0 END) AS BIGINT) AS n_low_stopword,
               CAST(SUM(CASE WHEN NOT g.pass_repetition THEN 1 ELSE 0 END) AS BIGINT) AS n_repetitive,
               CAST(SUM(CASE WHEN g.contaminated THEN 1 ELSE 0 END) AS BIGINT) AS n_contaminated,
               CAST(SUM(CASE WHEN NOT g.is_canonical THEN 1 ELSE 0 END) AS BIGINT) AS n_exact_dups,
               CAST(SUM(CASE WHEN g.keep THEN 1 ELSE 0 END) AS DOUBLE) / COUNT(*) AS keep_rate
             FROM gate g JOIN documents d ON d.doc_id = g.doc_id
             GROUP BY d.source ORDER BY d.source"""))),

    // Domain mixture weights at alpha = 0.5 with a 1M-token budget: the
    // pow() is fixed-pointed to integer thousandths, so the normalizer and
    // both ratios are exact cross-engine.
    Q("q56_mixture_weights",
      (s, d) => Curation.mixtureWeights(Tables.documents(s, d), "doc_id", "text",
          "source", alpha = 0.5, tokenBudget = 1000000L)
        .orderBy(col("source")),
      Some("""WITH t AS (
               SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
                 CAST(SUM(len(string_split_regex(trim(lower(text)), '\s+'))) AS BIGINT) AS n_tokens
               FROM documents GROUP BY source),
             p AS (
               SELECT *, CAST(round(pow(CAST(n_tokens AS DOUBLE), 0.5) * 1000, 0) AS BIGINT) AS pw
               FROM t),
             s AS (SELECT CAST(SUM(pw) AS BIGINT) AS sp FROM p)
             SELECT source, n_docs, n_tokens,
               CAST(pw AS DOUBLE) / sp AS weight,
               CAST(pw * 1000000 AS DOUBLE) / (sp * n_tokens) AS epochs
             FROM p, s ORDER BY source""")),

    // Adaptive length gate: thresholds are the corpus's own 5th/95th token-
    // count percentiles (exact interpolated, round-6 — the q44 recipe).
    Q("q60_adaptive_gate",
      (s, d) => Curation.adaptiveLengthGate(Tables.documents(s, d), "doc_id", "text",
          loPct = 0.05, hiPct = 0.95)
        .orderBy(col("doc_id")),
      Some("""WITH t AS (
               SELECT doc_id,
                 CAST(len(string_split_regex(trim(lower(text)), '\s+')) AS BIGINT) AS n_tokens
               FROM documents),
             b AS (
               SELECT ROUND(quantile_cont(n_tokens, 0.05), 6) AS lo,
                      ROUND(quantile_cont(n_tokens, 0.95), 6) AS hi
               FROM t)
             SELECT doc_id, n_tokens, lo, hi,
               (n_tokens >= lo AND n_tokens <= hi) AS keep
             FROM t, b ORDER BY doc_id""")),

    // Token-budget truncation at 64 tokens: the cut text itself is
    // hash-compared cross-engine.
    Q("q61_truncate",
      (s, d) => Curation.truncateTokens(Tables.documents(s, d), "doc_id", "text",
          maxTokens = 64)
        .orderBy(col("doc_id")),
      Some("""WITH t AS (
               SELECT doc_id, string_split_regex(trim(text), '\s+') AS w
               FROM documents)
             SELECT doc_id,
               CAST(len(w) AS BIGINT) AS n_tokens,
               CAST(least(len(w), 64) AS BIGINT) AS kept_tokens,
               (len(w) > 64) AS truncated,
               array_to_string(list_slice(w, 1, 64), ' ') AS text_trunc
             FROM t ORDER BY doc_id""")),

    // Per-domain cap: at most 20 docs per source survive, md5-uniform pick.
    Q("q63_domain_cap",
      (s, d) => Curation.domainCap(Tables.documents(s, d), "doc_id", "source",
          maxPerSource = 20)
        .orderBy(col("doc_id")),
      Some("""WITH r AS (
               SELECT doc_id, source,
                 CAST(row_number() OVER (PARTITION BY source
                   ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS BIGINT)
                   AS pick_order
               FROM documents)
             SELECT doc_id, source, pick_order, (pick_order <= 20) AS keep
             FROM r ORDER BY doc_id""")),

    // Overlapping-window chunking: 48-token chunks every 32 tokens; the
    // chunk text itself is hash-compared cross-engine.
    Q("q67_chunk_docs",
      (s, d) => Curation.chunkDocs(Tables.documents(s, d), "doc_id", "text",
          chunkTokens = 48, strideTokens = 32)
        .orderBy(col("doc_id"), col("chunk_id")),
      Some("""WITH t AS (
               SELECT doc_id, string_split_regex(trim(text), '\s+') AS w,
                 CAST(len(string_split_regex(trim(text), '\s+')) AS BIGINT) AS n
               FROM documents),
             c AS (
               SELECT doc_id, w, n,
                 CASE WHEN n <= 48 THEN 0
                      ELSE (n - 48 + 32 - 1) // 32 END AS mx
               FROM t)
             SELECT doc_id, CAST(i AS BIGINT) AS chunk_id, n AS n_tokens,
               CAST(least(48, n - i * 32) AS BIGINT) AS n_chunk_tokens,
               array_to_string(list_slice(w, CAST(i * 32 + 1 AS INT),
                 CAST(i * 32 + 48 AS INT)), ' ') AS chunk_text
             FROM c, UNNEST(range(0, mx + 1)) AS t2(i)
             ORDER BY doc_id, chunk_id""")),

    // Exact-size deterministic uniform sample: 100 docs by md5 order.
    Q("q69_sample_exact",
      (s, d) => Curation.sampleExact(Tables.documents(s, d), "doc_id", n = 100)
        .orderBy(col("sample_rank")),
      Some("""WITH r AS (
               SELECT doc_id,
                 CAST(row_number() OVER (ORDER BY md5(CAST(doc_id AS VARCHAR)),
                   doc_id) AS BIGINT) AS sample_rank
               FROM documents)
             SELECT doc_id, sample_rank FROM r
             WHERE sample_rank <= 100 ORDER BY sample_rank""")),

    // Zipf head-mass: coverage of the top-k terms at k = 1, 5, 10, 25.
    Q("q71_coverage_at_k",
      (s, d) => Curation.coverageAtK(Tables.documents(s, d), "doc_id", "text",
          ks = Seq(1, 5, 10, 25))
        .orderBy(col("k")),
      Some("""WITH tr AS (
               SELECT unnest(string_split_regex(trim(lower(text)), '\s+')) AS term
               FROM documents),
             cf AS (SELECT term, CAST(COUNT(*) AS BIGINT) AS cf
                    FROM tr GROUP BY term),
             tot AS (SELECT CAST(SUM(cf) AS BIGINT) AS total_cf FROM cf),
             rk AS (SELECT cf,
                      row_number() OVER (ORDER BY cf DESC, term) AS rk,
                      SUM(cf) OVER (ORDER BY cf DESC, term
                        ROWS UNBOUNDED PRECEDING) AS cum
                    FROM cf)
             SELECT CAST(v.k AS BIGINT) AS k,
               CAST(r.cum AS BIGINT) AS top_cf_sum, t.total_cf,
               CAST(r.cum AS DOUBLE) / t.total_cf AS coverage
             FROM (VALUES (1), (5), (10), (25)) v(k)
             JOIN rk r ON r.rk = v.k, tot t ORDER BY k""")),

    // Largest-remainder apportionment of a 1M-token budget across sources
    // (alpha 0.5, q56's weights): per-source integer quotas summing
    // exactly to the budget.
    Q("q75_allocate_budget",
      (s, d) => Curation.allocateBudget(Tables.documents(s, d), "doc_id", "text",
          "source", alpha = 0.5, tokenBudget = 1000000L)
        .orderBy(col("source")),
      Some("""WITH t AS (
               SELECT source,
                 CAST(SUM(len(string_split_regex(trim(lower(text)), '\s+'))) AS BIGINT)
                   AS n_tokens
               FROM documents GROUP BY source),
             p AS (
               SELECT *, CAST(round(pow(CAST(n_tokens AS DOUBLE), 0.5) * 1000, 0)
                 AS BIGINT) AS pw
               FROM t),
             sp AS (SELECT CAST(SUM(pw) AS BIGINT) AS sp FROM p),
             sh AS (
               SELECT source, n_tokens,
                 CAST(pw AS DOUBLE) * 1000000 / sp AS share
               FROM p, sp),
             b AS (
               SELECT source, n_tokens,
                 CAST(floor(share) AS BIGINT) AS base_tokens,
                 share - floor(share) AS frac
               FROM sh),
             tb AS (SELECT CAST(SUM(base_tokens) AS BIGINT) AS tb FROM b),
             r AS (
               SELECT b.*, tb.tb,
                 row_number() OVER (ORDER BY frac DESC, source) AS rk
               FROM b, tb)
             SELECT source, n_tokens, base_tokens,
               base_tokens + CASE WHEN rk <= 1000000 - tb THEN 1 ELSE 0 END
                 AS alloc_tokens
             FROM r ORDER BY source""")),

    // Weighted sample (Efraimidis-Spirakis keys, md5 uniforms, round-6 ln):
    // 50 docs drawn with probability proportional to n_chars.
    Q("q77_weighted_sample",
      (s, d) => Curation.weightedSample(Tables.documents(s, d), "doc_id",
          "n_chars", n = 50)
        .orderBy(col("sample_rank")),
      Some("""WITH hx AS (
               SELECT doc_id, CAST(n_chars AS DOUBLE) AS weight,
                 substr(md5(CAST(doc_id AS VARCHAR)), 1, 15) AS hs
               FROM documents WHERE n_chars > 0),
             hv AS (
               SELECT doc_id, weight,
                 CAST(list_sum(list_transform(range(1, 16),
                   i -> (CAST(strpos('0123456789abcdef',
                           substr(hs, CAST(i AS INT), 1)) - 1 AS BIGINT)
                        << CAST(4 * (15 - i) AS INT)))) AS BIGINT) AS h
               FROM hx),
             sc AS (
               SELECT doc_id, weight,
                 round(ln(CAST(h + 1 AS DOUBLE) / 1152921504606846976.0)
                   / weight, 6) AS score
               FROM hv),
             r AS (SELECT *, row_number() OVER (ORDER BY score DESC, doc_id)
                     AS rk FROM sc)
             SELECT doc_id, weight, score, CAST(rk AS BIGINT) AS sample_rank
             FROM r WHERE rk <= 50 ORDER BY sample_rank""")),

    // Corpus snapshot diff: old = ids ≢1 (mod 10), new = ids ≢2 (mod 10)
    // with every 7th doc's text re-rendered — classifies added / removed /
    // changed / unchanged via narrow (id, md5) full-outer join.
    Q("q82_snapshot_diff",
      (s, d) => {
        val docs = Tables.documents(s, d)
        val oldSnap = docs.filter(col("doc_id") % 10 =!= 1)
        val newSnap = docs.filter(col("doc_id") % 10 =!= 2)
          .withColumn("text",
            when(col("doc_id") % 7 === 0, concat(col("text"), lit(" v2")))
              .otherwise(col("text")))
        Curation.snapshotDiff(oldSnap, newSnap, "doc_id", "text")
          .orderBy(col("doc_id"))
      },
      Some("""WITH o AS (
               SELECT doc_id, md5(text) AS old_hash
               FROM documents WHERE doc_id % 10 <> 1),
             n AS (
               SELECT doc_id,
                 md5(CASE WHEN doc_id % 7 = 0 THEN text || ' v2' ELSE text END)
                   AS new_hash
               FROM documents WHERE doc_id % 10 <> 2)
             SELECT COALESCE(o.doc_id, n.doc_id) AS doc_id, old_hash, new_hash,
               CASE WHEN old_hash IS NULL THEN 'added'
                    WHEN new_hash IS NULL THEN 'removed'
                    WHEN old_hash = new_hash THEN 'unchanged'
                    ELSE 'changed' END AS status
             FROM o FULL OUTER JOIN n ON n.doc_id = o.doc_id
             ORDER BY doc_id"""))
  )
}
