package graft.queries

import org.apache.spark.sql.functions._
import graft.sources.Tables
import graft.operators.{Dedup, TextAnalysis}

/** Training-data-pipeline coverage over `documents`: exact dedup,
  * MinHash+LSH near-dup, SimHash fingerprints, token/quality/language
  * profiling. All hashing is md5 so every step is oracle-checkable.
  */
object TextQueries {

  private val stopwords = Seq("the", "a", "of", "and", "to", "in")

  /** Shared DuckDB CTEs: tokens and distinct 3-shingles over `rel`,
    * matching Dedup.tokens / Dedup.shingleRows semantics exactly. */
  private[queries] def tokCtesOver(rel: String) =
    s"""toks AS (
       |  SELECT doc_id, string_split_regex(trim(lower(text)), '\\s+') AS w
       |  FROM $rel),
       |sh AS (
       |  SELECT DISTINCT doc_id, s
       |  FROM toks, UNNEST(list_transform(range(1, len(w) - 1),
       |       i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) AS t(s)
       |  WHERE len(w) >= 3)""".stripMargin
  private val tokCtes = tokCtesOver("documents")

  /** Shared DuckDB CTE chain re-deriving the complete MinHash+LSH pair
    * pipeline (mirrors Dedup.minhashNearDups at q15's parameters) over
    * `rel`, up to a `pairs(doc_a, doc_b, jaccard)` relation — consumed by
    * the q15 oracle directly, q38's recursive component closure, and q40's
    * full-dedup composition. */
  private[queries] def minhashPairCtesOver(rel: String) =
    s"""${tokCtesOver(rel)},
       |sig AS (
       |  SELECT doc_id,
       |    ${(0 until 8).map(i =>
            s"MIN(substr(md5('${i / 4}:' || s), ${(i % 4) * 8 + 1}, 8)) AS h$i")
            .mkString(", ")}
       |  FROM sh GROUP BY doc_id),
       |bands AS (
       |  ${(0 until 4).map(b =>
            s"SELECT doc_id, $b AS band, h${2 * b} || h${2 * b + 1} AS band_key FROM sig")
            .mkString("\n  UNION ALL ")}),
       |ok AS (
       |  SELECT band, band_key FROM bands
       |  GROUP BY band, band_key HAVING COUNT(*) <= 100),
       |bb AS (
       |  SELECT b.* FROM bands b JOIN ok
       |    ON b.band = ok.band AND b.band_key = ok.band_key),
       |cand AS (
       |  SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b
       |  FROM bb x JOIN bb y
       |    ON x.band = y.band AND x.band_key = y.band_key
       |   AND x.doc_id < y.doc_id),
       |sizes AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
       |inter AS (
       |  SELECT c.doc_a, c.doc_b, COUNT(*) AS ni
       |  FROM cand c
       |  JOIN sh a ON a.doc_id = c.doc_a
       |  JOIN sh b ON b.doc_id = c.doc_b AND b.s = a.s
       |  GROUP BY c.doc_a, c.doc_b),
       |pairs AS (
       |  SELECT i.doc_a, i.doc_b,
       |         CAST(i.ni AS DOUBLE) / (sa.n + sb.n - i.ni) AS jaccard
       |  FROM inter i
       |  JOIN sizes sa ON sa.doc_id = i.doc_a
       |  JOIN sizes sb ON sb.doc_id = i.doc_b
       |  WHERE CAST(i.ni AS DOUBLE) / (sa.n + sb.n - i.ni) >= 0.1)""".stripMargin
  private val minhashPairCtes = minhashPairCtesOver("documents")

  /** The incremental batch-vs-corpus dedup oracle (batch = doc_id % 5 = 0
    * against the rest): q66's one-shot operator, q108's persisted-index
    * probe, and q109's append-then-probe must all hash identically against
    * this ONE SQL derivation — the index hop and the append hop are
    * required to be value-neutral. */
  private val incrementalDedupOracle =
    s"""WITH $minhashPairCtes,
             bat AS (SELECT doc_id, text FROM documents WHERE doc_id % 5 = 0),
             xp AS (
               SELECT CASE WHEN p.doc_a % 5 = 0 THEN p.doc_a ELSE p.doc_b END
                 AS doc_id
               FROM pairs p
               WHERE (p.doc_a % 5 = 0) <> (p.doc_b % 5 = 0)),
             eh AS (
               SELECT DISTINCT b.doc_id FROM bat b
               JOIN documents c ON c.doc_id % 5 <> 0 AND md5(c.text) = md5(b.text)),
             nh AS (SELECT DISTINCT doc_id FROM xp)
             SELECT b.doc_id,
               (eh.doc_id IS NOT NULL) AS exact_dup,
               (nh.doc_id IS NOT NULL) AS near_dup,
               (eh.doc_id IS NULL AND nh.doc_id IS NULL) AS keep
             FROM bat b
             LEFT JOIN eh ON eh.doc_id = b.doc_id
             LEFT JOIN nh ON nh.doc_id = b.doc_id
             ORDER BY b.doc_id"""

  // ---- q18 simhash: generate the 32 per-bit vote expressions for DuckDB,
  // mirroring Dedup.simhash32 (md5 hex digit j/4, msb-first bit j%4).
  private val simhashVotesSql = (0 until 32).map { j =>
    val pos = j / 4 + 1
    val shift = 1 << (3 - j % 4)
    s"SUM(2 * (((strpos('0123456789abcdef', substr(md5(tok), $pos, 1)) - 1) // $shift) % 2) - 1) AS v$j"
  }.mkString(",\n         ")
  private val simhashConcatSql =
    (0 until 32).map(j => s"CASE WHEN v$j > 0 THEN '1' ELSE '0' END").mkString(" || ")

  val all: Seq[Q] = Seq(

    // Exact dedup: full-text md5 groups with multiplicity + canonical id.
    Q("q14_dedup_exact",
      (s, d) => Dedup.exactGroups(Tables.documents(s, d), "doc_id", "text")
        .orderBy(col("canonical_id")),
      Some("""SELECT md5(text) AS text_hash, CAST(COUNT(*) AS BIGINT) AS n_copies,
             MIN(doc_id) AS canonical_id
             FROM documents GROUP BY md5(text) ORDER BY canonical_id""")),

    // MinHash(8, chunked md5) + LSH(4 bands × 2) near-dup candidates with
    // exact Jaccard verification — the full sub-quadratic near-dedup
    // pipeline. Hash i = chunk i%4 of md5(i/4 ':' shingle) (2 md5s/row).
    Q("q15_minhash_lsh",
      (s, d) => Dedup.minhashNearDups(Tables.documents(s, d), "doc_id", "text",
          shingleN = 3, k = 8, bands = 4, threshold = 0.1, maxBucketSize = 100)
        .orderBy(col("jaccard").desc, col("doc_a"), col("doc_b"))
        .limit(100),
      Some(s"""WITH $minhashPairCtes
             SELECT doc_a, doc_b, jaccard FROM pairs
             ORDER BY jaccard DESC, doc_a, doc_b LIMIT 100""")),

    // Near-dup CLUSTER assignment: connected components over the q15 pair
    // graph, component = min member id = the canonical document. Oracled by
    // a DuckDB recursive CTE computing the transitive closure of the same
    // (identically re-derived) pair graph.
    Q("q38_dup_clusters",
      (s, d) => Dedup.connectedComponents(
          Dedup.minhashNearDups(Tables.documents(s, d), "doc_id", "text",
            shingleN = 3, k = 8, bands = 4, threshold = 0.1, maxBucketSize = 100),
          "doc_a", "doc_b")
        .orderBy(col("id")),
      Some(s"""WITH RECURSIVE $minhashPairCtes,
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
               SELECT reach.v, e2.dst FROM reach JOIN e2 ON e2.src = reach.r)
             SELECT v AS id, MIN(r) AS component
             FROM reach GROUP BY v ORDER BY id""")),

    // The full dedup composition (q14 → q15 → q38 as ONE operator): exact
    // dedup, near-dup clustering over the survivors, keep each cluster's
    // canonical member. Oracle re-derives every stage over the exact-dedup
    // relation and anti-joins the cluster losers.
    Q("q40_dedup_corpus",
      (s, d) => Dedup.dedupCorpus(Tables.documents(s, d), "doc_id", "text",
          shingleN = 3, k = 8, bands = 4, threshold = 0.1, maxBucketSize = 100)
        .select(col("doc_id"))
        .orderBy(col("doc_id")),
      Some(s"""WITH RECURSIVE dd AS (
               SELECT d.doc_id, d.text FROM documents d
               JOIN (SELECT md5(text) AS h, MIN(doc_id) AS k
                     FROM documents GROUP BY md5(text)) w
                 ON md5(d.text) = w.h AND d.doc_id = w.k),
             ${minhashPairCtesOver("dd")},
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
               SELECT v AS id, MIN(r) AS component FROM reach GROUP BY v)
             SELECT doc_id FROM dd
             WHERE doc_id NOT IN (SELECT id FROM comp WHERE id <> component)
             ORDER BY doc_id""")),

    // Deterministic train/val/test split: pure id-hash bucketing (stable
    // across runs/engines/corpus growth, unlike Dataset.sample).
    Q("q37_split",
      (s, d) => graft.operators.TextAnalysis.withSplit(
          Tables.documents(s, d), "doc_id", trainPct = 80, valPct = 10)
        .select(col("doc_id"), col("split"))
        .orderBy(col("doc_id")),
      Some("""SELECT doc_id,
               CASE WHEN b < 80 THEN 'train' WHEN b < 90 THEN 'val'
                    ELSE 'test' END AS split
             FROM (
               SELECT doc_id,
                 ((strpos('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), 1, 1)) - 1) * 16
                  + (strpos('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), 2, 1)) - 1)) % 100 AS b
               FROM documents)
             ORDER BY doc_id""")),

    // SimHash-32 fingerprints (frequency-weighted bit votes from md5 token
    // hashes) — the banding/hamming near-dup path is exercised in ScalaTest;
    // here the fingerprint itself is oracle-checked bit-for-bit.
    Q("q18_simhash",
      (s, d) => Dedup.simhash32(Tables.documents(s, d), "doc_id", "text")
        .orderBy(col("doc_id")),
      Some(s"""WITH toks AS (
               SELECT doc_id, string_split_regex(trim(lower(text)), '\\s+') AS w
               FROM documents),
             tr AS (SELECT doc_id, unnest(w) AS tok FROM toks),
             votes AS (
               SELECT doc_id,
         $simhashVotesSql,
                 CAST(COUNT(*) AS BIGINT) AS n_tokens
               FROM tr GROUP BY doc_id)
             SELECT doc_id, $simhashConcatSql AS simhash32, n_tokens
             FROM votes ORDER BY doc_id""")),

    // SimHash banded near-dup pairs: shared-band candidates verified by
    // full hamming distance — the complete sub-quadratic simhash dedup,
    // oracle-recomputed bit-for-bit.
    Q("q32_simhash_neardup",
      (s, d) => graft.operators.Dedup.simhashNearDups(
          Tables.documents(s, d), "doc_id", "text", bands = 4, maxHamming = 6,
          maxBucketSize = 100)
        .orderBy(col("hamming"), col("doc_a"), col("doc_b"))
        .limit(500),
      Some(s"""WITH toks AS (
               SELECT doc_id, string_split_regex(trim(lower(text)), '\\s+') AS w
               FROM documents),
             tr AS (SELECT doc_id, unnest(w) AS tok FROM toks),
             votes AS (
               SELECT doc_id,
         $simhashVotesSql
               FROM tr GROUP BY doc_id),
             fp AS (SELECT doc_id,
               ${(0 until 32).map(j =>
                  s"CASE WHEN v$j > 0 THEN ${1L << (31 - j)} ELSE 0 END")
                  .mkString(" + ")} AS f
               FROM votes),
             bands AS (
               ${(0 until 4).map(b =>
                  s"SELECT doc_id, $b AS band, (f // ${1L << (8 * (3 - b))}) % 256 AS band_key FROM fp")
                  .mkString("\n               UNION ALL ")}),
             ok AS (
               SELECT band, band_key FROM bands
               GROUP BY band, band_key HAVING COUNT(*) <= 100),
             bb AS (
               SELECT b.* FROM bands b JOIN ok
                 ON b.band = ok.band AND b.band_key = ok.band_key),
             cand AS (
               SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b
               FROM bb x JOIN bb y
                 ON x.band = y.band AND x.band_key = y.band_key
                AND x.doc_id < y.doc_id),
             ham AS (
               SELECT c.doc_a, c.doc_b,
                 CAST(bit_count(xor(a.f, b.f)) AS INTEGER) AS hamming
               FROM cand c
               JOIN fp a ON a.doc_id = c.doc_a
               JOIN fp b ON b.doc_id = c.doc_b)
             SELECT doc_a, doc_b, hamming FROM ham
             WHERE hamming <= 6
             ORDER BY hamming, doc_a, doc_b LIMIT 500""")),

    // tf-idf document-term vectors (SURVEY §7.3.6): classic tf·ln(N/df)
    // weights over unigrams, top-5 terms per document by weight. Weights are
    // rounded to 6 decimals BEFORE ranking so the rank order (and the
    // hash-compared doubles) cannot diverge on engine libm ulps.
    Q("q34_tfidf",
      (s, d) => {
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(col("doc_id")).orderBy(col("tfidf").desc, col("term"))
        TextAnalysis.tfidf(Tables.documents(s, d), "doc_id", "text")
          .withColumn("rnk", row_number().over(w).cast("long"))
          .filter(col("rnk") <= 5)
          .select(col("doc_id"), col("rnk"), col("term"), col("tf"), col("tfidf"))
          .orderBy(col("doc_id"), col("rnk"))
      },
      Some("""WITH toks AS (
               SELECT doc_id, string_split_regex(trim(lower(text)), '\s+') AS w
               FROM documents),
             tr AS (SELECT doc_id, unnest(w) AS term FROM toks),
             tf AS (SELECT doc_id, term, CAST(COUNT(*) AS BIGINT) AS tf
                    FROM tr GROUP BY doc_id, term),
             df AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY term),
             nd AS (SELECT COUNT(DISTINCT doc_id) AS n_docs FROM documents),
             x AS (
               SELECT tf.doc_id, tf.term, tf.tf,
                      round(tf.tf * ln(CAST(n_docs AS DOUBLE) / df), 6) AS tfidf
               FROM tf JOIN df USING (term) CROSS JOIN nd),
             r AS (
               SELECT *, row_number() OVER (PARTITION BY doc_id
                         ORDER BY tfidf DESC, term) AS rnk
               FROM x)
             SELECT doc_id, CAST(rnk AS BIGINT) AS rnk, term, tf, tfidf
             FROM r WHERE rnk <= 5 ORDER BY doc_id, rnk""")),

    // Per-document profile: token stats + quality ratios + language guess +
    // min-shingle fingerprint.
    Q("q20_text_profile",
      (s, d) => TextAnalysis.profile(Tables.documents(s, d), "doc_id", "text", stopwords)
        .orderBy(col("doc_id")),
      Some(s"""WITH $tokCtes,
             tr AS (SELECT doc_id, unnest(w) AS tok FROM toks),
             stats AS (
               SELECT doc_id,
                 CAST(COUNT(*) AS BIGINT) AS n_tokens,
                 CAST(COUNT(DISTINCT tok) AS BIGINT) AS n_unique,
                 CAST(COUNT(DISTINCT tok) AS DOUBLE) / COUNT(*) AS ttr,
                 CAST(SUM(length(tok)) AS DOUBLE) / COUNT(*) AS avg_token_len,
                 CAST(SUM(CASE WHEN tok IN ('the','a','of','and','to','in') THEN 1 ELSE 0 END) AS DOUBLE) / COUNT(*) AS stop_ratio
               FROM tr GROUP BY doc_id),
             lang AS (
               SELECT t.doc_id,
                 length(regexp_replace(d.text, '[^\\x{4e00}-\\x{9fff}]', '', 'g')) AS cjk,
                 len(list_filter(t.w, x -> x IN ('the','a','of','and','to','in'))) AS s_en,
                 len(list_filter(t.w, x -> x IN ('le','la','les','des','et','un'))) AS s_fr,
                 len(list_filter(t.w, x -> x IN ('el','los','las','una','y','que'))) AS s_es,
                 len(list_filter(t.w, x -> x IN ('der','die','das','und','ein','nicht'))) AS s_de
               FROM toks t JOIN documents d ON d.doc_id = t.doc_id),
             fp AS (SELECT doc_id, MIN(md5(s)) AS fingerprint FROM sh GROUP BY doc_id)
             SELECT s.doc_id, s.n_tokens, s.n_unique, s.ttr, s.avg_token_len, s.stop_ratio,
               CASE WHEN l.cjk > 0 THEN 'zh'
                    WHEN l.s_en = 0 AND l.s_fr = 0 AND l.s_es = 0 AND l.s_de = 0 THEN 'und'
                    WHEN l.s_en >= l.s_fr AND l.s_en >= l.s_es AND l.s_en >= l.s_de THEN 'en'
                    WHEN l.s_fr >= l.s_es AND l.s_fr >= l.s_de THEN 'fr'
                    WHEN l.s_es >= l.s_de THEN 'es'
                    ELSE 'de' END AS lang_guess,
               f.fingerprint
             FROM stats s
             JOIN lang l ON l.doc_id = s.doc_id
             JOIN fp f ON f.doc_id = s.doc_id
             ORDER BY s.doc_id""")),

    // Benchmark-contamination detection: corpus docs (doc_id % 50 != 0)
    // scored by distinct-3-gram overlap against the held-out "eval set"
    // (doc_id % 50 == 0) — flag any overlap, ratio for thresholding.
    Q("q42_contamination",
      (s, d) => {
        val docs = Tables.documents(s, d)
        TextAnalysis.contamination(
            docs.filter(col("doc_id") % 50 =!= 0),
            docs.filter(col("doc_id") % 50 === 0),
            "doc_id", "text")
          .orderBy(col("doc_id"))
      },
      Some(s"""WITH ${tokCtesOver("(SELECT * FROM documents WHERE doc_id % 50 <> 0)")},
             etoks AS (
               SELECT string_split_regex(trim(lower(text)), '\\s+') AS w
               FROM documents WHERE doc_id % 50 = 0),
             esh AS (
               SELECT DISTINCT s
               FROM etoks, UNNEST(list_transform(range(1, len(w) - 1),
                    i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) AS t(s)
               WHERE len(w) >= 3),
             tot AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_shingles
                     FROM sh GROUP BY doc_id),
             ov AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_overlap
                    FROM sh WHERE s IN (SELECT s FROM esh) GROUP BY doc_id)
             SELECT t.doc_id, t.n_shingles,
                    COALESCE(ov.n_overlap, 0) AS n_overlap,
                    CAST(COALESCE(ov.n_overlap, 0) AS DOUBLE) / t.n_shingles AS overlap_ratio,
                    COALESCE(ov.n_overlap, 0) > 0 AS contaminated
             FROM tot t LEFT JOIN ov ON ov.doc_id = t.doc_id
             ORDER BY t.doc_id""")),

    // Intra-document repetition ratio: repeated-shingle fraction per doc —
    // the standard boilerplate/looped-text quality filter. 1 - 1/n ratio
    // arithmetic is integer-division-derived → bit-stable cross-engine.
    Q("q45_repetition",
      (s, d) => TextAnalysis.repetition(Tables.documents(s, d), "doc_id", "text")
        .orderBy(col("doc_id")),
      Some("""WITH r AS (
               SELECT doc_id, s
               FROM (SELECT doc_id, string_split_regex(trim(lower(text)), '\s+') AS w
                     FROM documents),
                    UNNEST(list_transform(range(1, len(w) - 1),
                      i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) AS t(s)
               WHERE len(w) >= 3)
             SELECT doc_id,
                    CAST(COUNT(*) AS BIGINT) AS n_shingles,
                    CAST(COUNT(DISTINCT s) AS BIGINT) AS n_distinct,
                    1.0 - CAST(COUNT(DISTINCT s) AS DOUBLE) / COUNT(*) AS repetition_ratio
             FROM r GROUP BY doc_id ORDER BY doc_id""")),

    // PII scrubbing: emails then phone-shaped digit runs redacted with
    // per-document counts. The synthetic corpus has no PII, so the query
    // plants a deterministic address + phone per row (pure column
    // functions) and scrubs THAT — redaction provably fires on every row
    // and the cleaned text is hash-compared across engines.
    Q("q43_pii_scrub",
      (s, d) => TextAnalysis.piiScrub(
          Tables.documents(s, d).select(col("doc_id"),
            concat(col("text"), lit(" contact user"),
              col("doc_id").cast("string"), lit("@example.com or +84 90 555 "),
              col("doc_id").cast("string"), lit("7")).as("text")),
          "doc_id", "text")
        .orderBy(col("doc_id")),
      Some(s"""WITH aug AS (
               SELECT doc_id,
                 text || ' contact user' || CAST(doc_id AS VARCHAR) ||
                 '@example.com or +84 90 555 ' || CAST(doc_id AS VARCHAR) || '7' AS text
               FROM documents),
             ne AS (
               SELECT doc_id,
                 CAST(len(regexp_extract_all(text, '${TextAnalysis.EmailRe}')) AS BIGINT) AS n_emails,
                 regexp_replace(text, '${TextAnalysis.EmailRe}', '<EMAIL>', 'g') AS t1
               FROM aug)
             SELECT doc_id, n_emails,
               CAST(len(regexp_extract_all(t1, '${TextAnalysis.PhoneRe}')) AS BIGINT) AS n_phones,
               regexp_replace(t1, '${TextAnalysis.PhoneRe}', '<PHONE>', 'g') AS clean_text
             FROM ne ORDER BY doc_id""")),

    // Subword-ish token accounting: GPT-2-style pre-tokenizer regex counts
    // (letter runs | single digits | punct runs) vs whitespace tokens, plus
    // the chars-per-subword health ratio. The conservative ASCII pattern
    // keeps Java regex (Spark) and RE2 (DuckDB) in exact agreement.
    Q("q54_subword_stats",
      (s, d) => TextAnalysis.subwordStats(Tables.documents(s, d), "doc_id", "text")
        .orderBy(col("doc_id")),
      Some(s"""WITH b AS (
               SELECT doc_id,
                 CAST(len(string_split_regex(trim(lower(text)), '\\s+')) AS BIGINT) AS n_ws_tokens,
                 CAST(len(regexp_extract_all(text, '${TextAnalysis.BpeishRe}')) AS BIGINT) AS n_subwords,
                 CAST(length(text) AS BIGINT) AS n_chars
               FROM documents)
             SELECT doc_id, n_ws_tokens, n_subwords, n_chars,
               CAST(n_chars AS DOUBLE) / n_subwords AS chars_per_subword
             FROM b ORDER BY doc_id""")),

    // Unigram-LM quality score (cheap perplexity stand-in): corpus-trained
    // add-one-smoothed model, per-doc average token log-prob. Log-probs are
    // fixed-pointed to integer micros inside the operator, so every sum the
    // oracle compares is exact integer math — no cross-partition double
    // addition anywhere.
    Q("q55_lm_score",
      (s, d) => TextAnalysis.lmScore(Tables.documents(s, d), "doc_id", "text")
        .orderBy(col("doc_id")),
      Some("""WITH tr AS (
               SELECT doc_id, unnest(string_split_regex(trim(lower(text)), '\s+')) AS term
               FROM documents),
             cf AS (SELECT term, CAST(COUNT(*) AS BIGINT) AS cf FROM tr GROUP BY term),
             tot AS (SELECT CAST(SUM(cf) AS BIGINT) AS t, CAST(COUNT(*) AS BIGINT) AS v FROM cf),
             lp AS (
               SELECT term,
                 CAST(round(ln((CAST(cf AS DOUBLE) + 1) / (t + v)) * 1000000, 0) AS BIGINT) AS l
               FROM cf, tot),
             dt AS (
               SELECT doc_id, term, CAST(COUNT(*) AS BIGINT) AS tf
               FROM tr GROUP BY doc_id, term),
             agg AS (
               SELECT doc_id,
                 CAST(SUM(tf) AS BIGINT) AS n_tokens,
                 CAST(0 AS BIGINT) AS n_oov,
                 CAST(SUM(tf * l) AS BIGINT) AS logprob_micros
               FROM dt JOIN lp USING (term) GROUP BY doc_id)
             SELECT doc_id, n_tokens, n_oov, logprob_micros,
               CAST(logprob_micros AS DOUBLE) / (n_tokens * 1000000) AS avg_logprob
             FROM agg ORDER BY doc_id""")),

    // Shingle-set containment over LSH candidates: catches
    // doc-contained-in-doc (quotes, wrapper boilerplate) that Jaccard
    // dilutes. The oracle re-derives the full candidate chain and scores
    // containment from the same `inter`/`sizes` CTEs q15 uses for Jaccard.
    Q("q57_containment",
      (s, d) => graft.operators.Dedup.containmentNearDups(
          Tables.documents(s, d), "doc_id", "text",
          threshold = 0.5, maxBucketSize = 100)
        .orderBy(col("doc_a"), col("doc_b")),
      Some(s"""WITH ${minhashPairCtesOver("documents")}
             SELECT i.doc_a, i.doc_b,
               CAST(sa.n AS BIGINT) AS n_a, CAST(sb.n AS BIGINT) AS n_b,
               CAST(i.ni AS BIGINT) AS n_inter,
               CAST(i.ni AS DOUBLE) / least(sa.n, sb.n) AS containment
             FROM inter i
             JOIN sizes sa ON sa.doc_id = i.doc_a
             JOIN sizes sb ON sb.doc_id = i.doc_b
             WHERE CAST(i.ni AS DOUBLE) / least(sa.n, sb.n) >= 0.5
             ORDER BY i.doc_a, i.doc_b""")),

    // Corpus boilerplate: shingles present in ≥ 2% of documents, and each
    // document's boilerplate fraction — the mostly-template-page signal.
    Q("q58_boilerplate",
      (s, d) => TextAnalysis.boilerplate(Tables.documents(s, d), "doc_id", "text",
          minDocFrac = 0.02)
        .orderBy(col("doc_id")),
      Some(s"""WITH $tokCtes,
             nd AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM documents),
             df AS (SELECT s, CAST(COUNT(*) AS BIGINT) AS df FROM sh GROUP BY s),
             bp AS (SELECT s FROM df, nd WHERE CAST(df AS DOUBLE) >= 0.02 * n),
             tot AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_shingles
                     FROM sh GROUP BY doc_id),
             nb AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_boiler
                    FROM sh WHERE s IN (SELECT s FROM bp) GROUP BY doc_id)
             SELECT t.doc_id, t.n_shingles,
               COALESCE(nb.n_boiler, 0) AS n_boiler,
               CAST(COALESCE(nb.n_boiler, 0) AS DOUBLE) / t.n_shingles AS boiler_ratio
             FROM tot t LEFT JOIN nb ON nb.doc_id = t.doc_id
             ORDER BY t.doc_id""")),

    // BPE first-merge statistics: corpus-weighted adjacent-char-pair counts
    // over distinct pre-token types (the tokenizer-trainer aggregation).
    Q("q64_bpe_pairs",
      (s, d) => TextAnalysis.bpePairStats(Tables.documents(s, d), "text", topK = 50)
        .orderBy(col("rank")),
      Some(s"""WITH w0 AS (
               SELECT unnest(regexp_extract_all(text, '${TextAnalysis.BpeishRe}')) AS w
               FROM documents),
             wf AS (
               SELECT w, CAST(COUNT(*) AS BIGINT) AS freq FROM w0 GROUP BY w),
             p AS (
               SELECT w, substr(w, CAST(i AS INT), 2) AS pair, freq
               FROM wf, UNNEST(range(1, len(w))) AS t(i)
               WHERE len(w) >= 2),
             a AS (
               SELECT pair, CAST(SUM(freq) AS BIGINT) AS pair_count,
                 CAST(COUNT(DISTINCT w) AS BIGINT) AS n_word_types
               FROM p GROUP BY pair),
             r AS (
               SELECT *, row_number() OVER (ORDER BY pair_count DESC, pair) AS rnk
               FROM a)
             SELECT pair, pair_count, n_word_types, CAST(rnk AS BIGINT) AS rank
             FROM r WHERE rnk <= 50 ORDER BY rank""")),

    // Bigram-LM quality score, trained on the doc_id % 4 != 0 subset so the
    // unseen-bigram backoff paths (seen context / unseen context) are
    // exercised. Same integer-micros fixed-pointing as q55.
    Q("q65_bigram_score",
      (s, d) => {
        val docs = Tables.documents(s, d)
        TextAnalysis.bigramScore(docs, "doc_id", "text",
            trainDocs = Some(docs.filter(col("doc_id") % 4 =!= 0)))
          .orderBy(col("doc_id"))
      },
      Some("""WITH toks AS (
               SELECT doc_id, string_split_regex(trim(lower(text)), '\s+') AS w
               FROM documents),
             tt AS (SELECT doc_id, w FROM toks WHERE doc_id % 4 <> 0),
             bgt AS (
               SELECT w[i] || ' ' || w[i+1] AS term
               FROM tt, UNNEST(range(1, len(w))) AS t(i) WHERE len(w) >= 2),
             cf2 AS (SELECT term, CAST(COUNT(*) AS BIGINT) AS cf2
                     FROM bgt GROUP BY term),
             ctx AS (SELECT split_part(term, ' ', 1) AS w1,
                       CAST(SUM(cf2) AS BIGINT) AS cf1
                     FROM cf2 GROUP BY 1),
             vv AS (SELECT CAST(COUNT(DISTINCT u) AS BIGINT) AS v
                    FROM (SELECT unnest(w) AS u FROM tt)),
             m AS (SELECT c.term,
                     CAST(round(ln((c.cf2 + 1.0) / (x.cf1 + vv.v)) * 1000000, 0)
                       AS BIGINT) AS lp
                   FROM cf2 c JOIN ctx x ON split_part(c.term, ' ', 1) = x.w1, vv),
             bgd AS (
               SELECT doc_id, w[i] || ' ' || w[i+1] AS term
               FROM toks, UNNEST(range(1, len(w))) AS t(i) WHERE len(w) >= 2),
             dt AS (SELECT doc_id, term, CAST(COUNT(*) AS BIGINT) AS tf
                    FROM bgd GROUP BY 1, 2),
             sc AS (SELECT dt.doc_id, dt.tf,
                      COALESCE(m.lp,
                        CAST(round(ln(1.0 / (COALESCE(x.cf1, 0) + vv.v)) * 1000000, 0)
                          AS BIGINT)) AS l,
                      CASE WHEN m.lp IS NULL THEN 1 ELSE 0 END AS u
                    FROM dt
                    LEFT JOIN m ON m.term = dt.term
                    LEFT JOIN ctx x ON x.w1 = split_part(dt.term, ' ', 1), vv)
             SELECT doc_id,
               CAST(SUM(tf) AS BIGINT) AS n_bigrams,
               CAST(SUM(tf * u) AS BIGINT) AS n_unseen,
               CAST(SUM(tf * l) AS BIGINT) AS logprob_micros,
               CAST(SUM(tf * l) AS DOUBLE) / (SUM(tf) * 1000000) AS avg_logprob
             FROM sc GROUP BY doc_id ORDER BY doc_id""")),

    // Incremental batch-vs-corpus dedup: batch = doc_id % 5 = 0 checked
    // against the rest. The near path reuses the complete q15 pair chain
    // (same banding, cap, Jaccard) restricted to cross pairs.
    Q("q66_incremental_dedup",
      (s, d) => {
        val docs = Tables.documents(s, d)
        Dedup.incrementalDedup(
            docs.filter(col("doc_id") % 5 === 0),
            docs.filter(col("doc_id") % 5 =!= 0),
            "doc_id", "text", shingleN = 3, k = 8, bands = 4,
            threshold = 0.1, maxBucketSize = 100)
          .orderBy(col("doc_id"))
      },
      Some(incrementalDedupOracle)),

    // Cross-source duplication matrix over the q15 near-dup pairs.
    Q("q68_dup_source_matrix",
      (s, d) => graft.operators.Curation.dupSourceMatrix(
          Tables.documents(s, d), "doc_id", "text", "source",
          shingleN = 3, k = 8, bands = 4, threshold = 0.1, maxBucketSize = 100)
        .orderBy(col("source_a"), col("source_b")),
      Some(s"""WITH $minhashPairCtes,
             sm AS (SELECT p.doc_a, p.doc_b, da.source AS sa, db.source AS sb
                    FROM pairs p
                    JOIN documents da ON da.doc_id = p.doc_a
                    JOIN documents db ON db.doc_id = p.doc_b)
             SELECT least(sa, sb) AS source_a, greatest(sa, sb) AS source_b,
               CAST(COUNT(*) AS BIGINT) AS n_pairs
             FROM sm GROUP BY 1, 2 ORDER BY source_a, source_b""")),

    // Prefix-duplicate groups: docs sharing their first 3 tokens.
    Q("q70_prefix_dups",
      (s, d) => Dedup.prefixDupGroups(Tables.documents(s, d), "doc_id", "text",
          k = 3)
        .orderBy(col("prefix_hash")),
      Some("""WITH t AS (
               SELECT doc_id,
                 md5(array_to_string(list_slice(
                   string_split_regex(trim(lower(text)), '\s+'), 1, 3), ' '))
                   AS prefix_hash
               FROM documents)
             SELECT prefix_hash, CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(MIN(doc_id) AS BIGINT) AS canonical_id
             FROM t GROUP BY 1 HAVING COUNT(*) >= 2
             ORDER BY prefix_hash""")),

    // Iterative BPE training, 3 merge rounds — the oracle unrolls the
    // complete loop (pair counts → argmax → single-pass merge, per round).
    Q("q76_bpe_train",
      (s, d) => TextAnalysis.bpeTrain(Tables.documents(s, d), "text", nMerges = 3)
        .orderBy(col("merge_rank")),
      Some(s"""WITH w0 AS (
               SELECT unnest(regexp_extract_all(text, '${TextAnalysis.BpeishRe}')) AS w
               FROM documents),
             wf AS (SELECT w, CAST(COUNT(*) AS BIGINT) AS freq FROM w0 GROUP BY w),
             t0 AS (
               SELECT ' ' || array_to_string(list_transform(range(1, len(w) + 1),
                 i -> substr(w, CAST(i AS INT), 1)), ' ') || ' ' AS sym, freq
               FROM wf),
             c1 AS (
               SELECT l[i] AS p1, l[i+1] AS p2, CAST(SUM(freq) AS BIGINT) AS pair_count
               FROM (SELECT string_split(trim(sym), ' ') AS l, freq FROM t0),
                    UNNEST(range(1, len(l))) t(i)
               GROUP BY 1, 2),
             m1 AS (SELECT * FROM c1 ORDER BY pair_count DESC, p1, p2 LIMIT 1),
             t1 AS (
               SELECT replace(sym, ' ' || m1.p1 || ' ' || m1.p2 || ' ',
                 ' ' || m1.p1 || m1.p2 || ' ') AS sym, freq
               FROM t0, m1),
             c2 AS (
               SELECT l[i] AS p1, l[i+1] AS p2, CAST(SUM(freq) AS BIGINT) AS pair_count
               FROM (SELECT string_split(trim(sym), ' ') AS l, freq FROM t1),
                    UNNEST(range(1, len(l))) t(i)
               GROUP BY 1, 2),
             m2 AS (SELECT * FROM c2 ORDER BY pair_count DESC, p1, p2 LIMIT 1),
             t2 AS (
               SELECT replace(sym, ' ' || m2.p1 || ' ' || m2.p2 || ' ',
                 ' ' || m2.p1 || m2.p2 || ' ') AS sym, freq
               FROM t1, m2),
             c3 AS (
               SELECT l[i] AS p1, l[i+1] AS p2, CAST(SUM(freq) AS BIGINT) AS pair_count
               FROM (SELECT string_split(trim(sym), ' ') AS l, freq FROM t2),
                    UNNEST(range(1, len(l))) t(i)
               GROUP BY 1, 2),
             m3 AS (SELECT * FROM c3 ORDER BY pair_count DESC, p1, p2 LIMIT 1)
             SELECT CAST(1 AS BIGINT) AS merge_rank, p1, p2, pair_count FROM m1
             UNION ALL
             SELECT CAST(2 AS BIGINT), p1, p2, pair_count FROM m2
             UNION ALL
             SELECT CAST(3 AS BIGINT), p1, p2, pair_count FROM m3
             ORDER BY merge_rank""")),

    // Character-distribution entropy quality gate: every ln fixed-pointed
    // to integer micros before any cross-row sum, so both engines aggregate
    // exact integers and the final division is the only double.
    Q("q79_char_entropy",
      (s, d) => TextAnalysis.charEntropy(Tables.documents(s, d), "doc_id", "text",
          minEntropy = 2.0)
        .orderBy(col("doc_id")),
      Some("""WITH cc AS (
               SELECT doc_id, ch, COUNT(*) AS c
               FROM (SELECT doc_id, unnest(string_split(text, '')) AS ch
                     FROM documents)
               GROUP BY doc_id, ch),
             e AS (
               SELECT doc_id,
                 CAST(SUM(c) AS BIGINT) AS n_chars,
                 CAST(COUNT(*) AS BIGINT) AS n_distinct_chars,
                 CAST(SUM(c * CAST(round(ln(c) * 1000000, 0) AS BIGINT)) AS BIGINT) AS s
               FROM cc GROUP BY doc_id)
             SELECT doc_id, n_chars, n_distinct_chars, entropy,
               entropy < 2.0 AS low_entropy
             FROM (
               SELECT doc_id, n_chars, n_distinct_chars,
                 round(CAST(CAST(round(ln(n_chars) * 1000000, 0) AS BIGINT) * n_chars - s
                   AS DOUBLE) / (n_chars * 1000000), 6) AS entropy
               FROM e)
             ORDER BY doc_id""")),

    // Zipf-law vocabulary fit over the top-200 terms: deterministic rank,
    // ln fixed-pointed to 1e-4 units, exact-integer regression sums.
    Q("q80_zipf_slope",
      (s, d) => TextAnalysis.zipfSlope(Tables.documents(s, d), "doc_id", "text",
          topK = 200),
      Some("""WITH tf AS (
               SELECT tok AS term, CAST(COUNT(*) AS BIGINT) AS cf
               FROM (SELECT unnest(string_split_regex(trim(lower(text)), '\s+')) AS tok
                     FROM documents)
               GROUP BY 1 ORDER BY cf DESC, term LIMIT 200),
             r AS (
               SELECT cf,
                 row_number() OVER (ORDER BY cf DESC, term) AS rank
               FROM tf),
             f AS (
               SELECT cf,
                 CAST(round(ln(rank) * 10000, 0) AS BIGINT) AS x,
                 CAST(round(ln(cf) * 10000, 0) AS BIGINT) AS y
               FROM r),
             a AS (
               SELECT CAST(COUNT(*) AS BIGINT) AS n_terms,
                 CAST(MAX(cf) AS BIGINT) AS top_cf,
                 CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
                 CAST(SUM(x * y) AS BIGINT) AS sxy,
                 CAST(SUM(x * x) AS BIGINT) AS sxx
               FROM f)
             SELECT n_terms, top_cf,
               round(CAST(n_terms * sxy - sx * sy AS DOUBLE)
                 / (n_terms * sxx - sx * sx), 6) AS zipf_slope
             FROM a""")),

    // Quality-aware survivor selection: per q38 near-dup cluster keep the
    // LONGEST member (min-id tie-break), singletons keep themselves. The
    // oracle re-derives the full pair chain + recursive closure, then
    // applies the same rank-1 window.
    Q("q81_keep_best",
      (s, d) => Dedup.bestSurvivors(
          Tables.documents(s, d), "doc_id", "n_chars",
          Dedup.connectedComponents(
            Dedup.minhashNearDups(Tables.documents(s, d), "doc_id", "text",
              shingleN = 3, k = 8, bands = 4, threshold = 0.1, maxBucketSize = 100),
            "doc_a", "doc_b"))
        .orderBy(col("doc_id")),
      Some(s"""WITH RECURSIVE $minhashPairCtes,
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
             member AS (
               SELECT d.doc_id, COALESCE(comp.component, d.doc_id) AS component,
                 d.n_chars
               FROM documents d LEFT JOIN comp ON comp.id = d.doc_id),
             surv AS (
               SELECT component, doc_id AS survivor_id
               FROM (
                 SELECT component, doc_id,
                   row_number() OVER (PARTITION BY component
                     ORDER BY n_chars DESC, doc_id) AS rn
                 FROM member)
               WHERE rn = 1)
             SELECT m.doc_id, m.component, s.survivor_id,
               m.doc_id = s.survivor_id AS kept
             FROM member m JOIN surv s ON s.component = m.component
             ORDER BY m.doc_id""")),

    // Per-source Zipf fit (corpus-health dashboard): one slope per source
    // over that source's own top-100 terms; rank-1..K window partitioned
    // by source (WindowGroupLimit pushdown, plan-asserted).
    Q("q83_source_zipf",
      (s, d) => TextAnalysis.zipfSlopeByGroup(Tables.documents(s, d), "source",
          "doc_id", "text", topK = 100)
        .orderBy(col("source")),
      Some("""WITH tf AS (
               SELECT source, tok AS term, CAST(COUNT(*) AS BIGINT) AS cf
               FROM (SELECT source,
                       unnest(string_split_regex(trim(lower(text)), '\s+')) AS tok
                     FROM documents)
               GROUP BY 1, 2),
             r AS (
               SELECT source, cf,
                 row_number() OVER (PARTITION BY source
                   ORDER BY cf DESC, term) AS rank
               FROM tf),
             f AS (
               SELECT source, cf,
                 CAST(round(ln(rank) * 10000, 0) AS BIGINT) AS x,
                 CAST(round(ln(cf) * 10000, 0) AS BIGINT) AS y
               FROM r WHERE rank <= 100),
             a AS (
               SELECT source, CAST(COUNT(*) AS BIGINT) AS n_terms,
                 CAST(MAX(cf) AS BIGINT) AS top_cf,
                 CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
                 CAST(SUM(x * y) AS BIGINT) AS sxy,
                 CAST(SUM(x * x) AS BIGINT) AS sxx
               FROM f GROUP BY source)
             SELECT source, n_terms, top_cf,
               round(CAST(n_terms * sxy - sx * sy AS DOUBLE)
                 / (n_terms * sxx - sx * sx), 6) AS zipf_slope
             FROM a ORDER BY source""")),

    // Boilerplate REMOVAL (q58 measures; this cleans): tokens covered by a
    // high-df shingle occurrence are cut, the survivors re-assemble in
    // position order, and the cleaned text itself is hash-compared.
    Q("q90_boilerplate_scrub",
      (s, d) => TextAnalysis.boilerplateScrub(Tables.documents(s, d), "doc_id",
          "text", minDocFrac = 0.02)
        .orderBy(col("doc_id")),
      Some("""WITH toks0 AS (
               SELECT doc_id, string_split_regex(trim(lower(text)), '\s+') AS w
               FROM documents),
             tok AS (
               SELECT doc_id, CAST(t.i AS BIGINT) - 1 AS pos,
                 w[CAST(t.i AS INT)] AS tokn
               FROM toks0, UNNEST(range(1, len(w) + 1)) AS t(i)),
             socc AS (
               SELECT doc_id, CAST(t.i AS BIGINT) - 1 AS pos,
                 w[CAST(t.i AS INT)] || ' ' || w[CAST(t.i AS INT) + 1]
                   || ' ' || w[CAST(t.i AS INT) + 2] AS s
               FROM toks0, UNNEST(range(1, len(w) - 1)) AS t(i)
               WHERE len(w) >= 3),
             nd AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM documents),
             bp AS (
               SELECT s FROM
                 (SELECT s, CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS df
                  FROM socc GROUP BY s), nd
               WHERE CAST(df AS DOUBLE) >= 0.02 * n),
             cov AS (
               SELECT DISTINCT doc_id, pos + u.d AS cpos
               FROM socc, UNNEST([0, 1, 2]) AS u(d)
               WHERE s IN (SELECT s FROM bp)),
             kept AS (
               SELECT t.doc_id, CAST(COUNT(*) AS BIGINT) AS n_kept,
                 string_agg(t.tokn, ' ' ORDER BY t.pos) AS clean
               FROM tok t LEFT JOIN cov c
                 ON c.doc_id = t.doc_id AND c.cpos = t.pos
               WHERE c.doc_id IS NULL GROUP BY t.doc_id)
             SELECT t0.doc_id, CAST(len(t0.w) AS BIGINT) AS n_tokens,
               COALESCE(k.n_kept, 0) AS n_kept,
               CAST(len(t0.w) AS BIGINT) - COALESCE(k.n_kept, 0) AS n_removed,
               COALESCE(k.clean, '') AS clean_text
             FROM toks0 t0 LEFT JOIN kept k USING (doc_id)
             ORDER BY doc_id""")),

    // Batch novelty vs corpus: share of each incoming doc's distinct
    // shingles the corpus has never seen (the ingest-or-skip signal;
    // contamination's inverse direction).
    Q("q91_novelty",
      (s, d) => {
        val docs = Tables.documents(s, d)
        TextAnalysis.novelty(
          docs.filter(col("doc_id") % 50 === 0),
          docs.filter(col("doc_id") % 50 =!= 0),
          "doc_id", "text")
          .orderBy(col("doc_id"))
      },
      Some("""WITH bt AS (
               SELECT doc_id, string_split_regex(trim(lower(text)), '\s+') AS w
               FROM documents WHERE doc_id % 50 = 0),
             bsh AS (
               SELECT DISTINCT doc_id, s
               FROM bt, UNNEST(list_transform(range(1, len(w) - 1),
                    i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) AS t(s)
               WHERE len(w) >= 3),
             ct AS (
               SELECT doc_id, string_split_regex(trim(lower(text)), '\s+') AS w
               FROM documents WHERE doc_id % 50 <> 0),
             csh AS (
               SELECT DISTINCT s
               FROM ct, UNNEST(list_transform(range(1, len(w) - 1),
                    i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) AS t(s)
               WHERE len(w) >= 3)
             SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_shingles,
               CAST(SUM(CASE WHEN s IN (SELECT s FROM csh) THEN 0 ELSE 1 END)
                 AS BIGINT) AS n_new,
               CAST(SUM(CASE WHEN s IN (SELECT s FROM csh) THEN 0 ELSE 1 END)
                 AS DOUBLE) / COUNT(*) AS novelty_ratio
             FROM bsh GROUP BY doc_id ORDER BY doc_id""")),

    // Deep BPE training: 30 merge rounds, final VOCABULARY emitted (the id
    // space a tokenizer ships). Every round is exact integer arithmetic
    // with a deterministic argmax, so the oracle re-derives the complete
    // 30-round training as machine-generated unrolled SQL (the q76 recipe
    // at 10× depth). Per round the engine runs ONE distributed job over
    // the distinct-type table; the corpus is scanned exactly once.
    Q("q93_bpe_vocab",
      (s, d) => TextAnalysis.bpeVocab(Tables.documents(s, d), "text", nMerges = 30)
        .orderBy(col("symbol")),
      Some(s"""WITH w0 AS (
               SELECT unnest(regexp_extract_all(text, '${TextAnalysis.BpeishRe}')) AS w
               FROM documents),
             wf AS (SELECT w, CAST(COUNT(*) AS BIGINT) AS freq FROM w0 GROUP BY w),
             t0 AS MATERIALIZED (
               SELECT ' ' || array_to_string(list_transform(range(1, len(w) + 1),
                 i -> substr(w, CAST(i AS INT), 1)), ' ') || ' ' AS sym, freq
               FROM wf),
             ${bpeRoundCtes(30)}
             SELECT symbol, CAST(SUM(freq) AS BIGINT) AS n_occurrences
             FROM (SELECT unnest(string_split(trim(sym), ' ')) AS symbol, freq
                   FROM t30)
             GROUP BY 1 ORDER BY symbol""")),

    // Exact global top-25 tokens via the Misra–Gries two-pass operator:
    // sketch-bounded candidate pass + exact verify pass. The oracle is the
    // plain exact aggregate — the operator's runtime exactness proof (k-th
    // exact count strictly above the n/(capacity+1) MG bound, else exact
    // fallback) means the sketch can never change the answer, only the
    // amount shuffled.
    Q("q95_heavy_hitters",
      (s, d) => TextAnalysis.heavyHitters(
        Tables.documents(s, d)
          .select(explode(Dedup.tokens(col("text"))).as("token")),
        "token", k = 25, capacity = 512),
      Some("""WITH toks AS (
               SELECT string_split_regex(trim(lower(text)), '\s+') AS w
               FROM documents),
             tr AS (SELECT unnest(w) AS token FROM toks)
             SELECT token, CAST(COUNT(*) AS BIGINT) AS cnt
             FROM tr GROUP BY token
             ORDER BY cnt DESC, token LIMIT 25""")),

    // BPE ENCODING — train 20 merges, then tokenize the corpus with them
    // (`TextAnalysis.bpeEncode`: priority-loop per DISTINCT pre-token type,
    // provably ≡ replaying the training rewrites in rank order). The oracle
    // unrolls the 20 training rounds carrying each raw pre-token `w`
    // through the rewrites, so t20 IS the w → encoded-symbols map; per-doc
    // token counts then follow from a plain type join — any divergence in
    // training, encoding order, or the join plumbing breaks the hash.
    Q("q98_bpe_encode",
      (s, d) => {
        val docs = Tables.documents(s, d)
        TextAnalysis.bpeEncode(docs, "doc_id", "text",
            TextAnalysis.bpeTrain(docs, "text", nMerges = 20))
          .orderBy(col("doc_id"))
      },
      Some(s"""WITH w0 AS (
               SELECT unnest(regexp_extract_all(text, '${TextAnalysis.BpeishRe}')) AS w
               FROM documents),
             wf AS (SELECT w, CAST(COUNT(*) AS BIGINT) AS freq FROM w0 GROUP BY w),
             t0 AS MATERIALIZED (
               SELECT w, ' ' || array_to_string(list_transform(range(1, len(w) + 1),
                 i -> substr(w, CAST(i AS INT), 1)), ' ') || ' ' AS sym, freq
               FROM wf),
             ${bpeRoundCtes(20, carry = "w")}
             , enc AS (
               SELECT w, CAST(len(string_split(trim(sym), ' ')) AS BIGINT) AS n_sym
               FROM t20),
             dw AS (
               SELECT doc_id, w, COUNT(*) AS cnt
               FROM (SELECT doc_id,
                       unnest(regexp_extract_all(text, '${TextAnalysis.BpeishRe}')) AS w
                     FROM documents)
               GROUP BY 1, 2),
             agg AS (
               SELECT doc_id, CAST(SUM(cnt) AS BIGINT) AS np,
                 CAST(SUM(cnt * n_sym) AS BIGINT) AS nb
               FROM dw JOIN enc USING (w) GROUP BY doc_id)
             SELECT d.doc_id,
               COALESCE(np, 0) AS n_pretokens,
               COALESCE(nb, 0) AS n_bpe_tokens
             FROM documents d LEFT JOIN agg USING (doc_id)
             ORDER BY d.doc_id""")),

    // SUBSTRING-level dedup (RefinedWeb/SlimPajama): 3-token shingles
    // occurring in >= 3 distinct documents mark their token spans;
    // overlapping-or-adjacent marks merge into maximal spans per doc
    // (gaps-and-islands over a per-document window). The oracle re-derives
    // positions, the distinct-doc shingle census, and the island merge —
    // one off-by-one in any of them moves a span boundary and breaks the
    // hash. `Dedup.scrubSpans` (the text-rewriting consumer) is pinned by
    // DedupSpec fixtures.
    Q("q105_dup_spans",
      (s, d) => graft.operators.Dedup.duplicateSpans(
          Tables.documents(s, d), "doc_id", "text", n = 3, minDocs = 3)
        .orderBy(col("doc_id"), col("span_start")),
      Some("""WITH toks AS (
               SELECT doc_id, string_split_regex(trim(lower(text)), '\s+') AS w
               FROM documents),
             pos AS (
               SELECT doc_id, CAST(i - 1 AS BIGINT) AS pos,
                 w[i] || ' ' || w[i+1] || ' ' || w[i+2] AS s
               FROM toks, UNNEST(range(1, len(w) - 1)) AS t(i)
               WHERE len(w) >= 3),
             common AS (
               SELECT s FROM (SELECT DISTINCT s, doc_id FROM pos)
               GROUP BY s HAVING COUNT(*) >= 3),
             hits AS (
               SELECT p.doc_id, p.pos FROM pos p JOIN common c USING (s)),
             lagd AS (
               SELECT doc_id, pos,
                 lag(pos) OVER (PARTITION BY doc_id ORDER BY pos) AS prev
               FROM hits),
             isl AS (
               SELECT doc_id, pos,
                 SUM(CASE WHEN prev IS NULL OR pos - prev <= 3 THEN 0 ELSE 1 END)
                   OVER (PARTITION BY doc_id ORDER BY pos) AS island
               FROM lagd)
             SELECT doc_id,
               MIN(pos) AS span_start,
               MAX(pos) + 3 AS span_end,
               MAX(pos) + 3 - MIN(pos) AS span_tokens
             FROM isl GROUP BY doc_id, island
             ORDER BY doc_id, span_start""")),

    // SPAN-level benchmark decontamination (PaLM/GPT-3 13-gram method,
    // here at n=3 for the small corpus): every doc n-gram found anywhere
    // in the held-out benchmark slice marks its span; merged spans yield
    // the per-document contaminated-token RATIO that decontamination
    // thresholds on (q42 is the doc-level yes/no form). Oracle re-derives
    // the benchmark shingle set, marks, island merge, and ratio — clean
    // docs must come back with an explicit 0 row, not be absent.
    Q("q106_contamination_spans",
      (s, d) => {
        val docs = Tables.documents(s, d)
        graft.operators.Dedup.contaminationSpans(
            docs.filter(col("doc_id") % 50 =!= 0), "doc_id", "text",
            docs.filter(col("doc_id") % 50 === 0), "text", n = 3)
          .orderBy(col("doc_id"))
      },
      Some("""WITH train AS (
               SELECT doc_id, string_split_regex(trim(lower(text)), '\s+') AS w
               FROM documents WHERE doc_id % 50 <> 0),
             bsh AS (
               SELECT DISTINCT w[i] || ' ' || w[i+1] || ' ' || w[i+2] AS s
               FROM (SELECT string_split_regex(trim(lower(text)), '\s+') AS w
                     FROM documents WHERE doc_id % 50 = 0),
                    UNNEST(range(1, len(w) - 1)) AS t(i)
               WHERE len(w) >= 3),
             pos AS (
               SELECT doc_id, CAST(i - 1 AS BIGINT) AS pos,
                 w[i] || ' ' || w[i+1] || ' ' || w[i+2] AS s
               FROM train, UNNEST(range(1, len(w) - 1)) AS t(i)
               WHERE len(w) >= 3),
             hits AS (
               SELECT p.doc_id, p.pos FROM pos p JOIN bsh USING (s)),
             lagd AS (
               SELECT doc_id, pos,
                 lag(pos) OVER (PARTITION BY doc_id ORDER BY pos) AS prev
               FROM hits),
             isl AS (
               SELECT doc_id, pos,
                 SUM(CASE WHEN prev IS NULL OR pos - prev <= 3 THEN 0 ELSE 1 END)
                   OVER (PARTITION BY doc_id ORDER BY pos) AS island
               FROM lagd),
             spans AS (
               SELECT doc_id, MAX(pos) + 3 - MIN(pos) AS span_tokens
               FROM isl GROUP BY doc_id, island),
             perdoc AS (
               SELECT doc_id, CAST(SUM(span_tokens) AS BIGINT) AS ct
               FROM spans GROUP BY doc_id)
             SELECT t.doc_id,
               CAST(len(t.w) AS BIGINT) AS n_tokens,
               COALESCE(ct, 0) AS contaminated_tokens,
               round(CAST(COALESCE(ct, 0) AS DOUBLE) / len(t.w), 6)
                 AS contamination_ratio
             FROM train t LEFT JOIN perdoc USING (doc_id)
             ORDER BY t.doc_id""")),

    // Persisted dedup INDEX: corpus signatures/hashes/shingles built and
    // written once, then the batch (doc_id % 5 = 0) is screened O(batch)
    // against the reloaded index — DedupIndex.probe must be bit-identical
    // to q66's one-shot incrementalDedup, so the oracle is the SAME SQL:
    // the persistence hop is required to be value-neutral.
    Q("q108_dedup_index",
      (s, d) => {
        import graft.operators.DedupIndex
        val dir = graft.Scratch.tempDir("graft-q108") + "/dix"
        val docs = Tables.documents(s, d)
        DedupIndex.write(DedupIndex.build(
          docs.filter(col("doc_id") % 5 =!= 0), "doc_id", "text",
          shingleN = 3, k = 8, bands = 4), dir)
        DedupIndex.probe(DedupIndex.read(s, dir),
            docs.filter(col("doc_id") % 5 === 0), "doc_id", "text",
            threshold = 0.1, maxBucketSize = 100)
          .orderBy(col("doc_id"))
      },
      Some(incrementalDedupOracle)),

    // Index APPEND then probe: the corpus index is built WITHOUT the
    // doc_id % 5 = 1 slice, which is then appended at rest (frozen
    // parameters, new parquet files only), and the probe runs against the
    // reloaded union. Oracle is again q66's SQL over the full corpus — a
    // lost delta file, a parameter drift, or a signature recompute that
    // disagrees with the build would all break the hash.
    Q("q109_dedup_index_append",
      (s, d) => {
        import graft.operators.DedupIndex
        val dir = graft.Scratch.tempDir("graft-q109") + "/dix"
        val docs = Tables.documents(s, d)
        DedupIndex.write(DedupIndex.build(
          docs.filter(col("doc_id") % 5 =!= 0 && col("doc_id") % 5 =!= 1),
          "doc_id", "text", shingleN = 3, k = 8, bands = 4), dir)
        DedupIndex.appendToDir(s, dir,
          docs.filter(col("doc_id") % 5 === 1), "doc_id", "text")
        DedupIndex.probe(DedupIndex.read(s, dir),
            docs.filter(col("doc_id") % 5 === 0), "doc_id", "text",
            threshold = 0.1, maxBucketSize = 100)
          .orderBy(col("doc_id"))
      },
      Some(incrementalDedupOracle)),

    // Intra-document repetition stats (the Gopher repetition filters,
    // token-based): per-doc duplicate-token, duplicate-bigram, and
    // top-bigram-coverage ratios — a repetitive doc flags itself with no
    // cross-document comparison (q105's span dedup is the cross-doc
    // complement). Two hash aggregations, no per-doc window.
    Q("q119_repetition_stats",
      (s, d) => graft.operators.TextAnalysis.repetitionStats(
          Tables.documents(s, d), "doc_id", "text", n = 2)
        .orderBy(col("doc_id")),
      Some("""WITH toks AS (
               SELECT doc_id,
                 string_split_regex(trim(lower(text)), '\s+') AS w
               FROM documents),
             uni AS (
               SELECT doc_id, CAST(len(w) AS BIGINT) AS n_tokens,
                 CAST(len(list_distinct(w)) AS BIGINT) AS n_distinct_tokens
               FROM toks),
             bg AS (
               SELECT doc_id, w[CAST(t.i AS INT)] || ' ' ||
                              w[CAST(t.i AS INT) + 1] AS term
               FROM toks, UNNEST(range(1, len(w))) AS t(i)
               WHERE len(w) >= 2),
             ngr AS (
               SELECT doc_id, term, CAST(COUNT(*) AS BIGINT) AS c
               FROM bg GROUP BY 1, 2),
             ngd AS (
               SELECT doc_id, CAST(SUM(c) AS BIGINT) AS g_total,
                 CAST(COUNT(*) AS BIGINT) AS g_distinct,
                 CAST(MAX(c) AS BIGINT) AS c_top
               FROM ngr GROUP BY 1)
             SELECT u.doc_id, u.n_tokens, u.n_distinct_tokens,
               round(1.0 - CAST(u.n_distinct_tokens AS DOUBLE) / u.n_tokens, 6)
                 AS dup_token_ratio,
               COALESCE(round(1.0 - CAST(g.g_distinct AS DOUBLE) / g.g_total, 6),
                 0.0) AS dup_ngram_ratio,
               COALESCE(round(CAST(g.c_top AS DOUBLE) / g.g_total, 6),
                 0.0) AS top_ngram_ratio
             FROM uni u LEFT JOIN ngd g USING (doc_id)
             ORDER BY u.doc_id"""))
  )

  /** One BPE round as DuckDB CTEs (count pairs → argmax → rewrite), chained
    * `n` times — the q76 unrolled-oracle recipe, generated instead of
    * hand-written so 30 rounds stay maintainable. Each t/m CTE is
    * MATERIALIZED: DuckDB inlines CTEs by default and every round
    * references the previous one twice, so an uninlined 30-round chain
    * would expand 2^30 copies of the base scan ("too many open files"
    * before it even runs).
    *
    * The rewrite LEFT-JOINs the 1-row argmax m$r: the engine's `bpeLoop`
    * stops early when no pair remains, and the oracle must degrade the
    * same way — the previous comma cross join emptied t$r (and every
    * later round, and the final vocabulary) on any corpus that exhausts
    * in fewer than `n` merges. */
  private def bpeRoundCtes(n: Int): String = bpeRoundCtes(n, carry = "")

  /** As above, threading extra per-type columns (e.g. the raw pre-token
    * `w`, so the final table maps w → its encoded symbols — what the q98
    * ENCODING oracle needs) unchanged through every rewrite round. */
  private def bpeRoundCtes(n: Int, carry: String): String = {
    val c = if (carry.isEmpty) "" else s"$carry, "
    (1 to n).map { r =>
      s"""c$r AS (
               SELECT l[i] AS p1, l[i+1] AS p2, CAST(SUM(freq) AS BIGINT) AS pair_count
               FROM (SELECT string_split(trim(sym), ' ') AS l, freq FROM t${r - 1}),
                    UNNEST(range(1, len(l))) t(i)
               GROUP BY 1, 2),
             m$r AS MATERIALIZED (SELECT * FROM c$r ORDER BY pair_count DESC, p1, p2 LIMIT 1),
             t$r AS MATERIALIZED (
               SELECT ${c}CASE WHEN m$r.p1 IS NULL THEN sym
                 ELSE replace(sym, ' ' || m$r.p1 || ' ' || m$r.p2 || ' ',
                   ' ' || m$r.p1 || m$r.p2 || ' ') END AS sym, freq
               FROM t${r - 1} LEFT JOIN m$r ON TRUE)"""
    }.mkString(",\n             ")
  }
}
