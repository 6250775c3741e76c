package graft.queries

import org.apache.spark.sql.functions._
import graft.sources.Tables
import graft.operators.{Dedup, Retrieval, TextAnalysis}

/** Corpus serving + observability: BM25 lexical retrieval, hybrid
  * lexical+vector RRF fusion, and unigram-distribution drift — the read
  * path and the monitoring a curation platform runs over the corpus the
  * batch side produces. All scores ride the integer fixed-point
  * discipline (one round per additive term, BIGINT sums/ranks), so the
  * DuckDB oracles re-derive them bit-for-bit.
  */
object RetrievalQueries {

  /** Shared BM25 CTE chain up to `lex(query_id, doc_id, rnk,
    * score_micros, n_hit_terms)`: every 101st document UNDER id 50500
    * (≤ 500 queries at ANY scale factor — a serving benchmark holds the
    * batch fixed while the corpus grows; an unbounded `% 101` batch
    * scaled the per-(query,doc) aggregation to ~2B groups at sf10 and
    * OOM-killed the sweep) queries the corpus with its first 4 tokens;
    * Lucene-variant idf, k1=1.2, b=0.75, per-term scores rounded once to
    * integer micros (matches Retrieval.bm25TopK's evaluation order
    * expression for expression). */
  private val bm25Ctes =
    """toks AS (
      |  SELECT doc_id, string_split_regex(trim(lower(text)), '\s+') AS w
      |  FROM documents),
      |tr AS (SELECT doc_id, unnest(w) AS term FROM toks),
      |tf AS (SELECT doc_id, term, CAST(COUNT(*) AS BIGINT) AS tf
      |       FROM tr GROUP BY doc_id, term),
      |dl AS (SELECT doc_id, CAST(SUM(tf) AS BIGINT) AS dl FROM tf GROUP BY doc_id),
      |df AS (SELECT term, CAST(COUNT(*) AS BIGINT) AS df FROM tf GROUP BY term),
      |c AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
      |             CAST(SUM(dl) AS BIGINT) AS tot_len FROM dl),
      |qt AS (
      |  SELECT DISTINCT query_id, term FROM (
      |    SELECT doc_id AS query_id, unnest(list_slice(w, 1, 4)) AS term
      |    FROM toks WHERE doc_id % 101 = 0 AND doc_id < 50500)),
      |per AS (
      |  SELECT qt.query_id, tf.doc_id,
      |    CAST(round(
      |      ln(1 + (c.n_docs - df.df + 0.5) / (df.df + 0.5)) *
      |      (tf.tf * (1.2 + 1.0) /
      |        (tf.tf + 1.2 * ((1.0 - 0.75) +
      |          0.75 * dl.dl / (CAST(c.tot_len AS DOUBLE) / c.n_docs)))) *
      |      1000000, 0) AS BIGINT) AS m
      |  FROM qt JOIN tf USING (term) JOIN df USING (term)
      |  JOIN dl ON dl.doc_id = tf.doc_id, c),
      |lagg AS (
      |  SELECT query_id, doc_id, CAST(COUNT(*) AS BIGINT) AS n_hit_terms,
      |         CAST(SUM(m) AS BIGINT) AS score_micros
      |  FROM per GROUP BY query_id, doc_id),
      |lex AS (
      |  SELECT query_id, doc_id, n_hit_terms, score_micros,
      |    row_number() OVER (PARTITION BY query_id
      |                       ORDER BY score_micros DESC, doc_id) AS rnk
      |  FROM lagg)""".stripMargin

  val all: Seq[Q] = Seq(

    // BM25 top-10 lexical retrieval: every 101st doc's first-4-token
    // query against the whole corpus. Broadcast query terms restrict the
    // postings join before any shuffle — per-query cost follows the
    // matched postings, not the corpus.
    Q("q112_bm25_topk",
      (s, d) => {
        val docs = Tables.documents(s, d)
        val queries = docs.filter(col("doc_id") % 101 === 0 && col("doc_id") < 50500)
          .select(col("doc_id").as("query_id"),
            array_join(slice(Dedup.tokens(col("text")), 1, 4), " ").as("qtext"))
        Retrieval.bm25TopK(docs, "doc_id", "text",
            queries, "query_id", "qtext", k = 10)
          .orderBy(col("query_id"), col("rank"))
      },
      Some(s"""WITH $bm25Ctes
             SELECT query_id, CAST(rnk AS BIGINT) AS rank, doc_id,
               n_hit_terms, score_micros,
               CAST(score_micros AS DOUBLE) / 1000000 AS score
             FROM lex WHERE rnk <= 10 ORDER BY query_id, rank""")),

    // Hybrid retrieval: BM25 top-10 ⊕ exact-dot top-10 (the id-aligned
    // embedding of the same query doc), reciprocal-rank fused at
    // rrfK=60. Rank-based fusion needs no score calibration, and both
    // input lists are k-rows-per-query tiny regardless of corpus size.
    Q("q113_hybrid_rrf",
      (s, d) => Retrieval.hybridTopK(
          Tables.documents(s, d), "doc_id", "text",
          Tables.embeddings(s, d), "vec_id", "embedding",
          docQueryPred = col("doc_id") % 101 === 0 && col("doc_id") < 50500,
          vecQueryPred = col("vec_id") % 101 === 0 && col("vec_id") < 50500,
          nQueryTokens = 4, k = 10)
        .orderBy(col("query_id"), col("rank")),
      Some(s"""WITH $bm25Ctes,
             vq AS (SELECT vec_id, embedding FROM embeddings
                   WHERE vec_id % 101 = 0 AND vec_id < 50500),
             vp AS (
               SELECT vq.vec_id AS query_id, e.vec_id AS doc_id,
                 SUM(CAST(floor(vq.embedding[i] * 1048576.0) AS BIGINT)
                   * CAST(floor(e.embedding[i] * 1048576.0) AS BIGINT)) AS fp
               FROM vq, embeddings e, range(1, 65) t(i)
               WHERE e.vec_id <> vq.vec_id
               GROUP BY 1, 2),
             vec AS (
               SELECT query_id, doc_id,
                 row_number() OVER (PARTITION BY query_id
                                    ORDER BY fp DESC, doc_id) AS rnk
               FROM vp),
             l10 AS (SELECT query_id, doc_id, rnk FROM lex WHERE rnk <= 10),
             v10 AS (SELECT query_id, doc_id, rnk FROM vec WHERE rnk <= 10),
             f AS (
               SELECT COALESCE(l.query_id, v.query_id) AS query_id,
                 COALESCE(l.doc_id, v.doc_id) AS doc_id,
                 CAST(COALESCE(l.rnk, 0) AS BIGINT) AS lex_rank,
                 CAST(COALESCE(v.rnk, 0) AS BIGINT) AS vec_rank,
                 COALESCE(CAST(round(1000000.0 / (60 + l.rnk), 0) AS BIGINT), 0) +
                 COALESCE(CAST(round(1000000.0 / (60 + v.rnk), 0) AS BIGINT), 0)
                   AS rrf_micros
               FROM l10 l FULL OUTER JOIN v10 v
                 ON l.query_id = v.query_id AND l.doc_id = v.doc_id),
             fr AS (
               SELECT *, row_number() OVER (PARTITION BY query_id
                 ORDER BY rrf_micros DESC, doc_id) AS rnk
               FROM f)
             SELECT query_id, CAST(rnk AS BIGINT) AS rank, doc_id,
               lex_rank, vec_rank, CAST(rrf_micros AS BIGINT) AS rrf_micros
             FROM fr WHERE rnk <= 10 ORDER BY query_id, rank""")),

    // Hybrid retrieval served from the PERSISTED lexical index (the
    // production read path): the lexical leg is LexIndex.query over the
    // term-pruned postings — bit-identical to q113's one-shot bm25TopK by
    // construction (both feed Retrieval.bm25Rank) — the vector leg the
    // same exact ranking, fused with the same rrfFuse. Oracle is q113's
    // SQL verbatim: the persistence hop must be value-neutral, the
    // q116-vs-q112 contract extended to the fused ranking.
    Q("q124_hybrid_index",
      (s, d) => {
        import graft.operators.LexIndex
        val dir = graft.Scratch.tempDir("graft-q124") + "/lix"
        val docs = Tables.documents(s, d)
        LexIndex.write(LexIndex.build(docs, "doc_id", "text"), dir)
        val queries = docs.filter(col("doc_id") % 101 === 0 && col("doc_id") < 50500)
          .select(col("doc_id").as("query_id"),
            array_join(slice(Dedup.tokens(col("text")), 1, 4), " ").as("qtext"))
        Retrieval.hybridTopKIndexed(LexIndex.read(s, dir), queries,
            Tables.embeddings(s, d), "vec_id", "embedding",
            vecQueryPred = col("vec_id") % 101 === 0 && col("vec_id") < 50500,
            k = 10)
          .orderBy(col("query_id"), col("rank"))
      },
      Some(s"""WITH $bm25Ctes,
             vq AS (SELECT vec_id, embedding FROM embeddings
                   WHERE vec_id % 101 = 0 AND vec_id < 50500),
             vp AS (
               SELECT vq.vec_id AS query_id, e.vec_id AS doc_id,
                 SUM(CAST(floor(vq.embedding[i] * 1048576.0) AS BIGINT)
                   * CAST(floor(e.embedding[i] * 1048576.0) AS BIGINT)) AS fp
               FROM vq, embeddings e, range(1, 65) t(i)
               WHERE e.vec_id <> vq.vec_id
               GROUP BY 1, 2),
             vec AS (
               SELECT query_id, doc_id,
                 row_number() OVER (PARTITION BY query_id
                                    ORDER BY fp DESC, doc_id) AS rnk
               FROM vp),
             l10 AS (SELECT query_id, doc_id, rnk FROM lex WHERE rnk <= 10),
             v10 AS (SELECT query_id, doc_id, rnk FROM vec WHERE rnk <= 10),
             f AS (
               SELECT COALESCE(l.query_id, v.query_id) AS query_id,
                 COALESCE(l.doc_id, v.doc_id) AS doc_id,
                 CAST(COALESCE(l.rnk, 0) AS BIGINT) AS lex_rank,
                 CAST(COALESCE(v.rnk, 0) AS BIGINT) AS vec_rank,
                 COALESCE(CAST(round(1000000.0 / (60 + l.rnk), 0) AS BIGINT), 0) +
                 COALESCE(CAST(round(1000000.0 / (60 + v.rnk), 0) AS BIGINT), 0)
                   AS rrf_micros
               FROM l10 l FULL OUTER JOIN v10 v
                 ON l.query_id = v.query_id AND l.doc_id = v.doc_id),
             fr AS (
               SELECT *, row_number() OVER (PARTITION BY query_id
                 ORDER BY rrf_micros DESC, doc_id) AS rnk
               FROM f)
             SELECT query_id, CAST(rnk AS BIGINT) AS rank, doc_id,
               lex_rank, vec_rank, CAST(rrf_micros AS BIGINT) AS rrf_micros
             FROM fr WHERE rnk <= 10 ORDER BY query_id, rank""")),

    // Hybrid serving with BOTH legs on persisted indexes — the production
    // 100 TB read path q124 is the exact twin of: lexical leg from the
    // BM25 index's term-pruned postings, vector leg from the IVF-PQ
    // index's probed ADC scan (nProbe/nCells of the codes, never the raw
    // embedding table). Both legs are deterministic (md5-seeded
    // quantizers, integer ADC, fixed-point BM25), so the oracle splices
    // the full IVF-PQ serve derivation (q103's CTE chain, query batch
    // re-pointed at the hybrid's) into q124's fusion SQL and re-derives
    // the whole thing exactly — approximate ≠ nondeterministic.
    Q("q125_hybrid_ivf",
      (s, d) => {
        import graft.operators.{LexIndex, VectorIndex}
        val base = graft.Scratch.tempDir("graft-q125")
        val docs = Tables.documents(s, d)
        val emb = Tables.embeddings(s, d)
        LexIndex.write(LexIndex.build(docs, "doc_id", "text"), s"$base/lix")
        VectorIndex.write(VectorIndex.build(emb, "vec_id", "embedding",
          nCells = 32, m = 16, ks = 64, trainIters = 1), s"$base/vix")
        val queries = docs.filter(col("doc_id") % 101 === 0 && col("doc_id") < 50500)
          .select(col("doc_id").as("query_id"),
            array_join(slice(Dedup.tokens(col("text")), 1, 4), " ").as("qtext"))
        val vecQueries = emb.filter(col("vec_id") % 101 === 0 && col("vec_id") < 50500)
        Retrieval.hybridTopKIvf(LexIndex.read(s, s"$base/lix"),
            VectorIndex.read(s, s"$base/vix"),
            queries, vecQueries, "vec_id", "embedding", k = 10, nProbe = 8)
          .orderBy(col("query_id"), col("rank"))
      },
      Some(s"""WITH $bm25Ctes,
             ${SimilarityQueries.ivfPqCtes(None, None,
               queryWhere = "vec_id % 101 = 0 AND vec_id < 50500")},
             l10 AS (SELECT query_id, doc_id, rnk FROM lex WHERE rnk <= 10),
             v10 AS (SELECT query_id, neighbor_id AS doc_id, rnk
                     FROM r WHERE rnk <= 10),
             f AS (
               SELECT COALESCE(l.query_id, v.query_id) AS query_id,
                 COALESCE(l.doc_id, v.doc_id) AS doc_id,
                 CAST(COALESCE(l.rnk, 0) AS BIGINT) AS lex_rank,
                 CAST(COALESCE(v.rnk, 0) AS BIGINT) AS vec_rank,
                 COALESCE(CAST(round(1000000.0 / (60 + l.rnk), 0) AS BIGINT), 0) +
                 COALESCE(CAST(round(1000000.0 / (60 + v.rnk), 0) AS BIGINT), 0)
                   AS rrf_micros
               FROM l10 l FULL OUTER JOIN v10 v
                 ON l.query_id = v.query_id AND l.doc_id = v.doc_id),
             fr AS (
               SELECT *, row_number() OVER (PARTITION BY query_id
                 ORDER BY rrf_micros DESC, doc_id) AS rnk
               FROM f)
             SELECT query_id, CAST(rnk AS BIGINT) AS rank, doc_id,
               lex_rank, vec_rank, CAST(rrf_micros AS BIGINT) AS rrf_micros
             FROM fr WHERE rnk <= 10 ORDER BY query_id, rank""")),

    // Per-source unigram-distribution drift: add-one-smoothed
    // KL(source ‖ corpus) over the corpus vocabulary. The oracle
    // re-derives the same present/absent decomposition the operator
    // uses (closed-form absent side on corpus-wide integer sums), so the
    // comparison is exact-integer end to end.
    Q("q114_corpus_drift",
      (s, d) => TextAnalysis.distributionDrift(
          Tables.documents(s, d), "source", "text")
        .orderBy(col("source")),
      Some("""WITH rws AS (
               SELECT source AS grp,
                 unnest(string_split_regex(trim(lower(text)), '\s+')) AS term
               FROM documents),
             cf AS (SELECT term, CAST(COUNT(*) AS BIGINT) AS cf
                    FROM rws GROUP BY term),
             tot AS (SELECT CAST(SUM(cf) AS BIGINT) AS t,
                            CAST(COUNT(*) AS BIGINT) AS v FROM cf),
             lnq AS (
               SELECT term,
                 CAST(round(ln((cf + 1.0) / (t + v)) * 1000000, 0) AS BIGINT) AS lnq
               FROM cf, tot),
             lnqtot AS (SELECT CAST(SUM(lnq) AS BIGINT) AS lnq_all FROM lnq),
             gf AS (SELECT grp, term, CAST(COUNT(*) AS BIGINT) AS gf
                    FROM rws GROUP BY grp, term),
             gtot AS (SELECT grp, CAST(SUM(gf) AS BIGINT) AS tg,
                             CAST(COUNT(*) AS BIGINT) AS ng
                      FROM gf GROUP BY grp),
             present AS (
               SELECT g.grp,
                 CAST(round(
                   ((g.gf + 1.0) / (gt.tg + tot.v)) *
                   (CAST(round(ln((g.gf + 1.0) / (gt.tg + tot.v)) * 1000000, 0)
                      AS BIGINT) - l.lnq) * 1000000, 0) AS BIGINT) AS picos,
                 l.lnq AS lnq
               FROM gf g JOIN lnq l USING (term)
               JOIN gtot gt ON gt.grp = g.grp, tot),
             pagg AS (
               SELECT grp, CAST(SUM(picos) AS BIGINT) AS present_picos,
                      CAST(SUM(lnq) AS BIGINT) AS lnq_present
               FROM present GROUP BY grp)
             SELECT gt.grp AS source, gt.tg AS n_tokens, gt.ng AS n_terms,
               CAST(pagg.present_picos +
                 CAST(round(
                   (1.0 / (gt.tg + tot.v)) *
                   ((tot.v - gt.ng) *
                      CAST(round(ln(1.0 / (gt.tg + tot.v)) * 1000000, 0) AS BIGINT)
                    - (lt.lnq_all - pagg.lnq_present)) * 1000000, 0) AS BIGINT)
                 AS BIGINT) AS kl_picos,
               CAST(pagg.present_picos +
                 CAST(round(
                   (1.0 / (gt.tg + tot.v)) *
                   ((tot.v - gt.ng) *
                      CAST(round(ln(1.0 / (gt.tg + tot.v)) * 1000000, 0) AS BIGINT)
                    - (lt.lnq_all - pagg.lnq_present)) * 1000000, 0) AS BIGINT)
                 AS DOUBLE) / 1000000000000 AS kl
             FROM pagg
             JOIN gtot gt ON gt.grp = pagg.grp, tot, lnqtot lt
             ORDER BY source""")),

    // Persisted BM25 INDEX: postings/doclen built and written once, then
    // q112's queries are answered from the reloaded index at
    // query-batch cost (partition-pruned postings read, query-time df).
    // LexIndex.query must be bit-identical to the one-shot bm25TopK —
    // the oracle is q112's SQL: the persistence hop is required to be
    // value-neutral.
    Q("q116_lex_index",
      (s, d) => {
        import graft.operators.LexIndex
        val dir = graft.Scratch.tempDir("graft-q116") + "/lix"
        val docs = Tables.documents(s, d)
        LexIndex.write(LexIndex.build(docs, "doc_id", "text"), dir)
        val queries = docs.filter(col("doc_id") % 101 === 0 && col("doc_id") < 50500)
          .select(col("doc_id").as("query_id"),
            array_join(slice(Dedup.tokens(col("text")), 1, 4), " ").as("qtext"))
        LexIndex.query(LexIndex.read(s, dir), queries,
            "query_id", "qtext", k = 10)
          .orderBy(col("query_id"), col("rank"))
      },
      Some(s"""WITH $bm25Ctes
             SELECT query_id, CAST(rnk AS BIGINT) AS rank, doc_id,
               n_hit_terms, score_micros,
               CAST(score_micros AS DOUBLE) / 1000000 AS score
             FROM lex WHERE rnk <= 10 ORDER BY query_id, rank""")),

    // Index APPEND then query: the index is built WITHOUT the doc_id %
    // 5 = 1 slice, which is then appended at rest (new parquet files
    // only, meta constants bumped additively). Oracle is again q112's
    // full-corpus SQL — a lost delta file, a stale df (df is derived at
    // query time precisely so appends can't stale it), or a drifted
    // N/totLen would all break the hash.
    Q("q117_lex_index_append",
      (s, d) => {
        import graft.operators.LexIndex
        val dir = graft.Scratch.tempDir("graft-q117") + "/lix"
        val docs = Tables.documents(s, d)
        LexIndex.write(LexIndex.build(
          docs.filter(col("doc_id") % 5 =!= 1), "doc_id", "text"), dir)
        LexIndex.appendToDir(s, dir,
          docs.filter(col("doc_id") % 5 === 1), "doc_id", "text")
        val queries = docs.filter(col("doc_id") % 101 === 0 && col("doc_id") < 50500)
          .select(col("doc_id").as("query_id"),
            array_join(slice(Dedup.tokens(col("text")), 1, 4), " ").as("qtext"))
        LexIndex.query(LexIndex.read(s, dir), queries,
            "query_id", "qtext", k = 10)
          .orderBy(col("query_id"), col("rank"))
      },
      Some(s"""WITH $bm25Ctes
             SELECT query_id, CAST(rnk AS BIGINT) AS rank, doc_id,
               n_hit_terms, score_micros,
               CAST(score_micros AS DOUBLE) / 1000000 AS score
             FROM lex WHERE rnk <= 10 ORDER BY query_id, rank""")),

    // Phrase-match top-k over POSITIONAL postings: the persisted index
    // carries each (doc, term)'s sorted token offsets, and every query
    // doc's tokens 2..4 must occur CONSECUTIVELY in a matching document
    // (ranked by phrase frequency, doc-id tiebreak). The read path is the
    // same pushed `term IN`/`pb IN` pruned scan as q116's BM25 queries —
    // positions change what a posting row carries, not how it is found —
    // and the whole match is integer/array arithmetic over persisted
    // offsets, so the oracle re-derives tokenize-with-positions, the
    // anchor join, the consecutive-match count, and the rank.
    Q("q120_phrase_topk",
      (s, d) => {
        import graft.operators.LexIndex
        val dir = graft.Scratch.tempDir("graft-q120") + "/lix"
        val docs = Tables.documents(s, d)
        LexIndex.write(LexIndex.build(docs, "doc_id", "text"), dir)
        val queries = docs
          .filter(col("doc_id") % 101 === 0 && col("doc_id") < 50500)
          .filter(size(Dedup.tokens(col("text"))) >= 4)
          .select(col("doc_id").as("query_id"),
            array_join(slice(Dedup.tokens(col("text")), 2, 3), " ").as("phrase"))
        LexIndex.phraseTopK(LexIndex.read(s, dir), queries,
            "query_id", "phrase", k = 10)
          .orderBy(col("query_id"), col("rank"))
      },
      Some("""WITH toks AS (
               SELECT doc_id, string_split_regex(trim(lower(text)), '\s+') AS w
               FROM documents),
             tp AS (
               SELECT doc_id, CAST(i - 1 AS BIGINT) AS pos, w[i] AS term
               FROM toks, UNNEST(range(1, len(w) + 1)) AS t(i)),
             qp AS (
               SELECT doc_id AS query_id, list_slice(w, 2, 4) AS ph
               FROM toks
               WHERE doc_id % 101 = 0 AND doc_id < 50500 AND len(w) >= 4),
             qt AS (
               SELECT query_id, CAST(i - 1 AS BIGINT) AS off, ph[i] AS term
               FROM qp, UNNEST(range(1, len(ph) + 1)) AS t(i)),
             qm AS (SELECT query_id, CAST(COUNT(DISTINCT off) AS BIGINT) AS m
                    FROM qt GROUP BY 1),
             cand AS (
               SELECT qt.query_id, tp.doc_id, qt.off, tp.pos
               FROM qt JOIN tp USING (term)),
             fd AS (
               SELECT c.query_id, c.doc_id
               FROM cand c JOIN qm ON qm.query_id = c.query_id
               GROUP BY c.query_id, c.doc_id, qm.m
               HAVING COUNT(DISTINCT c.off) = qm.m),
             anch AS (
               SELECT c.query_id, c.doc_id, c.pos AS p
               FROM cand c JOIN fd f
                 ON f.query_id = c.query_id AND f.doc_id = c.doc_id
               WHERE c.off = 0),
             hit AS (
               SELECT c.query_id, c.doc_id, a.p,
                 CAST(COUNT(DISTINCT c.off) AS BIGINT) AS nhit
               FROM anch a JOIN cand c
                 ON c.query_id = a.query_id AND c.doc_id = a.doc_id
                AND c.pos = a.p + c.off
               GROUP BY 1, 2, 3),
             pfq AS (
               SELECT h.query_id, h.doc_id, CAST(COUNT(*) AS BIGINT) AS pf
               FROM hit h JOIN qm ON qm.query_id = h.query_id
               WHERE h.nhit = qm.m GROUP BY 1, 2),
             r AS (SELECT query_id, doc_id, pf,
                     row_number() OVER (PARTITION BY query_id
                       ORDER BY pf DESC, doc_id) AS rnk
                   FROM pfq)
             SELECT query_id, CAST(rnk AS BIGINT) AS rank, doc_id, pf
             FROM r WHERE rnk <= 10 ORDER BY query_id, rank""")),

    // Proximity (sloppy-phrase) top-k: every distinct query term within a
    // 12-token window, ranked by the MINIMAL span (Lucene SpanNearQuery's
    // contract). Same pb-pruned positional read as q120; the minimal
    // window is derived by exact enumeration (every occurrence tried as a
    // window start), so the oracle replays the whole computation —
    // tokenize-with-positions, start enumeration, per-term earliest-in-
    // window, span minimization, rank.
    Q("q123_proximity_topk",
      (s, d) => {
        import graft.operators.LexIndex
        val dir = graft.Scratch.tempDir("graft-q123") + "/lix"
        val docs = Tables.documents(s, d)
        LexIndex.write(LexIndex.build(docs, "doc_id", "text"), dir)
        val queries = docs
          .filter(col("doc_id") % 101 === 0 && col("doc_id") < 50500)
          .filter(size(Dedup.tokens(col("text"))) >= 4)
          .select(col("doc_id").as("query_id"),
            array_join(slice(Dedup.tokens(col("text")), 1, 4), " ").as("qtext"))
        LexIndex.proximityTopK(LexIndex.read(s, dir), queries,
            "query_id", "qtext", window = 12, k = 10)
          .orderBy(col("query_id"), col("rank"))
      },
      Some("""WITH toks AS (
               SELECT doc_id, string_split_regex(trim(lower(text)), '\s+') AS w
               FROM documents),
             tp AS (
               SELECT doc_id, CAST(i - 1 AS BIGINT) AS pos, w[i] AS term
               FROM toks, UNNEST(range(1, len(w) + 1)) AS t(i)),
             qt AS (
               SELECT DISTINCT doc_id AS query_id, w[i] AS term
               FROM toks, UNNEST(range(1, 5)) AS t(i)
               WHERE doc_id % 101 = 0 AND doc_id < 50500 AND len(w) >= 4),
             qm AS (SELECT query_id, CAST(COUNT(DISTINCT term) AS BIGINT) AS m
                    FROM qt GROUP BY 1),
             cand AS (
               SELECT qt.query_id, tp.doc_id, qt.term, tp.pos
               FROM qt JOIN tp USING (term)),
             fd AS (
               SELECT c.query_id, c.doc_id
               FROM cand c JOIN qm ON qm.query_id = c.query_id
               GROUP BY c.query_id, c.doc_id, qm.m
               HAVING COUNT(DISTINCT c.term) = qm.m),
             occ AS (
               SELECT c.query_id, c.doc_id, c.term, c.pos
               FROM cand c JOIN fd f
                 ON f.query_id = c.query_id AND f.doc_id = c.doc_id),
             starts AS (
               SELECT DISTINCT query_id, doc_id, pos AS s FROM occ),
             nexts AS (
               SELECT o.query_id, o.doc_id, st.s, o.term,
                 CAST(MIN(o.pos) AS BIGINT) AS np
               FROM starts st JOIN occ o
                 ON o.query_id = st.query_id AND o.doc_id = st.doc_id
                AND o.pos >= st.s AND o.pos < st.s + 12
               GROUP BY 1, 2, 3, 4),
             spans AS (
               SELECT n.query_id, n.doc_id, n.s,
                 CAST(MAX(n.np) - n.s + 1 AS BIGINT) AS span
               FROM nexts n JOIN qm ON qm.query_id = n.query_id
               GROUP BY n.query_id, n.doc_id, n.s, qm.m
               HAVING COUNT(DISTINCT n.term) = qm.m),
             best AS (
               SELECT query_id, doc_id, CAST(MIN(span) AS BIGINT) AS span
               FROM spans GROUP BY 1, 2),
             r AS (SELECT query_id, doc_id, span,
                     row_number() OVER (PARTITION BY query_id
                       ORDER BY span, doc_id) AS rnk
                   FROM best)
             SELECT query_id, CAST(rnk AS BIGINT) AS rank, doc_id, span
             FROM r WHERE rnk <= 10 ORDER BY query_id, rank""")),
  )
}
