package graft.queries

import org.apache.spark.sql.functions._
import graft.sources.Tables
import graft.operators.Similarity

/** Similarity-search coverage over `embeddings` (64-dim unit float vectors):
  * exact brute-force k-NN and exact near-dup pairs, computed in fixed-point
  * integer arithmetic so the DuckDB oracle matches bit-for-bit — and the
  * APPROXIMATE paths too: because the LSH hyperplanes / IVF seeds derive
  * from md5 and every score is exact integer math, the approximations are
  * pure functions of the input set, and each oracle re-derives the entire
  * approximate pipeline in SQL (banding, bucket caps, multi-probe, cell
  * probing, re-scoring). Recall properties are asserted in SimilaritySpec.
  */
object SimilarityQueries {

  /** Oracle-side re-derivation of [[Similarity.normalizeCol]]'s exact
    * fixed-point projection onto the 2²⁰ sphere: given `src(cent_id, cv,
    * extras…)`, emits `<out>_ss` (sum of squares + floor-sqrt), `<out>_r`
    * (the ±1-adjusted integer sqrt) and `<out>(cent_id, cv, extras…)` with
    * cv ← trunc(cv_i·2²⁰ / isqrt(Σcv_i²)). `floor(sqrt(double))` is exact
    * for ss < 2⁵³ (see the operator's scaladoc); the sign CASE emulates
    * Spark's trunc-toward-zero `div` over DuckDB's floor `//`. */
  private[queries] def normCtes(src: String, out: String,
                                extras: Seq[String] = Nil): String = {
    val ex = extras.map(e => s"$e, ").mkString
    s"""${out}_ss AS (
               SELECT ${ex}cent_id, cv,
                 CAST(list_sum(list_transform(cv, x -> x * x)) AS BIGINT) AS ss,
                 CAST(floor(sqrt(CAST(CAST(list_sum(list_transform(cv, x -> x * x))
                   AS BIGINT) AS DOUBLE))) AS BIGINT) AS r0
               FROM $src),
             ${out}_r AS (
               SELECT ${ex}cent_id, cv,
                 CASE WHEN (r0 + 1) * (r0 + 1) <= ss THEN r0 + 1
                      WHEN r0 * r0 > ss THEN r0 - 1 ELSE r0 END AS r
               FROM ${out}_ss),
             $out AS (
               SELECT ${ex}cent_id,
                 CASE WHEN r <= 0 THEN cv
                      ELSE list_transform(cv, x -> CASE WHEN x < 0
                        THEN -((-x * 1048576) // r)
                        ELSE (x * 1048576) // r END) END AS cv
               FROM ${out}_r)"""
  }

  /** Oracle-side re-derivation of [[Similarity.ivfCentroids]]'s spherical
    * coarse seeding: the k md5-smallest vectors of `src(vec_id, qv)`, each
    * normalized to the fixed-point unit sphere ([[normCtes]]). Emits
    * `<out>_raw` plus the normalization chain ending in
    * `<out>(cent_id, cv)` — a drop-in replacement for the pre-spherical
    * `ORDER BY md5 ... LIMIT k` seed CTE. */
  private[queries] def seedCtes(src: String, k: Int, out: String): String =
    s"""${out}_raw AS (
               SELECT vec_id AS cent_id, qv AS cv FROM $src
               ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id LIMIT $k),
             ${normCtes(s"${out}_raw", out)}"""

  /** Shared by q100 (inline IVF-PQ), q103 (build → write → read → serve
    * through `VectorIndex`), and — with a training filter — q104 (build on
    * a base slice, `VectorIndex.appendToDir` the rest): all three are the
    * SAME computation. q103 inserts a parquet round-trip of the index
    * frames between build and serve, and q104 additionally freezes the
    * quantizers to the base slice (`trainWhere`): seeds, Lloyd updates, and
    * coarse centroids derive from the filtered rows only, while encoding,
    * assignment, and serving still cover the full corpus — exactly what
    * append-without-retrain means. Every persisted column is exact integer
    * math, so one SQL re-derivation oracles all three; a value divergence
    * would mean the persistence hop or the append path corrupted the
    * index. */
  private def ivfPqOracleTrainedOn(trainWhere: Option[String],
                                   serveWhere: Option[String] = None): String =
    s"""WITH ${ivfPqCtes(trainWhere, serveWhere)}
             SELECT query_id, CAST(rnk AS BIGINT) AS rank, neighbor_id, adist
             FROM r WHERE rnk <= 10 ORDER BY query_id, rank"""

  /** The [[ivfPqOracleTrainedOn]] chain WITHOUT the terminal SELECT, ending
    * at `r(query_id, neighbor_id, adist, rnk)` — so a composite oracle
    * (q125's hybrid fusion) can splice the whole IVF-PQ serve derivation in
    * as one leg. `queryWhere` selects the query batch (q100/q103/q104's
    * default: every 40th id). */
  private[queries] def ivfPqCtes(trainWhere: Option[String],
                                 serveWhere: Option[String] = None,
                                 queryWhere: String = "vec_id % 40 = 0"): String = {
    // with a filter, training CTEs read tq/subt (the base slice); without,
    // they read the full q/sub and the emitted SQL is q100's original
    val trainSrc = if (trainWhere.isDefined) "tq" else "q"
    val trainSub = if (trainWhere.isDefined) "subt" else "sub"
    val tqCte = trainWhere.fold("")(p => s"""tq AS (
               SELECT vec_id, qv FROM q WHERE $p),
             """)
    val subtCte = trainWhere.fold("")(_ => s"""subt AS (
               SELECT tq.vec_id, t.m, u.j, tq.qv[t.m * 4 + u.j + 1] AS v
               FROM tq, UNNEST(range(0, 16)) AS t(m), UNNEST(range(0, 4)) AS u(j)),
             """)
    s"""q AS (
               SELECT vec_id,
                 list_transform(embedding,
                   x -> CAST(floor(CAST(x AS DOUBLE) * 1048576.0) AS BIGINT)) AS qv
               FROM embeddings),
             ${tqCte}seed AS (
               SELECT row_number() OVER (ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id) - 1
                        AS code, qv
               FROM (SELECT vec_id, qv FROM $trainSrc
                     ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id LIMIT 64)),
             cb0 AS (
               SELECT t.m, s.code, u.j, s.qv[t.m * 4 + u.j + 1] AS v
               FROM seed s, UNNEST(range(0, 16)) AS t(m), UNNEST(range(0, 4)) AS u(j)),
             sub AS (
               SELECT q.vec_id, t.m, u.j, q.qv[t.m * 4 + u.j + 1] AS v
               FROM q, UNNEST(range(0, 16)) AS t(m), UNNEST(range(0, 4)) AS u(j)),
             ${subtCte}d0 AS (
               SELECT s.vec_id, s.m, c.code,
                 CAST(SUM((s.v - c.v) * (s.v - c.v)) AS BIGINT) AS dist
               FROM $trainSub s JOIN cb0 c ON c.m = s.m AND c.j = s.j
               GROUP BY 1, 2, 3),
             a0 AS (
               SELECT vec_id, m, code FROM (
                 SELECT *, row_number() OVER (PARTITION BY vec_id, m
                                              ORDER BY dist, code) AS rn FROM d0)
               WHERE rn = 1),
             msum AS (
               SELECT a.m, a.code, s.j,
                 CAST(SUM(s.v) AS BIGINT) AS sm, CAST(COUNT(*) AS BIGINT) AS n
               FROM a0 a JOIN sub s ON s.vec_id = a.vec_id AND s.m = a.m
               GROUP BY 1, 2, 3),
             cb1 AS (
               SELECT c.m, c.code, c.j,
                 COALESCE(CASE WHEN ms.sm < 0 THEN -((-ms.sm) // ms.n)
                               ELSE ms.sm // ms.n END, c.v) AS v
               FROM cb0 c LEFT JOIN msum ms
                 ON ms.m = c.m AND ms.code = c.code AND ms.j = c.j),
             d1 AS (
               SELECT s.vec_id, s.m, c.code,
                 CAST(SUM((s.v - c.v) * (s.v - c.v)) AS BIGINT) AS dist
               FROM sub s JOIN cb1 c ON c.m = s.m AND c.j = s.j
               GROUP BY 1, 2, 3),
             enc AS (
               SELECT vec_id, m, code FROM (
                 SELECT *, row_number() OVER (PARTITION BY vec_id, m
                                              ORDER BY dist, code) AS rn FROM d1)
               WHERE rn = 1),
             ${seedCtes(trainSrc, 32, "ct")},
             dall AS (
               SELECT q.vec_id, c.cent_id,
                 CAST(list_sum(list_transform(range(1, 65),
                   i -> q.qv[i] * c.cv[i])) AS BIGINT) AS d
               FROM q, ct c),
             asg AS (
               SELECT vec_id, cent_id AS cell FROM (
                 SELECT vec_id, cent_id, row_number() OVER (PARTITION BY vec_id
                   ORDER BY d DESC, cent_id) AS rn FROM dall)
               WHERE rn = 1),
             pb AS (
               SELECT vec_id AS query_id, cent_id AS cell FROM (
                 SELECT vec_id, cent_id, row_number() OVER (PARTITION BY vec_id
                   ORDER BY d DESC, cent_id) AS rn
                 FROM dall WHERE $queryWhere)
               WHERE rn <= 8),
             cd AS (
               SELECT pb.query_id, asg.vec_id AS neighbor_id
               FROM pb JOIN asg USING (cell)
               WHERE asg.vec_id <> pb.query_id${serveWhere.fold("")(p => s" AND ($p)")}),
             ad AS (
               SELECT cd.query_id, cd.neighbor_id,
                 CAST(SUM(t.dist) AS BIGINT) AS adist
               FROM cd
               JOIN enc e ON e.vec_id = cd.neighbor_id
               JOIN d1 t ON t.vec_id = cd.query_id
                        AND t.m = e.m AND t.code = e.code
               GROUP BY 1, 2),
             r AS (
               SELECT query_id, neighbor_id, adist,
                 row_number() OVER (PARTITION BY query_id
                                    ORDER BY adist, neighbor_id) AS rnk
               FROM ad)"""
  }

  private val ivfPqOracle: String = ivfPqOracleTrainedOn(None)

  /** q121: the q100 pipeline with PQ training/encoding moved onto per-cell
    * RESIDUALS (`Similarity.ivfPqResidualTopK` — FAISS IVFPQ's actual
    * encoding). Same integer-exact discipline: residuals are integer
    * differences against the spherically normalized integer centroids, so
    * seeding, one Lloyd round, encoding, per-(query, probed-cell) distance
    * tables, and ADC ranking all re-derive in SQL. */
  private val ivfPqResidualOracle: String =
    s"""WITH q AS (
               SELECT vec_id,
                 list_transform(embedding,
                   x -> CAST(floor(CAST(x AS DOUBLE) * 1048576.0) AS BIGINT)) AS qv
               FROM embeddings),
             ${seedCtes("q", 32, "ct")},
             dall AS (
               SELECT q.vec_id, c.cent_id,
                 CAST(list_sum(list_transform(range(1, 65),
                   i -> q.qv[i] * c.cv[i])) AS BIGINT) AS d
               FROM q, ct c),
             asg AS (
               SELECT vec_id, cent_id AS cell FROM (
                 SELECT vec_id, cent_id, row_number() OVER (PARTITION BY vec_id
                   ORDER BY d DESC, cent_id) AS rn FROM dall)
               WHERE rn = 1),
             res AS (
               SELECT q.vec_id, t.m, u.j,
                 q.qv[t.m * 4 + u.j + 1] - c.cv[t.m * 4 + u.j + 1] AS v
               FROM q JOIN asg ON asg.vec_id = q.vec_id
                    JOIN ct c ON c.cent_id = asg.cell,
                    UNNEST(range(0, 16)) AS t(m), UNNEST(range(0, 4)) AS u(j)),
             seedrank AS (
               SELECT row_number() OVER (ORDER BY md5(CAST(vec_id AS VARCHAR)),
                        vec_id) - 1 AS code, vec_id
               FROM (SELECT vec_id FROM q
                     ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id LIMIT 64)),
             cb0 AS (
               SELECT r.m, s.code, r.j, r.v
               FROM seedrank s JOIN res r ON r.vec_id = s.vec_id),
             d0 AS (
               SELECT r.vec_id, r.m, c.code,
                 CAST(SUM((r.v - c.v) * (r.v - c.v)) AS BIGINT) AS dist
               FROM res r JOIN cb0 c ON c.m = r.m AND c.j = r.j
               GROUP BY 1, 2, 3),
             a0 AS (
               SELECT vec_id, m, code FROM (
                 SELECT *, row_number() OVER (PARTITION BY vec_id, m
                                              ORDER BY dist, code) AS rn FROM d0)
               WHERE rn = 1),
             msum AS (
               SELECT a.m, a.code, r.j,
                 CAST(SUM(r.v) AS BIGINT) AS sm, CAST(COUNT(*) AS BIGINT) AS n
               FROM a0 a JOIN res r ON r.vec_id = a.vec_id AND r.m = a.m
               GROUP BY 1, 2, 3),
             cb1 AS (
               SELECT c.m, c.code, c.j,
                 COALESCE(CASE WHEN ms.sm < 0 THEN -((-ms.sm) // ms.n)
                               ELSE ms.sm // ms.n END, c.v) AS v
               FROM cb0 c LEFT JOIN msum ms
                 ON ms.m = c.m AND ms.code = c.code AND ms.j = c.j),
             d1 AS (
               SELECT r.vec_id, r.m, c.code,
                 CAST(SUM((r.v - c.v) * (r.v - c.v)) AS BIGINT) AS dist
               FROM res r JOIN cb1 c ON c.m = r.m AND c.j = r.j
               GROUP BY 1, 2, 3),
             enc AS (
               SELECT vec_id, m, code FROM (
                 SELECT *, row_number() OVER (PARTITION BY vec_id, m
                                              ORDER BY dist, code) AS rn FROM d1)
               WHERE rn = 1),
             pb AS (
               SELECT vec_id AS query_id, cent_id AS cell FROM (
                 SELECT vec_id, cent_id, row_number() OVER (PARTITION BY vec_id
                   ORDER BY d DESC, cent_id) AS rn
                 FROM dall WHERE vec_id % 40 = 0)
               WHERE rn <= 8),
             qres AS (
               SELECT pb.query_id, pb.cell, t.m, u.j,
                 q.qv[t.m * 4 + u.j + 1] - c.cv[t.m * 4 + u.j + 1] AS v
               FROM pb JOIN q ON q.vec_id = pb.query_id
                    JOIN ct c ON c.cent_id = pb.cell,
                    UNNEST(range(0, 16)) AS t(m), UNNEST(range(0, 4)) AS u(j)),
             qtab AS (
               SELECT r.query_id, r.cell, r.m, c.code,
                 CAST(SUM((r.v - c.v) * (r.v - c.v)) AS BIGINT) AS dist
               FROM qres r JOIN cb1 c ON c.m = r.m AND c.j = r.j
               GROUP BY 1, 2, 3, 4),
             cd AS (
               SELECT pb.query_id, asg.vec_id AS neighbor_id, asg.cell AS cell
               FROM pb JOIN asg USING (cell)
               WHERE asg.vec_id <> pb.query_id),
             ad AS (
               SELECT cd.query_id, cd.neighbor_id,
                 CAST(SUM(t.dist) AS BIGINT) AS adist
               FROM cd
               JOIN enc e ON e.vec_id = cd.neighbor_id
               JOIN qtab t ON t.query_id = cd.query_id AND t.cell = cd.cell
                          AND t.m = e.m AND t.code = e.code
               GROUP BY 1, 2),
             r AS (
               SELECT query_id, neighbor_id, adist,
                 row_number() OVER (PARTITION BY query_id
                                    ORDER BY adist, neighbor_id) AS rnk
               FROM ad)
             SELECT query_id, CAST(rnk AS BIGINT) AS rank, neighbor_id, adist
             FROM r WHERE rnk <= 10 ORDER BY query_id, rank"""

  val all: Seq[Q] = Seq(

    // Exact k-NN by dot product (unit vectors ⇒ cosine): every 40th vector
    // queries the full corpus; top-10 each, deterministic tiebreak.
    Q("q19_knn_bruteforce",
      (s, d) => Similarity.bruteForceTopK(
          Tables.embeddings(s, d), "vec_id", "embedding",
          col("vec_id") % 40 === 0, k = 10)
        .orderBy(col("query_id"), col("rank")),
      Some("""WITH q AS (
               SELECT vec_id, embedding FROM embeddings WHERE vec_id % 40 = 0),
             p AS (
               SELECT q.vec_id AS query_id, e.vec_id AS neighbor_id,
                 SUM(CAST(floor(q.embedding[i] * 1048576.0) AS BIGINT)
                   * CAST(floor(e.embedding[i] * 1048576.0) AS BIGINT)) / 1099511627776.0 AS dotx
               FROM q, embeddings e, range(1, 65) t(i)
               WHERE e.vec_id <> q.vec_id
               GROUP BY 1, 2),
             r AS (
               SELECT query_id, neighbor_id, dotx,
                 row_number() OVER (PARTITION BY query_id
                                    ORDER BY dotx DESC, neighbor_id) AS rnk
               FROM p)
             SELECT query_id, CAST(rnk AS BIGINT) AS rank, neighbor_id,
                    CAST(dotx AS DOUBLE) AS dot
             FROM r WHERE rnk <= 10 ORDER BY query_id, rank""")),

    // Exact embedding near-dup pairs: all (a < b) with dot ≥ 0.4.
    Q("q21_embedding_neardup",
      (s, d) => Similarity.nearDupPairs(
          Tables.embeddings(s, d), "vec_id", "embedding", 0.4)
        .orderBy(col("dot").desc, col("vec_a"), col("vec_b")),
      Some("""WITH p AS (
               SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
                 SUM(CAST(floor(a.embedding[i] * 1048576.0) AS BIGINT)
                   * CAST(floor(b.embedding[i] * 1048576.0) AS BIGINT)) / 1099511627776.0 AS dotx
               FROM embeddings a
               JOIN embeddings b ON a.vec_id < b.vec_id,
               range(1, 65) t(i)
               GROUP BY 1, 2)
             SELECT vec_a, vec_b, CAST(dotx AS DOUBLE) AS dot
             FROM p WHERE CAST(dotx AS DOUBLE) >= 0.4
             ORDER BY dot DESC, vec_a, vec_b""")),

    // LSH-bucketed approximate top-k — the zero-training LSH BASELINE,
    // not the production top-k path: at stress scale (80k×2k, STRESS.md
    // ann table) the multi-probe fan-out that buys recall makes it barely
    // faster than brute force; production top-k is IVF (q35 flat / q94
    // hierarchical), and LSH banding's production role is the near-dup-
    // pairs path (q46) where radius-0 collisions suffice. The
    // approximation is md5-deterministic END TO END — ±1 hyperplanes from
    // md5("p:j"), integer band keys, capped buckets, radius-3 multi-probe,
    // exact fixed-point re-score — so the oracle re-derives the ENTIRE
    // approximate pipeline in SQL (the q59 playbook applied to ANN):
    // result rows value-match, not just count. Recall vs brute force is
    // additionally asserted in SimilaritySpec.
    Q("q31_ann_topk",
      (s, d) => Similarity.annTopK(
          Tables.embeddings(s, d), "vec_id", "embedding",
          col("vec_id") % 40 === 0, k = 10)
        .orderBy(col("query_id"), col("rank")),
      Some("""WITH pl AS (
               SELECT CAST(t1.range AS BIGINT) AS p, CAST(t2.range AS BIGINT) AS j,
                 CASE WHEN substr(md5(CAST(t1.range AS VARCHAR) || ':'
                     || CAST(t2.range AS VARCHAR)), 1, 1) >= '8'
                   THEN 1 ELSE -1 END AS v
               FROM range(64) t1, range(64) t2),
             q AS (
               SELECT vec_id, list_transform(embedding,
                 x -> CAST(floor(CAST(x AS DOUBLE) * 1048576.0) AS BIGINT)) AS qv
               FROM embeddings),
             u AS (
               SELECT vec_id, CAST(t.j AS BIGINT) AS j, qv[CAST(t.j AS INT) + 1] AS qj
               FROM q, UNNEST(range(64)) AS t(j)),
             dp AS (
               SELECT u.vec_id, pl.p, CAST(SUM(pl.v * u.qj) AS BIGINT) AS d
               FROM u JOIN pl ON pl.j = u.j GROUP BY 1, 2),
             bk AS (
               SELECT vec_id, CAST(p // 8 AS INTEGER) AS band,
                 CAST(SUM(CASE WHEN d >= 0
                   THEN 1 << CAST(p % 8 AS INTEGER) ELSE 0 END) AS INTEGER)
                   AS band_key
               FROM dp GROUP BY 1, 2),
             ok AS (SELECT band, band_key FROM bk
                    GROUP BY 1, 2 HAVING COUNT(*) <= 1000),
             corpus AS (SELECT bk.vec_id AS neighbor_id, bk.band, bk.band_key
                        FROM bk JOIN ok USING (band, band_key)),
             mk AS (SELECT CAST(range AS INTEGER) AS mask FROM range(256)
                    WHERE bit_count(CAST(range AS BIGINT)) <= 3),
             pr AS (SELECT bk.vec_id AS query_id, bk.band,
                      CAST(xor(bk.band_key, mk.mask) AS INTEGER) AS band_key
                    FROM bk, mk WHERE bk.vec_id % 40 = 0),
             cd AS (SELECT DISTINCT pr.query_id, corpus.neighbor_id
                    FROM pr JOIN corpus USING (band, band_key)
                    WHERE pr.query_id <> corpus.neighbor_id),
             sc AS (SELECT cd.query_id, cd.neighbor_id,
                      CAST(list_sum(list_transform(range(1, 65),
                        i -> a.qv[i] * b.qv[i])) AS BIGINT) / 1099511627776.0
                        AS dotx
                    FROM cd JOIN q a ON a.vec_id = cd.query_id
                            JOIN q b ON b.vec_id = cd.neighbor_id),
             r AS (SELECT query_id, neighbor_id, dotx,
                     row_number() OVER (PARTITION BY query_id
                       ORDER BY dotx DESC, neighbor_id) AS rnk FROM sc)
             SELECT query_id, CAST(rnk AS BIGINT) AS rank, neighbor_id,
               CAST(dotx AS DOUBLE) AS dot
             FROM r WHERE rnk <= 10 ORDER BY query_id, rank""")),

    // LSH-bucketed approximate near-dup PAIRS — the corpus-scale path for
    // q21's exact quadratic form (candidates = bucket-mates only, exact
    // fixed-point re-score). The testdata corpus has no true near-dups
    // (max pair dot ≈ 0.5), so the query plants deterministic
    // near-duplicates (every 20th vector, slightly perturbed, id+1e6) and
    // mines at the operator's actual regime (dot ≥ 0.9 — where hyperplane
    // bucket collision probability is high). Like q31, the approximation is
    // md5-deterministic end to end, so the oracle re-derives the full
    // pipeline — plant, sign, band, cap, bucket-join, exact re-score — and
    // the emitted pairs value-match. SimilaritySpec additionally asserts
    // recall + soundness vs the exact pair set.
    Q("q46_ann_neardup_pairs",
      (s, d) => {
        val base = Tables.embeddings(s, d).select(col("vec_id"), col("embedding"))
        val planted = base.filter(col("vec_id") % 20 === 0)
          .select((col("vec_id") + lit(1000000L)).as("vec_id"),
            expr("transform(embedding, (x, i) -> " +
              "CAST(x + 0.001D * (CAST(i % 5 AS DOUBLE) - 2.0D) AS FLOAT))")
              .as("embedding"))
        Similarity.annNearDupPairs(base.unionByName(planted),
            "vec_id", "embedding", threshold = 0.9)
          .orderBy(col("dot").desc, col("vec_a"), col("vec_b"))
      },
      Some("""WITH pe AS (
               SELECT vec_id + 1000000 AS vec_id,
                 list_transform(embedding, (x, i) ->
                   CAST(CAST(x AS DOUBLE)
                     + CAST(0.001 AS DOUBLE)
                       * (CAST((i - 1) % 5 AS DOUBLE) - 2.0) AS REAL))
                   AS embedding
               FROM embeddings WHERE vec_id % 20 = 0),
             allv AS (
               SELECT vec_id, embedding FROM embeddings
               UNION ALL SELECT vec_id, embedding FROM pe),
             pl AS (
               SELECT CAST(t1.range AS BIGINT) AS p, CAST(t2.range AS BIGINT) AS j,
                 CASE WHEN substr(md5(CAST(t1.range AS VARCHAR) || ':'
                     || CAST(t2.range AS VARCHAR)), 1, 1) >= '8'
                   THEN 1 ELSE -1 END AS v
               FROM range(64) t1, range(64) t2),
             q AS (
               SELECT vec_id, list_transform(embedding,
                 x -> CAST(floor(CAST(x AS DOUBLE) * 1048576.0) AS BIGINT)) AS qv
               FROM allv),
             u AS (
               SELECT vec_id, CAST(t.j AS BIGINT) AS j, qv[CAST(t.j AS INT) + 1] AS qj
               FROM q, UNNEST(range(64)) AS t(j)),
             dp AS (
               SELECT u.vec_id, pl.p, CAST(SUM(pl.v * u.qj) AS BIGINT) AS d
               FROM u JOIN pl ON pl.j = u.j GROUP BY 1, 2),
             bk AS (
               SELECT vec_id, CAST(p // 8 AS INTEGER) AS band,
                 CAST(SUM(CASE WHEN d >= 0
                   THEN 1 << CAST(p % 8 AS INTEGER) ELSE 0 END) AS INTEGER)
                   AS band_key
               FROM dp GROUP BY 1, 2),
             ok AS (SELECT band, band_key FROM bk
                    GROUP BY 1, 2 HAVING COUNT(*) <= 1000),
             bnd AS (SELECT bk.vec_id, bk.band, bk.band_key
                     FROM bk JOIN ok USING (band, band_key)),
             cd AS (SELECT DISTINCT a.vec_id AS vec_a, b.vec_id AS vec_b
                    FROM bnd a JOIN bnd b USING (band, band_key)
                    WHERE a.vec_id < b.vec_id),
             sc AS (SELECT cd.vec_a, cd.vec_b,
                      CAST(list_sum(list_transform(range(1, 65),
                        i -> a.qv[i] * b.qv[i])) AS BIGINT) / 1099511627776.0
                        AS dotx
                    FROM cd JOIN q a ON a.vec_id = cd.vec_a
                            JOIN q b ON b.vec_id = cd.vec_b)
             SELECT vec_a, vec_b, CAST(dotx AS DOUBLE) AS dot
             FROM sc WHERE CAST(dotx AS DOUBLE) >= 0.9
             ORDER BY dot DESC, vec_a, vec_b""")),

    // IVF-partitioned approximate top-k — the second ANN scale path
    // (cell-partitioned index vs overlapping LSH buckets). Spherical
    // centroid seeds (mass-proportional md5 sample, each projected onto
    // the fixed-point unit sphere — what keeps cell occupancy balanced
    // under MIPS; see ivfCentroids' measured rationale), integer-dot
    // argmax assignment, nProbe closest cells, exact re-score: every step
    // is deterministic integer math, so the oracle re-derives the whole
    // index + probe pipeline (q59 playbook; seed + exact-isqrt
    // normalization via seedCtes). SimilaritySpec additionally
    // asserts nProbe=nCells degenerates to the exact brute-force result.
    Q("q35_ivf_topk",
      (s, d) => Similarity.ivfTopK(
          Tables.embeddings(s, d), "vec_id", "embedding",
          col("vec_id") % 40 === 0, k = 10, nCells = 32, nProbe = 8)
        .orderBy(col("query_id"), col("rank")),
      Some(s"""WITH q AS (
               SELECT vec_id, list_transform(embedding,
                 x -> CAST(floor(CAST(x AS DOUBLE) * 1048576.0) AS BIGINT)) AS qv
               FROM embeddings),
             ${seedCtes("q", 32, "ct")},
             dall AS (
               SELECT q.vec_id, c.cent_id,
                 CAST(list_sum(list_transform(range(1, 65),
                   i -> q.qv[i] * c.cv[i])) AS BIGINT) AS d
               FROM q, ct c),
             asg AS (
               SELECT vec_id, cent_id AS cell FROM (
                 SELECT vec_id, cent_id, row_number() OVER (PARTITION BY vec_id
                   ORDER BY d DESC, cent_id) AS rn FROM dall)
               WHERE rn = 1),
             pb AS (
               SELECT vec_id AS query_id, cent_id AS cell FROM (
                 SELECT vec_id, cent_id, row_number() OVER (PARTITION BY vec_id
                   ORDER BY d DESC, cent_id) AS rn
                 FROM dall WHERE vec_id % 40 = 0)
               WHERE rn <= 8),
             cd AS (
               SELECT pb.query_id, asg.vec_id AS neighbor_id
               FROM pb JOIN asg USING (cell)
               WHERE asg.vec_id <> pb.query_id),
             sc AS (
               SELECT cd.query_id, cd.neighbor_id,
                 CAST(list_sum(list_transform(range(1, 65),
                   i -> a.qv[i] * b.qv[i])) AS BIGINT) / 1099511627776.0 AS dotx
               FROM cd JOIN q a ON a.vec_id = cd.query_id
                       JOIN q b ON b.vec_id = cd.neighbor_id),
             r AS (SELECT query_id, neighbor_id, dotx,
                     row_number() OVER (PARTITION BY query_id
                       ORDER BY dotx DESC, neighbor_id) AS rnk FROM sc)
             SELECT query_id, CAST(rnk AS BIGINT) AS rank, neighbor_id,
               CAST(dotx AS DOUBLE) AS dot
             FROM r WHERE rnk <= 10 ORDER BY query_id, rank""")),

    // Hierarchical (two-level) IVF top-k — the scale path past flat IVF's
    // √N broadcast wall. Deterministic at both quantizer levels (L1 =
    // spherical md5 sample, L2 = rank-by-md5 within cell, also
    // normalized), so the oracle re-derives L1 seeding, L1 assignment,
    // per-cell L2 seeding + normalization, two-stage probing, and the
    // exact re-score.
    Q("q94_ivf2_topk",
      (s, d) => Similarity.ivfTopK2(
          Tables.embeddings(s, d), "vec_id", "embedding",
          col("vec_id") % 40 === 0, k = 10,
          nCellsL1 = 8, nCellsL2 = 16, nProbeL1 = 6, nProbeL2 = 32)
        .orderBy(col("query_id"), col("rank")),
      Some(s"""WITH q AS (
               SELECT vec_id, list_transform(embedding,
                 x -> CAST(floor(CAST(x AS DOUBLE) * 1048576.0) AS BIGINT)) AS qv
               FROM embeddings),
             ${seedCtes("q", 8, "c1")},
             d1 AS (
               SELECT q.vec_id, c.cent_id,
                 CAST(list_sum(list_transform(range(1, 65),
                   i -> q.qv[i] * c.cv[i])) AS BIGINT) AS d
               FROM q, c1 c),
             a1 AS (
               SELECT vec_id, cent_id AS cell1 FROM (
                 SELECT vec_id, cent_id, row_number() OVER (PARTITION BY vec_id
                   ORDER BY d DESC, cent_id) AS rn FROM d1)
               WHERE rn = 1),
             c2_raw AS (
               SELECT cell1, vec_id AS cent_id, qv AS cv FROM (
                 SELECT a1.cell1, a1.vec_id, q.qv,
                   row_number() OVER (PARTITION BY a1.cell1
                     ORDER BY md5(CAST(a1.vec_id AS VARCHAR)), a1.vec_id) AS rn
                 FROM a1 JOIN q USING (vec_id))
               WHERE rn <= 16),
             ${normCtes("c2_raw", "c2", Seq("cell1"))},
             d2 AS (
               SELECT a1.vec_id, c.cent_id,
                 CAST(list_sum(list_transform(range(1, 65),
                   i -> q.qv[i] * c.cv[i])) AS BIGINT) AS d
               FROM a1 JOIN q USING (vec_id) JOIN c2 c ON c.cell1 = a1.cell1),
             idx AS (
               SELECT a1.vec_id, a1.cell1, x.cell2 FROM a1 JOIN (
                 SELECT vec_id, cent_id AS cell2 FROM (
                   SELECT vec_id, cent_id, row_number() OVER (PARTITION BY vec_id
                     ORDER BY d DESC, cent_id) AS rn FROM d2)
                 WHERE rn = 1) x USING (vec_id)),
             p1 AS (
               SELECT vec_id AS query_id, cent_id AS cell1 FROM (
                 SELECT vec_id, cent_id, row_number() OVER (PARTITION BY vec_id
                   ORDER BY d DESC, cent_id) AS rn
                 FROM d1 WHERE vec_id % 40 = 0)
               WHERE rn <= 6),
             p2 AS (
               SELECT query_id, cell1, cell2 FROM (
                 SELECT p1.query_id, p1.cell1, c.cent_id AS cell2,
                   row_number() OVER (PARTITION BY p1.query_id
                     ORDER BY CAST(list_sum(list_transform(range(1, 65),
                       i -> q.qv[i] * c.cv[i])) AS BIGINT) DESC,
                       p1.cell1, c.cent_id) AS rn
                 FROM p1 JOIN q ON q.vec_id = p1.query_id
                         JOIN c2 c ON c.cell1 = p1.cell1)
               WHERE rn <= 32),
             cd AS (
               SELECT p2.query_id, idx.vec_id AS neighbor_id
               FROM p2 JOIN idx ON idx.cell1 = p2.cell1 AND idx.cell2 = p2.cell2
               WHERE idx.vec_id <> p2.query_id),
             sc AS (
               SELECT cd.query_id, cd.neighbor_id,
                 CAST(list_sum(list_transform(range(1, 65),
                   i -> a.qv[i] * b.qv[i])) AS BIGINT) / 1099511627776.0 AS dotx
               FROM cd JOIN q a ON a.vec_id = cd.query_id
                       JOIN q b ON b.vec_id = cd.neighbor_id),
             r AS (SELECT query_id, neighbor_id, dotx,
                     row_number() OVER (PARTITION BY query_id
                       ORDER BY dotx DESC, neighbor_id) AS rnk FROM sc)
             SELECT query_id, CAST(rnk AS BIGINT) AS rank, neighbor_id,
               CAST(dotx AS DOUBLE) AS dot
             FROM r WHERE rnk <= 10 ORDER BY query_id, rank""")),

    // K-means clustering, FULLY oracled: md5-sample seed, one exact-integer
    // Lloyd round, final assignment with the fixed-point dot. The oracle
    // re-derives the complete training loop in SQL — possible only because
    // no step ever touches a float (integer-mean updates, integer-dot
    // argmax, deterministic tiebreaks).
    Q("q59_kmeans_assign",
      (s, d) => Similarity.kmeansAssign(Tables.embeddings(s, d), "vec_id",
          "embedding", nCells = 16, trainIters = 1)
        .orderBy(col("vec_id")),
      Some(s"""WITH q AS (
               SELECT vec_id,
                 list_transform(embedding,
                   x -> CAST(floor(CAST(x AS DOUBLE) * 1048576.0) AS BIGINT)) AS qv
               FROM embeddings),
             ${seedCtes("q", 16, "seed")},
             d1 AS (
               SELECT q.vec_id, q.qv, s.cent_id,
                 CAST(list_sum(list_transform(range(1, len(q.qv) + 1),
                   i -> q.qv[i] * s.cv[i])) AS BIGINT) AS dot
               FROM q, seed s),
             a1 AS (
               SELECT vec_id, qv, cent_id AS cell
               FROM (SELECT *, row_number() OVER (PARTITION BY vec_id
                       ORDER BY dot DESC, cent_id) AS rn FROM d1)
               WHERE rn = 1),
             mexp AS (
               SELECT cell, i AS pos, qv[i] AS v
               FROM a1, UNNEST(range(1, len(qv) + 1)) AS t(i)),
             msum AS (
               SELECT cell AS cent_id, pos,
                 CAST(SUM(v) AS BIGINT) AS s, CAST(COUNT(*) AS BIGINT) AS n
               FROM mexp GROUP BY cell, pos),
             mdiv AS (
               SELECT cent_id, pos,
                 CASE WHEN s < 0 THEN -((-s) // n) ELSE s // n END AS mv
               FROM msum),
             newc AS (
               SELECT cent_id, list(mv ORDER BY pos) AS cv
               FROM mdiv GROUP BY cent_id),
             ${normCtes("newc", "newcn")},
             cents1 AS (
               SELECT s.cent_id, COALESCE(n.cv, s.cv) AS cv
               FROM seed s LEFT JOIN newcn n ON n.cent_id = s.cent_id),
             d2 AS (
               SELECT q.vec_id, c.cent_id,
                 CAST(list_sum(list_transform(range(1, len(q.qv) + 1),
                   i -> q.qv[i] * c.cv[i])) AS BIGINT) AS dot
               FROM q, cents1 c)
             SELECT vec_id, CAST(cent_id AS BIGINT) AS cell, dot AS dot_fp
             FROM (SELECT *, row_number() OVER (PARTITION BY vec_id
                     ORDER BY dot DESC, cent_id) AS rn FROM d2)
             WHERE rn = 1 ORDER BY vec_id""")),

    // Semantic dedup: the q59 training chain, then pairs scored ONLY within
    // each cell; a vector with a smaller-id cell-mate at dot >= 0.4 is
    // dropped. The oracle re-derives the whole pipeline — clustering,
    // within-cell pair scoring, greedy survivor choice.
    Q("q62_semantic_dedup",
      (s, d) => Similarity.semanticDedup(Tables.embeddings(s, d), "vec_id",
          "embedding", nCells = 16, trainIters = 1, threshold = 0.4)
        .orderBy(col("vec_id")),
      Some(s"""WITH q AS (
               SELECT vec_id,
                 list_transform(embedding,
                   x -> CAST(floor(CAST(x AS DOUBLE) * 1048576.0) AS BIGINT)) AS qv
               FROM embeddings),
             ${seedCtes("q", 16, "seed")},
             d1 AS (
               SELECT q.vec_id, q.qv, s.cent_id,
                 CAST(list_sum(list_transform(range(1, len(q.qv) + 1),
                   i -> q.qv[i] * s.cv[i])) AS BIGINT) AS dot
               FROM q, seed s),
             a1 AS (
               SELECT vec_id, qv, cent_id AS cell
               FROM (SELECT *, row_number() OVER (PARTITION BY vec_id
                       ORDER BY dot DESC, cent_id) AS rn FROM d1)
               WHERE rn = 1),
             mexp AS (
               SELECT cell, i AS pos, qv[i] AS v
               FROM a1, UNNEST(range(1, len(qv) + 1)) AS t(i)),
             msum AS (
               SELECT cell AS cent_id, pos,
                 CAST(SUM(v) AS BIGINT) AS s, CAST(COUNT(*) AS BIGINT) AS n
               FROM mexp GROUP BY cell, pos),
             mdiv AS (
               SELECT cent_id, pos,
                 CASE WHEN s < 0 THEN -((-s) // n) ELSE s // n END AS mv
               FROM msum),
             newc AS (
               SELECT cent_id, list(mv ORDER BY pos) AS cv
               FROM mdiv GROUP BY cent_id),
             ${normCtes("newc", "newcn")},
             cents1 AS (
               SELECT s.cent_id, COALESCE(n.cv, s.cv) AS cv
               FROM seed s LEFT JOIN newcn n ON n.cent_id = s.cent_id),
             d2 AS (
               SELECT q.vec_id, q.qv, c.cent_id,
                 CAST(list_sum(list_transform(range(1, len(q.qv) + 1),
                   i -> q.qv[i] * c.cv[i])) AS BIGINT) AS dot
               FROM q, cents1 c),
             a2 AS (
               SELECT vec_id, qv, cent_id AS cell
               FROM (SELECT *, row_number() OVER (PARTITION BY vec_id
                       ORDER BY dot DESC, cent_id) AS rn FROM d2)
               WHERE rn = 1),
             dup AS (
               SELECT DISTINCT y.vec_id
               FROM a2 x JOIN a2 y
                 ON x.cell = y.cell AND x.vec_id < y.vec_id
               WHERE CAST(list_sum(list_transform(range(1, len(x.qv) + 1),
                       i -> x.qv[i] * y.qv[i])) AS BIGINT)
                     / 1099511627776.0 >= 0.4),
             out AS (
               SELECT a2.vec_id, CAST(a2.cell AS BIGINT) AS cell,
                 (dup.vec_id IS NULL) AS keep
               FROM a2 LEFT JOIN dup ON a2.vec_id = dup.vec_id)
             SELECT * FROM out ORDER BY vec_id""")),

    // Labeled-dataset separation audit: per-label cohesion vs margin to the
    // nearest other centroid. Every cross-row/cross-element sum is over
    // exact integers (2^20 quantization; per-dim squared terms rounded to
    // micros before the within-vector sum).
    Q("q84_label_separation",
      (s, d) => graft.operators.Similarity.labelSeparation(
          Tables.embeddings(s, d), "vec_id", "embedding", "label")
        .orderBy(col("label")),
      Some("""WITH q AS (
               SELECT vec_id, CAST(label AS BIGINT) AS label,
                 list_transform(embedding,
                   x -> CAST(floor(CAST(x AS DOUBLE) * 1048576.0) AS BIGINT)) AS qv
               FROM embeddings),
             dim AS (SELECT MAX(len(qv)) AS dm FROM q),
             ex AS (
               SELECT label, i, qv[i] AS qi
               FROM q, dim, UNNEST(range(1, dm + 1)) t(i)),
             s AS (
               SELECT label, i, CAST(SUM(qi) AS BIGINT) AS si
               FROM ex GROUP BY 1, 2),
             c AS (SELECT label, list(si ORDER BY i) AS cs FROM s GROUP BY 1),
             n AS (SELECT label, CAST(COUNT(*) AS BIGINT) AS nv FROM q GROUP BY 1),
             d AS (
               SELECT q.vec_id, q.label,
                 CAST(list_sum(list_transform(range(1, len(qv) + 1), i ->
                   CAST(round((qv[i]/1048576.0 - cs[i]/(nv*1048576.0))
                            * (qv[i]/1048576.0 - cs[i]/(nv*1048576.0))
                            * 1000000.0, 0) AS BIGINT))) AS BIGINT) AS d2m
               FROM q JOIN c ON c.label = q.label JOIN n ON n.label = q.label),
             intra AS (
               SELECT label, CAST(COUNT(*) AS BIGINT) AS n_vecs,
                 CAST(SUM(d2m) AS BIGINT) AS sm
               FROM d GROUP BY 1),
             cent AS (
               SELECT c.label,
                 list_transform(range(1, len(cs) + 1),
                   i -> cs[i]/(nv*1048576.0)) AS cd
               FROM c JOIN n ON n.label = c.label),
             pair AS (
               SELECT a.label AS la,
                 CAST(list_sum(list_transform(range(1, len(a.cd) + 1), i ->
                   CAST(round((a.cd[i] - b.cd[i]) * (a.cd[i] - b.cd[i])
                     * 1000000.0, 0) AS BIGINT))) AS BIGINT) AS pm
               FROM cent a JOIN cent b ON a.label <> b.label),
             inter AS (SELECT la AS label, MIN(pm) AS im FROM pair GROUP BY 1)
             SELECT i1.label, i1.n_vecs,
               CAST(sm AS DOUBLE) / (i1.n_vecs * 1000000) AS intra_d2,
               CAST(im AS DOUBLE) / 1000000 AS inter_d2,
               CASE WHEN sm > 0 THEN
                 round((CAST(im AS DOUBLE) / 1000000)
                   / (CAST(sm AS DOUBLE) / (i1.n_vecs * 1000000)), 6) END
                 AS separation
             FROM intra i1 JOIN inter ON inter.label = i1.label
             ORDER BY i1.label""")),

    // Johnson-Lindenstrauss random-projection distortion audit: every
    // sampled pair's original fixed-point dot vs its projected dot (±1
    // matrix, 64→16 dims). The matrix derives from md5 on BOTH sides
    // (Similarity.projComp ≡ the oracle's substr(md5(...),1,1) >= '8'), so
    // the entire reduction — projection included — is oracle-exact.
    Q("q89_projection_audit",
      (s, d) => Similarity.projectionAudit(Tables.embeddings(s, d), "vec_id",
          "embedding", dim = 64, outDim = 16, sampleMod = 8L)
        .orderBy(col("vec_a"), col("vec_b")),
      Some("""WITH r AS (
               SELECT CAST(t1.range AS BIGINT) AS j, CAST(t2.range AS BIGINT) AS i,
                 CASE WHEN substr(md5('proj:' || CAST(t1.range AS VARCHAR)
                     || ':' || CAST(t2.range AS VARCHAR)), 1, 1) >= '8'
                   THEN 1 ELSE -1 END AS v
               FROM range(16) t1, range(64) t2),
             q AS (
               SELECT vec_id,
                 list_transform(embedding,
                   x -> CAST(floor(CAST(x AS DOUBLE) * 1048576.0) AS BIGINT)) AS qv
               FROM embeddings WHERE vec_id % 8 = 0),
             u AS (
               SELECT vec_id, CAST(t.i AS BIGINT) AS i,
                 qv[CAST(t.i AS INT) + 1] AS qi
               FROM q, UNNEST(range(64)) AS t(i)),
             p AS (
               SELECT u.vec_id, r.j, CAST(SUM(r.v * u.qi) AS BIGINT) AS pj
               FROM u JOIN r ON r.i = u.i GROUP BY 1, 2),
             od AS (
               SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
                 CAST(SUM(a.qv[i] * b.qv[i]) AS BIGINT) AS sd
               FROM q a JOIN q b ON a.vec_id < b.vec_id, range(1, 65) t(i)
               GROUP BY 1, 2),
             pd AS (
               SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
                 CAST(SUM(a.pj * b.pj) AS BIGINT) AS sp
               FROM p a JOIN p b ON a.vec_id < b.vec_id AND a.j = b.j
               GROUP BY 1, 2),
             f AS (
               SELECT od.vec_a, od.vec_b,
                 CAST(sd AS DOUBLE) / 1099511627776.0 AS dot_orig,
                 CAST(sp AS DOUBLE) / 17592186044416.0 AS dot_proj
               FROM od JOIN pd USING (vec_a, vec_b))
             SELECT vec_a, vec_b, dot_orig, dot_proj,
               CAST(round((dot_proj - dot_orig) * 1e6) AS BIGINT) AS err_micros
             FROM f ORDER BY vec_a, vec_b""")),

    // Cluster-stratified diversity sample: the q59 exact-integer k-means
    // chain, then at most 8 md5-picked vectors per cell (WindowGroupLimit
    // plan — no per-cell full sort). Training re-derived in the oracle.
    Q("q92_diverse_sample",
      (s, d) => Similarity.diverseSample(Tables.embeddings(s, d), "vec_id",
          "embedding", nCells = 16, trainIters = 1, perCell = 8)
        .orderBy(col("vec_id")),
      Some(s"""WITH q AS (
               SELECT vec_id,
                 list_transform(embedding,
                   x -> CAST(floor(CAST(x AS DOUBLE) * 1048576.0) AS BIGINT)) AS qv
               FROM embeddings),
             ${seedCtes("q", 16, "seed")},
             d1 AS (
               SELECT q.vec_id, q.qv, s.cent_id,
                 CAST(list_sum(list_transform(range(1, len(q.qv) + 1),
                   i -> q.qv[i] * s.cv[i])) AS BIGINT) AS dot
               FROM q, seed s),
             a1 AS (
               SELECT vec_id, qv, cent_id AS cell
               FROM (SELECT *, row_number() OVER (PARTITION BY vec_id
                       ORDER BY dot DESC, cent_id) AS rn FROM d1)
               WHERE rn = 1),
             mexp AS (
               SELECT cell, i AS pos, qv[i] AS v
               FROM a1, UNNEST(range(1, len(qv) + 1)) AS t(i)),
             msum AS (
               SELECT cell AS cent_id, pos,
                 CAST(SUM(v) AS BIGINT) AS s, CAST(COUNT(*) AS BIGINT) AS n
               FROM mexp GROUP BY cell, pos),
             mdiv AS (
               SELECT cent_id, pos,
                 CASE WHEN s < 0 THEN -((-s) // n) ELSE s // n END AS mv
               FROM msum),
             newc AS (
               SELECT cent_id, list(mv ORDER BY pos) AS cv
               FROM mdiv GROUP BY cent_id),
             ${normCtes("newc", "newcn")},
             cents1 AS (
               SELECT s.cent_id, COALESCE(n.cv, s.cv) AS cv
               FROM seed s LEFT JOIN newcn n ON n.cent_id = s.cent_id),
             d2 AS (
               SELECT q.vec_id, c.cent_id,
                 CAST(list_sum(list_transform(range(1, len(q.qv) + 1),
                   i -> q.qv[i] * c.cv[i])) AS BIGINT) AS dot
               FROM q, cents1 c),
             a2 AS (
               SELECT vec_id, CAST(cent_id AS BIGINT) AS cell
               FROM (SELECT *, row_number() OVER (PARTITION BY vec_id
                       ORDER BY dot DESC, cent_id) AS rn FROM d2)
               WHERE rn = 1),
             rk AS (
               SELECT vec_id, cell,
                 CAST(row_number() OVER (PARTITION BY cell
                   ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id) AS INTEGER)
                   AS pick_order
               FROM a2)
             SELECT vec_id, cell, pick_order
             FROM rk WHERE pick_order <= 8 ORDER BY vec_id""")),

    // Product Quantization ADC top-k, FULLY oracled: per-subspace codebooks
    // (md5-seeded, one exact-integer L2 Lloyd round), corpus compressed to
    // M=16 6-bit codes/vector (96 bits vs 2048 full precision), queries
    // (every 40th id) ranked by table-lookup distances. The oracle
    // re-derives the ENTIRE pipeline — seeding, training, encoding, ADC —
    // in SQL; ADC falls out relationally as an (m, code) equi-join: each
    // (query, neighbor) pair matches exactly one table row per subspace, so
    // SUM(dist) over the join IS the ADC score.
    Q("q99_pq_adc_topk",
      (s, d) => Similarity.pqAdcTopK(Tables.embeddings(s, d), "vec_id",
          "embedding", col("vec_id") % 40 === 0, k = 10,
          m = 16, ks = 64, trainIters = 1)
        .orderBy(col("query_id"), col("rank")),
      Some("""WITH q AS (
               SELECT vec_id,
                 list_transform(embedding,
                   x -> CAST(floor(CAST(x AS DOUBLE) * 1048576.0) AS BIGINT)) AS qv
               FROM embeddings),
             seed AS (
               SELECT row_number() OVER (ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id) - 1
                        AS code, qv
               FROM (SELECT vec_id, qv FROM q
                     ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id LIMIT 64)),
             cb0 AS (
               SELECT t.m, s.code, u.j, s.qv[t.m * 4 + u.j + 1] AS v
               FROM seed s, UNNEST(range(0, 16)) AS t(m), UNNEST(range(0, 4)) AS u(j)),
             sub AS (
               SELECT q.vec_id, t.m, u.j, q.qv[t.m * 4 + u.j + 1] AS v
               FROM q, UNNEST(range(0, 16)) AS t(m), UNNEST(range(0, 4)) AS u(j)),
             d0 AS (
               SELECT s.vec_id, s.m, c.code,
                 CAST(SUM((s.v - c.v) * (s.v - c.v)) AS BIGINT) AS dist
               FROM sub s JOIN cb0 c ON c.m = s.m AND c.j = s.j
               GROUP BY 1, 2, 3),
             a0 AS (
               SELECT vec_id, m, code FROM (
                 SELECT *, row_number() OVER (PARTITION BY vec_id, m
                                              ORDER BY dist, code) AS rn FROM d0)
               WHERE rn = 1),
             msum AS (
               SELECT a.m, a.code, s.j,
                 CAST(SUM(s.v) AS BIGINT) AS sm, CAST(COUNT(*) AS BIGINT) AS n
               FROM a0 a JOIN sub s ON s.vec_id = a.vec_id AND s.m = a.m
               GROUP BY 1, 2, 3),
             cb1 AS (
               SELECT c.m, c.code, c.j,
                 COALESCE(CASE WHEN ms.sm < 0 THEN -((-ms.sm) // ms.n)
                               ELSE ms.sm // ms.n END, c.v) AS v
               FROM cb0 c LEFT JOIN msum ms
                 ON ms.m = c.m AND ms.code = c.code AND ms.j = c.j),
             d1 AS (
               SELECT s.vec_id, s.m, c.code,
                 CAST(SUM((s.v - c.v) * (s.v - c.v)) AS BIGINT) AS dist
               FROM sub s JOIN cb1 c ON c.m = s.m AND c.j = s.j
               GROUP BY 1, 2, 3),
             enc AS (
               SELECT vec_id, m, code, dist FROM (
                 SELECT *, row_number() OVER (PARTITION BY vec_id, m
                                              ORDER BY dist, code) AS rn FROM d1)
               WHERE rn = 1),
             ad AS (
               SELECT t.vec_id AS query_id, e.vec_id AS neighbor_id,
                 CAST(SUM(t.dist) AS BIGINT) AS adist
               FROM (SELECT vec_id, m, code FROM enc) e
               JOIN d1 t ON t.m = e.m AND t.code = e.code
               WHERE t.vec_id % 40 = 0 AND e.vec_id <> t.vec_id
               GROUP BY 1, 2),
             r AS (
               SELECT query_id, neighbor_id, adist,
                 row_number() OVER (PARTITION BY query_id
                                    ORDER BY adist, neighbor_id) AS rnk
               FROM ad)
             SELECT query_id, CAST(rnk AS BIGINT) AS rank, neighbor_id, adist
             FROM r WHERE rnk <= 10 ORDER BY query_id, rank""")),

    // IVF-PQ: the composed production serving shape — q35's coarse-cell
    // probing (spherical md5-sample seeds, integer-dot argmax, nProbe closest
    // cells) restricting the candidate set, q99's PQ codes + ADC lookups
    // scoring it. The oracle is the mechanical composition of the two
    // chains: candidates come from the probed-cell join, the ADC score
    // from the (m, code) equi-join over the trained codebook's distance
    // table. PqSpec asserts nProbe = nCells degenerates to exactly q99.
    Q("q100_ivfpq_topk",
      (s, d) => Similarity.ivfPqTopK(Tables.embeddings(s, d), "vec_id",
          "embedding", col("vec_id") % 40 === 0, k = 10,
          nCells = 32, nProbe = 8, m = 16, ks = 64, trainIters = 1)
        .orderBy(col("query_id"), col("rank")),
      Some(ivfPqOracle)),

    // RESIDUAL IVF-PQ (FAISS IVFPQ's actual encoding): codes quantize
    // v − centroid(cell) against a residual-trained codebook; distance
    // tables build per (query, probed cell). Same index size, lower
    // reconstruction error (recall gain measured in PqSpec); the whole
    // pipeline stays integer-exact, so the oracle re-derives residuals,
    // training, per-cell tables, and ADC ranking end to end.
    Q("q121_ivfpq_residual",
      (s, d) => Similarity.ivfPqResidualTopK(Tables.embeddings(s, d), "vec_id",
          "embedding", col("vec_id") % 40 === 0, k = 10,
          nCells = 32, nProbe = 8, m = 16, ks = 64, trainIters = 1)
        .orderBy(col("query_id"), col("rank")),
      Some(ivfPqResidualOracle)),

    // Residual index LIFECYCLE: q121's build persisted (codes + centroids
    // + codebook + the `_residual` encoding marker), reloaded, and served
    // through `VectorIndex.topK` — which must detect the marker and build
    // per-(query, probed-cell) residual tables. Oracle is byte-for-byte
    // q121's: a lost marker (raw tables against residual codes), a
    // quantizer drift, or a torn meta would all break the hash.
    Q("q122_residual_persist_serve",
      (s, d) => {
        import graft.operators.VectorIndex
        val dir = graft.Scratch.tempDir("graft-q122") + "/ivfpq"
        val emb = Tables.embeddings(s, d)
        VectorIndex.write(VectorIndex.build(emb, "vec_id", "embedding",
          nCells = 32, m = 16, ks = 64, trainIters = 1, residual = true), dir)
        VectorIndex.topK(VectorIndex.read(s, dir),
            emb.filter(col("vec_id") % 40 === 0),
            "vec_id", "embedding", k = 10, nProbe = 8)
          .orderBy(col("query_id"), col("rank"))
      },
      Some(ivfPqResidualOracle)),

    // Index LIFECYCLE: build the q100 IVF-PQ index, WRITE it to parquet
    // (codes + centroids + unrolled codebook + meta), READ it back, and
    // serve the same queries through `VectorIndex.topK` — the FAISS
    // write_index/read_index workflow. The oracle is byte-for-byte q100's:
    // every persisted column is exact integer math, so the storage hop
    // must be value-neutral; any loss, reorder, or type drift in the
    // round-trip breaks the hash match. Streaming serve over the same
    // loaded index is asserted in VectorIndexSpec.
    Q("q103_pq_persist_serve",
      (s, d) => {
        import graft.operators.VectorIndex
        val dir = graft.Scratch.tempDir("graft-q103") + "/ivfpq"
        val emb = Tables.embeddings(s, d)
        val built = VectorIndex.build(emb, "vec_id", "embedding",
          nCells = 32, m = 16, ks = 64, trainIters = 1)
        VectorIndex.write(built, dir)
        val loaded = VectorIndex.read(s, dir)
        VectorIndex.topK(loaded, emb.filter(col("vec_id") % 40 === 0),
            "vec_id", "embedding", k = 10, nProbe = 8)
          .orderBy(col("query_id"), col("rank"))
      },
      Some(ivfPqOracle)),

    // Incremental index MAINTENANCE (FAISS `index.add()`): build the index
    // over two thirds of the corpus, persist it, then `appendToDir` the
    // remaining third — assigned and PQ-encoded with the FROZEN quantizers,
    // committed as additional parquet files with no retrain and no rewrite
    // of existing data. Serving the standard query set afterwards must be
    // bit-identical to encoding the full corpus with the base-trained
    // artifacts, which is exactly what the oracle re-derives (training CTEs
    // filtered to the base slice, everything else full-corpus). Any stale
    // meta, lost delta file, or sneaky retrain breaks the hash match.
    Q("q104_index_append",
      (s, d) => {
        import graft.operators.VectorIndex
        val dir = graft.Scratch.tempDir("graft-q104") + "/ivfpq"
        val emb = Tables.embeddings(s, d)
        val built = VectorIndex.build(emb.filter(col("vec_id") % 3 =!= 0),
          "vec_id", "embedding", nCells = 32, m = 16, ks = 64, trainIters = 1)
        VectorIndex.write(built, dir)
        val appended = VectorIndex.appendToDir(s, dir,
          emb.filter(col("vec_id") % 3 === 0), "vec_id", "embedding")
        VectorIndex.topK(appended, emb.filter(col("vec_id") % 40 === 0),
            "vec_id", "embedding", k = 10, nProbe = 8)
          .orderBy(col("query_id"), col("rank"))
      },
      Some(ivfPqOracleTrainedOn(Some("vec_id % 3 <> 0")))),

    // Index DELETES (FAISS remove_ids): build + persist over the full
    // corpus, tombstone every 7th vector (an O(delta) commit — no data
    // file rewritten), reload, serve. Deleted vectors must vanish from
    // every result while the quantizers — trained before the delete —
    // stay frozen; the oracle is the full-corpus derivation with the
    // deleted ids excluded ONLY from the candidate set. A tombstone that
    // leaked into training, failed to suppress a neighbor, or suppressed
    // a live one breaks the hash. vacuum() ≡ tombstoned serve is pinned
    // in VectorIndexSpec.
    Q("q107_index_delete",
      (s, d) => {
        import graft.operators.VectorIndex
        val dir = graft.Scratch.tempDir("graft-q107") + "/ivfpq"
        val emb = Tables.embeddings(s, d)
        VectorIndex.write(VectorIndex.build(emb, "vec_id", "embedding",
          nCells = 32, m = 16, ks = 64, trainIters = 1), dir)
        VectorIndex.deleteIds(s, dir,
          emb.filter(col("vec_id") % 7 === 0).select("vec_id"), "vec_id")
        VectorIndex.topK(VectorIndex.read(s, dir),
            emb.filter(col("vec_id") % 40 === 0),
            "vec_id", "embedding", k = 10, nProbe = 8)
          .orderBy(col("query_id"), col("rank"))
      },
      Some(ivfPqOracleTrainedOn(None, Some("asg.vec_id % 7 <> 0")))),

    // Index RETRAIN (drift repair): build on two thirds of the corpus,
    // append the remaining third with FROZEN quantizers (q104's drift
    // state), then `VectorIndex.retrain` — re-derive centroids + codebook
    // from the full live corpus and re-encode everything, swapped in
    // atomically. Serving afterwards must be bit-identical to an index
    // built from scratch on the full corpus, so the oracle is exactly
    // q100's full-training SQL — while q104 (same drift state, no retrain)
    // oracles against the base-trained SQL. The PAIR is the proof that
    // retrain actually erases the frozen-quantizer approximation rather
    // than shuffling files. Delete-preservation and occupancy repair are
    // pinned in VectorIndexSpec.
    Q("q110_index_retrain",
      (s, d) => {
        import graft.operators.VectorIndex
        val dir = graft.Scratch.tempDir("graft-q110") + "/ivfpq"
        val emb = Tables.embeddings(s, d)
        VectorIndex.write(VectorIndex.build(emb.filter(col("vec_id") % 3 =!= 0),
          "vec_id", "embedding", nCells = 32, m = 16, ks = 64, trainIters = 1), dir)
        VectorIndex.appendToDir(s, dir,
          emb.filter(col("vec_id") % 3 === 0), "vec_id", "embedding")
        val rebuilt = VectorIndex.retrain(s, dir, emb, "vec_id", "embedding",
          nCells = 32, m = 16, ks = 64, trainIters = 1)
        VectorIndex.topK(rebuilt, emb.filter(col("vec_id") % 40 === 0),
            "vec_id", "embedding", k = 10, nProbe = 8)
          .orderBy(col("query_id"), col("rank"))
      },
      Some(ivfPqOracle)),

    // Drift OBSERVABLE: the per-cell occupancy census that gates q110's
    // retrain, for the same drift state (trained on two thirds, full
    // corpus assigned) and after the repair (trained on everything). Only
    // the coarse quantizer participates — seeds are the spherical md5
    // sample of the TRAINING slice, assignment the integer-dot argmax
    // over the full corpus — so the oracle re-derives both censuses
    // exactly (two seedCtes chains, one per training slice).
    // `occupancySkew` (max/mean of the `n` column) is the scalar a nightly
    // `retrainIfDrifted` gates on; VectorIndexSpec pins the gate itself.
    Q("q111_cell_occupancy",
      (s, d) => {
        import graft.operators.VectorIndex
        val emb = Tables.embeddings(s, d)
        val frozen = VectorIndex.append(
          VectorIndex.build(emb.filter(col("vec_id") % 3 =!= 0),
            "vec_id", "embedding", nCells = 32, m = 16, ks = 64, trainIters = 1),
          emb.filter(col("vec_id") % 3 === 0), "vec_id", "embedding")
        val repaired = VectorIndex.build(emb,
          "vec_id", "embedding", nCells = 32, m = 16, ks = 64, trainIters = 1)
        VectorIndex.cellOccupancy(frozen)
          .withColumn("phase", lit("frozen"))
          .unionByName(VectorIndex.cellOccupancy(repaired)
            .withColumn("phase", lit("retrained")))
          .select(col("phase"), col("cell").cast("long"),
            col("n").cast("long"))
          .orderBy(col("phase"), col("cell"))
      },
      Some(s"""WITH q AS (
               SELECT vec_id,
                 list_transform(embedding,
                   x -> CAST(floor(CAST(x AS DOUBLE) * 1048576.0) AS BIGINT)) AS qv
               FROM embeddings),
             tq AS (SELECT vec_id, qv FROM q WHERE vec_id % 3 <> 0),
             ${seedCtes("tq", 32, "ctf")},
             ${seedCtes("q", 32, "ctr")},
             df AS (
               SELECT q.vec_id, c.cent_id,
                 CAST(list_sum(list_transform(range(1, 65),
                   i -> q.qv[i] * c.cv[i])) AS BIGINT) AS d
               FROM q, ctf c),
             dr AS (
               SELECT q.vec_id, c.cent_id,
                 CAST(list_sum(list_transform(range(1, 65),
                   i -> q.qv[i] * c.cv[i])) AS BIGINT) AS d
               FROM q, ctr c),
             af AS (
               SELECT vec_id, cent_id AS cell FROM (
                 SELECT vec_id, cent_id, row_number() OVER (PARTITION BY vec_id
                   ORDER BY d DESC, cent_id) AS rn FROM df)
               WHERE rn = 1),
             ar AS (
               SELECT vec_id, cent_id AS cell FROM (
                 SELECT vec_id, cent_id, row_number() OVER (PARTITION BY vec_id
                   ORDER BY d DESC, cent_id) AS rn FROM dr)
               WHERE rn = 1)
             SELECT 'frozen' AS phase, CAST(cell AS BIGINT) AS cell,
               CAST(COUNT(*) AS BIGINT) AS n
             FROM af GROUP BY 2
             UNION ALL
             SELECT 'retrained' AS phase, CAST(cell AS BIGINT) AS cell,
               CAST(COUNT(*) AS BIGINT) AS n
             FROM ar GROUP BY 2
             ORDER BY phase, cell""")),

    // Filtered vector search, in-filter strategy: q35's IVF index and
    // probes, but candidates restricted to an allowed id set (label ∈
    // {2,3,5}) INSIDE the probed cells, before any dot is scored. The
    // index itself is untouched — one persisted index serves every
    // filter — so the oracle is q35's SQL with one extra semi-join on
    // the candidate side. Queries need not satisfy the filter (vec_id %
    // 40 spans all labels). The adaptive exact-vs-IVF routing around
    // this operator (Similarity.filteredTopK) is covered in
    // SimilaritySpec, where both regimes are asserted against exact
    // filtered brute force.
    Q("q115_filtered_ivf_topk",
      (s, d) => {
        val emb = Tables.embeddings(s, d)
        Similarity.ivfTopKFiltered(emb, "vec_id", "embedding",
            col("vec_id") % 40 === 0,
            emb.filter(col("label").isin(2, 3, 5)).select(col("vec_id")),
            k = 10, nCells = 32, nProbe = 8)
          .orderBy(col("query_id"), col("rank"))
      },
      Some(s"""WITH q AS (
               SELECT vec_id, list_transform(embedding,
                 x -> CAST(floor(CAST(x AS DOUBLE) * 1048576.0) AS BIGINT)) AS qv
               FROM embeddings),
             ${seedCtes("q", 32, "ct")},
             dall AS (
               SELECT q.vec_id, c.cent_id,
                 CAST(list_sum(list_transform(range(1, 65),
                   i -> q.qv[i] * c.cv[i])) AS BIGINT) AS d
               FROM q, ct c),
             asg AS (
               SELECT vec_id, cent_id AS cell FROM (
                 SELECT vec_id, cent_id, row_number() OVER (PARTITION BY vec_id
                   ORDER BY d DESC, cent_id) AS rn FROM dall)
               WHERE rn = 1),
             pb AS (
               SELECT vec_id AS query_id, cent_id AS cell FROM (
                 SELECT vec_id, cent_id, row_number() OVER (PARTITION BY vec_id
                   ORDER BY d DESC, cent_id) AS rn
                 FROM dall WHERE vec_id % 40 = 0)
               WHERE rn <= 8),
             cd AS (
               SELECT pb.query_id, asg.vec_id AS neighbor_id
               FROM pb JOIN asg USING (cell)
               JOIN embeddings lb ON lb.vec_id = asg.vec_id
               WHERE asg.vec_id <> pb.query_id AND lb.label IN (2, 3, 5)),
             sc AS (
               SELECT cd.query_id, cd.neighbor_id,
                 CAST(list_sum(list_transform(range(1, 65),
                   i -> a.qv[i] * b.qv[i])) AS BIGINT) / 1099511627776.0 AS dotx
               FROM cd JOIN q a ON a.vec_id = cd.query_id
                       JOIN q b ON b.vec_id = cd.neighbor_id),
             r AS (SELECT query_id, neighbor_id, dotx,
                     row_number() OVER (PARTITION BY query_id
                       ORDER BY dotx DESC, neighbor_id) AS rnk FROM sc)
             SELECT query_id, CAST(rnk AS BIGINT) AS rank, neighbor_id,
               CAST(dotx AS DOUBLE) AS dot
             FROM r WHERE rnk <= 10 ORDER BY query_id, rank""")),

    // Filtered serve against the PERSISTED index: q103's build → write →
    // read lifecycle, but the query carries a metadata filter (label ∈
    // {2,3,5}) applied to candidates inside the probed cells, before any
    // ADC distance is computed. The index artifacts are untouched — one
    // persisted index serves every filter — so the oracle is q100's SQL
    // with the filter on the candidate side only (the same injection
    // point as q107's tombstone exclusion, which this composes with).
    Q("q118_filtered_pq_serve",
      (s, d) => {
        import graft.operators.VectorIndex
        val dir = graft.Scratch.tempDir("graft-q118") + "/ivfpq"
        val emb = Tables.embeddings(s, d)
        VectorIndex.write(VectorIndex.build(emb, "vec_id", "embedding",
          nCells = 32, m = 16, ks = 64, trainIters = 1), dir)
        VectorIndex.topKFiltered(VectorIndex.read(s, dir),
            emb.filter(col("vec_id") % 40 === 0), "vec_id", "embedding",
            k = 10, nProbe = 8,
            allowed = emb.filter(col("label").isin(2, 3, 5)).select(col("vec_id")))
          .orderBy(col("query_id"), col("rank"))
      },
      Some(ivfPqOracleTrainedOn(None, Some(
        "asg.vec_id IN (SELECT vec_id FROM embeddings WHERE label IN (2, 3, 5))"))))
  )
}
