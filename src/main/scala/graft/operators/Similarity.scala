package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.functions.GraftFunctions

/** Vector-similarity operators over an embedding column (`array<float>`):
  * exact brute-force top-k / near-dup pairs, and a deterministic
  * random-hyperplane LSH path for approximate search at corpus scale.
  *
  * Training-data-pipeline extension (the reference has no vector ops).
  *
  * Determinism: exact paths compute dot products in fixed-point integer
  * arithmetic via zip_with+aggregate — integer addition is exact and
  * order-independent, so results are bit-identical across engines and
  * partitionings (a double sum would depend on reduction order). The LSH
  * path derives its hyperplanes from md5, so signatures are reproducible
  * run-to-run with no RNG state.
  *
  * Scale design: queries are broadcast against a partitioned candidate set
  * (no shuffle of the big side); ranking uses a per-query window (keys =
  * queries, each partition holds one query's candidates). The all-pairs
  * near-dup is quadratic by nature — production path is [[annCandidates]]
  * bucketing, with exact re-scoring only inside buckets.
  */
object Similarity {

  /** Deterministic fixed-point dot product: each float is quantized to
    * floor(x·2^20) (exact — double×power-of-two then floor), products and
    * sums are 64-bit integer math, the result is scaled back by 2^40.
    * Every step is exact in both Spark and DuckDB, so the resulting double
    * is bit-identical across engines and partitionings. (Float→DECIMAL casts
    * are NOT portable — the engines round the binary value differently.)
    * Quantization error ≤ ~1e-4 on unit vectors — irrelevant for ranking
    * and thresholding, which is what this feeds. */
  def dotFixedPoint(a: Column, b: Column): Column =
    expr(s"""aggregate(
      zip_with(${a.toString}, ${b.toString},
        (x, y) -> floor(CAST(x AS DOUBLE) * 1048576.0D) * floor(CAST(y AS DOUBLE) * 1048576.0D)),
      0L, (acc, v) -> acc + v)""") / lit(1099511627776.0d)

  /** Quantize a float vector to fixed-point longs ONCE — pair-wise dots then
    * reduce to multiply+sum (`dotQuantized`). On an all-pairs join this cuts
    * per-pair lambda work to a third vs [[dotFixedPoint]]. */
  def quantize(vec: Column): Column =
    expr(s"transform(${vec.toString}, x -> CAST(floor(CAST(x AS DOUBLE) * 1048576.0D) AS BIGINT))")

  /** Dot of two pre-[[quantize]]d vectors, scaled back to the double dot. */
  def dotQuantized(a: Column, b: Column): Column =
    expr(s"""aggregate(zip_with(${a.toString}, ${b.toString}, (x, y) -> x * y),
      0L, (acc, v) -> acc + v)""") / lit(1099511627776.0d)

  /** Double-precision cosine for non-oracled paths (unit vectors ⇒ dot). */
  def dotDouble(a: Column, b: Column): Column =
    expr(s"""aggregate(
      zip_with(${a.toString}, ${b.toString}, (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)),
      CAST(0 AS DOUBLE), (acc, v) -> acc + v)""")

  def cosineDouble(a: Column, b: Column): Column =
    dotDouble(a, b) / (sqrt(dotDouble(a, a)) * sqrt(dotDouble(b, b)))

  /** Exact brute-force top-k by dot product: each query (broadcast, small)
    * against every candidate (partitioned, huge). Deterministic tiebreak on
    * neighbor id. Self-matches excluded. */
  def bruteForceTopK(emb: DataFrame, idCol: String, vecCol: String,
                     queryPred: Column, k: Int): DataFrame =
    bruteForceTopKFrames(emb, emb.filter(queryPred), idCol, vecCol, k,
      emb.count())

  /** [[bruteForceTopK]] with the corpus and query frames decoupled — the
    * exact path of [[filteredTopK]], where the candidate corpus is a
    * filtered subset but queries come from the full id space. `nTotal`
    * is the candidate count for the refine's sampled bound. */
  private[operators] def bruteForceTopKFrames(
      corpus: DataFrame, queryRows: DataFrame, idCol: String,
      vecCol: String, k: Int, nTotal: Long): DataFrame = {
    GraftFunctions.register(corpus.sparkSession)
    val queries = queryRows
      .select(col(idCol).as("query_id"), quantize(col(vecCol)).as("__qv"))
    // spread: the streamed side of the broadcast join carries O(N·Q) dot
    // work; inheriting a single-split scan's partitioning would run it on
    // one core (the round-7 sf1 sweep measured exactly that — cpu ≈ wall)
    val cands = spread(corpus.select(col(idCol).as("neighbor_id"),
      quantize(col(vecCol)).as("__cv")))
    // rank on the NEGATED fixed-point dot: |fp| ≤ 2^46 so fp/2^40 is an
    // exact double — the (-fp asc, id) and (dot desc, id) orders agree
    // bit-for-bit, and the long key lets refinedTopK's sampled bound
    // prune the N·Q fan-out before any ranking sort (its scaladoc has
    // the measurements)
    val scored = cands.crossJoin(broadcast(queries))
      .filter(col("neighbor_id") =!= col("query_id"))
      .withColumn("adist",
        -GraftFunctions.longArrayDot(col("__qv"), col("__cv")))
    refinedTopK(scored, k, nTotal)
      .select(col("query_id"), col("rank"), col("neighbor_id"),
        (-col("adist") / lit(1099511627776.0d)).as("dot"))
  }

  /** Exact near-dup pairs: all (a < b) pairs with dot ≥ threshold.
    * Quadratic — fine for verification scale; at corpus scale call
    * [[annCandidates]] first and re-score only bucket-mates. */
  def nearDupPairs(emb: DataFrame, idCol: String, vecCol: String,
                   threshold: Double): DataFrame = {
    GraftFunctions.register(emb.sparkSession)
    // spread the left side: the cartesian's task count is pA×pB, and a
    // single-split scan would make that 1 — all N²/2 dots on one core
    val a = spread(emb.select(col(idCol).as("vec_a"), quantize(col(vecCol)).as("__va")))
    val b = emb.select(col(idCol).as("vec_b"), quantize(col(vecCol)).as("__vb"))
    a.crossJoin(b)
      .filter(col("vec_a") < col("vec_b"))
      .withColumn("__dot",
        GraftFunctions.longArrayDot(col("__va"), col("__vb")) / lit(1099511627776.0d))
      .filter(col("__dot") >= threshold)
      .select(col("vec_a"), col("vec_b"), col("__dot").as("dot"))
  }

  /** Deterministic ±1 hyperplane component, derived from md5 (first hex
    * char of md5("plane:pos") ≥ '8') — reproducible run-to-run, no RNG. */
  private def planeComp(plane: Int, pos: Int): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val h = md.digest(s"$plane:$pos".getBytes("UTF-8"))
    if (((h(0) >> 4) & 0xf) >= 8) 1L else -1L
  }

  /** SQL literal for the planes×dim ±1 hyperplane matrix (md5-derived,
    * [[planeComp]]); constant-folded to one Literal before codegen and
    * consumed by the native graft_matdot as a static long[][]. */
  private def planeMatrixSql(planes: Int, dim: Int): String =
    (0 until planes).map(p =>
      (0 until dim).map(j => s"${planeComp(p, j)}L").mkString("array(", ",", ")"))
      .mkString("array(", ",", ")")

  /** Random-hyperplane LSH signature per vector: bit i = sign of the
    * projection onto plane i. Zero shuffles: each vector is quantized once,
    * then dotted against the full plane matrix in ONE native graft_matdot
    * pass (P dots in a single codegen'd nested loop — P separate dot
    * expressions made Janino compile dominate single-shot latency, and the
    * original posexplode + broadcast-join shape shuffled N×dim rows and
    * ran interpreted). */
  def hyperplaneSignatures(emb: DataFrame, idCol: String, vecCol: String,
                           planes: Int, dim: Int): DataFrame = {
    GraftFunctions.register(emb.sparkSession)
    val bits = (0 until planes).map(p =>
      when(expr(s"__dots[$p]") >= 0, lit("1")).otherwise(lit("0")))
    // spread: the P-dot matdot per row is the cost; a single-split scan
    // must not serialize it (see Scale.spread)
    spread(emb.select(col(idCol), quantize(col(vecCol)).as("__qv")))
      .select(col(idCol),
        expr(s"graft_matdot(__qv, ${planeMatrixSql(planes, dim)})").as("__dots"))
      .select(col(idCol), concat(bits: _*).as("signature"))
  }

  /** Banded ANN candidate pairs: vectors sharing any band of the LSH
    * signature. Same banding shape as [[Dedup.lshCandidatePairs]].
    * `maxBucketSize` drops non-discriminative mega-buckets before the
    * self-join — without it a hash region where the corpus piles up
    * reintroduces the quadratic blowup LSH exists to avoid. */
  def annCandidates(sig: DataFrame, idCol: String,
                    bands: Int, bitsPerBand: Int,
                    maxBucketSize: Int = 1000): DataFrame = {
    val bandRows = (0 until bands).map { b =>
      sig.select(col(idCol), lit(b).as("band"),
        substring(col("signature"), b * bitsPerBand + 1, bitsPerBand).as("band_key"))
    }.reduce(_ unionByName _)
    Dedup.lshCandidatePairs(bandRows, idCol, maxBucketSize)
  }

  /** Per-vector integer LSH band keys: one row per vector carrying the
    * quantized vector (`__qv`) plus `__band0..__band{bands-1}` INT columns,
    * where bit j of band b is the sign of the projection onto plane
    * b·bitsPerBand+j. One scan, all codegen (graft_dot64 against literal
    * plane arrays); integer keys join/group without string work. This is
    * the frame worth persisting — every ANN consumer (corpus buckets,
    * query probes, re-scoring vectors) derives from it. */
  def signatureFrame(emb: DataFrame, idCol: String, vecCol: String,
                     planes: Int, dim: Int, bands: Int): DataFrame = {
    GraftFunctions.register(emb.sparkSession)
    val bitsPerBand = planes / bands
    require(bands * bitsPerBand == planes, "planes must split evenly into bands")
    // one graft_matdot pass computes all P projections; band keys are then
    // P tiny sign-and-shift terms over the dots array (generated code size
    // stays constant in P — see LongMatrixDot)
    val keyCols = (0 until bands).map { b =>
      (0 until bitsPerBand).map { j =>
        val p = b * bitsPerBand + j
        when(expr(s"__dots[$p]") >= 0, lit(1 << j)).otherwise(lit(0)): Column
      }.reduce(_ + _).cast("int").as(s"__band$b")
    }
    // spread: one matdot per row feeds every ANN consumer of this frame;
    // a single-split scan must not serialize it (see Scale.spread)
    spread(emb.select(col(idCol), quantize(col(vecCol)).as("__qv")))
      .select(col(idCol), col("__qv"),
        expr(s"graft_matdot(__qv, ${planeMatrixSql(planes, dim)})").as("__dots"))
      .select(col(idCol) +: col("__qv") +: keyCols: _*)
  }

  /** All XOR masks of `bits` bits with popcount ≤ `radius` — the multi-probe
    * neighborhood of a band key (Lv et al., "Multi-Probe LSH", VLDB'07). */
  private[operators] def probeMasks(bits: Int, radius: Int): Seq[Int] =
    (0 until (1 << bits)).filter(Integer.bitCount(_) <= radius)

  /** Approximate top-k via multi-probe hyperplane LSH.
    *
    * Shape (all distributed, no driver loops, signature frame computed once
    * and persisted across its four consumers):
    *   1. [[signatureFrame]]: integer band keys + quantized vector per row.
    *   2. Corpus bucket rows: one explode → (neighbor_id, band, band_key);
    *      buckets over `maxBucketSize` dropped (non-discriminative skew).
    *   3. Query probe rows: each query probes every band key within
    *      Hamming distance `probeRadius` of its own key (query-side-only
    *      expansion — the corpus is never replicated), recovering the
    *      recall that capped 8-bit banding alone gives up.
    *   4. Candidates = probe⋈bucket on (band, band_key), distinct pairs,
    *      re-scored exactly with the codegen'd graft_dot64 on the already
    *      quantized vectors, ranked per query (window keyed by query).
    *
    * Scale notes: bitsPerBand (= planes/bands) sets bucket count per band
    * (2^bits) and must grow with log₂(corpus) to keep buckets bounded —
    * 8 bits / 256 buckets suits ~10⁴..10⁵ rows per partition-group;
    * at larger corpora raise planes (e.g. 16-bit bands) rather than
    * lowering the cap. probeRadius trades query-side fan-out (Σ C(bits,i))
    * for recall; radius 2–3 recovers ≥0.9 top-10 recall even on
    * near-uniform corpora (asserted against brute force in SimilaritySpec).
    *
    * POSITIONING (STRESS.md ann decision table, 80k corpus × 2k queries):
    * the probe fan-out needed for ≥0.9 top-10 recall on a near-uniform
    * corpus (radius 2–3 ⇒ each query touches 14–37% of every band's key
    * space) makes this path barely faster than brute force — 29–63 s vs
    * [[ivfTopK]] ~9 s at equal recall. That is a property of hyperplane
    * LSH on high-dim near-uniform data, not a tuning miss: recall lives in
    * the probe expansion, and the expansion IS the cost. Production top-k
    * therefore goes through [[ivfTopK]] / [[ivfTopK2]] (q35/q94); LSH
    * banding earns its keep where no probe expansion is needed — the
    * near-dup PAIRS path ([[annNearDupPairs]], q46), where true neighbors
    * collide in-bucket at radius 0. annTopK stays as the zero-training
    * baseline and recall cross-check. */
  def annTopK(emb: DataFrame, idCol: String, vecCol: String,
              queryPred: Column, k: Int,
              planes: Int = 64, dim: Int = 64,
              bands: Int = 8, probeRadius: Int = 3,
              maxBucketSize: Int = 1000): DataFrame = {
    val bitsPerBand = planes / bands
    val sig = signatureFrame(emb, idCol, vecCol, planes, dim, bands)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val corpusRows = sig.select(col(idCol).as("neighbor_id"),
        explode(array((0 until bands).map(b =>
          struct(lit(b).as("band"), col(s"__band$b").as("band_key"))): _*)).as("bk"))
      .select(col("neighbor_id"), col("bk.band").as("band"), col("bk.band_key").as("band_key"))
    val bounded =
      if (maxBucketSize <= 0) corpusRows
      else {
        val ok = corpusRows.groupBy(col("band"), col("band_key"))
          .agg(count(lit(1)).as("__n"))
          .filter(col("__n") <= maxBucketSize)
          .select(col("band"), col("band_key"))
        corpusRows.join(ok, Seq("band", "band_key"), "left_semi")
      }
    // Probe keys via a broadcast masks join, not a literal-array explode:
    // a 16-bit band at radius 3 means 697 masks — far beyond what a codegen
    // expression tree should carry, trivial as a broadcast nested loop.
    import emb.sparkSession.implicits._
    val masks = probeMasks(bitsPerBand, probeRadius).toDF("__mask")
    val queryIds = emb.filter(queryPred).select(col(idCol))
    val probes = sig.join(queryIds, idCol)
      .select(col(idCol).as("query_id"),
        explode(array((0 until bands).map(b =>
          struct(lit(b).as("band"), col(s"__band$b").as("band_key"))): _*)).as("bk"))
      .select(col("query_id"), col("bk.band").as("band"), col("bk.band_key").as("band_key"))
      .crossJoin(broadcast(masks))
      .select(col("query_id"), col("band"),
        col("band_key").bitwiseXOR(col("__mask")).as("band_key"))
    val cand = probes.join(bounded, Seq("band", "band_key"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"))
      .distinct()
    // Neighbor vectors ride the (big) candidate side; query vectors attach
    // by broadcast LAST, so the wide rows are never duplicated per probe
    // and only one vector per row crosses the shuffle.
    val qv = sig.join(queryIds, idCol)
      .select(col(idCol).as("query_id"), col("__qv").as("__qvec"))
    val cv = sig.select(col(idCol).as("neighbor_id"), col("__qv").as("__cvec"))
    val scored = cand.join(cv, "neighbor_id").join(broadcast(qv), "query_id")
      .withColumn("__dot",
        GraftFunctions.longArrayDot(col("__qvec"), col("__cvec")) / lit(1099511627776.0d))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("__dot").desc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("neighbor_id"), col("__dot").as("dot"))
  }

  /** Approximate near-dup PAIRS via hyperplane-LSH buckets — the corpus-
    * scale path for [[nearDupPairs]]'s quadratic exact form: candidates are
    * bucket-mates only (sub-quadratic, capped against skew), then exact
    * fixed-point re-scoring keeps pairs with dot ≥ threshold. Same
    * signature frame as [[annTopK]]; narrow candidate rows first, vectors
    * attach after (shuffle discipline per annTopK). Recall is a function
    * of planes/bands vs the threshold's angular distance — asserted
    * against the exact operator in SimilaritySpec. */
  def annNearDupPairs(emb: DataFrame, idCol: String, vecCol: String,
                      threshold: Double,
                      planes: Int = 64, dim: Int = 64, bands: Int = 8,
                      maxBucketSize: Int = 1000): DataFrame = {
    GraftFunctions.register(emb.sparkSession)
    val sig = signatureFrame(emb, idCol, vecCol, planes, dim, bands)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val bandRows = sig.select(col(idCol),
        explode(array((0 until bands).map(b =>
          struct(lit(b).as("band"), col(s"__band$b").as("band_key"))): _*)).as("bk"))
      .select(col(idCol), col("bk.band").as("band"), col("bk.band_key").as("band_key"))
    val cand = Dedup.lshCandidatePairs(bandRows, idCol, maxBucketSize)
    val va = sig.select(col(idCol).as("doc_a"), col("__qv").as("__va"))
    val vb = sig.select(col(idCol).as("doc_b"), col("__qv").as("__vb"))
    cand.join(va, "doc_a").join(vb, "doc_b")
      .withColumn("dot",
        GraftFunctions.longArrayDot(col("__va"), col("__vb")) / lit(1099511627776.0d))
      .filter(col("dot") >= threshold)
      .select(col("doc_a").as("vec_a"), col("doc_b").as("vec_b"), col("dot"))
  }

  // ------------------------------------------------------------ IVF variant

  /** Exact fixed-point L2 normalization of the long-vector column `c` to
    * the 2²⁰ sphere, in place: c_i ← trunc(c_i·2²⁰ / ⌊√Σc_i²⌋). Every step
    * is exact integer arithmetic, so both engines reproduce it bit-for-bit:
    * Σc_i² ≤ 64·2⁴³ < 2⁵³ is exactly representable as a double, and for
    * such ss `floor(sqrt(double))` IS the integer sqrt (a non-square's root
    * sits ≥ ~2⁻²⁵ from the nearest integer while the correctly-rounded
    * sqrt errs ≤ ~2⁻²⁹) — the ±1 CASE adjustment is belt-and-braces, and
    * the same expression evaluates identically in DuckDB. Division is
    * trunc-toward-zero on both sides (Spark `div`; the oracle emulates it
    * over `//` with a sign CASE). A zero vector passes through unchanged;
    * a null (no Lloyd update for the cell) stays null. */
  private[operators] def normalizeCol(df: DataFrame, c: String): DataFrame =
    df.withColumn("__nss", expr(s"aggregate($c, 0L, (a, x) -> a + x * x)"))
      .withColumn("__nr0", expr("CAST(floor(sqrt(CAST(__nss AS DOUBLE))) AS BIGINT)"))
      .withColumn("__nr", expr(
        "CASE WHEN (__nr0 + 1) * (__nr0 + 1) <= __nss THEN __nr0 + 1 " +
        "WHEN __nr0 * __nr0 > __nss THEN __nr0 - 1 ELSE __nr0 END"))
      .withColumn(c, expr(
        s"CASE WHEN __nr <= 0 THEN $c " +
        s"ELSE transform($c, x -> (x * 1048576L) div __nr) END"))
      .drop("__nss", "__nr0", "__nr")

  /** Deterministic SPHERICAL coarse centroids for an IVF index: the
    * `nCells` corpus vectors with the smallest md5(id) — a seeded random
    * sample — each normalized to the fixed-point unit sphere
    * ([[normalizeCol]]).
    *
    * Both halves of that sentence are load-bearing at scale, and both were
    * MEASURED on the STRESS retrain fixture (80k vectors, a 27k-vector
    * dense appended mode, 283 cells):
    *
    *  - The md5 sample is kept because it is MASS-PROPORTIONAL: a region
    *    holding 1/3 of the corpus draws ~1/3 of the seeds, which is what
    *    balances cell occupancy. The "better" seedings the k-means
    *    literature suggests are mass-blind and measurably WORSE here:
    *    farthest-first (k-center/Gonzalez) plants one seed per region
    *    regardless of its mass and drove the fixture's repaired skew to
    *    96 (the whole mode in ~1 cell); greedy gain-maximization (the
    *    deterministic k-means++ analog) still under-seeds dense low-
    *    variance modes (skew 35), because splitting a tight heavy cloud
    *    barely moves the similarity objective while occupancy wants it
    *    split by MASS.
    *  - Normalization fixes the actual failure: under max-inner-product
    *    assignment a raw member seed with 10% extra norm out-pulls every
    *    equally-close unit seed, so the hottest-norm seed in a dense mode
    *    wins disproportionately — the measured skew floor of ~13 that
    *    r8's STRESS section documented. Projecting seeds (and Lloyd
    *    means, see [[ivfTrainCentroids]]) onto the 2²⁰ sphere makes MIPS
    *    argmax ≡ cosine argmax, and the same fixture repairs to skew 4.3
    *    untrained / 3.5 after one spherical Lloyd round.
    *
    * Everything stays exact integer math and plan-shape cheap: the sample
    * is a distributed TakeOrderedAndProject (no driver collect, no global
    * sort) and the normalization is three codegen'd column expressions, so
    * the DuckDB oracles re-derive seed + normalization exactly
    * (SimilarityQueries.seedCtes). */
  def ivfCentroids(quantized: DataFrame, idCol: String, nCells: Int): DataFrame =
    normalizeCol(
      quantized
        .select(col(idCol).as("cent_id"), col("__qv").as("__cv"))
        .orderBy(md5(col("cent_id").cast("string")), col("cent_id"))
        .limit(nCells), // sort+limit → TakeOrderedAndProject: distributed top-k, no global sort
      "__cv")

  /** In-plan quantizer budget for the literal assignment path: the collected
    * matrix rides with the task binary (one broadcast per stage), so it is
    * capped at 4M longs (~32 MB). Above the cap [[assignCellsJoin]] takes
    * over — a bigger quantizer must stay lazy and distributed. */
  private[graft] val AssignLiteralLongsCap: Long = 4L << 20

  /** One cell assignment pass: each (id, __qv) row keeps its best-dot
    * centroid (deterministic tiebreak: smaller centroid id wins a dot tie).
    * Output: (id, __qv, cell, __bd) where __bd is the winning dot.
    *
    * MAP-ONLY, zero shuffles: the quantizer — small and bounded, like the
    * CC union-find threshold — is collected and injected as a literal
    * matrix into ONE codegen'd graft_matdot per vector; the argmax is
    * array_max + array_position over the dots array (centroids ordered by
    * cent_id, so first-max ≡ smallest-id tiebreak). The previous shape —
    * broadcast-join fan-out (N×nCells rows) into max(struct) — planned a
    * SortAggregate (struct buffers can't hash-aggregate) that re-evaluated
    * the interpreted quantize transform per JOINED row and sorted the whole
    * expansion; tools/Stress caught it as a 20-minute single-task straggler
    * at 80k×283.
    *
    * The matrix enters the plan as a `typedLit` (ONE Literal node; matdot's
    * codegen references it as a static `long[][]`) — never as SQL text,
    * whose parse alone would crawl at 10^4–10^5-cell quantizer sizes. The
    * collects here are eager but BOUNDED: a 1-row dim probe, then at most
    * cap/dim+1 rows; past the cap nothing big was materialized and the
    * lazy join form is returned instead. */
  private[graft] def assignCells(q: DataFrame, idCol: String, cents: DataFrame): DataFrame = {
    val head = cents.select(col("__cv")).limit(1).collect()
    require(head.nonEmpty, "assignCells: empty centroid set")
    val dim = math.max(head.head.getSeq[Long](0).length, 1)
    val rowCap = math.max(1L, AssignLiteralLongsCap / dim).toInt
    val probe = cents.select(col("cent_id"), col("__cv")).limit(rowCap + 1).collect()
    if (probe.length > rowCap) assignCellsJoin(q, idCol, cents)
    else {
      val c = probe.map(r => (r.getLong(0), r.getSeq[Long](1).toArray)).sortBy(_._1)
      val mat = typedLit(c.map(_._2.toSeq).toSeq)
      val ids = typedLit(c.map(_._1).toSeq)
      spread(q).select(col(idCol), col("__qv"),
          call_function("graft_matdot", col("__qv"), mat).as("__cd"))
        .select(col(idCol), col("__qv"),
          element_at(ids,
            array_position(col("__cd"), array_max(col("__cd"))).cast("int")).as("cell"),
          array_max(col("__cd")).as("__bd"))
    }
  }

  /** Lazy distributed assignment for quantizers past [[AssignLiteralLongsCap]].
    * BroadcastNestedLoopJoin fan-out (N×nCells rows) scored by the codegen'd
    * graft_dot64, then a TWO-PHASE hash-aggregate argmax — max(dot) per id,
    * join back, min(cent_id) among dot-ties — never max(struct), which would
    * plan the SortAggregate straggler this family bans (PlanAuditSpec). Same
    * (id, __qv, cell, __bd) contract and the same smallest-id tiebreak as the
    * literal path; costs two shuffles and scores the fan-out twice, the right
    * trade only where the matrix can no longer ship with the tasks. */
  private[graft] def assignCellsJoin(q: DataFrame, idCol: String,
                                     cents: DataFrame): DataFrame = {
    val scored = spread(q)
      .crossJoin(broadcast(cents.select(col("cent_id"), col("__cv"))))
      .select(col(idCol), col("__qv"), col("cent_id"),
        call_function("graft_dot64", col("__qv"), col("__cv")).as("__dot"))
    val best = scored.groupBy(col(idCol)).agg(max(col("__dot")).as("__bd"))
    scored.join(best, Seq(idCol))
      .where(col("__dot") === col("__bd"))
      .groupBy(col(idCol), col("__qv"), col("__bd"))
      .agg(min(col("cent_id")).as("cell"))
      .select(col(idCol), col("__qv"), col("cell"), col("__bd"))
  }

  /** Local-parallelism guard for per-row matrix work: a single-file scan or
    * an in-memory synthesis arrives in 1-2 partitions, and a map-only
    * N×nCells dot pass would then run on one core. No-op when the source is
    * already partitioned (the normal cluster case — no hidden shuffle). */
  private def spread(df: DataFrame): DataFrame = Scale.spread(df)

  /** Lloyd-trained coarse centroids: `iters` SPHERICAL k-means rounds
    * (dot-product assignment, element-wise integer-mean update, then the
    * mean projected back onto the fixed-point unit sphere) over the
    * md5-sample seed. The re-normalization is what keeps training from
    * UNBALANCING the quantizer: an un-normalized integer mean of a tight
    * cluster keeps more norm than the mean of a diffuse one, and under
    * MIPS argmax the high-norm centroid then absorbs ever more of the
    * corpus round over round (measured on the STRESS retrain fixture:
    * raw-mean Lloyd drives skew 13 → 37 → 56 across rounds; spherical
    * holds 4.3 → 3.5). Fully deterministic and DataFrame-only: means are
    * exact integer division of exact long sums (never a float mean, whose
    * value would depend on reduction order) and the projection is
    * [[normalizeCol]]'s exact isqrt recipe, so the trained quantizer is
    * bit-stable across runs and partitionings. A cell
    * that attracts no vectors keeps its previous centroid. Per round:
    * one broadcast assignment + one (cell, pos) aggregation over the
    * posexploded vectors — at extreme corpus scale run it on a sample;
    * the assignment pass downstream is unchanged. */
  def ivfTrainCentroids(quantized: DataFrame, idCol: String,
                        seed: DataFrame, iters: Int): DataFrame = {
    var cents = seed
    for (_ <- 0 until iters) {
      val assigned = assignCells(quantized, idCol, cents)
      val means = assigned
        .select(col("cell").as("cent_id"), posexplode(col("__qv")).as(Seq("__pos", "__val")))
        .groupBy(col("cent_id"), col("__pos"))
        .agg(expr("sum(__val) div count(1)").as("__mv"))
        .groupBy(col("cent_id"))
        .agg(expr("transform(array_sort(collect_list(struct(__pos, __mv))), s -> s.__mv)")
          .as("__new_cv"))
      cents = normalizeCol(cents.join(means, Seq("cent_id"), "left"), "__new_cv")
        .select(col("cent_id"), coalesce(col("__new_cv"), col("__cv")).as("__cv"))
        .localCheckpoint() // tiny frame; truncate the per-round plan growth
    }
    cents
  }

  /** K-means clustering of an embedding column, emitting per-vector
    * assignments: (id, cell, dot_fp) where dot_fp is the exact fixed-point
    * dot with the winning centroid. Seed = md5-order sample, `trainIters`
    * Lloyd rounds ([[ivfTrainCentroids]]) — because every step is exact
    * integer arithmetic (quantized vectors, integer-mean updates,
    * integer-dot argmax with deterministic tiebreak), the ENTIRE clustering
    * is reproducible cross-engine and oracle-checkable, not just its shape.
    * Scale: per round one broadcast assignment over the persisted quantized
    * frame + one (cell, pos) aggregation; the final pass is the same
    * O(N·nCells) codegen'd assignment as [[ivfIndex]]. */
  def kmeansAssign(emb: DataFrame, idCol: String, vecCol: String,
                   nCells: Int, trainIters: Int): DataFrame = {
    GraftFunctions.register(emb.sparkSession)
    val q = emb.select(col(idCol), quantize(col(vecCol)).as("__qv"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val cents = ivfCentroidsTrained(q, idCol, nCells, trainIters)
    assignCells(q, idCol, cents)
      .select(col(idCol), col("cell"), col("__bd").as("dot_fp"))
  }

  /** Semantic dedup (SemDeDup-shaped): k-means-cluster the embeddings
    * ([[kmeansAssign]]'s exact-integer pipeline), then score pairs ONLY
    * within each cell and drop any vector that has a smaller-id neighbor
    * with dot ≥ `threshold` in its cell. The cell partition is what makes
    * embedding dedup sub-quadratic at corpus scale: candidate pairs are
    * O(N²/nCells) instead of O(N²), and nCells grows with N (√N guidance,
    * as IVF). Greedy smallest-id-survives is deterministic and needs no
    * iteration — the standard epsilon-dedup approximation of per-cluster
    * canonical selection. Cross-cell near-dups are the recall trade, same
    * as published semantic-dedup pipelines.
    * Emits (id, cell, keep); every step is exact integer / power-of-two
    * arithmetic, so the full pipeline — training included — is oracled. */
  def semanticDedup(emb: DataFrame, idCol: String, vecCol: String,
                    nCells: Int, trainIters: Int, threshold: Double): DataFrame = {
    GraftFunctions.register(emb.sparkSession)
    val q = emb.select(col(idCol), quantize(col(vecCol)).as("__qv"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val cents = ivfCentroidsTrained(q, idCol, nCells, trainIters)
    // assignment keeps the quantized vector alongside the cell so the
    // pair scoring below needs no second join back to the corpus
    val assigned = assignCells(q, idCol, cents)
      .select(col(idCol), col("cell"), col("__qv"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val a = assigned.select(col(idCol).as("__ia"), col("cell"), col("__qv").as("__va"))
    val b = assigned.select(col(idCol).as("__ib"), col("cell"), col("__qv").as("__vb"))
    val dup = a.join(b, Seq("cell"))
      .filter(col("__ia") < col("__ib"))
      .filter(GraftFunctions.longArrayDot(col("__va"), col("__vb"))
        / lit(1099511627776.0d) >= threshold)
      .select(col("__ib").as(idCol)).distinct()
    assigned.select(col(idCol), col("cell"))
      .join(dup.withColumn("__dup", lit(true)), Seq(idCol), "left")
      .select(col(idCol), col("cell"),
        coalesce(!col("__dup"), lit(true)).as("keep"))
  }

  /** IVF cell assignment over the full corpus. `trainIters` > 0 refines the
    * seed centroids with that many Lloyd rounds ([[ivfTrainCentroids]])
    * before assignment. */
  def ivfIndex(emb: DataFrame, idCol: String, vecCol: String,
               nCells: Int, trainIters: Int = 0): DataFrame = {
    GraftFunctions.register(emb.sparkSession)
    val q = emb.select(col(idCol), quantize(col(vecCol)).as("__qv"))
    assignCells(q, idCol, ivfCentroidsTrained(q, idCol, nCells, trainIters))
  }

  /** Seed-then-train composition shared by [[ivfIndex]] and [[ivfTopK]]. */
  private def ivfCentroidsTrained(q: DataFrame, idCol: String,
                                  nCells: Int, trainIters: Int): DataFrame = {
    val seed = ivfCentroids(q, idCol, nCells)
    if (trainIters <= 0) seed else ivfTrainCentroids(q, idCol, seed, trainIters)
  }

  /** IVF approximate top-k: queries probe their `nProbe` closest cells and
    * exact-score only the vectors assigned there.
    *
    * The second ANN scale path next to [[annTopK]]: a partition-of-the-
    * corpus index (cells ≈ balanced, size N/nCells) instead of overlapping
    * hash buckets. recall ≈ P(true neighbor's cell probed), tuned by
    * nProbe/nCells; nProbe = nCells degenerates to exact brute force
    * (asserted in SimilaritySpec). Centroid count should grow ~√N; at
    * corpus scales where √N no longer broadcasts, the coarse quantizer
    * itself must become hierarchical — documented limit, not hidden. */
  def ivfTopK(emb: DataFrame, idCol: String, vecCol: String,
              queryPred: Column, k: Int,
              nCells: Int = 16, nProbe: Int = 4,
              trainIters: Int = 0): DataFrame =
    ivfTopKImpl(emb, idCol, vecCol, queryPred, k, nCells, nProbe,
      trainIters, allowed = None)

  /** Filtered IVF top-k: [[ivfTopK]] restricted to neighbors whose id is
    * in `allowed` (a one-column id frame — e.g. "label IN (2,3,5)" or a
    * metadata semi-join from the documents table). The filter engages
    * INSIDE the probed cells — candidates outside the allowed set are
    * dropped before any dot is scored — and the INDEX is untouched: the
    * quantizer and cell assignment cover the full corpus, because a
    * persisted index serves every filter, not one (and queries need not
    * satisfy the filter themselves).
    *
    * This is the in-filter strategy of filtered vector search: cost is
    * (N·nProbe/nCells)·selectivity score evaluations, recall conditional
    * on probed cells is EXACT over the allowed set (no post-filter
    * under-fill amplification — a post-filter on an unfiltered top-k
    * would need k/selectivity ranks to survive). A query whose probed
    * cells hold fewer than k allowed vectors legitimately returns fewer
    * rows. For highly selective filters, brute force over the survivors
    * is cheaper and exact — [[filteredTopK]] makes that call. */
  def ivfTopKFiltered(emb: DataFrame, idCol: String, vecCol: String,
                      queryPred: Column, allowed: DataFrame, k: Int,
                      nCells: Int = 16, nProbe: Int = 4,
                      trainIters: Int = 0): DataFrame = {
    // prepare (distinct ids, count) ONCE here — the impl trusts them, so
    // the id frame is neither re-distinct-ed nor re-counted downstream,
    // and nothing is cached (the distinct projection is computed twice —
    // count action + the semi-join at materialization — which beats a
    // persisted copy that nothing can ever unpersist; ADVICE r8)
    val ids = allowed.select(col(allowed.columns.head).as(idCol)).distinct()
    ivfTopKImpl(emb, idCol, vecCol, queryPred, k, nCells, nProbe,
      trainIters, allowed = Some((ids, ids.count())))
  }

  /** Adaptive filtered top-k: count the allowed set once (a one-column
    * aggregate over the id frame — metadata-scan cheap), then brute-force
    * the survivors exactly when they number ≤ `bruteCutoff`, else serve
    * via [[ivfTopKFiltered]]. The standard two-regime plan of filtered
    * vector search: a selective filter ("this source, last week") kills
    * the value of the index — scoring the survivors directly is exact and
    * cheaper than probing cells that are mostly filtered out — while a
    * broad filter ("everything but PII-flagged") keeps the index's
    * N/nCells advantage. The cutoff is a per-deployment constant (how
    * many exact dots one executor wave absorbs), not data-derived. */
  def filteredTopK(emb: DataFrame, idCol: String, vecCol: String,
                   queryPred: Column, allowed: DataFrame, k: Int,
                   nCells: Int = 16, nProbe: Int = 4,
                   trainIters: Int = 0,
                   bruteCutoff: Long = 65536): DataFrame = {
    val ids = allowed.select(col(allowed.columns.head).as(idCol)).distinct()
    val n = ids.count()
    if (n <= bruteCutoff)
      bruteForceTopKFrames(emb.join(ids, Seq(idCol), "left_semi"),
        emb.filter(queryPred), idCol, vecCol, k, n)
    else
      // reuse the distinct + count already derived for the regime choice —
      // no second distinct, no second count, no cached copy
      ivfTopKImpl(emb, idCol, vecCol, queryPred, k, nCells, nProbe,
        trainIters, allowed = Some((ids, n)))
  }

  /** `allowed`, when present, is CALLER-PREPARED: a distinct one-column id
    * frame plus its count ([[ivfTopKFiltered]]/[[filteredTopK]] derive
    * both exactly once). The count feeds only the refine-sample modulus;
    * ids missing from the corpus make it a mild overestimate, which is
    * safe — a larger modulus samples fewer candidates, so the k-th bound
    * is looser and strictly MORE rows survive to the exact ranking. */
  private def ivfTopKImpl(emb: DataFrame, idCol: String, vecCol: String,
                          queryPred: Column, k: Int,
                          nCells: Int, nProbe: Int,
                          trainIters: Int,
                          allowed: Option[(DataFrame, Long)]): DataFrame = {
    GraftFunctions.register(emb.sparkSession)
    val q = emb.select(col(idCol), quantize(col(vecCol)).as("__qv"))
    // one centroid set shared by index assignment AND query probing — a
    // retrained quantizer must never diverge between the two sides
    val cents = ivfCentroidsTrained(q, idCol, nCells, trainIters)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val index = assignCells(q, idCol, cents)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val queryIds = emb.filter(queryPred).select(col(idCol))
    val queries = index.join(queryIds, idCol)
      .select(col(idCol).as("query_id"), col("__qv").as("__qvec"))
    val wProbe = Window.partitionBy(col("query_id"))
      .orderBy(col("__cd").desc, col("cent_id"))
    val probedCells = queries.join(broadcast(cents))
      .withColumn("__cd", GraftFunctions.longArrayDot(col("__qvec"), col("__cv")))
      .withColumn("__rn", row_number().over(wProbe))
      .filter(col("__rn") <= nProbe)
      .select(col("query_id"), col("cent_id").as("cell"))
    // Candidate fan-out: STREAM the big index at its natural (row-uniform)
    // partitioning and BROADCAST the probe list — never an exchange keyed
    // by `cell`. A cell-keyed join hashes the corpus into only nCells
    // distinct keys, so at scale the whole N·nProbe/nCells-per-query
    // fan-out (and the rank window's partial sort above it) collapses onto
    // however many reducers those few keys land on — BENCH_r07_sf10 caught
    // exactly that as a single-task 184 s straggler (cpu/wall ≈ 1.0 on 32
    // cores; AQE had coalesced the small-by-bytes cell exchange to one
    // partition). probedCells is queries×nProbe rows of two longs —
    // broadcastable by contract (the probe set is the small side of an IVF
    // lookup). The query vector then attaches by broadcast as before.
    // the allowed-set semi join restricts candidates BEFORE any scoring;
    // assignment/probing above ran on the full corpus (the index serves
    // every filter). The filtered sliver is NOT persisted: its expensive
    // input `index` is, so refinedTopK's two consumers recompute only a
    // cache-scan + semi-join, and no cache entry outlives the call (the
    // old persist here plus filteredTopK's made two never-unpersisted
    // copies per filtered query — ADVICE r8). The candidate count comes
    // threaded from the caller, never from a count() over the sliver.
    val (candIndex, nAllowed) = allowed match {
      case Some((ids, n)) => (index.join(ids, Seq(idCol), "left_semi"), n)
      case None           => (index, -1L)
    }
    val scored = candIndex
      .select(col(idCol).as("neighbor_id"), col("__qv").as("__cvec"), col("cell"))
      .join(broadcast(probedCells), "cell")
      .filter(col("query_id") =!= col("neighbor_id"))
      .join(broadcast(queries), "query_id")
      .withColumn("adist",
        -GraftFunctions.longArrayDot(col("__qvec"), col("__cvec")))
    // negated-fp ranking + sampled-bound refine (see bruteForceTopK note);
    // candidate estimate = N_allowed·nProbe/nCells — the allowed count is
    // caller-threaded, the unfiltered count a scan of the persisted index
    val total = if (nAllowed >= 0) nAllowed else index.count()
    refinedTopK(scored, k,
        math.max(1L, total * nProbe / math.max(nCells, 1)))
      .select(col("query_id"), col("rank"), col("neighbor_id"),
        (-col("adist") / lit(1099511627776.0d)).as("dot"))
  }

  // ------------------------------------------------------ hierarchical IVF

  /** Two-level IVF cell assignment: an L1 coarse quantizer over the corpus,
    * then per-L1-cell L2 sub-centroids (md5-sampled members of that cell,
    * optionally Lloyd-refined within the cell). Returns
    * (cents1, cents2, index) where index = (id, __qv, cell1, cell2).
    *
    * This is the documented scale escape hatch of flat IVF: a flat
    * quantizer needs ~√N centroids, and past the point where √N rows
    * broadcast comfortably the assignment's O(N·√N) dot products dominate.
    * Two levels make assignment O(N·(C1 + C2)) with C1 ≈ C2 ≈ N^(1/3)…√C
    * sized frames, both broadcastable, and probing can target leaf cells
    * C1·C2 ≈ C fine without ever scoring all C centroids per query. */
  /** Leaf assignment, map-only like [[assignCells]]: one graft_matdot
    * against the full leaf matrix (ordered by (cell1, cent_id)), then the
    * argmax restricted to the member's OWN L1 cell via literal offset/
    * length maps + slice. First-max within the slice ≡ smallest-cent_id
    * tiebreak. The local form computes C1·C2 dots per vector instead of
    * the hierarchical C1+C2 — codegen multiply-adds, cheap up to ~10⁵
    * leaves (a 50 MB in-plan matrix); past that, dispatch per-cell
    * sub-matrices or add a third level (documented limit, same family as
    * the flat-IVF √N wall this operator exists to push back). Literals
    * enter as typedLit (one node each), never SQL text — assignCells'
    * parse-size rationale. */
  private def assignLeaves(a1: DataFrame, cents2: DataFrame,
                           idCol: String): DataFrame = {
    val c2 = cents2.select(col("cell1"), col("cent_id"), col("__cv")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getSeq[Long](2).toArray))
      .sortBy(x => (x._1, x._2))
    require(c2.nonEmpty, "assignLeaves: empty L2 centroid set")
    val mat = typedLit(c2.map(_._3.toSeq).toSeq)
    val leafIds = typedLit(c2.map(_._2).toSeq)
    val spans = c2.map(_._1).zipWithIndex.groupBy(_._1).toSeq
      .map { case (cell1, xs) => (cell1, xs.map(_._2).min + 1, xs.size) } // 1-based
    val offMap = typedLit(spans.map(s => s._1 -> s._2).toMap)
    val lenMap = typedLit(spans.map(s => s._1 -> s._3).toMap)
    def sub = slice(col("__d2"),
      element_at(offMap, col("cell1")), element_at(lenMap, col("cell1")))
    a1.select(col(idCol), col("__qv"), col("cell1"),
        call_function("graft_matdot", col("__qv"), mat).as("__d2"))
      .select(col(idCol), col("__qv"), col("cell1"),
        element_at(leafIds,
          (element_at(offMap, col("cell1"))
            + array_position(sub, array_max(sub))).cast("int") - 1).as("cell2"))
  }

  private[operators] def ivfIndex2(q: DataFrame, idCol: String,
                                   nCellsL1: Int, nCellsL2: Int,
                                   trainIters: Int,
                                   trainItersL2: Int = 0): (DataFrame, DataFrame, DataFrame) = {
    val cents1 = ivfCentroidsTrained(q, idCol, nCellsL1, trainIters)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val a1 = assignCells(q, idCol, cents1)
      .withColumnRenamed("cell", "cell1")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // L2 seeds: per L1 cell, its nCellsL2 members with smallest md5(id) —
    // rank-k window plans as WindowGroupLimit, no per-cell sort
    val wSeed = Window.partitionBy(col("cell1"))
      .orderBy(md5(col(idCol).cast("string")), col(idCol))
    var cents2 = normalizeCol(a1
      .withColumn("__rn", row_number().over(wSeed))
      .filter(col("__rn") <= nCellsL2)
      .select(col("cell1"), col(idCol).as("cent_id"), col("__qv").as("__cv")),
      "__cv") // spherical leaves, same rationale as ivfCentroids
    // Per-cell Lloyd refinement of the leaf quantizer — the same exact-
    // integer recipe as ivfTrainCentroids (long sums, integer division,
    // position-sorted rebuild) grouped by (cell1, cent_id), so the trained
    // leaves stay bit-stable across runs and partitionings. Sampled seeds
    // put leaves where single members happen to sit; one or two Lloyd
    // rounds move them to member MEANS, which is what raises probed-leaf
    // recall at a fixed probe budget (measured in SimilaritySpec).
    for (_ <- 0 until trainItersL2) {
      val assigned = assignLeaves(a1, cents2, idCol)
      val means = assigned
        .select(col("cell1"), col("cell2").as("cent_id"),
          posexplode(col("__qv")).as(Seq("__pos", "__val")))
        .groupBy(col("cell1"), col("cent_id"), col("__pos"))
        .agg(expr("sum(__val) div count(1)").as("__mv"))
        .groupBy(col("cell1"), col("cent_id"))
        .agg(expr("transform(array_sort(collect_list(struct(__pos, __mv))), s -> s.__mv)")
          .as("__new_cv"))
      cents2 = normalizeCol(cents2.join(means, Seq("cell1", "cent_id"), "left"),
          "__new_cv")
        .select(col("cell1"), col("cent_id"),
          coalesce(col("__new_cv"), col("__cv")).as("__cv"))
        .localCheckpoint() // tiny frame; truncate per-round plan growth
    }
    val cents2p = cents2
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val index = assignLeaves(a1, cents2p, idCol)
    (cents1, cents2p, index)
  }

  /** Hierarchical (two-level) IVF approximate top-k behind the same API as
    * [[ivfTopK]]: queries probe their `nProbeL1` closest coarse cells, then
    * the `nProbeL2` closest LEAF cells among those coarse cells'
    * sub-centroids, and exact-score only the vectors in the probed leaves.
    *
    * Probed-vector budget ≈ N·nProbeL2/(C1·C2) — compare flat IVF's
    * N·nProbe/C. At EQUAL budget the hierarchical index wins recall
    * because its leaves are C1·C2/C times finer: probing 32 of 128 leaves
    * targets the query's true neighborhood more precisely than 8 of 32
    * coarse cells (measured in SimilaritySpec; demonstrated at the 80k
    * stress scale in tools/Stress). Centroid scoring per query is
    * C1 + nProbeL1·C2 dots instead of C — the term that matters when C
    * must grow as √N. */
  def ivfTopK2(emb: DataFrame, idCol: String, vecCol: String,
               queryPred: Column, k: Int,
               nCellsL1: Int, nCellsL2: Int,
               nProbeL1: Int, nProbeL2: Int,
               trainIters: Int = 0, trainItersL2: Int = 0): DataFrame = {
    GraftFunctions.register(emb.sparkSession)
    val q = emb.select(col(idCol), quantize(col(vecCol)).as("__qv"))
    val (cents1, cents2, index0) =
      ivfIndex2(q, idCol, nCellsL1, nCellsL2, trainIters, trainItersL2)
    val index = index0.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val queryIds = emb.filter(queryPred).select(col(idCol))
    val queries = q.join(queryIds, idCol)
      .select(col(idCol).as("query_id"), col("__qv").as("__qvec"))
    // L1 probe: top nProbeL1 coarse cells per query
    val w1 = Window.partitionBy(col("query_id"))
      .orderBy(col("__cd").desc, col("cent_id"))
    val probed1 = queries.join(broadcast(cents1))
      .withColumn("__cd", GraftFunctions.longArrayDot(col("__qvec"), col("__cv")))
      .withColumn("__rn", row_number().over(w1))
      .filter(col("__rn") <= nProbeL1)
      .select(col("query_id"), col("cent_id").as("cell1"))
    // L2 probe: among the probed coarse cells' sub-centroids, the best
    // nProbeL2 LEAVES globally per query (not per coarse cell — the budget
    // concentrates where the query actually lives)
    val w2 = Window.partitionBy(col("query_id"))
      .orderBy(col("__cd").desc, col("cell1"), col("cent_id"))
    val probed2 = probed1
      .join(broadcast(cents2), Seq("cell1"))
      .join(broadcast(queries), "query_id")
      .withColumn("__cd", GraftFunctions.longArrayDot(col("__qvec"), col("__cv")))
      .withColumn("__rn", row_number().over(w2))
      .filter(col("__rn") <= nProbeL2)
      .select(col("query_id"), col("cell1"), col("cent_id").as("cell2"))
    // candidates: vectors indexed in the probed leaves. As in [[ivfTopK]],
    // the big index STREAMS at row-uniform partitioning and the probe list
    // BROADCASTS — a leaf-keyed exchange would hash the corpus into only
    // C1·C2 distinct keys (the q35 single-task straggler class, just with
    // more keys); query vectors still attach by broadcast last.
    val scored = index
      .select(col(idCol).as("neighbor_id"), col("__qv").as("__cvec"),
        col("cell1"), col("cell2"))
      .join(broadcast(probed2), Seq("cell1", "cell2"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .join(broadcast(queries), "query_id")
      .withColumn("__dot",
        GraftFunctions.longArrayDot(col("__qvec"), col("__cvec")) / lit(1099511627776.0d))
    val wRank = Window.partitionBy(col("query_id"))
      .orderBy(col("__dot").desc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(wRank).cast("long"))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("neighbor_id"), col("__dot").as("dot"))
  }

  /** Labeled-dataset separation audit: per label, the centroid cohesion
    * (mean squared member→own-centroid distance) and the margin to the
    * nearest OTHER centroid, plus their Fisher-style ratio — the health
    * check a classifier/embedding training set gets before training
    * (labels whose ratio ≈ 1 are inseparable in this embedding space;
    * mislabeled clusters show as low-cohesion outliers).
    *
    * Exactness: vectors quantize to 2^20 fixed point, per-dimension
    * centroid sums are exact integers, and every per-member distance is
    * reduced to an integer (each squared per-dimension term is rounded to
    * micros BEFORE the within-vector sum), so no float is ever summed
    * across rows or array elements — both engines aggregate identical
    * integers and the only doubles are final divisions of exact integers.
    *
    * Scale: one posexplode + hash agg for centroids (shuffle carries
    * (label, dim) partial sums — map-side combine collapses members), one
    * broadcast join of the L-row centroid frame back onto members, one
    * per-label agg; the L×L centroid table is driver-trivial. */
  def labelSeparation(emb: DataFrame, idCol: String, vecCol: String,
                      labelCol: String): DataFrame = {
    val q = emb.select(col(labelCol).cast("long").as("label"),
      quantize(col(vecCol)).as("__qv"))
    val sums = q
      .select(col("label"), posexplode(col("__qv")).as(Seq("__pos", "__qi")))
      .groupBy(col("label"), col("__pos")).agg(sum(col("__qi")).as("__si"))
      .groupBy(col("label"))
      .agg(expr("transform(array_sort(collect_list(struct(__pos, __si))), x -> x.__si)")
        .as("__cs"))
    val ns = q.groupBy(col("label")).agg(count(lit(1)).as("__n"))
    val cent = sums.join(ns, "label")
    // per-member distance² in integer micros: each dim's squared term is
    // rounded to micros independently (pure per-element function of the
    // exact integers q_i, S_i, n), then integer-summed within the vector
    val member = q.join(broadcast(cent), "label")
      .withColumn("__d2m", expr(
        """aggregate(zip_with(__qv, __cs, (x, s) ->
             CAST(round((CAST(x AS DOUBLE)/1048576.0D
                         - CAST(s AS DOUBLE)/(CAST(__n AS DOUBLE)*1048576.0D))
                      * (CAST(x AS DOUBLE)/1048576.0D
                         - CAST(s AS DOUBLE)/(CAST(__n AS DOUBLE)*1048576.0D))
                      * 1000000.0D, 0) AS BIGINT)),
           0L, (a, v) -> a + v)"""))
    val intra = member.groupBy(col("label"))
      .agg(count(lit(1)).as("n_vecs"), sum(col("__d2m")).as("__sm"))
    val cd = cent.withColumn("__cd",
      expr("transform(__cs, s -> CAST(s AS DOUBLE)/(CAST(__n AS DOUBLE)*1048576.0D))"))
      .select(col("label"), col("__cd"))
    val inter = cd.select(col("label").as("__la"), col("__cd").as("__ca"))
      .crossJoin(broadcast(cd.select(col("label").as("__lb"), col("__cd").as("__cb"))))
      .filter(col("__la") =!= col("__lb"))
      .withColumn("__pm", expr(
        """aggregate(zip_with(__ca, __cb, (x, y) ->
             CAST(round((x - y) * (x - y) * 1000000.0D, 0) AS BIGINT)),
           0L, (a, v) -> a + v)"""))
      .groupBy(col("__la").as("label")).agg(min(col("__pm")).as("__im"))
    intra.join(inter, "label")
      .select(col("label"), col("n_vecs"),
        (col("__sm").cast("double") / (col("n_vecs") * 1000000L)).as("intra_d2"),
        (col("__im").cast("double") / 1000000L).as("inter_d2"),
        // all-identical members ⇒ zero cohesion denominator: report NULL,
        // not Infinity (a dup-collapsed label is a data bug, not "perfectly
        // separated")
        when(col("__sm") > 0,
          round((col("__im").cast("double") / 1000000L)
            / (col("__sm").cast("double") / (col("n_vecs") * 1000000L)), 6))
          .as("separation"))
  }

  /** Deterministic ±1 projection-matrix component for [[randomProjection]]
    * — md5("proj:row:pos") first hex nibble ≥ 8, the same derivation rule
    * as the LSH hyperplanes but under its own seed tag, and PUBLIC so the
    * oracle SQL can re-derive the identical matrix with DuckDB's md5(). */
  def projComp(row: Int, pos: Int): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val h = md.digest(s"proj:$row:$pos".getBytes("UTF-8"))
    if (((h(0) >> 4) & 0xf) >= 8) 1L else -1L
  }

  private def projMatrixSql(outDim: Int, dim: Int): String =
    (0 until outDim).map(r =>
      (0 until dim).map(j => s"${projComp(r, j)}L").mkString("array(", ",", ")"))
      .mkString("array(", ",", ")")

  /** Johnson-Lindenstrauss random projection: reduce `dim`-dimensional
    * embeddings to `outDim` integer components via a deterministic ±1
    * matrix (Achlioptas, "Database-friendly random projections", PODS'01 —
    * ±1 entries preserve inner products in expectation: E[⟨Rx,Ry⟩] =
    * outDim·⟨x,y⟩). The projection of every vector is ONE native
    * graft_matdot over the quantized fixed-point vector — a single
    * codegen'd nested loop, zero shuffles, map-only at any corpus size.
    * Output: (id, proj array<bigint>) in fixed-point units; downstream
    * dots divide by outDim·2⁴⁰ to recover cosine scale. */
  def randomProjection(emb: DataFrame, idCol: String, vecCol: String,
                       dim: Int, outDim: Int): DataFrame = {
    GraftFunctions.register(emb.sparkSession)
    emb.select(col(idCol), quantize(col(vecCol)).as("__qv"))
      .select(col(idCol),
        expr(s"graft_matdot(__qv, ${projMatrixSql(outDim, dim)})").as("proj"))
  }

  /** Distortion audit of [[randomProjection]]: on a deterministic id-mod
    * sample, every pair's original fixed-point dot next to its projected
    * dot (scaled by outDim) and the error in integer micros. This is the
    * measurement that tells a pipeline owner whether `outDim` is high
    * enough BEFORE swapping the reduced vectors into ANN/dedup. The pair
    * enumeration is quadratic in the SAMPLE only (the point of sampling);
    * both dots are exact integer sums → round-6/micros cross-engine
    * stable. */
  def projectionAudit(emb: DataFrame, idCol: String, vecCol: String,
                      dim: Int, outDim: Int, sampleMod: Long): DataFrame = {
    GraftFunctions.register(emb.sparkSession)
    require(sampleMod > 0, s"sampleMod must be > 0: $sampleMod")
    // spread: the streamed side of the pair self-join does O(S²) dot work
    // and must not inherit a single-split scan's one-partition layout
    val sampled = spread(emb.filter(col(idCol) % sampleMod === 0)
      .select(col(idCol), quantize(col(vecCol)).as("__qv"))
      .select(col(idCol), col("__qv"),
        expr(s"graft_matdot(__qv, ${projMatrixSql(outDim, dim)})").as("__p")))
    val a = sampled.select(col(idCol).as("vec_a"), col("__qv").as("__qa"),
      col("__p").as("__pa"))
    val b = sampled.select(col(idCol).as("vec_b"), col("__qv").as("__qb"),
      col("__p").as("__pb"))
    a.join(b, col("vec_a") < col("vec_b"))
      .select(col("vec_a"), col("vec_b"),
        (GraftFunctions.longArrayDot(col("__qa"), col("__qb"))
          / lit(1099511627776.0d)).as("dot_orig"),
        (GraftFunctions.longArrayDot(col("__pa"), col("__pb"))
          / lit(outDim * 1099511627776.0d)).as("dot_proj"))
      .withColumn("err_micros",
        round((col("dot_proj") - col("dot_orig")) * 1e6).cast("long"))
  }

  /** Cluster-stratified diversity sample: k-means-cluster the corpus
    * ([[kmeansAssign]]'s exact-integer pipeline) and keep at most `perCell`
    * vectors per cell, picked by md5(id) — a spread-across-the-embedding-
    * space subset, the standard antidote to uniform sampling's tendency to
    * mirror the corpus's density skew. The per-cell pick is a rank-1..k
    * window over (md5, id) — plans as WindowGroupLimit, so no cell is ever
    * fully sorted — and the audit columns (cell, pick_order) make the
    * sample reproducible and debuggable. */
  def diverseSample(emb: DataFrame, idCol: String, vecCol: String,
                    nCells: Int, trainIters: Int, perCell: Int): DataFrame = {
    require(perCell > 0, s"perCell must be > 0: $perCell")
    val assigned = kmeansAssign(emb, idCol, vecCol, nCells, trainIters)
    val w = Window.partitionBy(col("cell"))
      .orderBy(md5(col(idCol).cast("string")), col(idCol))
    assigned
      .withColumn("pick_order", row_number().over(w))
      .filter(col("pick_order") <= perCell)
      .select(col(idCol), col("cell"), col("pick_order"))
  }

  // --------------------------------------------------- Product Quantization

  /** Train a PQ codebook (Jégou et al. 2011): split the `dim`-long
    * fixed-point vectors into `m` contiguous subspaces of dim/m components,
    * and per subspace run `iters` exact-integer Lloyd rounds over `ks`
    * centroids seeded from the md5-smallest `ks` corpus vectors' slices
    * (code id = seed rank, the [[ivfCentroids]] sampling discipline).
    * Assignment metric is exact squared L2 (PQ quantizes residual energy —
    * dot/cosine is the wrong objective inside a subspace, where slices are
    * not unit vectors); updates are exact integer means (`div` semantics,
    * truncate-toward-zero like the q59 oracle), empty codes keep their
    * previous centroid. Returns cb[m][c][j] as a driver value: M·ks·dSub
    * longs — 8·16·8 = 1 KB here, and BOUNDED like the assignCells literal
    * matrix (a codebook that can't ride with the tasks can't serve ADC
    * either), so the collects obey the union-find discipline. Everything is
    * integer arithmetic, so training is bit-reproducible cross-engine and
    * the DuckDB oracle re-derives it (q99).
    *
    * `quantized` must be (idCol, __qv array<bigint>) and is scanned
    * 1 + iters times — pass a persisted frame. */
  def pqTrainCodebook(quantized: DataFrame, idCol: String, m: Int, ks: Int,
                      iters: Int): Array[Array[Array[Long]]] = {
    val seedRows = quantized
      .orderBy(md5(col(idCol).cast("string")), col(idCol))
      .limit(ks) // TakeOrderedAndProject: distributed top-k, no global sort
      .collect()
    require(seedRows.nonEmpty, "pqTrainCodebook: empty corpus")
    val dim = seedRows.head.getSeq[Long](1).length
    require(dim % m == 0, s"pqTrainCodebook: dim $dim not divisible by m=$m")
    val dSub = dim / m
    // cb[m][c][j]; fewer corpus vectors than ks just means fewer codes
    var cb: Array[Array[Array[Long]]] = Array.tabulate(m) { mm =>
      seedRows.map(r => r.getSeq[Long](1).slice(mm * dSub, (mm + 1) * dSub).toArray)
    }
    for (_ <- 0 until iters) {
      val lit = cbLiteral(cb)
      // one narrow pass: per (subspace, code, position) exact integer mean
      // of the member slices — M·ks·dSub groups (≈1k), map-side combined
      val means = spread(quantized)
        .select(call_function("graft_pqenc", col("__qv"), lit).as("__codes"),
          posexplode(col("__qv")).as(Seq("__pos", "__v")))
        .groupBy((col("__pos") / dSub).cast("int").as("__m"),
          element_at(col("__codes"), (col("__pos") / dSub).cast("int") + 1).as("__c"),
          (col("__pos") % dSub).as("__j"))
        .agg(expr("sum(__v) div count(1)").as("__mv"))
        .collect() // bounded: ≤ m·ks·dSub rows
      val next = cb.map(_.map(_.clone()))
      means.foreach { r =>
        next(r.getInt(0))(r.getLong(1).toInt)(r.getInt(2)) = r.getLong(3)
      }
      cb = next
    }
    cb
  }

  private[graft] def cbLiteral(cb: Array[Array[Array[Long]]]): Column =
    typedLit(cb.map(_.map(_.toSeq).toSeq).toSeq)

  /** PQ-encode the corpus: (id, codes array<bigint>) — each vector
    * compressed to `m` code ids against a trained codebook. MAP-ONLY: the
    * codebook rides with the tasks as one literal; no join, no shuffle. At
    * 100 TB this is the index build — the output is M small ints per vector
    * (vs M·dSub floats), the compression that lets a billion-vector index
    * fit executor memory. */
  def pqIndex(emb: DataFrame, idCol: String, vecCol: String,
              m: Int = 8, ks: Int = 16, trainIters: Int = 1): DataFrame = {
    GraftFunctions.register(emb.sparkSession)
    val q = emb.select(col(idCol), quantize(col(vecCol)).as("__qv"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val cb = pqTrainCodebook(q, idCol, m, ks, trainIters)
    spread(q).select(col(idCol),
      call_function("graft_pqenc", col("__qv"), cbLiteral(cb)).as("codes"))
  }

  /** PQ-ADC approximate top-k: queries score the WHOLE corpus, but against
    * M-code compressed vectors via distance-table lookups (graft_pqadc)
    * instead of full-dimension arithmetic — O(M) array reads per pair after
    * an O(ks·dim) per-QUERY table build. The scan side carries only
    * (id, codes); the full vectors never cross the join. Smaller adist =
    * closer (squared L2). Deterministic end to end (md5 seed, exact integer
    * training, integer distances, id tiebreaks) ⇒ fully value-oracled
    * (q99). The compressed scan's win is MEMORY TRAFFIC: the streamed side
    * carries M longs/vector instead of dim (+ the payload a real store
    * keeps per vector), which pays off when the corpus no longer sits in
    * cache — at cache-resident stress scale (80k×64f) wall clock lands
    * near [[bruteForceTopK]]'s (measured; the per-pair op counts differ
    * only 4×). The production serving shape is [[ivfPqTopK]], where cell
    * probing cuts the candidate count BEFORE the ADC scan. */
  def pqAdcTopK(emb: DataFrame, idCol: String, vecCol: String,
                queryPred: Column, k: Int,
                m: Int = 8, ks: Int = 16, trainIters: Int = 1): DataFrame = {
    GraftFunctions.register(emb.sparkSession)
    val q = emb.select(col(idCol), quantize(col(vecCol)).as("__qv"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val cb = pqTrainCodebook(q, idCol, m, ks, trainIters)
    val lit = cbLiteral(cb)
    val nCandidates = q.count() // scalar job on the persisted frame; sizes
                                // the refinedTopK sample modulus
    // persisted for the same two reasons as ivfPqTopK's index: the refine
    // passes share it, and the barrier pins graft_pqenc to once-per-row
    val enc = spread(q).select(col(idCol).as("neighbor_id"),
      call_function("graft_pqenc", col("__qv"), lit).as("__codes"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val queries = emb.filter(queryPred)
      .select(col(idCol).as("query_id"),
        call_function("graft_pqtab", quantize(col(vecCol)), lit).as("__tab"))
    val scored = enc.crossJoin(broadcast(queries)) // BroadcastNestedLoop, never Cartesian
      .filter(col("neighbor_id") =!= col("query_id"))
      .withColumn("adist", call_function("graft_pqadc", col("__tab"), col("__codes")))
    refinedTopK(scored, k, nCandidates)
  }

  /** EXACT per-query top-k over a scored (query_id, neighbor_id, adist)
    * candidate fan-out, without ever sorting the fan-out.
    *
    * `row_number().over(window) <= k` must ORDER the whole N·nQueries
    * expansion inside each partition even under WindowGroupLimit's partial
    * pruning — at the 160M-pair probe scale that sort was 75–130 s of a
    * query whose actual ADC scoring took 1.7 s; routing the ranking
    * through a bounded top-k aggregate instead still crawled
    * (ObjectHashAggregate falls back to sort-based past 128 groups per
    * partition, and TypedImperativeAggregate updates evaluate
    * interpreted). The classic distributed-top-k bound fixes the shape:
    *
    *   1. SAMPLE pass: candidates whose xxhash64(neighbor_id) ≡ 0 mod f
    *      (f sized so ~max(64k, 2048) candidates survive globally) are
    *      scored and top-k'd per query (graft_topk — the frame is small,
    *      any agg path is fine). The sample's kth distance is a SOUND
    *      upper bound for the true kth (a subset's kth smallest ≥ the
    *      full set's kth smallest).
    *   2. FILTER pass: the full fan-out is re-scored (cheap — it is the
    *      ranking, not the scoring, that didn't scale) and cut to
    *      adist ≤ bound: ~N·k/|sample| survivors per query in
    *      expectation, k at minimum.
    *   3. The exact window ranking runs on survivors only.
    *
    * Results are BIT-IDENTICAL to the plain window (the bound can only
    * admit a superset of the true top-k; the final ranking is exact), so
    * q99/q100's oracles hold unchanged — PqSpec additionally pins
    * equality on the degenerate configurations. A query missing from the
    * sample (or with < k sampled candidates) falls back to an infinite
    * bound via the left join — correct, just unpruned. */
  private[operators] def refinedTopK(scored: DataFrame, k: Int, nCandidates: Long): DataFrame = {
    GraftFunctions.register(scored.sparkSession)
    val sampleTarget = math.max(64L * k, 2048L)
    val f = math.max(1L, nCandidates / sampleTarget)
    val sampled = scored.filter(pmod(xxhash64(col("neighbor_id")), lit(f)) === 0)
    val bound = sampled.groupBy(col("query_id"))
      .agg(expr(s"graft_topk(adist, neighbor_id, $k)").as("__t"))
      .select(col("query_id"),
        when(size(col("__t")) >= k, element_at(col("__t"), k).getField("key"))
          .otherwise(lit(Long.MaxValue)).as("__kbound"))
    val survivors = scored.join(broadcast(bound), Seq("query_id"), "left")
      .filter(col("adist") <= coalesce(col("__kbound"), lit(Long.MaxValue)))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("adist"), col("neighbor_id"))
    survivors
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("neighbor_id"), col("adist"))
  }

  /** IVF-PQ top-k — the two ANN halves composed into the production serving
    * shape (FAISS's IVFPQ family): the coarse quantizer restricts each
    * query to `nProbe` cells (so only ~N·nProbe/nCells candidates are
    * touched), and candidates are scored against M-code PQ-compressed
    * vectors via table lookups (graft_pqadc) — the full vectors are
    * DROPPED at index build and never cross the join. At 100 TB both
    * levers matter independently: IVF bounds how much of the corpus a
    * query reads, PQ bounds the bytes per candidate read; composed, a
    * billion-vector index is nProbe/nCells · M/(4·dim) of the brute-force
    * scan traffic.
    *
    * Simplification vs FAISS: codes quantize RAW vectors against one
    * global codebook, not per-cell residuals (residual encoding reuses the
    * same machinery with cb trained on `__qv - centroid` and per-(query,
    * cell) table builds; the accuracy refinement is documented, not
    * hidden). Coarse quantizer is the zero-training md5 sample
    * ([[ivfCentroids]], the q35 discipline), codebook is Lloyd-trained —
    * every step exact integer math, so q100's DuckDB oracle re-derives
    * index build, probing, and ADC ranking end to end. nProbe = nCells
    * degenerates to exactly [[pqAdcTopK]] (asserted in PqSpec). */
  def ivfPqTopK(emb: DataFrame, idCol: String, vecCol: String,
                queryPred: Column, k: Int,
                nCells: Int = 32, nProbe: Int = 8,
                m: Int = 16, ks: Int = 64, trainIters: Int = 1): DataFrame = {
    // One implementation for the inline and persisted paths: build the
    // index frames ([[VectorIndex.build]] — assignment + encode in ONE
    // map-only pass, vectors dropped, frame persisted so graft_pqenc runs
    // once per row), then serve ([[VectorIndex.topK]] — the big index
    // streams, probe list + distance tables broadcast, never a cell-keyed
    // exchange; see the ivfTopK scaladoc for the measured straggler that
    // rule prevents). q103 pins that a write/read hop between these two
    // calls is value-neutral.
    val ix = VectorIndex.build(emb, idCol, vecCol, nCells, m, ks, trainIters)
    VectorIndex.topK(ix, emb.filter(queryPred), idCol, vecCol, k, nProbe)
  }

  /** RESIDUAL IVF-PQ top-k — the accuracy refinement [[ivfPqTopK]]'s
    * scaladoc documents, implemented: codes quantize each vector's residual
    * `v − centroid(cell)` instead of the raw vector, against a codebook
    * trained on residuals (FAISS IVFPQ's actual encoding). Residuals live
    * in a ball around the origin whose radius is the CELL radius, not the
    * corpus radius, so the same (m, ks) budget spends its quantization
    * levels on a far smaller volume — reconstruction error (and with it
    * ADC ranking error) drops at identical index size; PqSpec measures the
    * recall gain on the test corpus.
    *
    * Serving cost shape vs raw-coded IVF-PQ: distance tables are built per
    * (query, PROBED CELL) instead of per query — nProbe table builds of
    * O(ks·dim) each, the documented residual trade — while the per-
    * candidate work is unchanged (M table lookups). The tables ride on the
    * broadcast probe frame (queries × nProbe rows), the coded corpus
    * streams; the candidate fan-out is the same broadcast-the-small-side
    * shape as [[ivfTopK]] — never a cell-keyed exchange.
    *
    * Exactness discipline: residuals are exact integer differences of the
    * fixed-point vector and the (spherically normalized, integer) centroid
    * of its cell, so training, encoding, probing, and ADC remain
    * bit-reproducible and the DuckDB oracle (q121) re-derives the whole
    * pipeline. `adist` is squared L2 between the query's residual w.r.t.
    * the probed cell and the candidate's quantized residual — identical in
    * metric to `‖q − x̂‖²` since both subtract the same cell centroid. */
  def ivfPqResidualTopK(emb: DataFrame, idCol: String, vecCol: String,
                        queryPred: Column, k: Int,
                        nCells: Int = 32, nProbe: Int = 8,
                        m: Int = 16, ks: Int = 64,
                        trainIters: Int = 1): DataFrame = {
    // delegates to the index lifecycle exactly like ivfPqTopK, so the
    // inline and persisted residual paths cannot drift (q122 pins the
    // write→read hop value-neutral against q121's oracle)
    val ix = VectorIndex.build(emb, idCol, vecCol, nCells, m, ks, trainIters,
      residual = true)
    VectorIndex.topK(ix, emb.filter(queryPred), idCol, vecCol, k, nProbe)
  }
}
