package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Corpus-curation operators for training-data pipelines: token-budget
  * shard packing, vocabulary building, stratified sampling, int8 embedding
  * quantization, dedup-aware splitting, and the composed quality gate.
  *
  * Beyond the reference's operator surface (its curation stops at
  * `regexp_replace` cleanup + Deequ-style checks, `silver_dimensions.py:50`,
  * `silver_validation.py:86-135`) — these are the ops an LLM pre-training
  * pipeline runs between "raw corpus" and "tokenizer-ready shards".
  * Everything is built-ins/codegen, no UDFs; all derived numbers are exact
  * integer arithmetic (or integer-division doubles) so every operator is
  * oracle-checkable cross-engine.
  */
object Curation {

  /** Concatenate-and-chunk shard packing: documents are laid out in id
    * order, each starting at the running token offset of its predecessors,
    * and assigned to shard `start_offset div tokensPerShard` — the standard
    * "concat then cut fixed-token blocks" layout for pre-training shards
    * (a document is never split across assignment rows; shards may overrun
    * by at most one document's tokens).
    *
    * Scale design — the global prefix sum is TWO-LEVEL, never a global
    * single-partition window: range-partition by id, per-partition token
    * subtotals (one tiny P-row frame) get a driver-free cumulative offset
    * via a window over P rows, broadcast back, and each partition computes
    * its local prefix sum independently. Wall-clock is one range shuffle +
    * one P-row window; the classic `Window.orderBy(id)` form would funnel
    * 100 TB through ONE task. Offsets are partitioning-independent (the
    * prefix sum over a total id order), so results are deterministic
    * whatever boundaries the range sampler picks. */
  def packShards(docs: DataFrame, idCol: String, textCol: String,
                 tokensPerShard: Long): DataFrame = {
    require(tokensPerShard > 0, s"tokensPerShard must be > 0: $tokensPerShard")
    val parted = docs
      .select(col(idCol), size(Dedup.tokens(col(textCol))).cast("long").as("n_tokens"))
      .repartitionByRange(col(idCol))
      // nondeterministic expr must live in a Project before any grouping
      .select(col(idCol), col("n_tokens"), spark_partition_id().as("__pid"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val wP = Window.orderBy(col("__pid"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = parted.groupBy(col("__pid"))
      .agg(sum(col("n_tokens")).as("__ptotal"))
      .select(col("__pid"), coalesce(sum(col("__ptotal")).over(wP), lit(0L)).as("__poffset"))
    val wIn = Window.partitionBy(col("__pid")).orderBy(col(idCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    parted.join(broadcast(offsets), "__pid")
      .select(col(idCol), col("n_tokens"),
        (col("__poffset") + coalesce(sum(col("n_tokens")).over(wIn), lit(0L)))
          .as("start_offset"))
      .withColumn("shard", expr(s"start_offset div ${tokensPerShard}L"))
  }

  /** Corpus vocabulary: top-K terms by collection frequency (total
    * occurrences), document frequency alongside, deterministic tie-break on
    * the term. One explode + one hash aggregate; the top-K is a
    * TakeOrderedAndProject (per-partition heaps + driver merge of K rows),
    * never a global sort, and the K-row rank window is driver-scale. */
  def vocabulary(docs: DataFrame, idCol: String, textCol: String,
                 topK: Int, n: Int = 1): DataFrame = {
    val top = TextAnalysis.termRows(docs, idCol, textCol, n)
      .groupBy(col("term"))
      .agg(count(lit(1)).as("cf"), countDistinct(col(idCol)).as("df"))
      .orderBy(col("cf").desc, col("term"))
      .limit(topK)
    top.withColumn("rank",
      row_number().over(Window.orderBy(col("cf").desc, col("term"))).cast("long"))
  }

  /** Deterministic stratified sample: exactly min(n, |stratum|) rows per
    * stratum, chosen by md5-rank of the id — a pure function of the data,
    * stable across runs/engines/partitionings (`Dataset.sample` is neither
    * stratified nor cross-engine reproducible). Spark plans the per-group
    * limit as WindowGroupLimit (rank pushed below the sort at 3.5+), so each
    * stratum keeps ~n candidate rows per task instead of fully sorting —
    * a skewed giant stratum costs one partial top-n pass, not a stratum-wide
    * sort. */
  def stratifiedSample(df: DataFrame, strataCol: String, idCol: String,
                       nPerStratum: Int): DataFrame = {
    require(nPerStratum > 0, s"nPerStratum must be > 0: $nPerStratum")
    val w = Window.partitionBy(col(strataCol))
      .orderBy(md5(col(idCol).cast("string")), col(idCol))
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= nPerStratum)
      .drop("__rn")
  }

  /** Symmetric int8 quantization of an embedding column — the standard
    * storage/bandwidth compression before ANN serving (4× smaller than
    * float32, dot products stay proportional). Per vector: the float is
    * fixed-pointed exactly (floor(x·2^20), see [[Similarity.quantize]]),
    * scale = max |fixed| over dims, and q_i = trunc(127·fixed_i / scale) in
    * pure 64-bit integer math — every output (the quantized vector, its
    * scale, the exact integer reconstruction-error numerator) is
    * bit-reproducible cross-engine. Reconstruction: x_i ≈ q_i·scale /
    * (127·2^20); per-dim error < scale/(127·2^20) by construction.
    * `err_num` = Σ|127·fixed_i − q_i·scale| (exact; divide by 127·2^20 for
    * the absolute-error sum). All per-row lambda work, no shuffle. */
  def quantizeInt8(emb: DataFrame, idCol: String, vecCol: String): DataFrame =
    emb.select(col(idCol), Similarity.quantize(col(vecCol)).as("__fx"))
      .withColumn("scale_fp", expr("array_max(transform(__fx, v -> abs(v)))"))
      .withColumn("qvec", expr(
        """transform(__fx, v -> CASE WHEN scale_fp = 0L THEN 0L
          |  WHEN v < 0L THEN -(((-v) * 127L) div scale_fp)
          |  ELSE (v * 127L) div scale_fp END)""".stripMargin))
      .select(col(idCol),
        col("scale_fp"),
        size(col("__fx")).cast("long").as("n_dims"),
        expr("concat_ws(',', transform(qvec, v -> CAST(v AS STRING)))").as("qvec_csv"),
        expr("""aggregate(zip_with(__fx, qvec, (a, q) -> abs(a * 127L - q * scale_fp)),
               |  0L, (acc, v) -> acc + v)""".stripMargin).as("err_num"))

  /** Dedup-aware train/val/test split: near-duplicate documents MUST land
    * in the same split (a train/test boundary through a near-dup cluster
    * leaks training text into eval), so the split hash is taken over the
    * cluster's canonical id — component of the MinHash near-dup graph,
    * the document's own id when unclustered — rather than the document id.
    * Composition of [[Dedup.minhashNearDups]] → [[Dedup.connectedComponents]]
    * → [[TextAnalysis.withSplit]]; inherits their scale shapes (bucketed
    * LSH, bounded component iteration, pure-hash assignment). */
  def dedupAwareSplit(docs: DataFrame, idCol: String, textCol: String,
                      trainPct: Int, valPct: Int,
                      shingleN: Int = 3, k: Int = 8, bands: Int = 4,
                      threshold: Double = 0.1, maxBucketSize: Int = 100): DataFrame = {
    val pairs = Dedup.minhashNearDups(docs, idCol, textCol,
      shingleN, k, bands, threshold, maxBucketSize)
    val comp = Dedup.connectedComponents(pairs, "doc_a", "doc_b")
    val canonical = docs.select(col(idCol))
      .join(comp, docs(idCol) === comp("id"), "left")
      .select(col(idCol), coalesce(col("component"), col(idCol)).as("canonical_id"))
    TextAnalysis.withSplit(canonical, "canonical_id", trainPct, valPct)
  }

  /** The composed corpus quality gate — one call from raw corpus to
    * keep/drop decisions with full per-gate attribution:
    *
    *   - length gate: minTokens ≤ n_tokens ≤ maxTokens
    *   - stopword gate: stop_ratio ≥ minStopRatio (word-salad filter)
    *   - repetition gate: repeated-shingle fraction ≤ maxRepetition
    *     (boilerplate/looped-text filter)
    *   - contamination gate: zero n-gram overlap with the eval set
    *   - exact-dup gate: only each duplicate group's min-id survivor passes
    *
    * `keep` = all five; every underlying measure and flag is emitted so
    * downstream can re-threshold without recomputing. Four aggregations
    * over the corpus (tokens, raw shingles, eval-overlap probe, dup
    * groups) joined on id — each is one shuffle on the same key; the eval
    * side is distinct-collapsed and broadcast ([[TextAnalysis.contamination]]).
    * Near-dup clustering is deliberately NOT in the gate — it reassigns
    * rather than drops (see [[dedupAwareSplit]], [[Dedup.dedupCorpus]]). */
  def curate(corpus: DataFrame, evalSet: DataFrame, idCol: String,
             textCol: String, stopwords: Seq[String],
             minTokens: Long, maxTokens: Long, minStopRatio: Double,
             maxRepetition: Double, shingleN: Int = 3): DataFrame = {
    val stats = TextAnalysis.tokenStats(corpus, idCol, textCol, stopwords)
      .select(col(idCol), col("n_tokens"), col("stop_ratio"))
    val rep = TextAnalysis.repetition(corpus, idCol, textCol, shingleN)
      .select(col(idCol), col("repetition_ratio"))
    val contam = TextAnalysis.contamination(corpus, evalSet, idCol, textCol, shingleN)
      .select(col(idCol), col("contaminated"))
    val canon = corpus
      .select(col(idCol), md5(col(textCol)).as("__h"))
      .join(Dedup.exactGroups(corpus, idCol, textCol)
        .select(col("text_hash").as("__h"), col("canonical_id")), "__h")
      .select(col(idCol), (col(idCol) === col("canonical_id")).as("is_canonical"))
    stats
      // docs shorter than shingleN tokens have no shingle rows: no
      // repetition signal (→ 0) and unscoreable for contamination (→ clean).
      // The coalesce MUST happen in its own projection — deriving the pass
      // flags in the same select would resolve `repetition_ratio` /
      // `contaminated` to the pre-coalesce nullable columns and yield NULL
      // flags for short docs.
      .join(rep, Seq(idCol), "left")
      .join(contam, Seq(idCol), "left")
      .join(canon, Seq(idCol))
      .select(col(idCol), col("n_tokens"), col("stop_ratio"),
        coalesce(col("repetition_ratio"), lit(0.0)).as("repetition_ratio"),
        coalesce(col("contaminated"), lit(false)).as("contaminated"),
        col("is_canonical"))
      .withColumn("pass_length",
        col("n_tokens") >= minTokens && col("n_tokens") <= maxTokens)
      .withColumn("pass_stopwords", col("stop_ratio") >= minStopRatio)
      .withColumn("pass_repetition", col("repetition_ratio") <= maxRepetition)
      .withColumn("keep",
        col("pass_length") && col("pass_stopwords") && col("pass_repetition") &&
          !col("contaminated") && col("is_canonical"))
  }

  /** Adaptive length gate: keep documents whose token count lies within the
    * corpus's own [loPct, hiPct] percentile band — thresholds derived from
    * the data instead of hand-tuned constants, so the gate transfers across
    * corpora with different length regimes. Exact interpolated percentiles
    * (one pass over a 1-column frame), rounded to 6 decimals for
    * cross-engine stability (as q44), broadcast back as a 1-row bound. */
  def adaptiveLengthGate(docs: DataFrame, idCol: String, textCol: String,
                         loPct: Double, hiPct: Double): DataFrame = {
    require(loPct >= 0 && hiPct <= 1 && loPct < hiPct,
      s"need 0 <= loPct < hiPct <= 1: $loPct, $hiPct")
    val t = docs.select(col(idCol),
      size(Dedup.tokens(col(textCol))).cast("long").as("n_tokens"))
    val bounds = t.agg(
      round(expr(s"percentile(n_tokens, ${loPct}D)"), 6).as("lo"),
      round(expr(s"percentile(n_tokens, ${hiPct}D)"), 6).as("hi"))
    t.crossJoin(broadcast(bounds))
      .withColumn("keep", col("n_tokens") >= col("lo") && col("n_tokens") <= col("hi"))
  }

  /** Token-budget truncation: cap every document at `maxTokens` whitespace
    * tokens (sequence-packing prep — long documents are cut, short ones
    * pass through). Case and inner whitespace of the kept prefix are
    * normalized by the split/rejoin; the token stream itself is what a
    * tokenizer consumes downstream. Pure per-row array ops, no shuffle. */
  def truncateTokens(docs: DataFrame, idCol: String, textCol: String,
                     maxTokens: Int): DataFrame = {
    require(maxTokens > 0, s"maxTokens must be > 0: $maxTokens")
    val w = split(trim(col(textCol)), "\\s+")
    docs.select(col(idCol),
      size(w).cast("long").as("n_tokens"),
      least(size(w).cast("long"), lit(maxTokens.toLong)).as("kept_tokens"),
      (size(w) > maxTokens).as("truncated"),
      concat_ws(" ", slice(w, 1, maxTokens)).as("text_trunc"))
  }

  /** Overlapping-window document chunking: split each document's token
    * stream into chunks of `chunkTokens`, each starting `strideTokens`
    * after the previous (stride < chunk ⇒ overlap — context-window prep
    * for embedding/indexing long docs). Chunk count is
    * 1 + ceil((n − chunk)/stride) so the last chunk is the first one to
    * reach the end (no fully-redundant tail windows). Pure per-row
    * generate — explode of a per-doc integer sequence, no shuffle, no
    * joins; a 100 TB corpus chunks in a single map stage. */
  def chunkDocs(docs: DataFrame, idCol: String, textCol: String,
                chunkTokens: Int, strideTokens: Int): DataFrame = {
    require(chunkTokens > 0 && strideTokens > 0 && strideTokens <= chunkTokens,
      s"need 0 < stride <= chunk: $strideTokens, $chunkTokens")
    val c = lit(chunkTokens.toLong)
    val s = lit(strideTokens.toLong)
    docs
      .select(col(idCol), split(trim(col(textCol)), "\\s+").as("__w"))
      .withColumn("__n", size(col("__w")).cast("long"))
      .withColumn("chunk_id", explode(sequence(lit(0L),
        when(col("__n") <= c, lit(0L))
          .otherwise(expr(s"(__n - ${chunkTokens}L + ${strideTokens}L - 1L) div ${strideTokens}L")))))
      .select(col(idCol), col("chunk_id"),
        col("__n").as("n_tokens"),
        least(c, col("__n") - col("chunk_id") * s).as("n_chunk_tokens"),
        concat_ws(" ", slice(col("__w"),
          (col("chunk_id") * s + 1).cast("int"), lit(chunkTokens))).as("chunk_text"))
  }

  /** Per-domain document cap: at most `maxPerSource` documents survive per
    * source, chosen by md5-rank of the id — the standard web-corpus guard
    * against a single hot domain dominating the training mix. The md5
    * order makes the selection a uniform deterministic sample (stable
    * across runs/engines/partitionings), not "first N by crawl order".
    * Emits every row with its pick_order and a keep flag for auditability;
    * at scale, filtering `pick_order <= cap` directly plans as
    * WindowGroupLimit (per-task partial top-N, no full per-domain sort) —
    * same property as [[stratifiedSample]]. */
  def domainCap(docs: DataFrame, idCol: String, sourceCol: String,
                maxPerSource: Int): DataFrame = {
    require(maxPerSource > 0, s"maxPerSource must be > 0: $maxPerSource")
    val w = Window.partitionBy(col(sourceCol))
      .orderBy(md5(col(idCol).cast("string")), col(idCol))
    docs.select(col(idCol), col(sourceCol))
      .withColumn("pick_order", row_number().over(w).cast("long"))
      .withColumn("keep", col("pick_order") <= maxPerSource)
  }

  /** Exact-size uniform corpus sample: the `n` rows with the smallest
    * md5(id) — a deterministic uniform draw (md5 order is independent of
    * every data attribute), stable across runs/engines/partitionings,
    * unlike `Dataset.sample` which is neither exact-size nor reproducible
    * cross-engine. Plans as TakeOrderedAndProject (per-partition top-n
    * heaps + driver merge of n rows — never a global sort); the rank
    * window runs over the already-reduced n rows. */
  def sampleExact(df: DataFrame, idCol: String, n: Int): DataFrame = {
    require(n > 0, s"n must be > 0: $n")
    val top = df.select(col(idCol))
      .orderBy(md5(col(idCol).cast("string")), col(idCol))
      .limit(n)
    top.withColumn("sample_rank",
      row_number().over(Window.orderBy(md5(col(idCol).cast("string")), col(idCol)))
        .cast("long"))
  }

  /** Cross-source duplication matrix: how many near-dup pairs connect each
    * (source, source) combination — the "who copies from whom" view that
    * decides which domains to down-weight or drop. Pairs come from the
    * full MinHash chain ([[Dedup.minhashNearDups]]); sources attach by two
    * id joins (AQE broadcasts the small pair frame); the matrix key is
    * order-normalized (least/greatest) so A→B and B→A accumulate together.
    * Counts only — a cross-partition sum of per-pair Jaccard doubles would
    * not be bit-stable cross-engine. */
  def dupSourceMatrix(docs: DataFrame, idCol: String, textCol: String,
                      sourceCol: String, shingleN: Int = 3, k: Int = 8,
                      bands: Int = 4, threshold: Double = 0.1,
                      maxBucketSize: Int = 0): DataFrame = {
    val pairs = Dedup.minhashNearDups(docs.select(col(idCol), col(textCol)),
      idCol, textCol, shingleN, k, bands, threshold, maxBucketSize)
    val src = docs.select(col(idCol), col(sourceCol))
    pairs
      .join(src.select(col(idCol).as("doc_a"), col(sourceCol).as("__sa")), "doc_a")
      .join(src.select(col(idCol).as("doc_b"), col(sourceCol).as("__sb")), "doc_b")
      .groupBy(least(col("__sa"), col("__sb")).as("source_a"),
        greatest(col("__sa"), col("__sb")).as("source_b"))
      .agg(count(lit(1)).as("n_pairs"))
  }

  /** Head-mass vocabulary coverage: for each requested k, the fraction of
    * all token occurrences covered by the k most frequent terms — the
    * Zipf-head statistic that sizes tokenizer vocabularies and stopword
    * lists. One term aggregation; the top-max(k) reduction is
    * TakeOrderedAndProject and the cumulative window runs over those few
    * rows on the driver scale. coverage is an integer-division double
    * (exact cross-engine). ks beyond the vocabulary size yield no row. */
  def coverageAtK(docs: DataFrame, idCol: String, textCol: String,
                  ks: Seq[Int]): DataFrame = {
    require(ks.nonEmpty && ks.forall(_ > 0), s"ks must be positive: $ks")
    val cf = TextAnalysis.termRows(docs, idCol, textCol, 1)
      .groupBy(col("term")).agg(count(lit(1)).as("cf"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val tot = cf.agg(sum(col("cf")).as("total_cf"))
    val w = Window.orderBy(col("cf").desc, col("term"))
      .rowsBetween(Window.unboundedPreceding, 0)
    val ranked = cf.orderBy(col("cf").desc, col("term")).limit(ks.max)
      .withColumn("rk", row_number()
        .over(Window.orderBy(col("cf").desc, col("term"))).cast("long"))
      .withColumn("top_cf_sum", sum(col("cf")).over(w))
    val ksDf = ranked.sparkSession.range(1)
      .select(explode(typedLit(ks.map(_.toLong).sorted)).as("k"))
    ranked.join(ksDf, col("rk") === col("k"))
      .crossJoin(broadcast(tot))
      .select(col("k"), col("top_cf_sum"), col("total_cf"),
        (col("top_cf_sum").cast("double") / col("total_cf")).as("coverage"))
  }

  /** Domain/source mixture weights for training-data sampling: weight each
    * source proportionally to n_tokens^alpha (alpha < 1 upsamples small
    * high-quality sources relative to bulk crawl — the standard
    * temperature-style reweighting), plus the epochs-per-source a given
    * token budget implies (epochs > 1 ⇒ that source repeats during
    * training).
    *
    * Determinism: the one libm call (pow) is fixed-pointed to integer
    * thousandths immediately, so the normalizing sum and both emitted
    * ratios are exact integer arithmetic / integer-division doubles —
    * bit-stable across engines and partition orders. Ranges: safe while
    * n_tokens^alpha·10³ · tokenBudget < 2⁶³ (alpha ≤ 0.5, petatoken
    * corpora and terabyte budgets included).
    *
    * One aggregation over the corpus + a broadcast 1-row normalizer. */
  def mixtureWeights(docs: DataFrame, idCol: String, textCol: String,
                     sourceCol: String, alpha: Double,
                     tokenBudget: Long): DataFrame = {
    require(alpha > 0 && alpha <= 1, s"alpha must be in (0,1]: $alpha")
    require(tokenBudget > 0, s"tokenBudget must be > 0: $tokenBudget")
    val t = docs.groupBy(col(sourceCol)).agg(
      count(lit(1)).as("n_docs"),
      sum(size(Dedup.tokens(col(textCol))).cast("long")).as("n_tokens"))
    val p = t.withColumn("__pw",
      round(pow(col("n_tokens").cast("double"), lit(alpha)) * 1000, 0).cast("long"))
    val norm = p.agg(sum(col("__pw")).as("__sp"))
    p.crossJoin(broadcast(norm))
      .select(col(sourceCol), col("n_docs"), col("n_tokens"),
        (col("__pw").cast("double") / col("__sp")).as("weight"),
        ((col("__pw") * tokenBudget).cast("double") / (col("__sp") * col("n_tokens")))
          .as("epochs"))
  }

  /** Weighted sample without replacement (Efraimidis–Spirakis): each row
    * gets key ln(u)/w — u an md5-derived uniform in (0,1], w its positive
    * weight — and the n largest keys win, giving inclusion probability
    * proportional to weight. Deterministic end to end: u = (h+1)/2⁶⁰ from
    * the id's md5 (integer-division double), and the one libm call (ln)
    * is rounded to 6 decimals BEFORE ranking (the tf-idf recipe) so the
    * order is bit-stable cross-engine. Top-n is TakeOrderedAndProject;
    * rows with w ≤ 0 are excluded. Use for quality-weighted corpus
    * sampling (weight = LM score, length, source priority). */
  def weightedSample(df: DataFrame, idCol: String, weightCol: String,
                     n: Int): DataFrame = {
    require(n > 0, s"n must be > 0: $n")
    val h = expr(
      s"CAST(conv(substr(md5(CAST($idCol AS STRING)), 1, 15), 16, 10) AS BIGINT)")
    val u = (h + 1).cast("double") / lit(1152921504606846976.0d) // 2^60
    val top = df.select(col(idCol), col(weightCol).cast("double").as("weight"))
      .filter(col("weight") > 0)
      .withColumn("score", round(log(u) / col("weight"), 6))
      .orderBy(col("score").desc, col(idCol))
      .limit(n)
    top.withColumn("sample_rank",
      row_number().over(Window.orderBy(col("score").desc, col(idCol))).cast("long"))
  }

  /** Largest-remainder token-budget apportionment: turns [[mixtureWeights]]'
    * proportional weights into concrete integer per-source token quotas
    * that sum EXACTLY to `tokenBudget` — the number a shard-writer
    * actually consumes. Floor shares first, then the budget−Σfloor
    * leftover (< #sources tokens) goes to the largest fractional
    * remainders (ties broken by source name). Shares are doubles but every
    * operation is order-independent IEEE arithmetic on broadcast scalars
    * (no cross-partition float sums), so the allocation is bit-stable
    * cross-engine; the remainder rank window runs over the #sources-row
    * frame (driver scale, as [[vocabulary]]). */
  def allocateBudget(docs: DataFrame, idCol: String, textCol: String,
                     sourceCol: String, alpha: Double,
                     tokenBudget: Long): DataFrame = {
    require(alpha > 0 && alpha <= 1, s"alpha must be in (0,1]: $alpha")
    require(tokenBudget > 0, s"tokenBudget must be > 0: $tokenBudget")
    val t = docs.groupBy(col(sourceCol)).agg(
      sum(size(Dedup.tokens(col(textCol))).cast("long")).as("n_tokens"))
    val p = t.withColumn("__pw",
      round(pow(col("n_tokens").cast("double"), lit(alpha)) * 1000, 0).cast("long"))
    val norm = p.agg(sum(col("__pw")).as("__sp"))
    val shared = p.crossJoin(broadcast(norm))
      .withColumn("__share", col("__pw").cast("double") * tokenBudget / col("__sp"))
      .withColumn("base_tokens", floor(col("__share")).cast("long"))
      .withColumn("__frac", col("__share") - col("base_tokens"))
    val tot = shared.agg(sum(col("base_tokens")).as("__tb"))
    shared.crossJoin(broadcast(tot))
      .withColumn("__rk", row_number()
        .over(Window.orderBy(col("__frac").desc, col(sourceCol))).cast("long"))
      .withColumn("alloc_tokens", col("base_tokens") +
        when(col("__rk") <= lit(tokenBudget) - col("__tb"), 1L).otherwise(0L))
      .select(col(sourceCol), col("n_tokens"), col("base_tokens"),
        col("alloc_tokens"))
  }

  /** Per-source curation scorecard: how much of each ingestion source
    * survives the [[curate]] gate, with counts per failure mode — the
    * report a pipeline operator reads to decide which crawls/feeds to
    * deprioritize. One aggregation over the gate output joined to the
    * source metadata; all measures are integer counts (+ one
    * integer-division rate), so the rollup is oracle-exact. */
  /** Corpus snapshot diff — the bookkeeping op behind incremental crawls
    * and versioned-corpus publishes: classify every document id across two
    * snapshots as added (new only), removed (old only), changed (both,
    * content hash differs) or unchanged. Feeds incremental pipelines
    * (process added ∪ changed only — see [[graft.operators.Dedup.incrementalDedup]])
    * and publish audits (what moved between v=N and v=N+1).
    *
    * Scale: each side reduces to narrow (id, md5) rows at the scan (the
    * text never crosses the shuffle), then one full-outer shuffle join on
    * id — the minimal data movement a content diff admits. Bit-stable:
    * md5 hex equality only, no floats. */
  def snapshotDiff(oldDocs: DataFrame, newDocs: DataFrame,
                   idCol: String, textCol: String): DataFrame = {
    val o = oldDocs.select(col(idCol), md5(col(textCol)).as("old_hash"))
    val n = newDocs.select(col(idCol), md5(col(textCol)).as("new_hash"))
    o.join(n, Seq(idCol), "full_outer")
      .select(col(idCol), col("old_hash"), col("new_hash"),
        when(col("old_hash").isNull, lit("added"))
          .when(col("new_hash").isNull, lit("removed"))
          .when(col("old_hash") === col("new_hash"), lit("unchanged"))
          .otherwise(lit("changed")).as("status"))
  }

  def sourceQuality(gated: DataFrame, docsMeta: DataFrame, idCol: String,
                    sourceCol: String): DataFrame =
    gated.join(docsMeta.select(col(idCol), col(sourceCol)), Seq(idCol))
      .groupBy(col(sourceCol))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("keep").cast("long")).as("n_keep"),
        sum((!col("pass_length")).cast("long")).as("n_bad_length"),
        sum((!col("pass_stopwords")).cast("long")).as("n_low_stopword"),
        sum((!col("pass_repetition")).cast("long")).as("n_repetitive"),
        sum(col("contaminated").cast("long")).as("n_contaminated"),
        sum((!col("is_canonical")).cast("long")).as("n_exact_dups"))
      .withColumn("keep_rate", col("n_keep").cast("double") / col("n_docs"))
}
