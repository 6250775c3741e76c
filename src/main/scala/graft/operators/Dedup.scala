package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deduplication operators for large-scale text corpora: exact, MinHash+LSH
  * near-dup, and SimHash fingerprinting.
  *
  * These extend the reference's operator surface (its only dedup-adjacent op
  * is the duplicate-detection count, `bronze_validation.py:73-77`) with the
  * operations a training-data pipeline needs at 100 TB.
  *
  * Cross-engine determinism: every hash here is `md5` (identical lowercase
  * hex in Spark and DuckDB), so signatures, LSH buckets and candidate pairs
  * are exactly reproducible by the SQL oracle — no RNG, no JVM-specific
  * hashing in any oracled path.
  *
  * Scale design: everything is expressed as distributed joins/aggregations
  * over (doc_id, shingle) rows — no driver collects, no cartesian products.
  * LSH banding bounds the candidate-pair join to same-bucket pairs, so the
  * exact-Jaccard verification only touches plausible near-dups.
  */
object Dedup {

  /** Exact duplicate groups by full-text fingerprint: one row per distinct
    * content hash with its multiplicity and canonical (minimum) id.
    * hash-groupBy with map-side partial agg — the classic exact-dedup shape. */
  def exactGroups(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.groupBy(md5(col(textCol)).as("text_hash"))
      .agg(count(lit(1)).as("n_copies"), min(col(idCol)).as("canonical_id"))

  /** Exact dedup: keep one representative row per distinct text (the min-id
    * winner). Implemented as a window-free groupBy+join so it scales:
    * a self-semi-join on (hash, min_id) avoids a global sort. */
  def exactDedup(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val winners = exactGroups(docs, idCol, textCol)
      .select(col("text_hash"), col("canonical_id").as(idCol))
    docs.join(winners,
      docs(idCol) === winners(idCol) && md5(docs(textCol)) === winners("text_hash"),
      "left_semi")
  }

  /** Whitespace tokens of lowercased, trimmed text (split semantics chosen
    * to match DuckDB's string_split_regex exactly). */
  def tokens(textCol: Column): Column = split(trim(lower(textCol)), "\\s+")

  /** Raw (id, shingle) rows — sliding n-word shingles over the token stream,
    * WITH duplicates (a narrow map-side explode, no shuffle). Feed this to
    * duplicate-immune consumers (MinHash `min`); see [[shingleRows]] for the
    * set-semantics frame. */
  def shingleRowsRaw(docs: DataFrame, idCol: String, textCol: String, n: Int): DataFrame = {
    val idxs = (0 until n).map(j => s"__w[i + $j]").mkString(", ")
    docs
      .select(col(idCol), tokens(col(textCol)).as("__w"))
      .filter(size(col("__w")) >= n)
      .select(col(idCol),
        explode(expr(s"transform(sequence(0, size(__w) - $n), i -> concat_ws(' ', $idxs))"))
          .as("shingle"))
  }

  /** Distinct (id, shingle) rows: sliding n-word shingles over the token
    * stream. The exploded long-format is the scalable representation — all
    * downstream ops are joins/aggs on it. The `distinct` is a full shuffle
    * of the widest data in the dedup pipeline — only consumers that need SET
    * semantics (Jaccard sizes/intersections) should pay for it; signature
    * computation runs off [[shingleRowsRaw]]. */
  def shingleRows(docs: DataFrame, idCol: String, textCol: String, n: Int): DataFrame =
    shingleRowsRaw(docs, idCol, textCol, n).distinct()

  /** MinHash signature: k independent permutations approximated by minima
    * of 8-hex-char chunks of seeded md5s — hash i uses chunk i%4 of
    * md5(i/4 || ':' || shingle), so k hashes cost only ceil(k/4) md5
    * evaluations per shingle row (computed once in a pre-groupBy projection;
    * aggregate-side CSE is not guaranteed). Output: id + h0..h{k-1}.
    * One shuffle (groupBy id), k mins computed map-side. */
  def minhashSignatures(shingles: DataFrame, idCol: String, k: Int,
                        withSize: Boolean = false): DataFrame = {
    val nMd5 = (k + 3) / 4
    val withHash = shingles.select(
      col(idCol) +: (0 until nMd5).map(j =>
        md5(concat(lit(s"$j:"), col("shingle"))).as(s"__m$j")): _*)
    val aggs = (0 until k).map { i =>
      min(substring(col(s"__m${i / 4}"), (i % 4) * 8 + 1, 8)).as(s"h$i")
    } ++ (if (withSize) Seq(count(lit(1)).as("n")) else Nil)
    // withSize fuses the Jaccard set-size count into this same pass (one
    // aggregation instead of two over the widest frame) — only meaningful
    // when `shingles` is the DISTINCT frame; the mins themselves are
    // duplicate-immune either way.
    withHash.groupBy(col(idCol)).agg(aggs.head, aggs.tail: _*)
  }

  /** LSH banding: signature → (id, band, band_key) rows; docs sharing any
    * band key are candidate pairs. bands*rowsPerBand must equal the
    * signature width.
    *
    * Emitted as ONE explode over an array of (band, key) structs — a B-way
    * union would re-execute the whole signature subtree (scan + explode +
    * aggregate) once per band, which profiling showed dominated the
    * near-dup pipelines. */
  def lshBandRows(sig: DataFrame, idCol: String, bands: Int, rowsPerBand: Int): DataFrame =
    sig.select(col(idCol),
        explode(array((0 until bands).map { b =>
          val key = concat((0 until rowsPerBand).map(r => col(s"h${b * rowsPerBand + r}")): _*)
          struct(lit(b).as("band"), key.as("band_key"))
        }: _*)).as("__bk"))
      .select(col(idCol), col("__bk.band").as("band"), col("__bk.band_key").as("band_key"))

  /** Candidate near-dup pairs (a < b) from LSH buckets. The join key
    * (band, band_key) bounds the self-join to same-bucket pairs — this is
    * what keeps near-dedup sub-quadratic at corpus scale.
    *
    * `maxBucketSize` (0 = unlimited) drops buckets above the cap before the
    * self-join: an over-full bucket is non-discriminative (a hash region
    * where the corpus piles up) and would reintroduce the quadratic blowup
    * LSH exists to avoid — standard practice for skewed real-world corpora.
    * The cap is part of the operator's semantics, so oracles replicate it. */
  def lshCandidatePairs(bandRows: DataFrame, idCol: String,
                        maxBucketSize: Int = 0,
                        persistInput: Boolean = false): DataFrame = {
    // The band-row frame fans out below (bucket count, semi-join probe, and
    // both self-join sides). Every in-repo caller derives bandRows as a
    // NARROW explode over an already-persisted signature frame, so
    // re-deriving per consumer is cheaper than a fourth materialization
    // barrier — pass persistInput = true when feeding an expensive
    // unpersisted pipeline instead.
    val rows =
      if (persistInput)
        bandRows.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      else bandRows
    val bounded =
      if (maxBucketSize <= 0) rows
      else {
        val ok = rows.groupBy(col("band"), col("band_key"))
          .agg(count(lit(1)).as("__n"))
          .filter(col("__n") <= maxBucketSize)
          .select(col("band"), col("band_key"))
        rows.join(ok, Seq("band", "band_key"), "left_semi")
      }
    val x = bounded.select(col("band"), col("band_key"), col(idCol).as("doc_a"))
    val y = bounded.select(col("band"), col("band_key"), col(idCol).as("doc_b"))
    x.join(y, Seq("band", "band_key"))
      .filter(col("doc_a") < col("doc_b"))
      .select(col("doc_a"), col("doc_b"))
      .distinct()
  }

  /** Exact Jaccard similarity for given candidate pairs, computed from the
    * shingle rows: |A∩B| via a pair-shingle join, |A∪B| = |A|+|B|-|A∩B|.
    * Integer-count division → bit-stable doubles across engines.
    *
    * `minJaccard` > 0 prunes pairs BEFORE the expensive pair-shingle join
    * using the size bound J(A,B) ≤ min(|A|,|B|)/max(|A|,|B|): a pair whose
    * set sizes differ too much cannot reach the threshold, so on mixed-size
    * corpora most candidates die against two 1-column count frames instead
    * of expanding to |A| shingle rows each. Output is unchanged — pruned
    * pairs are exactly those the `jaccard >= minJaccard` filter would drop. */
  def jaccardForPairs(pairs: DataFrame, shingles: DataFrame, idCol: String,
                      minJaccard: Double = 0.0,
                      precomputedSizes: Option[DataFrame] = None): DataFrame = {
    val sizes = precomputedSizes.getOrElse(
      shingles.groupBy(col(idCol)).agg(count(lit(1)).as("n")))
    val withSizes = pairs
      .join(sizes.select(col(idCol).as("doc_a"), col("n").as("n_a")), "doc_a")
      .join(sizes.select(col(idCol).as("doc_b"), col("n").as("n_b")), "doc_b")
    val bounded =
      if (minJaccard <= 0.0) withSizes
      else withSizes.filter(
        least(col("n_a"), col("n_b")).cast("double") >=
          greatest(col("n_a"), col("n_b")) * minJaccard)
    val sa = shingles.select(col(idCol).as("doc_a"), col("shingle"))
    val sb = shingles.select(col(idCol).as("doc_b"), col("shingle"))
    bounded
      .join(sa, "doc_a")
      .join(sb, Seq("doc_b", "shingle"))
      .groupBy(col("doc_a"), col("doc_b"), col("n_a"), col("n_b"))
      .agg(count(lit(1)).as("n_inter"))
      .select(col("doc_a"), col("doc_b"),
        (col("n_inter").cast("double") / (col("n_a") + col("n_b") - col("n_inter")))
          .as("jaccard"))
  }

  /** Shingle-set containment for candidate pairs: C = |A∩B| / min(|A|,|B|)
    * — 1.0 when the smaller document's shingles all appear in the larger
    * (quotation, wrapper boilerplate, copy-with-additions), where Jaccard
    * would be diluted by the size difference. Same pair-shingle join shape
    * as [[jaccardForPairs]]; no size pre-prune exists for containment (a
    * tiny doc can be fully contained in a huge one), so the threshold is
    * applied after the intersection count. */
  def containmentForPairs(pairs: DataFrame, shingles: DataFrame, idCol: String,
                          precomputedSizes: Option[DataFrame] = None): DataFrame = {
    val sizes = precomputedSizes.getOrElse(
      shingles.groupBy(col(idCol)).agg(count(lit(1)).as("n")))
    val sa = shingles.select(col(idCol).as("doc_a"), col("shingle"))
    val sb = shingles.select(col(idCol).as("doc_b"), col("shingle"))
    pairs
      .join(sizes.select(col(idCol).as("doc_a"), col("n").as("n_a")), "doc_a")
      .join(sizes.select(col(idCol).as("doc_b"), col("n").as("n_b")), "doc_b")
      .join(sa, "doc_a")
      .join(sb, Seq("doc_b", "shingle"))
      .groupBy(col("doc_a"), col("doc_b"), col("n_a"), col("n_b"))
      .agg(count(lit(1)).as("n_inter"))
      .select(col("doc_a"), col("doc_b"), col("n_a"), col("n_b"), col("n_inter"),
        (col("n_inter").cast("double") / least(col("n_a"), col("n_b")))
          .as("containment"))
  }

  /** Containment near-dup pipeline: LSH candidates (as [[minhashNearDups]])
    * verified by exact shingle containment ≥ threshold. Candidate recall is
    * Jaccard-driven (MinHash bands collide on Jaccard, not containment), so
    * extreme size-ratio containments can be missed at banding level — the
    * standard trade; for strict containment search, band within
    * document-size strata so same-scale docs dominate each bucket. */
  def containmentNearDups(docs: DataFrame, idCol: String, textCol: String,
                          shingleN: Int = 3, k: Int = 8, bands: Int = 4,
                          threshold: Double = 0.5, maxBucketSize: Int = 0): DataFrame = {
    // input-proportional cached width — see minhashNearDups (r13)
    val p = Scale.inputPartitions(docs)
    val sh = shingleRows(docs, idCol, textCol, shingleN)
      .coalesce(p)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val sigN = minhashSignatures(sh, idCol, k, withSize = true)
      .coalesce(p)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val cand = lshCandidatePairs(lshBandRows(sigN, idCol, bands, k / bands), idCol,
      maxBucketSize)
    containmentForPairs(cand, sh, idCol,
      precomputedSizes = Some(sigN.select(col(idCol), col("n"))))
      .filter(col("containment") >= threshold)
  }

  /** Full MinHash+LSH near-dup pipeline: shingle → sign → band → candidate
    * pairs → exact-Jaccard filter. */
  def minhashNearDups(docs: DataFrame, idCol: String, textCol: String,
                      shingleN: Int = 3, k: Int = 8, bands: Int = 4,
                      threshold: Double = 0.1, maxBucketSize: Int = 0): DataFrame = {
    // The distinct shingle frame — the pipeline's one unavoidable full
    // shuffle of the widest data (Jaccard needs SET semantics) — is
    // computed once and persisted; signatures AND set sizes come out of a
    // single fused aggregation over it (mins are duplicate-immune, so the
    // distinct costs them nothing, and fusing saves a whole second pass).
    // The sig+size frame is persisted too: banding and the Jaccard size
    // join consume it on different keys, which ReusedExchange can't dedupe.
    // Both persist at input-proportional width (Scale.inputPartitions):
    // cached plans are AQE-coalesce-exempt, and the fan-out below rescans
    // them once per consumer stage (r13).
    val p = Scale.inputPartitions(docs)
    val sh = shingleRows(docs, idCol, textCol, shingleN)
      .coalesce(p)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val sigN = minhashSignatures(sh, idCol, k, withSize = true)
      .coalesce(p)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val cand = lshCandidatePairs(lshBandRows(sigN, idCol, bands, k / bands), idCol,
      maxBucketSize)
    jaccardForPairs(cand, sh, idCol, minJaccard = threshold,
      precomputedSizes = Some(sigN.select(col(idCol), col("n"))))
      .filter(col("jaccard") >= threshold)
  }

  /** 32-bit SimHash fingerprint from md5 token hashes, frequency-weighted
    * (repeated tokens vote repeatedly). Returned as a 32-char '0'/'1'
    * string so the SQL oracle can reproduce it without 64-bit signed
    * arithmetic pitfalls. Bit j comes from hex digit j/4, msb-first. */
  /** Per-doc bit votes __v0..__v31 + n_tokens (shared by the string and
    * integer fingerprint forms). */
  private def simhashVotes(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    // The first 8 hex chars of the md5 are decoded ONCE per token row into a
    // 32-bit integer (`conv` base 16→10); each bit vote is then two integer
    // ops on that long. The per-bit string form (instr+substr per bit — 32
    // string scans per row) computed identical values but dominated the
    // vote aggregation's CPU profile. Bit j (msb-first) = digit j/4's bit
    // (3 - j%4), i.e. plain bit (31-j) of the decoded value.
    val tokRows = docs
      .select(col(idCol), explode(tokens(col(textCol))).as("tok"))
      .withColumn("__hv", expr("cast(conv(substr(md5(tok), 1, 8), 16, 10) as bigint)"))
    val votes = (0 until 32).map { j =>
      sum(expr(s"2 * ((__hv div ${1L << (31 - j)}L) % 2) - 1")).as(s"__v$j")
    }
    tokRows.groupBy(col(idCol))
      .agg(votes.head, votes.tail :+ count(lit(1)).as("n_tokens"): _*)
  }

  def simhash32(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val fpBits = (0 until 32).map(j =>
      when(col(s"__v$j") > 0, lit("1")).otherwise(lit("0")))
    simhashVotes(docs, idCol, textCol)
      .select(col(idCol), concat(fpBits: _*).as("simhash32"), col("n_tokens"))
  }

  /** Integer form: bit j of [[simhash32]] at weight 2^(31-j) — enables
    * bit_count(xor) hamming instead of 32 per-pair substring compares. */
  def simhashInts(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val fp = (0 until 32).map(j =>
      when(col(s"__v$j") > 0, lit(1L << (31 - j))).otherwise(lit(0L)): Column)
      .reduce(_ + _)
    simhashVotes(docs, idCol, textCol).select(col(idCol), fp.as("f"))
  }

  /** Hamming distance between two equal-length bit strings (as produced by
    * [[simhash32]]) — a codegen'd expression chain, no UDF. */
  def hammingBits(a: Column, b: Column, width: Int): Column =
    (0 until width).map(i =>
      when(substring(a, i + 1, 1) =!= substring(b, i + 1, 1), 1).otherwise(0): Column)
      .reduce(_ + _)

  /** Connected components over an undirected edge list (integral vertex
    * ids) by iterative min-label propagation: label(v) ← min(label(v),
    * min label among neighbors), to fixpoint. Output: (id, component)
    * where component is the
    * minimum member id — i.e. the canonical document of each near-dup
    * cluster, the assignment stage that follows pair generation in a real
    * dedup pipeline (keep one doc per component, or split train/eval by
    * component so near-dups never straddle the boundary).
    *
    * Scale notes: each iteration is one join + one groupBy on (v, label)
    * rows. Plain min-label propagation converges in graph-diameter rounds;
    * with `pointerDoubling` (default on) each round ALSO composes the label
    * mapping with itself (label(v) ← label(label(v)) — pointer jumping, the
    * DataFrame form of large-star hooking from Kiveris et al., "Connected
    * Components in MapReduce and Beyond", SoCC'14), so the covered radius
    * roughly doubles per round and an adversarial million-hop chain
    * converges in ~log₂(diameter) rounds instead of diameter rounds
    * (asserted in DedupPropertySpec; demonstrated at 10⁶ edges in
    * tools/Stress). Per-iteration frames are localCheckpoint'd and the only
    * driver value is the scalar convergence count. Labels only ever
    * decrease and the convergence check (a propagate round that moves no
    * label) is exact, so doubling never changes the fixpoint — it only
    * arrives there sooner.
    *
    * Edge lists at or under `driverThreshold` (default 200k pairs ≈ 3 MB)
    * short-circuit to an exact driver-side union-find: an iterative
    * distributed loop on a graph that small is pure scheduling overhead.
    * The threshold bounds driver memory explicitly; the distributed path
    * is the default above it. */
  def connectedComponents(edges: DataFrame, aCol: String, bCol: String,
                          maxIter: Int = 30,
                          driverThreshold: Int = 200000,
                          pointerDoubling: Boolean = true): DataFrame =
    connectedComponentsRounds(edges, aCol, bCol, maxIter, driverThreshold,
      pointerDoubling)._1

  /** [[connectedComponents]] plus the number of distributed rounds taken
    * (0 on the driver fast path) — the observable DedupPropertySpec uses to
    * pin the O(log diameter) claim. */
  private[graft] def connectedComponentsRounds(
      edges: DataFrame, aCol: String, bCol: String,
      maxIter: Int = 30, driverThreshold: Int = 200000,
      pointerDoubling: Boolean = true): (DataFrame, Int) = {
    val spark = edges.sparkSession
    val pairs = edges.select(col(aCol).cast("long").as("src"),
        col(bCol).cast("long").as("dst"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // Bounded fast-path probe (the bpeLoop recipe): collect at most
    // threshold+1 rows — never a full count job over a large edge list.
    // When the probe fits, the collected rows ARE the whole edge set, so
    // the fast path pays one bounded job total.
    val probe = pairs.limit(driverThreshold + 1).collect()
    if (probe.length <= driverThreshold) {
      val es = probe.map(r => (r.getLong(0), r.getLong(1)))
      pairs.unpersist()
      val parent = scala.collection.mutable.Map[Long, Long]()
      // Iterative find with path halving — a recursive find would recurse
      // once per parent-chain hop and can overflow the JVM stack on
      // adversarial chain graphs (200k-edge path ⇒ chains deep enough to
      // blow a default 512k stack before compression kicks in).
      def find(x0: Long): Long = {
        var x = x0
        var p = parent.getOrElseUpdate(x, x)
        while (p != x) {
          val gp = parent.getOrElseUpdate(p, p)
          parent(x) = gp // path halving: point x at its grandparent
          x = gp
          p = parent.getOrElseUpdate(x, x)
        }
        x
      }
      es.foreach { case (a, b) =>
        val (ra, rb) = (find(a), find(b))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      val rows = parent.keys.toSeq.sorted.map(v =>
        org.apache.spark.sql.Row(v, find(v)))
      val schema = org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("id", org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("component", org.apache.spark.sql.types.LongType)))
      return (spark.createDataFrame(
        spark.sparkContext.parallelize(rows, 1), schema), 0)
    }
    val sym = pairs
      .unionByName(pairs.select(col("dst").as("src"), col("src").as("dst")))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // localCheckpoint (not persist) between iterations: caching keeps the
    // DATA hot but the logical plan would still double every round, and
    // Catalyst re-analysis of the compounding plan ends up dominating the
    // loop — checkpointing truncates lineage to a materialized RDD.
    var labels = sym.select(col("src").as("v")).distinct()
      .select(col("v"), col("v").as("label"))
      .localCheckpoint()
    var converged = false
    var iter = 0
    while (!converged && iter < maxIter) {
      // One aggregation carries BOTH the propagation and the convergence
      // signal: the self row brings the previous label along as __old
      // (neighbor rows carry null, so max(__old) recovers it), and the
      // checkpoint materialization plus one cheap count report whether any
      // label still moved — no per-iteration join against the old frame.
      val self = labels.select(col("v"), col("label"),
        col("label").as("__old"))
      val viaNeighbor = sym
        .join(labels.select(col("v").as("dst"), col("label")), "dst")
        .select(col("src").as("v"), col("label"),
          lit(null).cast("long").as("__old"))
      val next = self.unionByName(viaNeighbor)
        .groupBy(col("v"))
        .agg(min(col("label")).as("label"), max(col("__old")).as("__old"))
        .localCheckpoint()
      val changed = next.filter(col("label") < col("__old")).limit(1).count()
      val propagated = next.select(col("v"), col("label"))
      // Pointer jumping: label(v) ← label(label(v)). Every label value is
      // itself a vertex id present in the frame (labels start as v→v and
      // only ever take other vertices' ids via min), so the self-join is
      // total; the left join + coalesce is belt-and-braces. Labels stay
      // monotone non-increasing (label(x) ≤ x always), so this composes
      // with the propagate step's exact convergence test: once a propagate
      // round moves nothing, the labeling is per-component constant and
      // doubling is the identity.
      labels =
        if (pointerDoubling && !converged && changed > 0L)
          propagated
            .join(propagated.select(col("v").as("__pv"), col("label").as("__pl")),
              col("label") === col("__pv"), "left")
            .select(col("v"), coalesce(col("__pl"), col("label")).as("label"))
            .localCheckpoint()
        else propagated
      converged = changed == 0L
      iter += 1
    }
    sym.unpersist()
    pairs.unpersist()
    // a silently-unconverged labeling would split components undetectably —
    // refuse rather than return wrong clusters
    if (!converged) throw new IllegalStateException(
      s"connectedComponents did not converge within maxIter=$maxIter " +
        "(graph diameter exceeds the bound; raise maxIter)")
    (labels.select(col("v").as("id"), col("label").as("component")), iter)
  }

  /** The full corpus-dedup composition a training pipeline runs end to end:
    * exact dedup (min-id survivor per identical text), then MinHash+LSH
    * near-dup pairs over the survivors, clustered by
    * [[connectedComponents]]; each cluster keeps only its canonical
    * (min-id) member. Returns the deduplicated corpus rows. */
  def dedupCorpus(docs: DataFrame, idCol: String, textCol: String,
                  shingleN: Int = 3, k: Int = 8, bands: Int = 4,
                  threshold: Double = 0.1, maxBucketSize: Int = 0): DataFrame = {
    val exact = exactDedup(docs, idCol, textCol)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val pairs = minhashNearDups(exact, idCol, textCol, shingleN, k, bands,
      threshold, maxBucketSize)
    val losers = connectedComponents(pairs, "doc_a", "doc_b")
      .filter(col("id") =!= col("component"))
      .select(col("id").as(idCol))
    exact.join(losers, Seq(idCol), "left_anti")
  }

  /** Quality-aware survivor selection — "keep the BEST, not the first":
    * per near-dup cluster, the surviving document is the argmax of a
    * quality column (longest text, highest LM score, …) with min-id as the
    * deterministic tie-break, instead of [[dedupCorpus]]'s min-id-always
    * rule. This is what production curation actually does: inside a
    * duplicate cluster the members differ (truncations, boilerplate-laden
    * re-renders), and keeping the highest-quality copy measurably beats
    * keeping an arbitrary one.
    *
    * Input `clusters` is [[connectedComponents]] output (id, component);
    * docs absent from any pair are singleton clusters of themselves.
    * Output: every doc with its component, the cluster's survivor_id, and
    * a kept flag.
    *
    * Scale: one left join of the corpus against the (small — only docs in
    * some pair) cluster frame, one rank-1 window per component (plans as
    * WindowGroupLimit: per-partition top-1 heaps, never a full per-group
    * sort), one broadcast-size join back on component. */
  def bestSurvivors(docs: DataFrame, idCol: String, qualityCol: String,
                    clusters: DataFrame): DataFrame = {
    val member = docs
      .join(clusters.withColumnRenamed("id", idCol), Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("component"), col(idCol)).as("component"),
        col(qualityCol))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("component"))
      .orderBy(col(qualityCol).desc, col(idCol))
    val survivors = member
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .select(col("component"), col(idCol).as("survivor_id"))
    member.join(survivors, Seq("component"))
      .select(col(idCol), col("component"), col("survivor_id"),
        (col(idCol) === col("survivor_id")).as("kept"))
  }

  /** Prefix-duplicate groups: documents sharing their first `k` tokens —
    * the truncated-copy pattern (wire copy with a different tail, page
    * re-render cut at a different length) that whole-document hashing
    * misses and shingle Jaccard dilutes. One narrow map (md5 of the
    * k-token prefix) + one hash aggregate; emits only groups with ≥ 2
    * members, canonical = smallest id. */
  def prefixDupGroups(docs: DataFrame, idCol: String, textCol: String,
                      k: Int): DataFrame = {
    require(k > 0, s"k must be > 0: $k")
    docs
      .select(col(idCol),
        md5(concat_ws(" ", slice(tokens(col(textCol)), 1, k))).as("prefix_hash"))
      .groupBy(col("prefix_hash"))
      .agg(count(lit(1)).as("n_docs"), min(col(idCol)).as("canonical_id"))
      .filter(col("n_docs") >= 2)
  }

  /** Incremental (batch-vs-corpus) dedup — the production mode: a new
    * crawl batch is checked against the already-curated corpus, and only
    * batch docs matter in the output. exact_dup = the batch text exists
    * verbatim in the corpus (md5 match); near_dup = some corpus doc is a
    * MinHash near-duplicate at `threshold` (the [[minhashNearDups]]
    * pipeline over corpus ∪ batch, restricted to cross pairs);
    * keep = neither. Ids must be disjoint across the two frames (the
    * normal contract for an append-only corpus with monotone ids).
    *
    * Scale: the exact probe is a semi join on a 1-column hash frame; the
    * near path is the standard banded pipeline (sub-quadratic, capped
    * buckets) whose pair output is tiny and persisted for the two
    * side-restriction probes. Within-batch duplicates are deliberately NOT
    * flagged here — run [[dedupCorpus]] on the batch for that. */
  def incrementalDedup(batch: DataFrame, corpus: DataFrame, idCol: String,
                       textCol: String, shingleN: Int = 3, k: Int = 8,
                       bands: Int = 4, threshold: Double = 0.1,
                       maxBucketSize: Int = 0): DataFrame = {
    val all = corpus.select(col(idCol), col(textCol))
      .unionByName(batch.select(col(idCol), col(textCol)))
    // no .distinct() on the corpus hash frame: the semi join dedups by
    // construction and the distinct was a full corpus-sized exchange+agg
    // per call (r13 optimization, value-identical)
    val exactHit = batch
      .join(corpus.select(md5(col(textCol)).as("__h")),
        md5(batch(textCol)) === col("__h"), "left_semi")
      .select(col(idCol))
    val pairs = minhashNearDups(all, idCol, textCol, shingleN, k, bands,
        threshold, maxBucketSize)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val nearHit = pairs
      .join(corpus.select(col(idCol).as("doc_a")), Seq("doc_a"), "left_semi")
      .select(col("doc_b").as(idCol))
      .unionByName(pairs
        .join(corpus.select(col(idCol).as("doc_b")), Seq("doc_b"), "left_semi")
        .select(col("doc_a").as(idCol)))
      .join(batch.select(col(idCol)), Seq(idCol), "left_semi")
      .distinct()
    batch.select(col(idCol))
      .join(exactHit.withColumn("__e", lit(true)), Seq(idCol), "left")
      .join(nearHit.withColumn("__n", lit(true)), Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("__e"), lit(false)).as("exact_dup"),
        coalesce(col("__n"), lit(false)).as("near_dup"))
      .withColumn("keep", !col("exact_dup") && !col("near_dup"))
  }

  /** SimHash near-dup pairs: band the 32-bit fingerprint into `bands`
    * sub-strings, candidate = any shared band, verify by full hamming ≤
    * `maxHamming`. Same sub-quadratic LSH shape as MinHash banding —
    * hamming-close fingerprints agree on at least one band w.h.p. */
  def simhashNearDups(docs: DataFrame, idCol: String, textCol: String,
                      bands: Int = 4, maxHamming: Int = 6,
                      maxBucketSize: Int = 100): DataFrame = {
    // The fingerprint agg feeds bands+2 consumers (each band branch and both
    // pair sides) on different keys — persist or the 32-vote aggregation
    // over the token explode re-runs for every consumer.
    val fp = simhashInts(docs, idCol, textCol)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val bitsPerBand = 32 / bands
    // single-explode banding — see lshBandRows for why not a B-way union
    val bandRows = fp.select(col(idCol),
        explode(array((0 until bands).map { b =>
          val divisor = 1L << (bitsPerBand * (bands - 1 - b))
          struct(lit(b).as("band"),
            expr(s"(f div ${divisor}L) % ${1L << bitsPerBand}L").as("band_key"))
        }: _*)).as("__bk"))
      .select(col(idCol), col("__bk.band").as("band"), col("__bk.band_key").as("band_key"))
    val cand = lshCandidatePairs(bandRows, idCol, maxBucketSize)
    val fa = fp.select(col(idCol).as("doc_a"), col("f").as("__fa"))
    val fb = fp.select(col(idCol).as("doc_b"), col("f").as("__fb"))
    cand.join(fa, "doc_a").join(fb, "doc_b")
      .withColumn("hamming", expr("CAST(bit_count(__fa ^ __fb) AS INT)"))
      .filter(col("hamming") <= maxHamming)
      .select(col("doc_a"), col("doc_b"), col("hamming"))
  }

  /** SUBSTRING-level cross-corpus dedup (the RefinedWeb/SlimPajama method
    * document-level dedup misses): every n-token shingle occurring in at
    * least `minDocs` DISTINCT documents marks its token span, and
    * overlapping-or-adjacent marks merge into maximal spans. Returns one
    * row per merged span: (id, span_start, span_end, span_tokens) with
    * 0-based token indices, [start, end).
    *
    * Scale shape: the positioned shingle explode is map-only; the
    * common-shingle count is one distinct + one hash-aggregate keyed by
    * shingle (the same key-distribution the MinHash pipeline already
    * shuffles on); the island merge is a per-document window — partitioned
    * by id, so 10^9 documents parallelize and no window ever sees more
    * rows than one document's shingle count. Suffix-array exactness is not
    * attempted: fixed-n shingle marking is the standard large-scale
    * approximation (any duplicated run of >= n tokens is caught, shorter
    * ones are not). */
  /** (id, pos, shingle) rows — [[shingleRowsRaw]] keeping the 0-based
    * token position of each n-gram's first token (map-only explode). */
  def shingleRowsPos(docs: DataFrame, idCol: String, textCol: String,
                     n: Int): DataFrame = {
    val idxs = (0 until n).map(j => s"__w[i + $j]").mkString(", ")
    docs
      .select(col(idCol), tokens(col(textCol)).as("__w"))
      .filter(size(col("__w")) >= n)
      .select(col(idCol),
        posexplode(expr(s"transform(sequence(0, size(__w) - $n), i -> concat_ws(' ', $idxs))")))
      .select(col(idCol), col("pos").cast("long").as("pos"), col("col").as("shingle"))
  }

  /** Merge marked n-gram start positions into maximal spans per document —
    * gaps-and-islands over a per-id window: a mark extends the current
    * span when its start sits inside-or-adjacent to it (pos − prev <= n).
    * Input: (id, pos); output: (id, span_start, span_end, span_tokens),
    * [start, end) in token indices. Windows are partitioned by id, so no
    * window ever sees more rows than one document's marks. */
  private def mergeMarks(hits: DataFrame, idCol: String, n: Int): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col(idCol)).orderBy(col("pos"))
    hits
      .withColumn("__new", when(col("pos") - lag(col("pos"), 1).over(w) > n, 1L).otherwise(0L))
      .withColumn("__island", sum(col("__new")).over(w))
      .groupBy(col(idCol), col("__island"))
      .agg(min(col("pos")).as("span_start"), (max(col("pos")) + n).as("span_end"))
      .withColumn("span_tokens", col("span_end") - col("span_start"))
      .select(col(idCol), col("span_start"), col("span_end"), col("span_tokens"))
  }

  def duplicateSpans(docs: DataFrame, idCol: String, textCol: String,
                     n: Int, minDocs: Int): DataFrame = {
    require(n >= 2, s"span shingles need n >= 2, got $n")
    require(minDocs >= 2, s"minDocs >= 2 (a span duplicated nowhere is not a dup), got $minDocs")
    val pos = shingleRowsPos(docs, idCol, textCol, n)
    val common = pos.select(col("shingle"), col(idCol)).distinct()
      .groupBy(col("shingle")).agg(count(lit(1)).as("__nd"))
      .filter(col("__nd") >= minDocs)
      .select(col("shingle"))
    mergeMarks(pos.join(common, "shingle").select(col(idCol), col("pos")), idCol, n)
  }

  /** SPAN-level benchmark decontamination (the PaLM/GPT-3 13-gram method):
    * mark every n-gram of `docs` that also occurs ANYWHERE in the
    * benchmark corpus, merge marks into maximal spans, and report each
    * document's contaminated-token ratio. Unlike q42's doc-level
    * contamination (any shared shingle taints the whole doc), this
    * scores HOW MUCH of the document is benchmark text — the number
    * train-set decontamination thresholds on.
    *
    * Output: (id, n_tokens, contaminated_tokens, contamination_ratio
    * rounded to 6dp), one row per input document (0 / 0.0 when clean).
    * Scale shape: benchmark shingle set is distinct-deduped and joined by
    * shingle key (benchmarks are tiny next to the corpus — stats/AQE
    * broadcast it); everything else is the [[duplicateSpans]] machinery. */
  def contaminationSpans(docs: DataFrame, idCol: String, textCol: String,
                         bench: DataFrame, benchTextCol: String,
                         n: Int): DataFrame = {
    require(n >= 2, s"span shingles need n >= 2, got $n")
    val idxs = (0 until n).map(j => s"__w[i + $j]").mkString(", ")
    val benchSh = bench
      .select(tokens(col(benchTextCol)).as("__w"))
      .filter(size(col("__w")) >= n)
      .select(explode(expr(s"transform(sequence(0, size(__w) - $n), i -> concat_ws(' ', $idxs))"))
        .as("shingle"))
      .distinct()
    val pos = shingleRowsPos(docs, idCol, textCol, n)
    val spans = mergeMarks(
      pos.join(benchSh, "shingle").select(col(idCol), col("pos")), idCol, n)
    val perDoc = spans.groupBy(col(idCol))
      .agg(sum(col("span_tokens")).as("contaminated_tokens"))
    docs
      .select(col(idCol), size(tokens(col(textCol))).cast("long").as("n_tokens"))
      .join(perDoc, Seq(idCol), "left")
      .withColumn("contaminated_tokens", coalesce(col("contaminated_tokens"), lit(0L)))
      .withColumn("contamination_ratio",
        round(col("contaminated_tokens").cast("double") / col("n_tokens"), 6))
      .select(col(idCol), col("n_tokens"), col("contaminated_tokens"),
        col("contamination_ratio"))
  }

  /** Apply [[duplicateSpans]]: rebuild each document's text with the
    * duplicated spans' tokens removed (tokens outside any span, rejoined
    * with single spaces — the same normalized token stream every dedup
    * operator here works over). Documents without spans pass through with
    * their normalized text. */
  def scrubSpans(docs: DataFrame, idCol: String, textCol: String,
                 spans: DataFrame): DataFrame = {
    val agg = spans.groupBy(col(idCol))
      .agg(collect_list(struct(col("span_start"), col("span_end"))).as("__spans"))
    docs
      .select(col(idCol), tokens(col(textCol)).as("__w"))
      .join(agg, Seq(idCol), "left")
      .select(col(idCol),
        expr("""concat_ws(' ', filter(__w, (t, i) ->
                 __spans IS NULL OR NOT exists(__spans,
                   s -> i >= s.span_start AND i < s.span_end)))""")
          .as("scrubbed_text"))
  }
}
