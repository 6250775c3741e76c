package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.{Dedup, Similarity, TextAnalysis}
import graft.sources.Tables

/** Scale-stress smoke: inflate the sf0.1 corpus ~40× in memory (unique-ish
  * variants, so dedup structures stay realistic) and run the heavy
  * operators, watching for runtime cliffs (quadratic candidate blowups,
  * driver collects, uncapped buckets). Dev tool, not part of the library. */
object Stress {
  def t[A](name: String)(f: => A): A = {
    val t0 = System.nanoTime(); val r = f
    println(f"[stress] $name%-32s ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
  }
  /** Section selection: no args runs everything; otherwise name sections
    * (dedup, cc, ccprobe, ann, ivf2, vindex, ops, skew, hotbucket, bpe, stream;
    * ccprobe10 is opt-in only — it needs a derived sf10 dir, see
    * SPARK_GRAFT_SF10_DIR). The
    * 200k dedup block alone is ~an hour of real compute (4M+ true near-dup
    * pairs by construction), so targeted runs matter. */
  def main(args: Array[String]): Unit = {
    val sections =
      if (args.isEmpty)
        Set("dedup", "cc", "ccprobe", "ann", "ivf2", "vindex", "retrain", "residual", "dix", "lex", "fvs", "ops", "skew", "hotbucket", "bpe", "stream")
      else args.map(_.toLowerCase).toSet
    def want(s: String): Boolean = sections(s)
    // stress sections that persist indexes (dix/lex/vindex) allocate work
    // dirs via createTempDirectory — route them to tmpfs like Bench/Verify
    // do, or they time this box's stalling virtio disk, not the operator
    graft.Bench.routeTmpdir()
    val b = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "64")
      // single-file testdata needs small splits for scan parallelism — see
      // the matching Bench config for the full rationale
      .config("spark.sql.files.maxPartitionBytes", "4m")
      .config("spark.ui.enabled", "false")
    // tmpfs scratch with disk fallback — without it the stress shuffles GBs
    // through this box's stalling virtio disk and times the disk, not the
    // operators (see Bench.scratchDir)
    graft.Bench.scratchDir().foreach(b.config("spark.local.dir", _))
    val spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val d = "/root/testdata/sf0.1"

    // 5k docs -> 200k docs: 40 variants each; variant v prepends a token
    // so near-dup structure survives (v=0 keeps the original text).
    val docs = Tables.documents(spark, d)
      .crossJoin(spark.range(40).toDF("v"))
      .select(
        (col("doc_id") * 40 + col("v")).as("doc_id"),
        when(col("v") === 0, col("text"))
          .otherwise(concat(lit("variant"), col("v"), lit(" "), col("text"))).as("text"))
    if (want("dedup") || want("ops")) {
      val nDocs = t("docs materialize (200k)") { docs.count() }
      println(s"[stress] n_docs=$nDocs")
    }

    if (want("dedup")) {
    t("exact dedup 200k") {
      Dedup.exactDedup(docs, "doc_id", "text").count()
    }
    val nd = t("minhash near-dup 200k") {
      Dedup.minhashNearDups(docs, "doc_id", "text", 3, 8, 4, 0.1, 100).count()
    }
    println(s"[stress] minhash pairs=$nd")
    val sd = t("simhash near-dup 200k") {
      Dedup.simhashNearDups(docs, "doc_id", "text", 4, 6, 100).count()
    }
    println(s"[stress] simhash pairs=$sd")
    t("tfidf top5 200k") {
      TextAnalysis.tfidf(docs, "doc_id", "text").count()
    }
    // 4M+ near-dup edges -> exceeds the driver union-find threshold, so
    // this exercises the DISTRIBUTED component loop at volume
    val kept = t("dedupCorpus 200k (distributed CC)") {
      Dedup.dedupCorpus(docs, "doc_id", "text", 3, 8, 4, 0.1, 100).count()
    }
    println(s"[stress] survivors=$kept")
    }

    if (want("cc")) {
    // Adversarial connected components: a 10^6-edge PATH graph (diameter
    // 10^6 — the worst case for min-label propagation; real near-dup
    // graphs are orders of magnitude shallower). Pointer doubling must
    // bring the distributed loop home in ~log2(10^6) ≈ 20 rounds.
    val (chainCC, chainRounds) = t("connectedComponents 1e6-edge chain") {
      val chain = spark.range(1, 1000001)
        .select(col("id").as("doc_a"), (col("id") - 1).as("doc_b"))
      val (cc, rounds) = Dedup.connectedComponentsRounds(
        chain, "doc_a", "doc_b", maxIter = 30, driverThreshold = 0)
      (cc.agg(countDistinct(col("component"))).head().getLong(0), rounds)
    }
    println(s"[stress] chain components=$chainCC rounds=$chainRounds")
    }

    // 2k vectors -> 80k vectors: tiny deterministic per-variant perturbation
    // in fixed-point space keeps near-neighbor structure.
    val emb = Tables.embeddings(spark, d)
      .crossJoin(spark.range(40).toDF("v"))
      .select(
        (col("vec_id") * 40 + col("v")).as("vec_id"),
        expr("transform(embedding, (x, i) -> CAST(x + (CAST(v AS DOUBLE) - 20.0D) * 0.0005D * (CAST(i % 7 AS DOUBLE) - 3.0D) AS FLOAT))")
          .as("embedding"))
    if (want("ann") || want("ivf2") || want("ops")) {
      val nVec = t("embeddings materialize (80k)") { emb.count() }
      println(s"[stress] n_vectors=$nVec")
    }

    if (want("ann")) {
    // THE production-path decision table (VERDICT r5 #4): every top-k path
    // timed on the SAME 2k-query / 80k-corpus workload, with recall scored
    // on a 200-query subset against exact ground truth. Run `ann` and read
    // the [stress] ann-table lines.
    val pred2k = col("vec_id") % 40 === 0
    val predSub = col("vec_id") % 400 === 0
    def pairsOf(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
      df.select(col("query_id"), col("neighbor_id")).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    val gtSub = t("ann-table ground truth (200 queries)") {
      pairsOf(Similarity.bruteForceTopK(emb, "vec_id", "embedding", predSub, k = 10))
    }
    def recallOf(sub: Set[(Long, Long)]): Double =
      sub.intersect(gtSub).size.toDouble / gtSub.size
    final case class Row(name: String, sec: Double, recall: Double)
    def timed(name: String)(full: => org.apache.spark.sql.DataFrame)
             (sub: => org.apache.spark.sql.DataFrame): Row = {
      val t0 = System.nanoTime()
      val n = full.count()
      val sec = (System.nanoTime() - t0) / 1e9
      val r = recallOf(pairsOf(sub))
      println(f"[stress] ann-table $name%-38s ${sec}%7.2f s  rows=$n%7d  recall=$r%.3f")
      Row(name, sec, r)
    }
    val rBrute = timed("brute force (exact)") {
      Similarity.bruteForceTopK(emb, "vec_id", "embedding", pred2k, k = 10)
    } { Similarity.bruteForceTopK(emb, "vec_id", "embedding", predSub, k = 10) }
    val rAnn = timed("annTopK LSH 16-bit bands r=2") {
      Similarity.annTopK(emb, "vec_id", "embedding", pred2k, k = 10,
        planes = 128, dim = 64, bands = 8, probeRadius = 2)
    } { Similarity.annTopK(emb, "vec_id", "embedding", predSub, k = 10,
        planes = 128, dim = 64, bands = 8, probeRadius = 2) }
    val rIvf = timed("ivfTopK 283 cells / 16 probes") {
      Similarity.ivfTopK(emb, "vec_id", "embedding", pred2k, k = 10,
        nCells = 283, nProbe = 16)
    } { Similarity.ivfTopK(emb, "vec_id", "embedding", predSub, k = 10,
        nCells = 283, nProbe = 16) }
    val rIvfT = timed("ivfTopK trained (2 Lloyd iters)") {
      Similarity.ivfTopK(emb, "vec_id", "embedding", pred2k, k = 10,
        nCells = 283, nProbe = 16, trainIters = 2)
    } { Similarity.ivfTopK(emb, "vec_id", "embedding", predSub, k = 10,
        nCells = 283, nProbe = 16, trainIters = 2) }
    // PQ rows of the decision table: full-corpus ADC (compressed scan) and
    // the IVF-PQ composition. Reported, not gated — PQ trades recall for a
    // 96-bit/vector index; the numbers document the trade at this scale.
    val rPq = timed("pqAdcTopK m=16 ks=64 (96-bit ADC)") {
      Similarity.pqAdcTopK(emb, "vec_id", "embedding", pred2k, k = 10,
        m = 16, ks = 64, trainIters = 1)
    } { Similarity.pqAdcTopK(emb, "vec_id", "embedding", predSub, k = 10,
        m = 16, ks = 64, trainIters = 1) }
    val rIvfPq = timed("ivfPqTopK 283 cells/16 probes + ADC") {
      Similarity.ivfPqTopK(emb, "vec_id", "embedding", pred2k, k = 10,
        nCells = 283, nProbe = 16, m = 16, ks = 64, trainIters = 1)
    } { Similarity.ivfPqTopK(emb, "vec_id", "embedding", predSub, k = 10,
        nCells = 283, nProbe = 16, m = 16, ks = 64, trainIters = 1) }
    println(f"[stress] ann-table pq: adc=${rPq.sec}%.1f s recall=${rPq.recall}%.3f " +
      f"ivfpq=${rIvfPq.sec}%.1f s recall=${rIvfPq.recall}%.3f " +
      f"(brute ${rBrute.sec}%.1f s)")
    // Gate: a production path must reach recall >= 0.9 without costing
    // more wall than the full scan. The old ">= 5x wall speedup" form
    // predated refinedTopK — back then ranking (a fan-out sort) dominated
    // every path equally, so candidate reduction showed up 1:1 in wall.
    // With ranking fixed, scoring is what remains, and at cache-resident
    // 80k×64f the memory-traffic advantage compresses; the scale metric
    // is the candidate fraction (nProbe/nCells ≈ 5.7% here), reported
    // alongside wall so the table stays honest at this SF.
    val best = Seq(rIvf, rIvfT).filter(_.recall >= 0.9).minByOption(_.sec)
      .getOrElse(sys.error(
        f"no IVF path reached recall 0.9: ivf=${rIvf.recall}%.3f " +
        f"trained=${rIvfT.recall}%.3f (brute=${rBrute.sec}%.1f s)"))
    println(f"[stress] ann-table verdict: recommended=${best.name} " +
      f"wall=${best.sec}%.1f s vs brute ${rBrute.sec}%.1f s " +
      f"(${rBrute.sec / best.sec}%.1fx), candidates=${16.0 / 283 * 100}%.1f%% " +
      f"recall=${best.recall}%.3f (lsh ${rAnn.sec}%.1f s recall=${rAnn.recall}%.3f)")
    // With refinedTopK everywhere, the refined FULL SCAN is legitimately
    // the fastest path at this cache-resident SF (scoring 160M pairs is
    // ~2 s; index paths pay fixed training/probing overhead) — the probing
    // paths' 17×-fewer candidates pay off only once the corpus outgrows
    // cache. So the gate is a sanity band, not a supremacy claim: recall
    // >= 0.9 and wall within 3× of the table's best + 5 s fixed overhead.
    val floor = Seq(rBrute, rAnn, rIvf, rIvfT, rPq, rIvfPq).map(_.sec).min
    require(best.recall >= 0.9 && best.sec <= floor * 3 + 5.0,
      f"recommended IVF path out of the sanity band: ${best.sec}%.1f s vs " +
      f"table floor ${floor}%.1f s @ recall ${best.recall}%.3f")
    }

    if (want("ivf2")) {
    // Hierarchical IVF recall curve at 80k, equal probed-vector budget vs
    // flat: flat 16/283 cells ≈ N*16/283 ≈ 4.5k probed vectors per query;
    // hier 17×34=578 leaves probing 32 ≈ N*32/578 ≈ 4.4k. Ground truth =
    // brute force on a 200-query subset.
    val subPred = col("vec_id") % 400 === 0
    def recallPairs(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
      df.select(col("query_id"), col("neighbor_id")).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    val bruteSub = t("brute-force ground truth (200 queries x 80k)") {
      recallPairs(Similarity.bruteForceTopK(emb, "vec_id", "embedding", subPred, k = 10))
    }
    // tight budget (~N/70 probed per query) — at N/18 both variants
    // saturate at recall 1.0 on this corpus's planted variants and the
    // curve stops discriminating
    val flatSub = t("flat IVF 283 cells / 4 probes (budget N/71)") {
      recallPairs(Similarity.ivfTopK(emb, "vec_id", "embedding", subPred,
        k = 10, nCells = 283, nProbe = 4))
    }
    val hierSub = t("hier IVF 17x34 leaves / 8 probes (equal budget)") {
      recallPairs(Similarity.ivfTopK2(emb, "vec_id", "embedding", subPred,
        k = 10, nCellsL1 = 17, nCellsL2 = 34, nProbeL1 = 5, nProbeL2 = 8))
    }
    val hierTSub = t("hier IVF trained t1=1,t2=2 (equal budget)") {
      recallPairs(Similarity.ivfTopK2(emb, "vec_id", "embedding", subPred,
        k = 10, nCellsL1 = 17, nCellsL2 = 34, nProbeL1 = 5, nProbeL2 = 8,
        trainIters = 1, trainItersL2 = 2))
    }
    val rFlat = flatSub.intersect(bruteSub).size.toDouble / bruteSub.size
    val rHier = hierSub.intersect(bruteSub).size.toDouble / bruteSub.size
    val rHierT = hierTSub.intersect(bruteSub).size.toDouble / bruteSub.size
    println(f"[stress] IVF recall @ equal budget: flat=$rFlat%.3f hier=$rHier%.3f hierTrained=$rHierT%.3f")
    }

    if (want("vindex")) {
    // Index lifecycle at 80k vectors: build once, persist, reload, serve.
    // Measures what the persisted index buys at scale: the on-disk codes
    // frame vs the raw embedding parquet (the ~dim·4/M compression that
    // makes a billion-vector index storable), and the reload+serve wall
    // for a 2k-query batch and a 100-query "micro-batch" (the foreachBatch
    // unit of the streaming serve — streaming ≡ batch equivalence itself
    // is pinned in VectorIndexSpec).
    val vdir = graft.Scratch.tempDir("graft-vix-stress")
    val ix = t("vindex build 80k (283 cells, m=16)") {
      graft.operators.VectorIndex.build(emb, "vec_id", "embedding",
        nCells = 283, m = 16, ks = 64, trainIters = 1)
    }
    t("vindex write") { graft.operators.VectorIndex.write(ix, s"$vdir/ix") }
    emb.write.mode("overwrite").parquet(s"$vdir/raw") // comparison baseline
    def dirBytes(p: String): Long = {
      def walk(f: java.io.File): Long =
        if (f.isFile) f.length
        else Option(f.listFiles).map(_.map(walk).sum).getOrElse(0L)
      walk(new java.io.File(p))
    }
    val codesB = dirBytes(s"$vdir/ix/codes")
    val rawB = dirBytes(s"$vdir/raw")
    println(f"[stress] vindex codes=${codesB / 1048576.0}%.1f MB " +
      f"raw=${rawB / 1048576.0}%.1f MB ratio=${rawB.toDouble / codesB}%.1fx")
    val loaded = t("vindex read") {
      graft.operators.VectorIndex.read(spark, s"$vdir/ix")
    }
    val served = t("vindex serve 2k queries") {
      graft.operators.VectorIndex.topK(loaded,
        emb.filter(col("vec_id") % 40 === 0),
        "vec_id", "embedding", k = 10, nProbe = 16).count()
    }
    println(s"[stress] vindex served rows=$served")
    t("vindex serve 100-query micro-batch") {
      graft.operators.VectorIndex.topK(loaded,
        emb.filter(col("vec_id") % 800 === 0),
        "vec_id", "embedding", k = 10, nProbe = 16).count()
    }
    }

    if (want("retrain")) {
    // Drift repair at 80k vectors: train on two thirds, then append a
    // third forming a NEW MODE — a broad cloud (per-component offsets
    // ~±0.1, comparable to the unit-vector signal) around one direction
    // the frozen quantizer never saw, so it funnels into a handful of
    // cells. Retraining samples ~1/3 of its seeds inside the mode and
    // partitions it. The mode's ANGULAR radius matters: under
    // inner-product assignment a cluster tighter than the quantizer's
    // angular resolution concentrates under ANY seed set (the fixed
    // seed-to-centroid alignment term dominates the intra-cloud term —
    // two earlier cuts of this section, jitter 1e-5 and a 1-D offset
    // family, proved it empirically). Sub-resolution piles are [[Dedup]]'s
    // job before indexing, not retrain's. Measures the three costs that
    // define the maintenance contract: the gate's no-op read (cheap
    // enough to run nightly), the retrain itself (≈ one build — the
    // periodic remedy), and the occupancy census the repair restores.
    import graft.operators.VectorIndex
    val rdir = graft.Scratch.tempDir("graft-retrain-stress") + "/ix"
    val base = emb.filter(col("vec_id") % 3 =!= 0)
    val seed = broadcast(emb.filter(col("vec_id") === 40)
      .select(col("embedding").as("seedv")))
    val delta = emb.filter(col("vec_id") % 3 === 0).select("vec_id")
      .crossJoin(seed)
      .select(col("vec_id"),
        // per-(row, component) offsets — a genuine 64-dim cloud. A 1-D
        // family (one offset direction scaled per row) degenerates the
        // same way duplicates do: max-inner-product sends a line segment
        // to one winner under any quantizer.
        expr("transform(seedv, (x, i) -> CAST(x + (CAST((vec_id * (i + 7)) % 101" +
          " AS DOUBLE) - 50.0D) * 0.002D AS FLOAT))")
          .as("embedding"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val full = base.select("vec_id", "embedding").unionByName(delta)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    t("retrain: base build+write (53k, 283 cells)") {
      VectorIndex.write(VectorIndex.build(base, "vec_id", "embedding",
        nCells = 283, m = 16, ks = 64, trainIters = 1), rdir)
    }
    t("retrain: append clustered 27k delta") {
      VectorIndex.appendToDir(spark, rdir, delta, "vec_id", "embedding")
    }
    val skewDrifted = t("retrain: gate read (occupancySkew)") {
      VectorIndex.occupancySkew(VectorIndex.read(spark, rdir))
    }
    // hot-mode queries: 100 vectors inside the appended cluster
    val hotQ = delta.filter(col("vec_id") % 810 === 0)
    val hotBefore = t("retrain: serve 100 hot-mode queries DRIFTED") {
      VectorIndex.topK(VectorIndex.read(spark, rdir), hotQ,
        "vec_id", "embedding", k = 10, nProbe = 16).count()
    }
    val rebuilt = t("retrain: retrainIfDrifted fires (full rebuild + swap)") {
      VectorIndex.retrainIfDrifted(spark, rdir, full, "vec_id", "embedding",
        maxSkew = 4.0, nCells = 283, m = 16, ks = 64, trainIters = 1)
    }
    require(rebuilt.isDefined, s"gate must fire at skew $skewDrifted")
    val skewAfter = VectorIndex.occupancySkew(rebuilt.get)
    val hotAfter = t("retrain: serve 100 hot-mode queries REPAIRED") {
      VectorIndex.topK(VectorIndex.read(spark, rdir), hotQ,
        "vec_id", "embedding", k = 10, nProbe = 16).count()
    }
    require(hotBefore == hotAfter, s"row counts moved: $hotBefore vs $hotAfter")
    require(skewAfter < skewDrifted / 4,
      f"retrain must repair the census: $skewDrifted%.1f -> $skewAfter%.1f")
    val noop = t("retrain: gate no-op on the healthy index") {
      VectorIndex.retrainIfDrifted(spark, rdir, full, "vec_id", "embedding",
        maxSkew = skewAfter + 0.5, nCells = 283, m = 16, ks = 64, trainIters = 1)
    }
    require(noop.isEmpty, s"healthy index must not rebuild (skew $skewAfter)")
    println(f"[stress] retrain skew: drifted $skewDrifted%.1f -> repaired $skewAfter%.1f")
    delta.unpersist(); full.unpersist()
    }

    if (want("residual")) {
    // Residual vs raw IVF-PQ coding at 80k vectors, two corpora:
    //
    //  - `emb` (the shared ann fixture) is 2k modes of 40 COLLINEAR
    //    variants — every mode perturbs along the SAME 1-D direction.
    //    That is a near-duplicate pile (the input class the retrain
    //    section already documents as Dedup's job, not the index's), and
    //    it is adversarial for residual coding: within-mode distances sit
    //    below PQ's distortion for either coding, while the raw corpus
    //    geometry happens to quantize well. Reported, never gated.
    //  - `embR` replaces the 1-D family with per-(row, component) offsets
    //    (a genuine 64-dim cloud per mode, the drift-fixture recipe) —
    //    the clustered regime a real embedding corpus shows and the one
    //    residual coding exists for. Gated: residual must win there.
    //
    // Serving-cost note: residual tables build per (query, probed cell),
    // so the broadcast probe frame carries nProbe tables per query —
    // serve cost scales with queries × nProbe × (m·ks); batch serving
    // sizes its query waves accordingly (measured below as serve2k).
    import graft.operators.VectorIndex
    val pred2k = col("vec_id") % 40 === 0
    val predSub = col("vec_id") % 400 === 0
    val embR = Tables.embeddings(spark, d)
      .crossJoin(spark.range(40).toDF("v"))
      .select(
        (col("vec_id") * 40 + col("v")).as("vec_id"),
        expr("transform(embedding, (x, i) -> CAST(x + " +
          "(CAST(((vec_id * 40 + v) * (i + 7)) % 101 AS DOUBLE) - 50.0D)" +
          " * 0.001D AS FLOAT))").as("embedding"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    def pairsOf(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
      df.select(col("query_id"), col("neighbor_id")).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    // ground truth in ADC's OWN metric (exact squared L2 on the quantized
    // vectors) — bruteForceTopK ranks by dot, and on clouds whose offsets
    // perturb the norms the two orderings disagree enough to put a ~0.32
    // ceiling on ANY L2-ranked index (measured; the first cut of this
    // section scored both codings against the mismatched metric)
    def bruteL2(corpus: org.apache.spark.sql.DataFrame): Set[(Long, Long)] = {
      import org.apache.spark.sql.expressions.Window
      val q = corpus.filter(predSub).select(col("vec_id").as("query_id"),
        Similarity.quantize(col("embedding")).as("__qa"))
      val c = corpus.select(col("vec_id").as("neighbor_id"),
        Similarity.quantize(col("embedding")).as("__qb"))
      val w = Window.partitionBy(col("query_id"))
        .orderBy(col("__d"), col("neighbor_id"))
      pairsOf(graft.operators.Scale.spread(c).crossJoin(broadcast(q))
        .filter(col("query_id") =!= col("neighbor_id"))
        .withColumn("__d", expr("aggregate(zip_with(__qa, __qb," +
          " (x, y) -> (x - y) * (x - y)), 0L, (acc, v) -> acc + v)"))
        .withColumn("__rn", row_number().over(w))
        .filter(col("__rn") <= 10))
    }
    def regime(corpus: org.apache.spark.sql.DataFrame, label: String,
               gt: Set[(Long, Long)], residual: Boolean,
               nCells: Int, nProbe: Int): Double = {
      val tag = if (residual) "residual" else "raw"
      val t0 = System.nanoTime()
      val ix = VectorIndex.build(corpus, "vec_id", "embedding",
        nCells = nCells, m = 16, ks = 64, trainIters = 1, residual = residual)
      ix.codes.count()
      val buildSec = (System.nanoTime() - t0) / 1e9
      val t1 = System.nanoTime()
      VectorIndex.topK(ix, corpus.filter(pred2k),
        "vec_id", "embedding", k = 10, nProbe = nProbe).count()
      val serveSec = (System.nanoTime() - t1) / 1e9
      val rec = pairsOf(VectorIndex.topK(ix, corpus.filter(predSub),
        "vec_id", "embedding", k = 10, nProbe = nProbe))
        .intersect(gt).size.toDouble / gt.size
      println(f"[stress] ivfpq $label%-10s $tag%-8s cells=$nCells%4d " +
        f"probes=$nProbe%2d build=$buildSec%6.1f s serve2k=$serveSec%6.1f s " +
        f"recall=$rec%.3f")
      rec
    }
    val gt1d = t("residual ground truth (1-D family, 200 queries, L2)") {
      bruteL2(emb)
    }
    val rawU = regime(emb, "collinear", gt1d, residual = false, 283, 16)
    val resU = regime(emb, "collinear", gt1d, residual = true, 283, 16)
    val gtR = t("residual ground truth (clouds, 200 queries, L2)") {
      bruteL2(embR)
    }
    // under-resolved (283 cells over 2k clouds, ~7 clouds/cell): 6/7 of a
    // cell's residual mass is corpus-scale, so neither coding can rank
    // within-cloud — reported
    val rawC = regime(embR, "clouds", gtR, residual = false, 283, 16)
    val resC = regime(embR, "clouds", gtR, residual = true, 283, 16)
    // resolved (2048 cells ≈ one cloud per cell): residuals live in the
    // cloud-radius ball — the gated claim
    val rawM = regime(embR, "clouds", gtR, residual = false, 2048, 16)
    val resM = regime(embR, "clouds", gtR, residual = true, 2048, 16)
    println(f"[stress] residual verdict: collinear raw=$rawU%.3f res=$resU%.3f" +
      f" | clouds@283 raw=$rawC%.3f res=$resC%.3f" +
      f" | clouds@2048 raw=$rawM%.3f res=$resM%.3f")
    require(resM >= rawM,
      f"residual must win once cells resolve the clouds: raw=$rawM%.3f res=$resM%.3f")
    embR.unpersist()
    }

    if (want("dix")) {
    // Persisted dedup index vs one-shot incrementalDedup at sf1 (50k
    // docs, the derived dir): what indexing the corpus once buys each
    // daily batch. The one-shot re-shingles/re-signs corpus∪batch and
    // verifies corpus×corpus candidate pairs every call; the probe signs
    // only the batch and verifies only cross pairs.
    val sf1docs = "/dev/shm/sf1"
    if (new java.io.File(s"$sf1docs/documents.parquet").exists()) {
      val dd = Tables.documents(spark, sf1docs)
      val corpus = dd.filter(col("doc_id") % 5 =!= 0)
      val batch = dd.filter(col("doc_id") % 5 === 0)
      println(s"[stress] dix corpus=${corpus.count()} batch=${batch.count()}")
      val one = t("dix one-shot incrementalDedup") {
        Dedup.incrementalDedup(batch, corpus, "doc_id", "text",
          shingleN = 3, k = 8, bands = 4, threshold = 0.1,
          maxBucketSize = 100).filter(col("keep")).count()
      }
      val ddir = graft.Scratch.tempDir("graft-dix-st") + "/ix"
      t("dix build+write (once per corpus)") {
        graft.operators.DedupIndex.write(
          graft.operators.DedupIndex.build(corpus, "doc_id", "text"), ddir)
      }
      val rx = t("dix read") { graft.operators.DedupIndex.read(spark, ddir) }
      val kept = t("dix probe (per-batch cost)") {
        graft.operators.DedupIndex.probe(rx, batch, "doc_id", "text",
          threshold = 0.1, maxBucketSize = 100).filter(col("keep")).count()
      }
      require(kept == one, s"probe kept $kept != one-shot $one")
      println(s"[stress] dix kept=$kept (probe ≡ one-shot)")
      // the streaming-gate shape: a 500-doc micro-batch. The one-shot
      // re-signs the 40k-doc corpus for it; the probe signs 500 docs and
      // touches ~500·B buckets.
      val micro = dd.filter(col("doc_id") % 100 === 0)
      t("dix one-shot on 500-doc micro-batch") {
        Dedup.incrementalDedup(micro, corpus, "doc_id", "text",
          shingleN = 3, k = 8, bands = 4, threshold = 0.1,
          maxBucketSize = 100).filter(col("keep")).count()
      }
      t("dix probe on 500-doc micro-batch") {
        graft.operators.DedupIndex.probe(rx, micro, "doc_id", "text",
          threshold = 0.1, maxBucketSize = 100).filter(col("keep")).count()
      }
      t("dix append batch (O(delta) commit)") {
        graft.operators.DedupIndex.appendToDir(spark, ddir, batch,
          "doc_id", "text")
      }
    } else println(s"[stress] dix skipped: $sf1docs not present (run MakeSf)")
    // The scale claim itself: at 10× the corpus (sf10, 500k docs) the
    // one-shot's cost follows the corpus while the probe's follows the
    // batch — the sf1 numbers sit on local-mode scheduler floor (~10
    // stages × ~0.5 s) that hides the separation.
    val sf10docs = "/dev/shm/sf10"
    if (new java.io.File(s"$sf10docs/documents.parquet").exists()) {
      val dd = Tables.documents(spark, sf10docs)
      val corpus = dd.filter(col("doc_id") % 5 =!= 0)
      val micro = dd.filter(col("doc_id") % 1000 === 0)
      println(s"[stress] dix10 corpus=${corpus.count()} micro=${micro.count()}")
      val one = t("dix10 one-shot on micro-batch") {
        Dedup.incrementalDedup(micro, corpus, "doc_id", "text",
          shingleN = 3, k = 8, bands = 4, threshold = 0.1,
          maxBucketSize = 100).filter(col("keep")).count()
      }
      val ddir = graft.Scratch.tempDir("graft-dix10") + "/ix"
      t("dix10 build+write (once per corpus)") {
        graft.operators.DedupIndex.write(
          graft.operators.DedupIndex.build(corpus, "doc_id", "text"), ddir)
      }
      val rx = graft.operators.DedupIndex.read(spark, ddir)
      val kept = t("dix10 probe on micro-batch") {
        graft.operators.DedupIndex.probe(rx, micro, "doc_id", "text",
          threshold = 0.1, maxBucketSize = 100).filter(col("keep")).count()
      }
      require(kept == one, s"probe kept $kept != one-shot $one")
      println(s"[stress] dix10 kept=$kept (probe ≡ one-shot)")
    } else println(s"[stress] dix10 skipped: $sf10docs not present")
    }

    if (want("lex")) {
    // Persisted BM25 index vs one-shot bm25TopK at sf10 (500k docs):
    // what building the postings once buys each query batch. The
    // one-shot re-tokenizes and re-counts the CORPUS per call; the
    // indexed query reads only the query terms' pb partitions and
    // derives df from the postings already in hand.
    val sf10docs = "/dev/shm/sf10"
    if (new java.io.File(s"$sf10docs/documents.parquet").exists()) {
      val dd = Tables.documents(spark, sf10docs)
      def qbatch(mod: Int) = dd.filter(col("doc_id") % mod === 0)
        .select(col("doc_id").as("query_id"),
          array_join(slice(graft.operators.Dedup.tokens(col("text")), 1, 4), " ")
            .as("qtext"))
      def canon(df: org.apache.spark.sql.DataFrame) =
        df.collect().map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("rank"),
          r.getAs[Long]("doc_id"), r.getAs[Long]("score_micros"))).sortBy(x => (x._1, x._2)).toSeq
      println(s"[stress] lex corpus=${dd.count()} qbatch=${qbatch(10000).count()}")
      val one = t("lex one-shot bm25TopK (50-query batch)") {
        canon(graft.operators.Retrieval.bm25TopK(dd, "doc_id", "text",
          qbatch(10000), "query_id", "qtext", k = 10))
      }
      val ldir = graft.Scratch.tempDir("graft-lex-st") + "/ix"
      t("lex build+write (once per corpus)") {
        graft.operators.LexIndex.write(
          graft.operators.LexIndex.build(dd, "doc_id", "text"), ldir)
      }
      val rx = graft.operators.LexIndex.read(spark, ldir)
      val served = t("lex indexed query (per-batch cost)") {
        canon(graft.operators.LexIndex.query(rx, qbatch(10000),
          "query_id", "qtext", k = 10))
      }
      require(served == one, "indexed query != one-shot bm25TopK")
      println(s"[stress] lex served=${served.size} rows (indexed ≡ one-shot)")
      t("lex indexed query (5-query micro-batch)") {
        canon(graft.operators.LexIndex.query(rx, qbatch(100000),
          "query_id", "qtext", k = 10))
      }
    } else println(s"[stress] lex skipped: $sf10docs not present")
    }

    if (want("fvs")) {
    // Filtered vector search at sf10 (500k × 64-dim): the in-filter IVF
    // (candidates semi-joined to the allowed set inside probed cells)
    // vs exact brute force over the survivors — the two regimes
    // filteredTopK routes between. Broad filter (labels 2/3/5, ~30%):
    // the index's N/nCells advantage survives filtering. Narrow filter
    // (~0.1%): brute force over survivors is exact and cheap — probing
    // cells that are 99.9% filtered out buys nothing.
    val sf10dir = "/dev/shm/sf10"
    if (new java.io.File(s"$sf10dir/embeddings.parquet").exists()) {
      val emb = Tables.embeddings(spark, sf10dir)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val broad = emb.filter(col("label").isin(2, 3, 5)).select(col("vec_id"))
      val narrow = emb.filter(col("label") === 7 && col("vec_id") % 256 === 0)
        .select(col("vec_id"))
      println(s"[stress] fvs corpus=${emb.count()} broad=${broad.count()} narrow=${narrow.count()}")
      val qp = col("vec_id") % 25000 === 0 // 20 queries
      val bf = t("fvs broad: filteredTopK (routes to in-filter IVF)") {
        graft.operators.Similarity.filteredTopK(emb, "vec_id", "embedding",
          qp, broad, k = 10, nCells = 256, nProbe = 32,
          bruteCutoff = 65536).count()
      }
      val bu = t("fvs broad: unfiltered ivfTopK + post-filter (the naive plan)") {
        val lab = emb.select(col("vec_id").as("neighbor_id"), col("label"))
        graft.operators.Similarity.ivfTopK(emb, "vec_id", "embedding",
            qp, k = 34, nCells = 256, nProbe = 32) // k/selectivity ranks needed
          .join(lab, "neighbor_id")
          .filter(col("label").isin(2, 3, 5)).count()
      }
      println(s"[stress] fvs broad rows: in-filter=$bf post-filter=$bu" +
        " (post-filter must over-fetch k/selectivity and still under-fills)")
      val nf = t("fvs narrow: filteredTopK (routes to exact brute force)") {
        graft.operators.Similarity.filteredTopK(emb, "vec_id", "embedding",
          qp, narrow, k = 10, nCells = 256, nProbe = 32,
          bruteCutoff = 65536).count()
      }
      println(s"[stress] fvs narrow rows=$nf (exact over survivors)")
    } else println(s"[stress] fvs skipped: $sf10dir not present")
    }

    if (want("ops")) {
    // ---- round-4 operators at the same inflation ----
    val cont = t("containment near-dup 200k") {
      Dedup.containmentNearDups(docs, "doc_id", "text",
        threshold = 0.5, maxBucketSize = 100).count()
    }
    println(s"[stress] containment pairs=$cont")
    t("boilerplate 200k") {
      TextAnalysis.boilerplate(docs, "doc_id", "text", minDocFrac = 0.02).count()
    }
    t("lmScore 200k (self-trained)") {
      TextAnalysis.lmScore(docs, "doc_id", "text").count()
    }
    t("curate 200k (full gate)") {
      graft.operators.Curation.curate(
        docs.filter(col("doc_id") % 50 =!= 0),
        docs.filter(col("doc_id") % 50 === 0),
        "doc_id", "text", Seq("the", "a", "of", "and", "to", "in"),
        minTokens = 30L, maxTokens = 10000L,
        minStopRatio = 0.0, maxRepetition = 1.0).count()
    }
    val km = t("kmeansAssign 80k vectors (283 cells, 2 Lloyd iters)") {
      Similarity.kmeansAssign(emb, "vec_id", "embedding",
        nCells = 283, trainIters = 2).count()
    }
    println(s"[stress] kmeans assigned=$km")
    // round-4 text operators at 200k docs
    t("bigramScore 200k (self-trained)") {
      TextAnalysis.bigramScore(docs, "doc_id", "text").count()
    }
    t("bpePairStats 200k (top 200)") {
      TextAnalysis.bpePairStats(docs, "text", topK = 200).count()
    }
    val inc = t("incrementalDedup 40k batch vs 160k corpus") {
      Dedup.incrementalDedup(
        docs.filter(col("doc_id") % 5 === 0),
        docs.filter(col("doc_id") % 5 =!= 0),
        "doc_id", "text", maxBucketSize = 100)
        .filter(!col("keep")).count()
    }
    println(s"[stress] incremental flagged=$inc")
    t("chunkDocs 200k (48/32)") {
      graft.operators.Curation.chunkDocs(docs, "doc_id", "text", 48, 32).count()
    }

    // semantic dedup at volume: the watch item is cell-occupancy skew —
    // one hot cell makes the within-cell pair join quadratic again
    val sem = t("semanticDedup 80k vectors (283 cells)") {
      Similarity.semanticDedup(emb, "vec_id", "embedding",
        nCells = 283, trainIters = 1, threshold = 0.9)
    }
    val semKept = t("semanticDedup materialize") { sem.filter(col("keep")).count() }
    val occ = sem.groupBy(col("cell")).agg(count(lit(1)).as("n"))
      .agg(max(col("n")).as("mx"), expr("percentile(n, 0.99)").as("p99")).head()
    println(s"[stress] semantic kept=$semKept maxCell=${occ.get(0)} p99Cell=${occ.get(1)}")
    }

    // ================= skew robustness (Zipf-hot keys) =================
    // A per-task duration listener: the observable that distinguishes "the
    // stage finished" from "one straggler task did all the work".
    import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
    val durations = new scala.collection.mutable.ArrayBuffer[Long]
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onTaskEnd(e: SparkListenerTaskEnd): Unit =
        durations.synchronized { durations += e.taskInfo.duration }
    })
    def taskStats[A](label: String)(f: => A): (A, Long, Long) = {
      durations.synchronized(durations.clear())
      val r = f
      Thread.sleep(400) // listener bus drain
      val d = durations.synchronized(durations.toVector.sorted)
      val mx = d.last
      val med = d(d.size / 2)
      println(f"[stress] $label%-44s tasks=${d.size}%4d max-task ${mx}%6d ms  median ${med}%4d ms  ratio ${mx.toDouble / math.max(med, 1)}%6.1f")
      (r, mx, med)
    }

    if (want("skew")) {
    // Session confs this section mutates, restored in the finally below so
    // a combined run executes later sections (hotbucket, dedup, ...) under
    // the same configs as a targeted run — section selection must not
    // change what any section measures.
    val mutatedConfs = Seq(
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.enabled",
      "spark.sql.adaptive.skewJoin.enabled",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes")
    val savedConfs = mutatedConfs.map(k => k -> spark.conf.getOption(k))
    try {
    // Zipf-skewed fact: key 0 owns 7/8 of 8M rows; dim is too big to
    // broadcast (forced), so the join must shuffle — the regime where a
    // hot key funnels into one task.
    val fact = spark.range(8000000).select(col("id"),
      when(col("id") % 8 =!= 7, 0L)
        .otherwise(pmod(xxhash64(col("id")), lit(10000L))).as("k"),
      (col("id") % 97).as("payload"))
    val dim = spark.range(10000).select(col("id").as("k"), (col("id") % 13).as("w"))
    def joinAgg(j: org.apache.spark.sql.DataFrame): Long =
      j.agg(sum(col("payload") * col("w"))).head().getLong(0)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    val (r1, mx1, md1) = taskStats("skew join: no mitigation") {
      joinAgg(fact.join(dim, "k"))
    }
    // AQE skew-join split (sort-merge regime), thresholds lowered so the
    // local-scale hot partition qualifies as skewed
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
    spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
    spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "1m")
    spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "1m")
    val (r2, mx2, _) = taskStats("skew join: AQE skew split") {
      joinAgg(fact.join(dim, "k"))
    }
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    val (r3, mx3, md3) = taskStats("skew join: salted (64)") {
      joinAgg(graft.operators.Scale.saltedJoin(fact, dim, "k", "id", 64))
    }
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    require(r1 == r2 && r2 == r3, s"skew mitigations changed the answer: $r1 $r2 $r3")
    // The 100 TB-relevant metric is task BALANCE (max/median), not local
    // absolute wall: salting replicates the dim 64x, which costs total
    // work that only pays off when the straggler is hours, not seconds.
    // AQE's split must also beat the unmitigated straggler outright.
    val ratio1 = mx1.toDouble / math.max(md1, 1)
    val ratio3 = mx3.toDouble / math.max(md3, 1)
    require(ratio3 < ratio1 / 2,
      f"expected salting to at least halve max/median: $ratio1%.1f -> $ratio3%.1f")
    require(mx2 < mx1, s"expected AQE skew split ($mx2 ms) < unmitigated ($mx1 ms)")
    println(f"[stress] skew-join verdict: unmitigated ratio $ratio1%.1f -> salted $ratio3%.1f (AQE split max ${mx2}ms vs $mx1)")
    } finally savedConfs.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
    }

    if (want("hotbucket")) {
    // Hot-shingle-bucket near-dup: 3k of 50k docs share one template text →
    // one LSH bucket holds 3k docs. Uncapped, that single bucket emits
    // ~4.5M candidate pairs (quadratic); capped at 100 the bucket is
    // dropped as non-discriminative and the chain stays linear. True
    // near-dups still surface through their OTHER, discriminative bands.
    // repartition: the in-memory synthesis arrives in ONE partition, and
    // the interpreted minhash HOF chain would otherwise run single-task
    val hotDocs = Tables.documents(spark, d)
      .crossJoin(spark.range(10).toDF("v"))
      .select((col("doc_id") * 10 + col("v")).as("doc_id"),
        when(col("doc_id") * 10 + col("v") <= 3000,
          lit("the same boilerplate template header that every scraped page carries on this mirror"))
          .otherwise(concat(lit("variant"), col("v"), lit(" "), col("text"))).as("text"))
      .repartition(64)
    // persistInput: the band-row chain feeds three consumers in the capped
    // form (bucket counts + both self-join sides) — without it the whole
    // minhash derivation recomputes per consumer (the documented
    // lshCandidatePairs knob for expensive unpersisted pipelines)
    def hotBandRows() = Dedup.lshBandRows(
      Dedup.minhashSignatures(
        Dedup.shingleRows(hotDocs, "doc_id", "text", 3), "doc_id", 8),
      "doc_id", 4, 2)
    val (candUncapped, mxU, _) = taskStats("hot-bucket candidates: uncapped") {
      Dedup.lshCandidatePairs(hotBandRows(), "doc_id",
        maxBucketSize = 0, persistInput = true).count()
    }
    val (candCapped, mxC, _) = taskStats("hot-bucket candidates: capped(100)") {
      Dedup.lshCandidatePairs(hotBandRows(), "doc_id",
        maxBucketSize = 100, persistInput = true).count()
    }
    println(s"[stress] hot-bucket pairs: uncapped=$candUncapped capped=$candCapped (max-task $mxU -> $mxC ms)")
    require(candCapped < candUncapped / 10,
      "bucket cap failed to suppress the quadratic hot-bucket blowup")
    }

    if (want("ccprobe")) {
    // ========= connectedComponents probe double-compute audit =========
    // The bounded fast-path probe (`pairs.limit(threshold+1).collect()`,
    // Dedup.scala) runs on the PERSISTED pairs frame; when the probe
    // overflows and the distributed path takes over, `sym`'s first job
    // re-reads `pairs`. The worry (VERDICT r6 #6): does that re-read
    // recompute the upstream pair pipeline for partitions the probe
    // already touched? Measure it directly: an accumulator inside a
    // mapPartitions upstream of `pairs` counts every ROW-COMPUTE of the
    // edge pipeline. Spark's RDD.getOrCompute materializes a caching
    // partition FULLY into the block store on first compute (even under a
    // limit that stops consuming early), so each of the 1M edges must be
    // computed exactly once — any probe-induced recompute shows up as
    // acc > 1M. Star graph (i, i%1000), not a chain: diameter is the cc
    // section's concern; this section isolates the probe.
    import spark.implicits._
    val accEdges = spark.sparkContext.longAccumulator("edgeRowComputes")
    val nEdges = 1000000L
    val probeEdges = spark.range(1000, 1000 + nEdges).repartition(64)
      .as[Long]
      .mapPartitions(it => it.map { i => accEdges.add(1); (i, i % 1000) })
      .toDF("doc_a", "doc_b")
    val ((ccN, ccRounds), _, _) = taskStats("ccprobe: 1e6-edge star, distributed path") {
      val (cc, rounds) = Dedup.connectedComponentsRounds(
        probeEdges, "doc_a", "doc_b", maxIter = 30) // default 200k threshold < 1M
      (cc.agg(countDistinct(col("component"))).head().getLong(0), rounds)
    }
    println(s"[stress] ccprobe components=$ccN rounds=$ccRounds " +
      s"edge-row-computes=${accEdges.value} (edges=$nEdges)")
    require(ccRounds > 0, "expected the distributed path (probe must overflow)")
    require(ccN == 1000L, s"expected 1000 star components, got $ccN")
    require(accEdges.value == nEdges,
      s"pair pipeline computed ${accEdges.value} edge rows for $nEdges edges — " +
        "the probe's partial materialization double-computed upstream work")
    }

    if (want("ccprobe10")) {
    // ===== the same probe audit at REAL q38 depth (sf10 documents) =====
    // The synthetic star above proves one-compute-per-edge at 10⁶ edges and
    // depth 1; VERDICT r7 #6 asked for the assertion once at sf10's actual
    // q38 — the full LSH pair pipeline over 500k real documents, whatever
    // depth and pair multiplicity the corpus produces. The accumulator
    // wraps the PAIR rows (the frame connectedComponents persists and the
    // probe partially consumes); the expected count comes from an
    // accumulator-free twin of the pipeline. acc == expected ⇒ the
    // overflow probe cost zero recomputes of the (expensive) LSH chain at
    // real scale too.
    import spark.implicits._
    val d10 = sys.env.getOrElse("SPARK_GRAFT_SF10_DIR", "/dev/shm/sf10")
    def q38pairs = Dedup.minhashNearDups(Tables.documents(spark, d10),
      "doc_id", "text", shingleN = 3, k = 8, bands = 4,
      threshold = 0.1, maxBucketSize = 100)
    val expected = t("ccprobe10: accumulator-free pair count") {
      q38pairs.count()
    }
    val accPairs = spark.sparkContext.longAccumulator("pairRowComputes")
    val pairs10 = q38pairs.select(col("doc_a"), col("doc_b"))
      .as[(Long, Long)]
      .mapPartitions(it => it.map { p => accPairs.add(1); p })
      .toDF("doc_a", "doc_b")
    val ((ccN10, ccRounds10), _, _) =
      taskStats("ccprobe10: q38 pipeline at sf10, distributed path") {
        val (cc, rounds) = Dedup.connectedComponentsRounds(
          pairs10, "doc_a", "doc_b", maxIter = 30,
          driverThreshold = math.min(200000, expected.toInt - 1).max(1))
        (cc.agg(countDistinct(col("component"))).head().getLong(0), rounds)
      }
    println(s"[stress] ccprobe10 components=$ccN10 rounds=$ccRounds10 " +
      s"pair-row-computes=${accPairs.value} (pairs=$expected)")
    require(ccRounds10 > 0, "expected the distributed path (probe must overflow)")
    require(accPairs.value == expected,
      s"pair pipeline computed ${accPairs.value} rows for $expected pairs — " +
        "the probe's partial materialization double-computed upstream work")
    }

    if (want("bpe")) {
    // ============== distributed BPE past the driver threshold ==============
    // bpeLoop's distributed branch never runs in the registry (every corpus
    // stays under 200k word types) — exercise it: 300k unique types with a
    // shared character structure so merges learn real pairs, 10 merges,
    // and the merge table must EQUAL the driver path's on the same corpus
    // (forced by a 2M threshold — 300k types fit driver memory fine; what
    // is being proven is the distributed rounds compute the same argmaxes).
    // the id must be letter-encoded: BpeishRe tokenizes digit runs as
    // SINGLE digits (GPT-style), so "pre<id>fix" would collapse to 14
    // types; translate(id, digits->letters) makes each doc's first word a
    // unique letter token ("preabjcfix") and the type count ~300k
    val bpeDocs = spark.range(300000)
      .select(concat(lit("pre"),
        translate(col("id").cast("string"), "0123456789", "abcdefghij"),
        lit("fix abra cad abra")).as("text"))
      .repartition(64) // in-memory synthesis lands in ONE partition otherwise
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val nTypes = t("bpe corpus distinct types") {
      bpeDocs.select(explode(regexp_extract_all(col("text"),
          lit(TextAnalysis.BpeishRe), lit(0))).as("w")).distinct().count()
    }
    println(s"[stress] bpe distinct types=$nTypes (> 200k driver threshold)")
    require(nTypes > 200000, s"corpus must exceed the driver threshold: $nTypes")
    def mergeRows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r =>
        (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3))).toSeq
    val distSec0 = System.nanoTime()
    val distM = t("bpe 10 merges DISTRIBUTED (300k types)") {
      mergeRows(TextAnalysis.bpeTrain(bpeDocs, "text", nMerges = 10))
    }
    val perRound = (System.nanoTime() - distSec0) / 1e9 / 10
    println(f"[stress] bpe distributed avg round time ${perRound}%.2f s")
    val drvM = t("bpe 10 merges driver path (forced, same corpus)") {
      mergeRows(TextAnalysis.bpeTrain(bpeDocs, "text", nMerges = 10,
        driverThreshold = 2000000))
    }
    require(distM == drvM,
      s"distributed and driver BPE merge tables diverged:\n$distM\n$drvM")
    println(s"[stress] bpe merge tables identical across paths (${distM.size} merges)")
    bpeDocs.unpersist()
    }

    if (want("stream")) {
    // ============== streaming medallion throughput + recovery ==============
    // ~100k CDC events (50k orders × header+line) through the continuous
    // medallion with the RocksDB state store: events/s, state-store size,
    // recovery time after a kill, and the exactly-once observable — a
    // restart with nothing new to complete must publish ZERO new gold
    // versions (a replayed already-committed batch would re-publish).
    val prevProvider = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val root = graft.Scratch.tempDir("stress-stream")
      val in = s"$root/in"
      java.nio.file.Files.createDirectories(java.nio.file.Paths.get(in))
      def cdcLine(kind: String, oid: Long, cust: Long, n: Int, pid: Long): String = {
        val after = kind match {
          case "header" =>
            s"""{"kind":"header","order_id":$oid,"customer_id":$cust,"num_products":$n}"""
          case _ => s"""{"kind":"line","order_id":$oid,"product_id":$pid}"""
        }
        val envelope = s"""{"payload":{"after":$after}}"""
        val escaped = envelope.replace("\\", "\\\\").replace("\"", "\\\"")
        s"""{"value":"$escaped"}"""
      }
      val nOrders = 50000
      val nEvents = nOrders * 2
      t("stream input files (100k events, 10 files)") {
        (0 until 10).foreach { f =>
          val sb = new StringBuilder
          ((f * nOrders / 10) until ((f + 1) * nOrders / 10)).foreach { o =>
            sb.append(cdcLine("header", o, cust = o % 100, n = 1, pid = -1)).append('\n')
            sb.append(cdcLine("line", o, cust = -1, n = 0, pid = o)).append('\n')
          }
          java.nio.file.Files.writeString(
            java.nio.file.Paths.get(in, s"f$f.json"), sb.toString)
        }
      }
      val t0 = System.nanoTime()
      val sg = graft.streaming.StreamingMedallion.startSilverGold(spark, in,
        s"$root/silver", s"$root/gold", s"$root/ckpt")
      try sg.processAllAvailable() finally sg.stop()
      val ingestSec = (System.nanoTime() - t0) / 1e9
      val silverN = spark.read.parquet(s"$root/silver").count()
      require(silverN == nOrders, s"expected $nOrders completed orders, got $silverN")
      def dirSize(p: String): Long = {
        val root = java.nio.file.Paths.get(p)
        if (!java.nio.file.Files.exists(root)) 0L
        else {
          val s = java.nio.file.Files.walk(root)
          try s.filter(java.nio.file.Files.isRegularFile(_))
            .mapToLong(java.nio.file.Files.size(_)).sum()
          finally s.close()
        }
      }
      val stateMb = dirSize(s"$root/ckpt/state") / 1e6
      val versionsBefore = graft.pipeline.Medallion.goldVersions(spark, s"$root/gold").size
      println(f"[stress] stream ingest: $nEvents events in $ingestSec%.1f s = ${nEvents / ingestSec}%.0f events/s, state store ${stateMb}%.1f MB, gold versions $versionsBefore")
      // recovery: restart from checkpoint with one incomplete order's header
      // as the only new input — nothing completes, so gold must NOT move
      java.nio.file.Files.writeString(java.nio.file.Paths.get(in, "tail.json"),
        cdcLine("header", 999999L, cust = 1, n = 1, pid = -1))
      val t1 = System.nanoTime()
      val sg2 = graft.streaming.StreamingMedallion.startSilverGold(spark, in,
        s"$root/silver", s"$root/gold", s"$root/ckpt")
      try sg2.processAllAvailable() finally sg2.stop()
      val recoverSec = (System.nanoTime() - t1) / 1e9
      val versionsAfter = graft.pipeline.Medallion.goldVersions(spark, s"$root/gold").size
      println(f"[stress] stream recovery: $recoverSec%.1f s, gold versions $versionsBefore -> $versionsAfter")
      require(versionsAfter == versionsBefore,
        s"recovery republished gold: $versionsBefore -> $versionsAfter (a committed batch was replayed)")
      val goldN = graft.pipeline.Medallion.readGold(spark, s"$root/gold")
        .agg(sum(col("n_orders"))).head().getLong(0)
      require(goldN == nOrders, s"gold order count $goldN != $nOrders")
    } finally {
      prevProvider match {
        case Some(p) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", p)
        case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
    }

    if (want("log")) {
    // ================= graft-log throughput at 2M records =================
    // The Kafka-semantics DataSourceV2 (`sources/LogSource.scala`) under
    // volume: V2 batch produce (per-task staging + driver conditional-PUT
    // commit), batch consume through the scan, an admission-controlled
    // streaming drain, and the O(#segments) producer append check as the
    // segment count grows (the cost production log-rolling bounds).
    val logRoot = graft.Scratch.tempDir("stress-log")
    val nRec = 2000000L
    val nParts = 8
    val produceDf = spark.range(nRec).select(
      col("id").cast("string").cast("binary").as("key"),
      concat(lit("{\"event_id\":"), col("id"),
        lit(",\"v\":"), col("id") % 97, lit("}")).cast("binary").as("value"),
      pmod(col("id"), lit(nParts)).cast("int").as("partition"))
    val p0 = System.nanoTime()
    t("log produce 2M (V2 batch write, 8 partitions)") {
      produceDf.write.format("graft-log").option("path", logRoot)
        .option("subscribe", "t").option("log.partitions", nParts.toString)
        .mode("append").save()
    }
    println(f"[stress] log produce ${nRec / ((System.nanoTime() - p0) / 1e9)}%.0f records/s")
    val c0 = System.nanoTime()
    val consumed = t("log consume 2M (batch scan + decode)") {
      spark.read.format("graft-log").option("path", logRoot)
        .option("subscribe", "t").load()
        .agg(count(lit(1)), sum(crc32(col("value")))).head()
    }
    println(f"[stress] log consume ${nRec / ((System.nanoTime() - c0) / 1e9)}%.0f records/s")
    require(consumed.getLong(0) == nRec, s"consume count ${consumed.getLong(0)} != $nRec")
    val d0 = System.nanoTime()
    val drainQ = spark.readStream.format("graft-log")
      .option("path", logRoot).option("subscribe", "t")
      .option("maxOffsetsPerTrigger", "250000")
      .load()
      .writeStream.format("noop").start()
    try drainQ.processAllAvailable() finally drainQ.stop()
    val drainSec = (System.nanoTime() - d0) / 1e9
    val batches = drainQ.recentProgress.filter(_.numInputRows > 0)
    require(batches.map(_.numInputRows).sum == nRec,
      s"drain rows ${batches.map(_.numInputRows).sum} != $nRec")
    require(batches.forall(_.numInputRows <= 250000),
      "admission cap violated: " + batches.map(_.numInputRows).mkString(","))
    println(f"[stress] log stream drain: $nRec records in ${batches.length} " +
      f"admission-capped batches, $drainSec%.1f s = ${nRec / drainSec}%.0f records/s")
    // producer append as segments accumulate: 200 sequential 1k-record
    // appends to ONE partition — each lists the dir and reads every
    // segment's 1-line header for the txn check, so this times the
    // worst-case O(#segments) growth a production log-roller would bound
    val fs = new org.apache.hadoop.fs.Path(logRoot)
      .getFileSystem(spark.sessionState.newHadoopConf())
    val recs = (0 until 1000).map(i =>
      (i.toLong, null: Array[Byte], s"r$i".getBytes("UTF-8")))
    val a0 = System.nanoTime()
    t("log 200 sequential OCC appends (1k records each)") {
      (0 until 200).foreach(b =>
        graft.sources.LogFormat.append(fs, logRoot, "appends", 0, recs, s"b$b"))
    }
    println(f"[stress] log append avg ${(System.nanoTime() - a0) / 1e9 / 200 * 1000}%.1f ms " +
      "per append at 0->200 segments")
    // ... and the bound itself: roll the 200 segments (Kafka-cleaner
    // compaction; offsets + txn dedup preserved), then time appends against
    // the compacted log — the O(#segments) txn scan collapses to O(1 roll)
    val r0 = System.nanoTime()
    val absorbed = t("log roll 200 segments") {
      graft.sources.LogFormat.roll(fs, logRoot, "appends", 0, minBytes = Long.MaxValue)
    }
    println(f"[stress] log roll absorbed $absorbed segments in ${(System.nanoTime() - r0) / 1e9}%.2f s")
    val postCount = spark.read.format("graft-log").option("path", logRoot)
      .option("subscribe", "appends").load().count()
    require(postCount == 200L * 1000, s"roll changed record count: $postCount")
    require(graft.sources.LogFormat.append(fs, logRoot, "appends", 0, recs, "b7") == -1L,
      "absorbed producer txn must still dedup after the roll")
    val a1 = System.nanoTime()
    t("log 50 sequential OCC appends post-roll") {
      (200 until 250).foreach(b =>
        graft.sources.LogFormat.append(fs, logRoot, "appends", 0, recs, s"b$b"))
    }
    println(f"[stress] log append avg ${(System.nanoTime() - a1) / 1e9 / 50 * 1000}%.1f ms " +
      "per append post-roll (1 rolled + growing tail)")
    }

    if (want("hybridrecall")) {
    // ============ fused hybrid recall vs the exact twin ============
    // hybridTopKIvf (both legs from persisted indexes, q125's serving
    // form) scored against hybridTopKIndexed (exact vector leg, q124) on
    // the q125 seeded query batch: recall@10 = overlap of the FUSED
    // top-10 sets per query. Runs at the dir in SPARK_GRAFT_SF_DIR
    // (default sf0.1); the sf0.1/sf1 numbers live in STRESS.md. The
    // determinism oracle (q125) proves the engine computes its
    // approximation exactly; this measures that the approximation
    // RETRIEVES well — the two claims the r10/r11 verdicts kept apart.
    import graft.operators.{LexIndex, Retrieval, VectorIndex}
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", d)
    val hDocs = Tables.documents(spark, sfDir)
    val hEmb = Tables.embeddings(spark, sfDir)
    val base = graft.Scratch.tempDir("stress-hyrec")
    // PQ resolution is part of the sweep: m subvectors × ks centroids per
    // codebook set the quantization floor the recall curve saturates at
    // (nProbe=32/32 isolates it from probe misses)
    val codings = Seq(
      ("m16ks64", 16, 64, false), ("m16ks64res", 16, 64, true),
      ("m32ks64", 32, 64, false), ("m16ks256", 16, 256, false))
    t("hybridrecall index build (lex + ivfpq variants)") {
      LexIndex.write(LexIndex.build(hDocs, "doc_id", "text"), s"$base/lix")
      codings.foreach { case (tag, m, ks, res) =>
        VectorIndex.write(VectorIndex.build(hEmb, "vec_id", "embedding",
          nCells = 32, m = m, ks = ks, trainIters = 1, residual = res),
          s"$base/$tag")
      }
    }
    val hQueries = hDocs.filter(col("doc_id") % 101 === 0 && col("doc_id") < 50500)
      .select(col("doc_id").as("query_id"),
        array_join(slice(Dedup.tokens(col("text")), 1, 4), " ").as("qtext"))
    val vecPred = col("vec_id") % 101 === 0 && col("vec_id") < 50500
    def fusedPairs(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
      df.select(col("query_id").cast("long"), col("doc_id").cast("long"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val lixR = LexIndex.read(spark, s"$base/lix")
    val exact = t("hybridrecall exact twin (q124 form)") {
      fusedPairs(Retrieval.hybridTopKIndexed(lixR,
        hQueries, hEmb, "vec_id", "embedding", vecPred, k = 10))
    }
    // fused recall@10 across the IVF-PQ operating points: both codings ×
    // nProbe ∈ {8, 16, 32} — the lexical leg is exact in every variant,
    // so the recall gap is entirely the vector leg's (probe misses + PQ
    // distortion; nProbe=32 of 32 cells isolates pure PQ distortion)
    for ((tag, _, _, _) <- codings; np <- Seq(8, 16, 32)) {
      val vix = VectorIndex.read(spark, s"$base/$tag")
      val fused = fusedPairs(Retrieval.hybridTopKIvf(lixR, vix, hQueries,
        hEmb.filter(vecPred), "vec_id", "embedding", k = 10, nProbe = np))
      println(f"[stress] hybridrecall sf=$sfDir coding=$tag%-10s nProbe=$np%2d " +
        f"recall@10=${(exact & fused).size.toDouble / exact.size}%.3f " +
        f"(queries=${exact.map(_._1).size}, exact pairs ${exact.size})")
    }
    }
    spark.stop()
  }
}
