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
    * (dedup, cc, ann, ivf2, ops, skew, hotbucket). The 200k dedup block
    * alone is ~an hour of real compute (4M+ true near-dup pairs by
    * construction), so targeted runs matter. */
  def main(args: Array[String]): Unit = {
    val sections =
      if (args.isEmpty) Set("dedup", "cc", "ann", "ivf2", "ops", "skew", "hotbucket")
      else args.map(_.toLowerCase).toSet
    def want(s: String): Boolean = sections(s)
    val b = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "64")
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
    // scale-appropriate parameterization: 16-bit band keys (65k buckets per
    // band at 80k vectors -> ~1.2/bucket), radius-2 multiprobe (137 masks)
    val ann = t("annTopK 80k corpus, 2k queries (16-bit bands, r=2)") {
      Similarity.annTopK(emb, "vec_id", "embedding",
        col("vec_id") % 40 === 0, k = 10,
        planes = 128, dim = 64, bands = 8, probeRadius = 2).count()
    }
    println(s"[stress] ann rows=$ann")
    val ivf = t("ivfTopK 80k corpus, 2k queries (283 cells, 16 probes)") {
      Similarity.ivfTopK(emb, "vec_id", "embedding",
        col("vec_id") % 40 === 0, k = 10, nCells = 283, nProbe = 16).count()
    }
    println(s"[stress] ivf rows=$ivf")
    val ivfT = t("ivfTopK trained (2 Lloyd iters) 80k corpus") {
      Similarity.ivfTopK(emb, "vec_id", "embedding",
        col("vec_id") % 40 === 0, k = 10, nCells = 283, nProbe = 16,
        trainIters = 2).count()
    }
    println(s"[stress] ivf trained rows=$ivfT")
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
    val rFlat = flatSub.intersect(bruteSub).size.toDouble / bruteSub.size
    val rHier = hierSub.intersect(bruteSub).size.toDouble / bruteSub.size
    println(f"[stress] IVF recall @ equal budget: flat=$rFlat%.3f hier=$rHier%.3f")
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
    spark.stop()
  }
}
