package graft.operators

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.DataStreamWriter
import org.apache.spark.storage.StorageLevel

/** A built MinHash/LSH dedup index: everything a later session needs to
  * check a new crawl batch against the corpus WITHOUT touching corpus
  * text again.
  *
  *  - `sigs`     — (id, h0..h{k-1}, n): the MinHash signature plus the
  *    distinct-shingle count (the Jaccard denominator half). ~k·8 chars
  *    per document — the tiny frame; banding derives from it narrowly.
  *  - `hashes`   — (id, text_md5): the exact-duplicate probe set, one
  *    32-char hash per document.
  *  - `shingles` — (id, shingle) DISTINCT rows: the verification corpus
  *    for exact Jaccard. This is the index's big frame (≈ corpus token
  *    volume) — the price of EXACT verification, the same price the
  *    one-shot pipeline pays per run; here it is paid once at build and
  *    only the candidates' slivers are ever joined per probe.
  *  - `shingleN`/`k`/`bands` — frozen chain parameters; probes and
  *    appends must shingle/sign exactly as the build did or bucket keys
  *    stop colliding, so they are part of the artifact, not arguments.
  */
final case class MinHashIndex(
    sigs: DataFrame,
    hashes: DataFrame,
    shingles: DataFrame,
    shingleN: Int,
    k: Int,
    bands: Int,
    nDocs: Long,
    nPb: Int = DedupIndex.DefaultNPb)

/** Index lifecycle for incremental corpus dedup: build signatures once
  * over the curated corpus, persist, then screen each incoming crawl
  * batch O(batch) — the production form of [[Dedup.incrementalDedup]],
  * which re-shingles and re-signs the ENTIRE corpus on every call.
  * (Reference ships only full-corpus dedup jobs; the incremental shape
  * follows the standard LSH-index workflow, e.g. datasketch's MinHashLSH
  * insert/query API.)
  *
  * 100 TB design: a probe computes signatures for the BATCH only; the
  * corpus side contributes (a) its persisted sig frame to the bucket
  * join — k·8 chars/doc, parquet-pruned to the two columns each band
  * needs — and (b) only the candidate docs' shingle rows to the Jaccard
  * verify join (shingle storage is partitioned by id at write, so the
  * semi-joined read prunes to candidate files). Candidate generation
  * stays the capped banded self-join — sub-quadratic — and, unlike the
  * one-shot pipeline, corpus×corpus pairs are dropped BEFORE
  * verification: a daily batch never re-verifies yesterday's pairs.
  * Appending the kept batch is map-only over the delta (frozen
  * parameters, new parquet files, no rewrite) — the same
  * O(delta)-commit discipline as [[VectorIndex.appendToDir]].
  *
  * The whole chain is deterministic string/integer math, so
  * build → write → read → probe is bit-identical to the one-shot
  * operator: q108's oracle IS q66's oracle, re-derived through the
  * persisted hop (and q109's through the append hop).
  */
object DedupIndex {

  /** Shingle, hash, and sign the corpus. The shingle frame's distinct is
    * the chain's one wide shuffle, paid once here instead of per probe. */
  def build(docs: DataFrame, idCol: String, textCol: String,
            shingleN: Int = 3, k: Int = 8, bands: Int = 4): MinHashIndex = {
    require(k % bands == 0, s"bands ($bands) must divide k ($k)")
    // input-proportional cached width — see Dedup.minhashNearDups (r13)
    val p = Scale.inputPartitions(docs)
    val sh = Dedup.shingleRows(docs, idCol, textCol, shingleN)
      .coalesce(p)
      .persist(StorageLevel.MEMORY_AND_DISK)
    val sigs = Dedup.minhashSignatures(sh, idCol, k, withSize = true)
      .withColumnRenamed(idCol, "id")
      .coalesce(p)
      .persist(StorageLevel.MEMORY_AND_DISK)
    val hashes = docs.select(col(idCol).as("id"), md5(col(textCol)).as("text_md5"))
    // nDocs counts hashes, not sigs: a doc shorter than one shingle has no
    // signature (near-dup-invisible, like the one-shot chain) but is still
    // a corpus member for the exact probe
    val n = hashes.count()
    MinHashIndex(sigs, hashes, sh.withColumnRenamed(idCol, "id"),
      shingleN, k, bands, n, adaptiveNPb(n))
  }

  /** The shingle store's partition count: probes read only the partitions
    * holding candidate docs' shingles, so the widest frame's scan is
    * O(candidates/nPb of the store) instead of O(store). Size it so
    * corpus/nPb partitions are a few hundred MB: pruning only bites once
    * nPb exceeds a batch's candidate count, so a 100 TB corpus wants
    * thousands of partitions, while at test SFs a small nPb keeps the
    * file count from dominating. Persisted in meta — probes and appends
    * must agree with the build or the pruning filter reads the wrong
    * partitions.
    *
    * [[build]] derives the count from the corpus size ([[adaptiveNPb]]) —
    * round-13 optimization: the old constant 64 was tuned for neither end
    * (at sf0.1 it fanned a 4,000-doc corpus into 64 directories and the
    * write/list/commit overhead dominated the whole q108/q109 wall; at
    * 100 TB it is orders of magnitude too FEW for few-hundred-MB
    * partitions). The constant remains only as the fallback for callers
    * constructing a [[MinHashIndex]] by hand. */
  val DefaultNPb = 64

  /** Partition count for `nDocs` documents: ≈50k docs per partition keeps
    * shingle partitions in the few-hundred-MB band (shingle rows ≈ token
    * count ≈ 100s-1,000s/doc at ~50 B/row), floored at 4 (pruning stays
    * observable at toy SFs) and capped at 8,192 directories (listing cost;
    * past the cap partitions grow beyond the target instead). */
  private[operators] def adaptiveNPb(nDocs: Long): Int = {
    val docsPerPartition = 50000L
    math.max(4L, math.min(8192L,
      (nDocs + docsPerPartition - 1) / docsPerPartition)).toInt
  }

  /** File count for the per-doc narrow frames (sigs: ~50 B/doc): ~8M
    * docs per file lands a few hundred MB; grows linearly past that. */
  private[operators] def smallFrameFiles(nDocs: Long): Int =
    math.max(1L, math.min(8192L, nDocs / 8000000L + 1)).toInt

  private[operators] def pb(idc: org.apache.spark.sql.Column, nPb: Int) =
    pmod(hash(idc), lit(nPb))

  /** Persist: three parquet frames + one meta row. All string/integer
    * columns — the round-trip is exact. The wide shingle store is
    * hash-partitioned on the id ([[pb]]) so [[probe]] can prune its scan
    * to candidate partitions. */
  def write(ix: MinHashIndex, dir: String): Unit = {
    val spark = ix.sigs.sparkSession
    import spark.implicits._
    // sigs are ~50 B/doc; the aggregation producing them is cached, so
    // AQE cannot coalesce its fixed shuffle.partitions output and a bare
    // write emits one near-empty file per partition. coalesce to ~8M
    // docs/file (~few hundred MB) — scale-linear, narrow (no shuffle).
    // hashes derive narrowly from the docs SCAN (its task count already
    // follows input bytes), so they are left alone — a coalesce there
    // would collapse the corpus scan itself.
    ix.sigs.coalesce(smallFrameFiles(ix.nDocs))
      .write.mode("overwrite").parquet(s"$dir/sigs")
    ix.hashes.write.mode("overwrite").parquet(s"$dir/hashes")
    // repartition on pb first: without it every write task emits a file
    // into every partition dir (tasks × nPb small files — measured 3×
    // slower to write AND to probe at sf1); with it each partition is one
    // well-sized file
    ix.shingles.withColumn("pb", pb(col("id"), ix.nPb))
      .repartition(col("pb"))
      .write.partitionBy("pb").mode("overwrite").parquet(s"$dir/shingles")
    Seq((ix.shingleN, ix.k, ix.bands, ix.nDocs, ix.nPb))
      .toDF("shingle_n", "k", "bands", "n_docs", "n_pb")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/meta")
  }

  def read(spark: SparkSession, dir: String): MinHashIndex = {
    // meta's params (shingle_n/k/bands/n_pb) are immutable per index, so
    // ANY complete snapshot is correct; n_docs is advisory. Epoch appends
    // rewrite the file in place, so a read racing a refresh can land
    // mid-overwrite — retry the listing rather than fail the read.
    val meta = {
      var out: Option[org.apache.spark.sql.Row] = None
      var attempts = 0
      while (out.isEmpty && attempts < 5) {
        attempts += 1
        try out = spark.read.parquet(s"$dir/meta").collect().headOption
        catch {
          case scala.util.control.NonFatal(e) =>
            if (attempts >= 5) throw e else Thread.sleep(100)
        }
        if (out.isEmpty && attempts < 5) Thread.sleep(100)
      }
      out.getOrElse(
        throw new IllegalStateException(s"unreadable index meta at $dir/meta"))
    }
    MinHashIndex(
      spark.read.parquet(s"$dir/sigs"),
      spark.read.parquet(s"$dir/hashes"),
      spark.read.parquet(s"$dir/shingles"),
      meta.getAs[Int]("shingle_n"), meta.getAs[Int]("k"),
      meta.getAs[Int]("bands"), meta.getAs[Long]("n_docs"),
      meta.getAs[Int]("n_pb"))
  }

  /** Screen `batch` against the indexed corpus: per batch id,
    * `exact_dup` (verbatim text exists in the corpus), `near_dup` (some
    * corpus doc within the MinHash chain at `threshold`), `keep`
    * (neither) — [[Dedup.incrementalDedup]]'s contract and bit-for-bit
    * its values (ids disjoint from the corpus; within-batch dups
    * deliberately unflagged). The bucket-size cap counts corpus+batch
    * rows together, exactly as the one-shot chain does, so capping
    * decisions cannot drift between the two forms. */
  def probe(ix: MinHashIndex, batch: DataFrame, idCol: String,
            textCol: String, threshold: Double = 0.1,
            maxBucketSize: Int = 0): DataFrame =
    probeTracked(ix, batch, idCol, textCol, threshold, maxBucketSize)._1

  /** [[probe]] plus its persisted intermediate frames, so epoch-grained
    * callers ([[gateEpoch]]) can unpersist them once the result is
    * materialized — a long-running gate would otherwise accumulate seven
    * cached frames per micro-batch until execution memory starves. */
  private[operators] def probeTracked(
      ix0: MinHashIndex, batch: DataFrame, idCol: String, textCol: String,
      threshold: Double, maxBucketSize: Int,
      excludeIds: Option[DataFrame] = None): (DataFrame, Seq[DataFrame]) = {
    // excludeIds subtracts docs from the CORPUS side before screening —
    // a no-op under the disjoint-ids contract, but it is what makes a
    // replayed [[gateEpoch]] idempotent: the replayed batch's own already
    // -indexed copies must not flag the batch against itself. Broadcast
    // anti joins: the exclusion set is one epoch's ids.
    val ix = excludeIds match {
      case Some(ids) =>
        val e = ids.select(col(ids.columns.head)
          .cast(ix0.sigs.schema("id").dataType).as("id")).distinct()
        ix0.copy(
          sigs = ix0.sigs.join(broadcast(e), Seq("id"), "left_anti"),
          hashes = ix0.hashes.join(broadcast(e), Seq("id"), "left_anti"),
          shingles = ix0.shingles.join(broadcast(e), Seq("id"), "left_anti"))
      case None => ix0
    }
    // Cached plans are exempt from AQE partition coalescing (their output
    // partitioning is frozen), so every batch-derived cached frame would
    // otherwise materialize at the session's full shuffle.partitions and
    // each of its MANY downstream consumers would pay one near-empty task
    // per partition (measured ~100 ms fixed cpu/task — at serving SFs
    // that overhead WAS the probe). Right-size them from the batch's own
    // scan parallelism instead: partitions follow input bytes (the
    // [[Scale.spread]] signal, inverted), so a micro-batch collapses to a
    // handful of tasks while a big crawl batch keeps its width. (r13)
    val pBatch = math.max(1, math.min(batch.rdd.getNumPartitions,
      batch.sparkSession.sparkContext.defaultParallelism))
    val bSh = Dedup.shingleRows(batch, idCol, textCol, ix.shingleN)
      .coalesce(pBatch)
      .persist(StorageLevel.MEMORY_AND_DISK)
    val bSigs = Dedup.minhashSignatures(bSh, idCol, ix.k, withSize = true)
      .withColumnRenamed(idCol, "id")
      .coalesce(pBatch)
      .persist(StorageLevel.MEMORY_AND_DISK)
    // Bucket PROBE, not bucket self-join: only buckets the batch touches
    // can produce a cross pair, so the corpus band rows (a narrow derive
    // over the stored sig frame) are semi-joined down to those ~|batch|·B
    // hot buckets first, and candidates come out cross-only by
    // construction — the one-shot chain's corpus×corpus candidates are
    // never even generated. The bucket-size cap counts corpus+batch rows
    // per hot bucket, exactly the one-shot total for those buckets (cold
    // buckets' caps are unobservable in its cross-restricted output), so
    // capping decisions cannot drift between the two forms.
    val rpb = ix.k / ix.bands
    val bBand = Dedup.lshBandRows(bSigs, "id", ix.bands, rpb)
      .persist(StorageLevel.MEMORY_AND_DISK)
    // no .distinct() on the semi-join probe side: a semi join dedups by
    // construction, and the distinct was one more exchange+agg per probe
    // (r13 optimization — value-identical, one less shuffle)
    val hotKeys = bBand.select(col("band"), col("band_key"))
    val cHot = Dedup.lshBandRows(ix.sigs, "id", ix.bands, rpb)
      .join(hotKeys, Seq("band", "band_key"), "left_semi")
      .persist(StorageLevel.MEMORY_AND_DISK)
    val okKeys =
      if (maxBucketSize <= 0) hotKeys
      else cHot.select(col("band"), col("band_key"))
        .unionAll(bBand.select(col("band"), col("band_key")))
        .groupBy(col("band"), col("band_key"))
        .agg(count(lit(1)).as("__n"))
        .filter(col("__n") <= maxBucketSize)
        .select(col("band"), col("band_key"))
    val cross = cHot.join(okKeys, Seq("band", "band_key"), "left_semi")
      .select(col("band"), col("band_key"), col("id").as("__cid"))
      .join(bBand.join(okKeys, Seq("band", "band_key"), "left_semi")
        .select(col("band"), col("band_key"), col("id").as("__bid")),
        Seq("band", "band_key"))
      .select(least(col("__cid"), col("__bid")).as("doc_a"),
        greatest(col("__cid"), col("__bid")).as("doc_b"))
      .distinct()
      .coalesce(pBatch) // candidate pairs are batch-bounded (see pBatch)
      // the candidate frame fans out three ways below (two id projections
      // + the verify join) and each recompute would re-run the whole
      // bucket pipeline — persist the ~|near dups|-row frame instead
      .persist(StorageLevel.MEMORY_AND_DISK)
    // verify only the candidates: the wide shingle store is cut down to
    // candidate ids before the pair-shingle intersection join (and the
    // restricted sliver persisted — jaccardForPairs reads it twice). For
    // a parquet-backed index the store is partitioned on pb = hash(id)
    // (see [[write]]); the candidate partitions are collected first — a
    // driver list bounded at nPb values — and pushed as a static
    // partition filter, so a micro-batch probe READS only the candidate
    // slivers of the index's widest frame instead of scanning it.
    // no distinct/persist: every consumer is a broadcast semi join (dedup
    // by construction) over the PERSISTED cross frame, and the identical
    // canonical subtree means the planner builds ONE broadcast relation
    // and reuses it — the old distinct+persist paid an exchange and a
    // cache round trip to shrink a few-hundred-row frame (r13)
    val candIds = cross.select(col("doc_a").as("id"))
      .unionAll(cross.select(col("doc_b").as("id")))
    val corpusCand = {
      val pruned =
        if (ix.shingles.columns.contains("pb")) {
          val pbs = candIds.select(pb(col("id"), ix.nPb).as("pb")).distinct()
            .collect().map(_.getAs[Int]("pb")).toSeq
          ix.shingles.filter(col("pb").isin(pbs: _*)).select(col("id"), col("shingle"))
        } else ix.shingles.select(col("id"), col("shingle"))
      pruned.join(candIds, Seq("id"), "left_semi")
    }
    val candSh = corpusCand
      .unionByName(bSh.withColumnRenamed(idCol, "id")
        .join(candIds, Seq("id"), "left_semi"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    // verify with the shared [[Dedup.jaccardForPairs]] over the restricted
    // sliver (an explicit broadcast reshaping of these joins was tried and
    // measured SLOWER at sf1 — each broadcast() subtree runs as its own
    // job, and three extra driver barriers cost more than the shuffles
    // they remove; at this stage count the remaining cost is scheduler
    // floor, not data)
    val allSigs = ix.sigs.unionByName(bSigs)
    val pairs = Dedup.jaccardForPairs(cross, candSh,
        "id", minJaccard = threshold,
        precomputedSizes = Some(allSigs.select(col("id"), col("n"))))
      .filter(col("jaccard") >= threshold)
    val bIds = bSigs.select(col("id"))
    val nearHit = pairs.select(col("doc_a").as("id"))
      .unionByName(pairs.select(col("doc_b").as("id")))
      .join(bIds, Seq("id"), "left_semi")
      .distinct()
    // no .distinct() on the corpus hash frame: the semi join dedups by
    // construction and the distinct was a full corpus-sized exchange+agg
    // per probe — at 100 TB the single most expensive removable shuffle
    // on this path (r13 optimization, value-identical)
    val exactHit = batch
      .join(ix.hashes.select(col("text_md5").as("__h")),
        md5(batch(textCol)) === col("__h"), "left_semi")
      .select(col(idCol).as("id"))
    val flags = batch.select(col(idCol).as("id"))
      .join(exactHit.withColumn("__e", lit(true)), Seq("id"), "left")
      .join(nearHit.withColumn("__n", lit(true)), Seq("id"), "left")
      .select(col("id").as(idCol),
        coalesce(col("__e"), lit(false)).as("exact_dup"),
        coalesce(col("__n"), lit(false)).as("near_dup"))
      .withColumn("keep", !col("exact_dup") && !col("near_dup"))
    (flags, Seq(bSh, bSigs, bBand, cHot, cross, candSh))
  }

  /** Index the delta docs into the at-rest index at `dir`: shingle/hash/
    * sign them with the FROZEN parameters from meta and commit ONLY new
    * parquet files under the three frames plus a refreshed meta row —
    * O(delta) compute, no existing file rewritten. Ids must be new (the
    * corpus append contract); appending is exactly equivalent to having
    * built over the union, because every per-doc artifact is independent
    * of every other document. Returns docs appended. */
  def appendToDir(spark: SparkSession, dir: String, docs: DataFrame,
                  idCol: String, textCol: String): Long = {
    val ix = read(spark, dir)
    val delta = build(docs, idCol, textCol, ix.shingleN, ix.k, ix.bands)
    delta.sigs.coalesce(smallFrameFiles(delta.nDocs))
      .write.mode("append").parquet(s"$dir/sigs")
    delta.hashes.write.mode("append").parquet(s"$dir/hashes")
    delta.shingles.withColumn("pb", pb(col("id"), ix.nPb))
      .repartition(col("pb"))
      .write.partitionBy("pb").mode("append").parquet(s"$dir/shingles")
    import spark.implicits._
    Seq((ix.shingleN, ix.k, ix.bands, ix.nDocs + delta.nDocs, ix.nPb))
      .toDF("shingle_n", "k", "bands", "n_docs", "n_pb")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/meta")
    delta.nDocs
  }

  /** Stage `df` as one parquet file and rename it onto the DETERMINISTIC
    * destination — the idempotent-commit primitive [[gateEpoch]] builds
    * on (same recipe as `VectorIndex.appendEpoch`): a replay re-stages
    * the same rows onto the same name, so crashed commits converge. */
  private[operators] def commitOne(spark: SparkSession, df: DataFrame, stageDir: String,
                        dst: org.apache.hadoop.fs.Path): Unit = {
    val conf = spark.sparkContext.hadoopConfiguration
    val fs = dst.getFileSystem(conf)
    df.coalesce(1).write.mode("overwrite").parquet(stageDir)
    val part = fs.listStatus(new org.apache.hadoop.fs.Path(stageDir))
      .map(_.getPath).filter(_.getName.endsWith(".parquet"))
    require(part.length == 1, s"expected one staged file, got ${part.length}")
    fs.mkdirs(dst.getParent)
    val fc = org.apache.hadoop.fs.FileContext.getFileContext(dst.toUri, conf)
    fc.rename(part.head, dst, org.apache.hadoop.fs.Options.Rename.OVERWRITE)
    fs.delete(new org.apache.hadoop.fs.Path(stageDir), true)
  }

  /** As [[commitOne]] for the pb-partitioned shingle store: stage the
    * delta partitioned, then rename each partition's single file onto
    * `<root>/pb=X/<tag>-0.parquet`. Destinations are deterministic given
    * the delta, so replays converge file-by-file. */
  private[operators] def commitShingles(spark: SparkSession, df: DataFrame,
                             stageDir: String, dstRoot: String,
                             tag: String): Unit = {
    val conf = spark.sparkContext.hadoopConfiguration
    val root = new org.apache.hadoop.fs.Path(dstRoot)
    val fs = root.getFileSystem(conf)
    df.repartition(col("pb"))
      .write.partitionBy("pb").mode("overwrite").parquet(stageDir)
    val fc = org.apache.hadoop.fs.FileContext.getFileContext(root.toUri, conf)
    fs.listStatus(new org.apache.hadoop.fs.Path(stageDir))
      .map(_.getPath).filter(_.getName.startsWith("pb="))
      .foreach { pdir =>
        val part = fs.listStatus(pdir).map(_.getPath)
          .filter(_.getName.endsWith(".parquet"))
        require(part.length == 1,
          s"expected one staged file per partition, got ${part.length} in $pdir")
        val dst = new org.apache.hadoop.fs.Path(root,
          s"${pdir.getName}/$tag-0.parquet")
        fs.mkdirs(dst.getParent)
        fc.rename(part.head, dst, org.apache.hadoop.fs.Options.Rename.OVERWRITE)
      }
    fs.delete(new org.apache.hadoop.fs.Path(stageDir), true)
  }

  /** One exactly-once unit of the streaming dedup gate: screen the
    * micro-batch against the index at `dir`, commit the KEPT docs (full
    * batch columns) as `outDir/e<epochId>-0.parquet`, then index them —
    * so later batches dedup against earlier batches, not just the build
    * corpus. The `_epochs/<id>` marker is written last; replays of a
    * committed epoch are marker-detected no-ops, and a crash anywhere
    * before the marker replays onto the same deterministic file names
    * and converges ([[commitOne]]/[[commitShingles]]). Returns false for
    * a marker-detected replay.
    *
    * The kept docs are re-read from the COMMITTED output file before
    * indexing: the probe's frames are lazy, and evaluating them after
    * the index has been appended to would let a batch doc see its own
    * corpus copy (its md5 now in `hashes`) and flag itself. */
  def gateEpoch(spark: SparkSession, dir: String, epochId: Long,
                batch: DataFrame, idCol: String, textCol: String,
                outDir: String, threshold: Double = 0.1,
                maxBucketSize: Int = 0): Boolean = {
    import spark.implicits._
    val conf = spark.sparkContext.hadoopConfiguration
    val fs = new org.apache.hadoop.fs.Path(dir).getFileSystem(conf)
    val marker = new org.apache.hadoop.fs.Path(dir, s"_epochs/$epochId")
    if (fs.exists(marker)) return false
    val ix = read(spark, dir)
    // the batch's own ids are excluded from the corpus side: on a replay
    // of a crashed-after-append epoch the batch is already indexed, and
    // without the exclusion it would flag itself dup and commit an EMPTY
    // epoch file over its own previous output
    val (flags, handles) = probeTracked(ix, batch, idCol, textCol,
      threshold, maxBucketSize, excludeIds = Some(batch.select(col(idCol))))
    val kept = batch.join(flags.filter(col("keep")).select(col(idCol)),
      Seq(idCol), "left_semi")
    commitOne(spark, kept, s"$outDir/_stage/e$epochId",
      new org.apache.hadoop.fs.Path(outDir, s"e$epochId-0.parquet"))
    handles.foreach(_.unpersist())
    val keptDf = spark.read
      .parquet(s"$outDir/e$epochId-0.parquet")
    val delta = build(keptDf, idCol, textCol, ix.shingleN, ix.k, ix.bands)
    commitOne(spark, delta.sigs, s"$dir/_stage/e$epochId-sigs",
      new org.apache.hadoop.fs.Path(dir, s"sigs/e$epochId-0.parquet"))
    commitOne(spark, delta.hashes, s"$dir/_stage/e$epochId-hashes",
      new org.apache.hadoop.fs.Path(dir, s"hashes/e$epochId-0.parquet"))
    commitShingles(spark, delta.shingles.withColumn("pb", pb(col("id"), ix.nPb)),
      s"$dir/_stage/e$epochId-shingles", s"$dir/shingles", s"e$epochId")
    delta.sigs.unpersist(); delta.shingles.unpersist()
    // best-effort: a reader racing this overwrite retries ([[read]]), and
    // losing the refresh only staleness n_docs (advisory) — params are
    // immutable and every rewrite carries the same values
    try {
      val n = spark.read.parquet(s"$dir/hashes").count()
      Seq((ix.shingleN, ix.k, ix.bands, n, ix.nPb))
        .toDF("shingle_n", "k", "bands", "n_docs", "n_pb")
        .coalesce(1).write.mode("overwrite").parquet(s"$dir/meta")
    } catch { case scala.util.control.NonFatal(_) => () }
    try {
      val out = fs.create(marker, false)
      try out.write(s"e$epochId".getBytes("UTF-8")) finally out.close()
      true
    } catch {
      // a concurrent writer of the SAME epoch won the marker race — its
      // frames derive from the same committed kept file with the same
      // frozen params, so the content is identical (see [[DedupIndexOcc]])
      case _: java.io.IOException => false
    }
  }

  /** The streaming at-ingest dedup gate: every micro-batch of documents
    * is screened against the index at `dir` and only novel docs flow to
    * `outDir`, which then immediately count as corpus for the NEXT batch
    * — checkpointed source offsets + the epoch marker give exactly-once
    * gate output and index contents across restarts and replays, the
    * same two-sided idempotency contract as `VectorIndex.maintainStream`.
    * The prefix-hash `CurationStream.streamingIncrementalDedup` is the
    * low-latency screen; this gate is the full-fidelity MinHash one. */
  def gateStream(spark: SparkSession, dir: String, docStream: DataFrame,
                 idCol: String, textCol: String, outDir: String,
                 threshold: Double = 0.1,
                 maxBucketSize: Int = 0): DataStreamWriter[Row] =
    docStream.writeStream.foreachBatch { (batch: DataFrame, epochId: Long) =>
      if (!batch.isEmpty) {
        gateEpoch(spark, dir, epochId, batch, idCol, textCol, outDir,
          threshold, maxBucketSize); ()
      }
    }

  /** Maintenance compaction: epoch-grained appends accumulate one file
    * per frame per epoch (and up to one per touched pb partition in the
    * shingle store) — re-write each store at its ideal layout and swap
    * via rename, the same maintenance cadence as `LogFormat.roll` /
    * `VectorIndex.vacuum`. Values are untouched; readers mid-swap retry
    * on their next [[read]] (single-maintainer window, like [[write]]). */
  def compact(spark: SparkSession, dir: String): Unit = {
    val conf = spark.sparkContext.hadoopConfiguration
    val fs = new org.apache.hadoop.fs.Path(dir).getFileSystem(conf)
    val fc = org.apache.hadoop.fs.FileContext
      .getFileContext(new org.apache.hadoop.fs.Path(dir).toUri, conf)
    def swap(frame: String)(writeStage: (DataFrame, String) => Unit): Unit = {
      val cur = spark.read.parquet(s"$dir/$frame")
      writeStage(cur, s"$dir/_stage/c-$frame")
      val live = new org.apache.hadoop.fs.Path(dir, frame)
      val old = new org.apache.hadoop.fs.Path(dir, s"$frame.old")
      fc.rename(live, old, org.apache.hadoop.fs.Options.Rename.OVERWRITE)
      fc.rename(new org.apache.hadoop.fs.Path(s"$dir/_stage/c-$frame"), live)
      fs.delete(old, true)
    }
    swap("sigs")((df, p) => df.coalesce(1).write.mode("overwrite").parquet(p))
    swap("hashes")((df, p) => df.coalesce(1).write.mode("overwrite").parquet(p))
    val meta = spark.read.parquet(s"$dir/meta").collect().head
    val nPb = meta.getAs[Int]("n_pb")
    swap("shingles")((df, p) => df.drop("pb")
      .withColumn("pb", pb(col("id"), nPb)).repartition(col("pb"))
      .write.partitionBy("pb").mode("overwrite").parquet(p))
    fs.delete(new org.apache.hadoop.fs.Path(dir, "_stage"), true)
  }
}
