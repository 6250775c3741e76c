package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.pipeline.Occ

/** CONCURRENT maintenance for persisted IVF-PQ indexes — the multi-writer
  * story [[VectorIndex]]'s single-maintainer lifecycle (staged-rename swap
  * windows in `retrain`/`vacuum`) deliberately leaves out, built on the
  * same `_reserve`/`_commits`/`_CURRENT` commit log as versioned gold
  * ([[Occ]], the `Medallion.publishGoldOcc` protocol).
  *
  * Layout: `<root>/v=N/` holds a complete immutable-once-committed
  * [[VectorIndex]] directory (codes/centroids/codebook/meta, per-epoch
  * code files + `_epochs` markers); the OCC markers live at `<root>`.
  * Three writer roles compose without locks:
  *
  *  - APPENDERS ([[appendEpoch]]) land O(delta) epoch files INSIDE the
  *    current generation — no version bump, no conflict with each other
  *    (deterministic per-epoch file names + exclusive epoch markers make
  *    replays and same-epoch races no-ops). After landing an epoch the
  *    appender re-resolves the current generation and re-applies until it
  *    is stable — the HANDOFF loop that closes the race where a
  *    maintainer committed a new generation built from a snapshot taken
  *    before this epoch arrived. An appender that crashes mid-handoff is
  *    covered by its source replay (streaming checkpoints re-run the
  *    epoch until appendEpoch RETURNS — the same two-sided contract as
  *    `VectorIndex.maintainStream`).
  *  - MAINTAINERS ([[compact]], [[retrain]]) publish whole new
  *    generations through [[Occ.publishDir]] with `expectedBase` conflict
  *    detection: two concurrent maintainers both make progress, commits
  *    serialize, the loser rebuilds from the winner's generation. A
  *    maintainer reads a DEFINED snapshot — the epoch-marker set is
  *    listed first and the codes read is pinned to exactly the files
  *    those markers cover (an epoch file whose marker is not yet visible
  *    is left for the carry pass) — then CARRIES epochs that landed in
  *    the base generation during its build: once before committing and
  *    once after (the post-commit sweep), so an epoch is never lost to
  *    the commit-point race. Carried markers make the carry idempotent
  *    against the appender's own handoff re-apply.
  *  - DELETERS ([[deleteIds]]) tombstone in the current generation with
  *    the same handoff loop; maintainers apply snapshot tombstones in the
  *    rebuild and re-apply post-snapshot ones in the sweep.
  *
  * Readers ([[read]]) resolve max(`_commits`) and always see a complete
  * committed snapshot — there is no mid-swap retry window at all, which
  * is the point of versioned directories over in-place renames.
  *
  * 100 TB shape: appends stay O(delta) PUT-shaped, a generation commit is
  * one exclusive marker create (conditional PUT on object stores), and
  * the only data moved twice is the epochs that raced a maintainer's
  * build window — bounded by ingest rate × build time, not by corpus
  * size. Convergence under two compactors + one appender + a retrainer is
  * pinned by VectorIndexOccSpec. */
object VectorIndexOcc {

  /** Everything a maintainer's rebuild may read, pinned at listing time:
    * the base generation, the codes files covered by then-visible epoch
    * markers (plus the original build's part files), the tombstone files,
    * and the covered epoch ids. */
  final case class Snapshot(baseGen: Int, baseDir: String,
                            codesFiles: Seq[String], tombFiles: Seq[String],
                            epochs: Set[Long])

  private val EpochFile = """e(\d+)-0\.parquet""".r

  def currentGen(spark: SparkSession, root: String): Int =
    Occ.committedVersion(spark, root).getOrElse(
      throw new IllegalStateException(s"no committed index generation at $root"))

  private def genDir(root: String, n: Int): String = Occ.versionDir(root, n)

  /** Publish a freshly built index as the first (or a blind new)
    * generation. */
  def publish(ix: IvfPqIndex, root: String, retain: Int = 1): Int =
    Occ.publishDir(ix.codes.sparkSession, root, retain)(dir =>
      VectorIndex.write(ix, dir))

  /** Reload the current committed generation. */
  def read(spark: SparkSession, root: String): IvfPqIndex =
    VectorIndex.read(spark, genDir(root, currentGen(spark, root)))

  /** Serve against the current committed generation. */
  def topK(spark: SparkSession, root: String, queries: DataFrame,
           idCol: String, vecCol: String, k: Int, nProbe: Int): DataFrame =
    VectorIndex.topK(read(spark, root), queries, idCol, vecCol, k, nProbe)

  private def epochMarkers(spark: SparkSession, dir: String): Set[Long] = {
    val fs = Occ.hadoopFs(spark, dir)
    val p = new org.apache.hadoop.fs.Path(dir, "_epochs")
    if (!fs.exists(p)) Set.empty
    else fs.listStatus(p).flatMap(_.getPath.getName.toLongOption).toSet
  }

  /** Exactly-once epoch append with generation handoff: land the epoch in
    * the current generation, then re-resolve and re-apply until the
    * generation is stable — any generation committed mid-append either
    * carried the epoch (marker present → no-op) or receives it here.
    * Returns true if any application actually committed rows. */
  def appendEpoch(spark: SparkSession, root: String, epochId: Long,
                  delta: DataFrame, idCol: String, vecCol: String): Boolean = {
    var gen = currentGen(spark, root)
    var applied = false
    var settled = false
    while (!settled) {
      applied |= VectorIndex.appendEpoch(spark, genDir(root, gen), epochId,
        delta, idCol, vecCol)
      val now = currentGen(spark, root)
      if (now == gen) settled = true else gen = now
    }
    applied
  }

  /** Tombstone-delete with the same handoff loop as [[appendEpoch]]
    * (deleteIds is idempotent, so re-applying to a newer generation is
    * safe). Returns rows deleted from the last generation applied to. */
  def deleteIds(spark: SparkSession, root: String, ids: DataFrame,
                idCol: String): Long = {
    var gen = currentGen(spark, root)
    var n = 0L
    var settled = false
    while (!settled) {
      n = VectorIndex.deleteIds(spark, genDir(root, gen), ids, idCol)
      val now = currentGen(spark, root)
      if (now == gen) settled = true else gen = now
    }
    n
  }

  /** Pin the maintainer's input: list epoch markers FIRST, then admit only
    * codes files those markers cover (an epoch file already renamed but
    * not yet marked belongs to an in-flight append — the carry pass or the
    * appender's handoff will deliver it to the new generation). */
  private def snapshot(spark: SparkSession, root: String): Snapshot = {
    val gen = currentGen(spark, root)
    val dir = genDir(root, gen)
    val fs = Occ.hadoopFs(spark, dir)
    val epochs = epochMarkers(spark, dir)
    val codes = fs.listStatus(new org.apache.hadoop.fs.Path(dir, "codes"))
      .map(_.getPath).filter(_.getName.endsWith(".parquet"))
      .filter(p => p.getName match {
        case EpochFile(e) => epochs.contains(e.toLong)
        case _            => true
      })
      .map(_.toString).toSeq.sorted
    val tombP = new org.apache.hadoop.fs.Path(dir, "_tombstones")
    val tombs = if (!fs.exists(tombP)) Seq.empty[String]
      else fs.listStatus(tombP).map(_.getPath)
        .filter(_.getName.endsWith(".parquet")).map(_.toString).toSeq.sorted
    Snapshot(gen, dir, codes, tombs, epochs)
  }

  /** Snapshot codes minus snapshot tombstones — the live row set a rebuild
    * derives from. */
  private def liveSnapshotCodes(spark: SparkSession, s: Snapshot): DataFrame = {
    val codes = spark.read.parquet(s.codesFiles: _*)
    if (s.tombFiles.isEmpty) codes
    else codes.join(broadcast(spark.read.parquet(s.tombFiles: _*)),
      Seq("id"), "left_anti")
  }

  /** Stage `rows` as one file and rename it onto the deterministic epoch
    * destination in `newDir`, then mark — the carry twin of
    * `VectorIndex.appendEpoch`'s commit, idempotent against the appender's
    * own handoff re-apply (identical content, marker race tolerated). */
  private def commitCarried(spark: SparkSession, newDir: String,
                            epochId: Long, rows: DataFrame): Unit = {
    val conf = spark.sparkContext.hadoopConfiguration
    val fs = Occ.hadoopFs(spark, newDir)
    val marker = new org.apache.hadoop.fs.Path(newDir, s"_epochs/$epochId")
    if (fs.exists(marker)) return
    val staged = s"$newDir/_stage/carry$epochId"
    rows.coalesce(1).write.mode("overwrite").parquet(staged)
    val part = fs.listStatus(new org.apache.hadoop.fs.Path(staged))
      .map(_.getPath).filter(_.getName.endsWith(".parquet"))
    require(part.length == 1, s"expected one staged file, got ${part.length}")
    val dst = new org.apache.hadoop.fs.Path(newDir, s"codes/e$epochId-0.parquet")
    val fc = org.apache.hadoop.fs.FileContext.getFileContext(dst.toUri, conf)
    fc.rename(part.head, dst, org.apache.hadoop.fs.Options.Rename.OVERWRITE)
    fs.delete(new org.apache.hadoop.fs.Path(staged), true)
    try {
      val out = fs.create(marker, false)
      try out.write(s"e$epochId".getBytes("UTF-8")) finally out.close()
    } catch { case _: java.io.IOException => () /* appender's re-apply won */ }
  }

  /** Carry every base-generation epoch not yet present in `newDir`. */
  private def carryMissing(spark: SparkSession, s: Snapshot, newDir: String)(
      carrier: Long => DataFrame): Unit = {
    val have = epochMarkers(spark, newDir)
    (epochMarkers(spark, s.baseDir) -- have).toSeq.sorted.foreach { e =>
      commitCarried(spark, newDir, e, carrier(e))
    }
  }

  /** Re-apply tombstones added to the base generation after the snapshot
    * (idempotent: deleteIds intersects with live rows). */
  private def carryTombstones(spark: SparkSession, s: Snapshot,
                              newDir: String): Unit = {
    val fs = Occ.hadoopFs(spark, s.baseDir)
    if (fs.exists(new org.apache.hadoop.fs.Path(s.baseDir, "_tombstones"))) {
      val t = spark.read.parquet(s"${s.baseDir}/_tombstones")
      VectorIndex.deleteIds(spark, newDir, t, "id"); ()
    }
  }

  /** Conflict-retried generation publish with epoch carry: rebuild from a
    * pinned snapshot, copy the snapshot-covered epoch markers, carry
    * late-landing epochs pre-commit, commit with `expectedBase`, then
    * sweep once more post-commit — the pair of carries that makes the
    * commit-point race lossless. Retries from the new head on conflict. */
  private def maintain(spark: SparkSession, root: String, retain: Int)(
      rebuild: (Snapshot, String) => Unit)(
      carrier: (Snapshot, String) => Long => DataFrame): Int = {
    var committed = -1
    var snap: Snapshot = null
    while (committed < 0) {
      val s = snapshot(spark, root)
      snap = s
      try {
        committed = Occ.publishDir(spark, root, retain, Some(s.baseGen)) { newDir =>
          rebuild(s, newDir)
          val fs = Occ.hadoopFs(spark, newDir)
          s.epochs.foreach { e => // snapshot-covered epochs ride in the rebuild
            Occ.atomicCreate(fs,
              new org.apache.hadoop.fs.Path(newDir, s"_epochs/$e"), s"e$e"); ()
          }
          carryMissing(spark, s, newDir)(carrier(s, newDir))
        }
      } catch { case _: java.util.ConcurrentModificationException => () }
    }
    val newDir = genDir(root, committed)
    carryMissing(spark, snap, newDir)(carrier(snap, newDir))
    carryTombstones(spark, snap, newDir)
    committed
  }

  /** Small-files + tombstone maintenance as a new generation: rewrite the
    * snapshot's live codes at `targetFiles`, quantizers untouched.
    * Late-landing epochs carry by file copy — same frozen quantizers, the
    * rows are already correct. Subsumes `VectorIndex.vacuum` (tombstones
    * are applied, the new generation starts with none). */
  def compact(spark: SparkSession, root: String, targetFiles: Int = 1,
              retain: Int = 1): Int =
    maintain(spark, root, retain) { (s, newDir) =>
      val base = VectorIndex.read(spark, s.baseDir) // centroids + codebook
      val live = liveSnapshotCodes(spark, s)
      VectorIndex.write(
        IvfPqIndex(live.repartition(targetFiles), base.centroids, base.codebook,
          live.count(), base.nCells, base.residual),
        newDir)
    } { (s, _) => e =>
      spark.read.parquet(s"${s.baseDir}/codes/e$e-0.parquet")
    }

  /** Drift repair as a new generation: re-derive quantizers from the
    * snapshot's live ids (raw vectors from `emb`, the embedding store —
    * PQ codes are lossy, `VectorIndex.retrain`'s contract) and re-encode.
    * Late-landing epochs carry by RE-ENCODING their ids against the new
    * quantizers — a codes copy would mix quantizer generations. */
  def retrain(spark: SparkSession, root: String, emb: DataFrame,
              idCol: String, vecCol: String,
              nCells: Int = 32, m: Int = 16, ks: Int = 64,
              trainIters: Int = 1, retain: Int = 1): Int =
    maintain(spark, root, retain) { (s, newDir) =>
      val liveIds = liveSnapshotCodes(spark, s).select(col("id").as(idCol))
      // encoding scheme is part of the artifact — a new generation keeps it
      val fresh = VectorIndex.build(emb.join(liveIds, Seq(idCol), "left_semi"),
        idCol, vecCol, nCells, m, ks, trainIters,
        residual = VectorIndex.read(spark, s.baseDir).residual)
      VectorIndex.write(fresh, newDir)
      fresh.codes.unpersist(); fresh.centroids.unpersist(); ()
    } { (s, newDir) => e =>
      val newIx = VectorIndex.read(spark, newDir)
      val ids = spark.read.parquet(s"${s.baseDir}/codes/e$e-0.parquet")
        .select(col("id").as(idCol))
      // late-landing epochs re-encode through the shared append core, so
      // residual generations subtract the NEW centroids like build did
      VectorIndex.encodeWith(newIx, emb.join(ids, Seq(idCol), "left_semi"),
        idCol, vecCol)
    }
}
