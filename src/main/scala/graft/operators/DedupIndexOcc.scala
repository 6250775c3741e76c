package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.pipeline.Occ

/** CONCURRENT maintenance for persisted MinHash dedup indexes — the
  * [[VectorIndexOcc]] generation protocol applied to [[DedupIndex]]:
  * `<root>/v=N/` holds a complete index (sigs/hashes/shingles/meta +
  * per-epoch files and `_epochs` markers), the `_reserve`/`_commits`/
  * `_CURRENT` commit log lives at `<root>` ([[Occ]]).
  *
  * Roles: ONE gate stream appends epochs ([[gateEpoch]], the at-ingest
  * dedup gate) with the generation-handoff loop; ANY number of compactors
  * ([[compact]]) publish new generations with `expectedBase` conflict
  * retry, pinned snapshots, and a pre-/post-commit epoch carry. The gate
  * topology is one stream per index root — that is already the natural
  * streaming shape (sources merge upstream of the gate), and it is what
  * makes a re-applied epoch deterministic: the corpus an epoch is probed
  * against is identical on every application, because only earlier epochs
  * and reorganizing maintainers ever touched it.
  *
  * The carry does NOT copy the base generation's epoch files: it
  * RE-DERIVES the epoch's frames from the gate's committed output file
  * (`<outDir>/e<epoch>-0.parquet`, the system of record for what the gate
  * kept) with the frozen index parameters — byte-for-byte the computation
  * `DedupIndex.gateEpoch` itself performs after committing the kept set.
  * A carry and the appender's own handoff re-apply therefore produce
  * IDENTICAL frame content on identical deterministic file names, so
  * whoever wins the marker race, the index converges. */
object DedupIndexOcc {

  private val EpochFile = """e(\d+)-0\.parquet""".r

  def currentGen(spark: SparkSession, root: String): Int =
    Occ.committedVersion(spark, root).getOrElse(
      throw new IllegalStateException(s"no committed index generation at $root"))

  private def genDir(root: String, n: Int): String = Occ.versionDir(root, n)

  /** Publish a freshly built index as a new generation. */
  def publish(ix: MinHashIndex, root: String, retain: Int = 1): Int =
    Occ.publishDir(ix.sigs.sparkSession, root, retain)(dir =>
      DedupIndex.write(ix, dir))

  /** Reload the current committed generation. */
  def read(spark: SparkSession, root: String): MinHashIndex =
    DedupIndex.read(spark, genDir(root, currentGen(spark, root)))

  /** Screen a batch against the current committed generation. */
  def probe(spark: SparkSession, root: String, batch: DataFrame,
            idCol: String, textCol: String, threshold: Double = 0.1,
            maxBucketSize: Int = 0): DataFrame =
    DedupIndex.probe(read(spark, root), batch, idCol, textCol,
      threshold, maxBucketSize)

  private def epochMarkers(spark: SparkSession, dir: String): Set[Long] = {
    val fs = Occ.hadoopFs(spark, dir)
    val p = new org.apache.hadoop.fs.Path(dir, "_epochs")
    if (!fs.exists(p)) Set.empty
    else fs.listStatus(p).flatMap(_.getPath.getName.toLongOption).toSet
  }

  /** Exactly-once gate epoch with generation handoff: gate the batch in
    * the current generation, then re-resolve and re-apply until stable —
    * [[VectorIndexOcc.appendEpoch]]'s loop with `DedupIndex.gateEpoch` as
    * the unit. A generation that already carries the epoch marker-skips
    * the re-apply. */
  def gateEpoch(spark: SparkSession, root: String, epochId: Long,
                batch: DataFrame, idCol: String, textCol: String,
                outDir: String, threshold: Double = 0.1,
                maxBucketSize: Int = 0): Boolean = {
    var gen = currentGen(spark, root)
    var applied = false
    var settled = false
    while (!settled) {
      applied |= DedupIndex.gateEpoch(spark, genDir(root, gen), epochId,
        batch, idCol, textCol, outDir, threshold, maxBucketSize)
      val now = currentGen(spark, root)
      if (now == gen) settled = true else gen = now
    }
    applied
  }

  /** The streaming gate against a generation-versioned index root. */
  def gateStream(spark: SparkSession, root: String, docStream: DataFrame,
                 idCol: String, textCol: String, outDir: String,
                 threshold: Double = 0.1, maxBucketSize: Int = 0) =
    docStream.writeStream.foreachBatch {
      (batch: DataFrame, epochId: Long) =>
        if (!batch.isEmpty) {
          gateEpoch(spark, root, epochId, batch, idCol, textCol, outDir,
            threshold, maxBucketSize); ()
        }
    }

  /** Marker-covered files of one flat frame dir at snapshot time. */
  private def frameSnapshot(fs: org.apache.hadoop.fs.FileSystem, dir: String,
                            frame: String, epochs: Set[Long]): Seq[String] =
    fs.listStatus(new org.apache.hadoop.fs.Path(dir, frame))
      .map(_.getPath).filter(_.getName.endsWith(".parquet"))
      .filter(p => p.getName match {
        case EpochFile(e) => epochs.contains(e.toLong)
        case _            => true
      })
      .map(_.toString).toSeq.sorted

  /** Marker-covered files of the pb-partitioned shingle store. */
  private def shingleSnapshot(fs: org.apache.hadoop.fs.FileSystem, dir: String,
                              epochs: Set[Long]): Seq[String] = {
    val root = new org.apache.hadoop.fs.Path(dir, "shingles")
    fs.listStatus(root).filter(_.getPath.getName.startsWith("pb="))
      .flatMap(p => fs.listStatus(p.getPath))
      .map(_.getPath).filter(_.getName.endsWith(".parquet"))
      .filter(p => p.getName match {
        case EpochFile(e) => epochs.contains(e.toLong)
        case _            => true
      })
      .map(_.toString).toSeq.sorted
  }

  /** Re-index one committed gate epoch into `newDir` — identical to the
    * indexing half of `DedupIndex.gateEpoch`, driven from the gate's
    * committed output file with `newDir`'s frozen params. Idempotent
    * against the appender's own re-apply (same deterministic names,
    * marker race tolerated inside commitOne's rename-overwrite + the
    * exclusive marker create). */
  private def carryEpoch(spark: SparkSession, newDir: String, outDir: String,
                         epochId: Long, idCol: String, textCol: String): Unit = {
    val fs = Occ.hadoopFs(spark, newDir)
    val marker = new org.apache.hadoop.fs.Path(newDir, s"_epochs/$epochId")
    if (fs.exists(marker)) return
    val ix = DedupIndex.read(spark, newDir)
    val keptDf = spark.read.parquet(s"$outDir/e$epochId-0.parquet")
    val delta = DedupIndex.build(keptDf, idCol, textCol, ix.shingleN, ix.k, ix.bands)
    DedupIndex.commitOne(spark, delta.sigs, s"$newDir/_stage/e$epochId-sigs",
      new org.apache.hadoop.fs.Path(newDir, s"sigs/e$epochId-0.parquet"))
    DedupIndex.commitOne(spark, delta.hashes, s"$newDir/_stage/e$epochId-hashes",
      new org.apache.hadoop.fs.Path(newDir, s"hashes/e$epochId-0.parquet"))
    DedupIndex.commitShingles(spark,
      delta.shingles.withColumn("pb", DedupIndex.pb(col("id"), ix.nPb)),
      s"$newDir/_stage/e$epochId-shingles", s"$newDir/shingles", s"e$epochId")
    delta.sigs.unpersist(); delta.shingles.unpersist()
    try {
      val out = fs.create(marker, false)
      try out.write(s"e$epochId".getBytes("UTF-8")) finally out.close()
    } catch { case _: java.io.IOException => () /* appender's re-apply won */ }
  }

  private def carryMissing(spark: SparkSession, baseDir: String,
                           newDir: String, outDir: String,
                           idCol: String, textCol: String): Unit =
    (epochMarkers(spark, baseDir) -- epochMarkers(spark, newDir))
      .toSeq.sorted.foreach(carryEpoch(spark, newDir, outDir, _, idCol, textCol))

  /** Small-files maintenance as a new generation: rewrite the snapshot's
    * three frames at their ideal layout (`DedupIndex.compact`'s shape),
    * carry late-landing gate epochs before AND after the commit, retry
    * from the new head on maintainer conflict. `outDir` is the gate's
    * output store — the epoch system of record the carry re-indexes from.
    * Returns the committed generation. */
  def compact(spark: SparkSession, root: String, outDir: String,
              idCol: String, textCol: String, retain: Int = 1): Int = {
    import spark.implicits._
    var committed = -1
    var lastBase: String = null
    while (committed < 0) {
      val baseGen = currentGen(spark, root)
      val baseDir = genDir(root, baseGen)
      lastBase = baseDir
      val fs = Occ.hadoopFs(spark, baseDir)
      val epochs = epochMarkers(spark, baseDir)
      val sigF = frameSnapshot(fs, baseDir, "sigs", epochs)
      val hashF = frameSnapshot(fs, baseDir, "hashes", epochs)
      val shF = shingleSnapshot(fs, baseDir, epochs)
      try {
        committed = Occ.publishDir(spark, root, retain, Some(baseGen)) { newDir =>
          val ix = DedupIndex.read(spark, baseDir) // params only
          val sigs = spark.read.parquet(sigF: _*)
          val hashes = spark.read.parquet(hashF: _*)
          val shingles = spark.read.option("basePath", s"$baseDir/shingles")
            .parquet(shF: _*)
          sigs.coalesce(1).write.mode("overwrite").parquet(s"$newDir/sigs")
          hashes.coalesce(1).write.mode("overwrite").parquet(s"$newDir/hashes")
          shingles.drop("pb")
            .withColumn("pb", DedupIndex.pb(col("id"), ix.nPb))
            .repartition(col("pb"))
            .write.partitionBy("pb").mode("overwrite").parquet(s"$newDir/shingles")
          Seq((ix.shingleN, ix.k, ix.bands,
              spark.read.parquet(s"$newDir/hashes").count(), ix.nPb))
            .toDF("shingle_n", "k", "bands", "n_docs", "n_pb")
            .coalesce(1).write.mode("overwrite").parquet(s"$newDir/meta")
          val nfs = Occ.hadoopFs(spark, newDir)
          epochs.foreach { e => // snapshot-covered epochs ride in the rewrite
            Occ.atomicCreate(nfs,
              new org.apache.hadoop.fs.Path(newDir, s"_epochs/$e"), s"e$e"); ()
          }
          carryMissing(spark, baseDir, newDir, outDir, idCol, textCol)
        }
      } catch { case _: java.util.ConcurrentModificationException => () }
    }
    carryMissing(spark, lastBase, genDir(root, committed), outDir, idCol, textCol)
    committed
  }
}
