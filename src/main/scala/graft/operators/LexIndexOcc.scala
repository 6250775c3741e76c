package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.pipeline.Occ

/** CONCURRENT maintenance for persisted BM25 lexical indexes — the
  * [[VectorIndexOcc]]/[[DedupIndexOcc]] generation protocol applied to
  * [[LexIndex]]: `<root>/v=N/` holds a complete index
  * (postings/doclen/meta + `_epochs` markers), the
  * `_reserve`/`_commits`/`_CURRENT` commit log lives at `<root>`
  * ([[Occ]]). This closes the round-9 gap: the lexical family had only
  * single-maintainer `compact`/`appendToDir` with staged-rename windows.
  *
  * Roles: ONE appender indexes corpus epochs ([[appendEpoch]]) with the
  * generation-handoff loop; ANY number of compactors ([[compact]])
  * publish new generations with `expectedBase` conflict retry, pinned
  * snapshots, and a pre-/post-commit epoch carry.
  *
  * Why the lex index fits the protocol especially cleanly: per-document
  * postings/doclen rows are independent of every other document, df is
  * derived at QUERY time from postings already in hand, and the two meta
  * constants (n_docs, tot_len) are additive integers. So an epoch's
  * contribution is three sets of files whose CONTENT depends only on the
  * epoch's committed docs and the frozen params — never on what other
  * epochs landed first — and meta deltas commit as separate per-epoch
  * rows ([[LexIndex.read]] sums them), eliminating the one
  * read-modify-write the single-maintainer `appendToDir` performed.
  *
  * The carry RE-DERIVES an epoch's frames from the appender's committed
  * output file (`<outDir>/e<epoch>-0.parquet`, the system of record)
  * with the frozen index params — byte-for-byte the computation
  * [[appendEpoch]] itself performs, on identical deterministic file
  * names, so whoever wins a marker race the index converges
  * (LexIndexOccSpec pins appender + two concurrent compactors against a
  * from-scratch build of the union corpus).
  */
object LexIndexOcc {

  private val EpochFile = """e(\d+)-0\.parquet""".r

  def currentGen(spark: SparkSession, root: String): Int =
    Occ.committedVersion(spark, root).getOrElse(
      throw new IllegalStateException(s"no committed index generation at $root"))

  private def genDir(root: String, n: Int): String = Occ.versionDir(root, n)

  /** Publish a freshly built index as generation 1 (or a successor). */
  def publish(ix: Bm25Index, root: String, retain: Int = 1): Int =
    Occ.publishDir(ix.postings.sparkSession, root, retain)(dir =>
      LexIndex.write(ix, dir))

  /** Reload the current committed generation. */
  def read(spark: SparkSession, root: String): Bm25Index =
    LexIndex.read(spark, genDir(root, currentGen(spark, root)))

  /** Query the current committed generation ([[LexIndex.query]]). */
  def query(spark: SparkSession, root: String, queries: DataFrame,
            queryIdCol: String, queryTextCol: String, k: Int,
            k1: Double = 1.2, b: Double = 0.75): DataFrame =
    LexIndex.query(read(spark, root), queries, queryIdCol, queryTextCol,
      k, k1, b)

  private def epochMarkers(spark: SparkSession, dir: String): Set[Long] = {
    val fs = Occ.hadoopFs(spark, dir)
    val p = new org.apache.hadoop.fs.Path(dir, "_epochs")
    if (!fs.exists(p)) Set.empty
    else fs.listStatus(p).flatMap(_.getPath.getName.toLongOption).toSet
  }

  /** [[DedupIndex.commitShingles]]'s recipe for the pb-partitioned
    * postings store, plus the term sort that lays down the row-group
    * stats [[LexIndex.query]]'s pushed `term IN` pruning feeds on. */
  private def commitPostings(spark: SparkSession, df: DataFrame,
                             stageDir: String, dstRoot: String,
                             tag: String): Unit = {
    val conf = spark.sparkContext.hadoopConfiguration
    val root = new org.apache.hadoop.fs.Path(dstRoot)
    val fs = root.getFileSystem(conf)
    df.repartition(col("pb"))
      .sortWithinPartitions(col("term"))
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

  /** Index one committed epoch's docs into the generation at `dir` —
    * marker-checked, deterministic file names, meta as a per-epoch DELTA
    * row. Idempotent: a replay (or a compactor's carry) re-stages the
    * same content onto the same names. */
  private def indexEpoch(spark: SparkSession, dir: String, epochId: Long,
                         outDir: String, idCol: String,
                         textCol: String): Boolean = {
    import spark.implicits._
    val fs = Occ.hadoopFs(spark, dir)
    val marker = new org.apache.hadoop.fs.Path(dir, s"_epochs/$epochId")
    if (fs.exists(marker)) return false
    val nPb = LexIndex.read(spark, dir).nPb // frozen params
    val docs = spark.read.parquet(s"$outDir/e$epochId-0.parquet")
    val delta = LexIndex.build(docs, idCol, textCol, nPb)
    commitPostings(spark,
      delta.postings.withColumn("pb", pmod(hash(col("term")), lit(nPb))),
      s"$dir/_stage/e$epochId-postings", s"$dir/postings", s"e$epochId")
    DedupIndex.commitOne(spark, delta.doclen, s"$dir/_stage/e$epochId-doclen",
      new org.apache.hadoop.fs.Path(dir, s"doclen/e$epochId-0.parquet"))
    DedupIndex.commitOne(spark,
      Seq((delta.nDocs, delta.totLen, nPb)).toDF("n_docs", "tot_len", "n_pb"),
      s"$dir/_stage/e$epochId-meta",
      new org.apache.hadoop.fs.Path(dir, s"meta/e$epochId-0.parquet"))
    try {
      val out = fs.create(marker, false)
      try out.write(s"e$epochId".getBytes("UTF-8")) finally out.close()
      true
    } catch {
      // a concurrent carry of the SAME epoch won the marker race — its
      // frames derive from the same committed docs file with the same
      // frozen params, so the content is identical
      case _: java.io.IOException => false
    }
  }

  /** Exactly-once epoch append with generation handoff: commit the raw
    * epoch docs to `outDir/e<epochId>-0.parquet` (the system of record a
    * compactor's carry re-indexes from), then index them into the current
    * generation, re-resolving and re-applying until the generation head
    * is stable — [[DedupIndexOcc.gateEpoch]]'s loop with [[indexEpoch]]
    * as the unit. Returns false for a marker-detected replay on the final
    * generation. */
  def appendEpoch(spark: SparkSession, root: String, epochId: Long,
                  docs: DataFrame, idCol: String, textCol: String,
                  outDir: String): Boolean = {
    DedupIndex.commitOne(spark, docs, s"$outDir/_stage/e$epochId",
      new org.apache.hadoop.fs.Path(outDir, s"e$epochId-0.parquet"))
    var gen = currentGen(spark, root)
    var applied = false
    var settled = false
    while (!settled) {
      applied |= indexEpoch(spark, genDir(root, gen), epochId, outDir,
        idCol, textCol)
      val now = currentGen(spark, root)
      if (now == gen) settled = true else gen = now
    }
    applied
  }

  /** The streaming corpus-epoch appender: each micro-batch of documents
    * becomes one index epoch — checkpointed source offsets + the epoch
    * marker give exactly-once index contents across restarts/replays. */
  def appendStream(spark: SparkSession, root: String, docStream: DataFrame,
                   idCol: String, textCol: String, outDir: String) =
    docStream.writeStream.foreachBatch {
      (batch: DataFrame, epochId: Long) =>
        if (!batch.isEmpty) {
          appendEpoch(spark, root, epochId, batch, idCol, textCol, outDir); ()
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

  /** Marker-covered files of the pb-partitioned postings store. */
  private def postingsSnapshot(fs: org.apache.hadoop.fs.FileSystem,
                               dir: String, epochs: Set[Long]): Seq[String] = {
    val root = new org.apache.hadoop.fs.Path(dir, "postings")
    fs.listStatus(root).filter(_.getPath.getName.startsWith("pb="))
      .flatMap(p => fs.listStatus(p.getPath))
      .map(_.getPath).filter(_.getName.endsWith(".parquet"))
      .filter(p => p.getName match {
        case EpochFile(e) => epochs.contains(e.toLong)
        case _            => true
      })
      .map(_.toString).toSeq.sorted
  }

  private def carryMissing(spark: SparkSession, baseDir: String,
                           newDir: String, outDir: String,
                           idCol: String, textCol: String): Unit =
    (epochMarkers(spark, baseDir) -- epochMarkers(spark, newDir))
      .toSeq.sorted.foreach(indexEpoch(spark, newDir, _, outDir, idCol, textCol))

  /** Small-files maintenance as a new generation: rewrite the snapshot's
    * frames at their ideal layout ([[LexIndex.compact]]'s shape — one
    * globally term-sorted file per pb partition, doclen squashed, meta
    * squashed to one summed row), carry late-landing append epochs before
    * AND after the commit, retry from the new head on maintainer
    * conflict. Returns the committed generation. */
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
      val postF = postingsSnapshot(fs, baseDir, epochs)
      val dlF = frameSnapshot(fs, baseDir, "doclen", epochs)
      val metaF = frameSnapshot(fs, baseDir, "meta", epochs)
      try {
        committed = Occ.publishDir(spark, root, retain, Some(baseGen)) { newDir =>
          val metaRows = spark.read.parquet(metaF: _*).collect()
          val nPb = metaRows.head.getAs[Int]("n_pb")
          spark.read.option("basePath", s"$baseDir/postings").parquet(postF: _*)
            .drop("pb").withColumn("pb", pmod(hash(col("term")), lit(nPb)))
            .repartition(col("pb"))
            .sortWithinPartitions(col("term"))
            .write.partitionBy("pb").mode("overwrite").parquet(s"$newDir/postings")
          spark.read.parquet(dlF: _*)
            .coalesce(1).write.mode("overwrite").parquet(s"$newDir/doclen")
          Seq((metaRows.map(_.getAs[Long]("n_docs")).sum,
              metaRows.map(_.getAs[Long]("tot_len")).sum, nPb))
            .toDF("n_docs", "tot_len", "n_pb")
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
