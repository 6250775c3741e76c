package graft.pipeline

import org.apache.spark.sql.SparkSession

/** Generic multi-writer optimistic commit for VERSIONED DIRECTORIES — the
  * `_reserve`/`_commits`/`_CURRENT` marker protocol of
  * [[Medallion.publishGoldOcc]] (see the protocol comment there for the
  * full semantics) factored out for payloads that are not a single
  * DataFrame: a committed version here is a directory `v=N/` holding
  * whatever the caller's `write` callback staged into it (an IVF-PQ index
  * with four frames, a MinHash index with three, …).
  *
  * The contract is identical to gold's: versions are allocated by
  * exclusive-create reservation and commit in any order; readers resolve
  * max(`_commits`) (or the repaired `_CURRENT` fast path) and see only
  * fully-written immutable snapshots; a writer passing `expectedBase`
  * gets read-modify-write conflict detection
  * ([[java.util.ConcurrentModificationException]] at the commit point);
  * a crash before the commit marker rolls back, after it keeps the data.
  * Exclusive create is O_EXCL on local filesystems and the
  * conditional-PUT-shaped `create(path, overwrite=false)` elsewhere — the
  * same primitive Delta/Iceberg rest on, so the protocol ports to object
  * stores unchanged.
  *
  * Reference anchor: the reference pipeline overwrites gold outputs in
  * place (`scripts/batch/gold_dim_payment.py:108-122`) with no concurrent
  * -writer story; this is the generalized commit log that gap called for.
  */
object Occ {

  private def isLocalFs(fs: org.apache.hadoop.fs.FileSystem): Boolean =
    fs.getScheme == "file"

  private[graft] def hadoopFs(spark: SparkSession,
                              root: String): org.apache.hadoop.fs.FileSystem =
    new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** Exclusive create: true iff this call created the path. The protocol's
    * only synchronization primitive. */
  private[graft] def atomicCreate(fs: org.apache.hadoop.fs.FileSystem,
                                  p: org.apache.hadoop.fs.Path,
                                  body: String): Boolean = {
    if (isLocalFs(fs)) {
      try {
        val local = java.nio.file.Paths.get(p.toUri.getPath)
        java.nio.file.Files.createDirectories(local.getParent)
        java.nio.file.Files.write(local, body.getBytes("UTF-8"),
          java.nio.file.StandardOpenOption.CREATE_NEW) // O_EXCL
        true
      } catch { case _: java.nio.file.FileAlreadyExistsException => false }
    } else {
      try {
        val out = fs.create(p, false)
        try out.write(body.getBytes("UTF-8")) finally out.close()
        true
      } catch { case _: java.io.IOException => false }
    }
  }

  private[graft] def listNumbered(fs: org.apache.hadoop.fs.FileSystem,
                                  dir: org.apache.hadoop.fs.Path): Seq[Int] =
    if (!fs.exists(dir)) Seq.empty
    else fs.listStatus(dir).toSeq.flatMap(_.getPath.getName.toIntOption)

  /** Highest committed version at `root`, if any. */
  def committedVersion(spark: SparkSession, root: String): Option[Int] = {
    val marked = listNumbered(hadoopFs(spark, root),
      new org.apache.hadoop.fs.Path(root, "_commits"))
    if (marked.nonEmpty) Some(marked.max) else None
  }

  /** Directory of version `n` under `root`. */
  def versionDir(root: String, n: Int): String = s"$root/v=$n"

  /** Directory of the current committed version, if any. */
  def currentDir(spark: SparkSession, root: String): Option[String] =
    committedVersion(spark, root).map(versionDir(root, _))

  /** Concurrent-writer directory publish: reserve a version nobody else
    * holds, let `write` stage the payload into its private `v=N`
    * directory, conflict-check against `expectedBase`, commit, repair the
    * `_CURRENT` pointer, prune versions out of the retention window.
    * Returns the committed version. Mirrors [[Medallion.publishGoldOcc]]
    * step for step (that method keeps its own copy because gold carries
    * pre-OCC claim-path legacy in its version listing). */
  def publishDir(spark: SparkSession, root: String, retain: Int = 1,
                 expectedBase: Option[Int] = None)(
      write: String => Unit): Int = {
    require(retain >= 1, s"retain must keep at least the previous version, got $retain")
    val fs = hadoopFs(spark, root)
    fs.mkdirs(new org.apache.hadoop.fs.Path(root))
    val reserveDir = new org.apache.hadoop.fs.Path(root, "_reserve")
    val commitsDir = new org.apache.hadoop.fs.Path(root, "_commits")
    val me = java.lang.management.ManagementFactory.getRuntimeMXBean.getName +
      "/" + Thread.currentThread().getId
    // 1. allocate a version number nobody else can hold
    var n = 0
    var reserved = false
    while (!reserved) {
      n = (listNumbered(fs, reserveDir) ++ listNumbered(fs, commitsDir))
        .foldLeft(0)(math.max) + 1
      reserved = atomicCreate(fs, new org.apache.hadoop.fs.Path(reserveDir, n.toString), me)
    }
    try {
      // 2. stage the payload unshared — no other writer ever touches v=n
      write(versionDir(root, n))
      // 3. conflict check at the commit point, then the commit itself
      expectedBase.foreach { base =>
        val committed = committedVersion(spark, root).getOrElse(0)
        if (committed != base) {
          fs.delete(new org.apache.hadoop.fs.Path(root, s"v=$n"), true)
          throw new java.util.ConcurrentModificationException(
            s"OCC conflict at $root: this writer read v=$base but " +
              s"v=$committed is now committed; recompute from the current " +
              "version or omit expectedBase for last-writer-wins")
        }
      }
      if (!atomicCreate(fs, new org.apache.hadoop.fs.Path(commitsDir, n.toString), me))
        throw new IllegalStateException(
          s"commit marker $n already exists at $root despite an exclusive " +
            "reservation — the directory's metadata has been tampered with")
      // 4. repair the pointer to max(committed); every committer does this,
      // so a lower-version commit landing late cannot strand the pointer
      repairCurrent(spark, root, me)
      // 5. prune committed versions out of the retention window (never an
      // uncommitted reservation — its writer may still be mid-flight)
      val keepFrom = committedVersion(spark, root).getOrElse(n) - retain
      listNumbered(fs, commitsDir).filter(_ < keepFrom).foreach { v =>
        fs.delete(new org.apache.hadoop.fs.Path(root, s"v=$v"), true)
        fs.delete(new org.apache.hadoop.fs.Path(commitsDir, v.toString), false)
        fs.delete(new org.apache.hadoop.fs.Path(reserveDir, v.toString), false)
      }
      n
    } catch {
      case e: Throwable =>
        // an uncommitted reservation is invisible but holds a number; a
        // committed publish keeps its data even if pointer repair failed
        if (!fs.exists(new org.apache.hadoop.fs.Path(commitsDir, n.toString))) {
          fs.delete(new org.apache.hadoop.fs.Path(root, s"v=$n"), true)
          fs.delete(new org.apache.hadoop.fs.Path(reserveDir, n.toString), false)
        }
        throw e
    }
  }

  private def repairCurrent(spark: SparkSession, root: String, me: String): Unit = {
    val fs = hadoopFs(spark, root)
    var repaired = false
    var attempts = 0
    while (!repaired && attempts < 10) {
      attempts += 1
      val targetOpt = committedVersion(spark, root)
      if (targetOpt.isEmpty) return
      val target = targetOpt.get
      val tmp = new org.apache.hadoop.fs.Path(root,
        s"_CURRENT.${me.hashCode.toHexString}.$attempts.tmp")
      try {
        if (isLocalFs(fs)) {
          val dst = java.nio.file.Paths.get(
            new org.apache.hadoop.fs.Path(root, "_CURRENT").toUri.getPath)
          val tmpNio = java.nio.file.Paths.get(tmp.toUri.getPath)
          java.nio.file.Files.write(tmpNio, s"v=$target".getBytes("UTF-8"))
          java.nio.file.Files.deleteIfExists(dst.resolveSibling("._CURRENT.crc"))
          java.nio.file.Files.move(tmpNio, dst,
            java.nio.file.StandardCopyOption.ATOMIC_MOVE,
            java.nio.file.StandardCopyOption.REPLACE_EXISTING)
        } else {
          val out = fs.create(tmp, true)
          try out.write(s"v=$target".getBytes("UTF-8")) finally out.close()
          org.apache.hadoop.fs.FileContext.getFileContext(
              tmp.toUri, spark.sparkContext.hadoopConfiguration)
            .rename(tmp, new org.apache.hadoop.fs.Path(root, "_CURRENT"),
              org.apache.hadoop.fs.Options.Rename.OVERWRITE)
        }
      } catch { case _: java.io.IOException => /* lost a flip race; re-check */ }
      repaired = committedVersion(spark, root).contains(target)
    }
  }
}
