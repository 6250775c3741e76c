package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** File-level data skipping: per-file column statistics written next to the
  * data, consulted at PLANNING time to drop whole files from a scan.
  *
  * Why this exists at 100 TB: parquet row-group min/max pushdown already
  * skips row groups, but only AFTER every file's footer has been listed and
  * opened — the scan-planning cost is O(#files) remote reads no matter how
  * selective the predicate is. A table-level stats manifest (what Delta's
  * transaction log and Iceberg's manifests provide; the reference leans on
  * Delta for its gold zone, `gold_dim_payment.py:108-122`) answers "which
  * files can possibly match?" from ONE small read, so a selective query on
  * a 10^6-file table plans in milliseconds and reads only the survivors.
  * Skipping composes with [[graft.operators.Scale.zorderBy]]: clustering
  * makes per-file [min,max] ranges tight on several columns at once, which
  * is what makes the manifest selective for multi-dimensional predicates.
  *
  * Soundness contract: pruning NEVER changes results. The predicate rewrite
  * below is conservative — any expression shape it does not understand, any
  * column without stats, and any NULL statistic (all-null file, truncated
  * string max) keeps the file; the original predicate is always re-applied
  * to the surviving rows.
  */
object DataSkipping {

  /** Manifest directory name inside a data directory. The leading
    * underscore makes Spark's file index treat it as metadata — a plain
    * `spark.read.parquet(dir)` of the data never picks it up. */
  val ManifestDir = "_manifest"

  /** Max stored length for string min/max stats. Document corpora make
    * untruncated text stats as large as the data itself (Delta truncates at
    * 32 chars for the same reason). A truncated MIN stays a valid lower
    * bound (a strict prefix orders before the full string); a truncated MAX
    * would order BELOW the real maximum and wrongly prune, so an
    * over-length max is stored as NULL = "unknown", which the rewrite
    * treats as keep. */
  val MaxStringStat = 64

  private def hadoopFs(spark: SparkSession, path: String) =
    new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** Compute and write the per-file stats manifest for `dir` (one parquet
    * dataset, flat or partitioned): for each file its row count and, per
    * requested column, min / max / null count. One distributed aggregation
    * job over the just-written data, grouped on the hidden
    * `_metadata.file_path` column — O(written bytes) once, at write time,
    * exactly when the data is hot. Returns the number of files indexed.
    *
    * The manifest itself is a single parquet file: one row per data file is
    * driver-scale for any sanely-compacted table (a 100 TB table at 1 GB
    * files is 10^5 rows); Iceberg's split manifests are the documented
    * next step past that. */
  def writeManifest(spark: SparkSession, dir: String,
                    statsCols: Seq[String]): Int = {
    val fs = hadoopFs(spark, dir)
    val qualified = fs.makeQualified(new org.apache.hadoop.fs.Path(dir)).toString
    val stats = fileStats(spark.read.parquet(dir), dir, qualified, statsCols)
    val out = stats.coalesce(1).cache()
    try {
      val bad = out.filter(col("file").isNull).count()
      require(bad == 0,
        s"scan reported file paths outside $qualified — cannot relativize")
      val n = out.count().toInt
      out.write.mode("overwrite").parquet(s"$dir/$ManifestDir")
      // planner-side caches must see the fresh manifest (same-JVM writers)
      graft.plans.ManifestPruneRule.invalidate(dir)
      graft.plans.ManifestPruneRule.invalidate(qualified)
      n
    } finally out.unpersist()
  }

  /** The shared per-file stats aggregation of [[writeManifest]] and
    * [[appendManifest]] — one distributed pass over `src`, grouped on the
    * hidden `_metadata.file_path`, relativized against `qualified`. Both
    * writers MUST build stats through here: a min/max/truncation rule that
    * drifted between full and incremental indexing would poison pruning. */
  private def fileStats(src: DataFrame, dir: String, qualified: String,
                        statsCols: Seq[String]): DataFrame = {
    require(statsCols.nonEmpty, "statsCols must name at least one column")
    statsCols.foreach { c =>
      require(src.columns.contains(c), s"no column $c in $dir (have: ${src.columns.mkString(",")})")
    }
    val aggs = statsCols.flatMap { c =>
      val (mn, mx) = src.schema(c).dataType match {
        case StringType =>
          (substring(min(col(c)), 1, MaxStringStat),
            when(length(max(col(c))) <= MaxStringStat, max(col(c))))
        case _ => (min(col(c)), max(col(c)))
      }
      Seq(mn.as(s"min_$c"), mx.as(s"max_$c"),
        sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"nulls_$c"))
    }
    src
      .select(col("_metadata.file_path").as("__path") +: statsCols.map(col): _*)
      .groupBy(col("__path"))
      .agg(count(lit(1)).as("nrows"), aggs: _*)
      // path relative to dir, so the manifest survives a directory move
      // (gold retention renames nothing, but tooling may relocate tables)
      .withColumn("file",
        when(col("__path").startsWith(qualified + "/"),
          expr(s"substr(__path, ${qualified.length + 2})")))
      .drop("__path")
  }

  /** Extend an existing manifest with stats for files APPENDED since it was
    * written — the maintenance move for K1-style partitioned appends, where
    * re-running [[writeManifest]] would rescan the whole table to index a
    * day's delta. Only the new files are read (explicit-path scan), their
    * stats are unioned with the existing manifest rows, and the result
    * swaps in via stage-then-rename (readers mid-swap see the old complete
    * manifest; the [[graft.plans.ManifestPruneRule]] contract keeps
    * correctness either way — un-indexed files are always scanned, so a
    * lagging manifest only costs skipping opportunity, never rows).
    * Returns the number of newly indexed files; 0 when nothing is new.
    * Falls back to a full [[writeManifest]] when no manifest exists. */
  def appendManifest(spark: SparkSession, dir: String,
                     statsCols: Seq[String]): Int = {
    val fs = hadoopFs(spark, dir)
    val root = fs.makeQualified(new org.apache.hadoop.fs.Path(dir))
    val qualified = root.toString
    manifest(spark, dir) match {
      case None => writeManifest(spark, dir, statsCols)
      case Some(m) =>
        val existingCols = m.columns.collect { case c if c.startsWith("min_") =>
          c.stripPrefix("min_") }.toSet
        require(existingCols == statsCols.toSet,
          s"stats columns changed (${existingCols.mkString(",")} -> " +
            s"${statsCols.mkString(",")}): rewrite with writeManifest")
        val mRows = m.collect() // driver-scale by the manifest contract
        val known = mRows.map(_.getAs[String]("file")).toSet
        val fresh = listDataFiles(fs, root).filterNot(known)
        if (fresh.isEmpty) 0
        else {
          val src = spark.read.parquet(fresh.map(r => s"$qualified/$r"): _*)
          val newStats = fileStats(src, dir, qualified, statsCols)
            .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
          try {
            require(newStats.filter(col("file").isNull).count() == 0,
              s"scan reported file paths outside $qualified — cannot relativize")
            val merged = spark.createDataFrame(
                java.util.Arrays.asList(mRows: _*), m.schema)
              .unionByName(newStats.select(m.columns.map(col): _*))
            val staged = s"$dir/${ManifestDir}_stage"
            merged.coalesce(1).write.mode("overwrite").parquet(staged)
            // two-rename swap: in the instant between the renames no
            // _manifest exists and readers fall back to an unpruned scan
            // (safe — pruning is an optimization); a crash in that window
            // leaves _manifest.old, which [[manifest]] heals on next read
            val fc = org.apache.hadoop.fs.FileContext.getFileContext(root.toUri,
              spark.sparkContext.hadoopConfiguration)
            val liveP = new org.apache.hadoop.fs.Path(dir, ManifestDir)
            val oldP = new org.apache.hadoop.fs.Path(dir, ManifestDir + ".old")
            fc.rename(liveP, oldP, org.apache.hadoop.fs.Options.Rename.OVERWRITE)
            fc.rename(new org.apache.hadoop.fs.Path(staged), liveP)
            fs.delete(oldP, true)
            graft.plans.ManifestPruneRule.invalidate(dir)
            graft.plans.ManifestPruneRule.invalidate(qualified)
            fresh.size
          } finally newStats.unpersist()
        }
    }
  }

  /** The stats manifest of `dir`, if one was written. Heals a crashed
    * [[appendManifest]] swap: when only `_manifest.old` survives (the
    * maintainer died between its two renames), the old complete manifest
    * is renamed back live — single-maintainer contract, so the rename is
    * unambiguous; concurrent readers that lose the rename race simply see
    * no manifest and scan unpruned. */
  def manifest(spark: SparkSession, dir: String): Option[DataFrame] = {
    val fs = hadoopFs(spark, dir)
    val p = new org.apache.hadoop.fs.Path(dir, ManifestDir)
    if (!fs.exists(p)) {
      val old = new org.apache.hadoop.fs.Path(dir, ManifestDir + ".old")
      if (fs.exists(old)) scala.util.Try(fs.rename(old, p))
    }
    if (fs.exists(p)) Some(spark.read.parquet(p.toString)) else None
  }

  /** Files of `dir` that can possibly contain rows matching `pred`,
    * per the manifest — None when no manifest exists (caller falls back to
    * a full scan). The manifest-level filter runs AS a Spark predicate over
    * the manifest frame, so literal/stat type coercion, date and decimal
    * comparison, and collation all follow engine semantics instead of
    * hand-rolled comparators — the same design as Delta's data-skipping
    * reader, which rewrites data predicates into stats predicates.
    *
    * SUBTRACTIVE, like [[graft.plans.ManifestPruneRule]]: the survivor set
    * is the LIVE listing minus files the manifest definitively rejects, so
    * a file appended after indexing (not yet in the manifest) is always
    * scanned. A manifest-as-catalog reading would silently drop such rows
    * — the one way a "pruning never changes results" contract can break —
    * which is exactly the window between a K1 append landing and its
    * [[appendManifest]] running. A lagging manifest costs skipping
    * opportunity, never rows. */
  def prunedFiles(spark: SparkSession, dir: String,
                  pred: Column): Option[Seq[String]] =
    manifest(spark, dir).map { m =>
      val statCols = m.columns.collect { case c if c.startsWith("min_") =>
        c.stripPrefix("min_") }.toSet
      val fs = hadoopFs(spark, dir)
      val root = fs.makeQualified(new org.apache.hadoop.fs.Path(dir))
      val live = listDataFiles(fs, root)
      if (live.isEmpty) live
      else resolvedPredicate(spark, s"$dir/${live.head}", pred) match {
        case None => live // unresolvable against this schema: keep everything
        case Some(cond) =>
          val rejected = m
            .filter(!coalesce(pruningPredicate(cond, statCols), lit(true)))
            .select(col("file")).collect().map(_.getString(0)).toSet
          live.filterNot(rejected)
      }
    }

  /** Data files under `root` (recursive, dir-relative paths), skipping
    * metadata directories and dotfiles — Spark's own listing rules — and
    * restricted to `*.parquet` (this module is parquet-only; a stray
    * README or tool artifact in the table dir must not reach an
    * explicit-path `spark.read.parquet`). Shared by [[prunedFiles]] (the
    * live side of subtractive pruning) and [[appendManifest]] (the delta
    * discovery). */
  private def listDataFiles(fs: org.apache.hadoop.fs.FileSystem,
                            root: org.apache.hadoop.fs.Path): Seq[String] = {
    val qualified = root.toString
    val it = fs.listFiles(root, true)
    val out = scala.collection.mutable.ArrayBuffer[String]()
    while (it.hasNext) {
      val rel = it.next().getPath.toString.stripPrefix(qualified + "/")
      if (rel.endsWith(".parquet") &&
          !rel.split('/').exists(seg => seg.startsWith("_") || seg.startsWith(".")))
        out += rel
    }
    out.toSeq
  }

  /** Dir-relative paths of files the manifest PROVES cannot contain a row
    * matching the already-RESOLVED `cond` — the planner-side entry point
    * used by [[graft.plans.ManifestPruneRule]], which holds an optimizer
    * plan's resolved filter condition (so no re-analysis hop is needed).
    * Empty when no manifest exists or nothing is excludable. Inverted
    * sense vs [[prunedFiles]] deliberately: a Catalyst rule must KEEP any
    * file the manifest does not know (appended after indexing), so it
    * subtracts the definitely-rejected set from the live listing instead
    * of trusting the manifest as a complete catalog. */
  private[graft] def rejectedFiles(spark: SparkSession, dir: String,
                                   cond: Expression): Seq[String] =
    manifest(spark, dir) match {
      case None => Nil
      case Some(m) =>
        val statCols = m.columns.collect { case c if c.startsWith("min_") =>
          c.stripPrefix("min_") }.toSet
        // keep on null: only a definitive FALSE from the stats predicate
        // rejects a file
        m.filter(!coalesce(pruningPredicate(cond, statCols), lit(true)))
          .select(col("file")).collect().map(_.getString(0)).toSeq
    }

  /** Run `pred` through the analyzer against an empty relation carrying the
    * data schema (ONE footer read — never a full-directory listing) and
    * return the resolved Catalyst condition. Resolution is what normalizes
    * the predicate for the rewrite: `between` becomes two comparisons,
    * `isin` becomes In, type coercion inserts widening casts (monotone, so
    * unwrapping them around attributes below stays sound), and literals get
    * their final types. */
  private def resolvedPredicate(spark: SparkSession, sampleFile: String,
                                pred: Column): Option[Expression] =
    scala.util.Try {
      val schema = spark.read.parquet(sampleFile).schema
      spark.createDataFrame(new java.util.ArrayList[org.apache.spark.sql.Row](), schema)
        .where(pred).queryExecution.analyzed
        .collectFirst {
          case f: org.apache.spark.sql.catalyst.plans.logical.Filter => f.condition
        }
    }.toOption.flatten

  /** Data predicate → manifest predicate ("may this file contain a matching
    * row?"). Conservative by construction: every unhandled shape and every
    * NULL statistic resolves to keep. And/Or compose because "may match" is
    * monotone: a file surviving neither conjunct's bound cannot hold a row
    * satisfying the conjunction. */
  private def pruningPredicate(e: Expression, stats: Set[String]): Column = {
    def attrOf(x: Expression): Option[String] = x match {
      case a: Attribute => Some(a.name) // incl. UnresolvedAttribute
      case c: Cast      => attrOf(c.child)
      case _            => None
    }
    def litOf(x: Expression): Option[Column] = x match {
      case l: Literal =>
        Some(org.apache.spark.sql.GraftColumnBridge.column(l))
      case _ if x.foldable && x.deterministic =>
        scala.util.Try(org.apache.spark.sql.GraftColumnBridge.column(
          Literal.create(x.eval(null), x.dataType))).toOption
      case _ => None
    }
    def mn(c: String) = col(s"min_$c")
    def mx(c: String) = col(s"max_$c")
    def nulls(c: String) = col(s"nulls_$c")
    def keepIf(c: Column): Column = coalesce(c, lit(true))
    // no value COMPARISON is satisfiable by a file of only nulls, whatever
    // its (null) min/max stats say — this is what distinguishes "stat null
    // because all-null" (prunable) from "stat null because truncated" (kept
    // by keepIf: such a file has nulls < nrows)
    def anyValue(a: String): Column = nulls(a) < col("nrows")
    // a (attr, literal) comparison in either writing order, normalized to
    // attr-on-the-left; None when neither side is a stats column
    def sides(l: Expression, r: Expression): Option[(String, Column, Boolean)] =
      (attrOf(l), litOf(r), attrOf(r), litOf(l)) match {
        case (Some(a), Some(v), _, _) if stats(a) => Some((a, v, false))
        case (_, _, Some(a), Some(v)) if stats(a) => Some((a, v, true))
        case _ => None
      }
    e match {
      case And(l, r) => pruningPredicate(l, stats) && pruningPredicate(r, stats)
      case Or(l, r)  => pruningPredicate(l, stats) || pruningPredicate(r, stats)
      case Not(IsNull(x))    => pruningPredicate(IsNotNull(x), stats)
      case Not(IsNotNull(x)) => pruningPredicate(IsNull(x), stats)
      case EqualTo(l, r) => sides(l, r)
        .map { case (a, v, _) =>
          anyValue(a) && keepIf(mn(a) <= v) && keepIf(mx(a) >= v) }
        .getOrElse(lit(true))
      case EqualNullSafe(l, r) =>
        (litOf(r).orElse(litOf(l)), sides(l, r)) match {
          case (Some(v), Some((a, _, _))) =>
            // x <=> NULL means IS NULL; otherwise same bound as EqualTo
            when(v.isNull, nulls(a) > 0)
              .otherwise(anyValue(a) && keepIf(mn(a) <= v) && keepIf(mx(a) >= v))
          case _ => lit(true)
        }
      case LessThan(l, r) => sides(l, r).map {
        case (a, v, false) => anyValue(a) && keepIf(mn(a) < v)   // a <  v
        case (a, v, true)  => anyValue(a) && keepIf(mx(a) > v)   // v <  a
      }.getOrElse(lit(true))
      case LessThanOrEqual(l, r) => sides(l, r).map {
        case (a, v, false) => anyValue(a) && keepIf(mn(a) <= v)  // a <= v
        case (a, v, true)  => anyValue(a) && keepIf(mx(a) >= v)  // v <= a
      }.getOrElse(lit(true))
      case GreaterThan(l, r) => sides(l, r).map {
        case (a, v, false) => anyValue(a) && keepIf(mx(a) > v)   // a >  v
        case (a, v, true)  => anyValue(a) && keepIf(mn(a) < v)   // v >  a
      }.getOrElse(lit(true))
      case GreaterThanOrEqual(l, r) => sides(l, r).map {
        case (a, v, false) => anyValue(a) && keepIf(mx(a) >= v)  // a >= v
        case (a, v, true)  => anyValue(a) && keepIf(mn(a) <= v)  // v >= a
      }.getOrElse(lit(true))
      case In(x, list) if list.nonEmpty =>
        attrOf(x).filter(stats) match {
          case Some(a) =>
            val eqs = list.map(litOf)
            if (eqs.exists(_.isEmpty)) lit(true)
            else anyValue(a) && eqs.flatten
              .map(v => keepIf(mn(a) <= v) && keepIf(mx(a) >= v))
              .reduce(_ || _)
          case None => lit(true)
        }
      case IsNull(x) => attrOf(x).filter(stats)
        .map(a => nulls(a) > 0).getOrElse(lit(true))
      case IsNotNull(x) => attrOf(x).filter(stats)
        .map(a => nulls(a) < col("nrows")).getOrElse(lit(true))
      case _ => lit(true)
    }
  }

  /** Read `dir` with manifest-driven file skipping, then re-apply `pred` to
    * the surviving rows (skipping is a planning optimization, never a
    * filter). Without a manifest this is exactly a plain filtered scan. */
  def readSkipping(spark: SparkSession, dir: String, pred: Column): DataFrame =
    prunedFiles(spark, dir, pred) match {
      case None => spark.read.parquet(dir).where(pred)
      case Some(files) if files.isEmpty =>
        // schema from the (listed, unread) dir; the folded false prunes the
        // scan to an empty LocalRelation — no file is opened
        spark.read.parquet(dir).where(lit(false)).where(pred)
      case Some(files) =>
        spark.read.parquet(files.map(f => s"$dir/$f"): _*).where(pred)
    }

  // ---- Gold-zone integration (versioned tables, pipeline/Medallion) ------

  private def currentGoldDir(spark: SparkSession, root: String): String = {
    val v = Medallion.goldCommittedVersion(spark, root).getOrElse(
      throw new IllegalStateException(s"gold table never published: $root"))
    s"$root/v=$v"
  }

  /** Index the CURRENT committed version of a versioned gold table. Run it
    * right after publish: the manifest lands inside `v=N/` so retention
    * pruning removes version and index together, and time-travel readers of
    * other versions are unaffected. Returns the number of files indexed. */
  def indexGoldCurrent(spark: SparkSession, root: String,
                       statsCols: Seq[String]): Int =
    writeManifest(spark, currentGoldDir(spark, root), statsCols)

  /** [[Medallion.readGold]] with data skipping: resolves the committed
    * version, prunes its file list through the version's manifest, applies
    * `pred`. Identical results to `readGold(...).where(pred)` always;
    * fewer files opened when the manifest can exclude any. */
  def readGoldSkipping(spark: SparkSession, root: String,
                       pred: Column): DataFrame =
    readSkipping(spark, currentGoldDir(spark, root), pred)
}
