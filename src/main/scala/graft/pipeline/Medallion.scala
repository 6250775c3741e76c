package graft.pipeline

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.{Quality, Scd2}

/** The medallion pipeline (SURVEY.md §3.1): Bronze → Silver → Gold as plain
  * function composition over parquet directories — the Airflow DAG
  * (`airflow/dags/spark_job_airflow.py:111-133`) collapses to `run()`.
  *
  * Stage semantics mirror the reference exactly:
  *  - Bronze: incremental max-timestamp append, hive-partitioned y/m/d
  *    (`bronze_dimension_fact_load.py:66-98`)   [S1/S2 → K1]
  *  - Silver dims: string cleanup + full overwrite
  *    (`silver_dimensions.py:43-117`)           [P9/F4 → K2]
  *  - Silver facts: orders ⋈ details, partitioned append
  *    (`silver_facts.py:43-96`)                 [J1 → K1]
  *  - Gold dims: SCD2 merge (`gold_dim_payment.py:63-124`) [→ K3/K5]
  *  - Gold fact: broadcast dim lookups, partitioned append
  *    (`gold_fact_orders.py:76-128`)            [J5 → K4]
  *  - DQ gates between layers (`spark_job_airflow.py:113-126`) [Q5]
  *
  * Scale notes: every write is partitioned on y/m/d so downstream reads
  * prune; dims are broadcast; the only wide shuffles are the fact join
  * (keyed on order id) and SCD2's probe (keyed on business key). Watermarks
  * are single-scalar driver round-trips (P6/A1) — O(1) in data size.
  */
object Medallion {

  /** Table existence = directory-with-files probe, the catalog-free
    * discipline of the reference (`scripts/utils.py:19-27`). */
  def tableExists(spark: SparkSession, path: String): Boolean = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.exists(p) && fs.listStatus(p).nonEmpty
  }

  /** S1 — bounded-partition JDBC table scan: the reference's
    * `read_mysql_table` (`bronze_dimension_fact_load.py:46-57`) re-expressed
    * on Spark's BUILT-IN JDBC source. `numPartitions` executors each issue a
    * range slice of `partitionColumn` (the id-bounded parallel read that
    * keeps a big source table from serializing through one connection), and
    * Catalyst pushes filters and column pruning into the remote SQL — the
    * watermark slice in [[bronzeIncremental]] arrives at the database as a
    * WHERE clause, not a full-table transfer.
    *
    * Integration-tested against embedded Derby (the one JDBC driver this
    * environment ships, `/opt/spark/jars/derby-*.jar`); a MySQL/Postgres
    * deployment swaps only `url` (+ its driver jar on the classpath). */
  def readJdbc(spark: SparkSession, url: String, table: String,
               partitionColumn: String, lowerBound: Long, upperBound: Long,
               numPartitions: Int): DataFrame =
    spark.read.format("jdbc")
      .option("url", url)
      .option("dbtable", table)
      .option("partitionColumn", partitionColumn)
      .option("lowerBound", lowerBound)
      .option("upperBound", upperBound)
      .option("numPartitions", numPartitions)
      .load()

  /** S5 — CSV seed read: header, declared schema, ingestion timestamp
    * (mirrors `load_static_file.py:53-72`'s LOAD DATA + SET updated_at). */
  def readCsvSeed(spark: SparkSession, path: String,
                  schema: org.apache.spark.sql.types.StructType): DataFrame =
    spark.read.option("header", "true").schema(schema).csv(path)
      .withColumn("updated_at", coalesce(col("updated_at"), current_timestamp()))

  /** Max-timestamp watermark from an existing table, else None (first run →
    * full load; `bronze_dimension_fact_load.py:59-79`).
    *
    * The y/m/d partition values DERIVE from `tsCol` ([[bronzeIncremental]]),
    * so the global max timestamp necessarily lives in the
    * lexicographically-greatest partition — which is resolved from
    * directory names (a pure metadata operation) so only ONE day partition
    * is ever scanned for the max. A whole-table max would be the dominant
    * per-batch cost on a large bronze table. Unpartitioned layouts fall
    * back to the full scan. */
  def watermark(spark: SparkSession, path: String, tsCol: String): Option[java.sql.Timestamp] = {
    if (!tableExists(spark, path)) return None
    val fs = hadoopFs(spark, path)
    def maxChild(dir: org.apache.hadoop.fs.Path, prefix: String): Option[Int] = {
      val vals = fs.listStatus(dir).map(_.getPath.getName)
        .filter(_.startsWith(prefix))
        .flatMap(_.stripPrefix(prefix).toIntOption)
      if (vals.isEmpty) None else Some(vals.max)
    }
    val root = new org.apache.hadoop.fs.Path(path)
    val latestPartition = for {
      y <- maxChild(root, "year=")
      yp = new org.apache.hadoop.fs.Path(root, s"year=$y")
      m <- maxChild(yp, "month=")
      mp = new org.apache.hadoop.fs.Path(yp, s"month=$m")
      dd <- maxChild(mp, "day=")
    } yield s"$path/year=$y/month=$m/day=$dd"
    spark.read.parquet(latestPartition.getOrElse(path))
      .agg(max(col(tsCol))).first().get(0) match {
      case null => None
      case t: java.sql.Timestamp => Some(t)
      case ldt: java.time.LocalDateTime => Some(java.sql.Timestamp.valueOf(ldt))
      case i: java.time.Instant => Some(java.sql.Timestamp.from(i))
      case other => throw new IllegalStateException(s"unexpected watermark: $other")
    }
  }

  /** Declared reaction to schema drift between an incoming batch and the
    * bronze target (drift itself is detected by [[Quality.schemaDrift]],
    * mirroring `bronze_validation.py:41-61`). */
  sealed trait SchemaPolicy
  object SchemaPolicy {
    /** Any drift (added, removed, or retyped column) fails the append. */
    case object Reject extends SchemaPolicy
    /** Additive evolution: new columns land in new files, absent columns
      * read as NULL (parquet schema merge); a RETYPED column still fails —
      * mixed physical types would corrupt every later read. */
    case object Merge extends SchemaPolicy
  }

  /** Read a bronze table with footer schema-merge, so batches appended
    * under [[SchemaPolicy.Merge]] present one unioned schema. */
  def readBronze(spark: SparkSession, path: String): DataFrame =
    spark.read.option("mergeSchema", "true").parquet(path)

  /** K1 — Bronze incremental append with y/m/d partition derivation
    * (`bronze_dimension_fact_load.py:80-98`). Returns the rows written THIS
    * run, collected via [[Observed.countRows]] DURING the write job itself —
    * one pass over the delta, nothing cached (a large increment must not
    * spill executor disks just to be counted), and never a re-scan of the
    * target (which would be O(table) per batch and the pipeline's dominant
    * cost at scale).
    *
    * Schema drift vs the existing target is checked BEFORE any file lands,
    * per `policy` — a rejected batch leaves the table untouched. */
  def bronzeIncremental(spark: SparkSession, source: DataFrame, tsCol: String,
                        target: String,
                        policy: SchemaPolicy = SchemaPolicy.Merge): Long = {
    if (tableExists(spark, target)) {
      val targetSchema = org.apache.spark.sql.types.StructType(
        spark.read.parquet(target).drop("year", "month", "day").schema)
      val drift = Quality.schemaDrift(source, targetSchema.json)
      val retyped = drift.filter(_.startsWith("retyped"))
      policy match {
        case SchemaPolicy.Reject if drift.nonEmpty =>
          throw new IllegalStateException(
            s"schema drift rejected for $target: ${drift.mkString("; ")}")
        case _ if retyped.nonEmpty =>
          throw new IllegalStateException(
            s"incompatible schema drift for $target: ${retyped.mkString("; ")}")
        case _ => ()
      }
    }
    val sliced = watermark(spark, target, tsCol)
      .map(w => source.filter(col(tsCol) > lit(w)))
      .getOrElse(source)
    val inc = sliced
      .withColumn("year", year(col(tsCol)))
      .withColumn("month", month(col(tsCol)))
      .withColumn("day", dayofmonth(col(tsCol)))
    if (inc.isEmpty) 0L // P12 empty-input short-circuit (limit-1 probe)
    else Observed.countRows(inc) { o =>
      o.write.mode(SaveMode.Append)
        .partitionBy("year", "month", "day").parquet(target)
    }
  }

  /** Silver dim cleanup (`silver_dimensions.py:43-108`): strip trailing \r
    * (F4), turn literal "null"/"null\r" strings into real NULLs (P9). */
  def cleanStrings(df: DataFrame, cols: Seq[String]): DataFrame =
    cols.foldLeft(df) { (d, c) =>
      d.withColumn(c,
        when(col(c).isin("null", "null\r"), lit(null))
          .otherwise(regexp_replace(col(c), "\\r$", "")))
    }

  /** K2 — Silver dim full overwrite after cleaning. */
  def silverDim(spark: SparkSession, bronzePath: String, silverPath: String,
                stringCols: Seq[String]): DataFrame = {
    val cleaned = cleanStrings(
      spark.read.parquet(bronzePath).drop("year", "month", "day"), stringCols)
    cleaned.write.mode(SaveMode.Overwrite).parquet(silverPath)
    spark.read.parquet(silverPath)
  }

  /** Silver products: the reference's one denormalizing silver transform —
    * products LEFT JOIN product_category, category NAME carried forward and
    * ids renamed to the serving vocabulary
    * (`silver_dimensions.py:65-86`). Category side is broadcast (tiny dim). */
  def silverProducts(spark: SparkSession, productsPath: String,
                     categoryPath: String, target: String): DataFrame = {
    val p = spark.read.parquet(productsPath).drop("year", "month", "day")
    val c = spark.read.parquet(categoryPath).drop("year", "month", "day")
      .select(col("id").as("__cat_id"), col("name").as("category"))
    val joined = p.join(broadcast(c), p("category_id") === col("__cat_id"), "left")
      .select(
        p("id").as("product_id"),
        p("name").as("product_name"),
        col("category"),
        p("unit_price"),
        p("updated_at"))
    joined.write.mode(SaveMode.Overwrite).parquet(target)
    spark.read.parquet(target)
  }

  /** Silver fact: orders ⋈ order_details at line grain, accepted-suggestion
    * rows unioned into the details side, partitioned append
    * (`silver_facts.py:53-96`). Divergence from the reference, documented:
    * it unions the FULL suggestion table after its new-order filter on
    * every run (re-appending old suggestions each batch); here suggestions
    * join through the same order-timestamp watermark as ordinary lines, so
    * the append is idempotent. */
  def silverFact(spark: SparkSession, ordersPath: String, detailsPath: String,
                 target: String, suggestionsPath: Option[String] = None): Long = {
    val orders = spark.read.parquet(ordersPath)
      .drop("year", "month", "day").withColumnRenamed("id", "order_id")
    val lines = spark.read.parquet(detailsPath).drop("year", "month", "day")
    val details = suggestionsPath.filter(tableExists(spark, _)) match {
      case Some(p) =>
        lines.unionByName(
          spark.read.parquet(p).drop("year", "month", "day").select(lines.columns.map(col): _*))
      case None => lines
    }
    val joined = orders.join(details, Seq("order_id"), "inner")
    bronzeIncremental(spark, joined.drop("year", "month", "day"), "timestamp", target)
  }

  // ---- Atomic versioned gold publish (Delta-ACID stand-in, pure Hadoop) --
  //
  // The reference gets transactional MERGE commits from Delta
  // (`gold_dim_payment.py:108-122`); with parquet only, a delete+rename
  // swap leaves a window where a reader sees a missing table. Instead each
  // publish writes a complete new `<root>/v=N/` directory and then flips a
  // one-line `_CURRENT` pointer file via an atomic rename: a reader holds
  // either the old pointer (old version still fully on disk) or the new
  // one — the table is readable at every instant. The previous version is
  // retained for in-flight readers; older ones are pruned.

  private def hadoopFs(spark: SparkSession, path: String) =
    new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** Committed version of a versioned gold table, from its `_CURRENT`
    * pointer; None when never published.
    *
    * Object-store safe: on stores without atomic rename (S3-class —
    * `ObjectStoreFileSystem` models them), the pointer flip in
    * [[publishGoldOcc]] is copy+delete, so `_CURRENT` can vanish (or be
    * mid-copy) for a window during a concurrent publish. A missing or
    * unparseable pointer is therefore a RECOVERABLE state, not corruption:
    * retry once (the flip window is short), then fall back to the
    * `_commits` marker log — the OCC source of truth — and only report
    * "never published" when that log is empty too. */
  def goldVersion(spark: SparkSession, root: String): Option[Int] = {
    val fs = hadoopFs(spark, root)
    val ptr = new org.apache.hadoop.fs.Path(root, "_CURRENT")
    def committedFallback(): Option[Int] =
      listNumbered(fs, new org.apache.hadoop.fs.Path(root, "_commits")).maxOption
    def readOnce(): Option[Int] =
      if (!fs.exists(ptr)) committedFallback()
      else {
        val in = fs.open(ptr)
        val s = try scala.io.Source.fromInputStream(in, "UTF-8").mkString.trim
                finally in.close()
        // an empty/garbled body is a half-copied flip on a non-atomic store
        if (s.isEmpty) committedFallback() else Some(s.stripPrefix("v=").toInt)
      }
    def transient(e: Throwable): Boolean = e match {
      case _: java.io.FileNotFoundException | _: java.nio.file.NoSuchFileException |
           _: NumberFormatException => true
      case _ => false
    }
    try readOnce()
    catch { case e if transient(e) =>
      try readOnce()
      catch { case e2 if transient(e2) => committedFallback() }
    }
  }

  /** Reader view of a versioned gold table: whatever `_CURRENT` names. */
  def readGold(spark: SparkSession, root: String): DataFrame =
    spark.read.parquet(s"$root/v=${goldVersion(spark, root).getOrElse(
      throw new IllegalStateException(s"gold table never published: $root"))}")

  /** Raw v=N directories on disk, committed or not (see [[goldVersions]]
    * for the reader-facing committed view). */
  private def versionDirsOnDisk(fs: org.apache.hadoop.fs.FileSystem,
                                root: String): Seq[Int] =
    fs.listStatus(new org.apache.hadoop.fs.Path(root))
      .map(_.getPath.getName)
      .filter(_.startsWith("v="))
      .flatMap(_.stripPrefix("v=").toIntOption)
      .toSeq

  /** Versions still on disk (current + retained), ascending — the
    * time-travel surface the versioned layout gives for free. On a table
    * with a `_commits` log (OCC writers), only COMMITTED versions are
    * listed: an in-flight writer's reserved-but-unmarked directory is not
    * readable data. */
  def goldVersions(spark: SparkSession, root: String): Seq[Int] = {
    val fs = hadoopFs(spark, root)
    val onDisk = versionDirsOnDisk(fs, root)
    val marks = listNumbered(fs, new org.apache.hadoop.fs.Path(root, "_commits"))
    (if (marks.nonEmpty) onDisk.filter(marks.toSet) else onDisk).sorted
  }

  /** Time travel: read a specific retained version (Delta `versionAsOf`
    * stand-in; retention is publishGold's keep-previous policy). */
  def readGoldAt(spark: SparkSession, root: String, version: Int): DataFrame = {
    require(goldVersions(spark, root).contains(version),
      s"version $version not retained at $root (have: ${goldVersions(spark, root).mkString(",")})")
    spark.read.parquet(s"$root/v=$version")
  }

  /** Read the highest COMMITTED version via the `_commits` markers — the
    * reader path for object stores, where the `_CURRENT` pointer flip is a
    * copy+delete rename with a brief not-found window. Markers are written
    * by exclusive create (atomic everywhere, incl. conditional-PUT stores),
    * so this read has no window: it always resolves to a fully-written,
    * committed version. Falls back to the pointer for pre-marker tables. */
  def readGoldCommitted(spark: SparkSession, root: String): DataFrame =
    spark.read.parquet(s"$root/v=${goldCommittedVersion(spark, root).getOrElse(
      throw new IllegalStateException(s"gold table never published: $root"))}")

  /** Publish a new version: write `v=N+1` completely, flip the pointer
    * atomically, prune versions older than `N+1 − retain` (so the previous
    * `retain` versions stay on disk for in-flight readers and time travel).
    * Returns the committed version.
    *
    * Writer safety — this publish path is single-writer by design (the
    * reference runs it from one daily DAG; multi-writer ACID is what Delta's
    * log provides, `gold_dim_payment.py:108-122`), and the design is
    * ENFORCED, not assumed: a table-level `_claim` lease is acquired with
    * create-no-overwrite BEFORE the current version is read (so the computed
    * `next` can never go stale under a race), and after the pointer flip the
    * committed version is re-read and compared — a silent lost update
    * becomes a loud failure. On HDFS and conditional-put object stores the
    * exclusive create is atomic; on plain local filesystems it is
    * best-effort check-then-create, which still converts the silent
    * last-rename-wins corruption into an error in any realistic
    * interleaving. A crashed publisher leaves its claim behind: recovery is
    * explicit (delete the claim), never automatic — an expiry heuristic
    * could revoke a live slow writer. */
  def publishGold(spark: SparkSession, df: DataFrame, root: String,
                  retain: Int = 1): Int = {
    require(retain >= 1, s"retain must keep at least the previous version, got $retain")
    val fs = hadoopFs(spark, root)
    fs.mkdirs(new org.apache.hadoop.fs.Path(root))
    val claim = new org.apache.hadoop.fs.Path(root, "_claim")
    val claimOut =
      try fs.create(claim, false)
      catch { case e: java.io.IOException => throw new IllegalStateException(
        s"concurrent publisher detected at $root: $claim exists — another " +
          "writer is mid-publish, or crashed and needs its claim removed", e) }
    try claimOut.write(java.lang.management.ManagementFactory.getRuntimeMXBean
      .getName.getBytes("UTF-8"))
    finally claimOut.close()
    try {
      // max over pointer AND on-disk dirs: a table previously touched by an
      // OCC writer may retain versions above the pointer; never clobber one
      val next = (goldVersion(spark, root).toSeq ++ versionDirsOnDisk(fs, root))
        .foldLeft(0)(math.max) + 1
      df.write.mode(SaveMode.Overwrite).parquet(s"$root/v=$next")
      val tmp = new org.apache.hadoop.fs.Path(root, s"_CURRENT.$next.tmp")
      val out = fs.create(tmp, true)
      try out.write(s"v=$next".getBytes("UTF-8")) finally out.close()
      val fc = org.apache.hadoop.fs.FileContext.getFileContext(
        tmp.toUri, spark.sparkContext.hadoopConfiguration)
      fc.rename(tmp, new org.apache.hadoop.fs.Path(root, "_CURRENT"),
        org.apache.hadoop.fs.Options.Rename.OVERWRITE)
      val committed = goldVersion(spark, root)
      if (!committed.contains(next)) throw new IllegalStateException(
        s"lost publish race at $root: committed pointer is $committed, " +
          s"this writer published v=$next — a concurrent writer bypassed the claim")
      // record the publish in the _commits log so OCC writers and the
      // committed-version reader see claim-path versions too (idempotent:
      // ignore an already-present marker on a re-published version number)
      atomicCreate(fs, new org.apache.hadoop.fs.Path(root, s"_commits/$next"), "claim")
      fs.listStatus(new org.apache.hadoop.fs.Path(root)).map(_.getPath)
        .filter(p => p.getName.startsWith("v=") &&
          p.getName.stripPrefix("v=").toIntOption.exists(_ < next - retain))
        .foreach { p =>
          fs.delete(p, true)
          val v = p.getName.stripPrefix("v=")
          fs.delete(new org.apache.hadoop.fs.Path(root, s"_commits/$v"), false)
          fs.delete(new org.apache.hadoop.fs.Path(root, s"_reserve/$v"), false)
        }
      next
    } finally fs.delete(claim, false)
  }

  // ---- Multi-writer optimistic commit (Delta-log-shaped, filesystem CAS) --
  //
  // publishGold's `_claim` lease serializes writers by EXCLUSION: the loser
  // fails. Delta's log (the reference's gold MERGE transactionality,
  // `gold_dim_payment.py:108-122`) lets concurrent writers all make
  // progress and serializes only the COMMIT. This section reproduces that
  // protocol with filesystem primitives:
  //
  //   _reserve/N   exclusive create = version-number allocation (no two
  //                writers ever write the same v=N directory)
  //   v=N/         the reserving writer's complete data, written unshared
  //   _commits/N   exclusive create = the commit point (Delta's log entry);
  //                a version without a marker is invisible to readers
  //   _CURRENT     convenience pointer, repaired to max(committed) after
  //                every commit — readers keep their existing fast path and
  //                always see SOME committed version (possibly one behind
  //                for an instant, exactly a stale-snapshot read)
  //
  // Exclusive create is the one primitive the protocol needs: O_EXCL via
  // java.nio on local filesystems (atomic per POSIX), `fs.create(path,
  // overwrite=false)` elsewhere (atomic on HDFS; on S3-class stores this
  // maps to conditional PUT — the same primitive Delta/Iceberg use there).
  //
  // Semantics: versions are allocated in reservation order but COMMIT in
  // any order; the table converges to max(committed marker). A writer that
  // passes `expectedBase` gets read-modify-write protection — its commit
  // fails loudly if any other writer committed after its snapshot — while
  // blind publishers (full-table overwrites, the reference's daily DAG
  // shape) simply last-version-wins. A writer that crashes after reserving
  // leaves an invisible v=N + _reserve/N; vacuumGold removes them.

  private def isLocalFs(fs: org.apache.hadoop.fs.FileSystem): Boolean =
    fs.getScheme == "file"

  /** Exclusive create: true iff this call created the path. The OCC
    * protocol's only synchronization primitive. */
  private def atomicCreate(fs: org.apache.hadoop.fs.FileSystem,
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

  private def listNumbered(fs: org.apache.hadoop.fs.FileSystem,
                           dir: org.apache.hadoop.fs.Path): Seq[Int] =
    if (!fs.exists(dir)) Seq.empty
    else fs.listStatus(dir).toSeq.flatMap(_.getPath.getName.toIntOption)

  /** Highest committed version: max `_commits/N` marker. Falls back to the
    * `_CURRENT` pointer for tables only ever published by the claim path
    * (which predates markers). */
  def goldCommittedVersion(spark: SparkSession, root: String): Option[Int] = {
    val fs = hadoopFs(spark, root)
    val marked = listNumbered(fs, new org.apache.hadoop.fs.Path(root, "_commits"))
    if (marked.nonEmpty) Some(marked.max) else goldVersion(spark, root)
  }

  /** Concurrent-writer publish: every caller makes progress; commits
    * serialize through the `_commits` log. Returns the committed version.
    *
    * @param expectedBase pass the version this writer's input was computed
    *   FROM to get optimistic-concurrency conflict detection: the commit
    *   throws [[java.util.ConcurrentModificationException]] (and removes
    *   its own data) if any other writer committed after that snapshot —
    *   the lost-update a blind overwrite would silently accept. Omit for
    *   last-writer-wins full-table publishes. */
  def publishGoldOcc(spark: SparkSession, df: DataFrame, root: String,
                     retain: Int = 1, expectedBase: Option[Int] = None): Int = {
    require(retain >= 1, s"retain must keep at least the previous version, got $retain")
    val fs = hadoopFs(spark, root)
    val rootP = new org.apache.hadoop.fs.Path(root)
    fs.mkdirs(rootP)
    val reserveDir = new org.apache.hadoop.fs.Path(root, "_reserve")
    val commitsDir = new org.apache.hadoop.fs.Path(root, "_commits")
    val me = java.lang.management.ManagementFactory.getRuntimeMXBean.getName +
      "/" + Thread.currentThread().getId
    // 1. allocate a version number nobody else can hold
    var n = 0
    var reserved = false
    while (!reserved) {
      n = (listNumbered(fs, reserveDir) ++ listNumbered(fs, commitsDir) ++
        goldVersions(spark, root) ++ goldVersion(spark, root)).foldLeft(0)(math.max) + 1
      reserved = atomicCreate(fs, new org.apache.hadoop.fs.Path(reserveDir, n.toString), me)
    }
    try {
      // 2. write the data unshared — no other writer ever touches v=n
      df.write.mode(SaveMode.Overwrite).parquet(s"$root/v=$n")
      // 3. conflict check at the commit point, then the commit itself
      expectedBase.foreach { base =>
        val committed = goldCommittedVersion(spark, root).getOrElse(0)
        if (committed != base) {
          fs.delete(new org.apache.hadoop.fs.Path(root, s"v=$n"), true)
          throw new java.util.ConcurrentModificationException(
            s"gold OCC conflict at $root: this writer read v=$base but " +
              s"v=$committed is now committed; publish recomputed from the " +
              "current version or omit expectedBase for last-writer-wins")
        }
      }
      if (!atomicCreate(fs, new org.apache.hadoop.fs.Path(commitsDir, n.toString), me))
        throw new IllegalStateException(
          s"commit marker $n already exists at $root despite an exclusive " +
            "reservation — the table's metadata has been tampered with")
      // 4. repair the pointer to max(committed); every committer does this,
      // so a lower-version commit landing late cannot strand the pointer
      var repaired = false
      var attempts = 0
      while (!repaired && attempts < 10) {
        attempts += 1
        val target = goldCommittedVersion(spark, root).getOrElse(n)
        val tmp = new org.apache.hadoop.fs.Path(root, s"_CURRENT.${me.hashCode.toHexString}.$attempts.tmp")
        try {
          if (isLocalFs(fs)) {
            // POSIX rename(2): atomically replaces the destination even
            // under writer contention (Hadoop's local FileContext rename
            // with OVERWRITE is exists-check-then-delete-then-rename and
            // throws FileAlreadyExistsException when two repairs race).
            // Write the tmp via nio too, and drop any `._CURRENT.crc`
            // sidecar a claim-path publish left behind — LocalFs is
            // checksum-wrapped, and a bypassing rename would otherwise
            // leave a stale checksum that fails every subsequent read.
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
        // converged when the pointer names a version AND the max we wrote
        // is still the max — otherwise another commit landed; repeat
        repaired = goldCommittedVersion(spark, root).contains(target) &&
          goldVersion(spark, root).contains(target)
      }
      // 5. prune committed versions out of the retention window (never an
      // uncommitted reservation — its writer may still be mid-flight)
      val keepFrom = goldCommittedVersion(spark, root).getOrElse(n) - retain
      listNumbered(fs, commitsDir).filter(_ < keepFrom).foreach { v =>
        fs.delete(new org.apache.hadoop.fs.Path(root, s"v=$v"), true)
        fs.delete(new org.apache.hadoop.fs.Path(commitsDir, v.toString), false)
        fs.delete(new org.apache.hadoop.fs.Path(reserveDir, v.toString), false)
      }
      n
    } catch {
      case e: Throwable =>
        // an uncommitted reservation is invisible but holds a number; a
        // failed COMMITTED publish (pointer repair interrupted) must keep
        // its data. Only roll back when no marker was written.
        if (!fs.exists(new org.apache.hadoop.fs.Path(commitsDir, n.toString))) {
          fs.delete(new org.apache.hadoop.fs.Path(root, s"v=$n"), true)
          fs.delete(new org.apache.hadoop.fs.Path(reserveDir, n.toString), false)
        }
        throw e
    }
  }

  /** Remove crashed writers' leftovers: reservations (and their data dirs)
    * that never committed and are older than `olderThanMs`. Age-gated so a
    * live slow writer is never revoked — the same conservative stance as
    * publishGold's explicit claim recovery. */
  def vacuumGold(spark: SparkSession, root: String,
                 olderThanMs: Long = 24L * 3600 * 1000): Int = {
    val fs = hadoopFs(spark, root)
    val reserveDir = new org.apache.hadoop.fs.Path(root, "_reserve")
    val commitsDir = new org.apache.hadoop.fs.Path(root, "_commits")
    val committed = listNumbered(fs, commitsDir).toSet
    val cutoff = System.currentTimeMillis() - olderThanMs
    val stale = if (!fs.exists(reserveDir)) Seq.empty
      else fs.listStatus(reserveDir).toSeq
        .filter(s => s.getPath.getName.toIntOption.exists(!committed(_)) &&
          s.getModificationTime < cutoff)
    stale.foreach { s =>
      fs.delete(new org.apache.hadoop.fs.Path(root, s"v=${s.getPath.getName}"), true)
      fs.delete(s.getPath, false)
    }
    stale.size
  }

  /** Small-files maintenance for a versioned gold table: rewrite the
    * current version into `targetFiles` files and commit it as a new
    * version — to readers it is just another atomic publish. Incremental
    * pipelines accumulate small files; periodic compaction keeps scan task
    * counts and parquet-footer overhead bounded at scale. */
  def compactGold(spark: SparkSession, root: String, targetFiles: Int,
                  retain: Int = 1): Int =
    publishGold(spark, readGold(spark, root).repartition(targetFiles), root, retain)

  /** Gold SCD2 dim refresh: initial load or merge (`gold_dim_*.py`),
    * committed via [[publishGold]]. The effective date is typed end-to-end
    * (max(to_date(updated_at)) → DateType literal) — no string slicing of a
    * timestamp rendering. */
  def goldDim(spark: SparkSession, silverPath: String, goldPath: String,
              key: String, attrs: Seq[String]): DataFrame = {
    val silver = spark.read.parquet(silverPath)
    val src = silver.select((key +: attrs).map(col): _*)
    val effective = silver.agg(max(to_date(col("updated_at")))).first().get(0) match {
      case null => to_date(lit("1970-01-01"))
      case d: java.sql.Date => lit(d)
      case ld: java.time.LocalDate => lit(java.sql.Date.valueOf(ld))
      case other => throw new IllegalStateException(s"unexpected date: $other")
    }
    val merged =
      if (goldVersion(spark, goldPath).isEmpty) Scd2.initialLoad(src, effective)
      else Scd2.merge(readGold(spark, goldPath).drop("dim_key"), src, key, attrs, effective)
    publishGold(spark, Scd2.scalableKey(merged, key, "dim_key"), goldPath)
    readGold(spark, goldPath)
  }

  /** Gold fact: silver fact ⋈ broadcast current dim rows → surrogate keys,
    * partitioned append (`gold_fact_orders.py:76-128`). Dims resolve through
    * the versioned-publish pointer. */
  def goldFact(spark: SparkSession, silverFactPath: String,
               // dimName -> (path, businessKey in fact, id column in dim)
               dimPaths: Map[String, (String, String, String)],
               target: String): Long = {
    val fact = spark.read.parquet(silverFactPath)
    val enriched = dimPaths.foldLeft(fact) { case (f, (dim, (path, fk, dimId))) =>
      val d = readGold(spark, path)
        .filter(col("is_current"))
        .select(col(dimId).as(s"__${dim}_id"), col("dim_key").as(s"${dim}_key"))
      f.join(broadcast(d), f(fk) === d(s"__${dim}_id"), "left").drop(s"__${dim}_id")
    }
    bronzeIncremental(spark, enriched.drop("year", "month", "day"), "timestamp", target)
  }

  /** DQ gate: evaluate checks; returns failures (caller decides to halt —
    * the reference logs and continues, `spark_job_airflow.py:113-126`). */
  def dqGate(df: DataFrame, checks: Seq[Quality.Check]): Seq[String] =
    Quality.evaluate(df, checks)
      .filter(!col("passed")).select("check_id").collect().map(_.getString(0)).toSeq

  /** Multi-table gate: one single-pass evaluation per table, failures from
    * every table in one report. */
  def dqGateSuite(tables: Map[String, DataFrame], checks: Seq[Quality.Check]): Seq[String] =
    Quality.evaluateSuite(tables, checks)
      .filter(!col("passed")).select("check_id").collect().map(_.getString(0)).toSeq.sorted

  /** Per-table bronze DQ rule map — full parity with the reference's
    * table→columns map (`bronze_validation.py:87-118`): listed columns
    * null-rate-gated at the 5% rule, natural keys unique. Tables the
    * reference's map omits (payment_method, customers) get the same
    * id-completeness/uniqueness pattern — omitting them was a reference
    * gap, not a semantic choice.
    *
    * Note bronze is an incremental APPEND layer: a dimension row that
    * changes legitimately appears twice (two updated_at generations), and
    * the id-uniqueness rule then reports it — exactly as the reference's
    * validator would on its own incremental bronze. The gate reports; the
    * DAG continues (reference behavior, `spark_job_airflow.py:113-126`). */
  def bronzeRules(table: String): Seq[Quality.Check] = {
    val t = s"brz.$table"
    def nulls(cols: String*) = cols.map(c => Quality.NullRate(t, c, 0.05): Quality.Check)
    def unique(cols: String*) = cols.map(c => Quality.Uniqueness(t, c, 1.0): Quality.Check)
    table match {
      case "orders" =>
        nulls("id", "customer_id", "payment_method_id", "store_id") ++ unique("id")
      case "order_details" | "order_suggestion_accepted" =>
        nulls("order_id", "product_id", "quantity", "subtotal")
      case "products" =>
        nulls("id", "name", "category_id", "unit_price", "updated_at") ++ unique("id")
      case "product_category" =>
        nulls("id", "updated_at") ++ unique("id")
      case "stores" =>
        nulls("id", "address", "district", "city", "updated_at") ++ unique("id")
      case "payment_method" =>
        nulls("id", "method_name", "updated_at") ++ unique("id")
      case "customers" =>
        nulls("id", "updated_at") ++ unique("id")
      case _ =>
        Seq.empty // unknown table: no rules (mirrors the reference's allowlist map)
    }
  }

  /** Silver DQ suite — full parity with the reference's five-table Deequ
    * suite (`silver_validation.py:86-135`), mapped onto this pipeline's
    * silver vocabulary: the reference's slv.orders + slv.order_details
    * checks both land on the joined line-grain `fact_orders`; stores /
    * payment_method / customers keep their source column names (this
    * pipeline renames only products). */
  def silverRules: Seq[Quality.Check] = {
    def complete(t: String, cols: String*) =
      cols.map(c => Quality.Completeness(t, c, 1.0): Quality.Check)
    complete("slv.products", "product_id", "product_name", "category", "updated_at") ++
      Seq(Quality.MinValue("slv.products", "unit_price", 0.0),
        Quality.Uniqueness("slv.products", "product_id", 1.0)) ++
      complete("slv.stores", "id", "address", "district", "city", "updated_at") ++
      Seq(Quality.Uniqueness("slv.stores", "id", 1.0)) ++
      complete("slv.payment_method", "id", "updated_at") ++
      Seq(Quality.Uniqueness("slv.payment_method", "id", 1.0)) ++
      complete("slv.customers", "id", "updated_at") ++
      Seq(Quality.Uniqueness("slv.customers", "id", 1.0)) ++
      complete("slv.fact_orders",
        "order_id", "store_id", "customer_id", "payment_method_id",
        "product_id", "quantity", "subtotal") ++
      Seq(Quality.MinValue("slv.fact_orders", "subtotal", 0.0))
  }

  /** Pipeline configuration: source paths in, zone roots out. */
  case class Config(bronzeRoot: String, silverRoot: String, goldRoot: String,
                    schemaPolicy: SchemaPolicy = SchemaPolicy.Merge)

  /** Full DAG in dependency order for the coffee-chain shape; returns a
    * per-stage row-count / failure report.
    *
    * `sources` is the integration seam: table name → source DataFrame.
    * Everything downstream is source-agnostic, so with the connector jars
    * on the classpath (none exist in this environment, `build.sbt`) the
    * exact swap-ins are, mirroring `bronze_dimension_fact_load.py:46-57,110-131`:
    *
    *  - JDBC (S1):
    *    `spark.read.format("jdbc").option("url", url)
    *       .option("dbtable", t).option("partitionColumn", "id")
    *       .option("lowerBound", lo).option("upperBound", hi)
    *       .option("numPartitions", 32).load()`
    *    (bounded-partition read; the watermark filter in
    *    [[bronzeIncremental]] then pushes down as a WHERE clause).
    *  - Kafka batch drain (S3):
    *    `spark.read.format("kafka").option("subscribe", topic)
    *       .option("startingOffsets", "earliest").load()` followed by
    *    [[graft.streaming.Realtime.decodeCdc]] — the q10 query is exactly
    *    this shape from the value column onward.
    *  - Delta gold (S4/K5): replace [[publishGold]]/[[readGold]] with
    *    `df.write.format("delta")` + `DeltaTable.merge`; [[goldDim]]'s
    *    SCD2 logic ([[graft.operators.Scd2.merge]]) is unchanged — only
    *    the commit mechanism differs. */
  def run(spark: SparkSession, sources: Map[String, DataFrame], conf: Config): Map[String, Any] = {
    import conf._
    // Bronze (incremental, partitioned); the Kafka-drained suggestion topic
    // participates when the deployment provides it
    val bronzeTables = Seq("stores", "payment_method", "product_category",
      "products", "customers", "orders", "order_details") ++
      (if (sources.contains("order_suggestion_accepted"))
         Seq("order_suggestion_accepted") else Nil)
    val bronzeCounts = bronzeTables.map { t =>
      val tsCol = if (sources(t).columns.contains("updated_at")) "updated_at" else "timestamp"
      t -> bronzeIncremental(spark, sources(t), tsCol, s"$bronzeRoot/$t", conf.schemaPolicy)
    }.toMap
    // DQ gate: bronze — EVERY table gated per its rule map
    // (`bronze_validation.py:87-118` parity)
    val bronzeDq = dqGateSuite(
      bronzeTables.map(t => s"brz.$t" -> spark.read.parquet(s"$bronzeRoot/$t")).toMap,
      bronzeTables.flatMap(bronzeRules))
    // Silver dims (cleaned overwrite) + fact
    silverDim(spark, s"$bronzeRoot/stores", s"$silverRoot/stores", Seq("city", "district"))
    silverDim(spark, s"$bronzeRoot/payment_method", s"$silverRoot/payment_method", Seq("bank"))
    silverProducts(spark, s"$bronzeRoot/products", s"$bronzeRoot/product_category",
      s"$silverRoot/products")
    silverDim(spark, s"$bronzeRoot/customers", s"$silverRoot/customers", Seq("tier"))
    val factRows = silverFact(spark, s"$bronzeRoot/orders", s"$bronzeRoot/order_details",
      s"$silverRoot/fact_orders",
      suggestionsPath =
        if (sources.contains("order_suggestion_accepted"))
          Some(s"$bronzeRoot/order_suggestion_accepted") else None)
    // DQ gate: silver — all five silver tables through the Deequ-parity
    // suite (`silver_validation.py:86-135`)
    val silverDq = dqGateSuite(
      Seq("products", "stores", "payment_method", "customers", "fact_orders")
        .map(t => s"slv.$t" -> spark.read.parquet(s"$silverRoot/$t")).toMap,
      silverRules)
    // Gold dims (SCD2) + fact
    goldDim(spark, s"$silverRoot/stores", s"$goldRoot/dim_stores", "id",
      Seq("name", "address", "district", "city"))
    goldDim(spark, s"$silverRoot/payment_method", s"$goldRoot/dim_payment_method", "id",
      Seq("method_name", "bank"))
    // SCD2 attrs mirror gold_dim_products.py:86-87 — the denormalized
    // category NAME versions, not the raw category_id
    goldDim(spark, s"$silverRoot/products", s"$goldRoot/dim_products", "product_id",
      Seq("product_name", "category", "unit_price"))
    val goldRows = goldFact(spark, s"$silverRoot/fact_orders",
      Map(
        "store" -> (s"$goldRoot/dim_stores", "store_id", "id"),
        "payment" -> (s"$goldRoot/dim_payment_method", "payment_method_id", "id"),
        "product" -> (s"$goldRoot/dim_products", "product_id", "product_id")),
      s"$goldRoot/fact_orders")
    Map("bronze" -> bronzeCounts, "bronze_dq_failures" -> bronzeDq,
      "silver_fact_rows" -> factRows, "silver_dq_failures" -> silverDq,
      "gold_fact_rows" -> goldRows)
  }
}
