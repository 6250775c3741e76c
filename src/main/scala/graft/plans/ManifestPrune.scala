package graft.plans

import java.util.concurrent.ConcurrentHashMap

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.{FileIndex, HadoopFsRelation, LogicalRelation, PartitionDirectory}

import graft.pipeline.DataSkipping

/** Stats-manifest file skipping as a CATALYST RULE — the planner-side twin
  * of [[DataSkipping.readSkipping]].
  *
  * `readSkipping`/`readGoldSkipping` give manifest pruning to callers who
  * ask for it; this rule gives it to every read of a manifest-indexed
  * directory in a session with `GraftExtensions` installed — including
  * `spark.sql` text over a temp view, where there is no call site to swap.
  * When the optimizer sees `Filter(cond, scan(dir))` and `dir/_manifest`
  * exists, the filter is rewritten into a stats predicate over the
  * manifest ([[DataSkipping]]'s conservative rewrite: one small parquet
  * read instead of O(#files) footer opens at scan planning), and files the
  * stats PROVE cannot match are dropped from the scan's [[FileIndex]].
  *
  * Soundness (never changes results):
  *   - the data predicate stays in the plan — pruning only removes files
  *     whose min/max/null stats make every row's predicate FALSE;
  *   - files absent from the manifest are KEPT (the rule subtracts a
  *     definitely-rejected set from the live listing, so files appended
  *     after indexing are always scanned);
  *   - any unrecognized predicate shape, missing stat, or NULL stat keeps
  *     the file (DataSkipping's keep-on-null contract);
  *   - non-deterministic conditions are never rewritten.
  *
  * 100 TB shape: the manifest evaluation is one driver-side query over a
  * 10^5-row frame and is memoized per (dir, canonicalized predicate) —
  * re-optimizations (fixed-point batches, AQE stage re-planning) hit the
  * cache, so a selective query on a 10^6-file gold table plans in
  * milliseconds however many times the optimizer runs. Opt out per
  * session with `spark.graft.manifestPrune.enabled=false`.
  */
case class ManifestPruneRule(session: SparkSession) extends Rule[LogicalPlan] {
  import ManifestPruneRule._

  private def enabled: Boolean =
    session.conf.get("spark.graft.manifestPrune.enabled", "true") == "true"

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (!enabled) return plan
    plan.transform {
      case f @ Filter(cond, lr: LogicalRelation)
          if cond.deterministic && eligible(lr) =>
        val rel = lr.relation.asInstanceOf[HadoopFsRelation]
        val root = rel.location.rootPaths.head
        val rejected = rejectedSet(session, root, cond)
        if (rejected.isEmpty) f
        else {
          val pruned = new PrunedFileIndex(rel.location, rejected)
          Filter(cond, lr.copy(relation = rel.copy(location = pruned)(session)))
        }
    }
  }

  /** One root, manifest present, not already pruned. The `_manifest`
    * existence probe is memoized: without the cache every parquet scan in
    * every optimization would pay a filesystem call. */
  private def eligible(lr: LogicalRelation): Boolean = lr.relation match {
    case rel: HadoopFsRelation =>
      !rel.location.isInstanceOf[PrunedFileIndex] &&
      rel.location.rootPaths.length == 1 &&
      hasManifest(session, rel.location.rootPaths.head)
    case _ => false
  }
}

object ManifestPruneRule {
  // both caches are per-JVM and bounded; entries are invalidated by
  // DataSkipping.writeManifest (same-JVM writers). Positive presence
  // entries are sticky (manifest-indexed dirs are immutable in the gold
  // contract — one manifest per published version directory); NEGATIVE
  // entries carry a TTL so a manifest published by ANOTHER process is
  // eventually observed by long-lived sessions — until then the miss is
  // an optimization gap, never a correctness issue. The size-check-then-
  // put pair is deliberately unsynchronized: the bound may be exceeded by
  // a few in-flight entries momentarily, which is harmless.
  //
  // presence values: 0L = present (sticky); otherwise the nanoTime
  // deadline after which the cached "absent" verdict expires.
  private val manifestPresence = new ConcurrentHashMap[String, java.lang.Long]()
  private val rejectedCache = new ConcurrentHashMap[(String, Expression), Set[String]]()
  private val MaxCacheEntries = 4096
  private val NegativeTtlNanos = 30L * 1000L * 1000L * 1000L

  private[graft] def invalidate(dir: String): Unit = {
    manifestPresence.remove(dir)
    rejectedCache.keySet.removeIf(_._1 == dir)
  }

  private def hasManifest(session: SparkSession, root: Path): Boolean = {
    val key = root.toString
    val cached = manifestPresence.get(key)
    if (cached != null &&
        (cached.longValue() == 0L || System.nanoTime() < cached.longValue())) {
      cached.longValue() == 0L
    } else {
      val fs = root.getFileSystem(session.sparkContext.hadoopConfiguration)
      val present = fs.exists(new Path(root, DataSkipping.ManifestDir))
      if (manifestPresence.size() > MaxCacheEntries) manifestPresence.clear()
      manifestPresence.put(key,
        if (present) 0L else System.nanoTime() + NegativeTtlNanos)
      present
    }
  }

  /** Fully-qualified paths of files the manifest rejects for `cond`,
    * memoized on (dir, canonicalized condition) so re-optimizations reuse
    * the evaluation. */
  private def rejectedSet(session: SparkSession, root: Path,
                          cond: Expression): Set[String] = {
    val fs = root.getFileSystem(session.sparkContext.hadoopConfiguration)
    val qualified = fs.makeQualified(root).toString
    val key = (qualified, cond.canonicalized)
    val cached = rejectedCache.get(key)
    if (cached != null) cached
    else {
      val rel = DataSkipping.rejectedFiles(session, qualified, cond)
      val full = rel.map(r => PrunedFileIndex.canon(new Path(s"$qualified/$r"))).toSet
      if (rejectedCache.size() > MaxCacheEntries) rejectedCache.clear()
      rejectedCache.put(key, full)
      full
    }
  }
}

/** A [[FileIndex]] that serves its underlying index's listing MINUS a
  * rejected set — the scan-side carrier of a manifest-pruning decision.
  * Subtractive by design: files the manifest never indexed pass through
  * untouched. `sizeInBytes` stays the underlying estimate (an
  * overestimate only makes the planner more conservative about
  * broadcasting the pruned side — safe). `rejected` holds
  * [[PrunedFileIndex.canon]]-normalized paths: the same file renders as
  * `file:/x` from a qualified Hadoop Path but `file:///x` from
  * `inputFiles`, so raw-string comparison would silently prune nothing. */
class PrunedFileIndex(under: FileIndex, rejected: Set[String]) extends FileIndex {
  import PrunedFileIndex.canon
  override def rootPaths: Seq[Path] = under.rootPaths
  override def listFiles(partitionFilters: Seq[Expression],
                         dataFilters: Seq[Expression]): Seq[PartitionDirectory] =
    under.listFiles(partitionFilters, dataFilters)
      .map(pd => pd.copy(files = pd.files.filterNot(f => rejected(canon(f.getPath)))))
      .filter(_.files.nonEmpty)
  override def inputFiles: Array[String] =
    under.inputFiles.filterNot(s => rejected(canon(new Path(s))))
  override def refresh(): Unit = under.refresh()
  override def sizeInBytes: Long = under.sizeInBytes
  override def partitionSchema: org.apache.spark.sql.types.StructType =
    under.partitionSchema
  override def metadataOpsTimeNs: Option[Long] = under.metadataOpsTimeNs
}

object PrunedFileIndex {
  /** Scheme-plus-absolute-path canonical form, agnostic to the `file:` vs
    * `file:///` URI rendering split between Hadoop Path.toString and
    * Spark's inputFiles. */
  private[plans] def canon(p: Path): String = {
    val u = p.toUri
    (if (u.getScheme != null) u.getScheme + ":" else "") + u.getPath
  }
}
