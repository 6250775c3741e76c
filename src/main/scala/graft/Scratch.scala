package graft

/** Temp-dir allocation for index-lifecycle queries (q96/q97, q103–q110,
  * q116–q120) and stress tools — two jobs a bare
  * `java.nio.file.Files.createTempDirectory(prefix)` does not do:
  *
  *   1. **Call-time tmpdir.** The JDK's single-arg `createTempDirectory`
  *      goes through `TempFileHelper`, which captures `java.io.tmpdir` in a
  *      static initializer — so [[Bench.routeTmpdir]]'s tmpfs reroute only
  *      worked while it ran before ANY temp-file use in the JVM (library
  *      static init could silently pin the slow disk tmpdir forever).
  *      [[tempDir]] reads the property at every call and passes the
  *      directory explicitly, so the reroute holds no matter what loaded
  *      first.
  *   2. **Lifecycle tracking.** Each Bench rep / Verify query re-invokes
  *      its lambda and builds a FRESH index dir; the previous one is dead
  *      the moment the result is materialized, but nothing deleted it —
  *      with tmpdir on RAM-counted tmpfs, repeated reps plus self-heal
  *      re-runs accumulated whole postings/shingle/codes stores in memory
  *      (the budget behind an earlier sf10 OOM). Allocations register
  *      here; [[sweep]] (called by Bench after every rep and by Verify
  *      after every query dump, OUTSIDE the timed window) deletes them.
  *
  * Sweeping is safe exactly because the harness fully materializes each
  * query's result (Bench's xxhash64 fold, Verify's parquet write) before
  * sweeping — no lazy plan still references a swept dir.
  */
object Scratch {
  private val live = new java.util.concurrent.ConcurrentLinkedQueue[java.nio.file.Path]()

  /** A fresh directory under the CURRENT `java.io.tmpdir`, registered for
    * the next [[sweep]]. Drop-in for `Files.createTempDirectory(prefix)`. */
  def tempDir(prefix: String): String = {
    val base = java.nio.file.Paths.get(System.getProperty("java.io.tmpdir"))
    java.nio.file.Files.createDirectories(base)
    val p = java.nio.file.Files.createTempDirectory(base, prefix)
    live.add(p)
    p.toString
  }

  /** Delete every directory allocated since the last sweep. Best-effort
    * (a file held open loses its dir to the OS tmp reaper instead);
    * returns the number of directories removed. */
  def sweep(): Int = {
    var n = 0
    var p = live.poll()
    while (p != null) {
      if (deleteRecursively(p.toFile)) n += 1
      p = live.poll()
    }
    n
  }

  private def deleteRecursively(f: java.io.File): Boolean = {
    val children = f.listFiles()
    if (children != null) children.foreach(deleteRecursively)
    f.delete()
  }
}
