package graft

import java.util.concurrent.{CountDownLatch, Executors, TimeUnit}
import org.apache.spark.sql.functions._
import graft.operators.{Similarity, VectorIndex, VectorIndexOcc}
import graft.functions.GraftFunctions
import graft.pipeline.Occ
import graft.sources.Tables

/** Concurrent index maintenance (VERDICT r8 #2): appenders, deleters and
  * whole-generation maintainers (compact/retrain) composing on ONE index
  * root through the `_reserve`/`_commits` commit log, with real threads —
  * the GoldOccSpec discipline applied to [[VectorIndexOcc]]. The two
  * invariants every test closes on:
  *   1. NO LOST DELTAS — the final generation's id set is exactly base ∪
  *      every appended epoch (minus deletes), each id exactly once;
  *   2. NO MIXED QUANTIZER GENERATIONS — every code row in the final
  *      generation equals a fresh encode of that id against the final
  *      generation's own centroids + codebook (a carried epoch that kept
  *      stale codes, or a rebuild that dropped one, breaks this). */
class VectorIndexOccSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  private def freshRoot(): String = java.nio.file.Files
    .createTempDirectory("vix-occ").resolve("ix").toString

  private def emb = Tables.embeddings(spark, sf)
    .select(col("vec_id"), col("embedding"))

  /** Re-encode `ids` from raw embeddings with `ix`'s quantizers — the
    * ground truth every committed code row must match. */
  private def reEncode(ix: graft.operators.IvfPqIndex,
                       ids: org.apache.spark.sql.DataFrame) = {
    GraftFunctions.register(spark)
    val q = emb.join(ids, Seq("vec_id"), "left_semi")
      .select(col("vec_id"), Similarity.quantize(col("embedding")).as("__qv"))
    Similarity.assignCells(q, "vec_id", ix.centroids)
      .select(col("vec_id").as("id"), col("cell"),
        call_function("graft_pqenc", col("__qv"), Similarity.cbLiteral(ix.codebook))
          .as("codes"))
  }

  private def canonCodes(df: org.apache.spark.sql.DataFrame): Seq[(Long, Long, String)] = {
    import spark.implicits._
    df.select(col("id").cast("long"), col("cell").cast("long"),
        expr("array_join(transform(codes, x -> CAST(x AS STRING)), ',')"))
      .as[(Long, Long, String)].collect().toSeq.sorted
  }

  private def assertConverged(root: String, expectIds: Set[Long]): Unit = {
    val ix = VectorIndexOcc.read(spark, root)
    val ids = ix.codes.select(col("id").cast("long")).collect().map(_.getLong(0))
    assert(ids.length == ids.distinct.length,
      s"duplicate ids in final generation: ${ids.diff(ids.distinct).distinct.take(5).toSeq}")
    assert(ids.toSet == expectIds,
      s"lost/extra deltas: missing=${(expectIds -- ids.toSet).take(5)}, " +
        s"extra=${(ids.toSet -- expectIds).take(5)}")
    // every committed code row matches a fresh encode against the FINAL
    // generation's quantizers — no stale-quantizer rows survived a carry
    import spark.implicits._
    val expected = canonCodes(reEncode(ix, ids.toSeq.toDF("vec_id")))
    assert(canonCodes(ix.codes) == expected,
      "codes diverge from a fresh encode with the final quantizers")
  }

  test("two compactors + one appender converge without lost deltas") {
    val root = freshRoot()
    val base = VectorIndex.build(emb.filter(col("vec_id") < 300),
      "vec_id", "embedding", nCells = 8, m = 16, ks = 16, trainIters = 0)
    assert(VectorIndexOcc.publish(base, root, retain = 100) == 1)
    val start = new CountDownLatch(1)
    val pool = Executors.newFixedThreadPool(3)
    val failures = new java.util.concurrent.atomic.AtomicReference[Throwable]()
    def guard(body: => Unit): Runnable = new Runnable {
      def run(): Unit = {
        start.await()
        try body catch { case t: Throwable => failures.compareAndSet(null, t) }
      }
    }
    pool.submit(guard { // appender: epochs 1..8, 25 ids each
      (1 to 8).foreach { e =>
        val lo = 300 + (e - 1) * 25
        VectorIndexOcc.appendEpoch(spark, root, e,
          emb.filter(col("vec_id") >= lo && col("vec_id") < lo + 25),
          "vec_id", "embedding")
        Thread.sleep(50)
      }
    })
    (1 to 2).foreach { c =>
      pool.submit(guard {
        (1 to 2).foreach { _ =>
          VectorIndexOcc.compact(spark, root, targetFiles = 1, retain = 100)
          Thread.sleep(100 * c)
        }
      })
    }
    start.countDown()
    pool.shutdown()
    assert(pool.awaitTermination(300, TimeUnit.SECONDS), "writers deadlocked")
    assert(failures.get() == null, s"writer failed: ${failures.get()}")
    // quiesce: one final compact folds any sweep-carried epochs forward
    VectorIndexOcc.compact(spark, root, targetFiles = 1, retain = 100)
    assertConverged(root, (0L until 500L).toSet)
    // all epochs are marker-visible in the final generation
    val genDir = Occ.currentDir(spark, root).get
    val fs = Occ.hadoopFs(spark, genDir)
    val markers = fs.listStatus(new org.apache.hadoop.fs.Path(genDir, "_epochs"))
      .flatMap(_.getPath.getName.toLongOption).toSet
    assert((1L to 8L).toSet.subsetOf(markers), s"missing epoch markers: $markers")
    // serving the converged index works end to end
    assert(VectorIndexOcc.topK(spark, root,
      emb.filter(col("vec_id") % 40 === 0), "vec_id", "embedding",
      k = 5, nProbe = 4).count() > 0)
  }

  test("retrain racing an appender re-encodes carried epochs with the new quantizers") {
    val root = freshRoot()
    val base = VectorIndex.build(emb.filter(col("vec_id") < 300),
      "vec_id", "embedding", nCells = 8, m = 16, ks = 16, trainIters = 0)
    VectorIndexOcc.publish(base, root, retain = 100)
    val start = new CountDownLatch(1)
    val pool = Executors.newFixedThreadPool(2)
    val failures = new java.util.concurrent.atomic.AtomicReference[Throwable]()
    def guard(body: => Unit): Runnable = new Runnable {
      def run(): Unit = {
        start.await()
        try body catch { case t: Throwable => failures.compareAndSet(null, t) }
      }
    }
    pool.submit(guard {
      (1 to 4).foreach { e =>
        val lo = 300 + (e - 1) * 50
        VectorIndexOcc.appendEpoch(spark, root, e,
          emb.filter(col("vec_id") >= lo && col("vec_id") < lo + 50),
          "vec_id", "embedding")
        Thread.sleep(30)
      }
    })
    pool.submit(guard { // retrain mid-append: carried epochs MUST re-encode
      Thread.sleep(200)
      VectorIndexOcc.retrain(spark, root, emb, "vec_id", "embedding",
        nCells = 8, m = 16, ks = 16, trainIters = 0, retain = 100)
    })
    start.countDown()
    pool.shutdown()
    assert(pool.awaitTermination(300, TimeUnit.SECONDS), "writers deadlocked")
    assert(failures.get() == null, s"writer failed: ${failures.get()}")
    assertConverged(root, (0L until 500L).toSet)
  }

  test("deleteIds hands off across a racing compact; tombstones applied and cleared") {
    val root = freshRoot()
    VectorIndexOcc.publish(VectorIndex.build(emb, "vec_id", "embedding",
      nCells = 8, m = 16, ks = 16, trainIters = 0), root, retain = 100)
    val n = VectorIndexOcc.deleteIds(spark, root,
      emb.filter(col("vec_id") % 7 === 0).select("vec_id"), "vec_id")
    assert(n > 0)
    VectorIndexOcc.compact(spark, root, targetFiles = 1, retain = 100)
    val genDir = Occ.currentDir(spark, root).get
    val fs = Occ.hadoopFs(spark, genDir)
    assert(!fs.exists(new org.apache.hadoop.fs.Path(genDir, "_tombstones")),
      "compact must fold tombstones into the rewrite")
    assertConverged(root, (0L until 500L).filter(_ % 7 != 0).toSet)
  }

  test("maintainer conflict is detected and the retry converges (expectedBase)") {
    val root = freshRoot()
    VectorIndexOcc.publish(VectorIndex.build(emb.filter(col("vec_id") < 100),
      "vec_id", "embedding", nCells = 4, m = 16, ks = 16, trainIters = 0),
      root, retain = 100)
    val base = Occ.committedVersion(spark, root).get
    // a second writer commits under the first's feet
    Occ.publishDir(spark, root, retain = 100) { dir =>
      VectorIndex.write(VectorIndex.read(spark, Occ.versionDir(root, base)), dir)
    }
    intercept[java.util.ConcurrentModificationException] {
      Occ.publishDir(spark, root, retain = 100, expectedBase = Some(base)) { dir =>
        VectorIndex.write(VectorIndex.read(spark, Occ.versionDir(root, base)), dir)
      }
    }
    // the high-level maintainer hides the conflict behind its retry loop
    VectorIndexOcc.compact(spark, root, targetFiles = 1, retain = 100)
    assertConverged(root, (0L until 100L).toSet)
  }
}
