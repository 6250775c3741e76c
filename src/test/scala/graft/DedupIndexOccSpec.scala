package graft

import java.util.concurrent.{CountDownLatch, Executors, TimeUnit}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.operators.{DedupIndex, DedupIndexOcc}
import graft.pipeline.Occ
import graft.sources.Tables

/** Concurrent maintenance for the persisted MinHash dedup index: one gate
  * stream (the at-ingest appender) + two compactors on one index root,
  * composing through the `_reserve`/`_commits` commit log — the
  * VectorIndexOccSpec discipline applied to [[DedupIndexOcc]]. Closing
  * invariant: the final generation's frames are EXACTLY what a fresh
  * build over (base corpus ∪ every gate-kept doc) derives — no epoch
  * lost to a maintainer's commit window, none duplicated by the carry /
  * handoff pair. */
class DedupIndexOccSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("two compactors + one gate appender converge; frames ≡ fresh build over base ∪ kept") {
    val docs = Tables.documents(spark, sf)
    val corpus = docs.filter(col("doc_id") < 300).select(col("doc_id"), col("text"))
    val root = java.nio.file.Files.createTempDirectory("dix-occ")
      .resolve("ix").toString
    val outDir = java.nio.file.Files.createTempDirectory("dix-occ-out").toString
    assert(DedupIndexOcc.publish(
      DedupIndex.build(corpus, "doc_id", "text"), root, retain = 100) == 1)
    val corpusText = corpus.orderBy(col("doc_id")).select(col("text"))
      .limit(1).collect().head.getString(0)
    // epoch batches: every 3rd row a verbatim corpus dup (must be gated
    // away), the rest novel
    def batch(e: Int): DataFrame = {
      val lo = 300 + (e - 1) * 30
      docs.filter(col("doc_id") >= lo && col("doc_id") < lo + 30)
        .select((col("doc_id") + 100000).as("doc_id"),
          when(col("doc_id") % 3 === 0, lit(corpusText))
            .otherwise(concat(col("text"), lit(" novel-suffix"))).as("text"))
    }
    val start = new CountDownLatch(1)
    val pool = Executors.newFixedThreadPool(3)
    val failures = new java.util.concurrent.atomic.AtomicReference[Throwable]()
    def guard(body: => Unit): Runnable = new Runnable {
      def run(): Unit = {
        start.await()
        try body catch { case t: Throwable => failures.compareAndSet(null, t) }
      }
    }
    pool.submit(guard { // the gate stream: epochs 1..5
      (1 to 5).foreach { e =>
        DedupIndexOcc.gateEpoch(spark, root, e, batch(e), "doc_id", "text",
          outDir, threshold = 0.1, maxBucketSize = 100)
        Thread.sleep(40)
      }
    })
    (1 to 2).foreach { c =>
      pool.submit(guard {
        (1 to 2).foreach { _ =>
          DedupIndexOcc.compact(spark, root, outDir, "doc_id", "text", retain = 100)
          Thread.sleep(80 * c)
        }
      })
    }
    start.countDown()
    pool.shutdown()
    assert(pool.awaitTermination(300, TimeUnit.SECONDS), "writers deadlocked")
    assert(failures.get() == null, s"writer failed: ${failures.get()}")
    // quiesce: one final compact folds any sweep-carried epochs forward
    DedupIndexOcc.compact(spark, root, outDir, "doc_id", "text", retain = 100)

    // every epoch marker visible in the final generation
    val genDir = Occ.currentDir(spark, root).get
    val fs = Occ.hadoopFs(spark, genDir)
    val markers = fs.listStatus(new org.apache.hadoop.fs.Path(genDir, "_epochs"))
      .flatMap(_.getPath.getName.toLongOption).toSet
    assert((1L to 5L).toSet.subsetOf(markers), s"missing epoch markers: $markers")

    // the dup rows were actually gated (batch ids with %3==0 pattern map to
    // a verbatim corpus text); kept = union of committed gate outputs
    val kept = spark.read.parquet(s"$outDir/e*-0.parquet")
    assert(kept.count() > 0)
    assert(kept.filter(col("text") === corpusText).count() == 0,
      "an exact corpus dup slipped through the gate")

    // frames ≡ fresh build over base ∪ kept (no lost epoch, no dup rows)
    val expected = DedupIndex.build(corpus.unionByName(kept), "doc_id", "text")
    val got = DedupIndexOcc.read(spark, root)
    def hashSet(df: DataFrame) = df.select(col("id"), col("text_md5"))
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(hashSet(got.hashes) == hashSet(expected.hashes), "hashes diverge")
    def sigSet(df: DataFrame) = {
      val cols = df.columns.sorted
      df.select(cols.map(col): _*).collect().map(_.toSeq).toSet
    }
    assert(sigSet(got.sigs) == sigSet(expected.sigs), "sigs diverge")
    assert(got.shingles.select(col("id"), col("shingle")).distinct().count() ==
      expected.shingles.select(col("id"), col("shingle")).distinct().count(),
      "shingle store diverges")
    // and the converged index still gates: a replayed dup batch keeps nothing new
    val probe = DedupIndexOcc.probe(spark, root,
      kept.limit(5).select((col("doc_id") + 500000).as("doc_id"), col("text")),
      "doc_id", "text", threshold = 0.1, maxBucketSize = 100)
    assert(probe.filter(col("exact_dup")).count() == probe.count(),
      "replayed kept docs must all flag exact_dup against the converged index")
  }
}
