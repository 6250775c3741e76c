package graft

import java.util.concurrent.{CountDownLatch, Executors, TimeUnit}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.operators.{LexIndex, LexIndexOcc}
import graft.pipeline.Occ
import graft.sources.Tables

/** Concurrent maintenance for the persisted BM25 lexical index: one
  * epoch appender + two compactors on one index root, composing through
  * the `_reserve`/`_commits` commit log — the DedupIndexOccSpec /
  * VectorIndexOccSpec discipline applied to [[LexIndexOcc]]. Closing
  * invariant: queries against the final generation are BIT-IDENTICAL to
  * a fresh [[LexIndex.build]] over (base corpus ∪ every committed
  * epoch), i.e. no epoch lost to a compactor's commit window, none
  * double-counted by the carry / handoff pair (df is query-derived and
  * meta deltas are additive, so a duplicated epoch would shift scores,
  * not just rows). */
class LexIndexOccSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("two compactors + one epoch appender converge; query ≡ fresh build over base ∪ epochs") {
    val docs = Tables.documents(spark, sf)
    val corpus = docs.filter(col("doc_id") < 300).select(col("doc_id"), col("text"))
    val root = java.nio.file.Files.createTempDirectory("lix-occ")
      .resolve("ix").toString
    val outDir = java.nio.file.Files.createTempDirectory("lix-occ-out").toString
    assert(LexIndexOcc.publish(
      LexIndex.build(corpus, "doc_id", "text"), root, retain = 100) == 1)
    // epoch batches: fresh ids, text reused from the corpus tail (real
    // term overlap, so appended postings land in contended pb partitions)
    def batch(e: Int): DataFrame = {
      val lo = 300 + (e - 1) * 30
      docs.filter(col("doc_id") >= lo && col("doc_id") < lo + 30)
        .select((col("doc_id") + 100000).as("doc_id"), col("text"))
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
    pool.submit(guard { // the appender: epochs 1..5
      (1 to 5).foreach { e =>
        LexIndexOcc.appendEpoch(spark, root, e, batch(e), "doc_id", "text", outDir)
        Thread.sleep(40)
      }
    })
    (1 to 2).foreach { c =>
      pool.submit(guard {
        (1 to 2).foreach { _ =>
          LexIndexOcc.compact(spark, root, outDir, "doc_id", "text", retain = 100)
          Thread.sleep(80 * c)
        }
      })
    }
    start.countDown()
    pool.shutdown()
    assert(pool.awaitTermination(300, TimeUnit.SECONDS), "writers deadlocked")
    assert(failures.get() == null, s"writer failed: ${failures.get()}")
    // quiesce: one final compact folds any carry-pending epochs forward
    LexIndexOcc.compact(spark, root, outDir, "doc_id", "text", retain = 100)

    // every epoch marker visible in the final generation
    val genDir = Occ.currentDir(spark, root).get
    val fs = Occ.hadoopFs(spark, genDir)
    val markers = fs.listStatus(new org.apache.hadoop.fs.Path(genDir, "_epochs"))
      .flatMap(_.getPath.getName.toLongOption).toSet
    assert((1L to 5L).toSet.subsetOf(markers), s"missing epoch markers: $markers")

    // meta constants are exactly the union corpus's (additive per-epoch
    // deltas summed by read, then squashed by compact — either layout
    // must sum to the rebuilt values)
    val union = corpus.unionByName(
      (1 to 5).map(batch).reduce(_ unionByName _))
    val expected = LexIndex.build(union, "doc_id", "text")
    val got = LexIndexOcc.read(spark, root)
    assert(got.nDocs == expected.nDocs,
      s"nDocs ${got.nDocs} != rebuilt ${expected.nDocs}")
    assert(got.totLen == expected.totLen,
      s"totLen ${got.totLen} != rebuilt ${expected.totLen}")

    // queries bit-identical to the fresh build (df query-derived, idf off
    // the summed meta): every 7th doc's first 4 tokens as the query batch
    val queries = union.filter(col("doc_id") % 7 === 0)
      .select(col("doc_id").as("query_id"),
        array_join(slice(graft.operators.Dedup.tokens(col("text")), 1, 4), " ")
          .as("qtext"))
    def resultSet(ix: graft.operators.Bm25Index) =
      LexIndex.query(ix, queries, "query_id", "qtext", k = 5)
        .collect().map(_.toSeq).toSet
    assert(resultSet(got) == resultSet(expected),
      "converged-index query diverges from fresh-build query")

    // positional serving survives the concurrent lifecycle too
    val phrases = union.filter(col("doc_id") % 13 === 0)
      .filter(size(graft.operators.Dedup.tokens(col("text"))) >= 3)
      .select(col("doc_id").as("query_id"),
        array_join(slice(graft.operators.Dedup.tokens(col("text")), 2, 2), " ")
          .as("phrase"))
    def phraseSet(ix: graft.operators.Bm25Index) =
      LexIndex.phraseTopK(ix, phrases, "query_id", "phrase", k = 5)
        .collect().map(_.toSeq).toSet
    assert(phraseSet(got) == phraseSet(expected),
      "converged-index phrase query diverges from fresh-build")
  }
}
