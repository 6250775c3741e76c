package graft

import org.apache.spark.sql.functions._
import graft.operators.{Dedup, LexIndex, Retrieval}
import graft.sources.Tables

/** Persisted BM25 index semantics: the persistence hop is value-neutral
  * (query ≡ one-shot bm25TopK bit-for-bit), appends are O(delta) and
  * leave existing data files byte-untouched while serving exactly like a
  * build over the union, and the query-time postings read prunes to the
  * query terms' partitions. */
class LexIndexSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  private def queriesOf(docs: org.apache.spark.sql.DataFrame) =
    docs.filter(col("doc_id") % 7 === 0)
      .select(col("doc_id").as("query_id"),
        array_join(slice(Dedup.tokens(col("text")), 1, 4), " ").as("qtext"))

  private def canon(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("rank"),
      r.getAs[Long]("doc_id"), r.getAs[Long]("n_hit_terms"),
      r.getAs[Long]("score_micros"), r.getAs[Double]("score"))).sortBy(t => (t._1, t._2))

  test("build → write → read → query ≡ one-shot bm25TopK, bit for bit") {
    val docs = Tables.documents(spark, sf)
    val qs = queriesOf(docs)
    val oneShot = canon(Retrieval.bm25TopK(docs, "doc_id", "text",
      qs, "query_id", "qtext", k = 10))
    val inMem = canon(LexIndex.query(LexIndex.build(docs, "doc_id", "text"),
      qs, "query_id", "qtext", k = 10))
    assert(inMem === oneShot)
    val dir = java.nio.file.Files.createTempDirectory("graft-lix").toString + "/ix"
    LexIndex.write(LexIndex.build(docs, "doc_id", "text"), dir)
    val reloaded = canon(LexIndex.query(LexIndex.read(spark, dir),
      qs, "query_id", "qtext", k = 10))
    assert(reloaded === oneShot)
    // the postings store is pb-partitioned and the read prunes on it
    val pbDirs = new java.io.File(s"$dir/postings").listFiles()
      .filter(_.getName.startsWith("pb="))
    assert(pbDirs.nonEmpty)
    val plan = LexIndex.query(LexIndex.read(spark, dir),
        qs, "query_id", "qtext", k = 10)
      .queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [pb"),
      "query-term pb values not pushed as a partition filter")
    // the term list itself is pushed as a static scan filter (the sorted
    // write gives row groups tight term min/max stats for it to prune)
    assert(plan.contains("PushedFilters: [In(term"),
      s"query terms not pushed into the postings scan:\n${plan.take(2000)}")
  }

  test("append: existing data files untouched, meta exact, ≡ build over the union") {
    val docs = Tables.documents(spark, sf)
    val base = docs.filter(col("doc_id") % 5 =!= 1)
    val delta = docs.filter(col("doc_id") % 5 === 1)
    val dir = java.nio.file.Files.createTempDirectory("graft-lix-a").toString + "/ix"
    LexIndex.write(LexIndex.build(base, "doc_id", "text"), dir)

    def snapshot(): Map[String, (Long, Long)] = {
      def walk(f: java.io.File): Seq[java.io.File] =
        if (f.isDirectory) f.listFiles().toSeq.flatMap(walk) else Seq(f)
      // commit markers are re-touched by append by design — only DATA
      // files must stay byte-identical; meta is rewritten by contract
      walk(new java.io.File(dir))
        .filterNot(f => f.getName.startsWith(".") || f.getName.startsWith("_"))
        .filterNot(_.getPath.contains("/meta"))
        .map(f => f.getPath -> (f.length(), f.lastModified())).toMap
    }
    val before = snapshot()
    val appended = LexIndex.appendToDir(spark, dir, delta, "doc_id", "text")
    val after = snapshot()
    before.foreach { case (p, sig) =>
      assert(after.get(p).contains(sig), s"pre-existing file rewritten: $p")
    }
    assert(after.size > before.size, "append committed no new file")

    // maintained constants are EXACTLY the rebuilt ones
    val rx = LexIndex.read(spark, dir)
    val full = LexIndex.build(docs, "doc_id", "text")
    assert(appended > 0L && rx.nDocs === full.nDocs && rx.totLen === full.totLen)

    // the appended index answers exactly like one built over the union
    val qs = queriesOf(docs)
    assert(canon(LexIndex.query(rx, qs, "query_id", "qtext", k = 10)) ===
      canon(Retrieval.bm25TopK(docs, "doc_id", "text",
        qs, "query_id", "qtext", k = 10)))
  }

  test("compact: value-neutral, one file per postings partition, meta untouched") {
    val docs = Tables.documents(spark, sf)
    val dir = java.nio.file.Files.createTempDirectory("graft-lix-c").toString + "/ix"
    LexIndex.write(LexIndex.build(
      docs.filter(col("doc_id") % 3 =!= 0), "doc_id", "text"), dir)
    LexIndex.appendToDir(spark, dir,
      docs.filter(col("doc_id") % 3 === 0), "doc_id", "text")
    val qs = queriesOf(docs)
    val before = canon(LexIndex.query(LexIndex.read(spark, dir),
      qs, "query_id", "qtext", k = 10))
    val metaBefore = spark.read.parquet(s"$dir/meta").collect().toSeq
    def dataFiles(sub: String) = {
      def walk(f: java.io.File): Seq[java.io.File] =
        if (f.isDirectory) f.listFiles().toSeq.flatMap(walk) else Seq(f)
      walk(new java.io.File(s"$dir/$sub"))
        .filter(_.getName.endsWith(".parquet"))
    }
    assert(dataFiles("postings").groupBy(_.getParent).values.exists(_.size > 1),
      "append should have left a multi-file partition for compact to squash")
    LexIndex.compact(spark, dir)
    assert(dataFiles("postings").groupBy(_.getParent).values.forall(_.size == 1))
    assert(canon(LexIndex.query(LexIndex.read(spark, dir),
      qs, "query_id", "qtext", k = 10)) === before)
    assert(spark.read.parquet(s"$dir/meta").collect().toSeq === metaBefore)
  }

  test("df derives at query time: an appended doc shifts idf of existing matches") {
    import spark.implicits._
    val base = Seq((1L, "alpha beta"), (2L, "alpha gamma"), (3L, "delta"))
      .toDF("doc_id", "text")
    val dir = java.nio.file.Files.createTempDirectory("graft-lix-d").toString + "/ix"
    LexIndex.write(LexIndex.build(base, "doc_id", "text"), dir)
    val qs = Seq((9L, "alpha")).toDF("query_id", "qtext")
    val preScores = LexIndex.query(LexIndex.read(spark, dir),
        qs, "query_id", "qtext", k = 10)
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("score_micros")).toMap
    LexIndex.appendToDir(spark, dir,
      Seq((4L, "alpha alpha")).toDF("doc_id", "text"), "doc_id", "text")
    val post = LexIndex.query(LexIndex.read(spark, dir),
        qs, "query_id", "qtext", k = 10)
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("score_micros")).toMap
    // doc 4 is now retrievable, and docs 1/2's scores MOVED (df and N both
    // changed) — a frozen-df index would have returned preScores unchanged
    assert(post.contains(4L))
    assert(post(1L) != preScores(1L) && post(2L) != preScores(2L))
  }

  test("phraseTopK: consecutive-only matches, phrase-frequency rank, pruned positional scan") {
    import spark.implicits._
    val docs = Seq(
      (1L, "alpha beta gamma delta"),         // phrase once
      (2L, "alpha beta gamma alpha beta gamma"), // phrase twice -> ranks first
      (3L, "alpha gamma beta delta"),         // all terms, never consecutive
      (4L, "beta gamma alpha"),               // all terms, wrong order
      (5L, "alpha beta epsilon gamma"),       // broken by an extra token
      (6L, "zeta eta theta")                  // no phrase terms at all
    ).toDF("doc_id", "text")
    val dir = java.nio.file.Files.createTempDirectory("graft-lix-ph").toString + "/ix"
    LexIndex.write(LexIndex.build(docs, "doc_id", "text"), dir)
    val qs = Seq((100L, "alpha beta gamma")).toDF("query_id", "phrase")
    val out = LexIndex.phraseTopK(LexIndex.read(spark, dir), qs,
      "query_id", "phrase", k = 10)
    val rows = out.collect().map(r => (r.getAs[Long]("rank"),
      r.getAs[Long]("doc_id"), r.getAs[Long]("pf"))).sortBy(_._1).toSeq
    // only docs 1 and 2 contain the CONSECUTIVE phrase; 2 (pf=2) outranks 1
    assert(rows == Seq((1L, 2L, 2L), (2L, 1L, 1L)), s"got $rows")
    // the positional read keeps the BM25 pushdown: phrase terms reach the
    // scan as static term IN + pb partition filters
    val plan = LexIndex.phraseTopK(LexIndex.read(spark, dir), qs,
        "query_id", "phrase", k = 10)
      .queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [pb"),
      "phrase-term pb values not pushed as a partition filter")
    assert(plan.contains("PushedFilters: [In(term"),
      s"phrase terms not pushed into the postings scan:\n${plan.take(2000)}")
    // ...and BM25 queries do NOT pay for positions: their postings scan
    // prunes the column (ReadSchema carries term/id/tf/dl only)
    val bm25Plan = LexIndex.query(LexIndex.read(spark, dir),
        Seq((100L, "alpha beta")).toDF("query_id", "qtext"),
        "query_id", "qtext", k = 10)
      .queryExecution.executedPlan.toString
    val readSchemas = bm25Plan.linesIterator.filter(_.contains("ReadSchema")).toSeq
    assert(readSchemas.exists(_.contains("tf")), "no postings ReadSchema found")
    assert(!readSchemas.exists(_.contains("positions")),
      s"BM25 scan reads the positions column it never uses:\n${readSchemas.mkString("\n")}")
    // the 4-bit packing budget is enforced in the packing expression (no
    // pre-flight driver job): a 17-token phrase fails at execution
    val longPhrase = (1 to 17).map(i => s"w$i").mkString(" ")
    val err = intercept[Exception] {
      LexIndex.phraseTopK(LexIndex.read(spark, dir),
        Seq((101L, longPhrase)).toDF("query_id", "phrase"),
        "query_id", "phrase", k = 10).collect()
    }
    assert(err.getMessage.contains("at most 16 tokens"),
      s"unexpected failure: ${err.getMessage}")
    // plan-time driver jobs: both positional paths pay the same bounded
    // collects that build the static term IN / pb IN pushdown filters —
    // phraseTopK must not run MORE (its old max-offset pre-check was one
    // extra blocking job per serving call; the budget now enforces inside
    // the packing expression)
    val ixReloaded = LexIndex.read(spark, dir)
    val sc = spark.sparkContext
    def planJobs(f: => Unit): Int = {
      val before = sc.statusTracker.getJobIdsForGroup(null).length
      f
      sc.statusTracker.getJobIdsForGroup(null).length - before
    }
    val phraseJobs = planJobs {
      LexIndex.phraseTopK(ixReloaded, qs, "query_id", "phrase", k = 10); ()
    }
    val proxJobs = planJobs {
      LexIndex.proximityTopK(ixReloaded, qs.toDF("query_id", "qtext"),
        "query_id", "qtext", window = 12, k = 10); ()
    }
    assert(phraseJobs <= proxJobs,
      s"phraseTopK plans with $phraseJobs driver jobs vs proximityTopK's " +
        s"$proxJobs — the packing guard is a blocking job again")
  }

  test("proximityTopK: minimal-span semantics, window bound, all-terms guard") {
    import spark.implicits._
    val docs = Seq(
      (1L, "alpha beta gamma"),                    // span 3 (tightest)
      (2L, "alpha x beta x gamma"),                // span 5
      (3L, "gamma x x beta alpha"),                // order-free: span 5
      (4L, "alpha x x x x x x x beta x x gamma"),  // span 12, fits window=12 exactly
      (5L, "alpha x x x x x x x x beta x x gamma"),// span 13 > window: excluded
      (6L, "alpha beta delta"),                    // gamma missing: excluded
      (7L, "alpha beta gamma x x x x x x x alpha beta gamma") // min span still 3
    ).toDF("doc_id", "text")
    val dir = java.nio.file.Files.createTempDirectory("graft-lix-px").toString + "/ix"
    LexIndex.write(LexIndex.build(docs, "doc_id", "text"), dir)
    val qs = Seq((100L, "alpha beta gamma")).toDF("query_id", "qtext")
    val out = LexIndex.proximityTopK(LexIndex.read(spark, dir), qs,
      "query_id", "qtext", window = 12, k = 10)
    val rows = out.collect().map(r => (r.getAs[Long]("rank"),
      r.getAs[Long]("doc_id"), r.getAs[Long]("span"))).sortBy(_._1).toSeq
    // spans: doc1=3, doc7=3 (repeats don't shrink below the true minimum),
    // doc2=5, doc3=5, doc4=12; doc5 exceeds the window, doc6 lacks a term
    assert(rows == Seq((1L, 1L, 3L), (2L, 7L, 3L), (3L, 2L, 5L),
      (4L, 3L, 5L), (5L, 4L, 12L)), s"got $rows")
    // same pushdown discipline as phrase: term IN + pb partition filters
    val plan = LexIndex.proximityTopK(LexIndex.read(spark, dir), qs,
        "query_id", "qtext", window = 12, k = 10)
      .queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [pb"))
    assert(plan.contains("PushedFilters: [In(term"))
  }
}
