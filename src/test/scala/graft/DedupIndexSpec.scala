package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.operators.{Dedup, DedupIndex}
import graft.sources.Tables

/** The persisted-dedup-index lifecycle: probe ≡ one-shot incrementalDedup
  * bit-for-bit, persistence hop value-neutral, append = frozen-parameter
  * O(delta) commit that never rewrites an existing file. */
class DedupIndexSpec extends SparkSpec {
  private val sf = "/root/testdata/sf0.001"

  private def canon(df: DataFrame): Seq[(Long, Boolean, Boolean, Boolean)] =
    df.collect().map(r => (r.getAs[Long]("doc_id"), r.getAs[Boolean]("exact_dup"),
      r.getAs[Boolean]("near_dup"), r.getAs[Boolean]("keep"))).toSeq.sorted

  test("probe ≡ one-shot incrementalDedup, in memory and through the persisted hop") {
    val docs = Tables.documents(spark, sf)
    val corpus = docs.filter(col("doc_id") % 5 =!= 0)
    val batch = docs.filter(col("doc_id") % 5 === 0)
    val oneShot = canon(Dedup.incrementalDedup(batch, corpus, "doc_id", "text",
      shingleN = 3, k = 8, bands = 4, threshold = 0.1, maxBucketSize = 100))
    assert(oneShot.nonEmpty)
    assert(oneShot.exists(t => t._2 || t._3), "fixture has no dup to detect")

    val ix = DedupIndex.build(corpus, "doc_id", "text")
    assert(canon(DedupIndex.probe(ix, batch, "doc_id", "text",
      threshold = 0.1, maxBucketSize = 100)) === oneShot)

    val dir = java.nio.file.Files.createTempDirectory("graft-dix").toString + "/ix"
    DedupIndex.write(ix, dir)
    val rx = DedupIndex.read(spark, dir)
    assert(rx.shingleN === 3 && rx.k === 8 && rx.bands === 4)
    assert(rx.nDocs === corpus.count())
    assert(canon(DedupIndex.probe(rx, batch, "doc_id", "text",
      threshold = 0.1, maxBucketSize = 100)) === oneShot)
  }

  test("append: frozen params, existing files untouched, ≡ build over the union") {
    val docs = Tables.documents(spark, sf)
    val base = docs.filter(col("doc_id") % 5 =!= 0 && col("doc_id") % 5 =!= 1)
    val delta = docs.filter(col("doc_id") % 5 === 1)
    val batch = docs.filter(col("doc_id") % 5 === 0)
    val dir = java.nio.file.Files.createTempDirectory("graft-dix-a").toString + "/ix"
    DedupIndex.write(DedupIndex.build(base, "doc_id", "text"), dir)

    def snapshot(): Map[String, (Long, Long)] = {
      def walk(f: java.io.File): Seq[java.io.File] =
        if (f.isDirectory) f.listFiles().toSeq.flatMap(walk) else Seq(f)
      // "_SUCCESS" commit markers are re-touched by append by design —
      // only DATA files must stay byte-identical
      walk(new java.io.File(dir))
        .filterNot(f => f.getName.startsWith(".") || f.getName.startsWith("_"))
        .filterNot(_.getPath.contains("/meta"))
        .map(f => f.getPath -> (f.length(), f.lastModified())).toMap
    }
    val before = snapshot()
    val appended = DedupIndex.appendToDir(spark, dir, delta, "doc_id", "text")
    assert(appended === delta.count())
    val after = snapshot()
    before.foreach { case (p, sig) =>
      assert(after.get(p).contains(sig), s"pre-existing file rewritten: $p")
    }
    assert(after.size > before.size, "append committed no new file")

    val rx = DedupIndex.read(spark, dir)
    assert(rx.nDocs === base.count() + delta.count())
    // appended index serves exactly like an index built over the union
    val oneShot = canon(Dedup.incrementalDedup(batch,
      docs.filter(col("doc_id") % 5 =!= 0), "doc_id", "text",
      shingleN = 3, k = 8, bands = 4, threshold = 0.1, maxBucketSize = 100))
    assert(canon(DedupIndex.probe(rx, batch, "doc_id", "text",
      threshold = 0.1, maxBucketSize = 100)) === oneShot)
  }

  test("gateStream: novel docs pass, dups drop, kept docs gate the NEXT batch; exactly-once epochs") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val textA = (1 to 20).map(i => s"alpha$i").mkString(" ")
    val textB = (1 to 20).map(i => s"beta$i").mkString(" ")
    val textC = (1 to 20).map(i => s"gamma$i").mkString(" ")
    val corpus = Seq((1L, textA)).toDF("doc_id", "text")
    val dir = java.nio.file.Files.createTempDirectory("graft-dix-g").toString + "/ix"
    val outDir = java.nio.file.Files.createTempDirectory("graft-dix-go").toString
    DedupIndex.write(DedupIndex.build(corpus, "doc_id", "text"), dir)

    implicit val sq = spark.sqlContext
    val in = MemoryStream[(Long, String)]
    val query = DedupIndex.gateStream(spark, dir,
        in.toDF().toDF("doc_id", "text"), "doc_id", "text", outDir)
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("graft-dix-gcp").toString)
      .start()
    try {
      // wave 1: a corpus dup (dropped) + novel B (kept, becomes corpus)
      in.addData((10L, textA), (11L, textB)); query.processAllAvailable()
      // wave 2: near-dup of the KEPT wave-1 doc (dropped — the gate
      // maintains itself) + novel C (kept)
      in.addData((20L, textB.replace("beta10", "X")), (21L, textC))
      query.processAllAvailable()
    } finally query.stop()

    val gated = spark.read.parquet(outDir).select("doc_id")
      .collect().map(_.getLong(0)).toSet
    assert(gated === Set(11L, 21L))
    val ix = DedupIndex.read(spark, dir)
    assert(ix.nDocs === 3L) // corpus A + kept B + kept C
    // a replayed committed epoch is a marker-detected no-op
    val w1 = Seq((10L, textA), (11L, textB)).toDF("doc_id", "text")
    assert(!DedupIndex.gateEpoch(spark, dir, 0L, w1, "doc_id", "text", outDir))
    // a commit that crashed before its marker: replay converges onto the
    // same deterministic file names — same corpus, same gate output
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sessionState.newHadoopConf())
    fs.delete(new org.apache.hadoop.fs.Path(dir, "_epochs/0"), false)
    assert(DedupIndex.gateEpoch(spark, dir, 0L, w1, "doc_id", "text", outDir))
    assert(DedupIndex.read(spark, dir).nDocs === 3L)
    assert(spark.read.parquet(outDir).select("doc_id")
      .collect().map(_.getLong(0)).toSet === Set(11L, 21L))

    // compaction: fewer files, identical values
    def nFiles: Int = {
      def walk(f: java.io.File): Seq[java.io.File] =
        if (f.isDirectory) f.listFiles().toSeq.flatMap(walk) else Seq(f)
      walk(new java.io.File(dir)).count(_.getName.endsWith(".parquet"))
    }
    val before = nFiles
    val probeBefore = canon(DedupIndex.probe(DedupIndex.read(spark, dir),
      Seq((30L, textC), (31L, "wholly new words here twenty one two three"))
        .toDF("doc_id", "text"), "doc_id", "text"))
    DedupIndex.compact(spark, dir)
    assert(nFiles < before, "compaction did not reduce the file count")
    val after = DedupIndex.read(spark, dir)
    assert(after.nDocs === 3L)
    assert(canon(DedupIndex.probe(after,
      Seq((30L, textC), (31L, "wholly new words here twenty one two three"))
        .toDF("doc_id", "text"), "doc_id", "text")) === probeBefore)
    assert(probeBefore.exists(t => t._1 == 30L && t._2), "gated dup not flagged post-compact fixture")
  }

  test("gateStream rescale: stop at 3 shuffle partitions, resume at 7 — no re-kept, no double-indexed docs") {
    // The gate's state is NOT keyed shuffle state — it is the index dir
    // (epoch markers + committed frames) plus the source checkpoint, so a
    // cluster resize (spark.sql.shuffle.partitions change across restart)
    // must be invisible: partition count shapes the epoch-build shuffles,
    // never the committed content (deterministic file names, marker
    // no-ops). Pinned against an uninterrupted control run, the
    // StateRescaleSpec discipline applied to the index gate.
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val textA = (1 to 20).map(i => s"alpha$i").mkString(" ")
    val textB = (1 to 20).map(i => s"beta$i").mkString(" ")
    val textC = (1 to 20).map(i => s"gamma$i").mkString(" ")
    val wave1 = Seq((10L, textA), (11L, textB))           // dup of corpus + novel
    val wave2 = Seq((20L, textB.replace("beta10", "X")),  // near-dup of KEPT 11
      (21L, textC))                                       // novel
    val probeBatch = Seq((30L, textC),
      (31L, "wholly new words here twenty one two three")).toDF("doc_id", "text")
    val prevParts = spark.conf.get("spark.sql.shuffle.partitions")
    implicit val sq = spark.sqlContext

    def freshIx(): (String, String) = {
      val dir = java.nio.file.Files.createTempDirectory("graft-dix-rs").toString + "/ix"
      DedupIndex.write(DedupIndex.build(
        Seq((1L, textA)).toDF("doc_id", "text"), "doc_id", "text"), dir)
      (dir, java.nio.file.Files.createTempDirectory("graft-dix-rso").toString)
    }
    def start(dir: String, out: String, in: MemoryStream[(Long, String)],
              ckpt: String) =
      DedupIndex.gateStream(spark, dir, in.toDF().toDF("doc_id", "text"),
          "doc_id", "text", out)
        .option("checkpointLocation", ckpt).start()
    def gated(out: String): Set[Long] = spark.read.parquet(out)
      .select("doc_id").collect().map(_.getLong(0)).toSet

    try {
      // ---- control: both waves, uninterrupted, at 3 partitions
      spark.conf.set("spark.sql.shuffle.partitions", "3")
      val (cDir, cOut) = freshIx()
      val cIn = MemoryStream[(Long, String)]
      val qc = start(cDir, cOut, cIn,
        java.nio.file.Files.createTempDirectory("graft-dix-rsc").toString)
      try {
        cIn.addData(wave1: _*); qc.processAllAvailable()
        cIn.addData(wave2: _*); qc.processAllAvailable()
      } finally qc.stop()
      val controlGated = gated(cOut)
      assert(controlGated === Set(11L, 21L))
      val controlProbe = canon(DedupIndex.probe(DedupIndex.read(spark, cDir),
        probeBatch, "doc_id", "text"))

      // ---- rescaled: wave 1 at 3 partitions, stop, SAME checkpoint
      // resumed at 7 partitions for wave 2
      val (rDir, rOut) = freshIx()
      val ckpt = java.nio.file.Files.createTempDirectory("graft-dix-rsk").toString
      val rIn = MemoryStream[(Long, String)]
      val q1 = start(rDir, rOut, rIn, ckpt)
      try { rIn.addData(wave1: _*); q1.processAllAvailable() } finally q1.stop()
      assert(gated(rOut) === Set(11L))

      spark.conf.set("spark.sql.shuffle.partitions", "7")
      val q2 = start(rDir, rOut, rIn, ckpt)
      try { rIn.addData(wave2: _*); q2.processAllAvailable() } finally q2.stop()
      assert(gated(rOut) === controlGated,
        "rescaled restart re-kept or lost a doc")
      val rIx = DedupIndex.read(spark, rDir)
      assert(rIx.nDocs === 3L, "rescaled restart double-indexed a doc")
      assert(canon(DedupIndex.probe(rIx, probeBatch, "doc_id", "text"))
        === controlProbe, "rescaled index diverged from the control run's")

      // replay of the pre-rescale epoch AT the new partition count:
      // marker-detected no-op
      val w1 = wave1.toDF("doc_id", "text")
      assert(!DedupIndex.gateEpoch(spark, rDir, 0L, w1, "doc_id", "text", rOut))
      // crash-before-marker replayed at the NEW partition count: converges
      // onto the same deterministic names — same corpus, same gate output
      val fs = new org.apache.hadoop.fs.Path(rDir)
        .getFileSystem(spark.sessionState.newHadoopConf())
      fs.delete(new org.apache.hadoop.fs.Path(rDir, "_epochs/0"), false)
      assert(DedupIndex.gateEpoch(spark, rDir, 0L, w1, "doc_id", "text", rOut))
      assert(DedupIndex.read(spark, rDir).nDocs === 3L)
      assert(gated(rOut) === controlGated)
      assert(canon(DedupIndex.probe(DedupIndex.read(spark, rDir),
        probeBatch, "doc_id", "text")) === controlProbe)
    } finally spark.conf.set("spark.sql.shuffle.partitions", prevParts)
  }

  test("probe semantics on fixture edges: exact, near, novel, short docs") {
    import spark.implicits._
    val textA = (1 to 20).map(i => s"alpha$i").mkString(" ")
    val textB = (1 to 20).map(i => s"beta$i").mkString(" ")
    val corpus = Seq((1L, textA), (2L, textB), (3L, "tiny")).toDF("doc_id", "text")
    val batch = Seq(
      (10L, textA),                          // exact (and near) corpus dup
      (11L, textB.replace("beta10", "X")),   // near dup only
      (12L, (1 to 20).map(i => s"nu$i").mkString(" ")), // novel
      (13L, "tiny"),                         // exact dup of a sub-shingle doc
      (14L, "mini")                          // novel sub-shingle doc
    ).toDF("doc_id", "text")
    val out = canon(DedupIndex.probe(DedupIndex.build(corpus, "doc_id", "text"),
      batch, "doc_id", "text"))
    assert(out === Seq(
      (10L, true, true, false),
      (11L, false, true, false),
      (12L, false, false, true),
      (13L, true, false, false),
      (14L, false, false, true)))
  }
}
