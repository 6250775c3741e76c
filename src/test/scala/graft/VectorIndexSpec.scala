package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.operators.{Similarity, VectorIndex}
import graft.sources.Tables

/** Index lifecycle properties for the persisted IVF-PQ path: the parquet
  * round-trip is value-neutral (served results bit-identical to the inline
  * operator), the codebook survives the unroll/rebuild exactly, and the
  * streaming serve is the same computation per micro-batch against ONE
  * loaded index (no per-batch retrain). The cross-engine value oracle for
  * the whole chain is q103 (same SQL as q100 — CORRECTNESS vs DuckDB). */
class VectorIndexSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  private def canon(df: org.apache.spark.sql.DataFrame): Seq[(Long, Long, Long, Long)] = {
    import spark.implicits._
    df.select(col("query_id").cast("long"), col("rank").cast("long"),
        col("neighbor_id").cast("long"), col("adist").cast("long"))
      .as[(Long, Long, Long, Long)].collect().toSeq.sorted
  }

  test("write → read → serve is bit-identical to the inline operator") {
    val emb = Tables.embeddings(spark, sf)
    val dir = java.nio.file.Files.createTempDirectory("graft-vix").toString + "/ix"
    val built = VectorIndex.build(emb, "vec_id", "embedding",
      nCells = 16, m = 16, ks = 32, trainIters = 1)
    VectorIndex.write(built, dir)
    val loaded = VectorIndex.read(spark, dir)

    assert(loaded.nRows === built.nRows)
    assert(loaded.nCells === built.nCells)
    // codebook survives the (m, c, j, v) unroll exactly
    assert(loaded.codebook.map(_.map(_.toSeq).toSeq).toSeq ===
      built.codebook.map(_.map(_.toSeq).toSeq).toSeq)

    val inline = Similarity.ivfPqTopK(emb, "vec_id", "embedding",
      col("vec_id") % 25 === 0, k = 5, nCells = 16, nProbe = 4,
      m = 16, ks = 32, trainIters = 1)
    val served = VectorIndex.topK(loaded, emb.filter(col("vec_id") % 25 === 0),
      "vec_id", "embedding", k = 5, nProbe = 4)
    val a = canon(inline)
    val b = canon(served)
    assert(a.nonEmpty, "inline path returned no rows")
    assert(a === b, "persisted-index serve diverged from the inline operator")
  }

  test("streaming serve scores each micro-batch like the batch path, against one index") {
    import spark.implicits._
    val emb = Tables.embeddings(spark, sf)
    val dir = java.nio.file.Files.createTempDirectory("graft-vix-s").toString + "/ix"
    VectorIndex.write(
      VectorIndex.build(emb, "vec_id", "embedding",
        nCells = 16, m = 16, ks = 32, trainIters = 1), dir)
    val ix = VectorIndex.read(spark, dir)

    // two disjoint query waves, delivered as separate micro-batches
    val wave1 = emb.filter(col("vec_id") % 50 === 0)
      .select("vec_id", "embedding").as[(Long, Seq[Float])].collect().toSeq
    val wave2 = emb.filter(col("vec_id") % 50 === 7)
      .select("vec_id", "embedding").as[(Long, Seq[Float])].collect().toSeq
    assert(wave1.nonEmpty && wave2.nonEmpty)

    implicit val sq = spark.sqlContext
    val in = MemoryStream[(Long, Seq[Float])]
    val results = scala.collection.mutable.Map[Long, Seq[(Long, Long, Long, Long)]]()
    val query = VectorIndex.serveStream(
        ix, in.toDF().toDF("vec_id", "embedding"),
        "vec_id", "embedding", k = 5, nProbe = 4) { (out, epoch) =>
        results.synchronized { results(epoch) = canon(out) }
      }
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("graft-vix-cp").toString)
      .start()
    try {
      in.addData(wave1: _*); query.processAllAvailable()
      in.addData(wave2: _*); query.processAllAvailable()
    } finally query.stop()

    val expected1 = canon(VectorIndex.topK(ix,
      emb.filter(col("vec_id") % 50 === 0), "vec_id", "embedding", 5, 4))
    val expected2 = canon(VectorIndex.topK(ix,
      emb.filter(col("vec_id") % 50 === 7), "vec_id", "embedding", 5, 4))
    val got = results.synchronized(results.toMap)
    assert(got.size === 2, s"expected 2 micro-batches, got ${got.keySet}")
    assert(got(got.keySet.min) === expected1)
    assert(got(got.keySet.max) === expected2)
  }

  test("append: frozen quantizers, delta visible, equal to one-shot encode of the union") {
    val emb = Tables.embeddings(spark, sf)
    val base  = emb.filter(col("vec_id") % 3 =!= 0)
    val delta = emb.filter(col("vec_id") % 3 === 0)
    val built = VectorIndex.build(base, "vec_id", "embedding",
      nCells = 16, m = 16, ks = 32, trainIters = 1)
    val appended = VectorIndex.append(built, delta, "vec_id", "embedding")

    // no retrain: the quantizer artifacts are the SAME objects
    assert(appended.centroids eq built.centroids)
    assert(appended.codebook eq built.codebook)
    assert(appended.nCells === built.nCells)
    assert(appended.nRows === emb.count())
    // delta rows are in the index, assigned only to existing cells
    import spark.implicits._
    val deltaIds = delta.select(col("vec_id").cast("long")).as[Long].collect().toSet
    val codeIds = appended.codes.select(col("id").cast("long")).as[Long].collect().toSet
    assert(deltaIds.subsetOf(codeIds))
    val centIds = built.centroids.select(col("cent_id").cast("long")).as[Long].collect().toSet
    val occ = VectorIndex.cellOccupancy(appended)
      .select(col("cell").cast("long"), col("n")).as[(Long, Long)].collect()
    assert(occ.map(_._1).toSet.subsetOf(centIds))
    assert(occ.map(_._2).sum === appended.nRows)
    // append ≡ encoding the union with the same frozen artifacts: every
    // (id, cell, codes) row matches a one-shot append of the full corpus
    val oneShot = VectorIndex.append(
      built.copy(codes = built.codes.limit(0), nRows = 0L),
      emb, "vec_id", "embedding")
    def rows(ix: graft.operators.IvfPqIndex) =
      ix.codes.select(col("id").cast("long"), col("cell").cast("long"),
        col("codes").cast("string")).as[(Long, Long, String)].collect().toSeq.sorted
    assert(rows(appended) === rows(oneShot))
  }

  test("appendToDir: delta committed as new files only; reload serves the union") {
    val emb = Tables.embeddings(spark, sf)
    val dir = java.nio.file.Files.createTempDirectory("graft-vix-a").toString + "/ix"
    val base  = emb.filter(col("vec_id") % 3 =!= 0)
    val delta = emb.filter(col("vec_id") % 3 === 0)
    VectorIndex.write(VectorIndex.build(base, "vec_id", "embedding",
      nCells = 16, m = 16, ks = 32, trainIters = 1), dir)
    def codeFiles = new java.io.File(s"$dir/codes").listFiles()
      .filter(_.getName.endsWith(".parquet")).map(f => f.getName -> f.length()).toMap
    val before = codeFiles
    val appended = VectorIndex.appendToDir(spark, dir, delta, "vec_id", "embedding")
    val after = codeFiles
    // existing data files untouched, delta arrived as additional files
    before.foreach { case (name, len) => assert(after.get(name).contains(len),
      s"append rewrote existing file $name") }
    assert(after.size > before.size, "append committed no new files")
    // meta refreshed; a fresh read serves the appended corpus
    assert(appended.nRows === emb.count())
    val reread = VectorIndex.read(spark, dir)
    assert(reread.nRows === emb.count())
    val served = VectorIndex.topK(reread, emb.filter(col("vec_id") % 25 === 0),
      "vec_id", "embedding", k = 5, nProbe = 4)
    val inMem = VectorIndex.topK(
      VectorIndex.append(VectorIndex.build(base, "vec_id", "embedding",
        nCells = 16, m = 16, ks = 32, trainIters = 1), delta, "vec_id", "embedding"),
      emb.filter(col("vec_id") % 25 === 0), "vec_id", "embedding", k = 5, nProbe = 4)
    assert(canon(served) === canon(inMem),
      "persisted append diverged from the in-memory append")
  }

  test("maintainStream: exactly-once epoch appends; replays and re-commits never duplicate") {
    import spark.implicits._
    val emb = Tables.embeddings(spark, sf)
    val dir = java.nio.file.Files.createTempDirectory("graft-vix-m").toString + "/ix"
    VectorIndex.write(VectorIndex.build(emb.filter(col("vec_id") % 3 =!= 0),
      "vec_id", "embedding", nCells = 16, m = 16, ks = 32, trainIters = 1), dir)
    val baseRows = VectorIndex.read(spark, dir).nRows

    val delta = emb.filter(col("vec_id") % 3 === 0)
      .select("vec_id", "embedding").as[(Long, Seq[Float])].collect().toSeq
    val (wave1, wave2) = delta.splitAt(delta.size / 2)
    assert(wave1.nonEmpty && wave2.nonEmpty)
    implicit val sq = spark.sqlContext
    val in = MemoryStream[(Long, Seq[Float])]
    val query = VectorIndex.maintainStream(spark, dir,
        in.toDF().toDF("vec_id", "embedding"), "vec_id", "embedding")
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("graft-vix-mcp").toString)
      .start()
    try {
      in.addData(wave1: _*); query.processAllAvailable()
      in.addData(wave2: _*); query.processAllAvailable()
    } finally query.stop()

    val ix = VectorIndex.read(spark, dir)
    assert(ix.nRows === emb.count(), "streamed deltas missing from the index")
    assert(ix.codes.select("id").distinct().count() === ix.nRows,
      "duplicate ids after streamed appends")

    // a replayed committed epoch is a marker-detected no-op
    val w2df = wave2.toDF("vec_id", "embedding")
    assert(!VectorIndex.appendEpoch(spark, dir, 1L, w2df, "vec_id", "embedding"))
    // a commit that crashed AFTER the rename but BEFORE the marker: replay
    // re-stages the same rows onto the same deterministic file name
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sessionState.newHadoopConf())
    fs.delete(new org.apache.hadoop.fs.Path(dir, "_epochs/1"), false)
    assert(VectorIndex.appendEpoch(spark, dir, 1L, w2df, "vec_id", "embedding"))
    val healed = VectorIndex.read(spark, dir)
    assert(healed.nRows === emb.count())
    assert(healed.codes.select("id").distinct().count() === healed.nRows,
      "re-committed epoch duplicated rows")
    // the maintained index serves the appended vectors as neighbors
    val served = VectorIndex.topK(healed, emb.filter(col("vec_id") % 25 === 0),
      "vec_id", "embedding", k = 5, nProbe = 16)
    val newIds = wave1.map(_._1).toSet ++ wave2.map(_._1).toSet
    val neighborIds = served.select(col("neighbor_id").cast("long"))
      .as[Long].collect().toSet
    assert(neighborIds.exists(newIds), "no appended vector ever serves as a neighbor")
  }

  test("deleteIds + vacuum: tombstoned vectors vanish, vacuum is value-neutral and reclaims") {
    import spark.implicits._
    val emb = Tables.embeddings(spark, sf)
    val dir = java.nio.file.Files.createTempDirectory("graft-vix-d").toString + "/ix"
    VectorIndex.write(VectorIndex.build(emb, "vec_id", "embedding",
      nCells = 16, m = 16, ks = 32, trainIters = 1), dir)
    val doomed = emb.filter(col("vec_id") % 7 === 0).select("vec_id")
    val nDoomed = doomed.count()

    val deleted = VectorIndex.deleteIds(spark, dir, doomed, "vec_id")
    assert(deleted === nDoomed)
    // idempotent: re-deleting (plus unknown ids) records nothing
    assert(VectorIndex.deleteIds(spark, dir,
      doomed.union(Seq(999999L).toDF("vec_id")), "vec_id") === 0L)

    val ix = VectorIndex.read(spark, dir)
    assert(ix.nRows === emb.count() - nDoomed)
    val live = ix.codes.select(col("id").cast("long")).as[Long].collect().toSet
    assert(!live.exists(_ % 7 == 0), "tombstoned ids still served")

    val queries = emb.filter(col("vec_id") % 25 === 0)
    val served = canon(VectorIndex.topK(ix, queries, "vec_id", "embedding", 5, 4))
    assert(served.nonEmpty && !served.exists(_._3 % 7 == 0),
      "a deleted vector surfaced as a neighbor")

    // vacuum rewrites codes without the tombstones and is value-neutral
    val reclaimed = VectorIndex.vacuum(spark, dir)
    assert(reclaimed === nDoomed)
    assert(!new java.io.File(s"$dir/_tombstones").exists())
    val after = VectorIndex.read(spark, dir)
    assert(after.nRows === ix.nRows)
    assert(canon(VectorIndex.topK(after, queries, "vec_id", "embedding", 5, 4)) === served)
    assert(VectorIndex.vacuum(spark, dir) === 0L) // nothing left to reclaim
  }

  test("retrain: equals a fresh build on the live corpus, preserves deletes, clears tombstones") {
    import spark.implicits._
    val emb = Tables.embeddings(spark, sf)
    val dir = java.nio.file.Files.createTempDirectory("graft-vix-r").toString + "/ix"
    // drift state: train on two thirds, append the rest frozen
    VectorIndex.write(VectorIndex.build(emb.filter(col("vec_id") % 3 =!= 0),
      "vec_id", "embedding", nCells = 16, m = 16, ks = 32, trainIters = 1), dir)
    VectorIndex.appendToDir(spark, dir,
      emb.filter(col("vec_id") % 3 === 0), "vec_id", "embedding")
    // delete some ids BEFORE the retrain — they must never re-enter
    val doomed = emb.filter(col("vec_id") % 11 === 0).select("vec_id")
    VectorIndex.deleteIds(spark, dir, doomed, "vec_id")

    val rebuilt = VectorIndex.retrain(spark, dir, emb, "vec_id", "embedding",
      nCells = 16, m = 16, ks = 32, trainIters = 1)
    // tombstones are gone from disk AND from the row set
    assert(!new java.io.File(s"$dir/_tombstones").exists())
    val live = rebuilt.codes.select(col("id").cast("long")).as[Long].collect().toSet
    assert(!live.exists(_ % 11 == 0), "a deleted id re-entered through retrain")
    assert(rebuilt.nRows === emb.count() - doomed.count())

    // bit-identical to building from scratch on the same live corpus: the
    // frozen-quantizer drift is fully erased, not merely reshuffled
    val scratch = VectorIndex.build(emb.filter(col("vec_id") % 11 =!= 0),
      "vec_id", "embedding", nCells = 16, m = 16, ks = 32, trainIters = 1)
    assert(rebuilt.codebook.map(_.map(_.toSeq).toSeq).toSeq ===
      scratch.codebook.map(_.map(_.toSeq).toSeq).toSeq)
    def rows(ix: graft.operators.IvfPqIndex) =
      ix.codes.select(col("id").cast("long"), col("cell").cast("long"),
        col("codes").cast("string")).as[(Long, Long, String)].collect().toSeq.sorted
    assert(rows(rebuilt) === rows(scratch))
    val queries = emb.filter(col("vec_id") % 25 === 0)
    assert(canon(VectorIndex.topK(rebuilt, queries, "vec_id", "embedding", 5, 4)) ===
      canon(VectorIndex.topK(scratch, queries, "vec_id", "embedding", 5, 4)))
  }

  test("occupancySkew + retrainIfDrifted: healthy index untouched, drifted index rebuilt") {
    val emb = Tables.embeddings(spark, sf)
    val dir = java.nio.file.Files.createTempDirectory("graft-vix-g").toString + "/ix"
    VectorIndex.write(VectorIndex.build(emb, "vec_id", "embedding",
      nCells = 16, m = 16, ks = 32, trainIters = 1), dir)
    val healthySkew = VectorIndex.occupancySkew(VectorIndex.read(spark, dir))
    assert(healthySkew >= 1.0, s"skew below the balanced floor: $healthySkew")

    // gate above the current skew: a no-op — nothing on disk may change
    val before = new java.io.File(s"$dir/codes").listFiles().map(_.getName).toSet
    assert(VectorIndex.retrainIfDrifted(spark, dir, emb, "vec_id", "embedding",
      maxSkew = healthySkew + 0.01, nCells = 16, m = 16, ks = 32).isEmpty)
    assert(new java.io.File(s"$dir/codes").listFiles().map(_.getName).toSet === before)

    // gate below it: the remedy fires and the result is the scratch build
    val rebuilt = VectorIndex.retrainIfDrifted(spark, dir, emb, "vec_id", "embedding",
      maxSkew = math.max(1.0, healthySkew - 0.01), nCells = 16, m = 16, ks = 32)
    assert(rebuilt.isDefined, "gate failed to fire above threshold")
    assert(rebuilt.get.nRows === emb.count())
  }

  test("serving only reads codes + centroids — never the embedding table") {
    val emb = Tables.embeddings(spark, sf)
    val dir = java.nio.file.Files.createTempDirectory("graft-vix-p").toString + "/ix"
    VectorIndex.write(
      VectorIndex.build(emb, "vec_id", "embedding",
        nCells = 16, m = 16, ks = 32, trainIters = 1), dir)
    val ix = VectorIndex.read(spark, dir)
    // queries arrive as their own little frame (the serving reality: the
    // corpus embedding table is not even mounted) — only the index dirs
    // appear in the scan list
    import spark.implicits._
    val queries = emb.filter(col("vec_id") % 50 === 0)
      .select("vec_id", "embedding").as[(Long, Seq[Float])].collect().toSeq
      .toDF("vec_id", "embedding")
    val plan = VectorIndex.topK(ix, queries, "vec_id", "embedding", 5, 4)
      .queryExecution.executedPlan.toString
    assert(plan.contains("codes") && !plan.contains("embeddings.parquet"),
      s"serve plan should scan the index, not the corpus:\n$plan")
  }

  test("topKFiltered: all-ids filter ≡ unfiltered; results ⊆ allowed; composes with deletes") {
    val emb = Tables.embeddings(spark, sf)
    val dir = java.nio.file.Files.createTempDirectory("graft-vix-f").toString + "/ix"
    VectorIndex.write(
      VectorIndex.build(emb, "vec_id", "embedding",
        nCells = 16, m = 16, ks = 32, trainIters = 1), dir)
    val ix = VectorIndex.read(spark, dir)
    val qp = col("vec_id") % 50 === 0

    // degenerate filter (every id allowed) is the unfiltered serve exactly
    assert(canon(VectorIndex.topKFiltered(ix, emb.filter(qp),
        "vec_id", "embedding", k = 5, nProbe = 4,
        allowed = emb.select(col("vec_id")))) ===
      canon(VectorIndex.topK(ix, emb.filter(qp),
        "vec_id", "embedding", k = 5, nProbe = 4)))

    // real filter: every neighbor allowed; ranks dense from 1 per query
    val allowed = emb.filter(col("label") < 3).select(col("vec_id"))
    val allowedIds = allowed.collect().map(_.getLong(0)).toSet
    val out = VectorIndex.topKFiltered(ix, emb.filter(qp),
        "vec_id", "embedding", k = 5, nProbe = 4, allowed = allowed)
      .collect()
    assert(out.nonEmpty)
    assert(out.forall(r => allowedIds(r.getAs[Long]("neighbor_id"))))
    out.groupBy(_.getAs[Long]("query_id")).values.foreach { rs =>
      assert(rs.map(_.getAs[Long]("rank")).sorted.toSeq == (1L to rs.length))
    }

    // deletes compose: a tombstoned id never serves even when allowed
    val victim = out.head.getAs[Long]("neighbor_id")
    VectorIndex.deleteIds(spark, dir,
      emb.filter(col("vec_id") === victim).select("vec_id"), "vec_id")
    val after = VectorIndex.topKFiltered(VectorIndex.read(spark, dir),
        emb.filter(qp), "vec_id", "embedding", k = 5, nProbe = 4,
        allowed = allowed)
      .collect()
    assert(!after.exists(_.getAs[Long]("neighbor_id") == victim))
  }

  test("residual index: encoding flag survives the whole lifecycle; retrain ≡ fresh residual build") {
    val emb = Tables.embeddings(spark, sf)
    val dir = java.nio.file.Files.createTempDirectory("graft-vix-r").toString + "/ix"
    val base = emb.filter(col("vec_id") % 5 =!= 0)
    VectorIndex.write(VectorIndex.build(base, "vec_id", "embedding",
      nCells = 16, m = 16, ks = 32, trainIters = 1, residual = true), dir)
    val loaded = VectorIndex.read(spark, dir)
    assert(loaded.residual, "marker must round-trip through write/read")

    // frozen-quantizer append must subtract exactly what build subtracted:
    // persisted append ≡ in-memory append of the same delta
    val delta = emb.filter(col("vec_id") % 5 === 0)
    VectorIndex.appendToDir(spark, dir, delta, "vec_id", "embedding")
    val servedAppend = VectorIndex.topK(VectorIndex.read(spark, dir),
      emb.filter(col("vec_id") % 25 === 0), "vec_id", "embedding", k = 5, nProbe = 4)
    val inMemAppend = VectorIndex.topK(
      VectorIndex.append(VectorIndex.build(base, "vec_id", "embedding",
        nCells = 16, m = 16, ks = 32, trainIters = 1, residual = true),
        delta, "vec_id", "embedding"),
      emb.filter(col("vec_id") % 25 === 0), "vec_id", "embedding", k = 5, nProbe = 4)
    assert(canon(servedAppend) === canon(inMemAppend),
      "persisted residual append diverged from the in-memory append")

    // delete → vacuum → retrain: flag survives every maintenance move, and
    // the retrained index serves exactly like a fresh residual build on
    // the live corpus
    val doomed = emb.filter(col("vec_id") % 50 === 3).select("vec_id")
    VectorIndex.deleteIds(spark, dir, doomed, "vec_id")
    VectorIndex.vacuum(spark, dir)
    val live = emb.join(doomed, Seq("vec_id"), "left_anti")
    VectorIndex.retrain(spark, dir, live, "vec_id", "embedding",
      nCells = 16, m = 16, ks = 32, trainIters = 1)
    val after = VectorIndex.read(spark, dir)
    assert(after.residual, "flag must survive vacuum + retrain")
    val qp = col("vec_id") % 25 === 0 && col("vec_id") % 50 =!= 3
    val servedRetrained = VectorIndex.topK(after, emb.filter(qp),
      "vec_id", "embedding", k = 5, nProbe = 4)
    val servedFresh = VectorIndex.topK(
      VectorIndex.build(live, "vec_id", "embedding",
        nCells = 16, m = 16, ks = 32, trainIters = 1, residual = true),
      emb.filter(qp), "vec_id", "embedding", k = 5, nProbe = 4)
    assert(canon(servedRetrained) === canon(servedFresh),
      "retrained residual index diverged from a fresh residual build")
  }

  test("legacy root _residual marker: honored by read, cleaned by retrain") {
    val emb = Tables.embeddings(spark, sf).filter(col("vec_id") % 3 === 0)
    val dir = java.nio.file.Files.createTempDirectory("graft-vix-leg").toString + "/ix"
    VectorIndex.write(VectorIndex.build(emb, "vec_id", "embedding",
      nCells = 8, m = 16, ks = 32, trainIters = 1, residual = true), dir)
    // simulate an index persisted by the pre-r11 layout: marker at dir
    // root instead of codes/_residual
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(fs.delete(new org.apache.hadoop.fs.Path(dir, "codes/_residual"), false))
    fs.create(new org.apache.hadoop.fs.Path(dir, "_residual"), true).close()
    assert(VectorIndex.read(spark, dir).residual,
      "a legacy-layout residual index must not silently load as raw coding")
    // a retrain that decides RAW coding must not inherit the stale root
    // marker (retrain preserves the flag; force raw via retrainAutoCoding's
    // underlying build + commit path by rebuilding with residual = false)
    VectorIndex.write(VectorIndex.build(emb, "vec_id", "embedding",
      nCells = 8, m = 16, ks = 32, trainIters = 1, residual = true), dir)
    fs.create(new org.apache.hadoop.fs.Path(dir, "_residual"), true).close()
    VectorIndex.retrain(spark, dir, emb, "vec_id", "embedding",
      nCells = 8, m = 16, ks = 32, trainIters = 1)
    assert(!fs.exists(new org.apache.hadoop.fs.Path(dir, "_residual")),
      "commitRebuild must clean the legacy root marker")
    assert(VectorIndex.read(spark, dir).residual,
      "retrain preserves the coding flag via codes/_residual")
  }
}
