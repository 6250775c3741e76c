package graft

import org.apache.spark.sql.functions._
import graft.operators.Similarity

/** Product-quantization properties: exact equivalence with a local
  * reference implementation (the union-find / Efraimidis-Spirakis spec
  * discipline — an independent Scala recomputation, not a Spark one),
  * degenerate full-precision behavior, partitioning stability, and recall
  * sanity on the real sf0.001 embeddings. The full pipeline's cross-engine
  * value oracle is q99 (CORRECTNESS vs DuckDB). */
class PqSpec extends SparkSpec {

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString

  private def quantizeLocal(v: Seq[Float]): Array[Long] =
    v.map(x => math.floor(x.toDouble * 1048576.0).toLong).toArray

  /** Local reference PQ: identical contract to
    * [[Similarity.pqTrainCodebook]] + [[Similarity.pqIndex]] — md5-order
    * seed, squared-L2 assignment with smallest-code tiebreak, Lloyd update
    * with truncate-toward-zero integer means, empty codes keep centroids. */
  private def referencePq(vecs: Seq[(Long, Array[Long])], m: Int, ks: Int,
                          iters: Int): (Array[Array[Array[Long]]], Map[Long, Seq[Long]]) = {
    val dim = vecs.head._2.length
    val dSub = dim / m
    val seed = vecs.sortBy { case (id, _) => (md5hex(id.toString), id) }.take(ks)
    var cb = Array.tabulate(m)(mm =>
      seed.map(_._2.slice(mm * dSub, (mm + 1) * dSub)).toArray)
    def encode(v: Array[Long]): Array[Int] =
      Array.tabulate(m) { mm =>
        val dists = cb(mm).map { row =>
          var s = 0L
          for (j <- 0 until dSub) { val d = v(mm * dSub + j) - row(j); s += d * d }
          s
        }
        dists.indexOf(dists.min) // first min = smallest code id
      }
    for (_ <- 0 until iters) {
      val assigned = vecs.map { case (id, v) => (id, v, encode(v)) }
      val next = cb.map(_.map(_.clone()))
      for (mm <- 0 until m; c <- 0 until cb(mm).length) {
        val members = assigned.filter(_._3(mm) == c)
        if (members.nonEmpty) {
          for (j <- 0 until dSub) {
            val s = members.map(_._2(mm * dSub + j)).sum
            val n = members.size
            next(mm)(c)(j) = if (s < 0) -((-s) / n) else s / n // truncate like `div`
          }
        }
      }
      cb = next
    }
    (cb, vecs.map { case (id, v) => id -> encode(v).map(_.toLong).toSeq }.toMap)
  }

  private def fixture = {
    import spark.implicits._
    // 20 deterministic 8-dim vectors with two planted tight clusters
    val rows = (0L until 20L).map { i =>
      val base = if (i % 2 == 0) 0.8f else -0.6f
      i -> Seq.tabulate(8)(j => base + 0.05f * ((i * 7 + j * 3) % 5).toFloat)
    }
    rows.toDF("vec_id", "embedding")
      .withColumn("embedding", col("embedding").cast("array<float>"))
  }

  test("pqIndex codes match an independent local PQ recomputation (seed, Lloyd, encode)") {
    val df = fixture
    val local = df.collect().map(r =>
      r.getLong(0) -> quantizeLocal(r.getSeq[Float](1))).toSeq.sortBy(_._1)
    val (_, expected) = referencePq(local, m = 4, ks = 4, iters = 2)
    val got = Similarity.pqIndex(df, "vec_id", "embedding", m = 4, ks = 4, trainIters = 2)
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(got == expected)
  }

  test("pqAdcTopK with M=1, ks=N, iters=0 degenerates to exact squared-L2 ranking") {
    val df = fixture
    val local = df.collect().map(r =>
      r.getLong(0) -> quantizeLocal(r.getSeq[Float](1))).toSeq
    def l2(a: Array[Long], b: Array[Long]): Long =
      a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum
    // every vector is its own codebook entry -> tables hold the exact
    // distance to every corpus vector, ADC IS the exact ranking
    val queries = local.filter(_._1 % 7 == 0)
    val expected = queries.flatMap { case (qid, qv) =>
      local.filter(_._1 != qid)
        .map { case (nid, nv) => (qid, nid, l2(qv, nv)) }
        .sortBy { case (_, nid, d) => (d, nid) }
        .take(3).zipWithIndex
        .map { case ((q, n, d), i) => (q, (i + 1).toLong, n, d) }
    }.toSet
    val got = Similarity.pqAdcTopK(df, "vec_id", "embedding",
        col("vec_id") % 7 === 0, k = 3, m = 1, ks = 20, trainIters = 0)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(got == expected)
  }

  test("pqAdcTopK is bit-stable under input repartitioning") {
    val df = fixture
    def run(d: org.apache.spark.sql.DataFrame) =
      Similarity.pqAdcTopK(d, "vec_id", "embedding",
          col("vec_id") % 7 === 0, k = 5, m = 4, ks = 4, trainIters = 1)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(run(df) == run(df.repartition(7)))
  }

  test("ivfPqTopK with nProbe = nCells degenerates to exactly pqAdcTopK") {
    val emb = graft.sources.Tables.embeddings(spark, "/root/testdata/sf0.001")
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    val full = rows(Similarity.pqAdcTopK(emb, "vec_id", "embedding",
      col("vec_id") % 40 === 0, k = 10, m = 16, ks = 64, trainIters = 1))
    val ivfpq = rows(Similarity.ivfPqTopK(emb, "vec_id", "embedding",
      col("vec_id") % 40 === 0, k = 10, nCells = 16, nProbe = 16,
      m = 16, ks = 64, trainIters = 1))
    assert(ivfpq == full) // every cell probed -> candidate set is the corpus
  }

  test("ivfPqTopK results are a subset of probed-cell members, ranked consistently") {
    val emb = graft.sources.Tables.embeddings(spark, "/root/testdata/sf0.001")
    val got = Similarity.ivfPqTopK(emb, "vec_id", "embedding",
        col("vec_id") % 40 === 0, k = 10, nCells = 16, nProbe = 4,
        m = 16, ks = 64, trainIters = 1).collect()
    assert(got.nonEmpty)
    // per query: ranks are 1..n dense and adist non-decreasing with rank
    got.groupBy(_.getLong(0)).foreach { case (_, rs) =>
      val byRank = rs.sortBy(_.getLong(1))
      assert(byRank.map(_.getLong(1)).toSeq == (1L to byRank.length).toSeq)
      assert(byRank.map(_.getLong(3)).toSeq == byRank.map(_.getLong(3)).sorted.toSeq)
    }
  }

  test("graft_topk buffer: bounded inserts, (key, payload) order, merge, eval order") {
    import org.apache.spark.sql.catalyst.InternalRow
    import org.apache.spark.sql.catalyst.expressions.BoundReference
    import org.apache.spark.sql.types.LongType
    val tk = graft.functions.TopKRows(
      BoundReference(0, LongType, nullable = true),
      BoundReference(1, LongType, nullable = true), 3)
    val b = tk.createAggregationBuffer()
    Seq((5L, 1L), (2L, 9L), (8L, 0L), (2L, 3L), (9L, 9L)).foreach { case (k, p) =>
      tk.update(b, InternalRow(k, p))
    }
    // top-3 by (key, payload): (2,3), (2,9), (5,1) — 8 and 9 evicted
    val got = tk.eval(b).asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    val rows = (0 until got.numElements()).map { i =>
      val r = got.getStruct(i, 2); (r.getLong(0), r.getLong(1))
    }
    assert(rows == Seq((2L, 3L), (2L, 9L), (5L, 1L)))
    // merge respects the same bound and order, serde roundtrips
    val other = tk.deserialize(tk.serialize {
      val o = tk.createAggregationBuffer()
      tk.update(o, InternalRow(1L, 7L)); tk.update(o, InternalRow(6L, 6L)); o
    })
    tk.merge(b, other)
    val merged = tk.eval(b).asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    val mrows = (0 until merged.numElements()).map { i =>
      val r = merged.getStruct(i, 2); (r.getLong(0), r.getLong(1))
    }
    assert(mrows == Seq((1L, 7L), (2L, 3L), (2L, 9L)))
  }

  test("PQ recall vs exact L2 on sf0.001 embeddings; training does not hurt distortion") {
    val emb = graft.sources.Tables.embeddings(spark, "/root/testdata/sf0.001")
    val local = emb.collect().map(r =>
      r.getLong(0) -> quantizeLocal(r.getSeq[Float](1))).toSeq.sortBy(_._1)
    def l2(a: Array[Long], b: Array[Long]): Long =
      a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum
    val exact = local.filter(_._1 % 40 == 0).flatMap { case (qid, qv) =>
      local.filter(_._1 != qid).map { case (nid, nv) => (qid, nid, l2(qv, nv)) }
        .sortBy { case (_, nid, d) => (d, nid) }.take(10).map(t => (qid, t._2))
    }.toSet
    val pq = Similarity.pqAdcTopK(emb, "vec_id", "embedding",
        col("vec_id") % 40 === 0, k = 10, m = 16, ks = 64, trainIters = 1)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    val recall = exact.intersect(pq).size.toDouble / exact.size
    // deterministic pipeline on fixed data: measured 0.546 at 96-bit codes
    // on UNSTRUCTURED unit vectors (PQ's adversarial case — no cluster
    // structure to exploit; random top-10 would score 0.02)
    info(s"PQ-ADC top-10 recall vs exact L2: $recall")
    assert(recall >= 0.5, s"recall $recall") // 96 bits vs 2048 bits/vector
    // Lloyd round must not increase total quantization distortion
    def distortion(iters: Int): Double = {
      val (cb, codes) = referencePq(local, m = 16, ks = 64, iters = iters)
      local.map { case (id, v) =>
        val rec = (0 until 16).flatMap(mm => cb(mm)(codes(id)(mm).toInt)).toArray
        l2(v, rec).toDouble
      }.sum
    }
    val d0 = distortion(0); val d1 = distortion(1)
    info(s"PQ distortion seed=$d0 trained=$d1")
    assert(d1 <= d0 * 1.001) // integer-truncated means: allow rounding slack
  }

  test("residual coding beats raw coding where cells carry structure (IVF-PQ recall)") {
    // Residual coding's win condition is CLUSTER STRUCTURE: codes quantize
    // v − centroid(cell), so they spend their bits on the cell-radius ball.
    // The sf0.001 embeddings are unstructured random unit vectors — PQ's
    // adversarial case, where ‖v − c‖ ≈ ‖v‖ and residuals buy nothing
    // (measured: raw 0.42 vs residual 0.31 top-10 recall at the q100
    // config — documented regime dependence, the same one FAISS documents).
    // A corpus that IVF would actually index at scale has modes; this
    // fixture builds one deterministically: 20 seed directions from the
    // real embeddings, 25 members each as per-component offset clouds.
    import org.apache.spark.sql.functions.{broadcast, expr}
    val emb = graft.sources.Tables.embeddings(spark, "/root/testdata/sf0.001")
    // seed vec_ids are 7, 32, 57, …, 482 → groups 0..19
    val seeds = broadcast(emb.filter(col("vec_id") % 25 === 7)
      .select(expr("CAST((vec_id - 7) / 25 AS BIGINT)").as("__g"),
        col("embedding").as("__sv")))
    val clustered = emb.select(col("vec_id"), (col("vec_id") % 20).as("__g"))
      .join(seeds, "__g")
      .select(col("vec_id"),
        expr("transform(__sv, (x, i) -> CAST(x + (CAST((vec_id * (i + 3)) % 101" +
          " AS DOUBLE) - 50.0D) * 0.001D AS FLOAT))").as("embedding"))
    val local = clustered.collect().map(r =>
      r.getLong(0) -> quantizeLocal(r.getSeq[Float](1))).toSeq.sortBy(_._1)
    def l2(a: Array[Long], b: Array[Long]): Long =
      a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum
    val exact = local.filter(_._1 % 40 == 0).flatMap { case (qid, qv) =>
      local.filter(_._1 != qid).map { case (nid, nv) => (qid, nid, l2(qv, nv)) }
        .sortBy { case (_, nid, d) => (d, nid) }.take(10).map(t => (qid, t._2))
    }.toSet
    def recallOf(df: org.apache.spark.sql.DataFrame): Double = {
      val got = df.collect().map(r => (r.getLong(0), r.getLong(2))).toSet
      exact.intersect(got).size.toDouble / exact.size
    }
    // nProbe = nCells removes probing from the comparison entirely: every
    // candidate is scored on both sides, so the recall delta isolates WHAT
    // the codes quantize (raw vector vs per-cell residual) at an identical
    // (m, ks) bit budget
    val raw = recallOf(Similarity.ivfPqTopK(clustered, "vec_id", "embedding",
      col("vec_id") % 40 === 0, k = 10,
      nCells = 16, nProbe = 16, m = 16, ks = 32, trainIters = 1))
    val res = recallOf(Similarity.ivfPqResidualTopK(clustered, "vec_id", "embedding",
      col("vec_id") % 40 === 0, k = 10,
      nCells = 16, nProbe = 16, m = 16, ks = 32, trainIters = 1))
    info(s"clustered-corpus IVF-PQ top-10 recall: raw=$raw residual=$res")
    assert(res > raw,
      s"residual coding must win where cells have structure (raw=$raw res=$res)")
  }

  test("retrainAutoCoding measures both codings and publishes the winner") {
    // The decision table's two regimes, exercised end to end through the
    // persisted lifecycle: on the clustered corpus (cells resolve modes)
    // an index seeded RAW must flip to residual; on the unstructured
    // corpus (residual's adversarial case) an index seeded RESIDUAL must
    // flip back to raw. Choice recorded three ways: `codes/_residual`
    // marker (atomic with the codes swap), meta's `coding` column,
    // `_coding_decision` audit JSON.
    import org.apache.spark.sql.functions.{broadcast, col, expr}
    import graft.operators.VectorIndex
    val emb = graft.sources.Tables.embeddings(spark, "/root/testdata/sf0.001")
    val seeds = broadcast(emb.filter(col("vec_id") % 25 === 7)
      .select(expr("CAST((vec_id - 7) / 25 AS BIGINT)").as("__g"),
        col("embedding").as("__sv")))
    val clustered = emb.select(col("vec_id"), (col("vec_id") % 20).as("__g"))
      .join(seeds, "__g")
      .select(col("vec_id"),
        expr("transform(__sv, (x, i) -> CAST(x + (CAST((vec_id * (i + 3)) % 101" +
          " AS DOUBLE) - 50.0D) * 0.001D AS FLOAT))").as("embedding"))

    def metaCoding(dir: String): String =
      spark.read.parquet(s"$dir/meta").collect().head.getAs[String]("coding")
    def markerExists(dir: String): Boolean =
      new java.io.File(s"$dir/codes/_residual").exists()
    def decision(dir: String): String = new String(
      java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get(s"$dir/_coding_decision")), "UTF-8")

    // regime 1: clustered corpus, seeded raw -> auto flips to residual
    val d1 = java.nio.file.Files.createTempDirectory("vix-auto1").toString + "/ix"
    VectorIndex.write(VectorIndex.build(clustered, "vec_id", "embedding",
      nCells = 16, m = 16, ks = 32, trainIters = 1, residual = false), d1)
    assert(metaCoding(d1) == "raw" && !markerExists(d1))
    val out1 = VectorIndex.retrainAutoCoding(spark, d1, clustered,
      "vec_id", "embedding", nCells = 16, m = 16, ks = 32, trainIters = 1,
      nProbe = 16, nEval = 60, evalK = 10)
    info(s"clustered decision: ${decision(d1)}")
    assert(out1.residual, s"clustered corpus must choose residual: ${decision(d1)}")
    assert(markerExists(d1) && metaCoding(d1) == "residual")
    assert(decision(d1).contains("\"chosen\":\"residual\""))
    // the published index IS a fresh residual build over the live corpus
    // (build is a pure function of corpus + params)
    val fromScratch = VectorIndex.build(clustered, "vec_id", "embedding",
      nCells = 16, m = 16, ks = 32, trainIters = 1, residual = true)
    def codeSet(df: org.apache.spark.sql.DataFrame) =
      df.select(col("id"), col("cell"), col("codes")).collect()
        .map(r => (r.getLong(0), r.get(1).toString, r.getSeq[Long](2))).toSet
    assert(codeSet(out1.codes) == codeSet(fromScratch.codes),
      "auto-retrained index must equal a from-scratch build with the chosen coding")

    // regime 2: unstructured corpus, seeded residual -> auto flips to raw
    val d2 = java.nio.file.Files.createTempDirectory("vix-auto2").toString + "/ix"
    VectorIndex.write(VectorIndex.build(emb, "vec_id", "embedding",
      nCells = 16, m = 16, ks = 32, trainIters = 1, residual = true), d2)
    assert(metaCoding(d2) == "residual" && markerExists(d2))
    val out2 = VectorIndex.retrainAutoCoding(spark, d2, emb,
      "vec_id", "embedding", nCells = 16, m = 16, ks = 32, trainIters = 1,
      nProbe = 16, nEval = 60, evalK = 10)
    info(s"unstructured decision: ${decision(d2)}")
    assert(!out2.residual, s"unstructured corpus must choose raw: ${decision(d2)}")
    assert(!markerExists(d2) && metaCoding(d2) == "raw")
    assert(decision(d2).contains("\"chosen\":\"raw\""))

    // a later NON-auto retrain must not leave the audit JSON behind — it
    // describes a decision that rebuild did not re-make (ADVICE r10)
    VectorIndex.retrain(spark, d2, emb, "vec_id", "embedding",
      nCells = 16, m = 16, ks = 32, trainIters = 1)
    assert(!new java.io.File(s"$d2/_coding_decision").exists(),
      "plain retrain must delete the stale _coding_decision audit")
    assert(!markerExists(d2) && metaCoding(d2) == "raw",
      "plain retrain preserves the coding it was given")
  }
}
