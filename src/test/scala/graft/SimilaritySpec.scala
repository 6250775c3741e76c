package graft

import org.apache.spark.sql.functions._
import graft.operators.Similarity

/** ANN path properties (no SQL oracle for an approximation): signature
  * determinism, candidate soundness, and agreement with brute force on
  * planted near-identical vectors. */
class SimilaritySpec extends SparkSpec {

  private def vecs = {
    import spark.implicits._
    val base = Array.tabulate(8)(i => math.sin(i + 1).toFloat)
    val near = base.clone(); near(0) = near(0) + 0.01f
    val anti = base.map(x => -x)
    val other = Array.tabulate(8)(i => math.cos(3 * i + 2).toFloat)
    Seq((0L, base.toSeq), (1L, near.toSeq), (2L, anti.toSeq), (3L, other.toSeq))
      .toDF("vec_id", "embedding")
      .withColumn("embedding", col("embedding").cast("array<float>"))
  }

  test("hyperplane signatures are deterministic and colocate near-identical vectors") {
    val s1 = Similarity.hyperplaneSignatures(vecs, "vec_id", "embedding", planes = 16, dim = 8)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val s2 = Similarity.hyperplaneSignatures(vecs, "vec_id", "embedding", planes = 16, dim = 8)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(s1 == s2)
    assert(s1(0L) == s1(1L))                         // near-identical: same signature
    assert(s1(2L) == s1(0L).map(c => if (c == '1') '0' else '1')) // antipode flips every bit
  }

  test("annTopK rank-1 matches brute force for a planted near-duplicate") {
    val ann = Similarity.annTopK(vecs, "vec_id", "embedding",
        col("vec_id") === 0, k = 2, planes = 16, dim = 8, bands = 4)
      .collect()
    assert(ann.nonEmpty)
    assert(ann.head.getAs[Long]("neighbor_id") == 1L) // the planted near-dup
    val brute = Similarity.bruteForceTopK(vecs, "vec_id", "embedding",
        col("vec_id") === 0, k = 1).head()
    assert(brute.getAs[Long]("neighbor_id") == 1L)
  }

  test("annTopK recall >= 0.9 vs brute force on sf0.001 embeddings") {
    val emb = graft.sources.Tables.embeddings(spark, "/root/testdata/sf0.001")
    val pred = col("vec_id") % 40 === 0
    def pairs(df: org.apache.spark.sql.DataFrame) =
      df.select(col("query_id"), col("neighbor_id")).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    val brute = pairs(Similarity.bruteForceTopK(emb, "vec_id", "embedding", pred, k = 10))
    val ann = pairs(Similarity.annTopK(emb, "vec_id", "embedding", pred, k = 10))
    val recall = brute.intersect(ann).size.toDouble / brute.size
    info(s"ANN top-10 recall vs brute force: $recall (${brute.size} true pairs)")
    assert(recall >= 0.9)
  }

  test("ivfTopK with nProbe = nCells degenerates to exact brute force") {
    val emb = graft.sources.Tables.embeddings(spark, "/root/testdata/sf0.001")
    val pred = col("vec_id") % 40 === 0
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.select(col("query_id"), col("rank"), col("neighbor_id")).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val brute = rows(Similarity.bruteForceTopK(emb, "vec_id", "embedding", pred, k = 5))
    val full = rows(Similarity.ivfTopK(emb, "vec_id", "embedding", pred, k = 5,
      nCells = 16, nProbe = 16))
    assert(full == brute)
    // partial probing returns a subset-quality result with the right shape
    val part = Similarity.ivfTopK(emb, "vec_id", "embedding", pred, k = 5,
      nCells = 16, nProbe = 4)
    val recall = rows(part).intersect(brute).size.toDouble / brute.size
    info(s"IVF recall at nProbe=4/16: $recall")
    assert(part.groupBy("query_id").count().collect().forall(_.getLong(1) <= 5))
  }

  test("Lloyd-trained IVF centroids beat the random-centroid baseline at nProbe=4") {
    val emb = graft.sources.Tables.embeddings(spark, "/root/testdata/sf0.001")
    val pred = col("vec_id") % 40 === 0
    def pairs(df: org.apache.spark.sql.DataFrame) =
      df.select(col("query_id"), col("neighbor_id")).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    val brute = pairs(Similarity.bruteForceTopK(emb, "vec_id", "embedding", pred, k = 10))
    def recallAt(trainIters: Int): Double =
      pairs(Similarity.ivfTopK(emb, "vec_id", "embedding", pred, k = 10,
        nCells = 16, nProbe = 4, trainIters = trainIters))
        .intersect(brute).size.toDouble / brute.size
    val (random, trained) = (recallAt(0), recallAt(3))
    info(s"IVF recall at nProbe=4/16: random=$random trained(3 Lloyd iters)=$trained")
    assert(trained > random,
      s"training must improve recall: random=$random trained=$trained")
    // training is deterministic: same iters -> identical result set
    assert(recallAt(3) == trained)
  }

  test("hierarchical IVF: full probing is exact; finer leaves beat flat IVF at equal budget") {
    val emb = graft.sources.Tables.embeddings(spark, "/root/testdata/sf0.001")
    val pred = col("vec_id") % 40 === 0
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.select(col("query_id"), col("rank"), col("neighbor_id")).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    def pairs(df: org.apache.spark.sql.DataFrame) =
      df.select(col("query_id"), col("neighbor_id")).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    val bruteRows = rows(Similarity.bruteForceTopK(emb, "vec_id", "embedding", pred, k = 5))
    // probing every leaf degenerates to exact brute force (ranks included)
    val full = rows(Similarity.ivfTopK2(emb, "vec_id", "embedding", pred, k = 5,
      nCellsL1 = 4, nCellsL2 = 8, nProbeL1 = 4, nProbeL2 = 32))
    assert(full == bruteRows)
    // equal probed-vector budget (N/4) on the 500-vector sf0.01 corpus:
    // flat 8/32 cells vs hier 32/128 leaves. The hierarchical index's
    // leaves are 4× finer, so the same budget concentrates on the query's
    // true neighborhood (calibrated sweep: hier 0.61-0.68 vs flat
    // 0.52-0.56 across parameterizations) — and with md5-deterministic
    // seeds the comparison is exactly reproducible, not a flaky benchmark.
    val emb01 = graft.sources.Tables.embeddings(spark, "/root/testdata/sf0.01")
    val brute10 = pairs(Similarity.bruteForceTopK(emb01, "vec_id", "embedding", pred, k = 10))
    val flat = pairs(Similarity.ivfTopK(emb01, "vec_id", "embedding", pred, k = 10,
      nCells = 32, nProbe = 8))
    def hierRun() = pairs(Similarity.ivfTopK2(emb01, "vec_id", "embedding", pred,
      k = 10, nCellsL1 = 8, nCellsL2 = 16, nProbeL1 = 6, nProbeL2 = 32))
    val hier = hierRun()
    val (rFlat, rHier) = (
      flat.intersect(brute10).size.toDouble / brute10.size,
      hier.intersect(brute10).size.toDouble / brute10.size)
    info(s"equal-budget recall: flat(8/32)=$rFlat hier(32/128 leaves)=$rHier")
    assert(rHier > rFlat,
      s"hierarchical recall $rHier must beat flat $rFlat at equal budget")
    // determinism: the full pipeline is md5-seeded, bit-stable
    assert(hierRun() == hier)
    // TRAINED quantizers at the SAME budget: one L1 Lloyd round + two
    // per-cell L2 rounds lift recall from ~0.63 to ~0.85 (IvfExp sweep:
    // 0.74-0.85 across t1/t2 in {1,2}) — sampled seeds sit on single
    // members, trained leaves sit on member means. Exact-integer training
    // keeps the whole pipeline deterministic, so this is a fixed number,
    // not a flaky benchmark.
    val hierTrained = pairs(Similarity.ivfTopK2(emb01, "vec_id", "embedding", pred,
      k = 10, nCellsL1 = 8, nCellsL2 = 16, nProbeL1 = 6, nProbeL2 = 32,
      trainIters = 1, trainItersL2 = 2))
    val rTrained = hierTrained.intersect(brute10).size.toDouble / brute10.size
    info(s"trained hier recall at N/4 budget: $rTrained")
    assert(rTrained >= 0.8,
      s"trained hierarchical recall $rTrained must reach 0.8 at the N/4 budget")
    assert(rTrained > rHier,
      s"training must improve recall: untrained $rHier, trained $rTrained")
  }

  test("assignCellsJoin fallback: identical assignment to the literal path, hash-agg plan") {
    graft.functions.GraftFunctions.register(spark)
    val emb = graft.sources.Tables.embeddings(spark, "/root/testdata/sf0.001")
    val q = emb.select(col("vec_id"), Similarity.quantize(col("embedding")).as("__qv"))
    val cents = Similarity.ivfCentroids(q, "vec_id", nCells = 8)
    val viaJoin = Similarity.assignCellsJoin(q, "vec_id", cents)
    // untrained ivfIndex == assignCells over the same md5-sample centroids
    val viaLit = Similarity.ivfIndex(emb, "vec_id", "embedding", nCells = 8)
    def norm(df: org.apache.spark.sql.DataFrame) =
      df.select(col("vec_id"), col("cell"), col("__bd")).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(_._1).toSeq
    assert(norm(viaJoin) == norm(viaLit))
    // the fallback must keep the family's plan bans: hash aggregation only
    val plan = viaJoin.queryExecution.executedPlan.toString
    assert(!plan.contains("SortAggregate"), "fallback planned a SortAggregate")
    assert(!plan.contains("CartesianProduct"), "fallback planned a CartesianProduct")
  }

  test("ivf index assigns near-identical vectors to the same cell; planted dup found at nProbe=1") {
    val idx = Similarity.ivfIndex(vecs, "vec_id", "embedding", nCells = 2)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(idx(0L) == idx(1L)) // near-identical vectors share a cell
    val top = Similarity.ivfTopK(vecs, "vec_id", "embedding",
        col("vec_id") === 0, k = 1, nCells = 2, nProbe = 1)
      .head()
    assert(top.getAs[Long]("neighbor_id") == 1L)
  }

  test("annNearDupPairs finds planted near-dups at high recall; results are sound") {
    // plant near-identical copies (the q46 construction): near-dup mining's
    // operating regime is HIGH thresholds, where hyperplane buckets collide
    // w.h.p. — at low thresholds (far pairs) LSH recall necessarily decays
    val base = graft.sources.Tables.embeddings(spark, "/root/testdata/sf0.001")
      .select(col("vec_id"), col("embedding"))
    val planted = base.filter(col("vec_id") % 20 === 0)
      .select((col("vec_id") + lit(1000000L)).as("vec_id"),
        expr("transform(embedding, (x, i) -> " +
          "CAST(x + 0.001D * (CAST(i % 5 AS DOUBLE) - 2.0D) AS FLOAT))").as("embedding"))
    val corpus = base.unionByName(planted)
    def pairs(df: org.apache.spark.sql.DataFrame) =
      df.select(col("vec_a"), col("vec_b")).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = pairs(Similarity.nearDupPairs(corpus, "vec_id", "embedding", 0.9))
    val approx = pairs(Similarity.annNearDupPairs(corpus, "vec_id", "embedding", 0.9))
    // soundness: re-scoring is exact, so every reported pair is a true pair
    assert(approx.subsetOf(exact))
    assert(exact.nonEmpty) // the planted copies are the true pair set
    val recall = approx.intersect(exact).size.toDouble / exact.size
    info(s"ANN near-dup recall vs exact at dot>=0.9: $recall (${exact.size} true pairs)")
    assert(recall >= 0.9)
  }

  test("graft_matdot equals per-plane graft_dot64 on parquet-backed vectors") {
    import graft.functions.GraftFunctions
    GraftFunctions.register(spark)
    // parquet-backed so the expression runs through whole-stage codegen,
    // not a constant-folded local relation
    val df = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .limit(50).select(col("vec_id"), Similarity.quantize(col("embedding")).as("q"))
    val mat = "array(array(" + (1 to 64).map(i => s"${if (i % 3 == 0) -1 else 1}L").mkString(",") +
      "), array(" + (1 to 64).map(i => s"${if (i % 5 == 0) -1 else 1}L").mkString(",") + "))"
    val row1 = "array(" + (1 to 64).map(i => s"${if (i % 3 == 0) -1 else 1}L").mkString(",") + ")"
    val row2 = "array(" + (1 to 64).map(i => s"${if (i % 5 == 0) -1 else 1}L").mkString(",") + ")"
    val got = df.select(col("vec_id"), expr(s"graft_matdot(q, $mat)").as("d"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toSeq).toMap
    val want = df.select(col("vec_id"),
        expr(s"graft_dot64(q, $row1)").as("d0"), expr(s"graft_dot64(q, $row2)").as("d1"))
      .collect().map(r => r.getLong(0) -> Seq(r.getLong(1), r.getLong(2))).toMap
    assert(got == want)
    // non-constant matrix argument is rejected at analysis
    val ex = intercept[org.apache.spark.sql.AnalysisException] {
      df.select(expr("graft_matdot(q, array(q))")).collect()
    }
    assert(ex.getMessage.contains("foldable") || ex.getMessage.contains("constant"))
  }

  test("fixed-point dot is exact for representable values") {
    import spark.implicits._
    val df = Seq((Seq(0.5f, 0.25f), Seq(0.5f, 0.5f))).toDF("a", "b")
      .select(Similarity.dotFixedPoint(col("a"), col("b")).as("d"))
    assert(df.head().getDouble(0) == 0.375)
  }

  test("NativeDotRewrite rule replaces the HOF dot pattern with graft_dot64") {
    import graft.functions.NativeDotRewrite
    import graft.operators.Similarity
    spark.experimental.extraOptimizations = Seq(NativeDotRewrite)
    try {
      // parquet-backed (a local-relation fixture would be constant-folded
      // into a LocalRelation before the rule can fire)
      val df = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
        .limit(20).select(col("vec_id"),
          Similarity.quantize(col("embedding")).as("q"))
      val hof = df.select(col("vec_id"),
        expr("aggregate(zip_with(q, q, (x, y) -> x * y), 0L, (acc, v) -> acc + v)").as("d"))
      assert(hof.queryExecution.optimizedPlan.toString.contains("graft_dot64"))
      // rewrite preserves results
      spark.experimental.extraOptimizations = Nil
      val plain = df.select(col("vec_id"),
        expr("aggregate(zip_with(q, q, (x, y) -> x * y), 0L, (acc, v) -> acc + v)").as("d"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      spark.experimental.extraOptimizations = Seq(NativeDotRewrite)
      val native = hof.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(native == plain)
      // non-matching shapes are untouched (different fold seed)
      val other = df.select(
        expr("aggregate(zip_with(q, q, (x, y) -> x * y), 1L, (acc, v) -> acc + v)").as("d"))
      assert(!other.queryExecution.optimizedPlan.toString.contains("graft_dot64"))
    } finally spark.experimental.extraOptimizations = Nil
  }

  test("kmeansAssign: argmax assignment is optimal, deterministic, and training tightens it") {
    val emb = graft.sources.Tables.embeddings(spark, "/root/testdata/sf0.001")
    val out = graft.operators.Similarity.kmeansAssign(emb, "vec_id", "embedding",
      nCells = 8, trainIters = 2)
    val rows = out.collect()
    assert(rows.length == emb.count())
    // deterministic end to end (fresh plan, same bits)
    val again = graft.operators.Similarity.kmeansAssign(emb, "vec_id", "embedding",
        nCells = 8, trainIters = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(again == rows.map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet)
    // the assignment is argmax-optimal against the trained centroids
    // (recomputed here via the public training surface), with the
    // smaller-cent_id tiebreak. NOTE total dot is NOT monotone in training:
    // integer-mean centroids shrink in norm (no renormalization — exactness
    // is the trade), so only per-vector optimality is asserted.
    import org.apache.spark.sql.functions.col
    val q = emb.select(col("vec_id"),
      graft.operators.Similarity.quantize(col("embedding")).as("__qv"))
    val cents = graft.operators.Similarity.ivfTrainCentroids(q, "vec_id",
        graft.operators.Similarity.ivfCentroids(q, "vec_id", 8), 2)
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toArray).toMap
    val vecs = q.collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toArray).toMap
    rows.foreach { r =>
      val (id, cell, dotFp) = (r.getLong(0), r.getLong(1), r.getLong(2))
      val dots = cents.map { case (cid, cv) =>
        cid -> vecs(id).zip(cv).map { case (a, b) => a * b }.sum }
      val best = dots.toSeq.sortBy { case (cid, d) => (-d, cid) }.head
      assert(best._1 == cell && best._2 == dotFp, s"vec $id")
    }
  }

  test("semanticDedup: drop set is exactly the smaller-id within-cell neighbor rule") {
    import org.apache.spark.sql.functions.col
    val emb = graft.sources.Tables.embeddings(spark, "/root/testdata/sf0.001")
    val out = graft.operators.Similarity.semanticDedup(emb, "vec_id", "embedding",
        nCells = 8, trainIters = 1, threshold = 0.4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2)))
    assert(out.length == emb.count())
    // recompute cells + exact fixed-point dots locally and check the rule
    val q = emb.select(col("vec_id"),
      graft.operators.Similarity.quantize(col("embedding")).as("__qv"))
    val cells = out.map(t => t._1 -> t._2).toMap
    val vecs = q.collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toArray).toMap
    val ids = vecs.keys.toSeq.sorted
    val expectedDrop = ids.filter { b =>
      ids.exists { a =>
        a < b && cells(a) == cells(b) &&
          vecs(a).zip(vecs(b)).map { case (x, y) => x * y }.sum /
            1099511627776.0d >= 0.4
      }
    }.toSet
    val actualDrop = out.filter(!_._3).map(_._1).toSet
    assert(actualDrop == expectedDrop)
    // the cell column agrees with the standalone clustering operator
    val km = graft.operators.Similarity.kmeansAssign(emb, "vec_id", "embedding",
        nCells = 8, trainIters = 1)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(cells == km)
  }

  test("labelSeparation: hand-computed cohesion/margin; identical-member label gets NULL ratio") {
    import spark.implicits._
    // all values exactly representable in 2^20 fixed point
    val emb = Seq(
      (1L, Seq(1.0f, 0f, 0f, 0f), 0),
      (2L, Seq(1.0f, 0f, 0f, 0f), 0),    // label 0: identical → intra 0
      (3L, Seq(0f, 0.75f, 0f, 0f), 1),
      (4L, Seq(0f, 0.5f, 0f, 0f), 1)     // label 1: centroid y=0.625
    ).toDF("vec_id", "embedding", "label")
    val out = graft.operators.Similarity.labelSeparation(emb, "vec_id", "embedding", "label")
      .collect().map(r => r.getAs[Long]("label") -> r).toMap
    assert(out(0L).getAs[Long]("n_vecs") == 2L)
    assert(out(0L).getAs[Double]("intra_d2") == 0.0)
    assert(out(0L).isNullAt(out(0L).fieldIndex("separation")))
    // label 1: members differ from centroid by ±0.125 in y → d² = 0.015625
    assert(out(1L).getAs[Double]("intra_d2") == 0.015625)
    // centroid distance²: (1−0)² + (0−0.625)² = 1.390625 (both labels' nearest)
    assert(out(0L).getAs[Double]("inter_d2") == 1.390625)
    assert(out(1L).getAs[Double]("inter_d2") == 1.390625)
    assert(out(1L).getAs[Double]("separation") == 89.0)
  }

  test("randomProjection/projectionAudit: exact ±1 matmul, JL dot preservation") {
    import spark.implicits._
    val emb = Seq(
      (0L, Seq(1.0f, 0f, 0f, 0f)),
      (8L, Seq(0f, 1.0f, 0f, 0f)),
      (16L, Seq(0.5f, 0.5f, 0f, 0f))
    ).toDF("vec_id", "embedding")
    // projection = exact matmul of the quantized vector with the md5 matrix
    val proj = graft.operators.Similarity.randomProjection(emb, "vec_id",
        "embedding", dim = 4, outDim = 2)
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    val m = Array.tabulate(2, 4)((r, j) =>
      graft.operators.Similarity.projComp(r, j))
    val q0 = Array(1048576L, 0L, 0L, 0L)
    assert(proj(0L) == m.map(row => row.zip(q0).map { case (a, b) => a * b }.sum).toSeq)
    // audit: dot_orig is the exact fixed-point dot; dot_proj scales by outDim
    val audit = graft.operators.Similarity.projectionAudit(emb, "vec_id",
        "embedding", dim = 4, outDim = 2, sampleMod = 8L)
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getAs[Double]("dot_orig"), r.getAs[Double]("dot_proj"),
          r.getAs[Long]("err_micros"))).toMap
    assert(audit.keySet == Set((0L, 8L), (0L, 16L), (8L, 16L)))
    assert(audit((0L, 8L))._1 == 0.0)  // orthogonal originals
    assert(audit((0L, 16L))._1 == 0.5)
    // err_micros is exactly the scaled difference, bit-stable
    audit.foreach { case (_, (o, p, e)) =>
      assert(e == math.round((p - o) * 1e6))
    }
    // JL at realistic width: 64→16 keeps sampled-pair dot error modest on
    // the real fixture (mean |err| below 0.25 — ±1 JL at k=16 is coarse;
    // the audit's job is to MEASURE it, and the measurement is exact)
    val fix = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val errs = graft.operators.Similarity.projectionAudit(fix, "vec_id",
        "embedding", dim = 64, outDim = 16, sampleMod = 4L)
      .collect().map(r => math.abs(r.getAs[Long]("err_micros")) / 1e6)
    assert(errs.nonEmpty && errs.sum / errs.length < 0.25)
  }

  test("diverseSample: per-cell cap, agreement with kmeansAssign, determinism") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val out = graft.operators.Similarity.diverseSample(emb, "vec_id",
        "embedding", nCells = 8, trainIters = 1, perCell = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    // ≤ 3 per cell, pick_order dense from 1
    val byCell = out.groupBy(_._2)
    assert(byCell.values.forall(_.length <= 3))
    assert(byCell.values.forall(g => g.map(_._3).sorted.sameElements(1 to g.length)))
    // sampled ids carry the SAME cell the clustering operator assigns
    val km = graft.operators.Similarity.kmeansAssign(emb, "vec_id", "embedding",
        nCells = 8, trainIters = 1)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out.forall { case (id, cell, _) => km(id) == cell })
    // deterministic under repartitioning
    val out2 = graft.operators.Similarity.diverseSample(emb.repartition(7),
        "vec_id", "embedding", nCells = 8, trainIters = 1, perCell = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(out2 == out.toSet)
  }

  // ------------------------------------------------- filtered vector search

  /** 60 deterministic 8-dim vectors for the filtered-search tests. */
  private def filterFixture = {
    import spark.implicits._
    (0L until 60L).map(i =>
        (i, Seq.tabulate(8)(j => math.sin(i * 17 + j * 3 + 1).toFloat)))
      .toDF("vec_id", "embedding")
      .withColumn("embedding", col("embedding").cast("array<float>"))
  }

  /** Independent exact filtered top-k reference: fixed-point dots
    * (floor(x·2^20) longs), rank (dot desc, id asc), self excluded,
    * neighbors restricted to `allowed`. */
  private def exactFilteredRef(queries: Seq[Long], allowed: Long => Boolean,
                               k: Int): Map[Long, Seq[Long]] = {
    val vs = (0L until 60L).map { i =>
      i -> Array.tabulate(8)(j =>
        math.floor(math.sin(i * 17 + j * 3 + 1).toFloat * 1048576.0).toLong)
    }.toMap
    queries.map { q =>
      val ranked = vs.keys.toSeq
        .filter(n => n != q && allowed(n))
        .map(n => (n, vs(q).zip(vs(n)).map { case (a, b) => a * b }.sum))
        .sortBy { case (n, d) => (-d, n) }
        .take(k).map(_._1)
      q -> ranked
    }.toMap
  }

  test("filteredTopK brute branch: exact over the allowed set only") {
    val queries = Seq(0L, 7L, 40L)
    val out = graft.operators.Similarity.filteredTopK(filterFixture,
        "vec_id", "embedding", col("vec_id").isin(queries: _*),
        filterFixture.filter(col("vec_id") % 3 === 0).select(col("vec_id")),
        k = 5, bruteCutoff = 1000)
      .collect()
    assert(out.forall(_.getAs[Long]("neighbor_id") % 3 == 0))
    val ref = exactFilteredRef(queries, _ % 3 == 0, 5)
    val got = out.groupBy(_.getAs[Long]("query_id")).map { case (q, rs) =>
      q -> rs.sortBy(_.getAs[Long]("rank")).map(_.getAs[Long]("neighbor_id")).toSeq
    }
    assert(got == ref)
    // query 0 is itself allowed (0 % 3 == 0) but never its own neighbor;
    // queries 7 and 40 are OUTSIDE the allowed set and still answered
    assert(got(0L).nonEmpty && !got(0L).contains(0L))
    assert(got(7L).nonEmpty && got(40L).nonEmpty)
  }

  test("ivfTopKFiltered with nProbe = nCells: exact filtered brute force") {
    val queries = Seq(0L, 7L, 40L)
    val out = graft.operators.Similarity.ivfTopKFiltered(filterFixture,
        "vec_id", "embedding", col("vec_id").isin(queries: _*),
        filterFixture.filter(col("vec_id") % 3 === 0).select(col("vec_id")),
        k = 5, nCells = 6, nProbe = 6)
      .collect()
    val got = out.groupBy(_.getAs[Long]("query_id")).map { case (q, rs) =>
      q -> rs.sortBy(_.getAs[Long]("rank")).map(_.getAs[Long]("neighbor_id")).toSeq
    }
    assert(got == exactFilteredRef(queries, _ % 3 == 0, 5))
  }

  test("filteredTopK routing: cutoff 0 forces the IVF branch; full probe agrees with brute") {
    val queries = Seq(12L, 31L)
    def run(cutoff: Long) = graft.operators.Similarity.filteredTopK(
        filterFixture, "vec_id", "embedding", col("vec_id").isin(queries: _*),
        filterFixture.filter(col("vec_id") >= 30).select(col("vec_id")),
        k = 4, nCells = 6, nProbe = 6, bruteCutoff = cutoff)
      .collect().map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("rank"),
        r.getAs[Long]("neighbor_id"), r.getAs[Double]("dot"))).toSet
    val viaIvf = run(0L)     // 30 allowed ids > 0 → IVF branch
    val viaBrute = run(1000L)
    assert(viaIvf == viaBrute) // full probing makes the IVF branch exact
    assert(viaIvf.forall(_._3 >= 30))
  }
}
