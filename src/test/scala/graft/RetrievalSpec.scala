package graft

import org.apache.spark.sql.functions._
import graft.operators.{Retrieval, TextAnalysis}

/** Retrieval + drift semantics on planted fixtures: BM25 micros match a
  * hand-rolled reference, ranking prefers multi-term hits, RRF fusion
  * arithmetic is exact, the hybrid path fuses both rankers, and the
  * decomposed KL drift equals the naive full-vocabulary sum (decomposed
  * formula) and approximates the pure-double KL. */
class RetrievalSpec extends SparkSpec {

  private def docsFixture = {
    import spark.implicits._
    Seq(
      (1L, "apple banana apple"),
      (2L, "apple cherry"),
      (3L, "banana banana banana"),
      (4L, "durian elderberry fig")
    ).toDF("doc_id", "text")
  }

  test("bm25TopK: scores match the hand-rolled formula; no-hit docs absent") {
    import spark.implicits._
    val queries = Seq((100L, "apple banana")).toDF("query_id", "qtext")
    val out = Retrieval.bm25TopK(docsFixture, "doc_id", "text",
      queries, "query_id", "qtext", k = 10).collect()
    assert(out.map(_.getAs[Long]("doc_id")).toSet == Set(1L, 2L, 3L))

    // hand-rolled reference: N=4, dl = (3,2,3,3), avgdl = 11/4,
    // df(apple)=2, df(banana)=2
    val n = 4L; val totLen = 11L
    val dl = Map(1L -> 3L, 2L -> 2L, 3L -> 3L)
    val tf = Map((1L, "apple") -> 2L, (1L, "banana") -> 1L,
      (2L, "apple") -> 1L, (3L, "banana") -> 3L)
    val df = Map("apple" -> 2L, "banana" -> 2L)
    def micros(doc: Long, term: String): Long = {
      val idf = math.log(1.0 + (n - df(term) + 0.5) / (df(term) + 0.5))
      val avgdl = totLen.toDouble / n
      val t = tf((doc, term)).toDouble
      val tfn = t * (1.2 + 1.0) / (t + 1.2 * ((1.0 - 0.75) + 0.75 * dl(doc) / avgdl))
      math.round(idf * tfn * 1e6)
    }
    val got = out.map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(got(1L).getAs[Long]("score_micros") == micros(1L, "apple") + micros(1L, "banana"))
    assert(got(2L).getAs[Long]("score_micros") == micros(2L, "apple"))
    assert(got(3L).getAs[Long]("score_micros") == micros(3L, "banana"))
    assert(got(1L).getAs[Long]("n_hit_terms") == 2L)
    // the two-term hit outranks both single-term hits here
    assert(got(1L).getAs[Long]("rank") == 1L)
    // emitted double is exactly micros/1e6
    out.foreach(r => assert(r.getAs[Double]("score") ==
      r.getAs[Long]("score_micros") / 1e6))
  }

  test("bm25TopK: k bound and deterministic doc_id tiebreak on clones") {
    import spark.implicits._
    val clones = (1L to 6L).map(i => (i, "same words here")).toDF("doc_id", "text")
    val queries = Seq((7L, "same")).toDF("query_id", "qtext")
    val out = Retrieval.bm25TopK(clones, "doc_id", "text",
      queries, "query_id", "qtext", k = 4).collect()
    assert(out.length == 4)
    assert(out.sortBy(_.getAs[Long]("rank")).map(_.getAs[Long]("doc_id")).toSeq ==
      Seq(1L, 2L, 3L, 4L))
  }

  test("rrfFuse: exact micros arithmetic, absent ranks coalesce to 0") {
    import spark.implicits._
    val lex = Seq((9L, 1L, 10L), (9L, 2L, 20L)).toDF("query_id", "rank", "doc_id")
    val vec = Seq((9L, 1L, 20L), (9L, 2L, 30L)).toDF("query_id", "rank", "doc_id")
    val out = Retrieval.rrfFuse(lex, vec, k = 10)
      .collect().map(r => r.getAs[Long]("doc_id") -> r).toMap
    val r61 = math.round(1e6 / 61); val r62 = math.round(1e6 / 62)
    assert(out(20L).getAs[Long]("rrf_micros") == r62 + r61) // lex#2 + vec#1
    assert(out(10L).getAs[Long]("rrf_micros") == r61)
    assert(out(30L).getAs[Long]("rrf_micros") == r62)
    assert(out(10L).getAs[Long]("vec_rank") == 0L)
    assert(out(30L).getAs[Long]("lex_rank") == 0L)
    assert(out(20L).getAs[Long]("rank") == 1L) // double-hit fuses on top
  }

  test("hybridTopK: fuses both rankers over an id-aligned corpus") {
    import spark.implicits._
    val docs = Seq(
      (0L, "alpha beta gamma"), (1L, "alpha beta delta"),
      (2L, "epsilon zeta eta"), (3L, "alpha theta iota")
    ).toDF("doc_id", "text")
    def v(x: Double, y: Double) = Array(x.toFloat, y.toFloat)
    val emb = Seq(
      (0L, v(1, 0)), (1L, v(0.9, 0.4359)), (2L, v(0, 1)), (3L, v(0.8, -0.6))
    ).toDF("vec_id", "embedding")
    val out = Retrieval.hybridTopK(docs, "doc_id", "text",
      emb, "vec_id", "embedding",
      docQueryPred = col("doc_id") === 0, vecQueryPred = col("vec_id") === 0,
      nQueryTokens = 3, k = 4).collect()
    val byDoc = out.map(r => r.getAs[Long]("doc_id") -> r).toMap
    // the query doc itself: lexical self-match only (vec excludes self)
    assert(byDoc(0L).getAs[Long]("lex_rank") == 1L)
    assert(byDoc(0L).getAs[Long]("vec_rank") == 0L)
    // doc 1 hits both rankers (shares 2 terms, closest vector)
    assert(byDoc(1L).getAs[Long]("lex_rank") > 0L)
    assert(byDoc(1L).getAs[Long]("vec_rank") == 1L)
    // doc 2: no shared term, vector rank only
    assert(byDoc(2L).getAs[Long]("lex_rank") == 0L)
    assert(byDoc(2L).getAs[Long]("vec_rank") > 0L)
  }

  test("hybridTopKIvf: fused recall@10 >= 0.9 vs the exact twin (sf0.1 corpus)") {
    import graft.operators.{LexIndex, VectorIndex}
    import graft.sources.Tables
    val d = "/root/testdata/sf0.1"
    val docs = Tables.documents(spark, d)
    val emb = Tables.embeddings(spark, d)
    val base = java.nio.file.Files.createTempDirectory("graft-hyrec").toString
    // the measured >= 0.9 operating point (STRESS.md round-12 recall
    // curve): m=32 subquantizers, nProbe=16 — the recall gap is PQ
    // distortion, not probe misses (m=16 saturates at 0.864 even probing
    // all 32 cells), so the resolution of the codebook is the lever
    LexIndex.write(LexIndex.build(docs, "doc_id", "text"), s"$base/lix")
    VectorIndex.write(VectorIndex.build(emb, "vec_id", "embedding",
      nCells = 32, m = 32, ks = 64, trainIters = 1), s"$base/vix")
    // the q125 seeded batch: every 101st doc's first-4-token query
    val queries = docs.filter(col("doc_id") % 101 === 0 && col("doc_id") < 50500)
      .select(col("doc_id").as("query_id"),
        array_join(slice(graft.operators.Dedup.tokens(col("text")), 1, 4), " ")
          .as("qtext"))
    val vecPred = col("vec_id") % 101 === 0 && col("vec_id") < 50500
    def pairs(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
      df.select(col("query_id").cast("long"), col("doc_id").cast("long"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = pairs(Retrieval.hybridTopKIndexed(
      LexIndex.read(spark, s"$base/lix"), queries,
      emb, "vec_id", "embedding", vecPred, k = 10))
    val fused = pairs(Retrieval.hybridTopKIvf(
      LexIndex.read(spark, s"$base/lix"), VectorIndex.read(spark, s"$base/vix"),
      queries, emb.filter(vecPred), "vec_id", "embedding", k = 10, nProbe = 16))
    val recall = (exact & fused).size.toDouble / exact.size
    // the r10 "done" criterion q125's determinism oracle deliberately did
    // not replace: the oracle proves the engine computes its approximation
    // exactly; THIS proves the approximation retrieves well. Larger-SF
    // numbers (sf0.1/sf1 sweep) live in STRESS.md's hybridrecall section.
    assert(recall >= 0.9,
      f"fused hybrid recall@10 vs the exact twin = $recall%.3f < 0.9")
  }

  test("distributionDrift: decomposition equals the naive full-vocab sum; " +
    "skewed source drifts more") {
    import spark.implicits._
    val docs = Seq(
      ("a", "the cat sat on the mat"),
      ("a", "the dog sat on the rug"),
      ("b", "the cat sat on the mat"),
      ("b", "the dog sat on the rug"),
      ("c", "zx zx zx zx zx qq qq")
    ).toDF("source", "text")
    val out = TextAnalysis.distributionDrift(docs, "source", "text")
      .collect().map(r => r.getAs[String]("source") -> r).toMap

    // naive reference with the operator's exact decomposed rounding recipe
    val rows = docs.collect().flatMap(r =>
      r.getString(1).trim.toLowerCase.split("\\s+").map(r.getString(0) -> _))
    val cf = rows.groupBy(_._2).map { case (t, xs) => t -> xs.length.toLong }
    val tTot = cf.values.sum; val v = cf.size.toLong
    val lnq = cf.map { case (t, c) =>
      t -> math.round(math.log((c + 1.0) / (tTot + v)) * 1e6) }
    val lnqAll = lnq.values.sum
    for ((g, row) <- out) {
      val gRows = rows.filter(_._1 == g).map(_._2)
      val gf = gRows.groupBy(identity).map { case (t, xs) => t -> xs.length.toLong }
      val tg = gf.values.sum; val ng = gf.size.toLong
      val presentPicos = gf.map { case (t, c) =>
        val p = (c + 1.0) / (tg + v)
        math.round(p * (math.round(math.log(p) * 1e6) - lnq(t)) * 1e6)
      }.sum
      // keysIterator, not keys.map: the runtime Set would dedup equal lnq's
      val lnqPresent = gf.keysIterator.map(lnq).sum
      val lnp0m = math.round(math.log(1.0 / (tg + v)) * 1e6)
      val absentPicos = math.round((1.0 / (tg + v)) *
        ((v - ng) * lnp0m - (lnqAll - lnqPresent)) * 1e6)
      assert(row.getAs[Long]("kl_picos") == presentPicos + absentPicos,
        s"group $g")
      assert(row.getAs[Long]("n_tokens") == tg)
      assert(row.getAs[Long]("n_terms") == ng)
      assert(row.getAs[Double]("kl") == row.getAs[Long]("kl_picos") / 1e12)
      // and the fixed-point value approximates the pure-double KL
      val klDouble = cf.keysIterator.map { t =>
        val p = (gf.getOrElse(t, 0L) + 1.0) / (tg + v)
        val q = (cf(t) + 1.0) / (tTot + v)
        p * math.log(p / q)
      }.sum
      assert(math.abs(row.getAs[Double]("kl") - klDouble) < 1e-4, s"group $g")
    }
    // sources a/b mirror the corpus bulk; c is a disjoint-vocabulary skew
    assert(out("c").getAs[Double]("kl") > out("a").getAs[Double]("kl"))
    assert(out("c").getAs[Double]("kl") > out("b").getAs[Double]("kl"))
  }
}
