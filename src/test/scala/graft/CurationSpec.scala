package graft

import org.apache.spark.sql.functions._
import graft.operators.Curation

/** Curation operator semantics on planted fixtures: shard packing is the
  * single-window prefix sum (despite the two-level plan), sampling is
  * exact-n and deterministic, quantization honors its error bound, the
  * dedup-aware split keeps near-dup clusters on one side of the holdout
  * boundary, and every curate gate fires on its planted offender. */
class CurationSpec extends SparkSpec {

  private def doc(words: Int, tag: String): String =
    (1 to words).map(i => s"$tag$i").mkString(" ")

  test("packShards: offsets are the global prefix sum, shards cut at the budget") {
    import spark.implicits._
    val docs = (1L to 100L).map(i => (i, doc(i.toInt % 7 + 1, "w"))).toDF("doc_id", "text")
    val out = Curation.packShards(docs, "doc_id", "text", tokensPerShard = 10L)
      .orderBy("doc_id")
      .collect()
    var cum = 0L
    out.foreach { r =>
      val n = r.getAs[Long]("n_tokens")
      assert(r.getAs[Long]("start_offset") == cum, s"offset at doc ${r.get(0)}")
      assert(r.getAs[Long]("shard") == cum / 10L)
      cum += n
    }
    // budget respected: consecutive docs in one shard total < budget + one doc
    val byShard = out.groupBy(_.getAs[Long]("shard")).values
    byShard.foreach { rows =>
      val tot = rows.map(_.getAs[Long]("n_tokens")).sum
      val maxDoc = rows.map(_.getAs[Long]("n_tokens")).max
      assert(tot < 10L + maxDoc)
    }
  }

  test("vocabulary: cf-descending, term tie-break, df bounded by cf and corpus size") {
    import spark.implicits._
    val docs = Seq(
      (1L, "apple apple banana"),
      (2L, "apple cherry cherry cherry"),
      (3L, "banana apple")).toDF("doc_id", "text")
    val v = Curation.vocabulary(docs, "doc_id", "text", topK = 10).orderBy("rank").collect()
    assert(v.map(_.getAs[String]("term")).toSeq == Seq("apple", "cherry", "banana"))
    assert(v.map(_.getAs[Long]("cf")).toSeq == Seq(4L, 3L, 2L))
    assert(v.map(_.getAs[Long]("df")).toSeq == Seq(3L, 1L, 2L))
    v.foreach(r => assert(r.getAs[Long]("df") <= r.getAs[Long]("cf") &&
      r.getAs[Long]("df") <= 3L))
  }

  test("stratifiedSample: exactly min(n, stratum size) rows, bit-deterministic") {
    import spark.implicits._
    val df = (1L to 90L).map(i => (i, if (i % 3 == 0) "small" else "big"))
      .toDF("id", "stratum")
      .filter(col("stratum") === "big" || col("id") <= 9) // small stratum: 3 rows
    val take = (d: org.apache.spark.sql.DataFrame) =>
      Curation.stratifiedSample(d, "stratum", "id", nPerStratum = 10)
        .orderBy("id").collect().map(_.getLong(0)).toSeq
    val s1 = take(df)
    val s2 = take(df.repartition(7)) // partitioning must not change the sample
    assert(s1 == s2)
    val byStratum = Curation.stratifiedSample(df, "stratum", "id", 10)
      .groupBy("stratum").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byStratum("big") == 10L)
    assert(byStratum("small") == 3L) // fewer rows than n → all kept
  }

  test("quantizeInt8: int8 range, exact error bound, zero-vector safe") {
    import spark.implicits._
    val emb = Seq(
      (1L, Array(0.5f, -0.25f, 0.125f, 0.0f)),
      (2L, Array(0.0f, 0.0f, 0.0f, 0.0f)), // zero vector: scale 0
      (3L, Array(-1.0f, 1.0f, 0.003f, -0.997f))).toDF("vec_id", "embedding")
    val out = Curation.quantizeInt8(emb, "vec_id", "embedding")
      .orderBy("vec_id").collect()
    out.foreach { r =>
      val qs = r.getAs[String]("qvec_csv").split(",").map(_.toLong)
      assert(qs.forall(q => q >= -127L && q <= 127L))
      val scale = r.getAs[Long]("scale_fp")
      val n = r.getAs[Long]("n_dims")
      // per-dim truncation error |127·fx − q·scale| < scale by construction
      assert(r.getAs[Long]("err_num") <= (if (scale == 0) 0L else (scale - 1) * n))
    }
    val zero = out(1)
    assert(zero.getAs[Long]("scale_fp") == 0L)
    assert(zero.getAs[String]("qvec_csv") == "0,0,0,0")
    // max-magnitude dim quantizes to exactly ±127
    assert(out(2).getAs[String]("qvec_csv").split(",").map(_.toLong).min == -127L)
  }

  test("dedupAwareSplit: a near-dup cluster lands in ONE split, singletons keep their own hash") {
    import spark.implicits._
    val base = "the quick brown fox jumps over the lazy dog " * 5
    val docs = Seq(
      (10L, base),
      (11L, base), // exact dup of 10 → same cluster
      (12L, base.replaceFirst("lazy", "sleepy")), // near-dup → same cluster
      (13L, doc(40, "alpha")),
      (14L, doc(40, "beta"))).toDF("doc_id", "text")
    val out = Curation.dedupAwareSplit(docs, "doc_id", "text",
        trainPct = 50, valPct = 25, threshold = 0.3)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("canonical_id"), r.getAs[String]("split"))).toMap
    assert(out(10L)._1 == 10L && out(11L)._1 == 10L && out(12L)._1 == 10L)
    assert(Set(out(10L)._2, out(11L)._2, out(12L)._2).size == 1)
    // singletons: canonical = self, split = the plain withSplit assignment
    val solo = graft.operators.TextAnalysis
      .withSplit(docs.filter(col("doc_id") >= 13L), "doc_id", 50, 25)
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("split")).toMap
    assert(out(13L)._1 == 13L && out(13L)._2 == solo(13L))
    assert(out(14L)._1 == 14L && out(14L)._2 == solo(14L))
  }

  test("curate: each gate fires on its planted offender and only there") {
    import spark.implicits._
    val good = "the cat sat of the mat and went to sleep in a box " +
      doc(30, "filler") // stopwords + length + low repetition
    val evalText = "held out benchmark question about catalyst optimizer internals today"
    val corpus = Seq(
      (1L, good),
      (2L, "tiny doc"), // fails length (< 30 tokens)
      (3L, ("the of and to in a " * 8) + doc(20, "rep ") + ("the of and to in a " * 8)), // repetition
      (4L, doc(45, "nostop")), // no stopwords → fails stopword gate
      (5L, good), // exact dup of 1 → not canonical
      (6L, s"the start of a doc and then $evalText plus the rest of the text to pad it out " + doc(20, "pad"))
    ).toDF("doc_id", "text")
    val eval = Seq((100L, evalText)).toDF("doc_id", "text")
    val out = Curation.curate(corpus, eval, "doc_id", "text",
        Seq("the", "a", "of", "and", "to", "in"),
        minTokens = 30L, maxTokens = 10000L, minStopRatio = 0.02,
        maxRepetition = 0.5)
      .collect().map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(out(1L).getAs[Boolean]("keep"))
    assert(!out(2L).getAs[Boolean]("pass_length") && !out(2L).getAs[Boolean]("keep"))
    assert(!out(3L).getAs[Boolean]("pass_repetition"))
    assert(!out(4L).getAs[Boolean]("pass_stopwords"))
    assert(!out(5L).getAs[Boolean]("is_canonical") && out(1L).getAs[Boolean]("is_canonical"))
    assert(out(6L).getAs[Boolean]("contaminated") && !out(6L).getAs[Boolean]("keep"))
    assert(!out(1L).getAs[Boolean]("contaminated"))
  }

  test("sourceQuality: per-source rollup attributes each planted failure mode") {
    import spark.implicits._
    val goodA = "the cat sat of the mat and went to sleep in a box " + doc(30, "fillerA")
    val goodB = "the cat sat of the mat and went to sleep in a box " + doc(30, "fillerB")
    val corpus = Seq(
      (1L, goodA, "crawlA"),   // keeps
      (2L, "tiny doc", "crawlA"), // bad length
      (3L, goodB, "crawlB"),   // keeps (canonical of its dup group: min id)
      (4L, goodB + " extra", "crawlB"), // distinct text → keeps
      (5L, goodB, "crawlB")    // exact dup of 3 → not canonical
    ).toDF("doc_id", "text", "source")
    val eval = Seq((100L, "held out benchmark text entirely absent from corpus today"))
      .toDF("doc_id", "text")
    val gated = Curation.curate(corpus.select(col("doc_id"), col("text")), eval,
      "doc_id", "text", Seq("the", "a", "of", "and", "to", "in"),
      minTokens = 30L, maxTokens = 10000L, minStopRatio = 0.02, maxRepetition = 0.5)
    val out = Curation.sourceQuality(gated, corpus, "doc_id", "source")
      .collect().map(r => r.getAs[String]("source") -> r).toMap
    assert(out("crawlA").getAs[Long]("n_docs") == 2L)
    assert(out("crawlA").getAs[Long]("n_keep") == 1L)
    assert(out("crawlA").getAs[Long]("n_bad_length") == 1L)
    assert(out("crawlA").getAs[Double]("keep_rate") == 0.5)
    assert(out("crawlB").getAs[Long]("n_docs") == 3L)
    assert(out("crawlB").getAs[Long]("n_exact_dups") == 1L)
    assert(out("crawlB").getAs[Long]("n_keep") == 2L)
    assert(out("crawlB").getAs[Long]("n_contaminated") == 0L)
  }

  test("subwordStats: pre-tokenizer splits letter runs, single digits, punct runs") {
    import spark.implicits._
    val docs = Seq(
      (1L, "hello world"),              // 2 subwords, 2 ws tokens
      (2L, "abc123,,x"),                // abc|1|2|3|,,|x = 6 subwords, 1 ws token
      (3L, "don't stop-me now")         // don|'|t|stop|-|me|now = 7
    ).toDF("doc_id", "text")
    val out = graft.operators.TextAnalysis.subwordStats(docs, "doc_id", "text")
      .collect().map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(out(1L).getAs[Long]("n_subwords") == 2L && out(1L).getAs[Long]("n_ws_tokens") == 2L)
    assert(out(2L).getAs[Long]("n_subwords") == 6L && out(2L).getAs[Long]("n_ws_tokens") == 1L)
    assert(out(3L).getAs[Long]("n_subwords") == 7L && out(3L).getAs[Long]("n_ws_tokens") == 3L)
    assert(out(2L).getAs[Double]("chars_per_subword") == 9.0 / 6.0)
  }

  test("domainCap: exactly min(cap, |source|) keeps per source, stable under repartition") {
    import spark.implicits._
    val docs = (1L to 12L).map(i => (i, if (i <= 7) "big" else "small"))
      .toDF("doc_id", "source")
    val out = Curation.domainCap(docs, "doc_id", "source", maxPerSource = 3)
      .collect().map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("source"),
        r.getAs[Long]("pick_order"), r.getAs[Boolean]("keep")))
    assert(out.length == 12)
    val bySource = out.groupBy(_._2)
    // pick_order is a 1..n permutation per source; keeps = min(cap, n)
    assert(bySource("big").map(_._3).sorted.toSeq == (1L to 7L))
    assert(bySource("small").map(_._3).sorted.toSeq == (1L to 5L))
    assert(bySource("big").count(_._4) == 3)
    assert(bySource("small").count(_._4) == 3)
    // selection is a pure function of the data, not of partitioning
    val again = Curation.domainCap(docs.repartition(7), "doc_id", "source", 3)
      .collect().map(r => (r.getAs[Long]("doc_id"), r.getAs[Boolean]("keep"))).toSet
    assert(again == out.map(t => (t._1, t._4)).toSet)
  }

  test("chunkDocs: overlap, tail coverage, and short-doc single chunk") {
    import spark.implicits._
    val docs = Seq(
      (1L, (1 to 10).map(i => s"w$i").mkString(" ")), // 10 tokens
      (2L, "a b c"),                                  // under one chunk
      (3L, (1 to 5).map(i => s"v$i").mkString(" "))   // 5 tokens, stride=chunk case
    ).toDF("doc_id", "text")
    val out = Curation.chunkDocs(docs, "doc_id", "text",
        chunkTokens = 4, strideTokens = 3)
      .collect().map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("chunk_id")) ->
        (r.getAs[Long]("n_chunk_tokens"), r.getAs[String]("chunk_text"))).toMap
    // doc 1: starts 0,3,6 → w1-4, w4-7, w7-10 (overlap 1, tail exactly covered)
    assert(out((1L, 0L)) == ((4L, "w1 w2 w3 w4")))
    assert(out((1L, 1L)) == ((4L, "w4 w5 w6 w7")))
    assert(out((1L, 2L)) == ((4L, "w7 w8 w9 w10")))
    assert(!out.contains((1L, 3L)))
    // doc 2 fits in one chunk
    assert(out((2L, 0L)) == ((3L, "a b c")))
    assert(!out.contains((2L, 1L)))
    // doc 3: 5 tokens → starts 0,3: v1-4, v4-5 (partial tail)
    assert(out((3L, 0L)) == ((4L, "v1 v2 v3 v4")))
    assert(out((3L, 1L)) == ((2L, "v4 v5")))
    assert(out.size == 6)
  }

  test("sampleExact: exactly n rows, rank 1..n, stable under repartition") {
    import spark.implicits._
    val df = (1L to 50L).map(Tuple1(_)).toDF("doc_id")
    val out = Curation.sampleExact(df, "doc_id", n = 10).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("sample_rank")))
    assert(out.length == 10)
    assert(out.map(_._2).sorted.toSeq == (1L to 10L))
    val again = Curation.sampleExact(df.repartition(9), "doc_id", 10).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("sample_rank"))).toSet
    assert(again == out.toSet)
  }

  test("coverageAtK: head-mass fractions on a hand-computed corpus") {
    import spark.implicits._
    val docs = Seq((1L, "a a a b"), (2L, "b c")).toDF("doc_id", "text")
    // cf: a=3 b=2 c=1, total 6
    val out = Curation.coverageAtK(docs, "doc_id", "text", ks = Seq(1, 2, 3, 5))
      .collect().map(r => r.getAs[Long]("k") ->
        (r.getAs[Long]("top_cf_sum"), r.getAs[Double]("coverage"))).toMap
    assert(out(1L) == ((3L, 0.5)))
    assert(out(2L) == ((5L, 5.0 / 6.0)))
    assert(out(3L) == ((6L, 1.0)))
    assert(!out.contains(5L)) // beyond vocabulary size: no row
  }

  test("allocateBudget: quotas sum exactly to the budget, remainders to largest fracs") {
    import spark.implicits._
    // three sources with 9/3/1 tokens at alpha=1 → pw 9000/3000/1000,
    // shares of 100: 69.23.., 23.07.., 7.69.. → bases 69/23/7 (sum 99),
    // leftover 1 goes to the largest fraction (srcC at .69)
    val docs = Seq(
      (1L, (1 to 9).map(i => s"t$i").mkString(" "), "srcA"),
      (2L, "x y z", "srcB"),
      (3L, "solo", "srcC")
    ).toDF("doc_id", "text", "source")
    val out = Curation.allocateBudget(docs, "doc_id", "text", "source",
        alpha = 1.0, tokenBudget = 100L)
      .collect().map(r => r.getAs[String]("source") ->
        (r.getAs[Long]("base_tokens"), r.getAs[Long]("alloc_tokens"))).toMap
    assert(out("srcA") == ((69L, 69L)))
    assert(out("srcB") == ((23L, 23L)))
    assert(out("srcC") == ((7L, 8L)))
    assert(out.values.map(_._2).sum == 100L)
    // exact-sum property holds on the real table too
    val real = Curation.allocateBudget(
      graft.sources.Tables.documents(spark, "/root/testdata/sf0.001"),
      "doc_id", "text", "source", alpha = 0.5, tokenBudget = 999983L)
    assert(real.agg(org.apache.spark.sql.functions.sum("alloc_tokens"))
      .head().getLong(0) == 999983L)
  }

  test("weightedSample: matches a local Efraimidis-Spirakis recomputation") {
    import spark.implicits._
    val df = (1L to 30L).map(i => (i, i.toDouble)).toDF("doc_id", "w")
      .unionByName(Seq((99L, 0.0)).toDF("doc_id", "w")) // w<=0 excluded
    val out = Curation.weightedSample(df, "doc_id", "w", n = 10)
      .collect().map(r => (r.getAs[Long]("sample_rank"), r.getAs[Long]("doc_id")))
      .sortBy(_._1)
    def score(id: Long, w: Double): Double = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(id.toString.getBytes("UTF-8"))
        .map(b => f"$b%02x").mkString.substring(0, 15)
      val h = java.lang.Long.parseLong(hex, 16)
      val u = (h + 1).toDouble / 1152921504606846976.0
      BigDecimal(math.log(u) / w)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    val expected = (1L to 30L).map(i => (i, score(i, i.toDouble)))
      .sortBy { case (id, s) => (-s, id) }.take(10).map(_._1)
    assert(out.map(_._2).toSeq == expected)
    assert(out.map(_._1).toSeq == (1L to 10L))
    assert(!out.exists(_._2 == 99L))
  }

  test("snapshotDiff: added/removed/changed/unchanged classified exactly") {
    import spark.implicits._
    val oldSnap = Seq((1L, "same"), (2L, "will change"), (3L, "gone"))
      .toDF("doc_id", "text")
    val newSnap = Seq((1L, "same"), (2L, "did change"), (4L, "brand new"))
      .toDF("doc_id", "text")
    val out = Curation.snapshotDiff(oldSnap, newSnap, "doc_id", "text")
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("status"))
      .toMap
    assert(out == Map(1L -> "unchanged", 2L -> "changed",
      3L -> "removed", 4L -> "added"))
    // hashes present exactly on the sides that exist
    val rows = Curation.snapshotDiff(oldSnap, newSnap, "doc_id", "text")
      .collect().map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[String]("old_hash") == null, r.getAs[String]("new_hash") == null))
      .toMap
    assert(rows(3L) == ((false, true)) && rows(4L) == ((true, false)))
  }
}
