package graft

import org.apache.spark.sql.functions._
import graft.operators.{Curation, Dedup, TextAnalysis}

/** Semantics of the round-4 text/curation additions on planted fixtures:
  * the unigram LM ranks gibberish below typical text (and handles OOV
  * against an external training corpus), mixture weights upsample small
  * sources at alpha < 1 and respect the exact integer normalizer,
  * containment catches a quoted-inside-wrapper doc that Jaccard dilutes
  * below threshold, and boilerplate shingles are attributed per document. */
class TextOpsSpec extends SparkSpec {

  test("lmScore: typical text outranks rare-token soup; micros are exact") {
    import spark.implicits._
    val common = "the cat sat on the mat and the dog sat on the rug"
    val docs = Seq(
      (1L, common),
      (2L, common),
      (3L, "zxqv wvyx qqzz vvxx kkjj hhgg ffdd ssaa ppoo iiuu yytt rree")
    ).toDF("doc_id", "text")
    val out = TextAnalysis.lmScore(docs, "doc_id", "text")
      .collect().map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(out(1L).getAs[Double]("avg_logprob") > out(3L).getAs[Double]("avg_logprob"))
    assert(out(1L).getAs[Long]("logprob_micros") == out(2L).getAs[Long]("logprob_micros"))
    // self-scoring: every term is in-vocabulary
    assert(out.values.forall(_.getAs[Long]("n_oov") == 0L))
    // exactness: micros / (n·1e6) reproduces the emitted double bit-for-bit
    out.values.foreach { r =>
      assert(r.getAs[Double]("avg_logprob") ==
        r.getAs[Long]("logprob_micros").toDouble / (r.getAs[Long]("n_tokens") * 1000000L))
    }
  }

  test("lmScore: external training corpus marks unseen terms OOV") {
    import spark.implicits._
    val train = Seq((10L, "alpha beta gamma alpha beta")).toDF("doc_id", "text")
    val score = Seq((1L, "alpha beta novelword")).toDF("doc_id", "text")
    val out = TextAnalysis.lmScore(score, "doc_id", "text", Some(train)).collect().head
    assert(out.getAs[Long]("n_tokens") == 3L)
    assert(out.getAs[Long]("n_oov") == 1L)
    // OOV weight ln(1/(T+V)): T=5, V=3 → round(ln(1/8)·1e6) = -2079442
    val lmTerms = TextAnalysis.unigramLm(train, "doc_id", "text")
      .collect().map(r => r.getAs[String]("term") -> r.getAs[Long]("logp_micros")).toMap
    val expected = lmTerms("alpha") + lmTerms("beta") +
      math.round(math.log(1.0 / 8.0) * 1000000)
    assert(out.getAs[Long]("logprob_micros") == expected)
  }

  test("mixtureWeights: alpha<1 upsamples small sources; weights sum to 1 in fixed point") {
    import spark.implicits._
    val docs = Seq(
      (1L, TestDocs.words(900), "bulk"), (2L, TestDocs.words(700), "bulk"),
      (3L, TestDocs.words(100), "curated")
    ).toDF("doc_id", "text", "source")
    val out = Curation.mixtureWeights(docs, "doc_id", "text", "source",
        alpha = 0.5, tokenBudget = 1600L)
      .collect().map(r => r.getAs[String]("source") -> r).toMap
    val wBulk = out("bulk").getAs[Double]("weight")
    val wCur = out("curated").getAs[Double]("weight")
    assert(math.abs(wBulk + wCur - 1.0) < 1e-9)
    // token share of curated = 100/1700 ≈ 5.9%; sqrt-weight ≈ 20% — upsampled
    assert(wCur > 100.0 / 1700.0)
    // curated source repeats (>1 epoch) under this budget, bulk does not
    assert(out("curated").getAs[Double]("epochs") > 1.0)
    assert(out("bulk").getAs[Double]("epochs") < 1.0)
  }

  test("containment: wrapper-quoted doc scores 1.0 where Jaccard is diluted") {
    import spark.implicits._
    val quoted = TestDocs.words(10) // 8 distinct 3-shingles
    val wrapper = quoted + " " + TestDocs.words(90, "pad")
    val docs = Seq((1L, quoted), (2L, wrapper)).toDF("doc_id", "text")
    val sh = Dedup.shingleRows(docs, "doc_id", "text", 3)
    val pairs = Seq((1L, 2L)).toDF("doc_a", "doc_b")
    val c = Dedup.containmentForPairs(pairs, sh, "doc_id").collect().head
    assert(c.getAs[Double]("containment") == 1.0)
    // the same pair under Jaccard: 8 shared of ~99 union → far below 0.5
    val j = Dedup.jaccardForPairs(pairs, sh, "doc_id").collect().head
    assert(j.getAs[Double]("jaccard") < 0.2)
  }

  test("boilerplate: high-df shingles flagged, per-doc ratio attributed") {
    import spark.implicits._
    val chrome = "copyright acme corp all rights reserved"
    val docs = (1L to 10L).map { i =>
      val body = TestDocs.words(20, s"body$i")
      // chrome on 9 of 10 docs; doc 10 is chrome-free
      (i, if (i < 10) s"$chrome $body" else body)
    }.toDF("doc_id", "text")
    val out = TextAnalysis.boilerplate(docs, "doc_id", "text", minDocFrac = 0.5)
      .collect().map(r => r.getAs[Long]("doc_id") -> r).toMap
    // the 4 pure-chrome shingles (within "copyright…reserved") are boilerplate
    assert(out(1L).getAs[Long]("n_boiler") == 4L)
    assert(out(10L).getAs[Long]("n_boiler") == 0L)
    assert(out(10L).getAs[Double]("boiler_ratio") == 0.0)
    assert(out(1L).getAs[Double]("boiler_ratio") > 0.0)
  }

  test("bpePairStats: corpus-weighted adjacent pairs over word types, overlaps counted") {
    import spark.implicits._
    // types: "aaab"×3, "xy"×1, "z"×2 (len 1 → no pairs)
    val docs = Seq((1L, "aaab aaab xy z"), (2L, "aaab z")).toDF("doc_id", "text")
    val out = TextAnalysis.bpePairStats(docs, "text", topK = 10)
      .collect().map(r => r.getAs[String]("pair") ->
        (r.getAs[Long]("pair_count"), r.getAs[Long]("n_word_types"),
         r.getAs[Long]("rank"))).toMap
    // "aaab" pairs per occurrence: aa (pos 1), aa (pos 2), ab → aa=2×3=6, ab=3
    assert(out("aa") == ((6L, 1L, 1L)))
    assert(out("ab") == ((3L, 1L, 2L)))
    assert(out("xy") == ((1L, 1L, 3L)))
    assert(!out.contains("z"))
    assert(out.size == 3)
  }

  test("bigramScore: seen, unseen-with-seen-context, unseen-context backoffs") {
    import spark.implicits._
    def lp(n: Double, d: Double): Long =
      BigDecimal(math.log(n / d) * 1e6)
        .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
    val train = Seq((1L, "a b c a b")).toDF("doc_id", "text")
    // train bigrams: "a b"×2, "b c", "c a"; ctx a→2 b→1 c→1; V=3
    val score = Seq((2L, "a b x"), (3L, "z z")).toDF("doc_id", "text")
    val out = TextAnalysis.bigramScore(score, "doc_id", "text", Some(train))
      .collect().map(r => r.getAs[Long]("doc_id") -> r).toMap
    // doc 2: "a b" seen lp(3/5); "b x" unseen, ctx b seen → lp(1/(1+3))
    assert(out(2L).getAs[Long]("n_bigrams") == 2L)
    assert(out(2L).getAs[Long]("n_unseen") == 1L)
    assert(out(2L).getAs[Long]("logprob_micros") == lp(3, 5) + lp(1, 4))
    // doc 3: "z z" unseen, ctx z unseen → lp(1/(0+3))
    assert(out(3L).getAs[Long]("n_bigrams") == 1L)
    assert(out(3L).getAs[Long]("n_unseen") == 1L)
    assert(out(3L).getAs[Long]("logprob_micros") == lp(1, 3))
    assert(out(3L).getAs[Double]("avg_logprob") == lp(1, 3).toDouble / 1e6)
  }

  test("bpeTrain: three hand-computed merge rounds with symbol growth") {
    import spark.implicits._
    // types: "aaab"×2, "ab"×1
    // r1: pairs aa=4 ab=3 → merge (a,a); "a a a b"→"aa a b" (single pass)
    // r2: (aa,a)=2 (a,b)=3 → merge (a,b)
    // r3: (aa,ab)=2 → merge (aa,ab)
    val docs = Seq((1L, "aaab ab aaab")).toDF("doc_id", "text")
    val out = TextAnalysis.bpeTrain(docs, "text", nMerges = 3)
      .collect().map(r => r.getAs[Long]("merge_rank") ->
        (r.getAs[String]("p1"), r.getAs[String]("p2"), r.getAs[Long]("pair_count")))
      .toMap
    assert(out(1L) == (("a", "a", 4L)))
    assert(out(2L) == (("a", "b", 3L)))
    assert(out(3L) == (("aa", "ab", 2L)))
  }

  test("bpeVocab: hand-computed vocabulary after merges; exhaustion stops early") {
    import spark.implicits._
    // same corpus as the bpeTrain test; after 3 merges the types are
    // "aa ab"×2 (r3 merged them: "aaab") and "ab"×1
    val docs = Seq((1L, "aaab ab aaab")).toDF("doc_id", "text")
    val vocab = TextAnalysis.bpeVocab(docs, "text", nMerges = 3)
      .collect().map(r => r.getString(0) -> r.getAs[Long]("n_occurrences")).toMap
    assert(vocab == Map("aaab" -> 2L, "ab" -> 1L))
    // more merges than the corpus can yield: loop stops when pairs run out
    // (the old crossJoin form would have emptied the type table instead);
    // the final merge fuses everything into one symbol per type
    val deep = TextAnalysis.bpeTrain(docs, "text", nMerges = 50).collect()
    assert(deep.length < 50)
    val vDeep = TextAnalysis.bpeVocab(docs, "text", nMerges = 50)
      .collect().map(r => r.getString(0) -> r.getAs[Long]("n_occurrences")).toMap
    assert(vDeep == Map("aaab" -> 2L, "ab" -> 1L))
    // the distributed loop (driverThreshold = 0 forces it) must agree with
    // the driver fast path exactly — merges, order, counts, vocabulary
    def trained(thr: Int) = TextAnalysis
      .bpeTrain(docs, "text", nMerges = 3, driverThreshold = thr)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2),
        r.getLong(3))).toSeq.sortBy(_._1)
    assert(trained(0) == trained(200000))
    def vocabAt(thr: Int) = TextAnalysis
      .bpeVocab(docs, "text", nMerges = 3, driverThreshold = thr)
      .collect().map(r => r.getString(0) -> r.getAs[Long]("n_occurrences")).toMap
    assert(vocabAt(0) == vocabAt(200000))
  }

  test("bpeEncode: in-corpus and out-of-vocabulary words, hand-traced priority loop") {
    import spark.implicits._
    val train = Seq((1L, "aaab ab aaab")).toDF("doc_id", "text")
    // merges (bpeTrain test above): 1 (a,a), 2 (a,b), 3 (aa,ab)
    val merges = TextAnalysis.bpeTrain(train, "text", nMerges = 3)
    val inCorpus = TextAnalysis.bpeEncode(train, "doc_id", "text", merges)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // both types fuse to one symbol: 3 pre-tokens → 3 BPE tokens
    assert(inCorpus.toSeq == Seq((1L, 3L, 3L)))
    // OOV: "aab" → aa b (rank-1 fires, nothing else applies);
    // "baaab" → b aa a b → b aa ab → b aaab (ranks 1, 2, 3 in turn)
    val oov = Seq((9L, "aab baaab"), (10L, "   ")).toDF("doc_id", "text")
    val out = TextAnalysis.bpeEncode(oov, "doc_id", "text", merges)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(out(9L) == ((2L, 4L)))
    assert(out(10L) == ((0L, 0L))) // no pre-tokens: explicit zero row
    val toks = TextAnalysis.bpeTokenRows(oov, "doc_id", "text", merges)
      .orderBy("doc_id", "pretoken_pos", "sym_pos")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    assert(toks.toSeq == Seq(
      (9L, 0L, 0L, "aa"), (9L, 0L, 1L, "b"),
      (9L, 1L, 0L, "b"), (9L, 1L, 1L, "aaab")))
    // a merge table over the collect bound fails loudly
    intercept[IllegalArgumentException](
      TextAnalysis.bpeEncode(oov, "doc_id", "text", merges, maxMerges = 2))
  }

  test("bpeEncode ≡ training replay: token histogram matches bpeVocab exactly") {
    import spark.implicits._
    // richer corpus: multi-char types, digits, punctuation, repeats
    val docs = Seq(
      (1L, "the theme theater, the theme!"),
      (2L, "thesis these 12 cases; the"),
      (3L, "case cases case2 -- theme")).toDF("doc_id", "text")
    val merges = TextAnalysis.bpeTrain(docs, "text", nMerges = 12)
    val fromVocab = TextAnalysis.bpeVocab(docs, "text", nMerges = 12)
      .collect().map(r => r.getString(0) -> r.getAs[Long]("n_occurrences")).toMap
    val fromEncode = TextAnalysis.bpeTokenRows(docs, "doc_id", "text", merges)
      .groupBy(org.apache.spark.sql.functions.col("token"))
      .agg(org.apache.spark.sql.functions.count(
        org.apache.spark.sql.functions.lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // the encoder re-derives the training loop's final segmentation, so the
    // occurrence-weighted token histogram is the trained vocabulary
    assert(fromEncode == fromVocab)
    // and the counting form agrees with the materialized stream
    val counts = TextAnalysis.bpeEncode(docs, "doc_id", "text", merges)
      .agg(org.apache.spark.sql.functions.sum("n_bpe_tokens")).head().getLong(0)
    assert(counts == fromVocab.values.sum)
  }

  test("charEntropy: hand-computed entropy; uniform > repeated; flag applied") {
    import spark.implicits._
    val docs = Seq(
      (1L, "aaaa"),   // single symbol → entropy 0, flagged
      (2L, "abcd"),   // 4 uniform chars → ln(4) ≈ 1.386294, flagged at 2.0
      (3L, "abcdefgh" * 2) // 8 uniform → ln(8) ≈ 2.079442, not flagged
    ).toDF("doc_id", "text")
    val out = TextAnalysis.charEntropy(docs, "doc_id", "text", minEntropy = 2.0)
      .collect().map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(out(1L).getAs[Double]("entropy") == 0.0)
    assert(out(1L).getAs[Boolean]("low_entropy"))
    assert(out(2L).getAs[Double]("entropy") == 1.386294)
    assert(out(2L).getAs[Boolean]("low_entropy"))
    assert(out(3L).getAs[Long]("n_chars") == 16L)
    assert(out(3L).getAs[Long]("n_distinct_chars") == 8L)
    assert(out(3L).getAs[Double]("entropy") == 2.079442)
    assert(!out(3L).getAs[Boolean]("low_entropy"))
  }

  test("zipfSlope: exact local recomputation; perfect power law fits itself") {
    import spark.implicits._
    // freqs 8,4,2,1 over ranks 1..4: ln f = ln 8 − (rank−1)·ln 2 is NOT
    // linear in ln(rank) — just recompute the regression locally and
    // compare exactly.
    val text = Array.fill(8)("alpha") ++ Array.fill(4)("beta") ++
      Array.fill(2)("gamma") ++ Array("delta")
    val docs = Seq((1L, text.mkString(" "))).toDF("doc_id", "text")
    val out = TextAnalysis.zipfSlope(docs, "doc_id", "text", topK = 4)
      .collect().head
    assert(out.getAs[Long]("n_terms") == 4L)
    assert(out.getAs[Long]("top_cf") == 8L)
    val xs = (1 to 4).map(r => math.round(math.log(r) * 10000))
    val ys = Seq(8L, 4L, 2L, 1L).map(f => math.round(math.log(f.toDouble) * 10000))
    val n = 4L
    val (sx, sy) = (xs.sum, ys.sum)
    val sxy = xs.zip(ys).map { case (x, y) => x * y }.sum
    val sxx = xs.map(x => x * x).sum
    val slope = BigDecimal((n * sxy - sx * sy).toDouble / (n * sxx - sx * sx))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(out.getAs[Double]("zipf_slope") == slope)
    // a true Zipf corpus (f ∝ 1/r) fits slope −1 exactly: freqs 12,6,4,3
    // = 12/r for r=1..4
    val zt = Array.fill(12)("a") ++ Array.fill(6)("b") ++
      Array.fill(4)("c") ++ Array.fill(3)("d")
    val z = TextAnalysis.zipfSlope(Seq((1L, zt.mkString(" "))).toDF("doc_id", "text"),
      "doc_id", "text", topK = 4).collect().head
    assert(math.abs(z.getAs[Double]("zipf_slope") + 1.0) < 0.01)
  }

  test("zipfSlopeByGroup: per-group fits match the single-group operator") {
    import spark.implicits._
    val a = Array.fill(8)("alpha") ++ Array.fill(4)("beta") ++
      Array.fill(2)("gamma") ++ Array("delta")
    val b = Array.fill(12)("x") ++ Array.fill(6)("y") ++
      Array.fill(4)("z") ++ Array.fill(3)("w")
    val docs = Seq((1L, a.mkString(" "), "srcA"), (2L, b.mkString(" "), "srcB"))
      .toDF("doc_id", "text", "source")
    val out = TextAnalysis.zipfSlopeByGroup(docs, "source", "doc_id", "text", topK = 4)
      .collect().map(r => r.getAs[String]("source") ->
        (r.getAs[Long]("n_terms"), r.getAs[Long]("top_cf"),
          r.getAs[Double]("zipf_slope"))).toMap
    // each group independently equals the whole-corpus operator run on it
    for ((src, docId, txt) <- Seq(("srcA", 1L, a), ("srcB", 2L, b))) {
      val solo = TextAnalysis.zipfSlope(
        Seq((docId, txt.mkString(" "))).toDF("doc_id", "text"),
        "doc_id", "text", topK = 4).collect().head
      assert(out(src) == ((solo.getAs[Long]("n_terms"),
        solo.getAs[Long]("top_cf"), solo.getAs[Double]("zipf_slope"))))
    }
  }

  test("boilerplateScrub: span removal, prose survives, full-doc wipe, short docs") {
    import spark.implicits._
    // 'copy right footer' appears in 3/5 docs (df 60% ≥ 50%) → boilerplate;
    // every token covered by one of its occurrences is cut
    val docs = Seq(
      (1L, "alpha beta copy right footer gamma"),
      (2L, "copy right footer delta epsilon zeta"),
      (3L, "unique prose here copy right footer"),
      (4L, "original words only nothing shared"),
      (5L, "tiny doc")  // < 3 tokens: no shingles, never scrubbed
    ).toDF("doc_id", "text")
    val out = TextAnalysis.boilerplateScrub(docs, "doc_id", "text",
        minDocFrac = 0.5)
      .collect().map(r => r.getLong(0) ->
        (r.getAs[Long]("n_tokens"), r.getAs[Long]("n_kept"),
          r.getAs[Long]("n_removed"), r.getAs[String]("clean_text"))).toMap
    assert(out(1L) == ((6L, 3L, 3L, "alpha beta gamma")))
    assert(out(2L) == ((6L, 3L, 3L, "delta epsilon zeta")))
    assert(out(3L) == ((6L, 3L, 3L, "unique prose here")))
    assert(out(4L) == ((5L, 5L, 0L, "original words only nothing shared")))
    assert(out(5L) == ((2L, 2L, 0L, "tiny doc")))
    // a doc that is ONLY boilerplate empties but still emits
    val wipe = Seq(
      (1L, "copy right footer"), (2L, "copy right footer"),
      (3L, "copy right footer")).toDF("doc_id", "text")
    val w = TextAnalysis.boilerplateScrub(wipe, "doc_id", "text", 0.5)
      .collect().map(r => r.getLong(0) -> r.getAs[String]("clean_text")).toMap
    assert(w == Map(1L -> "", 2L -> "", 3L -> ""))
  }

  test("boilerplateScrub: overlapping spans cover the union of positions") {
    import spark.implicits._
    // both 'a b c' and 'b c d' are boilerplate (2/2 docs) → doc tokens
    // a b c d all covered (union, not double-removal)
    val docs = Seq((1L, "a b c d x y z w"), (2L, "a b c d p q r s"))
      .toDF("doc_id", "text")
    val out = TextAnalysis.boilerplateScrub(docs, "doc_id", "text", 0.9)
      .collect().map(r => r.getLong(0) -> (r.getAs[Long]("n_removed"),
        r.getAs[String]("clean_text"))).toMap
    assert(out(1L) == ((4L, "x y z w")))
    assert(out(2L) == ((4L, "p q r s")))
  }

  test("novelty: all-new, all-seen and mixed docs score exactly") {
    import spark.implicits._
    val corpus = Seq((100L, "the quick brown fox jumps")).toDF("doc_id", "text")
    val batch = Seq(
      (1L, "the quick brown fox jumps"),   // all 3 shingles seen → 0.0
      (2L, "completely novel content here"), // none seen → 1.0
      (3L, "the quick brown fox sings")    // 'the quick brown','quick brown fox' seen; 'brown fox sings' new
    ).toDF("doc_id", "text")
    val out = TextAnalysis.novelty(batch, corpus, "doc_id", "text")
      .collect().map(r => r.getLong(0) ->
        (r.getAs[Long]("n_shingles"), r.getAs[Long]("n_new"),
          r.getAs[Double]("novelty_ratio"))).toMap
    assert(out(1L) == ((3L, 0L, 0.0)))
    assert(out(2L) == ((2L, 2L, 1.0)))
    assert(out(3L) == ((3L, 1L, 1.0 / 3.0)))
  }

  test("repetitionStats: hand-computed ratios on planted repetition shapes") {
    import spark.implicits._
    val docs = Seq(
      (1L, "a b c d"),        // all unique: every ratio 0, bigrams all distinct
      (2L, "a a a a"),        // one token: 3 dup tokens, one bigram type ×3
      (3L, "x y x y x"),      // alternating: 2 bigram types over 4 occurrences
      (4L, "solo")            // shorter than a bigram: n-gram ratios 0
    ).toDF("doc_id", "text")
    val out = TextAnalysis.repetitionStats(docs, "doc_id", "text", n = 2)
      .collect().map(r => r.getLong(0) -> r).toMap
    def ratios(id: Long) = (out(id).getAs[Long]("n_tokens"),
      out(id).getAs[Long]("n_distinct_tokens"),
      out(id).getAs[Double]("dup_token_ratio"),
      out(id).getAs[Double]("dup_ngram_ratio"),
      out(id).getAs[Double]("top_ngram_ratio"))
    assert(ratios(1L) == ((4L, 4L, 0.0, 0.0, round6(1.0 / 3)))) // top "a b" 1 of 3
    assert(ratios(2L) == ((4L, 1L, 0.75, round6(1 - 1.0 / 3), 1.0)))
    // "x y x y x": tokens 5/2 distinct; bigrams x_y×2, y_x×2 → dup 1-2/4
    assert(ratios(3L) == ((5L, 2L, 0.6, 0.5, 0.5)))
    assert(ratios(4L) == ((1L, 1L, 0.0, 0.0, 0.0)))
  }

  private def round6(d: Double): Double = math.rint(d * 1e6) / 1e6
}

private object TestDocs {
  def words(n: Int, tag: String = "w"): String =
    (1 to n).map(i => s"$tag$i").mkString(" ")
}
