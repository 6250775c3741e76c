package graft

import org.apache.spark.sql.functions._
import graft.operators.Dedup

/** Dedup semantics on planted fixtures: exact winners, MinHash+LSH recall
  * of true near-dups, SimHash locality. */
class DedupSpec extends SparkSpec {

  private val base = "the quick brown fox jumps over the lazy dog " * 5

  private def docs = {
    import spark.implicits._
    Seq(
      (0L, base),                                  // original
      (1L, base),                                  // exact dup of 0
      (2L, base.replaceFirst("lazy", "sleepy")),   // near-dup of 0 (1 of 5 occurrences changed)
      (3L, "completely different text about spark catalyst optimizer rules and shuffles entirely unrelated content here"),
      (4L, "another unrelated document mentioning parquet columnar storage formats and predicate pushdown behavior")
    ).toDF("doc_id", "text")
  }

  test("exactDedup keeps one min-id representative per distinct text") {
    val kept = Dedup.exactDedup(docs, "doc_id", "text")
      .select("doc_id").collect().map(_.getLong(0)).sorted
    assert(kept.sameElements(Array(0L, 2L, 3L, 4L)))
  }

  test("exactGroups reports multiplicity") {
    val g = Dedup.exactGroups(docs, "doc_id", "text")
      .filter(col("n_copies") > 1).head()
    assert(g.getAs[Long]("n_copies") == 2L)
    assert(g.getAs[Long]("canonical_id") == 0L)
  }

  test("minhash LSH surfaces exact and near dups, not unrelated docs") {
    val pairs = Dedup.minhashNearDups(docs, "doc_id", "text", k = 12, bands = 6, threshold = 0.3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val keys = pairs.map(p => (p._1, p._2)).toSet
    assert(keys.contains((0L, 1L)))   // exact dup: jaccard 1.0
    assert(pairs.find(p => (p._1, p._2) == (0L, 1L)).get._3 == 1.0)
    assert(keys.contains((0L, 2L)) || keys.contains((1L, 2L))) // near-dup found
    assert(!keys.exists(p => p._1 == 3L || p._2 == 3L)) // unrelated not paired
  }

  test("simhash: identical docs share fingerprints; near-dups are close, unrelated far") {
    val fp = Dedup.simhash32(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    def hamming(a: String, b: String) = a.zip(b).count(p => p._1 != p._2)
    assert(fp(0L) == fp(1L))
    assert(hamming(fp(0L), fp(2L)) < hamming(fp(0L), fp(3L)))
    assert(fp.values.forall(_.length == 32))
  }

  test("hammingBits column matches scala-side hamming") {
    import spark.implicits._
    val df = Seq(("1010", "1001"), ("1111", "1111"), ("0000", "1111"))
      .toDF("a", "b")
      .withColumn("h", Dedup.hammingBits(col("a"), col("b"), 4))
    assert(df.select("h").collect().map(_.getInt(0)).toSeq == Seq(2, 0, 4))
  }

  test("simhashNearDups finds exact dups at hamming 0 and respects the bucket cap") {
    val pairs = Dedup.simhashNearDups(docs, "doc_id", "text",
        bands = 4, maxHamming = 6, maxBucketSize = 100)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getInt(2)).toMap
    assert(pairs((0L, 1L)) == 0) // identical docs: hamming 0
    // a cap of 1 drops every bucket with >1 member -> no candidates at all
    assert(Dedup.simhashNearDups(docs, "doc_id", "text",
      bands = 4, maxHamming = 32, maxBucketSize = 1).count() == 0)
  }

  test("incrementalDedup: exact, near, novel, and within-batch dups unflagged") {
    import spark.implicits._
    val textA = (1 to 20).map(i => s"alpha$i").mkString(" ")
    val textB = (1 to 20).map(i => s"beta$i").mkString(" ")
    val textBvar = textB.replace("beta10", "CHANGED")
    val textC = (1 to 20).map(i => s"gamma$i").mkString(" ")
    val corpus = Seq((1L, textA), (2L, textB)).toDF("doc_id", "text")
    val batch = Seq(
      (10L, textA),    // exact corpus dup
      (11L, textBvar), // near corpus dup (1 of 20 words changed)
      (12L, (1 to 20).map(i => s"delta$i").mkString(" ")), // novel
      (13L, textC), (14L, textC) // within-batch dups: NOT flagged here
    ).toDF("doc_id", "text")
    val out = Dedup.incrementalDedup(batch, corpus, "doc_id", "text")
      .collect().map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Boolean]("exact_dup"), r.getAs[Boolean]("near_dup"),
         r.getAs[Boolean]("keep"))).toMap
    assert(out(10L) == ((true, true, false)))  // identical ⇒ both flags
    assert(out(11L) == ((false, true, false)))
    assert(out(12L) == ((false, false, true)))
    assert(out(13L) == ((false, false, true)))
    assert(out(14L) == ((false, false, true)))
    assert(out.size == 5)
  }

  test("prefixDupGroups: truncated copies share a group; tails don't matter") {
    import spark.implicits._
    val head = "alpha beta gamma delta"
    val docs = Seq(
      (5L, s"$head tail one two three"),
      (9L, s"$head completely different continuation here"),
      (7L, "other words entirely distinct prefix")
    ).toDF("doc_id", "text")
    val out = Dedup.prefixDupGroups(docs, "doc_id", "text", k = 4).collect()
    assert(out.length == 1)
    assert(out.head.getAs[Long]("n_docs") == 2L)
    assert(out.head.getAs[Long]("canonical_id") == 5L)
  }

  test("dupSourceMatrix: near-dup pair counts land on order-normalized source pairs") {
    import spark.implicits._
    val base = (1 to 30).map(i => s"tok$i").mkString(" ")
    val docs = Seq(
      (1L, base, "srcB"),
      (2L, base.replace("tok5", "CHANGED"), "srcA"), // near-dup of 1, cross source
      (3L, base.replace("tok9", "ALSO"), "srcB"),    // near-dup of 1+2, same+cross
      (4L, (1 to 30).map(i => s"other$i").mkString(" "), "srcA") // unrelated
    ).toDF("doc_id", "text", "source")
    val out = graft.operators.Curation.dupSourceMatrix(docs, "doc_id", "text",
        "source", maxBucketSize = 100)
      .collect().map(r => (r.getAs[String]("source_a"), r.getAs[String]("source_b"))
        -> r.getAs[Long]("n_pairs")).toMap
    // pairs: (1,2) B-A, (1,3) B-B, (2,3) A-B → srcA/srcB 2, srcB/srcB 1
    assert(out(("srcA", "srcB")) == 2L)
    assert(out(("srcB", "srcB")) == 1L)
    assert(out.size == 2)
  }

  test("bestSurvivors: longest member wins, min-id tie-break, singletons kept") {
    import spark.implicits._
    val docs = Seq(
      (1L, 10L), (2L, 99L), (3L, 50L), // cluster A: 2 wins on quality
      (4L, 7L), (5L, 7L),              // cluster B: tie → min id 4 wins
      (6L, 1L)                         // singleton: survives itself
    ).toDF("doc_id", "n_chars")
    val clusters = Seq((1L, 1L), (2L, 1L), (3L, 1L), (4L, 4L), (5L, 4L))
      .toDF("id", "component")
    val out = graft.operators.Dedup.bestSurvivors(docs, "doc_id", "n_chars", clusters)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("component"), r.getAs[Long]("survivor_id"),
          r.getAs[Boolean]("kept"))).toMap
    assert(out.size == 6)
    assert(out(1L) == ((1L, 2L, false)))
    assert(out(2L) == ((1L, 2L, true)))
    assert(out(3L) == ((1L, 2L, false)))
    assert(out(4L) == ((4L, 4L, true)))
    assert(out(5L) == ((4L, 4L, false)))
    assert(out(6L) == ((6L, 6L, true)))
    // exactly one survivor per component
    val perComp = out.values.groupBy(_._1).map { case (_, v) => v.count(_._3) }
    assert(perComp.forall(_ == 1))
  }

  test("duplicateSpans: shared phrase marks merged spans at each doc's offset; rare phrases don't") {
    import spark.implicits._
    val phrase = "alpha beta gamma delta epsilon" // 5 tokens -> 3 shingle marks, one merged span
    val pair = "zeta eta theta"                   // 3 tokens, in only 2 docs
    val d = Seq(
      (0L, s"$phrase tail0 only"),                       // span at [0, 5)
      (1L, s"lead1 lead2 $phrase tail"),                 // span at [2, 7)
      (2L, s"x $phrase y $pair"),                        // span at [1, 6); pair below minDocs
      (3L, s"unrelated filler words here $pair"),        // pair's 2nd doc - still below minDocs
      (4L, "ab")                                         // shorter than n: no shingles at all
    ).toDF("doc_id", "text")
    val spans = Dedup.duplicateSpans(d, "doc_id", "text", n = 3, minDocs = 3)
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(spans == Set((0L, 0L, 5L, 5L), (1L, 2L, 7L, 5L), (2L, 1L, 6L, 5L)),
      s"got $spans")

    val scrubbed = Dedup.scrubSpans(d, "doc_id", "text",
        Dedup.duplicateSpans(d, "doc_id", "text", n = 3, minDocs = 3))
      .as[(Long, String)].collect().toMap
    assert(scrubbed(0L) == "tail0 only")
    assert(scrubbed(1L) == "lead1 lead2 tail")
    assert(scrubbed(2L) == s"x y $pair")
    assert(scrubbed(3L) == s"unrelated filler words here $pair") // untouched, normalized
    assert(scrubbed(4L) == "ab")
  }

  test("contaminationSpans: merged benchmark spans, exact ratios, explicit zeros") {
    import spark.implicits._
    val bench = Seq((100L, "secret eval question about spark internals")).toDF("doc_id", "text")
    val d = Seq(
      // 5-token benchmark phrase embedded whole: marks 2,3,4 -> one span of 5 of 10 tokens
      (0L, "intro words secret eval question about spark padding pad2 pad3"),
      (1L, "totally clean document with no benchmark overlap at all"),
      // the whole doc IS the benchmark row: 6/6 contaminated
      (2L, "secret eval question about spark internals")
    ).toDF("doc_id", "text")
    val m = Dedup.contaminationSpans(d, "doc_id", "text", bench, "text", n = 3)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    assert(m(0L) == ((10L, 5L, 0.5)))
    assert(m(1L) == ((9L, 0L, 0.0)))
    assert(m(2L) == ((6L, 6L, 1.0)))
    assert(m.size == 3)
  }

  test("duplicateSpans: overlapping and adjacent marks merge; disjoint spans stay separate") {
    import spark.implicits._
    // "c1 c2 c3" in all docs at two sites; doc 0's sites are far apart
    // (two spans), doc 1's are adjacent (one merged span)
    val d = Seq(
      (0L, "c1 c2 c3 u1 u2 u3 u4 u5 c1 c2 c3"),
      (1L, "c1 c2 c3 c1 c2 c3 v7"),
      (2L, "w1 c1 c2 c3 w2 w3 w4 w5 w6 c1 c2 c3")
    ).toDF("doc_id", "text")
    val spans = Dedup.duplicateSpans(d, "doc_id", "text", n = 3, minDocs = 3)
      .as[(Long, Long, Long, Long)].collect().toSet
    // doc 0: marks at 0 and 8 -> gap 8 > n -> two spans [0,3) and [8,11)
    assert(spans.contains((0L, 0L, 3L, 3L)) && spans.contains((0L, 8L, 11L, 3L)))
    // doc 1: marks at 0 and 3 -> adjacent (gap == n) -> one span [0, 6)
    assert(spans.contains((1L, 0L, 6L, 6L)))
    assert(!spans.exists(s => s._1 == 1L && s._4 < 6L))
  }
}
