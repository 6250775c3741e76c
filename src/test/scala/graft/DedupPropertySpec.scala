package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import graft.operators.Dedup

/** Property-based dedup invariants over arbitrary small corpora (fixed-seed
  * raw ScalaCheck — the scalatestplus bridge is not on the offline
  * classpath):
  *   1. exactDedup keeps exactly one representative per distinct text, and
  *      it is the min-id one;
  *   2. minhash LSH candidates never miss an EXACT duplicate pair (equal
  *      shingle sets ⇒ equal signatures ⇒ same buckets — a hard guarantee,
  *      unlike probabilistic near-miss bounds);
  *   3. jaccardForPairs computes exactly |A∩B| / |A∪B| of the shingle sets.
  */
class DedupPropertySpec extends SparkSpec {

  // small-alphabet docs so duplicates and near-duplicates are likely
  private val wordGen = Gen.oneOf("alpha", "beta", "gamma", "delta", "eps")
  private val docGen: Gen[String] =
    Gen.chooseNum(3, 8).flatMap(n => Gen.listOfN(n, wordGen)).map(_.mkString(" "))
  private val corpusGen: Gen[List[String]] =
    Gen.chooseNum(2, 12).flatMap(n => Gen.listOfN(n, docGen))

  private def corpora: Seq[List[String]] =
    (1L to 10L).flatMap(i => corpusGen.apply(Gen.Parameters.default, Seed(i)))

  private def shingleSet(text: String): Set[String] = {
    val w = text.trim.toLowerCase.split("\\s+").toSeq
    if (w.size < 3) Set.empty
    else w.sliding(3).map(_.mkString(" ")).toSet
  }

  test("exactDedup keeps exactly the min-id representative per distinct text") {
    import spark.implicits._
    corpora.foreach { corpus =>
      val docs = corpus.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("doc_id", "text")
      val kept = Dedup.exactDedup(docs, "doc_id", "text")
        .collect().map(r => r.getLong(0) -> r.getString(1))
      val expected = corpus.zipWithIndex
        .groupBy(_._1).map { case (t, xs) => xs.map(_._2).min.toLong -> t }
      assert(kept.toMap == expected, s"corpus=$corpus")
    }
  }

  test("LSH candidates always contain every exact-duplicate pair") {
    import spark.implicits._
    corpora.foreach { corpus =>
      val docs = corpus.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("doc_id", "text")
      val sh = Dedup.shingleRows(docs, "doc_id", "text", 3)
      val sig = Dedup.minhashSignatures(sh, "doc_id", 8)
      val cand = Dedup.lshCandidatePairs(
          Dedup.lshBandRows(sig, "doc_id", 4, 2), "doc_id")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val sets = corpus.zipWithIndex
        .map { case (t, i) => i.toLong -> shingleSet(t) }.toMap
      for {
        a <- sets.keys; b <- sets.keys
        if a < b && sets(a).nonEmpty && sets(a) == sets(b)
      } assert(cand.contains((a, b)), s"missed exact dup ($a,$b) in $corpus")
    }
  }

  test("tfidf over bigrams matches a Scala-computed reference") {
    import spark.implicits._
    import graft.operators.TextAnalysis
    def round6(x: Double) =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    corpora.filter(_.size >= 2).take(4).foreach { corpus =>
      val docs = corpus.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("doc_id", "text")
      val terms = corpus.zipWithIndex.flatMap { case (t, i) =>
        t.trim.toLowerCase.split("\\s+").toSeq.sliding(2)
          .filter(_.size == 2).map(w => (i.toLong, w.mkString(" "))).toSeq
      }
      val tf = terms.groupBy(identity).map { case ((id, term), xs) =>
        (id, term) -> xs.size.toLong }
      val docFreq = tf.keys.groupBy(_._2).map { case (term, xs) => term -> xs.size }
      val n = corpus.size.toDouble
      val expected = tf.map { case ((id, term), f) =>
        (id, term) -> (f, round6(f * math.log(n / docFreq(term))))
      }
      val got = TextAnalysis.tfidf(docs, "doc_id", "text", n = 2)
        .collect().map(r =>
          (r.getLong(0), r.getString(1)) -> ((r.getLong(2), r.getDouble(3)))).toMap
      assert(got == expected, s"corpus=$corpus")
    }
  }

  test("connectedComponents matches a union-find reference on random graphs") {
    import spark.implicits._
    val edgeGen: Gen[List[(Long, Long)]] =
      Gen.listOf(Gen.zip(Gen.choose(0L, 14L), Gen.choose(0L, 14L)))
        .map(_.filter { case (a, b) => a != b })
    val graphs = (1L to 8L).flatMap(i => edgeGen.apply(Gen.Parameters.default, Seed(i)))
      .filter(_.nonEmpty)
    assert(graphs.size >= 5)
    graphs.foreach { edges =>
      // reference: path-compressed union-find with min-id roots
      val parent = scala.collection.mutable.Map[Long, Long]()
      def find(x: Long): Long = {
        val p = parent.getOrElseUpdate(x, x)
        if (p == x) x else { val r = find(p); parent(x) = r; r }
      }
      edges.foreach { case (a, b) =>
        val (ra, rb) = (find(a), find(b))
        if (ra != rb) { val (lo, hi) = (math.min(ra, rb), math.max(ra, rb))
          parent(hi) = lo }
      }
      val expected = parent.keys.map(v => v -> find(v)).toMap
      // driver fast path (small graph) and the distributed loop
      // (driverThreshold = 0 forces it) must both match the reference
      for (threshold <- Seq(200000, 0)) {
        val got = Dedup.connectedComponents(edges.toDF("doc_a", "doc_b"),
            "doc_a", "doc_b", driverThreshold = threshold)
          .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
        assert(got == expected, s"edges=$edges threshold=$threshold")
      }
    }
  }

  test("driver union-find survives a 100k-edge path graph (deep parent chains)") {
    import spark.implicits._
    // Descending-order path edges build a maximal-depth parent chain
    // (parent(i) = i-1, every union touching only fresh roots), then the
    // final edge probes the tail while the chain is still uncompressed:
    // that one find() must walk ~1e5 hops. A recursive find overflows the
    // JVM stack here; the iterative path-halving implementation must
    // return the single component rooted at 0.
    val n = 100000
    val edges = (n - 1 to 1 by -1).map(i => (i.toLong, (i - 1).toLong)) :+
      ((n - 1).toLong, n.toLong)
    val got = Dedup.connectedComponents(edges.toDF("doc_a", "doc_b"),
      "doc_a", "doc_b")
    assert(got.agg(countDistinct(col("component"))).head().getLong(0) == 1L)
    assert(got.agg(min(col("component")), max(col("component"))).head()
      .toSeq == Seq(0L, 0L))
    assert(got.count() == (n + 1).toLong)
  }

  test("pointer doubling: adversarial chain converges in O(log d) rounds, " +
       "identical components; plain propagation provably cannot") {
    import spark.implicits._
    // A 2^16-node path graph with ids in path order is the worst case for
    // min-label propagation: diameter 65535, so the plain loop needs one
    // round per hop. With pointer jumping the covered radius ~doubles per
    // round: expect ~log2(65536)=16 propagate+double rounds (+1 to confirm).
    val n = 65536
    val edges = (1 until n).map(i => (i.toLong, (i - 1).toLong))
      .toDF("doc_a", "doc_b")
    val (got, rounds) = Dedup.connectedComponentsRounds(
      edges, "doc_a", "doc_b", maxIter = 30, driverThreshold = 0)
    assert(rounds <= 20, s"expected O(log diameter) rounds, took $rounds")
    val comp = got.agg(countDistinct(col("component")),
      min(col("component")), max(col("component")), count(lit(1))).head()
    assert(comp.toSeq == Seq(1L, 0L, 0L, n.toLong)) // == union-find: all → 0
    // plain propagation covers one hop per round, so even a 2^11 chain is
    // far out of reach in 8 rounds — and the loop must refuse loudly rather
    // than return a split labeling (small graph keeps the negative case
    // cheap; the doubling run above carries the scale)
    val small = (1 until 2048).map(i => (i.toLong, (i - 1).toLong))
      .toDF("doc_a", "doc_b")
    val e = intercept[IllegalStateException] {
      Dedup.connectedComponentsRounds(small, "doc_a", "doc_b",
        maxIter = 8, driverThreshold = 0, pointerDoubling = false)
    }
    assert(e.getMessage.contains("did not converge"))
  }

  test("jaccardForPairs equals set-computed |A∩B| / |A∪B|") {
    import spark.implicits._
    corpora.filter(_.size >= 2).foreach { corpus =>
      val docs = corpus.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("doc_id", "text")
      val sh = Dedup.shingleRows(docs, "doc_id", "text", 3)
      val sets = corpus.zipWithIndex
        .map { case (t, i) => i.toLong -> shingleSet(t) }.toMap
      val ids = sets.keys.toSeq.sorted
      val pairs = (for { a <- ids; b <- ids if a < b } yield (a, b))
        .toDF("doc_a", "doc_b")
      val got = Dedup.jaccardForPairs(pairs, sh, "doc_id")
        .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
      for { a <- ids; b <- ids if a < b } {
        val inter = sets(a).intersect(sets(b)).size
        val union = sets(a).union(sets(b)).size
        if (inter > 0) // pairs with empty intersection drop out of the inner join
          assert(math.abs(got((a, b)) - inter.toDouble / union) < 1e-12,
            s"pair ($a,$b) in $corpus")
        else assert(!got.contains((a, b)))
      }
    }
  }
}
