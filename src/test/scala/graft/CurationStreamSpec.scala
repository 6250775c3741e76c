package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.operators.{Curation, Dedup, TextAnalysis}
import graft.streaming.CurationStream

/** Streaming curation: the stateless row gates compute the same numbers as
  * the batch curate pipeline, and the watermarked streaming scorer emits,
  * per closed window, exactly the batch lmScore / contamination values for
  * the documents that arrived — streaming vs batch is a latency choice,
  * never a semantics change. */
class CurationStreamSpec extends SparkSpec {

  private val stopwords = Seq("the", "a", "of", "and", "to", "in")
  private def doc(words: Int, tag: String): String =
    (1 to words).map(i => s"$tag$i").mkString(" ")

  test("rowSignals equals the batch curate gate on its per-document columns") {
    import spark.implicits._
    val good = "the cat sat of the mat and went to sleep in a box " + doc(30, "f")
    val corpus = Seq(
      (1L, good),
      (2L, "tiny doc"),
      (3L, ("the of and to in a " * 8) + doc(20, "rep ") + ("the of and to in a " * 8)),
      (4L, doc(45, "nostop"))
    ).toDF("doc_id", "text")
    val emptyEval = Seq.empty[(Long, String)].toDF("doc_id", "text")
    val batch = Curation.curate(corpus, emptyEval, "doc_id", "text", stopwords,
        minTokens = 30L, maxTokens = 10000L, minStopRatio = 0.02, maxRepetition = 0.5)
      .collect().map(r => r.getAs[Long]("doc_id") -> r).toMap
    val stream = CurationStream.rowSignals(corpus, "doc_id", "text", stopwords,
        minTokens = 30L, maxTokens = 10000L, minStopRatio = 0.02, maxRepetition = 0.5)
      .collect().map(r => r.getAs[Long]("doc_id") -> r).toMap
    batch.keys.foreach { id =>
      val (b, s) = (batch(id), stream(id))
      assert(s.getAs[Long]("n_tokens") == b.getAs[Long]("n_tokens"), s"n_tokens $id")
      assert(s.getAs[Double]("stop_ratio") == b.getAs[Double]("stop_ratio"), s"stop $id")
      assert(s.getAs[Double]("repetition_ratio") == b.getAs[Double]("repetition_ratio"),
        s"rep $id")
      Seq("pass_length", "pass_stopwords", "pass_repetition").foreach(c =>
        assert(s.getAs[Boolean](c) == b.getAs[Boolean](c), s"$c $id"))
    }
  }

  test("streamingScore emits batch-identical LM and contamination values per window") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    def t(x: String) = java.sql.Timestamp.valueOf(x)
    val evalText = "held out benchmark question about catalyst optimizer internals"
    val trainDocs = Seq((100L, "the cat sat of the mat and the dog sat on the rug"))
      .toDF("doc_id", "text")
    val lm = TextAnalysis.unigramLm(trainDocs, "doc_id", "text")
    // unseen-mass weight, computed batch-side exactly as streamingScore expects
    val tv = lm.agg(sum("cf"), count(lit(1))).head()
    val oov = math.round(math.log(1.0 / (tv.getLong(0) + tv.getLong(1))) * 1000000)
    val evalSh = Dedup.shingleRows(
      Seq((200L, evalText)).toDF("doc_id", "text"), "doc_id", "text", 3)

    val d1 = "the cat sat on the rug and the dog sat on the mat"
    val d2 = s"some page quoting $evalText inside a longer wrapper text body"
    val input = MemoryStream[(java.sql.Timestamp, Long, String)]
    val docs = input.toDF().toDF("ts", "doc_id", "text")
    val q = CurationStream.streamingScore(docs, "ts", "doc_id", "text",
        lm, oov, evalSh, windowDur = "1 hour", watermark = "30 minutes")
      .writeStream.format("memory").queryName("cs").outputMode("append").start()
    try {
      input.addData((t("2024-01-01 10:05:00"), 1L, d1), (t("2024-01-01 10:20:00"), 2L, d2))
      q.processAllAvailable()
      input.addData((t("2024-01-01 14:00:00"), 99L, "late watermark mover"))
      q.processAllAvailable()
      val out = spark.table("cs").filter(col("doc_id") < 99L)
        .collect().map(r => r.getAs[Long]("doc_id") -> r).toMap
      assert(out.size == 2)
      // LM values match the batch operator scoring the same docs externally
      val batchLm = TextAnalysis.lmScore(
          Seq((1L, d1), (2L, d2)).toDF("doc_id", "text"), "doc_id", "text",
          Some(trainDocs))
        .collect().map(r => r.getAs[Long]("doc_id") -> r).toMap
      Seq(1L, 2L).foreach { id =>
        assert(out(id).getAs[Long]("logprob_micros") ==
          batchLm(id).getAs[Long]("logprob_micros"), s"lm $id")
        assert(out(id).getAs[Long]("n_oov") == batchLm(id).getAs[Long]("n_oov"))
        assert(out(id).getAs[Double]("avg_logprob") ==
          batchLm(id).getAs[Double]("avg_logprob"))
      }
      // contamination matches the batch probe: d2 quotes the eval text, d1 clean
      val batchCt = TextAnalysis.contamination(
          Seq((1L, d1), (2L, d2)).toDF("doc_id", "text"),
          Seq((200L, evalText)).toDF("doc_id", "text"), "doc_id", "text")
        .collect().map(r => r.getAs[Long]("doc_id") -> r).toMap
      Seq(1L, 2L).foreach { id =>
        assert(out(id).getAs[Boolean]("contaminated") ==
          batchCt(id).getAs[Boolean]("contaminated"), s"ct $id")
        assert(out(id).getAs[Long]("n_overlap") == batchCt(id).getAs[Long]("n_overlap"))
        assert(out(id).getAs[Long]("n_shingles") == batchCt(id).getAs[Long]("n_shingles"))
      }
    } finally q.stop()
  }

  test("streamingIncrementalDedup: corpus probes flag, in-stream re-delivery collapses") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    def t(x: String) = java.sql.Timestamp.valueOf(x)
    val textA = "alpha beta gamma delta " + doc(16, "a")
    val textB = "epsilon zeta eta theta " + doc(16, "b")
    val corpus = Seq((1L, textA), (2L, textB)).toDF("doc_id", "text")
    val novel2 = doc(20, "n2")
    val input = MemoryStream[(java.sql.Timestamp, Long, String)]
    val docsDf = input.toDF().toDF("ts", "doc_id", "text")
    val q = CurationStream.streamingIncrementalDedup(docsDf, "ts", "doc_id",
        "text", corpus, prefixK = 4, watermark = "1 hour")
      .writeStream.format("memory").queryName("sid").outputMode("append").start()
    try {
      input.addData(
        (t("2024-01-01 10:00:00"), 10L, textA),                       // exact corpus dup
        (t("2024-01-01 10:01:00"), 11L, "alpha beta gamma delta " + doc(16, "x")), // prefix dup
        (t("2024-01-01 10:02:00"), 12L, doc(20, "novel")),            // clean
        (t("2024-01-01 10:03:00"), 13L, novel2))
      q.processAllAvailable()
      input.addData((t("2024-01-01 10:10:00"), 14L, novel2))          // re-delivery, same text
      q.processAllAvailable()
      val out = spark.table("sid").collect()
        .map(r => r.getAs[Long]("doc_id") ->
          (r.getAs[Boolean]("exact_dup"), r.getAs[Boolean]("prefix_dup"),
           r.getAs[Boolean]("keep"))).toMap
      assert(out(10L) == ((true, true, false)))   // identical ⇒ both probes hit
      assert(out(11L) == ((false, true, false)))
      assert(out(12L) == ((false, false, true)))
      assert(out(13L) == ((false, false, true)))
      assert(!out.contains(14L)) // collapsed by the within-stream text-hash dedup
      assert(out.size == 4)
    } finally q.stop()
  }
}
