package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.operators.Dedup

/** Corpus-curation operators on STREAMING ingest — quality-gating documents
  * as they arrive instead of in a nightly batch, the shape a production
  * crawl pipeline actually runs (score at ingest, quarantine before the
  * corpus ever contains the junk).
  *
  * Two tiers, chosen by what streaming semantics permit:
  *
  *  - [[rowSignals]] — per-document-computable gates (length, stopword,
  *    repetition, subword shape) as pure row expressions: STATELESS, no
  *    shuffle, append-safe at any rate. The batch operators use
  *    explode+hash-agg for codegen throughput; on a stream, statelessness
  *    is the constraint that matters, so the same math runs as array
  *    lambdas per row.
  *  - [[streamingScore]] — corpus-relative signals (benchmark-contamination
  *    membership, unigram-LM scoring) that need reference data: explode →
  *    stream-static BROADCAST joins (the model/eval set never shuffles the
  *    stream) → ONE watermarked (window, id) aggregation, append-mode
  *    emission when the watermark closes the window.
  */
object CurationStream {

  /** n-word shingles of a token-array column as a per-row array (the
    * stateless sibling of [[Dedup.shingleRowsRaw]]'s explode). */
  private def shingleArr(colName: String, n: Int): Column = {
    val idxs = (0 until n).map(j => s"$colName[i + $j]").mkString(", ")
    when(size(col(colName)) >= n,
      expr(s"transform(sequence(0, size($colName) - $n), i -> concat_ws(' ', $idxs))"))
      .otherwise(array().cast("array<string>"))
  }

  /** Stateless per-row quality signals + pass flags — the streaming form of
    * the [[graft.operators.Curation.curate]] gates that are functions of
    * the document alone. Works identically on batch frames (asserted in
    * spec) and streaming frames in append mode. */
  def rowSignals(docs: DataFrame, idCol: String, textCol: String,
                 stopwords: Seq[String],
                 minTokens: Long, maxTokens: Long, minStopRatio: Double,
                 maxRepetition: Double, shingleN: Int = 3): DataFrame = {
    val w = Dedup.tokens(col(textCol))
    docs
      .withColumn("__w", w)
      .withColumn("__sh", shingleArr("__w", shingleN))
      .withColumn("n_tokens", size(col("__w")).cast("long"))
      .withColumn("stop_ratio",
        size(filter(col("__w"), t => t.isin(stopwords: _*))).cast("double") /
          col("n_tokens"))
      .withColumn("repetition_ratio",
        when(size(col("__sh")) > 0,
          lit(1.0) - size(array_distinct(col("__sh"))).cast("double") / size(col("__sh")))
          .otherwise(lit(0.0)))
      .withColumn("pass_length",
        col("n_tokens") >= minTokens && col("n_tokens") <= maxTokens)
      .withColumn("pass_stopwords", col("stop_ratio") >= minStopRatio)
      .withColumn("pass_repetition", col("repetition_ratio") <= maxRepetition)
      .withColumn("keep",
        col("pass_length") && col("pass_stopwords") && col("pass_repetition"))
      .drop("__w", "__sh")
  }

  /** Corpus-relative streaming scores: per document (closed by watermark),
    * the unigram-LM log-prob (against a batch-trained [[graft.operators
    * .TextAnalysis.unigramLm]] model) and the benchmark-contamination
    * probe (against a static distinct eval-shingle set).
    *
    * One explode produces BOTH probe streams (token rows for the LM,
    * shingle rows for contamination) as a tagged union; each joins its
    * static side broadcast (stream never shuffles), and one watermarked
    * (window, id) aggregation folds everything — n_tokens, n_oov,
    * logprob_micros (exact integer), n_shingles, n_overlap, contaminated.
    *
    * `oovMicros` is the model's unseen-mass weight ln(1/(T+V))·10⁶ —
    * compute it once, batch-side, from the model frame. */
  def streamingScore(docs: DataFrame, tsCol: String, idCol: String,
                     textCol: String, lm: DataFrame, oovMicros: Long,
                     evalShingles: DataFrame,
                     windowDur: String, watermark: String,
                     shingleN: Int = 3): DataFrame = {
    val w = Dedup.tokens(col(textCol))
    val base = docs.select(col(tsCol), col(idCol), w.as("__w"))
      .withColumn("__sh", shingleArr("__w", shingleN))
    val tokRows = base.select(col(tsCol), col(idCol),
      lit("tok").as("__kind"), explode(col("__w")).as("__item"))
    val shRows = base.select(col(tsCol), col(idCol),
      lit("sh").as("__kind"), explode(array_distinct(col("__sh"))).as("__item"))
    val lmSide = broadcast(lm.select(col("term").as("__item"),
      col("logp_micros").as("__l")))
    val evalSide = broadcast(evalShingles.select(col("shingle").as("__item"),
      lit(true).as("__hit")).distinct())
    tokRows.unionByName(shRows)
      .join(lmSide, Seq("__item"), "left")
      .join(evalSide, Seq("__item"), "left")
      .withWatermark(tsCol, watermark)
      .groupBy(window(col(tsCol), windowDur), col(idCol))
      .agg(
        sum(when(col("__kind") === "tok", 1L).otherwise(0L)).as("n_tokens"),
        sum(when(col("__kind") === "tok" && col("__l").isNull, 1L).otherwise(0L))
          .as("n_oov"),
        sum(when(col("__kind") === "tok",
          coalesce(col("__l"), lit(oovMicros))).otherwise(0L))
          .as("logprob_micros"),
        sum(when(col("__kind") === "sh", 1L).otherwise(0L)).as("n_shingles"),
        sum(when(col("__kind") === "sh" && col("__hit"), 1L).otherwise(0L))
          .as("n_overlap"))
      .select(col("window.start").as("window_start"), col(idCol),
        col("n_tokens"), col("n_oov"), col("logprob_micros"),
        (col("logprob_micros").cast("double") / (col("n_tokens") * 1000000L))
          .as("avg_logprob"),
        col("n_shingles"), col("n_overlap"),
        (col("n_overlap") > 0).as("contaminated"))
  }

  /** Streaming incremental dedup — the ingest-time form of
    * [[Dedup.incrementalDedup]]: each arriving document is probed against
    * a STATIC already-curated corpus (md5 exact hash + first-k-token
    * prefix hash, both as broadcast stream-static joins — the stream
    * never shuffles), while re-deliveries WITHIN the stream are collapsed
    * by `dropDuplicatesWithinWatermark` on the text hash (bounded state:
    * one hash per text per watermark horizon). Append-mode safe; emits
    * (id, ts, exact_dup, prefix_dup, keep) per surviving arrival. The
    * MinHash near-dup probe deliberately stays batch-side ([[graft
    * .operators.Dedup.incrementalDedup]]) — banding + capped buckets need
    * corpus-wide aggregation a stream can't see. */
  def streamingIncrementalDedup(docs: DataFrame, tsCol: String, idCol: String,
                                textCol: String, corpus: DataFrame,
                                prefixK: Int, watermark: String): DataFrame = {
    def prefixHash(c: Column): Column =
      md5(concat_ws(" ", slice(Dedup.tokens(c), 1, prefixK)))
    val corpusHashes = broadcast(
      corpus.select(md5(col(textCol)).as("__ch")).distinct())
    val corpusPrefixes = broadcast(
      corpus.select(prefixHash(col(textCol)).as("__cp")).distinct())
    docs
      .withColumn("__h", md5(col(textCol)))
      .withColumn("__p", prefixHash(col(textCol)))
      .withWatermark(tsCol, watermark)
      .dropDuplicatesWithinWatermark("__h")
      .join(corpusHashes.withColumn("__e", lit(true)),
        col("__h") === col("__ch"), "left")
      .join(corpusPrefixes.withColumn("__pd", lit(true)),
        col("__p") === col("__cp"), "left")
      .select(col(idCol), col(tsCol),
        coalesce(col("__e"), lit(false)).as("exact_dup"),
        coalesce(col("__pd"), lit(false)).as("prefix_dup"))
      .withColumn("keep", !col("exact_dup") && !col("prefix_dup"))
  }
}
