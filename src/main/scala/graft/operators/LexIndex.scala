package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** A built BM25 postings index: everything query-time retrieval needs
  * WITHOUT touching corpus text again.
  *
  *  - `postings` — (term, id, tf, dl): one row per distinct (document,
  *    term), hash-partitioned on the term at write so a query batch's
  *    read prunes to its terms' partitions. The document length rides
  *    INLINE on every posting (the classic inverted-index norm-in-the-
  *    posting design): +8 bytes/row buys queries out of a corpus-sized
  *    doclen shuffle join — scoring needs nothing but the matched rows.
  *  - `doclen`   — (id, dl): the per-document token count, kept as its
  *    own frame for the meta constants and append bookkeeping (and as
  *    the join fallback for a pre-inline index layout).
  *  - `nDocs`/`totLen` — the corpus constants (documents with ≥1 token,
  *    total token count), persisted in meta and maintained additively on
  *    append — integer arithmetic, so the maintained values are EXACTLY
  *    the rebuilt ones.
  *
  * The tokenizer ([[Dedup.tokens]]) is part of the artifact's contract:
  * a query or append that tokenized differently would compute df/tf
  * against the wrong term space. It takes no parameters here, so meta
  * carries only the partition count.
  */
final case class Bm25Index(
    postings: DataFrame,
    doclen: DataFrame,
    nDocs: Long,
    totLen: Long,
    nPb: Int = LexIndex.DefaultNPb)

/** Index lifecycle for serving lexical retrieval: build the postings
  * once over the curated corpus, persist, then answer each query batch
  * touching only the matched terms' postings — the production form of
  * [[Retrieval.bm25TopK]], which re-tokenizes the ENTIRE corpus per
  * call. (Same lifecycle split as [[DedupIndex]] vs the one-shot dedup
  * chain, and the standard inverted-index workflow, e.g. Lucene's
  * index-then-search.)
  *
  * 100 TB design: a query batch reads (a) its terms' postings partitions
  * — the pb = hash(term) layout turns the term restriction into a
  * partition-pruned scan, so the read follows matched postings, not the
  * corpus — and (b) the doclen frame for the length normalization of
  * exactly the docs that matched (a semi-restricted shuffle join).
  * Document frequencies are NOT persisted: df for a queried term is a
  * count over that term's (already restricted) postings, so appends
  * never have to rewrite a global df table — the classic df-staleness
  * problem of incremental inverted indexes dissolves by deriving df at
  * query time from data that is already in hand. Appending a new corpus
  * slice is map-only over the delta (new parquet files, no rewrite, meta
  * constants bumped additively) — the O(delta)-commit discipline of
  * [[DedupIndex.appendToDir]].
  *
  * The whole chain is deterministic integer/double math shared with
  * [[Retrieval.bm25TopK]] (the scoring tail IS the same expression tree,
  * [[Retrieval.bm25Rank]]), so build → write → read → query is
  * bit-identical to the one-shot operator: q116's oracle IS q112's SQL,
  * re-derived through the persisted hop (and q117's through the append
  * hop).
  */
object LexIndex {

  /** Postings partition count: pb = pmod(hash(term), nPb). A query
    * batch's distinct terms map to ≤ min(#terms, nPb) partitions and the
    * scan prunes to those files. Like [[DedupIndex.DefaultNPb]]: size so
    * corpus/nPb partitions are a few hundred MB at the target scale —
    * pruning bites once nPb exceeds a batch's distinct-term count.
    *
    * [[build]] derives the count from the corpus token volume
    * ([[adaptiveNPb]]) — round-13 optimization, same rationale as
    * [[DedupIndex.adaptiveNPb]]: a constant is wrong at both ends (64
    * directories for a 5,000-doc corpus made the write/list/commit
    * overhead the dominant cost of every LexIndex lifecycle query at
    * serving SFs; a 100 TB corpus wants thousands). The constant remains
    * only as the fallback for hand-built [[Bm25Index]] values. */
  val DefaultNPb = 64

  /** Partition count for `totLen` corpus tokens: ~8M tokens per partition
    * keeps positional postings partitions in the few-hundred-MB band
    * (posting row ≈ 30-40 B per token occurrence), floored at 4 and
    * capped at 8,192 directories (listing cost; past the cap partitions
    * grow beyond the target instead). */
  private[operators] def adaptiveNPb(totLen: Long): Int = {
    val tokensPerPartition = 8000000L
    math.max(4L, math.min(8192L,
      (totLen + tokensPerPartition - 1) / tokensPerPartition)).toInt
  }

  private def pb(termc: org.apache.spark.sql.Column, nPb: Int) =
    pmod(hash(termc), lit(nPb))

  /** File count for the per-doc narrow doclen frame (~16 B/doc): ~8M
    * docs per file lands a few hundred MB; grows linearly past that. */
  private[operators] def smallFrameFiles(nDocs: Long): Int =
    math.max(1L, math.min(8192L, nDocs / 8000000L + 1)).toInt

  /** Tokenize and count the corpus. One wide shuffle (the (id, term)
    * aggregation), paid once here instead of per query batch.
    *
    * Postings are POSITIONAL: each (id, term) row also carries the sorted
    * token offsets of that term in the document — the classic positional
    * posting list that upgrades the index from bag-of-words BM25 to
    * phrase/proximity queries ([[phraseTopK]]) without a second artifact.
    * BM25 queries never read the column (parquet prunes it at the scan,
    * asserted in LexIndexSpec), so the upgrade costs ranking nothing;
    * storage grows by one int per token occurrence — the standard
    * positional-index price (Lucene pays the same in its .pos files). */
  def build(docs: DataFrame, idCol: String, textCol: String,
            nPb: Int = 0): Bm25Index = { // 0 = derive from corpus size
    // input-proportional cached width — see Dedup.minhashNearDups (r13)
    val p = Scale.inputPartitions(docs)
    val tf = docs
      .select(col(idCol), posexplode(Dedup.tokens(col(textCol))).as(Seq("__pos", "term")))
      .groupBy(col(idCol).as("id"), col("term"))
      .agg(count(lit(1)).cast("long").as("tf"),
        sort_array(collect_list(col("__pos"))).as("positions"))
      .coalesce(p)
      .persist(StorageLevel.MEMORY_AND_DISK)
    val doclen = tf.groupBy(col("id")).agg(sum("tf").cast("long").as("dl"))
      .coalesce(p)
      .persist(StorageLevel.MEMORY_AND_DISK)
    // nDocs counts docs with ≥1 token — bm25TopK's N (an all-whitespace
    // doc has no postings and can never score; excluding it from N keeps
    // the two paths' idf identical)
    val Array(n, tot) = doclen
      .agg(count(lit(1)).cast("long"), coalesce(sum("dl"), lit(0L)).cast("long"))
      .collect().head.toSeq.map(_.asInstanceOf[Long]).toArray
    // dl inline: one corpus-sized join here, paid once per build instead
    // of once per query batch
    Bm25Index(tf.join(doclen, "id")
      .select(col("term"), col("id"), col("tf"), col("dl"), col("positions")),
      doclen, n, tot, if (nPb > 0) nPb else adaptiveNPb(tot))
  }

  /** Persist: two parquet frames + one meta row. Postings repartitioned
    * on pb before partitionBy — without it every write task emits a file
    * into every partition dir (tasks × nPb small files; the DedupIndex
    * shingle store measured that 3× slower to write and probe). */
  def write(ix: Bm25Index, dir: String): Unit = {
    val spark = ix.postings.sparkSession
    import spark.implicits._
    // sortWithinPartitions(term): each row group's min/max term stats
    // become tight, so query's pushed `term IN (...)` filter skips the
    // row groups (and dictionary pages) of every unmatched term — the
    // partition layout prunes FILES, the sort prunes WITHIN them
    ix.postings.withColumn("pb", pb(col("term"), ix.nPb))
      .repartition(col("pb"))
      .sortWithinPartitions(col("term"))
      .write.partitionBy("pb").mode("overwrite").parquet(s"$dir/postings")
    // doclen is ~16 B/doc and its producing aggregation is cached (AQE
    // cannot right-size the fixed shuffle.partitions output), so a bare
    // write emits one near-empty file per partition — coalesce to ~8M
    // docs/file, scale-linear and narrow (same move as DedupIndex.write)
    ix.doclen.coalesce(smallFrameFiles(ix.nDocs))
      .write.mode("overwrite").parquet(s"$dir/doclen")
    Seq((ix.nDocs, ix.totLen, ix.nPb))
      .toDF("n_docs", "tot_len", "n_pb")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/meta")
  }

  /** Meta may hold ONE row (plain [[write]]/[[appendToDir]] lifecycle) or
    * one BASE row plus one DELTA row per committed epoch ([[LexIndexOcc]]'s
    * concurrent appends — additive integer deltas in separate files is
    * what lets two epochs land without a read-modify-write race on a
    * single meta row). n_docs/tot_len SUM across rows; n_pb is an
    * immutable index parameter carried identically on every row. */
  def read(spark: SparkSession, dir: String): Bm25Index = {
    val metaRows = spark.read.parquet(s"$dir/meta").collect()
    require(metaRows.nonEmpty, s"empty index meta at $dir/meta")
    Bm25Index(
      spark.read.parquet(s"$dir/postings"),
      spark.read.parquet(s"$dir/doclen"),
      metaRows.map(_.getAs[Long]("n_docs")).sum,
      metaRows.map(_.getAs[Long]("tot_len")).sum,
      metaRows.head.getAs[Int]("n_pb"))
  }

  /** Terms-per-batch bound for the static pushdown in [[query]]: below
    * it the batch's distinct terms are collected (driver list bounded by
    * the batch's own size — the query side is small by contract, the
    * same boundedness argument as DedupIndex.probe's candidate-partition
    * collect) and pushed as `term IN (...)` + `pb IN (...)` STATIC scan
    * filters, so parquet prunes partitions by pb and row groups by the
    * term min/max stats the sorted write laid down. Past the bound the
    * restriction falls back to a broadcast semi-join — correct at any
    * batch size, but the scan reads every row group of the touched
    * partitions (measured 30.9 s vs one-shot's 22.6 s on a 500k-doc
    * corpus — the fallback alone is NOT an index win; the pushdown is). */
  val MaxPushTerms = 20000

  /** The shared pushdown of [[query]] and [[phraseTopK]]: one bounded
    * collect yields the batch's term list AND its pb values (pb computed
    * by the same Spark expression the write used, never re-implemented
    * driver-side), pushed as static `term IN`/`pb IN` scan filters below
    * [[MaxPushTerms]], with the broadcast semi-join fallback above it. */
  private def prunedPostings(ix: Bm25Index, qTerms: DataFrame): DataFrame = {
    val termsLocal: Option[Seq[(String, Int)]] = {
      val t = qTerms.select(col("term"), pb(col("term"), ix.nPb).as("pb"))
        .distinct().limit(MaxPushTerms + 1).collect()
      if (t.length <= MaxPushTerms)
        Some(t.map(r => (r.getString(0), r.getInt(1))).toSeq)
      else None
    }
    val hasPb = ix.postings.columns.contains("pb")
    val pruned = termsLocal match {
      case Some(ts) =>
        val byTerm = ix.postings.filter(col("term").isin(ts.map(_._1): _*))
        if (hasPb) byTerm.filter(col("pb").isin(ts.map(_._2).distinct: _*))
        else byTerm
      case None =>
        if (hasPb) {
          val pbs = qTerms.select(pb(col("term"), ix.nPb).as("pb")).distinct()
            .collect().map(_.getAs[Int]("pb")).toSeq
          ix.postings.filter(col("pb").isin(pbs: _*))
        } else ix.postings
    }
    pruned.join(broadcast(qTerms.select(col("term")).distinct()), Seq("term"), "left_semi")
  }

  /** Rank the indexed corpus against each query — bit-for-bit
    * [[Retrieval.bm25TopK]]'s output (same scoring tail,
    * [[Retrieval.bm25Rank]]), at query-batch cost:
    *
    *  1. the batch's distinct terms (≤ [[MaxPushTerms]]) are pushed as
    *     static `term IN`/`pb IN` scan filters — the postings READ
    *     prunes to the query terms' row groups, not files-then-scan-all;
    *  2. the broadcast term frame restricts surviving postings before
    *     any shuffle — from here cost follows matched postings;
    *  3. df per term = count over its restricted postings (all of that
    *     term's rows are in hand by construction), so no df table exists
    *     to go stale under appends;
    *  4. corpus constants come from meta as literals — constant-folded
    *     into the same doubles the one-shot path computes.
    */
  def query(ix: Bm25Index, queries: DataFrame,
            queryIdCol: String, queryTextCol: String, k: Int,
            k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    val qTerms = queries.select(
        col(queryIdCol).as("query_id"),
        explode(Dedup.tokens(col(queryTextCol))).as("term"))
      .distinct()
      .coalesce(Scale.inputPartitions(queries)) // batch-proportional cached width (r13)
      .persist(StorageLevel.MEMORY_AND_DISK)
    val restricted = prunedPostings(ix, qTerms)
    // dl comes inline from the posting rows; the doclen join only exists
    // as the fallback for a pre-inline index layout
    val matched = (
      if (restricted.columns.contains("dl"))
        restricted.select(col("term"), col("id").as("doc_id"),
          col("tf").as("__tf"), col("dl").as("__dl"))
      else restricted
        .select(col("term"), col("id").as("doc_id"), col("tf").as("__tf"))
        .join(ix.doclen.select(col("id").as("doc_id"), col("dl").as("__dl")),
          "doc_id")
      ).persist(StorageLevel.MEMORY_AND_DISK)
    val docFreq = matched.groupBy(col("term")).agg(count(lit(1)).as("__df"))
    // doc-clustered spread before the per-query fan-out inside bm25Rank,
    // for BOTH reasons the matched frame needs a shuffle: (1) width — the
    // pruned scan hands matched only a few partitions (its bytes are
    // small) while the qTerms join expands every posting once PER QUERY
    // (measured 34 s vs 14 s at sf10 when 77M fanned rows aggregated on
    // ~8 tasks — the q35 straggler shape); (2) clustering — doc_id-hashed
    // input satisfies the (query, doc) aggregation's distribution, so the
    // fanned rows are never exchanged (the q112 sf10 adjudication: 205 s
    // round-robin vs 116 s doc-clustered on the one-shot twin).
    Retrieval.bm25Rank(Scale.spreadBy(matched, col("doc_id"))
      .join(broadcast(docFreq), "term")
      .withColumn("__n_docs", lit(ix.nDocs))
      .withColumn("__tot_len", lit(ix.totLen)), qTerms, k, k1, b)
  }

  /** Phrase-match top-k over the positional postings: per query, rank the
    * documents containing the phrase's tokens CONSECUTIVELY by phrase
    * frequency (number of occurrences), deterministic doc-id tiebreak.
    * Output: (query_id, rank, doc_id, pf).
    *
    * The relational form of Lucene's PhraseQuery: anchors = the offset-0
    * term's positions in each candidate document; an anchor p matches
    * when every phrase offset j finds its term at p + j
    * (`array_contains` on the posting's position list — codegen'd, no
    * per-position explode except the anchor's own list). Candidates are
    * first restricted to documents containing ALL phrase terms (an
    * aggregation over the already-pruned postings), so a stopword anchor
    * term cannot explode anchors across the corpus — cost follows the
    * documents that could possibly match, which is the selective-phrase
    * contract.
    *
    * The scan side reuses [[prunedPostings]]: the phrase's terms push
    * down as the same static `term IN`/`pb IN` filters BM25 queries get,
    * so the positional read touches the phrase terms' row groups only.
    * Every step is integer/array arithmetic on the persisted offsets —
    * q120 re-derives the whole pipeline (tokenize-with-positions, anchor
    * join, consecutive-match count, rank) in DuckDB and hash-matches. */
  def phraseTopK(ix: Bm25Index, queries: DataFrame, queryIdCol: String,
                 phraseCol: String, k: Int): DataFrame = {
    require(ix.postings.columns.contains("positions"),
      "phraseTopK needs a positional index (rebuild with this version's build)")
    graft.functions.GraftFunctions.register(queries.sparkSession)
    import org.apache.spark.sql.expressions.Window
    // per-query (term, offset) requirements pack as gi·16 + offset, so
    // offsets ride in 4 bits next to the term index. The 16-token budget
    // is enforced in qTerms' OWN projection: an over-long phrase raises
    // the first time the persisted frame materializes — which is
    // prunedPostings' always-run bounded collect, so the raise fires on
    // EVERY serving call regardless of candidates (an earlier cut guarded
    // only the qMeta packing, and AQE's empty-relation propagation pruned
    // the broadcast — and the guard with it — whenever an out-of-vocab
    // token emptied the candidate side). No extra driver job either way:
    // the old `.head()` pre-check was one blocking job per call.
    val safeOffset = when(col("offset") < 16, col("offset"))
      .otherwise(raise_error(format_string(
        "phrases carry at most 16 tokens (got offset %d)", col("offset"))))
    val qTerms = queries.select(col(queryIdCol).as("query_id"),
        posexplode(Dedup.tokens(col(phraseCol))).as(Seq("offset", "term")))
      .select(col("query_id"), safeOffset.cast("int").as("offset"), col("term"))
      .coalesce(Scale.inputPartitions(queries)) // batch-proportional cached width (r13)
      .persist(StorageLevel.MEMORY_AND_DISK)
    val qTermsD = qTerms.select(col("query_id"), col("term")).distinct()
    val qDist = qTermsD.groupBy(col("query_id"))
      .agg(count(lit(1)).cast("int").as("__d"))
    val (batchTerms, docEvents) = sharedEvents(ix, qTerms)
    val qMeta = qTerms.join(broadcast(batchTerms), "term")
      .groupBy(col("query_id"))
      .agg(sort_array(collect_list((col("__gi") * 16 + col("offset")).cast("int")))
        .as("__qpack"))
    // anchor-explosion guard: docs containing every DISTINCT phrase term —
    // a narrow aggregation, positions never ride along
    val pairs = prunedPostings(ix, qTerms)
      .select(col("term"), col("id").as("doc_id"))
      .join(broadcast(qTermsD), "term")
      .groupBy(col("query_id"), col("doc_id"))
      .agg(count(lit(1)).cast("int").as("__have"))
      .join(broadcast(qDist), "query_id")
      .filter(col("__have") === col("__d"))
      .select(col("query_id"), col("doc_id"))
    // one native scan per candidate over the SHARED event stream
    // (graft_phrasefreq): anchors binary-search each (offset, term)
    // requirement — same shared-scan shape as proximityTopK, and the same
    // reason (the anchor×offset join duplicated position arrays per query)
    val pf = pairs
      .join(docEvents, "doc_id")
      .join(broadcast(qMeta), "query_id")
      .withColumn("pf", call_function("graft_phrasefreq",
        col("__pos"), col("__gis"), col("__qpack")))
      .filter(col("pf") > 0)
      .select(col("query_id"), col("doc_id"), col("pf"))
    val w = Window.partitionBy(col("query_id")).orderBy(col("pf").desc, col("doc_id"))
    pf.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("doc_id"), col("pf"))
  }

  /** The shared per-document event stream of [[phraseTopK]] and
    * [[proximityTopK]]: the query BATCH's distinct terms with a dense
    * global index (`__gi` — the one single-partition window here, bounded
    * by the batch's term count), and per doc ONE sorted (pos, gi) event
    * pair-of-arrays over those terms. Built once per batch from the
    * pruned postings — position data never duplicates per query, which is
    * what keeps both operators' cost at
    * O(batch postings + candidates · events/doc). */
  private def sharedEvents(ix: Bm25Index,
                           qTerms: DataFrame): (DataFrame, DataFrame) = {
    import org.apache.spark.sql.expressions.Window
    val batchTerms = qTerms.select(col("term")).distinct()
      .withColumn("__gi",
        (row_number().over(Window.orderBy(col("term"))) - 1).cast("int"))
    val mkEvents =
      "transform(positions, p -> struct(CAST(p AS BIGINT) AS pos, __gi AS gi))"
    val docEvents = prunedPostings(ix, qTerms)
      .select(col("term"), col("id").as("doc_id"), col("positions"))
      .join(broadcast(batchTerms), "term")
      .groupBy(col("doc_id"))
      .agg(sort_array(flatten(collect_list(expr(mkEvents)))).as("__evs"))
      .select(col("doc_id"),
        expr("transform(__evs, e -> e.pos)").as("__pos"),
        expr("transform(__evs, e -> e.gi)").as("__gis"))
    (batchTerms, docEvents)
  }

  /** Max distinct terms a proximity query may carry: bounds the number of
    * conditional running-max columns the minimal-window scan computes. */
  val MaxProximityTerms = 8

  /** Proximity ("sloppy phrase") top-k over the positional postings: rank
    * documents that contain AT LEAST ONE occurrence of EVERY distinct
    * query term inside a `window`-token span, by the MINIMAL such span
    * (tighter co-occurrence = better match; doc-id tiebreak). The Lucene
    * SpanNearQuery/slop contract, expressed relationally.
    *
    * Minimal-window derivation — the classic one-pass form, relationally:
    * every minimal window's RIGHT edge is an occurrence, so each
    * occurrence row asks "what is the smallest window ENDING here?" =
    * current position − min over terms of (that term's LAST occurrence at
    * or before here) + 1. The per-term last-occurrence columns are
    * conditional running maxes over ONE ordered window per (query, doc) —
    * O(occ log occ) per candidate with NO pairwise join. (Two earlier
    * cuts enumerated window STARTS against occurrences: the raw form was
    * O(occ²) per doc — 94.6 s at the sf1 step on stopword-heavy queries —
    * and window-bucketing the pairing didn't save it; the running-max
    * scan did.) Queries carry ≤ [[MaxProximityTerms]] distinct terms.
    *
    * Candidates are first restricted to docs containing ALL terms (the
    * same stopword guard as [[phraseTopK]]); the scan side reuses
    * [[prunedPostings]] (static `term IN`/`pb IN` pushdown). Everything
    * downstream is integer arithmetic on persisted offsets — q123
    * re-derives tokenize-with-positions, the running-max scan, span
    * minimization, and the rank in DuckDB with the same window functions. */
  def proximityTopK(ix: Bm25Index, queries: DataFrame, queryIdCol: String,
                    textCol: String, window: Int, k: Int): DataFrame = {
    require(ix.postings.columns.contains("positions"),
      "proximityTopK needs a positional index (rebuild with this version's build)")
    require(window >= 1, s"window must be >= 1: $window")
    graft.functions.GraftFunctions.register(queries.sparkSession)
    import org.apache.spark.sql.expressions.Window
    val qTerms = queries.select(col(queryIdCol).as("query_id"),
        explode(array_distinct(Dedup.tokens(col(textCol)))).as("term"))
      .coalesce(Scale.inputPartitions(queries)) // batch-proportional cached width (r13)
      .persist(StorageLevel.MEMORY_AND_DISK)
    val qLen = qTerms.groupBy(col("query_id"))
      .agg(countDistinct(col("term")).cast("int").as("__m"))
    // deterministic per-query term index 0..m-1 for the running-max columns
    val wTi = Window.partitionBy(col("query_id")).orderBy(col("term"))
    val qTermsIdx = qTerms
      .withColumn("__ti", (row_number().over(wTi) - 1).cast("int"))
    // a query with more terms than the fold's last-seen budget would
    // otherwise return silently-empty results (its validity check can
    // never reach m) — refuse loudly, with one tiny query-batch aggregate
    qLen.select(max(col("__m"))).head().get(0) match {
      case null => ()
      case m: Int => require(m <= MaxProximityTerms,
        s"proximity queries carry at most $MaxProximityTerms distinct terms (got $m)")
      case _ => ()
    }
    // SHARED SCAN across the query batch (the q116 hoist discipline):
    // queries overlap heavily in terms, so anything carrying POSITION
    // ARRAYS is computed once per (doc, batch), never once per (doc,
    // query). Three frames:
    //  - batchTerms: the batch's distinct terms with a dense global index
    //    (bounded by 8 × #queries — the one single-partition window here);
    //  - docEvents: per doc, ONE sorted (pos, global-term-index) event
    //    array over all batch terms — built from the pruned postings with
    //    a 1-row-per-posting aggregation;
    //  - qMeta: per query, the global→local term-index map (≤ m entries)
    //    used to interpret shared events during the fold.
    val (batchTerms, docEvents) = sharedEvents(ix, qTerms)
    // per-query term set packed as gi·16 + ti entries (ti ≤ 15 by the
    // MaxProximityTerms budget); sorted for determinism
    val qMeta = qTermsIdx.join(broadcast(batchTerms), "term")
      .groupBy(col("query_id"))
      .agg(sort_array(collect_list((col("__gi") * 16 + col("__ti")).cast("int")))
        .as("__qpack"))
    // candidate pairs: docs containing ALL the query's terms — a NARROW
    // (query, doc, term) aggregation; position arrays never ride along.
    // count(*), not countDistinct: postings carry one row per (term, doc)
    // and qTerms one row per (query, term), so the joined keys are unique
    // by construction (countDistinct's expand doubled this 72M-row agg)
    val pairs = prunedPostings(ix, qTerms)
      .select(col("term"), col("id").as("doc_id"))
      .join(broadcast(qTermsIdx.select(col("query_id"), col("term"))), "term")
      .groupBy(col("query_id"), col("doc_id"))
      .agg(count(lit(1)).cast("int").as("__have"))
      .join(broadcast(qLen), "query_id")
      .filter(col("__have") === col("__m"))
      .select(col("query_id"), col("doc_id"))
    // One native scan per candidate over the SHARED event stream
    // (graft_minspan): keep each query term's last-seen position; whenever
    // all m have been seen, the smallest window ending at the current
    // event is pos − min(last) + 1; events of other queries' terms pass
    // through. Three earlier cuts of this step — start×occurrence
    // enumeration (O(occ²)), a 113M-row conditional-running-max
    // WindowExec scan, and the same sweep as a SQL aggregate() HOF (which
    // rebuilds an m-array three times per event) — all measured ~95 s at
    // the sf1 step on this corpus's stopword-dense queries; the
    // allocation-free expression does the identical arithmetic inside one
    // codegen'd projection.
    val best = pairs
      .join(docEvents, "doc_id")
      .join(broadcast(qMeta), "query_id")
      .withColumn("span", call_function("graft_minspan",
        col("__pos"), col("__gis"), col("__qpack")))
      .filter(col("span").isNotNull && col("span") <= window)
      .select(col("query_id"), col("doc_id"), col("span"))
    val w = Window.partitionBy(col("query_id")).orderBy(col("span"), col("doc_id"))
    best.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("doc_id"), col("span"))
  }

  /** Index a delta corpus slice into the at-rest index at `dir`:
    * tokenize/count ONLY the delta, commit new parquet files under the
    * two frames, bump the meta constants additively — O(delta) compute,
    * no existing file rewritten. Ids must be new (the corpus append
    * contract); appending is exactly equivalent to having built over the
    * union because per-doc postings/doclen rows are independent of every
    * other document, and df/N/avgdl are derived (query time / additive
    * integers), never frozen. Returns docs appended. */
  def appendToDir(spark: SparkSession, dir: String, docs: DataFrame,
                  idCol: String, textCol: String): Long = {
    val ix = read(spark, dir)
    val delta = build(docs, idCol, textCol, ix.nPb)
    delta.postings.withColumn("pb", pb(col("term"), ix.nPb))
      .repartition(col("pb"))
      .sortWithinPartitions(col("term")) // row-group stats, like write()
      .write.partitionBy("pb").mode("append").parquet(s"$dir/postings")
    delta.doclen.coalesce(smallFrameFiles(delta.nDocs))
      .write.mode("append").parquet(s"$dir/doclen")
    import spark.implicits._
    Seq((ix.nDocs + delta.nDocs, ix.totLen + delta.totLen, ix.nPb))
      .toDF("n_docs", "tot_len", "n_pb")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/meta")
    delta.nDocs
  }

  /** Maintenance rewrite: every append leaves one more file per touched
    * pb partition, each sorted only WITHIN ITSELF — so a query term's
    * rows spread across k append files cost k row-group reads, and the
    * global term sort the pushdown pruning feeds on decays. Compact
    * rewrites each frame (postings re-sorted per partition, doclen
    * squashed) behind a stage-then-rename swap, value-neutral by
    * construction — the same single-maintainer cadence as
    * [[DedupIndex.compact]] / Kafka's log cleaner. Meta is untouched
    * (compaction moves no corpus mass). */
  def compact(spark: SparkSession, dir: String): Unit = {
    val conf = spark.sparkContext.hadoopConfiguration
    val fs = new org.apache.hadoop.fs.Path(dir).getFileSystem(conf)
    val fc = org.apache.hadoop.fs.FileContext
      .getFileContext(new org.apache.hadoop.fs.Path(dir).toUri, conf)
    def swap(frame: String)(writeStage: (DataFrame, String) => Unit): Unit = {
      val cur = spark.read.parquet(s"$dir/$frame")
      writeStage(cur, s"$dir/_stage/c-$frame")
      val live = new org.apache.hadoop.fs.Path(dir, frame)
      val old = new org.apache.hadoop.fs.Path(dir, s"$frame.old")
      fc.rename(live, old, org.apache.hadoop.fs.Options.Rename.OVERWRITE)
      fc.rename(new org.apache.hadoop.fs.Path(s"$dir/_stage/c-$frame"), live)
      fs.delete(old, true)
    }
    val nPb = spark.read.parquet(s"$dir/meta").collect().head.getAs[Int]("n_pb")
    swap("postings")((df, p) => df.drop("pb")
      .withColumn("pb", pb(col("term"), nPb)).repartition(col("pb"))
      .sortWithinPartitions(col("term"))
      .write.partitionBy("pb").mode("overwrite").parquet(p))
    swap("doclen")((df, p) => df.coalesce(1).write.mode("overwrite").parquet(p))
    fs.delete(new org.apache.hadoop.fs.Path(dir, "_stage"), true)
  }
}
