package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Text-analysis operators for corpus curation: token statistics, quality
  * scoring, heuristic language identification, and document fingerprinting.
  *
  * Extensions beyond the reference's operator surface (its text handling
  * stops at `regexp_replace` cleanup, `silver_dimensions.py:50,103`), built
  * for training-data pipelines. Everything is built-ins/codegen — one
  * explode + one groupBy per table scan, no UDFs.
  *
  * Why explode+groupBy rather than per-row array lambdas: a zero-shuffle
  * rewrite (array_distinct / aggregate / filter / transform-with-md5 per
  * row) was measured ~3× SLOWER — Catalyst evaluates higher-order-function
  * lambdas interpretively, while explode + hash-aggregate stays inside
  * whole-stage codegen. The shuffle carries only (id, token) pairs, ~input
  * size, and partial aggregation combines map-side.
  */
object TextAnalysis {

  /** Per-document token statistics and quality signals:
    * token count, distinct count, type-token ratio, mean token length,
    * stopword ratio. All ratios are integer-count divisions → bit-stable
    * doubles for the oracle. */
  def tokenStats(docs: DataFrame, idCol: String, textCol: String,
                 stopwords: Seq[String]): DataFrame = {
    val tokRows = docs.select(col(idCol), explode(Dedup.tokens(col(textCol))).as("tok"))
    tokRows.groupBy(col(idCol)).agg(
      count(lit(1)).as("n_tokens"),
      countDistinct(col("tok")).as("n_unique"),
      (countDistinct(col("tok")).cast("double") / count(lit(1))).as("ttr"),
      (sum(length(col("tok"))).cast("double") / count(lit(1))).as("avg_token_len"),
      (sum(col("tok").isin(stopwords: _*).cast("long")).cast("double") / count(lit(1)))
        .as("stop_ratio"))
  }

  /** Heuristic language ID: CJK script detection by Unicode range, else
    * argmax of per-language stopword hit counts with a deterministic
    * priority order on ties. Pure column expressions — reproducible in SQL. */
  def langGuess(textCol: Column, tokensCol: Column): Column = {
    def hits(words: Seq[String]): Column =
      size(filter(tokensCol, t => t.isin(words: _*)))
    val cjk = length(regexp_replace(textCol, "[^\\x{4e00}-\\x{9fff}]", ""))
    val en = hits(Seq("the", "a", "of", "and", "to", "in"))
    val fr = hits(Seq("le", "la", "les", "des", "et", "un"))
    val es = hits(Seq("el", "los", "las", "una", "y", "que"))
    val de = hits(Seq("der", "die", "das", "und", "ein", "nicht"))
    when(cjk > 0, lit("zh"))
      .when(en === 0 && fr === 0 && es === 0 && de === 0, lit("und"))
      .when(en >= fr && en >= es && en >= de, lit("en"))
      .when(fr >= es && fr >= de, lit("fr"))
      .when(es >= de, lit("es"))
      .otherwise(lit("de"))
  }

  /** Document fingerprint: minimum md5 over the document's n-word shingles
    * (winnowing-style content signature — identical docs and near-identical
    * prefixes collide deliberately). Equals MinHash h0 with seed "0:". */
  def fingerprints(docs: DataFrame, idCol: String, textCol: String, n: Int = 3): DataFrame =
    Dedup.shingleRows(docs, idCol, textCol, n)
      .groupBy(col(idCol))
      .agg(min(md5(col("shingle"))).as("fingerprint"))

  /** (id, term) rows with frequency preserved (no dedup — unlike
    * [[Dedup.shingleRows]]): unigram terms for n=1, word n-grams above. */
  def termRows(docs: DataFrame, idCol: String, textCol: String, n: Int): DataFrame =
    if (n == 1)
      docs.select(col(idCol), explode(Dedup.tokens(col(textCol))).as("term"))
    else {
      val idxs = (0 until n).map(j => s"__w[i + $j]").mkString(", ")
      docs.select(col(idCol), Dedup.tokens(col(textCol)).as("__w"))
        .filter(size(col("__w")) >= n)
        .select(col(idCol),
          explode(expr(s"transform(sequence(0, size(__w) - $n), i -> concat_ws(' ', $idxs))"))
            .as("term"))
    }

  /** Classic tf·idf document-term weights over n-gram terms:
    * weight = tf · ln(N/df), rounded to 6 decimals so the double is stable
    * across engines' libm ulps. Three hash aggregations, no driver state —
    * the corpus size N rides along as a broadcast 1-row frame. Output:
    * (id, term, tf, tfidf). */
  def tfidf(docs: DataFrame, idCol: String, textCol: String, n: Int = 1): DataFrame = {
    val tf = termRows(docs, idCol, textCol, n)
      .groupBy(col(idCol), col("term")).agg(count(lit(1)).as("tf"))
    val docFreq = tf.groupBy(col("term")).agg(count(lit(1)).as("__df"))
    val nDocs = docs.select(col(idCol)).distinct()
      .agg(count(lit(1)).as("__n_docs"))
    tf.join(docFreq, "term")
      .crossJoin(broadcast(nDocs))
      .select(col(idCol), col("term"), col("tf"),
        round(col("tf") * log(col("__n_docs").cast("double") / col("__df")), 6)
          .as("tfidf"))
  }

  /** Deterministic corpus split: bucket(id) = first two md5 hex digits of
    * the id string → 0..255, taken % 100, mapped to train/val/test by the
    * given percentages. Unlike `Dataset.sample`, the assignment is a pure
    * function of the id — stable across runs, partitionings, engines and
    * corpus growth (a doc keeps its split when data is added), which is
    * what a training pipeline needs from its holdout boundary. */
  def withSplit(df: DataFrame, idCol: String,
                trainPct: Int, valPct: Int): DataFrame = {
    require(trainPct >= 0 && valPct >= 0 && trainPct + valPct <= 100,
      s"invalid split percentages: train=$trainPct val=$valPct")
    val bucket =
      s"((instr('0123456789abcdef', substr(md5(CAST($idCol AS STRING)), 1, 1)) - 1) * 16 + " +
        s"(instr('0123456789abcdef', substr(md5(CAST($idCol AS STRING)), 2, 1)) - 1)) % 100"
    df.withColumn("split",
      when(expr(bucket) < trainPct, lit("train"))
        .when(expr(bucket) < trainPct + valPct, lit("val"))
        .otherwise(lit("test")))
  }

  /** Benchmark-contamination detection: for every corpus document, the
    * number of its distinct n-gram shingles that appear anywhere in the
    * eval/benchmark set. The canonical pre-training hygiene op — training
    * documents overlapping an eval set inflate benchmark scores, so they
    * are flagged (any overlap) and scored (overlap ratio) for removal or
    * decontamination.
    *
    * Scale design: the eval side is collapsed to DISTINCT shingles and
    * broadcast (eval sets are orders of magnitude smaller than the
    * corpus); the corpus-side probe is a broadcast left_semi — no shuffle
    * of corpus shingles for the membership test, one aggregation for the
    * counts. The corpus shingle frame feeds both on different keys, so it
    * is persisted. */
  def contamination(corpus: DataFrame, evalSet: DataFrame, idCol: String,
                    textCol: String, n: Int = 3): DataFrame = {
    val corpusSh = Dedup.shingleRows(corpus, idCol, textCol, n)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val evalSh = Dedup.shingleRows(evalSet, idCol, textCol, n)
      .select(col("shingle")).distinct()
    val overlap = corpusSh.join(broadcast(evalSh), Seq("shingle"), "left_semi")
      .groupBy(col(idCol)).agg(count(lit(1)).as("__ov"))
    corpusSh.groupBy(col(idCol)).agg(count(lit(1)).as("n_shingles"))
      .join(overlap, Seq(idCol), "left")
      .select(col(idCol), col("n_shingles"),
        coalesce(col("__ov"), lit(0L)).as("n_overlap"),
        (coalesce(col("__ov"), lit(0L)).cast("double") / col("n_shingles"))
          .as("overlap_ratio"),
        (coalesce(col("__ov"), lit(0L)) > 0).as("contaminated"))
  }

  /** Intra-document repetition: fraction of a document's n-gram shingle
    * OCCURRENCES that are repeats of an earlier shingle in the same doc
    * (1 − distinct/total). High-repetition documents (boilerplate, looped
    * generations, scraped nav chrome) are standard low-quality-filter
    * targets in training-data curation. One aggregation over the RAW
    * shingle stream — count and count-distinct in the same pass, no
    * second scan and no distinct shuffle of the shingle frame. */
  def repetition(docs: DataFrame, idCol: String, textCol: String,
                 n: Int = 3): DataFrame =
    Dedup.shingleRowsRaw(docs, idCol, textCol, n)
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_shingles"),
        countDistinct(col("shingle")).as("n_distinct"))
      .select(col(idCol), col("n_shingles"), col("n_distinct"),
        (lit(1.0) - col("n_distinct").cast("double") / col("n_shingles"))
          .as("repetition_ratio"))

  /** PII scrubbing: redact emails then phone-number-shaped digit runs,
    * reporting per-document redaction counts alongside the cleaned text.
    * Pure codegen'd regex (no UDF); patterns are deliberately conservative
    * ASCII shapes that mean the same thing in Spark's (Java) and the
    * oracle's (RE2) regex dialects. Phones are counted AFTER email
    * redaction so an address's digits are never double-counted. */
  val EmailRe = "[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\\.[a-zA-Z]{2,}"
  val PhoneRe = "\\+?[0-9][0-9 -]{7,}[0-9]"
  def piiScrub(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val noEmail = regexp_replace(col(textCol), lit(EmailRe), lit("<EMAIL>"))
    docs.select(col(idCol),
      size(regexp_extract_all(col(textCol), lit(EmailRe), lit(0)))
        .cast("bigint").as("n_emails"),
      size(regexp_extract_all(noEmail, lit(PhoneRe), lit(0)))
        .cast("bigint").as("n_phones"),
      regexp_replace(noEmail, lit(PhoneRe), lit("<PHONE>")).as("clean_text"))
  }

  /** Subword-ish token accounting without a trained tokenizer: a GPT-2-style
    * pre-tokenizer regex (letter runs | single digits, Llama-style | punct
    * runs; whitespace is a separator, not a token) approximates the unit a
    * BPE tokenizer would start from — the standard cheap estimator for
    * "how many tokens will this doc cost" in corpus budgeting. The pattern
    * is conservative ASCII so Java regex (Spark) and RE2 (oracle) agree.
    * chars_per_subword is the classic tokenizer-health ratio (very low =
    * punct soup / code, very high = CJK or concatenated junk). */
  val BpeishRe = "[A-Za-z]+|[0-9]|[^A-Za-z0-9\\s]+"
  def subwordStats(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(col(idCol),
      size(Dedup.tokens(col(textCol))).cast("long").as("n_ws_tokens"),
      size(regexp_extract_all(col(textCol), lit(BpeishRe), lit(0)))
        .cast("long").as("n_subwords"),
      length(col(textCol)).cast("long").as("n_chars"))
    .withColumn("chars_per_subword",
      col("n_chars").cast("double") / col("n_subwords"))

  /** BPE first-merge pair statistics: corpus-weighted counts of adjacent
    * character pairs inside pre-tokens — the aggregation a BPE tokenizer
    * trainer runs to pick its first merge. Uses the classic corpus-scale
    * trick: aggregate to DISTINCT pre-token types with their frequencies
    * FIRST (a 100 TB corpus has ~10⁸ word types, not 10¹³ occurrences),
    * then explode pairs only over the type table weighted by frequency.
    * pair_count = total corpus occurrences, n_word_types = distinct
    * pre-tokens containing the pair. Top-K is TakeOrderedAndProject
    * (per-partition heaps); the K-row rank window is driver-scale. */
  def bpePairStats(docs: DataFrame, textCol: String, topK: Int): DataFrame = {
    require(topK > 0, s"topK must be > 0: $topK")
    val types = docs
      .select(explode(regexp_extract_all(col(textCol), lit(BpeishRe), lit(0))).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("__freq"))
      .filter(length(col("w")) >= 2)
    val top = types
      .select(col("w"), col("__freq"), explode(expr(
        "transform(sequence(1, length(w) - 1), i -> substring(w, i, 2))")).as("pair"))
      .groupBy(col("pair"))
      // a pair occurring at two positions of one word counts both positions
      // ("aaa" adds 2×freq to "aa"), but the word itself only once
      .agg(sum(col("__freq")).as("pair_count"),
        countDistinct(col("w")).as("n_word_types"))
      .orderBy(col("pair_count").desc, col("pair"))
      .limit(topK)
    top.withColumn("rank",
      row_number().over(Window.orderBy(col("pair_count").desc, col("pair")))
        .cast("long"))
  }

  /** Iterative BPE merge training — the loop [[bpePairStats]] is one round
    * of: symbols start as characters of each pre-token TYPE (the corpus
    * aggregates to distinct types with frequencies first, so every round
    * is linear in the type table, never in raw occurrences); each round
    * counts adjacent symbol pairs weighted by type frequency, picks the
    * argmax (count desc, pair asc — deterministic), and merges that pair
    * in every type with a single left-to-right non-overlapping string
    * replace (identical single-pass semantics in Spark and the oracle;
    * remaining overlaps merge in later rounds). Emits the learned merge
    * table (merge_rank, p1, p2, pair_count) — the artifact a tokenizer
    * ships. Real trainings run ~50k merges over a type SAMPLE; each round
    * here is one explode + one hash agg + one broadcast of a 1-row argmax,
    * so rounds scale with the type table (~10⁸ rows at 100 TB), and the
    * whole loop is exact integer arithmetic — oracle-checkable end to end.
    */
  def bpeTrain(docs: DataFrame, textCol: String, nMerges: Int,
               driverThreshold: Int = 200000): DataFrame = {
    val (_, merges) = bpeLoop(docs, textCol, nMerges, driverThreshold)
    docs.sparkSession.createDataFrame(merges)
      .toDF("merge_rank", "p1", "p2", "pair_count")
  }

  /** The learned vocabulary after `nMerges` BPE rounds: every distinct
    * symbol left in the type table with its total corpus occurrence count —
    * the other artifact a tokenizer ships (the merge table says HOW to
    * tokenize; the vocabulary is the id space). Same exact-integer loop as
    * [[bpeTrain]], so the full 30-round training is oracle-checkable. */
  def bpeVocab(docs: DataFrame, textCol: String, nMerges: Int,
               driverThreshold: Int = 200000): DataFrame = {
    val (types, _) = bpeLoop(docs, textCol, nMerges, driverThreshold)
    types
      .select(explode(split(trim(col("sym")), " ")).as("symbol"), col("__freq"))
      .groupBy(col("symbol")).agg(sum(col("__freq")).as("n_occurrences"))
  }

  /** Shared BPE training loop over the distinct-TYPE table (the corpus
    * aggregates to types first — ~10⁸ rows at 100 TB, ~10⁴–10⁵ at test
    * SFs; the corpus itself is touched exactly once).
    *
    * Type tables at or under `driverThreshold` rows take a driver fast
    * path (the union-find discipline from Dedup.connectedComponents): the
    * merge loop is inherently serial — 30 rounds of argmax-then-rewrite —
    * and running 30 Spark jobs over a 60k-row frame times scheduling and
    * codegen, not work. The driver loop reproduces the distributed
    * semantics EXACTLY: argmax by (count desc, p1, p2) with UTF-8-byte
    * string order (Spark's binary UTF8String order, not Java's UTF-16
    * compareTo — they diverge on supplementary characters), and the same
    * left-to-right non-overlapping single-pass replace.
    *
    * Above the threshold, each round is ONE distributed job: the
    * pair-count argmax (hash agg + TakeOrderedAndProject); the winning
    * pair — scalar-only driver traffic, the CC loop's convergence-count
    * discipline — then rewrites the type table lazily via a literal
    * `replace` (lineage truncated every 8 rounds). Exhausting all pairs
    * before `nMerges` stops early on both paths (the previous crossJoin
    * form would have silently emptied the type table). */
  private def bpeLoop(docs: DataFrame, textCol: String, nMerges: Int,
                      driverThreshold: Int)
      : (DataFrame, Seq[(Long, String, String, Long)]) = {
    require(nMerges > 0, s"nMerges must be > 0: $nMerges")
    val spark = docs.sparkSession
    val wf = docs
      .select(explode(regexp_extract_all(col(textCol), lit(BpeishRe), lit(0))).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("__freq"))
    // one bounded probe: at most threshold+1 rows ever reach the driver
    val head = wf.limit(driverThreshold + 1).collect()
    if (head.length <= driverThreshold) {
      var types = head.map { r =>
        (" " + r.getString(0).split("").mkString(" ") + " ", r.getLong(1))
      }
      // Spark/DuckDB order strings by UTF-8 bytes; Java compareTo is UTF-16
      // code units — match the engines, not the JVM
      def u8Lt(a: String, b: String): Boolean =
        java.util.Arrays.compareUnsigned(
          a.getBytes(java.nio.charset.StandardCharsets.UTF_8),
          b.getBytes(java.nio.charset.StandardCharsets.UTF_8)) < 0
      val merges = scala.collection.mutable.ArrayBuffer[(Long, String, String, Long)]()
      var exhausted = false
      for (round <- 1 to nMerges if !exhausted) {
        val counts = scala.collection.mutable.HashMap[(String, String), Long]()
        types.foreach { case (sym, freq) =>
          val l = sym.trim.split(" ")
          var i = 0
          while (i < l.length - 1) {
            val k = (l(i), l(i + 1))
            counts.update(k, counts.getOrElse(k, 0L) + freq)
            i += 1
          }
        }
        if (counts.isEmpty) exhausted = true
        else {
          val ((p1, p2), cnt) = counts.reduceLeft { (a, b) =>
            val ((a1, a2), ac) = a; val ((b1, b2), bc) = b
            if (bc > ac) b
            else if (bc < ac) a
            else if (u8Lt(b1, a1)) b
            else if (u8Lt(a1, b1)) a
            else if (u8Lt(b2, a2)) b else a
          }
          merges += ((round.toLong, p1, p2, cnt))
          types = types.map { case (sym, f) =>
            (sym.replace(s" $p1 $p2 ", s" $p1$p2 "), f)
          }
        }
      }
      import spark.implicits._
      return (types.toSeq.toDF("sym", "__freq"), merges.toSeq)
    }
    var types = wf.select(
        concat(lit(" "), concat_ws(" ", split(col("w"), "")), lit(" ")).as("sym"),
        col("__freq"))
      .coalesce(4) // type table is small; don't pay 30 rounds of task fan-out
      .localCheckpoint()
    val merges = scala.collection.mutable.ArrayBuffer[(Long, String, String, Long)]()
    var exhausted = false
    for (round <- 1 to nMerges if !exhausted) {
      val top = types
        .select(col("__freq"), split(trim(col("sym")), " ").as("l"))
        // 1-symbol types have no pairs (and sequence(0,-1) DESCENDS — an
        // unguarded explode would index past the array under ANSI)
        .filter(size(col("l")) >= 2)
        .select(col("__freq"), explode(expr(
          "transform(sequence(0, size(l) - 2), i -> struct(l[i] AS p1, l[i+1] AS p2))"))
          .as("p"))
        .groupBy(col("p.p1").as("p1"), col("p.p2").as("p2"))
        .agg(sum(col("__freq")).as("pair_count"))
        .orderBy(col("pair_count").desc, col("p1"), col("p2"))
        .limit(1)
        .collect()
      if (top.isEmpty) exhausted = true
      else {
        val r = top.head
        val (p1, p2, cnt) = (r.getString(0), r.getString(1), r.getLong(2))
        merges += ((round.toLong, p1, p2, cnt))
        // lit(), not an expr string: subword symbols can contain quotes or
        // backslashes that SQL-literal parsing would mangle
        types = types.select(
          replace(col("sym"), lit(s" $p1 $p2 "), lit(s" $p1$p2 ")).as("sym"),
          col("__freq"))
        if (round % 8 == 0) types = types.localCheckpoint()
      }
    }
    (types, merges.toSeq)
  }

  /** ENCODE with a trained BPE merge table: the other half of the
    * tokenizer loop ([[bpeTrain]] learns the merges; this applies them to
    * a corpus — the job a 100 TB pre-training pipeline runs far more often
    * than training itself). Returns per-document token accounting:
    * `(idCol, n_pretokens, n_bpe_tokens)`; [[bpeTokenRows]] materializes
    * the token stream itself.
    *
    * Semantics: a pre-token is encoded by repeatedly merging the
    * LOWEST-RANK adjacent symbol pair present, leftmost-non-overlapping per
    * application — provably identical to replaying the training rewrites
    * in rank order (a merge learned at rank r only creates symbols no
    * earlier merge references: merge i's pair exists over the symbol
    * alphabet of time i, and rank-r concatenations are not in it; so no
    * earlier-rank pair can newly appear, and the priority loop and the
    * replay perform the same rewrites). Spec-pinned against [[bpeVocab]]'s
    * training-final symbol table.
    *
    * Scale, the type-table discipline end to end: the merge table is a
    * bounded shipped artifact (collected once, broadcast; `maxMerges`
    * guards the collect). Encoding runs once per DISTINCT pre-token type —
    * never per occurrence (~10⁸ types vs ~10¹³ occurrences at 100 TB) —
    * via one mapPartitions with a per-word priority loop (genuinely
    * iterative per string; no built-in expresses it). The occurrence
    * stream never shuffles whole: per-doc type counts hash-aggregate with
    * map-side combine, join the encoded type table on `w` (AQE broadcasts
    * it when it fits), and reduce to per-doc totals. */
  def bpeEncode(docs: DataFrame, idCol: String, textCol: String,
                merges: DataFrame, maxMerges: Int = 1 << 20): DataFrame = {
    val enc = encodedTypes(docs, textCol, merges, maxMerges)
      .select(col("w"), size(col("syms")).cast("long").as("__nsym"))
    val perDoc = docs
      .select(col(idCol),
        explode(regexp_extract_all(col(textCol), lit(BpeishRe), lit(0))).as("w"))
      .groupBy(col(idCol), col("w")).agg(count(lit(1)).as("__cnt"))
      .join(enc, Seq("w"))
      .groupBy(col(idCol))
      .agg(sum(col("__cnt")).as("__np"),
        sum(col("__cnt") * col("__nsym")).as("__nb"))
    // docs without a single pre-token still get a (0, 0) row
    docs.select(col(idCol)).join(perDoc, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("__np"), lit(0L)).as("n_pretokens"),
        coalesce(col("__nb"), lit(0L)).as("n_bpe_tokens"))
  }

  /** The materialized token stream: one row per BPE token with its global
    * position in the document — what actually feeds a trainer. Same
    * type-table discipline as [[bpeEncode]]; the per-occurrence fan-out
    * happens only here, where the output IS per-occurrence. */
  def bpeTokenRows(docs: DataFrame, idCol: String, textCol: String,
                   merges: DataFrame, maxMerges: Int = 1 << 20): DataFrame = {
    val enc = encodedTypes(docs, textCol, merges, maxMerges)
    docs
      .select(col(idCol), posexplode(
        regexp_extract_all(col(textCol), lit(BpeishRe), lit(0))).as(Seq("wpos", "w")))
      .join(enc, Seq("w"))
      .select(col(idCol), col("wpos"),
        posexplode(col("syms")).as(Seq("spos", "token")))
      .select(col(idCol), col("wpos").cast("long").as("pretoken_pos"),
        col("spos").cast("long").as("sym_pos"), col("token"))
  }

  /** Distinct pre-token types of the corpus with their BPE encodings:
    * `(w, syms array<string>)`. */
  private def encodedTypes(docs: DataFrame, textCol: String,
                           merges: DataFrame, maxMerges: Int): DataFrame = {
    val spark = docs.sparkSession
    val head = merges.orderBy(col("merge_rank"))
      .select(col("p1"), col("p2")).limit(maxMerges + 1).collect()
    require(head.length <= maxMerges,
      s"merge table exceeds maxMerges=$maxMerges — raise the bound explicitly")
    val rank: Map[(String, String), Int] =
      head.iterator.zipWithIndex
        .map { case (r, i) => (r.getString(0), r.getString(1)) -> i }.toMap
    val bc = spark.sparkContext.broadcast(rank)
    import spark.implicits._
    val types = docs
      .select(explode(regexp_extract_all(col(textCol), lit(BpeishRe), lit(0))).as("w"))
      .distinct()
    types.as[String]
      .mapPartitions { it =>
        val r = bc.value
        it.map(w => (w, encodeWord(w, r)))
      }
      .toDF("w", "syms")
  }

  /** Priority-loop BPE encoding of one pre-token (see [[bpeEncode]] for the
    * replay-equivalence argument). Symbols start as the characters the
    * training loop starts from (`String.split("")` — code-point singletons,
    * matching both bpeLoop paths and the oracle's `substr` walk). */
  private def encodeWord(w: String,
                         rank: Map[(String, String), Int]): Array[String] = {
    var syms = w.split("").filter(_.nonEmpty)
    var done = syms.length < 2
    while (!done) {
      var best = Int.MaxValue
      var i = 0
      while (i < syms.length - 1) {
        val r = rank.getOrElse((syms(i), syms(i + 1)), Int.MaxValue)
        if (r < best) best = r
        i += 1
      }
      if (best == Int.MaxValue) done = true
      else {
        val out = Array.newBuilder[String]
        var j = 0
        while (j < syms.length) {
          if (j < syms.length - 1 &&
              rank.getOrElse((syms(j), syms(j + 1)), -1) == best) {
            out += syms(j) + syms(j + 1); j += 2 // leftmost, non-overlapping
          } else { out += syms(j); j += 1 }
        }
        syms = out.result()
        done = syms.length < 2
      }
    }
    syms
  }

  /** Corpus-level boilerplate detection: shingles appearing in at least
    * `minDocFrac` of all documents (site chrome, nav text, license headers
    * — content no single document owns) and, per document, the fraction of
    * its distinct shingles that are such boilerplate — the standard
    * "mostly-template page" removal signal in web-corpus curation.
    *
    * Scale: one df-aggregation over the (id, shingle) frame (shuffle on
    * shingle), the df-filtered boilerplate set is small by construction
    * (high-df survivors only; AQE broadcasts the membership join when it
    * fits), one per-doc aggregation. The shingle frame feeds three
    * consumers on two keys, so it is persisted. */
  def boilerplate(docs: DataFrame, idCol: String, textCol: String,
                  minDocFrac: Double, n: Int = 3): DataFrame = {
    require(minDocFrac > 0 && minDocFrac <= 1, s"minDocFrac in (0,1]: $minDocFrac")
    val sh = Dedup.shingleRows(docs, idCol, textCol, n)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val nDocs = docs.agg(count(lit(1)).as("__nd"))
    val bp = sh.groupBy(col("shingle")).agg(count(lit(1)).as("__df"))
      .crossJoin(broadcast(nDocs))
      .filter(col("__df").cast("double") >= lit(minDocFrac) * col("__nd"))
      .select(col("shingle"))
    val nb = sh.join(bp, Seq("shingle"), "left_semi")
      .groupBy(col(idCol)).agg(count(lit(1)).as("__nb"))
    sh.groupBy(col(idCol)).agg(count(lit(1)).as("n_shingles"))
      .join(nb, Seq(idCol), "left")
      .select(col(idCol), col("n_shingles"),
        coalesce(col("__nb"), lit(0L)).as("n_boiler"),
        (coalesce(col("__nb"), lit(0L)).cast("double") / col("n_shingles"))
          .as("boiler_ratio"))
  }

  /** Boilerplate REMOVAL: [[boilerplate]] tells you how template-heavy a
    * document is; this emits the cleaned text. A token is removed when any
    * n-shingle occurrence covering it is corpus boilerplate (document
    * frequency ≥ `minDocFrac` of all docs) — span semantics, not
    * token-frequency semantics, so a common word inside original prose
    * survives while the same word inside a repeated template phrase is cut.
    *
    * Shape: positional token explode → shingle-occurrence rows with start
    * positions → semi-join the (small, high-df) boilerplate set → covered
    * positions via a sequence explode + distinct → anti-join tokens →
    * re-assemble with one per-doc sort-free aggregate (array_sort over
    * collected (pos, tok) structs — each doc's tokens collapse map-side).
    * Docs losing every token still emit (clean_text = ''). */
  def boilerplateScrub(docs: DataFrame, idCol: String, textCol: String,
                       minDocFrac: Double, n: Int = 3): DataFrame = {
    require(minDocFrac > 0 && minDocFrac <= 1, s"minDocFrac in (0,1]: $minDocFrac")
    val toks = docs
      .select(col(idCol), posexplode(Dedup.tokens(col(textCol)))
        .as(Seq("pos", "tok")))
    val idxs = (0 until n).map(j => s"__w[i + $j]").mkString(", ")
    // the occurrence frame feeds both the df-aggregation and the covered-
    // position join — persist it rather than re-exploding the corpus
    val shOcc = docs
      .select(col(idCol), Dedup.tokens(col(textCol)).as("__w"))
      .filter(size(col("__w")) >= n)
      .select(col(idCol),
        posexplode(expr(s"transform(sequence(0, size(__w) - $n), i -> concat_ws(' ', $idxs))"))
          .as(Seq("pos", "shingle")))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val nDocs = docs.agg(count(lit(1)).as("__nd"))
    val bp = shOcc.select(col(idCol), col("shingle")).distinct()
      .groupBy(col("shingle")).agg(count(lit(1)).as("__df"))
      .crossJoin(broadcast(nDocs))
      .filter(col("__df").cast("double") >= lit(minDocFrac) * col("__nd"))
      .select(col("shingle"))
    val covered = shOcc.join(bp, Seq("shingle"), "left_semi")
      .select(col(idCol), explode(expr(s"sequence(pos, pos + ${n - 1})")).as("pos"))
      .distinct()
    val kept = toks.join(covered, Seq(idCol, "pos"), "left_anti")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_kept"),
        concat_ws(" ", expr("transform(array_sort(collect_list(struct(pos, tok))), x -> x.tok)"))
          .as("__clean"))
    docs.select(col(idCol), size(Dedup.tokens(col(textCol))).cast("long").as("n_tokens"))
      .join(kept, Seq(idCol), "left")
      .select(col(idCol), col("n_tokens"),
        coalesce(col("n_kept"), lit(0L)).as("n_kept"),
        (col("n_tokens") - coalesce(col("n_kept"), lit(0L))).as("n_removed"),
        coalesce(col("__clean"), lit("")).as("clean_text"))
  }

  /** Batch novelty vs an existing corpus: for each incoming document, the
    * fraction of its distinct n-shingles the corpus has never seen — the
    * "is this crawl adding information or re-serving what we have" number
    * that decides whether a source is worth ingesting. Inverse of
    * [[contamination]]'s overlap: novelty 1.0 = all new content.
    * Corpus-side set reduces to distinct shingles (its widest shuffle);
    * the membership probe is a broadcast/AQE left join over the batch's
    * distinct shingle frame; one per-doc aggregate. */
  def novelty(batch: DataFrame, corpus: DataFrame, idCol: String,
              textCol: String, n: Int = 3): DataFrame = {
    val batchSh = Dedup.shingleRows(batch, idCol, textCol, n)
    val corpusSh = Dedup.shingleRows(corpus, idCol, textCol, n)
      .select(col("shingle")).distinct()
    batchSh.join(corpusSh.withColumn("__seen", lit(1)), Seq("shingle"), "left")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_shingles"),
        sum(when(col("__seen").isNull, 1L).otherwise(0L)).as("n_new"))
      .select(col(idCol), col("n_shingles"), col("n_new"),
        (col("n_new").cast("double") / col("n_shingles")).as("novelty_ratio"))
  }

  /** Corpus unigram language model with add-one (Laplace) smoothing:
    * (term, cf, logp_micros) where logp_micros = round(ln((cf+1)/(T+V))·10⁶)
    * as an exact integer — T = total token occurrences, V = vocabulary size.
    * Fixed-pointing the log here is what makes [[lmScore]] oracle-exact:
    * per-document totals become integer sums (associative, partitioning-
    * independent), instead of order-dependent double additions. The one
    * libm call (ln) is rounded to 0 decimals AFTER the 10⁶ scale, so a
    * 1-ulp engine difference cannot survive into the stored weight.
    * One explode + one hash aggregate; T and V ride along as a broadcast
    * 1-row frame. */
  def unigramLm(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val cf = termRows(docs, idCol, textCol, 1)
      .groupBy(col("term")).agg(count(lit(1)).as("cf"))
    val tot = cf.agg(sum(col("cf")).as("__t"), count(lit(1)).as("__v"))
    cf.crossJoin(broadcast(tot))
      .select(col("term"), col("cf"),
        round(log((col("cf") + 1).cast("double") / (col("__t") + col("__v"))) * 1000000, 0)
          .cast("long").as("logp_micros"))
  }

  /** Per-document quality score under a unigram LM: the average token
    * log-probability (natural log), high for statistically typical text and
    * low for gibberish / rare-token soup — the classic cheap stand-in for
    * model-based perplexity filtering in training-data curation.
    *
    * Trains on `trainDocs` (the corpus itself by default — self-scoring;
    * pass a clean reference corpus to score raw crawl against it).
    * Out-of-vocabulary terms get the unseen-mass probability 1/(T+V).
    * Outputs: n_tokens, n_oov, logprob_micros (exact integer), avg_logprob
    * (integer-division double → bit-stable cross-engine).
    *
    * Scale: two hash aggregations over (id, term) rows + one join against
    * the V-row model (AQE broadcasts it when small); no double is ever
    * summed — see [[unigramLm]]. */
  def lmScore(docs: DataFrame, idCol: String, textCol: String,
              trainDocs: Option[DataFrame] = None): DataFrame = {
    val lm = unigramLm(trainDocs.getOrElse(docs), idCol, textCol)
    // unseen-term weight ln(1/(T+V))·10⁶, from a 1-row aggregate of the
    // V-row model frame (not a rescan of the training corpus)
    val tot = lm.agg(sum(col("cf")).as("__t"), count(lit(1)).as("__v"))
    val oovW = tot.select(
      round(log(lit(1.0) / (col("__t") + col("__v"))) * 1000000, 0)
        .cast("long").as("__oov"))
    val dt = termRows(docs, idCol, textCol, 1)
      .groupBy(col(idCol), col("term")).agg(count(lit(1)).as("tf"))
    dt.join(lm.select(col("term"), col("logp_micros")), Seq("term"), "left")
      .crossJoin(broadcast(oovW))
      .select(col(idCol), col("tf"),
        coalesce(col("logp_micros"), col("__oov")).as("__l"),
        col("logp_micros").isNull.cast("long").as("__isoov"))
      .groupBy(col(idCol))
      .agg(sum(col("tf")).as("n_tokens"),
        sum(col("tf") * col("__isoov")).as("n_oov"),
        sum(col("tf") * col("__l")).as("logprob_micros"))
      .withColumn("avg_logprob",
        col("logprob_micros").cast("double") / (col("n_tokens") * 1000000L))
  }

  /** Corpus bigram language model, add-one smoothed per context:
    * p(w2|w1) = (c(w1 w2)+1)/(c(w1·)+V), stored as (term "w1 w2", cf2,
    * cf1, logp_micros) with the same integer-micros fixed-pointing as
    * [[unigramLm]] — no double ever crosses a partition boundary. Context
    * counts derive from the bigram frame itself (c(w1·) = Σ cf2 over w1),
    * so the model is one explode + two hash aggregates; V (unigram vocab)
    * rides along as a broadcast 1-row frame. */
  def bigramLm(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val bg = termRows(docs, idCol, textCol, 2)
      .groupBy(col("term")).agg(count(lit(1)).as("cf2"))
      .withColumn("w1", substring_index(col("term"), " ", 1))
    val ctx = bg.groupBy(col("w1")).agg(sum(col("cf2")).as("cf1"))
    val v = termRows(docs, idCol, textCol, 1)
      .agg(countDistinct(col("term")).as("__v"))
    bg.join(ctx, "w1")
      .crossJoin(broadcast(v))
      .select(col("term"), col("w1"), col("cf2"), col("cf1"),
        round(log((col("cf2") + 1).cast("double") / (col("cf1") + col("__v"))) * 1000000, 0)
          .cast("long").as("logp_micros"))
  }

  /** Per-document quality score under a bigram LM — the sharper version of
    * [[lmScore]] (a bigram model sees local word ORDER, so shuffled-word
    * salad scores low even when its unigrams are common). Unseen bigrams
    * back off to the context's unseen mass 1/(c(w1·)+V); unseen contexts
    * to 1/V. Outputs n_bigrams, n_unseen, logprob_micros (exact integer),
    * avg_logprob (integer-division double). Scale: per-doc bigram tf agg,
    * one join against the model (AQE-broadcast when small), one against
    * the context frame, one final per-doc aggregation — every sum is over
    * integers, so the result is partitioning-independent. */
  def bigramScore(docs: DataFrame, idCol: String, textCol: String,
                  trainDocs: Option[DataFrame] = None): DataFrame = {
    val lm = bigramLm(trainDocs.getOrElse(docs), idCol, textCol)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val ctx = lm.select(col("w1"), col("cf1")).distinct()
    val v = termRows(trainDocs.getOrElse(docs), idCol, textCol, 1)
      .agg(countDistinct(col("term")).as("__v"))
    val dt = termRows(docs, idCol, textCol, 2)
      .groupBy(col(idCol), col("term")).agg(count(lit(1)).as("tf"))
      .withColumn("w1", substring_index(col("term"), " ", 1))
    dt.join(lm.select(col("term"), col("logp_micros")), Seq("term"), "left")
      .join(ctx, Seq("w1"), "left")
      .crossJoin(broadcast(v))
      .select(col(idCol), col("tf"),
        coalesce(col("logp_micros"),
          round(log(lit(1.0) / (coalesce(col("cf1"), lit(0L)) + col("__v"))) * 1000000, 0)
            .cast("long")).as("__l"),
        col("logp_micros").isNull.cast("long").as("__unseen"))
      .groupBy(col(idCol))
      .agg(sum(col("tf")).as("n_bigrams"),
        sum(col("tf") * col("__unseen")).as("n_unseen"),
        sum(col("tf") * col("__l")).as("logprob_micros"))
      .withColumn("avg_logprob",
        col("logprob_micros").cast("double") / (col("n_bigrams") * 1000000L))
  }

  /** Per-document character-distribution Shannon entropy (nats) — the
    * classic cheap gibberish detector: natural text sits near ~3 nats,
    * while single-char runs, base64 blobs and binary-ish soup land far
    * below/above the band, so a low-entropy flag is a standard corpus
    * quality gate (reference's quality surface stops at null/uniqueness
    * checks, `bronze_validation.py:87-118` — this extends it to content).
    *
    * Exactness: entropy = ln(n) − Σ c·ln(c)/n over per-char counts c.
    * Each ln is fixed-pointed to integer micros BEFORE any cross-row sum
    * (the [[unigramLm]] discipline), so the aggregation is associative
    * integer math — partitioning- and engine-independent — and only the
    * final division is a double, rounded to 6 decimals. One explode +
    * two hash aggregations; the (id, char) shuffle is bounded by
    * |alphabet|·docs after map-side combine, far below the raw char count. */
  def charEntropy(docs: DataFrame, idCol: String, textCol: String,
                  minEntropy: Double): DataFrame = {
    val lnMicros: Column => Column =
      c => round(log(c.cast("double")) * 1000000, 0).cast("long")
    docs.select(col(idCol), explode(split(col(textCol), "")).as("__ch"))
      .groupBy(col(idCol), col("__ch")).agg(count(lit(1)).as("__c"))
      .groupBy(col(idCol))
      .agg(sum(col("__c")).as("n_chars"),
        count(lit(1)).as("n_distinct_chars"),
        sum(col("__c") * lnMicros(col("__c"))).as("__s"))
      .select(col(idCol), col("n_chars"), col("n_distinct_chars"),
        round((lnMicros(col("n_chars")) * col("n_chars") - col("__s")).cast("double")
          / (col("n_chars") * 1000000L), 6).as("entropy"))
      .withColumn("low_entropy", col("entropy") < minEntropy)
  }

  /** Zipf-law fit of the vocabulary: least-squares slope of ln(freq) vs
    * ln(rank) over the top-K terms — the corpus-health number (natural
    * language ≈ −1; boilerplate-heavy or deduplicated-to-death corpora
    * drift off it) that curation dashboards track per source/snapshot.
    *
    * Exactness: rank is deterministic (freq desc, term asc); x = ln(rank)
    * and y = ln(freq) are fixed-pointed to integer 10⁻⁴ units, so the
    * regression sums (Σx, Σy, Σxy, Σx²) are exact integers — the slope
    * (n·Σxy − Σx·Σy)/(n·Σx² − Σx²̄) is one double division, rounded to 6.
    * 10⁻⁴ units keep n·Σxy < 2⁶³ for any topK ≤ 10⁵ at any corpus size
    * (x ≤ ln(10⁵)·10⁴ ≈ 1.2e5, y ≤ ln(2⁶³)·10⁴ < 4.4e5).
    *
    * Scale: term-frequency hash agg, top-K via TakeOrderedAndProject
    * (per-partition heaps — never a global sort), then a K-row window and
    * one scalar aggregation. */
  def zipfSlope(docs: DataFrame, idCol: String, textCol: String,
                topK: Int): DataFrame = {
    require(topK >= 2, s"topK must be >= 2: $topK")
    val fixp: Column => Column =
      c => round(log(c.cast("double")) * 10000, 0).cast("long")
    val top = termRows(docs, idCol, textCol, 1)
      .groupBy(col("term")).agg(count(lit(1)).as("cf"))
      .orderBy(col("cf").desc, col("term")).limit(topK)
    top
      .withColumn("__rank",
        row_number().over(Window.orderBy(col("cf").desc, col("term"))).cast("long"))
      .select(fixp(col("__rank")).as("__x"), fixp(col("cf")).as("__y"),
        col("cf"))
      .agg(count(lit(1)).as("n_terms"), max(col("cf")).as("top_cf"),
        sum(col("__x")).as("__sx"), sum(col("__y")).as("__sy"),
        sum(col("__x") * col("__y")).as("__sxy"),
        sum(col("__x") * col("__x")).as("__sxx"))
      .select(col("n_terms"), col("top_cf"),
        round((col("n_terms") * col("__sxy") - col("__sx") * col("__sy")).cast("double")
          / (col("n_terms") * col("__sxx") - col("__sx") * col("__sx")), 6)
          .as("zipf_slope"))
  }

  /** Per-group [[zipfSlope]] — the corpus-health dashboard rollup: one
    * Zipf fit per source/domain/language over that group's own top-K
    * terms, flagging sources whose vocabulary distribution drifts from
    * the natural-language band (template farms, log dumps, deduped-flat
    * corpora) in a single number per source.
    *
    * Scale: term frequencies hash-aggregate on (group, term); the
    * per-group top-K is a rank-1..K filter over a window partitioned by
    * group — Spark plans it as WindowGroupLimit (per-task top-K heaps
    * before the shuffle), never a full per-group sort; the regression
    * is one integer aggregation per group (same fixed-point exactness
    * argument as [[zipfSlope]]). */
  def zipfSlopeByGroup(docs: DataFrame, groupCol: String, idCol: String,
                       textCol: String, topK: Int): DataFrame = {
    require(topK >= 2, s"topK must be >= 2: $topK")
    val fixp: Column => Column =
      c => round(log(c.cast("double")) * 10000, 0).cast("long")
    val tf = docs
      .select(col(groupCol), explode(Dedup.tokens(col(textCol))).as("term"))
      .groupBy(col(groupCol), col("term")).agg(count(lit(1)).as("cf"))
    val w = Window.partitionBy(col(groupCol))
      .orderBy(col("cf").desc, col("term"))
    tf.withColumn("__rank", row_number().over(w))
      .filter(col("__rank") <= topK)
      .select(col(groupCol), fixp(col("__rank").cast("long")).as("__x"),
        fixp(col("cf")).as("__y"), col("cf"))
      .groupBy(col(groupCol))
      .agg(count(lit(1)).as("n_terms"), max(col("cf")).as("top_cf"),
        sum(col("__x")).as("__sx"), sum(col("__y")).as("__sy"),
        sum(col("__x") * col("__y")).as("__sxy"),
        sum(col("__x") * col("__x")).as("__sxx"))
      .select(col(groupCol), col("n_terms"), col("top_cf"),
        round((col("n_terms") * col("__sxy") - col("__sx") * col("__sy")).cast("double")
          / (col("n_terms") * col("__sxx") - col("__sx") * col("__sx")), 6)
          .as("zipf_slope"))
  }

  /** Composite per-document profile: stats + language guess + fingerprint.
    * Two scans of the text column (stats+lang in one, shingle fingerprint in
    * the other) joined on id — both sides shuffle once on id. */
  def profile(docs: DataFrame, idCol: String, textCol: String,
              stopwords: Seq[String]): DataFrame = {
    val withLang = docs.select(col(idCol),
      langGuess(col(textCol), Dedup.tokens(col(textCol))).as("lang_guess"))
    tokenStats(docs, idCol, textCol, stopwords)
      .join(withLang, idCol)
      .join(fingerprints(docs, idCol, textCol), idCol)
  }

  /** EXACT global top-k most frequent items with sketch-bounded shuffle —
    * the scale answer to `groupBy(item).count().orderBy().limit(k)`, whose
    * pass over 100 TB of tokens shuffles every distinct item (billions of
    * keys, most seen once).
    *
    * Two passes over `rows`:
    *   1. One `graft_mg` Misra–Gries aggregate (capacity-bounded buffer,
    *      map-side partials; see [[graft.functions.MisraGries]]) plus a
    *      `count(*)` in the same job → ≤ `capacity` candidate items and the
    *      total item count n. The only driver materialization is that
    *      bounded candidate array (≤ capacity short strings — same budgeted
    *      pattern as the connected-components probe).
    *   2. Exact counts for candidates only: broadcast semi-probe of the
    *      candidate set, hash aggregate over ≤ capacity keys, top-k.
    *
    * Exactness proof carried at runtime: any NON-candidate's true frequency
    * is ≤ n/(capacity+1) (the MG guarantee). If the k-th candidate's EXACT
    * count strictly exceeds that bound, no non-candidate can displace it
    * (strict inequality also kills boundary ties), so the top-k is provably
    * the true top-k. When the check fails — adversarially flat data or an
    * undersized capacity — the operator falls back to the exact global
    * aggregate and logs it: the result is ALWAYS exact; the sketch only
    * decides how much is shuffled.
    *
    * Output: (itemCol, cnt) ordered by cnt desc, item asc.
    */
  def heavyHitters(rows: DataFrame, itemCol: String, k: Int,
                   capacity: Int = 4096): DataFrame = {
    require(k >= 1, s"k must be >= 1: $k")
    require(capacity > k, s"capacity must exceed k: capacity=$capacity k=$k")
    val spark = rows.sparkSession
    graft.functions.GraftFunctions.register(spark)
    // NULL items are no-ops in the sketch; the exact paths must agree.
    val exactTopK = (src: DataFrame) =>
      src.where(col(itemCol).isNotNull)
        .groupBy(col(itemCol)).agg(count(lit(1)).as("cnt"))
        .orderBy(col("cnt").desc, col(itemCol))
        .limit(k)
    val sk = rows
      .agg(expr(s"graft_mg($itemCol, $capacity)").as("__cand"),
        count(col(itemCol)).as("__n"))
      .head()
    val cands = sk.getSeq[String](0)
    val n = sk.getLong(1)
    if (cands.isEmpty) return exactTopK(rows)
    import spark.implicits._
    val candDf = cands.toDF(itemCol)
    val top = exactTopK(rows.join(broadcast(candDf), itemCol, "left_semi"))
    val topRows = top.collect() // ≤ k rows
    // Strict: kth·(capacity+1) > n ⟺ kth > n/(capacity+1). Long math is
    // safe to n ≈ 2^63/(capacity+1) ≈ 2.2e15 items at the default capacity.
    // (A small candidate set does NOT mean the sketch saw everything — a
    // decrement wave shrinks the map below capacity AFTER dropping items —
    // so fewer-than-k candidates also routes through the exact fallback.)
    val guaranteed = topRows.length >= k &&
      topRows.last.getLong(1) * (capacity + 1L) > n
    if (guaranteed) top
    else exactTopK(rows) // exact on any data; only the shuffle got wider
  }

  /** Per-group corpus drift: KL(P_group ‖ P_corpus) over the corpus
    * unigram vocabulary, add-one smoothed on both sides —
    *   p_g(t) = (gf+1)/(T_g+V),  q(t) = (cf+1)/(T+V),
    *   KL = Σ_{t∈V} p_g(t)·(ln p_g(t) − ln q(t)).
    * The distribution-shift observable for a training mix: a source (or
    * an ingest day) whose unigram distribution drifts from the corpus
    * shows up as a KL jump long before downstream eval metrics move —
    * the text-side analogue of VectorIndex.cellOccupancy.
    *
    * Scale + determinism design: the Σ over the full vocabulary is split
    * into present terms (gf > 0 — one per-(group,term) row, already
    * materialized by the count aggregation) and ABSENT terms, whose
    * p_g is the constant 1/(T_g+V): their Σ(ln p0 − ln q(t)) collapses to
    * nAbsent·ln p0 − (Σ_V ln q − Σ_present ln q) using one corpus-wide
    * Σ ln q — so the operator is O(corpus terms + per-group present
    * terms), never V×G. All ln's are rounded once to integer micros and
    * every cross-partition sum is BIGINT (lnScore discipline), the two
    * closed-form absent/present contributions are each rounded once to
    * integer picos — bit-identical across engines and partitionings.
    *
    * Output: (group, n_tokens, n_terms, kl_picos, kl) per group.
    */
  def distributionDrift(docs: DataFrame, groupCol: String,
                        textCol: String): DataFrame = {
    val rows = docs.select(col(groupCol).as("grp"),
        explode(Dedup.tokens(col(textCol))).as("term"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val cf = rows.groupBy(col("term")).agg(count(lit(1)).as("__cf"))
    // corpus constants + Σ_V ln q (micros) in one pass over the vocab;
    // ln q needs T and V, so fold the totals in via a broadcast 1-row frame
    val tot = cf.agg(sum("__cf").cast("long").as("__t"),
      count(lit(1)).cast("long").as("__v"))
    val lnq = cf.crossJoin(broadcast(tot))
      .select(col("term"), col("__cf"), col("__t"), col("__v"),
        round(log((col("__cf") + lit(1.0)) / (col("__t") + col("__v")))
          * lit(1e6), 0).cast("long").as("__lnq"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val lnqTot = lnq.agg(sum("__lnq").as("__lnq_all"),
      first(col("__t")).as("__t"), first(col("__v")).as("__v"))
    val gf = rows.groupBy(col("grp"), col("term")).agg(count(lit(1)).as("__gf"))
    val gTot = gf.groupBy(col("grp")).agg(
      sum("__gf").cast("long").as("__tg"),
      count(lit(1)).cast("long").as("__ng"))
    // present terms: one rounded pico contribution per (group, term)
    val present = gf
      .join(lnq.select(col("term"), col("__lnq")), "term")
      .join(broadcast(gTot), "grp")
      .crossJoin(broadcast(tot))
      .select(col("grp"),
        round(((col("__gf") + lit(1.0)) / (col("__tg") + col("__v"))) *
          (round(log((col("__gf") + lit(1.0)) / (col("__tg") + col("__v")))
            * lit(1e6), 0) - col("__lnq")) * lit(1e6), 0)
          .cast("long").as("__picos"),
        col("__lnq"))
    val presentAgg = present.groupBy(col("grp")).agg(
      sum("__picos").as("__present_picos"),
      sum("__lnq").as("__lnq_present"))
    // absent terms: closed form on corpus-wide integers, rounded once
    presentAgg
      .join(broadcast(gTot), "grp")
      .crossJoin(broadcast(lnqTot))
      .select(col("grp").as(groupCol),
        col("__tg").as("n_tokens"), col("__ng").as("n_terms"),
        (col("__present_picos") +
          round((lit(1.0) / (col("__tg") + col("__v"))) *
            ((col("__v") - col("__ng")) *
              round(log(lit(1.0) / (col("__tg") + col("__v"))) * lit(1e6), 0)
              - (col("__lnq_all") - col("__lnq_present"))) * lit(1e6), 0)
            .cast("long"))
          .as("kl_picos"))
      .withColumn("kl", col("kl_picos") / lit(1e12))
  }

  /** Intra-document repetition statistics — the Gopher/RefinedWeb
    * repetition quality filters, token-based: machine-generated and
    * boilerplate-stuffed documents betray themselves by repeating
    * themselves, BEFORE any cross-document comparison (this is the
    * per-doc complement of the cross-doc span dedup in
    * [[Dedup.duplicateSpans]]).
    *
    * Per document:
    *   - `n_tokens`, `n_distinct_tokens`
    *   - `dup_token_ratio`  = 1 − distinct/total tokens
    *   - `dup_ngram_ratio`  = 1 − distinct/total n-gram occurrences
    *     (0 when the doc is shorter than n tokens)
    *   - `top_ngram_ratio`  = the most frequent n-gram's share of all
    *     n-gram occurrences, max(count)/total — bounded (0,1], and the
    *     count alone, so no tiebreak is ever needed and no per-doc
    *     window exists in the plan
    * Ratios are rounded to 6 decimals (the repo-wide double-stability
    * contract for oracle compare).
    *
    * Scale design: two hash aggregations over the exploded term frames
    * (per-(doc,term) then per-doc), both map-side partial; the top
    * n-gram is a max(struct(cnt, term)) aggregate, NOT a per-doc window
    * — nothing in the plan materializes a per-document sort, and no
    * frame is wider than the doc's own distinct terms. */
  def repetitionStats(docs: DataFrame, idCol: String, textCol: String,
                      n: Int = 2): DataFrame = {
    require(n >= 2, s"n-gram order must be >= 2, got $n")
    val uni = termRows(docs, idCol, textCol, 1)
      .groupBy(col(idCol)).agg(
        count(lit(1)).as("n_tokens"),
        countDistinct(col("term")).as("n_distinct_tokens"))
    val ng = termRows(docs, idCol, textCol, n)
      .groupBy(col(idCol), col("term")).agg(count(lit(1)).as("__c"))
      .groupBy(col(idCol)).agg(
        sum("__c").as("__g_total"),
        count(lit(1)).as("__g_distinct"),
        max(col("__c")).as("__c_top"))
    uni.join(ng, Seq(idCol), "left")
      .select(col(idCol), col("n_tokens"), col("n_distinct_tokens"),
        round(lit(1.0) - col("n_distinct_tokens") / col("n_tokens"), 6)
          .as("dup_token_ratio"),
        coalesce(
          round(lit(1.0) - col("__g_distinct") / col("__g_total"), 6),
          lit(0.0)).as("dup_ngram_ratio"),
        coalesce(
          round(col("__c_top") / col("__g_total"), 6),
          lit(0.0)).as("top_ngram_ratio"))
  }
}
