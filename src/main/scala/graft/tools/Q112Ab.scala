package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.{Dedup, Retrieval, TextAnalysis}
import graft.sources.Tables

/** Dev-only A/B for the q112 at-scale adjudication (VERDICT r11 #2): the
  * round-10 bm25TopK rewrite (inline dl, persist only the restricted
  * postings) against the r8-era shape (persist the corpus-sized tf frame,
  * separate doclen aggregation + join), same session, same query batch,
  * cache cleared between reps. Prints min-of-reps for both so the sf10
  * drift can be attributed to the rewrite or exonerated as measurement.
  *
  *   SPARK_GRAFT_SF_DIR=/dev/shm/sf10 runMain graft.tools.Q112Ab
  */
object Q112Ab {
  private def materialize(df: DataFrame): Unit =
    df.select(xxhash64(df.columns.map(col): _*).as("__h"))
      .agg(expr("bit_xor(__h)")).head()

  /** bm25TopK exactly as of the r8 sweep (git cd00f4b): corpus-sized tf
    * persist, doclen derived from it, doclen joined AFTER restriction. */
  private def bm25TopKr8(docs: DataFrame, idCol: String, textCol: String,
                         queries: DataFrame, k: Int): DataFrame = {
    val tf = TextAnalysis.termRows(docs, idCol, textCol, 1)
      .groupBy(col(idCol), col("term")).agg(count(lit(1)).as("__tf"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val doclen = tf.groupBy(col(idCol)).agg(sum("__tf").as("__dl"))
    val consts = doclen.agg(
      count(lit(1)).cast("long").as("__n_docs"),
      sum("__dl").cast("long").as("__tot_len"))
    val qTerms = queries.select(col("query_id"),
        explode(Dedup.tokens(col("qtext"))).as("term"))
      .distinct()
    val restricted = tf
      .join(broadcast(qTerms.select(col("term")).distinct()), Seq("term"), "left_semi")
    val qDf = restricted.groupBy(col("term")).agg(count(lit(1)).as("__df"))
    Retrieval.bm25Rank(restricted
      .join(broadcast(qDf), "term")
      .join(doclen, idCol)
      .crossJoin(broadcast(consts))
      .withColumnRenamed(idCol, "doc_id"), qTerms, k, 1.2, 0.75)
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val reps = sys.env.getOrElse("SPARK_GRAFT_REPS", "2").toInt
    val builder = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.files.maxPartitionBytes", "4m")
      .config("spark.ui.enabled", "false")
    graft.Bench.scratchDir().foreach(builder.config("spark.local.dir", _))
    sys.env.get("SPARK_GRAFT_CONF")
      .foreach(graft.Bench.applyConfOverrides(builder, _))
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = Tables.documents(spark, sfDir)
    val queries = docs.filter(col("doc_id") % 101 === 0 && col("doc_id") < 50500)
      .select(col("doc_id").as("query_id"),
        array_join(slice(Dedup.tokens(col("text")), 1, 4), " ").as("qtext"))
    // per-variant stage table: top stages by wall, with cpu — shows WHERE
    // a variant's wall lives (fan-out partial agg vs final agg vs upstream)
    val stages = new java.util.concurrent.ConcurrentLinkedQueue[(Int, Int, Double, Double)]()
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onStageCompleted(
          e: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
        val si = e.stageInfo
        val wall = (for {s <- si.submissionTime; c <- si.completionTime}
          yield (c - s) / 1e3).getOrElse(-1.0)
        stages.add((si.stageId, si.numTasks, wall, si.taskMetrics.executorRunTime / 1e3))
      }
    })
    def time(tag: String)(f: => DataFrame): Unit = {
      val times = (1 to reps).map { _ =>
        spark.catalog.clearCache()
        val t0 = System.nanoTime()
        stages.clear()
        materialize(f)
        (System.nanoTime() - t0) / 1e9
      }
      println(f"[q112ab] $tag%-10s min=${times.min}%7.2f  " +
        s"runs=${times.map(t => f"$t%.2f").mkString(",")}")
      Thread.sleep(300)
      import scala.jdk.CollectionConverters._
      stages.asScala.toSeq.sortBy(-_._3).take(5).foreach { case (id, n, w, c) =>
        println(f"[q112ab]   stage=$id%4d tasks=$n%3d wall=$w%7.2f cpu=$c%8.2f")
      }
    }
    val wanted: Set[String] =
      if (args.isEmpty) Set("r8-shape", "current", "curr+dsort", "smj-feed", "r8-noper", "counts")
      else args.toSet
    def want(s: String) = wanted(s)
    // fan-out volume: rows entering the per-query aggregation, and the
    // distinct (query, doc) groups it produces — the two numbers that
    // decide whether 50 s is even achievable for these semantics
    val qTerms = queries.select(col("query_id"),
      explode(Dedup.tokens(col("qtext"))).as("term")).distinct()
    val postings = docs.select(col("doc_id"),
        explode(Dedup.tokens(col("text"))).as("term"))
      .groupBy(col("doc_id"), col("term")).agg(count(lit(1)).as("__tf"))
      .join(broadcast(qTerms.select(col("term")).distinct()), Seq("term"), "left_semi")
    val fanned = postings.join(broadcast(qTerms), "term")
    if (want("counts"))
    println(s"[q112ab] queries=${queries.count()} " +
      s"qterms=${qTerms.count()} matched_postings=${postings.count()} " +
      s"fanout_rows=${fanned.count()} " +
      s"groups=${fanned.select(col("query_id"), col("doc_id")).distinct().count()}")
    if (want("r8-shape")) time("r8-shape") {
      bm25TopKr8(docs, "doc_id", "text", queries, k = 10)
        .orderBy(col("query_id"), col("rank"))
    }
    if (want("current")) time("current") {
      Retrieval.bm25TopK(docs, "doc_id", "text",
          queries, "query_id", "qtext", k = 10)
        .orderBy(col("query_id"), col("rank"))
    }
    // hypothesis: the r8 shape's doclen SortMergeJoin left the scoring
    // input PARTITIONED+SORTED by doc_id, so every (query, doc) group of
    // the 732M-row fan-out lands complete inside one partition region and
    // the partial aggregation combines it fully before the exchange; the
    // r10 inline-dl rewrite feeds the fan-out from the (doc,term)-hashed
    // cache in arbitrary order → 244M live groups thrash the partial
    // hash map. Same current operator + an explicit doc_id
    // repartition+sort on the restricted postings:
    if (want("curr+dsort")) time("curr+dsort") {
      val qTermsL = queries.select(col("query_id"),
          explode(Dedup.tokens(col("qtext"))).as("term")).distinct()
      val toks = docs.select(col("doc_id"), Dedup.tokens(col("text")).as("__toks"))
      val consts = toks.agg(
        count(when(size(col("__toks")) >= 1, lit(1))).cast("long").as("__n_docs"),
        coalesce(sum(size(col("__toks"))), lit(0L)).cast("long").as("__tot_len"))
      val tf = toks
        .select(col("doc_id"), size(col("__toks")).cast("long").as("__dl"),
          explode(col("__toks")).as("term"))
        .groupBy(col("doc_id"), col("term"))
        .agg(count(lit(1)).as("__tf"), first(col("__dl")).as("__dl"))
      val restricted = tf
        .join(broadcast(qTermsL.select(col("term")).distinct()), Seq("term"), "left_semi")
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val qDf = restricted.groupBy(col("term")).agg(count(lit(1)).as("__df"))
      Retrieval.bm25Rank(restricted
        .repartition(col("doc_id")).sortWithinPartitions(col("doc_id"))
        .join(broadcast(qDf), "term")
        .crossJoin(broadcast(consts)), qTermsL, 10, 1.2, 0.75)
        .orderBy(col("query_id"), col("rank"))
    }
    // round-13 isolation arm: the r8 shape's WINNING ingredient candidate —
    // feed the fan-out from a doc_id SortMergeJoin (restricted ⋈ doclen)
    // instead of a repartition of the cached frame — while keeping
    // current's cheap pieces (consts from un-exploded toks, restricted-only
    // persist, doclen from size(toks) not a postings re-aggregation). If
    // this lands in the r8 band, the SMJ feed is the mechanism and
    // bm25TopK should adopt it; if it lands at current's wall, the r8
    // advantage lives in the corpus-sized tf cache instead.
    if (want("smj-feed")) time("smj-feed") {
      val qTermsL = queries.select(col("query_id"),
          explode(Dedup.tokens(col("qtext"))).as("term")).distinct()
      val toks = docs.select(col("doc_id"), Dedup.tokens(col("text")).as("__toks"))
      val consts = toks.agg(
        count(when(size(col("__toks")) >= 1, lit(1))).cast("long").as("__n_docs"),
        coalesce(sum(size(col("__toks"))), lit(0L)).cast("long").as("__tot_len"))
      val doclen = toks.select(col("doc_id"), size(col("__toks")).cast("long").as("__dl"))
      val tf = toks
        .select(col("doc_id"), explode(col("__toks")).as("term"))
        .groupBy(col("doc_id"), col("term"))
        .agg(count(lit(1)).as("__tf"))
      val restricted = tf
        .join(broadcast(qTermsL.select(col("term")).distinct()), Seq("term"), "left_semi")
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val qDf = restricted.groupBy(col("term")).agg(count(lit(1)).as("__df"))
      Retrieval.bm25Rank(restricted
        .join(broadcast(qDf), "term")
        .join(doclen, "doc_id")
        .crossJoin(broadcast(consts)), qTermsL, 10, 1.2, 0.75)
        .orderBy(col("query_id"), col("rank"))
    }
    // round-13: the r8 shape with the corpus-sized persist REMOVED — tf's
    // (doc,term) aggregation exchange is shared by doclen, consts and the
    // restriction via ReusedExchange (same canonical plan), so the shape
    // keeps its fused fan-out without caching a corpus-sized frame. If
    // this holds the r8 band it is the adoptable production form.
    if (want("r8-noper")) time("r8-noper") {
      val qTermsL = queries.select(col("query_id"),
          explode(Dedup.tokens(col("qtext"))).as("term")).distinct()
      val tf = TextAnalysis.termRows(docs, "doc_id", "text", 1)
        .groupBy(col("doc_id"), col("term")).agg(count(lit(1)).as("__tf"))
      val doclen = tf.groupBy(col("doc_id")).agg(sum("__tf").as("__dl"))
      val consts = doclen.agg(
        count(lit(1)).cast("long").as("__n_docs"),
        sum("__dl").cast("long").as("__tot_len"))
      val restricted = tf
        .join(broadcast(qTermsL.select(col("term")).distinct()), Seq("term"), "left_semi")
      val qDf = restricted.groupBy(col("term")).agg(count(lit(1)).as("__df"))
      Retrieval.bm25Rank(restricted
        .join(broadcast(qDf), "term")
        .join(doclen, "doc_id")
        .crossJoin(broadcast(consts)), qTermsL, 10, 1.2, 0.75)
        .orderBy(col("query_id"), col("rank"))
    }
    spark.stop()
  }
}
