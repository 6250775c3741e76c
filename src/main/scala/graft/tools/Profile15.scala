package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.Dedup
import graft.sources.Tables

/** Scratch stage profiler for q15/q32 (not part of the library surface). */
object Profile15 {
  def t[A](name: String)(f: => A): A = {
    val t0 = System.nanoTime(); val r = f
    println(f"[profile] $name%-28s ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
  }
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val d = "/root/testdata/sf0.1"
    val docs = Tables.documents(spark, d)
    docs.count()

    // q15 stages
    val sh = t("shingleRows+persist") {
      val x = Dedup.shingleRows(docs, "doc_id", "text", 3)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      x.count(); x
    }
    val sig = t("minhashSignatures") {
      val x = Dedup.minhashSignatures(sh, "doc_id", 8); x.count(); x
    }
    val band = t("lshBandRows") {
      val x = Dedup.lshBandRows(sig, "doc_id", 4, 2); x.count(); x
    }
    val cand = t("lshCandidatePairs") {
      val x = Dedup.lshCandidatePairs(band, "doc_id", 100); x.count(); x
    }
    t("jaccardForPairs") {
      Dedup.jaccardForPairs(cand, sh, "doc_id").filter(col("jaccard") >= 0.1).count()
    }
    t("q15 full (2nd run)") {
      Dedup.minhashNearDups(docs, "doc_id", "text", 3, 8, 4, 0.1, 100)
        .orderBy(col("jaccard").desc, col("doc_a"), col("doc_b")).limit(100).count()
    }

    // q32 stages
    val fp = t("simhashInts+persist") {
      val x = Dedup.simhashInts(docs, "doc_id", "text")
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      x.count(); x
    }
    t("q32 full") {
      Dedup.simhashNearDups(docs, "doc_id", "text", 4, 6, 100)
        .orderBy(col("hamming"), col("doc_a"), col("doc_b")).limit(500).count()
    }
    spark.stop()
  }
}
