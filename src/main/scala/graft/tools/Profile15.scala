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
    // warm codegen
    docs.select(md5(col("text"))).agg(count(lit(1))).head()

    t("tokens only") {
      docs.select(Dedup.tokens(col("text")).as("w")).agg(sum(size(col("w")))).head()
    }
    t("shingle explode no distinct") {
      val idxs = (0 until 3).map(j => s"__w[i + $j]").mkString(", ")
      docs.select(col("doc_id"), Dedup.tokens(col("text")).as("__w"))
        .filter(size(col("__w")) >= 3)
        .select(col("doc_id"),
          explode(expr(s"transform(sequence(0, size(__w) - 3), i -> concat_ws(' ', $idxs))")).as("shingle"))
        .agg(count(lit(1))).head()
    }
    t("explode + distinct + count") {
      Dedup.shingleRows(docs, "doc_id", "text", 3).agg(count(lit(1))).head()
    }
    t("explode + distinct + persist") {
      Dedup.shingleRows(docs, "doc_id", "text", 3)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK).count()
    }
    t("q15 full (warm cache)") {
      Dedup.minhashNearDups(docs, "doc_id", "text", 3, 8, 4, 0.1, 100)
        .orderBy(col("jaccard").desc, col("doc_a"), col("doc_b")).limit(100).count()
    }
    spark.stop()
  }
}
