package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.Similarity

/** Dev scratch: isolate the 80k-corpus flat-IVF straggler seen in Stress —
  * cell-occupancy skew under md5-random centroids and where the plan puts
  * the resulting fat partition. */
object IvfDebug {
  def main(args: Array[String]): Unit = {
    val b = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "64")
      .config("spark.ui.enabled", "false")
    graft.Bench.scratchDir().foreach(b.config("spark.local.dir", _))
    val spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val d = "/root/testdata/sf0.1"
    val emb = graft.sources.Tables.embeddings(spark, d)
      .crossJoin(spark.range(40).toDF("v"))
      .select(
        (col("vec_id") * 40 + col("v")).as("vec_id"),
        expr("transform(embedding, (x, i) -> CAST(x + (CAST(v AS DOUBLE) - 20.0D) * 0.0005D * (CAST(i % 7 AS DOUBLE) - 3.0D) AS FLOAT))")
          .as("embedding"))
    println(s"[ivfdbg] n=${emb.count()}")
    val top = Similarity.ivfTopK(emb, "vec_id", "embedding",
      col("vec_id") % 40 === 0, k = 10, nCells = 283, nProbe = 16)
    top.explain("formatted")
    val t0 = System.nanoTime()
    println(s"[ivfdbg] ivfTopK rows=${top.count()} in ${(System.nanoTime() - t0) / 1e9} s")
  }
}
