package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.Similarity

/** Dev scratch: hierarchical-vs-flat IVF recall at matched probed-vector
  * budgets across parameterizations — calibrates the SimilaritySpec
  * assertion and the Stress curve. Not part of the library. */
object IvfExp {
  def main(args: Array[String]): Unit = {
    val b = SparkSession.builder().master("local[16]")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.ui.enabled", "false")
    graft.Bench.scratchDir().foreach(b.config("spark.local.dir", _))
    val spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val emb = graft.sources.Tables.embeddings(spark, "/root/testdata/sf0.01")
    val pred = col("vec_id") % 40 === 0
    def pairs(df: org.apache.spark.sql.DataFrame) =
      df.select(col("query_id"), col("neighbor_id")).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    val brute = pairs(Similarity.bruteForceTopK(emb, "vec_id", "embedding", pred, k = 10))
    def rec(s: Set[(Long, Long)]) = s.intersect(brute).size.toDouble / brute.size
    val n = emb.count()
    println(s"[ivfexp] n=$n queries=${brute.size / 10}")
    for ((c, p) <- Seq((44, 11), (32, 8))) {
      val r = rec(pairs(Similarity.ivfTopK(emb, "vec_id", "embedding", pred,
        k = 10, nCells = c, nProbe = p)))
      println(f"[ivfexp] flat  C=$c%3d probe=$p%2d budget=${p.toDouble / c}%.3f recall=$r%.3f")
    }
    for ((c1, c2, p1, p2) <- Seq((8, 16, 4, 32), (8, 16, 6, 32), (8, 16, 8, 32),
                                 (11, 11, 6, 30), (11, 11, 11, 30))) {
      val r = rec(pairs(Similarity.ivfTopK2(emb, "vec_id", "embedding", pred,
        k = 10, nCellsL1 = c1, nCellsL2 = c2, nProbeL1 = p1, nProbeL2 = p2)))
      println(f"[ivfexp] hier  C1=$c1%2d C2=$c2%2d p1=$p1%2d p2=$p2%2d budget=${p2.toDouble / (c1 * c2)}%.3f recall=$r%.3f")
    }
    // trained variants: L1 Lloyd (t1), per-cell leaf Lloyd (t2)
    for ((c1, c2, p1, p2, t1, t2) <- Seq(
      (8, 16, 6, 32, 0, 1), (8, 16, 6, 32, 0, 2), (8, 16, 6, 32, 1, 1),
      (8, 16, 6, 32, 1, 2), (8, 16, 6, 32, 2, 2), (8, 16, 8, 32, 1, 2),
      (11, 11, 6, 30, 1, 2), (11, 11, 8, 30, 1, 2))) {
      val r = rec(pairs(Similarity.ivfTopK2(emb, "vec_id", "embedding", pred,
        k = 10, nCellsL1 = c1, nCellsL2 = c2, nProbeL1 = p1, nProbeL2 = p2,
        trainIters = t1, trainItersL2 = t2)))
      println(f"[ivfexp] hierT C1=$c1%2d C2=$c2%2d p1=$p1%2d p2=$p2%2d t1=$t1 t2=$t2 budget=${p2.toDouble / (c1 * c2)}%.3f recall=$r%.3f")
    }
    spark.stop()
  }
}
