package graft
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, sum, xxhash64}
object Bench {
  /** Force FULL materialization of every output column: a bare `.count()`
    * lets Catalyst prune the final projections (expression-heavy queries
    * would be partially un-measured), so each query is timed to an
    * `agg(sum(xxhash64(all columns)))` — every column is computed and
    * hashed on the executors, and one scalar returns to the driver. */
  private def materialize(df: DataFrame): Unit =
    df.select(xxhash64(df.columns.map(col): _*).as("__h"))
      .agg(sum(col("__h")))
      .head()

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Warm up the JVM/codegen/parquet-reader paths once so per-query times
    // measure the queries, not first-touch initialization.
    Seq("lineitem", "orders", "documents", "embeddings").foreach { t =>
      try spark.read.parquet(s"$sfDir/$t.parquet").count()
      catch { case _: Throwable => }
    }
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val t0 = System.nanoTime()
      try { materialize(fn(spark, sfDir)) } catch { case _: Throwable => }
      name -> (System.nanoTime() - t0) / 1e9
    }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.map(_._2).sum else 0.0
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
