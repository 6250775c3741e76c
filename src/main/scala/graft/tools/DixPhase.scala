package graft.tools

import org.apache.spark.sql.functions._
import org.apache.spark.sql.SparkSession
import graft.operators.DedupIndex
import graft.sources.Tables

/** Dev-only phase timer for the q108 dedup-index lifecycle at any SF:
  * build / write / read / probe walls, separately, with the exact session
  * conf Bench uses. Not part of any verification path.
  *
  *   SPARK_GRAFT_SF_DIR=... SPARK_GRAFT_CPUS=32 runMain graft.tools.DixPhase
  */
object DixPhase {
  def t[A](label: String)(f: => A): A = {
    val t0 = System.nanoTime(); val r = f
    println(f"[phase] $label%-28s ${(System.nanoTime() - t0) / 1e9}%6.2f s")
    r
  }
  def main(args: Array[String]): Unit = {
    graft.Bench.routeTmpdir() // same scratch routing as Bench
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val builder = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.files.maxPartitionBytes", "4m")
      .config("spark.ui.enabled", "false")
    graft.Bench.scratchDir().foreach(builder.config("spark.local.dir", _))
    sys.env.get("SPARK_GRAFT_CONF").foreach(graft.Bench.applyConfOverrides(builder, _))
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val reps = sys.env.getOrElse("SPARK_GRAFT_REPS", "2").toInt
    (1 to reps).foreach { rep =>
      println(s"== rep $rep ==")
      spark.catalog.clearCache()
      val dir = graft.Scratch.tempDir("dixphase") + "/dix"
      val docs = Tables.documents(spark, sfDir)
      val ix = t("build (lazy+count)") {
        DedupIndex.build(docs.filter(col("doc_id") % 5 =!= 0), "doc_id", "text",
          shingleN = 3, k = 8, bands = 4)
      }
      t("write") { DedupIndex.write(ix, dir) }
      val loaded = t("read") { DedupIndex.read(spark, dir) }
      val probe = t("probe (plan+exec)") {
        val df = DedupIndex.probe(loaded, docs.filter(col("doc_id") % 5 === 0),
          "doc_id", "text", threshold = 0.1, maxBucketSize = 100)
          .orderBy(col("doc_id"))
        df.select(xxhash64(df.columns.map(col): _*).as("__h"))
          .agg(expr("bit_xor(__h)")).head()
      }
      graft.Scratch.sweep()
    }
    spark.stop()
  }
}
