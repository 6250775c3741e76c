package graft
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, expr, xxhash64}
object Bench {
  /** Force FULL materialization of every output column.
    *
    * A bare `.count()` lets Catalyst prune the final projections (expression-
    * heavy queries would be partially un-measured), so each query computes
    * `xxhash64(all columns)` per row and folds the hashes with `bit_xor`.
    * `bit_xor` — NOT `sum` — because under Spark 4 ANSI mode (default on)
    * summing uniformly-random 64-bit hashes throws ARITHMETIC_OVERFLOW almost
    * surely once output exceeds a few dozen rows; XOR is closed over Long and
    * can never overflow, so every query runs clean to full materialization. */
  private def materialize(df: DataFrame): Unit =
    df.select(xxhash64(df.columns.map(col): _*).as("__h"))
      .agg(expr("bit_xor(__h)"))
      .head()

  /** Error text embedded in the one-line JSON artifact must never break its
    * parse: quotes, backslashes and control characters become spaces. */
  private[graft] def jsonSafe(msg: String): String =
    msg.replaceAll("[\"\\\\\\p{Cntrl}]", " ").take(160)

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      // shuffle/spill scratch on tmpfs: this box's virtio disk degrades to
      // multi-second write stalls under load (measured: queries idle-wait
      // 20-90 s in FileOutputStream.writeBytes while CPUs sit 94% idle),
      // which times the disk, not the engine. A real cluster node has
      // local SSDs; tmpfs is the honest local stand-in. Override with
      // SPARK_GRAFT_LOCAL_DIR if running somewhere with working disks.
      .config("spark.local.dir",
        sys.env.getOrElse("SPARK_GRAFT_LOCAL_DIR", "/dev/shm/spark-local"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Warm up once so per-query times measure the queries, not first-touch
    // engine initialization: parquet reader paths on the big tables, then
    // the whole-stage-codegen compiler, hash-agg / join / window / explode
    // templates, and the shuffle + broadcast machinery via one composite
    // mini-query over the tiny dims (nation/region: 25/5 rows).
    Seq("lineitem", "orders", "documents", "embeddings").foreach { t =>
      try spark.read.parquet(s"$sfDir/$t.parquet").count()
      catch { case _: Throwable => }
    }
    try {
      import org.apache.spark.sql.expressions.Window
      import org.apache.spark.sql.functions.{broadcast, count, explode, array, row_number, lit}
      val n = spark.read.parquet(s"$sfDir/nation.parquet")
      val r = spark.read.parquet(s"$sfDir/region.parquet")
      val warmed = n.join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
        .repartition(2, col("n_nationkey")) // exercise a real exchange
        .groupBy(col("r_name")).agg(count(lit(1)).as("c"))
        .withColumn("rn",
          row_number().over(Window.partitionBy(col("r_name")).orderBy(col("c"))))
        .select(col("r_name"), explode(array(col("c"), col("rn"))).as("v"))
      materialize(warmed)
    } catch { case _: Throwable => }
    // Per-query: (name, seconds, ok | error message). Failures are REPORTED,
    // never timed-as-success — a bench that times failures can hide a real
    // regression forever.
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val t0 = System.nanoTime()
      val status =
        try { materialize(fn(spark, sfDir)); "ok" }
        catch {
          case e: Throwable =>
            "error: " + jsonSafe(Option(e.getMessage).getOrElse(e.getClass.getName))
        }
      val sec = (System.nanoTime() - t0) / 1e9
      // progress to stderr (stdout stays the single JSON artifact line)
      System.err.println(f"[bench] $name%-28s $sec%8.2f s  $status")
      // Drop THIS query's persisted frames before the next one runs (many
      // operators persist internal frames they cannot unpersist themselves).
      // 90+ queries' leftovers otherwise fill the storage pool, squeeze
      // execution memory, and the tail of the registry times evictions and
      // spills instead of queries. Cleanup is OUTSIDE the timed window:
      // each query is measured the way a user would run it — alone.
      spark.catalog.clearCache()
      (name, sec, status)
    }
    val qs = results.map { case (k, v, _) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val statuses = results.map { case (k, _, s) => s"\"" + k + "\":\"" + s + "\"" }
      .mkString("{", ",", "}")
    val failed = results.count(_._3 != "ok")
    val total = if (results.nonEmpty) results.map(_._2).sum else 0.0
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"status":$statuses,"failed":$failed,"sf":"$sfDir"}""")
    spark.stop()
  }
}
