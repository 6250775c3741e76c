package graft.tools

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Derive a larger scale factor from an existing testdata dir by K-fold
  * replication with key-space offsets — referential integrity preserved
  * (each replica's lineitem rows join its own replica's orders/parts/
  * suppliers, exactly like TPC-H's dbgen scales). Every key column and
  * every foreign key referencing it shift by the SAME stride — the
  * referenced table's max(key)+1 — so replica r's FKs land exactly on
  * replica r's keys.
  *
  *   runMain graft.tools.MakeSf /root/testdata/sf0.1 /tmp/sf1 10
  *
  * Row payloads are NOT perturbed: the sf1 text corpus is the base corpus
  * ×K verbatim (dup groups and LSH buckets grow K×, deliberately the
  * dedup-path worst case), and embeddings gain K exact clones per vector.
  * That makes sf1 a SCALE/plan-shape stress, not a quality benchmark —
  * the full-registry sweep it exists for (VERDICT r5 "Next round" #2)
  * hunts for operators whose plan changes shape or cliffs at 10×, the
  * class of bug the round-5 IVF straggler proved sf0.01 oracles miss.
  *
  * Each table lands as a SINGLE file `<out>/<table>.parquet` — same layout
  * the driver's generator uses, and what DuckDB's read_parquet(path)
  * expects in tools/check_oracle.py (a directory would not parse). A
  * single ~170 MB file still splits fine on read (parquet row groups).
  */
object MakeSf {

  /** Replicate `df` K times, adding r*stride to each listed column. */
  private def scale(df: DataFrame, k: Int, shifts: Seq[(String, Long)]): DataFrame = {
    val rep = df.crossJoin(
      df.sparkSession.range(k).select(col("id").as("__r")))
    shifts.foldLeft(rep) { case (d, (c, stride)) =>
      d.withColumn(c, col(c) + col("__r") * lit(stride))
    }.drop("__r")
  }

  /** Write as exactly one parquet file at `<outDir>/<name>.parquet`.
    *
    * Small row groups (1 MB vs the 128 MB default): the oracle harness
    * needs ONE file per table, but a single-file table with a single row
    * group is unsplittable — every scan stage runs as one task no matter
    * how many cores the session has, which serializes scan-bound work and
    * misrepresents a production layout (at 100 TB data arrives in
    * thousands of files; scan parallelism is free). 1 MB groups make the
    * one file behave like that many-file layout under a matching
    * `spark.sql.files.maxPartitionBytes` (row groups land in the byte-range
    * split containing their midpoint). The round-7 sf1 sweep measured the
    * difference directly: 6M-row lineitem aggregations (KMV sketch q74)
    * ran 1-core without this. */
  private def writeOne(df: DataFrame, outDir: String, name: String): Unit = {
    val tmp = s"$outDir/__tmp_$name"
    df.coalesce(1).write.mode(SaveMode.Overwrite)
      .option("parquet.block.size", (1024 * 1024).toString)
      .parquet(tmp)
    val dir = new java.io.File(tmp)
    val part = dir.listFiles().filter(_.getName.endsWith(".parquet")).head
    val dest = new java.io.File(s"$outDir/$name.parquet")
    if (dest.exists()) dest.delete()
    java.nio.file.Files.move(part.toPath, dest.toPath)
    dir.listFiles().foreach(_.delete())
    dir.delete()
  }

  def main(args: Array[String]): Unit = {
    val Array(inDir, outDir, kStr) = args
    val k = kStr.toInt
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val builder = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      // UTC pins the TimestampType→NTZ cast on events.ts to value identity
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
    graft.Bench.scratchDir().foreach(builder.config("spark.local.dir", _))
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()

    def rd(t: String) = spark.read.parquet(s"$inDir/$t.parquet")
    def stride(t: String, c: String): Long =
      rd(t).agg(max(col(c))).head().getLong(0) + 1L

    // fixed dims: identical at every scale factor (as in TPC-H)
    Seq("region", "nation").foreach(t => writeOne(rd(t), outDir, t))

    val custS = stride("customer", "c_custkey")
    val suppS = stride("supplier", "s_suppkey")
    val partS = stride("part", "p_partkey")
    val ordS = stride("orders", "o_orderkey")

    writeOne(scale(rd("customer"), k, Seq("c_custkey" -> custS)), outDir, "customer")
    writeOne(scale(rd("supplier"), k, Seq("s_suppkey" -> suppS)), outDir, "supplier")
    writeOne(scale(rd("part"), k, Seq("p_partkey" -> partS)), outDir, "part")
    writeOne(scale(rd("orders"), k,
      Seq("o_orderkey" -> ordS, "o_custkey" -> custS)), outDir, "orders")
    writeOne(scale(rd("lineitem"), k,
      Seq("l_orderkey" -> ordS, "l_partkey" -> partS, "l_suppkey" -> suppS)),
      outDir, "lineitem")
    // events.ts: normalize whatever encoding the source dir uses through
    // Tables.events (→ TimestampType), then write back as TIMESTAMP_MICROS
    // with isAdjustedToUTC=false (TIMESTAMP_NTZ) — byte-for-byte the
    // encoding the driver's generator emits — so DuckDB oracles read a
    // derived dir identically to a canonical one and the events family
    // needs no skip (the old INT64-nanos rewrite forced a _DERIVED_SF
    // marker + check_oracle.py skip; both are gone).
    val ev = graft.sources.Tables.events(spark, inDir).withColumn("ts",
      col("ts").cast(org.apache.spark.sql.types.TimestampNTZType))
    writeOne(scale(ev, k,
      Seq("event_id" -> stride("events", "event_id"),
        "user_id" -> stride("events", "user_id"))), outDir, "events")
    writeOne(scale(rd("documents"), k,
      Seq("doc_id" -> stride("documents", "doc_id"))), outDir, "documents")
    writeOne(scale(rd("embeddings"), k,
      Seq("vec_id" -> stride("embeddings", "vec_id"))), outDir, "embeddings")

    val li = spark.read.parquet(s"$outDir/lineitem.parquet").count()
    println(s"[makesf] $outDir written, lineitem rows = $li")
    spark.stop()
  }
}
