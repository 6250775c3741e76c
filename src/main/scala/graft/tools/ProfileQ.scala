package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, expr, xxhash64}

/** Dev profiler: time named registered queries repeatedly in ONE warm JVM
  * (min-of-reps removes the fixed JVM/codegen first-touch cost that
  * dominates single-shot timings). Same bit_xor materialization as Bench.
  *
  *   sbt "runMain graft.tools.ProfileQ q02_pricing_summary q15_minhash_lsh"
  */
object ProfileQ {
  private def materialize(df: DataFrame): Unit =
    df.select(xxhash64(df.columns.map(col): _*).as("__h"))
      .agg(expr("bit_xor(__h)"))
      .head()

  def main(args: Array[String]): Unit = {
    // same scratch routing as Bench: without it the index-lifecycle
    // queries write their stores to the stalling virtio /tmp here but to
    // tmpfs under Bench, and the A/B numbers stop being comparable
    graft.Bench.routeTmpdir()
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val reps = sys.env.getOrElse("SPARK_GRAFT_REPS", "3").toInt
    val builder = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      // match Bench's scan parallelism (single-file testdata, small splits)
      .config("spark.sql.files.maxPartitionBytes", "4m")
      .config("spark.ui.enabled", "false")
    // tmpfs scratch with low-free-space disk fallback — see Bench.scratchDir
    graft.Bench.scratchDir().foreach(builder.config("spark.local.dir", _))
    // named profile (SPARK_GRAFT_PROFILE=serving), then A/B conf
    // experiments: SPARK_GRAFT_CONF="k=v;k=v" — explicit overrides win
    sys.env.get("SPARK_GRAFT_PROFILE")
      .foreach(graft.Bench.applyProfile(builder, _))
    sys.env.get("SPARK_GRAFT_CONF")
      .foreach(graft.Bench.applyConfOverrides(builder, _))
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val names = if (args.nonEmpty) args.toSeq
                else graft.SparkEntry.queries.keys.toSeq.sorted
    // SPARK_GRAFT_CLEARCACHE=1: drop every cached frame between reps so
    // each rep pays the full pipeline — without it reps 2+ serve persisted
    // intermediates and an operator A/B reports only the cached tail
    val clearCache = sys.env.get("SPARK_GRAFT_CLEARCACHE").contains("1")
    names.foreach { name =>
      val fn = graft.SparkEntry.queries(name)
      val times = (1 to reps).map { _ =>
        if (clearCache) spark.catalog.clearCache()
        val t0 = System.nanoTime()
        materialize(fn(spark, sfDir))
        val w = (System.nanoTime() - t0) / 1e9
        // outside the timed window, like Bench: lifecycle queries leave
        // whole index stores on the (RAM-counted) scratch per rep
        graft.Scratch.sweep()
        w
      }
      println(f"[profile] $name%-28s min=${times.min}%6.2f  runs=${times.map(t => f"$t%.2f").mkString(",")}")
    }
    spark.stop()
  }
}
