package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted, SparkListenerJobStart, SparkListenerJobEnd}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, expr, xxhash64}

/** Dev-only stage profiler: run one registered query and print every
  * job/stage with its wall span and task time — the poor man's Spark UI
  * for a UI-disabled box. Not part of any verification path. */
object StageProf {
  private def materialize(df: DataFrame): Unit =
    df.select(xxhash64(df.columns.map(col): _*).as("__h"))
      .agg(expr("bit_xor(__h)"))
      .head()

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val builder = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      // match Bench's scan-parallelism config so stage shapes compare
      // 1:1 with sweep entries (single-file testdata needs small splits)
      .config("spark.sql.files.maxPartitionBytes", "4m")
      .config("spark.ui.enabled", "false")
    graft.Bench.scratchDir().foreach(builder.config("spark.local.dir", _))
    // same A/B hooks as ProfileQ/Bench
    sys.env.get("SPARK_GRAFT_PROFILE")
      .foreach(graft.Bench.applyProfile(builder, _))
    sys.env.get("SPARK_GRAFT_CONF")
      .foreach(graft.Bench.applyConfOverrides(builder, _))
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val name = args.head
    val reps = sys.env.getOrElse("SPARK_GRAFT_REPS", "2").toInt
    val fn = graft.SparkEntry.queries(name)
    // warm-up reps: codegen + page cache, so the listener sees steady state
    (1 until reps).foreach { _ => materialize(fn(spark, sfDir)) }
    // boxed values: with a scala Long value type, `get` on a missing key
    // unboxes the null to 0L before any null check can see it
    val jobs = new java.util.concurrent.ConcurrentHashMap[Int, java.lang.Long]()
    val listener = new SparkListener {
      override def onJobStart(e: SparkListenerJobStart): Unit =
        jobs.put(e.jobId, e.time)
      override def onJobEnd(e: SparkListenerJobEnd): Unit = {
        // skip jobs whose start event was missed (listener attached late)
        // instead of printing an epoch-sized wall (ADVICE r10)
        Option(jobs.get(e.jobId)).foreach { t0 =>
          println(f"[job] id=${e.jobId}%3d wall=${(e.time - t0) / 1e3}%7.2f s")
        }
      }
      override def onStageCompleted(e: SparkListenerStageCompleted): Unit = {
        val si = e.stageInfo
        val wall = (for {s <- si.submissionTime; c <- si.completionTime}
          yield (c - s) / 1e3).getOrElse(-1.0)
        val exec = si.taskMetrics.executorRunTime / 1e3
        println(f"[stage] id=${si.stageId}%4d tasks=${si.numTasks}%4d " +
          f"wall=$wall%7.2f s cpu=$exec%8.2f s  ${si.name.take(90)}")
      }
    }
    spark.sparkContext.addSparkListener(listener)
    val t0 = System.nanoTime()
    materialize(fn(spark, sfDir))
    println(f"[total] $name ${(System.nanoTime() - t0) / 1e9}%.2f s")
    spark.stop()
  }
}
