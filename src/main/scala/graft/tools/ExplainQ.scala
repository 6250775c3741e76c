package graft.tools

import org.apache.spark.sql.SparkSession

/** Final-plan inspector: run one registry query to completion and print the
  * ADAPTIVE executed plan — the plan AQE actually ran, join strategies and
  * runtime reoptimizations included (contrast [[PlanShape]], which diffs the
  * static pre-AQE shape). Usage:
  *
  *   runMain graft.tools.ExplainQ <sfDir> <queryName> [queryName...]
  *
  * Built for straggler forensics: BENCH_r07_sf10 showed q35 at cpu/wall ≈ 1
  * on an idle 32-core box, and the static plan could not show which side of
  * the probe join AQE decided to broadcast. */
object ExplainQ {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: ExplainQ <sfDir> <queryName> [more...]")
    val dir = args(0)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.files.maxPartitionBytes", "4m")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    for (name <- args.drop(1)) {
      val df = graft.SparkEntry.queries(name)(spark, dir)
      val t0 = System.nanoTime()
      val n = df.count()
      val secs = (System.nanoTime() - t0) / 1e9
      println(f"== $name rows=$n wall=$secs%.2f s ==")
      // toString on the AdaptiveSparkPlanExec root renders the final plan
      // once isFinalPlan=true (the count above forced execution)
      println(df.queryExecution.executedPlan.toString)
    }
    spark.stop()
  }
}
