package graft.tools

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}
import org.apache.spark.sql.SparkSession

/** Dump `.explain("formatted")` for registry queries to files — the plan
  * evidence the optimization rounds commit under plans/rNN/. Session conf
  * matches Bench (local[$SPARK_GRAFT_CPUS], shuffle.partitions = cpus,
  * 4 MB splits) so the captured shapes are the ones the sweep runs.
  *
  *   runMain graft.tools.PlanDump <outDir> <suffix> <query> [query...]
  *
  * writes <outDir>/<query>_<suffix>.txt per query. */
object PlanDump {
  def main(args: Array[String]): Unit = {
    require(args.length >= 3, "usage: PlanDump <outDir> <suffix> <query> [more...]")
    val outDir = args(0)
    val suffix = args(1)
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
    Files.createDirectories(Paths.get(outDir))
    for (name <- args.drop(2)) {
      val df = graft.SparkEntry.queries(name)(spark, sfDir)
      val plan = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      Files.write(Paths.get(outDir, s"${name}_$suffix.txt"),
        plan.getBytes(StandardCharsets.UTF_8))
      println(s"[plandump] wrote $outDir/${name}_$suffix.txt (${plan.length} chars)")
    }
    spark.stop()
  }
}
