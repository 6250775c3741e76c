package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.SparkPlan

/** Plan-shape differ: prints a normalized physical-plan signature for each
  * registry query against one or more sf dirs, so a scale-up's plan drift
  * is observable without executing anything (planning only — statistics
  * still drive join-strategy selection, which is exactly the size-dependent
  * decision worth auditing: an implicit broadcast that silently flips to a
  * sort-merge join at 10× data is the classic scale cliff).
  *
  * AQE is disabled in this session so `executedPlan` is the full static
  * plan including the `Exchange` nodes EnsureRequirements inserts — shuffle
  * count is part of the signature. At runtime AQE may still improve on the
  * static plan; it cannot add shuffles the static plan lacks.
  *
  * Usage: `runMain graft.tools.PlanShape <dirA> <dirB> [q03_... q35_...]`
  * (no query args = the whole registry). Output: one `PLAN <name> SAME` or
  * `PLAN <name> DIFF` line per query plus the differing node multisets.
  */
object PlanShape {
  private def signature(p: SparkPlan): Map[String, Int] = {
    def walk(n: SparkPlan): Seq[String] =
      n.nodeName +: (n.children ++ n.subqueries).flatMap(walk)
    walk(p).groupBy(identity).view.mapValues(_.size).toMap
  }

  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: PlanShape <dirA> <dirB> [queries...]")
    val (dirA, dirB) = (args(0), args(1))
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.files.maxPartitionBytes", "4m")
      .config("spark.sql.adaptive.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val names =
      if (args.length > 2) args.drop(2).toSeq
      else graft.SparkEntry.queries.keys.toSeq.sorted
    var nDiff = 0
    names.foreach { name =>
      val fn = graft.SparkEntry.queries(name)
      val sigA = signature(fn(spark, dirA).queryExecution.executedPlan)
      val sigB = signature(fn(spark, dirB).queryExecution.executedPlan)
      if (sigA == sigB) println(s"PLAN $name SAME")
      else {
        nDiff += 1
        val keys = (sigA.keySet ++ sigB.keySet).toSeq.sorted
        val delta = keys.flatMap { k =>
          val (a, b) = (sigA.getOrElse(k, 0), sigB.getOrElse(k, 0))
          if (a == b) None else Some(s"$k:$a->$b")
        }
        println(s"PLAN $name DIFF ${delta.mkString(" ")}")
      }
    }
    println(s"PLANDIFF_TOTAL=$nDiff")
    spark.stop()
  }
}
