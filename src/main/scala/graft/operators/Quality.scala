package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Declarative data-quality rule engine — the Deequ-equivalent
  * (SURVEY.md §2.10, Q2–Q4).
  *
  * Mirrors the reference's two validation layers: hand-rolled null-rate /
  * uniqueness checks (`scripts/batch/data_quality/bronze_validation.py:64-77`)
  * and the PyDeequ completeness/min suite
  * (`scripts/batch/data_quality/silver_validation.py:86-135`).
  *
  * All checks against one table are evaluated in a SINGLE aggregation pass
  * (one scan, map-side partial agg, one-row shuffle) regardless of the
  * number of rules — at 100 TB the scan dominates, so rule count is free.
  * The resulting 1-row frame is pivoted to long form driver-free.
  */
object Quality {

  sealed trait Check {
    def table: String
    def column: String
    def kind: String
    def id: String = s"$table.$kind.$column"
    /** metric as an aggregate expression */
    def metric: Column
    /** pass predicate over the computed metric */
    def passed(metric: Column): Column
  }

  /** Fraction of non-null values ≥ threshold (Deequ hasCompleteness,
    * `silver_validation.py:88`). Integer-count division → bit-stable double. */
  final case class Completeness(table: String, column: String, atLeast: Double) extends Check {
    val kind = "completeness"
    def metric: Column =
      sum(col(column).isNotNull.cast("long")).cast("double") / count(lit(1))
    def passed(m: Column): Column = m >= atLeast
  }

  /** min(column) ≥ bound (Deequ hasMin, `silver_validation.py:89`). */
  final case class MinValue(table: String, column: String, atLeast: Double) extends Check {
    val kind = "min"
    def metric: Column = min(col(column)).cast("double")
    def passed(m: Column): Column = m >= atLeast
  }

  /** max(column) ≤ bound. */
  final case class MaxValue(table: String, column: String, atMost: Double) extends Check {
    val kind = "max"
    def metric: Column = max(col(column)).cast("double")
    def passed(m: Column): Column = m <= atMost
  }

  /** distinct/total ratio ≥ threshold (`silver_validation.py:64-72`). */
  final case class Uniqueness(table: String, column: String, atLeast: Double) extends Check {
    val kind = "uniqueness"
    def metric: Column =
      countDistinct(col(column)).cast("double") / count(lit(1))
    def passed(m: Column): Column = m >= atLeast
  }

  /** null fraction ≤ threshold (bronze 5% rule, `bronze_validation.py:69`). */
  final case class NullRate(table: String, column: String, atMost: Double) extends Check {
    val kind = "null_rate"
    def metric: Column =
      sum(col(column).isNull.cast("long")).cast("double") / count(lit(1))
    def passed(m: Column): Column = m <= atMost
  }

  /** Evaluate all checks for ONE table in a single agg pass; returns long
    * form (check_id, metric, passed). */
  def evaluate(df: DataFrame, checks: Seq[Check]): DataFrame = {
    require(checks.nonEmpty)
    val aggs = checks.zipWithIndex.map { case (c, i) => c.metric.as(s"__m$i") }
    val oneRow = df.agg(aggs.head, aggs.tail: _*)
    val rows = checks.zipWithIndex.map { case (c, i) =>
      oneRow.select(
        lit(c.id).as("check_id"),
        col(s"__m$i").as("metric"),
        c.passed(col(s"__m$i")).as("passed"))
    }
    rows.reduce(_ unionByName _)
  }

  /** Evaluate a suite spanning several tables (one pass per table). */
  def evaluateSuite(tables: Map[String, DataFrame], checks: Seq[Check]): DataFrame =
    checks.groupBy(_.table).toSeq.sortBy(_._1).map { case (t, cs) =>
      evaluate(tables(t), cs)
    }.reduce(_ unionByName _)

  /** Q1 — schema snapshot/drift detection
    * (`bronze_validation.py:41-61,120-141`): returns the canonical schema
    * JSON to persist, and a diff against a previously stored snapshot. */
  def schemaSnapshot(df: DataFrame): String = df.schema.json

  /** Robust outlier detection per group: |x − median| / MAD, the
    * breakdown-resistant alternative to z-scores (one wild value cannot
    * drag the threshold the way it drags a mean/stddev). Median and MAD
    * are exact interpolated percentiles rounded to 6 decimals (the q44
    * recipe — cross-engine stable); the score is then pure deterministic
    * double arithmetic on broadcast per-group scalars. Two grouped
    * percentile passes (MAD needs the median first) + one broadcast join
    * back; a zero-MAD group (over half the values identical) yields null
    * scores and never flags. */
  def robustOutliers(df: DataFrame, groupCol: String, valueCol: String,
                     threshold: Double): DataFrame = {
    require(threshold > 0, s"threshold must be > 0: $threshold")
    // the narrow (group, value) frame feeds three consumers (median pass,
    // MAD pass, final scoring) — persist it, and the med-joined frame,
    // rather than re-scanning the source each time
    val base = df.select(col(groupCol), col(valueCol))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val med = base.groupBy(col(groupCol))
      .agg(round(expr(s"percentile($valueCol, 0.5D)"), 6).as("med"))
    val withMed = base.join(broadcast(med), Seq(groupCol))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val mad = withMed.groupBy(col(groupCol))
      .agg(round(expr(s"percentile(abs($valueCol - med), 0.5D)"), 6).as("mad"))
    withMed.join(broadcast(mad), Seq(groupCol))
      .withColumn("robust_z",
        when(col("mad") > 0, (col(valueCol) - col("med")) / col("mad")))
      .withColumn("is_outlier", coalesce(abs(col("robust_z")) > threshold, lit(false)))
  }

  /** Equi-width histogram of a 2-decimal money column, binned in exact
    * integer cents — the distribution-profiling view of a DQ suite. The
    * cents conversion is the q02 recipe (round(x·100) → BIGINT is exact
    * for 2-dp values); binning is one integer division + one hash
    * aggregate, so the histogram of a 100 TB column is a single
    * map-side-combining pass. Bin edges are data-independent (no
    * min/max pre-pass). Assumes non-negative values — `div` truncates
    * toward zero, so negative values would need floor semantics. */
  def histogramCents(df: DataFrame, valueCol: String,
                     binWidthCents: Long): DataFrame = {
    require(binWidthCents > 0, s"binWidthCents must be > 0: $binWidthCents")
    df.select(
        expr(s"CAST(round(($valueCol) * 100) AS BIGINT) div ${binWidthCents}L")
          .as("bin"))
      .groupBy(col("bin")).agg(count(lit(1)).as("n_rows"))
      .withColumn("lo", (col("bin") * binWidthCents).cast("double") / 100)
      .withColumn("hi", ((col("bin") + 1) * binWidthCents).cast("double") / 100)
      .select(col("bin"), col("lo"), col("hi"), col("n_rows"))
  }

  def schemaDrift(df: DataFrame, storedJson: String): Seq[String] = {
    import org.apache.spark.sql.types.{DataType, StructType}
    val stored = DataType.fromJson(storedJson).asInstanceOf[StructType]
    val cur = df.schema
    val storedM = stored.fields.map(f => f.name -> f.dataType.simpleString).toMap
    val curM = cur.fields.map(f => f.name -> f.dataType.simpleString).toMap
    val added = curM.keySet.diff(storedM.keySet).toSeq.sorted.map(c => s"added: $c")
    val removed = storedM.keySet.diff(curM.keySet).toSeq.sorted.map(c => s"removed: $c")
    val retyped = curM.keySet.intersect(storedM.keySet).toSeq.sorted
      .filter(c => curM(c) != storedM(c))
      .map(c => s"retyped: $c ${storedM(c)} -> ${curM(c)}")
    added ++ removed ++ retyped
  }
}
