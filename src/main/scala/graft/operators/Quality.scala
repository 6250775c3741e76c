package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

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

  /** [[robustOutliers]] for FIXED-SCALE decimal columns (2-dp money and
    * kin): same output contract — exact interpolated percentile medians/
    * MADs rounded to 6 decimals, then pure double scoring — but the two
    * percentiles derive from integer-value HISTOGRAMS + cumulative-count
    * windows instead of Spark's `percentile` aggregate.
    *
    * Why not `percentile`: it is an ObjectHashAggregate that buffers each
    * group's FULL value multiset on a single reducer — two passes of that
    * over a 100 TB fact with few, huge groups is an OOM, not a plan. The
    * histogram form aggregates (group, value-at-scale) with map-side
    * combine — state per task is bounded by DISTINCT values, not rows —
    * and the percentile then reads off a cumulative window over the
    * (small) histogram. Value reconstruction k/scale is the correctly-
    * rounded double of the same decimal the source column stores, and the
    * interpolation replays `percentile`'s exact expression, so the result
    * matches the generic path through the round-6 contract (pinned by
    * QualitySpec on both the medians and the full scored frame).
    *
    * `scale`: 10^decimals of the column (100 for 2-dp money). The MAD
    * pass runs at 2·scale — |x − med| is a multiple of 1/(2·scale)
    * because an interpolated median can land on a half-step. Rows whose
    * value is NULL score NULL/false exactly like the generic path. */
  def robustOutliersFixedPoint(df: DataFrame, groupCol: String,
                               valueCol: String, threshold: Double,
                               scale: Long = 100L): DataFrame = {
    require(threshold > 0, s"threshold must be > 0: $threshold")
    require(scale > 0, s"scale must be > 0: $scale")
    // ONE data-sized pass total: the exact (group, key) histogram. Both
    // medians read off it — the MAD's input |x − med| is a deterministic
    // FOLD of this histogram around the median (at doubled key scale, so
    // half-step medians stay integral), so the second percentile never
    // touches the data again. Histogram cardinality is bounded by
    // min(rows, groups × value range) — for a fixed-scale money column
    // that is range-bounded, data-independent; worst case it is one
    // SHUFFLE of n narrow rows, never a per-group in-memory multiset.
    val hist = df.select(col(groupCol),
        round(col(valueCol) * scale).cast("long").as("__k"))
      .filter(col("__k").isNotNull)
      .groupBy(col(groupCol), col("__k")).agg(count(lit(1)).as("__c"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // med/mad feed several consumers each — persist the ≤|groups|-row
    // frames so the selection underneath runs once, not per consumer
    val med = selectMedian(hist, groupCol, scale, "med")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // NO broadcast hints on the med/mad joins: the frames are |groups|-
    // sized, and a forced broadcast of a high-cardinality group column
    // would blow the driver exactly where the histogram pass scales fine.
    // AQE still converts these to broadcast at runtime whenever the
    // materialized side is actually small — the common case — so the hint
    // bought nothing the stats don't (ADVICE r11).
    val folded = hist.join(med, Seq(groupCol))
      .select(col(groupCol),
        abs(col("__k") * 2 - round(col("med") * (2 * scale)).cast("long"))
          .as("__k"),
        col("__c"))
      .groupBy(col(groupCol), col("__k")).agg(sum(col("__c")).as("__c"))
    val mad = selectMedian(folded, groupCol, 2 * scale, "mad")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // left joins: a group whose values are all NULL has no keyed row;
    // the generic path keeps its rows with a NULL median — match it
    df.select(col(groupCol), col(valueCol))
      .join(med.join(mad, Seq(groupCol)), Seq(groupCol), "left")
      .withColumn("robust_z",
        when(col("mad") > 0, (col(valueCol) - col("med")) / col("mad")))
      .withColumn("is_outlier", coalesce(abs(col("robust_z")) > threshold, lit(false)))
  }

  /** Exact interpolated p=0.5 percentile per group over a histogram
    * `(groupCol, __k, __c)` by TWO-LEVEL range selection — the shape that
    * needs no per-group sort: (1) counts per 4096-key coarse bucket
    * (histogram-sized aggregate), (2) a cumulative window over that TINY
    * bucket frame locates which bucket holds each of the two order
    * statistics at floor/ceil of 0.5·(n−1), (3) only the target buckets'
    * histogram rows (broadcast semi-join) yield the exact keys,
    * (4) `percentile`'s own interpolation expression on k/scale doubles,
    * rounded to 6. Every frame after the input histogram is bucket- or
    * target-sized — at 100 TB the group count and value range bound the
    * state, never the row count. */
  private def selectMedian(hist: DataFrame, groupCol: String,
                           scale: Long, out: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val bucketed = hist.withColumn("__b", expr("__k >> 12"))
    val coarse = bucketed.groupBy(col(groupCol), col("__b"))
      .agg(sum(col("__c")).as("__c"))
    // n rides in the SAME window pass as the cumulative count (whole-
    // partition frame) — a separate n aggregate + broadcast join cost two
    // more exchanges and, under AQE, two more per-query job barriers,
    // which is where this operator's wall actually lives at serving SFs
    val wb = Window.partitionBy(col(groupCol)).orderBy(col("__b"))
    val wn = Window.partitionBy(col(groupCol))
    val hitBLo = col("__cs") <= col("__loIdx") && col("__loIdx") < col("__ce")
    val hitBHi = col("__cs") <= col("__hiIdx") && col("__hiIdx") < col("__ce")
    val targets = coarse.withColumn("__ce", sum(col("__c")).over(wb))
      .withColumn("__cs", col("__ce") - col("__c"))
      .withColumn("__n", sum(col("__c")).over(wn))
      .withColumn("__pos", (col("__n") - 1).cast("double") * 0.5)
      .withColumn("__loIdx", floor(col("__pos")).cast("long"))
      .withColumn("__hiIdx", ceil(col("__pos")).cast("long"))
      .filter(hitBLo || hitBHi)
      .select(col(groupCol), col("__b"), col("__cs"), col("__pos"),
        col("__loIdx"), col("__hiIdx"))
      .distinct() // lo and hi in one bucket → one row, not a join fan-out
    val wf = Window.partitionBy(col(groupCol), col("__b")).orderBy(col("__k"))
    // hist is already one row per (group, key): the target buckets' rows
    // go straight under the cumulative window, no re-aggregation
    val fine = bucketed.join(targets, Seq(groupCol, "__b"))
      .withColumn("__gce", col("__cs") + sum(col("__c")).over(wf))
      .withColumn("__gcs", col("__gce") - col("__c"))
    val hitLo = col("__gcs") <= col("__loIdx") && col("__loIdx") < col("__gce")
    val hitHi = col("__gcs") <= col("__hiIdx") && col("__hiIdx") < col("__gce")
    fine.filter(hitLo || hitHi)
      .groupBy(col(groupCol))
      .agg(
        max(when(hitLo, col("__k"))).as("__klo"),
        max(when(hitHi, col("__k"))).as("__khi"),
        first(col("__pos")).as("__p"),
        first(col("__loIdx")).as("__lo"),
        first(col("__hiIdx")).as("__hi"))
      .select(col(groupCol),
        round(
          // percentile's exact form: lowerValue when the indices agree,
          // else lower·(hiIdx − pos) + higher·(pos − loIdx)
          when(col("__lo") === col("__hi"), col("__klo").cast("double") / scale)
            .otherwise(
              (col("__klo").cast("double") / scale) *
                (col("__hi").cast("double") - col("__p")) +
              (col("__khi").cast("double") / scale) *
                (col("__p") - col("__lo").cast("double"))),
          6).as(out))
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

  /** One-pass Pearson correlation matrix over fixed-point numeric columns —
    * the profiling view that tells an analyst which measures move together
    * before they model anything.
    *
    * `cols` maps column name → per-row fixed-point scale (100 for 2-dp money,
    * 1 for integral). Each value quantizes to an exact BIGINT per row;
    * all first/second moments (Σx, Σx², Σxy) accumulate as DECIMAL(38,0)
    * (Σx² of 600M rows of 10⁷-cent values ≈ 6·10¹⁹ overflows BIGINT), so
    * every cross-partition sum is exact integer math. The correlation is
    * then a fixed sequence of IEEE double ops on those exact sums — both
    * engines convert the same exact integer to the same double — rounded to
    * 6 decimals. ONE hash aggregate produces every moment for all k(k−1)/2
    * pairs: a 100 TB profile is a single map-side-combining scan. */
  def correlationMatrix(df: DataFrame, cols: Seq[(String, Long)]): DataFrame = {
    require(cols.size >= 2, "need at least two columns")
    val q = df.select(cols.map { case (c, scale) =>
      expr(s"CAST(round(($c) * ${scale}L) AS BIGINT)").as(s"__$c")
    }: _*)
    val moments =
      Seq(count(lit(1)).cast("double").as("__n")) ++
      cols.flatMap { case (c, _) =>
        // cast each operand to DECIMAL(38,0) BEFORE the multiply (mirroring
        // the oracle's HUGEINT-first order): a BIGINT*BIGINT product of
        // quantized magnitudes above ~3.04e9 would overflow — wrapping
        // silently under non-ANSI settings — before the wider cast applied
        val d = col(s"__$c").cast("decimal(38,0)")
        Seq(sum(d).cast("double").as(s"__s_$c"),
            sum(d * d).cast("double").as(s"__ss_$c")) } ++
      cols.combinations(2).map { case Seq((a, _), (b, _)) =>
        sum(col(s"__$a").cast("decimal(38,0)") * col(s"__$b").cast("decimal(38,0)"))
          .cast("double").as(s"__sp_${a}_$b")
      }.toSeq
    val m = q.agg(moments.head, moments.tail: _*)
    val pairs = cols.combinations(2).map { case Seq((a, _), (b, _)) =>
      struct(
        lit(a).as("col_x"), lit(b).as("col_y"),
        round(
          (col("__n") * col(s"__sp_${a}_$b") - col(s"__s_$a") * col(s"__s_$b")) /
            (sqrt(col("__n") * col(s"__ss_$a") - col(s"__s_$a") * col(s"__s_$a")) *
             sqrt(col("__n") * col(s"__ss_$b") - col(s"__s_$b") * col(s"__s_$b"))), 6)
          .as("corr"))
    }.toSeq
    m.select(explode(array(pairs: _*)).as("p"))
      .select(col("p.col_x"), col("p.col_y"), col("p.corr"))
      .orderBy(col("col_x"), col("col_y"))
  }

  /** Benford first-digit audit of a positive money column — the classic
    * fabricated-numbers screen. Digit = first character of the exact
    * integer cents (leading digit is invariant under the ×100 scaling).
    * Expected shares log10(1+1/d) are engine-independent literals; the
    * observed share is an integer-division double; deviations fix-point to
    * integer micros so the total deviation is an exact integer sum (never
    * a cross-row double sum). One map-side-combining aggregate over 9
    * groups — flat at any scale. */
  def benfordAudit(df: DataFrame, valueCol: String): DataFrame = {
    // filter on the ROUNDED cents, not the raw value: a value in (0, 0.005)
    // rounds to 0 cents and would yield digit 0 — a row the digit-1..9
    // expected-share join can't score (the oracle's inner join drops it;
    // both engines now exclude it symmetrically)
    val digits = df
      .filter(expr(s"CAST(round(($valueCol) * 100) AS BIGINT) > 0"))
      .select(substring(expr(s"CAST(round(($valueCol) * 100) AS BIGINT)").cast("string"), 1, 1)
        .cast("int").as("digit"))
      .groupBy(col("digit")).agg(count(lit(1)).as("n_obs"))
    val expected = benfordExpected.foldLeft(lit(null).cast("double")) {
      case (acc, (d, e)) => when(col("digit") === d, lit(e)).otherwise(acc)
    }
    val total = Window.partitionBy()
    digits
      .withColumn("obs_share",
        col("n_obs").cast("double") / sum(col("n_obs")).over(total).cast("double"))
      .withColumn("exp_share", expected)
      .withColumn("dev_micros",
        round(abs(col("obs_share") - col("exp_share")) * 1e6).cast("long"))
      .withColumn("total_dev_micros", sum(col("dev_micros")).over(total))
      .select(col("digit"), col("n_obs"), round(col("obs_share"), 6).as("obs_share"),
        col("exp_share"), col("dev_micros"), col("total_dev_micros"))
      .orderBy(col("digit"))
  }

  /** log10(1+1/d) for d=1..9 — fixed literals shared with the oracle SQL
    * so no engine ever computes a logarithm. */
  val benfordExpected: Seq[(Int, Double)] = Seq(
    1 -> 0.301029995663981, 2 -> 0.176091259055681, 3 -> 0.124938736608300,
    4 -> 0.096910013008056, 5 -> 0.079181246047625, 6 -> 0.066946789630613,
    7 -> 0.057991946977687, 8 -> 0.051152522447381, 9 -> 0.045757490560675)

  /** Population-stability-index drift between two snapshots of a numeric
    * column — the standard "did this distribution move" monitor between
    * corpus versions / model-feature generations.
    *
    * Values bin into `nBins` equi-width bins of `binWidth` (last bin open);
    * both sides add-one smooth (c+1)/(n+nBins) so empty bins stay finite.
    * PSI = Σ_bins (p − q)·ln(p/q). Exactness: the ln argument is a ratio of
    * exact integers evaluated in one double division; each bin's
    * contribution fix-points to integer micros before the cross-bin sum
    * (the charEntropy/q55 recipe), so the total is an exact integer sum.
    * Two aggregates over ≤ nBins rows each + a broadcast of two scalar
    * counts — a 100 TB drift check is two map-side-combining scans. */
  def psiDrift(dfA: DataFrame, dfB: DataFrame, valueCol: String,
               binWidth: Long, nBins: Int): DataFrame = {
    require(binWidth > 0 && nBins > 1, "binWidth > 0 and nBins > 1 required")
    // clamp BOTH ends: negative values land in bin 0 (mirroring the
    // least() clamp on the high end) instead of a negative bin that the
    // 0..nBins-1 scaffold's left join would silently drop — a drift
    // monitor must never quietly ignore part of the distribution
    def binned(df: DataFrame, cnt: String): DataFrame =
      df.select(greatest(least(expr(s"CAST(($valueCol) AS BIGINT) div ${binWidth}L"),
          lit(nBins - 1L)), lit(0L)).as("bin"))
        .groupBy(col("bin")).agg(count(lit(1)).as(cnt))
    val a = binned(dfA, "c_a")
    val b = binned(dfB, "c_b")
    val allBins = dfA.sparkSession.range(nBins).select(col("id").as("bin"))
    val w = Window.partitionBy()
    allBins
      .join(a, Seq("bin"), "left").join(b, Seq("bin"), "left")
      .withColumn("c_a", coalesce(col("c_a"), lit(0L)))
      .withColumn("c_b", coalesce(col("c_b"), lit(0L)))
      .withColumn("__na", sum(col("c_a")).over(w))
      .withColumn("__nb", sum(col("c_b")).over(w))
      // smoothed shares p, q and the ln of their exact-integer ratio:
      // (c_a+1)·(n_b+K) / ((c_b+1)·(n_a+K)) — integer products are exact
      // (counts ≪ 2⁶³ post-product at any real scale), one double division
      .withColumn("__p",
        (col("c_a") + 1).cast("double") / (col("__na") + nBins).cast("double"))
      .withColumn("__q",
        (col("c_b") + 1).cast("double") / (col("__nb") + nBins).cast("double"))
      .withColumn("__lnr",
        log(((col("c_a") + 1) * (col("__nb") + nBins)).cast("double") /
            ((col("c_b") + 1) * (col("__na") + nBins)).cast("double")))
      .withColumn("psi_term_micros",
        round((col("__p") - col("__q")) * col("__lnr") * 1e6).cast("long"))
      .withColumn("psi_total_micros", sum(col("psi_term_micros")).over(w))
      .select(col("bin"), col("c_a"), col("c_b"),
        round(col("__p"), 6).as("p_a"), round(col("__q"), 6).as("p_b"),
        col("psi_term_micros"), col("psi_total_micros"))
      .orderBy(col("bin"))
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

  /** Sample-sketched quantiles: per group, quantile estimates from the
    * `graft_bks` bottom-k uniform sample (the k rows with the smallest
    * md5-derived hashes — deterministic, mergeable, O(k)/group state)
    * instead of the exact `percentile`'s collect-and-sort of EVERY group
    * value. The scale quantile path next to q28's histogram sketch: one
    * map-side-combining pass over rows; the interpolation then runs on a
    * ≤ k-row frame per group. Groups with ≤ k rows are sampled whole, so
    * their estimates are EXACT (spec-asserted).
    *
    * `rowKeySql` must be a unique row key (its md5 is the sampling
    * coin-flip); `valueCol` is money-ish (cents-quantized with the q02
    * idiom — sums/orderings exact). `qs` maps output column name →
    * quantile. Fully value-oracled (q102): the sample itself is a pure
    * function of the input set, so DuckDB re-derives the identical k rows
    * and the identical interpolation. */
  def sampledQuantiles(df: DataFrame, groupCols: Seq[String], valueCol: String,
                       rowKeySql: String, k: Int,
                       qs: Seq[(String, Double)]): DataFrame = {
    graft.functions.GraftFunctions.register(df.sparkSession)
    val pre = df.select(
      groupCols.map(col) ++ Seq(
        expr(s"CAST(conv(substr(md5(CAST(($rowKeySql) AS STRING)), 1, 15), 16, 10) AS BIGINT)")
          .as("__h"),
        expr(s"CAST(round($valueCol * 100) AS BIGINT)").as("__c")): _*)
    val sk = pre.groupBy(groupCols.map(col): _*)
      .agg(expr(s"graft_bks(__h, __c, $k)").as("__s"), count(lit(1)).as("n_rows"))
    val ex = sk.select(
      groupCols.map(col) ++ Seq(col("n_rows"),
        col("__s.n_sampled").as("n_sampled"),
        explode(col("__s.vals")).as("__v")): _*)
    val aggs = qs.map { case (name, q) =>
      // single-interpolation-multiply discipline (q44): percentile over
      // exact integer cents, ONE /100 scale-down, round 6 — the identical
      // double-op sequence DuckDB's quantile_cont side performs
      round(expr(s"percentile(__v, ${q}D)") / 100, 6).as(name)
    }
    ex.groupBy(groupCols.map(col) ++ Seq(col("n_rows"), col("n_sampled")): _*)
      .agg(aggs.head, aggs.tail: _*)
  }
}
