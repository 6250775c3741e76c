package graft

import org.apache.spark.sql.functions._
import graft.operators.Quality

/** DQ rule engine on the seeded-dirty fixture (FIXTURES.md §1): >5% nulls,
  * duplicated PKs, negative price, schema drift. */
class QualitySpec extends SparkSpec {

  private def dirty = {
    import spark.implicits._
    // 10 rows: 2 null banks (20% > 5%), duplicate id 1, one negative price
    Seq(
      (1, Option("ACB"), 100.0), (1, Option("ACB"), 100.0),
      (2, None, 50.0), (3, None, 75.0),
      (4, Option("VCB"), -10.0), (5, Option("VCB"), 80.0),
      (6, Option("TPB"), 60.0), (7, Option("TPB"), 90.0),
      (8, Option("ACB"), 70.0), (9, Option("ACB"), 30.0)
    ).toDF("id", "bank", "price")
  }

  test("null-rate, uniqueness and min checks flag the seeded dirt") {
    val res = Quality.evaluate(dirty, Seq(
      Quality.NullRate("t", "bank", 0.05),
      Quality.Uniqueness("t", "id", 1.0),
      Quality.MinValue("t", "price", 0.0),
      Quality.Completeness("t", "id", 1.0)))
      .collect().map(r => r.getString(0) -> r.getBoolean(2)).toMap
    assert(!res("t.null_rate.bank"))    // 20% nulls > 5%
    assert(!res("t.uniqueness.id"))     // dup id 1
    assert(!res("t.min.price"))         // -10 < 0
    assert(res("t.completeness.id"))    // id fully populated
  }

  test("metrics are exact ratios") {
    val m = Quality.evaluate(dirty, Seq(Quality.NullRate("t", "bank", 0.05)))
      .head().getDouble(1)
    assert(m == 0.2)
  }

  test("schema drift reports added/removed/retyped columns") {
    import spark.implicits._
    val v1 = Seq((1, "a")).toDF("id", "name")
    val v2 = Seq((1L, true)).toDF("id", "flag")
    val snapshot = Quality.schemaSnapshot(v1)
    val drift = Quality.schemaDrift(v2, snapshot)
    assert(drift.contains("added: flag"))
    assert(drift.contains("removed: name"))
    assert(drift.exists(_.startsWith("retyped: id int -> bigint")))
    assert(Quality.schemaDrift(v1, snapshot).isEmpty)
  }

  test("histogramCents: exact cent binning, edges, empty bins absent") {
    import spark.implicits._
    val df = Seq(0.00, 9.99, 10.00, 10.01, 25.50, 25.50).toDF("price")
    val out = Quality.histogramCents(df, "price", binWidthCents = 1000L)
      .collect().map(r => r.getAs[Long]("bin") ->
        (r.getAs[Double]("lo"), r.getAs[Double]("hi"), r.getAs[Long]("n_rows"))).toMap
    assert(out(0L) == ((0.0, 10.0, 2L)))   // 0.00, 9.99; 10.00 goes to bin 1
    assert(out(1L) == ((10.0, 20.0, 2L)))  // 10.00, 10.01
    assert(out(2L) == ((20.0, 30.0, 2L)))  // both 25.50
    assert(out.size == 3)
  }

  test("robustOutliers: MAD flags the wild value a mean/stddev would absorb") {
    import spark.implicits._
    // group g: 1..9 plus 100 → median 5.5, MAD of |x-5.5| = 2.5
    val df = ((1 to 9).map(_.toDouble) :+ 100.0).map(("g", _)).toDF("grp", "v")
    val out = Quality.robustOutliers(df, "grp", "v", threshold = 3.5)
      .collect().map(r => r.getAs[Double]("v") -> r).toMap
    assert(out(100.0).getAs[Double]("med") == 5.5)
    assert(out(100.0).getAs[Double]("mad") == 2.5)
    assert(out(100.0).getAs[Double]("robust_z") == (100.0 - 5.5) / 2.5)
    assert(out(100.0).getAs[Boolean]("is_outlier"))
    assert((1 to 9).forall(i => !out(i.toDouble).getAs[Boolean]("is_outlier")))
    // constant group: MAD 0 → null score, nothing flagged
    val const = Seq(("c", 7.0), ("c", 7.0), ("c", 7.0)).toDF("grp", "v")
    val c = Quality.robustOutliers(const, "grp", "v", 3.5).collect()
    assert(c.forall(r => r.isNullAt(r.fieldIndex("robust_z"))))
    assert(c.forall(r => !r.getAs[Boolean]("is_outlier")))
  }

  test("robustOutliersFixedPoint ≡ robustOutliers on 2-dp data (round-6)") {
    import spark.implicits._
    // the histogram-percentile path must reproduce the generic
    // (percentile-aggregate) path value-for-value on fixed-scale data:
    // same hand-checked case, plus real lineitem money across 3 groups
    val df = ((1 to 9).map(_.toDouble) :+ 100.0).map(("g", _)).toDF("grp", "v")
    val fp = Quality.robustOutliersFixedPoint(df, "grp", "v", 3.5)
      .collect().map(r => r.getAs[Double]("v") -> r).toMap
    assert(fp(100.0).getAs[Double]("med") == 5.5)
    assert(fp(100.0).getAs[Double]("mad") == 2.5)
    assert(fp(100.0).getAs[Boolean]("is_outlier"))
    assert((1 to 9).forall(i => !fp(i.toDouble).getAs[Boolean]("is_outlier")))

    val li = graft.sources.Tables.lineitem(spark, "/root/testdata/sf0.001")
      .select(col("l_returnflag"), col("l_extendedprice"))
    def key(r: org.apache.spark.sql.Row) =
      (r.getAs[String]("l_returnflag"), r.getAs[Double]("l_extendedprice"),
        r.getAs[Double]("med"), r.getAs[Double]("mad"),
        Option(r.getAs[java.lang.Double]("robust_z")).map(z => math.rint(z * 1e6)),
        r.getAs[Boolean]("is_outlier"))
    val a = Quality.robustOutliers(li, "l_returnflag", "l_extendedprice", 3.5)
      .collect().map(key).sortBy(_.toString)
    val b = Quality.robustOutliersFixedPoint(li, "l_returnflag", "l_extendedprice", 3.5)
      .collect().map(key).sortBy(_.toString)
    assert(a.length == b.length && a.sameElements(b),
      "fixed-point path diverged from the generic percentile path")
    // odd/even group sizes + an all-NULL-value group keeps its rows with
    // NULL med/mad (the generic path's left-behavior)
    val withNull = Seq(("a", Some(1.00)), ("a", Some(2.00)), ("a", Some(4.00)),
      ("b", None: Option[Double])).toDF("grp", "v")
    val nb = Quality.robustOutliersFixedPoint(withNull, "grp", "v", 3.5)
      .filter(col("grp") === "b").collect()
    assert(nb.length == 1 && nb.head.isNullAt(nb.head.fieldIndex("med")))
  }

  test("correlationMatrix: hand-checked corr, ±1 on linear columns, all pairs") {
    import spark.implicits._
    // y = 2x exactly (corr 1), z = -x (corr -1), w uncorrelated-ish
    val df = Seq(
      (1.0, 2.0, -1.0, 3.0), (2.0, 4.0, -2.0, 1.0),
      (3.0, 6.0, -3.0, 4.0), (4.0, 8.0, -4.0, 1.0),
      (5.0, 10.0, -5.0, 5.0)
    ).toDF("x", "y", "z", "w")
    val out = Quality.correlationMatrix(df,
        Seq("x" -> 100L, "y" -> 100L, "z" -> 100L, "w" -> 100L))
      .collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getDouble(2)).toMap
    assert(out.size == 6)
    assert(out(("x", "y")) == 1.0)
    assert(out(("x", "z")) == -1.0)
    assert(out(("y", "z")) == -1.0)
    // Pearson corr of x=(1..5), w=(3,1,4,1,5): cov-based hand computation
    val xs = Seq(1.0, 2.0, 3.0, 4.0, 5.0); val ws = Seq(3.0, 1.0, 4.0, 1.0, 5.0)
    val n = 5.0
    val num = n * xs.zip(ws).map { case (a, b) => a * b }.sum - xs.sum * ws.sum
    val den = math.sqrt(n * xs.map(a => a * a).sum - xs.sum * xs.sum) *
      math.sqrt(n * ws.map(a => a * a).sum - ws.sum * ws.sum)
    assert(math.abs(out(("x", "w")) - num / den) < 1e-6)
  }

  test("benfordAudit: digit extraction, exact shares, integer total deviation") {
    import spark.implicits._
    // 10 rows: first-cent-digits 1,1,1,1,2,2,3,9,1,5 (19.99 -> 1999 -> digit 1)
    val df = Seq(1.0, 10.5, 150.0, 0.19, 2.5, 25.0, 3.99, 9.0, 19.99, 5.55)
      .toDF("v")
    val out = Quality.benfordAudit(df, "v").collect()
      .map(r => r.getInt(0) -> r).toMap
    assert(out(1).getAs[Long]("n_obs") == 5L)
    assert(out(2).getAs[Long]("n_obs") == 2L)
    assert(out(3).getAs[Long]("n_obs") == 1L)
    assert(out(5).getAs[Long]("n_obs") == 1L)
    assert(out(9).getAs[Long]("n_obs") == 1L)
    assert(out(1).getAs[Double]("obs_share") == 0.5)
    // dev_micros(digit 1) = round(|0.5 - 0.301029995663981| * 1e6)
    assert(out(1).getAs[Long]("dev_micros") == 198970L)
    // one total over all digits, same on every row
    val totals = out.values.map(_.getAs[Long]("total_dev_micros")).toSet
    assert(totals.size == 1)
    assert(totals.head == out.values.map(_.getAs[Long]("dev_micros")).sum)
    // zero/negative values are excluded, digits 4/6/7/8 absent
    assert(!out.contains(4) && !out.contains(6))
  }

  test("psiDrift: identical distributions give ~0, a shifted one is large") {
    import spark.implicits._
    val a = (1 to 100).map(i => (i % 40).toDouble).toDF("v")
    val same = Quality.psiDrift(a, a, "v", binWidth = 5L, nBins = 10)
      .collect()
    // identical sides: p = q in every bin → every term is exactly 0
    assert(same.forall(_.getAs[Long]("psi_term_micros") == 0L))
    assert(same.head.getAs[Long]("psi_total_micros") == 0L)
    assert(same.length == 10)  // scaffold emits every bin, observed or not
    val b = (1 to 100).map(i => (i % 40 + 30).toDouble).toDF("v")
    val drift = Quality.psiDrift(a, b, "v", binWidth = 5L, nBins = 10)
      .collect().head.getAs[Long]("psi_total_micros")
    // a hard 30-unit shift: PSI far above the 0.2 "significant" rule of thumb
    assert(drift > 200000L)
  }

  test("correlationMatrix: quantized magnitudes past BIGINT-product range stay exact") {
    import spark.implicits._
    // x quantizes to ~4e9 at scale 100: x*x ≈ 1.6e19 > Long.MaxValue. The
    // decimal-first multiply keeps the moment exact; a BIGINT*BIGINT product
    // would overflow (throwing under ANSI, silently wrapping otherwise).
    val big = Seq((4.0e7, 8.0e7), (4.1e7, 8.2e7), (4.2e7, 8.4e7))
      .toDF("x", "y")
    val out = Quality.correlationMatrix(big, Seq("x" -> 100L, "y" -> 100L))
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getDouble(2)).toMap
    assert(out(("x", "y")) == 1.0) // y = 2x exactly
  }

  test("benfordAudit: sub-half-cent values round to 0 cents and are excluded") {
    import spark.implicits._
    // 0.004 rounds to 0 cents → digit 0 has no Benford expectation; both the
    // engine and the oracle's digit-1..9 join must drop it symmetrically
    val df = Seq(0.004, 0.002, 1.0, 2.0).toDF("v")
    val out = Quality.benfordAudit(df, "v").collect()
      .map(r => r.getInt(0) -> r).toMap
    assert(out.keySet == Set(1, 2))
    assert(out(1).getAs[Double]("obs_share") == 0.5) // of the 2 KEPT rows
  }

  test("psiDrift: negative values clamp into bin 0, never silently dropped") {
    import spark.implicits._
    val a = Seq(-12.0, -1.0, 3.0, 7.0, 23.0).toDF("v")
    val b = Seq(2.0, 4.0, 8.0, 23.0, 23.0).toDF("v")
    val out = Quality.psiDrift(a, b, "v", binWidth = 5L, nBins = 5)
      .collect().map(r => r.getAs[Long]("bin") -> r).toMap
    // bin 0 holds -12, -1 and 3 on side A (clamped), 2 and 4 on side B
    assert(out(0L).getAs[Long]("c_a") == 3L)
    assert(out(0L).getAs[Long]("c_b") == 2L)
    // every input row is accounted for in the per-side totals
    assert(out.values.map(_.getAs[Long]("c_a")).sum == 5L)
    assert(out.values.map(_.getAs[Long]("c_b")).sum == 5L)
  }
}
