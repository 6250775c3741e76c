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
}
