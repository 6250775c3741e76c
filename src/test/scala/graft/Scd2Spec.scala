package graft

import org.apache.spark.sql.functions._
import graft.operators.Scd2

/** SCD2 merge semantics on the coffee-chain payment_method fixture
  * (FIXTURES.md §1): three generations — initial load, one attribute
  * change, then a brand-new key + a no-op redelivery. */
class Scd2Spec extends SparkSpec {
  import scala.jdk.CollectionConverters._
  import org.apache.spark.sql.{Row, DataFrame}
  import org.apache.spark.sql.types._

  private val schema = StructType(Seq(
    StructField("method_id", IntegerType),
    StructField("method_name", StringType),
    StructField("bank", StringType)))

  private def df(rows: (Int, String, String)*): DataFrame =
    spark.createDataFrame(
      rows.map(r => Row(r._1, r._2, r._3)).asJava, schema)

  private val attrs = Seq("method_name", "bank")

  test("initial load marks all rows current and open-ended") {
    val t = Scd2.initialLoad(df((1, "card", "Vietcombank"), (2, "cash", null)),
      lit("2024-01-01"))
    assert(t.count() == 2)
    assert(t.filter(col("is_current") && col("end_date").isNull).count() == 2)
  }

  test("attribute change closes old version and inserts new one") {
    val t0 = Scd2.initialLoad(df((1, "card", "Vietcombank"), (2, "cash", "ACB")),
      lit("2024-01-01"))
    val merged = Scd2.merge(t0, df((1, "card", "ACB"), (2, "cash", "ACB")),
      "method_id", attrs, lit("2024-06-01"))
    val m1 = merged.filter(col("method_id") === 1).collect()
    assert(m1.length == 2)
    val closed = m1.find(!_.getAs[Boolean]("is_current")).get
    assert(closed.getAs[String]("bank") == "Vietcombank")
    assert(closed.getAs[java.sql.Date]("end_date").toString == "2024-06-01")
    val cur = m1.find(_.getAs[Boolean]("is_current")).get
    assert(cur.getAs[String]("bank") == "ACB")
    assert(cur.getAs[java.sql.Date]("start_date").toString == "2024-06-01")
    // untouched key stays single-version
    assert(merged.filter(col("method_id") === 2).count() == 1)
  }

  test("new key inserts; hash-equal redelivery is a no-op") {
    val t0 = Scd2.initialLoad(df((1, "card", "Vietcombank")), lit("2024-01-01"))
    val merged = Scd2.merge(t0,
      df((1, "card", "Vietcombank"), // no-op redelivery
         (3, "qr", "ACB")),          // brand-new key
      "method_id", attrs, lit("2024-06-01"))
    assert(merged.filter(col("method_id") === 1).count() == 1)
    val r1 = merged.filter(col("method_id") === 1).head()
    assert(r1.getAs[java.sql.Date]("start_date").toString == "2024-01-01")
    val r3 = merged.filter(col("method_id") === 3).head()
    assert(r3.getAs[Boolean]("is_current"))
    assert(r3.getAs[java.sql.Date]("start_date").toString == "2024-06-01")
  }

  test("invariants hold over chained merges: one current row per key, end_date iff superseded") {
    val t0 = Scd2.initialLoad(df((1, "card", "A"), (2, "cash", "B")), lit("2024-01-01"))
    val t1 = Scd2.merge(t0, df((1, "card", "B"), (2, "cash", "B"), (3, "qr", "C")),
      "method_id", attrs, lit("2024-02-01"))
    val t2 = Scd2.merge(t1, df((1, "card", "C"), (3, "qr", "D")),
      "method_id", attrs, lit("2024-03-01"))
    val perKey = t2.groupBy(col("method_id"))
      .agg(sum(col("is_current").cast("int")).as("n_cur"), count(lit(1)).as("n"))
    assert(perKey.filter(col("n_cur") =!= 1).count() == 0)
    assert(t2.filter(col("is_current") && col("end_date").isNotNull).count() == 0)
    assert(t2.filter(!col("is_current") && col("end_date").isNull).count() == 0)
    // key 1 versioned 3×, key 3 versioned 2×, key 2 untouched
    assert(t2.filter(col("method_id") === 1).count() == 3)
    assert(t2.filter(col("method_id") === 3).count() == 2)
    assert(t2.filter(col("method_id") === 2).count() == 1)
  }

  test("scalable hash keys are unique across versions") {
    val t0 = Scd2.initialLoad(df((1, "card", "A"), (2, "cash", "B")), lit("2024-01-01"))
    val t1 = Scd2.merge(t0, df((1, "card", "B")), "method_id", attrs, lit("2024-02-01"))
    val keyed = Scd2.scalableKey(t1, "method_id", "dim_key")
    assert(keyed.select("dim_key").distinct().count() == keyed.count())
  }

  test("scalableKey collision check fails loudly when the hash collides") {
    val t0 = Scd2.initialLoad(df((1, "card", "A"), (2, "cash", "B")), lit("2024-01-01"))
    val t1 = Scd2.merge(t0, df((1, "card", "B")), "method_id", attrs, lit("2024-02-01"))
    // force a collision through the test seam: a constant "hash" maps every
    // distinct (key, start_date) input to one surrogate value
    val ex = intercept[IllegalStateException] {
      Scd2.scalableKeyWith(t1, "method_id", "dim_key", lit(42L), check = true)
    }
    assert(ex.getMessage.contains("collision"))
    // same degenerate hash with check=false passes through unguarded
    assert(Scd2.scalableKeyWith(t1, "method_id", "dim_key", lit(42L), check = false)
      .count() == 3)
    // and the real hash passes the check on the same frame
    assert(Scd2.scalableKey(t1, "method_id", "dim_key").count() == 3)
  }
}
