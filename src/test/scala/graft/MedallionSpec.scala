package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.apache.spark.sql.Row
import graft.model.Schemas
import graft.pipeline.Medallion

/** End-to-end medallion pipeline on a synthesized coffee-chain fixture:
  * bronze incremental append → silver cleaning → gold SCD2 + fact, with a
  * second incremental run mutating a dimension (FIXTURES.md §1). */
class MedallionSpec extends SparkSpec {
  import scala.jdk.CollectionConverters._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  private lazy val root = Files.createTempDirectory("medallion").toString
  private lazy val conf = Medallion.Config(s"$root/bronze", s"$root/silver", s"$root/gold")

  private def sources(run: Int) = {
    val storeRows = Seq(
      Row(1, "Kofi D1", "12 Le Loi", "D1", "HCMC\r", ts("2024-01-01 08:00:00")),
      Row(2, "Kofi D3", "5 CMT8", "D3", "HCMC", ts("2024-01-01 08:00:00"))) ++
      (if (run > 1) Seq(Row(1, "Kofi D1", "99 New Addr", "D1", "HCMC",
        ts("2024-02-01 08:00:00"))) else Nil)
    val payRows = Seq(
      Row(1, "card", "ACB", ts("2024-01-01 08:00:00")),
      Row(2, "cash", "null\r", ts("2024-01-01 08:00:00")))
    val prodRows = Seq(
      Row("P1", "espresso", 1, 30000L, ts("2024-01-01 08:00:00")),
      Row("P2", "latte", 1, 45000L, ts("2024-01-01 08:00:00")))
    val custRows = Seq(Row(10, "An", 84901234567L, "diamond", ts("2024-01-01 08:00:00")))
    val orderRows =
      if (run == 1) Seq(Row("O1", ts("2024-01-05 09:00:00"), 10, 1, 1, 2))
      else Seq(Row("O2", ts("2024-02-05 10:00:00"), 10, 2, 2, 1))
    val detailRows =
      if (run == 1) Seq(
        Row("O1", "P1", 1, 0, 30000L, false),
        Row("O1", "P2", 2, 0, 90000L, false))
      else Seq(Row("O2", "P2", 1, 10, 40500L, true))
    Map(
      "stores" -> spark.createDataFrame(storeRows.asJava, Schemas.stores),
      "payment_method" -> spark.createDataFrame(payRows.asJava, Schemas.paymentMethod),
      "products" -> spark.createDataFrame(prodRows.asJava, Schemas.products),
      "customers" -> spark.createDataFrame(custRows.asJava, Schemas.customers),
      "orders" -> spark.createDataFrame(orderRows.asJava, Schemas.orders),
      "order_details" -> {
        // details carry the order timestamp for incremental partitioning
        val d = spark.createDataFrame(detailRows.asJava, Schemas.orderDetails)
        val o = spark.createDataFrame(orderRows.asJava, Schemas.orders)
          .select(col("id").as("order_id"), col("timestamp").as("updated_at"))
        d.join(o, "order_id")
      })
  }

  test("full run then incremental run: cleaning, SCD2 versioning, fact keys") {
    val r1 = Medallion.run(spark, sources(1), conf)
    assert(r1("bronze_dq_failures") == Seq.empty)
    assert(r1("silver_dq_failures") == Seq.empty)
    assert(r1("gold_fact_rows") == 2L)

    // silver cleaning: \r stripped, "null\r" → real NULL
    val pay = spark.read.parquet(s"${conf.silverRoot}/payment_method")
    assert(pay.filter(col("id") === 2).head().isNullAt(pay.columns.indexOf("bank")))
    val st = spark.read.parquet(s"${conf.silverRoot}/stores")
    assert(st.filter(col("city") =!= "HCMC").count() == 0)

    // gold fact carries surrogate keys for all three dims
    val fact = spark.read.parquet(s"${conf.goldRoot}/fact_orders")
    assert(fact.filter(col("store_key").isNull || col("payment_key").isNull ||
      col("product_key").isNull).count() == 0)
    // partition layout exists (K1/K4 discipline)
    assert(new java.io.File(s"${conf.goldRoot}/fact_orders/year=2024/month=1/day=5").exists())

    // --- run 2: store 1 address changes; one new order appended
    val r2 = Medallion.run(spark, sources(2), conf)
    val dimStores = spark.read.parquet(s"${conf.goldRoot}/dim_stores")
    assert(dimStores.filter(col("id") === 1).count() == 2) // SCD2 versioned
    assert(dimStores.filter(col("id") === 1 && col("is_current")).head()
      .getAs[String]("address") == "99 New Addr")
    assert(dimStores.filter(col("id") === 2).count() == 1) // untouched
    val fact2 = spark.read.parquet(s"${conf.goldRoot}/fact_orders")
    assert(fact2.count() == 3) // incremental append, no reprocessing
    assert(r2("gold_fact_rows") == 3L)
  }
}
