package graft.model

import org.apache.spark.sql.types._

/** Declared StructTypes for the coffee-chain tables (SURVEY.md §1.2; DDL at
  * `scripts/database/create_table.py`). The reference infers these from JDBC
  * metadata / parquet footers; we declare them so sources are
  * schema-on-write and drift is detectable (Quality.schemaDrift). */
object Schemas {

  val stores: StructType = StructType(Seq(
    StructField("id", IntegerType, nullable = false),
    StructField("name", StringType),
    StructField("address", StringType),
    StructField("district", StringType),
    StructField("city", StringType),
    StructField("updated_at", TimestampType)))

  val paymentMethod: StructType = StructType(Seq(
    StructField("id", IntegerType, nullable = false),
    StructField("method_name", StringType),
    StructField("bank", StringType),
    StructField("updated_at", TimestampType)))

  val productCategory: StructType = StructType(Seq(
    StructField("id", IntegerType, nullable = false),
    StructField("name", StringType),
    StructField("updated_at", TimestampType)))

  val products: StructType = StructType(Seq(
    StructField("id", StringType, nullable = false),
    StructField("name", StringType),
    StructField("category_id", IntegerType),
    StructField("unit_price", LongType), // int money in VND → LongType (ANSI-safe)
    StructField("updated_at", TimestampType)))

  val customers: StructType = StructType(Seq(
    StructField("id", IntegerType, nullable = false),
    StructField("name", StringType),
    StructField("phone_number", LongType),
    StructField("tier", StringType), // ENUM('regular','silver','gold','diamond')
    StructField("updated_at", TimestampType)))

  val orders: StructType = StructType(Seq(
    StructField("id", StringType, nullable = false),
    StructField("timestamp", TimestampType),
    StructField("customer_id", IntegerType),
    StructField("store_id", IntegerType),
    StructField("payment_method_id", IntegerType),
    StructField("num_products", IntegerType)))

  val orderDetails: StructType = StructType(Seq(
    StructField("order_id", StringType, nullable = false),
    StructField("product_id", StringType),
    StructField("quantity", IntegerType),
    StructField("discount_percent", IntegerType),
    StructField("subtotal", LongType),
    StructField("is_suggestion", BooleanType)))

  /** Kafka suggestion payload (`bronze_dimension_fact_load.py:120-127`). */
  val suggestionPayload: StructType = StructType(Seq(
    StructField("order_id", StringType, nullable = false),
    StructField("product_id", StringType, nullable = false),
    StructField("quantity", IntegerType),
    StructField("discount_percent", IntegerType),
    StructField("subtotal", IntegerType),
    StructField("is_suggestion", BooleanType)))
}
