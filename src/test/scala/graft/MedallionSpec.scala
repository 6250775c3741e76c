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
    val catRows = Seq(
      Row(1, "coffee", ts("2024-01-01 08:00:00")),
      Row(2, "tea", ts("2024-01-01 08:00:00")))
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
      "product_category" -> spark.createDataFrame(catRows.asJava, Schemas.productCategory),
      "products" -> spark.createDataFrame(prodRows.asJava, Schemas.products),
      "customers" -> spark.createDataFrame(custRows.asJava, Schemas.customers),
      "orders" -> spark.createDataFrame(orderRows.asJava, Schemas.orders),
      "order_details" -> {
        // details carry the order timestamp for incremental partitioning
        val d = spark.createDataFrame(detailRows.asJava, Schemas.orderDetails)
        val o = spark.createDataFrame(orderRows.asJava, Schemas.orders)
          .select(col("id").as("order_id"), col("timestamp").as("updated_at"))
        d.join(o, "order_id")
      },
      "order_suggestion_accepted" -> {
        // Kafka-drained accepted suggestions (run 1 only; empty later)
        val rows = if (run == 1) Seq(Row("O1", "P2", 1, 20, 36000L, true)) else Nil
        val d = spark.createDataFrame(rows.asJava, Schemas.orderDetails)
        val o = spark.createDataFrame(orderRows.asJava, Schemas.orders)
          .select(col("id").as("order_id"), col("timestamp").as("updated_at"))
        d.join(o, "order_id")
      })
  }

  test("full run then incremental run: cleaning, SCD2 versioning, fact keys") {
    val r1 = Medallion.run(spark, sources(1), conf)
    assert(r1("bronze_dq_failures") == Seq.empty)
    assert(r1("silver_dq_failures") == Seq.empty)
    assert(r1("gold_fact_rows") == 3L) // 2 order lines + 1 accepted suggestion

    // silver cleaning: \r stripped, "null\r" → real NULL
    val pay = spark.read.parquet(s"${conf.silverRoot}/payment_method")
    assert(pay.filter(col("id") === 2).head().isNullAt(pay.columns.indexOf("bank")))
    val st = spark.read.parquet(s"${conf.silverRoot}/stores")
    assert(st.filter(col("city") =!= "HCMC").count() == 0)
    // silver products carry the denormalized category NAME (ref join)
    val sp = spark.read.parquet(s"${conf.silverRoot}/products")
    assert(sp.columns.toSet ==
      Set("product_id", "product_name", "category", "unit_price", "updated_at"))
    assert(sp.filter(col("category") =!= "coffee").count() == 0)
    // ...and gold dim products versions over it
    val dp = Medallion.readGold(spark, s"${conf.goldRoot}/dim_products")
    assert(dp.filter(col("is_current")).select("category").distinct().head()
      .getString(0) == "coffee")

    // gold fact carries surrogate keys for all three dims
    val fact = spark.read.parquet(s"${conf.goldRoot}/fact_orders")
    assert(fact.filter(col("store_key").isNull || col("payment_key").isNull ||
      col("product_key").isNull).count() == 0)
    assert(fact.filter(col("is_suggestion")).count() == 1) // the accepted suggestion
    // partition layout exists (K1/K4 discipline)
    assert(new java.io.File(s"${conf.goldRoot}/fact_orders/year=2024/month=1/day=5").exists())

    // --- run 2: store 1 address changes; one new order appended
    val r2 = Medallion.run(spark, sources(2), conf)
    // the changed store row now legitimately appears twice in the bronze
    // APPEND layer (two updated_at generations) — the per-table rule map
    // must surface exactly that uniqueness violation and nothing else,
    // and the DAG continues (reference logs-and-continues behavior)
    assert(r2("bronze_dq_failures") == Seq("brz.stores.uniqueness.id"))
    // silver is a cleaning overwrite, NOT a dedupe (`silver_dimensions.py`
    // carries every bronze generation through) — so the silver suite warns
    // about the same key, exactly as the reference's validator would
    assert(r2("silver_dq_failures") == Seq("slv.stores.uniqueness.id"))
    val dimStores = Medallion.readGold(spark, s"${conf.goldRoot}/dim_stores")
    assert(dimStores.filter(col("id") === 1).count() == 2) // SCD2 versioned
    assert(dimStores.filter(col("id") === 1 && col("is_current")).head()
      .getAs[String]("address") == "99 New Addr")
    assert(dimStores.filter(col("id") === 2).count() == 1) // untouched
    val fact2 = spark.read.parquet(s"${conf.goldRoot}/fact_orders")
    assert(fact2.count() == 4) // incremental append: no reprocessing, no
                               // suggestion re-union (ref divergence note)
    // increment-only counting: run 2 wrote exactly the ONE new fact row;
    // the reported count is O(delta), never a full-target rescan
    assert(r2("gold_fact_rows") == 1L)

    // versioned publish: _CURRENT points at v=2 and the previous version
    // is still fully on disk for in-flight readers
    assert(Medallion.goldVersion(spark, s"${conf.goldRoot}/dim_stores").contains(2))
    assert(new java.io.File(s"${conf.goldRoot}/dim_stores/v=1").exists())
    assert(new java.io.File(s"${conf.goldRoot}/dim_stores/v=2").exists())
  }

  test("publishGold is reader-visible at all times and prunes old versions") {
    import spark.implicits._
    val root = Files.createTempDirectory("goldpub").toString + "/dim_x"
    assert(Medallion.goldVersion(spark, root).isEmpty)
    Medallion.publishGold(spark, Seq((1, "a")).toDF("id", "v"), root)
    // the committed version stays intact and readable while the NEXT
    // version's data is being written (publish only flips the pointer after
    // the full write): simulate by writing v=2's directory contents first
    Seq((1, "b")).toDF("id", "v").write.parquet(s"$root/v=2__inflight")
    assert(Medallion.readGold(spark, root).as[(Int, String)].collect().toSeq == Seq((1, "a")))
    Medallion.publishGold(spark, Seq((1, "b"), (2, "c")).toDF("id", "v"), root)
    assert(Medallion.goldVersion(spark, root).contains(2))
    assert(Medallion.readGold(spark, root).count() == 2)
    // third publish prunes v=1 but keeps v=2 for in-flight readers
    Medallion.publishGold(spark, Seq((3, "d")).toDF("id", "v"), root)
    assert(!new java.io.File(s"$root/v=1").exists())
    assert(new java.io.File(s"$root/v=2").exists())
    assert(Medallion.readGold(spark, root).count() == 1)
    // time travel: the retained previous version reads back as published
    assert(Medallion.goldVersions(spark, root) == Seq(2, 3))
    assert(Medallion.readGoldAt(spark, root, 2).count() == 2)
    intercept[IllegalArgumentException] {
      Medallion.readGoldAt(spark, root, 1) // pruned
    }
    // compaction = content-preserving atomic republish into fewer files
    val before = Medallion.readGold(spark, root).collect().toSet
    val v = Medallion.compactGold(spark, root, targetFiles = 1)
    assert(v == 4 && Medallion.goldVersion(spark, root).contains(4))
    assert(Medallion.readGold(spark, root).collect().toSet == before)
    assert(Medallion.readGold(spark, root).rdd.getNumPartitions == 1)
  }

  test("medallionDag runs the reference's ten-stage DAG shape end to end") {
    import graft.pipeline.Orchestration
    val root2 = Files.createTempDirectory("medallion_dag").toString
    val conf2 = Medallion.Config(s"$root2/bronze", s"$root2/silver", s"$root2/gold")
    val dag = Orchestration.medallionDag(spark, sources(1), conf2)
    // the wiring mirrors spark_job_airflow.py's edges: fact waits on all
    // three gold dims, dims wait on the silver DQ gate, etc.
    assert(dag.topoOrder.head == "bronze_layer_load")
    assert(dag.topoOrder.last == "show_gold_layer_data")
    val report = dag.run()
    assert(report.values.forall(_.status == Orchestration.Succeeded),
      report.collect { case (n, r) if r.status != Orchestration.Succeeded => n -> r.status })
    // gold fact landed exactly as in Medallion.run
    val fact = spark.read.parquet(s"$root2/gold/fact_orders")
    assert(fact.count() == 3)
    // both DQ gates reported clean on run-1 fixtures
    assert(report("bronze_data_quality_check").result.contains(Seq.empty))
    assert(report("silver_data_quality_check").result.contains(Seq.empty))
  }

  test("publishGold writer guard refuses a second publisher; retention is configurable") {
    import spark.implicits._
    val root = Files.createTempDirectory("goldguard").toString + "/dim_y"
    Medallion.publishGold(spark, Seq((1, "a")).toDF("id", "v"), root)
    // a held table lease (in-flight or crashed publisher) blocks publish
    val claimFile = new java.io.File(s"$root/_claim")
    assert(claimFile.createNewFile())
    val ex = intercept[IllegalStateException] {
      Medallion.publishGold(spark, Seq((2, "b")).toDF("id", "v"), root)
    }
    assert(ex.getMessage.contains("concurrent publisher"))
    assert(Medallion.goldVersion(spark, root).contains(1)) // refused, untouched
    assert(claimFile.delete()) // explicit operator recovery
    // rapid double-publish with retain=2: a reader that resolved v=1 before
    // both publishes still reads its version afterwards
    Medallion.publishGold(spark, Seq((2, "b")).toDF("id", "v"), root, retain = 2)
    Medallion.publishGold(spark, Seq((3, "c")).toDF("id", "v"), root, retain = 2)
    assert(Medallion.readGoldAt(spark, root, 1)
      .as[(Int, String)].collect().toSeq == Seq((1, "a")))
    assert(Medallion.goldVersions(spark, root) == Seq(1, 2, 3))
    // and the claim never lingers after successful publishes
    assert(!claimFile.exists())
    Medallion.publishGold(spark, Seq((4, "d")).toDF("id", "v"), root, retain = 2)
    assert(Medallion.goldVersions(spark, root) == Seq(2, 3, 4))
  }

  test("bronze rule map flags a seeded-dirty table, table by table") {
    // 1 of 3 order_details rows (33% > the 5% rule) has a NULL product_id
    // and a NULL subtotal; a second table in the same suite stays clean —
    // failures must be attributed per-table, per-column
    val dirtyRows = Seq(
      Row("O1", "P1", 1, 0, 30000L, false),
      Row("O1", null, 2, 0, null, false),
      Row("O2", "P2", 1, 0, 45000L, false))
    val dirty = spark.createDataFrame(dirtyRows.asJava, Schemas.orderDetails)
    val clean = spark.createDataFrame(
      Seq(Row(1, "coffee", ts("2024-01-01 08:00:00"))).asJava, Schemas.productCategory)
    val failures = Medallion.dqGateSuite(
      Map("brz.order_details" -> dirty, "brz.product_category" -> clean),
      Medallion.bronzeRules("order_details") ++ Medallion.bronzeRules("product_category"))
    assert(failures == Seq(
      "brz.order_details.null_rate.product_id",
      "brz.order_details.null_rate.subtotal"))
  }

  test("bronzeIncremental returns the increment count, not the table count") {
    import scala.jdk.CollectionConverters._
    val target = Files.createTempDirectory("brzinc").toString + "/t"
    val rows1 = Seq(Row(1, "x", ts("2024-01-01 08:00:00")),
                    Row(2, "y", ts("2024-01-02 08:00:00")))
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("id", org.apache.spark.sql.types.IntegerType),
      org.apache.spark.sql.types.StructField("v", org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("updated_at", org.apache.spark.sql.types.TimestampType)))
    assert(Medallion.bronzeIncremental(spark,
      spark.createDataFrame(rows1.asJava, schema), "updated_at", target) == 2L)
    // second batch: one old (filtered by watermark) + one new row -> 1, not 3
    val rows2 = rows1 :+ Row(3, "z", ts("2024-01-03 08:00:00"))
    assert(Medallion.bronzeIncremental(spark,
      spark.createDataFrame(rows2.asJava, schema), "updated_at", target) == 1L)
    assert(spark.read.parquet(target).count() == 3L)
    // empty increment short-circuits to 0 with no write
    assert(Medallion.bronzeIncremental(spark,
      spark.createDataFrame(rows2.asJava, schema), "updated_at", target) == 0L)
  }

  test("bronze schema policy: merge admits additive drift, reject halts, retype always halts") {
    import scala.jdk.CollectionConverters._
    import org.apache.spark.sql.types._
    val target = Files.createTempDirectory("brzpol").toString + "/t"
    val base = StructType(Seq(StructField("id", IntegerType),
      StructField("v", StringType), StructField("updated_at", TimestampType)))
    Medallion.bronzeIncremental(spark,
      spark.createDataFrame(Seq(Row(1, "x", ts("2024-01-01 08:00:00"))).asJava, base),
      "updated_at", target)

    // additive drift under Merge: lands, and merged read shows NULL backfill
    val widened = base.add(StructField("extra", StringType))
    val r = Medallion.bronzeIncremental(spark,
      spark.createDataFrame(Seq(Row(2, "y", ts("2024-01-02 08:00:00"), "e")).asJava, widened),
      "updated_at", target, Medallion.SchemaPolicy.Merge)
    assert(r == 1L)
    val merged = Medallion.readBronze(spark, target)
    assert(merged.columns.contains("extra") && merged.count() == 2)
    assert(merged.filter(col("id") === 1).head().getAs[String]("extra") == null)

    // same additive drift under Reject: halts before any write
    val ex1 = intercept[IllegalStateException] {
      Medallion.bronzeIncremental(spark,
        spark.createDataFrame(Seq(Row(3, "z", ts("2024-01-03 08:00:00"), "e")).asJava, widened),
        "updated_at", target, Medallion.SchemaPolicy.Reject)
    }
    assert(ex1.getMessage.contains("schema drift rejected"))

    // retyped column: halts even under Merge
    val retyped = StructType(Seq(StructField("id", LongType),
      StructField("v", StringType), StructField("updated_at", TimestampType)))
    val ex2 = intercept[IllegalStateException] {
      Medallion.bronzeIncremental(spark,
        spark.createDataFrame(Seq(Row(4L, "w", ts("2024-01-04 08:00:00"))).asJava, retyped),
        "updated_at", target, Medallion.SchemaPolicy.Merge)
    }
    assert(ex2.getMessage.contains("incompatible schema drift"))
    assert(Medallion.readBronze(spark, target).count() == 2) // untouched
  }
}
