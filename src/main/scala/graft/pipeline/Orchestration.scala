package graft.pipeline

/** Minimal in-process orchestration — the analog of the reference's Airflow
  * daily DAG (`airflow/dags/spark_job_airflow.py:18-140`: ten
  * SparkSubmitOperator stages wired `bronze >> dq >> [silver...] >> dq >>
  * [gold dims] >> gold fact >> show`). Scheduling infrastructure is out of
  * engine scope, but the DAG semantics a pipeline author relies on are not:
  * dependency-ordered execution, per-stage retry, and failure isolation
  * (a failed stage skips its downstream, independent branches still run).
  *
  * Stages are plain thunks so the same runner drives Medallion stages or
  * anything else; results are reported, never swallowed. Stage actions are
  * expected to be idempotent under retry — every Medallion stage is
  * (watermark-sliced appends, full overwrites, or versioned publishes).
  */
object Orchestration {

  final case class Stage(name: String, action: () => Any,
                         retries: Int = 0, retryDelayMs: Long = 0L)

  sealed trait Status
  case object Succeeded extends Status
  final case class Failed(attempts: Int, error: Throwable) extends Status
  /** Not attempted because an upstream dependency failed or was skipped. */
  final case class Skipped(because: String) extends Status

  final case class StageResult(status: Status, attempts: Int, result: Option[Any])

  /** A DAG = stages + dependency edges (from must complete before to).
    * Validated eagerly: unknown stage names and cycles throw at
    * construction, not mid-run. */
  final case class Dag(stages: Seq[Stage], edges: Seq[(String, String)]) {
    private val byName = stages.map(s => s.name -> s).toMap
    require(stages.map(_.name).distinct.size == stages.size, "duplicate stage names")
    edges.foreach { case (a, b) =>
      require(byName.contains(a), s"edge references unknown stage: $a")
      require(byName.contains(b), s"edge references unknown stage: $b")
    }

    /** Deterministic topological order (Kahn's, ties by declaration order). */
    val topoOrder: Seq[String] = {
      val order = stages.map(_.name)
      val indegree = scala.collection.mutable.Map(order.map(_ -> 0): _*)
      edges.foreach { case (_, b) => indegree(b) += 1 }
      val ready = scala.collection.mutable.Queue(
        order.filter(indegree(_) == 0): _*)
      val out = scala.collection.mutable.ArrayBuffer[String]()
      while (ready.nonEmpty) {
        val n = ready.dequeue()
        out += n
        // preserve declaration order among newly-ready stages
        val newlyReady = edges.collect { case (`n`, b) =>
          indegree(b) -= 1; b
        }.filter(indegree(_) == 0)
        order.filter(newlyReady.contains).foreach(ready.enqueue(_))
      }
      require(out.size == stages.size,
        s"cycle among stages: ${order.diff(out.toSeq).mkString(", ")}")
      out.toSeq
    }

    private def upstreamOf(name: String): Seq[String] =
      edges.collect { case (a, `name`) => a }

    /** Execute in topological order. A stage is attempted 1 + retries
      * times (linear backoff); a failed or skipped stage marks every
      * downstream stage Skipped. Returns the full per-stage report. */
    def run(): Map[String, StageResult] = {
      val results = scala.collection.mutable.Map[String, StageResult]()
      topoOrder.foreach { name =>
        val badUpstream = upstreamOf(name).filter(u =>
          results(u).status != Succeeded)
        if (badUpstream.nonEmpty) {
          results(name) = StageResult(
            Skipped(s"upstream failed: ${badUpstream.mkString(", ")}"), 0, None)
        } else {
          val stage = byName(name)
          var attempt = 0
          var done: Option[StageResult] = None
          while (done.isEmpty) {
            attempt += 1
            try done = Some(StageResult(Succeeded, attempt, Some(stage.action())))
            catch {
              case scala.util.control.NonFatal(e) =>
                if (attempt > stage.retries)
                  done = Some(StageResult(Failed(attempt, e), attempt, None))
                else if (stage.retryDelayMs > 0)
                  Thread.sleep(stage.retryDelayMs * attempt)
            }
          }
          results(name) = done.get
        }
      }
      results.toMap
    }
  }

  /** The reference DAG's exact ten-stage shape over [[Medallion]] stages,
    * with the reference's dependency edges. `retries` applies to every
    * stage (the reference configures retry policy DAG-wide via
    * default_args). */
  def medallionDag(spark: org.apache.spark.sql.SparkSession,
                   sources: Map[String, org.apache.spark.sql.DataFrame],
                   conf: Medallion.Config,
                   retries: Int = 1): Dag = {
    import Medallion._
    def stage(name: String)(body: => Any) =
      Stage(name, () => body, retries)
    val bronzeTables = Seq("stores", "payment_method", "product_category",
      "products", "customers", "orders", "order_details") ++
      (if (sources.contains("order_suggestion_accepted"))
        Seq("order_suggestion_accepted") else Nil)
    Dag(
      stages = Seq(
        stage("bronze_layer_load") {
          bronzeTables.map { t =>
            val tsCol = if (sources(t).columns.contains("updated_at")) "updated_at"
                        else "timestamp"
            t -> bronzeIncremental(spark, sources(t), tsCol,
              s"${conf.bronzeRoot}/$t", conf.schemaPolicy)
          }.toMap
        },
        stage("bronze_data_quality_check") {
          dqGateSuite(
            bronzeTables.map(t =>
              s"brz.$t" -> spark.read.parquet(s"${conf.bronzeRoot}/$t")).toMap,
            bronzeTables.flatMap(bronzeRules))
        },
        stage("silver_layer_dimension_transform") {
          silverDim(spark, s"${conf.bronzeRoot}/stores",
            s"${conf.silverRoot}/stores", Seq("city", "district"))
          silverDim(spark, s"${conf.bronzeRoot}/payment_method",
            s"${conf.silverRoot}/payment_method", Seq("bank"))
          silverProducts(spark, s"${conf.bronzeRoot}/products",
            s"${conf.bronzeRoot}/product_category", s"${conf.silverRoot}/products")
          silverDim(spark, s"${conf.bronzeRoot}/customers",
            s"${conf.silverRoot}/customers", Seq("tier"))
        },
        stage("silver_layer_fact_transform") {
          silverFact(spark, s"${conf.bronzeRoot}/orders",
            s"${conf.bronzeRoot}/order_details", s"${conf.silverRoot}/fact_orders",
            suggestionsPath =
              if (sources.contains("order_suggestion_accepted"))
                Some(s"${conf.bronzeRoot}/order_suggestion_accepted") else None)
        },
        stage("silver_data_quality_check") {
          dqGateSuite(
            Seq("products", "stores", "payment_method", "customers", "fact_orders")
              .map(t => s"slv.$t" -> spark.read.parquet(s"${conf.silverRoot}/$t")).toMap,
            silverRules)
        },
        stage("gold_layer_dim_payment_scd2") {
          goldDim(spark, s"${conf.silverRoot}/payment_method",
            s"${conf.goldRoot}/dim_payment_method", "id", Seq("method_name", "bank"))
        },
        stage("gold_layer_dim_stores_scd2") {
          goldDim(spark, s"${conf.silverRoot}/stores", s"${conf.goldRoot}/dim_stores",
            "id", Seq("name", "address", "district", "city"))
        },
        stage("gold_layer_dim_products_scd2") {
          goldDim(spark, s"${conf.silverRoot}/products",
            s"${conf.goldRoot}/dim_products", "product_id",
            Seq("product_name", "category", "unit_price"))
        },
        stage("gold_layer_fact_orders") {
          goldFact(spark, s"${conf.silverRoot}/fact_orders",
            Map(
              "store" -> (s"${conf.goldRoot}/dim_stores", "store_id", "id"),
              "payment" -> (s"${conf.goldRoot}/dim_payment_method",
                "payment_method_id", "id"),
              "product" -> (s"${conf.goldRoot}/dim_products", "product_id",
                "product_id")),
            s"${conf.goldRoot}/fact_orders")
        },
        stage("show_gold_layer_data") {
          // diffable inspection instead of console show (K7 discipline)
          Seq("dim_stores", "dim_payment_method", "dim_products")
            .map(t => t -> readGold(spark, s"${conf.goldRoot}/$t").count()).toMap
        }),
      edges = Seq(
        "bronze_layer_load" -> "bronze_data_quality_check",
        "bronze_data_quality_check" -> "silver_layer_dimension_transform",
        "bronze_data_quality_check" -> "silver_layer_fact_transform",
        "silver_layer_dimension_transform" -> "silver_data_quality_check",
        "silver_layer_fact_transform" -> "silver_data_quality_check",
        "silver_data_quality_check" -> "gold_layer_dim_payment_scd2",
        "silver_data_quality_check" -> "gold_layer_dim_stores_scd2",
        "silver_data_quality_check" -> "gold_layer_dim_products_scd2",
        "gold_layer_dim_payment_scd2" -> "gold_layer_fact_orders",
        "gold_layer_dim_stores_scd2" -> "gold_layer_fact_orders",
        "gold_layer_dim_products_scd2" -> "gold_layer_fact_orders",
        "gold_layer_fact_orders" -> "show_gold_layer_data"))
  }
}
