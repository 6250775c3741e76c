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

  // ------------------------------------------------- index maintenance DAG

  /** Vector-index branch parameters: the index dir, the raw embedding store
    * a retrain re-encodes from ([[graft.operators.VectorIndex.retrain]] —
    * PQ codes are lossy, so the rebuild needs the originals the lakehouse
    * retains anyway), the drift gate `maxSkew` (occupancy skew above which
    * a retrain fires), and the quantizer shape a retrain rebuilds at. */
  final case class VectorMaint(dir: String,
                               emb: org.apache.spark.sql.DataFrame,
                               idCol: String, vecCol: String,
                               maxSkew: Double = 8.0,
                               nCells: Int = 32, m: Int = 16, ks: Int = 64,
                               trainIters: Int = 1)

  /** Data files under `path` (recursive) — the fragmentation observable for
    * the compaction gates: epoch appends add one file per frame per epoch,
    * and read cost follows file count (row-group opens, decayed sort). */
  private def dataFileCount(spark: org.apache.spark.sql.SparkSession,
                            path: String): Int = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) 0
    else {
      val it = fs.listFiles(p, true)
      var n = 0
      while (it.hasNext) { if (it.next().getPath.getName.endsWith(".parquet")) n += 1 }
      n
    }
  }

  /** The nightly index-maintenance job as a first-class DAG — the same
    * gate-read → conditional remedy → verify shape every serving-index
    * deployment runs on a schedule, with [[Dag]]'s retry and failure-
    * isolation semantics (a failed vector branch must not stop the lex
    * compaction, and a failed remedy SKIPS its verify rather than
    * green-lighting an unverified index). Remedies are the existing
    * maintenance operators; this wires them into the orchestration layer
    * the way `medallionDag` wires the batch stages.
    *
    * Branches (any subset, independent):
    *   - vector (`VectorIndex`): census (occupancy skew + live/tombstone
    *     counts) → vacuum (no-op without tombstones) → retrain-if-drifted
    *     (gated on `maxSkew`) → verify (reload; skew repaired, no stage/
    *     swap leftovers, index serves).
    *   - dedup (`DedupIndex`) and lex (`LexIndex`): census (file counts
    *     per frame) → compact when fragmentation exceeds
    *     `compactFileThreshold` → verify (reload; store counts intact,
    *     fragmentation actually reduced when the remedy ran).
    *
    * Every stage is idempotent under retry: census/verify are reads, and
    * the remedies commit via staged-write + rename swap, so a retry after
    * a mid-stage crash re-runs the whole remedy against a consistent tree
    * (the single-maintainer contract; concurrent maintainers use the
    * [[graft.operators.VectorIndexOcc]]/[[graft.operators.DedupIndexOcc]]
    * generation protocol instead). */
  def indexMaintenanceDag(spark: org.apache.spark.sql.SparkSession,
                          vector: Option[VectorMaint] = None,
                          dedupDir: Option[String] = None,
                          lexDir: Option[String] = None,
                          compactFileThreshold: Int = 8,
                          retries: Int = 1): Dag = {
    import graft.operators.{DedupIndex, LexIndex, VectorIndex}
    def stage(name: String)(body: => Any) = Stage(name, () => body, retries)
    val hconf = spark.sparkContext.hadoopConfiguration

    val vectorStages = vector.toSeq.flatMap { v =>
      def tombstones: Long = {
        val t = new org.apache.hadoop.fs.Path(v.dir, "_tombstones")
        if (t.getFileSystem(hconf).exists(t))
          spark.read.parquet(t.toString).count()
        else 0L
      }
      Seq(
        stage("vector_census") {
          val ix = VectorIndex.read(spark, v.dir)
          Map("skew" -> VectorIndex.occupancySkew(ix),
            "live_rows" -> ix.nRows, "cells" -> ix.nCells,
            "tombstones" -> tombstones)
        },
        stage("vector_vacuum") {
          // reclaim is worth a codes rewrite only when deletes accrued;
          // vacuum() itself is a no-op without a tombstone set
          Map("reclaimed_rows" -> VectorIndex.vacuum(spark, v.dir))
        },
        stage("vector_retrain_if_drifted") {
          val r = VectorIndex.retrainIfDrifted(spark, v.dir, v.emb,
            v.idCol, v.vecCol, v.maxSkew, v.nCells, v.m, v.ks, v.trainIters)
          Map("retrained" -> r.isDefined)
        },
        stage("vector_verify") {
          val ix = VectorIndex.read(spark, v.dir)
          val skew = VectorIndex.occupancySkew(ix)
          require(ix.nRows > 0, s"vector index empty after maintenance: ${v.dir}")
          require(skew <= v.maxSkew,
            f"occupancy skew $skew%.1f still above gate ${v.maxSkew}%.1f after retrain")
          require(tombstones == 0L, "tombstones survived vacuum+retrain")
          val fs = new org.apache.hadoop.fs.Path(v.dir).getFileSystem(hconf)
          for (leftover <- Seq("_stage", "codes.old", "centroids.old"))
            require(!fs.exists(new org.apache.hadoop.fs.Path(v.dir, leftover)),
              s"swap leftover after maintenance: ${v.dir}/$leftover")
          Map("skew" -> skew, "live_rows" -> ix.nRows)
        })
    }

    def compactBranch(kind: String, dir: String, frames: Seq[String],
                      compactFn: () => Unit,
                      verifyFn: () => Unit): Seq[Stage] = Seq(
      stage(s"${kind}_census") {
        frames.map(f => f -> dataFileCount(spark, s"$dir/$f")).toMap
      },
      stage(s"${kind}_compact") {
        // conditional remedy: re-read the gate (idempotent under retry).
        // The ideal layout is one file per partition (pb-partitioned
        // frames keep nPb files by design), so the post-condition is
        // monotone reduction, not an absolute count.
        val before = frames.map(f => dataFileCount(spark, s"$dir/$f")).max
        if (before > compactFileThreshold) {
          compactFn()
          val after = frames.map(f => dataFileCount(spark, s"$dir/$f")).max
          require(after <= before,
            s"$kind compact increased fragmentation: $before -> $after files")
          s"compacted ($before -> $after files)"
        } else s"noop (max $before files <= $compactFileThreshold)"
      },
      stage(s"${kind}_verify") {
        verifyFn()
        val fs = new org.apache.hadoop.fs.Path(dir).getFileSystem(hconf)
        for (leftover <- "_stage" +: frames.map(_ + ".old"))
          require(!fs.exists(new org.apache.hadoop.fs.Path(dir, leftover)),
            s"swap leftover after maintenance: $dir/$leftover")
        Map("max_files" -> frames.map(f => dataFileCount(spark, s"$dir/$f")).max)
      })

    val dedupStages = dedupDir.toSeq.flatMap { dir =>
      compactBranch("dedup", dir, Seq("sigs", "hashes", "shingles"),
        () => DedupIndex.compact(spark, dir),
        () => {
          // value invariant: every signed doc is in the exact-hash corpus
          // (docs shorter than one shingle carry a hash but no signature,
          // so sigs ⊆ hashes; compaction moves layout, never rows)
          val sigs = spark.read.parquet(s"$dir/sigs").select("id").distinct().count()
          val hashes = spark.read.parquet(s"$dir/hashes").select("id").distinct().count()
          require(sigs <= hashes, s"sigs/hashes corpus drift: $sigs vs $hashes")
        })
    }
    val lexStages = lexDir.toSeq.flatMap { dir =>
      compactBranch("lex", dir, Seq("postings", "doclen"),
        () => LexIndex.compact(spark, dir),
        () => {
          val docsInPostings = spark.read.parquet(s"$dir/postings")
            .select("id").distinct().count()
          val doclen = spark.read.parquet(s"$dir/doclen").count()
          require(docsInPostings <= doclen,
            s"postings reference $docsInPostings docs but doclen has $doclen")
        })
    }

    def chain(names: Seq[Stage]): Seq[(String, String)] =
      names.map(_.name).sliding(2).collect { case Seq(a, b) => a -> b }.toSeq
    Dag(vectorStages ++ dedupStages ++ lexStages,
      chain(vectorStages) ++ chain(dedupStages) ++ chain(lexStages))
  }
}
