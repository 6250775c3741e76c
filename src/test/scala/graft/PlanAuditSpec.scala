package graft

/** Physical-plan audits: the properties that make the key queries scale are
  * asserted, not hoped for — a plan regression (lost pushdown, a join
  * falling back to nested-loop, a sort sneaking in front of a top-k) fails
  * the suite even while results stay correct. */
class PlanAuditSpec extends SparkSpec {

  private val d = "/root/testdata/sf0.001"
  private def plan(q: String): String =
    SparkEntry.queries(q)(spark, d).queryExecution.executedPlan.toString

  test("q01: filters reach the parquet scan; only needed columns read") {
    val p = plan("q01_scan_filter_project")
    assert(p.contains("PushedFilters: [IsNotNull(l_shipdate)") ||
      p.contains("PushedFilters: [IsNotNull(l_quantity)"))
    assert(!p.contains("l_comment")) // untouched wide column never scanned
  }

  test("q03: star joins broadcast the dimensions") {
    val p = plan("q03_fact_assembly")
    assert("BroadcastHashJoin".r.findAllIn(p).size >= 3)
    assert(!p.contains("BroadcastNestedLoopJoin"))
  }

  test("q16: top-k runs as TakeOrderedAndProject, not a global sort") {
    val p = plan("q16_topk_orders")
    assert(p.contains("TakeOrderedAndProject"))
  }

  test("q41: range join is an equi-join on the bucket id, never a nested loop") {
    val p = plan("q41_range_join")
    assert(p.contains("BroadcastHashJoin") || p.contains("SortMergeJoin"))
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"))
  }

  test("q27: one-scan segmentation reads orders exactly once") {
    val p = plan("q27_set_ops")
    assert("FileScan parquet".r.findAllIn(p).size == 1)
  }

  test("q02: aggregation is map-side partial (two-phase hash aggregate)") {
    val p = plan("q02_pricing_summary")
    assert("HashAggregate".r.findAllIn(p).size >= 2)
  }

  test("q26: lineitem pre-aggregates by orderkey BEFORE the orders join") {
    import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Join}
    val opt = SparkEntry.queries("q26_rollup_revenue")(spark, d)
      .queryExecution.optimizedPlan
    // the orders⋈lineitem join's fact side must be the (orderkey, n, rev)
    // aggregate — one row per order crosses the shuffle, not one per line
    val joins = opt.collect { case j: Join => j }
    assert(joins.exists(j =>
      (j.left +: j.left.children).exists {
        case a: Aggregate =>
          a.groupingExpressions.exists(_.references.exists(_.name == "l_orderkey"))
        case _ => false
      }), s"no pre-aggregated fact side under a join:\n$opt")
  }

  test("q31: ANN signature pipeline carries ONE matrix-dot, not P plane dots") {
    val p = plan("q31_ann_topk")
    assert(p.contains("graft_matdot"))
    assert(!p.contains("graft_dot64(__qv, ["), "per-plane literal dots crept back")
  }

  test("q69: exact sample plans as TakeOrderedAndProject, never a global sort") {
    val p = plan("q69_sample_exact")
    assert(p.contains("TakeOrderedAndProject"))
  }

  test("domainCap filtered form plans WindowGroupLimit (partial top-n per task)") {
    import org.apache.spark.sql.functions.col
    val docs = graft.sources.Tables.documents(spark, d)
    val filtered = graft.operators.Curation.domainCap(docs, "doc_id", "source", 5)
      .filter(col("pick_order") <= 5)
    val p = filtered.queryExecution.executedPlan.toString
    assert(p.contains("WindowGroupLimit"), s"rank pushdown missing:\n$p")
  }

  test("q73: histogram is one two-phase hash aggregate over one scan") {
    val p = plan("q73_price_histogram")
    assert("HashAggregate".r.findAllIn(p).size == 2)
    assert("FileScan parquet".r.findAllIn(p).size == 1)
  }

  test("q74: KMV aggregate is partial-aggregated (two ObjectHashAggregate phases)") {
    val p = plan("q74_kmv_sketch")
    // map-side partial + final — the sketch buffer crosses the shuffle,
    // not the raw hash rows
    assert("ObjectHashAggregate".r.findAllIn(p).size >= 2, p)
  }

  test("q80: Zipf top-K is TakeOrderedAndProject; regression agg is two-phase") {
    val p = plan("q80_zipf_slope")
    assert(p.contains("TakeOrderedAndProject"), p)
  }

  test("q81: survivor rank-1 window gets WindowGroupLimit pushdown") {
    val p = plan("q81_keep_best")
    assert(p.contains("WindowGroupLimit"), s"rank pushdown missing:\n$p")
  }

  test("q83: per-source top-K gets WindowGroupLimit pushdown") {
    val p = plan("q83_source_zipf")
    assert(p.contains("WindowGroupLimit"), s"rank pushdown missing:\n$p")
  }

  test("q82: snapshot diff shuffles only (id, md5) rows — text is projected out pre-join") {
    val p = plan("q82_snapshot_diff")
    // both scans read only (doc_id, text) and every Exchange carries hash
    // columns, not text: the join inputs are the narrow md5 projections
    assert(p.contains("SortMergeJoin") || p.contains("ShuffledHashJoin"), p)
    val exchanges = "Exchange hashpartitioning[^\n]*".r.findAllIn(p).toList
    assert(exchanges.nonEmpty && exchanges.forall(!_.contains("text")),
      s"text column crosses a shuffle:\n$p")
  }

  test("repo-wide: no registered query plans a CartesianProduct or a UDF") {
    // CartesianProduct = a non-broadcast all-pairs join — never acceptable;
    // the deliberate quadratic verifiers (q19/q21/q31/q34) broadcast their
    // tiny side, which plans as BroadcastNestedLoopJoin, not Cartesian.
    // UDF nodes (BatchEvalPython / ScalaUDF) would break codegen fusion —
    // the engine's contract is built-ins + native Expressions only.
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      val p = fn(spark, d).queryExecution.executedPlan.toString
      assert(!p.contains("CartesianProduct"), s"$name plans a CartesianProduct")
      assert(!p.contains("BatchEvalPython") && !p.contains("ScalaUDF"),
        s"$name plans a UDF")
    }
  }

  test("IVF-family queries never fall back to SortAggregate") {
    // Regression guard for the round-5 straggler: max(struct) argmax can't
    // hash-aggregate, so the old assignment planned a SortAggregate over
    // the N×nCells join fan-out — a 20-minute single task at 80k×283
    // (STRESS.md). The literal-matrix matdot argmax is map-only; nothing
    // in these pipelines should sort-aggregate.
    Seq("q35_ivf_topk", "q59_kmeans_assign", "q62_semantic_dedup",
        "q92_diverse_sample", "q94_ivf2_topk").foreach { name =>
      val p = SparkEntry.queries(name)(spark, d).queryExecution.executedPlan.toString
      assert(!p.contains("SortAggregate"), s"$name plans a SortAggregate:\n$p")
    }
  }

  test("q35/q94: candidate fan-out joins on cell keys only by broadcast") {
    // Regression guard for the round-7 sf10 straggler: a JOIN keyed by
    // `cell` hashes the whole corpus into only nCells distinct keys, and
    // AQE then coalesces the small-by-bytes exchange to ONE partition —
    // 184 s single-task wall at 200k vectors (BENCH_r07_sf10). The probe
    // list must be the BROADCAST side; any shuffled join on cell columns
    // reintroduces the collapse. (q94's L2-seed WINDOW does exchange on
    // cell1 — acceptable: WindowGroupLimit prunes to nCellsL2 rows per
    // cell map-side, so that exchange carries ~tasks·C1·C2 rows, not N.)
    for (name <- Seq("q35_ivf_topk", "q94_ivf2_topk")) {
      val p = SparkEntry.queries(name)(spark, d).queryExecution.executedPlan.toString
      val shuffledCellJoins = "(?:SortMergeJoin|ShuffledHashJoin) [^\n]*cell[^\n]*"
        .r.findAllIn(p).toList
      assert(shuffledCellJoins.isEmpty,
        s"$name shuffles the index into a cell-keyed join:\n${shuffledCellJoins.mkString("\n")}")
      if (name == "q94_ivf2_topk")
        assert(p.contains("WindowGroupLimit"), "L2 seed rank lost its pushdown")
    }
  }
}
