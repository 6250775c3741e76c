package graft

import org.apache.spark.sql.functions._
import graft.pipeline.IncrementalAgg

/** Incremental aggregate-view maintenance invariants: incremental ≡ full
  * recompute, merge order-independence (replay/retry safety), identity on
  * empty batches, and the compactness that makes refresh O(batch +
  * |groups|). Cross-engine value parity is q101's oracle. */
class IncrementalAggSpec extends SparkSpec {

  private val keys = Seq("k")
  private val ms = Seq("v")

  private def rows(data: Seq[(String, Double)]) = {
    import spark.implicits._
    data.toDF("k", "v")
  }

  private def fixture = rows(Seq(
    ("a", 1.25), ("a", 2.50), ("b", -3.75), ("b", 10.00), ("b", 0.01),
    ("c", 99.99)))

  private def viewOf(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2),
      r.getDouble(3), r.getDouble(4), r.getDouble(5))).toSet

  test("folding batches equals one-shot aggregation of the union") {
    val batches = Seq(
      fixture.filter(col("v") < 1), fixture.filter(col("v") >= 1 && col("v") < 10),
      fixture.filter(col("v") >= 10))
    val folded = batches.map(IncrementalAgg.partialState(_, keys, ms))
      .reduce(IncrementalAgg.mergeState(_, _, keys, ms))
    val oneShot = IncrementalAgg.partialState(fixture, keys, ms)
    assert(viewOf(IncrementalAgg.finalizeView(folded, keys, ms)) ==
      viewOf(IncrementalAgg.finalizeView(oneShot, keys, ms)))
  }

  test("merge is order-independent: any batch arrival order yields the same view") {
    val batches = Seq(
      fixture.filter(col("v") < 1), fixture.filter(col("v") >= 1 && col("v") < 10),
      fixture.filter(col("v") >= 10)).map(IncrementalAgg.partialState(_, keys, ms))
    val views = batches.permutations.take(6).map(p =>
      viewOf(IncrementalAgg.finalizeView(
        p.reduce(IncrementalAgg.mergeState(_, _, keys, ms)), keys, ms))).toSeq
    assert(views.distinct.size == 1)
  }

  test("empty batch merges as the identity; unseen keys appear with their own stats") {
    val base = IncrementalAgg.partialState(fixture, keys, ms)
    val empty = IncrementalAgg.partialState(fixture.filter(col("v") > 1e9), keys, ms)
    val merged = IncrementalAgg.mergeState(base, empty, keys, ms)
    assert(viewOf(IncrementalAgg.finalizeView(merged, keys, ms)) ==
      viewOf(IncrementalAgg.finalizeView(base, keys, ms)))
    val newKey = IncrementalAgg.partialState(rows(Seq(("z", 5.00))), keys, ms)
    val withNew = IncrementalAgg.finalizeView(
      IncrementalAgg.mergeState(base, newKey, keys, ms), keys, ms)
    val z = withNew.filter(col("k") === "z").head()
    assert(z.getLong(1) == 1L && z.getDouble(2) == 5.0 && z.getDouble(4) == 5.0)
  }

  test("state stays one row per group — refresh work is O(batch + groups), not history") {
    val s1 = IncrementalAgg.partialState(fixture, keys, ms)
    val s2 = IncrementalAgg.mergeState(s1,
      IncrementalAgg.partialState(fixture, keys, ms), keys, ms)
    assert(s2.count() == fixture.select("k").distinct().count())
    // state carries only mergeable counters: no raw measure column survives
    assert(!s2.columns.contains("v"))
    assert(s2.columns.toSet ==
      Set("k", "n_rows", "__sum_v", "__min_v", "__max_v"))
  }

  test("streamingMaintainer: folds micro-batches exactly once, replay-safe, view == one-shot") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.streaming.Trigger
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("graft-incragg").toString
    val root = tmp + "/state"
    val ckpt = tmp + "/ckpt"
    val sink = IncrementalAgg.streamingMaintainer(spark, root, keys, ms)
    val mem = MemoryStream[(String, Double)]
    // one checkpointed AvailableNow run per arriving batch — the second
    // run RESUMES the checkpoint (the restart path), so batch ids advance
    def runOnce(): Unit = {
      val q = mem.toDF().toDF("k", "v").writeStream
        .option("checkpointLocation", ckpt)
        .foreachBatch((b: org.apache.spark.sql.DataFrame, id: Long) => sink(b, id))
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
    }
    mem.addData(("a", 1.25), ("b", 10.00))
    runOnce()
    mem.addData(("a", 2.50), ("b", -3.75), ("c", 99.99))
    runOnce()
    val view = viewOf(IncrementalAgg.readView(spark, root, keys, ms))
    val oneShot = viewOf(IncrementalAgg.finalizeView(
      IncrementalAgg.partialState(rows(Seq(
        ("a", 1.25), ("b", 10.00), ("a", 2.50), ("b", -3.75), ("c", 99.99))),
        keys, ms), keys, ms))
    assert(view == oneShot)
    // at-least-once delivery: re-invoking the sink with an already-folded
    // batch id (what restart-from-checkpoint does) must change nothing
    sink(rows(Seq(("a", 2.50), ("b", -3.75), ("c", 99.99))), 1L)
    sink(rows(Seq(("a", 1.25), ("b", 10.00))), 0L)
    assert(viewOf(IncrementalAgg.readView(spark, root, keys, ms)) == oneShot)
    // a genuinely new batch still folds
    sink(rows(Seq(("c", 0.01))), 2L)
    val after = IncrementalAgg.readView(spark, root, keys, ms)
      .filter(col("k") === "c").head()
    assert(after.getLong(1) == 2L && after.getDouble(5) == 99.99
      && after.getDouble(4) == 0.01)
  }

  test("exactness: cents sums are exact integers (no float accumulator drift)") {
    // 0.1 is inexact in binary; 10k of them summed as doubles drifts, as
    // cents it is exactly 100000
    val many = rows(Seq.fill(10000)(("a", 0.10)))
    val v = IncrementalAgg.finalizeView(
      IncrementalAgg.partialState(many, keys, ms), keys, ms).head()
    assert(v.getLong(1) == 10000L)
    assert(v.getDouble(2) == 1000.0) // sum
    assert(v.getDouble(3) == 0.1)    // avg
  }
}
