package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import graft.operators.Scd2

/** Property-based SCD2 invariants (FIXTURES.md §1): for ANY sequence of
  * source snapshots, after chained merges —
  *   1. exactly one current row per business key ever seen,
  *   2. end_date null iff is_current,
  *   3. the current row always reflects the latest snapshot value.
  * Uses raw ScalaCheck generators with fixed seeds (scalatestplus bridge is
  * not on the offline classpath).
  */
class Scd2PropertySpec extends SparkSpec {

  // a snapshot: up to 6 keys with small-alphabet values (collisions likely)
  private val snapshotGen: Gen[Map[Int, String]] =
    Gen.mapOf(Gen.zip(Gen.choose(1, 6), Gen.oneOf("a", "b", "c")))
  private val sequenceGen: Gen[List[Map[Int, String]]] =
    Gen.nonEmptyListOf(snapshotGen).map(_.filter(_.nonEmpty).take(4))

  test("SCD2 invariants hold for arbitrary snapshot sequences") {
    import spark.implicits._
    val cases = (1L to 8L).flatMap(i =>
      sequenceGen.apply(Gen.Parameters.default.withSize(8), Seed(i)))
      .filter(_.nonEmpty)
    assert(cases.size >= 6) // generators must actually produce work
    cases.foreach { snapshots =>
      val dates = Iterator.from(1).map(i => f"2024-0$i%01d-01")
      val init = Scd2.initialLoad(
        snapshots.head.toSeq.toDF("k", "v"), lit(dates.next()))
      val finalDim = snapshots.tail.foldLeft(init) { (dim, snap) =>
        Scd2.merge(dim, snap.toSeq.toDF("k", "v"), "k", Seq("v"), lit(dates.next()))
      }
      val rows = finalDim.collect()
      val seenKeys = snapshots.flatMap(_.keys).toSet
      // 1. exactly one current row per seen key
      val currents = rows.filter(_.getAs[Boolean]("is_current"))
      assert(currents.map(_.getAs[Int]("k")).toSet == seenKeys,
        s"snapshots=$snapshots")
      assert(currents.length == seenKeys.size, s"snapshots=$snapshots")
      // 2. end_date null iff current
      assert(rows.forall(r =>
        r.getAs[Boolean]("is_current") == (r.getAs[java.sql.Date]("end_date") == null)),
        s"snapshots=$snapshots")
      // 3. current value = last snapshot value for that key
      val lastValue = snapshots.foldLeft(Map.empty[Int, String])(_ ++ _)
      currents.foreach { r =>
        assert(r.getAs[String]("v") == lastValue(r.getAs[Int]("k")),
          s"snapshots=$snapshots")
      }
    }
  }
}
