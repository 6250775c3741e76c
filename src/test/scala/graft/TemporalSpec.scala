package graft

import org.apache.spark.sql.functions._
import graft.operators.Temporal

/** Temporal operators on hand-computable fixtures. */
class TemporalSpec extends SparkSpec {

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  test("sessionize splits on >= gap and merges within it") {
    import spark.implicits._
    val ev = Seq(
      (1L, ts("2024-01-01 10:00:00")),
      (1L, ts("2024-01-01 10:20:00")), // 20m later → same session
      (1L, ts("2024-01-01 11:00:00")), // 40m later → new session
      (2L, ts("2024-01-01 09:00:00"))
    ).toDF("user_id", "ts")
    val sess = Temporal.sessionize(ev, "user_id", "ts", "30 minutes")
      .orderBy(col("user_id"), col("first_event")).collect()
    assert(sess.length == 3)
    assert(sess(0).getAs[Long]("n_events") == 2)
    assert(sess(0).getAs[java.sql.Timestamp]("last_event") == ts("2024-01-01 10:20:00"))
    assert(sess(1).getAs[Long]("n_events") == 1)
  }

  test("rangeJoin matches a filtered cross join; degenerate intervals match nothing") {
    import spark.implicits._
    val points = Seq(
      (1L, ts("2024-01-01 10:00:00")), (2L, ts("2024-01-05 00:00:00")),
      (3L, ts("2024-01-10 23:59:59")), (4L, ts("2024-02-01 00:00:00")))
      .toDF("pid", "pts")
    val intervals = Seq(
      (100L, ts("2024-01-01 00:00:00"), ts("2024-01-06 00:00:00")),
      (200L, ts("2024-01-05 00:00:00"), ts("2024-01-31 00:00:00")),
      (300L, ts("2024-03-01 00:00:00"), ts("2024-02-01 00:00:00"))) // end < start
      .toDF("iid", "s", "e")
    val got = Temporal.rangeJoin(points, intervals, "pts", "s", "e",
        bucketSeconds = 86400L)
      .select(col("pid"), col("iid"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val expected = (for {
      (p, pt) <- Seq((1L, "2024-01-01 10:00:00"), (2L, "2024-01-05 00:00:00"),
        (3L, "2024-01-10 23:59:59"), (4L, "2024-02-01 00:00:00"))
      (i, s0, e0) <- Seq((100L, "2024-01-01 00:00:00", "2024-01-06 00:00:00"),
        (200L, "2024-01-05 00:00:00", "2024-01-31 00:00:00"))
      if !ts(pt).before(ts(s0)) && !ts(pt).after(ts(e0))
    } yield (p, i)).toSet
    assert(got == expected && got.nonEmpty)
    assert(!got.exists(_._2 == 300L))
  }

  test("sessionize runs under Structured Streaming with a watermark") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val in = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, java.sql.Timestamp)]
    val q = Temporal.sessionize(in.toDF().toDF("user_id", "ts"),
        "user_id", "ts", "30 minutes", watermark = Some("1 hour"))
      .writeStream.format("memory").queryName("sess").outputMode("append").start()
    try {
      in.addData((1L, ts("2024-01-01 10:00:00")), (1L, ts("2024-01-01 10:10:00")),
        (1L, ts("2024-01-01 12:00:00"))) // second session, same user
      q.processAllAvailable()
      // advance the watermark far enough to close both sessions
      in.addData((2L, ts("2024-01-02 00:00:00")))
      q.processAllAvailable()
      val rows = spark.table("sess").filter(col("user_id") === 1)
        .orderBy(col("first_event")).collect()
      assert(rows.length == 2)
      assert(rows.head.getAs[Long]("n_events") == 2L) // 10:00+10:10 merged
      assert(rows.last.getAs[Long]("n_events") == 1L)
    } finally q.stop()
  }

  test("asofJoin attaches the latest right ts at-or-before each left row") {
    import spark.implicits._
    val left = Seq(
      (10L, ts("2024-01-05 00:00:00"), "a"),
      (10L, ts("2024-01-01 00:00:00"), "b"), // before any right row → null
      (10L, ts("2024-01-03 00:00:00"), "c"), // exact tie with right → matches
      (20L, ts("2024-01-09 00:00:00"), "d")
    ).toDF("k", "t", "label")
    val right = Seq(
      (10L, ts("2024-01-02 00:00:00")),
      (10L, ts("2024-01-03 00:00:00")),
      (20L, ts("2024-01-08 00:00:00"))
    ).toDF("k", "t")
    val out = Temporal.asofJoin(left, right, "k", "t")
      .collect().map(r => r.getAs[String]("label") ->
        Option(r.getAs[java.sql.Timestamp]("asof_ts")).map(_.toString.take(10))).toMap
    assert(out("a").contains("2024-01-03"))
    assert(out("b").isEmpty)
    assert(out("c").contains("2024-01-03")) // >= semantics: equal ts matches
    assert(out("d").contains("2024-01-08"))
  }

  test("rateAnomaly: hand-computed z-scores, spike flagged, flat type unflagged") {
    import spark.implicits._
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    // "click": 2, 2, 8 (spike on day 3); "view": 3, 3 (flat → var 0, z null)
    val rows =
      (1 to 2).map(i => ("click", ts(s"2024-01-01 0$i:00:00"))) ++
      (1 to 2).map(i => ("click", ts(s"2024-01-02 0$i:00:00"))) ++
      (1 to 8).map(i => ("click", ts(s"2024-01-03 0$i:00:00"))) ++
      (1 to 3).map(i => ("view", ts(s"2024-01-01 0$i:00:00"))) ++
      (1 to 3).map(i => ("view", ts(s"2024-01-02 0$i:00:00")))
    val out = Temporal.rateAnomaly(rows.toDF("event_type", "ts"), "event_type",
        "ts", zThreshold = 1.2)
      .collect().map(r => (r.getAs[String]("event_type"),
        r.getAs[java.sql.Date]("day").toString) -> r).toMap
    // click: mean 4, var (3*72-144)/9 = 8, z(day3) = 4/sqrt(8) ≈ 1.414
    val spike = out(("click", "2024-01-03"))
    assert(spike.getAs[Double]("mean_daily") == 4.0)
    assert(spike.getAs[Double]("var_daily") == 8.0)
    assert(spike.getAs[Double]("z") == 4.0 / math.sqrt(8.0))
    assert(spike.getAs[Boolean]("is_anomaly"))
    assert(!out(("click", "2024-01-01")).getAs[Boolean]("is_anomaly"))
    // flat type: variance 0 → z is null, never flagged
    val flat = out(("view", "2024-01-01"))
    assert(flat.getAs[Double]("var_daily") == 0.0)
    assert(flat.isNullAt(flat.fieldIndex("z")))
    assert(!flat.getAs[Boolean]("is_anomaly"))
  }

  test("gapFill: scaffold, zero-fill, linear interpolation, boundary nulls") {
    import spark.implicits._
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    // type a: observed day 2 (v=10) and day 5 (v=40) → days 3,4 interpolate
    //   to 20, 30; day 1 and 6 are boundary gaps (null interp)
    // type b: observed days 1 and 6 → interior days interpolate
    val rows = Seq(
      ("a", ts("2024-01-02 10:00:00"), 10.0),
      ("a", ts("2024-01-05 10:00:00"), 40.0),
      ("b", ts("2024-01-01 10:00:00"), 1.0),
      ("b", ts("2024-01-06 10:00:00"), 11.0))
    val out = Temporal.gapFill(rows.toDF("k", "ts", "v"), "k", "ts", "v")
      .collect()
      .map(r => (r.getAs[String]("k"), r.getAs[java.sql.Date]("day").toString) -> r)
      .toMap
    // global scaffold: both keys get all 6 days
    assert(out.size == 12)
    assert(out(("a", "2024-01-03")).getAs[Long]("n_events") == 0L)
    assert(out(("a", "2024-01-03")).getAs[Boolean]("is_filled"))
    // interp on exact micros: 10 + (40-10) * 1/3 = 20, * 2/3 = 30
    assert(out(("a", "2024-01-03")).getAs[Double]("interp_micros") == 2.0e7)
    assert(out(("a", "2024-01-04")).getAs[Double]("interp_micros") == 3.0e7)
    // observed rows carry their own value and is_filled = false
    assert(out(("a", "2024-01-02")).getAs[Long]("sum_micros") == 10000000L)
    assert(!out(("a", "2024-01-02")).getAs[Boolean]("is_filled"))
    assert(out(("a", "2024-01-02")).getAs[Double]("interp_micros") == 1.0e7)
    // boundary gaps stay null (no neighbor on one side)
    assert(out(("a", "2024-01-01")).isNullAt(
      out(("a", "2024-01-01")).fieldIndex("interp_micros")))
    assert(out(("a", "2024-01-06")).isNullAt(
      out(("a", "2024-01-06")).fieldIndex("interp_micros")))
    // key b interpolates across its own observations: 1 + 10*(d-1)/5
    assert(out(("b", "2024-01-03")).getAs[Double]("interp_micros") == 5.0e6)
  }
}
