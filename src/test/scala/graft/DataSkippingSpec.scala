package graft

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.operators.Scale
import graft.pipeline.{DataSkipping, Medallion}

/** File-level data skipping (`pipeline/DataSkipping`) + z-order clustering
  * (`Scale.zorderBy`): soundness of the stats-manifest pruning (pruned read
  * ≡ plain filtered read, for every supported AND unsupported predicate
  * shape), conservativeness on nulls/truncation, and the layout interplay —
  * z-ordering makes skipping effective on every clustered dimension where a
  * linear sort only serves its leading column.
  */
class DataSkippingSpec extends SparkSpec {

  private def tmp(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString

  /** 4k rows, ints/double/date/string incl. a null-heavy column and an
    * oversized-string column; laid out as 8 files range-split on `a` so
    * per-file stats differ. */
  private lazy val dir: String = {
    val d = tmp("graft-skip")
    val df = spark.range(4096).select(
      col("id").as("a"),
      (col("id") * 7 % 4096).as("b"),
      (col("id") % 97).cast("double").as("score"),
      date_add(lit(java.sql.Date.valueOf("2024-01-01")),
        (col("id") % 365).cast("int")).as("day"),
      concat(lit("cat_"), lpad((col("id") % 7).cast("string"), 2, "0")).as("tag"),
      when(col("id") % 3 === 0, col("id")).as("sparse"),
      // strings past MaxStringStat: truncated max must stay conservative
      concat(lit("x" * 100), lpad(col("id").cast("string"), 6, "0")).as("longtag"))
    df.repartitionByRange(8, col("a")).write.parquet(s"$d/t")
    DataSkipping.writeManifest(spark, s"$d/t",
      Seq("a", "b", "score", "day", "tag", "sparse", "longtag"))
    s"$d/t"
  }

  private def assertSound(pred: Column): Long = {
    val skipped = DataSkipping.readSkipping(spark, dir, pred)
      .orderBy(col("a")).collect().toSeq
    val plain = spark.read.parquet(dir).where(pred)
      .orderBy(col("a")).collect().toSeq
    assert(skipped == plain, s"pruned read diverged for $pred")
    DataSkipping.prunedFiles(spark, dir, pred).get.size.toLong
  }

  test("manifest stats match a direct per-file recomputation") {
    val m = DataSkipping.manifest(spark, dir).get
    val direct = spark.read.parquet(dir)
      .groupBy(element_at(split(col("_metadata.file_path"), "/"), -1).as("file"))
      .agg(count(lit(1)).as("nrows"), min("a").as("min_a"), max("a").as("max_a"),
        sum(when(col("sparse").isNull, 1L).otherwise(0L)).as("nulls_sparse"))
    val got = m.select("file", "nrows", "min_a", "max_a", "nulls_sparse")
      .orderBy("file").collect().toSeq
    val want = direct.orderBy("file").collect().toSeq
    assert(got == want)
    assert(m.count() == 8)
  }

  test("pruned read ≡ plain read across predicate shapes; range preds skip") {
    // equality and ranges on the layout key actually skip files
    assert(assertSound(col("a") === 17) == 1)
    assert(assertSound(col("a") < 600) <= 2)
    assert(assertSound(col("a") >= 3500 && col("a") < 3700) <= 2)
    assert(assertSound(lit(100) > col("a")) <= 1) // literal-on-the-left order
    assert(assertSound(col("a").isin(5, 900, 4000)) <= 3)
    assert(assertSound(col("a").between(1000, 1200)) <= 2)
    // cross-column AND: either side's bound may prune
    assert(assertSound(col("a") < 600 && col("score") >= 0) <= 2)
    // OR keeps the union of either side's candidates
    assertSound(col("a") < 600 || col("a") >= 3900)
    // non-layout columns: sound even when nothing can be skipped
    assertSound(col("b") === 77)
    assertSound(col("day") >= lit(java.sql.Date.valueOf("2024-11-01")))
    assertSound(col("tag") === "cat_03")
    assertSound(col("score") < 5.0)
  }

  test("empty prune set still answers (empty, schema intact) without scanning") {
    val none = col("a") > 1000000
    assert(DataSkipping.prunedFiles(spark, dir, none).get.isEmpty)
    val out = DataSkipping.readSkipping(spark, dir, none)
    assert(out.count() == 0)
    assert(out.columns.contains("longtag"))
  }

  test("nulls: IS NULL / IS NOT NULL prune by null counts; stats ignore nulls") {
    assertSound(col("sparse").isNull)
    assertSound(col("sparse").isNotNull)
    assertSound(!col("sparse").isNull)
    assertSound(col("sparse") <=> 9L)
    // an all-null file: equality on it prunes, IS NULL keeps
    val d2 = tmp("graft-skip-null")
    spark.range(10).select(when(col("id") < 0, col("id")).as("v"))
      .coalesce(1).write.parquet(s"$d2/t")
    spark.range(10).select(col("id").as("v")).coalesce(1)
      .write.mode("append").parquet(s"$d2/t")
    DataSkipping.writeManifest(spark, s"$d2/t", Seq("v"))
    val eq = DataSkipping.readSkipping(spark, s"$d2/t", col("v") === 3)
    assert(eq.count() == 1)
    assert(DataSkipping.prunedFiles(spark, s"$d2/t", col("v") === 3).get.size == 1)
    assert(DataSkipping.readSkipping(spark, s"$d2/t", col("v").isNull).count() == 10)
  }

  test("unsupported shapes and truncated string stats are conservative") {
    // modulo, UDF-ish shapes, negation of a comparison: keep-all, still sound
    assert(assertSound(col("a") % 7 === 0) == 8)
    assert(assertSound(!(col("a") === 17)) == 8)
    assert(assertSound(upper(col("tag")) === "CAT_03") == 8)
    // longtag's max stat is NULL (truncated): upper-bound pruning must not
    // fire, and every matching row must survive
    val v = "x" * 100 + "004095" // the true maximum, beyond the stored stat
    assert(assertSound(col("longtag") === v) == 8)
    assert(assertSound(col("longtag") >= v) == 8)
    // lower bound (truncated min is still a valid lower bound) may prune
    assertSound(col("longtag") < "x")
  }

  test("z-order layout skips on EVERY clustered dim; linear sort only on its leading one") {
    val base = spark.range(4096).select(
      (col("id") * 2654435761L % 4096).as("a"),
      (col("id") * 40503 % 4096).as("b"),
      col("id").as("payload"))
    val zd = tmp("graft-z"); val ld = tmp("graft-lin")
    Scale.zorderBy(base, Seq("a", "b"), targetFiles = 16)
      .write.parquet(s"$zd/t")
    base.repartitionByRange(16, col("a")).sortWithinPartitions("a")
      .write.parquet(s"$ld/t")
    DataSkipping.writeManifest(spark, s"$zd/t", Seq("a", "b"))
    DataSkipping.writeManifest(spark, s"$ld/t", Seq("a", "b"))
    // clustering must not change the data
    assert(spark.read.parquet(s"$zd/t").orderBy("payload").collect().toSeq ==
      base.orderBy("payload").collect().toSeq)
    val onB = col("b") between (1000, 1250)
    val zKept = DataSkipping.prunedFiles(spark, s"$zd/t", onB).get.size
    val lKept = DataSkipping.prunedFiles(spark, s"$ld/t", onB).get.size
    assert(lKept == 16, s"linear-on-a layout cannot skip on b, kept $lKept")
    assert(zKept <= 8, s"z-order should skip >= half the files on b, kept $zKept")
    // a sits on the lower interleave bits, so its ranges are a bit looser
    // than b's — still a strict majority of files skipped on a 1/16-wide band
    val onA = col("a") between (1000, 1250)
    assert(DataSkipping.prunedFiles(spark, s"$zd/t", onA).get.size <= 10)
    // and of course both layouts answer identically
    Seq(onA, onB, onA && onB).foreach { p =>
      val z = DataSkipping.readSkipping(spark, s"$zd/t", p)
        .orderBy("payload").collect().toSeq
      val l = DataSkipping.readSkipping(spark, s"$ld/t", p)
        .orderBy("payload").collect().toSeq
      assert(z == l)
    }
  }

  test("graft_ubound ≡ the HOF bucket fold on duplicates, nulls, NaN, extremes") {
    graft.functions.GraftFunctions.register(spark)
    // duplicated + unsorted boundaries: count(b <= v) is order-invariant,
    // and the search must count every duplicate like the fold did
    val bs = Seq(0.5, 0.5, 2.0, 1.0, 1.0, 1.0, 3.5)
    val probes = spark.range(1).select(array(
      lit(Double.NegativeInfinity), lit(-1.0), lit(0.5), lit(0.75), lit(1.0),
      lit(2.0), lit(3.4999), lit(3.5), lit(99.0), lit(Double.PositiveInfinity),
      lit(Double.NaN), lit(null).cast("double")).as("vs"))
      .select(explode(col("vs")).as("v"))
    val both = probes.select(
      coalesce(call_function("graft_ubound", col("v"), lit(bs.toArray)), lit(0L))
        .as("search"),
      aggregate(lit(bs.toArray), lit(0L),
        (acc, b) => acc + when(col("v") >= b, 1L).otherwise(0L)).as("fold"))
    assert(both.filter(col("search") =!= col("fold")).count() == 0)
    // NaN sorts above everything in Spark: the search must count all bounds
    assert(both.agg(max("search")).head().getLong(0) == bs.size)
  }

  test("zorderBy rejects unrankable and undersized inputs") {
    val df = spark.range(4).select(col("id").as("a"),
      col("id").cast("string").as("s"), col("id").as("b"))
    intercept[IllegalArgumentException](Scale.zorderBy(df, Seq("a"), 2))
    intercept[IllegalArgumentException](Scale.zorderBy(df, Seq("a", "s"), 2))
    intercept[IllegalArgumentException](Scale.zorderBy(df, Seq("a", "b"), 2, bitsPerDim = 32))
  }

  test("appendManifest indexes only the delta; merged manifest ≡ a full rebuild") {
    val d = tmp("graft-append-man") + "/t"
    spark.range(2048).select(col("id").as("a"), (col("id") % 5).cast("string").as("tag"))
      .repartitionByRange(4, col("a")).write.parquet(d)
    assert(DataSkipping.writeManifest(spark, d, Seq("a", "tag")) == 4)
    // day-2 append: a new id range lands as new files the manifest missed
    spark.range(2048, 3072).select(col("id").as("a"), lit("cat_new").as("tag"))
      .repartitionByRange(2, col("a")).write.mode("append").parquet(d)
    // until re-indexed, pruning must still return the appended rows
    // (subtractive contract: unknown files are kept)
    assert(DataSkipping.readSkipping(spark, d, col("a") >= 2048).count() == 1024)
    assert(DataSkipping.appendManifest(spark, d, Seq("a", "tag")) == 2)
    assert(DataSkipping.appendManifest(spark, d, Seq("a", "tag")) == 0,
      "nothing new: incremental indexing must be idempotent")
    val merged = DataSkipping.manifest(spark, d).get.orderBy("file").collect().toSeq
    // the incremental result must be byte-for-byte what a full rescan builds
    DataSkipping.writeManifest(spark, d, Seq("a", "tag"))
    val full = DataSkipping.manifest(spark, d).get.orderBy("file").collect().toSeq
    assert(merged == full, "incremental manifest diverged from full rebuild")
    // and the freshly indexed delta actually prunes
    assert(DataSkipping.prunedFiles(spark, d, col("a") >= 2560).get.size == 1)
    // changed stats columns must refuse rather than silently drift
    intercept[IllegalArgumentException] {
      DataSkipping.appendManifest(spark, d, Seq("a"))
    }
  }

  test("gold integration: index the committed version, skip through readGoldSkipping") {
    val root = tmp("graft-gold-skip") + "/tbl"
    val df = spark.range(1000).select(col("id").as("k"),
      (col("id") % 13).cast("double").as("v"))
    Medallion.publishGold(spark,
      df.repartitionByRange(4, col("k")), root)
    assert(DataSkipping.indexGoldCurrent(spark, root, Seq("k")) == 4)
    val pred = col("k") >= 900
    val got = DataSkipping.readGoldSkipping(spark, root, pred)
      .orderBy("k").collect().toSeq
    val want = Medallion.readGold(spark, root).where(pred)
      .orderBy("k").collect().toSeq
    assert(got == want)
    val v = Medallion.goldCommittedVersion(spark, root).get
    assert(DataSkipping.prunedFiles(spark, s"$root/v=$v", pred).get.size == 1)
    // a fresh publish has no manifest yet: reader falls back to a full scan
    Medallion.publishGold(spark, df, root)
    assert(DataSkipping.readGoldSkipping(spark, root, pred).count() == want.size)
  }
}
