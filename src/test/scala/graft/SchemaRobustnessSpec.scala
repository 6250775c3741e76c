package graft

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

/** Reader robustness against driver testdata regenerations.
  *
  * Round 7 lost six queries because `events.ts` changed parquet encoding
  * under the engine (TIMESTAMP(NANOS)-as-INT64 → TIMESTAMP_MICROS) and the
  * reader assumed one shape. This spec pins `Tables.events`' contract: the
  * SAME instants under every encoding the driver has ever shipped — INT64
  * nanoseconds, TIMESTAMP_MICROS with isAdjustedToUTC=false (Spark reads
  * TIMESTAMP_NTZ), and UTC-adjusted TIMESTAMP_MICROS (TimestampType) — must
  * analyze AND produce hash-identical results for every events-family
  * registry query. A future encoding drift fails here, in `sbt test`,
  * before it can fail a driver correctness round.
  */
class SchemaRobustnessSpec extends SparkSpec {

  private val srcDir = "/root/testdata/sf0.001"
  private val eventsQueries = Seq(
    "q10_events_json", "q23_eligibility", "q24_windowed_agg",
    "q29_sessionization", "q72_rate_anomaly", "q86_gap_fill")

  /** Temp sf-dir: every table symlinked from sf0.001 except events, which is
    * rewritten with `ts` in the requested encoding from the same rows. */
  private def variantDir(name: String)(writeEvents: (DataFrame, String) => Unit): String = {
    val dir = Files.createTempDirectory(s"graft-enc-$name").toString
    val src = Paths.get(srcDir)
    Files.list(src).forEach { p =>
      val fn = p.getFileName.toString
      if (fn.endsWith(".parquet") && fn != "events.parquet")
        Files.createSymbolicLink(Paths.get(dir, fn), p)
    }
    // Normalize the source through Tables.events so this spec keeps working
    // no matter which encoding the CURRENT testdata uses.
    val canonical = sources.Tables.events(spark, srcDir)
    writeEvents(canonical, s"$dir/events.parquet")
    dir
  }

  private lazy val encodings: Map[String, String] = Map(
    // The nanos era: Spark can't WRITE TIMESTAMP(NANOS), but under
    // nanosAsLong the reader saw exactly a LongType nanos column — writing
    // plain INT64 ns reproduces the branch the old data exercised.
    "int64-nanos" -> variantDir("ns") { (ev, out) =>
      ev.withColumn("ts", unix_micros(col("ts")) * lit(1000L))
        .write.mode("overwrite").parquet(out)
    },
    // The current era: µs with isAdjustedToUTC=false → TIMESTAMP_NTZ scan.
    "micros-ntz" -> variantDir("ntz") { (ev, out) =>
      ev.withColumn("ts", col("ts").cast(TimestampNTZType))
        .write.mode("overwrite").parquet(out)
    },
    // UTC-adjusted µs → TimestampType scan (also what Spark-written
    // pipelines hand back to us).
    "micros-utc" -> variantDir("utc") { (ev, out) =>
      spark.conf.set("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
      ev.withColumn("ts", col("ts").cast(TimestampType))
        .write.mode("overwrite").parquet(out)
    })

  /** Order-independent digest: XOR of per-row xxhash64 over all columns
    * (sum would overflow under the session's ANSI mode). */
  private def digest(df: DataFrame): (Long, Long) = {
    val h = xxhash64(df.columns.map(c => col(c).cast("string")): _*)
    val r = df.select(h.as("h"))
      .agg(count(lit(1)), expr("coalesce(bit_xor(h), 0L)")).first()
    (r.getLong(0), r.getLong(1))
  }

  test("events scan surfaces the expected dtype per encoding, ts always TimestampType out") {
    val byEnc = encodings.map { case (enc, dir) =>
      enc -> spark.read.parquet(s"$dir/events.parquet").schema("ts").dataType
    }
    assert(byEnc("int64-nanos") == LongType, byEnc)
    assert(byEnc("micros-ntz") == TimestampNTZType, byEnc)
    assert(byEnc("micros-utc") == TimestampType, byEnc)
    encodings.foreach { case (enc, dir) =>
      val got = sources.Tables.events(spark, dir).schema("ts").dataType
      assert(got == TimestampType, s"$enc: Tables.events surfaced $got")
    }
  }

  for (q <- eventsQueries)
    test(s"$q analyzes and hashes identically across all ts encodings") {
      val digests = encodings.map { case (enc, dir) =>
        val df = SparkEntry.queries(q)(spark, dir)
        df.queryExecution.analyzed // analysis must not throw (the r7 failure mode)
        enc -> digest(df)
      }
      assert(digests.values.toSet.size == 1,
        s"$q diverges across encodings: $digests")
    }
}
