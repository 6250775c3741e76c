package graft

import org.scalatest.funsuite.AnyFunSuite

/** The bench artifact is one JSON line the driver parses — its error-status
  * sanitizer must make ANY exception message embeddable. */
class BenchSpec extends AnyFunSuite {

  test("jsonSafe neutralizes quotes, backslashes and control characters") {
    val nasty = "path \"C:\\tmp\\x\"\nline2\ttab\rcr" + "\u0000nul"
    val safe = Bench.jsonSafe(nasty)
    assert(!safe.contains("\"") && !safe.contains("\\"))
    assert(!safe.exists(_.isControl))
    // embedding the sanitized text in a JSON string literal must parse:
    // the assembled artifact line is exactly this shape
    val line = s"""{"status":{"q":"error: $safe"},"failed":1}"""
    assert(line.count(_ == '"') == 8)
  }

  test("jsonSafe truncates runaway messages") {
    assert(Bench.jsonSafe("x" * 10000).length == 160)
  }

  test("jsonSafe is ASCII-only so byte budget == char budget") {
    val wide = "schéma mismatch → colonne «l_qté» 中文 😱"
    val safe = Bench.jsonSafe(wide)
    assert(safe.forall(c => c >= 0x20 && c <= 0x7e))
    assert(Bench.utf8Len(safe) == safe.length)
  }

  test("parseConfOverrides: ';' entries keep comma-valued confs intact") {
    assert(Bench.parseConfOverrides(
      "spark.sql.extensions=a.B,c.D;spark.x=1") ==
      Seq("spark.sql.extensions" -> "a.B,c.D", "spark.x" -> "1"))
    // legacy ','-separated form still parses when no ';' present
    assert(Bench.parseConfOverrides("spark.a=1,spark.b=2") ==
      Seq("spark.a" -> "1", "spark.b" -> "2"))
    // values may contain '=' (only the first splits)
    assert(Bench.parseConfOverrides("spark.opt=k=v") ==
      Seq("spark.opt" -> "k=v"))
    // malformed fragments fail loudly instead of silently measuring defaults
    intercept[RuntimeException](Bench.parseConfOverrides("spark.a=1,junk"))
    intercept[RuntimeException](Bench.parseConfOverrides("=v"))
  }

  test("profileConfs: 'serving' disables AQE only; unknown names fail") {
    assert(Bench.profileConfs("serving") ==
      Seq("spark.sql.adaptive.enabled" -> "false"))
    intercept[RuntimeException](Bench.profileConfs("servnig"))
  }

  private def parse(line: String) =
    new com.fasterxml.jackson.databind.ObjectMapper().readTree(line)

  private def fullRegistryResults(wall: Double, cpu: Double): Seq[Bench.QRes] =
    SparkEntry.queries.keys.toSeq.sorted.zipWithIndex.map { case (n, i) =>
      // spread values so the slowest-first sort is non-trivial
      Bench.QRes(n, wall + (i % 7) * 0.13, cpu + (i % 5) * 1.7, wall * 2, "ok")
    }

  test("renderLine: full 95-query registry fits the driver's tail-capture budget") {
    val names = SparkEntry.queries.keys.toSeq
    assert(names.size >= 95, s"registry shrank to ${names.size}")
    // pessimistic magnitudes: multi-second walls, hundred-second cpus
    val rs = fullRegistryResults(wall = 9.87, cpu = 98.76)
    val line = Bench.renderLine("/root/testdata/sf0.1", rs,
      (1234567L, 987654321000000L, 45678L, 9876543210L),
      rerun = rs.map(_.name).take(8), // pessimistic: full heal list present
      healSec = 123.456, firstPassValue = 1234.567)
    assert(Bench.utf8Len(line) <= Bench.captureBudgetBytes,
      s"artifact line is ${Bench.utf8Len(line)} bytes")
    assert(!line.contains("\n"))
    val node = parse(line) // must be valid JSON end to end
    assert(node.get("queries").size() == names.size)
    assert(node.get("failed").asInt() == 0)
    assert(node.get("value").asDouble() > 0)
    // heal attribution travels with the totals (judge r8: unlabeled rerun
    // overhead read as a round-over-round regression)
    assert(node.get("rerun_overhead_sec").asDouble() > 0)
    assert(node.get("first_pass_value").asDouble() > 0)
  }

  test("renderLine: queries slowest-first, wall+cpu together, totals last") {
    val rs = Seq(
      Bench.QRes("q01_scan_filter_project", 0.42, 1.5, 0.9, "ok"),
      Bench.QRes("q81_dedup_survivors", 2.31, 8.12, 3.0, "ok"),
      Bench.QRes("q22sql_order_completeness", 1.05, 2.0, 1.2, "ok"))
    val line = Bench.renderLine("/x", rs, (0L, 0L, 0L, 0L))
    val node = parse(line)
    val keys = node.get("queries").fieldNames()
    val order = Iterator.continually(keys).takeWhile(_.hasNext).map(_.next()).toSeq
    assert(order == Seq("q81", "q22sql", "q01"))
    val q81 = node.get("queries").get("q81")
    assert(q81.get(0).asDouble() == 2.31 && q81.get(1).asDouble() == 8.12)
    // headline value is the LAST key on the line (tail capture keeps it)
    assert(line.trim.matches(""".*"value":[0-9.]+}"""))
    assert(math.abs(node.get("value").asDouble() - 3.78) < 0.001)
  }

  test("renderLine: degrades precision, never drops a query, when over budget") {
    // absurd magnitudes that cannot fit at centisecond precision
    val rs = SparkEntry.queries.keys.toSeq.sorted.map(n =>
      Bench.QRes(n, 99999.994, 99999.994, 99999.99, "ok"))
    val line = Bench.renderLine("/root/testdata/sf0.1", rs, (0L, 0L, 0L, 0L))
    val node = parse(line)
    assert(node.get("queries").size() == rs.size, "a query was dropped")
  }

  test("renderLine: failed queries keep their sanitized error text") {
    val rs = Seq(
      Bench.QRes("q01_scan_filter_project", 0.1, 0.1, 0.1, "ok"),
      Bench.QRes("q02_pricing_summary", 0.2, 0.2, 0.2,
        "error: " + Bench.jsonSafe("boom \"quoted\" \\slash")))
    val line = Bench.renderLine("/x", rs, (0L, 0L, 0L, 0L))
    val node = parse(line)
    assert(node.get("failed").asInt() == 1)
    assert(node.get("errors").get("q02").asText().startsWith("error: boom"))
  }

  test("fmtSec strips trailing zeros without losing precision") {
    assert(Bench.fmtSec(0.40, 2) == "0.4")
    assert(Bench.fmtSec(12.00, 2) == "12")
    assert(Bench.fmtSec(2.31, 2) == "2.31")
    assert(Bench.fmtSec(123.456, 1) == "123.5")
    assert(Bench.fmtSec(123.456, 0) == "123")
  }

  test("renderLine: rerun list rendered with short keys") {
    val rs = Seq(
      Bench.QRes("q38_dup_clusters", 41.88, 300.0, 42.0, "ok"),
      Bench.QRes("q01_scan_filter_project", 0.4, 1.5, 0.9, "ok"))
    val line = Bench.renderLine("/x", rs, (0L, 0L, 0L, 0L),
      rerun = Seq("q38_dup_clusters"))
    val node = parse(line)
    assert(node.get("rerun").size() == 1)
    assert(node.get("rerun").get(0).asText() == "q38")
  }

  test("renderLine: many failed queries shrink error text rather than bust the budget") {
    // every registry query failing with a maximal 160-char message cannot
    // fit at full error length; the render must degrade error text and
    // still emit valid JSON under budget with zero queries dropped
    val err = "error: " + Bench.jsonSafe("x" * 500)
    val rs = SparkEntry.queries.keys.toSeq.sorted.map(n =>
      Bench.QRes(n, 1.23, 4.56, 2.0, err))
    val line = Bench.renderLine("/root/testdata/sf0.1", rs, (0L, 0L, 0L, 0L))
    assert(Bench.utf8Len(line) <= Bench.captureBudgetBytes,
      s"line is ${Bench.utf8Len(line)} bytes")
    val node = parse(line)
    assert(node.get("queries").size() == rs.size)
    assert(node.get("failed").asInt() == rs.size)
  }

  test("renderLine: error load shrinks error text BEFORE timing precision") {
    // the round-7 shape: full registry, six realistic analysis errors —
    // the walls must keep centisecond precision (errors degrade instead)
    val err = "error: " + Bench.jsonSafe(
      "[DATATYPE_MISMATCH.BINARY_OP_DIFF_TYPES] Cannot resolve \"(ts div 1000)\" " +
        "due to data type mismatch: the left and right operands of the binary " +
        "operator have incompatible types (\"TIMESTAMP_NTZ\" and \"BIGINT\").")
    // round-7-shaped magnitudes: mostly sub-second walls, a heavy tail
    val rs = fullRegistryResults(wall = 0.31, cpu = 1.17).zipWithIndex.map {
      case (r, i) =>
        val tailed = if (i % 12 == 0) r.copy(wall = 20.0 + i, cpu = 80.0 + i) else r
        if (Seq("q10", "q23", "q24", "q29", "q72", "q86")
            .exists(p => tailed.name.startsWith(p + "_"))) tailed.copy(status = err)
        else tailed
    }
    val line = Bench.renderLine("/root/testdata/sf0.1", rs,
      (1234567L, 987654321000000L, 45678L, 9876543210L),
      rerun = rs.map(_.name).take(8))
    assert(Bench.utf8Len(line) <= Bench.captureBudgetBytes,
      s"line is ${Bench.utf8Len(line)} bytes")
    val node = parse(line)
    assert(node.get("failed").asInt() == 6)
    assert(node.get("queries").size() == rs.size)
    // a 0.57 s wall must survive with BOTH decimals intact despite 6 errors
    val q03 = node.get("queries").get("q03")
    assert(q03.get(0).asText().matches("""0\.\d{1,2}""") &&
      math.abs(q03.get(0).asDouble() - 0.57) < 0.005,
      s"wall lost precision: ${q03.get(0).asText()}")
  }

  test("suspectNames flags ratio outliers and runaway walls, capped and slowest-first") {
    // a healthy run: 20 queries around 1 s wall, cpu/wall ≈ 8
    val healthy = (1 to 20).map(i =>
      Bench.QRes(f"q$i%02d_x", 1.0 + i * 0.01, 8.0, 1.5, "ok"))
    assert(Bench.suspectNames(healthy).isEmpty)
    // r6-shaped pathology: wall inflated 25x with cpu thrash (high ratio),
    // an I/O stall (wall >> cpu), and a proportional blowup
    val thrash = Bench.QRes("q38_cc", 41.9, 1600.0, 42.0, "ok")   // ratio 38 vs med 8
    val stall = Bench.QRes("q57_io", 12.0, 3.0, 12.0, "ok")       // ratio 0.25
    val blowup = Bench.QRes("q66_prop", 30.0, 240.0, 30.0, "ok")  // ratio 8 but wall 30x med
    val tiny = Bench.QRes("q07_fast", 0.4, 50.0, 0.5, "ok")       // weird ratio, sub-floor wall
    val names = Bench.suspectNames(healthy ++ Seq(thrash, stall, blowup, tiny))
    assert(names == Seq("q38_cc", "q66_prop", "q57_io"))
    // failed queries never re-run (their status already tells the story)
    val failed = Bench.QRes("q99_bad", 50.0, 400.0, 50.0, "error: boom")
    assert(!Bench.suspectNames(healthy :+ failed).contains("q99_bad"))
    // cap respected
    val storm = (1 to 12).map(i => Bench.QRes(s"s$i", 100.0 + i, 5000.0, 100.0, "ok"))
    assert(Bench.suspectNames(healthy ++ storm, cap = 8).size == 8)
  }

  test("suspectNames v3: wall- or cpu-corroborated entries exempt; thrash always heals") {
    val healthy = (1 to 20).map(i =>
      Bench.QRes(f"q$i%02d_x", 1.0 + i * 0.01, 8.0, 1.5, "ok", wallWarm = 1.4))
    // structurally big AND corroborated: cold 305 / warm 300 agree within
    // 10% — the permanently-flagged sf10 shape that burnt 44% of the r11
    // sweep; a third rep cannot exonerate what two already agree on
    val bigStable = Bench.QRes("q21_allpairs", 300.0, 2400.0, 305.0, "ok",
      wallWarm = 300.0)
    assert(!Bench.suspectNames(healthy :+ bigStable).contains("q21_allpairs"))
    // walls DISAGREE (cold 300 / warm 60) and so do cpus: transient
    // window candidate — still healed
    val bigUnstable = Bench.QRes("q22_x", 60.0, 480.0, 300.0, "ok",
      wallWarm = 60.0, cpuCold = 2400.0, cpuWarm = 480.0)
    assert(Bench.suspectNames(healthy :+ bigUnstable).contains("q22_x"))
    // v3: walls disagree >10% but BOTH reps burned the same cpu — the work
    // was identical, the wall delta is box noise (the r12 sf10 shape that
    // burnt ~670 s re-running five 3,000-cpu-s queries) — exempt
    val cpuCorroborated = Bench.QRes("q81_cc", 132.0, 3061.0, 180.0, "ok",
      wallWarm = 132.0, cpuCold = 3070.0, cpuWarm = 3061.0)
    assert(!Bench.suspectNames(healthy :+ cpuCorroborated).contains("q81_cc"))
    // single-rep entries (warm never ran → NaN) stay conservatively healable
    val singleRep = Bench.QRes("q23_x", 300.0, 2400.0, 300.0, "ok")
    assert(Bench.suspectNames(healthy :+ singleRep).contains("q23_x"))
    // v3: a stall-shaped ratio outlier (wall >> cpu) whose reps agree is
    // corroborated — a window spanning cold AND warm can't be exonerated
    // by a third rep either (VERDICT r12 #6)
    val stableStall = Bench.QRes("q57_io", 12.0, 3.0, 12.5, "ok",
      wallWarm = 12.0)
    assert(!Bench.suspectNames(healthy :+ stableStall).contains("q57_io"))
    // ...but an UNCORROBORATED stall still heals
    val unstableStall = Bench.QRes("q58_io", 12.0, 3.0, 20.0, "ok",
      wallWarm = 12.0, cpuCold = 5.0, cpuWarm = 3.0)
    assert(Bench.suspectNames(healthy :+ unstableStall).contains("q58_io"))
    // thrash (cpu >> wall vs run median) heals UNCONDITIONALLY: there the
    // cpu column is the symptom, so it cannot also be the corroboration
    val stableThrash = Bench.QRes("q38_cc", 41.9, 1600.0, 42.0, "ok",
      wallWarm = 41.9, cpuCold = 1600.0, cpuWarm = 1590.0)
    assert(Bench.suspectNames(healthy :+ stableThrash).contains("q38_cc"))
    // the artifact labels the policy change
    val line = Bench.renderLine("/x", healthy :+ bigStable, (0L, 0L, 0L, 0L))
    assert(line.contains("\"heal_policy\":\"v3\""))
  }

  test("shortKeys: unique qNN prefixes for the whole registry") {
    val names = SparkEntry.queries.keys.toSeq
    val keys = Bench.shortKeys(names)
    assert(keys.values.toSet.size == names.size)
    assert(keys("q22sql_order_completeness") == "q22sql")
  }
}
