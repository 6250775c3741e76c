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
    val line = Bench.renderLine("/root/testdata/sf0.1",
      fullRegistryResults(wall = 9.87, cpu = 98.76),
      (1234567L, 987654321000000L, 45678L, 9876543210L))
    assert(line.length <= Bench.captureBudgetBytes,
      s"artifact line is ${line.length} bytes")
    assert(!line.contains("\n"))
    val node = parse(line) // must be valid JSON end to end
    assert(node.get("queries").size() == names.size)
    assert(node.get("failed").asInt() == 0)
    assert(node.get("value").asDouble() > 0)
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

  test("shortKeys: unique qNN prefixes for the whole registry") {
    val names = SparkEntry.queries.keys.toSeq
    val keys = Bench.shortKeys(names)
    assert(keys.values.toSet.size == names.size)
    assert(keys("q22sql_order_completeness") == "q22sql")
  }
}
