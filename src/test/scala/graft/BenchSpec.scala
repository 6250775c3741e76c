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
}
