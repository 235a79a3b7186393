package graft

import org.scalatest.funsuite.AnyFunSuite

/** Guards the driver-parse contract of graft.Bench's output: the
  * trailing summary line must be strict one-line JSON regardless of
  * platform locale, short enough to survive bounded tail capture, and
  * numerically consistent with the per-query line. A malformed or
  * truncation-prone bench line cost rounds 1-4 their machine-readable
  * perf signal — this spec makes the format a tested invariant instead
  * of a hope.
  */
class BenchFormatSpec extends AnyFunSuite {
  import org.json4s._
  import org.json4s.jackson.JsonMethods.parse

  private val results = Map("q1" -> 0.25, "q2" -> 1.75, "q3" -> 0.5)

  test("summary line is one short strict-JSON line with the right fields") {
    val line = Bench.summaryLine(results, "/data/sf0.1")
    assert(!line.contains("\n"))
    assert(line.length < 200, "must survive any bounded tail capture")
    val j = parse(line)
    assert((j \ "metric") == JString("total"))
    assert((j \ "unit") == JString("sec"))
    assert((j \ "sf") == JString("/data/sf0.1"))
    val JDouble(total) = j \ "value"
    val JDouble(mx) = j \ "max"
    val JInt(n) = j \ "n"
    assert(math.abs(total - 2.5) < 1e-9 && math.abs(mx - 1.75) < 1e-9)
    assert(n == 3)
  }

  test("summary line stays valid JSON under a comma-decimal locale") {
    val saved = java.util.Locale.getDefault
    try {
      java.util.Locale.setDefault(java.util.Locale.GERMANY)
      val line = Bench.summaryLine(results, "/d")
      // under Locale.GERMANY a locale-sensitive %.3f renders "2,500"
      assert(line.contains("\"value\":2.500"), s"comma decimal leaked: $line")
      val JDouble(total) = parse(line) \ "value"
      assert(math.abs(total - 2.5) < 1e-9)
    } finally java.util.Locale.setDefault(saved)
  }

  test("chunked query lines are short, strict JSON, and reassemble the full map") {
    // 30 queries → multiple parts; every line must stay under ~1 KB so
    // a bounded TAIL capture keeps whole lines, and the union of parts
    // must reproduce every (query, time) pair.
    val many = (1 to 30).map(i => f"q$i%02d" -> i * 0.125).toMap
    val lines = Bench.chunkedQueryLines(many, "/d")
    assert(lines.size > 1)
    val reassembled = lines.flatMap { l =>
      assert(!l.contains("\n") && l.length < 1024, s"line too long: $l")
      val j = parse(l)
      assert((j \ "metric") == JString("queries_part"))
      val JInt(parts) = j \ "parts"
      assert(parts == lines.size)
      val JObject(qs) = j \ "queries"
      qs.map { case (k, v) => k -> v.asInstanceOf[JDouble].num }
    }.toMap
    assert(reassembled.keySet == many.keySet)
    for ((k, v) <- many)
      assert(math.abs(reassembled(k) - v) < 5e-4, s"$k drifted")
  }

  test("spread line is short strict JSON carrying every pass total") {
    val p2 = Map("q1" -> 0.30, "q2" -> 1.50, "q3" -> 0.45)
    val p3 = Map("q1" -> 0.28, "q2" -> 1.40, "q3" -> 0.40)
    val line = Bench.spreadLine(Seq(results, p2, p3), "/data/sf0.1")
    assert(!line.contains("\n") && line.length < 200)
    val j = parse(line)
    assert((j \ "metric") == JString("pass_spread"))
    val JDouble(a) = j \ "pass1"
    val JDouble(b) = j \ "pass2"
    val JDouble(c) = j \ "pass3"
    assert(math.abs(a - 2.5) < 1e-9 && math.abs(b - 2.25) < 1e-9 &&
      math.abs(c - 2.08) < 1e-9)
    assert((j \ "sf") == JString("/data/sf0.1"))
  }

  test("queries line is one strict-JSON line carrying the full map") {
    val line = Bench.queriesLine(results, "/data/sf0.1")
    assert(!line.contains("\n"))
    val j = parse(line)
    assert((j \ "metric") == JString("queries"))
    assert((j \ "sf") == JString("/data/sf0.1"))
    val JInt(n) = j \ "n"
    assert(n == 3)
    val JObject(qs) = j \ "queries"
    val m = qs.map { case (k, v) => k -> v.asInstanceOf[JDouble].num }.toMap
    assert(m.keySet == results.keySet)
    for ((k, v) <- results) assert(math.abs(m(k) - v) < 5e-4, s"$k drifted")
    // locale-independence: same rendering discipline as the parts lines
    val saved = java.util.Locale.getDefault
    try {
      java.util.Locale.setDefault(java.util.Locale.GERMANY)
      val JObject(qs2) = parse(Bench.queriesLine(results, "/d")) \ "queries"
      assert(qs2.nonEmpty)
    } finally java.util.Locale.setDefault(saved)
  }

  test("per-query line parses and agrees with the summary") {
    val line = Bench.perQueryLine(results, "/d")
    val j = parse(line)
    val JObject(qs) = j \ "queries"
    assert(qs.map(_._1).toSet == Set("q1", "q2", "q3"))
    val JDouble(total) = j \ "value"
    assert(math.abs(total - 2.5) < 1e-9)
    // empty result set still yields parseable lines
    assert((parse(Bench.summaryLine(Map.empty, "/d")) \ "n") == JInt(0))
    val JDouble(z) = parse(Bench.perQueryLine(Map.empty, "/d")) \ "value"
    assert(z == 0.0)
  }
}
