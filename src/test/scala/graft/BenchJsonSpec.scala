package graft

import com.fasterxml.jackson.databind.ObjectMapper
import org.scalatest.funsuite.AnyFunSuite

/** The bench metric line is a machine contract: the driver json-parses it.
  * Round 1 shipped an unparseable bench (log noise around the only copy of
  * the line); this pins the rendering itself so it cannot regress.
  */
class BenchJsonSpec extends AnyFunSuite {

  private val mapper = new ObjectMapper()

  test("metric line is valid JSON with total = sum of query times") {
    val json = Bench.renderJson(
      Seq("q_a" -> 1.5, "q_b" -> 2.25), "/root/testdata/sf0.1")
    val node = mapper.readTree(json)
    assert(node.get("metric").asText() === "total")
    assert(node.get("unit").asText() === "sec")
    assert(math.abs(node.get("value").asDouble() - 3.75) < 1e-12)
    assert(node.get("queries").get("q_a").asDouble() === 1.5)
    assert(node.get("queries").get("q_b").asDouble() === 2.25)
    assert(node.get("sf").asText() === "/root/testdata/sf0.1")
  }

  test("a failed query poisons the total instead of vanishing") {
    val json = Bench.renderJson(Seq("q_ok" -> 2.0, "q_bad" -> -1.0), "sf")
    val node = mapper.readTree(json)
    assert(node.get("value").asDouble() >= 1e9)
    assert(node.get("queries").get("q_bad").asDouble() === -1.0)
  }

  test("single line, no interior newlines") {
    val json = Bench.renderJson(Seq("q" -> 0.1), "sf")
    assert(!json.contains("\n"))
    assert(json.startsWith("{") && json.endsWith("}"))
  }

  test("quotes/backslashes/control chars in sf dir stay valid JSON") {
    val nasty = "/tmp/we\"ird\\dir\n"
    val node = mapper.readTree(Bench.renderJson(Seq("q" -> 1.0), nasty))
    assert(node.get("sf").asText() === nasty)
  }

  test("short line: positional qv in name order, fits the tail window") {
    val results = (1 to 130).map(i => f"q_query_number_$i%03d" -> (i * 0.0625))
    val short = Bench.renderShortJson(results.reverse, "/root/testdata/sf0.1")
    val node = mapper.readTree(short)
    assert(node.get("metric").asText() === "total")
    assert(math.abs(node.get("value").asDouble() - results.map(_._2).sum) < 1e-9)
    assert(node.get("queries") == null)
    assert(!short.contains("\n"))
    // positional per-query seconds, name-ascending regardless of input order
    assert(node.get("order").asText() === "name-asc")
    assert(node.get("nq").asInt() === 130)
    assert(node.get("qv").size() === 130)
    assert(math.abs(node.get("qv").get(0).asDouble() - 0.063) < 1e-12)
    assert(math.abs(node.get("qv").get(129).asDouble() - 8.125) < 1e-12)
    // the whole point: survives the driver's ~2000-char stdout tail even
    // at slightly above today's query count
    assert(short.length < 1900)
    // same poisoned-total semantics as the detailed line; failed query = -1
    val poisoned = Bench.renderShortJson(Seq("q" -> -1.0), "sf")
    val pnode = mapper.readTree(poisoned)
    assert(pnode.get("value").asDouble() >= 1e9)
    assert(pnode.get("qv").get(0).asDouble() === -1.0)
  }

  test("r1 like-for-like subset fields ride both lines") {
    // one first-green query + one later addition: subset sums ONLY the
    // first-green one, n counts it, and both renderings carry the fields
    val results = Seq("q_row_count" -> 0.5, "q_bm25" -> 2.0)
    val det = mapper.readTree(Bench.renderJson(results, "sf"))
    assert(math.abs(det.get("r1_subset_sec").asDouble() - 0.5) < 1e-12)
    assert(det.get("r1_subset_n").asInt() === 1)
    val short = mapper.readTree(Bench.renderShortJson(results, "sf"))
    assert(math.abs(short.get("r1_subset_sec").asDouble() - 0.5) < 1e-12)
    assert(short.get("r1_subset_n").asInt() === 1)
    // a failed first-green query poisons the subset like the total
    val poisoned = mapper.readTree(
      Bench.renderJson(Seq("q_row_count" -> -1.0), "sf"))
    assert(poisoned.get("r1_subset_sec").asDouble() >= 1e9)
    // all 52 first-green names stay members of the live suite
    assert(Bench.firstGreenQueries.subsetOf(SparkEntry.queries.keySet))
  }

  test("short line: a suite too big for the window drops qv, stays valid") {
    val huge = (1 to 400).map(i => f"q_$i%03d" -> 1.0)
    val short = Bench.renderShortJson(huge, "sf")
    val node = mapper.readTree(short)
    assert(node.get("qv") == null)
    assert(math.abs(node.get("value").asDouble() - 400.0) < 1e-9)
    assert(short.length < 200)
  }

  test("regression tripwire: >1.5x AND >0.3s movers only, ranked by ratio") {
    val prev = Map("q_a" -> 1.0, "q_b" -> 0.1, "q_c" -> 2.0,
                   "q_d" -> 0.5, "q_e" -> 1.0)
    val results = Seq(
      "q_a" -> 1.6,   // 1.6x and +0.6s -> flagged
      "q_b" -> 0.25,  // 2.5x but only +0.15s -> noise floor, not flagged
      "q_c" -> 2.9,   // 1.45x -> under ratio, not flagged
      "q_d" -> 2.5,   // 5.0x and +2.0s -> flagged, ranked first
      "q_e" -> -1.0,  // ran last round, FAILED now -> [prev,-1], first
      "q_new" -> 9.9) // no previous record -> excluded
    val regs = Bench.regressions(results, prev)
    assert(regs.map(_._1) === Seq("q_e", "q_d", "q_a"))
    assert(regs.head === (("q_e", 1.0, -1.0)))
    assert(regs(1) === (("q_d", 0.5, 2.5)))
  }

  test("failed-this-round regression renders as a literal -1 marker") {
    val det = mapper.readTree(
      Bench.renderJson(Seq("q_x" -> -1.0), "sf", Map("q_x" -> 2.0)))
    val arr = det.get("regressions").get("q_x")
    assert(arr.get(0).asDouble() === 2.0 && arr.get(1).asInt() === -1)
  }

  test("regressions ride both lines and parse; absent prev omits the field") {
    val prev = Map("q_slow" -> 1.0)
    val results = Seq("q_slow" -> 2.0, "q_fine" -> 0.2)
    val det = mapper.readTree(Bench.renderJson(results, "sf", prev))
    val arr = det.get("regressions").get("q_slow")
    assert(arr.get(0).asDouble() === 1.0 && arr.get(1).asDouble() === 2.0)
    val short = mapper.readTree(Bench.renderShortJson(results, "sf", prev))
    val sarr = short.get("regressions").get("q_slow")
    assert(sarr.get(0).asDouble() === 1.0 && sarr.get(1).asDouble() === 2.0)
    // no previous round -> no field at all (not an empty object)
    assert(mapper.readTree(Bench.renderJson(results, "sf"))
      .get("regressions") == null)
    // a clean round against a prev record -> empty object, still parseable
    val clean = mapper.readTree(
      Bench.renderShortJson(Seq("q_slow" -> 1.0), "sf", prev))
    assert(clean.get("regressions").size() === 0)
  }

  test("short line drops regressions BEFORE qv when the window is tight") {
    // ~130 queries fit with qv but not with a huge regressions map:
    // every query regressed 10x from 1s to 10s
    val results = (1 to 130).map(i => f"q_query_number_$i%03d" -> 10.0)
    val prev = results.map { case (n, _) => n -> 1.0 }.toMap
    val short = Bench.renderShortJson(results, "sf", prev)
    assert(short.length <= 1900)
    val node = mapper.readTree(short)
    assert(node.get("qv") != null, "qv must survive")
    assert(node.get("regressions") == null, "regressions dropped first")
  }

  test("loadPrevRound recovers the last driver round's named seconds") {
    val prev = Bench.loadPrevRound("/root/repo")
    if (prev.nonEmpty) { // absent on a fresh checkout — that's the off switch
      assert(prev.keys.forall(_.startsWith("q_")))
      assert(prev.valuesIterator.forall(_ >= 0))
      // spot-check a stable member against the positional protocol
      assert(prev.contains("q_row_count"))
    }
    // a directory with no records disables the tripwire
    assert(Bench.loadPrevRound("/nonexistent-dir-xyz").isEmpty)
  }
}
