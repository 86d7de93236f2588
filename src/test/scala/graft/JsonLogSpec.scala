package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.util.JsonLog

class JsonLogSpec extends AnyFunSuite {

  test("renders typed fields: strings quoted+escaped, numbers/booleans bare, null literal") {
    val line = JsonLog.line("ingest",
      "dir" -> ("/data/\"in\"" + "\n"), "n" -> 42L, "ratio" -> 0.5, "ok" -> true, "err" -> null)
    assert(line ==
      """{"event":"ingest","dir":"/data/\"in\"\n","n":42,"ratio":0.5,"ok":true,"err":null}""")
  }

  test("control characters escape to backslash-u sequences; output is single-line") {
    val line = JsonLog.line("e", "k" -> ("a" + 1.toChar + "b" + "\t" + "c"))
    assert(line == "{\"event\":\"e\",\"k\":\"a\\u0001b\\tc\"}")
    assert(!line.contains('\n'))
  }

  test("lines parse as JSON (round-trip through jackson)") {
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val node = mapper.readTree(JsonLog.line("ev", "a" -> "x\\y", "b" -> 7))
    assert(node.get("event").asText == "ev")
    assert(node.get("a").asText == "x\\y")
    assert(node.get("b").asInt == 7)
  }
}
