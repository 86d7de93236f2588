package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Chunker

/** Golden-output regression guard for the chunker (SURVEY §5.2.5): the
  * exact chunk boundaries below were produced by this implementation and
  * verified by hand against the documented splitter semantics (separator
  * cascade, keep-separator-at-start, overlap pops, header stack). Any
  * refactor that changes them must be a deliberate semantic decision.
  */
class ChunkerGoldenSpec extends AnyFunSuite {

  test("golden: hybrid chunk of a structured markdown doc") {
    val md =
      """# Guide
        |Intro paragraph that is quite short.
        |
        |## Setup
        |First sentence of setup. Second sentence of setup. Third one is slightly longer than the others. Fourth sentence closes the section.
        |
        |## Usage
        |Short usage notes.""".stripMargin

    val chunks = Chunker.chunk(md, ChunkingConfig(chunkSize = 80, chunkOverlap = 16))

    val got = chunks.map(c => (c.chunkIndex, c.h1, c.h2, c.isSectionStart, c.text))
    // Hand-verified trace of the splitter semantics: the "\n" split keeps
    // the header as its own piece; ". "-splits carry the separator at the
    // start of the following piece; merge emits at the 80-char bound with
    // 16-char overlap pops.
    val expected = Seq(
      (0, Some("Guide"), None, true, "# Guide\nIntro paragraph that is quite short."),
      (1, Some("Guide"), Some("Setup"), true, "## Setup"),
      (2, Some("Guide"), Some("Setup"), false, "First sentence of setup. Second sentence of setup"),
      (3, Some("Guide"), Some("Setup"), false, ". Third one is slightly longer than the others"),
      (4, Some("Guide"), Some("Setup"), false, ". Fourth sentence closes the section."),
      (5, Some("Guide"), Some("Usage"), true, "## Usage\nShort usage notes.")
    )
    assert(got == expected, s"golden mismatch:\n${got.mkString("\n")}")
    assert(chunks.forall(_.totalChunks == chunks.length))
  }

  test("golden: recursive splitter overlap carry") {
    val text = "aaaa bbbb cccc dddd eeee ffff gggg hhhh"
    val got = Chunker.recursiveSplit(text, chunkSize = 12, chunkOverlap = 6)
    val expected = Seq("aaaa bbbb", "bbbb cccc", "cccc dddd", "dddd eeee", "eeee ffff", "ffff gggg", "gggg hhhh")
    assert(got == expected, s"got: $got")
  }

  test("golden: overlap at separator-cascade fallback (space, then char-level)") {
    // no "\n\n"/"\n"/". " present: the cascade falls through to " ", and
    // the 30-char unbroken run (> chunkSize) falls all the way to the ""
    // (char) separator. Hand-verified: overlap pops carry "gamma" across
    // chunks 0-1 and "epsilon" across 1-2 (keep-separator-at-start, pop
    // until total <= overlap); the x-run splits at char level into
    // 19 + 19 with an 8-char overlap (19 + 11 new = 30).
    val text = "alpha beta gamma delta epsilon zeta " + "x" * 30 + " tail words here"
    val got = Chunker.recursiveSplit(text, chunkSize = 20, chunkOverlap = 8)
    val expected = Seq(
      "alpha beta gamma",
      "gamma delta epsilon",
      "epsilon zeta",
      "x" * 19,
      "x" * 19,
      "tail words here"
    )
    assert(got == expected, s"got:\n${got.mkString("\n")}")
    assert(got.forall(_.length <= 20), "strict size bound holds at every cascade level")
  }

  test("golden: header-looking lines inside a fence stay opaque content") {
    val md =
      """# Real
        |intro line
        |```
        |# not a header
        |## also not
        |code()
        |```
        |after fence
        |## Sub
        |sub content""".stripMargin
    val got = Chunker.chunk(md, ChunkingConfig(chunkSize = 200, chunkOverlap = 20))
      .map(c => (c.chunkIndex, c.h1, c.h2, c.isSectionStart, c.text))
    // the fenced '#'/'##' lines create no sections and poison no header
    // stack: everything up to the real '## Sub' is ONE section under Real
    val expected = Seq(
      (0, Some("Real"), None, true,
        "# Real\nintro line\n```\n# not a header\n## also not\ncode()\n```\nafter fence"),
      (1, Some("Real"), Some("Sub"), true, "## Sub\nsub content")
    )
    assert(got == expected, s"golden mismatch:\n${got.mkString("\n")}")
  }

  test("golden: CRLF input chunks identically to LF input") {
    val lf = "# Title\nfirst para line.\n\n## Part\nsecond para with more words in it."
    val crlf = lf.replace("\n", "\r\n")
    val cfg = ChunkingConfig(chunkSize = 60, chunkOverlap = 10)
    val a = Chunker.chunk(lf, cfg).map(c => (c.chunkIndex, c.h1, c.h2, c.isSectionStart, c.text))
    val b = Chunker.chunk(crlf, cfg).map(c => (c.chunkIndex, c.h1, c.h2, c.isSectionStart, c.text))
    assert(a == b, s"CRLF diverged:\nLF:   ${a.mkString("; ")}\nCRLF: ${b.mkString("; ")}")
    assert(b.forall(c => !c._5.contains("\r")), "no carriage returns may leak into chunk text")
    // and the LF shape itself is pinned
    val expected = Seq(
      (0, Some("Title"), None, true, "# Title\nfirst para line."),
      (1, Some("Title"), Some("Part"), true, "## Part\nsecond para with more words in it.")
    )
    assert(a == expected, s"golden mismatch:\n${a.mkString("\n")}")
  }

  test("golden: corpus-level digest of every chunk over sf0.01") {
    // One hash over EVERY chunk the q_chunker config produces on the real
    // sf0.01 corpus: any drift in the splitter cascade, overlap pops,
    // header stack, token counts, or chunk ordering — on any document —
    // flips this digest. The small fixtures above localize a failure;
    // this pins the whole surface (q_chunker itself is rows-only at the
    // driver gate).
    val spark = SparkTestBase.spark
    import spark.implicits._
    import org.apache.spark.sql.functions.{col, sha2}
    val perChunk = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
      .select(col("doc_id"), col("text"))
      .where(col("text").isNotNull)
      .as[(Long, String)]
      .flatMap { case (id, text) =>
        Chunker.chunk(text, ChunkingConfig(chunkSize = 256, chunkOverlap = 32)).map { c =>
          s"$id|${c.chunkIndex}|${c.totalChunks}|${c.isSectionStart}|${c.tokenCount}|${c.text}"
        }
      }
      .toDF("row")
      .select(sha2(col("row"), 256).as("h"))
      .orderBy("h")
      .as[String]
      .collect()
    val md = java.security.MessageDigest.getInstance("SHA-256")
    perChunk.foreach(h => md.update(h.getBytes("UTF-8")))
    val corpusDigest = md.digest().map("%02x".format(_)).mkString
    assert(perChunk.length == 714, s"chunk count drifted: ${perChunk.length}")
    assert(
      corpusDigest == "2364c1d89fcf5fea844d660d14c9217c5748e5dd9cc83fb3a0701a63a796dcf8",
      s"corpus digest drifted: $corpusDigest")
  }
}
