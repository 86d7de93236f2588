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
}
