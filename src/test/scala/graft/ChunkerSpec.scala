package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Chunker

class ChunkerSpec extends AnyFunSuite {

  test("header splitter tracks h1/h2/h3 stack and keeps headers in content") {
    val md =
      """# Title
        |intro text
        |## Section A
        |a body
        |### Sub A1
        |a1 body
        |## Section B
        |b body""".stripMargin
    val sections = Chunker.splitByHeaders(md)
    assert(sections.nonEmpty)
    val a1 = sections.find(_.h3.contains("Sub A1")).get
    assert(a1.h1.contains("Title") && a1.h2.contains("Section A"))
    assert(a1.content.contains("### Sub A1")) // strip_headers=False
    val b = sections.find(_.h2.contains("Section B")).get
    assert(b.h3.isEmpty, "h3 must pop when a new h2 arrives")
  }

  test("header splitter treats fenced code blocks as opaque") {
    val md =
      """# T
        |```
        |# not a header
        |```
        |after""".stripMargin
    val sections = Chunker.splitByHeaders(md)
    assert(sections.forall(s => s.h1.forall(_ == "T")))
    assert(!sections.exists(_.h1.contains("not a header")))
  }

  test("recursive splitter respects chunk size for splittable text") {
    val text = (1 to 100).map(i => s"sentence number $i here. ").mkString
    val chunks = Chunker.recursiveSplit(text, chunkSize = 100, chunkOverlap = 20)
    assert(chunks.nonEmpty)
    chunks.foreach(c => assert(c.length <= 100, s"chunk too long: ${c.length}"))
  }

  test("recursive splitter keeps unsplittable runs intact") {
    val text = "a" * 700 // no separators at all except ""
    val chunks = Chunker.recursiveSplit(text, chunkSize = 512, chunkOverlap = 50)
    // character-level fallback still caps size
    chunks.foreach(c => assert(c.length <= 512))
    assert(chunks.map(_.length).sum >= 700) // overlap means >= original
  }

  test("chunk: section > 1.5x chunkSize triggers re-split; small stays whole") {
    val small = "# H\nshort body"
    val cs = Chunker.chunk(small)
    assert(cs.length == 1 && cs.head.isSectionStart)

    val big = "# H\n" + (1 to 80).map(i => s"word$i content here. ").mkString
    val cb = Chunker.chunk(big, ChunkingConfig(chunkSize = 128, chunkOverlap = 16))
    assert(cb.length > 1)
    assert(cb.head.isSectionStart && cb.tail.forall(!_.isSectionStart))
  }

  test("chunk indices dense 0..n-1 and totalChunks constant") {
    val md = "# A\n" + ("x " * 600) + "\n## B\n" + ("y " * 600)
    val cs = Chunker.chunk(md, ChunkingConfig(chunkSize = 256, chunkOverlap = 32))
    assert(cs.map(_.chunkIndex) == cs.indices.toSeq)
    assert(cs.map(_.totalChunks).distinct == Seq(cs.length))
  }

  test("token estimate matches python int(len(split())*1.3)") {
    assert(Chunker.estimateTokens("one two three") == (3 * 1.3).toInt)
    assert(Chunker.estimateTokens("  padded   words  ") == (2 * 1.3).toInt)
    assert(Chunker.estimateTokens("") == 0)
  }

  test("property: chunks are trimmed, non-empty, within size for separator-rich text") {
    val rnd = new scala.util.Random(42)
    val vocab = Vector("alpha", "beta", "gamma", "delta", "epsilon")
    for (_ <- 1 to 50) {
      val n = 1 + rnd.nextInt(300)
      val text = Seq.fill(n)(vocab(rnd.nextInt(vocab.size))).mkString(" ")
      val chunks = Chunker.recursiveSplit(text, 128, 16)
      chunks.foreach { c =>
        assert(c.trim.nonEmpty)
        assert(c.length <= 128)
      }
      // coverage: total content at least the original minus separators
      assert(chunks.map(_.length).sum >= text.replace(" ", "").length - chunks.length)
    }
  }
}
