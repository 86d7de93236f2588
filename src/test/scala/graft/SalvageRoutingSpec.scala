package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.model.ValidationResult
import graft.sources.{ImageExtraction, PdfSource}

/** Parse-failure routing for damaged inputs (reference
  * src/extract/validator.py:67-75): a %PDF-headed file with no
  * recoverable structure must surface honestly — `corrupted` text
  * extraction and ZERO image rows — never fabricated stub content.
  * Printable synthetic fixtures (the shape every spec uses) keep the
  * text-salvage path, and non-PDF bytes keep the deterministic stub
  * fan-out.
  */
class SalvageRoutingSpec extends AnyFunSuite {

  private val binaryGarbagePdf: Array[Byte] =
    "%PDF-1.4\n".getBytes("UTF-8") ++
      Array.tabulate[Byte](512)(i => (0x80 | ((i * 37) & 0x7f)).toByte)

  private val printableFixturePdf: Array[Byte] =
    "%PDF-1.4\n# Title\n\nplain printable fixture body about spark scans".getBytes("UTF-8")

  private val nonPdfBytes: Array[Byte] =
    "not a pdf at all, just fixture text".getBytes("UTF-8")

  test("binary-garbage %PDF routes to corrupted, not fabricated salvage") {
    val got = PdfSource.JvmExtractor.extract("damaged.pdf", binaryGarbagePdf)
    assert(got.error.contains(ValidationResult.Corrupted), s"got $got")
    assert(got.markdown.isEmpty && got.pageCount == 0, "no invented text or page count")
  }

  test("printable-payload %PDF without object structure still text-salvages") {
    val got = PdfSource.JvmExtractor.extract("fixture.pdf", printableFixturePdf)
    assert(got.error.isEmpty, s"got $got")
    assert(got.markdown.nonEmpty && got.pageCount >= 1)
  }

  test("UTF-8 decode must not launder binary payloads into printable ones") {
    // every payload byte has the high bit set; a decode-first printability
    // test would collapse invalid runs to U+FFFD (>= ' ') and salvage this
    val allHighBit = "%PDF-1.4\n".getBytes("UTF-8") ++ Array.fill[Byte](256)(0xC3.toByte)
    val got = PdfSource.JvmExtractor.extract("high.pdf", allHighBit)
    assert(got.error.contains(ValidationResult.Corrupted), s"got $got")
  }

  test("image extraction yields zero rows for a damaged real PDF") {
    assert(ImageExtraction.JvmImageExtractor.extract("damaged.pdf", binaryGarbagePdf).isEmpty)
  }

  test("image extraction keeps the deterministic stub fan-out for non-PDF fixtures") {
    def flat(xs: Seq[ImageExtraction.RawImage]) =
      xs.map(i => (i.pageNumber, i.imageIndex, i.format, i.width, i.height, i.bytes.toSeq))
    val got = ImageExtraction.JvmImageExtractor.extract("fixture.bin", nonPdfBytes)
    val stub = ImageExtraction.StubImageExtractor.extract("fixture.bin", nonPdfBytes)
    assert(flat(got) == flat(stub), "non-PDF bytes route to the stub unchanged")
    assert(got.nonEmpty, "fixture must exercise a non-empty fan-out")
  }
}
