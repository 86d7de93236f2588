package graft.sources.pdf

import PdfParser._
import scala.collection.mutable

/** PDF content-stream text extraction → markdown-ish output.
  *
  * Mirrors what the reference gets from `pymupdf4llm.to_markdown`
  * (reference: src/extract/pymupdf_extractor.py:95): per-page text with
  * line structure preserved and headers promoted by font size. This is a
  * text-operator interpreter, not a full renderer:
  *
  *   - BT/ET text blocks; Tj / TJ / ' / " show operators
  *   - line breaks from Td/TD (non-zero ty), T*, Tm (y movement)
  *   - kerning gaps in TJ arrays wider than half an em become spaces
  *   - literal + hex strings; UTF-16BE hex strings (FE FF BOM) decoded
  *   - font size tracked via Tf and the Tm scale; the modal body size is
  *     computed per document and larger lines become `#`/`##` headings
  *     (pymupdf4llm's size-ratio heuristic)
  *
  * Glyph decoding assumes a standard Latin text encoding (the common case
  * for digitally-authored documents); CID-keyed fonts with custom CMaps
  * come out as their raw code units — the same degradation PyMuPDF shows
  * without embedded ToUnicode tables.
  */
object PdfText {

  final case class Line(text: String, fontSize: Double)

  /** Extracts all pages, separated by blank lines (page order). */
  def extractMarkdown(pdf: Pdf): String = {
    val pages = pdf.pages
    val allLines = Vector.newBuilder[Vector[Line]]
    pages.foreach { page =>
      val content = pdf.pageContent(page)
      allLines += extractLines(content)
    }
    val perPage = allLines.result()
    val body = modalBodySize(perPage.flatten)
    perPage
      .map(lines => lines.map(l => renderLine(l, body)).mkString("\n"))
      .filter(_.nonEmpty)
      .mkString("\n\n")
  }

  /** Modal (most frequent, by char mass) font size = the body size. */
  private def modalBodySize(lines: Seq[Line]): Double = {
    if (lines.isEmpty) return 0.0
    val mass = mutable.Map.empty[Double, Int]
    lines.foreach { l =>
      val key = math.rint(l.fontSize * 10) / 10
      mass(key) = mass.getOrElse(key, 0) + l.text.length
    }
    if (mass.isEmpty) 0.0 else mass.maxBy(_._2)._1
  }

  private def renderLine(l: Line, body: Double): String = {
    val t = l.text.replaceAll("\\s+$", "")
    if (t.isEmpty || body <= 0 || l.fontSize <= 0) t
    else {
      val ratio = l.fontSize / body
      if (ratio >= 1.6) s"# $t"
      else if (ratio >= 1.2) s"## $t"
      else t
    }
  }

  /** Interprets one page's content stream into lines. */
  def extractLines(content: Array[Byte]): Vector[Line] = {
    val lines = Vector.newBuilder[Line]
    val sb = new StringBuilder
    var curSize = 0.0       // from Tf
    var tmScale = 1.0       // |b|-ish vertical scale of Tm
    var lineSize = 0.0      // effective size of text on the current line
    val operands = mutable.ArrayBuffer.empty[PdfObj]
    val lx = new Lexer(content)

    def flushLine(): Unit = {
      if (sb.nonEmpty) {
        lines += Line(sb.toString, lineSize)
        sb.clear()
      }
      lineSize = 0.0
    }
    def effSize: Double = math.abs(curSize * tmScale)
    def show(s: PString): Unit = {
      val t = decodeText(s.bytes)
      if (t.nonEmpty) {
        sb.append(t)
        if (effSize > lineSize) lineSize = effSize
      }
    }
    def num(o: PdfObj): Double = o match { case PNum(v) => v; case _ => 0.0 }

    var done = false
    while (!done) {
      lx.skipWs()
      if (lx.atEnd) done = true
      else {
        val b = lx.data(lx.pos) & 0xff
        if (b == '/' || b == '(' || b == '[' || b == '<') {
          try operands += lx.parseObj()
          catch { case _: Exception => done = true }
        } else {
          val tok = lx.readToken()
          if (tok.isEmpty) { lx.pos += 1 }
          else if (isNumberToken(tok)) {
            try operands += PNum(java.lang.Double.parseDouble(tok))
            catch { case _: NumberFormatException => () }
          } else {
            tok match {
              case "Tj" =>
                operands.lastOption.foreach { case s: PString => show(s); case _ => () }
              case "'" =>
                flushLine()
                operands.lastOption.foreach { case s: PString => show(s); case _ => () }
              case "\"" =>
                flushLine()
                operands.lastOption.foreach { case s: PString => show(s); case _ => () }
              case "TJ" =>
                operands.lastOption.foreach {
                  case PArr(items) =>
                    items.foreach {
                      case s: PString => show(s)
                      case PNum(v) =>
                        // adjustment in thousandths of an em; a wide
                        // negative gap is an inter-word space
                        if (v <= -180 && sb.nonEmpty && !sb.last.isWhitespace) sb.append(' ')
                      case _ => ()
                    }
                  case _ => ()
                }
              case "Td" | "TD" =>
                if (operands.length >= 2 && num(operands(operands.length - 1)) != 0.0) flushLine()
              case "T*" => flushLine()
              case "Tm" =>
                if (operands.length >= 6) {
                  val d = num(operands(operands.length - 3))
                  val ty = num(operands(operands.length - 1))
                  val newScale = if (d != 0.0) math.abs(d) else 1.0
                  // a Tm that moves y (or rescales) starts a new line
                  if (sb.nonEmpty && (ty != 0.0 || newScale != tmScale)) flushLine()
                  tmScale = newScale
                }
              case "Tf" =>
                if (operands.nonEmpty) curSize = num(operands.last)
              case "BT" =>
                tmScale = 1.0
              case "ET" => flushLine()
              case "BI" =>
                // inline image: skip to EI
                skipInlineImage(lx)
              case _ => () // all other operators: ignore
            }
            operands.clear()
          }
        }
      }
    }
    flushLine()
    lines.result()
  }

  private def isNumberToken(t: String): Boolean = {
    if (t.isEmpty) return false
    val c = t.charAt(0)
    (c >= '0' && c <= '9') || c == '-' || c == '+' || c == '.'
  }

  private def skipInlineImage(lx: Lexer): Unit = {
    // scan for whitespace-delimited "EI"
    var i = lx.pos
    val d = lx.data
    val n = lx.end
    while (i + 1 < n) {
      if (d(i) == 'E' && d(i + 1) == 'I' &&
        (i == 0 || d(i - 1) == ' ' || d(i - 1) == '\n' || d(i - 1) == '\r') &&
        (i + 2 >= n || d(i + 2) == ' ' || d(i + 2) == '\n' || d(i + 2) == '\r')) {
        lx.pos = i + 2
        return
      }
      i += 1
    }
    lx.pos = n
  }

  /** PDF string bytes → text. UTF-16BE when BOM'd, else PDFDocEncoding
    * (Latin-1-compatible for the printable range).
    */
  def decodeText(bytes: Array[Byte]): String = {
    if (bytes.length >= 2 && (bytes(0) & 0xff) == 0xfe && (bytes(1) & 0xff) == 0xff)
      new String(bytes, 2, bytes.length - 2, "UTF-16BE")
    else new String(bytes, "ISO-8859-1")
  }
}
