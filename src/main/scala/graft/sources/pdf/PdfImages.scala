package graft.sources.pdf

import PdfParser._

/** Embedded-image enumeration — the pure-JVM replacement for the
  * reference's `page.get_images(full=True)` + `doc.extract_image(xref)`
  * (reference: src/extract/image_extractor.py:110-155).
  *
  * Per page: walk `/Resources /XObject`, keep streams with
  * `/Subtype /Image`, and materialize:
  *   - DCTDecode → the raw stream IS a JPEG file → ext "jpeg"
  *   - FlateDecode DeviceRGB/DeviceGray 8-bit → inflate to samples and
  *     re-encode as PNG via `javax.imageio` → ext "png"
  *   - anything else (CCITT, JBIG2, exotic color spaces) → raw bytes with
  *     ext "bin" and the dict-declared dimensions (the reference's
  *     extract_image returns the undecoded payload similarly)
  *
  * Dimensions come from the image dict (/Width, /Height); callers that
  * want decode-verified dims re-read the produced payload (the pipeline's
  * `decodeDims` option does exactly that with ImageIO, as the reference
  * re-opens with PIL at image_extractor.py:125-127).
  */
object PdfImages {

  /** One embedded image: 1-indexed page, 0-indexed per-page position. */
  final case class Embedded(
      pageNumber: Int,
      imageIndex: Int,
      format: String,
      width: Int,
      height: Int,
      bytes: Array[Byte]
  )

  def enumerate(pdf: Pdf): Seq[Embedded] = {
    val out = Seq.newBuilder[Embedded]
    pdf.pages.zipWithIndex.foreach { case (page, pi) =>
      val xobjects: Seq[(String, PStream)] = (for {
        res <- pdf.get(page, "Resources").flatMap(pdf.dictOf)
        xo  <- pdf.get(res, "XObject").flatMap(pdf.dictOf)
      } yield xo.m.toSeq.sortBy(_._1).flatMap { case (name, ref) =>
        pdf.resolve(ref) match {
          case s: PStream => Some(name -> s)
          case _          => None
        }
      }).getOrElse(Seq.empty)

      var idx = 0
      xobjects.foreach { case (_, s) =>
        if (pdf.name(s.dict, "Subtype").contains("Image")) {
          try {
            out += materialize(pdf, s, pi + 1, idx)
            idx += 1
          } catch {
            case _: Exception => idx += 1 // skip undecodable, keep index stable
          }
        }
      }
    }
    out.result()
  }

  private def materialize(pdf: Pdf, s: PStream, page: Int, idx: Int): Embedded = {
    val w = pdf.int(s.dict, "Width").getOrElse(0)
    val h = pdf.int(s.dict, "Height").getOrElse(0)
    val filters: Seq[String] = pdf.get(s.dict, "Filter") match {
      case Some(PName(n)) => Seq(n)
      case Some(PArr(a))  => a.map(pdf.resolve).collect { case PName(n) => n }
      case _              => Seq.empty
    }
    if (filters.contains("DCTDecode") || filters.contains("DCT"))
      Embedded(page, idx, "jpeg", w, h, s.raw)
    else if (filters.contains("JPXDecode"))
      Embedded(page, idx, "jp2", w, h, s.raw)
    else {
      // decoded samples → PNG when we understand the layout
      val data = pdf.decodedStream(s)
      val bpc = pdf.int(s.dict, "BitsPerComponent").getOrElse(8)
      val cs = colorSpaceName(pdf, s.dict)
      val png = toPng(data, w, h, bpc, cs)
      png match {
        case Some(bytes) => Embedded(page, idx, "png", w, h, bytes)
        case None        => Embedded(page, idx, "bin", w, h, data)
      }
    }
  }

  private def colorSpaceName(pdf: Pdf, d: PDict): String =
    pdf.get(d, "ColorSpace") match {
      case Some(PName(n)) => n
      case Some(PArr(a)) if a.nonEmpty =>
        pdf.resolve(a.head) match { case PName(n) => n; case _ => "" }
      case _ => ""
    }

  /** Raw samples → PNG via ImageIO for the layouts we can name. */
  private def toPng(data: Array[Byte], w: Int, h: Int, bpc: Int, cs: String): Option[Array[Byte]] = {
    if (w <= 0 || h <= 0 || bpc != 8) return None
    import java.awt.image.BufferedImage
    val img = cs match {
      case "DeviceRGB" if data.length >= w * h * 3 =>
        val im = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            val p = (y * w + x) * 3
            val rgb = ((data(p) & 0xff) << 16) | ((data(p + 1) & 0xff) << 8) | (data(p + 2) & 0xff)
            im.setRGB(x, y, rgb)
            x += 1
          }
          y += 1
        }
        Some(im)
      case "DeviceGray" if data.length >= w * h =>
        val im = new BufferedImage(w, h, BufferedImage.TYPE_BYTE_GRAY)
        im.getRaster.setDataElements(0, 0, w, h, java.util.Arrays.copyOf(data, w * h))
        Some(im)
      case _ => None
    }
    img.map { im =>
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(im, "png", bos)
      bos.toByteArray
    }
  }
}
