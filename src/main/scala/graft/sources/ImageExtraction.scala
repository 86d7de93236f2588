package graft.sources

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.operators.Multimodal

/** Image extraction from PDFs (reference U3/S8/S9:
  * src/extract/image_extractor.py:23-155 — per page iterate embedded
  * images, decode for dimensions, drop icons < 100x100 px, save
  * `page_{p:03d}_img_{i:03d}.{ext}` under `images/{doc_id}/`, insert
  * metadata rows).
  *
  * flatMap/explode-shaped: one input document row fans out to N image
  * rows. The default provider ([[JvmImageExtractor]]) REALLY enumerates
  * embedded images from the PDF object structure via
  * [[graft.sources.pdf.PdfParser]]; the deterministic stub remains for
  * synthetic fixtures. Fan-out, filter, metadata schema, and file sink
  * are shared across providers.
  */
object ImageExtraction {

  final case class RawImage(
      pageNumber: Int,
      imageIndex: Int,
      format: String,
      width: Int,
      height: Int,
      bytes: Array[Byte]
  )

  trait ImageExtractor extends Serializable {
    def extract(path: String, content: Array[Byte]): Seq[RawImage]
  }

  /** REAL extractor — enumerates embedded images from the PDF structure
    * via the pure-JVM parser (reference src/extract/image_extractor.py:
    * 110-155: `page.get_images(full=True)` + `doc.extract_image(xref)`):
    * per page, `/Resources /XObject` streams with `/Subtype /Image`;
    * DCTDecode payloads pass through as JPEG files, Flate-decoded
    * DeviceRGB/Gray samples re-encode as PNG. A %PDF-headed file the
    * parser cannot open yields NO image rows (fabricating payloads for a
    * damaged real PDF would poison the images table); only non-PDF
    * fixture bytes fall back to the deterministic stub fan-out, so
    * synthetic specs keep working.
    */
  object JvmImageExtractor extends ImageExtractor {
    override def extract(path: String, content: Array[Byte]): Seq[RawImage] =
      try {
        val pdf = graft.sources.pdf.PdfParser.parse(content)
        graft.sources.pdf.PdfImages.enumerate(pdf).map { e =>
          RawImage(e.pageNumber, e.imageIndex, e.format, e.width, e.height, e.bytes)
        }
      } catch {
        case _: graft.sources.pdf.PdfParser.PdfEncryptedException => Seq.empty
        case _: graft.sources.pdf.PdfParser.PdfParseException =>
          if (PdfSource.hasPdfMagic(content)) Seq.empty
          else StubImageExtractor.extract(path, content)
        case scala.util.control.NonFatal(_) => Seq.empty
      }
  }

  /** STUB extractor: deterministically derives 0-3 images per document
    * from the content hash (sizes span the <100px icon range and real
    * sizes so the F7 filter is exercised). A real provider (PDFBox
    * PDResources iterator) drops in behind the same trait.
    */
  object StubImageExtractor extends ImageExtractor {
    override def extract(path: String, content: Array[Byte]): Seq[RawImage] = {
      var h = 0xcbf29ce484222325L
      content.foreach { b => h ^= (b & 0xffL); h *= 0x100000001b3L }
      val n = java.lang.Math.floorMod(h, 4L).toInt
      (0 until n).map { i =>
        val hi = h ^ (i.toLong * 0x9e3779b97f4a7c15L)
        val w = 40 + java.lang.Math.floorMod(hi, 400L).toInt
        val ht = 40 + java.lang.Math.floorMod(hi >>> 21, 400L).toInt
        val fmt = if (java.lang.Math.floorMod(hi >>> 7, 2L) == 0) "png" else "jpeg"
        val payload = Array.tabulate[Byte](64)(j => ((hi >>> (j % 56)) & 0xff).toByte)
        RawImage(i / 2 + 1, i, fmt, w, ht, payload)
      }
    }
  }

  val imageRowSchema: StructType = StructType(Seq(
    StructField("page_number", IntegerType),
    StructField("image_index", IntegerType),
    StructField("file_format", StringType),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("size_bytes", LongType),
    StructField("bytes", BinaryType)
  ))

  /** Fan a documents scan (id, path, content) out into image rows, with
    * the >= minPx size filter (F7, image_extractor.py:28-29,134-136).
    *
    * `decodeDims = true` re-derives width/height by REALLY decoding each
    * payload's header with [[Multimodal.ImageIoCodec]] (the reference
    * decodes with PIL for exactly this, image_extractor.py:125-136) rather
    * than trusting the extractor's claim; payloads imageio cannot read
    * keep the extractor-reported dims.
    */
  def extractImages(
      docs: DataFrame,
      minPx: Int = 100,
      extractor: ImageExtractor = JvmImageExtractor,
      decodeDims: Boolean = false
  ): DataFrame = {
    val exUdf = udf(
      new org.apache.spark.sql.api.java.UDF2[String, Array[Byte], Array[Row]] {
        override def call(path: String, content: Array[Byte]): Array[Row] =
          extractor.extract(path, content).map { im =>
            val (w, h) =
              if (!decodeDims) (im.width, im.height)
              else
                try Multimodal.ImageIoCodec.imageDims(im.bytes)
                catch { case _: IllegalArgumentException => (im.width, im.height) }
            Row(im.pageNumber, im.imageIndex, im.format, w, h,
              im.bytes.length.toLong, im.bytes)
          }.toArray
      },
      ArrayType(imageRowSchema)
    )
    docs
      .withColumn("img", explode(exUdf(col("path"), col("content"))))
      .select(
        col("id").as("document_id"),
        col("img.page_number").as("page_number"),
        col("img.image_index").as("image_index"),
        col("img.file_format").as("file_format"),
        col("img.width").as("width"),
        col("img.height").as("height"),
        col("img.size_bytes").as("size_bytes"),
        col("img.bytes").as("bytes")
      )
      .where(col("width") >= minPx && col("height") >= minPx)
      .withColumn(
        "file_path",
        concat(
          col("document_id"), lit("/"),
          lpad(col("page_number").cast("string"), 3, "0"), lit("_img_"),
          lpad(col("image_index").cast("string"), 3, "0"),
          lit("."), col("file_format")
        )
      )
      .withColumn("id", sha2(concat(col("document_id"), lit(":"), col("file_path")), 256))
  }

  /** S8 sink: write each image payload under `imagesDir/{file_path}` from
    * the executors; returns the metadata-only DataFrame for the images
    * table (payloads are never shuffled).
    */
  def writeImageFiles(images: DataFrame, imagesDir: String): DataFrame = {
    images.select(col("file_path"), col("bytes")).foreachPartition {
      (rows: Iterator[Row]) =>
        rows.foreach { r =>
          val p = java.nio.file.Paths.get(imagesDir, r.getString(0))
          java.nio.file.Files.createDirectories(p.getParent)
          java.nio.file.Files.write(p, r.getAs[Array[Byte]]("bytes"))
        }
    }
    images.drop("bytes")
  }
}
