package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.Multimodal
import graft.sources.ImageExtraction

class MultimodalSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  import spark.implicits._

  private val png = Array[Byte](0x89.toByte, 'P', 'N', 'G', 13, 10, 26, 10) ++ Array.fill[Byte](100)(7)
  private val jpg = Array[Byte](0xff.toByte, 0xd8.toByte, 0xff.toByte) ++ Array.fill[Byte](80)(3)

  test("image meta: format sniffing + deterministic dims; null-safe") {
    val df = Seq((1L, png), (2L, jpg)).toDF("id", "content")
      .union(Seq((3L, null.asInstanceOf[Array[Byte]])).toDF("id", "content"))
    val meta = Multimodal.withImageMeta(df).select(col("id"), col("image_meta.*")).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(meta(1L).getAs[String]("format") == "png")
    assert(meta(2L).getAs[String]("format") == "jpeg")
    assert(meta(1L).getAs[Int]("width") >= 64)
    val again = Multimodal.withImageMeta(Seq((1L, png)).toDF("id", "content"))
      .select(col("image_meta.width")).head().getInt(0)
    assert(again == meta(1L).getAs[Int]("width"), "dims deterministic")
  }

  test("resize + media embedding: deterministic, correct shape") {
    val df = Seq((1L, png)).toDF("id", "content")
    val r1 = Multimodal.resizeImages(df, 64, 64).select("resized").head().getAs[Array[Byte]](0)
    val r2 = Multimodal.resizeImages(df, 64, 64).select("resized").head().getAs[Array[Byte]](0)
    assert(r1.toSeq == r2.toSeq)
    val e = Multimodal.withMediaEmbedding(df, dim = 16).select("media_embedding").head().getSeq[Float](0)
    assert(e.length == 16)
  }

  test("frame sampling explodes one row per sampled frame, capped") {
    val video = Array.fill[Byte](8192)(42) // "8 frames"
    val df = Seq((1L, video)).toDF("id", "content")
    val frames = Multimodal.sampleFrames(df, everyNth = 2, maxFrames = 3).collect()
    assert(frames.length == 3)
    assert(frames.map(_.getAs[Int]("frame_index")).toSeq == Seq(0, 2, 4))
    assert(frames.head.getAs[Array[Byte]]("frame_bytes").nonEmpty)
  }

  test("image extraction: fan-out, icon filter, path scheme, stable ids") {
    val docs = Seq(
      ("doc1", "/x/a.pdf", "unique content alpha for images".getBytes),
      ("doc2", "/x/b.pdf", "different content beta with other hash".getBytes),
      ("doc3", "/x/c.pdf", "third document gamma payload".getBytes)
    ).toDF("id", "path", "content")
    val images = ImageExtraction.extractImages(docs, minPx = 100)
    val rows = images.collect()
    rows.foreach { r =>
      assert(r.getAs[Int]("width") >= 100 && r.getAs[Int]("height") >= 100)
      assert(r.getAs[String]("file_path").matches("doc\\d/\\d{3}_img_\\d{3}\\.(png|jpeg)"))
    }
    // unfiltered variant yields at least as many rows
    assert(ImageExtraction.extractImages(docs, minPx = 0).count() >= rows.length)
  }

  test("quality-routed extraction falls back to the OCR provider only for low-quality docs") {
    val good = ("%PDF-1.4\n" + ("reasonable english words in a sentence. " * 20)).getBytes
    val sparse = "%PDF-1.4\nhi".getBytes // low char density -> quality gate fails
    val df = Seq(("/x/good.pdf", good, good.length.toLong), ("/x/sparse.pdf", sparse, sparse.length.toLong))
      .toDF("path", "content", "length")
    val out = graft.sources.PdfSource.withFallbackExtraction(df)
      .select("path", "extraction_method_used", "markdown")
      .collect().map(r => r.getString(0) -> (r.getString(1), r.getString(2))).toMap
    assert(out("/x/good.pdf")._1 == "stub")
    assert(out("/x/sparse.pdf")._1 == "ocr_stub")
    assert(out("/x/sparse.pdf")._2.contains("<!-- Page 1 -->"))
    assert(!out("/x/good.pdf")._2.contains("<!-- Page"))
  }

  test("image file sink writes payloads and returns metadata-only rows") {
    val dir = java.nio.file.Files.createTempDirectory("graft-img").toString
    val docs = Seq(("docA", "/x/a.pdf", "image-bearing document payload content here".getBytes))
      .toDF("id", "path", "content")
    val images = ImageExtraction.extractImages(docs, minPx = 0)
    val meta = ImageExtraction.writeImageFiles(images, dir)
    assert(!meta.columns.contains("bytes"))
    val n = meta.count()
    val written = java.nio.file.Files.walk(java.nio.file.Paths.get(dir))
      .filter(java.nio.file.Files.isRegularFile(_)).count()
    assert(written == n)
  }
}
