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

  /** A REAL PNG encoded in-memory: w x h with a deterministic gradient. */
  private def realPng(w: Int, h: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w)
      img.setRGB(x, y, ((x * 255 / w) << 16) | ((y * 255 / h) << 8) | 0x40)
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", out)
    out.toByteArray
  }

  test("ImageIoCodec decodes REAL dims from a real PNG and resizes for real") {
    val bytes = realPng(120, 80)
    assert(Multimodal.ImageIoCodec.imageDims(bytes) == (120, 80))

    // resize produces a decodable PNG with the requested dims
    val resized = Multimodal.ImageIoCodec.resize(bytes, 40, 30)
    assert(Multimodal.ImageIoCodec.imageDims(resized) == (40, 30))

    // grid-luminance embedding: right shape, unit norm, deterministic
    val e1 = Multimodal.ImageIoCodec.embed(bytes, 16)
    val e2 = Multimodal.ImageIoCodec.embed(bytes, 16)
    assert(e1.toSeq == e2.toSeq)
    assert(e1.length == 16)
    assert(math.abs(e1.map(f => f.toDouble * f).sum - 1.0) < 1e-5)

    // junk bytes are a hard error, not silent garbage
    intercept[IllegalArgumentException](Multimodal.ImageIoCodec.imageDims(Array[Byte](1, 2, 3)))
  }

  test("withImageMeta with ImageIoCodec reports true decoded dimensions") {
    val df = Seq((1L, realPng(150, 101)), (2L, realPng(30, 30))).toDF("id", "content")
    val meta = Multimodal.withImageMeta(df, codec = Multimodal.ImageIoCodec)
      .select(col("id"), col("image_meta.*")).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(meta(1L).getAs[String]("format") == "png")
    assert(meta(1L).getAs[Int]("width") == 150 && meta(1L).getAs[Int]("height") == 101)
    assert(meta(2L).getAs[Int]("width") == 30 && meta(2L).getAs[Int]("height") == 30)
  }

  test("extractImages(decodeDims = true) filters icons by REAL decoded size") {
    // extractor that lies about dims: claims 500x500 for a real 50x50 icon
    // and 10x10 for a real 200x150 image — decode must correct both
    val icon = realPng(50, 50)
    val big = realPng(200, 150)
    val lyingExtractor = new ImageExtraction.ImageExtractor {
      override def extract(path: String, content: Array[Byte]): Seq[ImageExtraction.RawImage] =
        Seq(
          ImageExtraction.RawImage(1, 0, "png", 500, 500, icon),
          ImageExtraction.RawImage(1, 1, "png", 10, 10, big)
        )
    }
    val docs = Seq(("docR", "/x/r.pdf", "payload".getBytes)).toDF("id", "path", "content")
    val rows = ImageExtraction
      .extractImages(docs, minPx = 100, extractor = lyingExtractor, decodeDims = true)
      .collect()
    assert(rows.length == 1, "only the truly >=100px image survives")
    assert(rows.head.getAs[Int]("width") == 200 && rows.head.getAs[Int]("height") == 150)
  }

  /** A REAL 16-bit PCM WAV encoded in-memory: loud sine first half,
    * silence second half.
    */
  private def realWav(sampleRate: Float = 8000f, seconds: Double = 0.5): Array[Byte] = {
    import javax.sound.sampled.{AudioFileFormat, AudioFormat, AudioInputStream, AudioSystem}
    val n = (sampleRate * seconds).toInt
    val pcm = new Array[Byte](n * 2)
    for (i <- 0 until n / 2) { // first half: 440 Hz at 80% amplitude
      val s = (math.sin(2 * math.Pi * 440 * i / sampleRate) * 0.8 * 32767).toShort
      pcm(2 * i) = (s & 0xff).toByte
      pcm(2 * i + 1) = ((s >> 8) & 0xff).toByte
    }
    val fmt = new AudioFormat(sampleRate, 16, 1, true, false)
    val stream = new AudioInputStream(new java.io.ByteArrayInputStream(pcm), fmt, n.toLong)
    val out = new java.io.ByteArrayOutputStream()
    AudioSystem.write(stream, AudioFileFormat.Type.WAVE, out)
    out.toByteArray
  }

  test("JavaSoundCodec reads REAL WAV metadata and RMS energy from real bytes") {
    val bytes = realWav()
    val (enc, rate, ch, frames, durMs) = Multimodal.JavaSoundCodec.audioMeta(bytes)
    assert(enc == "PCM_SIGNED" && rate == 8000f && ch == 1)
    assert(frames == 4000L)
    assert(math.abs(durMs - 500.0) < 1.0)

    val energy = Multimodal.JavaSoundCodec.audioEnergy(bytes, windows = 8)
    assert(energy.length == 8)
    // loud first half, silent second half
    assert(energy.take(4).forall(_ > 0.3), energy.mkString(","))
    assert(energy.drop(4).forall(_ < 0.01), energy.mkString(","))

    intercept[Exception](Multimodal.JavaSoundCodec.audioMeta(Array[Byte](1, 2, 3)))
  }

  test("withAudioMeta/withAudioEnergy attach real columns; junk payloads go null") {
    val df = Seq((1L, realWav()), (2L, Array[Byte](9, 9, 9))).toDF("id", "content")
    val rows = Multimodal.withAudioEnergy(Multimodal.withAudioMeta(df), windows = 4)
      .select(col("id"), col("audio_meta"), col("audio_energy")).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(rows(1L).getStruct(1).getAs[Float]("sample_rate") == 8000f)
    assert(rows(1L).getSeq[Float](2).length == 4)
    assert(rows(2L).isNullAt(1) && rows(2L).isNullAt(2))
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
    assert(out("/x/good.pdf")._1 == "jvm")
    assert(out("/x/sparse.pdf")._1 == "ocr_stub")
    assert(out("/x/sparse.pdf")._2.contains("<!-- Page 1 -->"))
    assert(!out("/x/good.pdf")._2.contains("<!-- Page"))
  }

  test("dHash: deterministic, perceptually local, loud on tiny images") {
    val base = realPng(120, 80)
    // determinism on identical bytes
    assert(Multimodal.ImageIoCodec.dHash(base) == Multimodal.ImageIoCodec.dHash(base))

    // small local perturbation: black out one ~13x10 patch — a
    // near-duplicate (re-encode, tiny crop-level change) stays close
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(base))
    for (y <- 35 until 45; x <- 53 until 66) img.setRGB(x, y, 0)
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", out)
    val near = out.toByteArray
    val dNear = java.lang.Long.bitCount(
      Multimodal.ImageIoCodec.dHash(base) ^ Multimodal.ImageIoCodec.dHash(near))
    assert(dNear <= 6, s"one-patch perturbation moved $dNear bits — dHash is not local")

    // structurally different image (checkerboard vs gradient) is far
    val cb = new java.awt.image.BufferedImage(120, 80, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 80; x <- 0 until 120)
      cb.setRGB(x, y, if (((x / 13) + (y / 10)) % 2 == 0) 0xffffff else 0x000000)
    val out2 = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(cb, "png", out2)
    val dFar = java.lang.Long.bitCount(
      Multimodal.ImageIoCodec.dHash(base) ^ Multimodal.ImageIoCodec.dHash(out2.toByteArray))
    assert(dFar > 15, s"checkerboard vs gradient only $dFar bits apart")

    // smaller than the 9x8 grid: loud, not degenerate
    intercept[IllegalArgumentException](Multimodal.ImageIoCodec.dHash(realPng(8, 8)))
  }

  test("imageNearDupPairs finds the perturbed twin and not the stranger") {
    val base = realPng(120, 80)
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(base))
    for (y <- 35 until 45; x <- 53 until 66) img.setRGB(x, y, 0)
    val o1 = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", o1)
    val cb = new java.awt.image.BufferedImage(120, 80, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 80; x <- 0 until 120)
      cb.setRGB(x, y, if (((x / 13) + (y / 10)) % 2 == 0) 0xffffff else 0x000000)
    val o2 = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(cb, "png", o2)

    val df = Seq((1L, base), (2L, o1.toByteArray), (3L, o2.toByteArray))
      .toDF("id", "content")
    val pairs = Multimodal
      .imageNearDupPairs(df, "id", maxHamming = 6, codec = Multimodal.ImageIoCodec)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs == Set((1L, 2L)), s"expected exactly the perturbed twin pair, got $pairs")
  }

  test("imageNearDupPairs with StubCodec detects exact duplicates without a decoder") {
    val p1 = png ++ Array[Byte](1, 2, 3)
    val df = Seq((1L, p1), (2L, p1.clone()), (3L, jpg)).toDF("id", "content")
    val pairs = Multimodal.imageNearDupPairs(df, "id", maxHamming = 0)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs == Set((1L, 2L)))
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
