package graft

import java.nio.file.{Files, Paths}
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.pipeline.{Pipeline, Retriever, SearchMode}

/** Moderate-scale end-to-end: 200 documents from the synthetic corpus
  * through scan -> validate -> extract -> chunk -> embed -> load -> index
  * -> retrieval. Guards the pipeline's throughput shape (no driver-side
  * per-row work) and that retrieval quality survives a real corpus.
  */
class PipelineScaleSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark

  test("200-doc corpus ingest and retrieval") {
    val base = Files.createTempDirectory("graft-scale").toString
    val pdfDir = s"$base/pdfs"
    Files.createDirectories(Paths.get(pdfDir))

    val docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
      .where(col("doc_id") < 200)
      .select("doc_id", "text")
      .collect()
    docs.foreach { r =>
      val id = r.getLong(0)
      Files.write(
        Paths.get(pdfDir, f"DOC$id%03d corpus document $id.pdf"),
        s"%PDF-1.4\n# Document $id\n\n${r.getString(1)}".getBytes("UTF-8")
      )
    }

    val cfg = GraftConfig(warehouseDir = s"$base/wh")
    val pipe = new Pipeline(spark, cfg)
    val t0 = System.nanoTime()
    val n = pipe.processDirectory(pdfDir)
    val secs = (System.nanoTime() - t0) / 1e9
    info(f"ingested $n docs in $secs%.1f s")
    assert(n == 200)

    val chunks = pipe.catalog.read("chunks")
    assert(chunks.count() >= 200)
    assert(chunks.where(col("embedding").isNull).count() == 0)
    // chunk_index dense per doc
    val bad = chunks.groupBy("document_id")
      .agg(count(lit(1)).as("n"), max("chunk_index").as("mx"))
      .where(col("mx") =!= col("n") - 1)
    assert(bad.count() == 0)

    // self-retrieval: the full text of a document is its own best match
    // (the corpus is word-soup from a tiny shared vocabulary, so short
    // common-word queries legitimately rank many docs — full-text
    // similarity is the discriminative check)
    val ret = new Retriever(spark, pipe, cfg)
    val hitRate = Seq(3, 7, 42, 99, 150).count { i =>
      val sample = docs(i)
      val wantTitle = s"corpus document ${sample.getLong(0)}"
      val hits = ret.search(sample.getString(1), SearchMode.Vector, 5).collect()
      hits.exists(_.getAs[String]("document_title").contains(wantTitle))
    }
    assert(hitRate >= 4, s"self-retrieval hit rate $hitRate/5")
  }

  test("200 REAL PDFs: structured parse end-to-end at ingest scale") {
    import graft.pdf.PdfGen
    import graft.pdf.PdfGen.Run
    val base = Files.createTempDirectory("graft-realscale").toString
    val pdfDir = s"$base/pdfs"
    Files.createDirectories(Paths.get(pdfDir))

    val docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
      .where(col("doc_id") < 200)
      .select("doc_id", "text")
      .collect()
    docs.foreach { r =>
      val id = r.getLong(0)
      // REAL structured PDFs: title run + the corpus text split into
      // lines, Flate-compressed content streams — every document goes
      // through the actual parser (xref, inflate, text operators)
      val body = r.getString(1).grouped(80).toSeq.map(Run(_))
      val pdf = PdfGen.pdf(
        Seq(Seq(Run(s"Document $id", 24.0)) ++ body.take(40)),
        compress = true
      )
      Files.write(Paths.get(pdfDir, f"DOC$id%03d corpus document $id.pdf"), pdf)
    }

    val pipe = new Pipeline(spark, GraftConfig(warehouseDir = s"$base/wh"))
    val t0 = System.nanoTime()
    val n = pipe.processDirectory(pdfDir)
    val secs = (System.nanoTime() - t0) / 1e9
    info(f"REAL-parse ingested $n docs in $secs%.1f s (${n / secs}%.0f docs/s)")
    assert(n == 200)

    // every document parsed for real: 1 page, real extracted text
    val led = pipe.catalog.read("documents")
    assert(led.where(col("status") === "completed").count() == 200)
    assert(led.where(col("page_count") === 1).count() == 200)
    // the size-24 title line became the section header via the real
    // text-operator interpretation, for every document
    val chunks = pipe.catalog.read("chunks")
    assert(chunks.where(col("section_h1").startsWith("Document")).count() > 0)
    val docsWithRealText = chunks
      .join(led.select(col("id").as("document_id")), Seq("document_id"), "left_semi")
      .select("document_id").distinct().count()
    assert(docsWithRealText == 200, "every real PDF must yield chunks")
  }
}
