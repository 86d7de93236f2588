package graft

import java.nio.file.{Files, Paths}
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.pipeline.SearchMode

class ApiSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  import spark.implicits._

  test("functional API: extract -> chunk -> embed -> process -> search") {
    val base = Files.createTempDirectory("graft-api").toString
    val pdfDir = s"$base/pdfs"
    Files.createDirectories(Paths.get(pdfDir))
    Files.write(
      Paths.get(pdfDir, "API100 Sample Doc.pdf"),
      "%PDF-1.4\n# Sample\n\ndistributed queries run on spark executors with columnar scans.".getBytes
    )

    val extracted = api.extractPdf(spark, pdfDir)
    assert(extracted.count() == 1)
    assert(extracted.head().getAs[String]("markdown").contains("columnar scans"))

    val chunks = api.chunkText("# H\n\nhello world content")
    assert(chunks.nonEmpty && chunks.head.h1.contains("H"))

    val embedded = api.embedChunks(Seq((1L, "some text")).toDF("id", "text"))
    assert(embedded.head().getSeq[Float](2).nonEmpty)

    val cfg = GraftConfig(warehouseDir = s"$base/wh")
    assert(api.processPdfs(spark, pdfDir, cfg) == 1)
    val hits = api.searchDocuments(spark, "spark executors columnar", SearchMode.Keyword, 3, cfg)
    assert(hits.count() > 0)
    assert(hits.head().getAs[String]("document_title") == "Sample Doc")
  }

  test("round-4 facade delegations return sane shapes") {
    import spark.implicits._
    val ranks = api.rankAuthority(Seq(("a", "b"), ("b", "a")).toDF("s", "d"), "s", "d", iters = 2)
    assert(ranks.count() == 2)
    val docs = Seq((1L, "alpha beta", "s1"), (2L, "alpha gamma", "s2")).toDF("id", "text", "src")
    assert(api.topTerms(docs, "id", "text", k = 1).count() == 2)
    assert(api.balanceCorpus(docs, "src", "id", perStratum = 1).count() == 2)
    val delta = api.corpusDelta(docs.where($"id" === 1L), docs, "id", "text")
    assert(delta.collect().map(r => (r.getLong(0), r.getString(1))).toSet == Set((2L, "added")))
  }
}
