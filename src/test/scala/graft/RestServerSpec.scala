package graft

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.nio.file.{Files, Paths}

import com.fasterxml.jackson.databind.ObjectMapper
import org.scalatest.funsuite.AnyFunSuite

import graft.pipeline.Pipeline

class RestServerSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  private val mapper = new ObjectMapper()

  private def mkPdf(dir: String, name: String, body: String): Unit =
    Files.write(Paths.get(dir, name), s"%PDF-1.4\n$body".getBytes("UTF-8"))

  test("REST surface: stats, documents, chunks, search, context, delete") {
    val base = Files.createTempDirectory("graft-rest").toString
    val pdfDir = s"$base/pdfs"; Files.createDirectories(Paths.get(pdfDir))
    mkPdf(pdfDir, "EP001 Spark Guide.pdf",
      "# Spark Guide\n\nspark processes distributed data with catalyst and tungsten. " +
        "broadcast joins and partition pruning keep spark queries fast.")
    mkPdf(pdfDir, "EP002 Cooking.pdf",
      "# Cooking\n\npasta with tomato sauce and basil. slow cooking develops flavor.")

    val cfg = GraftConfig(warehouseDir = s"$base/warehouse")
    new Pipeline(spark, cfg).processDirectory(pdfDir)

    val server = new RestServer(spark, cfg).start(0)
    val port = server.getAddress.getPort
    val client = HttpClient.newHttpClient()
    def get(path: String): HttpResponse[String] =
      client.send(HttpRequest.newBuilder(URI.create(s"http://127.0.0.1:$port$path")).GET.build(),
        HttpResponse.BodyHandlers.ofString())
    def post(path: String, body: String): HttpResponse[String] =
      client.send(
        HttpRequest.newBuilder(URI.create(s"http://127.0.0.1:$port$path"))
          .POST(HttpRequest.BodyPublishers.ofString(body)).build(),
        HttpResponse.BodyHandlers.ofString())
    def ok(r: HttpResponse[String]): String = { assert(r.statusCode == 200, s"${r.statusCode}: ${r.body}"); r.body }
    def delete(path: String): HttpResponse[String] =
      client.send(HttpRequest.newBuilder(URI.create(s"http://127.0.0.1:$port$path")).DELETE.build(),
        HttpResponse.BodyHandlers.ofString())

    try {
      // stats
      val stats = mapper.readTree(ok(get("/stats")))
      assert(stats.get("total_documents").asLong == 2L)
      assert(stats.get("by_status").get("completed").asLong == 2L)

      // list + detail
      val docs = mapper.readTree(ok(get("/documents")))
      assert(docs.size == 2)
      val docId = docs.get(0).get("id").asText
      val detail = mapper.readTree(ok(get(s"/documents/$docId")))
      assert(detail.get("id").asText == docId)
      assert(get("/documents/nope").statusCode == 404)

      // chunks exclude the embedding payload
      val chunks = mapper.readTree(ok(get(s"/documents/$docId/chunks")))
      assert(chunks.size > 0)
      assert(!chunks.get(0).has("embedding"))

      // search: all modes + bad mode 400
      val hits = mapper.readTree(ok(post("/search", """{"query":"spark catalyst","mode":"hybrid","limit":5}""")))
      assert(hits.size > 0)
      assert(hits.get(0).has("score") && hits.get(0).has("document_title"))
      assert(post("/search", """{"query":"x","mode":"nope"}""").statusCode == 400)
      assert(post("/search", """{}""").statusCode == 400)
      assert(post("/search", """{"query":null}""").statusCode == 400, "JSON null query is a 400")
      assert(post("/search", "definitely not json").statusCode == 400, "malformed body is a 400")
      assert(get("/documents?limit=abc").statusCode == 400, "non-integer limit is a 400")
      assert(mapper.readTree(ok(get("/documents?limit=1"))).size == 1, "limit honored in response")

      // context assembly
      val ctx = mapper.readTree(ok(post("/search/context", """{"query":"spark tuning","max_tokens":500}""")))
      assert(ctx.get("context").asText.contains("[Source:"))

      // cascade delete via REST
      assert(delete(s"/documents/$docId").statusCode == 200)
      assert(get(s"/documents/$docId").statusCode == 404)
      assert(mapper.readTree(ok(get("/stats"))).get("total_documents").asLong == 1L)
    } finally server.stop(0)
  }

}
