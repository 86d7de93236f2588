package graft.tools

import java.nio.file.{Files, Paths}
import graft.{GraftConfig, GraftSession}
import graft.pipeline.Pipeline

/** Ingest throughput measurement: N synthetic-corpus docs through the
  * full pipeline (scan -> validate -> extract -> chunk -> embed -> load ->
  * FTS index). Prints docs/sec for SCALE.md evidence.
  */
object IngestBench {
  def main(args: Array[String]): Unit = {
    val n = if (args.nonEmpty) args(0).toInt else 2000
    val spark = GraftSession.builder(master = "local[32]", shufflePartitions = 32).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val base = Files.createTempDirectory("graft-ingestbench").toString
    val pdfDir = s"$base/pdfs"
    Files.createDirectories(Paths.get(pdfDir))
    val docs = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
      .limit(n).select("doc_id", "text").collect()
    docs.foreach { r =>
      Files.write(
        Paths.get(pdfDir, f"DOC${r.getLong(0)}%05d corpus.pdf"),
        s"%PDF-1.4\n# Document ${r.getLong(0)}\n\n${r.getString(1)}".getBytes("UTF-8")
      )
    }

    val pipe = new Pipeline(spark, GraftConfig(warehouseDir = s"$base/wh"))
    val t0 = System.nanoTime()
    val ingested = pipe.processDirectory(pdfDir)
    val secs = (System.nanoTime() - t0) / 1e9
    val nChunks = pipe.catalog.read("chunks").count()
    println(f"[ingest-bench] $ingested docs, $nChunks chunks in $secs%.1f s = ${ingested / secs}%.0f docs/s")
    spark.stop()
  }
}
