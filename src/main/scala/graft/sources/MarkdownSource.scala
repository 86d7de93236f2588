package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions

/** Markdown-checkpoint source and sink (reference: S3/S4 — the extractor
  * writes `{doc_id}.md` files with YAML frontmatter as a re-chunkable
  * intermediate, src/extract/pymupdf_extractor.py:98-110,150-171, parsed
  * back by src/transform/markdown_parser.py:33-102).
  *
  * Read path: `wholetext` text source (one row per file — extraction
  * checkpoints are single-document units) + regexp frontmatter split +
  * a scalar-YAML parse in column algebra (`str_to_map`). No UDF.
  */
object MarkdownSource {

  /** Read a directory of `*.md` checkpoint files into
    * (path, document_id, filename, title, page_count, extraction_method,
    *  file_hash, content).
    */
  def read(spark: SparkSession, dir: String): DataFrame = {
    val raw = spark.read
      .option("wholetext", "true")
      .text(s"$dir/*.md")
      .withColumn("path", input_file_name())
    parse(raw, col("value"))
  }

  /** Parse frontmatter + content columns out of a whole-file text column.
    * Scalar YAML subset (`key: value` lines) via str_to_map — the
    * reference's frontmatter carries only flat scalars
    * (pymupdf_extractor.py:150-171).
    */
  def parse(df: DataFrame, markdown: org.apache.spark.sql.Column): DataFrame = {
    val fm = TextFunctions.frontmatterBody(markdown)
    // strip quotes the writer adds around title; keep plain scalars as-is
    val kv = str_to_map(regexp_replace(fm, "\"", ""), lit("\n"), lit(":\\s+"))
    df.withColumn("fm", kv)
      .withColumn("document_id", element_at(col("fm"), "document_id"))
      .withColumn("filename", element_at(col("fm"), "filename"))
      .withColumn("title", element_at(col("fm"), "title"))
      .withColumn("page_count", element_at(col("fm"), "page_count").cast("int"))
      .withColumn("extraction_method", element_at(col("fm"), "extraction_method"))
      .withColumn("file_hash", element_at(col("fm"), "file_hash"))
      .withColumn("content", TextFunctions.frontmatterContent(markdown))
      .drop("fm")
  }

  /** Render the frontmatter+content text for each row (the S4 sink body —
    * field order matches the reference writer,
    * pymupdf_extractor.py:150-171).
    */
  def renderColumn(
      documentId: org.apache.spark.sql.Column,
      filename: org.apache.spark.sql.Column,
      title: org.apache.spark.sql.Column,
      pageCount: org.apache.spark.sql.Column,
      extractedAt: org.apache.spark.sql.Column,
      extractionMethod: org.apache.spark.sql.Column,
      fileHash: org.apache.spark.sql.Column,
      content: org.apache.spark.sql.Column
  ): org.apache.spark.sql.Column =
    concat(
      lit("---\n"),
      lit("document_id: "), documentId, lit("\n"),
      lit("filename: "), filename, lit("\n"),
      lit("title: \""), title, lit("\"\n"),
      lit("page_count: "), pageCount.cast("string"), lit("\n"),
      lit("extracted_at: "), extractedAt, lit("\n"),
      lit("extraction_method: "), extractionMethod, lit("\n"),
      lit("file_hash: "), fileHash, lit("\n"),
      lit("---\n\n"),
      content
    )

  /** Write one `{document_id}.md` per row. Executor-side file writes via
    * foreachPartition (the reference writes one file per document).
    */
  def write(df: DataFrame, dir: String): Unit = {
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(dir))
    df.select(col("document_id"), col("md_text"))
      .foreachPartition { (rows: Iterator[org.apache.spark.sql.Row]) =>
        rows.foreach { r =>
          val p = java.nio.file.Paths.get(dir, s"${r.getString(0)}.md")
          java.nio.file.Files.write(p, r.getString(1).getBytes("UTF-8"))
        }
      }
  }
}
