package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.{ChunkingConfig, GraftConfig}
import graft.functions.TextFunctions
import graft.model.DocumentStatus
import graft.operators.{Chunker, Embedder, FtsIndex}
import graft.sources.{Catalog, MarkdownSource, PdfSource}

/** Batch ingestion pipeline — the distributed re-expression of the
  * reference's `Pipeline.process_document` / `process_directory` /
  * `process_new_documents` (reference: src/pipeline.py:47-220).
  *
  * One lazy DAG per batch:
  *   binaryFile scan -> incremental anti-join vs ledger (J1) -> validate
  *   (F1) -> extract (U1, mapPartitions provider) -> markdown checkpoint
  *   (S4) -> chunk flatMap (U4+U5) -> embed (U6) -> load documents +
  *   chunks tables -> rebuild FTS index (S7).
  *
  * Scale notes: every stage until the table writes is a narrow,
  * per-partition transformation — no shuffle. The only shuffles in the
  * whole ingest are inside the FTS index build aggregations. Document ids
  * are content-derived (sha2 of file hash), not UUIDs, so re-runs are
  * idempotent and oracle-testable (SURVEY §7.4.7).
  */
final class Pipeline(spark: SparkSession, config: GraftConfig = GraftConfig.default) {

  // the swap and lease seams are deployment properties: install what this
  // deployment's config names (process-global — see CommitProtocol.install /
  // StoreLease.install). None means "leave the installed protocol alone" —
  // a deployment that installed a custom protocol directly must not have it
  // silently reset by a later Pipeline built from a default config; an
  // explicit Some installs exactly that protocol, INCLUDING the built-in
  // default names, which is how a config restores atomic-move/file after a
  // non-default install (ADVICE r16).
  config.commitProtocol.foreach(n =>
    graft.sources.CommitProtocol.install(graft.sources.CommitProtocol.forName(n)))
  config.leaseProtocol.foreach(n =>
    graft.sources.StoreLease.install(graft.sources.StoreLease.forName(n)))

  val catalog = new Catalog(spark, config.warehouseDir)
  private def ftsKey = s"${config.warehouseDir}/chunks"

  /** Process every new-or-previously-failed PDF under `pdfDir`
    * (incremental semantics of src/pipeline.py:192-220). Returns the
    * number of documents ingested.
    */
  def processDirectory(
      pdfDir: String,
      markdownDir: Option[String] = None,
      imagesDir: Option[String] = None
  ): Long = {
    val scanned = PdfSource
      .scan(spark, pdfDir)
      .withColumn("file_hash", TextFunctions.fileHash(col("content")))
      // same content under two names in ONE batch is one document (ids are
      // content-derived; without this the batch would write colliding ids)
      .dropDuplicates("file_hash")

    // J1: keep files whose hash is absent from the ledger, or present with
    // status=failed (re-admit). Ledger is small relative to the scan ->
    // broadcast anti-join, no shuffle of the scan side.
    val fresh =
      if (!catalog.exists("documents")) scanned
      else {
        val ledger = broadcast(
          catalog.read("documents").select(col("file_hash"), col("status"))
        )
        scanned
          .join(
            ledger.where(col("status") =!= DocumentStatus.Failed).select("file_hash"),
            Seq("file_hash"),
            "left_anti"
          )
      }

    val extracted = PdfSource
      .withExtraction(fresh, config.extraction)
      .withColumn(
        "validation",
        PdfSource.validationVerdict(
          col("length"), col("content"), col("page_count"), col("extract_error"), config.extraction)
      )
      .withColumn("id", sha2(col("file_hash"), 256))
      .withColumn("title", TextFunctions.titleFromFilename(col("path")))
      .withColumn(
        "quality_fallback",
        TextFunctions.qualityFallbackReason(col("markdown"), col("page_count"))
      )

    // Materialize the batch ONCE and CUT its lineage before mutating the
    // documents table: downstream writes refresh the ledger path's cache,
    // and a recompute through the anti-join would see this batch's own
    // rows (or the upsert-delete below) and corrupt results. When image
    // extraction is requested the checkpoint keeps the raw bytes (so the
    // scan+extract DAG still runs exactly once) and drops them right
    // after; otherwise bytes are dropped before the checkpoint. (At
    // cluster scale this checkpoint is a staging-table write instead.)
    val batch =
      if (imagesDir.isDefined) {
        val withContent = extracted.localCheckpoint()
        imagesDir.foreach { dir =>
          // persist: the file-sink foreachPartition and the metadata append
          // are two actions — without caching, the extraction fan-out
          // would execute twice
          val images = graft.sources.ImageExtraction
            .extractImages(withContent.where(col("validation") === "valid"))
            .persist()
          // dedupImages runs INSIDE the try: a throw during its own
          // actions must still unpersist the payload cache below (it
          // releases its private scratch pins itself on throw)
          var dedupRes: Option[Pipeline.ImageDedupResult] = None
          try {
            dedupRes =
              if (config.imageDedup.enabled) Some(dedupImages(images)) else None
            val kept = dedupRes.map(_.kept).getOrElse(images)
            val meta = graft.sources.ImageExtraction
              .writeImageFiles(kept, dir)
              .withColumn("created_at", current_timestamp())
            catalog.append(meta, "images")
            // signatures and cluster labels land AFTER the images metadata:
            // a crash in the window leaves a stored image that is merely
            // unindexed/unlabeled (re-dedup later / labels-as-own-cluster,
            // both harmless), never an index or label row referencing an
            // image that was never stored — which would silently drop
            // future copies (signatures) or double-label on re-ingest
            // (clusters).
            dedupRes.foreach { r =>
              catalog.append(
                r.keptSigs.withColumn("created_at", current_timestamp()), "image_signatures")
              catalog.append(r.labels, "image_clusters")
            }
          } finally {
            // released on EVERY exit: a throw mid-append must not leave the
            // dedup scratch pins (or the payload cache) stranded in a
            // driver that catches per-directory errors and continues
            dedupRes.foreach(r => graft.util.Checkpoints.release(r.scratchPins, spark))
            images.unpersist()
          }
        }
        withContent.drop("content")
      } else extracted.drop("content").localCheckpoint()

    val valid = batch.where(col("validation") === "valid")
    val nIngested = valid.count()
    val invalid = batch.where(col("validation") =!= "valid")

    // Upsert semantics for re-admitted files (the reference UPDATEs the
    // document row on reprocess, sqlite_store.py:153-172). Only
    // previously-FAILED ledger rows can re-enter a batch (the anti-join
    // excludes everything else), so the delete is restricted to that
    // intersection, expressed structurally: deleteMatching keeps the
    // doomed set a DataFrame (no driver collect, no isin literal tree)
    // and skips the table rewrite when it is empty — the common all-new
    // ingest path pays nothing.
    if (catalog.exists("documents")) {
      val readmitted = catalog.read("documents")
        .where(col("status") === DocumentStatus.Failed)
        .select("file_hash")
        .join(batch.select("file_hash"), Seq("file_hash"), "left_semi")
      catalog.deleteMatching("documents", readmitted, Seq("file_hash"))
    }

    // S4: markdown checkpoint (re-chunk without re-extract, pipeline.py:222-268)
    markdownDir.foreach { dir =>
      val rendered = valid.withColumn(
        "md_text",
        MarkdownSource.renderColumn(
          col("id"),
          element_at(split(col("path"), "/"), -1),
          col("title"),
          col("page_count"),
          date_format(current_timestamp(), "yyyy-MM-dd'T'HH:mm:ss"),
          lit(config.extraction.method),
          col("file_hash"),
          col("markdown")
        )
      )
      MarkdownSource.write(rendered.withColumnRenamed("id", "document_id"), dir)
    }

    // U4+U5: chunk; U6: embed — both narrow.
    val chunkRows = chunkDocs(valid.select(col("id"), col("title"), col("markdown")))
    val chunks = embedChunkRows(chunkRows)

    // Load: documents ledger rows (completed + failed) and chunks.
    // Per-doc counts aggregate over the PRE-embedding chunk rows —
    // aggregating over `chunks` would run the (expensive) embedding stage
    // a second time just to count rows.
    val totalByDoc = chunkRows.groupBy(col("document_id").as("id")).agg(count(lit(1)).as("total_chunks"))
    val docRows = valid
      .select(
        col("id"), col("path").as("source_path"), col("title"), col("file_hash"),
        col("length").as("file_size_bytes"), col("page_count"),
        lit(config.extraction.method).as("extraction_method"),
        col("quality_fallback")
      )
      .join(broadcast(totalByDoc), Seq("id"), "left")
      .withColumn("total_chunks", coalesce(col("total_chunks"), lit(0L)))
      .withColumn("status", lit(DocumentStatus.Completed))
      .withColumn("error_message", lit(null).cast("string"))
      .withColumn("uploaded_at", current_timestamp())
      .withColumn("processed_at", current_timestamp())

    val failedRows = invalid
      .select(
        col("id"), col("path").as("source_path"), col("title"), col("file_hash"),
        col("length").as("file_size_bytes"), col("page_count"),
        lit(config.extraction.method).as("extraction_method"),
        col("quality_fallback"),
        concat(lit("validation failed: "), col("validation")).as("error_message")
      )
      .withColumn("total_chunks", lit(0L))
      .withColumn("status", lit(DocumentStatus.Failed))
      .withColumn("uploaded_at", current_timestamp())
      .withColumn("processed_at", lit(null).cast("timestamp"))

    catalog.append(docRows.unionByName(failedRows), "documents")
    catalog.append(chunks, "chunks")

    // S7: rebuild the FTS index after load (write-then-index,
    // pipeline.py:164-165)
    FtsIndex.invalidate(ftsKey)
    FtsIndex.buildCached(ftsKey, catalog.read("chunks"), "id", "text")

    graft.util.JsonLog.info("ingest_directory",
      "dir" -> pdfDir, "ingested_docs" -> nIngested)
    nIngested
  }

  /** Opt-in near-dup image dedup at ingest (keep-one-per-cluster),
    * in-batch AND cross-batch:
    *
    *   1. decode each payload ONCE to an 8-byte dHash signature
    *      ([[graft.operators.Multimodal.FallbackDHashCodec]]: real
    *      perceptual hash, content-hash fallback for undecodable bytes);
    *   2. in-batch: banded Hamming pairs → label propagation →
    *      keep-min-id; the full (id, cluster_id, is_canonical) labeling
    *      lands in the `image_clusters` table for audit;
    *   3. cross-batch: surviving signatures probe the PERSISTED
    *      `image_signatures` table ([[graft.operators.Dedup
    *      .incrementalHammingPairs]] — index probed, never re-paired); a
    *      survivor matching a stored image is dropped and labeled into
    *      the stored image's cluster (is_canonical = false).
    *
    * Only 8-byte signatures and id pairs ever shuffle; payloads stay in
    * place. Survivors append their `dhash` to the dedicated
    * `image_signatures` table — NOT a column on `images`: a column added
    * mid-life would mix schemas across parquet appends and
    * (mergeSchema-less reads) make the probe's presence check depend on
    * which footer Spark samples. The signatures table is homogeneous by
    * construction, so the next batch probes deterministically without
    * re-decoding history.
    */
  private def dedupImages(
      images: org.apache.spark.sql.DataFrame
  ): Pipeline.ImageDedupResult = {
    import graft.operators.{Dedup, Multimodal}
    val maxHamming = config.imageDedup.maxHamming
    // scratch pins accumulate as they are created so a throw MID-BUILD
    // (bad payload, executor loss) releases whatever already
    // materialized — the caller only learns the pin set on success
    val pinned = scala.collection.mutable.ArrayBuffer.empty[Int]
    def pinScratch(df: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
      val p = df.localCheckpoint()
      pinned ++= graft.util.Checkpoints.pinnedRddIds(p)
      p
    }
    try {
    // decode once; 8-byte (id, dhash) rows pinned for the three consumers
    // (in-batch pairs, cross-batch probe, meta persistence)
    val sigs = pinScratch(Multimodal
      .withImageDHash(images.select("id", "bytes"), "bytes", "dhash", Multimodal.FallbackDHashCodec)
      .select("id", "dhash")
      .where(col("dhash").isNotNull))

    // in-batch keep-one (labels NOT appended yet — cross-batch resolution
    // below may re-attribute whole in-batch clusters to a stored cluster)
    val pairs = Dedup.hammingPairsFromSigs(sigs, "id", "dhash", maxHamming)
    val labels = pinScratch(Dedup
      .nearDupClusters(images.select("id"), "id", pairs))
    val canon = labels.groupBy("cluster").agg(min("id").as("_canon"))
    val keptInBatch = Dedup.nearDedupFromClusters(images, "id", labels)

    // cross-batch: in-batch survivors probe the persisted dhash column;
    // a match drops the survivor and maps its WHOLE in-batch cluster to
    // the stored image's cluster (members it absorbed in-batch are
    // transitively duplicates of the stored copy)
    val crossMap: org.apache.spark.sql.DataFrame = {
      if (!catalog.exists("image_signatures"))
        canon.select(col("_canon"), col("_canon").as("_stored")).limit(0)
      else {
        val existing = catalog.read("image_signatures").select("id", "dhash")
        val survivorSigs = sigs.join(keptInBatch.select("id"), Seq("id"), "left_semi")
        val cross = Dedup
          .incrementalHammingPairs(existing, survivorSigs, "id", "dhash", maxHamming)
        // min stored-cluster label across multiple matches for
        // determinism; a stored image predating image_clusters labels
        // as its own cluster
        val existingClusters =
          if (catalog.exists("image_clusters"))
            catalog.read("image_clusters").select(col("id").as("id_index"), col("cluster_id"))
          else cross.select(col("id_index"), col("id_index").as("cluster_id")).limit(0)
        pinScratch(cross
          .join(existingClusters, Seq("id_index"), "left")
          .select(
            col("id_batch").as("_canon"),
            coalesce(col("cluster_id"), col("id_index")).as("_stored"))
          .groupBy("_canon").agg(min("_stored").as("_stored"))) // read twice: label rewrite + anti-join
      }
    }

    // one coherent labeling per batch: members of a cross-dropped
    // cluster carry the STORED cluster id and none of them is canonical
    // (the stored copy is); untouched clusters label as computed
    // in-batch. Each row records its OWNING DOCUMENT so cascade delete
    // can clear a document's label rows directly (dropped duplicates
    // have no images-table row to resolve through). The CALLER appends
    // this frame, after the images metadata lands (see below).
    val labelRows =
      labels.join(canon, Seq("cluster"))
        .join(crossMap, Seq("_canon"), "left")
        .join(images.select(col("id"), col("document_id")), Seq("id"), "left")
        .select(
          col("id"),
          col("document_id"),
          coalesce(col("_stored"), col("cluster")).as("cluster_id"),
          (col("id") === col("_canon") && col("_stored").isNull).as("is_canonical"))
        .withColumn("created_at", current_timestamp())

    val kept = keptInBatch
      .join(crossMap.select(col("_canon").as("id")), Seq("id"), "left_anti")
    // survivors' signatures form the probe index for every future batch;
    // the CALLER appends both the signatures AND the label rows AFTER the
    // images metadata append — a crash in the window must leave a stored
    // image that is merely unindexed (re-dedup later, harmless) or
    // unlabeled (labels-as-own-cluster on the next cross-batch probe),
    // never an index/label row for an image that was never stored (which
    // would silently drop future copies, or double-label on re-ingest).
    Pipeline.ImageDedupResult(
      kept = kept,
      keptSigs = sigs.join(kept.select("id"), Seq("id"), "left_semi"),
      labels = labelRows,
      scratchPins = pinned.toSet)
    } catch {
      case t: Throwable =>
        graft.util.Checkpoints.release(pinned.toSet, spark)
        throw t
    }
  }

  /** Chunk a (doc_id, title, markdown)-shaped frame into chunk rows —
    * the ONE place the chunks-table schema is constructed (shared by
    * ingest and reprocess so the table can never go mixed-schema).
    */
  private def chunkDocs(docs: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    import spark.implicits._
    val chunkCfg = config.chunking
    docs
      .toDF("id", "title", "markdown")
      .as[(String, String, String)]
      .flatMap { case (docId, title, md) =>
        Chunker.chunk(md, chunkCfg).map { c =>
          (
            s"$docId-${c.chunkIndex}",
            docId,
            title,
            c.text,
            c.h1,
            c.h2,
            c.h3,
            c.chunkIndex,
            c.totalChunks,
            Seq.empty[Int], // page_numbers: vestigial in the reference (SURVEY §7.4.5)
            c.tokenCount,
            c.isSectionStart
          )
        }
      }
      .toDF(
        "id", "document_id", "document_title", "text", "section_h1", "section_h2",
        "section_h3", "chunk_index", "total_chunks", "page_numbers", "token_count",
        "is_section_start"
      )
  }

  private def embedChunkRows(chunkRows: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame =
    Embedder
      .withEmbedding(chunkRows, "text", "embedding", config.embedding)
      .withColumn("created_at", current_timestamp())

  /** Cached FTS index over the chunks table (built on demand). */
  def ftsIndex: FtsIndex.Index =
    FtsIndex.buildCached(ftsKey, catalog.read("chunks"), "id", "text")

  /** Cascade delete (S10/J5, src/pipeline.py:270-295): remove a document
    * and its chunks; anti-join rewrite of both tables.
    */
  /** Cascade the image tables (images / image_clusters /
    * image_signatures) for a set of doomed document ids, honoring SHARED
    * CANONICALS: with image dedup, a stored image whose near-dup cluster
    * still has members from OTHER documents outlives its uploading
    * document (content-addressed store semantics) — deleting it would
    * destroy the only stored copy other documents' figures resolve to.
    * Cluster rows are owned by their document (the `document_id` column
    * written at labeling time), so dropped-duplicate labels — which have
    * no images-table row — clean up with their document too.
    */
  private def cascadeImages(doomedDocs: org.apache.spark.sql.DataFrame): Unit = {
    val hasClusters = catalog.exists("image_clusters")
    val ownedClusters =
      hasClusters && catalog.read("image_clusters").columns.contains("document_id")
    val keepShared: org.apache.spark.sql.DataFrame =
      if (ownedClusters) {
        val clusters = catalog.read("image_clusters")
        // pin: lineage reads the table being rewritten below
        val doomedRows = clusters
          .join(doomedDocs, Seq("document_id"), "left_semi").localCheckpoint()
        val others = clusters.join(doomedDocs, Seq("document_id"), "left_anti")
        val keep = doomedRows
          .where(col("is_canonical"))
          .join(others.select("cluster_id"), Seq("cluster_id"), "left_semi")
          .select("id")
          .localCheckpoint()
        catalog.deleteMatching("image_clusters", doomedRows.select("id"), Seq("id"))
        keep
      } else {
        if (hasClusters && catalog.exists("images")) {
          // legacy label rows (no document_id): best-effort by image id
          val doomedImages = catalog.read("images")
            .join(doomedDocs, Seq("document_id"), "left_semi").select("id")
          catalog.deleteMatching("image_clusters", doomedImages, Seq("id"))
        }
        doomedDocs.select(col("document_id").as("id")).limit(0)
      }
    if (catalog.exists("images")) {
      val doomedImages = catalog.read("images")
        .join(doomedDocs, Seq("document_id"), "left_semi")
        .select("id")
        .join(keepShared, Seq("id"), "left_anti")
        .localCheckpoint() // lineage reads the images table being rewritten
      catalog.deleteMatching("images", doomedImages, Seq("id"))
      if (catalog.exists("image_signatures"))
        catalog.deleteMatching("image_signatures", doomedImages, Seq("id"))
    }
  }

  /** Garbage-collect ORPHAN stored images: a shared canonical outlives
    * its uploading document while other documents' duplicates resolve to
    * it ([[cascadeImages]]), so once the LAST referencing document is
    * deleted the stored copy lingers unreferenced. An image is an orphan
    * when its owning document is gone AND no live document's
    * image_clusters row points at its cluster (in-batch cluster ids ARE
    * the canonical image's id, and cross-batch labels reuse the stored
    * cluster id, so `cluster_id == image.id` is the reference edge).
    * Deletes metadata + signature rows (files under imagesDir are left
    * for the operator — the metadata row is the commit point). Returns
    * the number of images collected. Run at compaction cadence.
    */
  def gcImages(): Long = {
    if (!catalog.exists("images")) return 0L
    val liveDocs =
      if (catalog.exists("documents"))
        catalog.read("documents").select(col("id").as("document_id"))
      else catalog.read("images").select("document_id").limit(0)
    val orphans = catalog.read("images")
      .join(liveDocs, Seq("document_id"), "left_anti")
      .select("id")
    val referenced =
      if (!catalog.exists("image_clusters")) orphans.limit(0)
      else catalog.read("image_clusters")
        .join(liveDocs, Seq("document_id"), "left_semi")
        .select(col("cluster_id").as("id"))
    // pin: lineage reads the images table being rewritten
    val doomed = orphans.join(referenced, Seq("id"), "left_anti").localCheckpoint()
    val n = doomed.count()
    if (n > 0) {
      catalog.deleteMatching("images", doomed, Seq("id"))
      if (catalog.exists("image_signatures"))
        catalog.deleteMatching("image_signatures", doomed, Seq("id"))
      graft.util.JsonLog.info("gc_images", "collected" -> n)
    }
    n
  }

  def deleteDocument(documentId: String): Unit = {
    import spark.implicits._
    cascadeImages(Seq(documentId).toDF("document_id"))
    catalog.deleteWhere("chunks", col("document_id") === documentId)
    catalog.deleteWhere("documents", col("id") === documentId)
    FtsIndex.invalidate(ftsKey)
    graft.util.JsonLog.info("delete_document", "document_id" -> documentId)
  }

  /** Flush the warehouse AND the in-memory index caches — every other
    * mutation path invalidates the FTS cache, and flush must too, or a
    * long-lived session would serve BM25 hits for a deleted corpus.
    */
  def flush(dryRun: Boolean = false): Seq[String] = {
    val dropped = catalog.flush(dryRun)
    if (!dryRun) {
      FtsIndex.invalidateAll()
      graft.operators.VectorSearch.invalidateAllIvf()
      graft.operators.Dedup.invalidateClusters()
      graft.operators.GraphOps.invalidateGraphs()
    }
    dropped
  }

  /** Point lookup + ordered listing of a document's images (S9/O2,
    * src/load/sqlite_store.py:379-381).
    */
  def listImages(documentId: String): org.apache.spark.sql.DataFrame =
    catalog.read("images")
      .where(col("document_id") === documentId)
      .orderBy("page_number", "image_index")

  /** Single-file ingest (S2 — the upload path,
    * src/api/routes/documents.py:112-168): process one PDF already on
    * disk; `force` re-admits a known hash by deleting the prior document
    * first (J2 force-replace).
    */
  def processFile(pdfPath: String, force: Boolean = false): Long = {
    val p = java.nio.file.Paths.get(pdfPath)
    if (force && catalog.exists("documents")) {
      val content = java.nio.file.Files.readAllBytes(p)
      val hash = "sha256:" + java.security.MessageDigest.getInstance("SHA-256")
        .digest(content).map("%02x".format(_)).mkString
      // batch the cascade: ONE anti-join rewrite per table for the whole
      // matching set, instead of per-id deleteDocument calls that rewrite
      // all 3 tables O(n) times (VERDICT r4 #5)
      // pin: the cascade rewrites tables this frame's lineage reads
      val doomed = catalog.read("documents")
        .where(col("file_hash") === hash).select("id").localCheckpoint()
      cascadeImages(doomed.withColumnRenamed("id", "document_id"))
      catalog.deleteMatching("chunks", doomed.withColumnRenamed("id", "document_id"), Seq("document_id"))
      catalog.deleteMatching("documents", doomed, Seq("id"))
      FtsIndex.invalidate(ftsKey)
      graft.util.JsonLog.info("force_replace_delete", "file_hash" -> hash)
    }
    // the binaryFile source accepts a single-file path: only THIS file is
    // ingested, never its siblings in the parent directory
    processDirectory(pdfPath)
  }

  /** Document listing with optional status filter (F5,
    * src/load/sqlite_store.py:213-227). Empty result (not a path error)
    * on a fresh warehouse.
    */
  def listDocuments(status: Option[String] = None, limit: Int = 100): org.apache.spark.sql.DataFrame = {
    if (!catalog.exists("documents"))
      return spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("id", org.apache.spark.sql.types.StringType),
          org.apache.spark.sql.types.StructField("status", org.apache.spark.sql.types.StringType)
        ))
      )
    val docs = catalog.read("documents")
    status.map(s => docs.where(col("status") === s)).getOrElse(docs)
      .orderBy(desc("uploaded_at"), col("id"))
      .limit(limit)
  }

  /** Chunk listing for a document, ordered by chunk_index (Q7/O1,
    * src/load/lancedb_store.py:229-255).
    */
  def listChunks(documentId: String, limit: Int = 1000): org.apache.spark.sql.DataFrame = {
    require(catalog.exists("chunks"), "no chunks table yet — ingest documents first")
    catalog.read("chunks")
      .where(col("document_id") === documentId)
      .orderBy("chunk_index")
      .limit(limit)
  }

  /** Typed view of the chunks table (`Dataset[Chunk]`) — the typed core
    * API of SURVEY §1.3; the parquet schema aligns with the case class by
    * construction.
    */
  def chunksDS: org.apache.spark.sql.Dataset[graft.model.Chunk] = {
    import spark.implicits._
    catalog.read("chunks").as[graft.model.Chunk]
  }

  /** Re-chunk + re-embed from the markdown checkpoints WITHOUT
    * re-extracting PDFs (the reference's reprocess flow,
    * src/pipeline.py:222-268 — the whole point of the S4 checkpoint).
    * Replaces the chunks of every document found under `markdownDir`;
    * useful after a chunking-config change. Returns documents reprocessed.
    */
  def reprocessFromMarkdown(markdownDir: String): Long = {
    import spark.implicits._
    if (!catalog.exists("documents")) return 0L
    // trust the LEDGER, not the directory: a checkpoint file left behind
    // by deleteDocument must not resurrect orphan chunks
    val parsed = MarkdownSource.read(spark, markdownDir)
      .select(col("document_id"), col("title"), col("content"))
      .join(
        catalog.read("documents").select(col("id").as("document_id")),
        Seq("document_id"),
        "left_semi"
      )
      .localCheckpoint() // cut lineage before mutating the chunks table
    val nDocs = parsed.count()
    if (nDocs == 0) return 0L

    val chunkRows = chunkDocs(parsed)
    val chunks = embedChunkRows(chunkRows)

    // structural delete: a bulk reprocess of millions of checkpoints stays
    // one anti-join — no collected id list, no giant isin expression tree
    catalog.deleteMatching("chunks", parsed.select("document_id"), Seq("document_id"))
    catalog.append(chunks, "chunks")

    // keep the ledger's total_chunks consistent with the new chunking
    val newTotals = chunkRows
      .groupBy(col("document_id").as("id"))
      .agg(count(lit(1)).as("_new_total"))
    val updatedDocs = catalog.read("documents")
      .join(broadcast(newTotals), Seq("id"), "left")
      .withColumn("total_chunks", coalesce(col("_new_total"), col("total_chunks")))
      .drop("_new_total")
      .localCheckpoint() // lineage reads the documents table being replaced
    catalog.overwrite(updatedDocs, "documents")

    FtsIndex.invalidate(ftsKey)
    nDocs
  }

  /** Point lookups (F6, src/load/sqlite_store.py:174-211). */
  def getDocument(id: String): Option[org.apache.spark.sql.Row] =
    if (!catalog.exists("documents")) None
    else catalog.read("documents").where(col("id") === id).collect().headOption

  def getDocumentByHash(fileHash: String): Option[org.apache.spark.sql.Row] =
    if (!catalog.exists("documents")) None
    else catalog.read("documents").where(col("file_hash") === fileHash).collect().headOption

  /** Status histogram + chunk count (A1/A2, src/pipeline.py:297-311).
    * Empty histogram (not a path error) on a fresh warehouse.
    */
  def stats(): DataFrame = {
    import spark.implicits._
    if (!catalog.exists("documents"))
      return Seq.empty[(String, Long, Long)].toDF("status", "n", "total_chunks")
    val byStatus = catalog.read("documents").groupBy("status").agg(count(lit(1)).as("n"))
    val totalChunks = if (catalog.exists("chunks")) catalog.read("chunks").count() else 0L
    byStatus.withColumn("total_chunks", lit(totalChunks))
  }
}

object Pipeline {
  /** What one batch's image dedup produced, with appends DEFERRED to the
    * caller so the crash-ordering invariant holds for every derived
    * table: images metadata first, then signatures, then cluster labels.
    * `scratchPins` are the dedup's intra-batch checkpoint RDD ids —
    * release them once the label append (the last consumer) completes.
    */
  private[pipeline] final case class ImageDedupResult(
      kept: org.apache.spark.sql.DataFrame,
      keptSigs: org.apache.spark.sql.DataFrame,
      labels: org.apache.spark.sql.DataFrame,
      scratchPins: Set[Int])
}
