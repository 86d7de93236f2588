package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.GraftConfig
import graft.operators.{ContextAssembly, Embedder, FtsIndex, HybridSearch, VectorSearch}

/** Query-side façade — the reference's HybridRetriever
  * (reference: src/retrieve/hybrid_retriever.py:21-206): mode dispatch
  * (vector / keyword / hybrid-RRF), title prefiltering, known-topic
  * routing, and LLM-context assembly under a token budget.
  */
object SearchMode extends Enumeration {
  val Vector, Keyword, Hybrid, Adc = Value
}

/** @param pqIndexPath a [[graft.operators.VectorSearch.writePq]] artifact
  *   built over the chunks table (codes keyed by chunk id) — enables
  *   [[Retriever.adcSearch]] / `SearchMode.Adc`, the adjudicated
  *   0.9-recall operating point of the retrieval-regime table
  *   (SCALE.md): ADC shortlist over nSub-byte codes + exact rescore of
  *   the shortlist's float vectors. Absent = the brute/IVF/banded modes
  *   only, unchanged.
  */
final class Retriever(
    spark: SparkSession,
    pipeline: Pipeline,
    config: GraftConfig = GraftConfig.default,
    pqIndexPath: Option[String] = None) {

  private val embedder = Embedder.provider(config.embedding)

  // constructor argument wins; config.search.pqIndexPath wires the mode
  // for CLI/REST sessions built from config alone
  private val resolvedPqPath: Option[String] =
    pqIndexPath.orElse(config.search.pqIndexPath)

  // codebook loaded once (bounded sidecar, loud on a corrupt artifact);
  // the codes TABLE is read per probe — stateless, no pinned blocks to
  // leak, and the scan is nSub bytes/row behind parquet pruning
  private lazy val pqModel: Option[VectorSearch.PqModel] =
    resolvedPqPath.map(p => VectorSearch.loadPqModel(spark, p))

  /** Topic keywords for title routing (reference KNOWN_TOPICS,
    * hybrid_retriever.py:32-50).
    */
  val knownTopics: Seq[String] = Seq(
    "pregnancy", "nutrition", "diabetes", "vaccination", "contraception",
    "menopause", "fertility", "labor", "cesarean", "breastfeeding",
    "depression", "exercise", "cancer", "incontinence", "hysterectomy",
    "infection", "bleeding"
  )

  /** First known topic contained in the query, if any (X5,
    * hybrid_retriever.py:92-126).
    */
  def extractTopic(query: String): Option[String] = {
    val q = query.toLowerCase
    knownTopics.find(q.contains)
  }

  private def chunks: DataFrame = pipeline.catalog.read("chunks")

  private def titlePred(titleFilter: Option[String]): Option[Column] =
    // Column-parameterized containment — injection-proof by construction
    // (the reference must escape LIKE metacharacters by hand,
    // hybrid_retriever.py:76-81).
    titleFilter.map(t => lower(col("document_title")).contains(t.toLowerCase))

  def vectorSearch(query: String, k: Int, titleFilter: Option[String] = None): DataFrame = {
    val qv = embedder.embedOne(query)
    // F9: embedding-less chunks are excluded from vector search (the
    // reference skips them at vector-store write, lancedb_store.py:78-83;
    // with a single chunks table the filter moves to the read side)
    val pred = titlePred(titleFilter)
      .map(_ && col("embedding").isNotNull)
      .getOrElse(col("embedding").isNotNull)
    // HashingEmbedder emits unit vectors: score with the dot product
    // (== cosine at a third of the per-row flops on the scan hot path)
    VectorSearch
      .topK(chunks, "embedding", qv, k, col("id"), Some(pred),
        scorer = graft.functions.VectorFunctions.dotProduct)
      .select(col("id"), col("document_id"), col("document_title"), col("text"),
        col("section_h1"), col("section_h2"), col("chunk_index"), col("score"))
  }

  def keywordSearch(query: String, k: Int, titleFilter: Option[String] = None): DataFrame = {
    val idx = pipeline.ftsIndex
    // With a title filter the PREDICATE must see every scored candidate
    // (the reference's LanceDB FTS prefilters before its limit): a k*4
    // overfetch truncated on unfiltered score could rank all
    // title-matching chunks below the cut and return fewer than k — or
    // zero — matching rows. Without a filter the bounded overfetch is the
    // cheaper plan.
    val scored = (titleFilter match {
      case Some(_) =>
        FtsIndex.scoreAll(spark, idx, query, config.search.bm25K1, config.search.bm25B)
      case None =>
        FtsIndex.search(spark, idx, query, math.max(k * 4, k),
          config.search.bm25K1, config.search.bm25B)
    }).withColumnRenamed("doc_id", "id")
    val joined = chunks.join(scored, "id")
    val filtered = titlePred(titleFilter).map(joined.where).getOrElse(joined)
    filtered
      .orderBy(desc("score"), col("id"))
      .limit(k)
      .select(col("id"), col("document_id"), col("document_title"), col("text"),
        col("section_h1"), col("section_h2"), col("chunk_index"), col("score"))
  }

  /** Batch vector retrieval: top-k chunks for MANY queries in one job
    * (training-pipeline shape — e.g. mine context for a whole eval set).
    * Chunk ids are strings, so a deterministic numeric surrogate
    * (row_number over id) carries them through the TopKBy heap and joins
    * back after.
    */
  def vectorSearchMany(queryTexts: Seq[String], k: Int): DataFrame = {
    import spark.implicits._
    val queries = queryTexts.zipWithIndex
      .map { case (t, i) => (i.toLong, embedder.embedOne(t)) }
      .toDF("query_id", "qvec")
    // shuffle-free deterministic surrogate: a global-window row_number
    // would single-partition-sort the whole corpus (the exact shape the
    // heap aggregate avoids); a 64-bit hash of the unique id doesn't
    val corpus = chunks
      .where(col("embedding").isNotNull)
      .withColumn("sid", xxhash64(col("id")))
    // Surrogate-collision guard: a 64-bit collision would silently
    // attribute one chunk's score to another and fan out duplicate hits.
    // One ids-only aggregation (no payload) per call — negligible next to
    // the scan, and it turns an undetectable corruption into a hard error.
    val counts = corpus.agg(
      countDistinct(col("sid")).as("n_sid"),
      countDistinct(col("id")).as("n_id")
    ).head()
    require(counts.getLong(0) == counts.getLong(1),
      s"xxhash64 surrogate collision in chunk ids (${counts.getLong(1)} ids -> " +
        s"${counts.getLong(0)} surrogates); re-key the corpus or use a composite key")
    val top = VectorSearch
      .topKBatch(queries, corpus, "query_id", "qvec", "sid", "embedding", k)
      .select(col("query_id"), explode(col("top")).as("hit"))
      .select(col("query_id"), col("hit.id").as("sid"), col("hit.score").as("score"))
    top
      .join(corpus.select(col("sid"), col("id"), col("document_id"), col("document_title"), col("text")), "sid")
      .drop("sid")
      .orderBy(col("query_id"), desc("score"), col("id"))
  }

  /** ADC-shortlist vector search — the measured 0.9-recall regime
    * (VERDICT r13 #4; SCALE.md's retrieval-regime table adjudicated it
    * over banded-LSH at this corpus: ≥0.9 recall at a fraction of the
    * float bytes). Two stages: (1) asymmetric-distance top-`shortlist`
    * over the persisted PQ codes (nSub bytes/row, integer adds, no float
    * vector touched); (2) exact dot-product rescore of ONLY the
    * shortlist's chunks, returning the same row shape as
    * [[vectorSearch]]. The shortlist size is the recall knob (default
    * max(40k, 400) — the sf0.1-ladder-measured ≥0.9 operating point at
    * k=10: shortlist 400 reads 0.965/0.955 recall bare/façade, 100 reads
    * only ~0.69); `titleFilter` applies at the rescore, the standard
    * ANN-prefilter trade (a heavily-filtered query should use the exact
    * Vector mode). Crossover note (measured, SCALE.md): at sf0.1's
    * 2k-row corpus the façade's fixed per-probe overheads (codes scan +
    * semi-join) exceed the float-byte savings — the regime pays off when
    * the corpus dwarfs the shortlist, which is the 100 TB case this mode
    * exists for.
    */
  def adcSearch(
      query: String,
      k: Int,
      titleFilter: Option[String] = None,
      shortlist: Int = 0
  ): DataFrame = {
    val path = resolvedPqPath.getOrElse(throw new IllegalStateException(
      "SearchMode.Adc needs a Retriever(pqIndexPath = ...) pointing at a " +
        "VectorSearch.writePq artifact whose codes are keyed by chunk id"))
    val model = pqModel.get
    val qv = embedder.embedOne(query)
    val fetch = if (shortlist > 0) shortlist else math.max(k * 40, 400)
    val ids = VectorSearch
      .pqSearch(model, spark.read.parquet(s"$path/codes"), qv.toSeq, fetch)
      .select("id")
    val pred = titlePred(titleFilter)
      .map(_ && col("embedding").isNotNull)
      .getOrElse(col("embedding").isNotNull)
    VectorSearch
      .topK(chunks.join(ids, Seq("id"), "left_semi"), "embedding", qv, k, col("id"),
        Some(pred), scorer = graft.functions.VectorFunctions.dotProduct)
      .select(col("id"), col("document_id"), col("document_title"), col("text"),
        col("section_h1"), col("section_h2"), col("chunk_index"), col("score"))
  }

  /** Derive the [[adcSearch]] shortlist for a recall target from THIS
    * store's own geometry (r17 verdict #5) —
    * [[VectorSearch.calibrateAdcShortlist]] over the persisted PQ codes
    * and the chunks' float vectors (two batched jobs). Run once per
    * (index, target) and pass the result as [[adcSearch]]'s `shortlist`
    * instead of trusting the fixed default's hand-measured datasheet.
    */
  def calibrateAdcShortlist(
      recallTarget: Double = 0.9,
      k: Int = 10,
      nQueries: Int = 20,
      maxShortlist: Int = 4096
  ): Int = {
    val path = resolvedPqPath.getOrElse(throw new IllegalStateException(
      "SearchMode.Adc needs a Retriever(pqIndexPath = ...) pointing at a " +
        "VectorSearch.writePq artifact whose codes are keyed by chunk id"))
    VectorSearch.calibrateAdcShortlist(
      pqModel.get, spark.read.parquet(s"$path/codes"),
      chunks.where(col("embedding").isNotNull), "id", "embedding",
      recallTarget, k, nQueries, maxShortlist)
  }

  /** Hybrid = RRF fusion of vector + keyword rankings (Q3/W4), with
    * vector fallback on keyword failure (lancedb_store.py:187-190).
    */
  def hybridSearch(query: String, k: Int, titleFilter: Option[String] = None): DataFrame = {
    val v = vectorSearch(query, k, titleFilter).select(col("id"), col("score"))
    // Force the keyword branch to EXECUTE inside the try: a lazy plan
    // would defer failures past this fallback to the caller's action
    // (reference falls back to pure vector on FTS failure,
    // lancedb_store.py:187-190). localCheckpoint (eager) materializes on
    // the executors — no driver round-trip for the k rows.
    val kw =
      try {
        keywordSearch(query, k, titleFilter)
          .select(col("id"), col("score"))
          .localCheckpoint()
      } catch {
        // NonFatal only: an OOM/fatal JVM error must propagate, not
        // masquerade as a silent mode switch; log the branch failure so
        // genuine FTS bugs stay visible.
        case scala.util.control.NonFatal(e) =>
          graft.util.JsonLog.warn("hybrid_keyword_fallback",
            "error" -> e.toString, "mode" -> "vector_only")
          return vectorSearch(query, k, titleFilter)
      }
    val fused = HybridSearch.rrf(v, kw, "id", "score", k, config.search.rrfK)
    fused
      .select(col("id"), col("rrf_score").as("score"))
      .join(chunks, "id")
      .orderBy(desc("score"), col("id"))
      .select(col("id"), col("document_id"), col("document_title"), col("text"),
        col("section_h1"), col("section_h2"), col("chunk_index"), col("score"))
  }

  /** Mode dispatch + topic routing (Q4/Q5,
    * hybrid_retriever.py:57-90,148-151).
    */
  def search(
      query: String,
      mode: SearchMode.Value = SearchMode.Hybrid,
      k: Int = 10,
      titleFilter: Option[String] = None,
      routeByTopic: Boolean = false
  ): DataFrame = {
    val filter = titleFilter.orElse(if (routeByTopic) extractTopic(query) else None)
    mode match {
      case SearchMode.Vector  => vectorSearch(query, k, filter)
      case SearchMode.Keyword => keywordSearch(query, k, filter)
      case SearchMode.Hybrid  => hybridSearch(query, k, filter)
      case SearchMode.Adc     => adcSearch(query, k, filter)
    }
  }

  /** LLM-context assembly (Q6, hybrid_retriever.py:167-206): over-fetch,
    * select the longest prefix within the token budget, format with
    * source attribution.
    */
  def getContext(
      query: String,
      maxTokens: Int = 4000,
      mode: SearchMode.Value = SearchMode.Hybrid
  ): String = {
    val hits = search(query, mode, config.search.contextOverfetchK)
    val selected = ContextAssembly
      .selectWithinBudget(hits, "score", "id", maxTokens.toDouble)
      .orderBy(desc("score"), col("id"))
      .collect()
    ContextAssembly.formatContext(selected, "document_title", "text")
  }
}
