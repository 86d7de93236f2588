package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions

/** Full-text search: inverted-index build + BM25 scoring as pure DataFrame
  * algebra (reference behavior: LanceDB/Tantivy FTS index built per batch at
  * src/load/lancedb_store.py:104-112 and queried at
  * src/load/lancedb_store.py:192-222).
  *
  * Scale design:
  *   - The postings list is a DataFrame partitioned by `term` — the single
  *     shuffle of the build (`groupBy(doc, term)` then stats). At 100 TB the
  *     postings table is written bucketed by term so query-time term lookups
  *     touch only matching buckets.
  *   - Corpus stats (N, avgdl) are two scalars; per-term document
  *     frequencies are derived at QUERY time over the query's terms only
  *     (a window count on the isin-filtered postings) — never a
  *     full-corpus shuffle, and the index itself stays df-free so batch
  *     extension is a pure append.
  *   - Query-side scoring is: semi-join postings on the query's terms
  *     (partition-pruned), per-(doc,term) BM25 term score, then a single
  *     `groupBy(doc)` sum — one narrow shuffle over candidate docs only.
  */
object FtsIndex {

  /** Inverted index: one row per (doc, term) with term frequency and doc
    * length. Document frequencies are NOT materialized in the postings —
    * they are derived query-side over the query's terms only (a window
    * count on the already-filtered postings). That keeps index
    * maintenance a pure APPEND: a new batch's postings union in without
    * touching (or staleing) any existing row, which is what makes
    * incremental ingest O(batch) instead of O(corpus) — see [[append]].
    */
  final case class Index(
      postings: DataFrame,
      numDocs: Long,
      avgDocLen: Double,
      // persisted fragments behind `postings` (append builds a union of
      // persisted batches): invalidate must unpersist ALL of them, or a
      // long-lived session leaks one block-manager entry per batch
      retained: Seq[DataFrame] = Nil,
      // RUN-SCOPED token of the last streaming micro-batch unioned in —
      // the idempotence stamp that lets a replayed batch skip
      // re-extension (see extendForBatch). Includes the run identity
      // (checkpoint path), not just the batch id: batch ids restart from
      // 0 on a fresh checkpoint, and a bare-id stamp would misread a new
      // run's batch N as a replay of the old run's batch N and silently
      // drop it from the index.
      lastBatchToken: Option[String] = None
  ) {
    private[operators] def unpersistAll(): Unit = {
      postings.unpersist()
      retained.foreach(_.unpersist())
    }
  }

  /** Build the index over `textCol` of `docs` keyed by `idCol`.
    * Equivalent of S7 `create_fts_index` (src/load/lancedb_store.py:104-112).
    * The postings DataFrame is persisted: the build is an ingest-time step
    * (the reference rebuilds its FTS index once per batch, *after* load,
    * src/pipeline.py:164-165) and query-time search must only read it. At
    * cluster scale, substitute `postings.write.bucketBy(n, "term")` for
    * `persist` — same contract.
    */
  def build(docs: DataFrame, idCol: String, textCol: String): Index = {
    val tokenized = docs
      .select(col(idCol).as("doc_id"), TextFunctions.ftsTokens(col(textCol)).as("tokens"))
      .withColumn("doc_len", size(col("tokens")))

    val termFreq = tokenized
      .select(col("doc_id"), col("doc_len"), explode(col("tokens")).as("term"))
      .groupBy("doc_id", "doc_len", "term")
      .agg(count(lit(1)).as("tf"))

    // lazy persist: the full postings materialize on the first search that
    // touches them (tokenization is cheap relative to the agg shuffle, so
    // re-deriving it for the stats row costs less than eager caching here)
    val postings = termFreq.persist()

    val stats = tokenized.agg(count(lit(1)).as("n"), avg("doc_len").as("avgdl")).head()
    // avg over an empty corpus is NULL — an empty index must still search
    val avgdl = if (stats.isNullAt(1)) 0.0 else stats.getDouble(1)
    Index(postings, stats.getLong(0), avgdl)
  }

  /** Incremental maintenance: extend `index` with `newDocs` WITHOUT
    * touching the existing postings — an O(batch) union plus a constant
    * stats update (numDocs, running-mean avgdl), vs the reference's
    * O(corpus) per-batch index rebuild. Sound for append-only ingest; a
    * deletion/upsert batch still wants a rebuild (df would be stale
    * nowhere — df is query-derived — but removed docs' postings must go).
    */
  def append(index: Index, newDocs: DataFrame, idCol: String, textCol: String): Index = {
    val batch = build(newDocs, idCol, textCol)
    val total = index.numDocs + batch.numDocs
    val avgdl =
      if (total == 0) 0.0
      else (index.avgDocLen * index.numDocs + batch.avgDocLen * batch.numDocs) / total
    Index(
      index.postings.unionByName(batch.postings),
      total,
      avgdl,
      retained = (index.retained :+ index.postings :+ batch.postings).distinct
    )
  }

  /** Persist an index as a parquet postings table + stats sidecar — the
    * durable form of the build (query clusters load this instead of
    * rebuilding). At real scale write with
    * `.bucketBy(n, "term").sortBy("term")` into a catalog table so
    * query-time term lookups read only matching buckets.
    */
  def write(index: Index, path: String): Unit =
    graft.sources.StoreLease.withRenewableLease(path, "write-fts") { lease =>
    index.postings.write.mode("overwrite").parquet(s"$path/postings")
    lease.renew() // the postings write is the long pole; protect the tail
    // stats sidecar goes through the Hadoop FileSystem of the target path
    // (not java.nio), so hdfs:// and s3a:// index locations work
    val stats = s"""{"numDocs":${index.numDocs},"avgDocLen":${index.avgDocLen}}"""
    val p = new org.apache.hadoop.fs.Path(s"$path/stats.json")
    val fs = p.getFileSystem(index.postings.sparkSession.sparkContext.hadoopConfiguration)
    val out = fs.create(p, true)
    try out.write(stats.getBytes("UTF-8"))
    finally out.close()
  }

  /** Load a persisted index. */
  def load(spark: SparkSession, path: String): Index = {
    val p = new org.apache.hadoop.fs.Path(s"$path/stats.json")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val in = fs.open(p)
    val stats =
      try new String(org.apache.commons.io.IOUtils.toByteArray(in), "UTF-8")
      finally in.close()
    val numDocs = "\"numDocs\":(\\d+)".r.findFirstMatchIn(stats).get.group(1).toLong
    val avgDocLen = "\"avgDocLen\":([0-9.Ee+-]+)".r.findFirstMatchIn(stats).get.group(1).toDouble
    Index(spark.read.parquet(s"$path/postings"), numDocs, avgDocLen)
  }

  // Ingest-time index registry: one built index per corpus key, so the
  // query side (BM25 / hybrid / context assembly) reads rather than
  // rebuilds — mirroring the reference's write-then-index lifecycle.
  private val cache = new java.util.concurrent.ConcurrentHashMap[String, Index]()

  // Per-key monitors: index builds run SPARK JOBS while holding their
  // lock, so the lock must never be a CHM bin lock (compute() would stall
  // an unrelated corpus key hashing to the same bin behind a full build,
  // and a reentrant cache access from the same thread would throw).
  // Monitor objects are never removed — one Object per corpus key ever
  // seen, bounded and tiny — so two threads can never hold DIFFERENT
  // monitors for the same key.
  private val keyLocks = new java.util.concurrent.ConcurrentHashMap[String, Object]()
  private def lockFor(key: String): Object =
    keyLocks.computeIfAbsent(key, _ => new Object)

  def buildCached(key: String, docs: => DataFrame, idCol: String, textCol: String): Index =
    lockFor(key).synchronized {
      val existing = cache.get(key)
      if (existing != null) existing
      else {
        val idx = build(docs, idCol, textCol)
        cache.put(key, idx)
        idx
      }
    }

  /** Incrementally extend the CACHED index under `key` (no-op None if the
    * key isn't built yet — first search will build from the full table).
    * The replaced entry's fragments stay persisted because the new index
    * retains them; a later invalidate unpersists the whole chain.
    */
  def appendCached(key: String, newDocs: DataFrame, idCol: String, textCol: String): Option[Index] =
    lockFor(key).synchronized {
      Option(cache.get(key)).map { idx =>
        val next = append(idx, newDocs, idCol, textCol)
        cache.put(key, next)
        next
      }
    }

  /** Streaming-safe incremental maintenance: atomically ensure the cached
    * index under `key` includes the micro-batch identified by
    * `batchToken` (a RUN-SCOPED identity, e.g. "checkpointDir#batchId" —
    * bare batch ids collide across runs/checkpoint resets). Exactly one
    * of three things happens, all inside the map's per-key compute (which
    * also serializes against concurrent [[buildCached]] calls):
    *
    *   - index present, `lastBatchToken == batchToken`: REPLAYED batch —
    *     no-op (a retried micro-batch must not union its postings twice);
    *   - index present otherwise: extend with the batch, stamp the token;
    *   - index absent: build from `preBatchCorpus` (the table BEFORE this
    *     batch lands), then extend with the batch, stamp.
    *
    * Call BEFORE appending the batch to the table: then a concurrent
    * search can neither double-count the batch (any index it builds/uses
    * is the one this critical section produced or preceded) nor lose it
    * (the table only gains the batch after the index already has it). The
    * absent case means the first streaming batch pays one build of the
    * pre-existing corpus even if no search ever runs — the price of
    * closing the build-vs-extend race windows on both sides.
    *
    * Lock scope: the Spark work runs under the PER-KEY monitor (not a
    * CHM bin lock), so an unrelated corpus key never waits behind this
    * build, and multi-corpus streaming under one JVM stays safe.
    */
  def extendForBatch(
      key: String,
      batchToken: String,
      newDocs: DataFrame,
      idCol: String,
      textCol: String,
      preBatchCorpus: => DataFrame
  ): Index =
    lockFor(key).synchronized {
      val next = cache.get(key) match {
        case null =>
          append(build(preBatchCorpus, idCol, textCol), newDocs, idCol, textCol)
            .copy(lastBatchToken = Some(batchToken))
        case idx if idx.lastBatchToken.contains(batchToken) => idx
        case idx =>
          append(idx, newDocs, idCol, textCol).copy(lastBatchToken = Some(batchToken))
      }
      cache.put(key, next)
      next
    }

  def invalidate(key: String): Unit =
    lockFor(key).synchronized {
      Option(cache.remove(key)).foreach(_.unpersistAll())
    }

  /** Drop every cached index — the warehouse-flush companion. */
  def invalidateAll(): Unit = {
    import scala.jdk.CollectionConverters._
    cache.keySet().asScala.toSeq.foreach(invalidate)
  }

  /** BM25 score expression for one (tf, df, docLen) posting.
    * idf = ln(1 + (N - df + 0.5)/(df + 0.5)) — the Robertson-Sparck Jones
    * form used by Lucene/Tantivy (the engine behind the reference's FTS).
    */
  def bm25TermScore(
      tf: Column,
      df: Column,
      docLen: Column,
      numDocs: Long,
      avgDocLen: Double,
      k1: Double = 1.2,
      b: Double = 0.75
  ): Column = {
    val idf = log(lit(1.0) + (lit(numDocs.toDouble) - df + lit(0.5)) / (df + lit(0.5)))
    val tfSat = (tf * (lit(k1) + 1.0)) /
      (tf + lit(k1) * (lit(1.0) - lit(b) + lit(b) * docLen / lit(avgDocLen)))
    idf * tfSat
  }

  /** BM25 scores for EVERY candidate document (one row per doc matching
    * at least one query term) — [[search]] without the top-k truncation.
    * Use when the ranking will be re-ordered downstream (prefilter +
    * re-rank, cross-engine comparison on rounded scores): truncating
    * before a downstream filter/re-sort silently loses rows.
    */
  def scoreAll(
      spark: SparkSession,
      index: Index,
      query: String,
      k1: Double = 1.2,
      b: Double = 0.75
  ): DataFrame = {
    val terms = query.toLowerCase.split("[^a-z0-9]+").filter(_.nonEmpty).distinct
    if (terms.isEmpty)
      // empty result with the SAME schema as the scored path (doc_id keeps
      // the postings' type, score is double) so callers can union/join
      // uniformly across queries
      return index.postings
        .select(col("doc_id"))
        .withColumn("score", lit(0.0))
        .limit(0)

    // df derived over the FILTERED postings: the filter keeps every row of
    // the query's terms, so a per-term window count IS the corpus-wide
    // document frequency — tiny (query-term rows only), and it is what
    // lets the index itself stay df-free (append-only maintenance)
    val wTerm = org.apache.spark.sql.expressions.Window.partitionBy("term")
    index.postings
      .where(col("term").isin(terms.toSeq: _*))
      .withColumn("df", count(lit(1)).over(wTerm))
      .withColumn(
        "term_score",
        bm25TermScore(col("tf"), col("df"), col("doc_len"), index.numDocs, index.avgDocLen, k1, b)
      )
      .groupBy("doc_id")
      .agg(sum("term_score").as("score"))
  }

  /** Top-k BM25 search. The query is tokenized driver-side (it is one short
    * string); candidate postings are filtered with an `isin` predicate that
    * Catalyst pushes into the postings scan.
    */
  def search(
      spark: SparkSession,
      index: Index,
      query: String,
      k: Int,
      k1: Double = 1.2,
      b: Double = 0.75
  ): DataFrame =
    scoreAll(spark, index, query, k1, b)
      .orderBy(desc("score"), col("doc_id"))
      .limit(k)

  /** Batch BM25: ranked top-k per query for a whole query TABLE against
    * the same postings index in ONE job — the shape for scoring millions
    * of eval/mining queries at cluster scale, where looping [[search]]
    * per query would plan a job per query.
    *
    * Scale shape: queries tokenize distributed (the shared
    * [[graft.functions.TextFunctions.ftsTokens]]); the postings scan is
    * semi-join-filtered to the batch's term VOCABULARY first (so the
    * per-term window count over the survivors is still the exact
    * corpus-wide document frequency, and only matching terms' postings
    * flow), then joined to the per-query terms — both query-side tables
    * broadcast while the batch is small (the default); pass
    * `broadcastQueries = false` for batches beyond the broadcast limit
    * (millions of queries) and both become term-keyed shuffle joins
    * with identical results. `maxDfFraction` < 1.0 drops query terms
    * whose document frequency exceeds that fraction of the corpus from
    * SCORING (classic common-term pruning): a term matching most of the
    * corpus contributes near-zero BM25 idf but costs |batch| x df join
    * rows — the worst case of bag-of-words batch scoring. Off by
    * default because it changes scores (slightly — only near-zero-idf
    * terms drop). Per-(query, doc) scores aggregate
    * term scores cast to decimal(18,9) — exact and summation-order-free,
    * unlike a raw double sum whose low bits would depend on partition
    * order across a large batch — and ranking uses the 6-decimal-rounded
    * score with doc-id tiebreak through a bounded [[graft.plans.TopKBy]]
    * heap (no global sort of the scored candidates).
    *
    * Returns (query_id, rank, doc_id, score) with 1-based ranks — feed
    * directly to [[RetrievalEval.summary]].
    */
  def searchMany(
      queries: DataFrame,
      queryIdCol: String,
      queryTextCol: String,
      index: Index,
      k: Int,
      k1: Double = 1.2,
      b: Double = 0.75,
      broadcastQueries: Boolean = true,
      maxDfFraction: Double = 1.0
  ): DataFrame = {
    require(maxDfFraction > 0.0 && maxDfFraction <= 1.0,
      s"searchMany: maxDfFraction must be in (0, 1], got $maxDfFraction")
    val qTerms = queries
      .select(
        col(queryIdCol).as("query_id"),
        explode(array_distinct(TextFunctions.ftsTokens(col(queryTextCol)))).as("term"))
    def side(df: DataFrame): DataFrame = if (broadcastQueries) broadcast(df) else df
    val vocab = qTerms.select("term").distinct()
    val wTerm = org.apache.spark.sql.expressions.Window.partitionBy("term")
    val scored = index.postings
      .join(side(vocab), Seq("term"), "left_semi")
      .withColumn("df", count(lit(1)).over(wTerm))
    // common-term pruning runs AFTER the df window (df stays the true
    // corpus-wide frequency) and BEFORE the per-query fan-out join —
    // the |batch| x df blow-up is exactly what it exists to cut
    val cand = (if (maxDfFraction < 1.0)
      scored.where(col("df") <= lit(maxDfFraction * index.numDocs))
    else scored)
      .withColumn(
        "term_score",
        bm25TermScore(col("tf"), col("df"), col("doc_len"), index.numDocs, index.avgDocLen, k1, b))
    // Skew guard for the broadcast fan-out: the df window above leaves
    // cand hash-partitioned BY TERM, so a head term's whole df sits in
    // one partition and the broadcast join below would emit its
    // |queries-with-term| x df rows — and run their partial aggregation
    // — in ONE task (the round-10 audit measured the 12k-query unpruned
    // leg at ~1 core from exactly this; AQE cannot help because the
    // skew is in join OUTPUT fan-out, not input partition sizes).
    // Spreading by (term, doc) first costs one batch-footprint shuffle
    // and distributes the fan-out. Broadcast mode only: a shuffle join
    // re-exchanges by term anyway, undoing the spread.
    val fanoutReady =
      if (broadcastQueries) cand.repartition(col("term"), col("doc_id")) else cand
    fanoutReady
      .join(side(qTerms), Seq("term"))
      .groupBy("query_id", "doc_id")
      .agg(sum(col("term_score").cast("decimal(18,9)")).cast("double").as("score"))
      .withColumn("score", round(col("score"), 6))
      .groupBy("query_id")
      .agg(graft.plans.TopKBy.topKBy(col("score"), col("doc_id"), k).as("top"))
      .select(col("query_id"), posexplode(col("top")))
      .select(
        col("query_id"),
        (col("pos") + 1).cast("long").as("rank"),
        col("col.id").as("doc_id"),
        col("col.score").as("score"))
  }

  /** Exact PHRASE search: documents where the query tokens occur as a
    * consecutive run (the FTS feature BM25's bag-of-words scoring cannot
    * express — "hash join" must not match "join ... hash"). Returns
    * (id, n_hits) with n_hits = number of occurrence start positions.
    *
    * Positional-postings shape: tokenize with positions (posexplode of
    * the shared [[graft.functions.TextFunctions.ftsTokens]]), then —
    * crucially for scale — FILTER to the phrase's own vocabulary BEFORE
    * any join, so the adjacency self-joins shuffle only (id, pos) pairs
    * of the few matching terms, never the corpus token stream. Each
    * phrase word joins on (id, pos - offset): k-1 equi-joins for a
    * k-word phrase, all hash-partitioned on the same (id, pos) key.
    * Occurrences may share a word with an adjacent occurrence; counting
    * start positions matches the oracle's token-array adjacency count.
    */
  def phraseOccurrences(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      phrase: Seq[String]
  ): DataFrame = {
    require(phrase.nonEmpty, "phrase must have at least one token")
    val toks = docs
      .select(
        col(idCol).as("id"),
        posexplode(graft.functions.TextFunctions.ftsTokens(col(textCol))).as(Seq("pos", "tok"))
      )
      .where(col("tok").isin(phrase.distinct: _*))
    val first = toks.where(col("tok") === phrase.head).select(col("id"), col("pos"))
    val matched = phrase.zipWithIndex.drop(1).foldLeft(first) { case (acc, (w, i)) =>
      val ti = toks
        .where(col("tok") === w)
        .select(col("id").as("_id_i"), (col("pos") - i).as("_pos_i"))
      acc
        .join(ti, col("id") === col("_id_i") && col("pos") === col("_pos_i"))
        .select(col("id"), col("pos"))
    }
    matched.groupBy("id").agg(count(lit(1)).as("n_hits"))
  }

  /** Ordered PROXIMITY search: count of token-position pairs where
    * `termA` occurs and `termB` follows within `slop` positions ("filter
    * NEAR/5 scan") — the relevance signal between exact phrase (slop=1)
    * and BM25's bag-of-words (slop=∞).
    *
    * Same positional-postings scale shape as [[phraseOccurrences]]: the
    * corpus token stream is filtered to the TWO query terms before the
    * join, so only their (id, pos) postings shuffle. The join itself is
    * an equi-join on id; the `(0, slop]` gap predicate is evaluated as a
    * post-join filter within each id's co-partitioned postings, bounded
    * by tfA(id) * tfB(id) per document — never a corpus-sized cross
    * product. Returns (id, n_pairs) for documents with at least one
    * qualifying pair.
    */
  def proximityOccurrences(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      termA: String,
      termB: String,
      slop: Int
  ): DataFrame = {
    require(slop >= 1, s"need slop >= 1, got $slop")
    val toks = docs
      .select(
        col(idCol).as("id"),
        posexplode(graft.functions.TextFunctions.ftsTokens(col(textCol))).as(Seq("pos", "tok"))
      )
      .where(col("tok").isin(Seq(termA, termB).distinct: _*))
    val a = toks.where(col("tok") === termA).select(col("id"), col("pos").as("_pos_a"))
    val b = toks.where(col("tok") === termB).select(col("id").as("_id_b"), col("pos").as("_pos_b"))
    a.join(
      b,
      col("id") === col("_id_b") &&
        col("_pos_b") > col("_pos_a") &&
        col("_pos_b") - col("_pos_a") <= slop
    ).groupBy("id")
      .agg(count(lit(1)).as("n_pairs"))
  }

  /** Keyword-in-context snippets: for every document containing `term`,
    * the ±`width`-token window around the FIRST occurrence, joined with
    * single spaces — the search-result display string. Returns
    * (id, pos, snippet) with pos = 1-based token position of the hit.
    *
    * Pure narrow pass (tokenize, position, slice at the scan — no
    * explode, no shuffle); the caller typically semi-joins it to a top-k
    * result, so only k documents ever materialize snippets.
    */
  def snippets(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      term: String,
      width: Int
  ): DataFrame = {
    require(width >= 0, s"need width >= 0, got $width")
    val toks = graft.functions.TextFunctions.ftsTokens(col(textCol))
    docs
      .select(col(idCol).as("id"), toks.as("_toks"))
      .withColumn("pos", array_position(col("_toks"), term))
      .where(col("pos") > 0)
      .withColumn("_start", greatest(col("pos") - width, lit(1L)))
      .select(
        col("id"),
        col("pos"),
        array_join(
          slice(col("_toks"), col("_start").cast("int"), (col("pos") + width - col("_start") + 1).cast("int")),
          " "
        ).as("snippet")
      )
  }
}
