package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.{TextFunctions, VectorFunctions}
import graft.operators._

/** Driver contract: one `queries` entry per implemented operator from
  * SURVEY.md §2 (+ the LLM-data-pipeline additions), with DuckDB-equivalent
  * `oracleSql` for everything SQL-expressible. Column names and value
  * semantics are kept byte-identical between the Spark plan and the oracle
  * SQL (decimal-exact aggregation, deterministic ordering, explicit casts).
  */
object SparkEntry {

  /** Read a bench table. Audited r18 and deliberately left WITHOUT a
    * spread-the-scan repartition: the sf corpora are single-row-group
    * parquet files (unsplittable, 1-task scans), and a round-robin
    * repartition to the session's parallelism was measured a NET LOSS on
    * 17 of 20 headline queries (median-of-3 in one session, e.g.
    * q_pricing_summary 0.55→1.29 s, q_dedup_exact 0.33→0.74 s) — warm
    * single-task leading stages are tens of ms at this scale, below the
    * cost of the added exchange; the alarming cold-run 1-task numbers
    * were Janino/JIT compilation billed to the first run, which an extra
    * exchange only makes worse. A real multi-file corpus scans wide
    * without any help.
    */
  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    s.read.parquet(s"$dir/$name.parquet")

  /** The fixed ANN probe vector (vec_id = 0), failing loudly if the
    * corpus lost it — one definition for every LSH/persisted-index
    * query (the three per-query copies had already drifted apart).
    */
  private def queryVec(emb: DataFrame, queryName: String, dir: String): Seq[Float] =
    emb.where(col("vec_id") === 0).select("embedding")
      .limit(1).collect().headOption
      .getOrElse(throw new IllegalStateException(
        s"$queryName: no embeddings row with vec_id=0 in $dir/embeddings.parquet — " +
          "the fixed query vector is gone"))
      .getSeq[Float](0)

  /** Per-process scratch path for a persisted-index lifecycle query,
    * deleted RECURSIVELY at JVM exit: the returned DataFrame still reads
    * the artifact lazily (deleting after the build would break the
    * query's own execution), but without cleanup every Verify/Bench
    * process leaks a full index directory in java.io.tmpdir (round-9
    * ADVICE). One shutdown hook per path; by exit all queries are done.
    */
  private def tmpIndexPath(prefix: String, dir: String): String = {
    val f = new java.io.File(
      sys.props("java.io.tmpdir"),
      prefix + "_" + Integer.toHexString(dir.hashCode) +
        "_p" + ProcessHandle.current().pid())
    Runtime.getRuntime.addShutdownHook(new Thread(() => {
      def rm(x: java.io.File): Unit = {
        val kids = x.listFiles()
        if (kids != null) kids.foreach(rm)
        x.delete(): Unit
      }
      rm(f)
    }))
    f.getAbsolutePath
  }

  /** events.parquet has shipped with two physical `ts` encodings across
    * driver generations: TIMESTAMP(NANOS) — which Spark's vectorized reader
    * only surfaces as a nanos long under `nanosAsLong` — and plain
    * timestamp[us] (read as TIMESTAMP_NTZ). Expose a derived `ts_us`
    * (microseconds since epoch) matching DuckDB's `epoch_us(ts)` for
    * either encoding. The NTZ branch derives the epoch TIMEZONE-
    * INDEPENDENTLY as `timestampdiff(MICROSECOND, NTZ epoch, ts)` —
    * pure field arithmetic between two naive timestamps, no
    * local-to-instant conversion anywhere — exactly DuckDB's `epoch_us`
    * over a naive timestamp. A caller-built session with ANY session
    * timezone gets identical epochs, and this helper never mutates the
    * caller's timezone conf (an earlier revision pinned
    * `spark.sql.session.timeZone = UTC` here, which silently shifted
    * the CALLER's own unrelated timestamp queries; and a
    * cast/to_utc_timestamp derivation is session-tz-dependent for NTZ
    * input — both rejected, tz-invariance spec-pinned under a non-UTC
    * session in EventsSchemaSpec).
    */
  private[graft] def events(s: SparkSession, dir: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = t(s, dir, "events")
    val tsUs = df.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType => expr("ts DIV 1000")
      case _ => expr("timestampdiff(MICROSECOND, TIMESTAMP_NTZ'1970-01-01 00:00:00', ts)")
    }
    df.withColumn("ts_us", tsUs)
  }

  // decimal-exact sum of a double column, emitted as double (identical in
  // Spark and DuckDB because decimal arithmetic is exact in both)
  private def dsum(c: Column, scale: Int = 2): Column =
    sum(c.cast(s"decimal(18,$scale)")).cast("double")

  /** Flagship: hybrid (RRF) retrieval over the sf0.001 documents corpus —
    * BM25 + embedding cosine fused, the reference's signature query
    * (src/retrieve/hybrid_retriever.py:57-90).
    */
  def entry(spark: SparkSession): DataFrame =
    queries("q_rrf_hybrid")(spark, "/root/testdata/sf0.001")

  // =====================================================================
  // Query implementations
  // =====================================================================

  /** TPC-H-Q1-style pricing summary: hash-agg with decimal-exact sums
    * (SURVEY §2.4 A1/A4). Partial aggregation map-side; one shuffle on the
    * 2x2 grouping key.
    */
  private def qPricingSummary(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .where(col("l_shipdate") <= lit("1998-09-01"))
      .groupBy("l_returnflag", "l_linestatus")
      .agg(
        dsum(col("l_quantity")).as("sum_qty"),
        dsum(col("l_extendedprice")).as("sum_base_price"),
        sum(
          col("l_extendedprice").cast("decimal(18,2)") *
            (lit(1).cast("decimal(18,2)") - col("l_discount").cast("decimal(18,2)"))
        ).cast("double").as("sum_disc_price"),
        count(lit(1)).as("count_order")
      )
      .orderBy("l_returnflag", "l_linestatus")

  /** Projection + range/value predicates, all pushed into the parquet scan
    * (SURVEY §2.2 F5/F6; §4 pushdown).
    */
  private def qFilterRange(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .where(
        col("l_shipdate") >= lit("1996-01-01") &&
          col("l_shipdate") < lit("1997-01-01") &&
          col("l_quantity") > 30
      )
      .select("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice")
      .orderBy("l_orderkey", "l_linenumber")

  /** 4-way star join, dimensions broadcast (SURVEY §2.3 J4 enrichment). */
  private def qJoinRevenueByRegion(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders")
      .join(t(s, dir, "customer"), col("o_custkey") === col("c_custkey"))
      .join(broadcast(t(s, dir, "nation")), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(t(s, dir, "region")), col("n_regionkey") === col("r_regionkey"))
      .groupBy("r_name")
      .agg(
        count(lit(1)).as("n_orders"),
        dsum(col("o_totalprice")).as("total_revenue")
      )
      .orderBy("r_name")

  /** Incremental-ingest anti-join: rows absent from the ledger
    * (reference change detection, src/pipeline.py:192-220; SURVEY §2.3 J1/J2).
    */
  private def qAntiJoin(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "customer")
      .join(
        t(s, dir, "orders").where(col("o_orderdate") >= lit("1998-01-01")),
        col("c_custkey") === col("o_custkey"),
        "left_anti"
      )
      .select("c_custkey", "c_name")
      .orderBy("c_custkey")

  /** Existence semi-join (SURVEY §2.3 J3). */
  private def qSemiJoin(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "customer")
      .join(
        t(s, dir, "orders").where(col("o_totalprice") > 400000),
        col("c_custkey") === col("o_custkey"),
        "left_semi"
      )
      .select("c_custkey", "c_acctbal")
      .orderBy("c_custkey")

  /** Top-k by score: plans as TakeOrderedAndProject — per-partition k-heaps,
    * no global sort (SURVEY §2.5 W3).
    */
  private def qTopkOrders(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders")
      .select("o_orderkey", "o_totalprice")
      .orderBy(desc("o_totalprice"), col("o_orderkey"))
      .limit(10)

  /** Per-group top-n via row_number window (SURVEY §2.5 W1/W2). */
  private def qWindowTopnPerCust(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("o_custkey").orderBy(desc("o_totalprice"), col("o_orderkey"))
    t(s, dir, "orders")
      .withColumn("rn", row_number().over(w).cast("long"))
      .where(col("rn") <= 3)
      .select("o_custkey", "o_orderkey", "o_totalprice", "rn")
      .orderBy("o_custkey", "rn")
  }

  /** Running cumulative sum window — the token-budget aggregation shape
    * (SURVEY §2.4 A5).
    */
  private def qRunningTotal(s: SparkSession, dir: String): DataFrame = {
    val w = Window
      .partitionBy("o_custkey")
      .orderBy(col("o_orderdate"), col("o_orderkey"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    t(s, dir, "orders")
      .where(col("o_custkey") < 100)
      .withColumn("cum_spend", sum(col("o_totalprice").cast("decimal(18,2)")).over(w).cast("double"))
      .select("o_custkey", "o_orderkey", "cum_spend")
      .orderBy("o_custkey", "o_orderkey")
  }

  /** DISTINCT (SURVEY §2.7). */
  private def qDistinctFlags(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .select("l_returnflag", "l_linestatus")
      .distinct()
      .orderBy("l_returnflag", "l_linestatus")

  /** UNION with dedup (SURVEY §2.7). */
  private def qUnionSegments(s: SparkSession, dir: String): DataFrame = {
    val c = t(s, dir, "customer")
    c.where(col("c_mktsegment") === "BUILDING")
      .select("c_custkey")
      .union(c.where(col("c_acctbal") > 9000).select("c_custkey"))
      .distinct()
      .orderBy("c_custkey")
  }

  /** Status histogram — the reference's stats endpoint
    * (src/pipeline.py:297-311; SURVEY §2.4 A1).
    */
  private def qStatusHistogram(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders")
      .groupBy("o_orderstatus")
      .agg(count(lit(1)).as("n"))
      .orderBy("o_orderstatus")

  /** Count-enrichment left join (document detail view, SURVEY §2.3 J4). */
  private def qCountEnrichment(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "customer")
      .join(t(s, dir, "orders"), col("c_custkey") === col("o_custkey"), "left")
      .groupBy("c_custkey")
      .agg(count(col("o_orderkey")).as("order_count"))
      .orderBy("c_custkey")

  /** Point lookup by key — parquet min/max pruned (SURVEY §2.2 F6). */
  private def qPointLookup(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .where(col("l_orderkey") === 1)
      .select("l_orderkey", "l_linenumber", "l_partkey", "l_quantity")
      .orderBy("l_linenumber")

  /** sha256/md5 content hashing (reference file-hash X1,
    * src/extract/pymupdf_extractor.py:25-31).
    */
  private def qScalarHash(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "customer")
      .select(
        col("c_custkey"),
        md5(col("c_name")).as("name_md5"),
        concat(lit("sha256:"), lower(sha2(col("c_name"), 256))).as("name_sha")
      )
      .orderBy("c_custkey")

  /** Title-from-filename regexp chain (X2,
    * src/extract/pymupdf_extractor.py:33-51) applied to part names.
    */
  private def qTitleClean(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "part")
      .select(
        col("p_partkey"),
        // explicit ws class: see TextFunctions.Ws (Java \s vs RE2 \s)
        trim(
          regexp_replace(
            regexp_replace(
              regexp_replace(col("p_name"),
                s"^[A-Z]{2,3}\\d{2,4}${TextFunctions.Ws}*", ""),
              s"[_${TextFunctions.WsChars}]?\\d{6}$$",
              ""
            ),
            s"[_${TextFunctions.WsChars}]?\\d{4}$$",
            ""
          )
        ).as("clean_title")
      )
      .orderBy("p_partkey")

  /** words*1.3 token estimate (X4, src/transform/chunker.py:124-126). */
  private def qTokenEstimate(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "documents")
      .select(
        col("doc_id"),
        floor(TextFunctions.wordCount(col("text")).cast("double") * 1.3)
          .cast("long")
          .as("token_est")
      )
      .orderBy("doc_id")

  /** The corpus token-accounting triple a training pipeline budgets
    * with, per doc in one scan: the GPT-2-style regex pre-tokenizer
    * count ([[TextFunctions.bpeTokenCount]]), the whitespace word count,
    * and the word-length subword heuristic
    * ([[TextAnalysis.bpeTokenEstimate]] — previously spec-only, now
    * oracle-checked). No shuffle before the output sort.
    */
  private def qTokenBpe(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "documents")
      .where(col("text").isNotNull)
      .select(
        col("doc_id"),
        TextFunctions.bpeTokenCount(col("text")).as("bpe_tokens"),
        TextFunctions.wordCount(col("text")).cast("long").as("ws_words"),
        TextAnalysis.bpeTokenEstimate(col("text")).cast("long").as("est_subword")
      )
      .orderBy("doc_id")

  /** Extraction-quality metric projection (F2,
    * src/extract/pymupdf_extractor.py:173-205) — page_count=1 per doc.
    */
  private def qQualityMetrics(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "documents")
      .select(
        col("doc_id"),
        length(col("text")).cast("long").as("chars"),
        TextFunctions.wordCount(col("text")).cast("long").as("words"),
        TextFunctions.avgWordLength(col("text")).as("avg_word_len"),
        TextFunctions.whitespaceRatio(col("text")).as("ws_ratio"),
        TextFunctions.nonAsciiRatio(col("text")).as("non_ascii_ratio")
      )
      .orderBy("doc_id")

  /** Quality-threshold routing CASE chain (F3,
    * src/extract/pymupdf_extractor.py:207-236), single-page semantics.
    */
  private def qQualityGate(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "documents")
      .select(
        col("doc_id"),
        coalesce(
          TextFunctions.qualityFallbackReason(col("text"), lit(1)),
          lit("ok")
        ).as("gate")
      )
      .orderBy("doc_id")

  /** LIKE-containment title filter (F4,
    * src/retrieve/hybrid_retriever.py:76-81) — parameterized, injection-proof.
    */
  private def qLikeFilter(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "documents")
      .where(col("text").contains("spark"))
      .select("doc_id", "source")
      .orderBy("doc_id")

  /** Date bucketing + formatting (X7). */
  private def qDateHistogram(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders")
      .groupBy(date_format(col("o_orderdate"), "yyyy-MM").as("month"))
      .agg(count(lit(1)).as("n_orders"), dsum(col("o_totalprice")).as("revenue"))
      .orderBy("month")

  /** JSON field extraction (X8 — the reference JSON-encodes metadata,
    * src/load/sqlite_store.py:358).
    */
  private def qJsonExtract(s: SparkSession, dir: String): DataFrame =
    events(s, dir)
      .select(col("event_type"), get_json_object(col("props"), "$.k").cast("long").as("k"))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"), sum("k").as("k_sum"))
      .orderBy("event_type")

  /** Multi-column sort + limit (O2: images by page, index). */
  private def qSortMulti(s: SparkSession, dir: String): DataFrame =
    events(s, dir)
      .select(col("user_id"), col("event_id"), col("ts_us"))
      .orderBy("user_id", "ts_us", "event_id")
      .limit(100)

  /** Tumbling-window event aggregation (streaming-shaped batch form;
    * SURVEY §2.11).
    */
  private def qEventTumbling(s: SparkSession, dir: String): DataFrame =
    events(s, dir)
      .groupBy(
        date_format(date_trunc("hour", timestamp_micros(col("ts_us"))), "yyyy-MM-dd HH:mm:ss")
          .as("window_start"),
        col("event_type")
      )
      .agg(count(lit(1)).as("n_events"), dsum(col("value"), 6).as("total_value"))
      .orderBy("window_start", "event_type")

  /** Sessionization: 30-min-gap sessions via lag + cumulative flag sum —
    * the batch twin of flatMapGroupsWithState sessionization.
    */
  private def qSessionize(s: SparkSession, dir: String): DataFrame = {
    val byUser = Window.partitionBy("user_id").orderBy(col("ts_us"), col("event_id"))
    val cum = byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    events(s, dir)
      .where(col("user_id") < 50)
      .select(col("user_id"), col("event_id"), col("ts_us"))
      .withColumn("prev_us", lag(col("ts_us"), 1).over(byUser))
      .withColumn(
        "is_new",
        when(col("prev_us").isNull || col("ts_us") - col("prev_us") > 1800L * 1000000L, 1L)
          .otherwise(0L)
      )
      .withColumn("session_id", sum("is_new").over(cum))
      .groupBy("user_id", "session_id")
      .agg(
        count(lit(1)).as("n_events"),
        min("ts_us").as("session_start_us"),
        max("ts_us").as("session_end_us")
      )
      .orderBy("user_id", "session_id")
  }

  /** Exact near-dup grouping on a normalized-prefix hash (dedup: exact;
    * prefix-30 so the synthetic corpus actually has collision groups).
    */
  private def qDedupExact(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "documents")
      .select(
        col("doc_id"),
        md5(substring(Dedup.normalized(col("text")), 1, 30)).as("text_hash")
      )
      .groupBy("text_hash")
      .agg(count(lit(1)).as("n_dups"), sort_array(collect_list(col("doc_id"))).as("ids_arr"))
      .where(col("n_dups") > 1)
      // ids as a comma-joined string: the driver's comparator sorts every
      // column, and array cells are unhashable there — string is portable.
      .select(
        col("text_hash"),
        col("n_dups"),
        array_join(transform(col("ids_arr"), x => x.cast("string")), ",").as("ids")
      )
      .orderBy("text_hash")

  /** Word-3-gram Jaccard near-dup pairs, gram-blocked (dedup: n-gram). */
  private def qNgramJaccard(s: SparkSession, dir: String): DataFrame =
    Dedup
      .ngramJaccardPairs(
        t(s, dir, "documents").where(col("doc_id") < 250),
        "doc_id",
        "text",
        n = 3,
        threshold = 0.2
      )
      .select(
        col("id_a"),
        col("id_b"),
        round(col("jaccard"), 6).as("jaccard")
      )
      .orderBy("id_a", "id_b")

  /** Language-ID heuristic over stopword hits (text analysis). */
  private def qLangId(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "documents")
      .select(col("doc_id"), TextAnalysis.langId(col("text")).as("pred_lang"), col("lang"))
      .orderBy("doc_id")

  /** Brute-force cosine top-k over the embeddings table (similarity
    * search baseline; Q1 vector search).
    */
  private def qAnnCosine(s: SparkSession, dir: String): DataFrame = {
    val emb = t(s, dir, "embeddings")
    val qv = emb.where(col("vec_id") === 0).select("embedding").head().getSeq[Float](0)
    emb
      .withColumn(
        "score",
        round(VectorFunctions.cosineSim(col("embedding"), typedlit(qv)), 6)
      )
      .select("vec_id", "score")
      .orderBy(desc("score"), col("vec_id"))
      .limit(20)
  }

  /** BM25 keyword search over documents (Q2/S7/A7/J7: inverted index +
    * postings join + score agg + top-k).
    */
  private def qBm25(s: SparkSession, dir: String): DataFrame = {
    val idx = FtsIndex.buildCached(s"$dir/documents", t(s, dir, "documents"), "doc_id", "text")
    // top-20 selected on the ROUNDED score (scoreAll, then round, then
    // truncate) exactly like the oracle's bm CTE — truncating on raw
    // scores first could disagree with the oracle at the rank-20 boundary
    // when two docs round to the same 6-decimal score
    FtsIndex
      .scoreAll(s, idx, "spark query data")
      .select(col("doc_id"), round(col("score"), 6).as("score"))
      .orderBy(desc("score"), col("doc_id"))
      .limit(20)
  }

  /** Hybrid RRF fusion of vector + BM25 rankings (Q3/W4 — the reference's
    * signature composite, plans/etl-pipeline-plan.md:1117-1129).
    */
  private def qRrfHybrid(s: SparkSession, dir: String): DataFrame = {
    val ann = qAnnCosine(s, dir).withColumnRenamed("vec_id", "id")
    val bm = qBm25(s, dir).withColumnRenamed("doc_id", "id")
    HybridSearch
      .rrf(ann, bm, "id", "score", k = 10)
      .select(
        col("id"),
        col("rank_vec").cast("long").as("rank_vec"),
        col("rank_kw").cast("long").as("rank_kw"),
        round(col("rrf_score"), 8).as("rrf_score")
      )
  }

  /** Token-budget context selection (Q6/A5): longest score-ordered prefix
    * of BM25 hits whose cumulative words*1.3 fits the budget.
    */
  private def qContextBudget(s: SparkSession, dir: String): DataFrame = {
    val hits = qBm25(s, dir)
      .join(t(s, dir, "documents").select("doc_id", "text"), "doc_id")
    ContextAssembly
      .selectWithinBudget(hits, "score", "doc_id", maxTokens = 500)
      .select(col("doc_id"), round(col("cum_tokens"), 4).as("cum_tokens"))
      .orderBy("doc_id")
  }

  /** Cascade-delete as anti-join rewrite (S10/J5,
    * src/pipeline.py:270-295): surviving row count after deleting a
    * document set.
    */
  private def qCascadeDelete(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .join(
        t(s, dir, "orders").where(col("o_orderstatus") === "F").select(col("o_orderkey")),
        col("l_orderkey") === col("o_orderkey"),
        "left_anti"
      )
      .agg(count(lit(1)).as("surviving_rows"))

  /** MinHash+LSH near-dup pairs with an md5-based (engine-portable) hash
    * family so the relational skeleton is oracle-checkable: shingle ->
    * 8 min-hashes -> 2 bands of 4 -> bucket join -> exact Jaccard verify.
    * (The library's fast path, Dedup.minhashLshPairs, uses xxhash64.)
    */
  private def qMinhashLsh(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents").where(col("doc_id") < 250)
    val withSh = docs
      .select(col("doc_id").as("id"), Dedup.shingles(col("text"), 3).as("sh"))
      .where(size(col("sh")) > 0)
    // pinned (r18): grams feed the signature aggregation AND both sides
    // of the exact-intersection broadcast self-join — three executions of
    // the interpreted (non-codegen) shingling pass without the pin
    val grams = graft.util.Checkpoints.pin(
      withSh.select(col("id"), size(col("sh")).as("n_sh"), explode(col("sh")).as("gram")))

    // 8 min-hashes as 8 aggregates of ONE groupBy(id) (r18): the explode
    // x8 + groupBy(id, seed) + pivot-to-columns groupBy(id) form computed
    // the identical h_i = min over grams of md5("i:" || gram) through TWO
    // shuffles and an 8x intermediate row blowup; this is the same value
    // per (id, i) with one shuffle and no blowup
    val sig = grams
      .groupBy("id")
      .agg(
        (0 until 8).map(i =>
          min(md5(concat(lit(s"$i:"), col("gram")))).as(s"h$i")).head,
        (0 until 8).map(i =>
          min(md5(concat(lit(s"$i:"), col("gram")))).as(s"h$i")).tail: _*
      )
    val bands = sig.select(
      col("id"),
      explode(
        array(
          struct(lit(0).as("b"), md5(concat_ws("|", col("h0"), col("h1"), col("h2"), col("h3"))).as("bh")),
          struct(lit(1).as("b"), md5(concat_ws("|", col("h4"), col("h5"), col("h6"), col("h7"))).as("bh"))
        )
      ).as("band")
    )
    val cand = bands
      .as("a")
      .join(bands.as("b"), col("a.band") === col("b.band") && col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"))
      .distinct()
    val inter = grams
      .as("ga")
      .join(grams.as("gb"), col("ga.gram") === col("gb.gram") && col("ga.id") < col("gb.id"))
      .groupBy(
        col("ga.id").as("id_a"),
        col("gb.id").as("id_b"),
        col("ga.n_sh").as("na"),
        col("gb.n_sh").as("nb")
      )
      .agg(count(lit(1)).as("inter"))
    cand
      .join(inter, Seq("id_a", "id_b"))
      .withColumn("jaccard", col("inter").cast("double") / ((col("na") + col("nb")) - col("inter")))
      .where(col("jaccard") >= 0.8)
      .select(col("id_a"), col("id_b"), round(col("jaccard"), 6).as("jaccard"))
      .orderBy("id_a", "id_b")
  }

  /** Hybrid chunker as a distributed flatMap over the documents corpus
    * (U4+U5; rows-only check — the splitter has no SQL equivalent).
    */
  private def qChunker(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    t(s, dir, "documents")
      .select(col("doc_id"), col("text"))
      // Chunker.chunk NPEs on null text; sibling queries filter the same
      .where(col("text").isNotNull)
      .as[(Long, String)]
      .flatMap { case (id, text) =>
        Chunker.chunk(text, ChunkingConfig(chunkSize = 256, chunkOverlap = 32)).map { c =>
          (id, c.chunkIndex, c.totalChunks, c.isSectionStart, c.tokenCount, c.text)
        }
      }
      .toDF("doc_id", "chunk_index", "total_chunks", "is_section_start", "token_count", "chunk_text")
      .orderBy("doc_id", "chunk_index")
  }

  /** Deterministic hashing embedder over chunk text (U6; rows-only). */
  private def qEmbedChunks(s: SparkSession, dir: String): DataFrame =
    Embedder
      .withEmbedding(t(s, dir, "documents").select("doc_id", "text"), "text", "embedding")
      .select(
        col("doc_id"),
        size(col("embedding")).as("dim"),
        round(VectorFunctions.cosineSim(col("embedding"), col("embedding")), 6).as("self_sim")
      )
      .orderBy("doc_id")

  /** SimHash-LSH approximate nearest neighbors (scale path of Q1;
    * rows-only — exercises signature bucketing + exact re-rank).
    */
  private def qAnnLsh(s: SparkSession, dir: String): DataFrame = {
    val emb = t(s, dir, "embeddings")
    val qv = queryVec(emb, "q_ann_lsh", dir).toArray
    val lsh = VectorSearch.SimHashLsh(nBits = 16, dim = qv.length)
    val indexed = lsh.withSignature(emb, "embedding")
    lsh
      .annTopK(indexed, "embedding", qv, 10, col("vec_id"), maxHamming = 8)
      .select(col("vec_id"), round(col("score"), 6).as("score"))
  }

  /** Portable hyperplanes for [[qLshFixed]]: component (j, i) derives
    * from md5("lsh:j:i") exactly like OracleSql.md5NibbleIntSql(_, 15) —
    * the first 15 hex nibbles as a 60-bit int — mapped into
    * [-1000, 1000]. 16 planes x 64 components, computed once driver-side.
    */
  private lazy val lshFixedPlanes: Seq[Seq[Long]] =
    (0 until 16).map { j =>
      (1 to 64).map { i =>
        val md = java.security.MessageDigest.getInstance("MD5")
        val hex = md.digest(s"lsh:$j:$i".getBytes("UTF-8"))
          .map("%02x".format(_)).mkString.substring(0, 15)
        (java.lang.Long.parseLong(hex, 16) % 2001L) - 1000L
      }
    }

  /** Hash-checked SimHash-LSH twin (the q_ivf_fixed recipe applied to the
    * last rows-only ANN entry): the same bucket-then-rerank plan shape as
    * [[qAnnLsh]], but the hyperplanes are PORTABLE integers
    * ([[lshFixedPlanes]]) and vectors quantize to floor(x*1000) ints, so
    * the 16-bit signature, the Hamming<=6 candidate filter, and the
    * exact-cosine rerank are all reproducible in DuckDB and the result
    * pins to a hash. q_ann_lsh keeps the production SplitMix planes
    * (recall behavior spec'd in VectorFunctionsSpec); THIS query pins the
    * bucket-then-rerank semantics.
    */
  private def qLshFixed(s: SparkSession, dir: String): DataFrame = {
    val emb = t(s, dir, "embeddings")
    val qv = queryVec(emb, "q_lsh_fixed", dir)
    // the 16x64 plane table spans exactly 64 components; a shorter vector
    // would zip-truncate driver-side while the Spark zip_with path nulls
    // the signature and the DuckDB twin NULL-skips — three silently
    // diverging answers. Fail loudly on dimension drift instead.
    require(qv.length == 64,
      s"q_lsh_fixed: expected 64-dim embeddings, got ${qv.length} — lshFixedPlanes span 64 components")
    val planesLit = typedlit(lshFixedPlanes)
    def quant(vec: Column): Column =
      transform(vec, x => floor(x.cast("double") * lit(1000.0)).cast("long"))
    // MSB-first fold: after visiting j = 15..0, bit_j carries weight 2^j
    def sigCol(vec: Column): Column =
      aggregate(
        sequence(lit(15), lit(0), lit(-1)),
        lit(0L),
        (acc, j) =>
          acc * 2 + when(
            aggregate(
              zip_with(quant(vec), element_at(planesLit, j + 1), (a, b) => a * b),
              lit(0L), (s2, v) => s2 + v) >= 0, lit(1L)).otherwise(lit(0L)))
    // the query's signature: the identical integer fold on the driver
    val qq = qv.map(x => math.floor(x.toDouble * 1000.0).toLong)
    val qSig = (15 to 0 by -1).foldLeft(0L) { (acc, j) =>
      val dot = lshFixedPlanes(j).iterator.zip(qq.iterator).map { case (p, v) => p * v }.sum
      acc * 2 + (if (dot >= 0) 1L else 0L)
    }
    emb
      .withColumn("sig", sigCol(col("embedding")))
      .where(bit_count(col("sig").bitwiseXOR(lit(qSig))) <= lit(6))
      .withColumn("score",
        round(VectorFunctions.cosineSim(col("embedding"), typedlit(qv)), 6))
      .select(col("vec_id"), col("sig"), col("score"))
      .orderBy(desc("score"), col("vec_id"))
      .limit(20)
  }

  /** Persisted-LSH index lifecycle (the writeIvf/loadIvf story for the
    * SimHash family, VERDICT r8 #8): build the signature index over the
    * 80% base corpus (vec_id % 5 != 0), WRITE it partitioned by signature
    * prefix, LOAD the artifact back, EXTEND it with the 20% batch under
    * the loaded planes, and answer an exact top-20 over the result. The
    * hash pins the LIFECYCLE: the partitioned-parquet roundtrip must
    * preserve every embedding bit, the extend must add exactly the batch
    * (same planes — nothing duplicates or drops), so exact search over
    * the reassembled corpus equals brute force over the table (the
    * q_ann_cosine oracle). The APPROXIMATE operating point — Hamming
    * radius + signature-prefix partition pruning via LshIndex.annTopK —
    * is pinned by IndexPersistenceSpec (result parity with a fresh-built
    * index + a PartitionFilters plan assertion) and the measured recall
    * contracts in VectorFunctionsSpec.
    */
  private def qLshPersisted(s: SparkSession, dir: String): DataFrame = {
    val emb = t(s, dir, "embeddings")
    val qv = queryVec(emb, "q_lsh_persisted", dir)
    val lsh = VectorSearch.SimHashLsh(nBits = 16, dim = qv.length)
    // per-PROCESS path: a shared fixed path races overwrite-vs-load when
    // two graft JVMs (e.g. the determinism gate's 8- and 16-thread
    // Verify runs) exercise the lifecycle for the same sf dir at once
    val path = tmpIndexPath("graft_lsh", dir)
    val base = VectorSearch.buildLshIndex(
      emb.where(pmod(col("vec_id"), lit(5)) =!= 0), "embedding", lsh)
    VectorSearch.writeLsh(base, path)
    val loaded = VectorSearch.loadLsh(s, path)
    val extended = VectorSearch.extendLsh(loaded, emb.where(pmod(col("vec_id"), lit(5)) === 0))
    extended.indexed
      .withColumn("score", round(VectorFunctions.cosineSim(col("embedding"), typedlit(qv)), 6))
      .select("vec_id", "score")
      .orderBy(desc("score"), col("vec_id"))
      .limit(20)
  }

  /** Banded multi-table LSH lifecycle (the q_lsh_persisted recipe for
    * the band-OR layout VectorSearch.scala names as the real 100 TB ANN
    * path): BUILD L=4 tables (6-bit bands) over the corpus, [[VectorSearch
    * .writeBandedLsh]] them partitioned by band, LOAD the artifact, run
    * the REAL probe (L single-partition legs + exact rerank — asserted
    * below), then answer an exact top-20 over the union-dedup
    * reassembly of all L persisted tables. The hash pins the LIFECYCLE:
    * every table's parquet roundtrip must preserve every embedding bit
    * and the id-dedup reassembly must recover exactly the corpus, so
    * the answer equals brute force (the q_ann_cosine oracle). The probe
    * run pins SIGNER RECONSTRUCTION loudly: the query vector IS
    * vec_id=0's embedding, so its persisted band (signed at BUILD time)
    * equals the probe band (signed by the LOADED bands) in every table
    * iff loadBandedLsh rebuilt the identical signers — any drift and
    * the self-match vanishes. The APPROXIMATE operating point — L
    * one-directory probe legs, recall tuned by L — is pinned by
    * IndexPersistenceSpec (fresh/loaded parity, per-leg
    * PartitionFilters, recall floor) and the q_banded_fixed hash twin.
    */
  private def qLshBanded(s: SparkSession, dir: String): DataFrame = {
    val emb = t(s, dir, "embeddings")
    val qv = queryVec(emb, "q_lsh_banded", dir)
    val path = tmpIndexPath("graft_blsh", dir)
    // 4 tables x 6-bit bands = 256 partition directories total — the
    // same write budget q_lsh_persisted bills (one 256-dir table). At
    // bench scale the partitioned write is pure per-directory commit
    // overhead (6x8-bit = 1536 dirs measured ~21 s at sf0.001, all
    // filesystem); the lifecycle being pinned is layout-parameter-
    // independent, and recall-vs-L operating points are measured
    // separately (SCALE.md / IndexPersistenceSpec).
    val built = VectorSearch.buildBandedLsh(
      emb, "vec_id", "embedding", dim = qv.length, numTables = 4, bandBits = 6)
    VectorSearch.writeBandedLsh(built, path)
    val loaded = VectorSearch.loadBandedLsh(s, path)
    // the real probe path: L single-partition legs + exact rerank. A
    // bounded point-check, not a result source — the query row matches
    // its own bucket in ALL L tables only under faithfully
    // reconstructed signers (score 1.0 tops the rerank).
    val self = loaded.annTopK(qv.toArray, 1, col("vec_id"))
      .select("vec_id").limit(1).collect()
    require(self.nonEmpty && self.head.getLong(0) == 0L,
      s"q_lsh_banded: probe of the loaded index lost the query row itself " +
        s"(got ${self.toSeq}) — loadBandedLsh reconstructed different signers")
    // score BEFORE the id-dedup (guide §2.3, project before the exchange):
    // the dedup previously shuffled 4 corpus copies of the embedding
    // payload; scoring map-side first shrinks the exchange to
    // (vec_id, score) — every copy of a vec_id is bit-identical across
    // tables (the roundtrip property this query pins), so every copy
    // scores identically and the kept row is value-identical either way.
    // All four tables are still read and scored — the reassembly check is
    // unchanged.
    loaded.combined
      .getOrElse(throw new IllegalStateException(
        "q_lsh_banded: loaded index carries no combined dataset"))
      .withColumn("score", round(VectorFunctions.cosineSim(col("embedding"), typedlit(qv)), 6))
      .select("vec_id", "score")
      .dropDuplicates("vec_id")
      .orderBy(desc("score"), col("vec_id"))
      .limit(20)
  }

  /** Portable hyperplanes for [[qBandedFixed]]: component (t, j, i)
    * derives from md5("blsh:t:j:i") exactly like
    * OracleSql.md5NibbleIntSql(_, 15) — the first 15 hex nibbles as a
    * 60-bit int — mapped into [-1000, 1000]. 4 tables x 8 planes x 64
    * components, computed once driver-side.
    */
  private lazy val bandedFixedPlanes: Seq[Seq[Seq[Long]]] =
    (0 until 4).map { tb =>
      (0 until 8).map { j =>
        (1 to 64).map { i =>
          val md = java.security.MessageDigest.getInstance("MD5")
          val hex = md.digest(s"blsh:$tb:$j:$i".getBytes("UTF-8"))
            .map("%02x".format(_)).mkString.substring(0, 15)
          (java.lang.Long.parseLong(hex, 16) % 2001L) - 1000L
        }
      }
    }

  /** Hash-checked band-OR twin (the q_lsh_fixed recipe applied to the
    * multi-table layout): 4 tables of 8-bit signatures over PORTABLE
    * integer planes ([[bandedFixedPlanes]]), vectors quantized to
    * floor(x*1000) ints, candidates = rows whose signature EXACTLY
    * matches the query's in >= 1 table (the band-OR union-dedup,
    * expressed as n_tabs > 0 so the multi-table collision count rides
    * in the hash), exact-cosine rerank. Everything is integer-exact and
    * reproducible in DuckDB, so the ENTIRE band-OR probe semantics —
    * per-table exact bucket match, cross-table OR, dedup, rerank — pins
    * to a hash. q_lsh_banded pins the persisted lifecycle with the
    * production SplitMix planes; THIS query pins the probe semantics.
    */
  private def qBandedFixed(s: SparkSession, dir: String): DataFrame = {
    val emb = t(s, dir, "embeddings")
    val qv = queryVec(emb, "q_banded_fixed", dir)
    require(qv.length == 64,
      s"q_banded_fixed: expected 64-dim embeddings, got ${qv.length} — bandedFixedPlanes span 64 components")
    val planesLit = typedlit(bandedFixedPlanes)
    // quantize ONCE per row; each of the 32 plane dots reuses it
    def quant(vec: Column): Column =
      transform(vec, x => floor(x.cast("double") * lit(1000.0)).cast("long"))
    // MSB-first fold over table tb's 8 planes: bit_j carries weight 2^j
    def sigCol(q: Column, tb: Int): Column =
      aggregate(
        sequence(lit(7), lit(0), lit(-1)),
        lit(0L),
        (acc, j) =>
          acc * 2 + when(
            aggregate(
              zip_with(q, element_at(element_at(planesLit, tb + 1), j + 1), (a, b) => a * b),
              lit(0L), (s2, v) => s2 + v) >= 0, lit(1L)).otherwise(lit(0L)))
    val qq = qv.map(x => math.floor(x.toDouble * 1000.0).toLong)
    val qSigs: Seq[Long] = (0 until 4).map { tb =>
      (7 to 0 by -1).foldLeft(0L) { (acc, j) =>
        val dot = bandedFixedPlanes(tb)(j).iterator.zip(qq.iterator).map { case (p, v) => p * v }.sum
        acc * 2 + (if (dot >= 0) 1L else 0L)
      }
    }
    emb
      .withColumn("_q", quant(col("embedding")))
      .withColumn("n_tabs",
        (0 until 4)
          .map(tb => when(sigCol(col("_q"), tb) === lit(qSigs(tb)), 1L).otherwise(0L))
          .reduce(_ + _))
      .where(col("n_tabs") > 0)
      .withColumn("score",
        round(VectorFunctions.cosineSim(col("embedding"), typedlit(qv)), 6))
      .select(col("vec_id"), col("n_tabs"), col("score"))
      .orderBy(desc("score"), col("vec_id"))
      .limit(20)
  }

  /** Exact phrase search via positional postings (FtsIndex
    * .phraseOccurrences): "hash join" as a consecutive token run, ranked
    * by occurrence count. Oracle counts token-array adjacency with the
    * identical tokenization.
    */
  private def qPhrase(s: SparkSession, dir: String): DataFrame =
    FtsIndex
      .phraseOccurrences(t(s, dir, "documents"), "doc_id", "text", Seq("hash", "join"))
      .select(col("id").as("doc_id"), col("n_hits"))
      .orderBy(desc("n_hits"), col("doc_id"))
      .limit(20)

  /** Ordered proximity search (FtsIndex.proximityOccurrences): "filter"
    * followed by "scan" within 5 tokens, ranked by qualifying pair
    * count. Oracle joins the two terms' unnested (doc, pos) postings
    * with the identical gap predicate.
    */
  private def qProximity(s: SparkSession, dir: String): DataFrame =
    FtsIndex
      .proximityOccurrences(t(s, dir, "documents"), "doc_id", "text", "filter", "scan", 5)
      .select(col("id").as("doc_id"), col("n_pairs"))
      .orderBy(desc("n_pairs"), col("doc_id"))
      .limit(20)

  /** DSIR-style importance scoring (ImportanceSampling): every document
    * scored by how target-like (lang='en' slice as the target corpus) its
    * hashed bigram distribution is, exact BIGINT ratio weights. Oracle
    * mirrors the 60-bit gram digests mod 4096 and the double floor
    * division bit-for-bit.
    */
  private def qDsir(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
    // target = the lang='en' slice -> one-pass slice weights (identical
    // output to the two-frame ratioWeights, half the gram-digest work)
    val w = graft.operators.ImportanceSampling
      .ratioWeightsSlice(docs, "text", col("lang") === "en", n = 2, buckets = 4096, scale = 10000L)
    graft.operators.ImportanceSampling
      .importanceScores(docs, "doc_id", "text", w, n = 2, buckets = 4096)
      .select(col("doc_id"), col("score"))
      .orderBy(desc("score"), col("doc_id"))
      .limit(20)
  }

  /** Seeded fixed-point k-means over the embeddings table (Clustering
    * .kmeansAssign): k=10 lowest-id seeds, 3 Lloyd's rounds, all-integer
    * arithmetic — assignments bit-identical to the oracle's unrolled
    * iterations.
    */
  private def qKmeans(s: SparkSession, dir: String): DataFrame =
    graft.operators.Clustering
      .kmeansAssign(t(s, dir, "embeddings"), "vec_id", "embedding", k = 10, iters = 3)
      .select(col("vec_id"), col("cluster"))
      .orderBy("vec_id")

  /** SemDeDup candidate pairs (Clustering.withinClusterNearDupPairs):
    * the shared 10-cluster k-means assignment blocks the pair space,
    * integer dots of normalized quantized vectors >= 0.35*1e8 qualify.
    * Oracle shares the unrolled k-means CTEs with q_kmeans.
    *
    * Bench-inventory cap (the q_embed_neardup precedent): fixed k with a
    * growing corpus makes the within-cluster pair stage quadratic, so
    * THIS query bounds its input to vec_id < 2000 (a pushed-down
    * predicate). The production contract is k ∝ n — SemDeDup's cluster
    * count scales with the corpus so per-cluster pair work stays flat.
    */
  private def qSemdedup(s: SparkSession, dir: String): DataFrame =
    graft.operators.Clustering
      .withinClusterNearDupPairs(
        t(s, dir, "embeddings").where(col("vec_id") < 2000),
        "vec_id", "embedding",
        k = 10, iters = 3, simFp = 35000000L)
      .orderBy("id_a", "id_b")

  /** Keyword-in-context snippets (FtsIndex.snippets): ±6 tokens around
    * the first "window" hit per document — the search-result display
    * string, computed in one narrow pass. Oracle slices the same token
    * array with list_position/list_slice.
    */
  private def qSnippet(s: SparkSession, dir: String): DataFrame =
    FtsIndex
      .snippets(t(s, dir, "documents"), "doc_id", "text", "window", 6)
      .select(col("id").as("doc_id"), col("pos"), col("snippet"))
      .orderBy("doc_id")
      .limit(50)

  /** α=1/2 temperature resampling over languages (Sampling
    * .temperatureSample): surviving allocation ∝ sqrt(n_s), smallest
    * language kept whole, exact-integer Bernoulli trials (the `source`
    * strata are exactly uniform in this corpus — lang is the skewed
    * mixture, en ≈ 3.4x fr). Oracle mirrors the squared-hash comparison
    * in HUGEINT.
    */
  private def qTemperature(s: SparkSession, dir: String): DataFrame =
    graft.operators.Sampling
      .temperatureSample(t(s, dir, "documents"), "lang", "doc_id")
      .select(col("doc_id"), col("lang"))
      .orderBy("doc_id")

  /** Deterministic uniform negative sampling (Sampling.negativePairs):
    * 2 contrastive negatives per anchor document, md5-arithmetic draws
    * over the distributed id-order rank. Oracle mirrors the rank, the
    * (id#j) hash, and the skip-self shift.
    */
  private def qNegatives(s: SparkSession, dir: String): DataFrame =
    graft.operators.Sampling
      .negativePairs(t(s, dir, "documents"), "doc_id", k = 2)
      .select(col("anchor"), col("j"), col("negative"))
      .orderBy("anchor", "j")

  /** SimHash near-dup pairs over documents (rows-only). */
  /** SimHash near-dup pairs over the PORTABLE md5-nibble signature (same
    * signature q_simhash_sig oracle-proved), banded into 13 nibble-groups
    * so pigeonhole recall is complete at maxHamming = 12 — the banded set
    * therefore EQUALS brute force and is exactly oracle-checkable. The
    * xxhash64 production path ([[Dedup.simhashPairs]]) keeps its own spec.
    */
  private def qSimhashPairs(s: SparkSession, dir: String): DataFrame =
    portableSimhashPairs(s, dir).orderBy("id_a", "id_b")

  /** Banded portable simhash pairs (shared by q_simhash_pairs and the
    * q_dedup_clusters edge set).
    */
  private def portableSimhashPairs(s: SparkSession, dir: String): DataFrame = {
    val maxHamming = 12
    val sigs = portableSimhashHex(s, dir).select(col("doc_id").as("id"), col("simhash_hex").as("sig"))
    // 13 bands over 16 nibbles: 3 bands of 2 nibbles + 10 of 1 (>= maxHamming+1)
    val bandRanges = Seq((1, 2), (3, 2), (5, 2)) ++ (7 to 16).map(k => (k, 1))
    val banded = sigs.select(
      col("id"),
      col("sig"),
      explode(array(bandRanges.zipWithIndex.map { case ((start, len), bi) =>
        concat(lit(s"$bi:"), substring(col("sig"), start, len))
      }: _*)).as("band")
    )
    def nib(side: String, k: Int) = s"(locate(substring(${side}_sig, $k, 1), '0123456789abcdef') - 1)"
    val hammingExpr = (1 to 16).map(k => s"bit_count(${nib("a", k)} ^ ${nib("b", k)})").mkString(" + ")
    banded.as("a")
      .join(banded.as("b"), col("a.band") === col("b.band") && col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
        col("a.sig").as("a_sig"), col("b.sig").as("b_sig"))
      .dropDuplicates("id_a", "id_b")
      .withColumn("hamming", expr(hammingExpr).cast("long"))
      .where(col("hamming") <= maxHamming)
      .select("id_a", "id_b", "hamming")
  }

  /** The shared cluster label table behind q_dedup_clusters and
    * q_near_dedup: pairs + the iterative CC build run ONCE per corpus and
    * are reused ([[graft.operators.Dedup.clustersCached]]) — the artifact
    * lifecycle a 100 TB pipeline uses (labels are an ingest-time product,
    * persisted via Dedup.writeClusters; queries reuse, never recompute).
    */
  private def portableClusterLabels(s: SparkSession, dir: String): DataFrame =
    graft.operators.Dedup.clustersCached(
      s"$dir/documents#portable-simhash-cc",
      t(s, dir, "documents").where(col("doc_id") < 250),
      "doc_id",
      portableSimhashPairs(s, dir)
    )

  /** Connected-components dedup clustering: transitive closure of the
    * portable near-dup pairs, every doc labeled with its cluster's min id
    * (min-label propagation; oracle: recursive-CTE reachability closure).
    */
  private def qDedupClusters(s: SparkSession, dir: String): DataFrame =
    portableClusterLabels(s, dir)
      .select(col("id").as("doc_id"), col("cluster"))
      .orderBy("doc_id")

  /** Rolling-hash document fingerprint — portable md5 variant, exactly
    * oracle-checked (the xxhash64 fast path keeps its spec coverage).
    */
  private def qFingerprint(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "documents")
      .where(col("text").isNotNull)
      .select(col("doc_id"), TextAnalysis.fingerprintPortable(col("text")).as("fp"))
      .orderBy("doc_id")

  /** IVF-ANN (k-means coarse quantizer, probe 4 of 16 cells, exact
    * re-rank) — rows-only check; the scale path of similarity search.
    */
  private def qAnnIvf(s: SparkSession, dir: String): DataFrame = {
    val emb = t(s, dir, "embeddings")
    val qv = emb.where(col("vec_id") === 0).head().getSeq[Float](1).toArray
    val ivf = VectorSearch.buildIvfCached(s"$dir/embeddings", emb, "embedding", nLists = 16)
    ivf
      .annTopK(qv, 10, col("vec_id"), nProbe = 4)
      .select(col("vec_id"), round(col("score"), 6).as("score"))
  }

  /** Hash-checked IVF twin (the q_mmr_fixed recipe, VERDICT r5 #4): the
    * same probe-then-rerank plan shape as [[qAnnIvf]], but the coarse
    * quantizer is the ORACLE-EXACT fixed-point Lloyd's fit
    * (Clustering.kmeansFit — the q_kmeans centroids) instead of MLlib's
    * k-means||, so every stage is reproducible in DuckDB: probe = 4 of
    * 10 cells nearest the quantized query (integer L2, ties to the lower
    * cell id), rerank = exact cosine within the probed cells rounded to
    * 6dp. q_ann_ivf keeps the MLlib production path (recall contract in
    * VectorFunctionsSpec); THIS query pins the IVF semantics to a hash.
    */
  private def qIvfFixed(s: SparkSession, dir: String): DataFrame = {
    val emb = t(s, dir, "embeddings")
    val qv = emb.where(col("vec_id") === 0).select("embedding").head().getSeq[Float](0)
    val model = Clustering.kmeansFit(emb, "vec_id", "embedding", k = 10, iters = 3)
    val probes = Clustering.nearestCentroids(model, qv, 4)
    Clustering.assignWith(model, emb, "embedding")
      .where(col("cluster").isin(probes: _*))
      .withColumn("score", round(VectorFunctions.cosineSim(col("embedding"), typedlit(qv)), 6))
      .select(col("vec_id"), col("cluster").as("cell"), col("score"))
      .orderBy(desc("score"), col("vec_id"))
      .limit(20)
  }

  /** Product quantization, seed codebook (iters = 0): subvectors of the
    * 16 lowest vec_ids ARE the per-subspace centroids, so the whole
    * encode + ADC pipeline ([[VectorSearch.pqEncode]]/[[VectorSearch
    * .pqSearch]]) is plain fixed-point algebra the oracle replays — this
    * query pins the PQ code/lookup semantics to a hash, the q_ivf_fixed
    * convention.
    */
  private def qPqFixed(s: SparkSession, dir: String): DataFrame =
    pqQuery(s, dir, iters = 0)

  /** Product quantization with ONE Lloyd's round per subspace
    * ([[VectorSearch.pqFit]] grouped-kmeans loop) — the TRAINED-codebook
    * path, still oracle-exact because the fit is the same fixed-point
    * floorDiv k-means the q_kmeans oracle unrolls, here partitioned by
    * subspace.
    */
  private def qPqTrained(s: SparkSession, dir: String): DataFrame =
    pqQuery(s, dir, iters = 1)

  private def pqQuery(s: SparkSession, dir: String, iters: Int): DataFrame = {
    val emb = t(s, dir, "embeddings")
    val model = VectorSearch.pqFit(emb, "vec_id", "embedding", nSub = 8, k = 16, iters = iters)
    val codes = VectorSearch.pqEncode(model, emb, "vec_id", "embedding")
    val qv = emb.where(col("vec_id") === 0).select("embedding").head().getSeq[Float](0)
    VectorSearch.pqSearch(model, codes, qv, 20).withColumnRenamed("id", "vec_id")
  }

  /** IVF-PQ — the canonical billion-vector index, oracle-exact: the
    * q_ivf_fixed coarse quantizer (fixed-point k-means, k=10, 3 rounds)
    * prunes to the 4 cells nearest the query, and the q_pq_trained
    * codebook scores ONLY those cells' members by ADC lookup — so a scan
    * reads nProbe/nLists of the partitions and 1/64th of the bytes
    * within them. Composition of [[Clustering.assignWith]] +
    * [[VectorSearch.pqEncode]] (cell rides keepCols) +
    * [[VectorSearch.pqSearch]] over the pre-filtered code table.
    */
  private def qIvfPq(s: SparkSession, dir: String): DataFrame = {
    val emb = t(s, dir, "embeddings")
    val km = Clustering.kmeansFit(emb, "vec_id", "embedding", k = 10, iters = 3)
    val pq = VectorSearch.pqFit(emb, "vec_id", "embedding", nSub = 8, k = 16, iters = 1)
    val qv = emb.where(col("vec_id") === 0).select("embedding").head().getSeq[Float](0)
    val probes = Clustering.nearestCentroids(km, qv, 4)
    val codes = VectorSearch.pqEncode(
      pq, Clustering.assignWith(km, emb, "embedding"), "vec_id", "embedding",
      keepCols = Seq("cluster"))
    VectorSearch
      .pqSearch(pq, codes.where(col("cluster").isin(probes: _*)), qv, 20)
      .withColumnRenamed("id", "vec_id")
  }

  /** Global duplicated-span removal (exact-substring dedup at 8-word
    * span granularity, [[Dedup.dedupSpansGlobal]]): only the corpus-wide
    * FIRST occurrence of every span survives; documents are stitched back
    * from their surviving spans.
    */
  private def qSpanDedup(s: SparkSession, dir: String): DataFrame =
    Dedup
      .dedupSpansGlobal(
        t(s, dir, "documents").where(col("text").isNotNull), "doc_id", "text", k = 8)
      .orderBy("doc_id")

  /** Top-50 vocabulary with cumulative corpus coverage
    * ([[TextAnalysis.vocabCoverage]] — the tokenizer-design histogram).
    * Rounding applies AFTER the rank ordering on both engines.
    */
  private def qVocabCoverage(s: SparkSession, dir: String): DataFrame =
    TextAnalysis
      .vocabCoverage(t(s, dir, "documents"), "text", k = 50)
      .select(col("rank"), col("word"), col("cnt"), round(col("cum_frac"), 6).as("cum_frac"))
      .orderBy("rank")

  /** Explicit GROUPING SETS aggregation — the general form behind
    * rollup/cube (SURVEY §2.4), exercising a set combination neither of
    * those specials covers: ((rf, ls), (ls), ()).
    */
  private def qGroupingSets(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .groupingSets(
        Seq(Seq(col("l_returnflag"), col("l_linestatus")), Seq(col("l_linestatus")), Seq.empty),
        col("l_returnflag"), col("l_linestatus")
      )
      .agg(count(lit(1)).as("n"), dsum(col("l_quantity")).as("sum_qty"))
      .orderBy(col("l_returnflag").asc_nulls_first, col("l_linestatus").asc_nulls_first)

  /** FULL OUTER join: per-nation high-balance customer and supplier
    * counts — each side sparse (top-of-range balance filters), so both
    * unmatched directions actually occur in the result.
    */
  private def qFullOuter(s: SparkSession, dir: String): DataFrame = {
    val cust = t(s, dir, "customer")
      .where(col("c_acctbal") > 9900)
      .groupBy(col("c_nationkey").as("nationkey"))
      .agg(count(lit(1)).as("n_cust"))
    val supp = t(s, dir, "supplier")
      .where(col("s_acctbal") > 9000)
      .groupBy(col("s_nationkey").as("nationkey"))
      .agg(count(lit(1)).as("n_supp"))
    cust.join(supp, Seq("nationkey"), "full_outer").orderBy("nationkey")
  }

  /** ROLLUP subtotal aggregation (free via Catalyst once the engine
    * exposes SQL — SURVEY §2.4 note on grouping sets).
    */
  private def qRollup(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .rollup("l_returnflag", "l_linestatus")
      .agg(count(lit(1)).as("n"), dsum(col("l_quantity")).as("sum_qty"))
      .orderBy(col("l_returnflag").asc_nulls_first, col("l_linestatus").asc_nulls_first)

  /** Embedding-cosine near-duplicate pairs, brute-force (exact, oracle-
    * checkable). The library's scale path is the LSH-blocked
    * [[VectorSearch.nearDuplicatePairs]] (q_embed_neardup_lsh); this
    * brute-force baseline exists to oracle-check it, so its input is
    * capped to a FIXED window (vec_id < 512) — the pair generator stays
    * O(1) in corpus size instead of quadratic (VERDICT r4 #3), and the
    * oracle twin applies the identical cap.
    */
  private def qEmbedNeardup(s: SparkSession, dir: String): DataFrame = {
    val emb = t(s, dir, "embeddings")
      .where(col("vec_id") < 512)
      .select(col("vec_id"), col("embedding"))
    val a = emb.select(col("vec_id").as("id_a"), col("embedding").as("ea"))
    val b = emb.select(col("vec_id").as("id_b"), col("embedding").as("eb"))
    a.join(b, col("id_a") < col("id_b"))
      .withColumn("score", VectorFunctions.cosineSim(col("ea"), col("eb")))
      .where(col("score") >= 0.45)
      .select(col("id_a"), col("id_b"), round(col("score"), 6).as("score"))
      .orderBy("id_a", "id_b")
  }

  /** LSH-blocked embedding near-dup with a PORTABLE signature, exactly
    * oracle-checkable: embeddings are integer-quantized (floor(x*1000) —
    * order-independent integer dots, so bucket signs can't drift on FP
    * association), hyperplane signs are a fixed ±1 literal matrix embedded
    * identically in the DuckDB twin ([[OracleSql.lshSigns]]), and the
    * banded candidate set + exact cosine re-rank replicate on both sides.
    * The production operator ([[VectorSearch.nearDuplicatePairs]]) keeps
    * its own spec coverage.
    */
  private def qEmbedNeardupLsh(s: SparkSession, dir: String): DataFrame = {
    // 8-bit bands: the synthetic corpus is ~10 tight clusters, so 4-bit
    // bands put whole clusters in one bucket (O(cluster^2) candidates);
    // requiring agreement on 8 consecutive signs keeps only genuinely
    // close pairs co-bucketed
    val nBits = 32; val nBands = 4; val bandSize = 8; val dim = 64
    val signs = OracleSql.lshSigns(nBits, dim)
    val emb = t(s, dir, "embeddings").select(col("vec_id"), col("embedding"))
    val iq = emb.withColumn(
      "iq",
      expr("transform(embedding, x -> cast(floor(cast(x as double) * 1000.0D) as bigint))")
    )
    // integer dot via zip_with+aggregate: order-independent (so exactly
    // portable) and a compact expression — a 32 x 64 flat term tree blows
    // up codegen/compile time far beyond the actual row work
    val bits = (0 until nBits).map { i =>
      // slice to dim first: zip_with null-pads the shorter side, so a
      // >dim-element vector would poison the dot to NULL (bit 0) and
      // diverge from the oracle, which reads exactly iq[1..dim]
      val dot = aggregate(
        zip_with(slice(col("iq"), 1, dim), typedLit(signs(i).map(_.toLong)), (x, sgn) => x * sgn),
        lit(0L),
        (acc, x) => acc + x
      )
      when(dot >= 0, lit(1)).otherwise(lit(0)).as(s"bit$i")
    }
    val sig = iq.select(col("vec_id") +: bits: _*)
    // band key = band_idx * 2^bandSize + band value (single int, join-friendly)
    val bandKeys = (0 until nBands).map { bi =>
      (0 until bandSize)
        .map(j => col(s"bit${bi * bandSize + j}") * lit(1 << j))
        .reduce(_ + _) + lit(bi * (1 << bandSize))
    }
    val banded = sig.select(col("vec_id"), explode(array(bandKeys: _*)).as("band_key"))
    val cands = banded.as("a")
      .join(banded.as("b"), col("a.band_key") === col("b.band_key") && col("a.vec_id") < col("b.vec_id"))
      .select(col("a.vec_id").as("id_a"), col("b.vec_id").as("id_b"))
      .dropDuplicates("id_a", "id_b")
    cands
      .join(emb.select(col("vec_id").as("id_a"), col("embedding").as("ea")), "id_a")
      .join(emb.select(col("vec_id").as("id_b"), col("embedding").as("eb")), "id_b")
      .withColumn("score", VectorFunctions.cosineSim(col("ea"), col("eb")))
      .where(col("score") >= 0.45)
      .select(col("id_a"), col("id_b"), round(col("score"), 6).as("score"))
      .orderBy("id_a", "id_b")
  }

  /** Filtered vector search: predicate pushed below the similarity
    * top-k — the reference's LanceDB "prefilter" semantics
    * (src/load/lancedb_store.py:148-150).
    */
  private def qAnnFiltered(s: SparkSession, dir: String): DataFrame = {
    val emb = t(s, dir, "embeddings")
    val qv = emb.where(col("vec_id") === 0).head().getSeq[Float](1).toArray
    VectorSearch
      .topK(emb, "embedding", qv, 10, col("vec_id"), prefilter = Some(col("label") < 5))
      .select(col("vec_id"), col("label"), round(col("score"), 6).as("score"))
  }

  /** Sliding event-time windows (1h length, 30min slide): each event lands
    * in two overlapping windows — the batch twin of
    * `window(ts, "1 hour", "30 minutes")`.
    */
  private def qEventSliding(s: SparkSession, dir: String): DataFrame =
    events(s, dir)
      .groupBy(
        date_format(
          window(timestamp_micros(col("ts_us")), "1 hour", "30 minutes")("start"),
          "yyyy-MM-dd HH:mm:ss"
        ).as("window_start"),
        col("event_type")
      )
      .agg(count(lit(1)).as("n_events"), dsum(col("value"), 6).as("total_value"))
      .orderBy("window_start", "event_type")

  /** Exact interpolated percentiles (median / p90) per group. */
  private def qPercentile(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .groupBy("l_returnflag")
      .agg(
        round(expr("percentile(l_quantity, 0.5)"), 6).as("median_qty"),
        round(expr("percentile(l_quantity, 0.9)"), 6).as("p90_qty"),
        round(expr("percentile(l_extendedprice, 0.5)"), 4).as("median_price")
      )
      .orderBy("l_returnflag")

  /** Correlated above-average filter: customers richer than their
    * nation's average balance (decorrelates to a join against a grouped
    * aggregate — Catalyst does this for free when exposed via SQL).
    */
  private def qAboveAvg(s: SparkSession, dir: String): DataFrame = {
    val c = t(s, dir, "customer")
    // membership gated on bal > avg, expressed as the cross-multiplied
    // DECIMAL comparison bal * n > sum: exact in both engines, where a
    // floating AVG's partial-aggregation summation order could flip a
    // borderline row between Spark and the sequential-summing oracle
    val avgByNation = c.groupBy(col("c_nationkey").as("nk"))
      .agg(
        sum(col("c_acctbal").cast("decimal(18,2)")).as("bal_sum"),
        count(lit(1)).as("n_cust")
      )
    c.join(broadcast(avgByNation), col("c_nationkey") === col("nk"))
      .where(col("c_acctbal").cast("decimal(18,2)") * col("n_cust") > col("bal_sum"))
      .select(col("c_custkey"), col("c_nationkey").cast("long").as("c_nationkey"))
      .orderBy("c_custkey")
  }

  /** Min/max aggregates over timestamps (as epoch micros). */
  private def qMinMaxDates(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .groupBy("l_returnflag")
      .agg(
        unix_micros(min(col("l_shipdate")).cast("timestamp")).as("first_ship_us"),
        unix_micros(max(col("l_shipdate")).cast("timestamp")).as("last_ship_us"),
        count(lit(1)).as("n")
      )
      .orderBy("l_returnflag")

  /** Grouped top-k via the native TopKBy aggregate (bounded heap per
    * group, no sort, <=k rows per group cross the shuffle) — the scale
    * path of W1's window formulation.
    */
  private def qTopkPerGroupAgg(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders")
      .groupBy("o_custkey")
      .agg(graft.plans.TopKBy.topKBy(col("o_totalprice"), col("o_orderkey"), 3).as("top"))
      .select(
        col("o_custkey"),
        expr("array_join(transform(top, x -> cast(x.id as string)), ',')").as("ids")
      )
      .orderBy("o_custkey")

  /** Fuzzy name matching by edit distance (text-analysis family: the
    * third dedup axis besides token sets and embeddings).
    */
  private def qFuzzyMatch(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "customer")
      .select(
        col("c_custkey"),
        levenshtein(col("c_name"), lit("Customer#000000100")).cast("long").as("edit_dist")
      )
      .where(col("edit_dist") <= 2)
      .orderBy("c_custkey")

  /** As-of join: each click enriched with the latest preceding purchase
    * per user (composition of built-ins — see operators/AsOfJoin; the
    * oracle uses DuckDB's native ASOF LEFT JOIN).
    */
  private def qAsofJoin(s: SparkSession, dir: String): DataFrame = {
    val e = events(s, dir).select(
      col("event_id"), col("user_id"), col("ts_us"), col("event_type"), col("value")
    )
    val clicks = e.where(col("event_type") === "click" && col("user_id") < 100)
      .select("event_id", "user_id", "ts_us")
    val purchases = e.where(col("event_type") === "purchase")
      .select("event_id", "user_id", "ts_us", "value")
    AsOfJoin
      .asofJoin(clicks, purchases, "user_id", "ts_us", Seq("event_id", "value"))
      .orderBy("event_id")
  }

  /** Batched multi-query ANN: top-3 neighbors for each of 5 query vectors
    * in ONE job (TopKBy bounded-heap aggregate — no sort, <=k rows per
    * query cross the shuffle).
    */
  private def qAnnBatch(s: SparkSession, dir: String): DataFrame = {
    val emb = t(s, dir, "embeddings")
    VectorSearch
      .topKBatch(emb.where(col("vec_id") < 5), emb, "vec_id", "embedding", "vec_id", "embedding", 3)
      .select(
        col("query_id"),
        expr("array_join(transform(top, x -> cast(x.id as string)), ',')").as("ids")
      )
      .orderBy("query_id")
  }

  /** Hard-negative mining (VectorSearch.hardNegatives): for anchors
    * vec_id < 5, the 3 most-cosine-similar vectors with a DIFFERENT
    * label — the contrastive-training "looks relevant but is not"
    * signal. Oracle ranks the label-excluded cross join.
    */
  private def qHardNegatives(s: SparkSession, dir: String): DataFrame = {
    val emb = t(s, dir, "embeddings")
    VectorSearch
      .hardNegatives(
        emb.where(col("vec_id") < 5), emb,
        "vec_id", "embedding", "label", "vec_id", "embedding", "label", 3)
      .select(
        col("anchor_id"),
        expr("array_join(transform(top, x -> cast(x.id as string)), ',')").as("ids")
      )
      .orderBy("anchor_id")
  }

  /** LLM corpus curation composite: language filter + quality gate +
    * exact dedup + token accounting in one declarative plan.
    */
  private def qCuration(s: SparkSession, dir: String): DataFrame =
    Curation
      .curate(t(s, dir, "documents"), "doc_id", "text",
        langs = Set("en", "de"), minQuality = 0.5)
      .select(col("doc_id"), col("pred_lang"), col("quality"), col("token_est"))
      .orderBy("doc_id")

  /** Curated-corpus accounting (docs + tokens kept per language). */
  private def qCurationStats(s: SparkSession, dir: String): DataFrame =
    Curation.stats(
      Curation.curate(t(s, dir, "documents"), "doc_id", "text",
        langs = Set("en", "de"), minQuality = 0.5)
    ).withColumn("total_tokens", col("total_tokens").cast("long"))

  /** ntile bucketing (quartiles by account balance). */
  private def qNtile(s: SparkSession, dir: String): DataFrame = {
    // Scale-safe global NTILE: an unpartitioned window funnels the whole
    // table through ONE task (the WindowExec warning). Two-pass
    // distributed rank instead: range-partition on the sort key, rank
    // within partitions, offset by the per-partition counts (a
    // #partitions-sized driver cumsum), then apply the NTILE bucket
    // formula to the global 0-based position. localCheckpoint pins the
    // range partitioning so the counts pass and the rank pass see the
    // exact same partitions.
    val nBuckets = 4L
    val parts = t(s, dir, "customer")
      .select("c_custkey", "c_acctbal")
      .repartitionByRange(8, desc("c_acctbal"), col("c_custkey"))
      .withColumn("_pid", spark_partition_id())
      .localCheckpoint()
    val counts = parts.groupBy("_pid").count().collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    val n = counts.values.sum
    val offsets = {
      var acc = 0L
      counts.keys.toSeq.sorted.map { pid =>
        val o = pid -> acc; acc += counts(pid); o
      }
    }
    val offsetDf = s.createDataFrame(offsets).toDF("_pid", "_offset")
    val localW = Window.partitionBy("_pid").orderBy(desc("c_acctbal"), col("c_custkey"))
    val base = n / nBuckets
    val rem = n % nBuckets
    val cut = rem * (base + 1) // first `rem` buckets carry base+1 rows
    parts
      .withColumn("_rn", row_number().over(localW))
      .join(broadcast(offsetDf), "_pid")
      .withColumn("_p", col("_offset") + col("_rn") - 1)
      .select(
        col("c_custkey"),
        when(col("_p") < cut, floor(col("_p") / (base + 1)) + 1)
          .otherwise(floor((col("_p") - cut) / math.max(base, 1L)) + rem + 1)
          .cast("long")
          .as("quartile")
      )
      .orderBy("c_custkey")
  }

  /** RANGE-frame window: per user, total event value within the trailing
    * 1-hour event-time range (value-range frame, not row frame).
    */
  private def qRangeFrame(s: SparkSession, dir: String): DataFrame = {
    val w = Window
      .partitionBy("user_id")
      .orderBy(col("ts_us"))
      .rangeBetween(-3600L * 1000000L, Window.currentRow)
    events(s, dir)
      .where(col("user_id") < 20)
      .select(
        col("user_id"), col("event_id"), col("ts_us"),
        sum(col("value").cast("decimal(18,6)")).over(w).cast("double").as("trailing_hour_value")
      )
      .orderBy("user_id", "ts_us", "event_id")
  }

  /** Portable 64-bit SimHash signature, oracle-checkable: token hash =
    * first 16 hex digits of md5; per-bit majority vote over tokens;
    * signature re-assembled as a 16-hex-digit string. Same construction
    * in DuckDB (the library's fast path, Dedup.simhash, uses xxhash64 —
    * this variant verifies the per-bit-vote relational skeleton exactly).
    */
  private def qSimhashSig(s: SparkSession, dir: String): DataFrame =
    portableSimhashHex(s, dir)

  /** Portable SimHash signature (md5-nibble majority vote, hex string) —
    * shared by q_simhash_sig and the q_simhash_pairs banding.
    */
  private def portableSimhashHex(s: SparkSession, dir: String): DataFrame = {
    // pre-aggregate to (doc, token, count): md5 hashes once per DISTINCT
    // token and the 64-column bit aggregate reads far fewer rows; the
    // per-bit sums weight by cnt — integer math identical to summing
    // per-occurrence (+/-1 per occurrence == +/-cnt per distinct token)
    val toks = t(s, dir, "documents")
      .where(col("doc_id") < 250)
      .select(col("doc_id"), explode(TextFunctions.ftsTokens(col("text"))).as("tok"))
      .groupBy("doc_id", "tok")
      .agg(count(lit(1)).as("cnt"))
      .withColumn("h", md5(col("tok")))
    // hex digit k (1..16) of the md5 as an int 0..15
    def digit(k: Int): String = s"(locate(substring(h, $k, 1), '0123456789abcdef') - 1)"
    // per-bit +/-1 contributions, summed per doc
    val bitSums = (0 until 64).map { b =>
      val bit = s"((${digit(b / 4 + 1)} div ${1 << (b % 4)}) % 2)"
      sum(expr(s"CASE WHEN $bit = 1 THEN cnt ELSE -cnt END")).as(s"b$b")
    }
    val summed = toks.groupBy("doc_id").agg(bitSums.head, bitSums.tail: _*)
    // reassemble 16 hex digits from 4-bit groups (bit value = sum > 0)
    val hexDigits = (0 until 16).map { nib =>
      val v = (0 until 4)
        .map(j => s"(CASE WHEN b${nib * 4 + j} > 0 THEN ${1 << j} ELSE 0 END)")
        .mkString(" + ")
      expr(s"substring('0123456789abcdef', ($v) + 1, 1)")
    }
    summed
      .select(col("doc_id"), concat(hexDigits: _*).as("simhash_hex"))
      .orderBy("doc_id")
  }

  /** Deterministic stratified corpus mixing (training-data op): keep 50%
    * of en, 30% of de, 10% of everything else, membership derived from a
    * portable md5 bucket of the doc id — reproducible across engines,
    * partitionings, and retries.
    */
  private def qStratifiedSample(s: SparkSession, dir: String): DataFrame =
    graft.operators.Sampling
      .stratifiedSample(t(s, dir, "documents"), "lang", "doc_id",
        Map("en" -> 0.5, "de" -> 0.3), fallback = 0.1)
      .select(col("doc_id"), col("lang"))
      .orderBy("doc_id")

  /** Sequence packing (training-data op): concat-then-chunk documents
    * into 2048-token training sequences per source, GPT-pretraining
    * style — per (source, sequence) doc count and token sum.
    */
  private def qSeqPack(s: SparkSession, dir: String): DataFrame =
    graft.operators.SequencePacking
      .assignSequences(
        t(s, dir, "documents")
          .select(col("doc_id"), col("source"),
            graft.functions.TextFunctions.tokenEstimate(col("text")).cast("long").as("tok")),
        "source", "doc_id", "tok", budget = 2048)
      .groupBy("source", "seq_index")
      .agg(count(lit(1)).as("n_docs"), sum("tok").as("seq_tokens"))
      .orderBy("source", "seq_index")

  /** Sequence packing by REAL trained-tokenizer counts
    * (SequencePacking.packGreedy over TextAnalysis.bpeEncode output):
    * train 3 BPE merges, encode every document from the artifact, then
    * strict-budget next-fit — the accounting a training pipeline
    * actually packs by, vs q_seq_pack's words×1.3 estimate. Run at the
    * one-range operating point (partitions = 1: a single deterministic
    * id-ordered fold — the oracle walks the identical recurrence with a
    * recursive CTE); the scale path is N range partitions with
    * per-range bins, pinned by SequencePackingSpec. The hash pins
    * training, encode AND the packing recurrence (a wrong token count
    * anywhere shifts every later bin boundary).
    */
  private def qSeqPackTok(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
    val tok = TextAnalysis.trainBpeTokenizer(docs, "text", rounds = 3)
    val counts = TextAnalysis.bpeEncode(tok, docs, "doc_id", "text")
    graft.operators.SequencePacking
      .packGreedy(counts, "doc_id", "n_tokens", budget = 2048, partitions = 1)
      .groupBy("bin_id")
      .agg(count(lit(1)).as("n_docs"), sum("tokens").as("bin_tokens"))
      .orderBy("bin_id")
  }

  /** C4-style blocklist gate (CorpusHygiene.blocklistHits) over the demo
    * term list: zero-shuffle scan-fused whole-word/phrase matching,
    * graded hit density plus the any-hit cut.
    */
  private def qBlocklist(s: SparkSession, dir: String): DataFrame =
    graft.operators.CorpusHygiene
      .blocklistHits(t(s, dir, "documents"), "doc_id", "text",
        graft.operators.CorpusHygiene.demoBlocklist)
      .orderBy("doc_id")

  /** PII scrub audit (corpus-hygiene op): per-doc hit counts for
    * email/phone/IP plus a digest of the scrubbed text (digest, not the
    * text, so the comparator diffs compactly).
    */
  private def qPiiScrub(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "documents")
      .select(
        col("doc_id"),
        graft.operators.CorpusHygiene.piiCounts(col("text")).as("pii"),
        md5(graft.operators.CorpusHygiene.scrubPii(col("text"))).as("clean_hash")
      )
      .select(
        col("doc_id"),
        col("pii.emails").cast("long").as("n_emails"),
        col("pii.phones").cast("long").as("n_phones"),
        col("pii.ips").cast("long").as("n_ips"),
        col("clean_hash")
      )
      .orderBy("doc_id")

  /** Gopher duplicate-line-fraction repetition signal per doc. */
  private def qGopherRepetition(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "documents")
      .select(
        col("doc_id"),
        round(graft.operators.CorpusHygiene.duplicateLineFraction(col("text")), 6).as("dup_line_frac")
      )
      .orderBy("doc_id")

  /** Portable integer hashing-trick vectorizer — oracle-checks the
    * EMBEDDER family's core semantics (tokenize -> bucket by hash -> ±1
    * sign accumulation) with md5-derived buckets both engines compute
    * identically. The production HashingEmbedder keeps its own specs (its
    * xxhash+float-normalize path isn't SQL-portable); q_embed_chunks
    * stays rows-only for that exact path.
    */
  private def qEmbedPortable(s: SparkSession, dir: String): DataFrame = {
    val dim = 16
    val toks = t(s, dir, "documents")
      .where(col("doc_id") < 250)
      .select(
        col("doc_id"),
        graft.functions.TextFunctions.bindOnce(
          TextFunctions.ftsTokens(col("text")),
          w =>
            concat(
              w,
              filter(
                // greatest(.., 1) not 0: sequence(1, 0) would generate a
                // DESCENDING [1, 0] and hit element_at(w, 0)
                transform(sequence(lit(1), greatest(size(w) - 1, lit(1))),
                  i => when(size(w) >= 2, concat_ws("_", element_at(w, i), element_at(w, (i + 1).cast("int"))))),
                x => x.isNotNull
              )
            )
        ).as("toks")
      )
      .select(col("doc_id"), explode(col("toks")).as("tok"))
      .withColumn("h", md5(col("tok")))
    // bucket = first-6-nibble value % dim; sign from nibble 7 (>= 8 -> -1)
    def nib(k: Int) = {
      val c = ascii(substring(col("h"), k, 1))
      when(c >= 97, c - 87).otherwise(c - 48)
    }
    val hashed = toks
      .withColumn("bucket", (1 to 6).map(k => nib(k) * lit(1 << ((6 - k) * 4))).reduce(_ + _) % dim)
      .withColumn("sgn", when(nib(7) >= 8, -1).otherwise(1))
    val sums = (0 until dim).map(b =>
      sum(when(col("bucket") === b, col("sgn")).otherwise(0)).as(s"v$b"))
    hashed
      .groupBy("doc_id")
      .agg(sums.head, sums.tail: _*)
      .select(
        col("doc_id"),
        concat_ws(",", (0 until dim).map(b => col(s"v$b").cast("string")): _*).as("vec")
      )
      .orderBy("doc_id")
  }

  /** Fixed-window character chunking with overlap — the SQL-expressible
    * member of the chunker family (U4/U5's recursive splitter keeps its
    * golden specs; this one is exactly oracle-checked): stride
    * size-overlap, chunk i = substr(text, 1 + i*stride, size).
    */
  private def qChunkFixed(s: SparkSession, dir: String): DataFrame = {
    val size = 256; val overlap = 32; val stride = size - overlap
    val chunks = graft.functions.TextFunctions.bindOnce(
      col("text"),
      t =>
        transform(
          sequence(lit(0), floor((greatest(length(t) - 1, lit(0))).cast("double") / stride).cast("long")),
          i => substring(t, (i * stride + 1).cast("int"), lit(size))
        )
    )
    t(s, dir, "documents")
      .where(col("text").isNotNull)
      .select(col("doc_id"), posexplode(chunks).as(Seq("chunk_index", "chunk")))
      .select(
        col("doc_id"),
        col("chunk_index").cast("long").as("chunk_index"),
        length(col("chunk")).cast("long").as("chunk_len"),
        md5(col("chunk")).as("chunk_hash")
      )
      .orderBy("doc_id", "chunk_index")
  }

  /** Gopher top-2-gram-fraction repetition signal per doc. */
  private def qTopNgramFrac(s: SparkSession, dir: String): DataFrame =
    graft.operators.CorpusHygiene
      .topNgramFraction(t(s, dir, "documents"), "doc_id", "text", n = 2)
      .select(col("id").as("doc_id"), round(col("top_ngram_frac"), 6).as("top_ngram_frac"))
      .orderBy("doc_id")

  /** Eval-set decontamination: corpus docs sharing any word 8-gram with
    * the held-out set (docs 0-4) — the pre-training contamination sweep.
    */
  private def qDecontaminate(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
    graft.operators.CorpusHygiene
      .contaminatedIds(docs, "doc_id", "text", docs.where(col("doc_id") < 5), "text", n = 8)
      .withColumnRenamed("id", "doc_id")
      .orderBy("doc_id")
  }

  /** Graded contamination scoring ([[CorpusHygiene.contaminationFraction]]):
    * per-doc fraction of distinct 8-gram shingles present in the eval
    * set — the threshold-curation signal next to the binary
    * q_decontaminate gate.
    */
  private def qContaminationFrac(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents").where(col("text").isNotNull)
    graft.operators.CorpusHygiene
      .contaminationFraction(docs, "doc_id", "text", docs.where(col("doc_id") < 5), "text", n = 8)
      .select(
        col("id").as("doc_id"),
        col("n_grams"),
        col("n_hits"),
        round(col("frac"), 6).as("frac"))
      .orderBy("doc_id")
  }

  /** Bloom-prefiltered decontamination (the big-eval-set scale path):
    * same contract and same oracle as q_decontaminate — the Bloom
    * prefilter + exact confirm join must change nothing but the plan.
    */
  private def qDecontaminateBloom(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
    graft.operators.CorpusHygiene
      .contaminatedIdsBloom(docs, "doc_id", "text", docs.where(col("doc_id") < 5), "text", n = 8)
      .withColumnRenamed("id", "doc_id")
      .orderBy("doc_id")
  }

  /** Deterministic train/val/test split histogram (80/10/10 by id hash). */
  private def qTrainSplit(s: SparkSession, dir: String): DataFrame =
    graft.operators.Sampling
      .withSplit(t(s, dir, "documents"), "doc_id")
      .groupBy("split")
      .agg(count(lit(1)).as("n"))
      .orderBy("split")

  /** Grid-blocked range join (SURVEY §2.3 extension): parts matched to
    * [lo, hi) price bands via [[RangeJoin.bandJoin]] — intervals exploded
    * to coarse cells, equi-join on the cell key + residual filter, no
    * nested loop. Scales to interval tables beyond broadcast size.
    */
  private def qRangeJoin(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val bands = Seq(
      (900.0, 925.0, "b1_low"),
      (925.0, 950.0, "b2_midlow"),
      (950.0, 975.0, "b3_midhigh"),
      (975.0, 1000.0, "b4_high")
    ).toDF("lo", "hi", "band")
    RangeJoin
      .bandJoin(t(s, dir, "part"), "p_retailprice", bands, "lo", "hi", cellWidth = 25.0)
      .groupBy("band")
      .agg(count(lit(1)).as("n_parts"), dsum(col("p_retailprice")).as("sum_price"))
      .orderBy("band")
  }

  /** Pivot (wide aggregation): per returnflag, count + quantity sum
    * pivoted by linestatus — Spark's `pivot` operator with explicit
    * values (no extra value-discovery job, scale-safe).
    */
  private def qPivot(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .groupBy("l_returnflag")
      .pivot("l_linestatus", Seq("F", "O"))
      .agg(count(lit(1)).as("cnt"), dsum(col("l_quantity")).as("qty"))
      .select(
        col("l_returnflag"),
        coalesce(col("F_cnt"), lit(0L)).as("cnt_f"),
        col("F_qty").as("qty_f"),
        coalesce(col("O_cnt"), lit(0L)).as("cnt_o"),
        col("O_qty").as("qty_o")
      )
      .orderBy("l_returnflag")

  /** CUBE over (returnflag, linestatus): all 2^2 grouping sets in one
    * pass (Spark expands the sets into a single shuffle). Rolled-up keys
    * surface as '(all)' so ordering is engine-independent.
    */
  private def qCube(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .cube("l_returnflag", "l_linestatus")
      .agg(count(lit(1)).as("n"), dsum(col("l_extendedprice")).as("sum_price"))
      .select(
        coalesce(col("l_returnflag"), lit("(all)")).as("returnflag"),
        coalesce(col("l_linestatus"), lit("(all)")).as("linestatus"),
        col("n"),
        col("sum_price")
      )
      .orderBy("returnflag", "linestatus")

  /** lag/lead deltas: per-customer order-price change vs previous and
    * next order (event-time diff pattern; decimal-exact subtraction).
    */
  private def qLagDelta(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    val price = col("o_totalprice").cast("decimal(18,2)")
    t(s, dir, "orders")
      .where(col("o_custkey") < 300)
      .select(
        col("o_custkey"),
        col("o_orderkey"),
        date_format(col("o_orderdate"), "yyyy-MM-dd").as("order_date"),
        (price - lag(price, 1).over(w)).cast("double").as("delta_prev"),
        (lead(price, 1).over(w) - price).cast("double").as("delta_next")
      )
      .orderBy("o_custkey", "o_orderkey")
  }

  /** KMV distinct-count sketch over lineitem part keys — fixed-size
    * (k longs) cardinality estimate, exactly oracle-checkable because the
    * whole sketch is portable md5 column algebra ([[Sketches]]).
    */
  private def qKmvDistinct(s: SparkSession, dir: String): DataFrame =
    Sketches.kmvDistinct(t(s, dir, "lineitem"), "l_partkey", k = 64)

  /** Salted hot-key aggregation: two-phase sum/count via
    * [[Skew.saltedSumCount]] — decimal-exact, so the result is
    * bit-identical to the direct groupBy the oracle runs.
    */
  private def qSkewAgg(s: SparkSession, dir: String): DataFrame =
    Skew
      .saltedSumCount(t(s, dir, "lineitem"), Seq("l_returnflag"), col("l_extendedprice"), salt = 16)
      .orderBy("l_returnflag")

  /** Weighted Bernoulli sampling: keep docs with probability
    * token_est/400 — importance-sampling long documents. Integer-exact
    * hash-vs-weight comparison ([[Sampling.weightedBernoulli]]), so the
    * oracle checks membership exactly.
    */
  private def qWeightedSample(s: SparkSession, dir: String): DataFrame =
    Sampling
      .weightedBernoulli(
        t(s, dir, "documents")
          .withColumn("tok", TextFunctions.tokenEstimate(col("text")).cast("long")),
        "doc_id",
        "tok",
        rateNum = 1,
        rateDen = 400
      )
      .select("doc_id", "tok")
      .orderBy("doc_id")

  /** Corpus collocations: top-20 bigrams by lift (PMI ordering without
    * the unportable log) with min count 5 ([[TextAnalysis.bigramLift]]).
    */
  private def qBigramLift(s: SparkSession, dir: String): DataFrame =
    TextAnalysis.bigramLift(t(s, dir, "documents"), "text", minCount = 5, k = 20)

  /** Interval-overlap self-join: pairs of orders whose 30-day windows
    * intersect ([[RangeJoin.overlapJoin]] — grid-blocked both sides,
    * duplicate pairs eliminated arithmetically via the first shared cell,
    * no dropDuplicates shuffle).
    */
  private def qOverlapJoin(s: SparkSession, dir: String): DataFrame = {
    val o = t(s, dir, "orders")
      .where(col("o_custkey") < 50)
      .select(
        col("o_orderkey"),
        datediff(to_date(col("o_orderdate")), lit("1970-01-01").cast("date")).cast("long").as("lo")
      )
      .withColumn("hi", col("lo") + 30)
    val a = o.select(col("o_orderkey").as("okey_a"), col("lo").as("lo_a"), col("hi").as("hi_a"))
    val b = o.select(col("o_orderkey").as("okey_b"), col("lo").as("lo_b"), col("hi").as("hi_b"))
    RangeJoin
      .overlapJoin(a, "lo_a", "hi_a", b, "lo_b", "hi_b", cellWidth = 30.0)
      .where(col("okey_a") < col("okey_b"))
      .select("okey_a", "okey_b", "lo_a", "lo_b")
      .orderBy("okey_a", "okey_b")
  }

  /** Near-dup dedup keepers: one canonical doc (min id) per transitive
    * simhash cluster — expressed over the SHARED label table
    * ([[Dedup.nearDedupFromClusters]]), so the query costs one anti-join
    * instead of re-paying q_dedup_clusters' pair detection + CC build.
    */
  private def qNearDedup(s: SparkSession, dir: String): DataFrame =
    Dedup
      .nearDedupFromClusters(
        t(s, dir, "documents").where(col("doc_id") < 250),
        "doc_id",
        portableClusterLabels(s, dir)
      )
      .select("doc_id")
      .orderBy("doc_id")

  /** Histogram quantile sketch over lineitem prices: p50/p90/p99 from a
    * 1000-bin fixed histogram ([[Sketches.histogramQuantile]] — the
    * sketch crossing the shuffle is <= 1000 rows regardless of input
    * size; error bounded by the bin width).
    */
  private def qHistQuantile(s: SparkSession, dir: String): DataFrame =
    Sketches.histogramQuantile(
      t(s, dir, "lineitem"),
      "l_extendedprice",
      lo = 0.0,
      hi = 100000.0,
      nBins = 1000,
      quantiles = Seq(0.5, 0.9, 0.99)
    )

  /** Per-group KMV distinct estimate: distinct part keys per returnflag
    * in one bounded-heap aggregation pass ([[Sketches.kmvDistinctBy]] —
    * the grouped `approx_count_distinct` shape, deterministic).
    */
  private def qKmvByGroup(s: SparkSession, dir: String): DataFrame =
    Sketches
      .kmvDistinctBy(t(s, dir, "lineitem"), Seq("l_returnflag"), "l_partkey", k = 64)
      .orderBy("l_returnflag")

  /** HyperLogLog distinct-count sketch over lineitem part keys — 2^7
    * registers, no distinct prepass (the scale edge over [[qKmvDistinct]]:
    * rows map straight to (register, rank) and MAX combines map-side).
    * Deterministic md5 register math, so the whole register table and the
    * one-division estimate are exactly oracle-checkable
    * ([[Sketches.hllDistinct]]).
    */
  private def qHllDistinct(s: SparkSession, dir: String): DataFrame =
    Sketches.hllDistinct(t(s, dir, "lineitem"), "l_partkey", p = 7)

  /** Per-group HLL: distinct part keys per returnflag in ONE corpus pass
    * ([[Sketches.hllDistinctBy]]) — the grouped cardinality shape where
    * HLL beats KMV at scale (KMV needs a corpus-sized distinct shuffle
    * first; HLL's shuffle is register-bounded per group).
    */
  private def qHllBy(s: SparkSession, dir: String): DataFrame =
    Sketches
      .hllDistinctBy(t(s, dir, "lineitem"), Seq("l_returnflag"), "l_partkey", p = 7)
      .orderBy("l_returnflag")

  /** Link-graph authority scoring: fixed-point PageRank
    * ([[GraphOps.pageRank]], 3 rounds, integer arithmetic) over the
    * bipartite customer↔supplier trade graph (both directions of every
    * distinct (customer, supplier) pair that shares an order line). Top-20
    * nodes by rank — the "domain authority" prior a web-scale curation
    * pipeline derives from its hyperlink graph.
    */
  private def qPageRank(s: SparkSession, dir: String): DataFrame = {
    GraphOps
      .pageRankOn(tradeGraph(s, dir), iters = 3)
      // restore the string node form BEFORE ordering: the rank tie-break
      // is on the "c<ck>"/"s<sk>" strings, exactly as the oracle orders
      .select(tradeNodeStr(col("node")).as("node"), col("rank"))
      .orderBy(desc("rank"), col("node"))
      .limit(20)
  }

  /** Per-document characteristic terms: TF-IDF top-3
    * ([[TextAnalysis.tfidfTopTerms]] — fixed-point integer scoring, one
    * corpus-size shuffle, 1-row broadcast total). The keyword-extraction
    * stage of a curation pipeline, oracle-exact.
    */
  private def qTfidf(s: SparkSession, dir: String): DataFrame =
    TextAnalysis
      .tfidfTopTerms(t(s, dir, "documents"), "doc_id", "text", k = 3)
      .orderBy("doc_id", "rn")

  /** Corpus-wide boilerplate coverage: per-doc fraction of 3-gram
    * positions covered by grams recurring in >= 5 distinct documents
    * ([[TextAnalysis.boilerplateCoverage]] — digest-keyed shuffles, the
    * C4-style repeated-span filter).
    */
  private def qBoilerplate(s: SparkSession, dir: String): DataFrame =
    TextAnalysis
      .boilerplateCoverage(t(s, dir, "documents"), "doc_id", "text", n = 3, minDocs = 5)
      .where(col("boiler_grams") > 0)
      .orderBy("doc_id")

  /** Source-overlap contamination matrix: pairwise 3-gram-shingle Jaccard
    * between every pair of document sources, estimated from per-source KMV
    * sketches ([[Sketches.kmvOverlap]] — k longs per source cross the
    * shuffle; the pairwise stage is sketch-sized).
    */
  private def qKmvOverlap(s: SparkSession, dir: String): DataFrame = {
    val grams = t(s, dir, "documents")
      .select(col("source"), explode(TextAnalysis.wordGrams(col("text"), 3)).as("gram"))
    Sketches.kmvOverlap(grams, "source", "gram", k = 64).orderBy("g_a", "g_b")
  }

  /** Calibrated quality gate: keep each language's top decile by word
    * count ([[CorpusHygiene.percentileGate]] — within-group percent_rank,
    * so low-metric languages are not systematically discarded the way an
    * absolute threshold would).
    */
  private def qQualityPercentile(s: SparkSession, dir: String): DataFrame =
    CorpusHygiene
      .percentileGate(
        t(s, dir, "documents")
          .select(col("doc_id"), col("lang"), TextFunctions.wordCount(col("text")).cast("long").as("wc")),
        byCol = "lang",
        valueCol = "wc",
        tieCol = "doc_id",
        minPct = 0.9
      )
      .orderBy("lang", "doc_id")

  /** Domain rebalancing: exactly 20 docs per source, picked by
    * deterministic hash order ([[Sampling.balanceStrata]] — exact target
    * counts, reproducible across engines/retries, unlike rate-based
    * Bernoulli which only hits targets in expectation).
    */
  private def qMixtureBalance(s: SparkSession, dir: String): DataFrame =
    Sampling
      .balanceStrata(t(s, dir, "documents"), "source", "doc_id", perStratum = 20)
      .select("doc_id", "source")
      .orderBy("source", "doc_id")

  /** Quality-aware dedup: each near-dup cluster keeps its highest-word-
    * count member ([[Dedup.clusterRepresentatives]] over the SHARED
    * persisted label table — one join + a cluster-bounded window, no pair
    * or CC recompute).
    */
  private def qClusterReps(s: SparkSession, dir: String): DataFrame =
    Dedup
      .clusterRepresentatives(
        t(s, dir, "documents")
          .where(col("doc_id") < 250)
          .select(col("doc_id"), TextFunctions.wordCount(col("text")).cast("long").as("wc")),
        "doc_id",
        portableClusterLabels(s, dir),
        scoreCol = "wc",
        n = 1
      )
      .select("doc_id", "cluster", "wc")
      .orderBy("doc_id")

  /** Incremental-processing delta: old snapshot = doc_id < 400, new
    * snapshot = doc_id >= 100 with a synthetic edit on [150, 200)
    * ([[Curation.snapshotDiff]] — digest-only full outer join; the work
    * list an incremental pipeline re-embeds / cascade-deletes).
    */
  private def qSnapshotDiff(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
    val oldSnap = docs.where(col("doc_id") < 400)
    val newSnap = docs
      .where(col("doc_id") >= 100)
      .withColumn(
        "text",
        when(col("doc_id") >= 150 && col("doc_id") < 200, concat(col("text"), lit(" edited v2")))
          .otherwise(col("text"))
      )
    Curation
      .snapshotDiff(oldSnap, newSnap, "doc_id", "text")
      .where(col("status") =!= "unchanged")
      .orderBy("id")
  }

  /** Diversity re-rank: MMR over the exact top-20 cosine candidates for
    * query vec 0, picking 10 ([[VectorSearch.mmrRerank]] — per-query
    * bounded greedy after candidate generation). Rows-only by design
    * (greedy float marginals have no portable SQL twin); the spec pins
    * the contract: rank 1 == the exact cosine top-1, near-dup candidates
    * demote below diverse ones, output partition-invariant.
    */
  private def qMmr(s: SparkSession, dir: String): DataFrame = {
    val emb = t(s, dir, "embeddings")
    val qv = emb.where(col("vec_id") === 0).select("embedding").head().getSeq[Float](0)
    val cands = emb
      .withColumn("score", VectorFunctions.cosineSim(col("embedding"), typedlit(qv)))
      .orderBy(desc("score"), col("vec_id"))
      .limit(20)
      .withColumn("qid", lit(0L))
    VectorSearch
      .mmrRerank(cands, "qid", "vec_id", "embedding", "score", k = 10, lambda = 0.7)
      .orderBy("mmr_rank")
  }

  /** Fixed-point MMR twin, exactly oracle-checkable (VERDICT r4 #6):
    * embeddings are normalized then integer-quantized
    * (floor(x/||x||*10000) — integer dots ~ cosine*1e8), the greedy loop
    * runs in scaled longs ([[VectorSearch.mmrRerankFixed]]), and the
    * DuckDB twin unrolls the same greedy argmax as chained CTEs with the
    * identical quantization (explicit left-associated double chains, the
    * LSH-twin technique). The float-path operator (q_mmr) keeps its
    * rows-only check; THIS query hash-checks the selection machinery.
    */
  private def qMmrFixed(s: SparkSession, dir: String): DataFrame = {
    val emb = t(s, dir, "embeddings")
    // sum of squares via left fold over double-cast elements — matches
    // the oracle's explicit e[1]*e[1] + ... + e[64]*e[64] chain exactly
    val ss = aggregate(
      transform(col("embedding"), x => x.cast("double") * x.cast("double")),
      lit(0.0), (a, b) => a + b)
    val iq = emb
      .withColumn("ss", ss)
      .where(col("ss") > 0)
      .withColumn("v", transform(col("embedding"),
        x => floor(x.cast("double") / sqrt(col("ss")) * lit(10000.0)).cast("long")))
      .select(col("vec_id"), col("v"))
    val qv = iq.where(col("vec_id") === 0).select(col("v").as("qv"))
    val scored = iq
      .crossJoin(broadcast(qv))
      .withColumn("score",
        aggregate(zip_with(col("v"), col("qv"), (a, b) => a * b), lit(0L), (a, b) => a + b))
      .select("vec_id", "v", "score")
    val cands = scored
      .orderBy(desc("score"), col("vec_id"))
      .limit(20)
      .withColumn("qid", lit(0L))
    VectorSearch.mmrRerankFixed(cands, "qid", "vec_id", "v", "score", k = 8)
      .select(col("id").as("vec_id"), col("mmr_rank"), col("mmr_score"))
      .orderBy("mmr_rank")
  }

  /** Ordered conversion funnel: view -> click (strictly after the first
    * view) -> purchase (strictly after that click), counted per user then
    * rolled up. Each step joins the previous step's (user, t) table —
    * user-cardinality, not event-cardinality — so the sequential
    * dependency costs two small joins, never a per-user event sort.
    */
  private def qFunnel(s: SparkSession, dir: String): DataFrame = {
    // one-scan funnel (r18): the three-stage groupBy+join chain scanned
    // events six times and shuffled per stage; the same per-user
    // t1/t2/t3 milestones stack as three window passes over ONE
    // hash(user_id) exchange (each pass reads the previous column — the
    // dependency the join chain expressed), and the three stage counts
    // reduce in ONE single-row aggregate over the per-user constants.
    // t_k is non-null exactly for the users stage k kept before.
    val w = Window.partitionBy("user_id")
    val e = events(s, dir).select("user_id", "event_type", "ts_us")
      .withColumn("t1",
        min(when(col("event_type") === "view", col("ts_us"))).over(w))
      .withColumn("t2",
        min(when(col("event_type") === "click" && col("ts_us") > col("t1"),
          col("ts_us"))).over(w))
      .withColumn("t3",
        min(when(col("event_type") === "purchase" && col("ts_us") > col("t2"),
          col("ts_us"))).over(w))
    // one representative row per user (reuses the window's partitioning),
    // then the three funnel counts in a single 1-row aggregate
    e.groupBy("user_id")
      .agg(max("t1").as("t1"), max("t2").as("t2"), max("t3").as("t3"))
      .agg(
        count(col("t1")).as("n_view"),
        count(col("t2")).as("n_view_click"),
        count(col("t3")).as("n_view_click_purchase"))
  }

  /** Retention cohorts: users bucketed by first-seen day, counted by
    * activity-day offset — the cohort triangle. Two aggregations: the
    * first-seen table is user-cardinality, then one (cohort, offset)
    * histogram; distinct (user, day) pairs first so multi-event days
    * count once.
    */
  private def qRetention(s: SparkSession, dir: String): DataFrame = {
    val e = events(s, dir)
      .select(col("user_id"), expr("ts_us div 86400000000").as("day"))
      .distinct()
    // examined r18 and deliberately KEPT as groupBy+join: the first-seen
    // table is user-cardinality and broadcasts, so the join is exchange-
    // free on the probe side; a per-user window min was measured SLOWER
    // (0.58 -> 1.14 s median) because it adds a full hash(user) exchange
    // + per-partition sort that the broadcast form never pays
    val first = e.groupBy("user_id").agg(min("day").as("cohort_day"))
    e.join(first, "user_id")
      .groupBy(col("cohort_day"), (col("day") - col("cohort_day")).as("day_offset"))
      .agg(count(lit(1)).as("n_users"))
      .where(col("day_offset") <= 7)
      .orderBy("cohort_day", "day_offset")
  }

  /** Padding-efficient batching: 8 length buckets x 16-doc batches over
    * token counts ([[SequencePacking.lengthBucketBatches]] — exact-rank
    * integer arithmetic, deterministic). Output is the per-batch padding
    * accounting (max-len * n - sum-len), the quantity the layout
    * minimizes.
    */
  private def qLengthBatches(s: SparkSession, dir: String): DataFrame =
    SequencePacking
      .lengthBucketBatches(
        t(s, dir, "documents")
          .select(col("doc_id"), TextFunctions.tokenEstimate(col("text")).cast("long").as("tokens")),
        "doc_id",
        "tokens",
        nBuckets = 8,
        batchSize = 16
      )
      .groupBy("bucket", "batch_id")
      .agg(
        count(lit(1)).as("n_docs"),
        max("tokens").as("max_tokens"),
        (max("tokens") * count(lit(1)) - sum("tokens")).as("padding_tokens")
      )
      .orderBy("bucket", "batch_id")

  /** Count-min frequency floor: build a 4x256 sketch over lineitem
    * supplier keys, then point-query suppliers 1-10
    * ([[Sketches.countMin]] / [[Sketches.countMinEstimate]] — fixed
    * `depth * width` counters regardless of corpus size, mergeable,
    * never undercounts; deterministic md5 row hashes make it
    * oracle-exact, unlike the native RNG-seeded aggregate).
    */
  private def qCountMin(s: SparkSession, dir: String): DataFrame = {
    val li = t(s, dir, "lineitem")
    val sketch = Sketches.countMin(li, "l_suppkey", width = 256, depth = 4)
    val keys = li.where(col("l_suppkey") <= 10).select(col("l_suppkey"))
    Sketches
      .countMinEstimate(sketch, keys, "l_suppkey", width = 256, depth = 4)
      .orderBy("key")
  }

  /** Grouped quantile sketch: p50/p95 of event value per event type from
    * a 500-bin histogram ([[Sketches.histogramQuantileBy]] — <= nBins
    * sketch rows per group cross the shuffle, windows run over the
    * sketch).
    */
  private def qHistQuantileBy(s: SparkSession, dir: String): DataFrame =
    Sketches
      .histogramQuantileBy(
        events(s, dir),
        Seq("event_type"),
        "value",
        lo = 0.0,
        hi = 500.0,
        nBins = 500,
        quantiles = Seq(0.5, 0.95)
      )
      .orderBy("event_type", "q")

  /** The customer↔supplier trade graph as a cached prepared artifact
    * (GraphOps.prepareCached — built once per table dir, checkpointed
    * with degrees and nodes); only the iterative ranking bills per query.
    * Dedup on the raw INT key pair (cheap shuffle), then mint the string
    * node ids; the c- and s-prefixed namespaces are disjoint and the pair
    * set is already unique, so the union is distinct by construction and
    * prepare can skip its own corpus-wide DISTINCT.
    */
  private def tradeGraph(s: SparkSession, dir: String): GraphOps.PreparedGraph =
    GraphOps.prepareCached(s"$dir/trade-graph", {
      // LONG node ids (r18): customers on the even line (2*ck), suppliers
      // on the odd (2*sk+1) — the same disjoint namespaces the old
      // "c"/"s" string prefixes encoded, but every per-round join and the
      // contribution shuffle now hash/compare 8-byte longs instead of
      // variable-length strings. [[tradeNodeStr]] restores the exact
      // original string form at the query edge (before any ordering), so
      // ranks AND output rows are bit-identical to the string-keyed form.
      val pairs = t(s, dir, "orders")
        .join(t(s, dir, "lineitem"), col("o_orderkey") === col("l_orderkey"))
        .select(col("o_custkey").as("ck"), col("l_suppkey").as("sk"))
        .distinct()
        .select(
          (col("ck").cast("long") * 2L).as("c"),
          (col("sk").cast("long") * 2L + 1L).as("sup")
        )
      pairs
        .select(col("c").as("src"), col("sup").as("dst"))
        .unionByName(pairs.select(col("sup").as("src"), col("c").as("dst")))
    }, "src", "dst", edgesAreDistinct = true)

  /** Inverse of [[tradeGraph]]'s long encoding: the exact "c<ck>" /
    * "s<sk>" strings the graph queries emit (and tie-break on).
    */
  private def tradeNodeStr(node: Column): Column =
    concat(
      when(pmod(node, lit(2L)) === 0L, lit("c")).otherwise(lit("s")),
      shiftright(node, 1).cast("string"))

  /** Personalized PageRank: rank mass seeded ONLY at nation-1 customers,
    * so scores measure trade-graph proximity to that trusted set
    * ([[GraphOps.pageRankOn]] with seeds — the "related to this set"
    * retrieval prior; reuses the same cached prepared graph as
    * q_pagerank).
    */
  private def qPprSeeded(s: SparkSession, dir: String): DataFrame = {
    val graph = tradeGraph(s, dir)
    val seeds = t(s, dir, "customer")
      .where(col("c_nationkey") === 1)
      .select((col("c_custkey").cast("long") * 2L).as("node"))
    GraphOps
      .pageRankOn(graph, iters = 3, seeds = Some(seeds))
      .where(col("rank") > 0)
      // string node form BEFORE ordering (the qPageRank rationale)
      .select(tradeNodeStr(col("node")).as("node"), col("rank"))
      .orderBy(desc("rank"), col("node"))
      .limit(20)
  }

  /** Deterministic training-order shuffle + shard assignment
    * (TrainingOrder): md5-keyed permutation, exact distributed rank,
    * round-robin shards.
    */
  private def qTrainOrder(s: SparkSession, dir: String): DataFrame =
    TrainingOrder.shuffled(
      t(s, dir, "documents").select("doc_id"), "doc_id", "r5", 4)
      .select(col("doc_id"), col("pos"), col("shard"))
      .orderBy("pos")

  /** Z-order (Morton) clustering key for 2-D scan locality (Layout):
    * bit-spread ladder as plain BIGINT column algebra.
    */
  private def qZorder(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders")
      .select(
        col("o_orderkey"),
        Layout.zorder2(col("o_custkey"), col("o_orderkey")).as("zval"))
      .orderBy("zval", "o_orderkey")
      .limit(50)

  /** Integer-exact unigram surprisal quality score (TextAnalysis) — the
    * whole-bit analog of the CCNet perplexity filter.
    */
  private def qUnigramSurprisal(s: SparkSession, dir: String): DataFrame =
    TextAnalysis.unigramSurprisal(t(s, dir, "documents"), "doc_id", "text")
      .orderBy("doc_id")

  /** Bigram stupid-backoff LM score (TextAnalysis.bigramLmScore): LM
    * trained on the even-doc_id half, all docs scored against it — odd
    * docs exercise real backoff/OOV paths, the whole-bit analog of
    * scoring a crawl against a trusted-corpus perplexity filter.
    */
  private def qBigramLm(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
    TextAnalysis
      .bigramLmScore(docs, "doc_id", "text",
        docs.where(col("doc_id") % 2 === 0))
      .orderBy("doc_id")
  }

  /** CCNet head/middle/tail perplexity split, end-to-end: bigram-LM
    * scores (LM = even half) bucketed into thirds of the corpus-wide
    * score order via the two-pass distributed rank (TextAnalysis
    * .lmBuckets — never an unpartitioned window).
    */
  private def qLmBuckets(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
    val scored = TextAnalysis
      .bigramLmScore(docs, "doc_id", "text",
        docs.where(col("doc_id") % 2 === 0))
      .select("doc_id", "mean_lm_fp")
    TextAnalysis.lmBuckets(scored, "mean_lm_fp", "doc_id", 3)
      .withColumn("tier",
        when(col("bucket") === 0, "head")
          .when(col("bucket") === 1, "middle")
          .otherwise("tail"))
      .orderBy("doc_id")
  }

  /** Incremental near-dup: new batch (doc_id in [150, 300)) against the
    * persisted signature index of the existing corpus (doc_id < 150) —
    * signature-agreement Jaccard estimate, no old-text access.
    */
  private def qIncrementalLsh(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents").where(col("doc_id") < 300)
    val index = Dedup.minhashSignaturePortable(
      docs.where(col("doc_id") < 150), "doc_id", "text")
    val batch = Dedup.minhashSignaturePortable(
      docs.where(col("doc_id") >= 150), "doc_id", "text")
    Dedup.incrementalSigPairs(index, batch, bandSize = 4, minEst = 0.5)
      .orderBy("id_a", "id_b")
  }

  /** SQ8 storage quantization + exact-integer dot-product search
    * (VectorSearch.quantizeInt8/topKInt8): the 4x bandwidth cut for a
    * 100 TB vector corpus, scored engine-portably in integers.
    */
  private def qSq8Ann(s: SparkSession, dir: String): DataFrame = {
    val q = VectorSearch.quantizeInt8(t(s, dir, "embeddings"), "vec_id", "embedding")
    val q0 = q.where(col("id") === 0).select("qvec", "mx").head()
    VectorSearch.topKInt8(q, q0.getSeq[Long](0), q0.getDouble(1), 20)
      .withColumnRenamed("id", "vec_id")
  }

  /** Matryoshka truncated-dimension retrieval: cosine top-k over the
    * first 16 of 64 dims (VectorSearch.matryoshkaTopK semantics, with the
    * qAnnCosine round-then-order idiom for oracle determinism).
    */
  private def qMrl(s: SparkSession, dir: String): DataFrame = {
    val emb = t(s, dir, "embeddings")
    val qv = emb.where(col("vec_id") === 0).select("embedding").head().getSeq[Float](0)
    emb
      .withColumn("score",
        round(VectorFunctions.cosineSim(
          slice(col("embedding"), 1, 16), typedlit(qv.take(16))), 6))
      .select("vec_id", "score")
      .orderBy(desc("score"), col("vec_id"))
      .limit(20)
  }

  /** Mixture-epoch materialization (Sampling.epochRepeat): src0 x2.4,
    * src1 x0.5, src2 dropped, everything else x1.0 — integer-exact
    * fractional-copy Bernoulli per id.
    */
  private def qEpochs(s: SparkSession, dir: String): DataFrame =
    Sampling.epochRepeat(
      t(s, dir, "documents").select("doc_id", "source"),
      "doc_id", "source",
      Map("src0" -> 2400L, "src1" -> 500L, "src2" -> 0L))
      .select("doc_id", "source", "epoch")
      .orderBy("doc_id", "epoch")

  /** Degree-ordered triangle enumeration (GraphOps.triangles) over the
    * customer co-purchase graph (>= 3 shared parts) — community structure
    * in the transaction graph, the clustering-coefficient precursor.
    *
    * Skew guard (VERDICT r5 #1): a hot part bought by k customers emits
    * k²/2 pairs inside ONE join key — per-key-quadratic, the
    * executor-OOM shape under a viral part at 100x scale. The projection
    * keeps at most 16 customers per part, selected by deterministic hash
    * rank (standard co-occurrence practice), so per-key pair output is
    * bounded by a constant (<= 120 pairs/part) at ANY corpus size; the
    * cap is mirrored exactly in the DuckDB twin.
    */
  private def qTriangles(s: SparkSession, dir: String): DataFrame = {
    val cp = t(s, dir, "orders")
      .join(t(s, dir, "lineitem"), col("o_orderkey") === col("l_orderkey"))
      .select(col("o_custkey").as("c"), col("l_partkey").as("p"))
      .distinct()
    val byHash = Window.partitionBy("p")
      .orderBy(Sketches.md5Hash32(col("c")), col("c"))
    val capped = cp
      .withColumn("_deg_r", row_number().over(byHash))
      .where(col("_deg_r") <= 16)
      .drop("_deg_r")
    val edges = capped.as("a")
      .join(capped.as("b"), col("a.p") === col("b.p") && col("a.c") < col("b.c"))
      .groupBy(col("a.c").as("u"), col("b.c").as("v"))
      .agg(count(lit(1)).as("shared"))
      .where(col("shared") >= 3)
      .select("u", "v")
    // edges are one row per u < v pair by construction (groupBy output),
    // so triangles can skip its normalization DISTINCT (r18)
    GraphOps.triangles(edges, "u", "v", edgesAreDistinct = true)
      .orderBy("n1", "n2", "n3").limit(1000)
  }

  /** Zero-filled hourly resample of the event stream
    * (TimeSeries.gapFillCounts): every bin in the observed span present.
    */
  private def qGapFill(s: SparkSession, dir: String): DataFrame =
    TimeSeries.gapFillCounts(events(s, dir), "ts_us", 3600000000L)
      .orderBy("bin_start_us")

  /** Event-type transition matrix (TimeSeries.transitionCounts): Markov
    * bigram counts of "what follows what" per user, corpus-aggregated.
    */
  private def qTransitions(s: SparkSession, dir: String): DataFrame =
    TimeSeries.transitionCounts(
      events(s, dir), "user_id", Seq(col("ts_us"), col("event_id")), "event_type")
      .orderBy("from_type", "to_type")

  /** Retrieval-quality evaluation harness (RetrievalEval.summary): the
    * Matryoshka 16-of-64-dim prefix index retrieves top-10 per query
    * (vec_id < 20, self excluded, TopKBy heaps — no global sort) and is
    * scored against the full-dimension nearest neighbor as ground truth:
    * recall@10 / success@10 / MRR@10 of the 4x-cheaper coarse index.
    * Integer-exact aggregates (lcm(1..10)-scaled reciprocal ranks),
    * three final divisions — the distributed eval loop a 100 TB
    * retrieval deployment runs over millions of labeled queries.
    * Ranking rounds cosine to 6dp with id tiebreak (the qMrl idiom) so
    * both engines rank identically at the precision boundary.
    */
  private def qRetrievalEval(s: SparkSession, dir: String): DataFrame = {
    val emb = t(s, dir, "embeddings")
    val queries = emb.where(col("vec_id") < 20)
      .select(col("vec_id").as("query_id"), col("embedding").as("qv"))
    val scored = t(s, dir, "embeddings")
      .select(col("vec_id").as("doc_id"), col("embedding").as("dv"))
      .crossJoin(broadcast(queries))
      .where(col("doc_id") =!= col("query_id"))
    val sys = scored
      .withColumn(
        "score",
        round(VectorFunctions.cosineSim(slice(col("dv"), 1, 16), slice(col("qv"), 1, 16)), 6))
      .groupBy("query_id")
      .agg(graft.plans.TopKBy.topKBy(col("score"), col("doc_id"), 10).as("top"))
      .select(col("query_id"), posexplode(col("top")))
      .select(col("query_id"), (col("pos") + 1).as("rank"), col("col.id").as("doc_id"))
    val truth = scored
      .withColumn("fscore", round(VectorFunctions.cosineSim(col("dv"), col("qv")), 6))
      .groupBy("query_id")
      .agg(graft.plans.TopKBy.topKBy(col("fscore"), col("doc_id"), 1).as("top"))
      .select(col("query_id"), col("top").getItem(0).getField("id").as("rel_id"))
    RetrievalEval.summary(sys, "query_id", "doc_id", "rank", truth, "query_id", "rel_id", 10)
  }

  /** Known-item BM25 eval end-to-end (FtsIndex.searchMany +
    * RetrievalEval.summary): each query is the first 6 tokens of a
    * document (doc_id < 30), the relevant answer is that document —
    * the standard known-item-search protocol. The whole loop — batch
    * tokenize, df-scored postings join, per-query heap ranking, metric
    * roll-up — is ONE distributed job; at 100 TB the same plan scores
    * millions of labeled queries against the corpus index.
    */
  private def qBm25Eval(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
    val idx = FtsIndex.buildCached(s"$dir/documents", docs, "doc_id", "text")
    val queries = docs.where(col("doc_id") < 30)
      .select(
        col("doc_id").as("query_id"),
        concat_ws(" ", slice(TextFunctions.ftsTokens(col("text")), 1, 6)).as("qtext"))
    val sys = FtsIndex.searchMany(queries, "query_id", "qtext", idx, 10)
    val qrels = queries.select(col("query_id"), col("query_id").as("rel_id"))
    RetrievalEval.summary(sys, "query_id", "doc_id", "rank", qrels, "query_id", "rel_id", 10)
  }

  /** Categorical drift monitor (DriftMonitor.categoricalDrift): event-type
    * mix of the first 15 days of 2024-01 vs the rest — per-category
    * counts, ppm proportions, TVD contributions, and chi-square
    * contributions x 1e9, all integer-exact. The per-batch ingest
    * guardrail ("does today's data look like yesterday's?").
    */
  private def qDrift(s: SparkSession, dir: String): DataFrame =
    DriftMonitor.categoricalDrift(
        events(s, dir).select(col("event_type"), col("ts_us")),
        "event_type",
        col("ts_us") < lit(1705363200000000L)) // 2024-01-16T00:00:00Z
      .orderBy("category")

  /** Numeric drift monitor (DriftMonitor.numericDrift): the events value
    * distribution over 20 fixed-width bins on [0, 600), first half-month
    * vs rest — the no-floating-point PSI/KS stand-in over exact bin
    * counts.
    */
  private def qDriftValue(s: SparkSession, dir: String): DataFrame =
    DriftMonitor.numericDrift(
        events(s, dir).select(col("value"), col("ts_us")),
        "value",
        col("ts_us") < lit(1705363200000000L),
        lo = 0.0, hi = 600.0, nBins = 20)
      .orderBy("bin")

  /** BPE merge-pair statistics (TextAnalysis.bpePairStats): top-20
    * adjacent character pairs by corpus frequency over the initial BPE
    * state — the distributed first iteration of tokenizer training.
    * Corpus-sized work is only the word histogram; pair generation runs
    * over the vocabulary.
    */
  private def qBpePairs(s: SparkSession, dir: String): DataFrame =
    TextAnalysis.bpePairStats(t(s, dir, "documents"), "text", 20)

  /** Iterated BPE tokenizer training (TextAnalysis.bpeMerges): 4 full
    * merge rounds — per-round weighted pair argmax + left-to-right
    * greedy re-segmentation of the vocabulary. Each row's count depends
    * on all previous merges, so the hash pins the whole loop (the
    * PageRank/k-means unrolled-oracle recipe applied to tokenizer
    * training). Corpus touched once; rounds run vocabulary-sized.
    */
  private def qBpeMerges(s: SparkSession, dir: String): DataFrame =
    TextAnalysis.bpeMerges(t(s, dir, "documents"), "text", rounds = 4)

  /** BPE encode (TextAnalysis.bpeTokenCounts): per-doc token counts
    * under a 3-merge trained tokenizer — the APPLY half of tokenizer
    * training. The segmented vocabulary broadcasts against one exploded
    * corpus pass; the hash pins train AND apply (a wrong merge anywhere
    * shifts some document's n_tokens).
    */
  private def qBpeEncode(s: SparkSession, dir: String): DataFrame =
    TextAnalysis.bpeTokenCounts(t(s, dir, "documents"), "doc_id", "text", rounds = 3)
      .orderBy(desc("n_tokens"), col("doc_id"))
      .limit(20)

  /** WordPiece tokenizer training (TextAnalysis.wordPieceMerges): 4
    * merge rounds under the LIKELIHOOD argmax — count(ab) / (count(a) *
    * count(b)) — the BERT-family objective, against the same corpus the
    * BPE twin trains on, so the two query hashes together pin exactly
    * where the objectives diverge.
    */
  private def qWordpieceMerges(s: SparkSession, dir: String): DataFrame =
    TextAnalysis.wordPieceMerges(t(s, dir, "documents"), "text", rounds = 4)

  /** WordPiece encode (TextAnalysis.wordPieceTokenCounts): per-doc token
    * counts under the 3-merge likelihood-trained tokenizer — the apply
    * half, broadcast-join shape identical to q_bpe_encode.
    */
  private def qWordpieceEncode(s: SparkSession, dir: String): DataFrame =
    TextAnalysis.wordPieceTokenCounts(t(s, dir, "documents"), "doc_id", "text", rounds = 3)
      .orderBy(desc("n_tokens"), col("doc_id"))
      .limit(20)

  /** WordPiece INFERENCE encode (TextAnalysis.wordPieceEncode): greedy
    * longest-match against the vocabulary (alphabet + merge products) a
    * 4-round likelihood training on the EVEN doc_ids produced, applied
    * to the ODD doc_ids — the BERT serving-time algorithm, whole-word
    * [UNK] for never-seen characters. The oracle walks the same greedy
    * match with a recursive CTE.
    */
  private def qWordpieceInfer(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
    TextAnalysis.wordPieceEncode(
      docs.where(col("doc_id") % 2 === 0),
      docs.where(col("doc_id") % 2 === 1),
      "doc_id", "text", rounds = 4)
      .orderBy(desc("n_tokens"), col("doc_id"))
      .limit(20)
  }

  /** Unigram-LM tokenization (TextAnalysis.unigramTokenCounts, the
    * SentencePiece family in whole-bit integer costs): fixed vocabulary
    * = corpus alphabet + top-200 frequent substrings (len 2..4), every
    * word segmented by the GLOBALLY optimal Viterbi DP under
    * bits(N)-bits(cnt) token costs — the third tokenizer next to BPE
    * and WordPiece, and unlike both a non-greedy one. emRounds = 0 =
    * the oracle-exact seed-LM form (the oracle unrolls the DP 16
    * positions); EM re-estimation is spec-pinned.
    */
  private def qUnigramTok(s: SparkSession, dir: String): DataFrame =
    TextAnalysis.unigramTokenCounts(t(s, dir, "documents"), "doc_id", "text")
      .orderBy(desc("cost_bits"), col("doc_id"))
      .limit(20)

  /** OOV BPE encode (TextAnalysis.bpeEncode): 4 merges trained on the
    * EVEN doc_ids replay onto the ODD doc_ids' words — the
    * unseen-corpus apply path (lowest-rank replay == training-order
    * replay: a merge only creates pairs over its new symbol, which
    * always carry later ranks). The oracle unrolls the same 4 training
    * rounds on the even half, then folds each merge in order over the
    * odd half's segmentations.
    */
  private def qBpeEncodeOov(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
    TextAnalysis.bpeEncode(
      docs.where(col("doc_id") % 2 === 0),
      docs.where(col("doc_id") % 2 === 1),
      "doc_id", "text", rounds = 4)
      .orderBy(desc("n_tokens"), col("doc_id"))
      .limit(20)
  }

  /** Persisted-BPE lifecycle (TextAnalysis.writeTokenizer/loadTokenizer):
    * train 4 merges on the EVEN doc_ids, WRITE the artifact (parquet
    * merges + JSON sidecar), LOAD it back, and encode the ODD doc_ids
    * from the LOADED artifact — the exact q_bpe_encode_oov computation
    * routed through the tokenizer's persistence roundtrip, so the same
    * oracle pins it (the q_lsh_persisted convention). Any bit lost in
    * the roundtrip shifts some document's n_tokens and breaks the hash.
    */
  private def qBpePersisted(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
    val path = tmpIndexPath("graft_tok_bpe", dir)
    TextAnalysis.writeTokenizer(s,
      TextAnalysis.trainBpeTokenizer(docs.where(col("doc_id") % 2 === 0), "text", rounds = 4),
      path)
    val tok = TextAnalysis.loadTokenizer(s, path) match {
      case b: TextAnalysis.BpeTokenizer => b
      case other => throw new IllegalStateException(s"expected a bpe artifact at $path, got $other")
    }
    TextAnalysis.bpeEncode(tok, docs.where(col("doc_id") % 2 === 1), "doc_id", "text")
      .orderBy(desc("n_tokens"), col("doc_id"))
      .limit(20)
  }

  /** Corpus data card (Curation.datasheet): per-(source, predicted
    * language) doc/token counts, corpus-wide exact-duplicate attribution
    * (keep-min-id rank over normalized digests), empty-doc counts and
    * the fixed-point quality sum — the accounting sheet a training-data
    * release publishes, as one scan + one digest window + one bounded
    * groupBy. Integer-exact throughout (quality enters as
    * floor(q x 1e6) per doc), so the sheet hash-matches the oracle.
    */
  private def qDatasheet(s: SparkSession, dir: String): DataFrame =
    graft.operators.Curation
      .datasheet(t(s, dir, "documents"), "doc_id", "text", "source")
      .orderBy("source", "pred_lang")

  /** REAL token-ID sequences (TextAnalysis.bpeEncodeIds, VERDICT r13 #1):
    * per-doc `input_ids` under a 3-merge BPE tokenizer — every word's
    * merge-replay segmentation mapped through the artifact's stable
    * vocab ids (0 = <unk>, sorted alphabet 1..A, merge products A+r) and
    * concatenated in document word order. Emitted as the comma-joined id
    * string so the hash pins the exact SEQUENCE, not just counts — a
    * wrong id, order, or boundary anywhere breaks it. Bounded corpus
    * (doc_id < 120) keeps the oracle's unrolled rounds + per-word
    * segmentation cheap. The oracle derives the same ids from the
    * unrolled training rounds' final segmentation (train == apply, so
    * replay == training segmentation — the bpeEncode == bpeTokenCounts
    * identity the spec pins).
    */
  private def qBpeIds(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents").where(col("doc_id") < 120)
    val tok = TextAnalysis.trainBpeTokenizer(docs, "text", rounds = 3)
    TextAnalysis.bpeEncodeIds(tok, docs, "doc_id", "text")
      .select(col("doc_id"), col("n_tokens"),
        concat_ws(",", col("input_ids").cast("array<string>")).as("input_ids"))
      .orderBy("doc_id")
  }

  /** Packed training sequences (SequencePacking.packSequences, VERDICT
    * r13 #1): the q_bpe_ids encode threaded into strict-budget next-fit
    * packing at the one-range operating point — each bin row carries the
    * CONCATENATED input_ids of its documents in pack order, hash-pinned
    * end to end (train, encode, bin boundaries, and the packed id stream
    * all have to be exactly right). The oracle walks the q_seq_pack_tok
    * recursive recurrence and string_aggs the per-doc id strings per bin
    * in id order.
    */
  private def qPackIds(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents").where(col("doc_id") < 120)
    val tok = TextAnalysis.trainBpeTokenizer(docs, "text", rounds = 3)
    val enc = TextAnalysis.bpeEncodeIds(tok, docs, "doc_id", "text")
    graft.operators.SequencePacking
      .packSequences(enc, "doc_id", "n_tokens", "input_ids", budget = 2048, partitions = 1)
      .select(col("bin_id"), col("n_docs"), col("bin_tokens"),
        concat_ws(",", col("input_ids").cast("array<string>")).as("input_ids"))
      .orderBy("bin_id")
  }

  /** Per-document BOUNDARY metadata inside each packed sequence
    * (SequencePacking.packSequences doc_ids/doc_lens): which documents a
    * bin carries and how long each one's segment of `input_ids` is, in
    * pack order — what a trainer needs to reset position ids / mask
    * cross-document attention at the boundaries, and what a takedown
    * needs to find every packed sequence containing a document. The
    * oracle re-walks the q_pack_ids recurrence and aggregates the
    * per-bin doc id / token-length streams in the same pack (= id)
    * order; a shifted boundary, dropped doc, or reordered segment
    * breaks the hash.
    */
  private def qPackBounds(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents").where(col("doc_id") < 120)
    val tok = TextAnalysis.trainBpeTokenizer(docs, "text", rounds = 3)
    val enc = TextAnalysis.bpeEncodeIds(tok, docs, "doc_id", "text")
    graft.operators.SequencePacking
      .packSequences(enc, "doc_id", "n_tokens", "input_ids", budget = 2048, partitions = 1)
      .select(col("bin_id"),
        concat_ws(",", col("doc_ids").cast("array<string>")).as("doc_ids"),
        concat_ws(",", col("doc_lens").cast("array<string>")).as("doc_lens"))
      .orderBy("bin_id")
  }

  /** Training-shard export lifecycle (SequencePacking.exportShards):
    * the packed sequences land on disk under `shard = bin_id % 4`
    * partitions, the manifest is computed by READING BACK the written
    * files, and the returned frame is the reloaded manifest — so the
    * hash pins write -> read-back -> certify end to end. The digest is
    * a per-shard sum of 32-bit md5-nibble digests of each bin's
    * `bin_id:ids_csv` content (the hashBucket portability convention),
    * so the DuckDB oracle certifies the identical bytes; any lost,
    * duplicated, or corrupted bin anywhere in the export breaks it.
    */
  private def qShardManifest(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents").where(col("doc_id") < 120)
    val tok = TextAnalysis.trainBpeTokenizer(docs, "text", rounds = 3)
    val enc = TextAnalysis.bpeEncodeIds(tok, docs, "doc_id", "text")
    val packed = graft.operators.SequencePacking
      .packSequences(enc, "doc_id", "n_tokens", "input_ids", budget = 2048, partitions = 1)
    val path = tmpIndexPath("graft_shards", dir)
    graft.operators.SequencePacking.exportShards(packed, path, nShards = 4)
      .orderBy("shard")
  }

  /** The third trainer tensor (SequencePacking.positionIds): per-bin
    * `position_ids` — 0..len-1 per document, concatenated in pack
    * order, so positions RESET at every document boundary (the packed
    * cross-document attention-mask convention). Derived from doc_lens
    * by pure column algebra (flatten ∘ transform ∘ sequence); the
    * oracle rebuilds the same streams from the pack recurrence with a
    * per-doc range unnest. With q_pack_ids and q_pack_bounds this pins
    * the complete tensor set a trainer reads: ids, boundaries,
    * positions.
    */
  private def qPackPositions(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents").where(col("doc_id") < 120)
    val tok = TextAnalysis.trainBpeTokenizer(docs, "text", rounds = 3)
    val enc = TextAnalysis.bpeEncodeIds(tok, docs, "doc_id", "text")
    graft.operators.SequencePacking
      .packSequences(enc, "doc_id", "n_tokens", "input_ids", budget = 2048, partitions = 1)
      .select(col("bin_id"),
        concat_ws(",",
          graft.operators.SequencePacking.positionIds(col("doc_lens"))
            .cast("array<string>")).as("position_ids"))
      .orderBy("bin_id")
  }

  /** Takedown INSIDE exported training shards
    * (SequencePacking.retractFromShards): export the packed corpus,
    * retract doc 1, and return the post-retraction bins as read back
    * from the rewritten shard files. The doc's segment is sliced out of
    * its bin by the doc_lens offsets; every other bin and every other
    * document's id stream must come back bit-identical, and the bin's
    * own counts/stream shrink by exactly the victim's contribution. The
    * oracle computes the same thing by excluding the victim's row from
    * the per-bin aggregation of the original pack recurrence (bin
    * boundaries are assigned BEFORE retraction, so the recurrence still
    * runs over all docs).
    */
  private def qShardRetract(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents").where(col("doc_id") < 120)
    val tok = TextAnalysis.trainBpeTokenizer(docs, "text", rounds = 3)
    val enc = TextAnalysis.bpeEncodeIds(tok, docs, "doc_id", "text")
    val packed = graft.operators.SequencePacking
      .packSequences(enc, "doc_id", "n_tokens", "input_ids", budget = 2048, partitions = 1)
    val path = tmpIndexPath("graft_shard_rtct", dir)
    graft.operators.SequencePacking.exportShards(packed, path, nShards = 4)
    graft.operators.SequencePacking.retractFromShards(s, path, Seq(1L))
    s.read.parquet(s"$path/data")
      .select(col("bin_id"), col("n_docs"), col("bin_tokens"),
        concat_ws(",", col("doc_ids").cast("array<string>")).as("doc_ids"),
        concat_ws(",", col("input_ids").cast("array<string>")).as("input_ids"))
      .orderBy("bin_id")
  }

  /** GPT-style separator packing (SequencePacking.packSequences sepId,
    * VERDICT r14 #4): every document's segment ends with one end-of-text
    * id (0 here — the reserved <unk> slot stands in for a real EOS),
    * the separator BILLS against the budget (the next-fit recurrence
    * walks n_tokens + 1) and is REFLECTED in doc_lens, so the packed
    * stream, the boundary metadata, and the bin token totals all move
    * together — the oracle re-walks the recurrence with the +1 and
    * appends ',0' to each document's id string; any separator that
    * leaks out of the budget accounting or out of doc_lens breaks the
    * hash.
    */
  private def qPackSep(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents").where(col("doc_id") < 120)
    val tok = TextAnalysis.trainBpeTokenizer(docs, "text", rounds = 3)
    val enc = TextAnalysis.bpeEncodeIds(tok, docs, "doc_id", "text")
    graft.operators.SequencePacking
      .packSequences(enc, "doc_id", "n_tokens", "input_ids",
        budget = 2048, partitions = 1, sepId = Some(0L))
      .select(col("bin_id"), col("n_docs"), col("bin_tokens"),
        concat_ws(",", col("input_ids").cast("array<string>")).as("input_ids"),
        concat_ws(",", col("doc_lens").cast("array<string>")).as("doc_lens"))
      .orderBy("bin_id")
  }

  /** Incremental shard refresh (SequencePacking.appendShards, VERDICT
    * r14 #1): export the EVEN documents' packed bins, then append the
    * ODD documents' bins as a batch — rebased onto the store's next
    * free ids, landed into the existing shard layout, with only the
    * affected manifest rows re-spliced. The returned manifest must be
    * hash-identical to what a ONE-SHOT export of the union would have
    * produced (the oracle computes exactly that: two pack recurrences,
    * the odd bins rebased by the even bin count, per-shard counts and
    * content digests over the union) — pinning that the incremental
    * path loses, duplicates, and reorders nothing, digests included.
    */
  /** The shared export(evens)+append(odds) store the shard-lifecycle
    * queries certify (r15 verdict #5 — the shard family gets the
    * scheduleStore treatment): built ONCE per process, reused by
    * q_shard_append and q_shard_compact alike, which is sound because
    * the family's own oracle contract says every verb on this store is
    * manifest-preserving (append == one-shot union export; compaction
    * content-identical) — whichever sibling runs first, both read the
    * identical certified manifest. The `.built` sentinel (written after
    * the append) guards the TWO-step build, not just the export.
    */
  private def appendedShardStore(s: SparkSession, dir: String): String = {
    val path = tmpIndexPath("graft_shard_app", dir)
    val done = java.nio.file.Paths.get(path, ".built")
    if (!java.nio.file.Files.exists(done)) {
      val docs = t(s, dir, "documents").where(col("doc_id") < 120)
      val tok = TextAnalysis.trainBpeTokenizer(docs, "text", rounds = 3)
      val encE = TextAnalysis.bpeEncodeIds(tok, docs.where(col("doc_id") % 2 === 0), "doc_id", "text")
      val encO = TextAnalysis.bpeEncodeIds(tok, docs.where(col("doc_id") % 2 === 1), "doc_id", "text")
      val packedE = graft.operators.SequencePacking
        .packSequences(encE, "doc_id", "n_tokens", "input_ids", budget = 2048, partitions = 1)
      val packedO = graft.operators.SequencePacking
        .packSequences(encO, "doc_id", "n_tokens", "input_ids", budget = 2048, partitions = 1)
      graft.operators.SequencePacking.exportShards(packedE, path, nShards = 4)
      graft.operators.SequencePacking.appendShards(packedO, path, batchKey = "drv#odds")
      java.nio.file.Files.createFile(done)
    }
    path
  }

  private def qShardAppend(s: SparkSession, dir: String): DataFrame = {
    val path = appendedShardStore(s, dir)
    s.catalog.refreshByPath(s"$path/manifest")
    s.read.parquet(s"$path/manifest").orderBy("shard")
  }

  /** Shard small-file compaction (SequencePacking.compactShards): the
    * append-fragmented store folded to one file per shard must be
    * CONTENT-IDENTICAL — the returned manifest (counts, token totals,
    * per-bin content digests) hash-matches the one-shot export of the
    * union exactly as q_shard_append's does, so a compaction that loses,
    * duplicates, or reorders one bin anywhere breaks the oracle. The
    * engine additionally proves identity internally (each shard's digest
    * recompute vs the stored row before the swap is declared done).
    */
  private def qShardCompact(s: SparkSession, dir: String): DataFrame = {
    // the shared appended store (r15 verdict #5): the billed wall-clock is
    // the compaction VERB, not a third redundant tokenizer training —
    // re-compacting an already-compacted store still runs the full rewrite
    // + digest-identity proof per shard, which is the verb under test
    val path = appendedShardStore(s, dir)
    graft.operators.SequencePacking.compactShards(s, path)
    s.catalog.refreshByPath(s"$path/manifest")
    s.read.parquet(s"$path/manifest").orderBy("shard")
  }

  /** Certified loader read (SequencePacking.readShard, VERDICT r14 #6):
    * export the packed corpus and read ONE shard back through the
    * certifying path — the shard's manifest row is recomputed from the
    * files and compared before any row is served, so the returned bins
    * are exactly shard 2's slice of the pack recurrence (`bin_id % 4 =
    * 2`), which is what the oracle selects.
    */
  private def qReadShard(s: SparkSession, dir: String): DataFrame = {
    // the schedule family's store IS the q_shard_manifest corpus exported
    // whole — readShard is read-only, so reusing it (r15 verdict #5) bills
    // this query the certified-read verb alone
    val path = scheduleStore(s, dir, "graft_sched")
    graft.operators.SequencePacking.readShard(s, path, 2L)
      .select(col("bin_id"), col("n_docs"), col("bin_tokens"),
        concat_ws(",", col("input_ids").cast("array<string>")).as("input_ids"))
      .orderBy("bin_id")
  }

  /** The shared store-build for the LoaderSchedule queries: the
    * q_shard_manifest corpus (doc_id < 120, 3-round BPE, budget-2048
    * pack) exported under 4 shards at `prefix`'s tmp path.
    */
  private def scheduleStore(s: SparkSession, dir: String, prefix: String,
      docFilter: Column = lit(true),
      tokenizer: Option[() => TextAnalysis.BpeTokenizer] = None): String = {
    val path = tmpIndexPath(prefix, dir)
    // the store is a DETERMINISTIC artifact of (corpus, filter): once a
    // schedule query built it in this process, its siblings reuse it (the
    // lifecycle is billed once, like the persisted LSH/IVF stores; the
    // schedule verbs are read-only, so nothing can have mutated it) — the
    // tokenizer training is inside the guard for the same reason
    if (!java.nio.file.Files.exists(java.nio.file.Paths.get(s"$path/manifest"))) {
      val docs = t(s, dir, "documents").where(col("doc_id") < 120 && docFilter)
      // callers building several parity stores pass the tokenizer in so
      // the (identical) training runs once, not once per store
      val tok = tokenizer.map(_.apply()).getOrElse(TextAnalysis.trainBpeTokenizer(
        t(s, dir, "documents").where(col("doc_id") < 120), "text", rounds = 3))
      val enc = TextAnalysis.bpeEncodeIds(tok, docs, "doc_id", "text")
      val packed = graft.operators.SequencePacking
        .packSequences(enc, "doc_id", "n_tokens", "input_ids", budget = 2048, partitions = 1)
      graft.operators.SequencePacking.exportShards(packed, path, nShards = 4)
    }
    path
  }

  /** Deterministic epoch schedule over a certified shard store
    * (LoaderSchedule.epochSchedule): one row per packed bin in the
    * md5(seed:bin_id)-keyed permutation order, with the exact running
    * token total — the order a training epoch consumes the store in and
    * the cursor (`cum_tokens`) a checkpoint persists. The oracle
    * re-derives the permutation and the running sum from the pack
    * recurrence with the same md5 key, so a single transposed bin, a
    * wrong token count, or a drifting cumulative anywhere in the epoch
    * breaks the hash. The engine path also CERTIFIES the store's totals
    * against its manifest before scheduling.
    */
  private def qEpochSchedule(s: SparkSession, dir: String): DataFrame = {
    val path = scheduleStore(s, dir, "graft_sched")
    graft.operators.LoaderSchedule.epochSchedule(s, path, "ep1")
      .orderBy("ord")
  }

  /** Mid-epoch resume (LoaderSchedule.resumeFrom): the unconsumed tail
    * of the epoch schedule after a trainer checkpointed at half the
    * store's tokens — exactly the bins whose inclusive running total
    * exceeds the cursor, in unchanged epoch order. Pure filter on the
    * schedule (consumed prefix ∪ resume == the whole epoch by
    * construction); the oracle applies the same half-total cursor to
    * its re-derived schedule.
    */
  private def qEpochResume(s: SparkSession, dir: String): DataFrame = {
    val path = scheduleStore(s, dir, "graft_sched")
    // pinned (r18): the schedule is referenced twice — once for the
    // half-store cursor, once by resumeFrom — and each reference used to
    // re-run epochSchedule's certify + permutation-rank jobs
    val sched = graft.util.Checkpoints.pin(
      graft.operators.LoaderSchedule.epochSchedule(s, path, "ep1"))
    val half = sched.agg(max("cum_tokens")).head().getLong(0) / 2L
    graft.operators.LoaderSchedule.resumeFrom(sched, half).orderBy("ord")
  }

  /** Loader-worker slicing (LoaderSchedule.workerSlices): the epoch
    * schedule dealt round-robin to 3 workers — per worker the bin
    * count, token total, and the exact bin membership IN EPOCH ORDER
    * (csv), so the hash pins both the balance (sizes differ by at most
    * one bin) and the deal itself. Re-slicing to a different worker
    * count is a metadata re-map of `ord`, never a reshuffle.
    */
  private def qWorkerSlices(s: SparkSession, dir: String): DataFrame = {
    val path = scheduleStore(s, dir, "graft_sched")
    val sched = graft.operators.LoaderSchedule.epochSchedule(s, path, "ep1")
    graft.operators.LoaderSchedule.workerSlices(sched, 3)
      .groupBy("worker")
      .agg(
        count(lit(1)).as("n_bins"),
        sum("n_tokens").as("n_tokens"),
        concat_ws(",",
          transform(sort_array(collect_list(struct(col("ord"), col("bin_id")))),
            x => x.getField("bin_id").cast("string"))).as("bin_ids"))
      .orderBy("worker")
  }

  /** Multi-epoch training plan (LoaderSchedule.epochPlan): two
    * independent epoch permutations of the same store concatenated with
    * GLOBALLY continuing ord and cum_tokens — the coordinate system a
    * multi-pass trainer checkpoints (a global token cursor resumes
    * mid-epoch-2 through plain resumeFrom). The oracle re-derives both
    * permutations (seeds 'pl/1', 'pl/2') and applies the same
    * metadata offsets; a wrong offset, a correlated shuffle, or a
    * broken epoch boundary breaks the hash.
    */
  private def qEpochPlan(s: SparkSession, dir: String): DataFrame = {
    val path = scheduleStore(s, dir, "graft_sched")
    graft.operators.LoaderSchedule.epochPlan(s, path, "pl", nEpochs = 2)
      .orderBy("ord")
  }

  /** Deterministic domain-mixture interleave
    * (LoaderSchedule.mixtureSchedule): the even documents' store at
    * weight 3 and the odd documents' at weight 1, merged by integer
    * virtual time `k * lcm/w` over each domain's own epoch-shuffled
    * bin order — weighted fair queuing, so every prefix of the combined
    * schedule serves the domains 3:1 up to rounding. The oracle builds
    * both pack recurrences, ranks each domain by the same md5 key, and
    * re-derives the identical interleave with the identical running
    * token total; a single out-of-proportion prefix reorders rows and
    * breaks the hash.
    */
  private def qMixtureSchedule(s: SparkSession, dir: String): DataFrame = {
    // lazy so two pre-built stores skip the training entirely; shared so
    // a cold build trains once for both parity stores
    lazy val tok = TextAnalysis.trainBpeTokenizer(
      t(s, dir, "documents").where(col("doc_id") < 120), "text", rounds = 3)
    val pathE = scheduleStore(s, dir, "graft_mix_e", col("doc_id") % 2 === 0, Some(() => tok))
    val pathO = scheduleStore(s, dir, "graft_mix_o", col("doc_id") % 2 === 1, Some(() => tok))
    graft.operators.LoaderSchedule.mixtureSchedule(
        s, Seq(("even", pathE, 3L), ("odd", pathO, 1L)), "mix1")
      .orderBy("ord")
  }

  /** Multi-epoch mixture plan (LoaderSchedule.mixturePlan, r15 verdict
    * #4): the even store at weight 3 for one epoch, the odd store at
    * weight 1 UPSAMPLED to two epochs (the Pile/LLaMA repeat-factor
    * shape), interleaved by weighted fair queuing over each domain's
    * REPEATED stream — odd's epoch-2 bins continue its stream positions,
    * so the 3:1 service ratio holds across the repeat boundary and the
    * whole plan carries one globally-continuing (ord, cum_tokens)
    * coordinate system. The oracle re-derives all three permutations
    * (seeds mixp:even/1, mixp:odd/1, mixp:odd/2), the stream-position
    * rebase, and the integer virtual-time interleave; a repeat boundary
    * leak, a correlated epoch, or one out-of-proportion prefix breaks
    * the hash. Reuses the q_mixture_schedule parity stores.
    */
  private def qMixturePlan(s: SparkSession, dir: String): DataFrame = {
    lazy val tok = TextAnalysis.trainBpeTokenizer(
      t(s, dir, "documents").where(col("doc_id") < 120), "text", rounds = 3)
    val pathE = scheduleStore(s, dir, "graft_mix_e", col("doc_id") % 2 === 0, Some(() => tok))
    val pathO = scheduleStore(s, dir, "graft_mix_o", col("doc_id") % 2 === 1, Some(() => tok))
    graft.operators.LoaderSchedule.mixturePlan(
        s, Seq(("even", pathE, 3L, 1), ("odd", pathO, 1L, 2)), "mixp")
      .orderBy("ord")
  }

  /** Mixture plan at a NONTRIVIAL repeat factor (r18, pinning the
    * in-frame epoch expansion of r17 verdict #1): even store x2 epochs,
    * odd store x25 — 27 epoch permutations generated as bins x a
    * broadcast epoch range with ONE global rank, where the r17 shape ran
    * one union branch + one count job per epoch. The oracle expands the
    * same epochs via `UNNEST(range(...))` partitioned ranks; a stream
    * offset error, a key-string drift, or an interleave tie-break slip
    * at ANY of the 27 epochs breaks the hash.
    */
  private def qMixturePlanReps(s: SparkSession, dir: String): DataFrame = {
    lazy val tok = TextAnalysis.trainBpeTokenizer(
      t(s, dir, "documents").where(col("doc_id") < 120), "text", rounds = 3)
    val pathE = scheduleStore(s, dir, "graft_mix_e", col("doc_id") % 2 === 0, Some(() => tok))
    val pathO = scheduleStore(s, dir, "graft_mix_o", col("doc_id") % 2 === 1, Some(() => tok))
    graft.operators.LoaderSchedule.mixturePlan(
        s, Seq(("even", pathE, 3L, 2), ("odd", pathO, 1L, 25)), "mixr")
      .orderBy("ord")
  }

  /** Token-budget plan (LoaderSchedule.planForTokens): "train for T
    * tokens" where T = 1.5× the store's total — the Chinchilla-style
    * budget that never aligns to whole epochs. The engine derives the
    * epoch count (2), builds the two-epoch plan (seeds tb/1, tb/2), and
    * keeps exactly the bins whose segment starts before T, so the last
    * kept bin is the one that crosses the budget. The oracle re-derives
    * the two permutations with their offsets and applies the same
    * start-before-T filter; an off-by-one at the budget crossing, a
    * wrong epoch count, or a truncated coordinate breaks the hash.
    */
  private def qTokenBudgetPlan(s: SparkSession, dir: String): DataFrame = {
    val path = scheduleStore(s, dir, "graft_sched")
    s.catalog.refreshByPath(s"$path/manifest")
    val total = s.read.parquet(s"$path/manifest")
      .agg(sum("n_tokens")).head().getLong(0)
    graft.operators.LoaderSchedule.planForTokens(s, path, "tb", total * 3L / 2L)
      .orderBy("ord")
  }

  /** Budget-driven mixture (LoaderSchedule.planForTokensMixture, r16
    * verdict #5): "train for T total tokens at weights 3:1" over the
    * even/odd parity stores, T = 1.5× their combined total — the actual
    * entry point of a Chinchilla-style run. The ENGINE derives each
    * domain's repeat factor (share_d = ceil(T*w_d/W), epochs_d =
    * ceil(share_d/total_d)), builds the WFQ interleave over the repeated
    * streams, and cuts at the start-before-T boundary. The oracle
    * re-derives the repeat factors from the same integer formulas,
    * expands each domain's epochs (partitioned md5 ranks over an
    * epoch-range cross join), and re-runs the interleave + cut; a wrong
    * share ceiling, a wrong epoch count, or an off-by-one at the budget
    * crossing breaks the hash. Reuses the q_mixture_schedule parity
    * stores.
    */
  private def qTokenBudgetMixture(s: SparkSession, dir: String): DataFrame = {
    lazy val tok = TextAnalysis.trainBpeTokenizer(
      t(s, dir, "documents").where(col("doc_id") < 120), "text", rounds = 3)
    val pathE = scheduleStore(s, dir, "graft_mix_e", col("doc_id") % 2 === 0, Some(() => tok))
    val pathO = scheduleStore(s, dir, "graft_mix_o", col("doc_id") % 2 === 1, Some(() => tok))
    def tot(p: String): Long = {
      s.catalog.refreshByPath(s"$p/manifest")
      s.read.parquet(s"$p/manifest").agg(sum("n_tokens")).head().getLong(0)
    }
    val budget = 3L * (tot(pathE) + tot(pathO)) / 2L
    graft.operators.LoaderSchedule.planForTokensMixture(
        s, Seq(("even", pathE, 3L), ("odd", pathO, 1L)), "tbm", budget)
      .orderBy("ord")
  }

  /** Maintained-histogram lifecycle (TextAnalysis.WordHistogram): build
    * the tokenizer training corpus as a persisted word histogram — write
    * the EVEN doc_ids' counts, APPEND the odd half as an O(batch) delta,
    * append the SAME delta again (the crash-replay shape the batch_key
    * must collapse), load, and train 4 BPE merges from the grown
    * histogram with zero corpus reads. A faithful lifecycle makes the
    * merges identical to training on the full corpus, so the oracle is
    * q_bpe_merges' unrolled rounds projected to the merge list — any
    * double-counted replay or lost delta changes some round's argmax and
    * breaks the hash.
    */
  private def qBpeHist(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
    val path = tmpIndexPath("graft_tok_hist", dir)
    TextAnalysis.writeWordHistogram(
      TextAnalysis.wordHistogram(docs.where(col("doc_id") % 2 === 0), "text"), path)
    TextAnalysis.appendWordHistogram(
      docs.where(col("doc_id") % 2 === 1), "text", path, batchKey = "drv#1")
    TextAnalysis.appendWordHistogram(
      docs.where(col("doc_id") % 2 === 1), "text", path, batchKey = "drv#1")
    val tok = TextAnalysis.trainBpeTokenizer(
      TextAnalysis.loadWordHistogram(s, path), rounds = 4, maxVocab = 10000000L)
    import s.implicits._
    tok.merges.toDF("round", "pair_a", "pair_b").orderBy("round")
  }

  /** Persisted-WordPiece lifecycle: q_wordpiece_infer (greedy
    * longest-match inference on the odd half under an even-half 4-round
    * likelihood training) through the writeTokenizer/loadTokenizer
    * roundtrip — merges AND the training alphabet must both survive
    * persistence for the hash to hold (the alphabet decides which
    * characters are [UNK]).
    */
  private def qWordpiecePersisted(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
    val path = tmpIndexPath("graft_tok_wp", dir)
    TextAnalysis.writeTokenizer(s,
      TextAnalysis.trainWordPieceTokenizer(
        docs.where(col("doc_id") % 2 === 0), "text", rounds = 4),
      path)
    val tok = TextAnalysis.loadTokenizer(s, path) match {
      case w: TextAnalysis.WordPieceTokenizer => w
      case other =>
        throw new IllegalStateException(s"expected a wordpiece artifact at $path, got $other")
    }
    TextAnalysis.wordPieceEncode(tok, docs.where(col("doc_id") % 2 === 1), "doc_id", "text")
      .orderBy(desc("n_tokens"), col("doc_id"))
      .limit(20)
  }

  /** Persisted-unigram lifecycle: q_unigram_tok (seed-LM Viterbi over
    * the full corpus) with the cost table routed through the
    * writeTokenizer/loadTokenizer roundtrip — the whole-bit costs, the
    * token total behind the OOV fallback, and the DP shape parameters
    * all persist; any drift shifts some document's cost_bits.
    */
  private def qUnigramPersisted(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
    val path = tmpIndexPath("graft_tok_uni", dir)
    TextAnalysis.writeTokenizer(s,
      TextAnalysis.trainUnigramTokenizer(docs, "text"), path)
    val tok = TextAnalysis.loadTokenizer(s, path) match {
      case u: TextAnalysis.UnigramTokenizer => u
      case other =>
        throw new IllegalStateException(s"expected a unigram artifact at $path, got $other")
    }
    TextAnalysis.unigramTokenCounts(tok, docs, "doc_id", "text")
      .orderBy(desc("cost_bits"), col("doc_id"))
      .limit(20)
  }

  /** Per-window drift readout (EventStreams.windowDrift) as a BATCH
    * query: weekly event-type mixes against the whole month's mix as
    * the reference — the exact integer-ppm arithmetic the streaming
    * sink readout uses, hash-gated. Window = 7-day tumbling bins over
    * ts_us (window_start emitted as epoch micros).
    */
  private def qWindowDrift(s: SparkSession, dir: String): DataFrame = {
    val weekUs = 604800000000L
    val e = events(s, dir).select(col("event_type"), col("ts_us"))
    val counts = e
      .groupBy(
        (col("ts_us") - pmod(col("ts_us"), lit(weekUs))).as("window_start"),
        col("event_type").as("category"))
      .agg(count(lit(1)).as("n"))
    val reference = e.groupBy(col("event_type").as("category")).agg(count(lit(1)).as("n"))
    graft.streaming.EventStreams.windowDrift(counts, reference, "category", "n")
      .orderBy("window_start", "category")
  }

  /** Embedding drift monitor (DriftMonitor.embeddingDrift): per-dimension
    * centroid shift between the label<5 and label>=5 halves of the
    * embedding corpus — the encoder-regression / source-mix guardrail
    * for the vector side of a multimodal pipeline, integer-exact via
    * quantized component sums.
    */
  private def qEmbedDrift(s: SparkSession, dir: String): DataFrame =
    DriftMonitor.embeddingDrift(
        t(s, dir, "embeddings").select(col("embedding"), col("label")),
        "embedding",
        col("label") < 5)
      .orderBy("dim")

  /** Per-window EMBEDDING drift readout (EventStreams.windowedVectorSums
    * -> vectorWindowDrift) as a BATCH query — the vector sibling of
    * q_window_drift, hash-gating the streaming arithmetic end-to-end:
    * quantize floor(x*1000), per-(window, dim) integer component sums
    * through the REAL streaming aggregation (withWatermark+window() —
    * batch planning elides the watermark, keeping the expressions), then
    * shiftFromSums against a whole-corpus reference built by the SAME
    * aggregation collapsed to one window. Embeddings carry no timestamp,
    * so each vector gets a deterministic synthetic one (epoch 2024-01-01
    * + vec_id hours — DuckDB mirrors the micros arithmetic), bucketed
    * into 7-day tumbling windows.
    */
  private def qVectorWindowDrift(s: SparkSession, dir: String): DataFrame = {
    val baseUs = 1704067200000000L // 2024-01-01T00:00:00Z
    val hourUs = 3600000000L
    val emb = t(s, dir, "embeddings")
    val withTs = emb.select(
      timestamp_micros(lit(baseUs) + col("vec_id") * lit(hourUs)).as("ts"),
      col("embedding"))
    val sums = graft.streaming.EventStreams
      .windowedVectorSums(withTs, "ts", "embedding", windowLen = "7 days", lateness = "1 hour")
    // reference: the corpus-wide per-dim sums, via the SAME streaming
    // aggregation with every row pinned to one window
    val reference = graft.streaming.EventStreams
      .windowedVectorSums(
        emb.select(timestamp_micros(lit(baseUs)).as("ts"), col("embedding")),
        "ts", "embedding", windowLen = "7 days", lateness = "1 hour")
      .select(col("dim"), col("cnt"), col("qsum"))
    graft.streaming.EventStreams
      .vectorWindowDrift(sums, reference, "dim", "cnt", "qsum")
      .select(
        unix_micros(col("window_start")).as("window_start_us"),
        col("dim"), col("cnt_a"), col("cnt_b"), col("sum_a"), col("sum_b"),
        col("shift_milliq"), col("abs_shift_milliq"))
      .orderBy("window_start_us", "dim")
  }

  /** Streaming per-window distinct-user sketch (EventStreams
    * .windowedHllRegisters run batch-side — batch planning elides only
    * the watermark): weekly tumbling HLL registers over user_id, read
    * out via the grouped estimate. The streaming angle KMV cannot take:
    * register MAX folds incrementally under append mode with state
    * bounded by open windows x 2^p, never by distinct users.
    */
  private def qEventHll(s: SparkSession, dir: String): DataFrame = {
    val ev = events(s, dir)
      .select(timestamp_micros(col("ts_us")).as("ts"), col("user_id"))
    val regs = graft.streaming.EventStreams.windowedHllRegisters(
      ev, "ts", "user_id", windowLen = "7 days", lateness = "1 hour", p = 7)
    graft.streaming.EventStreams.windowedHllEstimate(regs, p = 7)
      .select(
        unix_micros(col("window_start")).as("window_start_us"),
        col("n_zero"), col("sum_scaled"), col("hll_estimate"))
      .orderBy("window_start_us")
  }

  /** Model-based quality filtering (QualityClassifier): fit the exact
    * nearest-centroid model on the 1-in-5 labeled sample (doc_id % 5 = 0,
    * teacher label = n_chars >= 300 — the "expensive scorer on a sample,
    * cheap model on the corpus" distillation recipe), classify ALL
    * documents, and report the confusion matrix against the teacher
    * signal. Hash-gates the full integer discriminant: hashed-unigram
    * featurization, bounded class-sum aggregation, and the
    * decimal(38,0) cross-multiplied Euclidean rule.
    */
  private def qClassifierCentroid(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
    QualityClassifier
      .fitClassify(
        docs, "doc_id", "text",
        label = when(col("n_chars") >= 300, 1).otherwise(-1),
        labeledWhere = col("doc_id") % 5 === 0,
        nFeatures = 256)
      .select(when(col("n_chars") >= 300, 1).otherwise(-1).as("y"), col("pred"))
      .groupBy("y", "pred")
      .agg(count(lit(1)).as("n"))
      .orderBy("y", "pred")
  }

  /** The production readout of the same model: per-source keep rates
    * (total, kept, kept_ppm) — the "which sources does the quality
    * filter gut" curation dashboard, integer ppm via DIV like the
    * drift monitors.
    */
  private def qModelFilterRate(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
    QualityClassifier
      .fitClassify(
        docs, "doc_id", "text",
        label = when(col("n_chars") >= 300, 1).otherwise(-1),
        labeledWhere = col("doc_id") % 5 === 0,
        nFeatures = 256)
      .groupBy("source")
      .agg(
        count(lit(1)).as("total"),
        sum(when(col("pred") === 1, 1L).otherwise(0L)).as("kept"))
      .withColumn("kept_ppm", expr("kept * 1000000 DIV total"))
      .orderBy("source")
  }

  /** K-class domain classification (QualityClassifier.fitCentroidK /
    * classifyK): three length-tercile domains as the derivable teacher
    * signal, trained on the 1-in-5 labeled sample, every document
    * assigned to its nearest class centroid via the ×1e9 truncating-DIV
    * normalized-distance score (ties to the smaller label). Confusion
    * matrix over ALL documents hash-gates the dense per-class dot rows,
    * the scaled argmin, and the zero-vector fallback constant.
    */
  private def qDomainClassify(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
    val label = when(col("n_chars") < 250, "short")
      .when(col("n_chars") < 350, "mid")
      .otherwise("long")
    val m = QualityClassifier.fitCentroidK(
      docs.where(col("doc_id") % 5 === 0), "doc_id", "text", label, nFeatures = 256)
    QualityClassifier.classifyK(docs, "doc_id", "text", m)
      .select(label.as("y"), col("pred_class"))
      .groupBy("y", "pred_class")
      .agg(count(lit(1)).as("n"))
      .orderBy("y", "pred_class")
  }

  /** Curation decision log (Curation.audit): every document with its
    * enrichment columns and the FIRST gate that dropped it (lang /
    * quality / duplicate; null = kept) — the per-doc "why did my
    * document disappear" readout, gate order and predicates identical
    * to q_curation's composite so kept-here iff curate-emits-it.
    */
  private def qCurationAudit(s: SparkSession, dir: String): DataFrame =
    Curation
      .audit(t(s, dir, "documents"), "doc_id", "text",
        langs = Set("en", "de"), minQuality = 0.5)
      .select(col("doc_id"), col("pred_lang"), col("quality"), col("drop_reason"))
      .orderBy("doc_id")

  /** Gate-loss accounting (the audit rolled up): docs and estimated
    * tokens lost to each curation gate vs kept — the "where does my
    * corpus go" dashboard number.
    */
  private def qAuditStats(s: SparkSession, dir: String): DataFrame =
    Curation
      .audit(t(s, dir, "documents"), "doc_id", "text",
        langs = Set("en", "de"), minQuality = 0.5)
      .groupBy(coalesce(col("drop_reason"), lit("kept")).as("reason"))
      .agg(count(lit(1)).as("n_docs"), sum("token_est").as("total_tokens"))
      .orderBy("reason")

  /** Route-then-rebalance (classifyK + Sampling.balanceStrata over the
    * PREDICTED domain): the mixture recipe a multi-domain pre-training
    * corpus runs — classify every doc into its domain, cap each domain
    * at a fixed budget by deterministic hash order. `kept_id_sum`
    * checksums WHICH rows survived, gating the selection itself.
    */
  private def qDomainBalance(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
    val label = when(col("n_chars") < 250, "short")
      .when(col("n_chars") < 350, "mid")
      .otherwise("long")
    val m = QualityClassifier.fitCentroidK(
      docs.where(col("doc_id") % 5 === 0), "doc_id", "text", label, nFeatures = 256)
    val assigned = QualityClassifier.classifyK(docs, "doc_id", "text", m)
    // one-pass readout (r18): the totals-join form executed classifyK's
    // whole featurize+classify pass twice (once per branch) and paid a
    // third exchange for the join; Sampling.strataKeepStats computes the
    // identical (total, kept, kept_id_sum) numbers in a single pass whose
    // aggregation reuses the cap window's pred_class partitioning
    Sampling
      .strataKeepStats(assigned, "pred_class", "doc_id", perStratum = 120, sumCol = "doc_id")
      .withColumnRenamed("kept_sum", "kept_id_sum")
      .orderBy("pred_class")
  }

  /** Cluster-balanced cap sampling (Clustering.kmeansAssign +
    * Sampling.balanceStrata): assign every embedding to the shared
    * 10-cluster k-means model, then cap each cluster at 30 rows chosen
    * by deterministic hash order — the "cluster-and-cap" diversity
    * recipe (dominant modes trimmed, rare modes kept whole).
    * `kept_id_sum` checksums WHICH rows survived, so the oracle gates
    * the hash-order selection itself, not just the cap arithmetic.
    */
  private def qClusterBalance(s: SparkSession, dir: String): DataFrame = {
    val assigned = Clustering
      .kmeansAssign(t(s, dir, "embeddings"), "vec_id", "embedding", k = 10, iters = 3)
    // one-pass readout (r18, the q_domain_balance rationale): the
    // totals-join form ran the full-corpus k-means assignment twice
    Sampling
      .strataKeepStats(assigned, "cluster", "vec_id", perStratum = 30, sumCol = "vec_id")
      .withColumnRenamed("kept_sum", "kept_id_sum")
      .orderBy("cluster")
  }

  // =====================================================================
  // Contract maps
  // =====================================================================

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_pricing_summary" -> (qPricingSummary _),
    "q_filter_range" -> (qFilterRange _),
    "q_join_revenue_by_region" -> (qJoinRevenueByRegion _),
    "q_anti_join" -> (qAntiJoin _),
    "q_semi_join" -> (qSemiJoin _),
    "q_topk_orders" -> (qTopkOrders _),
    "q_window_topn_per_cust" -> (qWindowTopnPerCust _),
    "q_running_total" -> (qRunningTotal _),
    "q_distinct_flags" -> (qDistinctFlags _),
    "q_union_segments" -> (qUnionSegments _),
    "q_status_histogram" -> (qStatusHistogram _),
    "q_count_enrichment" -> (qCountEnrichment _),
    "q_point_lookup" -> (qPointLookup _),
    "q_scalar_hash" -> (qScalarHash _),
    "q_title_clean" -> (qTitleClean _),
    "q_token_estimate" -> (qTokenEstimate _),
    "q_token_bpe" -> (qTokenBpe _),
    "q_quality_metrics" -> (qQualityMetrics _),
    "q_quality_gate" -> (qQualityGate _),
    "q_like_filter" -> (qLikeFilter _),
    "q_date_histogram" -> (qDateHistogram _),
    "q_json_extract" -> (qJsonExtract _),
    "q_sort_multi" -> (qSortMulti _),
    "q_event_tumbling" -> (qEventTumbling _),
    "q_sessionize" -> (qSessionize _),
    "q_dedup_exact" -> (qDedupExact _),
    "q_ngram_jaccard" -> (qNgramJaccard _),
    "q_lang_id" -> (qLangId _),
    "q_ann_cosine" -> (qAnnCosine _),
    "q_bm25" -> (qBm25 _),
    "q_phrase" -> (qPhrase _),
    "q_proximity" -> (qProximity _),
    "q_dsir" -> (qDsir _),
    "q_kmeans" -> (qKmeans _),
    "q_semdedup" -> (qSemdedup _),
    "q_snippet" -> (qSnippet _),
    "q_temperature" -> (qTemperature _),
    "q_negatives" -> (qNegatives _),
    "q_hard_negatives" -> (qHardNegatives _),
    "q_rrf_hybrid" -> (qRrfHybrid _),
    "q_context_budget" -> (qContextBudget _),
    "q_cascade_delete" -> (qCascadeDelete _),
    "q_minhash_lsh" -> (qMinhashLsh _),
    "q_chunker" -> (qChunker _),
    "q_embed_chunks" -> (qEmbedChunks _),
    "q_ann_lsh" -> (qAnnLsh _),
    "q_lsh_fixed" -> (qLshFixed _),
    "q_simhash_pairs" -> (qSimhashPairs _),
    "q_fingerprint" -> (qFingerprint _),
    "q_ann_ivf" -> (qAnnIvf _),
    "q_lsh_persisted" -> (qLshPersisted _),
    "q_lsh_banded" -> (qLshBanded _),
    "q_banded_fixed" -> (qBandedFixed _),
    "q_rollup" -> (qRollup _),
    "q_embed_neardup" -> (qEmbedNeardup _),
    "q_embed_neardup_lsh" -> (qEmbedNeardupLsh _),
    "q_ann_filtered" -> (qAnnFiltered _),
    "q_event_sliding" -> (qEventSliding _),
    "q_percentile" -> (qPercentile _),
    "q_above_avg" -> (qAboveAvg _),
    "q_minmax_dates" -> (qMinMaxDates _),
    "q_topk_per_group_agg" -> (qTopkPerGroupAgg _),
    "q_fuzzy_match" -> (qFuzzyMatch _),
    "q_asof_join" -> (qAsofJoin _),
    "q_ann_batch" -> (qAnnBatch _),
    "q_curation" -> (qCuration _),
    "q_curation_stats" -> (qCurationStats _),
    "q_ntile" -> (qNtile _),
    "q_range_frame" -> (qRangeFrame _),
    "q_simhash_sig" -> (qSimhashSig _),
    "q_stratified_sample" -> (qStratifiedSample _),
    "q_train_split" -> (qTrainSplit _),
    "q_seq_pack" -> (qSeqPack _),
    "q_seq_pack_tok" -> (qSeqPackTok _),
    "q_pii_scrub" -> (qPiiScrub _),
    "q_blocklist" -> (qBlocklist _),
    "q_gopher_repetition" -> (qGopherRepetition _),
    "q_top_ngram_frac" -> (qTopNgramFrac _),
    "q_decontaminate" -> (qDecontaminate _),
    "q_contamination_frac" -> (qContaminationFrac _),
    "q_chunk_fixed" -> (qChunkFixed _),
    "q_embed_portable" -> (qEmbedPortable _),
    "q_dedup_clusters" -> (qDedupClusters _),
    "q_span_dedup" -> (qSpanDedup _),
    "q_vocab_coverage" -> (qVocabCoverage _),
    "q_grouping_sets" -> (qGroupingSets _),
    "q_full_outer" -> (qFullOuter _),
    "q_range_join" -> (qRangeJoin _),
    "q_pivot" -> (qPivot _),
    "q_cube" -> (qCube _),
    "q_lag_delta" -> (qLagDelta _),
    "q_kmv_distinct" -> (qKmvDistinct _),
    "q_skew_agg" -> (qSkewAgg _),
    "q_decontaminate_bloom" -> (qDecontaminateBloom _),
    "q_weighted_sample" -> (qWeightedSample _),
    "q_bigram_lift" -> (qBigramLift _),
    "q_overlap_join" -> (qOverlapJoin _),
    "q_near_dedup" -> (qNearDedup _),
    "q_hist_quantile" -> (qHistQuantile _),
    "q_kmv_by_group" -> (qKmvByGroup _),
    "q_hll_distinct" -> (qHllDistinct _),
    "q_hll_by" -> (qHllBy _),
    "q_event_hll" -> (qEventHll _),
    "q_pagerank" -> (qPageRank _),
    "q_tfidf" -> (qTfidf _),
    "q_boilerplate" -> (qBoilerplate _),
    "q_kmv_overlap" -> (qKmvOverlap _),
    "q_quality_percentile" -> (qQualityPercentile _),
    "q_mixture_balance" -> (qMixtureBalance _),
    "q_cluster_reps" -> (qClusterReps _),
    "q_snapshot_diff" -> (qSnapshotDiff _),
    "q_mmr" -> (qMmr _),
    "q_mmr_fixed" -> (qMmrFixed _),
    "q_funnel" -> (qFunnel _),
    "q_retention" -> (qRetention _),
    "q_length_batches" -> (qLengthBatches _),
    "q_countmin" -> (qCountMin _),
    "q_hist_quantile_by" -> (qHistQuantileBy _),
    "q_ppr_seeded" -> (qPprSeeded _),
    "q_train_order" -> (qTrainOrder _),
    "q_zorder" -> (qZorder _),
    "q_unigram_surprisal" -> (qUnigramSurprisal _),
    "q_bigram_lm" -> (qBigramLm _),
    "q_lm_buckets" -> (qLmBuckets _),
    "q_incremental_lsh" -> (qIncrementalLsh _),
    "q_sq8_ann" -> (qSq8Ann _),
    "q_mrl" -> (qMrl _),
    "q_ivf_fixed" -> (qIvfFixed _),
    "q_pq_fixed" -> (qPqFixed _),
    "q_pq_trained" -> (qPqTrained _),
    "q_ivfpq" -> (qIvfPq _),
    "q_epochs" -> (qEpochs _),
    "q_triangles" -> (qTriangles _),
    "q_gap_fill" -> (qGapFill _),
    "q_transitions" -> (qTransitions _),
    "q_retrieval_eval" -> (qRetrievalEval _),
    "q_bm25_eval" -> (qBm25Eval _),
    "q_drift" -> (qDrift _),
    "q_drift_value" -> (qDriftValue _),
    "q_embed_drift" -> (qEmbedDrift _),
    "q_bpe_pairs" -> (qBpePairs _),
    "q_bpe_merges" -> (qBpeMerges _),
    "q_bpe_encode" -> (qBpeEncode _),
    "q_wordpiece_merges" -> (qWordpieceMerges _),
    "q_wordpiece_encode" -> (qWordpieceEncode _),
    "q_wordpiece_infer" -> (qWordpieceInfer _),
    "q_unigram_tok" -> (qUnigramTok _),
    "q_bpe_encode_oov" -> (qBpeEncodeOov _),
    "q_bpe_persisted" -> (qBpePersisted _),
    "q_bpe_hist" -> (qBpeHist _),
    "q_bpe_ids" -> (qBpeIds _),
    "q_pack_ids" -> (qPackIds _),
    "q_pack_bounds" -> (qPackBounds _),
    "q_pack_positions" -> (qPackPositions _),
    "q_shard_manifest" -> (qShardManifest _),
    "q_shard_retract" -> (qShardRetract _),
    "q_pack_sep" -> (qPackSep _),
    "q_shard_append" -> (qShardAppend _),
    "q_shard_compact" -> (qShardCompact _),
    "q_read_shard" -> (qReadShard _),
    "q_epoch_schedule" -> (qEpochSchedule _),
    "q_epoch_resume" -> (qEpochResume _),
    "q_epoch_plan" -> (qEpochPlan _),
    "q_worker_slices" -> (qWorkerSlices _),
    "q_mixture_schedule" -> (qMixtureSchedule _),
    "q_mixture_plan" -> (qMixturePlan _),
    "q_mixture_plan_reps" -> (qMixturePlanReps _),
    "q_token_budget_plan" -> (qTokenBudgetPlan _),
    "q_token_budget_mixture" -> (qTokenBudgetMixture _),
    "q_datasheet" -> (qDatasheet _),
    "q_wordpiece_persisted" -> (qWordpiecePersisted _),
    "q_unigram_persisted" -> (qUnigramPersisted _),
    "q_window_drift" -> (qWindowDrift _),
    "q_vector_window_drift" -> (qVectorWindowDrift _),
    "q_classifier_centroid" -> (qClassifierCentroid _),
    "q_model_filter_rate" -> (qModelFilterRate _),
    "q_cluster_balance" -> (qClusterBalance _),
    "q_domain_classify" -> (qDomainClassify _),
    "q_domain_balance" -> (qDomainBalance _),
    "q_curation_audit" -> (qCurationAudit _),
    "q_audit_stats" -> (qAuditStats _)
  )

  def oracleSql: Map[String, String] = OracleSql.all
}
