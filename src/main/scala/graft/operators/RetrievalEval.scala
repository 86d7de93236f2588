package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Retrieval-quality evaluation as a distributed operator: given a
  * system's ranked result lists and a relevance-labeled query set
  * (qrels), compute per-query and corpus-level quality metrics —
  * recall@k, success@k, and MRR@k. This is the batch evaluation harness
  * for any of the retrieval surfaces (BM25, brute cosine, IVF, LSH,
  * SQ8, Matryoshka): run the index over an eval query batch, join the
  * labels, read the metrics. The reference evaluates retrieval quality
  * only manually (dabsdamoon/ETL-pdf-pipepline exposes search endpoints
  * but no eval loop); at 100 TB the eval loop must itself be a
  * distributed job over millions of labeled queries.
  *
  * Determinism/portability contract (the oracle discipline used across
  * graft): every aggregate is integer-exact — counts, summed integer
  * reciprocal-rank numerators scaled by lcm(1..k) — with only FINAL
  * single divisions emitting doubles, so results hash-match any engine
  * that computes the same integers. No floating-point SUM whose value
  * would depend on partition iteration order.
  *
  * Scale shape: qrels joins results on (query, doc) — one hash join
  * keyed by query/doc (broadcast when the eval set is small, shuffle
  * otherwise), one query-keyed aggregation bounded by |qrels|, one
  * global roll-up of a handful of integers. Result lists never need to
  * be globally sorted; ranks arrive precomputed from the retrieval
  * operator (e.g. positions of a [[graft.plans.TopKBy]] heap output).
  */
object RetrievalEval {

  /** lcm(1..k): the exact integer reciprocal-rank scale — divisible by
    * every rank in [1, k], so `scale DIV rank` is exact. Overflows Long
    * past k = 42, far beyond any practical cutoff.
    */
  def rrScale(k: Int): Long = {
    require(k >= 1 && k <= 42, s"rrScale: k must be in [1, 42], got $k")
    @annotation.tailrec
    def gcd(a: Long, b: Long): Long = if (b == 0) a else gcd(b, a % b)
    (1 to k).foldLeft(1L)((acc, i) => acc / gcd(acc, i.toLong) * i)
  }

  /** Per-query judgment: for every query in `qrels`, how many of its
    * relevant documents the system returned within the top `k`, and at
    * what best (minimum) rank.
    *
    * `results` columns: (queryCol, docCol, rankCol) with 1-based ranks —
    * one row per retrieved document. `qrels` columns: (qrelQueryCol,
    * relCol) — one row per (query, relevant-doc) pair; multiple relevant
    * documents per query are supported. Queries present in `qrels` but
    * absent from `results` still score (zero found) — the left join runs
    * FROM the labels, so a system that silently drops a query is charged
    * for it rather than excused.
    *
    * Output per query: `n_rel`, `n_found` (relevant docs at rank <= k),
    * `first_rank` (min rank of any relevant doc, null if none),
    * `rr_num` = lcm(1..k) DIV first_rank (0 on miss) — the integer MRR
    * numerator.
    *
    * Duplicate (query, doc) rows in `results` — e.g. from unioned
    * retrieval shards — collapse to their best rank BEFORE the label
    * join: without that, each duplicate would fan the qrels row out and
    * inflate both n_rel and n_found (recall over 1.0, denominators
    * dependent on the system's output).
    */
  def perQuery(
      results: DataFrame,
      queryCol: String,
      docCol: String,
      rankCol: String,
      qrels: DataFrame,
      qrelQueryCol: String,
      relCol: String,
      k: Int
  ): DataFrame = {
    require(k >= 1, s"perQuery: k must be >= 1, got $k")
    val scale = rrScale(k)
    val r = results.select(
      col(queryCol).as("_r_query"),
      col(docCol).as("_r_doc"),
      col(rankCol).cast("long").as("rank"))
      .where(col("rank") <= k)
      .groupBy("_r_query", "_r_doc")
      .agg(min(col("rank")).as("rank"))
    // qrels dedup for the same reason: a doubled label row would count
    // its document twice in n_rel/n_found
    val q = qrels.select(
      col(qrelQueryCol).as("query_id"),
      col(relCol).as("rel_id"))
      .distinct()
    q.join(
        r,
        col("query_id") === col("_r_query") && col("rel_id") === col("_r_doc"),
        "left")
      .groupBy("query_id")
      .agg(
        count(col("rel_id")).as("n_rel"),
        count(col("rank")).as("n_found"),
        min(col("rank")).as("first_rank"))
      .withColumn(
        "rr_num",
        coalesce(expr(s"$scale DIV first_rank"), lit(0L)))
  }

  /** Corpus-level metric roll-up over [[perQuery]] — ONE row:
    *
    *  - `n_queries`, `n_rel`, `n_found`
    *  - `recall_at_k` = n_found / n_rel (micro-averaged recall)
    *  - `hits_at_k` (queries with >= 1 relevant found),
    *    `success_at_k` = hits / n_queries
    *  - `mrr_num` (exact integer: sum of lcm(1..k) DIV first_rank),
    *    `mrr_at_k` = mrr_num / (lcm(1..k).0 * n_queries)
    *
    * The three doubles are each ONE division of exact integers, so the
    * row is bit-identical across engines and partitionings.
    */
  def summary(
      results: DataFrame,
      queryCol: String,
      docCol: String,
      rankCol: String,
      qrels: DataFrame,
      qrelQueryCol: String,
      relCol: String,
      k: Int
  ): DataFrame = {
    val scale = rrScale(k)
    perQuery(results, queryCol, docCol, rankCol, qrels, qrelQueryCol, relCol, k)
      .agg(
        count(col("query_id")).as("n_queries"),
        sum(col("n_rel")).as("n_rel"),
        sum(col("n_found")).as("n_found"),
        sum(when(col("n_found") > 0, 1L).otherwise(0L)).as("hits_at_k"),
        sum(col("rr_num")).as("mrr_num"))
      .select(
        col("n_queries"),
        col("n_rel"),
        col("n_found"),
        (col("n_found").cast("double") / col("n_rel")).as("recall_at_k"),
        col("hits_at_k"),
        (col("hits_at_k").cast("double") / col("n_queries")).as("success_at_k"),
        col("mrr_num"),
        (col("mrr_num") / (lit(scale.toDouble) * col("n_queries"))).as("mrr_at_k"))
  }
}
