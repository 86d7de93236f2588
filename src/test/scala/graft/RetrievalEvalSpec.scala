package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.RetrievalEval

class RetrievalEvalSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  import spark.implicits._

  // results: (query, doc, rank); qrels: (query, rel)
  private def results(rows: (Long, Long, Long)*) =
    rows.toDF("q", "d", "r")
  private def qrels(rows: (Long, Long)*) =
    rows.toDF("q", "rel")

  test("rrScale is lcm(1..k)") {
    assert(RetrievalEval.rrScale(1) == 1L)
    assert(RetrievalEval.rrScale(4) == 12L)
    assert(RetrievalEval.rrScale(10) == 2520L)
    // divisible by every rank in range — the exactness precondition
    (1 to 20).foreach(r => assert(RetrievalEval.rrScale(20) % r == 0))
    intercept[IllegalArgumentException](RetrievalEval.rrScale(43))
  }

  test("perQuery: hit ranks, misses, and absent queries are all charged") {
    val r = results((1L, 10L, 1L), (1L, 11L, 2L), (2L, 20L, 1L), (2L, 21L, 2L))
    // q1: rel found at rank 2; q2: rel NOT in results; q3: no results at all
    val q = qrels((1L, 11L), (2L, 99L), (3L, 30L))
    val out = RetrievalEval
      .perQuery(r, "q", "d", "r", q, "q", "rel", k = 10)
      .orderBy("query_id").collect()
    assert(out.length == 3)
    val byQ = out.map(x => x.getAs[Long]("query_id") -> x).toMap
    assert(byQ(1L).getAs[Long]("n_found") == 1L)
    assert(byQ(1L).getAs[Long]("first_rank") == 2L)
    assert(byQ(1L).getAs[Long]("rr_num") == 2520L / 2)
    assert(byQ(2L).getAs[Long]("n_found") == 0L)
    assert(byQ(2L).isNullAt(byQ(2L).fieldIndex("first_rank")))
    assert(byQ(2L).getAs[Long]("rr_num") == 0L)
    assert(byQ(3L).getAs[Long]("n_found") == 0L)
  }

  test("perQuery: results beyond k do not count") {
    val r = results((1L, 11L, 11L))
    val q = qrels((1L, 11L))
    val row = RetrievalEval.perQuery(r, "q", "d", "r", q, "q", "rel", k = 10).head()
    assert(row.getAs[Long]("n_found") == 0L)
    assert(row.getAs[Long]("rr_num") == 0L)
  }

  test("perQuery: multiple relevant docs — first_rank is the best, n_found counts all") {
    val r = results((1L, 10L, 1L), (1L, 11L, 3L), (1L, 12L, 7L))
    val q = qrels((1L, 11L), (1L, 12L), (1L, 13L))
    val row = RetrievalEval.perQuery(r, "q", "d", "r", q, "q", "rel", k = 10).head()
    assert(row.getAs[Long]("n_rel") == 3L)
    assert(row.getAs[Long]("n_found") == 2L)
    assert(row.getAs[Long]("first_rank") == 3L)
    assert(row.getAs[Long]("rr_num") == 2520L / 3)
  }

  test("summary: hand-computed metrics") {
    // q1 hit at rank 1, q2 hit at rank 4, q3 miss, q4 absent from results
    val r = results((1L, 10L, 1L), (2L, 20L, 4L), (3L, 31L, 1L))
    val q = qrels((1L, 10L), (2L, 20L), (3L, 30L), (4L, 40L))
    val row = RetrievalEval.summary(r, "q", "d", "r", q, "q", "rel", k = 10).head()
    assert(row.getAs[Long]("n_queries") == 4L)
    assert(row.getAs[Long]("n_rel") == 4L)
    assert(row.getAs[Long]("n_found") == 2L)
    assert(row.getAs[Double]("recall_at_k") == 0.5)
    assert(row.getAs[Long]("hits_at_k") == 2L)
    assert(row.getAs[Double]("success_at_k") == 0.5)
    // mrr_num = 2520/1 + 2520/4 = 2520 + 630 = 3150
    assert(row.getAs[Long]("mrr_num") == 3150L)
    // mrr = (1 + 1/4) / 4 = 0.3125, exactly representable
    assert(row.getAs[Double]("mrr_at_k") == 0.3125)
  }

  test("duplicate (query, doc) result rows collapse to best rank; duplicate qrels collapse") {
    // e.g. two unioned retrieval shards both returned doc 11 for query 1
    val r = results((1L, 11L, 7L), (1L, 11L, 2L), (1L, 12L, 1L))
    val q = qrels((1L, 11L), (1L, 11L))
    val row = RetrievalEval.perQuery(r, "q", "d", "r", q, "q", "rel", k = 10).head()
    assert(row.getAs[Long]("n_rel") == 1L, s"n_rel must never depend on the system's output: $row")
    assert(row.getAs[Long]("n_found") == 1L)
    assert(row.getAs[Long]("first_rank") == 2L, "duplicates collapse to their BEST rank")
    val s = RetrievalEval.summary(r, "q", "d", "r", q, "q", "rel", k = 10).head()
    assert(s.getAs[Double]("recall_at_k") == 1.0, "recall must stay <= 1 under duplicate rows")
  }

  test("summary is partition-invariant") {
    val r = results((1L to 50L).map(i => (i, i * 10, 1L + (i % 7))): _*)
    val q = qrels((1L to 60L).map(i => (i, i * 10)): _*)
    val a = RetrievalEval.summary(r.repartition(2), "q", "d", "r", q.repartition(5), "q", "rel", 5).head()
    val b = RetrievalEval.summary(r.repartition(13), "q", "d", "r", q.repartition(1), "q", "rel", 5).head()
    assert(a == b)
  }
}
