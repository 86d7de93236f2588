package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.RangeJoin

class RangeJoinSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  import spark.implicits._

  private val bands = Seq(
    (0.0, 10.0, "low"),
    (10.0, 100.0, "mid"),
    (100.0, 1000.0, "high")
  ).toDF("lo", "hi", "band")

  test("bandJoin matches the naive inequality join exactly") {
    val fact = Seq(0.0, 5.0, 9.999, 10.0, 42.0, 99.9, 100.0, 500.0, 999.99, 1000.0, -3.0)
      .toDF("v")
    val got = RangeJoin
      .bandJoin(fact, "v", bands, "lo", "hi", cellWidth = 50.0)
      .select("v", "band")
      .as[(Double, String)]
      .collect()
      .toSet
    val naive = fact
      .join(bands, col("v") >= col("lo") && col("v") < col("hi"))
      .select("v", "band")
      .as[(Double, String)]
      .collect()
      .toSet
    assert(got == naive)
    assert(got.contains((10.0, "mid")), "lo is inclusive")
    assert(!naive.exists(_._1 == 1000.0), "hi is exclusive")
    assert(!naive.exists(_._1 == -3.0), "below all bands drops")
  }

  test("boundary values land in exactly one band regardless of cell width") {
    val fact = Seq(10.0, 100.0).toDF("v")
    for (w <- Seq(1.0, 7.0, 10.0, 33.3, 1000.0)) {
      val matched = RangeJoin
        .bandJoin(fact, "v", bands, "lo", "hi", cellWidth = w)
        .groupBy("v")
        .count()
        .as[(Double, Long)]
        .collect()
        .toMap
      assert(matched == Map(10.0 -> 1L, 100.0 -> 1L), s"cellWidth=$w")
    }
  }

  test("overlapJoin matches the naive overlap join, each pair exactly once") {
    val rnd = new scala.util.Random(7)
    val l = (1 to 120).map { i =>
      val lo = rnd.nextInt(500).toDouble; (i.toLong, lo, lo + 1 + rnd.nextInt(80))
    }.toDF("lid", "lo_l", "hi_l")
    val r = (1 to 120).map { i =>
      val lo = rnd.nextInt(500).toDouble; (i.toLong, lo, lo + 1 + rnd.nextInt(80))
    }.toDF("rid", "lo_r", "hi_r")
    val naive = l
      .join(r, greatest(col("lo_l"), col("lo_r")) < least(col("hi_l"), col("hi_r")))
      .select("lid", "rid").as[(Long, Long)].collect().toSeq
    for (w <- Seq(10.0, 37.0, 200.0)) {
      val got = RangeJoin.overlapJoin(l, "lo_l", "hi_l", r, "lo_r", "hi_r", cellWidth = w)
        .select("lid", "rid").as[(Long, Long)].collect().toSeq
      assert(got.sorted == naive.sorted, s"cellWidth=$w (duplicates or misses)")
      assert(got.size == got.toSet.size, s"cellWidth=$w produced duplicate pairs")
    }
  }

  test("plan is an equi-join on the cell key, not a nested loop") {
    val fact = spark.range(100).select((col("id") * 7 % 1000).cast("double").as("v"))
    val plan = RangeJoin
      .bandJoin(fact, "v", bands, "lo", "hi", cellWidth = 50.0)
      .queryExecution
      .executedPlan
      .toString
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
      s"expected hash/sort-merge equi-join, got:\n$plan")
  }
}
