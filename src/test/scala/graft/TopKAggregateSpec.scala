package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.plans.TopKBy

class TopKAggregateSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  import spark.implicits._

  test("top_k_by matches the window row_number formulation exactly") {
    val rnd = new scala.util.Random(11)
    val df = (1 to 5000)
      .map(i => (i % 17L, rnd.nextInt(100).toDouble, i.toLong))
      .toDF("g", "score", "id")
      .repartition(8) // force partial heaps + merge across partitions

    val viaAgg = df
      .groupBy("g")
      .agg(TopKBy.topKBy(col("score"), col("id"), 3).as("top"))
      .select(col("g"), expr("transform(top, x -> x.id)").as("ids"))
      .collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1).toList)
      .toMap

    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("g").orderBy(desc("score"), col("id"))
    val viaWindow = df
      .withColumn("rn", row_number().over(w))
      .where(col("rn") <= 3)
      .orderBy("g", "rn")
      .collect()
      .groupBy(_.getLong(0))
      .map { case (g, rows) => g -> rows.sortBy(_.getAs[Int]("rn")).map(_.getAs[Long]("id")).toList }

    assert(viaAgg == viaWindow)
  }

  test("top_k_by: groups smaller than k, duplicate scores, deterministic ties") {
    val df = Seq(
      (1L, 5.0, 10L), (1L, 5.0, 11L), (1L, 5.0, 12L), (1L, 4.0, 13L),
      (2L, 1.0, 20L)
    ).toDF("g", "score", "id")
    val got = df.groupBy("g")
      .agg(TopKBy.topKBy(col("score"), col("id"), 3).as("top"))
      .select(col("g"), expr("transform(top, x -> x.id)").as("ids"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toList).toMap
    assert(got(1L) == List(10L, 11L, 12L), "ties resolve by smaller id")
    assert(got(2L) == List(20L), "undersized group keeps all")
  }

  test("top_k_by aggregates without a sort in the plan") {
    val df = (1 to 100).map(i => (i % 5L, i.toDouble, i.toLong)).toDF("g", "score", "id")
    val plan = df.groupBy("g").agg(TopKBy.topKBy(col("score"), col("id"), 2))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Sort "), s"unexpected sort in plan:\n$plan")
  }
}
