package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.Sketches

class SketchesSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  import spark.implicits._

  test("kmv is exact below k") {
    val df = spark.range(100).select(col("id").as("v"))
    val row = Sketches.kmvDistinct(df, "v", k = 256).head()
    assert(row.getAs[Long]("k_used") == 100L)
    assert(row.getAs[Double]("kmv_estimate") == 100.0)
  }

  test("kmv estimate lands within 3 standard errors at n >> k") {
    val n = 20000
    val k = 256
    val df = spark.range(n).select(concat(lit("doc-"), col("id")).as("v"))
    val est = Sketches.kmvDistinct(df, "v", k).head().getAs[Double]("kmv_estimate")
    // KMV relative standard error ~ 1/sqrt(k-2)
    val se = n / math.sqrt(k - 2)
    assert(math.abs(est - n) < 3 * se, s"estimate $est too far from $n (3se=${3 * se})")
  }

  test("kmv ignores duplicates and nulls") {
    val df = (Seq.fill(50)("a") ++ Seq.fill(30)("b") ++ Seq(null, null))
      .toDF("v")
    val row = Sketches.kmvDistinct(df, "v", k = 16).head()
    assert(row.getAs[Long]("k_used") == 2L)
    assert(row.getAs[Double]("kmv_estimate") == 2.0)
  }

  test("kmv is deterministic across repartitionings") {
    val df = spark.range(5000).select(concat(lit("x"), col("id")).as("v"))
    val a = Sketches.kmvDistinct(df.repartition(3), "v", 64).head()
    val b = Sketches.kmvDistinct(df.repartition(17), "v", 64).head()
    assert(a == b)
  }
}
