package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.functions.VectorFunctions

class VectorFunctionsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  import spark.implicits._

  test("cosine expression: orthogonal, identical, opposite vectors") {
    val df = Seq(
      (Seq(1.0f, 0.0f), Seq(0.0f, 1.0f), 0.0),
      (Seq(1.0f, 2.0f), Seq(1.0f, 2.0f), 1.0),
      (Seq(1.0f, 0.0f), Seq(-1.0f, 0.0f), -1.0)
    ).toDF("a", "b", "expected")
    val rows = df.select(VectorFunctions.cosineSim(col("a"), col("b")).as("got"), col("expected")).collect()
    rows.foreach(r => assert(math.abs(r.getDouble(0) - r.getDouble(1)) < 1e-12))
  }

  test("cosine expression: null-safe and zero-vector-safe") {
    val df = Seq(
      (Some(Seq(1.0f, 1.0f)), None: Option[Seq[Float]]),
      (Some(Seq(0.0f, 0.0f)), Some(Seq(1.0f, 1.0f)))
    ).toDF("a", "b")
    val rows = df.select(VectorFunctions.cosineSim(col("a"), col("b")).as("c")).collect()
    assert(rows(0).isNullAt(0))
    assert(rows(1).getDouble(0) == 0.0)
  }

  test("cosine survives codegen (wholestage plan) and interpreted mode equally") {
    val df = (1 to 100)
      .map(i => (i.toLong, Seq.tabulate(8)(j => (i * j % 7).toFloat)))
      .toDF("id", "v")
    val q = Seq.tabulate(8)(j => (j % 3).toFloat)
    val on = df.withColumn("s", VectorFunctions.cosineSim(col("v"), typedlit(q)))
    val scores = on.orderBy(desc("s"), col("id")).select("id").limit(5).as[Long].collect()
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    try {
      val scores2 = on.orderBy(desc("s"), col("id")).select("id").limit(5).as[Long].collect()
      assert(scores.toSeq == scores2.toSeq)
    } finally spark.conf.set("spark.sql.codegen.wholeStage", "true")
  }

  test("dot product equals cosine for unit vectors, within fp tolerance") {
    val e = graft.operators.HashingEmbedder(32)
    val df = Seq("alpha beta gamma", "delta epsilon", "zeta eta theta words")
      .map(t => Tuple1(e.embedOne(t))).toDF("v")
    val q = e.embedOne("alpha beta words")
    val rows = df.select(
      VectorFunctions.dotProduct(col("v"), typedlit(q.toSeq)).as("d"),
      VectorFunctions.cosineSim(col("v"), typedlit(q.toSeq)).as("c")
    ).collect()
    rows.foreach(r => assert(math.abs(r.getDouble(0) - r.getDouble(1)) < 1e-6))
  }

  test("SQL registration works") {
    VectorFunctions.register(spark)
    val r = spark.sql("SELECT cosine_sim(array(1.0F, 0.0F), array(1.0F, 0.0F)) AS c").head()
    assert(math.abs(r.getDouble(0) - 1.0) < 1e-12)
  }
}
