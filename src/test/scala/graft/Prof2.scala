package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions
import graft.operators.TextAnalysis

/** Scratch: is enrich+filter cost codegen-compile or per-row eval? */
object Prof2 {
  def time(tag: String)(f: => Long): Unit = {
    val t0 = System.nanoTime()
    val n = f
    println(f"[prof] $tag%-34s ${(System.nanoTime() - t0) / 1e9}%8.3f s  (rows=$n)")
  }

  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000L).selectExpr("sum(id)").collect()
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    docs.count()

    def enriched: DataFrame = docs
      .withColumn("pred_lang", TextAnalysis.langId(col("text")))
      .withColumn("quality", TextAnalysis.qualityScore(col("text")))
      .withColumn("token_est", TextFunctions.tokenEstimate(col("text")).cast("long"))

    time("filter quality only")(enriched.where(col("quality") >= 0.5).count())
    time("filter quality only (2nd)")(enriched.where(col("quality") >= 0.5).count())
    time("filter lang only")(enriched.where(col("pred_lang").isin("en", "de")).count())
    time("filter lang only (2nd)")(enriched.where(col("pred_lang").isin("en", "de")).count())
    time("filter both")(enriched.where(col("quality") >= 0.5).where(col("pred_lang").isin("en", "de")).count())
    time("filter both (2nd)")(enriched.where(col("quality") >= 0.5).where(col("pred_lang").isin("en", "de")).count())
    enriched.where(col("quality") >= 0.5).where(col("pred_lang").isin("en", "de")).explain("formatted")
    spark.stop()
  }
}
