package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions
import graft.operators.{Curation, Dedup, TextAnalysis}

/** Scratch profiling main (test scope, not shipped): times curation
  * stages at a given SF dir to locate where q_curation's per-row cost
  * lives. Run: sbt "Test/runMain graft.Prof /root/testdata/sf0.1"
  */
object Prof {
  def time(tag: String)(f: => Long): Unit = {
    val t0 = System.nanoTime()
    val n = f
    println(f"[prof] $tag%-28s ${(System.nanoTime() - t0) / 1e9}%8.3f s  (rows=$n)")
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
    def filtered: DataFrame = enriched
      .where(col("quality") >= 0.5)
      .where(col("pred_lang").isin("en", "de"))

    time("enrich only")(enriched.count())
    time("enrich only (2nd)")(enriched.count())
    time("enrich+filter")(filtered.count())
    time("langId only")(docs.select(TextAnalysis.langId(col("text"))).count())
    time("quality only")(docs.select(TextAnalysis.qualityScore(col("text"))).count())
    time("curate (current)")(Curation.curate(docs, "doc_id", "text", Set("en", "de"), 0.5).count())
    time("curate (current, 2nd)")(Curation.curate(docs, "doc_id", "text", Set("en", "de"), 0.5).count())
    val ckpt = filtered.localCheckpoint()
    time("dedup on checkpointed")(Dedup.exactDedup(ckpt, "doc_id", "text").count())
    time("curate ckpt variant") {
      val f = filtered.localCheckpoint()
      Dedup.exactDedup(f, "doc_id", "text").count()
    }
    spark.stop()
  }
}
