package graft.tools

import org.apache.spark.sql.functions._
import graft.GraftSession
import graft.functions.TextFunctions
import graft.operators.FtsIndex

/** Scratch profiler for the FTS index build path. Stages mirror the
  * CURRENT FtsIndex.build internals (tokenize -> explode -> tf aggregate;
  * df is query-derived since the append-only restructure, so there is no
  * build-side df stage to time anymore).
  */
object ProfileFts {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.builder(master = "local[32]", shufflePartitions = 32).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = "/root/testdata/sf0.1"
    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[profile] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    time("docs.count")(docs.count())
    val tokenized = docs
      .select(col("doc_id"), TextFunctions.ftsTokens(col("text")).as("tokens"))
      .withColumn("doc_len", size(col("tokens")))
    time("tokenize+count")(tokenized.count())
    val termFreq = tokenized
      .select(col("doc_id"), col("doc_len"), explode(col("tokens")).as("term"))
      .groupBy("doc_id", "doc_len", "term")
      .agg(count(lit(1)).as("tf"))
    time("termFreq.count (== postings)")(termFreq.count())
    time("full build")(FtsIndex.build(docs, "doc_id", "text"))
    val idx = time("cached build")(FtsIndex.buildCached("x", docs, "doc_id", "text"))
    time("search1 (incl. window df)")(FtsIndex.search(spark, idx, "spark query data", 20).collect())
    time("search2")(FtsIndex.search(spark, idx, "table scan merge", 20).collect())
    val half = docs.where(col("doc_id") % 2 === 0)
    val rest = docs.where(col("doc_id") % 2 =!= 0)
    time("incremental append (half + half)") {
      val i = FtsIndex.append(FtsIndex.build(half, "doc_id", "text"), rest, "doc_id", "text")
      i.postings.count()
    }
    spark.stop()
  }
}
