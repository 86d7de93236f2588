package graft

import org.apache.spark.sql.SparkSession

/** Scratch: time q_dedup_clusters / q_simhash_pairs at a given SF dir. */
object Prof3 {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = GraftSession.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    for (name <- Seq("q_simhash_pairs", "q_dedup_clusters", "q_dedup_clusters")) {
      val t0 = System.nanoTime()
      val n = SparkEntry.queries(name)(spark, dir).count()
      println(f"[prof3] $name%-22s ${(System.nanoTime() - t0) / 1e9}%7.3f s (rows=$n)")
    }
    spark.stop()
  }
}
