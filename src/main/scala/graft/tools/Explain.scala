package graft.tools

import graft.{GraftSession, SparkEntry}

/** Print formatted physical plans for selected queries — the scale-review
  * loop: check PushedFilters reach the scans, dimensions broadcast, and
  * WholeStageCodegen spans stay wide.
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.builder(master = "local[4]", shufflePartitions = 4).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.01"
    val names =
      if (args.length > 1) args.drop(1).toSeq
      else Seq("q_filter_range", "q_join_revenue_by_region", "q_anti_join",
        "q_ann_cosine", "q_topk_orders", "q_pricing_summary")
    names.foreach { n =>
      println(s"\n========== $n ==========")
      SparkEntry.queries(n)(spark, dir).explain("formatted")
    }
    spark.stop()
  }
}
