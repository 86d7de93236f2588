package graft

/** Flagship smoke: run SparkEntry.entry (the driver's rows>0 check) and
  * print the result — a fast end-to-end drive of the hybrid-search path.
  */
object Smoke {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.builder(master = "local[8]", shufflePartitions = 8).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val df = SparkEntry.entry(spark)
    df.show(20, truncate = false)
    println(s"[smoke] entry rows = ${df.count()}")
    spark.stop()
  }
}
