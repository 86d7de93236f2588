package graft.tools

import org.apache.spark.sql.SparkSession

/** Generic per-query profiler — the durable replacement for the round-5
  * `Prof*.scala` scratch mains (VERDICT r5 #8): time any named
  * `SparkEntry.queries` entry N times at a given SF dir and print each
  * run plus the median, so a regression can be localized without writing
  * a new throwaway main.
  *
  * Run: sbt "runMain graft.tools.ProfileQuery <sfDir> <q_name>[,<q_name>...] [runs]"
  */
object ProfileQuery {
  def main(args: Array[String]): Unit = {
    val dir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val names =
      if (args.length > 1) args(1).split(",").toSeq
      else graft.SparkEntry.queries.keys.toSeq.sorted
    val runs = if (args.length > 2) args(2).toInt else 3
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.Bench.silenceBoundedWindowWarning()
    spark.range(1000000L).selectExpr("sum(id)").collect()
    names.foreach { name =>
      val fn = graft.SparkEntry.queries.getOrElse(
        name, sys.error(s"unknown query $name; known: ${graft.SparkEntry.queries.keys.toSeq.sorted.mkString(", ")}"))
      val times = (1 to runs).map { i =>
        val t0 = System.nanoTime()
        val n = fn(spark, dir).count()
        val sec = (System.nanoTime() - t0) / 1e9
        println(f"[profile] $name%-28s run$i ${sec}%8.3f s  (rows=$n)")
        sec
      }.sorted
      println(f"[profile] $name%-28s median ${times(times.length / 2)}%7.3f s")
    }
    spark.stop()
  }
}
