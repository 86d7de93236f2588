package graft

import org.apache.spark.sql.SparkSession

/** One shared local SparkSession for all suites (object = JVM singleton). */
object SparkTestBase {
  lazy val spark: SparkSession = {
    val s = GraftSession
      .builder(master = "local[4]", shufflePartitions = 4)
      .appName("graft-test")
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    s
  }
}
