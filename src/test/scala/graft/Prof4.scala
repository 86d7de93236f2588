package graft
import org.apache.spark.sql.SparkSession
object Prof4 {
  def main(args: Array[String]): Unit = {
    val dir = "/root/testdata/sf0.1"
    val spark = GraftSession.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    for (name <- Seq("q_bigram_lift", "q_bigram_lift", "q_kmv_by_group")) {
      val t0 = System.nanoTime()
      val n = SparkEntry.queries(name)(spark, dir).count()
      println(f"[prof4] $name%-18s ${(System.nanoTime() - t0) / 1e9}%7.3f s (rows=$n)")
    }
    spark.stop()
  }
}
