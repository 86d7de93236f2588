package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.GraphOps

/** Scratch profiling main (test scope, not shipped): q_triangles stage
  * costs — where do 5.9s at sf0.1 go, and does the array-pairs edge
  * build beat the self-join build?
  * Run: sbt "Test/runMain graft.Prof6 /root/testdata/sf0.1"
  */
object Prof6 {
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
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000L).selectExpr("sum(id)").collect()

    def cp = spark.read.parquet(s"$dir/orders.parquet")
      .join(spark.read.parquet(s"$dir/lineitem.parquet"), col("o_orderkey") === col("l_orderkey"))
      .select(col("o_custkey").as("c"), col("l_partkey").as("p"))
      .distinct()

    time("cp distinct")(cp.count())

    def edgesJoin = cp.as("a")
      .join(cp.as("b"), col("a.p") === col("b.p") && col("a.c") < col("b.c"))
      .groupBy(col("a.c").as("u"), col("b.c").as("v"))
      .agg(count(lit(1)).as("shared"))
      .where(col("shared") >= 3)
      .select("u", "v")

    def edgesArray = cp
      .groupBy("p").agg(sort_array(collect_list(col("c"))).as("cs"))
      .select(explode(expr(
        "flatten(transform(cs, (x, i) -> transform(slice(cs, i + 2, size(cs)), y -> struct(x AS u, y AS v))))"
      )).as("e"))
      .groupBy(col("e.u").as("u"), col("e.v").as("v"))
      .agg(count(lit(1)).as("shared"))
      .where(col("shared") >= 3)
      .select("u", "v")

    for (i <- 1 to 2) {
      time(s"edges self-join #$i")(edgesJoin.count())
      time(s"edges array-pairs #$i")(edgesArray.count())
    }
    val ej = edgesJoin.localCheckpoint(); ej.count()
    time("triangles on cached edges")(GraphOps.triangles(ej, "u", "v").count())
    time("full q (self-join)")(GraphOps.triangles(edgesJoin, "u", "v").count())
    time("full q (array-pairs)")(GraphOps.triangles(edgesArray, "u", "v").count())
    spark.stop()
  }
}
