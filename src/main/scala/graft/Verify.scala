package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val (sfDir, outDir) = (args(0), args(1))
    // optional 3rd arg: comma-separated query-name subset (dev loop only;
    // the driver always runs the full inventory)
    val only: Set[String] =
      if (args.length > 2) args(2).split(",").map(_.trim).filter(_.nonEmpty).toSet else Set.empty
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // GRAFT_CHECKPOINT_DIR flips Checkpoints.pin into its reliable
    // checkpoint() branch (the cluster mode) so the determinism gate can
    // exercise it over the full inventory; unset = localCheckpoint
    sys.env.get("GRAFT_CHECKPOINT_DIR").foreach(spark.sparkContext.setCheckpointDir)
    Bench.silenceBoundedWindowWarning()
    new java.io.File(outDir).mkdirs()
    val unknown = only.diff(SparkEntry.queries.keySet)
    require(unknown.isEmpty, s"unknown query names: ${unknown.mkString(", ")}")
    val attempted = SparkEntry.queries
      .filter { case (name, _) => only.isEmpty || only.contains(name) }
    attempted.foreach { case (name, fn) =>
      try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/$name")
      catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
      }
    }
    // manifest of what SHOULD be on disk: check_oracle counts an attempted
    // query with no parquet output as a failure (a thrown query must never
    // make the gate pass by being invisible)
    Files.writeString(
      Paths.get(s"$outDir/attempted.json"),
      attempted.keys.toSeq.sorted.map(n => "\"" + n + "\"").mkString("[", ",", "]")
    )
    // JSON string escape (shared table in JsonLog.esc): a tab or CR in
    // builder-authored SQL would otherwise make the driver's json.load
    // fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + graft.util.JsonLog.esc(s) + "\""
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
  }
}
