package graft.tools

import scala.collection.mutable

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}

/** Stage-level profiler + plan-file dumper for the optimization rounds
  * (guide §1: measure first, §7.2: read the plan). For each named
  * `SparkEntry.queries` entry, under the EXACT bench session config
  * ([[graft.Bench.benchSession]] — local[$SPARK_GRAFT_CPUS], AQE on,
  * shuffle.partitions=cpus, 64 MB broadcast threshold):
  *
  *   - optionally writes `<plansDir>/<query>_<suffix>.txt` with the
  *     `explain("formatted")` physical plan (the `plans/r18/` artifact
  *     the judge checks plan claims against);
  *   - times the query (same `.count()` action the bench uses) and
  *     prints every completed stage's wall time, summed executor run
  *     time, task count, and shuffle read/write bytes — the empirical
  *     loop's "which stage is the money going to" table without the UI.
  *
  * Run: sbt "runMain graft.tools.StageProfile <sfDir> <q1,q2,...> [plansDir] [suffix]"
  */
object StageProfile {
  def main(args: Array[String]): Unit = {
    val dir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val names =
      if (args.length > 1) args(1).split(",").toSeq
      else Seq("q_rrf_hybrid")
    val plansDir = if (args.length > 2 && args(2).nonEmpty) Some(args(2)) else None
    val suffix = if (args.length > 3) args(3) else "before"

    val spark = graft.Bench.benchSession("graft-stage-profile")
    graft.Bench.silenceBoundedWindowWarning()
    // same warm-up the bench runs
    spark.range(1000000L).selectExpr("sum(id)").collect()
    spark.read.parquet(s"$dir/lineitem.parquet").count()

    final case class St(id: Int, name: String, tasks: Int, wallMs: Long,
        runMs: Long, srdKb: Long, swrKb: Long)
    val stages = mutable.ArrayBuffer[St]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(ev: SparkListenerStageCompleted): Unit = {
        val si = ev.stageInfo
        val tm = si.taskMetrics
        val wall = (for { a <- si.completionTime; b <- si.submissionTime } yield a - b).getOrElse(-1L)
        stages.synchronized {
          stages += St(si.stageId, si.name.takeWhile(_ != '\n').take(96), si.numTasks,
            wall, tm.executorRunTime,
            tm.shuffleReadMetrics.totalBytesRead / 1024,
            tm.shuffleWriteMetrics.bytesWritten / 1024)
        }
      }
    })

    names.foreach { name =>
      val fn = graft.SparkEntry.queries.getOrElse(
        name, sys.error(s"unknown query $name"))
      plansDir.foreach { pd =>
        val df = fn(spark, dir)
        val txt = df.queryExecution.explainString(
          org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
        java.nio.file.Files.createDirectories(java.nio.file.Paths.get(pd))
        java.nio.file.Files.writeString(
          java.nio.file.Paths.get(pd, s"${name}_$suffix.txt"), txt)
      }
      spark.sparkContext.setJobDescription(name)
      // three runs like the bench: run 1 bills codegen compilation and
      // first-touch index builds; the median is the comparable number
      // and the stage table comes from the WARM third run
      var n = 0L
      val walls = (1 to 3).map { i =>
        if (i == 3) stages.synchronized(stages.clear())
        val t0 = System.nanoTime()
        n = fn(spark, dir).count()
        (System.nanoTime() - t0) / 1e9
      }
      spark.sparkContext.setJobDescription(null)
      Thread.sleep(300) // let async listener events drain
      val snap = stages.synchronized(stages.toSeq)
      val nStages = snap.length
      val totRun = snap.map(_.runMs).sum
      val med = walls.sorted.apply(1)
      println(f"== $name%-26s med=${med}%7.3f s  runs=${walls.map(w => f"$w%.3f").mkString("/")}  rows=$n%-8d stages=$nStages  warmRun=${totRun}ms")
      snap.sortBy(s => -s.runMs).take(14).foreach { s =>
        println(f"   stage ${s.id}%4d tasks=${s.tasks}%3d wall=${s.wallMs}%6dms run=${s.runMs}%7dms sread=${s.srdKb}%8dKB swrite=${s.swrKb}%8dKB  ${s.name}")
      }
    }
    spark.stop()
  }
}
