package graft.tools

import org.apache.spark.sql.SparkSession

/** Standalone noise-canary probe runner (r16 verdict #4): the bench's
  * fixed-work calibration job ([[graft.Bench]]'s `calProbe` — a 200M-row
  * arithmetic sum over a pinned 32-partition range, no IO), run N times
  * back-to-back after warm-up and printed as one JSON line. This is the
  * instrument BASELINE.md's load-normalization rule is calibrated
  * against; re-run it on a quiet container whenever the rule's reference
  * band looks stale (the r16 lesson: the band set in round 9 drifted a
  * full 2× below its midpoint as the container quieted, so a probe the
  * rule read as "quiet" actually marked a ~2×-loaded window).
  *
  * Usage: `sbt "runMain graft.tools.Canary [nProbes]"` (default 12).
  */
object Canary {
  def main(args: Array[String]): Unit = {
    val n = if (args.nonEmpty) args(0).toInt else 12
    // the EXACT session the bench builds (ADVICE r17: a canary session
    // configured differently — thread count, shuffle partitions — times
    // the shared probe under different parallelism and recalibrates the
    // quiet band against an instrument the bench does not have)
    val spark = graft.Bench.benchSession("graft-canary")
    // warm-up: JIT + codegen, identical to Bench's preamble shape
    spark.range(1000000L).selectExpr("sum(id)").collect()
    // the ONE probe definition shared with Bench's in-artifact
    // calibration — recalibrating against a different workload would
    // silently invalidate BASELINE.md's band
    def probe(): Double = graft.Bench.calProbe(spark)
    probe() // one unrecorded warm probe
    val xs = (1 to n).map(_ => probe())
    val sorted = xs.sorted
    val median = sorted(n / 2)
    println(
      f"""{"metric":"canary","n":$n,"min":${sorted.head}%.3f,"median":$median%.3f,""" +
        f""""max":${sorted.last}%.3f,"probes":[${xs.map(x => f"$x%.3f").mkString(",")}]}""")
    spark.stop()
  }
}
