package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.TimeSeries

class TimeSeriesSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  import spark.implicits._

  test("gapFillCounts: every bin present, gaps zero, counts exact") {
    // bins of 10us: events at 5,7 (bin 0), 25 (bin 20), none in bin 10
    val ts = Seq(5L, 7L, 25L).toDF("ts_us")
    val out = TimeSeries.gapFillCounts(ts, "ts_us", 10L)
      .orderBy("bin_start_us")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(out == Seq((0L, 2L), (10L, 0L), (20L, 1L)), out.toString)
  }

  test("gapFillCounts: empty input yields an empty frame; unit blunder is caught") {
    assert(TimeSeries.gapFillCounts(Seq.empty[Long].toDF("ts_us"), "ts_us", 10L).count() == 0)
    val wide = Seq(0L, 1000000000000L).toDF("ts_us")
    val err = intercept[IllegalArgumentException] {
      TimeSeries.gapFillCounts(wide, "ts_us", 1L, maxBins = 1000L).count()
    }
    assert(err.getMessage.contains("wrong unit"))
  }

  test("gapFillCounts: single bin, and bins aligned to the bin width not the min") {
    // min ts 17 -> its bin starts at 10, not 17
    val out = TimeSeries.gapFillCounts(Seq(17L, 19L).toDF("ts_us"), "ts_us", 10L)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(out == Seq((10L, 2L)), out.toString)
  }

  test("transitionCounts: per-entity bigrams, first event excluded, entities isolated") {
    // user 1: a -> b -> b ; user 2: b -> a ; transitions never span users
    val ev = Seq(
      (1L, 10L, 1L, "a"), (1L, 20L, 2L, "b"), (1L, 30L, 3L, "b"),
      (2L, 5L, 4L, "b"), (2L, 6L, 5L, "a")
    ).toDF("user_id", "ts_us", "event_id", "event_type")
    val got = TimeSeries.transitionCounts(ev, "user_id", Seq(col("ts_us"), col("event_id")), "event_type")
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    assert(got == Set(("a", "b", 1L), ("b", "b", 1L), ("b", "a", 1L)), got.toString)
  }
}
