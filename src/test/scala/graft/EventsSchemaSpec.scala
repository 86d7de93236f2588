package graft

import java.nio.file.Files
import java.time.{LocalDateTime, ZoneOffset}
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Pins `SparkEntry.events`' ts_us derivation for BOTH physical encodings
  * the driver has shipped for events.parquet:
  *   - timestamp[us] (read as TIMESTAMP_NTZ by Spark 4's parquet reader)
  *   - TIMESTAMP(NANOS) (surfaced only as a nanos long under
  *     `spark.sql.legacy.parquet.nanosAsLong`)
  * Both must yield microseconds-since-epoch equal to DuckDB's
  * `epoch_us(ts)` over the naive timestamp. The r7 bench regression
  * (12 event queries failing with DATATYPE_MISMATCH on `ts DIV 1000`)
  * is exactly the first branch; this spec fails on that code.
  */
class EventsSchemaSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark

  private val wallTimes = Seq(
    "2024-03-01T12:00:00",
    "2024-03-01T12:30:15",
    "2024-07-04T23:59:59"
  ).map(LocalDateTime.parse)

  private def expectedMicros: Seq[Long] =
    wallTimes.map(_.toInstant(ZoneOffset.UTC).toEpochMilli * 1000L)

  private def readTsUs(dir: String): Seq[Long] =
    SparkEntry
      .events(spark, dir)
      .orderBy("event_id")
      .select("ts_us")
      .collect()
      .map(_.getLong(0))
      .toSeq

  private def baseRows = wallTimes.zipWithIndex.map { case (t, i) =>
    (i.toLong, t, i.toLong, "view", 1.5, "{}")
  }

  test("timestamp[us] (TIMESTAMP_NTZ) events derive ts_us = epoch micros") {
    val dir = Files.createTempDirectory("graft-events-us").toString
    import spark.implicits._
    baseRows
      .toDF("event_id", "ts_raw", "user_id", "event_type", "value", "props")
      // LocalDateTime encodes as TIMESTAMP_NTZ, the exact type Spark 4
      // infers for parquet timestamp[us] without isAdjustedToUTC
      .withColumn("ts", col("ts_raw"))
      .drop("ts_raw")
      .select("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    assert(readTsUs(dir) == expectedMicros)
  }

  test("nanos-as-long events derive ts_us = epoch micros (legacy encoding)") {
    val dir = Files.createTempDirectory("graft-events-ns").toString
    import spark.implicits._
    wallTimes.zipWithIndex
      .map { case (t, i) =>
        (i.toLong, t.toInstant(ZoneOffset.UTC).toEpochMilli * 1000000L, i.toLong, "view", 1.5, "{}")
      }
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    assert(readTsUs(dir) == expectedMicros)
  }

  test("the real testdata events table yields non-null strictly-typed ts_us") {
    val df = SparkEntry.events(spark, "/root/testdata/sf0.001")
    assert(df.schema("ts_us").dataType == org.apache.spark.sql.types.LongType)
    assert(df.where(col("ts_us").isNull).isEmpty)
  }

  test("ts_us is timezone-independent and events() never mutates the caller's timezone") {
    val utc = SparkEntry.events(spark, "/root/testdata/sf0.001")
      .orderBy("event_id").select("ts_us").limit(5).collect().map(_.getLong(0)).toSeq
    val prev = spark.conf.get("spark.sql.session.timeZone")
    try {
      spark.conf.set("spark.sql.session.timeZone", "America/New_York")
      val ny = SparkEntry.events(spark, "/root/testdata/sf0.001")
        .orderBy("event_id").select("ts_us").limit(5).collect().map(_.getLong(0)).toSeq
      assert(ny == utc, "epoch derivation must not depend on the session timezone")
      assert(spark.conf.get("spark.sql.session.timeZone") == "America/New_York",
        "events() must not overwrite the caller's session timezone as a side effect")
    } finally spark.conf.set("spark.sql.session.timeZone", prev)
  }
}
