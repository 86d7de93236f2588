package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.AsOfJoin

class AsOfJoinSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  import spark.implicits._

  test("asof join: latest right row at or before each left ts, per key") {
    val left = Seq(
      (1L, 10L, 100L), // key 1, ts 10
      (2L, 15L, 101L),
      (1L, 20L, 102L),
      (3L, 5L, 103L) // no preceding right row
    ).toDF("k", "ts", "lid")
    val right = Seq(
      (1L, 5L, 7.0), (1L, 10L, 8.0), (1L, 18L, 9.0), // ts==10 ties with left 100
      (2L, 14L, 5.5),
      (3L, 6L, 1.0) // after left ts 5
    ).toDF("k", "ts", "rv")

    val got = AsOfJoin.asofJoin(left, right, "k", "ts", Seq("rv"))
      .collect()
      .map(r => r.getAs[Long]("lid") -> Option(r.getAs[Any]("asof_rv")))
      .toMap

    assert(got(100L).contains(8.0), "equal timestamps match (<= semantics)")
    assert(got(101L).contains(5.5))
    assert(got(102L).contains(9.0), "latest preceding wins")
    assert(got(103L).isEmpty, "no preceding right row -> null")
  }

  test("asof join: NULL right values carry as NULL, not stitched from older rows") {
    val left = Seq((1L, 6L, 100L)).toDF("k", "ts", "lid")
    val right = Seq(
      (1L, 1L, Some(10.0), 900L),
      (1L, 5L, None: Option[Double], 901L) // latest row has NULL value
    ).toDF("k", "ts", "rv", "rid")
    val out = AsOfJoin.asofJoin(left, right, "k", "ts", Seq("rid", "rv")).head()
    assert(out.getAs[Long]("asof_rid") == 901L)
    assert(out.isNullAt(out.fieldIndex("asof_rv")),
      "value must come from the matched row (901), which is NULL — not from row 900")
  }
}
