package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.DriftMonitor

class DriftMonitorSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  import spark.implicits._

  test("identical slices show zero drift") {
    val df = (Seq.fill(40)(("x", true)) ++ Seq.fill(40)(("x", false)) ++
      Seq.fill(10)(("y", true)) ++ Seq.fill(10)(("y", false)))
      .toDF("cat", "a")
    val out = DriftMonitor.categoricalDrift(df, "cat", col("a")).orderBy("category").collect()
    assert(out.length == 2)
    out.foreach { r =>
      assert(r.getAs[Long]("abs_ppm_diff") == 0L)
      assert(r.getAs[Long]("chi2_ppb") == 0L)
      assert(r.getAs[Long]("ppm_a") == r.getAs[Long]("ppm_b"))
    }
  }

  test("hand-computed ppm and chi-square on a known 2x2 table") {
    // A: 30 x, 10 y (tot 40); B: 10 x, 30 y (tot 40)
    val df = (Seq.fill(30)(("x", true)) ++ Seq.fill(10)(("y", true)) ++
      Seq.fill(10)(("x", false)) ++ Seq.fill(30)(("y", false)))
      .toDF("cat", "a")
    val out = DriftMonitor.categoricalDrift(df, "cat", col("a"))
      .orderBy("category").collect()
    val x = out(0)
    assert(x.getAs[String]("category") == "x")
    assert(x.getAs[Long]("cnt_a") == 30L && x.getAs[Long]("cnt_b") == 10L)
    assert(x.getAs[Long]("ppm_a") == 750000L && x.getAs[Long]("ppm_b") == 250000L)
    assert(x.getAs[Long]("abs_ppm_diff") == 500000L)
    // D = 30*40 - 10*40 = 800; chi2_x = D^2/((30+10)*40*40) = 640000/64000 = 10
    assert(x.getAs[Long]("chi2_ppb") == 10L * 1000000000L)
    // TVD = (|.75-.25| + |.25-.75|)/2 = 0.5 -> sum(abs_ppm_diff) = 1e6
    assert(out.map(_.getAs[Long]("abs_ppm_diff")).sum == 1000000L)
    // total chi2 = 20 == n * TVD-ish sanity; both category contributions equal
    assert(out.map(_.getAs[Long]("chi2_ppb")).sum == 20L * 1000000000L)
  }

  test("category present in only one slice still reports") {
    val df = (Seq.fill(5)(("only_a", true)) ++ Seq.fill(5)(("both", true)) ++
      Seq.fill(5)(("both", false))).toDF("cat", "a")
    val out = DriftMonitor.categoricalDrift(df, "cat", col("a"))
      .where(col("category") === "only_a").head()
    assert(out.getAs[Long]("cnt_a") == 5L && out.getAs[Long]("cnt_b") == 0L)
    assert(out.getAs[Long]("ppm_b") == 0L)
  }

  test("empty slice yields null proportions, not a crash") {
    val df = Seq.fill(10)(("x", true)).toDF("cat", "a")
    val out = DriftMonitor.categoricalDrift(df, "cat", col("a")).head()
    assert(out.getAs[Long]("ppm_a") == 1000000L)
    assert(out.isNullAt(out.fieldIndex("ppm_b")))
    assert(out.isNullAt(out.fieldIndex("chi2_ppb")))
  }

  test("drift is partition-invariant") {
    val df = spark.range(10000).select(
      concat(lit("c"), col("id") % 7).as("cat"),
      (col("id") % 3 === 0).as("a"))
    val a = DriftMonitor.categoricalDrift(df.repartition(3), "cat", col("a"))
      .orderBy("category").collect().toSeq
    val b = DriftMonitor.categoricalDrift(df.repartition(17), "cat", col("a"))
      .orderBy("category").collect().toSeq
    assert(a == b)
  }

  test("numericDrift bins clamp and route nulls to bin -1") {
    val df = Seq[(java.lang.Double, Boolean)](
      (-5.0, true),   // below lo -> bin 0
      (0.0, true),    // bin 0
      (9.9, true),    // bin 0
      (10.0, true),   // bin 1
      (95.0, true),   // bin 9
      (1000.0, true), // above hi -> clamped to bin 9
      (null, true),
      (50.0, false)
    ).toDF("v", "a")
    val out = DriftMonitor.numericDrift(df, "v", col("a"), lo = 0.0, hi = 100.0, nBins = 10)
      .orderBy("bin").collect()
    val counts = out.map(r => r.getAs[Long]("bin") -> (r.getAs[Long]("cnt_a"), r.getAs[Long]("cnt_b"))).toMap
    assert(counts(-1L) == (1L, 0L))
    assert(counts(0L) == (3L, 0L))
    assert(counts(1L) == (1L, 0L))
    assert(counts(5L) == (0L, 1L))
    assert(counts(9L) == (2L, 0L))
  }

  test("statsFromCounts: chi-square exact at counts where a naive D^2*1e9 overflows decimal(38,0)") {
    // the monitor's own alarm case: a source wholly in one slice at 2e7
    // rows/slice — D^2 * 1e9 = 1.6e38 would overflow the 38-digit cap,
    // so the two-step quotient+remainder scaling must carry it exactly
    val counts = Seq(
      ("gone_silent", 20000000L, 0L),
      ("other", 0L, 20000000L)
    ).toDF("category", "cnt_a", "cnt_b")
    val out = DriftMonitor.statsFromCounts(counts).orderBy("category").collect()
    out.foreach { r =>
      assert(r.getAs[Long]("chi2_ppb") == 20000000000000000L,
        s"exact chi2 x 1e9 = N = 4e7 -> 2e16 ppb per category: $r")
      assert(r.getAs[Long]("abs_ppm_diff") == 1000000L)
    }
  }

  test("statsFromCounts: exact at billions of rows per slice (python-verified value)") {
    val counts = Seq(
      ("x", 2000000000L, 1000000000L),
      ("y", 1000000000L, 1500000000L)
    ).toDF("category", "cnt_a", "cnt_b")
    val x = DriftMonitor.statsFromCounts(counts)
      .where(col("category") === "x").head()
    assert(x.getAs[Long]("ppm_a") == 666666L && x.getAs[Long]("ppm_b") == 400000L)
    assert(x.getAs[Long]("chi2_ppb") == 177777777777777777L,
      s"exact ((D^2)*1e9)//(n*tot_a*tot_b): got ${x.getAs[Long]("chi2_ppb")}")
  }

  test("numericDrift routes NaN and infinities to bin -1, never the lo/hi edges") {
    val df = Seq[(java.lang.Double, Boolean)](
      (Double.NaN, true),
      (Double.PositiveInfinity, true),
      (Double.NegativeInfinity, false),
      (5.0, true)
    ).toDF("v", "a")
    val out = DriftMonitor.numericDrift(df, "v", col("a"), 0.0, 100.0, 10)
      .orderBy("bin").collect()
    val counts = out.map(r => r.getAs[Long]("bin") -> (r.getAs[Long]("cnt_a"), r.getAs[Long]("cnt_b"))).toMap
    assert(counts(-1L) == (2L, 1L), s"non-finite values must not masquerade as edge bins: $counts")
    assert(counts(0L) == (1L, 0L))
  }

  test("embeddingDrift: exact shift at millions of vectors per slice; non-finite vectors excluded") {
    // 4e6 vectors per slice, constant component 0.75 vs 0.25 -> quantized
    // sums 750*4e6 vs 250*4e6; raw-long sum*cnt would be 1.2e16*4e6 =
    // overflow; decimal cross products keep it exact: shift = 500*1000
    val n = 4000000
    val df = spark.range(2L * n).select(
      org.apache.spark.sql.functions.array(
        when(col("id") < n, 0.75f).otherwise(0.25f)).as("vec"),
      (col("id") < n).as("a"))
    val out = DriftMonitor.embeddingDrift(df, "vec", col("a")).head()
    assert(out.getAs[Long]("cnt_a") == n && out.getAs[Long]("cnt_b") == n)
    assert(out.getAs[Long]("shift_milliq") == 500000L,
      s"mean shift 0.5 = 500 quantized units = 500000 milli-q: $out")

    val withBad = Seq(
      (Seq(Float.NaN), true), (Seq(0.5f), true), (Seq(0.5f), false),
      (Seq(Float.PositiveInfinity), false)
    ).toDF("vec", "a")
    val clean = DriftMonitor.embeddingDrift(withBad, "vec", col("a")).head()
    assert(clean.getAs[Long]("cnt_a") == 1L && clean.getAs[Long]("cnt_b") == 1L,
      "non-finite vectors must be excluded, not quantized to garbage")
  }

  test("embeddingDrift: hand-computed per-dim shift, including negative (truncating DIV)") {
    // A: vectors (1.0, -0.5), (0.5, -0.25); B: (0.25, 0.5)
    // quantized (scale 1000): A sums = (1500, -750); B sums = (250, 500)
    // dim1: (1500*1 - 250*2)*1000 / 2 = 500000  -> mean shift +500 milli-q
    // dim2: (-750*1 - 500*2)*1000 / 2 = -875000 (truncation exact here)
    val df = Seq(
      (Seq(1.0f, -0.5f), true),
      (Seq(0.5f, -0.25f), true),
      (Seq(0.25f, 0.5f), false)
    ).toDF("vec", "a")
    val out = DriftMonitor.embeddingDrift(df, "vec", col("a")).orderBy("dim").collect()
    assert(out.map(_.getAs[Long]("dim")).toSeq == Seq(1L, 2L))
    val d1 = out(0); val d2 = out(1)
    assert(d1.getAs[Long]("sum_a") == 1500L && d1.getAs[Long]("sum_b") == 250L)
    assert(d1.getAs[Long]("shift_milliq") == 500000L)
    assert(d2.getAs[Long]("sum_a") == -750L && d2.getAs[Long]("sum_b") == 500L)
    assert(d2.getAs[Long]("shift_milliq") == -875000L)
    assert(d2.getAs[Long]("abs_shift_milliq") == 875000L)
  }

  test("embeddingDrift: truncation toward zero on a non-exact negative quotient") {
    // A: (0.0), (0.001); B: (0.002), (0.002), (0.002)
    // sums: a=1, b=6; D = 1*3 - 6*2 = -9; -9*1000/(2*3) = -1500 exactly;
    // use counts that do not divide: A has 3 vectors -> D = 1*3 - 6*3 = -15,
    // -15000/9 = -1666.66 -> trunc -1666 (floor would give -1667)
    val df = Seq(
      (Seq(0.0f), true), (Seq(0.001f), true), (Seq(0.0f), true),
      (Seq(0.002f), false), (Seq(0.002f), false), (Seq(0.002f), false)
    ).toDF("vec", "a")
    val out = DriftMonitor.embeddingDrift(df, "vec", col("a")).head()
    assert(out.getAs[Long]("sum_a") == 1L && out.getAs[Long]("sum_b") == 6L)
    assert(out.getAs[Long]("shift_milliq") == -1666L,
      s"DIV must truncate toward zero like the oracle's //: got ${out.getAs[Long]("shift_milliq")}")
  }

  test("embeddingDrift: identical slices drift zero; null vectors excluded") {
    val df = Seq(
      (Seq(0.5f, 0.5f), true), (Seq(0.5f, 0.5f), false),
      (null.asInstanceOf[Seq[Float]], true)
    ).toDF("vec", "a")
    val out = DriftMonitor.embeddingDrift(df, "vec", col("a")).orderBy("dim").collect()
    out.foreach { r =>
      assert(r.getAs[Long]("cnt_a") == 1L && r.getAs[Long]("cnt_b") == 1L)
      assert(r.getAs[Long]("shift_milliq") == 0L)
    }
  }

  test("embeddingDrift is partition-invariant") {
    val df = spark.range(1000).select(
      org.apache.spark.sql.functions.array(
        (col("id") % 13).cast("float") / 13f,
        (col("id") % 7).cast("float") / 7f).as("vec"),
      (col("id") % 3 === 0).as("a"))
    val a = DriftMonitor.embeddingDrift(df.repartition(2), "vec", col("a")).orderBy("dim").collect().toSeq
    val b = DriftMonitor.embeddingDrift(df.repartition(11), "vec", col("a")).orderBy("dim").collect().toSeq
    assert(a == b)
  }

  test("a shifted numeric distribution shows mass moving between bins") {
    val df = spark.range(2000).select(
      when(col("id") < 1000, col("id") % 100)
        .otherwise(col("id") % 100 + 50).cast("double").as("v"),
      (col("id") < 1000).as("a"))
    val out = DriftMonitor.numericDrift(df, "v", col("a"), 0.0, 200.0, 4)
      .orderBy("bin").collect()
    // slice A occupies bins 0-1, slice B bins 1-2: bins 0 and 2 fully drift
    val m = out.map(r => r.getAs[Long]("bin") -> r).toMap
    assert(m(0L).getAs[Long]("cnt_b") == 0L)
    assert(m(2L).getAs[Long]("cnt_a") == 0L)
    assert(m(0L).getAs[Long]("abs_ppm_diff") == 500000L)
  }
}
