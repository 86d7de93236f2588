package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.Sampling

class SamplingSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  import spark.implicits._

  private lazy val docs = (1L to 2000L).map(i => (i, if (i % 2 == 0) "en" else "de"))
    .toDF("id", "lang")

  test("stratified sample is deterministic and tracks the requested fractions") {
    val take = Sampling.stratifiedSample(docs, "lang", "id", Map("en" -> 0.5, "de" -> 0.2))
    val again = Sampling.stratifiedSample(docs, "lang", "id", Map("en" -> 0.5, "de" -> 0.2))
    assert(take.collect().map(_.getLong(0)).toSet == again.collect().map(_.getLong(0)).toSet,
      "same ids every run")

    val byLang = take.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(math.abs(byLang("en") - 500L) < 75, s"~50% of 1000 en docs, got ${byLang("en")}")
    assert(math.abs(byLang("de") - 200L) < 60, s"~20% of 1000 de docs, got ${byLang("de")}")

    // fallback 0.0 drops unlisted strata entirely
    assert(Sampling.stratifiedSample(docs, "lang", "id", Map("en" -> 1.0)).where($"lang" === "de").count() == 0)
    // fraction 1.0 keeps the stratum whole
    assert(Sampling.stratifiedSample(docs, "lang", "id", Map("en" -> 1.0)).count() == 1000)
  }

  test("train/val/test split: exhaustive, disjoint, ~80/10/10, stable under repartitioning") {
    val split = Sampling.withSplit(docs, "id")
    val counts = split.groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts.values.sum == 2000)
    assert(math.abs(counts("train") - 1600L) < 120, counts.toString)
    assert(math.abs(counts("val") - 200L) < 70, counts.toString)
    assert(math.abs(counts("test") - 200L) < 70, counts.toString)

    // membership is a pure function of the id: immune to partitioning
    val shuffled = Sampling.withSplit(docs.repartition(7, $"lang"), "id")
    val a = split.select("id", "split").collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val b = shuffled.select("id", "split").collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(a == b)
  }

  test("invalid fractions and splits are rejected") {
    intercept[IllegalArgumentException](
      Sampling.stratifiedSample(docs, "lang", "id", Map("en" -> 1.5)))
    intercept[IllegalArgumentException](Sampling.withSplit(docs, "id", trainPct = 95, valPct = 10))
  }

  test("weighted Bernoulli keep-rate tracks the weight and is partition-independent") {
    import org.apache.spark.sql.functions.{col, lit, when}
    val rows = spark.range(4000).select(
      col("id"),
      // half the corpus weight 100, half weight 400 -> keep rates 10% / 40%
      when(col("id") % 2 === 0, lit(100L)).otherwise(lit(400L)).as("wt")
    )
    val kept = Sampling.weightedBernoulli(rows, "id", "wt", rateNum = 1, rateDen = 1000)
    val byWt = kept.groupBy("wt").count().collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // 2000 trials each; 3 sigma ~ 3*sqrt(2000*p*(1-p)) ~ 40 / 66
    assert(math.abs(byWt(100L) - 200L) < 60, byWt.toString)
    assert(math.abs(byWt(400L) - 800L) < 90, byWt.toString)

    val again = Sampling.weightedBernoulli(rows.repartition(13), "id", "wt", 1, 1000)
    assert(again.select("id").collect().map(_.getLong(0)).toSet ==
      kept.select("id").collect().map(_.getLong(0)).toSet)
  }

  test("weighted Bernoulli samples are monotone in rate (progressive sampling)") {
    import org.apache.spark.sql.functions.col
    val rows = spark.range(2000).select(col("id"), (col("id") % 97 + 1).as("wt"))
    // same hash coin at every rate -> raising the rate only ADDS rows.
    // This is the property that lets a 100 TB pipeline grow a sample
    // (1% -> 5% -> 25%) without re-reading or churning earlier picks.
    val sets = Seq(1L, 5L, 25L).map { num =>
      Sampling.weightedBernoulli(rows, "id", "wt", num, 10000)
        .select("id").as[Long].collect().toSet
    }
    assert(sets(0).subsetOf(sets(1)) && sets(1).subsetOf(sets(2)),
      s"sizes: ${sets.map(_.size)}")
    assert(sets(0).size < sets(2).size, "higher rate must actually add rows")
  }

  test("temperature sampling: sqrt allocation, smallest stratum whole, partition-independent") {
    // strata of 1600 / 400 / 100 rows: keep rates 1/4, 1/2, 1 ->
    // expected survivors ~400 / ~200 / 100 (sqrt-proportional: 4:2:1)
    val skewed = ((1L to 1600L).map(i => (i, "big")) ++
      (2001L to 2400L).map(i => (i, "mid")) ++
      (3001L to 3100L).map(i => (i, "rare"))).toDF("id", "stratum")
    val kept = Sampling.temperatureSample(skewed, "stratum", "id")
      .groupBy("stratum").count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(kept("rare") == 100L, s"smallest stratum must survive whole: $kept")
    assert(math.abs(kept("big") - 400.0) < 60, s"big ~ 1600*sqrt(100/1600) = 400: $kept")
    assert(math.abs(kept("mid") - 200.0) < 40, s"mid ~ 400*sqrt(100/400) = 200: $kept")

    // deterministic under repartitioning
    val a = Sampling.temperatureSample(skewed.repartition(1), "stratum", "id")
      .select("id").collect().map(_.getLong(0)).toSet
    val b = Sampling.temperatureSample(skewed.repartition(13), "stratum", "id")
      .select("id").collect().map(_.getLong(0)).toSet
    assert(a == b)
  }

  test("negative sampling: k non-self negatives per anchor, deterministic, well-spread") {
    val ids = (1L to 200L).map(i => Tuple1(i * 7)).toDF("id") // non-dense ids
    val neg = Sampling.negativePairs(ids, "id", k = 3)
    val rows = neg.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(rows.length == 600, s"3 draws per anchor: ${rows.length}")
    assert(rows.forall { case (a, _, n) => a != n }, "no self-negatives")
    assert(rows.map { case (a, j, _) => (a, j) }.distinct.length == 600)
    // uniform-ish spread: many distinct negatives drawn overall
    assert(rows.map(_._3).distinct.length > 120, "draws must cover the corpus")
    // partition independence
    val b = Sampling.negativePairs(ids.repartition(11), "id", 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(rows.toSet == b)
  }

  test("balanceStrata: exact per-stratum counts, deterministic, short strata kept whole") {
    val df = ((1 to 100).map(i => (i.toLong, "big")) ++
      (101 to 103).map(i => (i.toLong, "small"))).toDF("id", "g")
    val out = Sampling.balanceStrata(df, "g", "id", perStratum = 10)
    val counts = out.groupBy("g").count().collect()
      .map(r => r.getAs[String]("g") -> r.getAs[Long]("count")).toMap
    assert(counts == Map("big" -> 10L, "small" -> 3L), counts.toString)
    // same membership at different parallelism
    val a = out.select("id").as[Long].collect().toSet
    val b = Sampling.balanceStrata(df.repartition(17), "g", "id", 10)
      .select("id").as[Long].collect().toSet
    assert(a == b)
    // growing the target only ADDS members (hash order is a fixed ranking)
    val bigger = Sampling.balanceStrata(df, "g", "id", 20).select("id").as[Long].collect().toSet
    assert(a.subsetOf(bigger))
  }

  test("strataKeepStats equals the balanceStrata totals-join readout (r18 one-pass form)") {
    val df = ((1 to 100).map(i => (i.toLong, "big")) ++
      (101 to 103).map(i => (i.toLong, "small"))).toDF("id", "g")
    val onePass = Sampling.strataKeepStats(df, "g", "id", perStratum = 10, sumCol = "id")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    val balanced = Sampling.balanceStrata(df, "g", "id", perStratum = 10)
    val joined = df.groupBy("g").agg(org.apache.spark.sql.functions.count(
        org.apache.spark.sql.functions.lit(1)).as("total"))
      .join(
        balanced.groupBy("g").agg(
          org.apache.spark.sql.functions.count(
            org.apache.spark.sql.functions.lit(1)).as("kept"),
          org.apache.spark.sql.functions.sum($"id").as("kept_sum")),
        Seq("g"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(onePass == joined, s"one-pass $onePass vs join $joined")
    // partition independence (the balanceStrata guarantee must carry over)
    val b = Sampling.strataKeepStats(df.repartition(17), "g", "id", 10, "id")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(onePass == b)
  }

  test("epochRepeat: whole copies exact, fractional tracks the target, zero drops") {
    val corpus = (1L to 3000L).map(i => (i, s"dom${i % 3}")).toDF("id", "dom")
    val out = Sampling.epochRepeat(corpus, "id", "dom",
      Map("dom0" -> 2400L, "dom1" -> 0L), fallbackPerMille = 1000L).cache()
    val byDom = out.groupBy("dom").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // dom0 (1000 docs, x2.4): every doc twice + ~40% a third time
    assert(byDom("dom0") >= 2250 && byDom("dom0") <= 2550, byDom.toString)
    assert(!byDom.contains("dom1"), "factor 0 drops the domain entirely")
    assert(byDom("dom2") == 1000L, "fallback x1.0 is exactly one copy each")
    // epoch indices are dense 0..copies-1 per doc
    val eps = out.where($"dom" === "dom0").groupBy("id")
      .agg(count(lit(1)).as("n"), max("epoch").as("mx"), min("epoch").as("mn"))
      .where($"mx" =!= $"n" - 1 || $"mn" =!= 0L)
    assert(eps.count() == 0, "epoch must be dense 0-based per doc")
    // pure function of (id, domain, factors): partition-invariant
    val again = Sampling.epochRepeat(corpus.repartition(13), "id", "dom",
      Map("dom0" -> 2400L, "dom1" -> 0L))
      .select("id", "epoch").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val first = out.select("id", "epoch").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(first == again)
    out.unpersist()
  }
}
