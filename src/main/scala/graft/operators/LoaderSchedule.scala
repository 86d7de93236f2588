package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Loader-side SCHEDULING over an [[SequencePacking.exportShards]] store
  * — the layer between the certified shard files and a training job's
  * data-loader workers. The store answers "what are the bins"; this
  * answers "in what order does epoch E consume them, where does a
  * checkpoint resume, which worker reads which bin, and how do K domain
  * stores interleave under mixture weights". Everything here is a pure
  * function of (store manifest state, epoch seed) — no RNG state, no
  * driver-side ordering — so a preempted run, a different partition
  * layout, or a different engine re-derives the identical schedule
  * (the same determinism contract as [[TrainingOrder.shuffled]] and the
  * reason the DuckDB oracle can pin every verb here hash-exact).
  *
  * Schedules are BIN-granular: one row per packed bin, never per token.
  * At 100 TB (~25 T tokens / 2048-token bins ≈ 12 B bins) the schedule
  * is a ~1000× reduction of the data it orders, and building it touches
  * only the three metadata columns `(shard, bin_id, bin_tokens)` — a
  * column-pruned scan that never reads an `input_ids` byte. The global
  * order + running token total come from one range shuffle of those
  * metadata rows (the exact two-pass rank of [[Ranks.withGlobalRank]],
  * extended with a per-partition token prefix so `cum_tokens` is exact
  * without a single-task window).
  */
object LoaderSchedule {

  /** The epoch-E permutation key: `md5(seed || ':' || bin_id)` — uniform,
    * stateless, engine-portable (Spark and DuckDB agree on the lowercase
    * hex), and re-derivable for any subset of bins (which is what lets
    * [[SequencePacking.appendShards]]-grown stores slot new bins into the
    * next epoch with no reshuffle bookkeeping).
    */
  private def epochKey(seed: String): Column =
    md5(concat(lit(seed), lit(":"), col("bin_id").cast("string")))

  /** Deterministic epoch schedule over a certified store: one row per
    * bin, ordered by the epoch-keyed permutation, with the exact running
    * token total. Returns `(ord, shard, bin_id, n_tokens, cum_tokens)` —
    * `ord` 1-based global position, `cum_tokens` the tokens consumed
    * once this bin is done (the checkpoint cursor a trainer persists).
    *
    * CERTIFIED: before scheduling, the pruned scan's bin count and token
    * total are checked against the stored manifest sums — loud on any
    * drift (lost files, stale manifest, mid-mutation crash), so a
    * schedule can never silently order a corrupt store. (Per-bin byte
    * certification stays [[SequencePacking.readShard]]'s job at read
    * time; the schedule only ever sees metadata.)
    *
    * Scale shape: one column-pruned scan of `(shard, bin_id, bin_tokens)`,
    * one range shuffle of those rows on the md5 key, a #partitions-sized
    * driver aggregate for the rank/prefix offsets, and a broadcast join
    * back. Nothing touches packed ids; nothing is single-task.
    */
  def epochSchedule(
      spark: SparkSession,
      path: String,
      seed: String,
      partitions: Int = 0
  ): DataFrame = {
    val (bins, _, _) = certifiedBins(spark, path)
    rankAndRunningTokens(bins, seed, partitions)
      .select("ord", "shard", "bin_id", "n_tokens", "cum_tokens")
  }

  /** Multi-epoch training plan: `nEpochs` independent epoch permutations
    * of the same certified store, concatenated with GLOBALLY continuing
    * `ord` and `cum_tokens` — the coordinate system a trainer checkpoints
    * when it runs more than one pass (a global token cursor resumes
    * mid-epoch-3 through plain [[resumeFrom]], no per-epoch bookkeeping).
    * Epoch e's permutation key is seeded `"$seed/$e"`, so epochs are
    * mutually independent uniform shuffles and any single epoch equals
    * `epochSchedule(path, s"$seed/$e")` exactly. Returns
    * `(ord, epoch, shard, bin_id, n_tokens, cum_tokens)`, epoch 1-based.
    *
    * Offsets are metadata: every epoch covers the same store, so epoch
    * e starts at `ord = (e-1)*n_bins + 1` and
    * `cum = (e-1)*total_tokens + ...` — two manifest sums, no extra
    * shuffle beyond each epoch's own schedule pass.
    */
  def epochPlan(
      spark: SparkSession,
      path: String,
      seed: String,
      nEpochs: Int,
      partitions: Int = 0
  ): DataFrame = {
    require(nEpochs >= 1, s"need nEpochs >= 1, got $nEpochs")
    // certify ONCE — the store is immutable across the plan's epochs, so
    // each epoch reuses the same certified bin frame and the offsets come
    // from the totals the certification already established
    val (bins, nBins, total) = certifiedBins(spark, path)
    (1 to nEpochs).map { e =>
      rankAndRunningTokens(bins, s"$seed/$e", partitions)
        .withColumn("epoch", lit(e.toLong))
        .withColumn("ord", col("ord") + lit((e - 1).toLong * nBins))
        .withColumn("cum_tokens", col("cum_tokens") + lit((e - 1).toLong * total))
    }.reduce(_ unionByName _)
      .select("ord", "epoch", "shard", "bin_id", "n_tokens", "cum_tokens")
  }

  /** Mid-epoch resume: the rows of `schedule` still unconsumed after a
    * trainer checkpointed at `afterTokens` consumed tokens — the longest
    * consumed prefix is exactly the bins with `cum_tokens <= afterTokens`
    * (a bin is consumed atomically; a cursor mid-bin re-reads that bin).
    * Works on [[epochSchedule]] and [[mixtureSchedule]] output alike.
    * Pure filter: resume costs a schedule scan, never a re-shuffle, and
    * `consumed prefix ∪ resume == the full schedule` by construction.
    */
  def resumeFrom(schedule: DataFrame, afterTokens: Long): DataFrame =
    schedule.where(col("cum_tokens") > afterTokens)

  /** Assign schedule rows to `nWorkers` loader workers, round-robin on
    * the epoch order: `worker = (ord - 1) % nWorkers`. Each worker's
    * slice is itself in epoch order, sizes differ by at most one bin,
    * and — because the schedule order is a uniform permutation — each
    * slice is a uniform sample of the corpus (no worker trains on a
    * skewed slice). Re-sharding to a different worker count is a
    * metadata re-map, not a reshuffle ([[TrainingOrder]]'s convention).
    */
  def workerSlices(schedule: DataFrame, nWorkers: Int): DataFrame = {
    require(nWorkers >= 1, s"need nWorkers >= 1, got $nWorkers")
    schedule.withColumn("worker", pmod(col("ord") - 1L, lit(nWorkers.toLong)))
  }

  /** Deterministic domain-mixture schedule: interleave K certified
    * stores so that every prefix of the combined order serves each
    * domain in proportion to its weight — weighted fair queuing over
    * bins. Domain d's k-th bin (k 1-based, in d's own epoch-shuffled
    * order) is scheduled at virtual time `k * (L / w_d)` where `L =
    * lcm(weights)` — integer-exact, so Spark and the oracle agree to the
    * bit; ties break on (domain, k). A prefix of length n then holds
    * `n * w_d / W ± O(K)` bins of domain d — the mixture a
    * DoReMi/Pile-style training run asks the loader for, enforced by
    * construction instead of by sampling variance.
    *
    * Input: `(domain, path, weight)` per store, weights positive
    * integers (`lcm` must fit an Int — weights are ratios like 7:2:1,
    * not token counts). Returns
    * `(ord, domain, shard, bin_id, n_tokens, cum_tokens)` with `ord`
    * global over the interleave and `cum_tokens` the combined running
    * token total, so [[resumeFrom]] and [[workerSlices]] compose
    * unchanged. A domain that runs out of bins simply stops appearing
    * (the schedule is one epoch of each store, not an infinite sampler
    * — repeat epochs with fresh seeds to train longer).
    *
    * Scale shape: per store the same pruned certified scan as
    * [[epochSchedule]], one distributed rank per domain for k, then ONE
    * range shuffle of the unioned metadata rows on (vt, domain, k).
    */
  def mixtureSchedule(
      spark: SparkSession,
      stores: Seq[(String, String, Long)],
      seed: String,
      partitions: Int = 0
  ): DataFrame = {
    require(stores.nonEmpty, "mixtureSchedule: pass at least one store")
    require(stores.map(_._1).distinct.length == stores.length,
      "mixtureSchedule: domain names must be unique")
    require(stores.forall(_._3 > 0L), "mixtureSchedule: weights must be positive")
    val lcm = stores.map(_._3).map(BigInt(_)).reduce((a, b) => a / a.gcd(b) * b)
    require(lcm <= BigInt(Int.MaxValue),
      s"mixtureSchedule: lcm(weights) = $lcm — weights are mixture RATIOS " +
        "(reduce them; lcm must fit an Int so virtual times stay exact BIGINTs)")
    val perDomain = stores.map { case (domain, path, w) =>
      val (bins, _, _) = certifiedBins(spark, path)
      // the permutation key carries the DOMAIN: every store's bin_ids
      // start at 0, so an unsalted md5(seed:bin_id) would give all K
      // domains the identical permutation — correlated curriculum in
      // every interleaved prefix instead of independent shuffles (the
      // same reason epochPlan seeds "$seed/$e" per epoch)
      val (ranked, _) = Ranks.withGlobalRank(
        bins.withColumn("_k", epochKey(s"$seed:$domain")),
        Seq(col("_k"), col("bin_id")), "_rank", partitions)
      ranked
        .withColumn("domain", lit(domain))
        .withColumn("_vt", col("_rank") * lit((lcm / w).toLong))
        .drop("_k")
    }
    val unioned = perDomain.reduce(_ unionByName _)
    rankAndCumOver(unioned, Seq(col("_vt"), col("domain"), col("_rank")), partitions)
      .select("ord", "domain", "shard", "bin_id", "n_tokens", "cum_tokens")
  }

  /** The certified pruned bin scan every schedule verb starts from:
    * `(shard, bin_id, n_tokens)` for each bin, with the scan's totals
    * checked against the stored manifest before any schedule is built.
    * Returns `(bins, n_bins, total_tokens)` so callers that need the
    * store totals (epoch offsets) reuse the certification's own sums.
    */
  private def certifiedBins(spark: SparkSession, path: String): (DataFrame, Long, Long) = {
    spark.catalog.refreshByPath(s"$path/manifest")
    spark.catalog.refreshByPath(s"$path/data")
    val stored = spark.read.parquet(s"$path/manifest")
      .agg(sum("n_bins"), sum("n_tokens")).head()
    val bins = spark.read.parquet(s"$path/data")
      .select(col("shard").cast("long").as("shard"), col("bin_id"),
        col("bin_tokens").as("n_tokens"))
    val actual = bins.agg(count(lit(1)), sum("n_tokens")).head()
    require(!stored.isNullAt(0) && stored.getLong(0) == actual.getLong(0) &&
      stored.getLong(1) == actual.getLong(1),
      s"LoaderSchedule: store at $path FAILS certification — manifest records " +
        s"${if (stored.isNullAt(0)) "no" else stored.getLong(0).toString} bins / " +
        s"${if (stored.isNullAt(1)) "no" else stored.getLong(1).toString} tokens but the files hold " +
        s"${actual.getLong(0)} / ${if (actual.isNullAt(1)) 0L else actual.getLong(1)}. " +
        "The store is mid-mutation, lost files, or was written outside the " +
        "export/append/retract protocol; run recertifyShards before scheduling.")
    (bins, stored.getLong(0), stored.getLong(1))
  }

  /** Epoch-key the bins and hand off to the shared rank+prefix pass. */
  private def rankAndRunningTokens(
      bins: DataFrame,
      seed: String,
      partitions: Int
  ): DataFrame =
    rankAndCumOver(bins.withColumn("_k", epochKey(seed)),
      Seq(col("_k"), col("bin_id")), partitions).drop("_k")

  /** Exact distributed (global rank, running token sum) over `sortCols`
    * — [[Ranks.withGlobalRank]]'s two-pass range-partition shape,
    * extended with a per-partition token-prefix offset so `cum_tokens`
    * never needs an unpartitioned window: range-shuffle on the sort
    * key (pinned so both passes see identical partitions), collect the
    * #partitions-sized (row count, token sum) ladder, broadcast the
    * cumulative offsets back, and add them to the per-partition
    * row_number / prefix sum. Adds `ord` (1-based BIGINT) and
    * `cum_tokens` (BIGINT, inclusive of the current bin); requires an
    * `n_tokens` column. The pin is referenced by the returned plan and
    * freed by Spark's ContextCleaner once the caller drops it (the
    * Ranks convention).
    */
  private def rankAndCumOver(
      df: DataFrame,
      sortCols: Seq[Column],
      partitions: Int
  ): DataFrame = {
    val spark = df.sparkSession
    val reserved = Seq("_pid", "_rn", "_ct", "_offn", "_offt", "ord", "cum_tokens")
    require(!df.columns.exists(reserved.contains),
      s"schedule input must not contain reserved columns ${reserved.mkString("/")}")
    val nParts =
      if (partitions > 0) partitions
      else spark.conf.get("spark.sql.shuffle.partitions", "32").toInt
    val ranged = graft.util.Checkpoints.pin(
      df.repartitionByRange(nParts, sortCols: _*)
        .withColumn("_pid", spark_partition_id()))
    val stats = ranged.groupBy("_pid")
      .agg(count(lit(1)).as("n"), sum("n_tokens").as("t")).collect()
      .map(r => r.getInt(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    val offsets = {
      var accN = 0L
      var accT = 0L
      stats.keys.toSeq.sorted.map { pid =>
        val o = (pid, accN, accT)
        accN += stats(pid)._1
        accT += stats(pid)._2
        o
      }
    }
    val offDf = spark.createDataFrame(
      if (offsets.nonEmpty) offsets else Seq((0, 0L, 0L))).toDF("_pid", "_offn", "_offt")
    val w = Window.partitionBy("_pid").orderBy(sortCols: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    ranged
      .withColumn("_rn", row_number().over(Window.partitionBy("_pid").orderBy(sortCols: _*)))
      .withColumn("_ct", sum("n_tokens").over(w))
      .join(broadcast(offDf), "_pid")
      .withColumn("ord", col("_offn") + col("_rn"))
      .withColumn("cum_tokens", col("_offt") + col("_ct"))
      .drop("_pid", "_rn", "_ct", "_offn", "_offt")
  }
}
