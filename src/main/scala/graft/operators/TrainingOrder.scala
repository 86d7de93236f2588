package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Deterministic training-order shuffle and shard assignment.
  *
  * A training run wants the corpus in a pseudorandom but REPRODUCIBLE
  * order, cut into equal shards for parallel data-loader workers. Sorting
  * by the keyed digest `md5(seed || ':' || id)` gives a permutation that
  * is (a) statistically uniform, (b) a pure function of (seed, id) — no
  * RNG state, so it is stable across runs, partition layouts, and
  * engines (Spark's `rand()` is partition-dependent and would not
  * survive a repartition, let alone an oracle check), and (c) cheap to
  * re-derive for any subset of ids.
  *
  * The global position is [[Ranks.withGlobalRank]]'s exact two-pass
  * distributed rank. Shards are round-robin on position, so shard sizes
  * differ by at most one row and each shard is itself a uniform sample
  * in shuffled order — exactly what N loader workers want.
  *
  * At 100 TB this is one range shuffle of the full rows — the same
  * shuffle ANY materialized global reorder pays (it IS the write
  * pattern: downstream writers emit shard files straight from the range
  * partitions). Re-sharding to a different worker count is a metadata
  * change (`pos % newShards`), not a reshuffle.
  */
object TrainingOrder {

  /** Input columns + `pos` (1-based global shuffled position, BIGINT) +
    * `shard` (0-based round-robin shard, BIGINT). `idCol` must be unique
    * per row; ties beyond the digest are broken by the id itself.
    */
  def shuffled(
      df: DataFrame,
      idCol: String,
      seed: String,
      nShards: Int,
      partitions: Int = 0
  ): DataFrame = {
    require(nShards >= 1, s"need nShards >= 1, got $nShards")
    val reserved = Seq("_shuffle_key", "pos", "shard")
    require(!df.columns.exists(reserved.contains),
      s"df must not contain reserved/output columns ${reserved.mkString("/")}")
    val keyed = df.withColumn(
      "_shuffle_key", md5(concat(lit(seed), lit(":"), col(idCol).cast("string"))))
    val (ranked, _) = Ranks.withGlobalRank(
      keyed, Seq(col("_shuffle_key"), col(idCol).cast("string")), "_rk", partitions)
    ranked
      .withColumn("pos", col("_rk"))
      .withColumn("shard", (col("_rk") - 1) % nShards)
      .drop("_shuffle_key", "_rk")
  }
}
