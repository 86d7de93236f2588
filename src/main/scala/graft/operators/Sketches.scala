package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distinct-count sketches for corpus accounting at 100 TB — vocabulary
  * sizes, unique-url / unique-shingle counts, per-shard cardinalities.
  *
  * KMV (k-minimum-values): hash every value to a uniform 32-bit integer,
  * keep the k smallest distinct hashes; the k-th smallest, normalized to
  * (0,1], estimates density, so distinct ~= (k-1) / max_norm. The sketch
  * crosses the shuffle as at most k longs per partition
  * (TakeOrderedAndProject — each partition pre-truncates to its local
  * k), giving a fixed-size answer no matter the input scale, and unlike
  * HLL the whole computation is plain deterministic column algebra —
  * portable to any engine, so it is exactly oracle-checkable.
  *
  * Spark's own `approx_count_distinct` (HyperLogLog++) remains the
  * one-liner alternative; KMV is the one you can cross-check.
  */
object Sketches {

  /** Uniform 32-bit hash from the first 8 md5 nibbles (portable: the
    * DuckDB oracle computes the identical value with ascii-nibble
    * arithmetic, OracleSql.md5NibbleIntSql). Spark side uses one
    * base-16 `conv` instead of eight substring+ascii terms — same value,
    * a third of the expression tree per row.
    */
  private[graft] def md5Hash32(value: Column): Column =
    conv(substring(md5(value.cast("string")), 1, 8), 16, 10).cast("long")

  /** KMV distinct-count estimate for `df(valueCol)`. Returns one row:
    * `k_used` (min(k, observed distinct hashes)), `kth_hash` (the k-th
    * smallest 32-bit hash), `kmv_estimate` (estimated distinct count;
    * exact when fewer than k distinct hashes were observed).
    */
  def kmvDistinct(df: DataFrame, valueCol: String, k: Int = 256): DataFrame = {
    require(k >= 2, s"kmv needs k >= 2, got $k")
    val kept = df
      .where(col(valueCol).isNotNull)
      .select(md5Hash32(col(valueCol)).as("h"))
      .distinct()
      .orderBy("h")
      .limit(k)
    kept.agg(
      count(lit(1)).as("k_used"),
      max(col("h")).as("kth_hash")
    ).select(
      col("k_used"),
      col("kth_hash"),
      when(col("k_used") < k, col("k_used").cast("double"))
        .otherwise(lit((k - 1).toDouble * 4294967296.0) / col("kth_hash"))
        .as("kmv_estimate")
    )
  }
}
