package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Batch time-series resampling helpers (the streaming twins live in
  * [[graft.streaming.EventStreams]]).
  */
object TimeSeries {

  /** Fixed-width bin counts over the observed [min, max] span with empty
    * bins ZERO-FILLED — the "every bin present" contract that gap-naive
    * `groupBy(bin)` breaks and that downstream consumers (charting,
    * anomaly baselines, training-curve resamplers) require: a missing
    * bin and a zero bin mean different things only until someone joins
    * on the bin key.
    *
    * `tsCol` is epoch MICROSECONDS (BIGINT). The spine is generated
    * distributed (`spark.range` over bin indices — no driver-side
    * collect of bins, only the 2-value min/max agg), then left-joins the
    * per-bin counts. `maxBins` guards the span: a caller passing
    * milliseconds where microseconds were meant would otherwise ask for
    * a billion-row spine.
    *
    * Returns (bin_start_us, n), every bin in [floor(min), floor(max)]
    * present exactly once.
    */
  def gapFillCounts(
      df: DataFrame,
      tsCol: String,
      binUs: Long,
      maxBins: Long = 10000000L
  ): DataFrame = {
    require(binUs > 0, s"binUs must be positive, got $binUs")
    val spark = df.sparkSession
    // pinned: referenced by both the bounds action and the spine join —
    // unpinned, the full input would be scanned and aggregated twice;
    // the pin is bin-cardinality-sized
    val binned = graft.util.Checkpoints.pin(df
      .select((col(tsCol) - pmod(col(tsCol), lit(binUs))).as("bin_start_us"))
      .groupBy("bin_start_us")
      .agg(count(lit(1)).as("n")))
    val bounds = binned.agg(min("bin_start_us"), max("bin_start_us")).head()
    if (bounds.isNullAt(0)) {
      spark.range(0).select(col("id").as("bin_start_us"), col("id").as("n"))
    } else {
      val lo = bounds.getLong(0)
      val nBins = (bounds.getLong(1) - lo) / binUs + 1
      require(nBins <= maxBins,
        s"span needs $nBins bins of $binUs us (> $maxBins) — wrong unit or widen maxBins")
      spark.range(0, nBins)
        .select((lit(lo) + col("id") * binUs).as("bin_start_us"))
        .join(binned, Seq("bin_start_us"), "left")
        .select(col("bin_start_us"), coalesce(col("n"), lit(0L)).as("n"))
    }
  }

  /** Event-type transition counts — the Markov bigram matrix of "what
    * follows what" per entity, aggregated corpus-wide: the
    * next-event-prediction / funnel-discovery primitive. `orderCols`
    * must be a TOTAL order within an entity (include a unique id as the
    * tie-break, or concurrent events make the lag nondeterministic).
    *
    * Scale shape: one shuffle on the entity key for the lag window
    * (bounded per-entity state), then a hash-agg on the (from, to) pair —
    * whose cardinality is |type-vocabulary|^2, tiny by construction.
    *
    * Returns (from_type, to_type, n).
    */
  def transitionCounts(
      df: DataFrame,
      entityCol: String,
      orderCols: Seq[Column],
      typeCol: String
  ): DataFrame = {
    val w = Window.partitionBy(entityCol).orderBy(orderCols: _*)
    df.withColumn("_prev", lag(col(typeCol), 1).over(w))
      .where(col("_prev").isNotNull)
      .groupBy(col("_prev").as("from_type"), col(typeCol).as("to_type"))
      .agg(count(lit(1)).as("n"))
  }
}
