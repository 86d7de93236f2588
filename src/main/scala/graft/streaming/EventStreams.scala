package graft.streaming

import java.sql.Timestamp
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Event-time streaming operators over the `events` schema
  * (event_id, ts, user_id, event_type, value): watermarked tumbling/sliding
  * window aggregation, and stateful sessionization via
  * flatMapGroupsWithState.
  *
  * The reference has no streaming runtime (SURVEY.md §2.11) — these are the
  * engine's forward-looking stream surface, with semantics matching the
  * batch twins in SparkEntry (q_event_tumbling / q_sessionize) so batch
  * backfill and streaming produce the same tables.
  *
  * Scale notes: the watermark bounds state (no unbounded window buffers);
  * sessionization state is one small case class per active user, dropped
  * on event-time timeout; both operators shuffle once on their grouping key.
  */
object EventStreams {

  /** Watermarked tumbling-window counts/sums per event type. Append mode:
    * a window emits only once its watermark passes — late events beyond
    * `lateness` are dropped, matching the contract of the batch backfill.
    */
  def tumblingAgg(events: DataFrame, windowLen: String = "1 hour", lateness: String = "10 minutes"): DataFrame =
    events
      .withWatermark("ts", lateness)
      .groupBy(window(col("ts"), windowLen), col("event_type"))
      .agg(
        count(lit(1)).as("n_events"),
        sum(col("value").cast("decimal(18,6)")).cast("double").as("total_value")
      )
      .select(
        col("window.start").as("window_start"),
        col("event_type"),
        col("n_events"),
        col("total_value")
      )

  /** Streaming drift guardrail, stream side: watermarked per-window
    * category counts — the sink [[windowDrift]] compares against a
    * reference distribution. Append mode: a window's counts emit once
    * the watermark closes it (the [[tumblingAgg]] contract), so the
    * drift readout only ever sees complete windows. State is bounded by
    * open windows x |categories|.
    */
  def windowedCategoryCounts(
      events: DataFrame,
      tsCol: String,
      catCol: String,
      windowLen: String = "1 hour",
      lateness: String = "10 minutes"
  ): DataFrame =
    events
      .withWatermark(tsCol, lateness)
      .groupBy(window(col(tsCol), windowLen), col(catCol).as("category"))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").as("window_start"), col("category"), col("n"))

  /** Batch drift readout over a [[windowedCategoryCounts]] sink: every
    * closed window's category mix against a static REFERENCE
    * distribution `(category, n)` — yesterday's mix, a golden profile,
    * or a long-run average. Per (window, category):
    * observed/reference proportions in ppm (integer floor division, the
    * [[graft.operators.DriftMonitor]] arithmetic), their absolute
    * difference, and `tvd2_ppm` = the window's summed |Δppm| (2e6 x the
    * window's total-variation distance — alert when it crosses a
    * threshold). Categories in the reference but absent from a window
    * report n=0; NOVEL categories absent from the reference report
    * ref_n=0 — both directions of "the mix changed" surface as rows.
    *
    * Scale shape: the reference broadcasts against the bounded
    * distinct-window list; per-window totals and the TVD sum are
    * windows over <= |categories| rows per window partition.
    */
  def windowDrift(
      counts: DataFrame,
      reference: DataFrame,
      refCatCol: String,
      refNCol: String
  ): DataFrame = {
    val ref = reference.select(col(refCatCol).as("category"), col(refNCol).cast("long").as("ref_n"))
    val wins = counts.select("window_start").distinct()
    // the observed side re-aliases every column: wins derives from counts,
    // and a full join straight back onto counts would carry conflicting
    // attribute references into the same plan
    val obs = counts.select(
      col("window_start").as("_w"),
      col("category").as("_c"),
      col("n").cast("long").as("_n"))
    val full = wins
      .crossJoin(broadcast(ref))
      .join(obs, col("window_start") === col("_w") && col("category") === col("_c"), "full")
      .select(
        coalesce(col("window_start"), col("_w")).as("window_start"),
        coalesce(col("category"), col("_c")).as("category"),
        coalesce(col("_n"), lit(0L)).as("n"),
        coalesce(col("ref_n"), lit(0L)).as("ref_n"))
    val perWin = org.apache.spark.sql.expressions.Window.partitionBy("window_start")
    full
      .withColumn("tot_n", sum(col("n")).over(perWin))
      .withColumn("ref_tot", sum(col("ref_n")).over(perWin))
      // the ONE shared proportion definition (DriftMonitor.ppm) — batch
      // and streaming drift must not hand-maintain diverging arithmetic
      .withColumn("ppm_obs", graft.operators.DriftMonitor.ppm("n", "tot_n"))
      .withColumn("ppm_ref", graft.operators.DriftMonitor.ppm("ref_n", "ref_tot"))
      .withColumn("abs_ppm_diff", abs(col("ppm_obs") - col("ppm_ref")))
      .withColumn("tvd2_ppm", sum(col("abs_ppm_diff")).over(perWin))
      .select("window_start", "category", "n", "ref_n",
        "ppm_obs", "ppm_ref", "abs_ppm_diff", "tvd2_ppm")
  }

  /** Streaming EMBEDDING drift, stream side: watermarked per-window
    * quantized per-dimension component sums over a vector column — the
    * vector half of the drift matrix ([[windowedCategoryCounts]] is the
    * categorical half). Same quantization contract as
    * [[graft.operators.DriftMonitor.embeddingDrift]]: components map to
    * `floor(x * scale)` longs (exact integer sums), null and
    * non-finite vectors are EXCLUDED. Append mode — a window's sums
    * emit once the watermark closes it; aggregation state is bounded by
    * open windows x dims.
    */
  def windowedVectorSums(
      stream: DataFrame,
      tsCol: String,
      vecCol: String,
      windowLen: String = "1 hour",
      lateness: String = "10 minutes",
      scale: Long = 1000L
  ): DataFrame = {
    require(scale >= 1L, s"windowedVectorSums: scale must be >= 1, got $scale")
    val nonFinite = exists(
      col(vecCol),
      x => isnan(x.cast("double")) || abs(x.cast("double")) === lit(Double.PositiveInfinity))
    stream
      .withWatermark(tsCol, lateness)
      .where(col(vecCol).isNotNull && !nonFinite)
      .select(
        col(tsCol).as("ts"),
        posexplode(transform(
          col(vecCol),
          x => floor(x.cast("double") * lit(scale.toDouble)).cast("long"))))
      .select(col("ts"), (col("pos") + 1).cast("long").as("dim"), col("col").as("qv"))
      .groupBy(window(col("ts"), windowLen), col("dim"))
      .agg(count(lit(1)).as("cnt"), sum(col("qv")).as("qsum"))
      .select(col("window.start").as("window_start"), col("dim"), col("cnt"), col("qsum"))
  }

  /** Batch drift readout over a [[windowedVectorSums]] sink: every
    * closed window's per-dimension centroid against a static REFERENCE
    * sums table `(dim, cnt, qsum)` — yesterday's windows aggregated, or
    * a golden profile built by the same quantization. Output per
    * (window, dim): the window's and reference's counts/sums plus the
    * exact `shift_milliq` from [[graft.operators.DriftMonitor
    * .shiftFromSums]] — ONE shared arithmetic for batch and streaming
    * embedding drift. The reference broadcasts (it is dims-sized).
    */
  def vectorWindowDrift(
      sums: DataFrame,
      reference: DataFrame,
      refDimCol: String,
      refCntCol: String,
      refSumCol: String
  ): DataFrame = {
    val ref = reference.select(
      col(refDimCol).as("dim"),
      col(refCntCol).cast("long").as("cnt_b"),
      col(refSumCol).cast("long").as("sum_b"))
    graft.operators.DriftMonitor.shiftFromSums(
      sums
        .select(col("window_start"), col("dim"),
          col("cnt").as("cnt_a"), col("qsum").as("sum_a"))
        .join(broadcast(ref), Seq("dim")))
      .select("window_start", "dim", "cnt_a", "cnt_b", "sum_a", "sum_b",
        "shift_milliq", "abs_shift_milliq")
  }

  /** Streaming distinct-count sketch: per-window HyperLogLog registers
    * over `valueCol` — `(window_start, idx, r)` through the REAL
    * watermarked streaming aggregation. MAX is associative and monotone,
    * so registers fold incrementally under append mode with state
    * bounded by open windows x 2^p (never by distinct values — the
    * reason this streams where exact distinct or KMV's distinct prepass
    * cannot). The sink is the mergeable artifact: roll windows up to
    * days, or union shards, with [[graft.operators.Sketches
    * .hllMergeRegisters]]; read estimates batch-side with
    * [[windowedHllEstimate]]. Same register math as the batch sketch
    * ([[graft.operators.Sketches.hllRegisters]]), so batch == streaming
    * by construction.
    */
  def windowedHllRegisters(
      stream: DataFrame,
      tsCol: String,
      valueCol: String,
      windowLen: String = "1 hour",
      lateness: String = "10 minutes",
      p: Int = 12
  ): DataFrame = {
    val (idx, rank) = graft.operators.Sketches.hllIdxRank(col(valueCol), p)
    stream
      .withWatermark(tsCol, lateness)
      .where(col(valueCol).isNotNull)
      .select(col(tsCol).as("ts"), idx.as("idx"), rank.as("r"))
      .groupBy(window(col("ts"), windowLen), col("idx"))
      .agg(max("r").as("r"))
      .select(col("window.start").as("window_start"), col("idx"), col("r"))
  }

  /** Batch estimate readout over a [[windowedHllRegisters]] sink: one
    * `(window_start, n_zero, sum_scaled, hll_estimate)` row per closed
    * window — [[graft.operators.Sketches.hllEstimateBy]] with the window
    * as the group.
    */
  def windowedHllEstimate(registers: DataFrame, p: Int = 12): DataFrame =
    graft.operators.Sketches.hllEstimateBy(registers, Seq("window_start"), p)

  /** Streaming exact dedup: drop events whose `keyCols` were already seen
    * within the watermark horizon — the streaming twin of the batch exact
    * dedup (Dedup.exactDedup) for at-least-once sources that can replay.
    * `dropDuplicatesWithinWatermark` keeps per-key state only until the
    * watermark passes the key's last-seen time, so state is bounded by
    * (arrival rate x lateness), never by stream length.
    */
  def dedupStream(
      events: DataFrame,
      keyCols: Seq[String],
      lateness: String = "10 minutes"
  ): DataFrame =
    events
      .withWatermark("ts", lateness)
      .dropDuplicatesWithinWatermark(keyCols)

  /** Watermarked stream-stream interval join: match each `left` event to
    * `right` events of the same `keyCol` whose timestamp falls within
    * `[left.ts, left.ts + windowSeconds]` (e.g. click -> purchase
    * attribution). Both sides carry watermarks and the join condition
    * bounds event-time distance, so Spark can expire buffered state —
    * the required shape for an unbounded stream-stream join.
    */
  def intervalJoin(
      left: DataFrame,
      right: DataFrame,
      keyCol: String,
      windowSeconds: Long,
      lateness: String = "10 minutes"
  ): DataFrame = {
    val l = left.withWatermark("ts", lateness).alias("l")
    val r = right.withWatermark("ts", lateness).alias("r")
    l.join(
      r,
      col(s"l.$keyCol") === col(s"r.$keyCol") &&
        col("r.ts") >= col("l.ts") &&
        col("r.ts") <= col("l.ts") + expr(s"INTERVAL $windowSeconds SECONDS")
    )
  }

  /** Watermarked sliding-window term counts over a text stream — the
    * "what is trending in the ingest feed" aggregation. One row per
    * (window, word) emitted when the watermark closes the window (append
    * mode). Tokenization matches the batch engine
    * ([[graft.operators.Dedup.normalized]] split), so stream counts agree
    * with a batch backfill over the same rows.
    *
    * State is bounded by (windows open under the watermark) x (vocabulary
    * arriving in them), never by stream length. The explode multiplies
    * rows before the shuffle, but each carries only (ts, word) — the
    * document body never reaches the aggregation.
    *
    * Top-k per window is deliberately NOT computed here: ranking needs a
    * window function over a closed group, which streaming aggregation
    * cannot express incrementally. Pair with [[trendingTerms]] over the
    * emitted sink — the same lambda-free split as FtsIndex streaming
    * maintenance (O(batch) stream work, rank on read).
    */
  def windowedTermCounts(
      docs: DataFrame,
      tsCol: String,
      textCol: String,
      windowLen: String = "1 hour",
      slide: String = "1 hour",
      lateness: String = "10 minutes"
  ): DataFrame =
    docs
      .withWatermark(tsCol, lateness)
      .select(
        col(tsCol).as("ts"),
        explode(
          filter(
            split(graft.operators.Dedup.normalized(col(textCol)), " "),
            t => length(t) > 0
          )
        ).as("word")
      )
      .groupBy(window(col("ts"), windowLen, slide), col("word"))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").as("window_start"), col("word"), col("n"))

  /** Batch rank over a [[windowedTermCounts]] sink: the k most frequent
    * words of every closed window, ties broken alphabetically.
    */
  def trendingTerms(counts: DataFrame, k: Int): DataFrame = {
    require(k >= 1, s"need k >= 1, got $k")
    val win = org.apache.spark.sql.expressions.Window
      .partitionBy("window_start")
      .orderBy(desc("n"), col("word"))
    counts
      .withColumn("rn", row_number().over(win).cast("long"))
      .where(col("rn") <= k)
  }

  final case class Event(event_id: Long, ts: Timestamp, user_id: Long, value: Double)
  final case class SessionState(start: Long, end: Long, n: Long, total: Double)
  final case class Session(
      user_id: Long,
      session_start_us: Long,
      session_end_us: Long,
      n_events: Long,
      total_value: Double
  )

  /** Stateful sessionization: a session closes after `gapSeconds` of
    * event-time silence (state timeout), emitting one row. The streaming
    * twin of the batch lag/cumsum sessionizer (SparkEntry.qSessionize).
    */
  def sessionize(
      events: Dataset[Event],
      gapSeconds: Long = 1800
  ): Dataset[Session] = {
    import events.sparkSession.implicits._
    val gapUs = gapSeconds * 1000000L

    events
      .withWatermark("ts", "30 minutes")
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, Session](
        OutputMode.Append(),
        GroupStateTimeout.EventTimeTimeout()
      ) { (userId: Long, batch: Iterator[Event], state: GroupState[SessionState]) =>
        if (batch.isEmpty && state.hasTimedOut) {
          // silence gap elapsed: close and emit the session
          val s = state.get
          state.remove()
          Iterator.single(Session(userId, s.start, s.end, s.n, s.total))
        } else {
          val out = scala.collection.mutable.ListBuffer.empty[Session]
          var cur = state.getOption
          batch.toSeq.sortBy(e => (e.ts.getTime, e.event_id)).foreach { e =>
            val us = e.ts.getTime * 1000L
            cur match {
              case Some(s) if us - s.end <= gapUs =>
                cur = Some(s.copy(end = us, n = s.n + 1, total = s.total + e.value))
              case Some(s) =>
                out += Session(userId, s.start, s.end, s.n, s.total)
                cur = Some(SessionState(us, us, 1, e.value))
              case None =>
                cur = Some(SessionState(us, us, 1, e.value))
            }
          }
          cur.foreach { s =>
            state.update(s)
            state.setTimeoutTimestamp(s.end / 1000L + gapSeconds * 1000L)
          }
          out.iterator
        }
      }
  }
}
