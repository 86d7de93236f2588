package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distribution-drift monitoring between two slices of a corpus or
  * event stream — the ingest-time guardrail a 100 TB pipeline runs on
  * every batch: "does today's data look like yesterday's?" (category
  * mix shift, value-distribution shift). Catches upstream breakage —
  * a source gone silent, a schema change flooding one category, an
  * encoding bug shifting a numeric field — before it contaminates
  * training shards. The reference pipeline has no monitoring surface;
  * this generalizes its status-histogram inspection
  * (src/api/routes.py stats endpoint) into a comparable two-slice form.
  *
  * Determinism/portability contract: all statistics are integer-exact —
  * per-mille/ppm proportions via integer floor division, chi-square
  * contributions in parts-per-billion via exact decimal(38,0)
  * arithmetic — so outputs hash-match across engines and partitionings
  * (no floating point anywhere; the standard graft oracle discipline).
  *
  * Scale shape: ONE scan and ONE category-keyed aggregation with
  * map-side partial combine (a slice-tag indicator summed per category
  * — never a shuffle of raw rows), output bounded by |categories|;
  * slice totals come from an unpartitioned window over that BOUNDED
  * aggregate (<= |categories| rows — the audited bounded-window
  * pattern), not from a second aggregation that would re-scan the
  * input at 100 TB.
  */
object DriftMonitor {

  /** `cntCol * 1e6 DIV totCol`, null when the slice is empty — the ONE
    * definition of a drift proportion in parts-per-million, shared by
    * every drift surface (batch and [[graft.streaming.EventStreams
    * .windowDrift]]) so the arithmetic cannot silently diverge. Takes
    * column NAMES (integral `DIV` only exists as a SQL operator);
    * names are backtick-quoted so dotted/spaced identifiers resolve
    * like they do in the Column-based rest of the module.
    * Exact while `cnt * 1e6` fits a long, i.e. counts to ~9e12.
    */
  def ppm(cntCol: String, totCol: String): Column = {
    def q(n: String) = "`" + n.replace("`", "``") + "`"
    when(col(totCol) > 0, expr(s"${q(cntCol)} * 1000000 DIV ${q(totCol)}"))
  }

  /** Two-slice categorical drift. `inA` is a boolean Column over `df`'s
    * rows assigning each row to slice A (true) or slice B (false) —
    * e.g. a time-window predicate or a source tag.
    *
    * Output, one row per category observed in EITHER slice:
    *  - `category`, `cnt_a`, `cnt_b` — exact counts
    *  - `ppm_a`, `ppm_b` — proportion of each slice in parts-per-million
    *    (`cnt * 1000000 DIV slice_total`; null if the slice is empty)
    *  - `abs_ppm_diff` — the per-category total-variation contribution:
    *    `sum(abs_ppm_diff) / 2e6` is the total variation distance
    *  - `chi2_ppb` — this category's two-sample chi-square contribution
    *    x 1e9: with `D = cnt_a*tot_b - cnt_b*tot_a`, the exact identity
    *    `chi2_i = D^2 / ((cnt_a+cnt_b) * tot_a * tot_b)` (the two
    *    (obs-exp)^2/exp terms folded algebraically). Computed in
    *    decimal(38,0) with the x1e9 scaling split into an exact
    *    quotient-plus-remainder second step — `q*1e9 + (r*1e9) DIV
    *    denom` — so nothing exceeds 38 digits for slices up to ~3e9
    *    rows (D^2 <= 8.5e37; a naive `D^2 * 1e9` overflows the decimal
    *    cap already at ~2e7 rows/slice). Beyond ~3e9 rows per slice,
    *    shard the comparison.
    *
    * Rows are unordered by default (`ordered = false`); pass
    * `ordered = true` for the canonical `ORDER BY category` a
    * monitoring consumer diffing successive outputs needs (nulls first,
    * Spark's default ascending null ordering). Unordered-slice caveat:
    * null categories group as a single null row (Spark and most engines
    * agree on null grouping).
    */
  def categoricalDrift(
      df: DataFrame, catCol: String, inA: Column, ordered: Boolean = false): DataFrame = {
    val perCat = df
      .select(col(catCol).as("category"), when(inA, 1L).otherwise(0L).as("_in_a"))
      .groupBy("category")
      .agg(
        sum(col("_in_a")).as("cnt_a"),
        sum(lit(1L) - col("_in_a")).as("cnt_b"))
    // totals over the bounded per-category table — an unpartitioned
    // whole-frame window over <= |categories| rows, so the input scans
    // exactly once (a separate `.agg` would recompute the aggregation
    // subtree and re-scan the corpus)
    val out = statsFromCounts(perCat)
    if (ordered) out.orderBy("category") else out
  }

  /** The drift statistics over an already-aggregated per-category count
    * table `(category, cnt_a, cnt_b)` — the arithmetic half of
    * [[categoricalDrift]], public so count tables from other
    * aggregations (or tests probing the large-count arithmetic) can
    * reuse it verbatim.
    */
  def statsFromCounts(perCat: DataFrame): DataFrame = {
    val whole = org.apache.spark.sql.expressions.Window
      .rowsBetween(
        org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.unboundedFollowing)
    perCat
      .withColumn("tot_a", sum(col("cnt_a")).over(whole))
      .withColumn("tot_b", sum(col("cnt_b")).over(whole))
      .withColumn("ppm_a", ppm("cnt_a", "tot_a"))
      .withColumn("ppm_b", ppm("cnt_b", "tot_b"))
      .withColumn("abs_ppm_diff", abs(col("ppm_a") - col("ppm_b")))
      // D and the denominator in decimal(38,0) FIRST (their raw-long
      // products overflow at ~3e9 rows/slice); D^2 <= 8.5e37 then fits,
      // and the two-step scaling keeps every intermediate under 38 digits
      .withColumn("_d",
        expr("CAST(cnt_a AS DECIMAL(38,0)) * tot_b - CAST(cnt_b AS DECIMAL(38,0)) * tot_a"))
      .withColumn("_denom",
        expr("CAST(cnt_a + cnt_b AS DECIMAL(38,0)) * tot_a * tot_b"))
      .withColumn(
        "chi2_ppb",
        when(
          col("tot_a") > 0 && col("tot_b") > 0,
          expr(
            """CAST((_d * _d DIV _denom) * 1000000000
              |  + ((_d * _d % _denom) * 1000000000) DIV _denom
              |AS BIGINT)""".stripMargin)))
      .select("category", "cnt_a", "cnt_b", "ppm_a", "ppm_b", "abs_ppm_diff", "chi2_ppb")
  }

  /** Two-slice EMBEDDING drift: per-dimension centroid shift between
    * slice A and slice B of a vector column — the drift guardrail for
    * the embedding side of a multimodal corpus (a re-trained or
    * mis-versioned encoder, a source mix change, or an upstream
    * normalization bug all move the per-dimension means long before
    * they are visible in retrieval quality).
    *
    * Exactness: components quantize to `floor(x * scale)` longs (floor
    * of an IEEE double product is bit-stable — the
    * [[VectorSearch.quantizeInt8]] argument), so the per-dimension sums
    * are exact integers and the centroid difference
    * `shift_milliq = (sum_a*cnt_b - sum_b*cnt_a) * 1000 DIV (cnt_a*cnt_b)`
    * (milli-quantized-units, i.e. 1e-3 of one quantization step) is
    * deterministic across engines and partitionings.
    *
    * Scale shape: one posexplode to (dim, component) rows, ONE
    * dim-keyed aggregation with map-side partial combine — the shuffle
    * carries at most `dims` rows per task, never vectors; output is
    * `dims` rows. Null vectors are excluded from both slices.
    *
    * Output per dimension (1-based `dim`): `cnt_a`, `cnt_b`, `sum_a`,
    * `sum_b` (exact quantized sums), `shift_milliq`, `abs_shift_milliq`.
    *
    * Size contract: the quantized sums must fit a long (`n * scale *
    * max|component|` — ~9e12 unit-norm vectors per slice at
    * scale=1000); the centroid-difference cross products are computed
    * in decimal(38,0), so they never overflow where the sums fit.
    * Vectors containing a non-finite component (NaN/Inf) are EXCLUDED
    * like nulls — floor(NaN) casts to 0 on this engine but errors on
    * others, so masking them as zeros would both hide the upstream bug
    * this monitor exists to catch and break engine parity.
    */
  def embeddingDrift(
      df: DataFrame,
      vecCol: String,
      inA: Column,
      scale: Long = 1000L,
      ordered: Boolean = false
  ): DataFrame = {
    require(scale >= 1L, s"embeddingDrift: scale must be >= 1, got $scale")
    val nonFinite = exists(
      col(vecCol),
      x => isnan(x.cast("double")) || abs(x.cast("double")) === lit(Double.PositiveInfinity))
    df
      .where(col(vecCol).isNotNull && !nonFinite)
      .select(
        when(inA, 1L).otherwise(0L).as("_in_a"),
        posexplode(transform(
          col(vecCol),
          x => floor(x.cast("double") * lit(scale.toDouble)).cast("long"))))
      .select((col("pos") + 1).cast("long").as("dim"), col("_in_a"), col("col").as("qv"))
      .groupBy("dim")
      .agg(
        sum(col("_in_a")).as("cnt_a"),
        sum(lit(1L) - col("_in_a")).as("cnt_b"),
        sum(col("qv") * col("_in_a")).as("sum_a"),
        sum(col("qv") * (lit(1L) - col("_in_a"))).as("sum_b"))
      .transform(shiftFromSums)
      .transform(d => if (ordered) d.orderBy("dim") else d)
  }

  /** The centroid-shift arithmetic over an already-aggregated
    * per-dimension sums table `(cnt_a, cnt_b, sum_a, sum_b` + any
    * passthrough columns`)` — the exact-arithmetic half of
    * [[embeddingDrift]], shared by the streaming per-window variant
    * ([[graft.streaming.EventStreams.vectorWindowDrift]]) so the two
    * surfaces cannot diverge. Adds `shift_milliq` / `abs_shift_milliq`.
    */
  def shiftFromSums(perDim: DataFrame): DataFrame =
    perDim
      .withColumn(
        "shift_milliq",
        // cross products in decimal(38,0): raw-long `sum * cnt` already
        // overflows at ~3e6 vectors/slice with unit components, five
        // orders below the documented sum bound
        when(
          col("cnt_a") > 0 && col("cnt_b") > 0,
          expr(
            """(CAST(sum_a AS DECIMAL(38,0)) * cnt_b - CAST(sum_b AS DECIMAL(38,0)) * cnt_a)
              |  * 1000 DIV (CAST(cnt_a AS DECIMAL(38,0)) * cnt_b)""".stripMargin)))
      .withColumn("abs_shift_milliq", abs(col("shift_milliq")))

  /** Two-slice numeric drift over fixed equal-width bins: the
    * no-floating-point PSI/KS stand-in. Values are binned by
    * `floor((v - lo) * nBins / (hi - lo))` clamped into [0, nBins-1]
    * (floor of an IEEE double product/division is bit-stable across
    * engines — the [[VectorSearch.quantizeInt8]] argument), then the
    * bins drift-compare exactly like categories. Fixed bounds, not
    * quantiles, so two runs (or two engines) bin identically; pick
    * lo/hi from domain knowledge or a prior
    * [[Sketches.histogramQuantile]] pass. Null AND non-finite values
    * (NaN/Inf — the classic upstream-encoder bug this monitor exists
    * to surface) land in bin -1: floor(NaN) silently casts to 0 on
    * this engine but errors on others, so folding them into the lo
    * edge would both mask the bug and break engine parity.
    *
    * Output: [[categoricalDrift]] columns with `bin` (long) as the
    * category.
    */
  def numericDrift(
      df: DataFrame,
      valueCol: String,
      inA: Column,
      lo: Double,
      hi: Double,
      nBins: Int,
      ordered: Boolean = false
  ): DataFrame = {
    require(nBins >= 1, s"numericDrift: nBins must be >= 1, got $nBins")
    require(hi > lo, s"numericDrift: need hi > lo, got [$lo, $hi]")
    val v = col(valueCol).cast("double")
    val bin = when(
      col(valueCol).isNull || isnan(v) || abs(v) === lit(Double.PositiveInfinity),
      lit(-1L)).otherwise(
      least(
        greatest(
          floor((col(valueCol).cast("double") - lit(lo)) * lit(nBins.toDouble) / lit(hi - lo))
            .cast("long"),
          lit(0L)),
        lit(nBins - 1L)))
    categoricalDrift(df.withColumn("bin", bin), "bin", inA, ordered)
      .withColumnRenamed("category", "bin")
  }
}
