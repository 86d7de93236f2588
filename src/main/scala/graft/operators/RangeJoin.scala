package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Range (interval) join: match fact rows to `[lo, hi)` interval rows.
  *
  * The naive plan for `fact JOIN bands ON v >= lo AND v < hi` is a
  * broadcast nested loop — O(|fact| x |bands|) comparisons, fine for a
  * handful of literal bands but a scale killer when the interval side is
  * a real table. `bandJoin` uses grid blocking instead: every interval is
  * exploded to the coarse grid cells it covers, each fact row computes
  * its own cell, and the match becomes an equi-join on the cell key plus
  * a residual range filter. Work is O(|fact| + |bands| x cellsPerBand)
  * and the join hash-partitions on the cell key, so it scales to interval
  * tables far beyond broadcast size and stays skew-splittable by AQE.
  *
  * Choose `cellWidth` near the typical interval width: each interval then
  * explodes to ~2 cells, and each fact row probes exactly one.
  */
object RangeJoin {

  /** Join `fact` to `bands` where `fact(valueCol)` falls in
    * `[bands(loCol), bands(hiCol))`. Appends all `bands` columns to the
    * matching fact rows (inner join; non-matching fact rows drop).
    */
  /** Explode each `[lo, hi)` interval row to the coarse grid cells it
    * covers. hi is exclusive, but covering through floor(hi/w) is still
    * correct (a value == hi lands in that cell and is removed by the
    * caller's residual filter); one extra candidate cell beats an
    * off-by-one at the edge.
    */
  private def explodeCells(
      df: DataFrame,
      loCol: String,
      hiCol: String,
      cellWidth: Double
  ): DataFrame =
    df.withColumn(
      "_cell",
      explode(
        sequence(
          floor(col(loCol) / cellWidth).cast("long"),
          floor(col(hiCol) / cellWidth).cast("long")
        )
      )
    )

  def bandJoin(
      fact: DataFrame,
      valueCol: String,
      bands: DataFrame,
      loCol: String,
      hiCol: String,
      cellWidth: Double
  ): DataFrame = {
    require(cellWidth > 0, s"cellWidth must be positive, got $cellWidth")
    val cells = explodeCells(bands, loCol, hiCol, cellWidth)
    fact
      .withColumn("_cell", floor(col(valueCol) / cellWidth).cast("long"))
      .join(
        cells,
        Seq("_cell")
      )
      .where(col(valueCol) >= col(loCol) && col(valueCol) < col(hiCol))
      .drop("_cell")
  }

  /** Interval-overlap join: match `left` rows to `right` rows whose
    * `[lo, hi)` intervals have a NON-EMPTY intersection
    * (`greatest(lo_l, lo_r) < least(hi_l, hi_r)` — not the textbook
    * `l.lo < r.hi AND r.lo < l.hi`, which spuriously matches empty
    * `[x, x)` intervals sitting inside the other range). The session/span
    * intersection primitive. Same grid blocking as [[bandJoin]], on both
    * sides; an overlapping pair shares at least one cell. Duplicate
    * elimination is arithmetic, not a shuffle: a pair is emitted only
    * from the FIRST cell both intervals cover
    * (`floor(max(lo_l, lo_r) / w)`), so no `dropDuplicates` pass and no
    * second shuffle. Prefix the two sides' columns distinctly before
    * calling (the result carries both).
    */
  def overlapJoin(
      left: DataFrame,
      leftLo: String,
      leftHi: String,
      right: DataFrame,
      rightLo: String,
      rightHi: String,
      cellWidth: Double
  ): DataFrame = {
    require(cellWidth > 0, s"cellWidth must be positive, got $cellWidth")
    val l = explodeCells(left, leftLo, leftHi, cellWidth)
    val r = explodeCells(right, rightLo, rightHi, cellWidth).withColumnRenamed("_cell", "_cell_r")
    l.join(r, col("_cell") === col("_cell_r"))
      .where(
        greatest(col(leftLo), col(rightLo)) < least(col(leftHi), col(rightHi))
      )
      // first shared cell only: kills the multi-cell duplicates without a
      // dropDuplicates shuffle (max(lo) lies in both intervals whenever
      // the intersection is non-empty, so its cell is covered by both)
      .where(col("_cell") === floor(greatest(col(leftLo), col(rightLo)) / cellWidth).cast("long"))
      .drop("_cell", "_cell_r")
  }
}
