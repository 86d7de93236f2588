package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join: for each left row, the most recent right row with
  * `right.ts <= left.ts` within the same key — the standard event-stream
  * enrichment ("what was the last purchase before this click").
  *
  * Spark has no native as-of join; per the preference order this is
  * expressed as a COMPOSITION of built-ins (option (a)) rather than a
  * custom SparkPlan: tag both sides, union, and take a running
  * `last(value, ignoreNulls)` over a single (key, ts) window. Cost: ONE
  * shuffle on the key — same as any join — and a linear pass per key; no
  * range-condition explosion, no per-row probing. Right rows sort before
  * left rows at equal timestamps, so ties match (`<=` semantics, like
  * DuckDB's ASOF JOIN).
  */
object AsOfJoin {

  /** @param left      rows to enrich
    * @param right     rows supplying the as-of value
    * @param keyCol    equi-join key column name (present in both)
    * @param tsCol     ordering column name (present in both, numeric/ts)
    * @param rightVals right columns to carry (emitted as `asof_<name>`,
    *                  null when no right row precedes the left row)
    */
  def asofJoin(
      left: DataFrame,
      right: DataFrame,
      keyCol: String,
      tsCol: String,
      rightVals: Seq[String]
  ): DataFrame = {
    val leftCols = left.columns.toSeq
    val tagged =
      right
        .select(
          (Seq(col(keyCol), col(tsCol), lit(0).as("_side")) ++
            rightVals.map(c => col(c).as(s"_rv_$c")) ++
            leftCols.filterNot(c => c == keyCol || c == tsCol).map(c => lit(null).as(c))): _*
        )
        .unionByName(
          left.select(
            (Seq(col(keyCol), col(tsCol), lit(1).as("_side")) ++
              rightVals.map(c => lit(null).cast(right.schema(c).dataType).as(s"_rv_$c")) ++
              leftCols.filterNot(c => c == keyCol || c == tsCol).map(col)): _*
          )
        )

    // right (side 0) sorts before left (side 1) at equal ts -> `<=` match
    val w = Window
      .partitionBy(keyCol)
      .orderBy(col(tsCol), col("_side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    val withAsof = rightVals.foldLeft(tagged) { (df, c) =>
      df.withColumn(s"asof_$c", last(col(s"_rv_$c"), ignoreNulls = true).over(w))
    }

    withAsof
      .where(col("_side") === 1)
      .select((leftCols.map(col) ++ rightVals.map(c => col(s"asof_$c"))): _*)
  }
}
