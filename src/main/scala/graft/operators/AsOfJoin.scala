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
    // Carry ALL right values as ONE struct: a per-column running last()
    // with ignoreNulls would skip a genuinely-NULL right value and stitch
    // the output from different right rows. The struct is non-null exactly
    // on right rows, so last(struct, ignoreNulls) always selects one
    // whole right row (matching native ASOF semantics).
    val rvStruct = struct(rightVals.map(col): _*)
    val rvType = org.apache.spark.sql.types.StructType(
      rightVals.map(c => org.apache.spark.sql.types.StructField(c, right.schema(c).dataType))
    )
    val tagged =
      right
        .select(
          (Seq(col(keyCol), col(tsCol), lit(0).as("_side"), rvStruct.as("_rv")) ++
            leftCols.filterNot(c => c == keyCol || c == tsCol).map(c => lit(null).as(c))): _*
        )
        .unionByName(
          left.select(
            (Seq(col(keyCol), col(tsCol), lit(1).as("_side"), lit(null).cast(rvType).as("_rv")) ++
              leftCols.filterNot(c => c == keyCol || c == tsCol).map(col)): _*
          )
        )

    // right (side 0) sorts before left (side 1) at equal ts -> `<=` match.
    // `_rv` as the final key totally orders right rows that share a
    // (key, ts): without it, last() picks whichever tied right row the
    // partitioning happened to place later — nondeterministic across runs.
    // (Among tied LEFT rows _rv is uniformly null, and each tied left row
    // sees the same preceding right rows, so their results are unaffected.)
    // Unorderable payload types (maps) can't join the sort order — those
    // fall back to the binary ordering and keep the documented
    // pick-any-tied-row semantics rather than failing analysis.
    val rvOrderable =
      org.apache.spark.sql.catalyst.expressions.RowOrdering.isOrderable(rvType)
    val orderKeys =
      if (rvOrderable) Seq(col(tsCol), col("_side"), col("_rv"))
      else Seq(col(tsCol), col("_side"))
    val w = Window
      .partitionBy(keyCol)
      .orderBy(orderKeys: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    tagged
      .withColumn("_asof", last(col("_rv"), ignoreNulls = true).over(w))
      .where(col("_side") === 1)
      .select((leftCols.map(col) ++ rightVals.map(c => col(s"_asof.$c").as(s"asof_$c"))): _*)
  }
}
