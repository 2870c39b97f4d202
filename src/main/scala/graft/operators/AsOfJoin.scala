package graft.operators

import org.apache.spark.sql.{DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (point-in-time) join — the feature-store primitive: each left
  * row picks up the payload of the most recent right row at or before
  * its timestamp, per key. (SURVEY §2.C13; the reference's
  * in-development xG-to-gameweek join is exactly this shape —
  * README.md "In development".)
  *
  * Spark-first realization by composition (preference tier (a)): tag
  * and union both sides, one window pass ordered by (time, side) with
  * `last(payload, ignoreNulls)` carrying the right payload forward.
  * ONE shuffle + sort on (key, time) — same cost as a sort-merge
  * join, no custom physical operator needed, no range-explosion.
  * Right rows sort before left rows at equal time, so "at or before"
  * includes ties.
  */
object AsOfJoin {

  /** @param payloadCols right-side columns to attach (renamed as-is,
    *        so pre-alias them to avoid clashes with left columns)
    *
    * Payloads ride inside a one-field struct: `last(…, ignoreNulls)`
    * must skip the LEFT rows' placeholder (the struct is null there)
    * but still carry a right row whose payload VALUE is null — a null
    * attribute is a value, not a gap (the same contract as
    * [[Scd2]]'s null-safe change detection). Carrying the bare column
    * would silently resurrect the previous non-null version.
    */
  def lastValue(left: DataFrame, right: DataFrame, key: String,
                leftTime: String, rightTime: String,
                payloadCols: Seq[String]): DataFrame = {
    val leftCols = left.columns.toSeq
    val wrapType = (c: String) => new org.apache.spark.sql.types.StructType()
      .add("v", right.schema(c).dataType)
    val tagged =
      left.withColumn("__t", col(leftTime)).withColumn("__side", lit(1))
        .select(Seq(col("__t"), col("__side"), col(key).as("__k")) ++
          leftCols.map(col) ++
          payloadCols.map(c => lit(null).cast(wrapType(c)).as(s"__p_$c")): _*)
      .unionByName(
        right.withColumn("__t", col(rightTime)).withColumn("__side", lit(0))
          .select(Seq(col("__t"), col("__side"), col(key).as("__k")) ++
            leftCols.map(c => lit(null).cast(left.schema(c).dataType).as(c)) ++
            payloadCols.map(c => struct(col(c).as("v")).as(s"__p_$c")): _*))
    val w = Window.partitionBy(col("__k"))
      .orderBy(col("__t"), col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = payloadCols.foldLeft(tagged) { (df, c) =>
      df.withColumn(c,
        last(col(s"__p_$c"), ignoreNulls = true).over(w).getField("v"))
    }
    carried.filter(col("__side") === 1)
      .select(leftCols.map(col) ++ payloadCols.map(col): _*)
  }
}
