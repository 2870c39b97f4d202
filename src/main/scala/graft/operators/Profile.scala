package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** One-pass table profiling (data-quality stats per column).
  *
  * The reference's quality probes are ad-hoc single-purpose queries
  * (fpl-data-pipeline test_includes.py: a point lookup and an orphan
  * count); a pipeline operating at corpus scale wants the general
  * instrument: per-column row/null/distinct counts and value bounds,
  * computed in ONE pass over the table, as a queryable DataFrame.
  *
  * Spark-first shape: a single wide aggregate. All columns' counts and
  * min/max ride one partial-aggregated scan; the exact distinct counts
  * plan as Spark's Expand-based multi-distinct — one shuffle whose
  * width is the expand factor (#cols), not one job per column. The
  * typed min/max are converted to canonical strings only in the final
  * projection (numerics via DECIMAL(38,6) so both engines render
  * identical text — see [[canon]]), then the single stats row unpivots
  * through an explode over one struct per column.
  *
  * At 100 TB: exact multi-distinct expands the shuffle #cols-fold —
  * fine for dims, wrong for fact tables. Set `approxDistinct=true` to
  * swap in `approx_count_distinct` (HLL): the expand disappears and the
  * whole profile is one narrow partial-agg pass (estimates are
  * engine-specific, so that variant is spec-pinned, not oracled).
  */
object Profile {

  /** Canonical rendering for bounds. Numerics go through
    * DECIMAL(38,6) so both engines print identical text — note the
    * display contract: 6-dp rounding (a min of 0.0000004 reads
    * "0.000000") and overflow to null beyond ±10^32. Raw typed bounds
    * are a projection away if a caller needs them lossless.
    */
  private def canon(c: Column, dt: DataType): Column = dt match {
    case _: NumericType => c.cast(DecimalType(38, 6)).cast("string")
    case _ => c.cast("string")
  }

  def profile(df: DataFrame, cols: Seq[String],
              approxDistinct: Boolean = false): DataFrame = {
    require(cols.nonEmpty, "profile needs at least one column")
    val dtypes = cols.map(c => c -> df.schema(c).dataType).toMap
    // per-column aliases are positional (__m0, __m1, …), so column
    // NAMES never splice into expression text — any legal Spark
    // column name (spaces, quotes, dots) profiles fine
    val aggs = count(lit(1)).as("__n") +: cols.zipWithIndex.flatMap {
      case (c, i) =>
        Seq(
          count(col(c)).as(s"__nn_$i"),
          (if (approxDistinct) approx_count_distinct(col(c))
           else countDistinct(col(c))).as(s"__nd_$i"),
          canon(min(col(c)), dtypes(c)).as(s"__min_$i"),
          canon(max(col(c)), dtypes(c)).as(s"__max_$i"))
    }
    val wide = df.agg(aggs.head, aggs.tail: _*)
    val rows = cols.zipWithIndex.map { case (c, i) =>
      struct(lit(c).as("col_name"),
        (col("__n") - col(s"__nn_$i")).as("n_nulls"),
        col(s"__nd_$i").as("n_distinct"),
        col(s"__min_$i").as("min_val"),
        col(s"__max_$i").as("max_val"))
    }
    wide
      .select(col("__n").as("n_rows"), explode(array(rows: _*)).as("__r"))
      .select(col("__r.col_name"), col("n_rows"), col("__r.n_nulls"),
        col("__r.n_distinct"), col("__r.min_val"), col("__r.max_val"))
      .orderBy(col("col_name"))
  }
}
