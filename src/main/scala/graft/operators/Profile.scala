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
  * projection (numerics via DECIMAL(18,2) so both engines render
  * identical text), then the single stats row unpivots via `stack`.
  *
  * At 100 TB: exact multi-distinct expands the shuffle #cols-fold —
  * fine for dims, wrong for fact tables. Set `approxDistinct=true` to
  * swap in `approx_count_distinct` (HLL): the expand disappears and the
  * whole profile is one narrow partial-agg pass (estimates are
  * engine-specific, so that variant is spec-pinned, not oracled).
  */
object Profile {

  private def canon(c: Column, dt: DataType): Column = dt match {
    case _: NumericType => c.cast(DecimalType(18, 2)).cast("string")
    case _ => c.cast("string")
  }

  def profile(df: DataFrame, cols: Seq[String],
              approxDistinct: Boolean = false): DataFrame = {
    require(cols.nonEmpty, "profile needs at least one column")
    val dtypes = cols.map(c => c -> df.schema(c).dataType).toMap
    val aggs = count(lit(1)).as("__n") +: cols.flatMap { c =>
      Seq(
        count(col(c)).as(s"__nn_$c"),
        (if (approxDistinct) approx_count_distinct(col(c))
         else countDistinct(col(c))).as(s"__nd_$c"),
        canon(min(col(c)), dtypes(c)).as(s"__min_$c"),
        canon(max(col(c)), dtypes(c)).as(s"__max_$c"))
    }
    val wide = df.agg(aggs.head, aggs.tail: _*)
    val stackArgs = cols.map { c =>
      s"'$c', __n - __nn_$c, __nd_$c, __min_$c, __max_$c"
    }.mkString(", ")
    wide
      .selectExpr("__n AS n_rows",
        s"stack(${cols.size}, $stackArgs) " +
          "AS (col_name, n_nulls, n_distinct, min_val, max_val)")
      .select(col("col_name"), col("n_rows"), col("n_nulls"),
        col("n_distinct"), col("min_val"), col("max_val"))
      .orderBy(col("col_name"))
  }
}
