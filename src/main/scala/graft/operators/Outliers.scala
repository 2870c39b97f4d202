package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.Num.dec2

/** Per-group z-score outlier detection.
  *
  * Moments come from decimal-exact Σx/Σx² (2-dp input contract, see
  * [[graft.functions.Num]]) — exact, so identical under any
  * partitioning and in any engine; the z arithmetic is pure IEEE
  * +,·,/,√, all correctly rounded, so even the output doubles are
  * engine-reproducible bit for bit. One partial-agg pass for the
  * moments (broadcast back), one narrow scoring pass — the input
  * never shuffles.
  *
  * Degenerate groups are EXCLUDED, not flagged: a single-row group
  * (variance undefined) or a constant-valued group (variance 0, or a
  * tiny negative under double cancellation) would otherwise emit
  * ±Inf/NaN z-scores that PASS the |z| filter, because engines rank
  * NaN above every double. The guard is `n ≥ 2 AND variance > 0`.
  */
object Outliers {

  /** Input rows whose |z| exceeds `threshold` within their group,
    * with the score as column `z`.
    */
  def zscore(df: DataFrame, group: String, value: String,
             threshold: Double = 3.0): DataFrame = {
    val stats = df.groupBy(col(group)).agg(
      count(lit(1)).as("__n"),
      sum(dec2(col(value))).as("__s1"),
      sum(dec2(col(value)) * dec2(col(value))).as("__s2"))
    val n = col("__n").cast("double")
    val s1 = col("__s1").cast("double")
    val s2 = col("__s2").cast("double")
    val mean = s1 / n
    val variance = (s2 - (s1 * s1) / n) / (n - lit(1.0))
    val z = (col(value) - mean) / sqrt(variance)
    df.join(broadcast(stats), group)
      .filter(col("__n") >= lit(2L) && variance > lit(0.0))
      .withColumn("z", z)
      .filter(abs(col("z")) > lit(threshold))
      .drop("__n", "__s1", "__s2")
  }
}
