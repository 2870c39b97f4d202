package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Median/MAD robust statistics per group (SURVEY §2 C54) — the
  * heavy-tail-safe location/scale pair: both medians come off the
  * grouped 2-dp-bucket cumulative histogram ([[CumHistogram]]), so
  * the whole computation is two aggregate-sized windows and two
  * broadcast joins regardless of row volume, and every decision
  * downstream is ALL-INTEGER (cent buckets), bit-reproducible in any
  * engine.
  *
  * Shared by the batch outlier report
  * (WarehouseQueries.eventsMadOutliers) and the streaming monitor
  * ([[graft.streaming.StreamingRobust]]), which freezes this output
  * as its lake artifact — one computation, two deployment faces.
  */
object RobustStats {

  /** Cent-bucket median and MAD per group: (group, med_bk, mad_bk).
    * Aggregate-sized output (one row per group).
    */
  def medMadBuckets(df: DataFrame, group: String, value: String): DataFrame = {
    val b = df.select(col(group),
      floor(col(value) * lit(100.0)).cast("long").as("__bk"))
    val counts = b.groupBy(col(group), col("__bk"))
      .agg(count(lit(1)).as("cnt"))
    val med = CumHistogram.cumulativeByGroup(counts, group, "__bk", "cnt")
      .groupBy(col(group))
      .agg(min(when(col("cum") >= lit(0.5) * col("total"), col("__bk")))
        .as("med_bk"))
    val devCounts = counts.join(broadcast(med), Seq(group))
      .groupBy(col(group), abs(col("__bk") - col("med_bk")).as("__dev"))
      .agg(sum(col("cnt")).as("cnt"))
    val mad = CumHistogram.cumulativeByGroup(devCounts, group, "__dev", "cnt")
      .groupBy(col(group))
      .agg(min(when(col("cum") >= lit(0.5) * col("total"), col("__dev")))
        .as("mad_bk"))
    med.join(mad, Seq(group))
  }

  /** Attach (median, mad, is_outlier) to each row from frozen stats.
    * The flag is `|bk − med| > 3·mad` in integer cent buckets; groups
    * with MAD 0 flag nothing (the modified-z statistic is undefined
    * there). Rows in groups absent from `stats` are dropped by the
    * inner join — no calibrated scale, no verdict.
    */
  def flag(df: DataFrame, group: String, value: String,
           stats: DataFrame): DataFrame =
    df.withColumn("__bk", floor(col(value) * lit(100.0)).cast("long"))
      .join(broadcast(stats), Seq(group))
      .withColumn("median", col("med_bk") / lit(100.0))
      .withColumn("mad", col("mad_bk") / lit(100.0))
      .withColumn("is_outlier",
        col("mad_bk") > 0 &&
          abs(col("__bk") - col("med_bk")) > lit(3) * col("mad_bk"))
      .drop("__bk", "med_bk", "mad_bk")
}
