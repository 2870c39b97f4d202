package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Cross-source quantile normalization (the microarray-era
  * quantile-map, Bolstad et al. 2003, turned on corpus quality
  * scores): different sources' raters sit on different scales — a
  * "0.6" from a clean-wiki source and a "0.6" from a crawl dump mean
  * different things — so per-source scores are mapped onto the GLOBAL
  * score distribution: a doc at the p-th quantile WITHIN its source
  * maps to the global p-th quantile's value. After the map, a fixed
  * threshold means the same thing in every source.
  *
  * EXACT arithmetic: scores ride as 2-dp buckets; a source bucket's
  * within-source cumulative position cum_s/n_s maps to the least
  * global bucket g with cum_g/N ≥ cum_s/n_s, decided by the
  * CROSS-MULTIPLIED integer compare cum_g·n_s ≥ cum_s·N — no double
  * ever enters the decision, so the mapping is bit-stable in any
  * engine/partitioning.
  *
  * Scale shape: ONE corpus scan collapses to per-(source, bucket)
  * counts (aggregate-sized: |sources|·101 rows); both cumulative
  * windows and the mapping join run on that and the 101-row global
  * histogram. The per-doc rewrite is a broadcast join of the mapping
  * table — map-only, not materialized here (the mapping IS the
  * operator's output).
  */
object QuantileNorm {

  private def dec0(c: Column): Column = c.cast(DecimalType(38, 0))

  /** The (source, bucket) → global-bucket mapping table:
    * (source, bucket, n, src_cum, norm_bucket). `bucket` must be an
    * integer score bucket (bounded domain — the 2-dp convention).
    */
  def mappingTable(df: DataFrame, source: Column,
                   bucket: Column): DataFrame = {
    // reused by the per-source cum, the global histogram and the
    // output — cut lineage so the corpus scans once
    val counts = Materialize.cut(
      df.select(source.as("source"), bucket.as("bucket"))
        .groupBy(col("source"), col("bucket"))
        .agg(count(lit(1)).as("n")))
    // the lineage cut erases the Aggregate plan shape CumHistogram's
    // raw-row guard checks for — re-aggregate the (aggregate-sized)
    // cut frame: free, and the guard can see the collapse again
    val countsAgg = counts.groupBy(col("source"), col("bucket"))
      .agg(sum(col("n")).as("n"))
    val srcCum = CumHistogram.cumulativeByGroup(
      countsAgg, "source", "bucket", "n")
      .withColumnRenamed("cum", "src_cum")
      .withColumnRenamed("total", "src_n")
    val globalCounts = counts.groupBy(col("bucket"))
      .agg(sum(col("n")).as("gn"))
    val globalCum = CumHistogram.cumulative(globalCounts, "bucket", "gn")
      .select(col("bucket").as("gb"), col("cum").as("g_cum"),
        col("total").as("g_n"))
    // least global bucket with g_cum·src_n ≥ src_cum·g_n — a non-equi
    // join of two aggregate-sized frames, then min per source bucket
    srcCum.join(broadcast(globalCum),
        dec0(col("g_cum")) * dec0(col("src_n")) >=
          dec0(col("src_cum")) * dec0(col("g_n")))
      .groupBy(col("source"), col("bucket"), col("n"), col("src_cum"))
      .agg(min(col("gb")).as("norm_bucket"))
  }
}
