package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed order-preserving running sum — bit-equal to
  * `sum(mass).over(Window.orderBy(order))` without ever funneling the
  * frame through one task. The classic two-phase scan:
  *
  *   1. range-partition on the order key (ordered partitions), cut
  *      lineage so both reads below see the SAME partition ids;
  *   2. per-partition totals → an aggregate-sized frame (≤ numParts
  *      rows); the cross-partition offsets are a running sum over
  *      THAT — the only unpartitioned window, numParts-sized by
  *      construction;
  *   3. within-partition running sums via a PARTITIONED window
  *      (parallel), plus the broadcast offset.
  *
  * The result is invariant to where the range boundaries fall (any
  * split of the sorted order into ordered partitions yields the same
  * global prefix sums), so RangePartitioner's sampling cannot change
  * a single output bit — only the balance of work.
  *
  * This is the hardening layer under [[TokenBudget]]'s boundary
  * bucket: a degenerate corpus where most docs share one 2-dp score
  * would otherwise push the whole corpus through the single-task
  * `Window.orderBy(id)`; here the same corpus fans out over
  * numParts range partitions (two levels: bucket histogram, then
  * range scan — no task ever holds more than ~corpus/numParts rows).
  */
object PrefixSum {

  /** Append `outCol` = running sum of `mass` in ascending `order`
    * (must be unique — ties would make "running" ill-defined).
    */
  def runningSum(df: DataFrame, order: Column, mass: Column,
                 outCol: String): DataFrame = {
    val spark = df.sparkSession
    val n = spark.conf.get("spark.sql.shuffle.partitions").toInt
    val parts = Materialize.cut(
      df.repartitionByRange(n, order.asc).sortWithinPartitions(order.asc))
      .withColumn("__ps_pid", spark_partition_id())
    val totals = parts.groupBy(col("__ps_pid"))
      .agg(sum(mass).as("__ps_pm"))
    val wOff = Window.orderBy(col("__ps_pid"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = totals
      .withColumn("__ps_off", coalesce(sum(col("__ps_pm")).over(wOff), lit(0L)))
      .select(col("__ps_pid"), col("__ps_off"))
    val wIn = Window.partitionBy(col("__ps_pid")).orderBy(order.asc)
      .rowsBetween(Window.unboundedPreceding, 0)
    parts
      .withColumn("__ps_run", sum(mass).over(wIn))
      .join(broadcast(offsets), Seq("__ps_pid"))
      .withColumn(outCol, col("__ps_off") + col("__ps_run"))
      .drop("__ps_pid", "__ps_run", "__ps_off")
  }
}
