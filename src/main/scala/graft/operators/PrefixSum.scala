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
                 outCol: String): DataFrame =
    runningSums(df, order, Seq(mass -> outCol))

  /** Several running sums over the SAME order in ONE pass — one
    * range shuffle, one totals aggregate, one partitioned window
    * stage, however many masses ride along. C114-style per-arm
    * cumulatives would otherwise chain a full [[runningSum]] (and a
    * fresh range repartition) per rider.
    */
  def runningSums(df: DataFrame, order: Column,
                  masses: Seq[(Column, String)]): DataFrame = {
    require(masses.nonEmpty, "need at least one (mass, outCol)")
    val spark = df.sparkSession
    val n = spark.conf.get("spark.sql.shuffle.partitions").toInt
    val parts = Materialize.cut(
      df.repartitionByRange(n, order.asc).sortWithinPartitions(order.asc))
      .withColumn("__ps_pid", spark_partition_id())
    val totCols = masses.zipWithIndex.map { case ((m, _), i) =>
      sum(m).as(s"__ps_pm_$i") }
    val totals = parts.groupBy(col("__ps_pid"))
      .agg(totCols.head, totCols.tail: _*)
    val wOff = Window.orderBy(col("__ps_pid"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = totals
      .select(Seq(col("__ps_pid")) ++ masses.indices.map(i =>
        coalesce(sum(col(s"__ps_pm_$i")).over(wOff), lit(0L))
          .as(s"__ps_off_$i")): _*)
    val wIn = Window.partitionBy(col("__ps_pid")).orderBy(order.asc)
      .rowsBetween(Window.unboundedPreceding, 0)
    val withRuns = masses.zipWithIndex.foldLeft(parts) {
      case (acc, ((m, _), i)) =>
        acc.withColumn(s"__ps_run_$i", sum(m).over(wIn))
    }
    val joined = withRuns.join(broadcast(offsets), Seq("__ps_pid"))
    val withOut = masses.zipWithIndex.foldLeft(joined) {
      case (acc, ((_, out), i)) =>
        acc.withColumn(out, col(s"__ps_off_$i") + col(s"__ps_run_$i"))
    }
    withOut.drop(Seq("__ps_pid") ++ masses.indices.flatMap(i =>
      Seq(s"__ps_run_$i", s"__ps_off_$i")): _*)
  }
}
