package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** C64: 2-D Pareto skyline (Börzsönyi et al. 2001's SKYLINE OF — the
  * "best trade-off" frontier: rows no other row beats on BOTH
  * dimensions). The multi-objective cousin of top-k: top-k needs a
  * scoring formula, the skyline needs none — it returns every row
  * that could be optimal under SOME monotone preference.
  *
  * The 2-D case reduces to a sort-scan (the paper's own observation):
  * in (x asc, y desc, id asc) order a row is dominated iff SOME
  * strictly-earlier row has y ≥ its y — so the frontier is one
  * running strict-prefix MAX over that order. The scan realizes
  * distributed via the [[PrefixSum]] two-phase recipe with the MAX
  * monoid: range-partition on the order (lineage cut so both reads
  * see the same partition ids), per-partition maxima collapse to an
  * aggregate-sized frame (≤ numParts rows — the ONLY unpartitioned
  * window), cross-partition offsets broadcast back, within-partition
  * prefix maxima run under a PARTITIONED window. No task ever holds
  * more than ~n/numParts rows; a naive `max().over(Window.orderBy)`
  * would funnel the whole table through one task, and the
  * block-nested-loop alternative is all-pairs.
  *
  * Exact-duplicate points (both dims equal) keep the LEAST id —
  * stated contract, mirrored in the oracle's tiebreak disjunct.
  * Dominance compares stored values only (no arithmetic), so doubles
  * compare bit-exact cross-engine. Rows with a null dimension are
  * dropped (dominance is undefined on null — stated contract).
  *
  * Higher dimensions don't sort-scan (d ≥ 3 needs divide-and-conquer
  * or BNL); out of contract here — real curation frontiers
  * (cost/quality, size/fidelity) are overwhelmingly 2-D.
  *
  * @param x  dimension to MINIMIZE
  * @param y  dimension to MAXIMIZE
  * @param id unique tiebreak id
  */
object Skyline {

  def paretoFrontier2d(df: DataFrame, x: Column, y: Column,
                       id: Column): DataFrame = {
    val spark = df.sparkSession
    val n = spark.conf.get("spark.sql.shuffle.partitions").toInt
    val in = df.filter(x.isNotNull && y.isNotNull)
      .withColumn("__sk_x", x).withColumn("__sk_y", y)
      .withColumn("__sk_id", id)
    val ord = Seq(col("__sk_x").asc, col("__sk_y").desc, col("__sk_id").asc)
    val parts = Materialize.cut(
        in.repartitionByRange(n, ord: _*).sortWithinPartitions(ord: _*))
      .withColumn("__sk_pid", spark_partition_id())
    // per-partition maxima: aggregate-sized (≤ numParts rows)
    val totals = parts.groupBy(col("__sk_pid"))
      .agg(max(col("__sk_y")).as("__sk_pm"))
    val wOff = Window.orderBy(col("__sk_pid"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = totals
      .withColumn("__sk_off", max(col("__sk_pm")).over(wOff))
      .select(col("__sk_pid"), col("__sk_off"))
    val wIn = Window.partitionBy(col("__sk_pid")).orderBy(ord: _*)
      .rowsBetween(Window.unboundedPreceding, -1)
    parts
      .withColumn("__sk_run", max(col("__sk_y")).over(wIn))
      .join(broadcast(offsets), Seq("__sk_pid"))
      // greatest() skips nulls: null iff no strictly-earlier row at all
      .withColumn("__sk_max", greatest(col("__sk_off"), col("__sk_run")))
      .filter(col("__sk_max").isNull || col("__sk_y") > col("__sk_max"))
      .drop("__sk_pid", "__sk_x", "__sk_y", "__sk_id",
        "__sk_run", "__sk_off", "__sk_max")
  }
}
