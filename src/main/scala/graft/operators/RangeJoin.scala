package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Range (interval-containment) join without a nested loop (SURVEY
  * §2.C14).
  *
  * A join on `lo <= point < hi` with no equality key plans as
  * BroadcastNestedLoopJoin — quadratic work and a broadcast
  * requirement that collapses when both sides are large. Scalable
  * shape: quantize time into fixed-width buckets. An interval covers
  * a bounded run of buckets (explode), a point lives in exactly one;
  * an equality join on the bucket meets every qualifying pair and the
  * exact predicate refines. Shuffle volume is
  * |points| + |intervals|·(span/width + 1) — linear, AQE-splittable,
  * and the bucket column doubles as a lake partition key for
  * interval-pruned scans at rest.
  */
object RangeJoin {

  /** Inner-join `points` to `intervals` where `lo <= point < hi`
    * (timestamp columns; column names must not clash between the two
    * sides). `bucketSeconds` should be on the order of the typical
    * interval span: wider buckets mean fewer explode rows, narrower
    * buckets fewer refine misses.
    */
  def pointInInterval(points: DataFrame, intervals: DataFrame,
                      point: Column, lo: Column, hi: Column,
                      bucketSeconds: Long): DataFrame = {
    require(bucketSeconds > 0, s"bucketSeconds must be positive, got $bucketSeconds")
    val w = lit(bucketSeconds)
    // hi's bucket is included even though hi itself is exclusive — the
    // refine filter handles the boundary exactly.
    val ib = intervals.withColumn("__bucket",
      explode(sequence(floor(unix_timestamp(lo) / w),
        floor(unix_timestamp(hi) / w))))
    val pb = points.withColumn("__bucket", floor(unix_timestamp(point) / w))
    pb.join(ib, Seq("__bucket"))
      .filter(point >= lo && point < hi)
      .drop("__bucket")
  }
}
