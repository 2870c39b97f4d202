package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed dense-ID assignment (SURVEY §2 D60): contiguous ids
  * `0..n-1` in `(orderCol, tieCol)` order WITHOUT a global sort or a
  * single-partition window.
  *
  * The naive formulations both collapse at scale: `row_number()` over
  * an unpartitioned window moves the whole corpus through one task,
  * and `orderBy + zipWithIndex` pays a full range-partitioned sort
  * plus an RDD round-trip that drops out of Tungsten. This operator
  * exploits that the caller's order key is a hash (uniform over the
  * signed-long domain — the training-order / shard-assignment use
  * case): the top `bucketBits` bits of the key are MONOTONE in the
  * key (arithmetic shift = floor division by a power of two), so
  *
  *   1. per-bucket counts are a plain AGGREGATE (≤ 2^bucketBits rows),
  *   2. exclusive prefix offsets come off a cumulative window over
  *      that aggregate ([[CumHistogram.cumulative]] — the collapsed-
  *      input invariant is enforced there at plan-build time),
  *   3. each row's id = its bucket's offset + its rank WITHIN the
  *      bucket — a `row_number` window PARTITIONED by bucket, i.e.
  *      ~n/2^bucketBits rows per window partition, never n.
  *
  * At 100 TB: `bucketBits` is the memory dial — 2^12 buckets puts
  * ~25 GB per window partition at 100 TB (too big), 2^20 puts
  * ~100 MB (right-sized); counts/offsets stay a ≤2^20-row aggregate
  * either way (~16 MB broadcast, independent of corpus size). The
  * only full-data exchange is the hash partition on bucket — the
  * same single shuffle the range-sort would pay, minus the sampling
  * pass and the sort's spill behavior.
  *
  * Determinism: ids depend only on (orderCol, tieCol), not on
  * partitioning — reruns and the DuckDB `row_number` oracle reproduce
  * them exactly.
  */
object GlobalIds {

  /** @param df       input rows
    * @param orderCol long-typed primary sort key (hash-uniform for
    *                 balanced buckets; correctness needs only a total
    *                 order with `tieCol`)
    * @param tieCol   unique tiebreak column
    * @param bucketBits log2 of the bucket count (1..20)
    * @param outCol   name of the assigned id column (0-based long)
    */
  def assign(df: DataFrame, orderCol: Column, tieCol: Column,
             bucketBits: Int = 12, outCol: String = "gid"): DataFrame = {
    require(bucketBits >= 1 && bucketBits <= 20,
      s"bucketBits must be in [1, 20], got $bucketBits")
    val in = df
      .withColumn("__ord", orderCol.cast("long"))
      .withColumn("__bkt", shiftright(col("__ord"), 64 - bucketBits))
    val counts = in.groupBy(col("__bkt")).agg(count(lit(1)).as("__c"))
    // inclusive cum over the bucket AGGREGATE → exclusive offset
    val offsets = CumHistogram.cumulative(counts, "__bkt", "__c")
      .select(col("__bkt").as("__obkt"),
        (col("cum") - col("__c")).as("__off"))
    val wb = Window.partitionBy(col("__bkt"))
      .orderBy(col("__ord"), tieCol)
    in.join(broadcast(offsets), col("__bkt") === col("__obkt"))
      .withColumn(outCol,
        col("__off") + row_number().over(wb).cast("long") - lit(1L))
      .drop("__ord", "__bkt", "__obkt", "__off")
  }
}
