package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton) clustered lake layout (SURVEY §2.A10).
  *
  * A lake sorted on one column prunes scans that filter on THAT column
  * and nothing else: parquet min/max stats on the second dimension
  * span the whole domain in every file. Interleaving the bits of k
  * dimensions into one sort key makes every file a small hyper-rectangle
  * of the key space, so row-group/file stats become selective on ALL k
  * dimensions at once — the standard layout trick (Delta/Iceberg
  * OPTIMIZE ZORDER) for multi-dimensional scan pruning at 100 TB,
  * expressed here as plain column algebra + a range-partitioned write.
  *
  * Everything is codegen arithmetic (shift/and/or), no UDF: each
  * dimension is scaled to [[bitsPerDim]] bits against its [min,max],
  * then bit i of dimension j lands at position i·k+j of the z-value
  * (total ≤ 63 bits, so the key never reaches the sign bit).
  */
object ZOrder {

  /** Bits of z-value resolution per dimension: as much as fits in the
    * 63 non-sign bits of a long (a bucket in the sign bit would sort
    * half the key space negative and split the curve), capped at 16 —
    * ample at any file count a table will have.
    */
  def bitsPerDim(k: Int): Int = math.min(16, 63 / k)

  /** Z-interleave of pre-scaled bucket columns (each must already be
    * in [0, 2^bitsPerDim(k) - 1]).
    */
  def interleave(buckets: Seq[Column]): Column = {
    require(buckets.nonEmpty && buckets.size <= 4,
      s"1..4 dimensions (64-bit z-value), got ${buckets.size}")
    val k = buckets.size
    val bits = for {
      i <- 0 until bitsPerDim(k)
      (b, j) <- buckets.zipWithIndex
    } yield shiftleft(shiftright(b, i).bitwiseAND(lit(1L)), i * k + j)
    bits.reduce(_.bitwiseOR(_))
  }

  /** Scale a numeric column to a `bits`-bit bucket against [lo, hi].
    * Degenerate range (hi <= lo) and nulls map to bucket 0.
    */
  def bucket(c: Column, lo: Double, hi: Double, bits: Int): Column = {
    val top = (1L << bits) - 1
    if (hi <= lo) lit(0L)
    else coalesce(least(greatest(
      ((c.cast("double") - lit(lo)) / lit(hi - lo) * lit(top.toDouble)).cast("long"),
      lit(0L)), lit(top)), lit(0L))
  }

  /** The z-value for `dims` of `df`, scaling each dimension against
    * its observed [min,max] (ONE tiny agg job over min/max pairs —
    * write-time clustering amortizes it over every later scan). An
    * empty input (or an all-null dimension) has no range: every row
    * maps to bucket 0, and the write degrades to a plain layout
    * instead of failing.
    */
  def zValue(df: DataFrame, dims: Seq[String]): Column = {
    val aggs = dims.flatMap(d =>
      Seq(min(col(d).cast("double")).as(s"lo_$d"),
          max(col(d).cast("double")).as(s"hi_$d")))
    val r = df.agg(aggs.head, aggs.tail: _*).head()
    val bits = bitsPerDim(dims.size)
    val buckets = dims.zipWithIndex.map { case (d, i) =>
      if (r.isNullAt(2 * i) || r.isNullAt(2 * i + 1)) lit(0L)
      else bucket(col(d), r.getDouble(2 * i), r.getDouble(2 * i + 1), bits)
    }
    interleave(buckets)
  }

  /** Write `df` z-order clustered on `dims` into ~`numFiles` files:
    * range-partition on the z-value (equal-size files regardless of
    * skew in z space), sort within each, drop the helper column. Each
    * output file covers a compact z-range = a small rectangle in dim
    * space, so parquet footer stats prune on every clustered dimension.
    */
  def writeClustered(df: DataFrame, dims: Seq[String], path: String,
                     numFiles: Int = 64): Unit =
    df.withColumn("__z", zValue(df, dims))
      .repartitionByRange(numFiles, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
      .write.mode("overwrite").parquet(path)
}
