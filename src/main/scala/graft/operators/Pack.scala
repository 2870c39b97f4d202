package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic sequence packing (SURVEY §2.D28): lay documents out
  * as a concatenated token stream and chunk it into fixed-budget
  * context windows — the standard pre-training batching step (docs
  * are concatenated in a fixed order, the stream is cut every
  * `budget` tokens, and an example may straddle a cut; what training
  * needs is a REPRODUCIBLE assignment of every document to its stream
  * offset and starting shard).
  *
  * A single global stream would be one unpartitioned window — the
  * classic scale trap. Instead the caller supplies a `bucket` column
  * (hash of the id, a split id, …): each bucket is an independent
  * stream packed in parallel, the window partitions by bucket, and
  * bucket count is the parallelism dial — at corpus scale, size
  * buckets so one bucket ≈ one task's comfortable sort. Shard ids are
  * (bucket, shard_in_bucket) pairs, so they never require cross-bucket
  * coordination.
  *
  * Returns the input's id/bucket plus `n_tokens`, `start_offset`
  * (position of the doc's first token in its bucket's stream) and
  * `shard` (= start_offset / budget — the context window its first
  * token lands in).
  */
object Pack {

  def concatChunk(df: DataFrame, id: Column, nTokens: Column,
                  bucket: Column, budget: Long): DataFrame = {
    require(budget > 0, s"concatChunk: token budget must be positive, got $budget")
    // window over the RENAMED columns: the caller's id/bucket
    // expressions may reference inputs the projection drops
    val w = Window.partitionBy(col("bucket")).orderBy(col("id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.select(id.as("id"), bucket.as("bucket"), nTokens.as("n_tokens"))
      .withColumn("start_offset", sum(col("n_tokens")).over(w) - col("n_tokens"))
      .withColumn("shard", floor(col("start_offset") / budget))
  }
}
