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

  /** D43: TRUNCATION-FREE packing — next-fit-decreasing bin packing
    * within each bucket. [[concatChunk]] cuts the stream mid-document
    * (the classic recipe, and the classic complaint: truncation splits
    * reasoning chains — Ding et al. 2024 measure the damage and pack
    * whole documents instead). Here every document lands INSIDE one
    * shard: docs sort by (length desc, id), the fold opens a new shard
    * whenever the next doc doesn't fit, and an oversized doc gets a
    * shard of its own. Next-fit (not best-fit) is the deliberate
    * choice: the assignment is a pure left fold over a deterministic
    * order, so any engine replaying the fold reproduces it exactly —
    * best-fit's bin search is equally deterministic but not
    * expressible as a mirrorable fold, and NFD's waste is bounded
    * (every two consecutive shards together exceed `budget`, so shard
    * count < 2·optimal; decreasing order keeps practical utilization
    * near BFD's).
    *
    * Scale shape: one groupBy(bucket) shuffle carrying (id, n_tokens)
    * pairs only; each bucket's fold is a codegen `aggregate` over its
    * sorted array — bucket count is the parallelism dial exactly as in
    * [[concatChunk]].
    *
    * Output: (id, bucket, n_tokens, shard, offset) — shard local to
    * the bucket, offset = first-token position inside the shard.
    */
  def nextFitDecreasing(df: DataFrame, id: Column, nTokens: Column,
                        bucket: Column, budget: Long): DataFrame = {
    require(budget > 0, s"nextFitDecreasing: token budget must be positive, got $budget")
    val rows = df.select(id.as("id"), bucket.as("bucket"),
      nTokens.cast("long").as("n_tokens"))
    val sorted = rows.groupBy(col("bucket"))
      .agg(array_sort(collect_list(struct(
        (-col("n_tokens")).as("neglen"), col("id").as("id")))).as("docs"))
    val outType = "array<struct<id:bigint,len:bigint,shard:bigint,offset:bigint>>"
    val folded = sorted.select(col("bucket"),
      aggregate(col("docs"),
        struct(lit(0L).as("fill"), lit(-1L).as("shard"),
          array().cast(outType).as("out")),
        (acc, d) => {
          val len = -d.getField("neglen")
          val fits = acc.getField("shard") >= 0 &&
            acc.getField("fill") + len <= budget
          val shard = when(fits, acc.getField("shard"))
            .otherwise(acc.getField("shard") + 1)
          val offset = when(fits, acc.getField("fill")).otherwise(lit(0L))
          struct((offset + len).as("fill"), shard.as("shard"),
            concat(acc.getField("out"), array(struct(
              d.getField("id").as("id"), len.as("len"),
              shard.as("shard"), offset.as("offset")))).as("out"))
        },
        acc => acc.getField("out")).as("packed"))
    folded.select(col("bucket"), explode(col("packed")).as("p"))
      .select(col("p.id").as("id"), col("bucket"),
        col("p.len").as("n_tokens"), col("p.shard").as("shard"),
        col("p.offset").as("offset"))
  }
}
