package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** E10: continuous trending heavy hitters — the streaming face of the
  * D22 count-min-sketch path. Each micro-batch folds its occurrences
  * into a per-batch CMS (ONE KB-scale sketch row appended to the
  * lake) and nominates candidates by the same seeded occurrence-hash
  * coins as the batch operator; the read face merges the batch
  * sketches and scores the accumulated candidates.
  *
  * Stream ≡ batch EXACTLY, by construction: CMS counters are sums, so
  * sketches over a partition of the data merge to the identical
  * counter array one sketch over the union would hold (same eps/
  * confidence/seed ⇒ same depth×width and same hash rows), and
  * nomination coins are a pure function of each occurrence's unique
  * id — batch boundaries can't move them. StreamingSpec pins the
  * equality against [[graft.operators.HeavyHitters.topK]].
  *
  * State is the LAKE, not operator memory (the [[StreamingAdmission]]
  * posture): restarts resume from the artifacts, and the trending
  * query is answerable mid-stream from any session. Per-batch cost is
  * O(batch); the artifacts grow by one sketch row + the batch's
  * nominated candidates — the raw stream is never re-scanned.
  */
object StreamingTrending {

  /** Append one micro-batch's sketch + candidates. Also the batch-side
    * backfill entry (run it over a historical table once, then let the
    * stream take over — same artifacts).
    *
    * `batchId` is REQUIRED (no default): the write REPLACES the
    * `batch_id` partition, so two manual calls sharing an id would
    * silently drop all but the last batch's sketch. Streaming callers
    * pass the foreachBatch id; backfill callers must pick ids that are
    * distinct per backfill slice AND disjoint from the stream's
    * (negative ids are the convention — the stream's are ≥ 0).
    */
  def appendBatch(batch: DataFrame, id: Column, elem: Column, path: String,
                  batchId: Long, eps: Double = 0.001,
                  confidence: Double = 0.99, sampleOneIn: Int = 10,
                  seed: Int = 42): Unit = {
    val spark = batch.sparkSession
    import spark.implicits._
    val occ = batch.select(id.as("i"), elem.cast("string").as("e"))
      .localCheckpoint() // two passes over a micro-batch: materialize once
    if (occ.isEmpty) return // an empty trigger has no sketch to append
    val sketch = occ
      .agg(count_min_sketch(col("e"), lit(eps), lit(confidence), lit(seed)))
      .head().getAs[Array[Byte]](0)
    // replay-safe ([[LakeState.putBatch]]): a foreachBatch replay
    // REPLACES its batch_id partition — a duplicated sketch row would
    // silently double-count the batch in the merged CMS.
    LakeState.putBatch(Seq(Tuple1(sketch)).toDF("sketch"),
      s"$path/sketches", batchId)
    LakeState.putBatch(
      occ.filter(pmod(xxhash64(lit(seed.toLong), col("i")),
          lit(sampleOneIn.toLong)) === 0)
        .select(col("e")).distinct(),
      s"$path/candidates", batchId)
  }

  def start(stream: DataFrame, id: Column, elem: Column, path: String,
            checkpoint: String, eps: Double = 0.001,
            confidence: Double = 0.99, sampleOneIn: Int = 10,
            seed: Int = 42,
            trigger: Trigger = Trigger.AvailableNow()): StreamingQuery =
    stream.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        appendBatch(batch, id, elem, path, batchId, eps, confidence,
          sampleOneIn, seed)
      }
      .trigger(trigger)
      .start()

  /** Trending top-k from the artifacts: batch sketches merge
    * driver-side (each is KB-scale — depth×width counters fixed by
    * (eps, confidence), independent of data volume), the merged
    * sketch broadcasts, and the candidate set scores per partition —
    * the [[graft.operators.HeavyHitters]] probe, same output shape
    * (word, est_freq).
    */
  def trendingTopK(spark: SparkSession, path: String, k: Int): DataFrame = {
    import spark.implicits._
    val sketches = spark.read.parquet(s"$path/sketches")
      .collect().map(_.getAs[Array[Byte]]("sketch"))
    require(sketches.nonEmpty, s"no sketches at $path/sketches")
    val merged = sketches.map(b =>
        org.apache.spark.util.sketch.CountMinSketch
          .readFrom(new java.io.ByteArrayInputStream(b)))
      .reduce { (a, b) => a.mergeInPlace(b); a }
    val out = new java.io.ByteArrayOutputStream()
    merged.writeTo(out)
    val bc = spark.sparkContext.broadcast(out.toByteArray)
    spark.read.parquet(s"$path/candidates")
      .select(col("e")).distinct().as[String]
      .mapPartitions { it =>
        val sketch = org.apache.spark.util.sketch.CountMinSketch
          .readFrom(new java.io.ByteArrayInputStream(bc.value))
        it.map(c => (c, sketch.estimateCount(c)))
      }
      .toDF("word", "est_freq")
      .orderBy(col("est_freq").desc, col("word"))
      .limit(k)
  }
}
