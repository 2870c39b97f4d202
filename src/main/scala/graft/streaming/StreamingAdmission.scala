package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import graft.operators.Dedup

/** Streaming corpus admission (SURVEY §2.E ∘ D23): the growth loop of
  * a training corpus as a continuous pipeline. Each incoming
  * micro-batch is screened for near-duplicates against the lake corpus
  * and against itself ([[Dedup.admitIncremental]]); admitted rows
  * append to the corpus AND their band rows append to the persisted
  * LSH index ([[Dedup.saveBandIndex]]) — so the screen stays O(batch)
  * forever: the existing corpus is never re-shingled, each batch pays
  * for itself exactly once.
  *
  * foreachBatch (not a stateful operator) because admission state is
  * the LAKE — corpus + band index artifacts shared with the batch
  * path, surviving restarts, queryable mid-stream. StreamingSpec pins
  * stream admission ≡ sequential batch admission on the same batches,
  * and that a restarted query resumes against the artifacts.
  */
object StreamingAdmission {

  /** @param corpusPath parquet corpus the stream grows (created on the
    *        first batch if absent)
    * @param indexPath  [[Dedup.saveBandIndex]] artifact kept in step
    *        with the corpus (created if absent)
    */
  def start(stream: DataFrame, textCol: String, idCol: String,
            corpusPath: String, indexPath: String, checkpoint: String,
            shingleSize: Int = 3, bands: Int = 8, rows: Int = 4,
            threshold: Double = 0.5,
            trigger: Trigger = Trigger.AvailableNow()): StreamingQuery =
    stream.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val spark = batch.sparkSession
        // cold start ONLY on genuine path absence — a Try around the
        // read would also swallow transient store errors and silently
        // admit the whole batch against an empty corpus; those must
        // fail the batch so the checkpoint retries
        def exists(path: String): Boolean = {
          val p = new org.apache.hadoop.fs.Path(path)
          p.getFileSystem(spark.sparkContext.hadoopConfiguration).exists(p)
        }
        val existing =
          if (exists(corpusPath)) Some(spark.read.parquet(corpusPath)) else None
        val admittedPlan = existing match {
          case Some(corpus) =>
            // reuse the persisted index; fall back to re-signing the
            // corpus only if the artifact is missing (first run after
            // a manual corpus import)
            val idx = if (exists(indexPath))
              Some(Dedup.loadBandIndex(spark, indexPath)) else None
            Dedup.admitIncremental(corpus, batch, textCol, idCol,
              shingleSize, bands, rows, threshold, existingIndex = idx)
          case None =>
            Dedup.admitIncremental(batch.limit(0), batch, textCol, idCol,
              shingleSize, bands, rows, threshold)
        }
        // materialize BEFORE appending: the plan reads corpusPath, and
        // the index append would otherwise re-execute it against the
        // just-grown corpus (every batch doc would then self-match and
        // the index rows would vanish). localCheckpoint is eager and
        // cuts the lineage to the pre-append file listing.
        val admitted = admittedPlan.localCheckpoint()
        // WRITE ORDER IS LOAD-BEARING under foreachBatch's
        // at-least-once replay: index FIRST, corpus second. Every
        // crash point then converges on replay —
        //  · after index, before corpus: the replayed batch's band
        //    rows point at ex_ids absent from the corpus, so the
        //    exact-verify join drops them; the batch re-admits, the
        //    index gains duplicate rows (candidate nomination
        //    .distinct()s them away), the corpus appends once;
        //  · after both: replayed docs exact-match themselves in the
        //    corpus and are rejected — no duplicate corpus rows, no
        //    index append.
        // Corpus-first instead leaves admitted docs PERMANENTLY
        // unindexed when the index write is the one that dies: the
        // replay self-match rejects the batch, so the index append
        // never happens and later near-dups screen against nothing.
        Dedup.saveBandIndex(
          Dedup.bandIndex(admitted, textCol, idCol, shingleSize, bands, rows),
          indexPath, append = true)
        admitted.write.mode("append").parquet(corpusPath)
        ()
      }
      .trigger(trigger)
      .start()
}
