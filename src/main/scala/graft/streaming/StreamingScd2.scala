package graft.streaming

import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import graft.operators.Scd2

/** Continuous SCD2 maintenance (E ∘ C20b): a dimension change-log
  * arriving as a stream, the Type-2 history maintained as a lake
  * table. Each micro-batch extends the history via
  * [[Scd2.applyIncremental]] — closed versions and untouched keys
  * pass through, so per-batch cost is O(batch + touched keys'
  * current rows), never a rebuild of the years-deep history. This is
  * the CDC→warehouse dimension pipeline (Debezium-style change feeds
  * into a versioned dim) the reference's current-state-only upsert
  * loses history to.
  *
  * CONTRACT inherited from applyIncremental: batches must arrive in
  * event-time order per key (every batch row strictly later than the
  * already-applied rows of its key) — the natural shape of a CDC feed.
  * Under it the lake table equals the full batch [[Scd2.history]] over
  * everything applied, which is exactly what the driver's hash gate
  * checks on the gated face.
  */
object StreamingScd2 {

  def start(stream: DataFrame, keys: Seq[String], attrs: Seq[String],
            orderCol: String, tiebreak: String,
            tablePath: String, checkpoint: String,
            trigger: Trigger = Trigger.AvailableNow()): StreamingQuery =
    stream.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val spark = batch.sparkSession
        import org.apache.spark.sql.functions.col
        val next = scala.util.Try(spark.read.parquet(tablePath)).toOption match {
          case Some(hist) =>
            // Replay idempotence: a row not STRICTLY later than its
            // key's current valid_from is one the table already
            // absorbed (under the CDC contract a first-time row is
            // later than everything applied) — dropping those makes a
            // foreachBatch replay a no-op even when the original
            // batch opened multiple versions per key. Out-of-contract
            // stragglers are dropped by the same rule: late history
            // repair is a batch rebuild, not a stream append.
            val cur = hist.filter(col("valid_to").isNull)
              .select(keys.map(col) :+ col("valid_from").as("__cur_from"): _*)
            val fresh = batch.join(cur, keys, "left")
              .filter(col("__cur_from").isNull ||
                col(orderCol) > col("__cur_from"))
              .drop("__cur_from")
            Scd2.applyIncremental(hist, fresh, keys, attrs, orderCol, tiebreak)
          case None =>
            Scd2.history(batch, keys, attrs, orderCol, tiebreak)
        }
        // swap via aside dir on the PATH's filesystem, never deleting
        // the only copy (the StreamingUpsert discipline) — a replayed
        // batch recomputes from the pre-crash table either way
        val dst = new org.apache.hadoop.fs.Path(tablePath)
        val fs = dst.getFileSystem(spark.sparkContext.hadoopConfiguration)
        val tmp = new org.apache.hadoop.fs.Path(dst.getParent, dst.getName + "__staging")
        val aside = new org.apache.hadoop.fs.Path(dst.getParent, dst.getName + "__prev")
        next.write.mode(SaveMode.Overwrite).parquet(tmp.toString)
        if (fs.exists(dst))
          require(fs.rename(dst, aside), s"scd2 sink: could not move $dst aside")
        require(fs.rename(tmp, dst), s"scd2 sink: could not move $tmp into place")
        if (fs.exists(aside))
          require(fs.delete(aside, true), s"scd2 sink: could not drop $aside")
        ()
      }
      .trigger(trigger)
      .start()
}
