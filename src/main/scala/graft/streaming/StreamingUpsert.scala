package graft.streaming

import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import graft.operators.Upsert

/** Streaming upsert sink (SURVEY §2.E + §2.A5 composed): the
  * reference's incremental weekly loads (includes.py:148-210 — fetch
  * latest week, ON CONFLICT upsert) as a continuous pipeline.
  *
  * Each micro-batch merges into the lake table via foreachBatch —
  * batch rows win on key collision, exactly the reference's upsert
  * semantics, with the merge running as a distributed anti-join
  * rewrite. (On a table format with MERGE — Delta/Iceberg — the
  * rewrite becomes a metadata-level MERGE INTO; semantics unchanged.)
  */
object StreamingUpsert {

  /** @param versionCol within-batch winner per key = max version
    *        (e.g. the event timestamp); `tiebreak` completes the order
    */
  def start(stream: DataFrame, keys: Seq[String], versionCol: String,
            tiebreak: Seq[String], tablePath: String,
            checkpoint: String): StreamingQuery =
    stream.writeStream
      .outputMode("update")
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val spark = batch.sparkSession
        val deduped = Upsert.keepLatest(batch, keys,
          org.apache.spark.sql.functions.col(versionCol),
          tiebreak.map(org.apache.spark.sql.functions.col))
        val merged = scala.util.Try(spark.read.parquet(tablePath)).toOption match {
          case Some(base) => Upsert.merge(base, deduped, keys)
          case None => deduped
        }
        // swap via aside dir, on the PATH's filesystem (not defaultFS),
        // never deleting the only copy (see LakeWriter.compact)
        val dst = new org.apache.hadoop.fs.Path(tablePath)
        val fs = dst.getFileSystem(spark.sparkContext.hadoopConfiguration)
        val tmp = new org.apache.hadoop.fs.Path(dst.getParent, dst.getName + "__staging")
        val aside = new org.apache.hadoop.fs.Path(dst.getParent, dst.getName + "__prev")
        merged.write.mode(SaveMode.Overwrite).parquet(tmp.toString)
        if (fs.exists(dst))
          require(fs.rename(dst, aside), s"upsert sink: could not move $dst aside")
        require(fs.rename(tmp, dst), s"upsert sink: could not move $tmp into place")
        if (fs.exists(aside))
          require(fs.delete(aside, true), s"upsert sink: could not drop $aside")
        ()
      }
      .trigger(Trigger.AvailableNow())
      .start()

  /** Keep-BEST streaming merge (E41, the D128 crawl-dedup kept live):
    * unlike [[start]] — where the arriving batch unconditionally wins
    * on key collision (keep-LATEST, the upsert contract) — each
    * micro-batch here competes against the standing table under the
    * SAME total order as the within-batch winner: max `versionCol`,
    * ties broken by max `tiebreak`. A previously-stored row with a
    * higher version survives a later arrival. Because max under a
    * total order is associative and commutative, the final table is
    * independent of HOW the input was batched — stream ≡ batch is
    * algebraic, and the read face hash-matches the batch key's oracle
    * under any slicing.
    *
    * Scale shape: per batch, one within-batch window (group sizes =
    * per-batch key multiplicity) + one union-window against the base
    * keyed on the same column — the identical cost class as [[start]]'s
    * anti-join merge. Same staged parquet swap discipline.
    */
  def startKeepBest(stream: DataFrame, keys: Seq[String], versionCol: String,
                    tiebreak: Seq[String], tablePath: String,
                    checkpoint: String): StreamingQuery =
    stream.writeStream
      .outputMode("update")
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val spark = batch.sparkSession
        import org.apache.spark.sql.functions.col
        val deduped = Upsert.keepLatest(batch, keys, col(versionCol),
          tiebreak.map(col))
        val merged = scala.util.Try(spark.read.parquet(tablePath)).toOption match {
          case Some(base) => Upsert.keepLatest(
            base.unionByName(deduped), keys, col(versionCol),
            tiebreak.map(col))
          case None => deduped
        }
        val dst = new org.apache.hadoop.fs.Path(tablePath)
        val fs = dst.getFileSystem(spark.sparkContext.hadoopConfiguration)
        val tmp = new org.apache.hadoop.fs.Path(dst.getParent, dst.getName + "__staging")
        val aside = new org.apache.hadoop.fs.Path(dst.getParent, dst.getName + "__prev")
        merged.write.mode(SaveMode.Overwrite).parquet(tmp.toString)
        if (fs.exists(dst))
          require(fs.rename(dst, aside), s"keep-best sink: could not move $dst aside")
        require(fs.rename(tmp, dst), s"keep-best sink: could not move $tmp into place")
        if (fs.exists(aside))
          require(fs.delete(aside, true), s"keep-best sink: could not drop $aside")
        ()
      }
      .trigger(Trigger.AvailableNow())
      .start()

  /** E3 ∘ A12: the same continuous merge, committed through
    * [[graft.sources.SnapshotLake]] — every micro-batch becomes a
    * VERSIONED copy-on-write commit, so the streaming table gains the
    * full lake contract mid-stream: snapshot-isolated readers (a scan
    * planned at version v is untouched by later commits), time travel
    * across stream progress, and rollback to any earlier batch's
    * state (itself a new version — history preserved).
    *
    * Scale shape: only the partition VALUES present in the batch are
    * read back and rewritten (the manifest carries every untouched
    * partition forward), so per-batch commit cost is O(changed
    * partitions + batch), never O(table). The distinct partition list
    * is the one driver-side collect — bounded by partitions touched
    * per batch.
    */
  def startVersioned(stream: DataFrame, keys: Seq[String], versionCol: String,
                     tiebreak: Seq[String], tablePath: String,
                     checkpoint: String, partCol: String,
                     trigger: Trigger = Trigger.AvailableNow()): StreamingQuery =
    stream.writeStream
      .outputMode("update")
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        import org.apache.spark.sql.functions.col
        val spark = batch.sparkSession
        val deduped = Upsert.keepLatest(batch, keys, col(versionCol),
          tiebreak.map(col))
        val parts = deduped.select(col(partCol).cast("string"))
          .distinct().collect().map(_.getString(0)).toSeq
        if (parts.nonEmpty) {
          val merged =
            if (graft.sources.SnapshotLake.currentVersion(spark, tablePath) >= 1) {
              val base = graft.sources.SnapshotLake
                .read(spark, tablePath, partCol = partCol)
                .filter(col(partCol).cast("string").isin(parts: _*))
              Upsert.merge(base, deduped, keys)
            } else deduped
          graft.sources.SnapshotLake.overwritePartitions(merged, tablePath, partCol)
        }
        ()
      }
      .trigger(trigger)
      .start()
}
