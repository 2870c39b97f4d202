package graft.operators

import org.apache.spark.sql.DataFrame

/** Lineage cuts for iterative operators (SURVEY §2.C28/D17 loops).
  *
  * `localCheckpoint` stores blocks in executor memory/disk — right in
  * local mode and cheapest everywhere, but on a real cluster an
  * executor loss mid-iteration loses blocks that have no lineage left
  * to recompute, killing the whole job. Reliable `checkpoint` writes
  * to the fault-tolerant checkpoint directory (HDFS/object store) and
  * survives executor loss at the price of a round-trip per cut.
  *
  * The choice follows the session: when the caller has set
  * `SparkContext.setCheckpointDir` (the cluster posture), iterative
  * operators cut lineage reliably; with no checkpoint dir (the local
  * default) they stay local. Both paths are eager, so convergence
  * probes over the just-cut frame never re-run the iteration body,
  * and both yield bit-identical results — WarehouseSpec pins the two
  * paths to equal hashes.
  */
object Materialize {
  /** Eager lineage cut: reliable `checkpoint` when the session has a
    * checkpoint dir, `localCheckpoint` otherwise. */
  def cut(df: DataFrame): DataFrame =
    if (df.sparkSession.sparkContext.getCheckpointDir.isDefined)
      df.checkpoint()
    else df.localCheckpoint()
}
