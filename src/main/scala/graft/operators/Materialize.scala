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

  /** Eager lineage cut that KEEPS the cut frame's hash partitioning
    * visible to downstream planning.
    *
    * Under AQE the checkpointed LogicalRDD reports
    * UnknownPartitioning(0), so every later join/groupBy on the cut
    * frame re-exchanges it — for a Pregel-style loop that means both
    * join sides re-shuffle every iteration. Executing the cut with
    * AQE disabled makes the LogicalRDD capture the executed plan's
    * final HashPartitioning (and sort order); downstream planning —
    * AQE back on — honors it and elides the exchange, so co-keyed
    * loop frames stay co-located across all iterations.
    *
    * Cost: the cut's own subtree runs without AQE coalescing / skew
    * splitting, at the session's `spark.sql.shuffle.partitions`
    * width. Use for iterative operators, where one fixed loop layout
    * (the classic Pregel discipline — partition once, iterate in
    * place) beats per-iteration adaptivity; the width scales with the
    * session conf, not a constant here.
    */
  def cutAligned(df: DataFrame): DataFrame = {
    val conf = df.sparkSession.conf
    val prev = conf.get("spark.sql.adaptive.enabled", "true")
    conf.set("spark.sql.adaptive.enabled", "false")
    try cut(df) finally conf.set("spark.sql.adaptive.enabled", prev)
  }

  /** [[cutAligned]] + the cut frame's MEASURED materialized bytes
    * (from the block manager — exact and free on the localCheckpoint
    * path; −1 under a reliable checkpoint dir, where reading sizes
    * back would cost a pass). */
  def cutAlignedMeasured(df: DataFrame): (DataFrame, Long) = {
    val sc = df.sparkSession.sparkContext
    if (sc.getCheckpointDir.isDefined) (cutAligned(df), -1L)
    else {
      val before = sc.getRDDStorageInfo.map(_.id).toSet
      val c = cutAligned(df)
      val bytes = sc.getRDDStorageInfo.filterNot(i => before(i.id))
        .map(i => i.memSize + i.diskSize).sum
      (c, bytes)
    }
  }

  /** Partition width for an iterative operator's co-partitioned loop,
    * derived from the measured size of its LARGEST frame (guide-§2
    * scale adaptivity: AQE cannot coalesce inside an aligned loop —
    * the cut frames are not shuffle stages — so the loop sizes its
    * own width). `ceil(bytes / target)` clamped to [1, session
    * spark.sql.shuffle.partitions] — at scale the session cap binds
    * and the loop runs full width; measurement unavailable (reliable
    * checkpoint posture, bytes < 0) also means full width.
    *
    * `targetBytes` is per-OPERATOR: the right per-task byte budget
    * depends on how much compute each loop byte buys. Join-heavy
    * loops (PageRank: every iteration re-joins the whole edge frame)
    * keep full width down to small inputs (256 KiB/task); loops whose
    * per-round jobs are mostly node-sized cuts and aggregations
    * (HITS' 2 cuts/iteration, connected components' pointer jumps)
    * narrow sooner (16 MiB/task) because their cost is per-task
    * overhead, not compute. `spark.graft.loopTargetPartitionBytes`,
    * when set, overrides all of them. */
  def loopWidth(spark: org.apache.spark.sql.SparkSession,
                bytes: Long, targetBytes: Long): Int = {
    val sessionW =
      try spark.conf.get("spark.sql.shuffle.partitions").toInt
      catch { case _: Throwable => spark.sparkContext.defaultParallelism }
    if (bytes < 0) sessionW
    else {
      val target = spark.conf
        .get("spark.graft.loopTargetPartitionBytes", targetBytes.toString)
        .toLong
      math.max(1, math.min(sessionW,
        math.ceil(bytes.toDouble / target).toInt))
    }
  }

  /** The session's `spark.sql.shuffle.partitions` — the width every
    * aligned setup cut materialized at (all its exchanges planned at
    * the session value), so `loopWidth == sessionWidth` means "no
    * re-cut needed" without touching the cut frame's RDD. */
  def sessionWidth(spark: org.apache.spark.sql.SparkSession): Int =
    try spark.conf.get("spark.sql.shuffle.partitions").toInt
    catch { case _: Throwable => spark.sparkContext.defaultParallelism }

  /** Run `body` with `spark.sql.shuffle.partitions` = `w`, so every
    * exchange and aligned cut inside a loop shares one co-partitioned
    * width; restores the session value after. */
  def withWidth[T](spark: org.apache.spark.sql.SparkSession, w: Int)
                  (body: => T): T = {
    val conf = spark.conf
    val prev = conf.get("spark.sql.shuffle.partitions")
    conf.set("spark.sql.shuffle.partitions", w.toString)
    try body finally conf.set("spark.sql.shuffle.partitions", prev)
  }
}
