package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Versioned, partition-scoped copy-on-write lake table — snapshot
  * isolation, time travel, rollback, and vacuum on plain parquet + a
  * tiny parquet manifest per version (the Delta/Iceberg contract
  * re-derived from first principles; those formats' jars are the real
  * production answer, and this layer keeps their SEMANTICS available
  * on any dumb object store).
  *
  * Layout under `path`:
  * {{{
  *   c00001_<token>/<part>=<v>/part-*.parquet   immutable commit dirs
  *   c00002_<token>/...
  *   _manifests/v00001/                  parquet rows (part, dir)
  *   _manifests/v00002/
  *   _staging/<token>/                   in-flight (never referenced)
  * }}}
  * Commits stage under `_staging/<token>` and move into place by
  * rename at publish; the token in the committed dir name means a
  * crashed attempt's orphan can never collide with a later commit,
  * and the manifest write is the single publication point.
  * A manifest maps every live partition VALUE to the commit dir
  * holding its current files. Commits never mutate existing files —
  * an overwrite writes a new commit dir and a new manifest whose
  * untouched partitions still point at the old dirs. So:
  *  - readers of version v see v's files forever (until vacuum):
  *    snapshot isolation without locks — a reader planned before a
  *    concurrent commit is unaffected by it;
  *  - time travel = read an old manifest;
  *  - rollback = write a NEW manifest with an old manifest's content
  *    (history is preserved — a rollback is itself a version);
  *  - vacuum = delete commit dirs no kept manifest references.
  *
  * At 100 TB: the manifest is O(partitions) rows of two short strings
  * — KB-scale; reads plan one parquet scan per referenced commit dir
  * with an `isin` partition filter (directory pruning at listing
  * time, same as any partitioned read); commit cost is the new data
  * only. This composes with [[LakeWriter.compact]]-style maintenance
  * by writing compacted files as just another commit.
  */
object SnapshotLake {

  private def fs(spark: SparkSession, path: String) =
    new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** Latest committed version, 0 if none. */
  def currentVersion(spark: SparkSession, path: String): Int = {
    val dir = new Path(s"$path/_manifests")
    val f = fs(spark, path)
    if (!f.exists(dir)) 0
    else f.listStatus(dir).map(_.getPath.getName)
      .filter(_.startsWith("v")).map(_.drop(1).toInt)
      .foldLeft(0)(math.max)
  }

  private def readManifest(spark: SparkSession, path: String,
                           version: Int): Map[String, String] =
    spark.read.parquet(f"$path/_manifests/v$version%05d")
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap

  private def writeManifest(spark: SparkSession, path: String, version: Int,
                            entries: Map[String, String]): Unit = {
    import spark.implicits._
    entries.toSeq.sortBy(_._1).toDF("part", "dir")
      .coalesce(1).write.mode("errorifexists")
      .parquet(f"$path/_manifests/v$version%05d")
  }

  /** Commit `df`, replacing exactly the partition VALUES present in it
    * (dynamic-partition-overwrite semantics, but copy-on-write: old
    * files stay for older versions). Returns the new version number.
    */
  /** Merge a staged commit dir's partitions over the previous
    * manifest and publish version `v` — the single publication step
    * both commit paths ([[overwritePartitions]],
    * [[writeAuditPublish]]) share, so the manifest convention can
    * never diverge between them.
    */
  private def publish(spark: SparkSession, path: String, v: Int,
                      dir: String): Int = {
    // the partitions this commit owns = the dirs the write produced
    val written = fs(spark, path).listStatus(new Path(s"$path/$dir"))
      .map(_.getPath.getName).filter(_.contains("="))
      .map(_.split("=", 2)(1)).toSeq
    val prev = if (v == 1) Map.empty[String, String]
               else readManifest(spark, path, v - 1)
    writeManifest(spark, path, v, prev ++ written.map(_ -> dir))
    v
  }

  /** Stage `df` under `_staging/<token>` — never under a version
    * name. A crash after staging leaves an orphan that can NEVER
    * block a later commit (version dirs are claimed only at publish
    * time, by rename); [[cleanStaging]] reclaims the space.
    */
  private def stage(df: DataFrame, path: String, partCol: String): String = {
    val token = s"s${java.util.UUID.randomUUID().toString.replace("-", "")}"
    df.write.partitionBy(partCol).mode("errorifexists")
      .parquet(s"$path/_staging/$token")
    token
  }

  /** Move a staged commit into place (rename — the files move,
    * nothing is rewritten) and publish its manifest. The committed
    * dir name carries the staging token, so it can NEVER collide
    * with an orphan from a crashed attempt at the same version; the
    * manifest's errorifexists write remains the one publication
    * point (a concurrent writer racing to the same version throws
    * there, and its uncommitted dir is vacuum's to reclaim).
    */
  private def publishStaged(spark: SparkSession, path: String,
                            token: String): Int = {
    val f = fs(spark, path)
    val v = currentVersion(spark, path) + 1
    val dir = f"c$v%05d_$token"
    require(f.rename(new Path(s"$path/_staging/$token"),
                     new Path(s"$path/$dir")),
      s"publishStaged: rename of staged commit $token failed at $path")
    publish(spark, path, v, dir)
  }

  /** Remove ALL staged-but-unpublished commit data. Safe only when no
    * writer is in flight (an in-flight stage would be deleted too) —
    * an ops call, not part of any commit path.
    */
  def cleanStaging(spark: SparkSession, path: String): Unit = {
    val p = new Path(s"$path/_staging")
    val f = fs(spark, path)
    if (f.exists(p)) f.delete(p, true)
  }

  def overwritePartitions(df: DataFrame, path: String,
                          partCol: String): Int = {
    val token = stage(df, path, partCol)
    publishStaged(df.sparkSession, path, token)
  }

  /** Write-audit-publish (A15 — the commit discipline production
    * Delta/Iceberg deployments run): STAGE the commit's data files,
    * AUDIT the staged bytes with declarative expectations
    * ([[graft.operators.Expectations]]), and PUBLISH the manifest only
    * if every rule passes. The audit reads the files the write
    * produced — not the input plan — so encoding/schema surprises in
    * the staged bytes fail the audit too. A failed audit leaves the
    * table's visible history completely untouched: no manifest is
    * written and the staged directory is removed; readers of any
    * version never observe the rejected data (the manifest IS the
    * publication point, so stage-then-publish needs no lock beyond
    * the manifest's own errorifexists write).
    *
    * @return (audit report (rule, violations, pass), published
    *         version — None when the audit rejected the commit)
    */
  def writeAuditPublish(df: DataFrame, path: String, partCol: String,
                        rowRules: Seq[graft.operators.Expectations.RowRule] = Nil,
                        uniqueCols: Seq[String] = Nil)
      : (DataFrame, Option[Int]) = {
    val spark = df.sparkSession
    // stage under _staging (not a version name): a crash anywhere
    // before the publish rename leaves an orphan that cannot collide
    // with any future commit's version dir
    val token = stage(df, path, partCol)
    val staged = spark.read.parquet(s"$path/_staging/$token")
    // eager: the report must be computed BEFORE any publish/cleanup
    // decision reads it twice — and before the rename moves the files
    val report = graft.operators.Expectations
      .check(staged, rowRules, uniqueCols).localCheckpoint()
    val rejected = report.filter(!col("pass")).limit(1).count() > 0
    if (rejected) {
      fs(spark, path).delete(new Path(s"$path/_staging/$token"), true)
      (report, None)
    } else (report, Some(publishStaged(spark, path, token)))
  }

  /** Read a version (latest by default): one partitioned scan per
    * referenced commit dir, pruned to the partitions that dir still
    * owns, unioned by name.
    */
  def read(spark: SparkSession, path: String,
           version: Option[Int] = None, partCol: String = "part"): DataFrame = {
    val v = version.getOrElse(currentVersion(spark, path))
    require(v >= 1, s"no committed version at $path")
    val entries = readManifest(spark, path, v)
    entries.groupBy(_._2).toSeq.sortBy(_._1).map { case (dir, es) =>
      spark.read.parquet(s"$path/$dir")
        .filter(col(partCol).cast("string").isin(es.keys.toSeq: _*))
    }.reduce(_ unionByName _)
  }

  /** Make `toVersion`'s content the newest version (history kept). */
  def rollback(spark: SparkSession, path: String, toVersion: Int): Int = {
    val v = currentVersion(spark, path) + 1
    writeManifest(spark, path, v, readManifest(spark, path, toVersion))
    v
  }

  /** Delete commit dirs referenced by NONE of the newest
    * `keepVersions` manifests, then drop the older manifests — bounds
    * storage to what the kept history can still read.
    */
  def vacuum(spark: SparkSession, path: String, keepVersions: Int = 1): Unit = {
    val f = fs(spark, path)
    val latest = currentVersion(spark, path)
    val keptFrom = math.max(1, latest - keepVersions + 1)
    val live = (keptFrom to latest)
      .flatMap(readManifest(spark, path, _).values).toSet
    f.listStatus(new Path(path)).map(_.getPath)
      .filter(p => p.getName.startsWith("c") && !live.contains(p.getName))
      .foreach(f.delete(_, true))
    (1 until keptFrom).foreach { v =>
      f.delete(new Path(f"$path/_manifests/v$v%05d"), true)
    }
  }
}
