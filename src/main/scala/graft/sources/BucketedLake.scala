package graft.sources

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col

/** Bucketed lake tables: pre-shuffled storage for exchange-free joins.
  *
  * The reference pays a Postgres-side hash join on every dashboard hit
  * (fpl-data-pipeline sql_queries.py:118-188 joins the fact to three
  * dims per request). At 100 TB the equivalent fact⋈fact join is THE
  * dominant exchange: co-locating both tables on the join key at WRITE
  * time (Spark's `bucketBy` — hash-partitioned files + footer metadata)
  * removes it from every subsequent query. The one-time write shuffle
  * is amortized across every join that follows — the same economics as
  * C17/C19's sketch columns, applied to partitioning instead of
  * aggregation.
  *
  * Mechanics: `repartition(buckets, key)` BEFORE the bucketed write
  * aligns task partitions with bucket ids (same murmur3 hash mod n), so
  * each bucket lands in exactly ONE file — which is what lets the
  * reader trust per-file sort order and skip the sort as well. Without
  * it every write task emits a sliver of every bucket (small-file
  * explosion) and the reader must re-sort. `sortBy(key)` orders rows
  * within each bucket so sort-merge join streams both sides directly.
  *
  * Joining two tables bucketed (same bucket count) on the join key
  * plans as SortMergeJoin with NO Exchange and NO Sort on either side
  * (PlanSpec pins this), and a follow-up groupBy on the join key — or
  * any superset of it — also rides the bucketing.
  *
  * Cluster sizing: bucket count is a write-time commitment — size it
  * like shuffle partitions (≈ total cores × 2-3, so each bucket holds
  * 100-500 MB at the table's full scale). All writers of the table
  * must agree on (key, count) or the co-location silently degrades to
  * a plain shuffle join.
  */
object BucketedLake {

  /** Write `df` as an external parquet table bucketed + sorted on
    * `key`, registered as `tableName` (read back via
    * `spark.table(tableName)` — bucketing metadata lives in the
    * catalog, not the files).
    */
  def writeBucketed(df: DataFrame, tableName: String, path: String,
                    key: String, buckets: Int): Unit = {
    // tableName reaches raw SQL (DROP TABLE) — keep it an identifier
    require(tableName.matches("[A-Za-z_][A-Za-z0-9_]*"),
      s"table name must be a bare SQL identifier, got '$tableName'")
    val spark = df.sparkSession
    spark.sql(s"DROP TABLE IF EXISTS $tableName")
    df.repartition(buckets, col(key))
      .write.format("parquet")
      .bucketBy(buckets, key).sortBy(key)
      .option("path", path)
      .mode("overwrite")
      .saveAsTable(tableName)
  }

  /** Idempotent face of [[writeBucketed]]: skip the DROP + rewrite when
    * the catalog already has `tableName` with the SAME (key, buckets)
    * spec at the SAME location and the files still exist. Re-running a
    * read query must not re-pay the write (nor race a concurrent
    * session on DROP/overwrite); any spec or location drift falls
    * through to the full rewrite, preserving writeBucketed semantics.
    */
  def ensureBucketed(df: DataFrame, tableName: String, path: String,
                     key: String, buckets: Int): Unit = {
    val spark = df.sparkSession
    val reusable = spark.catalog.tableExists(tableName) && {
      try {
        val meta = spark.sessionState.catalog.getTableMetadata(
          org.apache.spark.sql.catalyst.TableIdentifier(tableName))
        val hadoopConf = spark.sparkContext.hadoopConfiguration
        val want = new org.apache.hadoop.fs.Path(path)
          .getFileSystem(hadoopConf).makeQualified(
            new org.apache.hadoop.fs.Path(path))
        val have = new org.apache.hadoop.fs.Path(meta.location)
        meta.bucketSpec.exists(b => b.numBuckets == buckets &&
          b.bucketColumnNames == Seq(key)) &&
          have.getFileSystem(hadoopConf).makeQualified(have) == want &&
          have.getFileSystem(hadoopConf).exists(have)
      } catch { case _: Exception => false }
    }
    if (!reusable) writeBucketed(df, tableName, path, key, buckets)
  }
}
