package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions.col

/** ORC lake variant (SURVEY §2.A13): the same partitioned-lake layout
  * as the parquet paths, on Spark's other built-in columnar format.
  *
  * Why it exists: real estates are mixed — Hive-era warehouses hand
  * ORC tables to a Spark pipeline, and an engine claiming "switch to
  * me" must read/write both without a layout change. Everything the
  * parquet lake relies on carries over because it lives in the SAME
  * DataSource V2 scan machinery: `col=value` partition pruning at
  * file listing, predicate pushdown into ORC stripe/row-group indexes
  * (min/max + optional bloom), column pruning to the projected
  * subset. IngestSpec pins pruning + pushdown on the plan, and the
  * `orc_ingest` gate query proves byte-exact data fidelity through a
  * write→read round-trip against the parquet-derived oracle.
  */
object OrcLake {

  /** Partitioned ORC write; one task per partition dir (the
    * many-small-files discipline of [[LakeWriter.writeByPeriod]]).
    */
  def write(df: DataFrame, partitionCol: String, path: String): Unit =
    df.repartition(col(partitionCol))
      .write.mode(SaveMode.Overwrite)
      .partitionBy(partitionCol)
      .orc(path)

  def read(spark: SparkSession, path: String): DataFrame =
    spark.read.orc(path)
}
