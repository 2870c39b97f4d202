package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import graft.sources.Tables

/** Driver-gated STREAMING faces: each runs a bounded Structured
  * Streaming query to completion (Trigger.AvailableNow over the
  * static testdata as a file stream) inside an ordinary
  * `(SparkSession, dir) => DataFrame` query — so the stream ≡ batch
  * contract the specs pin moves under the driver's DuckDB hash gate
  * too: the returned frame is the stream's read face, and the oracle
  * is the SAME SQL as the batch twin's.
  *
  * Scale honesty: the temp lake/checkpoint layout is exactly the
  * production one (the lake-as-state recipe); only the source is a
  * bounded file stream. Each invocation runs in a fresh temp dir so
  * bench re-runs time a full cold stream, not a cache.
  */
object StreamFaces {

  /** E23 as a gated key: the continuously-maintained bootstrap CI,
    * run to completion over the documents table arriving as a file
    * stream, then read back through the SAME finisher as D82 — the
    * oracle is bootstrap_quality_ci's SQL verbatim.
    */
  def streamBootstrapCi(spark: SparkSession, dir: String): DataFrame = {
    val base = java.nio.file.Files.createTempDirectory("graft_stream_bs")
      .toFile.getAbsolutePath
    val schema = Tables.documents(spark, dir).schema
    // file streams need a DIRECTORY source; select the one table's
    // file out of the shared testdata dir by glob
    val stream = spark.readStream.schema(schema)
      .option("pathGlobFilter", "documents.parquet")
      .parquet(dir)
    val quality = round(graft.functions.TextFunctions
      .qualityScore(col("text")) * 1000000.0).cast("long")
    val q = graft.streaming.StreamingBootstrap.start(
      stream, col("doc_id"), quality, s"$base/cells", s"$base/ckpt",
      trigger = Trigger.AvailableNow())
    q.awaitTermination()
    graft.streaming.StreamingBootstrap.ciToDate(spark, s"$base/cells")
  }
}
