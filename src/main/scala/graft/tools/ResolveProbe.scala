package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev harness: break dedup_resolve into its two stages (edge
  * generation vs connected components) and time each at sf0.1 —
  * steady-state, warmed. Not part of the driver contract.
  */
object ResolveProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = "/root/testdata/sf0.1"
    val docs = graft.sources.Tables.documents(spark, dir)

    def t(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"[resolve] $name: ${(System.nanoTime() - t0) / 1e9}%.2f s ($n rows)")
    }

    // warm everything once
    graft.queries.TextQueries.dedupResolve(spark, dir).count()

    t("edges")(graft.operators.Dedup
      .similarityJoinEdges(docs, "text", "doc_id").count())
    t("cc") {
      val edges = graft.operators.Dedup.similarityJoinEdges(docs, "text", "doc_id")
        .localCheckpoint()
      graft.operators.Dedup.connectedComponents(
        edges, docs.select(col("doc_id").as("id"))).count()
    }
    t("full")(graft.queries.TextQueries.dedupResolve(spark, dir).count())
    spark.stop()
  }
}
