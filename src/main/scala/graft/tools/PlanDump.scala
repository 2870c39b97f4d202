package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev tool: dump `.explain("formatted")` for selected SparkEntry keys
  * to `<outDir>/<key>_<suffix>.txt` — the optimization-round evidence
  * files (plans/r17/). Runs with the same session shape as Bench
  * (local[$SPARK_GRAFT_CPUS], shuffle.partitions = cpus, Graft
  * extensions) so the dumped plans are the benched plans.
  *
  * Usage: tools/run_main.sh graft.tools.PlanDump <sfDir> <outDir> \
  *          <suffix> <key1,key2,...>
  *
  * Note on stream faces: invoking the query fn runs the bounded stream
  * to completion and the dumped plan is the read face — the streaming
  * plan itself is in the checkpoint's offsets/metadata, not here.
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir, suffix, keysCsv) = args.take(4)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .withExtensions(new graft.GraftExtensions)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    new java.io.File(outDir).mkdirs()
    val keys = keysCsv.split(",").map(_.trim).filter(_.nonEmpty)
    keys.foreach { key =>
      val fn = graft.SparkEntry.queries.getOrElse(key,
        sys.error(s"unknown query key: $key"))
      val df = fn(spark, sfDir)
      val plan = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get(s"$outDir/${key}_$suffix.txt"), plan)
      println(s"[plandump] $key -> $outDir/${key}_$suffix.txt")
    }
    spark.stop()
  }
}
