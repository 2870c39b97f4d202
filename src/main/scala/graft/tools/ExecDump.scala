package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.QueryExecution
import org.apache.spark.sql.util.QueryExecutionListener

/** Dev tool: dump the EXECUTED plans of every job a SparkEntry key
  * runs — including the eager lineage cuts of iterative operators,
  * whose per-iteration bodies are invisible in the final frame's
  * `.explain` (they run at cut time). A QueryExecutionListener
  * captures each execution's formatted plan; files land as
  * `<outDir>/<key>_<suffix>_exec<NN>.txt` plus the usual final-frame
  * plan at `<outDir>/<key>_<suffix>.txt`.
  *
  * Usage: tools/run_main.sh graft.tools.ExecDump <sfDir> <outDir> \
  *          <suffix> <key1,key2,...>
  */
object ExecDump {
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

    val plans = new scala.collection.mutable.ArrayBuffer[(String, String, Double)]
    val listener = new QueryExecutionListener {
      override def onSuccess(funcName: String, qe: QueryExecution,
                             durationNs: Long): Unit = synchronized {
        plans += ((funcName, qe.explainString(
          org.apache.spark.sql.execution.FormattedMode), durationNs / 1e9))
      }
      override def onFailure(funcName: String, qe: QueryExecution,
                             exception: Exception): Unit = ()
    }

    val keys = keysCsv.split(",").map(_.trim).filter(_.nonEmpty)
    keys.foreach { key =>
      val fn = graft.SparkEntry.queries.getOrElse(key,
        sys.error(s"unknown query key: $key"))
      plans.clear()
      spark.listenerManager.register(listener)
      val df = fn(spark, sfDir)
      df.queryExecution.toRdd.count()
      // listener callbacks are async — give the bus a moment to drain
      Thread.sleep(1500)
      spark.listenerManager.unregister(listener)
      val finalPlan = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get(s"$outDir/${key}_$suffix.txt"), finalPlan)
      plans.zipWithIndex.foreach { case ((func, p, sec), i) =>
        java.nio.file.Files.writeString(
          java.nio.file.Paths.get(f"$outDir/${key}_${suffix}_exec$i%02d_$func.txt"), p)
        println(f"[execdump]   exec$i%02d $func%-18s ${sec}%6.3f s  " +
          s"(${"\\(\\d+\\) Exchange".r.findAllIn(p).size} Exchange)")
      }
      val nEx = plans.map(_._2).map(p =>
        "\\(\\d+\\) Exchange".r.findAllIn(p).size).sum
      println(s"[execdump] $key: ${plans.size} executions, " +
        s"$nEx Exchange nodes across executed plans -> $outDir")
    }
    spark.stop()
  }
}
