package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev harness: time one SparkEntry query key at a given SF dir.
  * `sbt "runMain graft.tools.TimeOne <key> <sfDir>"` — warms up once,
  * then reports a second timed run.
  */
object TimeOne {
  def main(args: Array[String]): Unit = {
    val Array(key, sfDir) = args.take(2)
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.ui.enabled", "false")
      .withExtensions(new graft.GraftExtensions)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val fn = graft.SparkEntry.queries(key)
    // toRdd: materialize every output column (a bare count() lets
    // Catalyst prune projection tails and unique left joins — the
    // Bench main consumes the same way)
    def consume(df: org.apache.spark.sql.DataFrame): Long =
      df.queryExecution.toRdd.count()
    consume(fn(spark, sfDir))
    val t0 = System.nanoTime()
    val n = consume(fn(spark, sfDir))
    println(f"[timeone] $key: ${(System.nanoTime() - t0) / 1e9}%.2f s ($n rows)")
    spark.stop()
  }
}
