package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev probe (optimization round): does a lineage cut preserve the
  * frame's hash partitioning for downstream planning?
  *
  * r17 found `localCheckpoint` under AQE reports UnknownPartitioning,
  * so Pregel loops re-exchange both join sides every iteration. The
  * candidate fix: execute the cut with AQE disabled (conf set/restore
  * around the eager checkpoint) so the LogicalRDD captures the
  * executed plan's HashPartitioning, then plan downstream with AQE
  * back on. This probe prints the downstream plans for both variants.
  */
object PartProbe {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def cutAqeOff(df: DataFrame): DataFrame = {
      val conf = df.sparkSession.conf
      val prev = conf.get("spark.sql.adaptive.enabled", "true")
      conf.set("spark.sql.adaptive.enabled", "false")
      try df.localCheckpoint() finally
        conf.set("spark.sql.adaptive.enabled", prev)
    }

    val base = spark.range(0, 1000000)
      .select((col("id") % 10000).as("id"), col("id").as("v"))

    println("=== A: plain localCheckpoint (AQE on), groupBy(id) ===")
    val a = base.repartition(col("id")).localCheckpoint()
    a.groupBy("id").agg(sum("v")).explain("formatted")

    println("=== B: cutAqeOff, groupBy(id) ===")
    val b = cutAqeOff(base.repartition(col("id")))
    b.groupBy("id").agg(sum("v")).explain("formatted")

    println("=== C: cutAqeOff, self-join on id (shuffle_hash hint) ===")
    val c2 = cutAqeOff(base.repartition(col("id"))
      .select(col("id"), (col("v") * 2).as("w")))
    b.join(c2.hint("shuffle_hash"), "id").explain("formatted")

    println("=== D: join-derived partitioning survives cutAqeOff? ===")
    // mimics eo = cut(e.join(out, "src")): the join's output
    // partitioning (hashpartitioning(src)) should be captured.
    val e = spark.range(0, 1000000)
      .select((col("id") % 5000).as("src"), (col("id") % 7777).as("dst"))
    val out = e.groupBy("src").agg(count(lit(1)).as("outdeg"))
    val eo = cutAqeOff(e.join(out, "src"))
    eo.join(b.hint("shuffle_hash"), col("src") === col("id"))
      .groupBy("dst").agg(sum("v")).explain("formatted")

    spark.stop()
  }
}
