package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev probe (guide §1: measure first): where does fuzzy_name_match
  * spend its time — variant explode+hash, candidate self-join +
  * distinct, or attach+verify?
  */
object FuzzyProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .withExtensions(new graft.GraftExtensions)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.operators.FuzzyJoin
    val base = graft.sources.Tables.customer(spark, sfDir)
      .select(col("c_custkey").as("__id"), col("c_name").as("__val"))
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[fuzzyprobe] $label%-28s ${(System.nanoTime()-t0)/1e9}%6.2f s"); r
    }
    def consume(df: org.apache.spark.sql.DataFrame): Long =
      df.queryExecution.toRdd.count()
    val variants = base.select(col("__id"),
      explode(FuzzyJoin.deletionNeighborhood(col("__val"), 1)).as("__v"))
      .select(col("__id"), xxhash64(col("__v")).as("__h"))
    // warm
    consume(variants); consume(variants)
    val n1 = time("variants explode+hash")(consume(variants))
    val a = variants.toDF("a_id", "__h"); val b = variants.toDF("b_id", "__h")
    val cand = a.join(b, "__h").filter(col("a_id") < col("b_id"))
      .select("a_id", "b_id")
    consume(cand)
    val n2 = time("raw candidate pairs")(consume(cand))
    val dis = cand.distinct()
    consume(dis)
    val n3 = time("distinct pairs")(consume(dis))
    val full = FuzzyJoin.selfJoin(
      graft.sources.Tables.customer(spark, sfDir), "c_custkey", "c_name")
    consume(full)
    val n4 = time("full selfJoin")(consume(full))
    println(s"[fuzzyprobe] rows: variants=$n1 rawCand=$n2 distinct=$n3 out=$n4")
    spark.stop()
  }
}
