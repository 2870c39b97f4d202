package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec

/** Dev harness: a plan-hygiene census over the whole query registry —
  * per key, count the physical plan's exchanges, whole-stage-codegen
  * spans, parquet scans with pushed filters, and driver-side
  * collect-like nodes. The numbers that SURVEY §4 argues from, read
  * off every plan mechanically instead of spot-checked.
  *
  * `sbt "runMain graft.tools.PlanAudit <sfDir> [keyFilter]"` — prints
  * one line per key plus a summary. Uses the EXECUTED plan (collect()
  * first) so AQE's final shape is what gets counted.
  */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val keyFilter = args.drop(1).headOption
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .withExtensions(new graft.GraftExtensions)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def walk(p: SparkPlan): Seq[SparkPlan] = {
      val here = p match {
        case a: AdaptiveSparkPlanExec => walk(a.executedPlan)
        // AQE hides each stage's subtree behind .plan (children is
        // empty) — descend explicitly or the census sees nothing
        // below the first shuffle
        case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
          walk(q.plan)
        case _: org.apache.spark.sql.execution.exchange.ReusedExchangeExec =>
          Seq.empty // the original exchange is counted in its own stage
        case other => other +: other.children.flatMap(walk)
      }
      // subqueries (broadcast scalar folds) count too
      here ++ p.subqueries.flatMap(walk)
    }

    var rows = Vector.empty[(String, Int, Int, Int, Boolean)]
    graft.SparkEntry.queries
      .filter(kv => keyFilter.forall(kv._1.contains)).foreach {
        case (name, fn) =>
          try {
            val df = fn(spark, sfDir)
            df.collect()
            val nodes = walk(df.queryExecution.executedPlan)
            val names = nodes.map(_.nodeName)
            val ex = names.count(_.contains("Exchange"))
            val wsc = names.count(_.startsWith("WholeStageCodegen"))
            val scans = names.count(_.contains("Scan"))
            val pushed = nodes.exists(n =>
              n.toString.contains("PushedFilters: [") &&
                !n.toString.contains("PushedFilters: []"))
            rows :+= ((name, ex, wsc, scans, pushed))
          } catch {
            case e: Throwable =>
              System.err.println(s"[planaudit] $name failed: ${e.getMessage}")
          }
      }
    println(f"${"key"}%-28s exchanges codegen scans pushed")
    rows.sortBy(r => (-r._2, r._1)).foreach { case (n, ex, wsc, sc, pf) =>
      println(f"$n%-28s $ex%9d $wsc%7d $sc%5d $pf%6b")
    }
    val tot = rows.size
    if (tot == 0) println("[planaudit] no keys matched / all failed")
    else println(s"[planaudit] keys=$tot " +
      s"median_exchanges=${rows.map(_._2).sorted.apply(tot / 2)} " +
      s"zero_exchange=${rows.count(_._2 == 0)} " +
      s"with_pushdown=${rows.count(_._5)}")
    spark.stop()
  }
}
