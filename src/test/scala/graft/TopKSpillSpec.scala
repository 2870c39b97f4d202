package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.plans.{RankTopK, RankTopKExec, TopKPerGroup, TopKPerGroupExec, TopKRewrite, TopKSpill}

/** The top-k heap execs' defensive bound (VERDICT r3 item 1): high
  * key-cardinality × large k must not OOM. Two layers are pinned here:
  *
  *  1. the execs spill sorted runs past a byte budget and merge-stream
  *     the answer — exact results, spill metrics > 0;
  *  2. `TopKRewrite` declines above `spark.graft.topk.rewrite.maxK`,
  *     keeping the window plan (Spark's own sort-spill path) — plans
  *     pinned on both sides of the threshold.
  */
class TopKSpillSpec extends AnyFunSuite {
  import SparkTestSession._

  private def unwrap(p: SparkPlan): SparkPlan = p match {
    case a: AdaptiveSparkPlanExec => a.executedPlan
    case other => other
  }

  /** Like plan.collect, but descends through AQE wrappers and into
    * materialized query stages (leaf nodes that hide their subplan). */
  private def flatten(p: SparkPlan): Seq[SparkPlan] = {
    val children = p match {
      case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
      case q: QueryStageExec => Seq(q.plan)
      case other => other.children
    }
    p +: children.flatMap(flatten)
  }

  /** 200k rows, 50k keys — heap state is ~50k×k rows, far above the
    * tiny spill budget the tests set. `v` is a scrambled order key;
    * `id` makes the ordering total so row_number output is
    * deterministic. */
  private def wideKeySpace: DataFrame =
    spark.range(200000).select(
      (col("id") % 50000).as("g"),
      ((col("id") * 2654435761L) % 1000003).as("v"),
      col("id"))

  private def withTinySpillBudget[A](f: => A): A = {
    spark.conf.set(TopKSpill.ThresholdKey, (64 * 1024).toString)
    try f finally spark.conf.unset(TopKSpill.ThresholdKey)
  }

  private def withoutRewrite[A](f: => A): A = {
    val prev = spark.experimental.extraOptimizations
    spark.experimental.extraOptimizations =
      prev.filterNot(_ == TopKRewrite)
    try f finally spark.experimental.extraOptimizations = prev
  }

  test("row_number heap spills past the byte budget and stays exact") {
    withTinySpillBudget {
      val df = TopKPerGroup(wideKeySpace, Seq("g"),
        Seq(("v", true), ("id", true)), k = 3)
      val got = df.collect().map(_.toString).sorted.toSeq
      val exec = flatten(df.queryExecution.executedPlan)
        .collectFirst { case e: TopKPerGroupExec => e }
      assert(exec.isDefined, "heap exec not in the executed plan")
      assert(exec.get.metrics("numSpills").value > 0,
        "expected the tiny budget to force spills")
      assert(exec.get.metrics("spilledBytes").value > 0)
      val expected = withoutRewrite {
        wideKeySpace.withColumn("rk", row_number().over(
            Window.partitionBy(col("g")).orderBy(col("v"), col("id"))))
          .filter(col("rk") <= 3)
          .select(col("g"), col("v"), col("id"), col("rk"))
          .collect().map(_.toString).sorted.toSeq
      }
      assert(got == expected, "spilled heap result diverges from the window plan")
    }
  }

  test("rank (ties-kept) exec spills past the byte budget and stays exact") {
    withTinySpillBudget {
      // tie-heavy ordering: v collapses to 7 values per key group
      val ties = spark.range(200000).select(
        (col("id") % 20000).as("g"),
        (col("id") % 7).as("v"),
        col("id"))
      val df = RankTopK(ties, Seq("g"), Seq(("v", true)), k = 2)
      val got = df.collect().map(_.toString).sorted.toSeq
      val exec = flatten(df.queryExecution.executedPlan)
        .collectFirst { case e: RankTopKExec => e }
      assert(exec.isDefined, "rank exec not in the executed plan")
      assert(exec.get.metrics("numSpills").value > 0,
        "expected the tiny budget to force spills")
      val expected = withoutRewrite {
        ties.withColumn("rk", rank().over(
            Window.partitionBy(col("g")).orderBy(col("v"))))
          .filter(col("rk") <= 2)
          .select(col("g"), col("v"), col("id"), col("rk"))
          .collect().map(_.toString).sorted.toSeq
      }
      assert(got == expected, "spilled rank result diverges from the window plan")
    }
  }

  test("dense_rank exec spills past the byte budget and stays exact") {
    withTinySpillBudget {
      val ties = spark.range(200000).select(
        (col("id") % 20000).as("g"),
        (col("id") % 11).as("v"),
        col("id"))
      val df = graft.plans.DenseRankTopK(ties, Seq("g"), Seq(("v", true)), k = 2)
      val got = df.collect().map(_.toString).sorted.toSeq
      val exec = flatten(df.queryExecution.executedPlan)
        .collectFirst { case e: RankTopKExec => e }
      assert(exec.isDefined && exec.get.dense, "dense exec not in the executed plan")
      assert(exec.get.metrics("numSpills").value > 0,
        "expected the tiny budget to force spills")
      val expected = withoutRewrite {
        ties.withColumn("rk", dense_rank().over(
            Window.partitionBy(col("g")).orderBy(col("v"))))
          .filter(col("rk") <= 2)
          .select(col("g"), col("v"), col("id"), col("rk"))
          .collect().map(_.toString).sorted.toSeq
      }
      assert(got == expected, "spilled dense result diverges from the window plan")
    }
  }

  test("TopKRewrite declines above the configured k ceiling (both plans pinned)") {
    val prev = spark.experimental.extraOptimizations
    spark.experimental.extraOptimizations =
      prev.filterNot(_ == TopKRewrite) :+ TopKRewrite
    spark.conf.set(TopKRewrite.MaxKConfKey, "5")
    try {
      def idiom(k: Int): DataFrame =
        wideKeySpace.withColumn("rk", row_number().over(
            Window.partitionBy(col("g")).orderBy(col("v"), col("id"))))
          .filter(col("rk") <= k)
      val small = idiom(3)
      small.collect()
      val pSmall = unwrap(small.queryExecution.executedPlan).toString
      assert(pSmall.contains("TopKPerGroup ["),
        s"k below the ceiling must use the heap plan:\n$pSmall")
      val large = idiom(10)
      large.collect()
      val pLarge = unwrap(large.queryExecution.executedPlan).toString
      assert(!pLarge.contains("TopKPerGroup ["),
        s"k above the ceiling must keep the window plan:\n$pLarge")
      assert(pLarge.contains("Window"),
        s"fallback should be the window formulation:\n$pLarge")
      // same answer on both sides of the threshold boundary shape
      assert(small.count() <= large.count())
    } finally {
      spark.conf.unset(TopKRewrite.MaxKConfKey)
      spark.experimental.extraOptimizations = prev
    }
  }
}
