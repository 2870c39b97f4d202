package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.functions.{col, count, lit}
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.scalatest.funsuite.AnyFunSuite

/** Physical-plan audits: the properties that decide 100 TB viability,
  * asserted on the actual executed plans at sf0.001.
  *
  * These catch regressions like a broadcast silently degrading to a
  * shuffle join, a filter failing to reach the parquet scan, or a
  * join degenerating to cartesian — things row-count tests never see.
  */
class PlanSpec extends AnyFunSuite {
  import SparkTestSession._

  private def planString(df: DataFrame): String = {
    df.collect() // materialize so AQE finalizes the plan
    def unwrap(p: SparkPlan): SparkPlan = p match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case other => other
    }
    unwrap(df.queryExecution.executedPlan).toString
  }

  test("point lookup pushes the predicate into the parquet scan") {
    val p = planString(
      graft.queries.ReferenceQueries.pointLookup(spark, sfDir))
    assert(p.contains("PushedFilters: [IsNotNull(c_name), EqualTo(c_name,Customer#000000042)]")
      || p.matches("(?s).*PushedFilters.*EqualTo\\(c_name.*"),
      s"predicate not pushed:\n$p")
  }

  test("scan pruning: q1 reads only the referenced lineitem columns") {
    val p = planString(
      graft.queries.RelationalQueries.q1PricingSummary(spark, sfDir))
    assert(p.contains("ReadSchema"))
    // the 7 used columns, and specifically NOT the unused wide ones
    assert(!p.contains("l_shipdate") && !p.contains("l_orderkey"),
      s"q1 scans columns it never uses:\n$p")
  }

  test("dashboard joins dims by broadcast, not shuffle") {
    val p = planString(
      graft.queries.ReferenceQueries.dashboardDetail(spark, sfDir))
    assert(p.contains("BroadcastHashJoin"), s"no broadcast join:\n$p")
  }

  test("entity time series pushes the entity predicate into the scan") {
    val p = planString(
      graft.queries.ReferenceQueries.entityTimeSeries(spark, sfDir))
    assert(p.contains("PushedFilters") && p.contains("EqualTo(o_custkey,42)"),
      s"entity filter not pushed down:\n$p")
  }

  test("price histogram aggregates partially before its one shuffle") {
    val p = planString(
      graft.queries.ExtendedQueries.priceHistogram(spark, sfDir))
    assert(p.contains("partial_"), s"no map-side partial aggregation:\n$p")
    assert(p.split("Exchange").length <= 3, // agg exchange + sort for orderBy
      s"histogram should shuffle once for the agg (plus the output sort):\n$p")
  }

  test("decontamination broadcasts the benchmark grams, never shuffles corpus grams") {
    val p = planString(
      graft.queries.TextQueries.decontaminate(spark, sfDir))
    assert(p.contains("BroadcastHashJoin"), s"bench side not broadcast:\n$p")
  }

  test("range join meets through the bucket equality join, never a nested loop") {
    val p = planString(
      graft.queries.ExtendedQueries.eventsRangeJoin(spark, sfDir))
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      s"range join fell back to a nested loop:\n$p")
  }

  test("q5 snowflake: all dim joins broadcast; no cartesian anywhere") {
    val p = planString(
      graft.queries.RelationalQueries.q5LocalSupplier(spark, sfDir))
    assert(p.contains("BroadcastHashJoin"))
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"degenerate join:\n$p")
  }

  test("q1 aggregation is partial (map-side combine before the shuffle)") {
    val p = planString(
      graft.queries.RelationalQueries.q1PricingSummary(spark, sfDir))
    assert(p.contains("HashAggregate"), p)
    val firstAgg = p.indexOf("HashAggregate")
    assert(p.indexOf("HashAggregate", firstAgg + 1) > 0,
      s"expected partial+final aggregate pair:\n$p")
  }

  test("minhash LSH band join shuffles only light columns (no shingle arrays)") {
    val df = graft.queries.TextQueries.dedupMinhashLsh(spark, sfDir)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    // any band-bucket exchange must not carry the shingles column (at
    // tiny SF, AQE may replace it with a broadcast — equally fine)
    val exchanges = p.split("Exchange hashpartitioning\\(band")
    val shCol = "(?<![A-Za-z0-9_])sh(_a|_b)?#".r
    exchanges.tail.foreach { seg =>
      val head = seg.take(200)
      assert(shCol.findFirstIn(head).isEmpty,
        s"band shuffle carries shingles:\n$head")
    }
    // (the verify-stage join legitimately moves shingles — only the
    // quadratic band-bucket exchange must stay light)
  }

  test("span removal: gram counts combine map-side, no nested-loop join anywhere") {
    val df = graft.operators.Dedup.stripRepeatedSpans(
      graft.sources.Tables.documents(spark, sfDir), "text", "doc_id")
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"span removal must stay an equality-join plan:\n$p")
    // the corpus gram-frequency count must partial-aggregate before its
    // exchange — the property that keeps the shuffle ~distinct-gram-sized
    val firstAgg = p.indexOf("HashAggregate")
    assert(firstAgg > 0 && p.indexOf("HashAggregate", firstAgg + 1) > 0,
      s"expected partial+final aggregate pair for gram counts:\n$p")
  }

  test("char-span dedup: the counting exchange keys on the 8-byte gram hash") {
    val df = graft.operators.SuffixDedup.stripRepeatedCharSpans(
      graft.sources.Tables.documents(spark, sfDir), "text", "doc_id")
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"char-span dedup must stay an equality-join plan:\n$p")
    // round 17: the positional rewrite runs through the one-pass
    // kernel (no HOF array_contains probe chain)
    assert(p.contains("strip_covered_windows"),
      s"expected the covered-window rewrite kernel in the plan:\n$p")
    val firstAgg = p.indexOf("HashAggregate")
    assert(firstAgg > 0 && p.indexOf("HashAggregate", firstAgg + 1) > 0,
      s"expected partial+final aggregate pair:\n$p")
    // the nominate pass runs on the O(n) rolling-hash kernel — gram
    // strings must NOT materialize under the counting aggregate. Since
    // round 17 the nominated-survivor frame is materialized
    // (Materialize.cut), so the nominate subtree executes at cut time
    // and is invisible in the strip plan above; assert the shared
    // occHashes kernel on the UNCUT charContamination plan instead
    // (same private occHashes machinery).
    val pc = graft.operators.SuffixDedup.charContamination(
        graft.sources.Tables.documents(spark, sfDir),
        graft.sources.Tables.documents(spark, sfDir)
          .filter(org.apache.spark.sql.functions.col("doc_id") % 10 === 0),
        "text", "doc_id")
      .queryExecution.executedPlan.toString
    assert(pc.contains("char_window_hashes"),
      s"expected the rolling-hash nominate kernel in the plan:\n$pc")
  }

  test("TopKRewrite: the window idiom optimizes into the bounded-heap operator") {
    // the strategy must be available for the rewritten node to plan
    if (!spark.experimental.extraStrategies.contains(graft.plans.TopKStrategy))
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ graft.plans.TopKStrategy
    val prev = spark.experimental.extraOptimizations
    try {
      // other suites may already have attached the rule (registerAll):
      // toggle explicitly, never by assumption
      val off = prev.filterNot(_ == graft.plans.TopKRewrite)
      spark.experimental.extraOptimizations = off
      val base = graft.queries.RelationalQueries.topkPerGroup(spark, sfDir)
        .collect().map(_.toString).sorted.toSeq
      spark.experimental.extraOptimizations = off :+ graft.plans.TopKRewrite
      val df = graft.queries.RelationalQueries.topkPerGroup(spark, sfDir)
      val rewritten = df.collect().map(_.toString).sorted.toSeq
      val p = df.queryExecution.executedPlan match {
        case a: AdaptiveSparkPlanExec => a.executedPlan.toString
        case other => other.toString
      }
      assert(p.contains("TopKPerGroup ["),
        s"window idiom not rewritten to the custom operator:\n$p")
      assert(!p.contains("WindowExec") && !p.contains("WindowGroupLimit"),
        s"rewritten plan still carries a window or a sort-based prune:\n$p")
      // the only Sort left is the query's own final orderBy
      assert(p.split("\\bSort\\b").length - 1 == 1,
        s"heap plan should have no per-partition sorts:\n$p")
      assert(rewritten == base, "rewrite must not change results")
    } finally spark.experimental.extraOptimizations = prev
  }

  test("quotaCap routes through the bounded-heap operator under TopKRewrite") {
    if (!spark.experimental.extraStrategies.contains(graft.plans.TopKStrategy))
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ graft.plans.TopKStrategy
    val prev = spark.experimental.extraOptimizations
    try {
      spark.experimental.extraOptimizations =
        prev.filterNot(_ == graft.plans.TopKRewrite) :+ graft.plans.TopKRewrite
      import org.apache.spark.sql.functions.col
      val df = graft.operators.Resample.quotaCap(
        graft.sources.Tables.documents(spark, sfDir)
          .select(col("doc_id"), col("source")),
        col("source"), Seq(col("doc_id")), quota = 12)
      df.collect()
      val p = planString(df)
      assert(p.contains("TopKPerGroup ["),
        s"quota cap should run on the bounded-heap operator:\n$p")
    } finally spark.experimental.extraOptimizations = prev
  }

  test("TopKRewrite fires on the keep-latest idiom (row_number === 1), not on rank()") {
    if (!spark.experimental.extraStrategies.contains(graft.plans.TopKStrategy))
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ graft.plans.TopKStrategy
    val prev = spark.experimental.extraOptimizations
    try {
      spark.experimental.extraOptimizations =
        prev.filterNot(_ == graft.plans.TopKRewrite) :+ graft.plans.TopKRewrite
      // keep-latest (row_number === 1) must rewrite — and stay correct
      val kept = graft.queries.ReferenceQueries.upsertKeepLatest(spark, sfDir)
      val p1 = planString(kept)
      assert(p1.contains("TopKPerGroup ["),
        s"keep-latest idiom not rewritten:\n$p1")
      // a rank() window rewrites to the ties-kept RankTopK operator,
      // with results identical to the window formulation
      import org.apache.spark.sql.expressions.Window
      import org.apache.spark.sql.functions.{col, dense_rank, rank}
      val w = Window.partitionBy(col("o_custkey")).orderBy(col("o_totalprice").desc)
      def rankQuery = graft.sources.Tables.orders(spark, sfDir)
        .withColumn("rk", rank().over(w)).filter(col("rk") <= 3)
        .select(col("o_custkey"), col("o_orderkey"), col("rk"))
      val ranked = rankQuery
      val rankedRows = ranked.collect().map(_.toString).sorted.toSeq
      val p2 = planString(ranked)
      assert(p2.contains("RankTopK ["),
        s"rank() window should rewrite to the ties-kept operator:\n$p2")
      val offNow = spark.experimental.extraOptimizations
        .filterNot(_ == graft.plans.TopKRewrite)
      spark.experimental.extraOptimizations = offNow
      val rankedBase = rankQuery.collect().map(_.toString).sorted.toSeq
      spark.experimental.extraOptimizations = offNow :+ graft.plans.TopKRewrite
      assert(rankedRows == rankedBase, "rank rewrite must not change results")
      // dense_rank rewrites to the dense variant (first k whole value
      // groups), never to the rank/row_number operators
      def denseQuery = graft.sources.Tables.orders(spark, sfDir)
        .withColumn("rk", dense_rank().over(w)).filter(col("rk") <= 3)
        .select(col("o_custkey"), col("o_orderkey"), col("rk"))
      val dense = denseQuery
      val denseRows = dense.collect().map(_.toString).sorted.toSeq
      val pd = planString(dense)
      assert(pd.contains("DenseRankTopK ["),
        s"dense_rank should rewrite to the dense operator:\n$pd")
      assert(!pd.contains("TopKPerGroup ["),
        s"dense_rank must not route to row_number semantics:\n$pd")
      val offDense = spark.experimental.extraOptimizations
        .filterNot(_ == graft.plans.TopKRewrite)
      spark.experimental.extraOptimizations = offDense
      val denseBase = denseQuery.collect().map(_.toString).sorted.toSeq
      spark.experimental.extraOptimizations = offDense :+ graft.plans.TopKRewrite
      assert(denseRows == denseBase, "dense rewrite must not change results")
      // a rank-slice filter (=== 2) must NOT rewrite
      val sliced = graft.sources.Tables.orders(spark, sfDir)
        .withColumn("rk", org.apache.spark.sql.functions.row_number().over(
          Window.partitionBy(col("o_custkey"))
            .orderBy(col("o_totalprice").desc, col("o_orderkey"))))
        .filter(col("rk") === 2)
      val p3 = planString(sliced)
      assert(!p3.contains("TopKPerGroup ["),
        s"rank slice (=== 2) must not be rewritten:\n$p3")
    } finally spark.experimental.extraOptimizations = prev
  }

  test("custom TopKPerGroupExec plans without a sort or window") {
    val df = graft.queries.ExtendedQueries.topkPerGroupCustom(spark, sfDir)
    val p = planString(df)
    assert(p.contains("TopKPerGroup ["), s"custom exec not planned:\n$p")
    assert(!p.contains("Window"), s"window crept in:\n$p")
    // the only sort allowed is the final presentation orderBy — it must
    // sit ABOVE the custom exec, never below (feeding it)
    val execIdx = p.indexOf("TopKPerGroup [")
    val below = p.substring(execIdx)
    assert(!below.contains("Sort "), s"sort below the heap operator:\n$p")
  }

  test("bloom-pruned join: might_contain probes the fact below the join, result exact") {
    import org.apache.spark.sql.functions.col
    val li = graft.sources.Tables.lineitem(spark, sfDir)
    val sup = graft.sources.Tables.supplier(spark, sfDir)
      .filter(col("s_nationkey") === 3)
      .select(col("s_suppkey"), col("s_name"))
    val pruned = graft.operators.BloomPrune
      .pruneJoin(li, sup, "l_suppkey", "s_suppkey", expectedDimKeys = 4096)
    val p = planString(pruned)
    assert(p.contains("might_contain"),
      s"bloom probe must survive into the physical plan:\n$p")
    val plain = li.join(sup, col("l_suppkey") === col("s_suppkey"))
    assert(pruned.count() == plain.count(),
      "bloom pre-filter must not change the join result")
    // the probe is selective: it passes all matches but strictly fewer
    // rows than the whole fact (that reduction IS the shuffled-bytes
    // saving at scale)
    val bloom = graft.operators.BloomPrune
      .buildBloom(sup, col("s_suppkey"), expectedItems = 4096)
    val passed = li.filter(
      graft.operators.BloomPrune.mightContain(bloom, col("l_suppkey"))).count()
    assert(passed >= plain.count(), "a bloom filter can never drop a true match")
    assert(passed < li.count(), "the probe should reject most non-matching fact rows")
  }

  test("whole-stage codegen covers the kernel expressions") {
    val df = graft.queries.TextQueries.dedupSimhash(spark, sfDir)
    val p = planString(df)
    assert(p.contains("WholeStageCodegen") || df.queryExecution.executedPlan
      .toString.contains("*"), s"no codegen spans:\n$p")
  }

  test("pca projection runs inside whole-stage codegen (kernel, not HOF fallback)") {
    val df = graft.queries.VectorQueries.pcaProject(spark, sfDir)
    val p = planString(df)
    assert(p.contains("vec_project"), s"kernel expression missing:\n$p")
    // the kernel projections must sit inside a codegen span, which a
    // CodegenFallback HOF chain would break
    val projLine = p.linesIterator.find(_.contains("vec_project")).get
    // AQE prints codegen membership as a `*(n)` stage prefix
    assert(p.contains("WholeStageCodegen") || projLine.contains("*("),
      s"projection not in a codegen span:\n$projLine")
    assert(!projLine.contains("aggregate(") && !projLine.contains("zip_with("),
      s"projection fell back to HOF lambdas:\n$projLine")
  }

  test("bucketed join: sort-merge with zero exchanges on either side") {
    // force SMJ (at sf0.001 the dims would broadcast) so the pin is on
    // the bucketing, not on broadcast luck
    withConf("spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1") {
      val p = planString(
        graft.queries.WarehouseQueries.bucketedJoin(spark, sfDir))
      assert(p.contains("SortMergeJoin"), s"expected SMJ:\n$p")
      // the only allowed Exchange is the presentational orderBy sort —
      // neither the join nor the groupBy may reshuffle bucketed data
      val joinPart = p.substring(p.indexOf("SortMergeJoin"))
      assert(!joinPart.contains("Exchange"),
        s"bucketed join/agg reshuffled:\n$p")
    }
  }

  test("funnel: all stage windows ride ONE exchange on the user key") {
    val p = planString(
      graft.queries.WarehouseQueries.funnelSteps(spark, sfDir))
    val userExchanges = "Exchange hashpartitioning\\(user_id".r
      .findAllIn(p).length
    assert(userExchanges == 1,
      s"funnel should shuffle user rows exactly once, saw $userExchanges:\n$p")
  }

  test("scd2 history builds on ONE exchange (filter preserves the sort)") {
    val p = planString(
      graft.queries.WarehouseQueries.scd2History(spark, sfDir))
    val keyExchanges = "Exchange hashpartitioning\\(o_custkey".r
      .findAllIn(p).length
    assert(keyExchanges == 1,
      s"scd2 should shuffle the change log exactly once, saw $keyExchanges:\n$p")
  }

  test("greedy tokenizer runs inside whole-stage codegen") {
    val df = graft.queries.TextQueries.vocabTokenize(spark, sfDir)
    val p = planString(df)
    // AQE renders codegen stages as "*(n)" — the Project carrying the
    // kernel must sit inside one (no HOF lambda dragging it to
    // interpreted eval)
    assert(p.matches("(?s).*\\*\\(\\d+\\)\\s+Project.*greedy_tokenize.*"),
      s"tokenizer projection not codegen'd:\n$p")
    assert(!p.contains("BatchEvalPython") && !p.contains("ScalaUDF"),
      s"tokenizer fell off the codegen path:\n$p")
  }

  test("fuzzy join meets on the variant hash, never a nested loop") {
    val p = planString(
      graft.queries.WarehouseQueries.fuzzyNameMatch(spark, sfDir))
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"fuzzy join degenerated to all-pairs:\n$p")
  }

  test("bm25: the corpus is never hash-exchanged; top-k is TakeOrdered") {
    val p = planString(
      graft.queries.WarehouseQueries.bm25Search(spark, sfDir))
    assert(p.contains("TakeOrderedAndProject"), s"no TakeOrdered:\n$p")
    assert(!p.contains("Exchange hashpartitioning(doc_id"),
      s"bm25 shuffled the corpus:\n$p")
  }

  test("b-bit production path: estimator only — no exact-verify jaccard in the plan") {
    val docs = graft.sources.Tables.documents(spark, sfDir)
    val p = planString(
      graft.operators.Dedup.bbitMinhashPairs(docs, "text", "doc_id"))
    // the point of the path: candidates are judged from packed
    // signatures alone; the shingle-shipping verify join must be gone
    assert(p.contains("bbit_matches"), s"no estimator kernel in plan:\n$p")
    // the verify jaccard expands to array_intersect over shingle sets
    assert(!p.contains("array_intersect"), s"exact verify crept back in:\n$p")
    // and the audit twin genuinely carries both
    val pa = planString(
      graft.operators.Dedup.bbitMinhashAudit(docs, "text", "doc_id"))
    assert(pa.contains("bbit_matches") && pa.contains("array_intersect"))
  }

  test("query likelihood: the corpus is never hash-exchanged; top-k is TakeOrdered") {
    val p = planString(
      graft.queries.WarehouseQueries.qlSearch(spark, sfDir))
    assert(p.contains("TakeOrderedAndProject"), s"no TakeOrdered:\n$p")
    assert(!p.contains("Exchange hashpartitioning(doc_id"),
      s"query likelihood shuffled the corpus:\n$p")
  }

  test("expectations: row rules + uniqueness share ONE scan of the fact table") {
    import graft.operators.Expectations
    val orders = graft.sources.Tables.orders(spark, sfDir)
    val p = planString(Expectations.check(orders,
      rowRules = Seq(
        Expectations.notNull("o_custkey"),
        Expectations.inRange("o_totalprice", 0.0, 400000.0),
        Expectations.inSet("o_orderstatus", Seq("O", "F"))),
      uniqueCols = Seq("o_orderkey")))
    // however many rules, the aggregate leg reads orders exactly once
    val scans = "Scan parquet".r.findAllIn(p).size
    assert(scans == 1, s"expected one fact scan, plan had $scans:\n$p")
  }

  /** Flatten an executed plan including adaptive stages and reused
    * exchanges, so node-type assertions see the whole tree. */
  private def flattenPlan(p: SparkPlan): Seq[SparkPlan] = {
    import org.apache.spark.sql.execution.adaptive.QueryStageExec
    import org.apache.spark.sql.execution.exchange.ReusedExchangeExec
    val next = p match {
      case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
      case q: QueryStageExec => Seq(q.plan)
      case r: ReusedExchangeExec => Seq(r.child)
      case other => other.children
    }
    p +: next.flatMap(flattenPlan)
  }

  /** The de-skew contract of StratifiedTopQuota (SURVEY §2 D47/D48):
    * every row_number window in the plan must rank ONLY the boundary
    * bucket — its input subtree carries the `__stq_bcb` equality
    * filter — never a whole stratum's rows. A full-stratum sort is
    * the 100 TB killer this operator exists to avoid.
    */
  private def assertRankWindowsBoundaryOnly(df: DataFrame): Unit = {
    import org.apache.spark.sql.execution.FilterExec
    import org.apache.spark.sql.execution.window.WindowExec
    df.collect()
    val nodes = flattenPlan(df.queryExecution.executedPlan)
    val rankWindows = nodes.collect {
      case w: WindowExec
        if w.windowExpression.exists(_.toString.contains("row_number")) => w
    }
    assert(rankWindows.nonEmpty, "expected a boundary-bucket rank window")
    rankWindows.foreach { w =>
      val guarded = flattenPlan(w.child).exists {
        case f: FilterExec => f.condition.toString.contains("__stq_bcb")
        case _ => false
      }
      assert(guarded,
        s"row_number window ranks unbounded stratum rows:\n$w")
    }
  }

  test("perplexity filter: no rank window sorts a whole language") {
    assertRankWindowsBoundaryOnly(
      graft.queries.TextQueries.perplexityFilter(spark, sfDir))
  }

  test("temperature mix: no rank window sorts a whole source") {
    assertRankWindowsBoundaryOnly(
      graft.queries.TextQueries.temperatureMix(spark, sfDir))
  }

  /** TokenBudget's de-skew contract (D54): every window in the plan
    * must run either over an AGGREGATE (the <=101-bucket cumulative
    * histogram) or over the boundary-bucket rows only (its subtree
    * carries the `__tb_bb` equality filter). A window over unbounded
    * raw rows is the global sort the operator exists to avoid.
    */
  test("token budget: no window sorts unbounded raw rows") {
    import org.apache.spark.sql.execution.FilterExec
    import org.apache.spark.sql.execution.aggregate.{HashAggregateExec, ObjectHashAggregateExec, SortAggregateExec}
    import org.apache.spark.sql.execution.window.WindowExec
    val df = graft.queries.TextQueries.tokenBudgetSelect(spark, sfDir)
    df.collect()
    val windows = flattenPlan(df.queryExecution.executedPlan)
      .collect { case w: WindowExec => w }
    assert(windows.nonEmpty, "expected the histogram + boundary windows")
    windows.foreach { w =>
      val sub = flattenPlan(w.child)
      val overAggregate = sub.exists {
        case _: HashAggregateExec | _: ObjectHashAggregateExec |
             _: SortAggregateExec => true
        case _ => false
      }
      val boundaryOnly = sub.exists {
        case f: FilterExec => f.condition.toString.contains("__tb_bb")
        case _ => false
      }
      // PrefixSum's within-partition running sum: partitioned by
      // __ps_pid, so it never funnels rows through one task — the
      // exact de-skew this contract protects.
      val partitioned = w.partitionSpec.nonEmpty
      assert(overAggregate || boundaryOnly || partitioned,
        s"unpartitioned window over unbounded raw rows:\n$w")
    }
  }

  /** CumHistogram's unpartitioned window moves its whole input to one
    * task — safe ONLY over a collapsed aggregate. The operator now
    * enforces that at plan-build time; pin both directions.
    */
  test("CumHistogram rejects raw rows, accepts domain aggregates") {
    val raw = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("n_chars"), lit(1L).as("cnt"))
    val err = intercept[IllegalArgumentException] {
      graft.operators.CumHistogram.cumulative(raw, "n_chars", "cnt")
    }
    assert(err.getMessage.contains("domain AGGREGATE"))
    val agg = spark.read.parquet(s"$sfDir/documents.parquet")
      .groupBy(col("n_chars")).agg(count(lit(1)).as("cnt"))
    val ok = graft.operators.CumHistogram.cumulative(agg, "n_chars", "cnt")
    assert(ok.limit(1).count() == 1)
    val okGrouped = graft.operators.CumHistogram.cumulativeByGroup(
      spark.read.parquet(s"$sfDir/documents.parquet")
        .groupBy(col("lang"), col("n_chars")).agg(count(lit(1)).as("cnt")),
      "lang", "n_chars", "cnt")
    assert(okGrouped.limit(1).count() == 1)
  }

  /** GlobalIds' de-sort contract (D60): the per-row rank window must
    * PARTITION (by bucket); any unpartitioned window in the plan must
    * run over an aggregate (the ≤2^bits offsets frame). A global
    * unpartitioned row_number is the single-task sort the operator
    * exists to avoid.
    */
  test("dense_ids: no unpartitioned window over raw rows") {
    import org.apache.spark.sql.execution.aggregate.{HashAggregateExec, ObjectHashAggregateExec, SortAggregateExec}
    import org.apache.spark.sql.execution.window.WindowExec
    val df = graft.queries.TextQueries.denseIds(spark, sfDir)
    df.collect()
    val windows = flattenPlan(df.queryExecution.executedPlan)
      .collect { case w: WindowExec => w }
    assert(windows.nonEmpty, "expected the bucket-rank + offsets windows")
    assert(windows.exists(_.partitionSpec.nonEmpty),
      "expected the bucket-partitioned rank window")
    windows.filter(_.partitionSpec.isEmpty).foreach { w =>
      val overAggregate = flattenPlan(w.child).exists {
        case _: HashAggregateExec | _: ObjectHashAggregateExec |
             _: SortAggregateExec => true
        case _ => false
      }
      assert(overAggregate,
        s"unpartitioned window over raw rows:\n$w")
    }
  }

  test("q6: every predicate reaches the parquet scan; agg is partial") {
    val p = planString(
      graft.queries.RelationalQueries.q6ForecastRevenue(spark, sfDir))
    // the rendered PushedFilters list truncates, so pin the prefix and
    // the full DataFilters (same predicate set, untruncated)
    assert(p.matches("(?s).*PushedFilters.*GreaterThanOrEqual\\(l_shipda.*"),
      s"q6 shipdate bound not pushed to the scan:\n$p")
    assert(p.matches("(?s).*DataFilters.*l_quantity.*") ||
      p.matches("(?s).*PushedFilters.*l_quantity.*"),
      s"q6 quantity bound not at the scan:\n$p")
    assert(p.contains("partial"), s"q6 aggregate not partial:\n$p")
    // no shuffle of data rows: the only exchange is the 1-row final agg
    assert(!p.contains("BroadcastHashJoin") && !p.contains("SortMergeJoin"),
      s"q6 should be a pure scan+agg:\n$p")
  }

  test("q10: orders prune on the quarter at the scan; dims broadcast") {
    val p = planString(
      graft.queries.RelationalQueries.q10ReturnedItems(spark, sfDir))
    assert(p.matches("(?s).*PushedFilters.*EqualTo\\(l_returnflag,R\\).*"),
      s"return-flag filter not pushed:\n$p")
    assert(p.matches("(?s).*PushedFilters.*GreaterThanOrEqual\\(o_orderdate.*"),
      s"quarter filter not pushed into the orders scan:\n$p")
    assert(p.contains("BroadcastHashJoin"), s"dims must broadcast:\n$p")
  }

  test("q4: the EXISTS probe plans as a semi join (no row duplication)") {
    val p = planString(
      graft.queries.RelationalQueries.q4OrderPriority(spark, sfDir))
    assert(p.contains("LeftSemi"), s"expected a semi join:\n$p")
  }

  test("MMR: the pool window partitions by qid (never a global sort)") {
    import org.apache.spark.sql.execution.window.WindowExec
    val q = graft.sources.Tables.embeddings(spark, sfDir)
      .filter(col("vec_id") === 0)
      .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
    val c = graft.sources.Tables.embeddings(spark, sfDir)
      .select(col("vec_id").as("id"), col("embedding").as("vec"))
    val df = graft.operators.MmrRetrieval
      .diversifyBruteForce(spark, q, c, k = 5, lambda = 0.5, poolSize = 20)
    df.collect()
    val nodes = flattenPlan(df.queryExecution.executedPlan)
    val windows = nodes.collect { case w: WindowExec => w }
    // with TopKRewrite installed (production posture) the rk<=pool
    // idiom plans as the bounded-heap operator instead — either way,
    // nothing may sort the corpus globally
    val heap = nodes.exists(_.isInstanceOf[graft.plans.TopKPerGroupExec])
    assert(windows.nonEmpty || heap,
      "expected the pool-cut ranked window or its heap rewrite")
    windows.foreach(w => assert(w.partitionSpec.nonEmpty,
      s"pool window must partition by qid:\n$w"))
  }

  test("quality fusion: every leg and the final cut ride the bounded heap, never a window sort") {
    if (!spark.experimental.extraStrategies.contains(graft.plans.TopKStrategy))
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ graft.plans.TopKStrategy
    val prev = spark.experimental.extraOptimizations
    try {
      val off = prev.filterNot(_ == graft.plans.TopKRewrite)
      spark.experimental.extraOptimizations = off
      val base = graft.queries.TextQueries.qualityFusion(spark, sfDir)
        .collect().map(_.toString).sorted.toSeq
      spark.experimental.extraOptimizations = off :+ graft.plans.TopKRewrite
      val df = graft.queries.TextQueries.qualityFusion(spark, sfDir)
      val rewritten = df.collect().map(_.toString).sorted.toSeq
      val p = df.queryExecution.executedPlan match {
        case a: AdaptiveSparkPlanExec => a.executedPlan.toString
        case other => other.toString
      }
      val heaps = "TopKPerGroup \\[".r.findAllIn(p).length
      assert(heaps == 4,
        s"3 legs + final cut should all be heap operators, saw $heaps:\n$p")
      assert(!p.contains("WindowExec") && !p.contains("WindowGroupLimit"),
        s"fusion plan still carries a window sort:\n$p")
      assert(rewritten == base, "rewrite must not change the fused shortlist")
    } finally spark.experimental.extraOptimizations = prev
  }

  test("cutAligned keeps hash partitioning: downstream groupBy and co-keyed join plan with zero exchanges") {
    import org.apache.spark.sql.functions.sum
    val base = spark.range(0, 100000)
      .select((col("id") % 1000).as("id"), col("id").as("v"))
    // plain cut under AQE loses the layout (the r17-documented gap)
    val plain = graft.operators.Materialize.cut(base.repartition(col("id")))
    val pPlain = planString(plain.groupBy("id").agg(sum("v")))
    assert(pPlain.contains("Exchange"),
      s"expected the plain cut to re-exchange (probe invariant):\n$pPlain")
    // aligned cut: groupBy on the cut key needs NO exchange...
    val aligned = graft.operators.Materialize.cutAligned(
      base.repartition(col("id")))
    val pAgg = planString(aligned.groupBy("id").agg(sum("v")))
    assert(!pAgg.contains("Exchange"),
      s"aligned cut lost its partitioning for the aggregate:\n$pAgg")
    // ...and a co-keyed self-join needs none either (the Pregel shape)
    val other = graft.operators.Materialize.cutAligned(
      base.select(col("id"), (col("v") * 2).as("w"))
        .repartition(col("id")))
    val pJoin = planString(aligned.join(other.hint("shuffle_hash"), "id"))
    assert(!pJoin.contains("Exchange"),
      s"co-partitioned join re-exchanged a side:\n$pJoin")
    // results are the cut frame's rows regardless of layout
    assert(aligned.count() == plain.count())
  }

  test("loopWidth: measured-bytes clamp and the reliable-checkpoint full-width posture") {
    val w = spark.conf.get("spark.sql.shuffle.partitions").toInt
    import graft.operators.Materialize.loopWidth
    assert(loopWidth(spark, -1L, 4L << 20) == w)          // unmeasured → full
    assert(loopWidth(spark, 0L, 4L << 20) == 1)           // empty → 1
    assert(loopWidth(spark, 1L << 20, 4L << 20) == 1)     // small → narrow
    assert(loopWidth(spark, 1L << 40, 4L << 20) == w)     // huge → session cap
    val mid = loopWidth(spark, 9L << 20, 4L << 20)        // ceil(9/4) = 3
    assert(mid == math.min(w, 3), s"mid width was $mid")
  }

  private def withConf(kv: (String, String)*)(body: => Unit): Unit = {
    val old = kv.map { case (k, _) => k -> spark.conf.getOption(k) }
    kv.foreach { case (k, v) => spark.conf.set(k, v) }
    try body finally old.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }
}
