package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev harness: amplify the sf0.1 tables ~10× in-memory (ids remapped,
  * text perturbed so dedup semantics stay sane) and run the operators
  * whose cost curves matter most at 100 TB. Not part of the driver
  * contract — run with `sbt "runMain graft.tools.ScaleProbe"`.
  */
object ScaleProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", "64")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = "/root/testdata/sf0.1"
    val mult = args.headOption.map(_.toInt).getOrElse(10)
    // optional 2nd arg: comma-separated — run only legs whose name
    // contains one of the patterns (same convention as check.py)
    val legFilter = args.drop(1).headOption.map(_.split(",").toSeq)

    def t(name: String)(f: => Long): Unit =
      if (legFilter.forall(_.exists(name.contains))) {
        val t0 = System.nanoTime()
        val n = f
        println(f"[probe] $name: ${(System.nanoTime() - t0) / 1e9}%.2f s ($n rows)")
      }

    val copies = spark.range(mult).withColumnRenamed("id", "copy")

    // documents ×mult: unique ids, text perturbed per copy so planted
    // near-dup structure is preserved within each copy but not across
    val docs = graft.sources.Tables.documents(spark, dir)
      .crossJoin(copies)
      .select((col("doc_id") * mult + col("copy")).as("doc_id"),
        concat(col("text"), lit(" copytag"), col("copy")).as("text"))
    val li = graft.sources.Tables.lineitem(spark, dir)
      .crossJoin(copies)
      .select((col("l_orderkey") * mult + col("copy")).as("l_orderkey"),
        col("l_partkey"), col("l_suppkey"), col("l_linenumber"),
        col("l_quantity"), col("l_extendedprice"), col("l_discount"),
        col("l_tax"), col("l_returnflag"), col("l_linestatus"), col("l_shipdate"))
    val emb = graft.sources.Tables.embeddings(spark, dir)
      .crossJoin(copies)
      .select((col("vec_id") * mult + col("copy")).as("id"),
        col("embedding").as("vec"))

    println(s"[probe] amplification x$mult: docs=${docs.count()} lineitem=${li.count()} emb=${emb.count()}")

    t("minhash_lsh")(graft.operators.Dedup
      .minhashLsh(docs, "text", "doc_id").count())
    t("bbit_estimate_pairs")(graft.operators.Dedup
      .bbitMinhashPairs(docs, "text", "doc_id").count())
    t("simhash_pairs")(graft.operators.Dedup
      .simhashPairs(docs, "text", "doc_id").count())
    t("exact_dedup")(graft.operators.Dedup
      .exact(docs, col("text"), col("doc_id")).count())
    t("cosine_near_dup")(graft.operators.Similarity
      .cosineNearDup(emb, threshold = 0.35, planes = 8).count())
    t("q1_pricing_style_agg") {
      li.groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(sum(col("l_quantity")), count(lit(1))).count()
    }
    t("window_running_sum") {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("l_suppkey"))
        .orderBy(col("l_shipdate"), col("l_orderkey"), col("l_linenumber"))
      // agg over the window column so Catalyst can't prune the Window
      li.select(col("l_suppkey"),
          sum(col("l_quantity")).over(w).as("r"))
        .agg(count(col("r"))).head.getLong(0)
    }
    t("topk_custom") {
      graft.plans.TopKPerGroup(
        li.select(col("l_suppkey"), col("l_orderkey"), col("l_extendedprice")),
        Seq("l_suppkey"), Seq("l_extendedprice" -> false, "l_orderkey" -> true),
        k = 10).count()
    }
    t("similarity_edges")(graft.operators.Dedup
      .similarityJoinEdges(docs, "text", "doc_id").count())
    t("dedup_resolve") {
      val edges = graft.operators.Dedup
        .similarityJoinEdges(docs, "text", "doc_id")
      graft.operators.Dedup.connectedComponents(
        edges, docs.select(col("doc_id").as("id"))).count()
    }
    t("dedup_resolve_lsh") {
      // scale path: LSH candidates (already exact-verified) → CC; the
      // exact-index leg above pays Σ freq² on this clique-heavy corpus
      val cand = graft.operators.Dedup.minhashLsh(docs, "text", "doc_id")
      graft.operators.Dedup.resolveCandidates(
        docs, "text", "doc_id", cand, verified = true).count()
    }
    t("contamination")(graft.operators.Dedup
      .contamination(docs, docs.filter(col("doc_id") % 10 === 0),
        "text", "doc_id").count())
    t("heavy_hitters") {
      val occ = docs.select(col("doc_id"),
        posexplode(graft.functions.TextFunctions.tokens(col("text")))
          .as(Seq("pos", "word")))
      graft.operators.HeavyHitters.topK(occ,
        struct(col("doc_id"), col("pos")), col("word"), 20).count()
    }
    t("mixture_resample") {
      graft.operators.Resample.byStratum(
        docs.select(col("doc_id"),
          graft.functions.TextFunctions.langId(col("text")).as("lang")),
        col("lang"), col("doc_id"),
        Map("en" -> 0.5, "fr" -> 1.0), defaultFraction = 0.1).count()
    }
    t("frame_sampling") {
      graft.sources.Multimodal.sampleFrames(
        graft.sources.Multimodal.withFakeMedia(docs)).count()
    }
    val ev = graft.sources.Tables.events(spark, dir)
      .crossJoin(copies)
      .select((col("event_id") * mult + col("copy")).as("event_id"),
        col("ts"), col("user_id"), col("value"))
    t("range_join") {
      val windows = ev.select(date_trunc("day", col("ts")).as("day")).distinct()
        .select((col("day") + expr("INTERVAL 8 HOURS")).as("win_lo"),
          (col("day") + expr("INTERVAL 18 HOURS")).as("win_hi"))
      graft.operators.RangeJoin.pointInInterval(
        ev, windows, col("ts"), col("win_lo"), col("win_hi"), 3600).count()
    }
    t("bloom_prune_join") {
      val sup = graft.sources.Tables.supplier(spark, dir)
        .filter(col("s_nationkey") === 3)
        .select(col("s_suppkey"), col("s_name"))
      graft.operators.BloomPrune
        .pruneJoin(li, sup, "l_suppkey", "s_suppkey", expectedDimKeys = 4096)
        .count()
    }
    t("zorder_write_read") {
      val path = "/tmp/graft_probe_zorder"
      graft.sources.ZOrder.writeClustered(
        ev.select(col("event_id"), col("user_id"), col("value")),
        Seq("user_id", "value"), path, numFiles = 64)
      spark.read.parquet(path)
        .filter(col("user_id") <= 100 && col("value") >= 400.0).count()
    }
    t("hll_preagg_union") {
      val daily = ev.groupBy(date_trunc("day", col("ts")).as("day"))
        .agg(hll_sketch_agg(col("user_id")).as("sk"))
      daily.agg(hll_sketch_estimate(hll_union_agg(col("sk")))).head.getLong(0)
    }
    t("repeated_span_strip") {
      // amplified docs repeat every 4-gram ~mult× across copies, so
      // this runs the REMOVAL path at full volume (worst case: nearly
      // every position covered). Aggregate n_removed so count() can't
      // prune the positional rewrite itself out of the plan.
      graft.operators.Dedup.stripRepeatedSpans(docs, "text", "doc_id",
          n = 4, minCount = mult * 2)
        .agg(sum(col("n_removed"))).head.getLong(0)
    }
    t("char_span_strip") {
      // amplified copies multiply every gram's count, so scale the
      // threshold with mult exactly like span_strip above
      graft.operators.SuffixDedup.stripRepeatedCharSpans(
          docs, "text", "doc_id", minLen = 30, minCount = mult * 2)
        .agg(sum(col("n_removed"))).head.getLong(0)
    }
    t("lm_score") {
      graft.operators.LanguageModel.scoreCorpus(
        docs, "text", "doc_id", topK = 64).count()
    }
    t("source_quota_cap") {
      graft.operators.Resample.quotaCap(
        docs.withColumn("src", (col("doc_id") % 500).cast("string")),
        col("src"), Seq(col("doc_id")), quota = 20).count()
    }
    t("kll_preagg_merge") {
      val daily = ev.groupBy(date_trunc("day", col("ts")).as("day"))
        .agg(graft.functions.KllFunctions.kll_sketch_agg(
          col("value").cast("double")).as("sk"))
      daily.agg(graft.functions.KllFunctions.kll_quantiles(
          graft.functions.KllFunctions.kll_merge_agg(col("sk")),
          array(lit(0.5), lit(0.99))))
        .head.getSeq[Double](0).length.toLong
    }
    t("corpus_pipeline") {
      // the capstone composition at amplified scale, optional stages
      // on (span strip + per-stratum quota); resolution rides the
      // LSH-candidate route inside CorpusPipeline
      graft.pipeline.CorpusPipeline.run(
        docs.filter(col("doc_id") % 10 =!= 0)
          .withColumn("src", (col("doc_id") % 100).cast("string")),
        docs.filter(col("doc_id") % 10 === 0).select(col("doc_id"), col("text")),
        "text", "doc_id",
        graft.pipeline.CorpusPipeline.Config(
          stripSpans = Some((4, mult * 2L)),
          quotaPerStratum = Some(("src", 200)))).count()
    }
    t("incremental_admission") {
      graft.operators.Dedup.admitIncremental(
        docs.filter(col("doc_id") % 2 === 0),
        docs.filter(col("doc_id") % 2 === 1),
        "text", "doc_id", threshold = 0.8).count()
    }
    // the lake pattern: band index persisted ONCE (amortized across
    // every later admission), so only the admission itself is timed.
    // Note this corpus is pathological for the index's benefit — every
    // incoming doc collides, so candidate verification touches all
    // existing docs regardless; on a real corpus candidates are rare
    // and the indexed path's existing-side cost collapses with them.
    val idxPath = "/tmp/graft_probe_bandidx"
    graft.operators.Dedup.bandIndex(
        docs.filter(col("doc_id") % 2 === 0), "text", "doc_id")
      .write.mode("overwrite").parquet(idxPath)
    t("incremental_admission_indexed") {
      graft.operators.Dedup.admitIncremental(
        docs.filter(col("doc_id") % 2 === 0),
        docs.filter(col("doc_id") % 2 === 1),
        "text", "doc_id", threshold = 0.8,
        existingIndex = Some(spark.read.parquet(idxPath))).count()
    }
    val ord = graft.sources.Tables.orders(spark, dir)
      .crossJoin(copies)
      .select((col("o_orderkey") * mult + col("copy")).as("o_orderkey"),
        col("o_custkey"), col("o_orderstatus"), col("o_totalprice"),
        col("o_orderdate"), col("o_orderpriority"))
    t("scd2_history") {
      graft.operators.Scd2.history(ord, Seq("o_custkey"),
        Seq("o_orderpriority"), "o_orderdate", "o_orderkey").count()
    }
    t("funnel_steps") {
      val evt = ev.withColumn("event_type",
        element_at(array(lit("view"), lit("click"), lit("purchase")),
          (col("event_id") % 3 + 1).cast("int")))
      graft.operators.Funnel.steps(evt, "user_id", "event_type", "ts",
        "event_id", Seq("view", "click", "purchase"),
        Some(expr("INTERVAL 4 HOURS"))).count()
    }
    t("bucketed_write_join") {
      // one-time co-location cost + the exchange-free join it buys
      val base = "/tmp/graft_probe_bucketed"
      graft.sources.BucketedLake.writeBucketed(ord,
        "probe_orders_b", s"$base/orders", "o_orderkey", 32)
      graft.sources.BucketedLake.writeBucketed(
        li.withColumn("l_orderkey", col("l_orderkey")),
        "probe_lineitem_b", s"$base/lineitem", "l_orderkey", 32)
      spark.table("probe_lineitem_b")
        .join(spark.table("probe_orders_b"),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_orderkey"))
        .agg(count(lit(1))).count()
    }
    t("table_profile") {
      graft.operators.Profile.profile(li,
        Seq("l_suppkey", "l_quantity", "l_returnflag"),
        approxDistinct = true).count()
    }
    t("bm25_search") {
      graft.operators.TextRank.bm25TopK(docs, "doc_id", "text",
        Seq("hash", "join", "vector", "stream"), 50).count()
    }
    t("fuzzy_name_match") {
      // double the copy tag so cross-copy name pairs sit at d=2 and the
      // pair volume stays within-copy (true-dup density, not amplified
      // quadratically)
      val names = graft.sources.Tables.customer(spark, dir)
        .crossJoin(copies)
        .select((col("c_custkey") * mult + col("copy")).as("id"),
          concat(col("c_name"), lit("-"), col("copy"), col("copy")).as("name"))
      graft.operators.FuzzyJoin.selfJoin(names, "id", "name").count()
    }
    t("events_outliers") {
      val stats = ev.groupBy((col("event_id") % 5).as("g")).agg(
        count(lit(1)).as("n"),
        sum(col("value").cast("decimal(18,2)")).as("s1"),
        sum(col("value").cast("decimal(18,2)")
          * col("value").cast("decimal(18,2)")).as("s2"))
      val n = col("n").cast("double")
      val mean = col("s1").cast("double") / n
      val sd = sqrt((col("s2").cast("double")
        - (col("s1").cast("double") * col("s1").cast("double")) / n) / (n - lit(1.0)))
      ev.withColumn("g", col("event_id") % 5)
        .join(broadcast(stats), "g")
        .filter(abs((col("value") - mean) / sd) > 3.0).count()
    }
    t("ewma_smooth") {
      val daily = ev.groupBy(col("user_id"),
          date_trunc("day", col("ts")).as("day"))
        .agg(sum(col("value").cast("decimal(18,2)")).as("dval"))
      graft.operators.Ewma.smooth(daily, "user_id", "day",
        col("dval"), 0.3).count()
    }
    t("vocab_tokenize") {
      docs.select(size(graft.functions.TokenizeKernel.greedySubwordsText(
          col("text"), graft.queries.TextQueries.SubwordVocab, 3)).as("n"))
        .agg(sum(col("n"))).head.getLong(0)
    }
    t("sliding_agg") {
      ev.withColumn("event_type",
          element_at(array(lit("a"), lit("b")), (col("event_id") % 2 + 1).cast("int")))
        .groupBy(window(col("ts"), "1 hour", "15 minutes"), col("event_type"))
        .agg(count(lit(1))).count()
    }
    t("ivfpq_search") {
      val idx = graft.operators.IvfPq.train(emb, "vec", "id", k = 16, dim = 64)
      val codes = graft.operators.IvfPq.encode(emb, "vec", "id", idx)
      val qs = emb.filter(col("id") < 50)
        .select(col("id").as("qid"), col("vec").as("qvec"))
      graft.operators.IvfPq.search(qs, codes, 10, idx,
        refineWith = emb, nprobe = 2).count()
    }
    t("sem_dedup") {
      // k scales with the corpus (the SemDeDup contract): cluster sizes
      // stay ~constant, so the within-cluster pair volume grows ~mult,
      // not mult² — this leg demonstrates that dial. The amplified
      // embeddings repeat each vector `mult`× (cosine-1 planted dups),
      // so the edge/component path runs at full volume too.
      val idx = graft.operators.IvfIndex.train(
        emb, "vec", "id", k = 16 * mult, dim = 64)
      graft.operators.SemDedup.semDedup(
        emb, "vec", "id", idx, threshold = 0.35).count()
    }
    t("lm_bigram_score") {
      graft.operators.LanguageModel.scoreCorpusBigram(
        docs, "text", "doc_id", topK = 64).count()
    }
    t("bpe_train") {
      graft.operators.Bpe.train(docs, "text", numMerges = 64)
        .vocab.length.toLong
    }
    t("pack_nextfit") {
      // bucket count scales with the corpus (the parallelism dial):
      // per-bucket arrays stay one task's comfortable size
      graft.operators.Pack.nextFitDecreasing(docs, col("doc_id"),
        graft.functions.TextFunctions.tokenCount(col("text")),
        pmod(col("doc_id"), lit(8 * mult)), budget = 512L).count()
    }
    t("pagerank") {
      val off = lit(1000000L)
      val cs = graft.sources.Tables.orders(spark, dir).crossJoin(copies)
        .select((col("o_orderkey") * mult + col("copy")).as("ok"),
          (col("o_custkey") * mult + col("copy")).as("c"))
        .join(li.select(col("l_orderkey"), col("l_suppkey")),
          col("ok") === col("l_orderkey"))
        .select(col("c"), (col("l_suppkey") + off).as("s"))
        .distinct()
      val edges = cs.select(col("c").as("src"), col("s").as("dst"))
        .unionAll(cs.select(col("s").as("src"), col("c").as("dst")))
      val nodes = cs.select(col("c").as("id"))
        .unionAll(cs.select(col("s").as("id"))).distinct()
      graft.operators.Centrality.pageRank(edges, nodes, iterations = 10).count()
    }
    t("hits") {
      val off = lit(1000000L)
      val cs = graft.sources.Tables.orders(spark, dir).crossJoin(copies)
        .select((col("o_orderkey") * mult + col("copy")).as("ok"),
          (col("o_custkey") * mult + col("copy")).as("c"))
        .join(li.select(col("l_orderkey"), col("l_suppkey")),
          col("ok") === col("l_orderkey"))
        .select(col("c"), (col("l_suppkey") + off).as("s"))
        .distinct()
      val edges = cs.select(col("c").as("src"), col("s").as("dst"))
      val nodes = cs.select(col("c").as("id"))
        .unionAll(cs.select(col("s").as("id"))).distinct()
      graft.operators.Centrality.hits(edges, nodes, iterations = 8).count()
    }
    // co-purchase part graph at ×mult order volume: the part universe
    // is fixed, so edge DENSITY (not just count) grows — the stress
    // case for the wedge join's O(m^1.5) bound
    t("triangles") {
      val lp = li.select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"))
        .distinct()
      val e = lp.as("a").join(lp.as("b"),
          col("a.ok") === col("b.ok") && col("a.pk") < col("b.pk"))
        .select(col("a.pk").as("u"), col("b.pk").as("v"))
      val nodes = lp.select(col("pk").as("id")).distinct()
      graft.operators.Triangles.nodeTriangles(e, nodes).count()
    }
    t("community_lpa") {
      val lp = li.select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"))
        .distinct()
      val pr = lp.as("a").join(lp.as("b"),
          col("a.ok") === col("b.ok") && col("a.pk") < col("b.pk"))
        .select(col("a.pk").as("u"), col("b.pk").as("v"))
      val edges = pr.select(col("u").as("src"), col("v").as("dst"))
        .unionAll(pr.select(col("v").as("src"), col("u").as("dst")))
      val nodes = lp.select(col("pk").as("id")).distinct()
      graft.operators.Community.labelPropagation(edges, nodes, 5).count()
    }
    // the D47/D48 boundary-bucket walk at full volume: a per-stratum
    // 70% cut over 500k rows — histogram + bulk verdicts + one narrow
    // boundary rank, never a full-stratum sort
    t("stratified_quota") {
      val scored = docs.select(col("doc_id"),
        pmod(col("doc_id"), lit(5)).as("s"),
        pmod(xxhash64(col("doc_id")), lit(1000000L)).as("score"))
      val quotas = scored.groupBy(col("s").cast("string").as("__stratum"))
        .agg(ceil(count(lit(1)) * lit(0.7)).cast("long").as("__quota"))
      graft.operators.StratifiedTopQuota.take(scored, col("s"),
        ord = Seq(col("score"), col("doc_id")),
        coarse = floor(col("score") / lit(1000L)),
        quotas = broadcast(quotas)).count()
    }
    t("pca_project") {
      val m = graft.operators.Pca.train(emb, "vec", "id",
        dim = 64, components = 4)
      emb.select(col("id"),
        graft.operators.Pca.project(col("vec"), m, whiten = true))
        .count()
    }
    // round-10/11 stragglers: the probe legs VERDICT r10 asked for
    t("seed_distance") {
      val off = lit(1000000L)
      val cs = graft.sources.Tables.orders(spark, dir).crossJoin(copies)
        .select((col("o_orderkey") * mult + col("copy")).as("ok"),
          (col("o_custkey") * mult + col("copy")).as("c"))
        .join(li.select(col("l_orderkey"), col("l_suppkey")),
          col("ok") === col("l_orderkey"))
        .select(col("c"), (col("l_suppkey") + off).as("s"))
        .distinct()
      val edges = cs.select(col("c").as("src"), col("s").as("dst"))
        .unionAll(cs.select(col("s").as("src"), col("c").as("dst")))
      val nodes = cs.select(col("c").as("id"))
        .unionAll(cs.select(col("s").as("id"))).distinct()
      val seeds = nodes.filter(col("id") % 97 === 0)
      graft.operators.Centrality.seedDistance(edges, seeds, nodes, 4).count()
    }
    t("weighted_pagerank") {
      val off = lit(1000000L)
      val cs = graft.sources.Tables.orders(spark, dir).crossJoin(copies)
        .select((col("o_orderkey") * mult + col("copy")).as("ok"),
          (col("o_custkey") * mult + col("copy")).as("c"))
        .join(li.select(col("l_orderkey"), col("l_suppkey")),
          col("ok") === col("l_orderkey"))
        .groupBy(col("c"), (col("l_suppkey") + off).as("s"))
        .agg(count(lit(1)).as("w"))
      val edges = cs.select(col("c").as("src"), col("s").as("dst"), col("w").as("weight"))
        .unionAll(cs.select(col("s").as("src"), col("c").as("dst"), col("w").as("weight")))
      val nodes = cs.select(col("c").as("id"))
        .unionAll(cs.select(col("s").as("id"))).distinct()
      graft.operators.Centrality.weightedPageRank(edges, nodes, 10).count()
    }
    t("events_gap_fill") {
      import org.apache.spark.sql.expressions.Window
      val daily = ev.groupBy(col("user_id"),
          date_trunc("day", col("ts")).as("day"))
        .agg(sum(col("value").cast("decimal(18,2)")).as("day_value"))
      val cal = daily.groupBy(col("user_id"))
        .agg(min(col("day")).as("__d0"), max(col("day")).as("__d1"))
        .select(col("user_id"),
          explode(sequence(col("__d0"), col("__d1"),
            expr("INTERVAL 1 DAY"))).as("day"))
      val w = Window.partitionBy(col("user_id")).orderBy(col("day"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      cal.join(daily, Seq("user_id", "day"), "left")
        .select(col("user_id"), col("day"),
          last(col("day_value"), ignoreNulls = true).over(w).as("filled"))
        .count()
    }
    t("corpus_drift") {
      // snapshot split by id parity: PSI over token-count buckets
      val snap = docs.withColumn("b",
        least(floor(graft.functions.TextFunctions.tokenCount(col("text")) / 8), lit(20)))
      graft.operators.Drift.psi(
        snap.filter(col("doc_id") % 2 === 0),
        snap.filter(col("doc_id") % 2 === 1), col("b")).count()
    }
    t("unimax_mix") {
      graft.operators.Resample.waterFillByStratum(
        docs.withColumn("src", (col("doc_id") % 200).cast("string")),
        col("src"), col("doc_id"), budget = 40000L).count()
    }
    t("paragraph_dedup") {
      graft.operators.ParagraphDedup.dedup(
        docs, col("text"), col("doc_id")).count()
    }
    t("token_budget") {
      val scored = docs.select(col("doc_id"),
        graft.functions.TextFunctions.qualityScore(col("text")).as("q"),
        graft.functions.TextFunctions.tokenCount(col("text")).cast("long").as("m"))
      val budget = scored.agg(sum(col("m"))).head().getLong(0) / 2
      graft.operators.TokenBudget.select(
        scored, col("q"), col("m"), col("doc_id"), budget).count()
    }
    t("shortest_paths") {
      val off = lit(1000000000L)
      val cs = graft.sources.Tables.orders(spark, dir).crossJoin(copies)
        .select((col("o_orderkey") * mult + col("copy")).as("ok"),
          (col("o_custkey") * mult + col("copy")).as("c"))
        .join(li.select(col("l_orderkey"), col("l_suppkey"), col("l_quantity")),
          col("ok") === col("l_orderkey"))
        .groupBy(col("c"), (col("l_suppkey") + off).as("s"))
        .agg((min(col("l_quantity").cast("decimal(18,2)")) * 100)
          .cast("long").as("w"))
      val edges = cs.select(col("c").as("src"), col("s").as("dst"), col("w"))
        .unionAll(cs.select(col("s").as("src"), col("c").as("dst"), col("w")))
      val nodes = cs.select(col("c").as("id"))
        .unionAll(cs.select(col("s").as("id"))).distinct()
      val seeds = nodes.filter(col("id") % 97 === 0)
      graft.operators.Centrality.weightedDistance(edges, seeds, nodes, 4).count()
    }
    t("mmr_rerank") {
      // many queries in parallel — the per-query pool re-rank is the
      // point: 64 query vectors over the x10 corpus, pool 50, k 10
      val q = emb.filter(col("id") % 997 === 0).limit(64)
        .select(col("id").as("qid"), col("vec").as("qvec"))
      graft.operators.MmrRetrieval.diversifyBruteForce(
        spark, q, emb, k = 10, lambda = 0.5, poolSize = 50).count()
    }
    t("mad_outliers") {
      // the amplified frame drops event_type — synthesize a 5-way
      // group so the per-group histograms match the real shape
      val evt = ev.withColumn("event_type",
        (col("event_id") % 5).cast("string"))
      val stats = graft.operators.RobustStats
        .medMadBuckets(evt, "event_type", "value")
      graft.operators.RobustStats
        .flag(evt, "event_type", "value", stats).count()
    }
    t("zipf_fit") {
      import org.apache.spark.sql.expressions.Window
      val vocab = docs
        .select(explode(split(trim(col("text")), "\\s+")).as("word"))
        .groupBy(col("word")).agg(count(lit(1)).as("freq"))
        .orderBy(col("freq").desc, col("word")).limit(200)
      vocab.withColumn("rank",
          row_number().over(Window.orderBy(col("freq").desc, col("word"))))
        .agg(count(lit(1))).head().getLong(0)
    }
    t("media_decode") {
      import spark.implicits._
      val media = docs.select(col("doc_id")).as[Long]
        .mapPartitions(_.map { id =>
          val (w, h, px) = graft.queries.MultimodalQueries.synthImage(id)
          (id, graft.sources.MediaCodecs.encodeBmp(w, h, px))
        }).toDF("doc_id", "media")
      graft.sources.Multimodal.extractFeatures(media,
        decoder = graft.sources.MediaCodecs.BmpStatsDecoder).count()
    }
    // round-12-opening legs: the new graph / privacy / mixture /
    // media-dedup operators
    t("kcore_layers") {
      val cs = graft.sources.Tables.orders(spark, dir).crossJoin(copies)
        .select((col("o_orderkey") * mult + col("copy")).as("ok"),
          (col("o_custkey") * mult + col("copy")).as("c"))
        .join(li.filter(col("l_quantity") >= 40)
            .select(col("l_orderkey"), col("l_suppkey")),
          col("ok") === col("l_orderkey"))
        .groupBy(col("c"), (col("l_suppkey") + lit(1000000L)).as("s"))
        .agg(count(lit(1)).as("m")).where(col("m") >= 2)
      val edges = cs.select(col("c").as("src"), col("s").as("dst"))
        .unionAll(cs.select(col("s").as("src"), col("c").as("dst")))
      graft.operators.KCore.peelLayers(edges, k = 2, rounds = 9).count()
    }
    t("dp_noisy_counts") {
      graft.operators.DpRelease.noisyCounts(
        docs.withColumn("g1", (col("doc_id") % 50).cast("string"))
          .withColumn("g2", (col("doc_id") % 7).cast("string")),
        Seq("g1", "g2"), epsilon = 1.0).count()
    }
    t("doremi_mix") {
      val lm = graft.operators.LanguageModel.train(docs, "text", topK = 64)
      val scored = docs.select(
        (col("doc_id") % 20).cast("string").as("domain"),
        graft.operators.LanguageModel.crossEntropy(col("text"), lm).as("ce"))
      graft.operators.Doremi.domainWeights(scored, "domain", "ce").count()
    }
    t("media_dedup_phash") {
      import spark.implicits._
      val media = docs.select(col("doc_id")).as[Long]
        .mapPartitions(_.map { id =>
          val (w, h, px) = graft.queries.MultimodalQueries.synthImage(id)
          (id, graft.sources.MediaCodecs.encodeBmp(w, h, px))
        }).toDF("doc_id", "media")
      val hashes = graft.sources.Multimodal.dhashImageFrame(media)
      graft.operators.MediaDedup.phashPairs(hashes, "doc_id", "phash")
        .count()
    }
    t("media_dedup_collapsed") {
      // the production staging: exact-hash collapse (linear) before
      // the banded pairing — pairs enumerate across CANONICALS only
      import spark.implicits._
      val media = docs.select(col("doc_id")).as[Long]
        .mapPartitions(_.map { id =>
          val (w, h, px) = graft.queries.MultimodalQueries.synthImage(id)
          (id, graft.sources.MediaCodecs.encodeBmp(w, h, px))
        }).toDF("doc_id", "media")
      val hashes = graft.sources.Multimodal.dhashImageFrame(media)
      val canon = graft.operators.MediaDedup.collapseExact(
          hashes, "doc_id", "phash")
        .select(col("canonical_id").as("doc_id"), col("width"),
          col("height"), col("phash"))
      graft.operators.MediaDedup.phashPairs(canon, "doc_id", "phash")
        .count()
    }
    t("decontamination_char") {
      graft.operators.SuffixDedup.charContamination(
        docs.filter(col("doc_id") % 10 =!= 0),
        docs.filter(col("doc_id") % 10 === 0)
          .select(col("doc_id"), col("text")),
        "text", "doc_id", len = 30).count()
    }
    t("markov_attribution") {
      // 10x longer journeys per user (copies share user ids) — the
      // per-user window and the matrix collect are the stress axes
      val evt = ev.withColumn("event_type",
        element_at(array(lit("view"), lit("click"), lit("signup"),
          lit("error"), lit("purchase")),
          (pmod(col("event_id"), lit(5)) + 1).cast("int")))
      graft.operators.Attribution.markovRemoval(evt, "user_id", "ts",
        "event_id", "event_type", "purchase",
        channelsHint = Some(Seq("click", "error", "signup", "view")))
        .count()
    }
    t("frequent_pairs") {
      val lp = li.select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"))
        .distinct()
      lp.as("a").join(lp.as("b"),
          col("a.ok") === col("b.ok") && col("a.pk") < col("b.pk"))
        .groupBy(col("a.pk").as("u"), col("b.pk").as("v"))
        .agg(count(lit(1)).as("support"))
        .where(col("support") >= 2)
        .orderBy(col("support").desc, col("u"), col("v"))
        .limit(50).count()
    }
    t("quantile_buckets") {
      import org.apache.spark.sql.expressions.Window
      val evt = ev.withColumn("event_type",
        (col("event_id") % 5).cast("string"))
        .withColumn("__bk", floor(col("value") * lit(100.0)).cast("long"))
      val counts = evt.groupBy(col("event_type"), col("__bk"))
        .agg(count(lit(1)).as("cnt"))
      val cum = graft.operators.CumHistogram.cumulativeByGroup(
        counts, "event_type", "__bk", "cnt")
      val thrCols = (1 to 9).map { d =>
        min(when(col("cum") >= lit(d / 10.0) * col("total"), col("__bk")))
          .as(s"__b$d")
      }
      val thr = cum.groupBy(col("event_type"))
        .agg(thrCols.head, thrCols.tail: _*)
      val decile = (1 to 9).foldLeft(lit(1)) { (acc, d) =>
        acc + when(col("__bk") > col(s"__b$d"), 1).otherwise(0)
      }
      evt.join(broadcast(thr), Seq("event_type"))
        .select(col("event_id"), decile.cast("int").as("decile"))
        .agg(sum(col("decile"))).head.getLong(0)
    }
    t("packing_efficiency") {
      val packed = graft.operators.Pack.nextFitDecreasing(docs,
        col("doc_id"), graft.functions.TextFunctions.tokenCount(col("text")),
        pmod(col("doc_id"), lit(8)), budget = 512L)
      packed.groupBy(col("bucket"))
        .agg((max(col("shard")) + 1).as("n_shards"),
          sum(col("n_tokens")).as("total_tokens")).count()
    }
    t("quality_fusion_legs") {
      import org.apache.spark.sql.expressions.Window
      val lm = graft.operators.LanguageModel.train(docs, "text", topK = 64)
      val scored = docs.select(col("doc_id"),
        (col("doc_id") % 5).cast("string").as("lang"),
        graft.functions.TextFunctions.qualityScore(col("text")).as("q"),
        graft.operators.LanguageModel.crossEntropy(col("text"), lm).as("ce"))
      val w1 = Window.partitionBy(col("lang"))
        .orderBy(col("q").desc, col("doc_id"))
      val w2 = Window.partitionBy(col("lang"))
        .orderBy(col("ce").asc, col("doc_id"))
      val lq = scored.select(col("lang"), col("doc_id"),
        row_number().over(w1).as("rq")).filter(col("rq") <= 100)
      val lc = scored.select(col("lang"), col("doc_id"),
        row_number().over(w2).as("rc")).filter(col("rc") <= 100)
      lq.join(lc, Seq("lang", "doc_id"), "full_outer").count()
    }
    t("ql_search") {
      graft.operators.TextRank.queryLikelihoodTopK(docs, "doc_id", "text",
        Seq("hash", "join", "vector", "stream"), 50).count()
    }
    t("item_cosine") {
      val lp = li.select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"))
        .distinct()
      val freq = lp.groupBy(col("pk")).agg(count(lit(1)).as("n"))
      lp.as("a").join(lp.as("b"),
          col("a.ok") === col("b.ok") && col("a.pk") < col("b.pk"))
        .groupBy(col("a.pk").as("u"), col("b.pk").as("v"))
        .agg(count(lit(1)).as("support"))
        .where(col("support") >= 2)
        .join(freq.select(col("pk").as("u"), col("n").as("n_u")), Seq("u"))
        .join(freq.select(col("pk").as("v"), col("n").as("n_v")), Seq("v"))
        .select(col("u"), col("v"),
          (col("support").cast("double") /
            sqrt((col("n_u") * col("n_v")).cast("double"))).as("cosine"))
        .orderBy(col("cosine").desc, col("u"), col("v")).limit(50).count()
    }
    t("holt_hourly") {
      // hourly grain → ~24x longer per-key series than the gate's
      // daily one: stresses the collect_list size and the fold length
      val daily = ev.groupBy(col("user_id"),
          date_trunc("hour", col("ts")).as("hr"))
        .agg(sum(col("value").cast("decimal(12,2)")).as("dval"))
      graft.operators.Ewma.holt(daily, "user_id", "hr", col("dval"),
        alpha = 0.3, beta = 0.3).count()
    }
    t("bootstrap_ci") {
      // single-pass BootstrapCellsAgg over the 500k-doc probe corpus:
      // one row per doc, 200 replica legs folded into a flat
      // long[402] buffer per task — no row inflation anywhere
      graft.operators.Bootstrap.meanCi(docs, col("doc_id"),
        round(graft.functions.TextFunctions.qualityScore(col("text"))
          * 1000000.0).cast("long")).count()
    }
    t("weighted_jaccard") {
      graft.operators.Dedup.weightedJaccardAudit(docs, "text", "doc_id")
        .count()
    }
    t("lm_kn_score") {
      val lm = graft.operators.LanguageModel.trainKneserNey(docs, "text", 64)
      docs.select(graft.operators.LanguageModel
        .crossEntropyKn(col("text"), lm).as("ce"))
        .agg(count(col("ce"))).head.getLong(0)
    }
    t("signal_correlation") {
      // the shipped expression trees, not a re-implementation — the
      // probe must measure what the query runs
      graft.operators.SignalStats.sums(
        graft.operators.SignalStats.microSignals(docs, "text")).count()
    }
    t("decontamination_semantic") {
      // bench = 1% of the amplified corpus broadcast as ONE row; the
      // corpus side is a zero-shuffle map scan, cost ∝ |corpus|·|bench|
      val bench = emb.filter(col("id") % 100 === 0)
        .select(col("id").as("qid"), col("vec").as("qvec"))
      graft.operators.Similarity.semanticContamination(
        emb.filter(col("id") % 100 =!= 0), bench, 0.35).count()
    }
    t("rouge_pairs") {
      // consecutive-id pairing over the amplified corpus: the gram
      // count shuffle is corpus-gram-bounded, no pair blow-up
      val d = docs.select(col("doc_id"), col("text"))
      val pairs = d.select(col("doc_id").as("id_a"), col("text").as("text_a"))
        .join(d.select(col("doc_id").as("id_b"), col("text").as("text_b")),
          col("id_b") === col("id_a") + 1)
      graft.operators.Rouge.overlap(pairs, 2, "r2").count()
    }
    t("pareto_skyline") {
      // ×mult lineitem rows through the range-partition scan; the
      // frontier stays tiny regardless of input volume
      graft.operators.Skyline.paretoFrontier2d(
        li.select(
          (col("l_orderkey") * 10 + col("l_linenumber")).as("id"),
          col("l_extendedprice").as("x"), col("l_quantity").as("y")),
        col("x"), col("y"), col("id")).count()
    }
    t("luhn_redact") {
      // per-row bounded fold — the D15 cost class
      docs.select(graft.functions.TextFunctions.luhnSum(
        substring(col("text"), 1, 16)).as("s"))
        .agg(count(col("s"))).head.getLong(0)
    }
    t("epoch_allocation") {
      val masses = docs
        .groupBy((col("doc_id") % 20).cast("string").as("source"))
        .agg(sum(graft.functions.TextFunctions.tokenCount(col("text"))
          .cast("long")).as("u"))
      graft.operators.EpochAlloc.allocate(masses).count()
    }
    t("mann_whitney_ranks") {
      // 6M lineitem prices through the distributed PrefixSum rank —
      // the rank-test cost is the tie-group groupBy + range scan
      graft.operators.AbStats.mannWhitneyU(
        li.select(col("l_orderkey"), col("l_extendedprice")),
        col("l_orderkey") % 2, col("l_extendedprice")).count()
    }
    t("adamic_adar_wedges") {
      // wedge self-join over ×mult membership; Σ deg² cost class with
      // the degree-1 prune and hub cut live
      graft.operators.LinkPrediction.adamicAdarTopK(
        li.select(col("l_partkey").as("c"), col("l_suppkey").as("s")),
        col("c"), col("s"), k = 20).count()
    }
    t("cusum_series") {
      // corpus scan → aggregate-sized series → integer CUSUM scan
      val daily = li.groupBy(col("l_returnflag"),
          date_trunc("day", col("l_shipdate")).cast("date").as("day"))
        .agg(count(lit(1)).as("n"))
      graft.operators.Changepoint.cusumMaxShift(
        daily, Seq("l_returnflag"), col("day"), col("n")).count()
    }
    t("t_closeness_grid") {
      graft.operators.TCloseness.orderedEmdAudit(
        docs.select(col("doc_id"), col("text"),
          (col("doc_id") % 7).cast("string").as("lang"),
          (col("doc_id") % 40).cast("string").as("source")),
        Seq("lang", "source"),
        graft.functions.TextFunctions.tokenCount(col("text"))
          .cast("long")).count()
    }
    t("rocchio_prf") {
      // the PRF loop over the amplified corpus with the shared
      // once-tokenized projection (the D101 shape after the r13 fix)
      val toks = graft.operators.Materialize.cut(docs.select(col("doc_id"),
        graft.operators.TextRank.tokens(col("text")).as("__toks")))
      val top5 = graft.operators.TextRank.bm25TopKTokens(
        toks, "doc_id", graft.queries.WarehouseQueries.Bm25Terms, 5)
        .select(col("doc_id")).collect().map(_.getLong(0)).toSeq
      val excluded = graft.queries.WarehouseQueries.Bm25Terms ++
        graft.functions.TextFunctions.LangMarkers.en
      val expansion = toks.filter(col("doc_id").isin(top5: _*))
        .select(explode(col("__toks")).as("term"))
        .filter(!col("term").isin(excluded: _*))
        .groupBy(col("term")).agg(count(lit(1)).as("c"))
        .orderBy(col("c").desc, col("term")).limit(3)
        .collect().map(_.getString(0)).toSeq
      graft.operators.TextRank.bm25TopKTokens(toks, "doc_id",
        graft.queries.WarehouseQueries.Bm25Terms ++ expansion, 50).count()
    }
    t("heaps_first_occurrence") {
      // the D103 core: term first-document over the amplified corpus —
      // one corpus-gram-bounded min aggregation
      docs.select(col("doc_id"),
          explode(graft.functions.TextFunctions.tokens(col("text")))
            .as("term"))
        .groupBy(col("term")).agg(min(col("doc_id")).as("fd")).count()
    }
    t("jaro_winkler_blocked") {
      // the C76 ER shape at volume: prefix blocking bounds the pair
      // fan-out, the codegen kernel runs only within blocks
      val p = docs.select(col("doc_id").as("pk"),
        substring(col("text"), 1, 40).as("name"),
        substring(col("text"), 1, 12).as("blk"))
      p.as("a").join(p.as("b"),
          col("a.blk") === col("b.blk") && col("a.pk") < col("b.pk"))
        .select(round(graft.functions.JaroWinkler.jaro_winkler(
          col("a.name"), col("b.name")), 6).as("jw"))
        .filter(col("jw") >= lit(0.97))
        .count()
    }
    t("jaro_winkler_capped") {
      // the C76 fix at volume: same blocking key, but pair formation
      // through BlockedLinkage with a cap far below the amplified
      // block sizes — pair volume (and time) should grow ~linearly
      // with mult where the uncapped leg above grows quadratically
      val p = docs.select(col("doc_id").as("pk"),
        substring(col("text"), 1, 40).as("name"))
      graft.operators.BlockedLinkage.candidatePairs(
          p, "pk", "name", substring(col("name"), 1, 12),
          maxBlock = 100, window = 32)
        .select(round(graft.functions.JaroWinkler.jaro_winkler(
          col("val_a"), col("val_b")), 6).as("jw"))
        .filter(col("jw") >= lit(0.97))
        .count()
    }
    t("dedup_recall_report") {
      // the D108 audit at volume: banding recall/precision against
      // the exact truth set over the amplified near-dup-dense corpus
      val truth = graft.operators.Dedup
        .similarityJoinEdges(docs, "text", "doc_id")
      val cand = graft.operators.Dedup.lshCandidates(docs, "text", "doc_id")
      val hit = cand.join(truth, Seq("id_a", "id_b"), "left_semi").count()
      val (nt, nc) = (truth.count(), cand.count())
      println(f"[probe]   recall=${hit.toDouble / nt}%.4f " +
        f"precision=${hit.toDouble / nc}%.4f (true=$nt cand=$nc)")
      nc
    }
    t("spearman_ranks") {
      // both 6M-value variables ranked through PrefixSum, joined back
      graft.operators.AbStats.spearmanCorrelation(
        li.select(col("l_extendedprice"), col("l_quantity")),
        col("l_extendedprice"), col("l_quantity")).count()
    }
    t("frequent_triples") {
      // Apriori-pruned cubic enumeration over ×mult baskets
      graft.queries.WarehouseQueries.frequentTriples(spark, dir).count()
    }
    t("ks_gap_scan") {
      graft.operators.AbStats.ksTwoSample(
        li.select(col("l_orderkey"), col("l_extendedprice")),
        col("l_orderkey") % 2, col("l_extendedprice")).count()
    }
    t("obf_looks") {
      // C86: ×mult events collapse to the SAME calendar-day frame —
      // the look machinery is corpus-size-independent past the scan
      graft.operators.AbStats.obfMonitor(
        ev.withColumn("event_type",
          when(col("event_id") % 5 === 0, "purchase").otherwise("view")),
        date_trunc("day", col("ts")).cast("date"),
        col("user_id") % 2, col("event_type") === "purchase").count()
    }
    t("ratio_delta_units") {
      // C87: the per-user aggregate shuffle is the whole cost; the
      // 12-sum sufficient row is one partial-agg merge
      val perUser = ev
        .withColumn("event_type",
          when(col("event_id") % 5 === 0, "purchase").otherwise("view"))
        .groupBy(col("user_id"))
        .agg(count(lit(1)).as("x"),
          sum(when(col("event_type") === "purchase",
            graft.functions.Num.dec2(col("value")))
            .otherwise(graft.functions.Num.dec2(lit(0)))).as("y"))
      graft.operators.AbStats.ratioDelta(
        perUser, col("user_id") % 2, col("x"), col("y")).count()
    }
    t("value_acf") {
      // C88: one corpus scan → calendar-day series; the lag join runs
      // over m·maxLag aggregate rows regardless of mult
      val daily = ev.groupBy(date_trunc("day", col("ts")).cast("date")
          .as("day"))
        .agg((sum(graft.functions.Num.dec2(col("value"))) * 100)
          .cast("decimal(38,0)").as("cents"))
      graft.operators.Changepoint.acf(daily, col("day"), col("cents"),
        maxLag = 10).count()
    }
    t("degree_assortativity") {
      // C89: the triangle-leg edge build (×mult baskets) + the degree
      // groupBy and two endpoint joins — exchanges ∝ |E|
      val lp = li.select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"))
        .distinct()
      val e = lp.as("a").join(lp.as("b"),
          col("a.ok") === col("b.ok") && col("a.pk") < col("b.pk"))
        .select(col("a.pk").as("u"), col("b.pk").as("v"))
      graft.operators.Centrality.degreeAssortativity(e).count()
    }
    t("yuen_trimmed") {
      // C92: the value-domain count shuffle + two PrefixSum passes —
      // cost ∝ distinct values, not rows, past the scan
      graft.operators.AbStats.yuenTrimmed(
        ev.select(col("user_id"),
          (graft.functions.Num.dec2(col("value")) * 100).cast("long")
            .as("cents")),
        col("user_id") % 2, col("cents")).count()
    }
    t("dup_mass_by_source") {
      // D115: the D53 digest shuffle re-aggregated to 20 sources
      graft.operators.ParagraphDedup.dupMassByGroup(
        docs, col("text"), col("doc_id"),
        (col("doc_id") % 20).cast("string")).count()
    }
    t("good_turing_vocab") {
      // D114: one word-count shuffle + the vocab-sized fof re-agg
      graft.operators.LanguageModel.goodTuringVocab(docs, "text").count()
    }
    t("pmi_census") {
      // D111: the full-vocabulary pair census — two count shuffles
      // ∝ distinct bigrams/words, two word-keyed joins, TakeOrdered
      graft.operators.Collocations.topPmi(docs, "text").count()
    }
    t("weighted_ess") {
      // D112: one partial-agg'd scan to source-cardinality rows
      graft.operators.Concentration.effectiveSampleSize(
        docs.select((col("doc_id") % 20).cast("string").as("source"),
          graft.functions.TextFunctions.qualityScore(col("text"))
            .as("quality")),
        col("source"), col("quality")).count()
    }
    // ---- stream faces at volume: cold AvailableNow stream cost vs
    // state size is the 100-TB question the gated keys raise. The
    // faces read `(spark, dir)` single-file tables, so the amplified
    // corpus lands in a temp dir first (lazily — only if a stream leg
    // is selected); prep time prints separately so the face legs time
    // the stream itself.
    lazy val streamDir: String = {
      val t0 = System.nanoTime()
      val d = java.nio.file.Files.createTempDirectory("graft_probe_stream")
        .toFile
      def writeSingle(df: org.apache.spark.sql.DataFrame, name: String): Unit = {
        val tmp = new java.io.File(d, s"_tmp_$name")
        df.coalesce(1).write.mode("overwrite").parquet(tmp.getAbsolutePath)
        val part = tmp.listFiles().filter(_.getName.endsWith(".parquet")).head
        java.nio.file.Files.move(part.toPath,
          new java.io.File(d, name).toPath)
      }
      // faces read the real documents schema; recompute the length
      // column the amplified frame drops
      writeSingle(docs.withColumn("n_chars", length(col("text")).cast("long")),
        "documents.parquet")
      writeSingle(graft.sources.Tables.events(spark, dir)
        .crossJoin(copies)
        .select((col("event_id") * mult + col("copy")).as("event_id"),
          col("ts"), col("user_id"), col("event_type"), col("value")),
        "events.parquet")
      println(f"[probe] stream_lake_prep: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      d.getAbsolutePath
    }
    t("stream_bootstrap_ci") {
      graft.queries.StreamFaces.streamBootstrapCi(spark, streamDir).count()
    }
    t("stream_trending_words") {
      graft.queries.StreamFaces.streamTrendingWords(spark, streamDir).count()
    }
    t("stream_robust_flags") {
      graft.queries.StreamFaces.streamRobustFlags(spark, streamDir).count()
    }
    t("stream_mixture_gate") {
      graft.queries.StreamFaces.streamMixtureGate(spark, streamDir).count()
    }
    t("stream_session_windows") {
      // the STATEFUL face at volume: state = open sessions (per-user
      // gap windows), drained by the sentinel at end-of-stream
      graft.queries.StreamFaces.streamSessionWindows(spark, streamDir).count()
    }
    t("stream_funnel_steps") {
      // fMGWS state = one fixed-size record per live user
      graft.queries.StreamFaces.streamFunnelSteps(spark, streamDir).count()
    }
    t("stream_corpus_admission") {
      // lake-as-state admission: screen cost ∝ batch + candidates,
      // index grows by the admitted docs only
      graft.queries.StreamFaces.streamCorpusAdmission(spark, streamDir).count()
    }
    t("stream_media_gate") {
      // BINARY columns through the gate: ×mult assets decode once,
      // fingerprint, screen against the seeded index; per-asset cost
      // is the decode+dHash map, index join carries 24-byte rows
      graft.queries.StreamFaces.streamMediaGate(spark, streamDir).count()
    }
    // session-window state that GROWS with the data: the shared
    // streamDir amplification keeps user_id constant (sessions merge,
    // state flat); this lake remaps user_id too, so ×mult data means
    // ×mult users = ×mult open sessions in the state store — the
    // state-size story of the stateful face
    lazy val streamDirUsers: String = {
      val t0 = System.nanoTime()
      val d = java.nio.file.Files.createTempDirectory("graft_probe_stream_u")
        .toFile
      val tmp = new java.io.File(d, "_tmp_events")
      graft.sources.Tables.events(spark, dir)
        .crossJoin(copies)
        .select((col("event_id") * mult + col("copy")).as("event_id"),
          col("ts"), (col("user_id") * mult + col("copy")).as("user_id"),
          col("event_type"), col("value"))
        .coalesce(1).write.mode("overwrite").parquet(tmp.getAbsolutePath)
      val part = tmp.listFiles().filter(_.getName.endsWith(".parquet")).head
      java.nio.file.Files.move(part.toPath,
        new java.io.File(d, "events.parquet").toPath)
      println(f"[probe] stream_users_prep: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      d.getAbsolutePath
    }
    t("stream_session_windows_growing_state") {
      graft.queries.StreamFaces.streamSessionWindows(spark, streamDirUsers)
        .count()
    }
    // C20b at volume: the daily-dimension story — a full Type-2
    // rebuild re-sorts the whole ×mult change log every day; the
    // incremental apply reads the lake history and pays only for the
    // batch + touched keys' current rows. Keys amplified too, so the
    // history is ×mult wide as well as deep.
    lazy val ordAmp = graft.sources.Tables.orders(spark, dir)
      .crossJoin(copies)
      .select((col("o_orderkey") * mult + col("copy")).as("o_orderkey"),
        (col("o_custkey") * mult + col("copy")).as("o_custkey"),
        col("o_orderpriority"), col("o_orderdate"))
    lazy val scd2Cut = java.sql.Date.valueOf("2001-07-01") // last month = the "daily" batch
    t("scd2_rebuild_full") {
      graft.operators.Scd2.history(ordAmp, Seq("o_custkey"),
        Seq("o_orderpriority"), "o_orderdate", "o_orderkey").count()
    }
    t("scd2_incremental_apply") {
      // history lives in the lake (not timed): production state
      val histPath = java.nio.file.Files
        .createTempDirectory("graft_probe_scd2").toFile.getAbsolutePath
      graft.operators.Scd2.history(
          ordAmp.filter(col("o_orderdate") < lit(scd2Cut)),
          Seq("o_custkey"), Seq("o_orderpriority"), "o_orderdate", "o_orderkey")
        .write.parquet(s"$histPath/hist")
      val t0 = System.nanoTime()
      val n = graft.operators.Scd2.applyIncremental(
        spark.read.parquet(s"$histPath/hist"),
        ordAmp.filter(col("o_orderdate") >= lit(scd2Cut)),
        Seq("o_custkey"), Seq("o_orderpriority"), "o_orderdate", "o_orderkey")
        .count()
      println(f"[probe]   (apply-only: ${(System.nanoTime() - t0) / 1e9}%.2f s)")
      n
    }
    t("hurst_hourly") {
      // C105: one corpus scan → calendar-bounded hour series; the
      // R/S ladder is constant-size past the collapse (744 rows × 4
      // sizes at any mult)
      val hourly = ev.groupBy(date_trunc("hour", col("ts")).as("hour"))
        .agg((sum(graft.functions.Num.dec2(col("value"))) * 100)
          .cast("decimal(38,0)").as("cents"))
      graft.operators.Changepoint.hurst(hourly, col("hour"),
        col("cents")).count()
    }
    def tertile(lo: Int, hi: Int, nm: String) =
      coalesce(sum(when(col("event_type") === "purchase" &&
        dayofmonth(col("ts")).between(lo, hi),
        graft.functions.Num.dec2(col("value")) * 100)), lit(0))
        .cast("long").as(nm)
    t("friedman_tertiles") {
      // C102: ONE user-keyed partial-agg'd shuffle; ranks and the tie
      // census are row-local — cost ∝ rows scanned, then user-sized
      val perUser = ev
        .withColumn("event_type",
          when(col("event_id") % 5 === 0, "purchase").otherwise("view"))
        .groupBy(col("user_id"))
        .agg(tertile(1, 10, "v0"), tertile(11, 20, "v1"),
          tertile(21, 31, "v2"))
      graft.operators.AbStats.friedman(perUser,
        Seq(col("v0"), col("v1"), col("v2"))).count()
    }
    t("anderson_darling") {
      // C114: cost ∝ distinct cents values through the chained
      // PrefixSum cumulatives, not rows, past the one scan
      graft.operators.AbStats.andersonDarlingK(
        ev.select((col("user_id") % 3).cast("int").as("arm"),
          (graft.functions.Num.dec2(col("value")) * 100).cast("long")
            .as("cents")),
        col("arm"), col("cents"), arms = 3).count()
    }
    t("cmh_strata") {
      // C115: pure conditional-aggregation scan to one row
      graft.operators.AbStats.cmhTest(
        ev.select(
          when(dayofmonth(col("ts")) <= 10, 0)
            .when(dayofmonth(col("ts")) <= 20, 1).otherwise(2).as("st"),
          (col("user_id") % 2).cast("int").as("arm"),
          (col("event_id") % 5 === 0).as("s")),
        col("st"), col("arm"), col("s"), strata = 3).count()
    }
    t("seasonal_mk") {
      // C113: per-season m_g² pairwise census over the calendar-day
      // frame — corpus-independent past the collapse
      val daily = ev.groupBy(date_trunc("day", col("ts")).cast("date")
          .as("day"))
        .agg((sum(graft.functions.Num.dec2(col("value"))) * 100)
          .cast("decimal(38,0)").as("cents"))
      graft.operators.Changepoint.seasonalMannKendall(daily, col("day"),
        col("cents"),
        datediff(col("day"), lit("1970-01-01")) % 7).count()
    }
    t("hill_tail") {
      // D127: one scan + TakeOrdered(k+1) — never a global sort
      graft.operators.Concentration.hillTailIndex(
        docs, length(col("text")).cast("long"), k = 100).count()
    }
    t("fellegi_sunter") {
      // D120: pairs grow quadratically WITHIN a block — the block key
      // is the dial (the C76 lesson). Production posture at ×mult:
      // refine nation → (nation, balance band) so block sizes stay
      // put while the record count grows.
      val cust = graft.sources.Tables.customer(spark, dir)
        .crossJoin(copies)
        .select((col("c_custkey") * mult + col("copy")).as("c_custkey"),
          col("c_nationkey"), col("c_mktsegment"), col("c_acctbal"))
      val cents = (graft.functions.Num.dec2(col("c_acctbal")) * 100)
        .cast("long")
      val band = floor(cents.cast("double") / lit(100000.0)).cast("long")
      graft.operators.FellegiSunter.score(
        cust, "c_custkey", struct(col("c_nationkey"), band),
        Seq(("seg", col("c_mktsegment"), 0.95),
          ("sign", cents >= 0L, 0.98)), k = 50).count()
    }
    t("self_bleu") {
      // D121: gram censuses ∝ token volume (the chunk-overlap class);
      // pair frame is half the doc count, language rollup is tiny.
      // lang keyed on the PAIR index so the div-2 pairing survives
      // amplification (doc_id%4 would put every pair cross-lang)
      graft.operators.Bleu.selfBleu(
        docs.withColumn("lang",
          expr("(doc_id div 2) % 4").cast("string")),
        "doc_id", "lang", "text").count()
    }
    t("png_decode") {
      // per-row encode + inflate + unfilter; pure map, zero exchanges
      import spark.implicits._
      val media = docs.select(col("doc_id")).as[Long]
        .mapPartitions(_.map { id =>
          val w = (id % 6 + 2).toInt; val h = (id % 4 + 2).toInt
          val px = Array.tabulate(w * h)(i => (id * 31 + i * 7).toInt & 0xffffff)
          (id, graft.sources.PngCodec.encodePng(w, h, px))
        }).toDF("doc_id", "media")
      graft.sources.Multimodal.extractFeatures(media,
        decoder = graft.sources.PngCodec.PngStatsDecoder).count()
    }

    // Round-17 graph-family legs: `_copies` = mult DISJOINT graph copies
    // (linear-reference ledger; the older `triangles`/`community_lpa`
    // legs above amplify DENSITY over a fixed part universe instead —
    // keep both: copies isolate engine scaling, density stresses the
    // wedge bound). These are the shuffle-heaviest keys whose x10
    // DuckDB referees hit the disk ceiling — the ENGINE side extends
    // its declared-factor ledger to x20 here). Amplification = `mult`
    // DISJOINT copies of the sf0.1 graph (both endpoints offset
    // id*mult+copy), so wedge volume / LPA state / rank mass all scale
    // exactly linearly and a superlinear time is an engine smell, not
    // a data artifact.
    val lpParts = graft.sources.Tables.lineitem(spark, dir)
      .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"))
      .distinct()
      .crossJoin(copies)
      .select((col("ok") * mult + col("copy")).as("ok"),
        (col("pk") * mult + col("copy")).as("pk"))
    val partNodes = graft.sources.Tables.part(spark, dir)
      .crossJoin(copies)
      .select((col("p_partkey").cast("long") * mult + col("copy")).as("id"))
    def partEdges = {
      val p = lpParts
      p.as("a").join(p.as("b"),
          col("a.ok") === col("b.ok") && col("a.pk") < col("b.pk"))
        .select(col("a.pk").as("u"), col("b.pk").as("v"))
    }
    t("triangle_count_copies") {
      graft.operators.Triangles.nodeTriangles(partEdges, partNodes).count()
    }
    t("community_lpa_copies") {
      val pairs = partEdges
      val edges = pairs.select(col("u").as("src"), col("v").as("dst"))
        .unionAll(pairs.select(col("v").as("src"), col("u").as("dst")))
      graft.operators.Community.labelPropagation(edges, partNodes,
        iterations = 5).count()
    }
    // customer–supplier trade graph (suppliers offset by 1e6 BEFORE the
    // copy offset, so the two id spaces stay disjoint for mult <= ~1e3)
    val csAmp = graft.sources.Tables.orders(spark, dir)
      .select(col("o_orderkey"), col("o_custkey"))
      .join(graft.sources.Tables.lineitem(spark, dir)
          .select(col("l_orderkey"), col("l_suppkey")),
        col("o_orderkey") === col("l_orderkey"))
      .select(col("o_custkey").as("c"), (col("l_suppkey") + 1000000L).as("s"))
      .distinct()
      .crossJoin(copies)
      .select((col("c") * mult + col("copy")).as("c"),
        (col("s") * mult + col("copy")).as("s"))
    t("pagerank_copies") {
      val edges = csAmp.select(col("c").as("src"), col("s").as("dst"))
        .unionAll(csAmp.select(col("s").as("src"), col("c").as("dst")))
      val nodes = graft.sources.Tables.customer(spark, dir)
        .crossJoin(copies)
        .select((col("c_custkey").cast("long") * mult + col("copy")).as("id"))
        .unionAll(graft.sources.Tables.supplier(spark, dir)
          .crossJoin(copies)
          .select(((col("s_suppkey") + 1000000L) * mult + col("copy"))
            .as("id")))
      graft.operators.Centrality.pageRank(edges, nodes, iterations = 10)
        .count()
    }
    spark.stop()
  }
}
