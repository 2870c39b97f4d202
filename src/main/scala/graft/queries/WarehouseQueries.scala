package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.Num._
import graft.operators.{AsOfJoin, Ewma, FellegiSunter, Funnel, FuzzyJoin, HybridRetrieval, Outliers, Profile, Scd2, Similarity, TextRank}
import graft.sources.{BucketedLake, Tables}

/** Round-5 warehouse + retrieval surface (SURVEY §2: C20-C22, A11, D31).
  *
  * Each query is the oracled face of one operator; scale notes live on
  * the operators themselves.
  */
object WarehouseQueries {

  /** C20: SCD Type-2 history over the order change-log — each
    * customer's priority timeline as half-open validity intervals.
    * One shuffle on the business key (see [[graft.operators.Scd2]]).
    */
  def scd2History(spark: SparkSession, dir: String): DataFrame =
    Scd2.history(Tables.orders(spark, dir),
        keys = Seq("o_custkey"), attrs = Seq("o_orderpriority"),
        orderCol = "o_orderdate", tiebreak = "o_orderkey")
      .orderBy(col("o_custkey"), col("valid_from"), col("o_orderpriority"))

  /** C20b: INCREMENTAL SCD2 apply — the daily dimension job run end
    * to end: history built from the first half of the change log
    * (orders before 1996-01-01), then the second half applied
    * incrementally ([[graft.operators.Scd2.applyIncremental]] —
    * closed versions and untouched keys pass through, only touched
    * keys' current rows re-enter change detection). The date split
    * satisfies the strictly-later contract, so the result must equal
    * the full rebuild EXACTLY — the oracle is `scd2_history`'s SQL
    * verbatim, which is precisely the incremental≡batch claim under
    * the hash gate.
    */
  def scd2Incremental(spark: SparkSession, dir: String): DataFrame = {
    val orders = Tables.orders(spark, dir)
    val split = lit(java.sql.Date.valueOf("1996-01-01"))
    val hist1 = Scd2.history(orders.filter(col("o_orderdate") < split),
      keys = Seq("o_custkey"), attrs = Seq("o_orderpriority"),
      orderCol = "o_orderdate", tiebreak = "o_orderkey")
    Scd2.applyIncremental(hist1, orders.filter(col("o_orderdate") >= split),
        keys = Seq("o_custkey"), attrs = Seq("o_orderpriority"),
        orderCol = "o_orderdate", tiebreak = "o_orderkey")
      .orderBy(col("o_custkey"), col("valid_from"), col("o_orderpriority"))
  }

  /** C21: ordered funnel — view → click → purchase per user, each step
    * within 4h of the previous step's first completion. ONE shuffle for
    * the whole funnel (see [[graft.operators.Funnel]]).
    */
  def funnelSteps(spark: SparkSession, dir: String): DataFrame =
    Funnel.steps(Tables.events(spark, dir),
      user = "user_id", typeCol = "event_type", ts = "ts",
      tiebreak = "event_id", stages = Seq("view", "click", "purchase"),
      maxGap = Some(expr("INTERVAL 4 HOURS")))

  /** C62: time-constrained window funnel — max view→click→purchase
    * depth within 24 hours of the chain's first event, per user (see
    * [[graft.operators.Funnel.windowFunnel]]; 24 h populates all
    * three depths on the gate data, so every fold branch is
    * oracle-checked).
    */
  def windowFunnelDepth(spark: SparkSession, dir: String): DataFrame =
    Funnel.windowFunnel(Tables.events(spark, dir),
        user = "user_id", typeCol = "event_type", ts = "ts",
        tiebreak = "event_id", stages = Seq("view", "click", "purchase"),
        windowMicros = 24L * 3600 * 1000000)
      .orderBy(col("user_id"))

  /** A11: exchange-free fact⋈fact join via bucketed lake tables. Both
    * tables are written bucketed+sorted on the join key, then joined
    * and aggregated on it — no shuffle in the whole read plan
    * (PlanSpec pins it; see [[graft.sources.BucketedLake]]).
    */
  def bucketedJoin(spark: SparkSession, dir: String): DataFrame = {
    // table names + path keyed by the dataset path AND its files'
    // (name, length, mtime) fingerprint: two datasets sharing a
    // basename can't clobber each other, and regenerating the data
    // in-place changes the key, so ensureBucketed's skip-rewrite can
    // never serve a stale bucketed copy of replaced source files.
    // (Concurrent sessions on the SAME unchanged dataset still share
    // a path — fine for this dev-gate query; production callers own
    // table names and paths via BucketedLake directly.)
    val fingerprint = Seq("orders", "lineitem").flatMap { t =>
      val d = new java.io.File(s"$dir/$t.parquet")
      val fs = if (d.isDirectory) d.listFiles().sortBy(_.getName).toSeq else Seq(d)
      fs.map(f => s"${f.getName}:${f.length}:${f.lastModified}")
    }.mkString("|")
    val key = java.security.MessageDigest.getInstance("MD5")
      .digest((new java.io.File(dir).getAbsolutePath + "|" + fingerprint)
        .getBytes("UTF-8"))
      .take(8).map("%02x".format(_)).mkString
    val base = s"/tmp/graft_bucketed/$key"
    // idempotent: a repeat invocation (bench iterations, re-runs) skips
    // the DROP + rewrite when the spec'd tables are already in place
    BucketedLake.ensureBucketed(Tables.orders(spark, dir),
      s"graft_orders_b_$key", s"$base/orders", "o_orderkey", 8)
    BucketedLake.ensureBucketed(Tables.lineitem(spark, dir),
      s"graft_lineitem_b_$key", s"$base/lineitem", "l_orderkey", 8)
    val one = lit(1).cast("decimal(18,2)")
    spark.table(s"graft_lineitem_b_$key")
      .join(spark.table(s"graft_orders_b_$key"),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_orderkey"), col("o_orderpriority"))
      .agg(count(lit(1)).as("n_items"),
        sum(dec2(col("l_extendedprice")) * (one - dec2(col("l_discount"))))
          .cast("double").as("revenue"))
      .orderBy(col("o_orderkey"))
  }

  /** E4 as a gated key: the skew-salted join on a GENUINELY skewed
    * key — events ⋈ per-type dim on `event_type` (5 values over the
    * whole fact table: the classic hot-key shape AQE's split can't
    * always save, e.g. in streaming joins). The big side is routed
    * through [[graft.operators.SkewJoin.saltedInnerJoin]]: each fact
    * row picks a deterministic salt, the 5-row dim explodes
    * ×saltFactor, and the hot key spreads across saltFactor tasks. At
    * gate scale the exploded dim broadcasts (the salt is then
    * harmless); at 100 TB with a non-broadcastable dim the salted
    * shuffle is the fix. Salted ≡ plain join (SkewSpec pins it), so
    * the oracle is the PLAIN SQL join. The above-average test
    * cross-multiplies decimals (value·n > total) — exact integers in
    * both engines, no division before the final rounded fraction.
    */
  def skewSaltedJoin(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
      .select(col("event_type"), dec2(col("value")).as("__v"))
    val dim = ev.groupBy(col("event_type"))
      .agg(sum(col("__v")).as("__tot"), count(lit(1)).as("__n"))
    graft.operators.SkewJoin
      .saltedInnerJoin(ev, dim, Seq("event_type"), saltFactor = 8)
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        sum(when(col("__v") * col("__n") > col("__tot"), 1L).otherwise(0L))
          .as("n_above"))
      .select(col("event_type"), col("n_events"), col("n_above"),
        round(col("n_above").cast("double") / col("n_events").cast("double"), 6)
          .as("frac_above"))
      .orderBy(col("event_type"))
  }

  /** C22: one-pass table profile (rows/nulls/distincts/bounds per
    * column) over the customer dim (see [[graft.operators.Profile]]).
    */
  def tableProfile(spark: SparkSession, dir: String): DataFrame =
    Profile.profile(Tables.customer(spark, dir), ProfileCols)

  val ProfileCols: Seq[String] =
    Seq("c_acctbal", "c_custkey", "c_mktsegment", "c_name", "c_nationkey")

  /** D31: BM25 keyword retrieval over the corpus — top-50 for a fixed
    * conjunction of index-shaped terms; zero corpus shuffle (see
    * [[graft.operators.TextRank]]).
    */
  def bm25Search(spark: SparkSession, dir: String): DataFrame =
    TextRank.bm25TopK(Tables.documents(spark, dir),
      idCol = "doc_id", textCol = "text",
      terms = Bm25Terms, k = 50)

  val Bm25Terms: Seq[String] = Seq("hash", "join", "vector", "stream")

  /** D101: Rocchio-style pseudo-relevance feedback (Rocchio 1971 /
    * the standard PRF loop every Lucene/Terrier deployment ships):
    * retrieve with the seed query, assume the top-5 are relevant,
    * expand the query with the 3 most frequent non-seed non-stopword
    * terms in those docs (count desc, term asc — fully ordered), and
    * re-retrieve with the expanded query. Two driver-scale collects
    * (5 ids, 3 terms — top-k outputs, not corpus rows); both
    * retrieval passes are the D31 plan: one tokenize scan,
    * plan-literal terms, broadcast stats, TakeOrdered.
    */
  def rocchioPrfSearch(spark: SparkSession, dir: String): DataFrame = {
    import graft.functions.TextFunctions
    // the PRF loop reads the corpus THREE times (seed retrieval,
    // expansion pick, expanded retrieval) — tokenize ONCE and cut
    // lineage on the token projection so the passes share it; at lake
    // scale the cut frame is the persisted token index
    val toks = graft.operators.Materialize.cut(
      Tables.documents(spark, dir)
        .select(col("doc_id"), TextRank.tokens(col("text")).as("__toks")))
    val top5 = TextRank.bm25TopKTokens(toks, "doc_id", Bm25Terms, 5)
      .select(col("doc_id")).collect().map(_.getLong(0)).toSeq
    val excluded = Bm25Terms ++ TextFunctions.LangMarkers.en
    // expansion terms come from the RETRIEVAL tokenizer (lowercase
    // alnum — the alphabet pass 2 scores in), not the whitespace
    // split: on punctuated text the two diverge and an expansion term
    // outside the scoring alphabet could never match
    val expansion = toks
      .filter(col("doc_id").isin(top5: _*))
      .select(explode(col("__toks")).as("term"))
      .filter(!col("term").isin(excluded: _*))
      .groupBy(col("term")).agg(count(lit(1)).as("c"))
      .orderBy(col("c").desc, col("term"))
      .limit(3)
      .collect().map(_.getString(0)).toSeq
    TextRank.bm25TopKTokens(toks, "doc_id", Bm25Terms ++ expansion, 50)
  }

  /** D77: Dirichlet query-likelihood retrieval — the LM-ranking face
    * of the triad, same terms/k as D31 for side-by-side comparison.
    */
  def qlSearch(spark: SparkSession, dir: String): DataFrame =
    TextRank.queryLikelihoodTopK(Tables.documents(spark, dir),
      idCol = "doc_id", textCol = "text",
      terms = Bm25Terms, k = 50)

  /** D55: hybrid retrieval — RRF fusion of the BM25 lexical leg
    * (D31's terms, top-50) and the dense cosine leg (query vector 0,
    * exact top-10). Both legs are bounded top-N lists, so fusion is
    * driver-scale by construction; at 100 TB the cost is the legs'
    * own scale stories (see [[graft.operators.HybridRetrieval]]).
    */
  def hybridSearchRrf(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // explicit 1-based rank over the ≤50-row BM25 leg — the
    // unpartitioned window is bounded by bm25TopK's LIMIT
    val bm = TextRank.bm25TopK(Tables.documents(spark, dir),
        idCol = "doc_id", textCol = "text", terms = Bm25Terms, k = 50)
      .withColumn("rank", row_number().over(
        Window.orderBy(col("score").desc, col("doc_id"))))
      .select(col("doc_id"), col("rank"))
    val emb = Tables.embeddings(spark, dir)
    // query 0 only — per-qid ranks make the slice identical whether
    // the other oracle queries run or not, so the leg skips them
    val dense = Similarity.bruteForceKnn(
        emb.filter(col("vec_id") === 0)
          .select(col("vec_id").as("qid"), col("embedding").as("qvec")),
        emb.select(col("vec_id").as("id"), col("embedding").as("vec")),
        k = 10)
      .select(col("id").as("doc_id"), col("rk").as("rank"))
    HybridRetrieval.rrf(Seq("bm25" -> bm, "dense" -> dense),
        idCol = "doc_id", rankCol = "rank", kConst = 60, topK = 20)
      .orderBy(col("rrf").desc, col("doc_id"))
  }

  /** D32: fuzzy entity matching — all customer-name pairs within edit
    * distance 1, via deletion-neighborhood blocking + exact verify
    * (see [[graft.operators.FuzzyJoin]]).
    */
  def fuzzyNameMatch(spark: SparkSession, dir: String): DataFrame =
    FuzzyJoin.selfJoin(Tables.customer(spark, dir), "c_custkey", "c_name")
      .orderBy(col("a_id"), col("b_id"))

  /** E7 batch face: sliding 1h windows every 15min. Decimal-exact sums
    * make the result partitioning-independent; the streaming twin is
    * [[graft.streaming.EventsStream.slidingAgg]].
    */
  def eventsSlidingAgg(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy(window(col("ts"), "1 hour", "15 minutes"),
        col("event_type"))
      .agg(count(lit(1)).as("n_events"), dsum(col("value")).as("sum_value"))
      .select(col("window.start").as("window_start"),
        col("window.end").as("window_end"), col("event_type"),
        col("n_events"), col("sum_value"))
      .orderBy(col("window_start"), col("event_type"))

  /** C34: calendar gap-fill with forward fill — densify each user's
    * daily value series over their own [first, last] activity span
    * and carry the last observed value across silent days (the
    * dashboard/feature-store "as-of daily snapshot" shape; EWMA C24
    * and cohort C25 consume exactly this kind of regularized series).
    *
    * Scale shape: the calendar explode emits span-length rows per
    * user (bounded by the date range, not events); the forward-fill
    * window partitions by user over that bounded series — state per
    * task = one user's days, never the event log. Daily sums are
    * decimal-exact; the fill is value-copying (no arithmetic), so
    * parity with the oracle's IGNORE NULLS window is structural.
    */
  def eventsGapFill(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val daily = Tables.events(spark, dir)
      .groupBy(col("user_id"), date_trunc("day", col("ts")).as("day"))
      .agg(dsum(col("value")).as("day_value"))
    val cal = daily.groupBy(col("user_id"))
      .agg(min(col("day")).as("__d0"), max(col("day")).as("__d1"))
      .select(col("user_id"),
        explode(sequence(col("__d0"), col("__d1"),
          expr("INTERVAL 1 DAY"))).as("day"))
    val w = Window.partitionBy(col("user_id")).orderBy(col("day"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    cal.join(daily, Seq("user_id", "day"), "left")
      .select(col("user_id"), col("day"),
        last(col("day_value"), ignoreNulls = true).over(w).as("filled_value"),
        col("day_value").isNull.as("is_gap"))
      .orderBy(col("user_id"), col("day"))
  }

  /** C39: peak session concurrency per day — the distributed
    * SWEEP-LINE: how many user sessions (C8's 4-hour-gap sessions)
    * were simultaneously open at the busiest instant of each day, the
    * capacity-planning number a global sort over all interval
    * endpoints would naively compute. Scale shape: endpoints become
    * ±1 deltas windowed PER DAY (bounded partitions, never a global
    * order), and cross-midnight sessions enter as a per-day CARRY-IN
    * computed by exploding each session over the (few) day boundaries
    * it spans — so peak(day) = carry_in + max(0, running delta sum).
    * Interval semantics are half-open [t_start, t_end): at a shared
    * instant the −1 applies before the +1 (the (t, d) tiebreak).
    */
  /** C64: the price/size Pareto frontier of the part catalog — every
    * part no other part beats on BOTH cost and capability (see
    * [[graft.operators.Skyline]]). The multi-objective answer a
    * scoring formula can't give: each frontier row is optimal under
    * SOME monotone preference between the two dims.
    */
  def paretoFrontier(spark: SparkSession, dir: String): DataFrame =
    graft.operators.Skyline.paretoFrontier2d(
        Tables.part(spark, dir)
          .select(col("p_partkey"), col("p_retailprice"), col("p_size")),
        x = col("p_retailprice"), y = col("p_size"), id = col("p_partkey"))
      .orderBy(col("p_partkey"))

  def peakConcurrency(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val s = graft.operators.Sessionize.sessions(Tables.events(spark, dir),
        col("user_id"), col("ts"), 4 * 3600L, Seq(col("ts"), col("event_id")))
      .select(col("t_start"), col("t_end"))
    val deltas = s.select(col("t_start").as("t"), lit(1L).as("d"))
      .unionAll(s.select(col("t_end").as("t"), lit(-1L).as("d")))
      .withColumn("day", date_trunc("day", col("t")))
    val w = Window.partitionBy(col("day")).orderBy(col("t"), col("d"))
      .rowsBetween(Window.unboundedPreceding, 0)
    val dayMax = deltas.withColumn("run", sum(col("d")).over(w))
      .groupBy(col("day")).agg(max(col("run")).as("mr"))
    // carry-in: one row per (session, midnight it spans) — sessions
    // span at most a handful of days, so the explode is O(sessions)
    val carry = s
      .filter(date_trunc("day", col("t_end")) > date_trunc("day", col("t_start")))
      .select(explode(sequence(
        date_trunc("day", col("t_start")) + expr("INTERVAL 1 DAY"),
        date_trunc("day", col("t_end")),
        expr("INTERVAL 1 DAY"))).as("day"))
      .groupBy(col("day")).agg(count(lit(1)).as("c"))
    dayMax.join(carry, Seq("day"), "full_outer")
      .select(col("day"),
        (coalesce(col("c"), lit(0L)) +
          greatest(lit(0L), coalesce(col("mr"), lit(0L)))).as("peak"))
      .orderBy(col("day"))
  }

  /** C38: per-type winsorization (robust clipping) — clamp each
    * event's value to its type's exact [p05, p95] band, the standard
    * feature-cleaning companion to C23's z-score REPORT (winsorize
    * repairs, outliers alarms). Percentile thresholds come off the
    * grouped 2-dp-bucket cumulative histogram
    * ([[graft.operators.CumHistogram.cumulativeByGroup]]) — exact at
    * bucket granularity, windows only over the aggregate, thresholds
    * broadcast back — so the whole clip is exchange-light at any
    * volume; the clamp itself is a codegen projection.
    */
  def eventsWinsorize(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
      .select(col("event_id"), col("event_type"), col("value"))
      .withColumn("__bk", floor(col("value") * lit(100.0)).cast("long"))
    val counts = ev.groupBy(col("event_type"), col("__bk"))
      .agg(count(lit(1)).as("cnt"))
    val cum = graft.operators.CumHistogram.cumulativeByGroup(
      counts, "event_type", "__bk", "cnt")
    val thr = cum.groupBy(col("event_type"))
      .agg(
        min(when(col("cum") >= lit(0.05) * col("total"), col("__bk")))
          .as("__lo"),
        min(when(col("cum") >= lit(0.95) * col("total"), col("__bk")))
          .as("__hi"))
    ev.join(broadcast(thr), Seq("event_type"))
      .select(col("event_id"), col("event_type"), col("value"),
        least(greatest(col("value"), col("__lo") / lit(100.0)),
          col("__hi") / lit(100.0)).as("clipped"))
      .orderBy(col("event_id"))
  }

  /** C59: per-type quantile discretization (equi-depth feature
    * binning — the QuantileDiscretizer of ML feature prep, without
    * the global sort `ntile` would cost): decile boundaries come off
    * the same grouped cent-bucket cumulative histogram as
    * [[eventsWinsorize]] (aggregate-sized windows, broadcast back),
    * and each event's decile is `1 + |{d : bucket > b_d}|` — a
    * codegen integer fold over nine broadcast thresholds. Exact at
    * bucket granularity, deterministic in any engine.
    */
  def eventsQuantileBuckets(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
      .select(col("event_id"), col("event_type"), col("value"))
      .withColumn("__bk", floor(col("value") * lit(100.0)).cast("long"))
    val counts = ev.groupBy(col("event_type"), col("__bk"))
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
    ev.join(broadcast(thr), Seq("event_type"))
      .select(col("event_id"), col("event_type"), col("value"),
        decile.cast("int").as("decile"))
      .orderBy(col("event_id"))
  }

  /** C54: median/MAD robust outliers per event type — the
    * heavy-tail-safe companion to C23's z-score (one wild day shifts
    * a mean and inflates σ enough to hide real outliers; the median
    * and the median absolute deviation move only when HALF the data
    * moves). Both medians come off the same grouped 2-dp-bucket
    * cumulative histogram as [[eventsWinsorize]] — two aggregate-sized
    * windows, thresholds broadcast back, the flag itself a codegen
    * integer compare (`dev > 3·mad` in cent buckets — exact in any
    * engine, no double boundary). Degenerate guard: a type whose MAD
    * is 0 (over half its values in one cent bucket) flags nothing —
    * the modified-z statistic is undefined there, and "everything
    * unusual" is noise, not detection.
    */
  def eventsMadOutliers(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
      .select(col("event_id"), col("event_type"), col("value"))
    val stats = graft.operators.RobustStats
      .medMadBuckets(ev, "event_type", "value")
    graft.operators.RobustStats.flag(ev, "event_type", "value", stats)
      .select(col("event_id"), col("event_type"), col("value"),
        col("median"), col("mad"), col("is_outlier"))
      .orderBy(col("event_id"))
  }

  /** C23: z-score outliers per event type (3σ) — see
    * [[graft.operators.Outliers]] for the exact-moment/bit-exact and
    * degenerate-group-guard story (the guard is mirrored in the
    * oracle).
    */
  def eventsOutliers(spark: SparkSession, dir: String): DataFrame =
    Outliers.zscore(Tables.events(spark, dir), "event_type", "value")
      .select(col("event_id"), col("event_type"), col("value"), col("z"))
      .orderBy(col("event_id"))

  /** C25: cohort retention — users grouped by first-activity week,
    * distinct-active counts per (cohort, weeks-since). Two passes over
    * events (first-touch agg, weekly-activity distinct), one join on
    * the user key. Weeks-since counts CALENDAR days / 7 (Monday weeks
    * are always exactly 7 calendar days apart), so the math survives
    * DST-observing session timezones where a "week" is not 604800
    * seconds.
    */
  def cohortRetention(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
    val firsts = ev.groupBy(col("user_id"))
      .agg(min(col("ts")).as("first_ts"))
      .select(col("user_id"),
        date_trunc("week", col("first_ts")).as("cohort_week"))
    val weekly = ev
      .select(col("user_id"), date_trunc("week", col("ts")).as("week"))
      .distinct()
    weekly.join(firsts, "user_id")
      .withColumn("week_number",
        (datediff(col("week"), col("cohort_week")) / lit(7)).cast("long"))
      .groupBy(col("cohort_week"), col("week_number"))
      .agg(countDistinct(col("user_id")).as("active_users"))
      .orderBy(col("cohort_week"), col("week_number"))
  }

  /** E8 batch face: stream-static enrichment — events joined to the
    * customer dim (broadcast; a dim re-read per micro-batch in the
    * streaming twin [[graft.streaming.EventsStream.enrichedAgg]]),
    * aggregated by segment and type.
    */
  def eventsEnrichedAgg(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
    val cust = Tables.customer(spark, dir)
      .select(col("c_custkey"), col("c_mktsegment"))
    ev.join(broadcast(cust), col("user_id") === col("c_custkey"))
      .groupBy(col("c_mktsegment"), col("event_type"))
      .agg(count(lit(1)).as("n_events"), dsum(col("value")).as("sum_value"))
      .orderBy(col("c_mktsegment"), col("event_type"))
  }

  /** C26: temporal (point-in-time) enrichment — each event picks up
    * the dimension attribute VALID AT its timestamp, composing C20's
    * SCD2 history with C13's as-of join. Zero-length versions (two
    * changes on the same order date; interval [d, d) holds at no
    * instant) are dropped first, which leaves `valid_from` unique per
    * key — the as-of pick is then fully deterministic. One shuffle on
    * the entity key for the history build, one for the as-of union
    * window.
    */
  def eventsPriorityAtTime(spark: SparkSession, dir: String): DataFrame = {
    val hist = Scd2.history(Tables.orders(spark, dir), Seq("o_custkey"),
        Seq("o_orderpriority"), "o_orderdate", "o_orderkey")
      .filter(col("valid_to").isNull || col("valid_from") < col("valid_to"))
      .select(col("o_custkey").as("user_id"), col("valid_from"),
        col("o_orderpriority").as("priority_at_event"))
    val ev = Tables.events(spark, dir)
      .select(col("event_id"), col("user_id"), col("ts"))
    AsOfJoin.lastValue(ev, hist, key = "user_id",
        leftTime = "ts", rightTime = "valid_from",
        payloadCols = Seq("priority_at_event"))
      .orderBy(col("event_id"))
  }

  /** C4b: the full window-function family in one pass — ntile,
    * percent_rank, cume_dist, lag/lead, first/nth value — over a
    * UNIQUE ordering (ties would make rank-family output
    * partitioning-dependent). One shuffle; every function rides the
    * same window spec. percent_rank/cume_dist are exact rationals
    * (one correctly-rounded division) — bit-stable across engines.
    */
  def windowSuite(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("l_suppkey"))
      .orderBy(col("l_shipdate"), col("l_orderkey"), col("l_linenumber"))
    Tables.lineitem(spark, dir).select(
        col("l_suppkey"), col("l_orderkey"), col("l_linenumber"),
        col("l_quantity"),
        ntile(4).over(w).as("quartile"),
        percent_rank().over(w).as("pct_rank"),
        cume_dist().over(w).as("cume"),
        lag(col("l_quantity"), 1).over(w).as("prev_qty"),
        lead(col("l_quantity"), 1).over(w).as("next_qty"),
        first(col("l_quantity")).over(w).as("first_qty"),
        nth_value(col("l_quantity"), 3).over(w).as("third_qty"))
      .orderBy(col("l_suppkey"), col("l_orderkey"), col("l_linenumber"))
  }

  /** C10b: arbitrary GROUPING SETS (beyond ROLLUP's prefix chain) —
    * one Expand, one shuffle, `grouping_id` disambiguates set
    * membership from genuine nulls.
    */
  def groupingSetsTotals(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .groupingSets(
        Seq(Seq(col("l_returnflag"), col("l_linestatus")),
          Seq(col("l_returnflag")), Seq()),
        col("l_returnflag"), col("l_linestatus"))
      .agg(dsum(col("l_quantity")).as("sum_qty"),
        count(lit(1)).as("n"),
        grouping_id().cast("long").as("gid"))
      .orderBy(col("gid"), col("l_returnflag").asc_nulls_first,
        col("l_linestatus").asc_nulls_first)

  /** C24: EWMA-smoothed daily spend per user (α = 0.3) — the derived
    * "form" signal (see [[graft.operators.Ewma]]). Daily sums are
    * decimal-exact; the fold is deterministic left-to-right.
    */
  def ewmaUserValue(spark: SparkSession, dir: String): DataFrame = {
    val daily = Tables.events(spark, dir)
      .groupBy(col("user_id"), date_trunc("day", col("ts")).as("day"))
      .agg(sum(dec2(col("value"))).as("dval"))
    Ewma.smooth(daily, "user_id", "day", col("dval"), alpha = 0.3)
      .orderBy(col("user_id"))
  }

  /** C61: Holt linear-trend forecast per user over the same daily
    * decimal-exact sums as C24's EWMA — level + trend state, one-step
    * extrapolation (see [[graft.operators.Ewma.holt]]).
    */
  def holtForecast(spark: SparkSession, dir: String): DataFrame = {
    val daily = Tables.events(spark, dir)
      .groupBy(col("user_id"), date_trunc("day", col("ts")).as("day"))
      .agg(sum(dec2(col("value"))).as("dval"))
    Ewma.holt(daily, "user_id", "day", col("dval"),
        alpha = 0.3, beta = 0.3)
      .orderBy(col("user_id"))
  }

  /** C65: Holt–Winters additive seasonal forecast of the daily event
    * value per event type (m = 7: weekly shape on daily grain) — see
    * [[graft.operators.Ewma.holtWinters]]. The seasonal face the
    * plain Holt trend (C61) can't express.
    */
  def holtWintersForecast(spark: SparkSession, dir: String): DataFrame = {
    val daily = Tables.events(spark, dir)
      .groupBy(col("event_type"), date_trunc("day", col("ts")).as("day"))
      .agg(sum(dec2(col("value"))).as("dval"))
    Ewma.holtWinters(daily, "event_type", "day", col("dval"),
        alpha = 0.3, beta = 0.2, gamma = 0.4, m = 7)
      .orderBy(col("event_type"))
  }

  /** C28: link-analysis centrality over the customer–supplier
    * bipartite trade graph (undirected: both directions inserted) —
    * the integer fixed-point PageRank of
    * [[graft.operators.Centrality]], 10 iterations; every step is
    * integer arithmetic so the distributed result hash-matches the
    * unrolled-SQL oracle exactly.
    */
  def pagerankCentrality(spark: SparkSession, dir: String): DataFrame = {
    val off = lit(1000000L)
    val cs = Tables.orders(spark, dir)
      .select(col("o_orderkey"), col("o_custkey"))
      .join(Tables.lineitem(spark, dir)
        .select(col("l_orderkey"), col("l_suppkey")),
        col("o_orderkey") === col("l_orderkey"))
      .select(col("o_custkey").as("c"), (col("l_suppkey") + off).as("s"))
      .distinct()
    val edges = cs.select(col("c").as("src"), col("s").as("dst"))
      .unionAll(cs.select(col("s").as("src"), col("c").as("dst")))
    val nodes = Tables.customer(spark, dir)
      .select(col("c_custkey").cast("long").as("id"))
      .unionAll(Tables.supplier(spark, dir)
        .select((col("s_suppkey") + off).as("id")))
    graft.operators.Centrality.pageRank(edges, nodes, iterations = 10)
      .orderBy(col("id"))
  }

  /** C28b: PERSONALIZED PageRank over the same trade graph — teleport
    * mass only on BUILDING-segment customers (weight 1; everyone else
    * 0), so rank measures "trust" flowing out of that seed cohort
    * through trade links (see
    * [[graft.operators.Centrality.personalizedPageRank]]). Suppliers
    * acquire rank purely via links — a non-uniform teleport row the
    * uniform oracle cannot fake.
    */
  def pagerankPersonalized(spark: SparkSession, dir: String): DataFrame = {
    val off = lit(1000000L)
    val cs = Tables.orders(spark, dir)
      .select(col("o_orderkey"), col("o_custkey"))
      .join(Tables.lineitem(spark, dir)
        .select(col("l_orderkey"), col("l_suppkey")),
        col("o_orderkey") === col("l_orderkey"))
      .select(col("o_custkey").as("c"), (col("l_suppkey") + off).as("s"))
      .distinct()
    val edges = cs.select(col("c").as("src"), col("s").as("dst"))
      .unionAll(cs.select(col("s").as("src"), col("c").as("dst")))
    val teleport = Tables.customer(spark, dir)
      .select(col("c_custkey").cast("long").as("id"),
        when(col("c_mktsegment") === "BUILDING", lit(1L)).otherwise(lit(0L))
          .as("weight"))
      .unionAll(Tables.supplier(spark, dir)
        .select((col("s_suppkey") + off).as("id"), lit(0L).as("weight")))
    graft.operators.Centrality.personalizedPageRank(edges, teleport,
        iterations = 10)
      .orderBy(col("id"))
  }

  /** C28d: WEIGHTED PageRank over the trade graph — edge weight = the
    * lineitem count linking a customer and supplier (a link-count
    * multiplicity, exactly what real host graphs carry), so rank
    * flows proportionally to trade volume instead of per-partner (see
    * [[graft.operators.Centrality.weightedPageRank]]). A customer
    * funneling 90% of its lineitems to one supplier now sends 90% of
    * its rank there; the unweighted C28 splits it evenly.
    */
  def pagerankWeighted(spark: SparkSession, dir: String): DataFrame = {
    val off = lit(1000000L)
    val cs = Tables.orders(spark, dir)
      .select(col("o_orderkey"), col("o_custkey"))
      .join(Tables.lineitem(spark, dir)
        .select(col("l_orderkey"), col("l_suppkey")),
        col("o_orderkey") === col("l_orderkey"))
      .groupBy(col("o_custkey").as("c"), (col("l_suppkey") + off).as("s"))
      .agg(count(lit(1)).as("w"))
    val edges = cs.select(col("c").as("src"), col("s").as("dst"), col("w").as("weight"))
      .unionAll(cs.select(col("s").as("src"), col("c").as("dst"), col("w").as("weight")))
    val nodes = Tables.customer(spark, dir)
      .select(col("c_custkey").cast("long").as("id"))
      .unionAll(Tables.supplier(spark, dir)
        .select((col("s_suppkey") + off).as("id")))
    graft.operators.Centrality.weightedPageRank(edges, nodes, iterations = 10)
      .orderBy(col("id"))
  }

  /** C33: BFS hop distance from the BUILDING-segment seed customers
    * over the undirected trade graph (see
    * [[graft.operators.Centrality.seedDistance]]) — the discrete
    * trust-frontier audit beside C28b's continuous PPR: suppliers at
    * distance 1 trade directly with a seed, customers at 2 share a
    * supplier with one, etc.; −1 marks nodes outside the 4-hop
    * frontier.
    */
  def seedDistance(spark: SparkSession, dir: String): DataFrame = {
    val off = lit(1000000L)
    val cs = Tables.orders(spark, dir)
      .select(col("o_orderkey"), col("o_custkey"))
      .join(Tables.lineitem(spark, dir)
        .select(col("l_orderkey"), col("l_suppkey")),
        col("o_orderkey") === col("l_orderkey"))
      .select(col("o_custkey").as("c"), (col("l_suppkey") + off).as("s"))
      .distinct()
    val edges = cs.select(col("c").as("src"), col("s").as("dst"))
      .unionAll(cs.select(col("s").as("src"), col("c").as("dst")))
    val nodes = Tables.customer(spark, dir)
      .select(col("c_custkey").cast("long").as("id"))
      .unionAll(Tables.supplier(spark, dir)
        .select((col("s_suppkey") + off).as("id")))
    val seeds = Tables.customer(spark, dir)
      .filter(col("c_mktsegment") === "BUILDING")
      .select(col("c_custkey").cast("long").as("id"))
    graft.operators.Centrality.seedDistance(edges, seeds, nodes,
        maxIter = 4)
      .orderBy(col("id"))
  }

  /** C55: bounded-hop weighted shortest paths from the BUILDING-segment
    * seed set over the trade graph — edge cost = the cheapest single
    * lineitem linking a (customer, supplier) pair, in integer cents
    * (exact decimal→cents, the q20 pattern), 4 min-plus rounds. The
    * weighted companion to C33's hop distance: hops say HOW FAR the
    * crawl frontier is, costs say how expensive the cheapest route is.
    * See [[graft.operators.Centrality.weightedDistance]] for the
    * frontier-relaxation scale story.
    */
  def shortestPathCost(spark: SparkSession, dir: String): DataFrame = {
    val off = lit(1000000L)
    val wt = Tables.orders(spark, dir)
      .select(col("o_orderkey"), col("o_custkey"))
      .join(Tables.lineitem(spark, dir)
        .select(col("l_orderkey"), col("l_suppkey"), col("l_quantity")),
        col("o_orderkey") === col("l_orderkey"))
      .groupBy(col("o_custkey").as("c"), (col("l_suppkey") + off).as("s"))
      .agg((min(graft.functions.Num.dec2(col("l_quantity"))) * 100)
        .cast("long").as("w"))
    val edges = wt.select(col("c").as("src"), col("s").as("dst"), col("w"))
      .unionAll(wt.select(col("s").as("src"), col("c").as("dst"), col("w")))
    val nodes = Tables.customer(spark, dir)
      .select(col("c_custkey").cast("long").as("id"))
      .unionAll(Tables.supplier(spark, dir)
        .select((col("s_suppkey") + off).as("id")))
    val seeds = Tables.customer(spark, dir)
      .filter(col("c_mktsegment") === "BUILDING")
      .select(col("c_custkey").cast("long").as("id"))
    graft.operators.Centrality.weightedDistance(edges, seeds, nodes,
        maxIter = 4)
      .orderBy(col("id"))
  }

  /** C28c: HITS hubs & authorities over the DIRECTED buyer→supplier
    * trade graph — customers score as hubs (well-connected buyers),
    * suppliers as authorities (serving well-connected buyers); see
    * [[graft.operators.Centrality.hits]]. Direction matters here
    * (unlike C28's undirected walk), so the bipartite split falls out
    * of the math: customers get authority 0, suppliers hub 0.
    */
  def hitsCentrality(spark: SparkSession, dir: String): DataFrame = {
    val off = lit(1000000L)
    val cs = Tables.orders(spark, dir)
      .select(col("o_orderkey"), col("o_custkey"))
      .join(Tables.lineitem(spark, dir)
        .select(col("l_orderkey"), col("l_suppkey")),
        col("o_orderkey") === col("l_orderkey"))
      .select(col("o_custkey").as("c"), (col("l_suppkey") + off).as("s"))
      .distinct()
    val edges = cs.select(col("c").as("src"), col("s").as("dst"))
    val nodes = Tables.customer(spark, dir)
      .select(col("c_custkey").cast("long").as("id"))
      .unionAll(Tables.supplier(spark, dir)
        .select((col("s_suppkey") + off).as("id")))
    graft.operators.Centrality.hits(edges, nodes, iterations = 8)
      .orderBy(col("id"))
  }

  /** C29: triangle counting + local clustering over the parts-bought-
    * together graph — parts are adjacent when some order contains
    * both (pair generation is a self-join on the order key, bounded by
    * the ≤7 lineitems per order, so Σk² stays O(|lineitem|)); see
    * [[graft.operators.Triangles]] for the degree-ordered-orientation
    * scale argument. The lcc column ranks how "bundle-like" each
    * part's co-purchase neighborhood is.
    */
  def triangleCount(spark: SparkSession, dir: String): DataFrame = {
    val lp = Tables.lineitem(spark, dir)
      .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"))
      .distinct()
    val e = lp.as("a").join(lp.as("b"),
        col("a.ok") === col("b.ok") && col("a.pk") < col("b.pk"))
      .select(col("a.pk").as("u"), col("b.pk").as("v"))
    val nodes = Tables.part(spark, dir)
      .select(col("p_partkey").cast("long").as("id"))
    graft.operators.Triangles.nodeTriangles(e, nodes)
      .orderBy(col("id"))
  }

  /** C30: community detection over the same parts-bought-together
    * graph as [[triangleCount]] — synchronous min-tiebreak label
    * propagation ([[graft.operators.Community]]), 5 rounds, both edge
    * directions inserted for the undirected semantics. Output carries
    * the converged community label plus the community's node count
    * (the quantity a mixture cap actually budgets on).
    */
  def communityLabels(spark: SparkSession, dir: String): DataFrame = {
    val lp = Tables.lineitem(spark, dir)
      .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"))
      .distinct()
    val pairs = lp.as("a").join(lp.as("b"),
        col("a.ok") === col("b.ok") && col("a.pk") < col("b.pk"))
      .select(col("a.pk").as("u"), col("b.pk").as("v"))
    val edges = pairs.select(col("u").as("src"), col("v").as("dst"))
      .unionAll(pairs.select(col("v").as("src"), col("u").as("dst")))
    val nodes = Tables.part(spark, dir)
      .select(col("p_partkey").cast("long").as("id"))
    val lab = graft.operators.Community.labelPropagation(edges, nodes,
      iterations = 5)
    val sizes = lab.groupBy(col("community"))
      .agg(count(lit(1)).as("csize"))
    lab.join(sizes, "community")
      .select(col("id"), col("community"), col("csize"))
      .orderBy(col("id"))
  }

  /** C56: k-core decomposition with onion layers over the
    * high-volume trade graph — customer–supplier pairs linked by ≥ 2
    * lineitems of quantity ≥ 40 (the multiplicity filter sparsifies
    * the bipartite graph enough that peeling cascades for several
    * rounds instead of converging trivially). k = 2, 9 synchronous
    * peel rounds ([[graft.operators.KCore]]); the cascade fixpoints
    * at round 7 on the gate data, so the survivors are the exact
    * 2-core and every peeled node carries its onion-layer index.
    */
  def kcoreLayers(spark: SparkSession, dir: String): DataFrame = {
    val off = lit(1000000L)
    val cs = Tables.orders(spark, dir)
      .select(col("o_orderkey"), col("o_custkey"))
      .join(Tables.lineitem(spark, dir)
        .where(col("l_quantity") >= 40)
        .select(col("l_orderkey"), col("l_suppkey")),
        col("o_orderkey") === col("l_orderkey"))
      .groupBy(col("o_custkey").as("c"), (col("l_suppkey") + off).as("s"))
      .agg(count(lit(1)).as("m"))
      .where(col("m") >= 2)
      .select(col("c"), col("s"))
    val edges = cs.select(col("c").as("src"), col("s").as("dst"))
      .unionAll(cs.select(col("s").as("src"), col("c").as("dst")))
    graft.operators.KCore.peelLayers(edges, k = 2, rounds = 9)
      .orderBy(col("id"))
  }

  /** C58: frequent co-purchase pairs (the support-counting core of
    * market-basket/FP-growth mining): parts appearing together in ≥ 2
    * orders, top-50 by support. The per-order self-join is bounded by
    * order size (≤ 7 lineitems), the pair count partial-aggregates
    * before its one shuffle, and the final cut is TakeOrdered — never
    * a global sort. Total (support DESC, u, v) order makes the
    * boundary deterministic in any engine.
    */
  def frequentPairs(spark: SparkSession, dir: String): DataFrame = {
    val lp = Tables.lineitem(spark, dir)
      .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"))
      .distinct()
    lp.as("a").join(lp.as("b"),
        col("a.ok") === col("b.ok") && col("a.pk") < col("b.pk"))
      .groupBy(col("a.pk").as("u"), col("b.pk").as("v"))
      .agg(count(lit(1)).as("support"))
      .where(col("support") >= 2)
      .orderBy(col("support").desc, col("u"), col("v"))
      .limit(50)
  }

  /** C60: item-item co-occurrence cosine — the normalization that
    * turns C58's raw supports into a recommender similarity:
    * sim(u,v) = co(u,v)/√(n_u·n_v) discounts pairs that co-occur only
    * because both items are everywhere (raw support's popularity
    * bias). The classic item-based CF neighborhood (Sarwar et al.
    * 2001) on implicit per-order signals.
    *
    * Shape: C58's bounded per-order self-join for co-counts (pair
    * volume ∝ Σ order_size², never corpus²), one partial-aggregated
    * per-item order count joined back on the pair frame (exchanges
    * carry (item, count) pairs), TakeOrdered cut. The cosine is
    * integer-exact under sqrt/÷ (correctly-rounded IEEE ops), so it
    * hashes raw in any engine.
    */
  def itemCosine(spark: SparkSession, dir: String): DataFrame = {
    val lp = Tables.lineitem(spark, dir)
      .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"))
      .distinct()
    val freq = lp.groupBy(col("pk")).agg(count(lit(1)).as("n"))
    lp.as("a").join(lp.as("b"),
        col("a.ok") === col("b.ok") && col("a.pk") < col("b.pk"))
      .groupBy(col("a.pk").as("u"), col("b.pk").as("v"))
      .agg(count(lit(1)).as("support"))
      .where(col("support") >= 2)
      .join(freq.select(col("pk").as("u"), col("n").as("n_u")), Seq("u"))
      .join(freq.select(col("pk").as("v"), col("n").as("n_v")), Seq("v"))
      .select(col("u"), col("v"), col("support"),
        (col("support").cast("double") /
          sqrt((col("n_u") * col("n_v")).cast("double"))).as("cosine"))
      .orderBy(col("cosine").desc, col("u"), col("v"))
      .limit(50)
  }

  /** C57: Markov-chain removal-effect attribution over the events
    * stream — user journeys cut at the first `purchase`, channels =
    * the four non-conversion event types, 12 integer-micro-unit
    * absorption iterations. See [[graft.operators.Attribution]].
    */
  def markovAttribution(spark: SparkSession, dir: String): DataFrame =
    graft.operators.Attribution.markovRemoval(
        Tables.events(spark, dir), userCol = "user_id", tsCol = "ts",
        tieCol = "event_id", typeCol = "event_type",
        convType = "purchase", iterations = 12,
        channelsHint = Some(Seq("click", "error", "signup", "view")))
      .orderBy(col("channel"))

  /** C84: Mann–Kendall monotone-trend test over the daily event
    * volume — the drift alarm for "is this metric trending" where
    * C70's CUSUM assumes a single level shift (see
    * [[graft.operators.Changepoint.mannKendall]]).
    */
  def mannKendallTrend(spark: SparkSession, dir: String): DataFrame =
    graft.operators.Changepoint.mannKendall(
      Tables.events(spark, dir)
        .groupBy(date_trunc("day", col("ts")).cast("date").as("day"))
        .agg(count(lit(1)).as("n")),
      col("day"), col("n"))

  /** C83: exact Shapley-value attribution over the same journeys as
    * C57 — v(S) = conversions among users who touched only channels
    * in S strictly before their first purchase; 4 channels → the
    * exact 16-coalition game (see
    * [[graft.operators.Attribution.shapley]]).
    */
  def shapleyAttribution(spark: SparkSession, dir: String): DataFrame =
    graft.operators.Attribution.shapley(
      Tables.events(spark, dir), userCol = "user_id", tsCol = "ts",
      tieCol = "event_id", typeCol = "event_type", convType = "purchase",
      channels = Seq("click", "error", "signup", "view"))

  /** D46: TF-IDF cosine retrieval over the corpus, same query terms as
    * [[bm25Search]] so the two rankers are directly comparable (see
    * [[graft.operators.TextRank.tfidfTopK]] for the full-vocabulary-
    * norm shape).
    */
  def tfidfSearch(spark: SparkSession, dir: String): DataFrame =
    graft.operators.TextRank.tfidfTopK(Tables.documents(spark, dir),
      idCol = "doc_id", textCol = "text",
      terms = Bm25Terms, k = 50)

  /** C27: declarative data-quality expectations over the orders fact
    * (see [[graft.operators.Expectations]]) — row rules + uniqueness
    * in one wide-aggregate scan, referential integrity as a broadcast
    * anti-join; mixed pass/fail outcomes on this data so both paths
    * are exercised.
    */
  def dataExpectations(spark: SparkSession, dir: String): DataFrame = {
    import graft.operators.Expectations
    Expectations.check(Tables.orders(spark, dir),
      rowRules = Seq(
        Expectations.notNull("o_custkey"),
        Expectations.inRange("o_totalprice", 0.0, 400000.0),
        Expectations.inSet("o_orderstatus", Seq("O", "F")),
        Expectations.matches("o_orderpriority", "^[1-5]-")),
      uniqueCols = Seq("o_orderkey"),
      refRules = Seq(Expectations.refIntegrity("o_custkey",
        Tables.customer(spark, dir), "c_custkey")))
  }

  /** C43: time-weighted average (TWAP) of the event value per
    * user-day — the metric ops dashboards actually want when events
    * arrive irregularly (an arithmetic mean over-weights bursts; the
    * time-weighted mean holds each value for exactly the interval it
    * was current). Each value is weighted by the gap to the NEXT
    * event in the same user-day (`lead` over the bounded user-day
    * window — per-task state is one user's day, never the corpus);
    * single-event days carry no weighted interval and drop out, like
    * any interval metric. EXACT cross-engine: weights are integer
    * microseconds, the weighted mass accumulates in DECIMAL
    * (value(2dp) × µs — associative, partitioning-independent), and
    * the published TWAP is ONE double divide of two exact aggregates.
    */
  def eventsTwap(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val ev = Tables.events(spark, dir)
      .select(col("event_id"), col("ts"), col("user_id"),
        col("value"), date_trunc("day", col("ts")).cast("date").as("day"))
    val w = Window.partitionBy(col("user_id"), col("day"))
      .orderBy(col("ts"), col("event_id"))
    ev.withColumn("nxt", lead(col("ts"), 1).over(w))
      .filter(col("nxt").isNotNull)
      .withColumn("dt_us", unix_micros(col("nxt")) - unix_micros(col("ts")))
      .groupBy(col("user_id"), col("day"))
      .agg(count(lit(1)).as("n_gaps"),
        sum(graft.functions.Num.dec2(col("value")) * col("dt_us")).as("vw"),
        sum(col("dt_us")).as("tw"))
      .select(col("user_id"), col("day"), col("n_gaps"),
        (col("vw").cast("double") / col("tw").cast("double")).as("twap"))
      .orderBy(col("user_id"), col("day"))
  }

  /** C73: association rules over order baskets — C58's raw supports
    * upgraded to the directional retail metrics: confidence
    * co/n(u) and lift co·N/(n(u)·n(v)) (lift > 1 = genuinely
    * associated, not just both popular). Same bounded per-order
    * self-join for co-counts (pair volume ∝ Σ basket², never
    * corpus²), item counts joined back broadcast, every input an
    * exact integer and each metric ONE divide; top-50 rules under a
    * TOTAL order (rounded lift desc, pair asc).
    */
  def associationRules(spark: SparkSession, dir: String): DataFrame = {
    val lp = graft.operators.Materialize.cut(
      Tables.lineitem(spark, dir)
        .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"))
        .distinct())
    val nOrders = lp.agg(countDistinct(col("ok")).as("n_orders"))
    val itemN = lp.groupBy(col("pk")).agg(count(lit(1)).as("cnt"))
    val co = lp.as("a").join(lp.as("b"),
        col("a.ok") === col("b.ok") && col("a.pk") =!= col("b.pk"))
      .groupBy(col("a.pk").as("u"), col("b.pk").as("v"))
      .agg(count(lit(1)).as("support"))
      .where(col("support") >= 2)
    co.join(broadcast(itemN.withColumnRenamed("pk", "u")
        .withColumnRenamed("cnt", "n_u")), Seq("u"))
      .join(broadcast(itemN.withColumnRenamed("pk", "v")
        .withColumnRenamed("cnt", "n_v")), Seq("v"))
      .crossJoin(broadcast(nOrders))
      .select(col("u"), col("v"), col("support"),
        round(col("support").cast("double") / col("n_u").cast("double"), 6)
          .as("confidence"),
        round(col("support").cast("double") * col("n_orders").cast("double")
          / (col("n_u").cast("double") * col("n_v").cast("double")), 6)
          .as("lift"))
      .orderBy(col("lift").desc, col("u"), col("v"))
      .limit(50)
  }

  /** C72: Adamic–Adar supplier affinity — which two suppliers a
    * shared customer base most strongly ties, each common customer
    * discounted by 1/ln(breadth). Top-20 pairs; see
    * [[graft.operators.LinkPrediction]].
    */
  def adamicAdarLinks(spark: SparkSession, dir: String): DataFrame = {
    val cs = Tables.orders(spark, dir)
      .select(col("o_orderkey"), col("o_custkey"))
      .join(Tables.lineitem(spark, dir)
        .select(col("l_orderkey"), col("l_suppkey")),
        col("o_orderkey") === col("l_orderkey"))
      .select(col("o_custkey").as("c"), col("l_suppkey").as("s"))
    graft.operators.LinkPrediction.adamicAdarTopK(
      cs, left = col("c"), right = col("s"), k = 20)
  }

  /** C70: CUSUM changepoint per event type over the daily count
    * series — "did the volume shift, and on which day". The corpus
    * scan is ONE partial-agg'd (type, day) count shuffle; everything
    * after runs on the aggregate-sized series (see
    * [[graft.operators.Changepoint]]).
    */
  def cusumChangepoint(spark: SparkSession, dir: String): DataFrame = {
    val daily = Tables.events(spark, dir)
      .groupBy(col("event_type"),
        date_trunc("day", col("ts")).cast("date").as("day"))
      .agg(count(lit(1)).as("n"))
    graft.operators.Changepoint.cusumMaxShift(
        daily, Seq("event_type"), col("day"), col("n"))
      .orderBy(col("event_type"))
  }

  /** C71: RFM segmentation (the classic recency/frequency/monetary
    * quintile scoring every CRM warehouse ships): per-user metrics
    * off ONE user-count-sized groupBy, quintile boundaries off the
    * CumHistogram cumulative-histogram walk (aggregate-sized windows,
    * broadcast back — the C59 decile pattern, never a corpus NTILE),
    * all-integer scoring. Recency anchors at the fixed calendar day
    * 2024-01-31 (data-independent); scores are 1..5 with 5 best
    * (recency inverts: small gap = high score).
    */
  def rfmSegments(spark: SparkSession, dir: String): DataFrame = {
    import graft.operators.CumHistogram
    val anchor = to_date(lit("2024-01-31"))
    // the user frame feeds three threshold branches + the scoring
    // pass — cut lineage so the corpus scans once, not five times
    val users = graft.operators.Materialize.cut(Tables.events(spark, dir)
      .filter(col("event_type") === "purchase")
      .groupBy(col("user_id"))
      .agg(datediff(anchor, max(date_trunc("day", col("ts")).cast("date")))
             .cast("long").as("recency"),
           count(lit(1)).as("frequency"),
           sum(graft.functions.Num.dec2(col("value")) * 100)
             .cast("long").as("cents")))
    def quintileThresholds(metric: String): DataFrame = {
      val counts = users
        .select(lit(1).as("__g"), col(metric).as("__bk"))
        .groupBy(col("__g"), col("__bk")).agg(count(lit(1)).as("cnt"))
      val cum = CumHistogram.cumulativeByGroup(counts, "__g", "__bk", "cnt")
      val thrCols = (1 to 4).map(d =>
        min(when(col("cum") >= lit(d / 5.0) * col("total"), col("__bk")))
          .as(s"__${metric}_b$d"))
      cum.groupBy(col("__g")).agg(thrCols.head, thrCols.tail: _*)
        .drop("__g")
    }
    def score(metric: String): Column =
      (1 to 4).foldLeft(lit(1)) { (acc, d) =>
        acc + when(col(metric) > col(s"__${metric}_b$d"), 1).otherwise(0)
      }
    val withThr = users
      .crossJoin(broadcast(quintileThresholds("recency")))
      .crossJoin(broadcast(quintileThresholds("frequency")))
      .crossJoin(broadcast(quintileThresholds("cents")))
    withThr
      .withColumn("r_score", (lit(6) - score("recency")).cast("int"))
      .withColumn("f_score", score("frequency").cast("int"))
      .withColumn("m_score", score("cents").cast("int"))
      .select(col("user_id"), col("recency"), col("frequency"),
        (col("cents").cast("double") / 100.0).as("monetary"),
        col("r_score"), col("f_score"), col("m_score"),
        concat(col("r_score"), col("f_score"), col("m_score")).as("segment"))
      .orderBy(col("user_id"))
  }

  /** C81: frequent triples via the Apriori prune (Agrawal & Srikant
    * 1994: a frequent triple's items are each frequent — so the
    * basket frame shrinks to FREQUENT items before the cubic
    * enumeration, the pruning that makes k=3 tractable at volume).
    * Pair volume ∝ Σ basket'³ over the PRUNED baskets; counts exact;
    * top-30 under a total order.
    */
  def frequentTriples(spark: SparkSession, dir: String): DataFrame = {
    val lp = graft.operators.Materialize.cut(
      Tables.lineitem(spark, dir)
        .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"))
        .distinct())
    // Apriori level 1: keep items appearing in ≥ 2 baskets
    val freqItems = lp.groupBy(col("pk")).agg(count(lit(1)).as("c"))
      .filter(col("c") >= 2).select(col("pk"))
    val pruned = graft.operators.Materialize.cut(
      lp.join(broadcast(freqItems), Seq("pk")))
    pruned.as("a")
      .join(pruned.as("b"),
        col("a.ok") === col("b.ok") && col("a.pk") < col("b.pk"))
      .join(pruned.as("c"),
        col("a.ok") === col("c.ok") && col("b.pk") < col("c.pk"))
      .groupBy(col("a.pk").as("u"), col("b.pk").as("v"),
        col("c.pk").as("w"))
      .agg(count(lit(1)).as("support"))
      .where(col("support") >= 2)
      .orderBy(col("support").desc, col("u"), col("v"), col("w"))
      .limit(30)
  }

  /** C80: Kolmogorov–Smirnov two-sample test on purchase value
    * between the parity arms — the distribution-level companion to
    * C66/C68, with the value where the gap peaks. See
    * [[graft.operators.AbStats.ksTwoSample]].
    */
  def ksTwoSample(spark: SparkSession, dir: String): DataFrame =
    graft.operators.AbStats.ksTwoSample(
      Tables.events(spark, dir).filter(col("event_type") === "purchase"),
      col("user_id") % 2, col("value"))

  /** C79: Benford's-law first-digit audit (Newcomb 1881 / Benford
    * 1938 — the data-quality/fraud screen: organically-grown monetary
    * values follow P(d) = log₁₀(1 + 1/d); fabricated or truncated
    * feeds don't). The first digit comes off the CENTS INTEGER's
    * decimal string — exact in any engine, no float log in the
    * decision path; expected probabilities are 9 shared constants and
    * the χ² distance folds 9 cells in pinned digit order.
    */
  def benfordAudit(spark: SparkSession, dir: String): DataFrame = {
    val cents = (graft.functions.Num.dec2(col("l_extendedprice")) * 100)
      .cast("long")
    benfordFromCounts(Tables.lineitem(spark, dir)
      .select(substring(cents.cast("string"), 1, 1).cast("int").as("digit"))
      .filter(col("digit") >= 1)
      .groupBy(col("digit")).agg(count(lit(1)).as("n")))
  }

  /** The finisher over an already-aggregated (digit, n) frame —
    * shared by the batch C79 key and the E28 streaming read face
    * (digit counts are ADDITIVE, so merged per-batch counts feed the
    * SAME computation and stream ≡ batch exactly).
    */
  def benfordFromCounts(digits: DataFrame): DataFrame = {
    val withTot = digits
      .crossJoin(broadcast(digits.agg(sum(col("n")).cast("long").as("tot"))))
    val expected = (1 to 9).map(d =>
      d -> math.log10(1.0 + 1.0 / d)).toMap
    val pExp = (1 to 9).foldLeft(lit(Double.NaN)) { (acc, d) =>
      when(col("digit") === d, lit(expected(d))).otherwise(acc)
    }
    withTot
      .withColumn("p_expected", round(pExp, 6))
      .withColumn("p_observed",
        round(col("n").cast("double") / col("tot").cast("double"), 6))
      .withColumn("chi2_term", {
        val o = col("n").cast("double"); val t = col("tot").cast("double")
        round(pow(o - t * pExp, 2) / (t * pExp), 6)
      })
      .select(col("digit"), col("n"), col("p_expected"),
        col("p_observed"), col("chi2_term"))
      .orderBy(col("digit"))
  }

  /** C78: lead–lag cross-correlation between two daily metric series
    * (does signup volume LEAD purchase value, and by how many days —
    * the ops question behind every funnel dashboard). The corpus
    * collapses to two day-series (aggregate-sized); each lag L in
    * −3..+3 joins x(day) with y(day+L) via one lags×days frame, and
    * the per-lag Pearson is one IEEE evaluation over exact integer
    * cent/count sums. Output: 7 rows (lag, n_days, r).
    */
  def leadLagCorrelation(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
    val daily = graft.operators.Materialize.cut(ev
      .groupBy(date_trunc("day", col("ts")).cast("date").as("day"))
      .agg(sum(when(col("event_type") === "signup", 1L).otherwise(0L))
             .as("x"),
           coalesce(sum(when(col("event_type") === "purchase",
             graft.functions.Num.dec2(col("value")) * 100)), lit(0))
             .cast("long").as("y")))
    val lags = spark.range(-3, 4).select(col("id").cast("int").as("lag"))
    val joined = daily.as("a")
      .crossJoin(broadcast(lags))
      .join(daily.as("b"),
        expr("date_add(a.day, lag) = b.day"))
      .select(col("lag"), col("a.x").as("x"), col("b.y").as("y"))
    // products in decimal(38,0): cent·cent exceeds Long at real scale
    val d0 = (c: Column) =>
      c.cast(org.apache.spark.sql.types.DecimalType(38, 0))
    val agg = joined.groupBy(col("lag"))
      .agg(count(lit(1)).as("n_days"),
        sum(col("x")).cast("double").as("sx"),
        sum(col("y")).cast("double").as("sy"),
        sum(d0(col("x")) * d0(col("y"))).cast("double").as("sxy"),
        sum(d0(col("x")) * d0(col("x"))).cast("double").as("sxx"),
        sum(d0(col("y")) * d0(col("y"))).cast("double").as("syy"))
    val nD = col("n_days").cast("double")
    val num = nD * col("sxy") - col("sx") * col("sy")
    val dx = nD * col("sxx") - col("sx") * col("sx")
    val dy = nD * col("syy") - col("sy") * col("sy")
    agg.select(col("lag"), col("n_days"),
        when(dx > 0.0 && dy > 0.0,
          round(num / (sqrt(dx) * sqrt(dy)), 6)).as("r"))
      .orderBy(col("lag"))
  }

  /** C77: event-transition matrix — P(next event type | current) per
    * consecutive event pair within a user's stream (the full Markov
    * transition table behind C57's attribution and C21's fixed
    * funnels: which flows exist AT ALL, with probabilities). The
    * corpus scan is one user-partitioned `lead` (per-task state = one
    * user's events); the matrix is \|types\|² cells, counts exact,
    * each probability ONE divide.
    */
  def eventTransitionMatrix(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    // cells reused by totals + join — cut so the lead scan runs once
    val pairs = graft.operators.Materialize.cut(Tables.events(spark, dir)
      .select(col("user_id"), col("ts"), col("event_id"),
        col("event_type").as("cur"))
      .withColumn("nxt", lead(col("cur"), 1).over(w))
      .filter(col("nxt").isNotNull)
      .groupBy(col("cur"), col("nxt"))
      .agg(count(lit(1)).as("n")))
    val totals = pairs.groupBy(col("cur")).agg(sum(col("n")).as("tot"))
    pairs.join(broadcast(totals), Seq("cur"))
      .select(col("cur"), col("nxt"), col("n"),
        round(col("n").cast("double") / col("tot").cast("double"), 6)
          .as("p"))
      .orderBy(col("cur"), col("nxt"))
  }

  /** C76: Jaro-Winkler name linkage — near-identical part names found
    * by blocking on the 8-char name prefix (the standard ER recipe:
    * a cheap blocking key bounds the pair volume, the expensive
    * string metric runs only within blocks) and keeping pairs at
    * similarity ≥ 0.94. The kernel is the codegen
    * [[graft.functions.JaroWinkler]]; the flag and the rank both use
    * the 6-dp-rounded score so both engines cut identically.
    *
    * Scale: the prefix universe is FIXED by the name dictionary, so
    * raw blocks grow linearly with the corpus and within-block pairs
    * quadratically — pair formation therefore goes through
    * [[graft.operators.BlockedLinkage]], whose `maxBlock` dial caps
    * exhaustive comparison (blocks above it fall back to
    * sorted-neighborhood windowing), bounding total pair volume to
    * O(n·maxBlock) — linear. At the gate/bench scales every block is
    * under the default cap, so the result is bit-identical to the
    * uncapped blocked join the oracle expresses.
    */
  def jaroWinklerLinks(spark: SparkSession, dir: String): DataFrame =
    jaroWinklerLinks(spark, dir, maxBlock = 1000, window = 64)

  /** C76 with the block-size dial exposed (see above; probe/spec entry). */
  def jaroWinklerLinks(spark: SparkSession, dir: String,
                       maxBlock: Int, window: Int): DataFrame = {
    val p = Tables.part(spark, dir)
      .select(col("p_partkey").as("pk"), col("p_name").as("name"))
    graft.operators.BlockedLinkage.candidatePairs(
        p, "pk", "name", substring(col("name"), 1, 8),
        maxBlock = maxBlock, window = window)
      .select(col("id_a"), col("id_b"),
        col("val_a").as("name_a"), col("val_b").as("name_b"),
        round(graft.functions.JaroWinkler.jaro_winkler(
          col("val_a"), col("val_b")), 6).as("jw"))
      .filter(col("jw") >= 0.94)
      .orderBy(col("jw").desc, col("id_a"), col("id_b"))
      .limit(50)
  }

  /** C75: Kaplan–Meier time-to-first-error — per user, days from the
    * first event to the first `error` event (the failure); users who
    * never error are right-censored at their LAST activity day, not
    * counted as failures — the censoring-correct reliability curve a
    * naive "fraction errored by day t" gets wrong. See
    * [[graft.operators.Survival]].
    */
  def kaplanMeierRetention(spark: SparkSession, dir: String): DataFrame =
    graft.operators.Survival.kaplanMeier(kmSubjects(spark, dir),
        col("t"), col("cens"))
      .orderBy(col("t"))

  /** The one shared time-to-first-error subject frame behind
    * C75/C107/C108 — per user: days from first event to first `error`
    * (the failure), right-censored at last activity when error-free;
    * change the convention here, nowhere else.
    */
  private def kmSubjects(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy(col("user_id"))
      .agg(min(date_trunc("day", col("ts")).cast("date")).as("first_day"),
        max(date_trunc("day", col("ts")).cast("date")).as("last_day"),
        min(when(col("event_type") === "error",
          date_trunc("day", col("ts")).cast("date"))).as("err_day"))
      .select(col("user_id"),
        when(col("err_day").isNotNull,
            datediff(col("err_day"), col("first_day")))
          .otherwise(datediff(col("last_day"), col("first_day")))
          .cast("long").as("t"),
        col("err_day").isNull.as("cens"))

  /** C107: Nelson–Aalen cumulative hazard on the same time-to-first-
    * error frame as [[kaplanMeierRetention]] — accumulated risk where
    * KM gives survival (see
    * [[graft.operators.Survival.nelsonAalen]]).
    */
  def nelsonAalenHazard(spark: SparkSession, dir: String): DataFrame =
    graft.operators.Survival.nelsonAalen(kmSubjects(spark, dir),
        col("t"), col("cens"))
      .orderBy(col("t"))

  /** C108: two-sample log-rank test — do the user-parity arms share
    * the time-to-first-error curve? The censoring-correct arm
    * comparison (see [[graft.operators.Survival.logRank]]).
    */
  def logRankTest(spark: SparkSession, dir: String): DataFrame =
    graft.operators.Survival.logRank(kmSubjects(spark, dir),
      col("t"), col("cens"), col("user_id") % 2)

  /** C109: Mood's median test across the three user-mod-3 arms on
    * purchase cents — the maximally-robust location omnibus next to
    * C96/C97 (see [[graft.operators.AbStats.moodMedian]]).
    */
  def moodMedian(spark: SparkSession, dir: String): DataFrame =
    graft.operators.AbStats.moodMedian(
      purchaseCentsArm3(spark, dir), col("arm"), col("cents"), arms = 3)

  /** C82: Wald SPRT sequential monitor — the daily purchase-conversion
    * LLR curve against H0 p=0.18 vs H1 p=0.22 at α=β=0.05 (see
    * [[graft.operators.AbStats.sprtMonitor]]): the peeking-safe
    * always-valid decision curve the fixed-horizon C66 readout can't
    * give. One scan → calendar-bounded day frame → PrefixSum
    * cumulatives → codegen LLR.
    */
  def sprtMonitor(spark: SparkSession, dir: String): DataFrame =
    graft.operators.AbStats.sprtMonitor(
      Tables.events(spark, dir),
      date_trunc("day", col("ts")).cast("date"),
      col("event_type") === "purchase",
      p0 = 0.18, p1 = 0.22)

  /** C85: mSPRT always-valid monitor over the same daily conversion
    * stream — C82 with the point alternative replaced by an 8-point
    * quadrature mixture p ∈ {0.19 … 0.26}, publishing a p-value valid
    * at every interim look (see [[graft.operators.AbStats
    * .msprtMonitor]]). Same one-scan → day frame → PrefixSum shape.
    */
  def msprtMonitor(spark: SparkSession, dir: String): DataFrame =
    graft.operators.AbStats.msprtMonitor(
      Tables.events(spark, dir),
      date_trunc("day", col("ts")).cast("date"),
      col("event_type") === "purchase",
      p0 = 0.18, grid = MsprtGrid, alpha = 0.05)

  /** The published quadrature convention for C85 — part of the test's
    * identity exactly like a histogram's bin edges.
    */
  val MsprtGrid: Seq[Double] = (1 to 8).map(i => 0.18 + 0.01 * i)

  /** C74: sample-ratio-mismatch guardrail — the user_id-parity
    * assignment checked against its designed 50/50 split before any
    * metric test is trusted. See [[graft.operators.AbStats]].
    */
  def srmCheck(spark: SparkSession, dir: String): DataFrame =
    graft.operators.AbStats.sampleRatioCheck(
      Tables.events(spark, dir), col("user_id") % 2)

  /** C66: Welch t-test on purchase value between the deterministic
    * user_id-parity arms — the experiment readout layer. One scan,
    * one row, exact sufficient aggregates (see AbStats).
    */
  def welchTTest(spark: SparkSession, dir: String): DataFrame =
    graft.operators.AbStats.welchTTest(
      Tables.events(spark, dir).filter(col("event_type") === "purchase"),
      col("user_id") % 2, col("value"))

  /** C67: chi-square independence of event mix vs assignment arm —
    * the sample-ratio-mismatch / behavior-shift guardrail every
    * experiment platform runs next to the metric test.
    */
  def chiSquareMix(spark: SparkSession, dir: String): DataFrame =
    graft.operators.AbStats.chiSquareIndependence(
      Tables.events(spark, dir), col("event_type"), col("user_id") % 2)

  /** C94: distribution-free median CI on purchase value (exact
    * cents) — the order-statistics error bar for the robust location
    * metric (see [[graft.operators.AbStats.medianCi]]). All-integer
    * output, one value-domain shuffle.
    */
  def medianCi(spark: SparkSession, dir: String): DataFrame =
    graft.operators.AbStats.medianCi(
      Tables.events(spark, dir).filter(col("event_type") === "purchase")
        .select((graft.functions.Num.dec2(col("value")) * 100)
          .cast("long").as("cents")),
      col("cents"))

  /** C95: Wald–Wolfowitz runs test on the daily purchase series'
    * up/down moves — the randomness check next to C84's trend test
    * (see [[graft.operators.AbStats.runsTest]]).
    */
  def runsTest(spark: SparkSession, dir: String): DataFrame =
    graft.operators.AbStats.runsTest(dailyPurchaseCents(spark, dir),
      col("day"), col("cents"))

  /** C93: purchase-conversion rates per user-parity arm with Wilson
    * 95% score intervals — the honest dashboard error bar (see
    * [[graft.operators.AbStats.rateWilsonCi]]).
    */
  def rateWilson(spark: SparkSession, dir: String): DataFrame =
    graft.operators.AbStats.rateWilsonCi(
      Tables.events(spark, dir),
      col("user_id") % 2, col("event_type") === "purchase")

  /** The shared 3-arm purchase frame behind C96/C97/C99: purchase
    * value in exact cents, arm = user_id mod 3 — change the
    * convention here, nowhere else.
    */
  private def purchaseCentsArm3(spark: SparkSession,
                                dir: String): DataFrame =
    Tables.events(spark, dir).filter(col("event_type") === "purchase")
      .select((col("user_id") % 3).cast("int").as("arm"),
        (graft.functions.Num.dec2(col("value")) * 100).cast("long")
          .as("cents"))

  /** C96: Kruskal–Wallis H across the three user-mod-3 arms on
    * purchase cents — the k-arm omnibus rank test (see
    * [[graft.operators.AbStats.kruskalWallis]]).
    */
  def kruskalWallis(spark: SparkSession, dir: String): DataFrame =
    graft.operators.AbStats.kruskalWallis(
      purchaseCentsArm3(spark, dir), col("arm"), col("cents"), arms = 3)

  /** C97: one-way ANOVA F across the three user-mod-3 arms on
    * purchase cents — the mean-level omnibus (see
    * [[graft.operators.AbStats.anovaF]]).
    */
  def anovaF(spark: SparkSession, dir: String): DataFrame =
    graft.operators.AbStats.anovaF(
      purchaseCentsArm3(spark, dir), col("arm"), col("cents"), arms = 3)

  /** C99: Brown–Forsythe spread-homogeneity test across the three
    * user-mod-3 arms on purchase cents (see
    * [[graft.operators.AbStats.brownForsythe]]).
    */
  def leveneVar(spark: SparkSession, dir: String): DataFrame =
    graft.operators.AbStats.brownForsythe(
      purchaseCentsArm3(spark, dir), col("arm"), col("cents"), arms = 3)

  /** C92: Yuen's 10%-trimmed-mean t-test on purchase value (in exact
    * cents) between the user-parity arms — the robust readout where
    * C66's Welch test chases whales. See
    * [[graft.operators.AbStats.yuenTrimmed]].
    */
  def yuenTrimmed(spark: SparkSession, dir: String): DataFrame =
    graft.operators.AbStats.yuenTrimmed(
      Tables.events(spark, dir).filter(col("event_type") === "purchase")
        .select(col("user_id"),
          (graft.functions.Num.dec2(col("value")) * 100).cast("long")
            .as("cents")),
      col("user_id") % 2, col("cents"), trimDen = 10)

  /** C68: Mann-Whitney rank-sum on purchase value between the arms —
    * the distribution-free twin of C66, ranks off the distributed
    * prefix sum.
    */
  def mannWhitney(spark: SparkSession, dir: String): DataFrame =
    graft.operators.AbStats.mannWhitneyU(
      Tables.events(spark, dir).filter(col("event_type") === "purchase"),
      col("user_id") % 2, col("value"))

  /** C69: CUPED-adjusted treatment effect on per-user purchase value,
    * pre-period = the first half of the event window (fixed calendar
    * cut 2024-01-16, data-independent).
    */
  def cupedEffect(spark: SparkSession, dir: String): DataFrame =
    graft.operators.AbStats.cupedEffect(
      Tables.events(spark, dir).filter(col("event_type") === "purchase"),
      col("user_id"), col("value"),
      col("ts") < to_timestamp(lit("2024-01-16 00:00:00")))

  /** C86: group-sequential O'Brien–Fleming monitor — K=5 equally
    * spaced calendar looks at the purchase-conversion difference
    * between the user-parity arms, bounds z_k = 2.04·sqrt(5/k) (the
    * published OBF critical constant for K=5, two-sided α=0.05,
    * embedded as a plan/oracle literal like C85's quadrature grid).
    * See [[graft.operators.AbStats.obfMonitor]].
    */
  def obfMonitor(spark: SparkSession, dir: String): DataFrame =
    graft.operators.AbStats.obfMonitor(
      Tables.events(spark, dir),
      date_trunc("day", col("ts")).cast("date"),
      col("user_id") % 2,
      col("event_type") === "purchase",
      looks = 5, critical = 2.04)

  /** C121: Lan–DeMets alpha-spending monitor on the same conversion
    * contrast as C86, but at the deliberately UNEQUAL look fractions
    * (15, 40, 65, 85, 100)% of the calendar — the arbitrary-schedule
    * case the fixed k/K OBF bound can't express — with OBF-type
    * spending, two-sided α = 0.05. Boundaries from
    * [[graft.operators.AlphaSpending]]'s design-time recursion
    * (AbStatsSpec pins the equal-fraction case against the published
    * Lan–DeMets K=5 table). See
    * [[graft.operators.AbStats.alphaSpendingMonitor]].
    */
  def alphaSpendingMonitor(spark: SparkSession, dir: String): DataFrame =
    graft.operators.AbStats.alphaSpendingMonitor(
      Tables.events(spark, dir),
      date_trunc("day", col("ts")).cast("date"),
      col("user_id") % 2,
      col("event_type") === "purchase",
      fracPct = Seq(15, 40, 65, 85, 100), alpha = 0.05)

  /** C121b: the same monitor under Hwang–Shih–DeCani γ = −4 spending
    * (the one-dial family sweeping OBF-conservative → Pocock-
    * aggressive) at quarterly looks — pins that the recursion, not a
    * hardcoded table, drives the boundaries. See
    * [[graft.operators.AlphaSpending.hsdSpend]].
    */
  def alphaSpendingHsd(spark: SparkSession, dir: String): DataFrame =
    graft.operators.AbStats.alphaSpendingMonitor(
      Tables.events(spark, dir),
      date_trunc("day", col("ts")).cast("date"),
      col("user_id") % 2,
      col("event_type") === "purchase",
      fracPct = Seq(25, 50, 75, 100), alpha = 0.05,
      spend = graft.operators.AlphaSpending.hsdSpend(0.05, -4.0) _)

  /** C122: non-binding futility monitor — the C121 contrast run as a
    * ONE-SIDED design (H1: the odd arm converts better) with efficacy
    * bounds from one-sided OBF-type alpha-spending (α = 0.025) and
    * futility bounds from Hwang–Shih–DeCani γ = −2 beta-spending
    * (β = 0.1) under the power-calibrated drift, quarterly looks.
    * See [[graft.operators.AbStats.betaSpendingMonitor]] and
    * [[graft.operators.AlphaSpending.futilityBounds]].
    */
  def betaSpendingMonitor(spark: SparkSession, dir: String): DataFrame =
    graft.operators.AbStats.betaSpendingMonitor(
      Tables.events(spark, dir),
      date_trunc("day", col("ts")).cast("date"),
      col("user_id") % 2,
      col("event_type") === "purchase",
      fracPct = Seq(25, 50, 75, 100), alpha = 0.025, beta = 0.1,
      designKey = BetaSpendingDesignKey)

  /** The C122 design constants (shared with the oracle renderer — the
    * memo key must be identical so both read the same cached design).
    */
  private[graft] val BetaSpendingDesignKey = "obf1s+hsd-2:25,50,75,100:0.025:0.1"

  private[graft] def betaSpendingDesign
      : graft.operators.AlphaSpending.FutilityDesign =
    graft.operators.AlphaSpending.futilityBoundsCached(
      BetaSpendingDesignKey, Seq(25, 50, 75, 100), 0.025, 0.1,
      graft.operators.AlphaSpending.obfSpendOneSided(0.025) _,
      graft.operators.AlphaSpending.hsdSpend(0.1, -2.0) _)

  /** C123: the C121 monitor with the spending clock on OBSERVED
    * information — looks at (20, 50, 80, 100)% of the calendar, but
    * α*(·) evaluated at t_k = N_k/N_K from the day census (accrual is
    * not uniform, so these differ from the calendar fractions — the
    * info_frac column shows by how much). OBF-type spending,
    * two-sided α = 0.05. See
    * [[graft.operators.AbStats.alphaSpendingInfoMonitor]].
    */
  def alphaSpendingInfo(spark: SparkSession, dir: String): DataFrame =
    graft.operators.AbStats.alphaSpendingInfoMonitor(
      Tables.events(spark, dir),
      date_trunc("day", col("ts")).cast("date"),
      col("user_id") % 2,
      col("event_type") === "purchase",
      fracPct = Seq(20, 50, 80, 100), alpha = 0.05)

  /** C87: delta-method z-test on the RATIO metric revenue-per-event
    * between the user-parity arms — the per-user (x=events, y=purchase
    * revenue) frame is the randomization-unit aggregate, so correlated
    * events within a user don't fake precision (see
    * [[graft.operators.AbStats.ratioDelta]]). One corpus scan → one
    * per-user partial-agg'd shuffle → one sufficient-statistics row.
    */
  def ratioDelta(spark: SparkSession, dir: String): DataFrame = {
    val perUser = Tables.events(spark, dir)
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("x"),
        sum(when(col("event_type") === "purchase",
          graft.functions.Num.dec2(col("value")))
          .otherwise(graft.functions.Num.dec2(lit(0)))).as("y"))
    graft.operators.AbStats.ratioDelta(
      perUser, col("user_id") % 2, col("x"), col("y"))
  }

  /** C98: Kendall's tau-b between the daily signup count and the daily
    * purchase-cents series (the same two series C78 cross-correlates —
    * tau is the robust effect size next to its Pearson r). See
    * [[graft.operators.Changepoint.kendallTau]].
    */
  def kendallTau(spark: SparkSession, dir: String): DataFrame = {
    val daily = Tables.events(spark, dir)
      .groupBy(date_trunc("day", col("ts")).cast("date").as("day"))
      .agg(sum(when(col("event_type") === "signup", 1L).otherwise(0L))
             .as("x"),
           coalesce(sum(when(col("event_type") === "purchase",
             graft.functions.Num.dec2(col("value")) * 100)), lit(0))
             .cast("long").as("y"))
    graft.operators.Changepoint.kendallTau(daily, col("day"),
      col("x"), col("y"))
  }

  /** C88: autocorrelation function of the daily total purchase value
    * at lags 1..10 — the serial-dependence diagnostic behind C61/C65's
    * model choice (a weekly corpus should spike at lag 7). The corpus
    * collapses to the calendar-day series (value in exact cents) in
    * one scan; see [[graft.operators.Changepoint.acf]].
    */
  def valueAcf(spark: SparkSession, dir: String): DataFrame =
    graft.operators.Changepoint.acf(dailyPurchaseCents(spark, dir),
      col("day"), col("cents"), maxLag = 10)

  /** C88b: PACF of the same daily purchase series at lags 1..7 — the
    * model-identification companion to [[valueAcf]] (see
    * [[graft.operators.Changepoint.pacf]]). Lag budget 7 < the
    * calendar month, so every acf input is defined.
    */
  def valuePacf(spark: SparkSession, dir: String): DataFrame =
    graft.operators.Changepoint.pacf(dailyPurchaseCents(spark, dir),
      col("day"), col("cents"), maxLag = 7)

  /** The one shared day-series collapse behind C88/C90/C91 (and the
    * E27 stream twin's read face): daily total purchase value in
    * exact cents — change the convention here, nowhere else.
    */
  private def dailyPurchaseCents(spark: SparkSession,
                                 dir: String): DataFrame =
    Tables.events(spark, dir)
      .filter(col("event_type") === "purchase")
      .groupBy(date_trunc("day", col("ts")).cast("date").as("day"))
      .agg((sum(graft.functions.Num.dec2(col("value"))) * 100)
        .cast("decimal(38,0)").as("cents"))

  /** C90: classical additive seasonal decomposition of the daily
    * total purchase value at period 7 — trend / weekly-seasonal /
    * residual, the inspectable view behind C61/C65's forecasts (see
    * [[graft.operators.Changepoint.seasonalDecompose]]). Same one-scan
    * day-series collapse as [[valueAcf]].
    */
  def seasonalDecompose(spark: SparkSession, dir: String): DataFrame =
    graft.operators.Changepoint.seasonalDecompose(
      dailyPurchaseCents(spark, dir), col("day"), col("cents"), period = 7)

  /** C91: Sen's slope + intercept of the daily total purchase value —
    * the magnitude companion to [[mannKendallTrend]] (see
    * [[graft.operators.Changepoint.senSlope]]). Same one-scan day
    * collapse as [[valueAcf]]; slope in cents/day.
    */
  def senSlope(spark: SparkSession, dir: String): DataFrame =
    graft.operators.Changepoint.senSlope(dailyPurchaseCents(spark, dir),
      col("day"), col("cents"))

  /** C100: McNemar's paired-conversion test — did the SAME users'
    * purchase behavior change between the first and second half of
    * the month? (see [[graft.operators.AbStats.mcnemar]]). One
    * user-keyed partial-agg'd shuffle builds the pair frame.
    */
  def mcnemarConversion(spark: SparkSession, dir: String): DataFrame = {
    val perUser = Tables.events(spark, dir)
      .groupBy(col("user_id"))
      .agg(
        (sum(when(col("event_type") === "purchase" &&
          dayofmonth(col("ts")) <= 15, 1L).otherwise(0L)) > 0L)
          .as("before"),
        (sum(when(col("event_type") === "purchase" &&
          dayofmonth(col("ts")) >= 16, 1L).otherwise(0L)) > 0L)
          .as("after"))
    graft.operators.AbStats.mcnemar(perUser, col("before"), col("after"))
  }

  /** C101: Cochran's Q across the three day-of-month tertiles — does
    * purchase incidence differ across the month's thirds for the same
    * user population? (see [[graft.operators.AbStats.cochranQ]]).
    */
  def cochranQPeriods(spark: SparkSession, dir: String): DataFrame = {
    def flag(lo: Int, hi: Int): Column =
      (sum(when(col("event_type") === "purchase" &&
        dayofmonth(col("ts")).between(lo, hi), 1L).otherwise(0L)) > 0L)
    val perUser = Tables.events(spark, dir)
      .groupBy(col("user_id"))
      .agg(flag(1, 10).as("p0"), flag(11, 20).as("p1"),
        flag(21, 31).as("p2"))
    graft.operators.AbStats.cochranQ(perUser,
      Seq(col("p0"), col("p1"), col("p2")))
  }

  /** C102: Friedman's rank test across the same tertiles on per-user
    * spend LEVEL (exact cents, 0 when silent) — the magnitude
    * companion to [[cochranQPeriods]]'s incidence test (see
    * [[graft.operators.AbStats.friedman]]).
    */
  def friedmanSpend(spark: SparkSession, dir: String): DataFrame =
    graft.operators.AbStats.friedman(userTertileSpend(spark, dir),
      Seq(col("v0"), col("v1"), col("v2")))

  /** The shared per-user tertile-spend frame behind C102/C110 —
    * exact cents per month third, 0 when silent.
    */
  private def userTertileSpend(spark: SparkSession,
                               dir: String): DataFrame = {
    def cents(lo: Int, hi: Int): Column =
      coalesce(sum(when(col("event_type") === "purchase" &&
        dayofmonth(col("ts")).between(lo, hi),
        dec2(col("value")) * 100)), lit(0)).cast("long")
    Tables.events(spark, dir)
      .groupBy(col("user_id"))
      .agg(cents(1, 10).as("v0"), cents(11, 20).as("v1"),
        cents(21, 31).as("v2"))
  }

  /** The shared per-user half-month spend DIFFERENCE behind C116/C117:
    * cents(days 16-31) − cents(days 1-15) — positive means the user's
    * spend grew in the second half.
    */
  private def halfMonthSpendDiff(spark: SparkSession,
                                 dir: String): DataFrame = {
    def cents(lo: Int, hi: Int): Column =
      coalesce(sum(when(col("event_type") === "purchase" &&
        dayofmonth(col("ts")).between(lo, hi),
        dec2(col("value")) * 100)), lit(0)).cast("long")
    Tables.events(spark, dir)
      .groupBy(col("user_id"))
      .agg((cents(16, 31) - cents(1, 15)).as("d"))
  }

  /** C116: Wilcoxon signed-rank on the per-user half-month spend
    * shift — the paired magnitude test (see
    * [[graft.operators.AbStats.wilcoxonSignedRank]]).
    */
  def wilcoxonSignedRank(spark: SparkSession, dir: String): DataFrame =
    graft.operators.AbStats.wilcoxonSignedRank(
      halfMonthSpendDiff(spark, dir), col("d"))

  /** C117: the sign test on the same paired differences — the
    * direction-only floor under C116 (see
    * [[graft.operators.AbStats.signTest]]).
    */
  def signTest(spark: SparkSession, dir: String): DataFrame =
    graft.operators.AbStats.signTest(
      halfMonthSpendDiff(spark, dir), col("d"))

  /** C115: CMH stratified association — is the parity arm associated
    * with purchasing CONTROLLING for the month's tertile? The
    * Simpson's-paradox-proof readout (see
    * [[graft.operators.AbStats.cmhTest]]).
    */
  def cmhTest(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(spark, dir).select(
      when(dayofmonth(col("ts")) <= 10, 0)
        .when(dayofmonth(col("ts")) <= 20, 1).otherwise(2).as("st"),
      (col("user_id") % 2).cast("int").as("arm"),
      (col("event_type") === "purchase").as("s"))
    graft.operators.AbStats.cmhTest(e, col("st"), col("arm"), col("s"),
      strata = 3)
  }

  /** C114: k-sample Anderson–Darling across the three user-mod-3 arms
    * on purchase cents — the tail-weighted distribution omnibus next
    * to C96's rank test (see
    * [[graft.operators.AbStats.andersonDarlingK]]).
    */
  def andersonDarling(spark: SparkSession, dir: String): DataFrame =
    graft.operators.AbStats.andersonDarlingK(
      purchaseCentsArm3(spark, dir), col("arm"), col("cents"), arms = 3)

  /** C120: post-stratified mean of per-user total spend — population
    * = every user, responders = users with ≥1 purchase, strata =
    * user mod 3 (the arm convention); removes the nonresponse tilt a
    * raw responder mean carries (see
    * [[graft.operators.AbStats.postStratifiedMean]]).
    */
  def postStratifiedSpend(spark: SparkSession, dir: String): DataFrame = {
    val perUser = Tables.events(spark, dir)
      .groupBy(col("user_id"))
      .agg(coalesce(sum(when(col("event_type") === "purchase",
        dec2(col("value")) * 100)), lit(0)).cast("long").as("spend"))
      .select((col("user_id") % 3).cast("int").as("st"),
        (col("spend") > 0L).as("resp"), col("spend"))
    graft.operators.AbStats.postStratifiedMean(perUser, col("st"),
      col("resp"), col("spend"), strata = 3)
  }

  /** C118: turning-point randomness check on the daily purchase
    * series — the local-shape companion to the C95 runs test (see
    * [[graft.operators.Changepoint.turningPointTest]]). Same one-scan
    * day collapse as [[valueAcf]].
    */
  def turningPointTest(spark: SparkSession, dir: String): DataFrame =
    graft.operators.Changepoint.turningPointTest(
      dailyPurchaseCents(spark, dir), col("day"), col("cents"))

  /** C119: Theil's U₂ for the C61 Holt forecast on the daily purchase
    * series (α = β = 0.3, the C61 face's dials) — does the smoothing
    * beat naive carry-forward? (see
    * [[graft.operators.Changepoint.theilU]]).
    */
  def theilUForecast(spark: SparkSession, dir: String): DataFrame =
    graft.operators.Changepoint.theilU(dailyPurchaseCents(spark, dir),
      col("day"), col("cents"), alpha = 0.3, beta = 0.3)

  /** C113: seasonal Mann–Kendall on the daily purchase series with
    * epoch-day-mod-7 weekday seasons (the C90 engine-neutral weekday
    * convention) — the trend test the weekly cycle can't fool (see
    * [[graft.operators.Changepoint.seasonalMannKendall]]). Same
    * one-scan day collapse as [[valueAcf]].
    */
  def seasonalMannKendall(spark: SparkSession, dir: String): DataFrame = {
    val d = dailyPurchaseCents(spark, dir)
    graft.operators.Changepoint.seasonalMannKendall(d, col("day"),
      col("cents"), datediff(col("day"), lit("1970-01-01")) % 7)
  }

  /** C112: Cochran–Armitage trend — does the purchase RATE (purchases
    * per event) trend across the month's ordered tertiles? (see
    * [[graft.operators.AbStats.cochranArmitage]]). Events are the
    * trials; the tertile index is the ordered score.
    */
  def cochranArmitageTrend(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(spark, dir).select(
      when(dayofmonth(col("ts")) <= 10, 0)
        .when(dayofmonth(col("ts")) <= 20, 1).otherwise(2).as("g"),
      (col("event_type") === "purchase").as("s"))
    graft.operators.AbStats.cochranArmitage(e, col("g"), col("s"), k = 3)
  }

  /** C110: Page's ordered trend test on the same tertile frame —
    * "does per-user spend INCREASE across the month's thirds" (see
    * [[graft.operators.AbStats.pageTrend]]).
    */
  def pageTrendSpend(spark: SparkSession, dir: String): DataFrame =
    graft.operators.AbStats.pageTrend(userTertileSpend(spark, dir),
      Seq(col("v0"), col("v1"), col("v2")))

  /** C111: power / minimum-detectable-effect report for the parity
    * arms on purchase cents — the "could this test even see a lift"
    * row (see [[graft.operators.AbStats.powerMde]]).
    */
  def powerMde(spark: SparkSession, dir: String): DataFrame = {
    val p = Tables.events(spark, dir)
      .filter(col("event_type") === "purchase")
      .select((col("user_id") % 2).cast("int").as("arm"),
        (dec2(col("value")) * 100).cast("long").as("cents"))
    graft.operators.AbStats.powerMde(p, col("arm"), col("cents"))
  }

  /** C106: Granger causality at lag 1 — do yesterday's SIGNUPS help
    * predict today's purchase cents beyond yesterday's cents? The
    * directional readout next to C78's symmetric lead-lag (see
    * [[graft.operators.Changepoint.grangerLag1]]). Same one-scan day
    * collapse as [[kendallTau]].
    */
  def grangerCausality(spark: SparkSession, dir: String): DataFrame = {
    val daily = Tables.events(spark, dir)
      .groupBy(date_trunc("day", col("ts")).cast("date").as("day"))
      .agg(coalesce(sum(when(col("event_type") === "purchase",
          dec2(col("value")) * 100)), lit(0)).cast("long").as("cents"),
        sum(when(col("event_type") === "signup", 1L).otherwise(0L))
          .as("signups"))
    graft.operators.Changepoint.grangerLag1(daily, col("day"),
      col("cents"), col("signups"))
  }

  /** C104: Ljung–Box white-noise test over the first 10
    * autocorrelations of the daily purchase series — the formal
    * companion to [[valueAcf]] (see
    * [[graft.operators.Changepoint.ljungBox]]). Same one-scan day
    * collapse.
    */
  def ljungBox(spark: SparkSession, dir: String): DataFrame =
    graft.operators.Changepoint.ljungBox(dailyPurchaseCents(spark, dir),
      col("day"), col("cents"), maxLag = 10)

  /** C105: Hurst exponent of the HOURLY purchase series (744 points
    * at the one-month calendar — enough mass for the {8,16,32,64}
    * dyadic R/S ladder; see [[graft.operators.Changepoint.hurst]]).
    * One scan collapses the corpus to the hour series.
    */
  def hurstExponent(spark: SparkSession, dir: String): DataFrame = {
    val hourly = Tables.events(spark, dir)
      .filter(col("event_type") === "purchase")
      .groupBy(date_trunc("hour", col("ts")).as("hour"))
      .agg((sum(dec2(col("value"))) * 100)
        .cast("decimal(38,0)").as("cents"))
    graft.operators.Changepoint.hurst(hourly, col("hour"), col("cents"))
  }

  /** D120: Fellegi–Sunter linkage scores over nation-blocked customer
    * pairs — segment / balance-band / balance-sign agreement with
    * frequency-based u-probabilities and declared m priors (see
    * [[graft.operators.FellegiSunter]]). The nation block is the
    * scale dial (the C76 recipe).
    */
  def fellegiSunterLinkage(spark: SparkSession, dir: String): DataFrame = {
    val cents = (dec2(col("c_acctbal")) * 100).cast("long")
    FellegiSunter.score(
      Tables.customer(spark, dir), "c_custkey", col("c_nationkey"),
      Seq(
        ("seg", col("c_mktsegment"), 0.95),
        ("band", floor(cents.cast("double") / lit(100000.0)).cast("long"),
          0.90),
        ("sign", cents >= 0L, 0.98)),
      k = 50)
  }

  /** D131's shared pair-flag frame: the same entities, blocking and
    * comparison fields as D120 (`fellegiSunterLinkage`) — nationkey
    * blocks; segment / acctbal-band / balance-sign agreement flags.
    */
  private def fsPairFlags(spark: SparkSession, dir: String): DataFrame = {
    val cents = (dec2(col("c_acctbal")) * 100).cast("long")
    val ent = Tables.customer(spark, dir).select(
      col("c_custkey").cast("long").as("id"),
      col("c_nationkey").as("blk"),
      col("c_mktsegment").as("seg"),
      floor(cents.cast("double") / lit(100000.0)).cast("long").as("band"),
      (cents >= 0L).as("sign"))
    def side(s: String) = ent.select(
      col("id").as(s"id_$s"), col("blk").as(s"blk_$s"),
      col("seg").as(s"seg_$s"), col("band").as(s"band_$s"),
      col("sign").as(s"sign_$s"))
    side("a").join(side("b"),
        col("blk_a") === col("blk_b") && col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        (col("seg_a") <=> col("seg_b")).as("agree_seg"),
        (col("band_a") <=> col("band_b")).as("agree_band"),
        (col("sign_a") <=> col("sign_b")).as("agree_sign"))
  }

  /** D131's EM fit for this corpus — session-memoized so the query
    * dump and the dynamic oracle render embed IDENTICAL literals.
    * The census collect is ≤ 2^3 rows (an aggregate, never the pair
    * frame), sorted canonically so the driver-side fold is bit-stable.
    */
  private[graft] def fsEmParams(spark: SparkSession, dir: String)
      : graft.operators.FellegiSunter.EmParams =
    graft.operators.FellegiSunter.emCached(s"fsem:$dir") {
      graft.operators.FellegiSunter.emEstimate(fsEmCensus(spark, dir))
    }

  /** The canonical-order pattern census D131 fits (spec replays it). */
  private[graft] def fsEmCensus(spark: SparkSession, dir: String)
      : Seq[(Seq[Boolean], Long)] =
    fsPairFlags(spark, dir)
      .groupBy(col("agree_seg"), col("agree_band"), col("agree_sign"))
      .agg(count(lit(1)).as("n")).collect()
      .map(r => (Seq(r.getBoolean(0), r.getBoolean(1), r.getBoolean(2)),
        r.getLong(3)))
      .sortBy(_._1.map(b => if (b) "1" else "0").mkString)
      .toSeq

  private[graft] def fsEmCensusForTest(spark: SparkSession, dir: String)
      : Seq[(Seq[Boolean], Long)] = fsEmCensus(spark, dir)

  private[graft] def fsEmParamsForTest(spark: SparkSession, dir: String)
      : graft.operators.FellegiSunter.EmParams = fsEmParams(spark, dir)

  /** D131: FS linkage with EM-ESTIMATED parameters (Jaro 1989;
    * Winkler 1988) — the no-training-data completion of D120: instead
    * of declared m priors and data-collision u, BOTH are fit by the
    * two-class conditional-independence EM over the agreement-pattern
    * census (see [[graft.operators.FellegiSunter.emEstimate]]), then
    * every pair is scored with the fitted ln(m/u) / ln((1−m)/(1−u))
    * ledger — weights embedded as plan/oracle literals exactly like
    * the C121 design recursion. Pairs, blocking and fields are D120's,
    * so the two keys differ ONLY in where the parameters come from.
    *
    * Scale shape: one pattern-census aggregate (≤ 8 rows collected),
    * a driver-side 30-iteration EM over them, and the same blocked
    * pair scoring as D120 (one shuffle join; weights are literals, no
    * broadcast needed at all).
    */
  def fsEmLinkage(spark: SparkSession, dir: String): DataFrame = {
    val prm = fsEmParams(spark, dir)
    def wa(j: Int): Column = log(lit(prm.m(j)) / lit(prm.u(j)))
    def wd(j: Int): Column =
      log((lit(1.0) - lit(prm.m(j))) / (lit(1.0) - lit(prm.u(j))))
    def term(flag: String, j: Int): Column =
      when(col(flag), wa(j)).otherwise(wd(j))
    fsPairFlags(spark, dir)
      .select(col("id_a"), col("id_b"),
        col("agree_seg"), col("agree_band"), col("agree_sign"),
        round(term("agree_seg", 0) + term("agree_band", 1) +
          term("agree_sign", 2), 6).as("score"))
      .orderBy(col("score").desc, col("id_a"), col("id_b"))
      .limit(50)
  }

  /** C89: degree assortativity of the parts-bought-together graph
    * (same edge build as [[triangleCount]]) — do high-degree parts
    * co-occur with other hubs, or with long-tail parts? See
    * [[graft.operators.Centrality.degreeAssortativity]].
    */
  def degreeAssortativity(spark: SparkSession, dir: String): DataFrame = {
    val lp = Tables.lineitem(spark, dir)
      .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"))
      .distinct()
    val e = lp.as("a").join(lp.as("b"),
        col("a.ok") === col("b.ok") && col("a.pk") < col("b.pk"))
      .select(col("a.pk").as("u"), col("b.pk").as("v"))
    graft.operators.Centrality.degreeAssortativity(e)
  }

  /** D130: Fellegi–Sunter ∘ Jaro–Winkler — the classical record-
    * linkage composition (Winkler 1988/1990): D120 scores agreement
    * PATTERNS, C76 scores NAME similarity; production linkage
    * thresholds FS weights whose string-field term is driven by the
    * JW comparator instead of binary equality. Per pair, the name
    * term is banded on the 6-dp-rounded JW value γ:
    *   γ ≥ 0.94           → full agreement weight w_a = ln(m/u)
    *   0.7 ≤ γ < 0.94     → Winkler's linear comparator interpolation
    *                        max(w_d, w_a − (w_a−w_d)·(1−γ)·4.5)
    *   γ < 0.7            → disagreement weight w_d = ln((1−m)/(1−u))
    * (0.7 is JW's own boost threshold; 4.5 is the published
    * interpolation slope — at γ = 0.7¯ the term has fallen past w_d
    * and clips there, so the bands meet continuously). `brand` and
    * `p_type` contribute classical binary FS terms. u-probabilities
    * are data-estimated collision probabilities Σ(n_v/N)² per field
    * (Winkler's frequency-based u), exact integers until one IEEE
    * divide shared by every pair.
    *
    * Scale shape: pair formation reuses [[graft.operators
    * .BlockedLinkage]] (8-char-prefix blocks, `maxBlock` cap → SNM
    * fallback — O(n·maxBlock) pairs, linear); u-stats are three
    * value-domain-sized aggregates broadcast back as ONE row; the
    * attribute join back to the pair frame is two hash joins on the
    * record id. At gate SF every block is under the cap, so the
    * oracle expresses the same pairs as a plain blocked self-join.
    */
  def fsJwLinkage(spark: SparkSession, dir: String): DataFrame = {
    val p = Tables.part(spark, dir).select(
      col("p_partkey").as("pk"), col("p_name").as("name"),
      col("p_brand").as("brand"), col("p_type").as("ptype"))
    val n = p.agg(count(lit(1)).cast("long").as("__n"))
    def ss(f: String) =
      p.groupBy(col(f)).agg(count(lit(1)).as("__c"))
        .agg(sum(col("__c") * col("__c")).cast("long").as(s"__ss_$f"))
    val stats = n.crossJoin(ss("name")).crossJoin(ss("brand"))
      .crossJoin(ss("ptype"))
    // brand/ptype ride THROUGH pair formation (the attrs dial) — the
    // old per-attribute joins back onto the pair frame shuffled
    // O(pairs) rows twice (≈3.1M pairs at sf0.1) to attach O(n) values
    val pairs = graft.operators.BlockedLinkage.candidatePairs(
        p, "pk", "name", substring(col("name"), 1, 8),
        maxBlock = 1000, window = 64, attrs = Seq("brand", "ptype"))
      .withColumn("jw", round(graft.functions.JaroWinkler.jaro_winkler(
        col("val_a"), col("val_b")), 6))
      .crossJoin(broadcast(stats))
    val nD = col("__n").cast("double")
    def u(f: String): Column = col(s"__ss_$f").cast("double") / (nD * nD)
    def wa(m: Double, f: String): Column = log(lit(m) / u(f))
    def wd(m: Double, f: String): Column =
      log((lit(1.0) - lit(m)) / (lit(1.0) - u(f)))
    val nameTerm = when(col("jw") >= 0.94, wa(0.95, "name"))
      .when(col("jw") >= 0.7,
        greatest(wd(0.95, "name"),
          wa(0.95, "name") - (wa(0.95, "name") - wd(0.95, "name")) *
            (lit(1.0) - col("jw")) * lit(4.5)))
      .otherwise(wd(0.95, "name"))
    val brandTerm =
      when(col("brand_a") <=> col("brand_b"), wa(0.9, "brand"))
        .otherwise(wd(0.9, "brand"))
    val typeTerm =
      when(col("ptype_a") <=> col("ptype_b"), wa(0.85, "ptype"))
        .otherwise(wd(0.85, "ptype"))
    pairs.select(col("id_a"), col("id_b"), col("jw"),
        (col("brand_a") <=> col("brand_b")).as("agree_brand"),
        (col("ptype_a") <=> col("ptype_b")).as("agree_type"),
        round(nameTerm + brandTerm + typeTerm, 6).as("score"))
      .orderBy(col("score").desc, col("id_a"), col("id_b"))
      .limit(50)
  }
}
