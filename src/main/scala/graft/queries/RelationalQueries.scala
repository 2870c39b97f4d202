package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.Num._
import graft.sources.Tables

/** Warehouse-scale relational core (SURVEY §2.C).
  *
  * The reference's analytics are all groupBy/join/top-N over a star
  * schema (fpl-data-pipeline sql_queries.py:111-256); these queries keep
  * the same operator shapes at TPC-H scale so the plans that matter at
  * 100 TB — partial aggregation, broadcast dim joins, single-shuffle
  * windows — are exercised and benchmarked.
  *
  * Scale notes per query are inline. All outputs are deterministically
  * ordered with unique tiebreaks and use decimal-exact aggregation (see
  * [[graft.functions.Num]]) so results are partitioning-independent.
  */
object RelationalQueries {

  /** C1: multi-measure pricing summary. One shuffle (partial agg on 32
    * map tasks → 4 groups); scan prunes to the 7 referenced columns.
    */
  def q1PricingSummary(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
    val one = lit(1).cast("decimal(18,2)")
    li.groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        dsum(col("l_quantity")).as("sum_qty"),
        dsum(col("l_extendedprice")).as("sum_base_price"),
        sum(dec2(col("l_extendedprice")) * (one - dec2(col("l_discount"))))
          .cast("double").as("sum_disc_price"),
        sum(dec2(col("l_extendedprice")) * (one - dec2(col("l_discount")))
          * (one + dec2(col("l_tax")))).cast("double").as("sum_charge"),
        davg(col("l_quantity")).as("avg_qty"),
        davg(col("l_extendedprice")).as("avg_price"),
        davg(col("l_discount")).as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))
  }

  /** C2: fact-fact join + dim filter (shipping-priority shape).
    * customer is broadcast (150×SF rows); orders⋈lineitem shuffles on
    * orderkey — the only unavoidable shuffle at 100 TB.
    */
  def q3ShippingPriority(spark: SparkSession, dir: String): DataFrame = {
    val cust = Tables.customer(spark, dir).filter(col("c_mktsegment") === "BUILDING")
    val ord  = Tables.orders(spark, dir)
    val li   = Tables.lineitem(spark, dir)
    li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
      .groupBy(col("l_orderkey"), col("o_orderdate"), col("o_orderpriority"))
      .agg(sum(dec2(col("l_extendedprice")) * (lit(1).cast("decimal(18,2)") - dec2(col("l_discount"))))
        .cast("double").as("revenue"))
      .orderBy(col("revenue").desc, col("l_orderkey"))
      .limit(20)
  }

  /** C3: snowflake join region→nation→customer→orders→lineitem→supplier.
    * All dims broadcast; the fact chain shuffles once on orderkey. The
    * supplier-nation co-membership predicate matches TPC-H Q5.
    */
  def q5LocalSupplier(spark: SparkSession, dir: String): DataFrame = {
    val reg = Tables.region(spark, dir).filter(col("r_name") === "ASIA")
    val nat = Tables.nation(spark, dir)
    val cust = Tables.customer(spark, dir)
    val sup = Tables.supplier(spark, dir)
    val ord = Tables.orders(spark, dir)
    val li  = Tables.lineitem(spark, dir)
    li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(sup), col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(cust), col("o_custkey") === col("c_custkey")
        && col("c_nationkey") === col("s_nationkey"))
      .join(broadcast(nat), col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(reg), col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("n_name"))
      .agg(sum(dec2(col("l_extendedprice")) * (lit(1).cast("decimal(18,2)") - dec2(col("l_discount"))))
        .cast("double").as("revenue"))
      .orderBy(col("revenue").desc, col("n_name"))
  }

  /** C4: running sum per supplier over ship date — single shuffle on the
    * window partition key; frame is cumulative (no buffering explosion).
    */
  def windowRunningSum(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val li = Tables.lineitem(spark, dir)
    val w = Window.partitionBy(col("l_suppkey"))
      .orderBy(col("l_shipdate"), col("l_orderkey"), col("l_linenumber"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    li.select(
        col("l_suppkey"), col("l_orderkey"), col("l_linenumber"),
        sum(dec2(col("l_quantity"))).over(w).cast("double").as("running_qty"))
      .orderBy(col("l_suppkey"), col("l_orderkey"), col("l_linenumber"))
  }

  /** C31: correlated aggregate subquery, decorrelated by hand (TPC-H
    * Q17 shape — "revenue from small-quantity orders", per brand):
    * `l_quantity < (SELECT 0.2·avg(l_quantity) WHERE same part)`.
    *
    * Spark-first decorrelation: the correlated scalar subquery IS a
    * `groupBy(l_partkey)` threshold frame joined back to the fact —
    * which is what Catalyst's RewriteCorrelatedScalarSubquery would
    * produce, written explicitly so the plan shape is guaranteed:
    * both sides of the self-join shuffle on the SAME key
    * (l_partkey), so AQE's sort-merge join reuses one exchange
    * lineage instead of re-shuffling; the part dim then broadcasts.
    * Numeric parity: the per-part avg is the exact decimal sum
    * divided in double ([[graft.functions.Num.davg]]) and the
    * revenue sum is decimal-exact — both single-rounded to double,
    * so the filter boundary and the output hash-match any engine.
    */
  def q17SmallQuantity(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
      .select(col("l_partkey"), col("l_quantity"), col("l_extendedprice"))
    val thr = li.groupBy(col("l_partkey"))
      .agg((davg(col("l_quantity")) * lit(0.2)).as("thr"))
    val pt = Tables.part(spark, dir).select(col("p_partkey"), col("p_brand"))
    li.join(thr, "l_partkey")
      .filter(col("l_quantity") < col("thr"))
      .join(broadcast(pt), col("l_partkey") === col("p_partkey"))
      .groupBy(col("p_brand"))
      .agg((dsum(col("l_extendedprice")) / lit(7.0)).as("avg_yearly"))
      .orderBy(col("p_brand"))
  }

  /** C32: HAVING-subquery membership, decorrelated (TPC-H Q18 shape —
    * "large volume customers"): orders whose lineitems total > 250
    * units, with customer detail. The `IN (SELECT … HAVING)` becomes
    * an aggregate→filter→LEFT SEMI join; the qualifying-order agg,
    * the semi join, and the re-join to lineitem all key on
    * l_orderkey/o_orderkey, so the whole pipeline rides one shuffle
    * key end to end; customer dim broadcasts. Quantity sums are
    * decimal-exact, the (price desc, date, orderkey) order makes the
    * LIMIT deterministic.
    */
  def q18LargeVolumeCustomer(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
      .select(col("l_orderkey"), col("l_quantity"))
    val big = li.groupBy(col("l_orderkey"))
      .agg(sum(dec2(col("l_quantity"))).as("__q"))
      .filter(col("__q") > 250)
      .select(col("l_orderkey").as("__ok"))
    val ord = Tables.orders(spark, dir).select(col("o_orderkey"),
      col("o_custkey"), col("o_orderdate"), col("o_totalprice"))
    val cust = Tables.customer(spark, dir)
      .select(col("c_custkey"), col("c_name"))
    ord.join(big, col("o_orderkey") === col("__ok"), "left_semi")
      .join(li, col("o_orderkey") === col("l_orderkey"))
      .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_name"), col("c_custkey"), col("o_orderkey"),
        col("o_orderdate"), col("o_totalprice"))
      .agg(dsum(col("l_quantity")).as("total_qty"))
      .orderBy(col("o_totalprice").desc, col("o_orderdate"),
        col("o_orderkey"))
      .limit(100)
  }

  /** C35: correlated MIN-subquery, decorrelated (TPC-H Q2 shape —
    * "min-cost supplier per part", with lineitem standing in for
    * partsupp: a (part, supplier)'s cost = its min extendedprice).
    * The correlated `= (SELECT MIN … WHERE same part)` becomes one
    * extra aggregation level + an equality join back — both keyed on
    * the part, so the decorrelation adds no new shuffle key. Costs
    * stay DECIMAL through the min and the equality compare (a double
    * compare could split a tie the oracle keeps), cast to double only
    * at output. Ties keep every minimal supplier, like the SQL.
    */
  def q2MinCostSupplier(spark: SparkSession, dir: String): DataFrame = {
    val ps = Tables.lineitem(spark, dir)
      .groupBy(col("l_partkey"), col("l_suppkey"))
      .agg(min(dec2(col("l_extendedprice"))).as("__cost"))
    val m = ps.groupBy(col("l_partkey").as("__pk"))
      .agg(min(col("__cost")).as("__mc"))
    ps.join(m, col("l_partkey") === col("__pk") &&
        col("__cost") === col("__mc"))
      .select(col("l_partkey").as("p_partkey"),
        col("l_suppkey").as("s_suppkey"),
        col("__cost").cast("double").as("cost"))
      .orderBy(col("p_partkey"), col("s_suppkey"))
  }

  /** C36: NOT IN + COUNT(DISTINCT) (TPC-H Q16 shape — "supplier
    * variety per part attribute, excluding flagged suppliers"): the
    * NOT IN subquery becomes a broadcast LEFT ANTI join (null-safe
    * by construction — the blocklist can't inject nulls), then a
    * two-level distinct aggregate per (brand, size). The anti join
    * runs BEFORE the wide distinct agg, so excluded suppliers never
    * enter the shuffle.
    */
  def q16SupplierVariety(spark: SparkSession, dir: String): DataFrame = {
    val flagged = Tables.supplier(spark, dir)
      .filter(col("s_acctbal") < 0)
      .select(col("s_suppkey"))
    val pt = Tables.part(spark, dir)
      .select(col("p_partkey"), col("p_brand"), col("p_size"))
    Tables.lineitem(spark, dir)
      .select(col("l_partkey"), col("l_suppkey"))
      .join(broadcast(flagged), col("l_suppkey") === col("s_suppkey"),
        "left_anti")
      .join(broadcast(pt), col("l_partkey") === col("p_partkey"))
      .groupBy(col("p_brand"), col("p_size"))
      .agg(countDistinct(col("l_suppkey")).as("supplier_cnt"))
      .orderBy(col("supplier_cnt").desc, col("p_brand"), col("p_size"))
  }

  /** C37: double-correlated EXISTS + NOT EXISTS (TPC-H Q21 shape —
    * "suppliers who kept waiting": a delayed lineitem in a
    * multi-supplier order where NO OTHER supplier was delayed; delay
    * = shipped >90 days after the order date, standing in for the
    * receipt/commit columns this dataset doesn't carry). The two
    * correlated subqueries decorrelate into a LEFT SEMI (some other
    * supplier exists) and a LEFT ANTI (no other delayed supplier)
    * against the same order-keyed frames — three joins, all on
    * l_orderkey, one shuffle key end to end; the blame count is
    * per-supplier distinct orders.
    */
  def q21SuppliersWaiting(spark: SparkSession, dir: String): DataFrame = {
    val lo = Tables.lineitem(spark, dir)
      .select(col("l_orderkey"), col("l_suppkey"), col("l_shipdate"))
      .join(Tables.orders(spark, dir)
        .select(col("o_orderkey"), col("o_orderdate"), col("o_orderstatus")),
        col("l_orderkey") === col("o_orderkey"))
    // materialized once: BOTH the l1 seed and the anti-join probe read
    // this frame — without the cut the lineitem⋈orders join runs twice
    val delayed = graft.operators.Materialize.cut(lo
      .filter(col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 90 DAYS")))
    val l1 = delayed.filter(col("o_orderstatus") === "F")
      .select(col("l_orderkey").as("ok"), col("l_suppkey").as("sk"))
      .distinct()
    val others = Tables.lineitem(spark, dir)
      .select(col("l_orderkey").as("ok2"), col("l_suppkey").as("sk2"))
    val otherDelayed = delayed
      .select(col("l_orderkey").as("ok3"), col("l_suppkey").as("sk3"))
    l1.join(others,
        col("ok") === col("ok2") && col("sk") =!= col("sk2"), "left_semi")
      .join(otherDelayed,
        col("ok") === col("ok3") && col("sk") =!= col("sk3"), "left_anti")
      .join(broadcast(Tables.supplier(spark, dir)
        .select(col("s_suppkey"), col("s_name"))),
        col("sk") === col("s_suppkey"))
      .groupBy(col("s_name"))
      .agg(count(lit(1)).as("numwait"))
      .orderBy(col("numwait").desc, col("s_name"))
  }

  /** C5: EXISTS / NOT EXISTS as semi/anti joins (no row duplication,
    * no distinct needed — semantically and physically better than
    * join+dedup at scale).
    */
  def semiJoinExists(spark: SparkSession, dir: String): DataFrame = {
    val cust = Tables.customer(spark, dir)
    val ord  = Tables.orders(spark, dir)
    val withOrders = cust.join(ord, col("c_custkey") === col("o_custkey"), "left_semi")
      .agg(count(lit(1)).as("n"))
      .select(lit("with_orders").as("bucket"), col("n"))
    val withoutOrders = cust.join(ord, col("c_custkey") === col("o_custkey"), "left_anti")
      .agg(count(lit(1)).as("n"))
      .select(lit("without_orders").as("bucket"), col("n"))
    withOrders.unionAll(withoutOrders).orderBy(col("bucket"))
  }

  /** C16: bloom-pruned fact⋈dim join — the fact side is pre-filtered
    * by a bloom filter built over the (filtered) dim keys BEFORE the
    * join, so at scale only probable matches reach the join's
    * exchange ([[graft.operators.BloomPrune]]; the filter stays ~MiB
    * no matter how large the fact is). False positives are removed by
    * the join itself, so the result — and the DuckDB oracle — is the
    * plain join's. PlanSpec pins might_contain below the join and
    * result equality with the unpruned plan.
    */
  def bloomPruneJoin(spark: SparkSession, dir: String): DataFrame = {
    val sup = Tables.supplier(spark, dir)
      .filter(col("s_nationkey") === 3)
      .select(col("s_suppkey"), col("s_name"))
    graft.operators.BloomPrune
      .pruneJoin(Tables.lineitem(spark, dir), sup,
        "l_suppkey", "s_suppkey", expectedDimKeys = 4096)
      .groupBy(col("s_name"))
      .agg(
        sum(dec2(col("l_extendedprice")) * (lit(1).cast("decimal(18,2)") - dec2(col("l_discount"))))
          .cast("double").as("revenue"),
        count(lit(1)).as("n_items"))
      .orderBy(col("s_name"))
  }

  /** C6: exact distinct counts (the approx variant is covered in tests;
    * HLL output is engine-specific so it has no DuckDB oracle).
    */
  def distinctCounts(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
    li.agg(
      countDistinct(col("l_orderkey")).as("n_orders"),
      countDistinct(col("l_partkey")).as("n_parts"),
      countDistinct(col("l_suppkey")).as("n_supps"))
  }

  /** C6b: approximate distinct counts via HyperLogLog++
    * (`approx_count_distinct`, rsd 5%). No DuckDB oracle — the sketch
    * estimate is engine-specific — so this is a rows-only entry; the
    * tolerance vs exact counts is pinned in OperatorsSpec. At 100 TB
    * this is the variant to run: fixed-size sketches merge map-side,
    * no distinct shuffle of the key domain.
    */
  def approxDistinct(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
    li.agg(
      approx_count_distinct(col("l_orderkey"), 0.05).as("approx_orders"),
      approx_count_distinct(col("l_partkey"), 0.05).as("approx_parts"),
      approx_count_distinct(col("l_suppkey"), 0.05).as("approx_supps"))
  }

  /** C7: time-bucketed event aggregation (`date_trunc` is a pure
    * projection — buckets aggregate with one shuffle, and at scale the
    * bucket column is the natural lake partition key).
    */
  def eventsTimeBuckets(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
    ev.groupBy(date_trunc("day", col("ts")).as("day"), col("event_type"))
      .agg(count(lit(1)).as("n_events"), dsum(col("value")).as("sum_value"))
      .orderBy(col("day"), col("event_type"))
  }

  /** C9: top-K rows per group via ranked window — one shuffle on the
    * group key; limit applied before any ordering of the full set.
    */
  def topkPerGroup(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val ord = Tables.orders(spark, dir)
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    ord.select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"),
        row_number().over(w).as("rk"))
      .filter(col("rk") <= 3)
      .orderBy(col("o_custkey"), col("rk"))
  }

  /** C40: TPC-H Q20's correlated-aggregate shape on this schema —
    * "which suppliers dominate a part's supply": per (part, supplier)
    * shipped quantity vs 1.5× the part's mean per-supplier quantity.
    * The correlated scalar subquery ("for this part, what does the
    * average supplier ship?") decorrelates into a SECOND aggregate
    * over the FIRST aggregate's output plus one equi-join back on
    * the part key — no per-row subquery, no nested loop; at scale
    * both aggregates partial-combine and the join reuses the part-key
    * shuffle. The keep decision is cross-multiplied in integer CENTS
    * (2·q·ns > 3·tq) so it is bit-exact in any engine — no decimal
    * promotion rules, no double rounding.
    */
  def q20DominantSuppliers(spark: SparkSession, dir: String): DataFrame = {
    val sp = Tables.lineitem(spark, dir)
      .groupBy(col("l_partkey"), col("l_suppkey"))
      .agg((sum(dec2(col("l_quantity"))) * 100).cast("long").as("qc"))
    val pt = sp.groupBy(col("l_partkey"))
      .agg(sum(col("qc")).as("tqc"), count(lit(1)).as("ns"))
    sp.join(pt, Seq("l_partkey"))
      .filter(col("qc") * 2 * col("ns") > col("tqc") * 3)
      .groupBy(col("l_suppkey"))
      .agg(count(lit(1)).as("n_dominant"))
      .join(broadcast(Tables.supplier(spark, dir)
        .select(col("s_suppkey"), col("s_name"))),
        col("l_suppkey") === col("s_suppkey"))
      .select(col("s_suppkey"), col("s_name"), col("n_dominant"))
      .orderBy(col("s_suppkey"))
  }

  /** C42: TPC-H Q13's customer-distribution shape — the left-outer
    * join + double aggregation that histograms "how many customers
    * placed k orders". Orders aggregate FIRST (partial-combined on
    * o_custkey, so the join input shrinks from |orders| to
    * |customers| — at 100 TB that's the difference between joining
    * 1e11 rows and 1e8), then a left join preserves zero-order
    * customers via coalesce(n, 0), then the second aggregate is over
    * the tiny distinct-count domain. The non-urgent filter plays
    * Q13's `o_comment NOT LIKE` role on this schema.
    */
  def q13CustomerDistribution(spark: SparkSession, dir: String): DataFrame = {
    val oc = Tables.orders(spark, dir)
      .filter(col("o_orderpriority") =!= "1-URGENT")
      .groupBy(col("o_custkey")).agg(count(lit(1)).as("n"))
    Tables.customer(spark, dir).select(col("c_custkey"))
      .join(oc, col("c_custkey") === col("o_custkey"), "left_outer")
      .select(coalesce(col("n"), lit(0L)).as("c_count"))
      .groupBy(col("c_count")).agg(count(lit(1)).as("custdist"))
      .orderBy(col("custdist").desc, col("c_count").desc)
  }

  /** C41: TPC-H Q22's shape — a global scalar aggregate feeding a
    * per-row filter plus an anti-join ("rich customers who never
    * placed an urgent order, by segment"). The scalar subquery
    * (average positive balance) computes ONCE and broadcasts as a
    * single-row crossJoin — the standard scalar-fold pattern — and
    * NOT EXISTS becomes a LEFT ANTI join with the priority filter
    * pushed below it, so only urgent orders' custkeys enter the
    * anti-join shuffle. The balance comparison cross-multiplies in
    * integer cents (bal·n > tot) — exact, engine-independent.
    */
  def q22IdleRichCustomers(spark: SparkSession, dir: String): DataFrame = {
    val cust = Tables.customer(spark, dir)
    val pos = cust.filter(col("c_acctbal") > 0)
      .agg((sum(dec2(col("c_acctbal"))) * 100).cast("long").as("tot"),
        count(lit(1)).as("n"))
    val urgent = Tables.orders(spark, dir)
      .filter(col("o_orderpriority") === "1-URGENT")
      .select(col("o_custkey"))
    cust.join(urgent, col("c_custkey") === col("o_custkey"), "left_anti")
      .crossJoin(broadcast(pos))
      .filter((dec2(col("c_acctbal")) * 100).cast("long") * col("n") > col("tot"))
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("numcust"),
        sum(dec2(col("c_acctbal"))).cast("double").as("totacctbal"))
      .orderBy(col("c_mktsegment"))
  }

  /** C43: disjunctive nation-pair join predicate (TPC-H Q7 shape —
    * bilateral trade volume between two nations per year). The
    * nation dims broadcast TWICE (supplier side, customer side); the
    * pair disjunction evaluates on broadcast-joined name columns, so
    * the only big exchanges are lineitem⋈orders (orderkey) and the
    * already-small filtered result's final aggregation. Filtering to
    * the two nations happens right after each broadcast join —
    * before the orderkey shuffle — so non-qualifying rows never
    * shuffle.
    */
  def q7NationVolume(spark: SparkSession, dir: String): DataFrame = {
    val n1 = Tables.nation(spark, dir)
      .select(col("n_nationkey").as("s_nk"), col("n_name").as("supp_nation"))
    val n2 = Tables.nation(spark, dir)
      .select(col("n_nationkey").as("c_nk"), col("n_name").as("cust_nation"))
    val supp = Tables.supplier(spark, dir)
      .join(broadcast(n1), col("s_nationkey") === col("s_nk"))
      .select(col("s_suppkey"), col("supp_nation"))
      .filter(col("supp_nation").isin("NATION_18", "NATION_19"))
    val cust = Tables.customer(spark, dir)
      .join(broadcast(n2), col("c_nationkey") === col("c_nk"))
      .select(col("c_custkey"), col("cust_nation"))
      .filter(col("cust_nation").isin("NATION_18", "NATION_19"))
    val one = lit(1).cast("decimal(18,2)")
    Tables.lineitem(spark, dir)
      .join(broadcast(supp), col("l_suppkey") === col("s_suppkey"))
      .join(Tables.orders(spark, dir), col("l_orderkey") === col("o_orderkey"))
      // customer side shuffles on custkey — at 100 TB the filtered
      // customer dim is ~8% of 1e8+ rows, past broadcast range; AQE
      // may still demote this to broadcast at small SF
      .join(cust, col("o_custkey") === col("c_custkey"))
      .filter((col("supp_nation") === "NATION_18" && col("cust_nation") === "NATION_19") ||
        (col("supp_nation") === "NATION_19" && col("cust_nation") === "NATION_18"))
      .groupBy(col("supp_nation"), col("cust_nation"),
        year(col("l_shipdate")).as("l_year"))
      .agg(sum(dec2(col("l_extendedprice")) * (one - dec2(col("l_discount"))))
        .cast("double").as("revenue"))
      .orderBy(col("supp_nation"), col("cust_nation"), col("l_year"))
  }

  /** C44: conditional-sum market share (TPC-H Q8 shape — one supplier
    * nation's share of a customer region's market per year). The
    * share is a CASE-sum ratio over ONE aggregation — numerator and
    * denominator are decimal-exact sums in the same agg, divided once
    * in double and rounded; no second pass, no join of two aggs.
    */
  def q8MarketShare(spark: SparkSession, dir: String): DataFrame = {
    val nk = Tables.nation(spark, dir)
      .join(broadcast(Tables.region(spark, dir).filter(col("r_name") === "ASIA")),
        col("n_regionkey") === col("r_regionkey"))
      .select(col("n_nationkey"))
    val cust = Tables.customer(spark, dir)
      .join(broadcast(nk), col("c_nationkey") === col("n_nationkey"))
      .select(col("c_custkey"))
    val sn = Tables.supplier(spark, dir)
      .join(broadcast(Tables.nation(spark, dir)
          .select(col("n_nationkey").as("s_nk"), col("n_name").as("supp_nation"))),
        col("s_nationkey") === col("s_nk"))
      .select(col("s_suppkey"), col("supp_nation"))
    val one = lit(1).cast("decimal(18,2)")
    val vol = dec2(col("l_extendedprice")) * (one - dec2(col("l_discount")))
    Tables.lineitem(spark, dir)
      .join(Tables.orders(spark, dir), col("l_orderkey") === col("o_orderkey"))
      // semi join ships only custkeys; still a shuffle at 100 TB (a
      // region's customers outgrow broadcast range)
      .join(cust, col("o_custkey") === col("c_custkey"), "left_semi")
      .join(broadcast(sn), col("l_suppkey") === col("s_suppkey"))
      .groupBy(year(col("o_orderdate")).as("o_year"))
      .agg(round(
        sum(when(col("supp_nation") === "NATION_5", vol)
          .otherwise(lit(0).cast("decimal(18,2)"))).cast("double") /
          sum(vol).cast("double"), 6).as("mkt_share"))
      .orderBy(col("o_year"))
  }

  /** C45: multi-dim profit rollup with a LIKE filter (TPC-H Q9 shape
    * — profit per supplier nation per year for one part family;
    * profit = revenue − cost, with quantity×retail standing in for
    * partsupp's supplycost on this schema). The LIKE prunes parts
    * BEFORE broadcasting, so the fact join is against the small
    * filtered dim; all money math stays decimal until output.
    */
  def q9ProductProfit(spark: SparkSession, dir: String): DataFrame = {
    val pt = Tables.part(spark, dir)
      .filter(col("p_name").like("%gear%"))
      .select(col("p_partkey"), col("p_retailprice"))
    val sn = Tables.supplier(spark, dir)
      .join(broadcast(Tables.nation(spark, dir)
          .select(col("n_nationkey").as("s_nk"), col("n_name").as("nation"))),
        col("s_nationkey") === col("s_nk"))
      .select(col("s_suppkey"), col("nation"))
    val one = lit(1).cast("decimal(18,2)")
    val half = lit(0.5).cast("decimal(3,2)")
    Tables.lineitem(spark, dir)
      .join(broadcast(pt), col("l_partkey") === col("p_partkey"))
      .join(broadcast(sn), col("l_suppkey") === col("s_suppkey"))
      .groupBy(col("nation"), year(col("l_shipdate")).as("o_year"))
      .agg(sum(dec2(col("l_extendedprice")) * (one - dec2(col("l_discount")))
          - dec2(col("l_quantity")) * dec2(col("p_retailprice")) * half)
        .cast("double").as("sum_profit"))
      .orderBy(col("nation"), col("o_year").desc)
  }

  /** C46: promo-share ratio (TPC-H Q14 shape — CASE-numerator over
    * total revenue per year). Same single-agg ratio discipline as
    * C44; the part type rides a broadcast dim join.
    */
  def q14PromoRevenue(spark: SparkSession, dir: String): DataFrame = {
    val pt = Tables.part(spark, dir).select(col("p_partkey"), col("p_type"))
    val one = lit(1).cast("decimal(18,2)")
    val vol = dec2(col("l_extendedprice")) * (one - dec2(col("l_discount")))
    Tables.lineitem(spark, dir)
      .join(broadcast(pt), col("l_partkey") === col("p_partkey"))
      .groupBy(year(col("l_shipdate")).as("l_year"))
      .agg(round(lit(100.0) *
        sum(when(col("p_type") === "PROMO", vol)
          .otherwise(lit(0).cast("decimal(18,2)"))).cast("double") /
        sum(vol).cast("double"), 6).as("promo_revenue"))
      .orderBy(col("l_year"))
  }

  /** C47: max-of-aggregate decorrelation (TPC-H Q15 shape — the
    * top-revenue supplier(s) of one quarter; the view + `WHERE total
    * = (SELECT MAX(...))` pattern). Same two-level scheme as C35: the
    * per-supplier agg computes once, its single-row MAX broadcasts
    * back, and the equality keeps ties exactly because both sides are
    * the same DECIMAL — never a double compare.
    */
  def q15TopSupplier(spark: SparkSession, dir: String): DataFrame = {
    val one = lit(1).cast("decimal(18,2)")
    val rev = Tables.lineitem(spark, dir)
      .filter(col("l_shipdate") >= lit("1996-01-01") &&
        col("l_shipdate") < lit("1996-04-01"))
      .groupBy(col("l_suppkey"))
      .agg(sum(dec2(col("l_extendedprice")) * (one - dec2(col("l_discount"))))
        .as("__rev"))
    val mx = rev.agg(max(col("__rev")).as("__mx"))
    rev.crossJoin(broadcast(mx))
      .filter(col("__rev") === col("__mx"))
      .join(broadcast(Tables.supplier(spark, dir)),
        col("l_suppkey") === col("s_suppkey"))
      .select(col("s_suppkey"), col("s_name"),
        col("__rev").cast("double").as("total_revenue"))
      .orderBy(col("s_suppkey"))
  }

  /** C48: disjunction of multi-column conjunctions (TPC-H Q19 shape —
    * three (brand × size-band × quantity-band) clauses OR'd into one
    * scan predicate). The whole disjunction is a single codegen'd
    * filter over the broadcast part join — one fact scan, no union of
    * three subqueries; Parquet still gets the common l_quantity
    * range pushed down as `quantity BETWEEN min(lo) AND max(hi)`.
    */
  def q19DisjunctivePredicates(spark: SparkSession, dir: String): DataFrame = {
    val pt = Tables.part(spark, dir)
      .select(col("p_partkey"), col("p_brand"), col("p_size"))
    val one = lit(1).cast("decimal(18,2)")
    val q = col("l_quantity")
    val clause =
      (col("p_brand") === "Brand#1" && col("p_size").between(1, 15) &&
        q.between(1, 20)) ||
      (col("p_brand") === "Brand#2" && col("p_size").between(16, 30) &&
        q.between(10, 30)) ||
      (col("p_brand") === "Brand#3" && col("p_size").between(31, 50) &&
        q.between(20, 50))
    Tables.lineitem(spark, dir)
      // the disjunction's quantity envelope — pushable to the scan
      .filter(q.between(1, 50))
      .join(broadcast(pt), col("l_partkey") === col("p_partkey"))
      .filter(clause)
      .agg(sum(dec2(col("l_extendedprice")) * (one - dec2(col("l_discount"))))
          .cast("double").as("revenue"),
        count(lit(1)).as("n_items"))
  }

  /** C49: global-fraction HAVING (TPC-H Q11 shape — parts whose stock
    * value exceeds 1.5× the mean per-part value; lineitem value
    * standing in for partsupp; the mean-relative bar keeps the query
    * meaningful at every SF where a fixed fraction degenerates). The
    * grand total/count is the per-part agg re-aggregated (never a
    * second fact scan) and broadcasts as one row; the threshold
    * cross-multiplies DECIMALs and integers (2·val·n > 3·tot) —
    * exact, so the boundary part set is engine-independent.
    */
  def q11ImportantStock(spark: SparkSession, dir: String): DataFrame = {
    val one = lit(1).cast("decimal(18,2)")
    val perPart = Tables.lineitem(spark, dir)
      .groupBy(col("l_partkey"))
      .agg(sum(dec2(col("l_extendedprice")) * (one - dec2(col("l_discount"))))
        .as("__val"))
    val total = perPart.agg(sum(col("__val")).as("__tot"),
      count(lit(1)).as("__n"))
    perPart.crossJoin(broadcast(total))
      .filter(col("__val") * col("__n") * 2 > col("__tot") * 3)
      .select(col("l_partkey").as("p_partkey"),
        col("__val").cast("double").as("stock_value"))
      .orderBy(col("stock_value").desc, col("p_partkey"))
  }

  /** C50: EXISTS-probe priority count (TPC-H Q4 shape — "how many
    * orders per priority had at least one late line"; late = shipped
    * >60 days after the order date, standing in for the
    * commit/receipt columns this dataset doesn't carry). The
    * correlated EXISTS decorrelates into a LEFT SEMI join carrying
    * the date predicate in the join condition — the probe side never
    * duplicates order rows (no DISTINCT repair), and both sides key
    * on the order key, one shuffle end to end; at 100 TB the
    * quarter's date filter prunes the orders scan before the
    * exchange.
    */
  def q4OrderPriority(spark: SparkSession, dir: String): DataFrame = {
    val ord = Tables.orders(spark, dir)
      .select(col("o_orderkey"), col("o_orderdate"), col("o_orderpriority"))
      .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
        col("o_orderdate") < lit("1996-04-01").cast("timestamp"))
    val late = Tables.lineitem(spark, dir)
      .select(col("l_orderkey"), col("l_shipdate"))
    ord.join(late,
        col("o_orderkey") === col("l_orderkey") &&
          col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 60 DAYS"),
        "left_semi")
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("order_count"))
      .orderBy(col("o_orderpriority"))
  }

  /** C51: single-scan filtered aggregate (TPC-H Q6 shape — revenue
    * delta from discount changes). The canonical scan-bound query:
    * every predicate (date range, discount band, quantity cap) pushes
    * to the parquet scan, projection prunes to 4 columns, the
    * aggregate partial-combines to ONE row per map task — zero
    * shuffle volume beyond 32 rows. Revenue = Σ price·discount in
    * exact DECIMAL, single-rounded to double at the edge.
    */
  def q6ForecastRevenue(spark: SparkSession, dir: String): DataFrame = {
    Tables.lineitem(spark, dir)
      .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1997-01-01").cast("timestamp") &&
        col("l_discount").between(0.05, 0.07) && col("l_quantity") < 24)
      .agg(sum(dec2(col("l_extendedprice")) * dec2(col("l_discount")))
          .cast("double").as("revenue"),
        count(lit(1)).as("n_items"))
  }

  /** C52: returned-item reporting (TPC-H Q10 shape — top 20 customers
    * by revenue lost to returns in a quarter, with nation detail).
    * Orders prune on the quarter BEFORE the fact join (at 100 TB this
    * is the difference between shuffling a quarter and shuffling six
    * years); lineitem filters on the return flag at the scan; the two
    * facts shuffle once on the order key; customer and nation
    * broadcast. Revenue is decimal-exact; (revenue desc, custkey)
    * makes the LIMIT deterministic.
    */
  def q10ReturnedItems(spark: SparkSession, dir: String): DataFrame = {
    val one = lit(1).cast("decimal(18,2)")
    val ord = Tables.orders(spark, dir)
      .select(col("o_orderkey"), col("o_custkey"), col("o_orderdate"))
      .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
        col("o_orderdate") < lit("1996-04-01").cast("timestamp"))
    val li = Tables.lineitem(spark, dir)
      .filter(col("l_returnflag") === "R")
      .select(col("l_orderkey"), col("l_extendedprice"), col("l_discount"))
    val cust = Tables.customer(spark, dir)
      .select(col("c_custkey"), col("c_name"), col("c_acctbal"), col("c_nationkey"))
    val nat = Tables.nation(spark, dir)
      .select(col("n_nationkey"), col("n_name"))
    li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
      .join(broadcast(nat), col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("c_custkey"), col("c_name"), col("c_acctbal"), col("n_name"))
      .agg(sum(dec2(col("l_extendedprice")) * (one - dec2(col("l_discount"))))
        .cast("double").as("revenue"))
      .orderBy(col("revenue").desc, col("c_custkey"))
      .limit(20)
  }

  /** C53: conditional two-way priority split per category (TPC-H Q12
    * shape — for each line category, how many LATE lines came from
    * high- vs low-priority orders; l_returnflag stands in for
    * l_shipmode, late = shipped >30 days after the order date). The
    * CASE-sums fold into ONE aggregate pass (no pivot, no second
    * scan); the year filter pushes to the lineitem scan; the single
    * fact-fact shuffle keys on the order key.
    */
  def q12LatePriority(spark: SparkSession, dir: String): DataFrame = {
    val hi = col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    val ord = Tables.orders(spark, dir)
      .select(col("o_orderkey"), col("o_orderdate"), col("o_orderpriority"))
    Tables.lineitem(spark, dir)
      .select(col("l_orderkey"), col("l_returnflag"), col("l_shipdate"))
      .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1997-01-01").cast("timestamp"))
      .join(ord, col("l_orderkey") === col("o_orderkey") &&
        col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 30 DAYS"))
      .groupBy(col("l_returnflag"))
      .agg(
        sum(when(hi, 1L).otherwise(0L)).as("high_line_count"),
        sum(when(hi, 0L).otherwise(1L)).as("low_line_count"))
      .orderBy(col("l_returnflag"))
  }
}
