package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.Num._
import graft.operators.{PeriodPivot, Upsert}
import graft.sources.Tables

/** The reference's ETL + dashboard surface re-expressed Spark-first over
  * the lake tables (SURVEY §2.A/§2.B, mapping in §3: customer plays
  * `player_dm`, nation plays `team_dm`, orders-by-month plays
  * `player_week_ft` gameweeks).
  */
object ReferenceQueries {

  private def one = lit(1).cast("decimal(18,2)")

  /** B1: top-N by metric — fpl sql_queries.py:111 (`basic_ply_data`:
    * players by form desc limit 9). TakeOrdered at the physical layer:
    * per-partition top-N then a tiny driver merge — no full sort at
    * scale. Tiebreak on the PK for determinism (the reference relies on
    * Postgres' unstable sort).
    */
  def topNByMetric(spark: SparkSession, dir: String): DataFrame =
    Tables.customer(spark, dir)
      .select(col("c_custkey"), col("c_name"), col("c_acctbal"))
      .orderBy(col("c_acctbal").desc, col("c_custkey"))
      .limit(9)

  /** B2: derived ratio metric — fpl sql_queries.py:113-116
    * (`value_per_points`: total_points/now_costs). Pure projection,
    * stays in whole-stage codegen; division done in double (IEEE-stable
    * across engines).
    */
  def ratioMetric(spark: SparkSession, dir: String): DataFrame =
    Tables.part(spark, dir)
      .select(col("p_partkey"), col("p_name"), col("p_retailprice"),
        (col("p_retailprice") / col("p_size").cast("double")).as("price_per_size"))
      .orderBy(col("p_retailprice").desc, col("p_partkey"))
      .limit(9)

  /** B3: the dashboard detail query — fpl sql_queries.py:118-188
    * (`detailed_ply_data_per_week`). The reference builds 5 CTEs with
    * correlated `limit 3` subqueries per pivot column; here: one tiny
    * ranked-period aggregate broadcast back, one monthly pre-aggregate,
    * conditional-aggregate pivot, and broadcast dim join — a single
    * shuffle on the entity key dominates at scale.
    */
  def dashboardDetail(spark: SparkSession, dir: String): DataFrame = {
    val cust = Tables.customer(spark, dir)
    val nat  = Tables.nation(spark, dir)
    val ord  = Tables.orders(spark, dir)

    // ct_gen: entity dim + parent dim (player ⋈ team → customer ⋈ nation).
    // display_name mirrors the reference's `name || ' ' || surname AS
    // ply_name` (fpl sql_queries.py:122) — B10's concat exercised on the
    // dashboard surface, null-skipping like the reference's NULL-safe ||.
    val gen = cust.join(broadcast(nat), col("c_nationkey") === col("n_nationkey"), "left")
      .select(col("c_custkey"), col("c_name"), col("c_mktsegment"),
        col("n_name").as("nation_name"),
        concat_ws(" ", col("c_name"), col("n_name")).as("display_name"))

    // ct_stats_totals: lifetime totals per entity
    val totals = ord.groupBy(col("o_custkey")).agg(
      dsum(col("o_totalprice")).as("total_spend"),
      count(lit(1)).as("n_orders"))

    // monthly fact (gameweek analog), aggregated once and reused
    val monthly = ord.groupBy(col("o_custkey"),
        date_trunc("month", col("o_orderdate")).as("month"))
      .agg(sum(dec2(col("o_totalprice"))).as("mspend"))

    // last-3-month pivot (gw-1/gw-2/gw-3 analog)
    val r3 = PeriodPivot.rankPeriods(monthly, "month", 3)
    val piv = monthly.join(broadcast(r3), Seq("month"))
      .groupBy(col("o_custkey"))
      .agg(
        max(when(col("__prank") === 1, col("mspend"))).cast("double").as("m1_spend"),
        max(when(col("__prank") === 2, col("mspend"))).cast("double").as("m2_spend"),
        max(when(col("__prank") === 3, col("mspend"))).cast("double").as("m3_spend"))

    // trailing-4-month average (ct_avg_points_last_4 analog: sum/4)
    val r4 = PeriodPivot.rankPeriods(monthly, "month", 4)
    val avg4 = monthly.join(broadcast(r4), Seq("month"))
      .groupBy(col("o_custkey"))
      .agg((sum(col("mspend")).cast("double") / lit(4.0)).as("avg_4m"))

    gen
      .join(totals, col("c_custkey") === totals("o_custkey"), "left").drop("o_custkey")
      .join(piv, col("c_custkey") === piv("o_custkey"), "left").drop("o_custkey")
      .join(avg4, col("c_custkey") === avg4("o_custkey"), "left").drop("o_custkey")
      .select(col("c_custkey"), col("c_name"), col("c_mktsegment"),
        col("nation_name"), col("display_name"),
        coalesce(col("total_spend"), lit(0.0)).as("total_spend"),
        coalesce(col("n_orders"), lit(0L)).as("n_orders"),
        col("avg_4m"), col("m1_spend"), col("m2_spend"), col("m3_spend"))
      .orderBy(col("total_spend").desc, col("c_custkey"))
      .limit(15)
  }

  /** B12: per-entity period series — the dashboard's chart data
    * (fpl application/routes.py pulls a player's points per gameweek
    * to draw the line chart). Pushed-down entity filter + one tiny
    * aggregate; at scale the entity predicate prunes row groups via
    * parquet min/max stats.
    */
  def entityTimeSeries(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .filter(col("o_custkey") === 42)
      .groupBy(date_trunc("month", col("o_orderdate")).as("month"))
      .agg(dsum(col("o_totalprice")).as("spend"), count(lit(1)).as("n_orders"))
      .orderBy(col("month"))

  /** B4: standalone last-N-period pivot via [[PeriodPivot]] —
    * fpl sql_queries.py:138-159.
    */
  def lastPeriodsPivot(spark: SparkSession, dir: String): DataFrame = {
    val monthly = Tables.orders(spark, dir)
      .groupBy(col("o_custkey"),
        date_trunc("month", col("o_orderdate")).as("month"))
      .agg(sum(dec2(col("o_totalprice"))).as("mspend"))
    PeriodPivot.lastPeriods(monthly, "o_custkey", "month",
        col("mspend"), 3, i => s"m${i}_spend")
      .select(col("o_custkey"),
        col("m1_spend").cast("double"),
        col("m2_spend").cast("double"),
        col("m3_spend").cast("double"))
      .orderBy(col("o_custkey"))
  }

  /** B5: trailing-4-period average — fpl sql_queries.py:160-167 (sum of
    * last-4-week points / 4, denominator fixed regardless of presence).
    */
  def rollingPeriodAvg(spark: SparkSession, dir: String): DataFrame = {
    val monthly = Tables.orders(spark, dir)
      .groupBy(col("o_custkey"),
        date_trunc("month", col("o_orderdate")).as("month"))
      .agg(sum(dec2(col("o_totalprice"))).as("mspend"))
    val r4 = PeriodPivot.rankPeriods(monthly, "month", 4)
    monthly.join(broadcast(r4), Seq("month"))
      .groupBy(col("o_custkey"))
      .agg((sum(col("mspend")).cast("double") / lit(4.0)).as("avg_4m"))
      .orderBy(col("o_custkey"))
  }

  private def statsTotals(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir).groupBy(col("l_partkey")).agg(
      count(lit(1)).as("n_lines"),
      dsum(col("l_quantity")).as("total_qty"),
      dsum(col("l_extendedprice")).as("total_price"),
      sum(dec2(col("l_extendedprice")) * dec2(col("l_discount")))
        .cast("double").as("disc_amount"),
      sum(dec2(col("l_extendedprice")) * dec2(col("l_tax")))
        .cast("double").as("tax_amount"))
    .withColumn("total_levies", col("disc_amount") + col("tax_amount"))

  /** B6a: grouped stat totals ordered by one measure — fpl
    * sql_queries.py:220-237 (`sql_stats_key_pass`: one summed CTE,
    * ordered by key_passes). The groupBy is shared with B6b — Catalyst
    * computes it once per query; on a warehouse the pre-agg would be a
    * materialized view.
    */
  def statsTotalsA(spark: SparkSession, dir: String): DataFrame =
    statsTotals(spark, dir)
      .orderBy(col("total_qty").desc, col("l_partkey")).limit(15)

  /** B6b: same totals ordered by the other measure — fpl
    * sql_queries.py:239-256 (`sql_stats_shots`).
    */
  def statsTotalsB(spark: SparkSession, dir: String): DataFrame =
    statsTotals(spark, dir)
      .orderBy(col("total_price").desc, col("l_partkey")).limit(15)

  /** B7: point lookup by attribute — fpl sql_queries.py:190-192
    * (`sql_get_salah_id`). The equality predicate is pushed into the
    * parquet scan (row-group pruning via min/max stats at scale).
    */
  def pointLookup(spark: SparkSession, dir: String): DataFrame =
    Tables.customer(spark, dir)
      .filter(col("c_name") === "Customer#000000042")
      .select(col("c_custkey"), col("c_name"))

  /** B8: referential-integrity probe — fpl sql_queries.py:194-198
    * (`sql_control_of_joins`) and test_includes.py:10-12. Anti-join
    * count of fact rows with no dim match.
    */
  def joinQuality(spark: SparkSession, dir: String): DataFrame = {
    val ord = Tables.orders(spark, dir)
    val cust = Tables.customer(spark, dir)
    ord.join(cust, col("o_custkey") === col("c_custkey"), "left_anti")
      .agg(count(lit(1)).as("n_orphans"))
  }

  /** B9: last/max watermark — fpl sql_queries.py:275
    * (`sql_select_last_data_checked_week`). A full-table max, pruned to
    * one column; parquet footer stats make this near-free.
    */
  def lastWatermark(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .agg(max(col("o_orderdate")).as("last_period"),
           max(col("o_orderkey")).as("last_key"))

  /** A5: upsert keep-latest — fpl sql_queries.py:38-96 (week rows
    * ON CONFLICT (element_, round_gw) DO UPDATE). Latest event per
    * (user_id, event_type) via [[Upsert.keepLatest]].
    */
  def upsertKeepLatest(spark: SparkSession, dir: String): DataFrame =
    Upsert.keepLatest(
        Tables.events(spark, dir).select(col("event_id"), col("ts"),
          col("user_id"), col("event_type"), col("value")),
        Seq("user_id", "event_type"), col("ts"), Seq(col("event_id")))
      .orderBy(col("user_id"), col("event_type"))

  /** A6: incremental load window — fpl includes.py:168-186 (process only
    * the gameweeks at/after the recorded watermark). The watermark is a
    * tiny aggregate cross-joined (broadcast) into the filter — no
    * driver round-trip, so the plan stays one job at scale.
    */
  def incrementalLoad(spark: SparkSession, dir: String): DataFrame =
    graft.operators.Incremental.latestPeriod(
        Tables.orders(spark, dir), date_trunc("month", col("o_orderdate")))
      .select(col("o_orderkey"), col("o_custkey"), col("o_orderdate"))
      .orderBy(col("o_orderkey"))

  /** A7: PK dedup with deterministic keep — idempotent re-ingest
    * semantics of the reference's upserts. Keep the first line per
    * order.
    */
  def pkDedup(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val li = Tables.lineitem(spark, dir)
    // (l_orderkey, l_linenumber) is not unique in this lake — tiebreak
    // through the remaining columns for a total order.
    val w = Window.partitionBy(col("l_orderkey"))
      .orderBy(col("l_linenumber"), col("l_partkey"), col("l_suppkey"))
    li.select(col("l_orderkey"), col("l_linenumber"), col("l_partkey"),
        col("l_suppkey"))
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1).drop("__rn")
      .orderBy(col("l_orderkey"))
  }

  /** A3: categorical code→label mapping — fpl includes.py:36,129
    * (`dict_element_types` 1→gk…4→fwd). A `when` chain (codegen'd
    * constant dictionary, no UDF, no join) then aggregate.
    */
  def codeMapping(spark: SparkSession, dir: String): DataFrame = {
    val code = when(col("c_mktsegment") === "AUTOMOBILE", 1)
      .when(col("c_mktsegment") === "BUILDING", 2)
      .when(col("c_mktsegment") === "FURNITURE", 3)
      .when(col("c_mktsegment") === "HOUSEHOLD", 4)
      .when(col("c_mktsegment") === "MACHINERY", 5)
      .otherwise(0)
    Tables.customer(spark, dir)
      .select(col("c_mktsegment"), code.as("segment_code"))
      .groupBy(col("c_mktsegment"), col("segment_code"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("segment_code"))
  }

  /** A4: CSV ingest — fpl includes.py:355-394 (scraped match-stats CSVs
    * read row-at-a-time from S3 and inserted per row). Spark-first: a
    * schema'd `spark.read.csv` (no inference pass), malformed rows
    * quarantined via the PERMISSIVE corrupt-record column, then one
    * per-match aggregate. The CSV itself is derived deterministically
    * from the lake (sandbox stand-in for S3) so the DuckDB oracle can
    * `read_csv` the very same files; sums follow [[Num]] discipline.
    */
  def csvIngest(spark: SparkSession, dir: String): DataFrame = {
    val sfName = new java.io.File(dir).getName
    val path = s"/tmp/graft_csv_ingest/$sfName"
    graft.sources.CsvIngest.writeSampleCsv(spark, dir, path)
    graft.sources.CsvIngest.validStats(spark, path)
      .groupBy(col("match_id"))
      .agg(count(lit(1)).as("n_rows"),
        sum(col("min_played")).cast("long").as("sum_min"),
        sum(col("key_passes")).cast("long").as("sum_kp"),
        dsum(col("xg")).as("sum_xg"),
        dsum(col("xa")).as("sum_xa"))
      .orderBy(col("match_id"))
  }

  /** A2: JSON ingest + normalize — fpl includes.py:112-145
    * (json_normalize of the API payload). `get_json_object` over the
    * events' JSON props column; parsing stays in codegen, no UDF.
    */
  def jsonIngest(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .select(col("event_id"),
        get_json_object(col("props"), "$.k").cast("bigint").as("k"))
      .groupBy(col("k")).agg(count(lit(1)).as("n"))
      .orderBy(col("k"))
}
