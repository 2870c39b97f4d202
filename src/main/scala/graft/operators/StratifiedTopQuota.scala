package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact per-stratum "keep the first `quota` rows in `ord` order"
  * WITHOUT sorting whole strata (SURVEY §2 D47/D48 scale fix).
  *
  * The naive formulation — `row_number() OVER (PARTITION BY stratum
  * ORDER BY ord) <= quota` — puts every row of a stratum into one
  * task's sort buffer: at 100 TB the dominant language/source IS most
  * of the corpus in a single partition. This operator keeps the exact
  * same kept set with only aggregate-sized and boundary-sized state:
  *
  *  1. Collapse rows to a per-(stratum, coarse-bucket) count
  *     histogram — a partial-agg'd shuffle of key pairs, never rows.
  *  2. Walk the cumulative histogram (a window over the AGGREGATE,
  *     ≤ strata × buckets rows) to find each stratum's boundary
  *     bucket b*: the first whose cumulative count reaches the
  *     quota. Everything in buckets < b* is admitted outright;
  *     everything in buckets > b* is rejected outright — no sort
  *     touches those rows.
  *  3. Rank ONLY the boundary bucket's rows (expected stratum/B of
  *     the data for B buckets of a well-spread ordering key) and
  *     admit enough to top the stratum up to exactly `quota`.
  *
  * Correctness needs one invariant from the caller: `coarse` must be
  * a MONOTONE bucketing of the leading `ord` column (equal ord ⇒
  * equal coarse, ord a < b ⇒ coarse(a) <= coarse(b)) — then "bucket
  * < b*" agrees with the global ordering and rank-within-boundary
  * completes it exactly, doc-count-exact with tiebreaks, matching
  * the window twin bit-for-bit.
  */
object StratifiedTopQuota {

  /** Mark each row of `df` with boolean `keptCol`: true iff the row's
    * rank under `ord` within its stratum is <= the stratum's quota.
    *
    * @param df      input rows
    * @param stratum stratum key column (string-castable)
    * @param ord     total order within a stratum, leading column
    *                first; caller appends a unique tiebreak key
    * @param coarse  monotone bucketing of ord.head (long)
    * @param quotas  one row per stratum: (__stratum string,
    *                __quota long); strata absent here keep nothing
    */
  def markKept(df: DataFrame, stratum: Column, ord: Seq[Column],
               coarse: Column, quotas: DataFrame,
               keptCol: String = "kept"): DataFrame = {
    require(ord.nonEmpty, "StratifiedTopQuota: ord must be non-empty")
    // The walk reads its input THREE times (histogram, bulk verdicts,
    // boundary rank). Materialize it once: callers feed expensive
    // scored frames (a bigram-LM fold per row in D47), and recomputing
    // that per scan triples the dominant cost — at 100 TB an executor-
    // disk checkpoint of the scored columns is exactly the trade a
    // cluster run wants over re-scoring the corpus.
    // A null coarse bucket maps to MinValue: ascending Spark windows
    // sort NULLS FIRST, so the twin ranks null-ord rows ahead of
    // everything — the sentinel reproduces that, and without it the
    // `=!=`/`===` branch filters would silently DROP null rows from
    // the output. Null strata never match a quota row and keep
    // nothing, same as the twin.
    val withB = Materialize.cut(df
      .withColumn("__stq_s", stratum.cast("string"))
      .withColumn("__stq_cb",
        coalesce(coarse.cast("long"), lit(Long.MinValue))))

    // 1. histogram over (stratum, coarse bucket) — aggregate-sized
    val counts = withB.groupBy(col("__stq_s"), col("__stq_cb"))
      .agg(count(lit(1)).as("__stq_c"))

    // 2. boundary bucket per stratum off the cumulative histogram.
    //    The window runs over the AGGREGATE (strata × buckets rows).
    val wCum = Window.partitionBy(col("__stq_s")).orderBy(col("__stq_cb"))
      .rowsBetween(Window.unboundedPreceding, 0)
    val cum = counts
      .withColumn("__stq_cum", sum(col("__stq_c")).over(wCum))
      .join(quotas.withColumnRenamed("__stratum", "__stq_s"), "__stq_s")
    // first bucket whose cumulative count reaches the quota; admitted
    // = rows before it; topup = what the boundary still owes
    val bounds = cum
      .filter(col("__stq_cum") >= col("__quota"))
      .groupBy(col("__stq_s"))
      .agg(min(struct(col("__stq_cb"), (col("__stq_cum") - col("__stq_c")).as("__stq_before")))
        .as("__stq_b"))
      .select(col("__stq_s"), col("__stq_b.__stq_cb").as("__stq_bcb"),
        col("__stq_b.__stq_before").as("__stq_before"))
      .join(quotas.withColumnRenamed("__stratum", "__stq_s"), "__stq_s")
      .select(col("__stq_s"), col("__stq_bcb"),
        (col("__quota") - col("__stq_before")).as("__stq_topup"))

    // 3. narrow bulk verdicts + rank only the boundary bucket. A
    //    LISTED stratum with quota >= its row count never reaches the
    //    quota in `bounds` (no such cum) — every bucket sorts below
    //    the MaxValue sentinel, admitting the whole stratum, which is
    //    exactly rank <= quota there. quota <= 0 yields boundary =
    //    first bucket with topup <= 0: nothing admitted. A stratum
    //    ABSENT from `quotas` keeps nothing (the __quota null check —
    //    without it the MaxValue sentinel would silently admit every
    //    unlisted stratum whole).
    val withThr = withB
      .join(broadcast(quotas.withColumnRenamed("__stratum", "__stq_s")),
        Seq("__stq_s"), "left")
      .join(broadcast(bounds), Seq("__stq_s"), "left")
      .withColumn("__stq_bcb",
        coalesce(col("__stq_bcb"), lit(Long.MaxValue)))
    val nonBoundary = withThr.filter(col("__stq_cb") =!= col("__stq_bcb"))
      .withColumn(keptCol,
        col("__quota").isNotNull && col("__stq_cb") < col("__stq_bcb"))
    val wRank = Window.partitionBy(col("__stq_s")).orderBy(ord.map(_.asc): _*)
    val boundary = withThr.filter(col("__stq_cb") === col("__stq_bcb"))
      .withColumn("__stq_rk", row_number().over(wRank))
      .withColumn(keptCol, col("__stq_rk") <= col("__stq_topup"))
      .drop("__stq_rk")
    nonBoundary.unionByName(boundary)
      .drop("__stq_s", "__stq_cb", "__stq_bcb", "__stq_topup", "__quota")
  }

  /** Filter form of [[markKept]]: return only the admitted rows. */
  def take(df: DataFrame, stratum: Column, ord: Seq[Column],
           coarse: Column, quotas: DataFrame): DataFrame =
    markKept(df, stratum, ord, coarse, quotas, keptCol = "__stq_kept")
      .filter(col("__stq_kept"))
      .drop("__stq_kept")
}
