package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Ordered funnel analysis over an event stream.
  *
  * The reference's dashboard counts "who did X" aggregates
  * (fpl-data-pipeline application/routes.py, sql_queries.py:194-198);
  * the natural warehouse generalization is the ordered funnel: of the
  * users who did stage 1, how many went on to do stage 2 *after* it,
  * then stage 3 after that — the core product-analytics query shape.
  *
  * Spark-first shape: ONE shuffle, ever. All stages resolve in a single
  * window pass per user ordered by event time: `saw_i` = the earliest
  * time the funnel prefix `0..i` completed among STRICTLY EARLIER rows
  * (`rowsBetween(unboundedPreceding, -1)`), so a row of stage i+1
  * qualifies iff `saw_i` is already set (and, optionally, the row falls
  * within `maxGap` of it). Every `saw_i` rides the same partitioning and
  * sort — Catalyst stacks the window operators on one exchange. The
  * alternative (one self-join per stage) shuffles the fact table N
  * times; at 100 TB that is N full-data exchanges versus this plan's
  * single one.
  *
  * Semantics: first-touch. Stage i+1 must follow the EARLIEST
  * completion of stage i (not any completion); a later re-entry does
  * not reopen the window. Ties in event time are broken by `tiebreak`,
  * making qualification deterministic under any partitioning.
  */
object Funnel {

  /** Per-row qualification timestamps for each stage.
    *
    * @param stages  event-type value per funnel stage, in funnel order
    * @param maxGap  optional max delay between the earliest completion
    *                of stage i and a qualifying stage-i+1 event (an
    *                INTERVAL column, e.g. `expr("INTERVAL 4 HOURS")`)
    * @return input plus `__q0..__qN` (this row's qualifying time for
    *         stage i, null if it does not qualify)
    */
  def qualify(df: DataFrame, user: String, typeCol: String, ts: String,
              tiebreak: String, stages: Seq[String],
              maxGap: Option[Column] = None): DataFrame = {
    require(stages.nonEmpty, "funnel needs at least one stage")
    val before = Window.partitionBy(col(user))
      .orderBy(col(ts), col(tiebreak))
      .rowsBetween(Window.unboundedPreceding, -1)
    stages.zipWithIndex.foldLeft(df) { case (cur, (stage, i)) =>
      val qual =
        if (i == 0) when(col(typeCol) === stage, col(ts))
        else {
          val sawPrev = min(col(s"__q${i - 1}")).over(before)
          val inGap = maxGap
            .map(g => col(ts) <= sawPrev + g)
            .getOrElse(lit(true))
          when(col(typeCol) === stage && sawPrev.isNotNull && inGap,
            col(ts))
        }
      cur.withColumn(s"__q$i", qual)
    }
  }

  /** Funnel reach: one row per stage with the distinct-user count that
    * completed the funnel up to and including it.
    */
  def steps(df: DataFrame, user: String, typeCol: String, ts: String,
            tiebreak: String, stages: Seq[String],
            maxGap: Option[Column] = None): DataFrame = {
    val qualified = qualify(df, user, typeCol, ts, tiebreak, stages, maxGap)
    val aggs = stages.indices.map { i =>
      countDistinct(when(col(s"__q$i").isNotNull, col(user))).as(s"__u$i")
    }
    val wide = qualified.agg(aggs.head, aggs.tail: _*)
    // unpivot via explode(array(struct…)) — stage values stay data,
    // never spliced into SQL text
    val rows = stages.zipWithIndex.map { case (stage, i) =>
      struct(lit(i + 1).as("step"), lit(stage).as("stage"),
        col(s"__u$i").as("users"))
    }
    wide
      .select(explode(array(rows: _*)).as("__r"))
      .select(col("__r.step"), col("__r.stage"), col("__r.users"))
      .orderBy(col("step"))
  }

  /** C62: time-constrained window funnel (the ClickHouse
    * `windowFunnel` metric): the maximum depth d such that SOME chain
    * of stage-1..d events, in order, spans ≤ `windowMicros` from its
    * first event. Unlike [[qualify]]'s first-touch semantics, every
    * stage-1 event can start a fresh chain — the number product
    * analytics tools report for "converted within T".
    *
    * Greedy fold over each user's time-ordered stage events, keeping
    * per depth the chain-start of the LATEST-starting chain reaching
    * it (dominance: any chain completable from an earlier start is
    * completable from a later one, so only the latest start matters).
    * All arithmetic is integer micros — the DuckDB oracle replays the
    * fold exactly, no float anywhere. Same per-key bound as C24/C61:
    * the fold length is the user's stage-event count.
    *
    * @return (user, depth) for every user with ≥1 stage event
    */
  def windowFunnel(df: DataFrame, user: String, typeCol: String,
                   ts: String, tiebreak: String, stages: Seq[String],
                   windowMicros: Long): DataFrame = {
    require(stages.nonEmpty, "windowFunnel needs at least one stage")
    val n = stages.size
    val MIN = Long.MinValue
    val step = stages.zipWithIndex.foldLeft(lit(-1)) { case (acc, (s, i)) =>
      when(col(typeCol) === s, i).otherwise(acc)
    }
    val ev = df
      .select(col(user).as("__u"), unix_micros(col(ts)).as("__t"),
        col(tiebreak).cast("long").as("__tb"), step.as("__s"))
      .filter(col("__s") >= 0)
      .groupBy(col("__u"))
      .agg(sort_array(collect_list(
        struct(col("__t"), col("__tb"), col("__s")))).as("__arr"))
    val init = array(Seq.fill(n)(lit(MIN)): _*)
    val state = aggregate(col("__arr"), init, (acc, e) => {
      val t = e.getField("__t")
      val s = e.getField("__s")
      transform(sequence(lit(1), lit(n)), d => {
        // element_at index guarded to >=1; the CASE predicates make
        // the d=1 probe value irrelevant
        val prev = element_at(acc, greatest(d - 1, lit(1)))
        when(d === 1 && s === 0, greatest(element_at(acc, d), t))
          .when(d - 1 === s && s > 0 && prev =!= lit(MIN) &&
            t - prev <= lit(windowMicros),
            greatest(element_at(acc, d), prev))
          .otherwise(element_at(acc, d))
      })
    })
    ev.select(col("__u").as(user),
      size(filter(state, x => x =!= lit(MIN))).as("depth"))
  }
}
