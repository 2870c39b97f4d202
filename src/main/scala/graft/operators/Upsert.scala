package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Upsert / merge semantics as a distributed operator.
  *
  * The reference upserts row-at-a-time into Postgres with
  * `ON CONFLICT (pk) DO UPDATE` (fpl-data-pipeline sql_queries.py:28-109,
  * includes.py:135-204). On a lake there is no per-row conflict check;
  * the scalable equivalent is a set-based merge: union the incoming
  * batch with the existing table and keep, per primary key, the row from
  * the preferred source / highest version. One shuffle on the key,
  * window kept narrow (row_number only), no driver involvement — this is
  * the shape that survives 100 TB.
  */
object Upsert {

  /** Keep the single winning row per key, preferring higher `version`.
    * Deterministic: ties broken by `tiebreak` (pass enough columns for a
    * total order).
    */
  def keepLatest(df: DataFrame, keys: Seq[String], version: Column,
                 tiebreak: Seq[Column] = Nil): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy((version.desc +: tiebreak.map(_.desc)): _*)
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
  }

  /** Merge an incoming batch into a base table: batch rows win on key
    * collision (the ON CONFLICT DO UPDATE semantics), base rows survive
    * otherwise. Implemented as anti-join + union — at scale both sides
    * shuffle once on the key and nothing is buffered per-group.
    */
  def merge(base: DataFrame, batch: DataFrame, keys: Seq[String]): DataFrame = {
    val keyCols = keys.map(col)
    base.join(batch.select(keyCols: _*).distinct(), keys, "left_anti")
      .unionByName(batch)
  }
}
