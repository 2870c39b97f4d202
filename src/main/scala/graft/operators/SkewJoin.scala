package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Salted join for skewed keys (SURVEY §4).
  *
  * AQE's skew-join split handles most skew at runtime; salting is the
  * explicit fallback when one key dominates so badly that even split
  * partitions overwhelm a task (the classic web-scale "null key" /
  * "default id" hot spot), or when AQE is unavailable (streaming
  * joins).
  *
  * Left side gets a uniform random-free salt derived from a hash of
  * the whole row (deterministic); right side explodes ×saltFactor so
  * every (key, salt) pair exists. Shuffle width grows by saltFactor on
  * the (small) right side only; the hot key spreads across saltFactor
  * tasks.
  */
object SkewJoin {

  def saltedInnerJoin(big: DataFrame, small: DataFrame, keys: Seq[String],
                      saltFactor: Int): DataFrame = {
    require(saltFactor > 0)
    val bigSalted = big.withColumn("__salt",
      pmod(xxhash64(struct(big.columns.map(col): _*)), lit(saltFactor)).cast("int"))
    val smallExploded = small.withColumn("__salt",
      explode(sequence(lit(0), lit(saltFactor - 1))))
    bigSalted.join(smallExploded, keys :+ "__salt")
      .drop("__salt")
  }
}
