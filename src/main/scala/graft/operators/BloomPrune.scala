package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal, XxHash64}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.BinaryType
import org.apache.spark.util.sketch.BloomFilter

/** Bloom-filter join pruning (SURVEY §2.C16).
  *
  * The dominant cost of a large fact⋈dim join at 100 TB is shuffling
  * fact rows that will never match. Catalyst's own runtime filtering
  * (`InjectRuntimeFilter`) only fires on plans it recognizes; this
  * operator makes the same trick explicit and composable: build a
  * bloom filter over the dim keys with a distributed aggregate (the
  * same `BloomFilterAggregate` Spark's rule uses — partial filters
  * merge map-side, only the ~MiB filter reaches the driver), then
  * pre-filter the fact side with a codegen `might_contain` BEFORE its
  * exchange. Rows shuffled drop from |fact| to |matches| + fpp·|rest|;
  * the equality join after the filter keeps the result exact, so false
  * positives cost only wasted shuffle, never wrong answers.
  *
  * Unlike a broadcast semi-join prune, the filter size is set by
  * (expectedItems, fpp) — ~1.2 MiB per million keys at 1% — so it
  * stays broadcastable even when the dim key set itself would not be.
  */
object BloomPrune {

  /** Distributed bloom build over `key`. One narrow aggregate job; the
    * returned blob is `optimalNumOfBits(expectedItems, fpp)` bits
    * (~1.2 MiB per million keys at 1%). Overshooting `expectedItems`
    * is safe (fpp degrades gracefully); size the estimate from table
    * stats, not a count job. Mind the blob itself at very large key
    * counts — it ships to every probe task as a literal, so beyond a
    * few tens of millions of keys a broadcast semi-join prunes better
    * than a filter this size.
    *
    * `BloomFilterAggregate` silently clamps its size against the
    * runtime-filter SQLConf caps (4M items / 67M bits by default —
    * they exist to bound Catalyst's own injected filters). An
    * explicit build must honor the requested size, so the caps are
    * raised for this one job and restored after.
    */
  def buildBloom(df: DataFrame, key: Column,
                 expectedItems: Long, fpp: Double = 0.01): Array[Byte] = {
    require(expectedItems > 0, "expectedItems must be positive")
    val numBits = BloomFilter.optimalNumOfBits(expectedItems, fpp)
    val agg = new BloomFilterAggregate(
      XxHash64(Seq(ColumnBridge.expression(key)), 42L),
      Literal(expectedItems), Literal(numBits)).toAggregateExpression()
    val conf = df.sparkSession.conf
    val itemsKey = "spark.sql.optimizer.runtime.bloomFilter.maxNumItems"
    val bitsKey = "spark.sql.optimizer.runtime.bloomFilter.maxNumBits"
    val prevItems = conf.getOption(itemsKey)
    val prevBits = conf.getOption(bitsKey)
    def restore(k: String, prev: Option[String]): Unit = prev match {
      case Some(v) => conf.set(k, v)
      case None    => conf.unset(k)
    }
    conf.set(itemsKey, math.max(expectedItems, 4000000L).toString)
    conf.set(bitsKey, math.max(numBits, 67108864L).toString)
    try df.select(ColumnBridge.column(agg).as("bloom")).head().getAs[Array[Byte]](0)
    finally { restore(itemsKey, prevItems); restore(bitsKey, prevBits) }
  }

  /** Codegen membership probe against a built filter (hash-compatible
    * with [[buildBloom]]: both sides go through XxHash64).
    */
  def mightContain(bloom: Array[Byte], key: Column): Column =
    ColumnBridge.column(BloomFilterMightContain(
      Literal(bloom, BinaryType),
      XxHash64(Seq(ColumnBridge.expression(key)), 42L)))

  /** Equi-join with the fact side bloom-pruned before its shuffle.
    * Result is EXACTLY `fact ⋈ dim` — the filter only removes rows the
    * join would drop anyway.
    */
  def pruneJoin(fact: DataFrame, dim: DataFrame,
                factKey: String, dimKey: String,
                expectedDimKeys: Long, fpp: Double = 0.01): DataFrame = {
    val bloom = buildBloom(dim, col(dimKey), expectedDimKeys, fpp)
    val pruned = fact.filter(mightContain(bloom, col(factKey)))
    // dataset-qualified condition: bare col() is ambiguous when both
    // sides share the key name
    if (factKey == dimKey) pruned.join(dim, Seq(factKey))
    else pruned.join(dim, pruned(factKey) === dim(dimKey))
  }
}
