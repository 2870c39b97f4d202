package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Count-min-sketch heavy hitters (SURVEY §2.D22).
  *
  * Exact vocabulary counts shuffle the whole token domain
  * ([[graft.queries.ExtendedQueries.vocabTopWords]] — fine while the
  * vocabulary fits a shuffle, wrong at open-web scale). The sketch
  * path: one pass folds every occurrence into a fixed-size count-min
  * sketch (commutative counter sums — mergeable map-side, identical
  * under any partitioning); candidates are nominated by a seeded hash
  * of each (id, element) OCCURRENCE — an element occurring f times
  * survives nomination with prob 1-(1-1/r)^f, near 1 for anything
  * heavy — and are scored against the broadcast sketch per partition.
  * No wide shuffle anywhere; memory fixed by (eps, confidence).
  *
  * CMS never undercounts (est ≥ true; over by ≤ eps·N with prob ≥
  * confidence), so top-k by estimate can only miss a true heavy
  * hitter if nomination missed every one of its occurrences.
  */
object HeavyHitters {

  /** Top-k elements by estimated frequency.
    * @param df  one row per occurrence
    * @param id  occurrence context (e.g. doc id) — only used to make
    *            each occurrence's nomination coin independent
    * @param sampleOneIn nomination rate r: occurrence rows with
    *        xxhash64(seed, id, elem) mod r == 0 nominate their element
    */
  def topK(df: DataFrame, id: Column, elem: Column, k: Int,
           eps: Double = 0.001, confidence: Double = 0.99,
           sampleOneIn: Int = 10, seed: Int = 42): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val occ = df.select(id.as("i"), elem.as("e"))
    val sketchBytes = occ
      .agg(count_min_sketch(col("e"), lit(eps), lit(confidence), lit(seed)))
      .head().getAs[Array[Byte]](0)
    val bc = spark.sparkContext.broadcast(sketchBytes)
    occ
      .filter(pmod(xxhash64(lit(seed.toLong), col("i"), col("e")),
        lit(sampleOneIn.toLong)) === 0)
      .select(col("e")).distinct().as[String]
      .mapPartitions { it =>
        val sketch = org.apache.spark.util.sketch.CountMinSketch
          .readFrom(new java.io.ByteArrayInputStream(bc.value))
        it.map(c => (c, sketch.estimateCount(c)))
      }
      .toDF("word", "est_freq")
      .orderBy(col("est_freq").desc, col("word"))
      .limit(k)
  }
}
