package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Count-min-sketch heavy hitters (SURVEY §2.D22).
  *
  * Exact vocabulary counts shuffle the whole token domain
  * ([[graft.queries.ExtendedQueries.vocabTopWords]] — fine while the
  * vocabulary fits a shuffle, wrong at open-web scale). The sketch
  * path: two narrow passes over the (persisted) occurrence set — one
  * folds every occurrence into a fixed-size count-min sketch
  * (commutative counter sums — mergeable map-side, identical under
  * any partitioning); the other nominates candidates by a seeded hash
  * of each occurrence's unique id — an element occurring f times
  * survives nomination with prob 1-(1-1/r)^f, near 1 for anything
  * heavy, PROVIDED the id really is unique per occurrence — and
  * scores nominees against the broadcast sketch per partition.
  * No wide shuffle anywhere; memory fixed by (eps, confidence).
  *
  * CMS never undercounts (est ≥ true; over by ≤ eps·N with prob ≥
  * confidence), so top-k by estimate can only miss a true heavy
  * hitter if nomination missed every one of its occurrences.
  */
object HeavyHitters {

  /** Top-k elements by estimated frequency. Elements are treated as
    * strings (cast on both the sketch and probe side, so the hashes
    * agree).
    *
    * @param df  one row per occurrence
    * @param id  a per-OCCURRENCE-unique id (e.g. struct(doc_id, token
    *            position)). A merely per-(doc, element) id collapses
    *            repeated occurrences to one nomination coin and voids
    *            the survival guarantee for elements concentrated in
    *            few docs.
    * @param sampleOneIn nomination rate r: occurrence rows with
    *        xxhash64(seed, id) mod r == 0 nominate their element
    * @param storage how to hold the occurrence set between the two
    *        passes. The default spills to disk rather than pinning a
    *        near-corpus-sized cache in executor memory; pass
    *        `StorageLevel.NONE` to recompute the scan per pass instead
    *        of materializing at all (right when the upstream scan is
    *        cheaper than corpus-sized disk)
    */
  def topK(df: DataFrame, id: Column, elem: Column, k: Int,
           eps: Double = 0.001, confidence: Double = 0.99,
           sampleOneIn: Int = 10, seed: Int = 42,
           storage: StorageLevel = StorageLevel.MEMORY_AND_DISK): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val occ0 = df.select(id.as("i"), elem.cast("string").as("e"))
    val occ = if (storage == StorageLevel.NONE) occ0 else occ0.persist(storage)
    try {
      val sketchBytes = occ
        .agg(count_min_sketch(col("e"), lit(eps), lit(confidence), lit(seed)))
        .head().getAs[Array[Byte]](0)
      val bc = spark.sparkContext.broadcast(sketchBytes)
      occ
        .filter(pmod(xxhash64(lit(seed.toLong), col("i")),
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
        .localCheckpoint() // materialize before unpersisting occ
    } finally if (storage != StorageLevel.NONE) occ.unpersist()
  }
}
