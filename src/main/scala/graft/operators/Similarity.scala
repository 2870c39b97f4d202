package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.{GraftFunctions, VectorFunctions}

/** Similarity search over embedding columns (SURVEY §2.D6-D7).
  *
  * Brute force is the correctness baseline: broadcast the (small) query
  * set against the corpus — a map-side join, the corpus is streamed
  * once, top-k kept per query via ranked window on (query, score).
  *
  * The scale path buckets both sides with random-hyperplane LSH
  * ([[VectorFunctions.hyperplaneBucket]]): candidates only within a
  * bucket (equality shuffle join), probing neighbor buckets is a
  * recall/cost dial. At 100 TB: corpus bucketed once at write time
  * (bucketed table), queries hashed at read — no corpus shuffle at all.
  */
object Similarity {

  /** Exact top-k cosine neighbors for each query vector.
    * @param queries (qid, qvec) — must be broadcast-small
    * @param corpus  (id, vec)
    */
  def bruteForceKnn(queries: DataFrame, corpus: DataFrame, k: Int): DataFrame = {
    val scored = corpus.join(broadcast(queries), col("qid") =!= col("id"))
      .select(col("qid"), col("id"),
        GraftFunctions.vec_cosine(col("qvec"), col("vec")).as("cos"))
    val w = Window.partitionBy(col("qid"))
      .orderBy(col("cos").desc, col("id"))
    scored.withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k)
      .select(col("qid"), col("id"), col("cos"), col("rk"))
  }

  /** Approximate top-k: candidates restricted to the query's LSH
    * bucket. Lower `planes` → bigger buckets → higher recall & cost.
    */
  def lshKnn(queries: DataFrame, corpus: DataFrame, k: Int,
             planes: Int = 8): DataFrame = {
    val qb = queries.withColumn("bucket",
      GraftFunctions.hyperplane_bucket(col("qvec"), planes))
    val cb = corpus.withColumn("bucket",
      GraftFunctions.hyperplane_bucket(col("vec"), planes))
    val scored = cb.join(broadcast(qb), Seq("bucket"))
      .filter(col("qid") =!= col("id"))
      .select(col("qid"), col("id"),
        GraftFunctions.vec_cosine(col("qvec"), col("vec")).as("cos"))
    val w = Window.partitionBy(col("qid"))
      .orderBy(col("cos").desc, col("id"))
    scored.withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k)
      .select(col("qid"), col("id"), col("cos"), col("rk"))
  }

  /** D5: embedding-cosine near-duplicate pairs above `threshold`,
    * bucketed by LSH so the pairwise check never crosses buckets.
    */
  def cosineNearDup(corpus: DataFrame, threshold: Double,
                    planes: Int = 6): DataFrame = {
    val b = corpus.withColumn("bucket",
      GraftFunctions.hyperplane_bucket(col("vec"), planes))
    val l = b.select(col("bucket"), col("id").as("id_a"), col("vec").as("vec_a"))
    val r = b.select(col("bucket"), col("id").as("id_b"), col("vec").as("vec_b"))
    l.join(r, Seq("bucket"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        GraftFunctions.vec_cosine(col("vec_a"), col("vec_b")).as("cos"))
      .filter(col("cos") >= threshold)
      .distinct()
  }
}
