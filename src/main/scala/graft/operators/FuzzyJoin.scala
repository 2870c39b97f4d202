package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Fuzzy (edit-distance) similarity join via deletion-neighborhood
  * blocking.
  *
  * Entity metadata arrives misspelled — the reference hand-fixes player
  * name drift between its CSV and API sources (fpl-data-pipeline
  * includes.py's name-keyed merges silently drop mismatches); a corpus
  * pipeline needs the general tool: all record pairs within edit
  * distance 1, WITHOUT the all-pairs comparison.
  *
  * Blocking: two strings at Levenshtein distance ≤ 1 always share a
  * member of each other's deletion-1 neighborhood (the string itself
  * plus each single-character deletion) — equal strings share the
  * string, a substitution at i shares the delete-at-i variant, an
  * insertion shares the shorter string itself. So exploding each row
  * into its |s|+1 variants and equality-joining on the variant finds
  * EVERY qualifying pair (candidates are a superset; an exact
  * `levenshtein` verify keeps precision). Deletion-2 neighborhoods
  * generalize to maxDist 2 at |s|²/2 variants per row — quadratic in
  * string length, deliberately not materialized here.
  *
  * Scale shape: the exchange carries (xxhash64(variant), id, value) —
  * the 8-byte hash replaces the variant string, exactly like the
  * posting index in [[Dedup.similarityJoinEdges]] (hash collisions can
  * only ADD candidates; the verify removes them). Candidate volume is
  * Σ bucket² over variant buckets — bounded by true near-duplicate
  * density, not corpus size; AQE's skew join splits hot variants. The
  * all-pairs alternative is O(n²) comparisons; this is O(n·len) explode
  * + an equality join.
  */
object FuzzyJoin {

  /** The string itself plus every single-character deletion. */
  def deletionNeighborhood(c: Column): Column =
    array_distinct(concat(
      array(c),
      transform(sequence(lit(1), length(c)),
        i => concat(c.substr(lit(1), i - lit(1)),
          c.substr(i + lit(1), length(c) - i)))))

  /** All pairs (a_id < b_id) with levenshtein(a_val, b_val) ≤ maxDist.
    * Complete for maxDist = 1 (see blocking argument above).
    *
    * Candidates carry IDS ONLY (16 bytes/pair) through the self-join
    * and dedup — the strings join back by id just for the final
    * verify, the same discipline as the D5/D17 candidate paths.
    */
  def selfJoin(df: DataFrame, id: String, value: String,
               maxDist: Int = 1): DataFrame = {
    require(maxDist == 1,
      "deletion-1 blocking is complete only for maxDist = 1")
    val base = df.select(col(id).as("__id"), col(value).as("__val"))
    val variants = base
      .select(col("__id"),
        explode(deletionNeighborhood(col("__val"))).as("__v"))
      .select(col("__id"), xxhash64(col("__v")).as("__h"))
    val a = variants.toDF("a_id", "__h")
    val b = variants.toDF("b_id", "__h")
    a.join(b, "__h")
      .filter(col("a_id") < col("b_id"))
      .select("a_id", "b_id")
      .distinct()
      .join(base.toDF("a_id", "a_val"), "a_id")
      .join(base.toDF("b_id", "b_val"), "b_id")
      .withColumn("dist", levenshtein(col("a_val"), col("b_val")))
      .filter(col("dist") <= maxDist)
      .select("a_id", "a_val", "b_id", "b_val", "dist")
  }
}
