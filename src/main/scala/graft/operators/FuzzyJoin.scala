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
  * `levenshtein` verify keeps precision).
  *
  * Deletion-≤d blocking (the FastSS scheme) is complete for ANY d:
  * take an optimal edit script from a to b of cost k ≤ d. Delete from
  * a every character the script substitutes or deletes (≤ k chars),
  * and from b every character the script substitutes or inserts
  * (≤ k chars); what remains on both sides is the script's copied
  * characters, in order — the same string. So a's and b's ≤d-deletion
  * neighborhoods intersect, and the equality join finds the pair.
  * maxDist = 2 materializes 1 + |s| + |s|(|s|-1)/2 variants per row —
  * quadratic in string length, fine for name/entity-length values
  * (~200 variants at |s| = 18); it is NOT offered beyond 2 because
  * |s|^d variants overtake the pair verification they avoid.
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

  /** Every string reachable by at most `maxDeletes` single-character
    * deletions: the ≤1 neighborhood applied `maxDeletes` times (each
    * application includes the identity, so depths accumulate). Stays
    * pure column algebra — the variants exist only inside the explode
    * that immediately hashes them.
    */
  def deletionNeighborhood(c: Column, maxDeletes: Int): Column = {
    require(maxDeletes >= 1, s"maxDeletes must be >= 1, got $maxDeletes")
    (2 to maxDeletes).foldLeft(deletionNeighborhood(c)) { (nb, _) =>
      array_distinct(flatten(transform(nb, s => deletionNeighborhood(s))))
    }
  }

  /** All pairs (a_id < b_id) with levenshtein(a_val, b_val) ≤ maxDist.
    * Complete for maxDist ∈ {1, 2} (see blocking argument above).
    *
    * Candidates carry IDS ONLY (16 bytes/pair) through the self-join
    * and dedup — the strings join back by id just for the final
    * verify, the same discipline as the D5/D17 candidate paths (a
    * carry-the-string variant was measured 1.8× SLOWER: the pair
    * dedup widens from two longs to two longs + two strings). The
    * variant hashes come from the codegen
    * [[graft.functions.GraftKernels.deletionHashes]] kernel — the HOF
    * neighborhood (CodegenFallback, |s|+1 string allocations per row)
    * never materializes a variant; any deterministic hash keeps the
    * blocking complete (equal variants ⇒ equal hashes) and the exact
    * `levenshtein` verify keeps precision, so the declared output is
    * unchanged.
    */
  def selfJoin(df: DataFrame, id: String, value: String,
               maxDist: Int = 1): DataFrame = {
    require(maxDist >= 1 && maxDist <= 2,
      "deletion blocking is materialized for maxDist in {1, 2} — " +
        "variant count grows |s|^d (see scaladoc)")
    val base = df.select(col(id).as("__id"), col(value).as("__val"))
    val variants = base
      .select(col("__id"),
        explode(graft.functions.GraftFunctions
          .deletion_hashes(col("__val"), maxDist)).as("__h"))
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
