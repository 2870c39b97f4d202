package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Exact character-level repeated-span removal — the byte-level
  * memorization control of "Deduplicating Training Data Makes
  * Language Models Better" (Lee et al. 2022), where a suffix array
  * over the concatenated corpus finds every substring of length ≥ L
  * occurring ≥ minCount times and the duplicated bytes are removed.
  *
  * [[Dedup.stripRepeatedSpans]] is the fixed-n WORD-gram
  * approximation; this operator is exact at the character level via
  * the standard reduction that makes the suffix array unnecessary for
  * the REMOVAL semantics:
  *
  *   a position is covered by some repeated substring of length ≥ L
  *   iff it is covered by some repeated substring of length EXACTLY L
  *
  * (⇒ every occurrence of a repeat s with |s| = m ≥ L repeats each of
  * its length-L windows wherever s occurs, and some window covers the
  * position; ⇐ an exact-L repeat IS a ≥L repeat). The same holds per
  * occurrence-count threshold: each window of s occurs at least as
  * often as s. So counting positional L-grams — the same
  * occurrence-join shape as the word-level operator — yields exactly
  * the positions a suffix-array pass would mark, without
  * materializing suffixes.
  *
  * Scale shape (the suffix array itself would be a full corpus sort):
  *  1. per-doc window hashes from the O(n) rolling kernel
  *     ([[graft.functions.GraftKernels.charWindowHashes]]) — gram
  *     STRINGS never materialize in the nominate pass, which the
  *     substring alternative paid O(n·L) compute and bytes for
  *     (measured 7× the whole-operator time at the ×10 probe);
  *  2. the counting exchange carries those 8-byte hashes with
  *     map-side combine;
  *  3. hot HASHES (count ≥ minCount) join back onto occurrences;
  *     only the SURVIVORS fetch their substring (join back to the doc
  *     text by id) and are re-counted on the exact gram — a hash
  *     collision can nominate a candidate but never remove a byte
  *     (same nominate-then-verify discipline as the MinHash/SimHash
  *     family), and survivor volume is bounded by true repeat volume;
  *  4. covered positions fold to one int-set per doc and the rewrite
  *     is positional — documents never re-assemble from an exploded
  *     shuffle.
  *
  * Like [[Dedup.stripRepeatedSpans]], the input subtree runs under
  * several legs of the plan — `persist()` the input at corpus scale
  * (caller-owned; see that operator's scaladoc for why).
  *
  * Returns (id, clean_text, n_removed) where n_removed counts removed
  * characters. Deterministic; DuckDB-oracled as `dedup_char_spans`.
  */
object SuffixDedup {

  /** Positional window hashes: (id, pos [1-based], h) from the O(n)
    * rolling kernel (empty for docs shorter than L).
    */
  private def occHashes(df: DataFrame, textCol: String, idCol: String,
                        len: Int): DataFrame =
    df.select(col(idCol).as("id"),
        posexplode(graft.functions.GraftFunctions
          .char_window_hashes(col(textCol), len)).as(Seq("__p0", "h")))
      .select(col("id"), (col("__p0") + 1).as("pos"), col("h"))

  /** Every occurrence of an exact-verified hot gram: (id, pos, gram).
    * Hash-count nominates; survivors join their doc text back by id,
    * extract the real substring, and re-count on it — complete because
    * ALL occurrences of a gram share its hash, so a surviving hash
    * carries every occurrence into the exact count.
    */
  private def hotOccurrences(df: DataFrame, textCol: String, idCol: String,
                             len: Int, minCount: Long): DataFrame = {
    val occ = occHashes(df, textCol, idCol, len)
    val hotHash = occ.groupBy(col("h"))
      .agg(count(lit(1)).as("__cnt"))
      .filter(col("__cnt") >= minCount)
      .select(col("h"))
    // survivor volume is bounded by TRUE repeat volume (plus the odd
    // hash collision), so the nominated frame is small — cut it once
    // and both exact-verify consumers (the gram re-count and the final
    // join) read the materialized rows instead of each re-running the
    // corpus-wide rolling-hash posexplode subtree (3 full passes → 2)
    val survG = Materialize.cut(occ.join(hotHash, "h")
      .join(df.select(col(idCol).as("id"), col(textCol).as("__t")), "id")
      .select(col("id"), col("pos"),
        col("__t").substr(col("pos"), lit(len)).as("gram")))
    val hotG = survG.groupBy(col("gram"))
      .agg(count(lit(1)).as("__cnt"))
      .filter(col("__cnt") >= minCount)
      .select(col("gram"))
    survG.join(hotG, "gram").select(col("id"), col("pos"), col("gram"))
  }

  /** Char-level decontamination (SURVEY §2.D74): flag corpus docs
    * sharing any EXACT substring of length `len` with a benchmark
    * doc. The D19 token-8-gram screen misses overlap that crosses
    * token boundaries differently (reflowed whitespace, inserted
    * punctuation shifting tokenization); an exact char window is the
    * strictest practical overlap test — the same exact-L reduction
    * as [[stripRepeatedCharSpans]]: any shared substring of length
    * ≥ len contains a shared exact-len window, so screening at
    * exactly `len` is complete for the ≥ len contract.
    *
    * Scale shape — the benchmark side is small by definition: its
    * gram-HASH set broadcasts (8 B per window), so the corpus pays
    * ONE rolling-hash scan and a broadcast semi-join — corpus gram
    * STRINGS materialize only for hash-nominated candidates, which
    * then exact-verify against the bench gram strings (hash
    * collisions cannot flag a clean doc).
    *
    * @return (id, n_shared_grams) — one row per CONTAMINATED corpus
    *         doc with its count of distinct shared windows.
    */
  def charContamination(corpus: DataFrame, bench: DataFrame,
                        textCol: String, idCol: String,
                        len: Int = 30): DataFrame = {
    require(len >= 8, s"charContamination: len must be >= 8, got $len")
    val benchOcc = occHashes(bench, textCol, idCol, len)
    val benchH = benchOcc.select(col("h")).distinct()
    val benchGrams = benchOcc
      .join(bench.select(col(idCol).as("id"), col(textCol).as("__t")), "id")
      .select(col("__t").substr(col("pos"), lit(len)).as("gram"))
      .distinct()
    val cand = occHashes(corpus, textCol, idCol, len)
      .join(broadcast(benchH), "h")
    val corpGrams = cand
      .join(corpus.select(col(idCol).as("id"), col(textCol).as("__t")), "id")
      .select(col("id"),
        col("__t").substr(col("pos"), lit(len)).as("gram"))
      .distinct()
    corpGrams.join(broadcast(benchGrams), "gram")
      .groupBy(col("id"))
      .agg(count(lit(1)).as("n_shared_grams"))
  }

  /** Remove every character position covered by a substring of length
    * ≥ `minLen` that occurs ≥ `minCount` times across the corpus
    * (occurrences = (doc, position) pairs; overlapping self-repeats
    * within one doc count, exactly as in a suffix array).
    */
  def stripRepeatedCharSpans(df: DataFrame, textCol: String, idCol: String,
                             minLen: Int = 20,
                             minCount: Long = 2): DataFrame = {
    require(minLen > 0,
      s"stripRepeatedCharSpans: minLen must be positive, got $minLen")
    require(minCount >= 2,
      s"stripRepeatedCharSpans: minCount < 2 would remove every char, got $minCount")
    // fold hot START positions per doc (collect_set of the starts —
    // `minLen`× fewer shuffled rows than exploding every covered
    // position) and expand ∪[pos, pos+L−1] inside the one-pass rewrite
    // kernel; the result string is identical to the old
    // explode/collect_set/array_contains formulation, which paid an
    // O(n·|cov|) non-codegen HOF probe plus n one-char substrings per
    // doc
    val covered = hotOccurrences(df, textCol, idCol, minLen, minCount)
      .groupBy(col("id")).agg(collect_set(col("pos")).as("cov"))
    val text = col(textCol)
    df.select(col(idCol).as("id"), text.as("__t"))
      .join(covered, Seq("id"), "left")
      .withColumn("cov", coalesce(col("cov"), array().cast("array<int>")))
      // coalesce matches the HOF formulation's null-text edge (it
      // built "" from an empty position array; the kernel is null-safe)
      .withColumn("clean_text", coalesce(graft.functions.GraftFunctions
        .strip_covered_windows(col("__t"), col("cov"), minLen), lit("")))
      .select(col("id"), col("clean_text"),
        (length(col("__t")) - length(col("clean_text"))).as("n_removed"))
  }

  /** The suffix array's other classic answer: the corpus-wide LONGEST
    * substring occurring ≥ `minCount` times, by binary search over the
    * length (a repeat of length m implies repeats at every length
    * < m, so existence is monotone in L). Each probe is one
    * hash-counting pass — O(log maxLen) Spark jobs total, each the
    * same light exchange as [[stripRepeatedCharSpans]] step 2, against
    * a suffix array's full corpus sort.
    *
    * Returns (span, len, n_occurrences) — one row, the lexicically
    * smallest span at the maximal length (deterministic tie-break), or
    * an empty frame if even length-1 repeats are absent.
    */
  def longestRepeatedSpan(df: DataFrame, textCol: String, idCol: String,
                          minCount: Long = 2,
                          maxLenCap: Int = 10000): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    // exact-gram existence at length L (hash-nominate, exact-verify)
    def existsAt(len: Int): Boolean =
      !hotOccurrences(df, textCol, idCol, len, minCount).isEmpty
    val maxDoc = df.agg(max(length(col(textCol)))).head() match {
      case r if r.isNullAt(0) => 0
      case r => r.getInt(0)
    }
    var lo = 0 // longest length known to repeat
    var hi = math.min(maxDoc, maxLenCap) + 1 // shortest known not to
    if (hi > 1 && existsAt(1)) {
      lo = 1
      while (lo + 1 < hi) {
        val mid = lo + (hi - lo) / 2
        if (existsAt(mid)) lo = mid else hi = mid
      }
    }
    if (lo == 0)
      Seq.empty[(String, Int, Long)].toDF("span", "len", "n_occurrences")
    else
      hotOccurrences(df, textCol, idCol, lo, minCount)
        .groupBy(col("gram")).agg(count(lit(1)).as("n_occurrences"))
        .orderBy(col("gram")).limit(1)
        .select(col("gram").as("span"), lit(lo).as("len"),
          col("n_occurrences"))
  }
}
