package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** BPE vocabulary training (Sennrich et al. 2016) — learns the
  * subword inventory that [[graft.functions.GreedyTokenize]] (D34)
  * consumes, closing the loop from "tokenize with a given vocab" to
  * "train the vocab from the corpus".
  *
  * Spark-first split of the work: the CORPUS pass is one
  * explode→partial-agg shuffle down to the distinct-word frequency
  * table, cut to the top `wordCap` words by a TakeOrdered (no full
  * sort) — the standard trick every production tokenizer trainer
  * (sentencepiece, HF tokenizers) uses, because pair statistics are
  * dominated by frequent words and the rare tail contributes noise.
  * The MERGE loop then runs driver-side over that ≤`wordCap`-row
  * table: each iteration is a pair-count over ~10⁵ short arrays —
  * milliseconds, and inherently sequential (merge i+1's counts depend
  * on merge i), so distributing it would only add 2·numMerges
  * shuffles. At 100 TB only the word-count pass sees the corpus.
  *
  * Determinism: the word cut orders by (count desc, word), the merge
  * pick by (pair count desc, pair lexicographic), and within-word
  * replacement scans left to right — two trainings of the same corpus
  * produce identical merge lists, so the trained vocab can be embedded
  * in a Verify-time oracle exactly like the ANN codebooks.
  */
object Bpe {

  /** Ordered merge list + the resulting multi-char vocab (merge
    * products, first-created first). Single codepoints are not listed:
    * they are [[graft.functions.GreedyTokenize]]'s implicit fallback
    * alphabet.
    */
  final case class Trained(merges: Seq[(String, String)], vocab: Seq[String])

  private val cache =
    new java.util.concurrent.ConcurrentHashMap[String, Trained]()

  def trainCached(key: String, corpus: DataFrame, textCol: String,
                  numMerges: Int, wordCap: Int = 65536): Trained =
    cache.computeIfAbsent(s"$key|m=$numMerges|cap=$wordCap",
      _ => train(corpus, textCol, numMerges, wordCap))

  /** The corpus-facing pass: whitespace words → (word, count), top
    * `wordCap` by (count desc, word) — plans as TakeOrdered over the
    * partial-aggregated word table, so no full sort and the collect is
    * bounded by construction.
    */
  def wordCounts(corpus: DataFrame, textCol: String,
                 wordCap: Int): Seq[(String, Long)] =
    corpus
      .select(explode(split(trim(col(textCol)), "\\s+")).as("w"))
      .filter(length(col("w")) > 0)
      .groupBy(col("w")).agg(count(lit(1)).as("c"))
      .orderBy(col("c").desc, col("w"))
      .limit(wordCap)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq

  def train(corpus: DataFrame, textCol: String, numMerges: Int,
            wordCap: Int = 65536): Trained =
    trainFromCounts(wordCounts(corpus, textCol, wordCap), numMerges)

  /** The classic merge loop over a word-frequency table. Words split
    * into codepoint symbols; each round counts adjacent symbol pairs
    * weighted by word frequency, merges the most frequent pair
    * (ties to the lexicographically smallest), and stops early when
    * no pair repeats (max count < 2 — merging a singleton pair can
    * never help compression).
    */
  def trainFromCounts(counts: Seq[(String, Long)],
                      numMerges: Int): Trained = {
    var words: Array[(Array[String], Long)] = counts.toArray.map {
      case (w, c) =>
        (w.codePoints().toArray.map(cp => new String(Character.toChars(cp))), c)
    }
    val merges = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    var round = 0
    var done = false
    while (round < numMerges && !done) {
      val pairCounts =
        scala.collection.mutable.HashMap.empty[(String, String), Long]
      words.foreach { case (syms, c) =>
        var j = 0
        while (j < syms.length - 1) {
          val p = (syms(j), syms(j + 1))
          pairCounts.update(p, pairCounts.getOrElse(p, 0L) + c)
          j += 1
        }
      }
      val best = pairCounts.foldLeft(Option.empty[((String, String), Long)]) {
        case (acc, (p, c)) => acc match {
          case Some((bp, bc))
            if bc > c || (bc == c && orderPair(bp, p) <= 0) => acc
          case _ => Some((p, c))
        }
      }
      best match {
        case Some((pair, c)) if c >= 2 =>
          merges += pair
          words = words.map { case (syms, wc) => (mergeWord(syms, pair), wc) }
        case _ => done = true
      }
      round += 1
    }
    Trained(merges.toSeq, merges.map { case (a, b) => a + b }.distinct.toSeq)
  }

  /** Left-to-right non-overlapping replacement of the pair. */
  private def mergeWord(syms: Array[String],
                        pair: (String, String)): Array[String] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var j = 0
    while (j < syms.length) {
      if (j < syms.length - 1 && syms(j) == pair._1 && syms(j + 1) == pair._2) {
        out += pair._1 + pair._2
        j += 2
      } else {
        out += syms(j)
        j += 1
      }
    }
    out.toArray
  }

  private def orderPair(a: (String, String), b: (String, String)): Int = {
    val c1 = a._1.compareTo(b._1)
    if (c1 != 0) c1 else a._2.compareTo(b._2)
  }

  /** The longest-match bound [[graft.functions.GreedyTokenize]] and
    * its oracle need — max codepoint length over the trained vocab
    * (≥ 2 so the oracle's CASE chain is never empty).
    */
  def maxTokenLen(t: Trained): Int =
    t.vocab.map(v => v.codePointCount(0, v.length)).foldLeft(2)(math.max)
}
