package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text analysis as pure column expressions (SURVEY §2.D8-D10).
  *
  * Everything here stays inside whole-stage codegen: split / regexp /
  * higher-order array functions, no UDFs. At 100 TB these run as a
  * narrow projection over the scan — no shuffle, no state.
  */
object TextFunctions {

  /** Luhn mod-10 checksum of a digit string (ISO/IEC 7812 — the
    * check every payment-card number carries): position 1 is the
    * RIGHTMOST digit, every even position doubles with the
    * 9-subtraction carry fold. A left fold over the index sequence —
    * pure codegen arithmetic, no UDF; assumes the input is all
    * digits (callers extract candidates with a digit-run regex).
    */
  def luhnSum(digits: Column): Column =
    aggregate(sequence(lit(1), length(digits)), lit(0),
      (acc, i) => {
        val d = ascii(digits.substr(length(digits) - i + lit(1), lit(1))) -
          lit(48)
        val dd = when(i % 2 === 0,
          when(d * 2 > 9, d * 2 - 9).otherwise(d * 2)).otherwise(d)
        acc + dd
      })

  /** True iff the digit string passes the Luhn check — the validation
    * that separates a real card-shaped number from an arbitrary id of
    * the same length (redacting every 13–16 digit run would destroy
    * clean order/reference ids; ~10% of random runs pass by chance,
    * the documented residual).
    */
  def luhnValid(digits: Column): Column = luhnSum(digits) % 10 === 0

  /** Whitespace tokens (trimmed; empty string → single empty token,
    * callers filter if needed — testdata has no empty docs).
    */
  def tokens(c: Column): Column = split(trim(c), "\\s+")

  /** Whitespace token count. */
  def tokenCount(c: Column): Column = size(tokens(c))

  /** Canonical text form for normalization-aware dedup (D85): NFC
    * (composed and decomposed accents unify — the codegen
    * [[GraftFunctions.nfc_norm]] kernel with its all-ASCII fast
    * path), casefold, whitespace runs collapsed to one space, ends
    * trimmed. DuckDB replays it as
    * `trim(regexp_replace(lower(nfc_normalize(text)), '\s+', ' ', 'g'))`.
    */
  def canonicalText(c: Column): Column =
    trim(regexp_replace(lower(GraftFunctions.nfc_norm(c)), "\\s+", " "))

  /** HTML → text extraction (D88): the first stage of any crawl
    * pipeline. Drops script/style payloads and comments (non-greedy,
    * case-insensitive, dot-matches-newline — RE2-compatible patterns
    * with NO backreferences so DuckDB replays them verbatim), strips
    * remaining tags to spaces, decodes the five predefined entities
    * plus nbsp with `&amp;` LAST (double-encoded text stays correct:
    * `&amp;lt;` → `&lt;`), collapses whitespace. Pure codegen string
    * ops — no parser state, no UDF; a malformed-tag-soup page
    * degrades to extra spaces, never an error.
    */
  def htmlToText(c: Column): Column = {
    val noScript = regexp_replace(c, "(?is)<script[^>]*>.*?</script>", " ")
    val noStyle = regexp_replace(noScript, "(?is)<style[^>]*>.*?</style>", " ")
    val noComment = regexp_replace(noStyle, "(?s)<!--.*?-->", " ")
    val noTags = regexp_replace(noComment, "<[^>]+>", " ")
    val decoded = org.apache.spark.sql.functions.replace(
      org.apache.spark.sql.functions.replace(
        org.apache.spark.sql.functions.replace(
          org.apache.spark.sql.functions.replace(
            org.apache.spark.sql.functions.replace(
              noTags, lit("&lt;"), lit("<")),
            lit("&gt;"), lit(">")),
          lit("&quot;"), lit("\"")),
        lit("&#39;"), lit("'")),
      lit("&nbsp;"), lit(" "))
    val ampLast = org.apache.spark.sql.functions.replace(
      decoded, lit("&amp;"), lit("&"))
    trim(regexp_replace(ampLast, "\\s+", " "))
  }

  /** BPE-ish subtoken count: alpha runs, digits, and single
    * non-alphanumeric marks each count as one token. ASCII-only
    * pattern so Java and other regex engines agree.
    */
  def subtokenCount(c: Column): Column =
    size(regexp_extract_all(c, lit("[a-zA-Z]+|[0-9]|[^a-zA-Z0-9 ]"), lit(0)))

  /** Count of tokens contained in `words` (stopword hits). */
  def wordHits(toks: Column, words: Seq[String]): Column = {
    val set = array(words.map(lit): _*)
    size(filter(toks, t => array_contains(set, t)))
  }

  /** Ratio of distinct tokens to tokens (repetition signal). */
  def uniqueTokenRatio(toks: Column): Column =
    size(array_distinct(toks)).cast("double") / size(toks).cast("double")

  /** Composite quality score in [0,~1]: length prior, lexical
    * diversity, stopword presence. Weights are fixed doubles; all
    * arithmetic in double over integer counts → engine-reproducible.
    */
  def qualityScore(text: Column): Column = {
    val toks = tokens(text)
    val nTok = size(toks).cast("double")
    val lenScore = least(nTok / lit(64.0), lit(1.0))
    val diversity = uniqueTokenRatio(toks)
    val stopRatio = wordHits(toks, LangMarkers.en).cast("double") / nTok
    lit(0.4) * lenScore + lit(0.4) * diversity + lit(0.2) * least(stopRatio * lit(8.0), lit(1.0))
  }

  /** Marker (stopword) lists per language for the n-gram/stopword
    * language-ID heuristic. Real function words; on synthetic corpora
    * the argmax is still fully deterministic.
    */
  object LangMarkers {
    val en = Seq("the", "a", "of", "and", "to", "in", "is")
    val fr = Seq("le", "la", "et", "les", "des", "un", "une")
    val de = Seq("der", "die", "und", "das", "ein", "nicht")
    val es = Seq("el", "los", "y", "que", "un", "una", "en")
  }

  /** Language ID: stopword-hit score per language, deterministic
    * argmax with fixed priority (en > fr > de > es > unknown). A text
    * with no marker hits is 'und' (undetermined).
    */
  def langId(text: Column): Column = {
    val toks = tokens(text)
    val en = wordHits(toks, LangMarkers.en)
    val fr = wordHits(toks, LangMarkers.fr)
    val de = wordHits(toks, LangMarkers.de)
    val es = wordHits(toks, LangMarkers.es)
    val best = greatest(en, fr, de, es)
    when(best === 0, lit("und"))
      .when(en === best, lit("en"))
      .when(fr === best, lit("fr"))
      .when(de === best, lit("de"))
      .otherwise(lit("es"))
  }

  /** Word n-gram shingles as strings ("w1 w2 … wn"). Documents shorter
    * than n yield an empty array.
    */
  def shingles(toks: Column, n: Int): Column =
    // guard: sequence(0, -1) would count DOWN, not produce empty
    when(size(toks) < n, array().cast("array<string>"))
      .otherwise(transform(sequence(lit(0), size(toks) - n), i =>
        concat_ws(" ", (0 until n).map(j => element_at(toks, i + j + 1)): _*)))

  /** Jaccard similarity of two string arrays (as distinct sets),
    * |A∩B| / |A∪B| in double.
    */
  def jaccard(a: Column, b: Column): Column = {
    val da = array_distinct(a)
    val db = array_distinct(b)
    val inter = size(array_intersect(da, db)).cast("double")
    (inter / (size(da) + size(db) - size(array_intersect(da, db))).cast("double"))
  }
}
