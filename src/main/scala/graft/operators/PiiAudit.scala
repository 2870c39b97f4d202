package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** PII density audit per provenance (SURVEY §2 D126) — the corpus
  * card's compliance row: how many email-shaped and long-digit-run
  * (phone/account/card candidate) spans per 1,000 tokens does each
  * source ship? The number that decides which sources need the D84
  * redaction pass BEFORE they enter the mix, and the regression
  * alarm when a previously-clean source starts leaking (an upstream
  * scraper change, a new form-dump in the crawl).
  *
  * Pure row-local pattern censuses (the D84 regex family) → one
  * group-keyed partial-agg'd shuffle; every count an exact integer,
  * each published rate ONE IEEE divide, 6-dp rounded. Patterns are
  * declared conventions published with the audit (like bin edges):
  * `[a-z0-9.]+@[a-z0-9.]+` and `[0-9]{7,}` — both dialect-neutral
  * across Java/RE2 regex engines.
  */
object PiiAudit {

  /** The deterministic synthetic-marker embedding BOTH the batch D126
    * face and the E32 stream face ride (the synthetic corpus carries
    * no PII; the machinery is what's gated) — change the convention
    * here, nowhere else, or the stream ≡ batch invariant and the
    * shared oracle break silently.
    */
  def syntheticMarkers(docId: Column, text: Column): Column =
    concat(text,
      when(docId % 3 === 0,
        concat(lit(" contact user"), docId.cast("string"),
          lit("@example.com"))).otherwise(lit("")),
      when(docId % 5 === 0,
        concat(lit(" tel "),
          lpad(((docId * 7919 + 13) % 10000000L).cast("string"), 7, "0")))
        .otherwise(lit("")))

  def densityByGroup(docs: DataFrame, group: Column,
                     textCol: Column): DataFrame = {
    val toks = LanguageModel.toks(textCol)
    val perDoc = docs.select(group.as("source"),
      size(toks).cast("long").as("__tok"),
      size(regexp_extract_all(textCol, lit("[a-z0-9.]+@[a-z0-9.]+"),
        lit(0))).cast("long").as("__em"),
      size(regexp_extract_all(textCol, lit("[0-9]{7,}"), lit(0)))
        .cast("long").as("__dg"))
    rates(perDoc.groupBy(col("source"))
      .agg(count(lit(1)).cast("long").as("n_docs"),
        sum(col("__tok")).cast("long").as("n_tokens"),
        sum(col("__em")).cast("long").as("email_hits"),
        sum(col("__dg")).cast("long").as("digit_run_hits")))
  }

  /** The rate finisher over an already-summed per-source frame —
    * the single definition the batch face and E32's stream face
    * (which maintains the four counters additively in the lake)
    * both ride, the `benfordFromCounts` pattern. Expects columns
    * (source, n_docs, n_tokens, email_hits, digit_run_hits).
    */
  def rates(suff: DataFrame): DataFrame =
    suff.select(col("source"), col("n_docs"), col("n_tokens"),
        col("email_hits"), col("digit_run_hits"),
        when(col("n_tokens") > 0L, round(
          col("email_hits").cast("double") * 1000.0
            / col("n_tokens").cast("double"), 6)).as("emails_per_1k"),
        when(col("n_tokens") > 0L, round(
          col("digit_run_hits").cast("double") * 1000.0
            / col("n_tokens").cast("double"), 6)).as("digit_runs_per_1k"))
      .orderBy(col("source"))
}
