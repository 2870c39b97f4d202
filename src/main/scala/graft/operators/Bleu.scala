package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Self-BLEU corpus-diversity audit (Papineni et al. 2002's BLEU;
  * Zhu et al. 2018's self-BLEU reading: HIGH pairwise BLEU between a
  * corpus's own documents = homogeneous/templated text, LOW = diverse)
  * — SURVEY §2 D121. The n-gram-overlap complement to D103's
  * Heaps-law growth and D29's within-doc repetition: those see
  * vocabulary and self-copying, this sees CROSS-document phrasal
  * homogeneity per language — the signal that catches mirror-site
  * boilerplate that unigram statistics miss.
  *
  * Pairing convention (published with the statistic): documents pair
  * by doc_id DIV 2 when both halves share a language — a
  * deterministic 1-in-2 pair sample needing NO window and NO shuffle
  * beyond the pair-keyed join (a rank-based pairing would cost a
  * per-lang global sort at corpus scale for zero statistical gain).
  *
  * Per pair: BLEU-2 of the even doc against the odd doc — clipped
  * counts c_n = Σ_g min(count_hyp(g), count_ref(g)) via an INNER join
  * of the two gram censuses (min > 0 needs both sides), modified
  * precisions p_n = c_n/(L_h−n+1), brevity penalty
  * min(1, e^{1−L_r/L_h}), BLEU = BP·√(p₁·p₂); pairs with L_h < 2 or a
  * zero precision score 0 (the standard smoothing-free convention).
  *
  * Scale shape: ONE tokenize pass; gram censuses shuffle on
  * (pair, n, gram) — the chunk-overlap cost class, linear in gram
  * volume; everything after is pair-sized then language-sized.
  * Determinism: counts and lengths exact integers; BLEU is one IEEE
  * tree per pair, nano-quantized (nonnegative ⇒ HALF_UP ≡
  * half-away-from-zero) and summed per language as an EXACT INTEGER.
  */
object Bleu {

  def selfBleu(docs: DataFrame, idCol: String, langCol: String,
               textCol: String): DataFrame = {
    val base = docs.select(col(idCol).cast("long").as("__id"),
      col(langCol).as("lang"),
      LanguageModel.toks(col(textCol)).as("__tk"))
      .withColumn("__p", expr("__id div 2"))
    val h = base.filter(col("__id") % 2 === 0)
      .select(col("__p"), col("lang"), col("__tk").as("__th"))
    val r = base.filter(col("__id") % 2 === 1)
      .select(col("__p"), col("lang").as("__lr"), col("__tk").as("__tr"))
    val pairs = Materialize.cut(
      h.join(r, col("__lr") === col("lang") && r("__p") === h("__p"))
        .select(h("__p"), col("lang"), col("__th"), col("__tr")))
    def bigrams(tk: Column): Column = {
      val m = greatest(size(tk) - 1, lit(0))
      zip_with(slice(tk, lit(1), m), slice(tk, lit(2), m),
        (x, y) => concat(x, lit(" "), y))
    }
    def census(side: Column, cnt: String): DataFrame = pairs
      .select(col("__p"),
        explode(concat(
          transform(side, g => concat(lit("1 "), g)),
          transform(bigrams(side), g => concat(lit("2 "), g)))).as("__g"))
      .groupBy(col("__p"), col("__g")).agg(count(lit(1)).as(cnt))
    val clipped = census(col("__th"), "__ch")
      .join(census(col("__tr"), "__cr"), Seq("__p", "__g"))
      .withColumn("__n", substring(col("__g"), 1, 1))
      .groupBy(col("__p"))
      .agg(sum(when(col("__n") === "1",
          least(col("__ch"), col("__cr")))).cast("long").as("c1"),
        sum(when(col("__n") === "2",
          least(col("__ch"), col("__cr")))).cast("long").as("c2"))
    val scored = pairs
      .select(col("__p"), col("lang"),
        size(col("__th")).cast("long").as("lh"),
        size(col("__tr")).cast("long").as("lr"))
      .join(clipped, Seq("__p"), "left")
      .withColumn("__bleu", {
        val lhD = col("lh").cast("double"); val lrD = col("lr").cast("double")
        val p1 = col("c1").cast("double") / lhD
        val p2 = col("c2").cast("double") / (lhD - 1.0)
        val bp = when(col("lh") >= col("lr"), lit(1.0))
          .otherwise(exp(lit(1.0) - lrD / lhD))
        when(col("lh") >= 2L && coalesce(col("c1"), lit(0L)) > 0L &&
          coalesce(col("c2"), lit(0L)) > 0L,
          bp * sqrt(p1 * p2)).otherwise(lit(0.0))
      })
      .withColumn("__nano", round(col("__bleu") * lit(1e9), 0).cast("long"))
    scored.groupBy(col("lang"))
      .agg(count(lit(1)).cast("long").as("n_pairs"),
        sum(col("__nano")).cast("long").as("__ns"))
      .select(col("lang"), col("n_pairs"),
        round(col("__ns").cast("double") / col("n_pairs").cast("double")
          / lit(1e9), 6).as("self_bleu2"))
      .orderBy(col("lang"))
  }
}
