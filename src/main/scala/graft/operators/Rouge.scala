package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.ShingleFunctions

/** D92: ROUGE-N overlap between paired texts (Lin 2004 — the n-gram
  * recall/precision family summarization and RAG evaluation report;
  * in a data pipeline it grades candidate-vs-reference pairs at
  * corpus scale: distillation outputs vs teacher references,
  * rewritten docs vs originals, near-dup pairs' asymmetry).
  *
  * ROUGE uses CLIPPED (multiset) counts — overlap = Σ_g min(c_ref(g),
  * c_cand(g)) — which the set-based Jaccard family (D4) cannot see.
  * The multiset intersection runs RELATIONALLY: each side explodes to
  * (pair, gram) counts (partial-aggregated — the shuffle carries
  * gram counts, never gram instances), one equi-join on (pair, gram),
  * one partial-agg'd Σ min back to pair grain. At 100 TB that is the
  * D50 cost class: two gram-keyed shuffles bounded by corpus gram
  * volume, no pair blow-up beyond the caller's pairing.
  *
  * Published numbers are engine-exact: integer counts under single
  * int→double divides (recall o/n_ref, precision o/n_cand, and F1 as
  * the ONE-divide identity 2o/(n_ref+n_cand) — algebraically
  * 2PR/(P+R), computed without the intermediate ratios so no
  * compound rounding). Pairs where a side has no n-gram (shorter
  * than n) publish 0.0 — stated contract, mirrored in the oracle.
  */
object Rouge {

  /** ROUGE-N metrics per pair.
    * @param pairs (id_a, id_b, text_a = reference, text_b = candidate)
    * @param n     n-gram order
    * @param prefix output column prefix, e.g. "r1"
    */
  def overlap(pairs: DataFrame, n: Int, prefix: String): DataFrame = {
    val g = pairs.select(col("id_a"), col("id_b"),
      ShingleFunctions.word_shingles(col("text_a"), n).as("__ga"),
      ShingleFunctions.word_shingles(col("text_b"), n).as("__gb"))
    val ca = g.select(col("id_a"), col("id_b"), explode(col("__ga")).as("gram"))
      .groupBy(col("id_a"), col("id_b"), col("gram"))
      .agg(count(lit(1)).as("__ca"))
    val cb = g.select(col("id_a"), col("id_b"), explode(col("__gb")).as("gram"))
      .groupBy(col("id_a"), col("id_b"), col("gram"))
      .agg(count(lit(1)).as("__cb"))
    val ov = ca.join(cb, Seq("id_a", "id_b", "gram"))
      .groupBy(col("id_a"), col("id_b"))
      .agg(sum(least(col("__ca"), col("__cb"))).as("__o"))
    val o = coalesce(col("__o"), lit(0L))
    val na = size(col("__ga")).cast("long")
    val nb = size(col("__gb")).cast("long")
    g.join(ov, Seq("id_a", "id_b"), "left")
      .select(col("id_a"), col("id_b"),
        o.as(s"${prefix}_overlap"),
        when(na > 0, o.cast("double") / na).otherwise(lit(0.0))
          .as(s"${prefix}_recall"),
        when(nb > 0, o.cast("double") / nb).otherwise(lit(0.0))
          .as(s"${prefix}_precision"),
        when(na + nb > 0, (o * 2).cast("double") / (na + nb))
          .otherwise(lit(0.0)).as(s"${prefix}_f1"))
  }
}
