package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Paragraph-granular boilerplate dedup (SURVEY §2.D53) — CCNet's
  * paragraph-hash recipe: a paragraph whose text recurs across ≥
  * `minDocs` distinct documents is boilerplate (headers, footers,
  * licence blocks — the bytes that dominate raw crawls); strip every
  * occurrence and reassemble the survivors in order.
  *
  * Segmentation here is fixed `words`-word windows (this corpus has
  * no newlines); real text swaps in a `\n\n` split with the same
  * downstream plan.
  *
  * Scale shape: duplicate detection groups on sha2-256 digests, so
  * that shuffle ships 64-byte digests + counts, never paragraph
  * text; the strip is an anti-join probe + a partial-agg'd sorted
  * collect per doc. No window, no driver state.
  */
object ParagraphDedup {

  /** Explode docs into (id, para_idx, para, __digest) rows. */
  def paragraphs(df: DataFrame, text: Column, id: Column,
                 words: Int = 12): DataFrame = {
    require(words > 0, s"ParagraphDedup: words must be positive, got $words")
    df.select(id.as("__pd_id"), split(trim(text), "\\s+").as("__pd_toks"))
      .withColumn("__pd_np",
        ceil(size(col("__pd_toks")).cast("double") / words).cast("long"))
      .select(col("__pd_id"), col("__pd_toks"),
        posexplode(sequence(lit(0L), col("__pd_np") - 1)))
      .select(col("__pd_id"), col("col").as("para_idx"),
        concat_ws(" ",
          slice(col("__pd_toks"), (col("col") * words + 1).cast("int"),
            lit(words))).as("para"))
      .withColumn("__digest", sha2(col("para"), 256))
  }

  /** The boilerplate digest set: paragraphs present in >= `minDocs`
    * DISTINCT docs. Aggregate-sized; persistable as a lake artifact
    * for incremental/streaming gating.
    */
  def duplicateDigests(paras: DataFrame, minDocs: Int = 2): DataFrame = {
    require(minDocs >= 1, s"ParagraphDedup: minDocs must be >= 1, got $minDocs")
    paras.groupBy(col("__digest").as("digest"))
      .agg(countDistinct(col("__pd_id")).as("nd"))
      .filter(col("nd") >= minDocs)
      .select(col("digest"))
  }

  /** Strip every paragraph whose digest is in `dup` and reassemble.
    * @return (id, n_paras, n_kept, clean_text) — docs whose every
    *         paragraph was boilerplate come back with empty text.
    */
  def strip(df: DataFrame, text: Column, id: Column, dup: DataFrame,
            words: Int = 12): DataFrame = {
    val paras = paragraphs(df, text, id, words)
    val kept = paras.join(dup, paras("__digest") === dup("digest"), "left_anti")
    val perDoc = kept.groupBy(col("__pd_id"))
      .agg(count(lit(1)).as("n_kept"),
        array_join(
          transform(
            array_sort(collect_list(struct(col("para_idx"), col("para")))),
            x => x.getField("para")),
          " ").as("clean_text"))
    df.select(id.as("__pd_id"),
        ceil(size(split(trim(text), "\\s+")).cast("double") / words)
          .cast("long").as("n_paras"))
      .join(perDoc, Seq("__pd_id"), "left")
      .select(col("__pd_id").as("id"), col("n_paras"),
        coalesce(col("n_kept"), lit(0L)).as("n_kept"),
        coalesce(col("clean_text"), lit("")).as("clean_text"))
  }

  /** D115: per-group duplicated-paragraph mass — what FRACTION of
    * each source's paragraph mass is corpus-wide boilerplate (the
    * Lee et al. 2022 "what would dedup remove" question answered per
    * provenance BEFORE running the removal): a source at 40% dup
    * mass is mostly templates, and its row count overstates its
    * contribution the same way D112's ESS ≪ n does for weights.
    *
    * Scale shape: the D53 machinery unchanged — the duplicate
    * detection shuffle ships 64-byte digests + counts, the flag join
    * is digest-keyed, and the output collapses to group cardinality.
    */
  def dupMassByGroup(df: DataFrame, text: Column, id: Column,
                     group: Column, words: Int = 12,
                     minDocs: Int = 2): DataFrame = {
    val paras = Materialize.cut(paragraphs(df, text, id, words))
    val dup = duplicateDigests(paras, minDocs)
    val perDoc = paras
      .join(dup, paras("__digest") === dup("digest"), "left")
      .groupBy(col("__pd_id"))
      .agg(count(lit(1)).as("__np"),
        sum(when(col("digest").isNotNull, 1L).otherwise(0L)).as("__nd"))
    df.select(id.as("__pd_id"), group.as("grp"))
      .join(perDoc, Seq("__pd_id"))
      .groupBy(col("grp"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("__np")).cast("long").as("n_paras"),
        sum(col("__nd")).cast("long").as("n_dup_paras"))
      .select(col("grp"), col("n_docs"), col("n_paras"),
        col("n_dup_paras"),
        when(col("n_paras") > 0,
          round(col("n_dup_paras").cast("double")
            / col("n_paras").cast("double"), 6)).as("dup_frac"))
      .orderBy(col("grp"))
  }

  /** One-shot batch form over a single corpus: detect within it,
    * strip from it. The [[graft.queries.TextQueries.paragraphDedup]]
    * gate face wraps this.
    */
  def dedup(df: DataFrame, text: Column, id: Column,
            words: Int = 12, minDocs: Int = 2): DataFrame = {
    // cut once: the dup-detection agg and the strip's anti-join probe
    // both read the exploded+hashed frame — at scale, re-running the
    // corpus explode + sha2 per consumer is the dominant cost
    val paras = Materialize.cut(paragraphs(df, text, id, words))
    val dup = duplicateDigests(paras, minDocs)
    val kept = paras.join(dup, paras("__digest") === dup("digest"), "left_anti")
    val perDoc = kept.groupBy(col("__pd_id"))
      .agg(count(lit(1)).as("n_kept"),
        array_join(
          transform(
            array_sort(collect_list(struct(col("para_idx"), col("para")))),
            x => x.getField("para")),
          " ").as("clean_text"))
    df.select(id.as("__pd_id"),
        ceil(size(split(trim(text), "\\s+")).cast("double") / words)
          .cast("long").as("n_paras"))
      .join(perDoc, Seq("__pd_id"), "left")
      .select(col("__pd_id").as("id"), col("n_paras"),
        coalesce(col("n_kept"), lit(0L)).as("n_kept"),
        coalesce(col("clean_text"), lit("")).as("clean_text"))
  }
}
