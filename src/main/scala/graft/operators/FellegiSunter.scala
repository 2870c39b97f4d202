package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Fellegi–Sunter probabilistic record linkage scoring (Fellegi &
  * Sunter 1969; Winkler 1988's frequency-based u-probabilities) —
  * SURVEY §2 D120.
  *
  * The classical linkage ledger: for each comparison field, the
  * agreement weight is ln(m/u) and the disagreement weight
  * ln((1−m)/(1−u)), where m = P(field agrees | true match) is a
  * declared prior (the published no-training-data convention) and
  * u = P(field agrees | random non-match) is ESTIMATED FROM THE DATA
  * as the collision probability of the field's empirical distribution
  * u = Σ_v (n_v/N)² — rare values earn large agreement weights, common
  * values small ones, which is exactly why FS beats naive
  * count-the-agreements scoring. A candidate pair's score is the sum
  * of its per-field weights; high scores link, low scores reject.
  *
  * Scale shape: u-statistics are one tiny groupBy per field
  * (value-domain-sized, broadcast back as ONE row); candidate pairs
  * come from equality blocking on the caller's key — the standard FS
  * deployment shape (never all-pairs; the within-block self-join is
  * the same C76/C29 cost class, and the block key choice is the dial).
  * Determinism: Σn_v² and N are exact integers; each weight is one
  * IEEE evaluation over them, shared across every pair via a
  * broadcast; the pair score folds the k fields in FIXED declaration
  * order (one IEEE tree); ordering cuts on the 6-dp-rounded score
  * with (id_a, id_b) tiebreaks, so both engines cut identically.
  * Null field values compare null-safely (null agrees with null).
  */
object FellegiSunter {

  /** Score blocked candidate pairs with the FS weight ledger.
    *
    * @param entities one row per record
    * @param idCol    unique BIGINT record id
    * @param blockKey equality-blocking expression (candidate pairs
    *                 share it; choose so blocks stay bounded)
    * @param fields   (name, valueExpr, mPrior) per comparison field;
    *                 mPrior in (0,1) exclusive
    * @param k        published top-k pairs (score desc, id asc ties)
    */
  def score(entities: DataFrame, idCol: String, blockKey: Column,
            fields: Seq[(String, Column, Double)], k: Int): DataFrame = {
    require(fields.nonEmpty && fields.size <= 8,
      s"need 1..8 fields, got ${fields.size}")
    require(fields.forall(f => f._3 > 0.0 && f._3 < 1.0),
      "m priors must be in (0,1)")
    require(k >= 1, s"k must be >= 1, got $k")
    val ent = Materialize.cut(entities.select(
      Seq(col(idCol).cast("long").as("__id"), blockKey.as("__blk")) ++
        fields.map { case (n, c, _) => c.as(s"__f_$n") }: _*))
    // one-row u-statistics frame: N once, Σn_v² per field
    val n = ent.agg(count(lit(1)).cast("long").as("__n"))
    val stats = fields.map { case (fname, _, _) =>
      ent.groupBy(col(s"__f_$fname")).agg(count(lit(1)).as("__c"))
        .agg(sum(col("__c") * col("__c")).cast("long").as(s"__ss_$fname"))
    }.foldLeft(n)((acc, s) => acc.crossJoin(s))
    val a = ent.select(
      Seq(col("__id").as("id_a"), col("__blk").as("__ba")) ++
        fields.map { case (fn, _, _) => col(s"__f_$fn").as(s"__a_$fn") }: _*)
    val b = ent.select(
      Seq(col("__id").as("id_b"), col("__blk").as("__bb")) ++
        fields.map { case (fn, _, _) => col(s"__f_$fn").as(s"__b_$fn") }: _*)
    val pairs = a.join(b,
        col("__ba") === col("__bb") && col("id_a") < col("id_b"))
      .crossJoin(broadcast(stats))
    val nD = col("__n").cast("double")
    def u(fname: String): Column =
      col(s"__ss_$fname").cast("double") / (nD * nD)
    val terms = fields.map { case (fname, _, m) =>
      val agree = col(s"__a_$fname") <=> col(s"__b_$fname")
      val wa = log(lit(m) / u(fname))
      // 1−m as an IN-PLAN subtraction (not a Scala-folded literal) so
      // the oracle's `1.0 - 0.95` evaluates the identical IEEE tree
      val wd = log((lit(1.0) - lit(m)) / (lit(1.0) - u(fname)))
      (agree.as(s"agree_$fname"), when(agree, wa).otherwise(wd))
    }
    val scoreCol = terms.map(_._2).reduce(_ + _)
    pairs.select(Seq(col("id_a"), col("id_b")) ++ terms.map(_._1) ++
        Seq(round(scoreCol, 6).as("score")): _*)
      .orderBy(col("score").desc, col("id_a"), col("id_b"))
      .limit(k)
  }
}
