package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality expectations (the dbt-tests /
  * Great-Expectations surface, as a library operator): rules are
  * DATA, evaluation is a plan, violations come back as one tidy
  * (rule, violations, pass) table a pipeline can gate on.
  *
  * Scale shape: every ROW-LEVEL rule (not-null, range, set
  * membership, regex, custom predicate) compiles to a `sum(when(…))`
  * in ONE wide aggregate — a single corpus scan with partial
  * aggregation, zero extra shuffles no matter how many rules.
  * Uniqueness rules ride the SAME pass via `count − countDistinct`
  * (Spark's Expand-based multi-distinct: one shuffle whose width is
  * the expand factor — the [[Profile]] plan shape). Referential
  * rules are one broadcast anti-join aggregate per dimension —
  * dims broadcast by the usual contract.
  *
  * All counts are exact integers → DuckDB-oracled
  * (`data_expectations`).
  */
object Expectations {

  /** A row-level expectation: `violation` is true on rows that BREAK
    * the rule. Constructors below cover the common vocabulary;
    * `Custom` takes any Column predicate.
    */
  final case class RowRule(name: String, violation: Column)

  def notNull(c: String): RowRule =
    RowRule(s"not_null($c)", col(c).isNull)

  def inRange(c: String, lo: Double, hi: Double): RowRule =
    RowRule(s"in_range($c)",
      col(c).isNotNull && (col(c) < lo || col(c) > hi))

  def inSet(c: String, values: Seq[String]): RowRule =
    RowRule(s"in_set($c)",
      col(c).isNotNull && !col(c).isin(values: _*))

  def matches(c: String, pattern: String): RowRule =
    RowRule(s"matches($c)",
      col(c).isNotNull && !col(c).rlike(pattern))

  def custom(name: String, violation: Column): RowRule =
    RowRule(name, violation)

  /** A referential-integrity expectation: `fk` values (non-null) must
    * exist as `pk` in `dim`.
    */
  final case class RefRule(name: String, fk: String,
                           dim: DataFrame, pk: String)

  def refIntegrity(fk: String, dim: DataFrame, pk: String): RefRule =
    RefRule(s"ref_integrity($fk)", fk, dim, pk)

  /** Evaluate all rules against `df`. Row-level and uniqueness rules
    * share one wide-aggregate scan; each ref rule adds one broadcast
    * anti-join aggregate. Output: (rule, violations, pass), one row
    * per rule, stable rule names.
    */
  def check(df: DataFrame,
            rowRules: Seq[RowRule] = Nil,
            uniqueCols: Seq[String] = Nil,
            refRules: Seq[RefRule] = Nil): DataFrame = {
    require(rowRules.nonEmpty || uniqueCols.nonEmpty || refRules.nonEmpty,
      "Expectations.check: no rules given")
    val aggLegs: Seq[(String, Column)] =
      rowRules.map(r =>
        r.name -> coalesce(sum(when(r.violation, 1L).otherwise(0L)), lit(0L))) ++
      uniqueCols.map(c =>
        s"unique($c)" -> (count(col(c)) - countDistinct(col(c))))
    val aggLeg: Option[DataFrame] =
      if (aggLegs.isEmpty) None
      else {
        val named = aggLegs.map { case (n, c) => c.as(n) }
        val one = df.agg(named.head, named.tail: _*)
        // unpivot the single stats row: explode over one struct per
        // rule (the Profile discipline — identifier-safe, no stack)
        Some(one.select(explode(array(aggLegs.map { case (n, _) =>
          struct(lit(n).as("rule"), col(n).as("violations"))
        }: _*)).as("e"))
          .select(col("e.rule").as("rule"), col("e.violations").as("violations")))
      }
    val refLegs = refRules.map { r =>
      // rename both sides: fk and pk may carry the SAME column name
      // (a self-named key like c_custkey -> c_custkey would otherwise
      // make the join condition ambiguous)
      df.select(col(r.fk).as("__fk")).filter(col("__fk").isNotNull)
        .join(broadcast(r.dim.select(col(r.pk).as("__pk"))),
          col("__fk") === col("__pk"), "left_anti")
        .agg(count(lit(1)).as("violations"))
        .select(lit(r.name).as("rule"), col("violations"))
    }
    (aggLeg.toSeq ++ refLegs)
      .reduce(_ unionAll _)
      .select(col("rule"), col("violations"),
        (col("violations") === 0).as("pass"))
      .orderBy(col("rule"))
  }
}
