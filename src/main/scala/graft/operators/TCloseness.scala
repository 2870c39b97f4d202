package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** t-closeness release audit (Li, Li & Venkatasubramanian, ICDE 2007)
  * — the third leg of the privacy triad k-anonymity (D84) and
  * l-diversity (D78) open: a class can be large (k-safe) and diverse
  * (l-safe) and still leak if its sensitive-attribute DISTRIBUTION
  * sits far from the corpus-wide one (skewness attack). For an
  * ORDERED sensitive attribute the paper's distance is the ordered
  * Earth Mover's Distance with unit adjacent ground distance:
  * t = Σᵢ |Σ_{j≤i}(p_j − q_j)| / (m−1).
  *
  * EXACT arithmetic: with class size N_c, corpus size N_g and
  * cumulative counts cn/cm, the cumulative difference is the rational
  * (N_g·cn − N_c·cm)/(N_c·N_g) — an INTEGER numerator, accumulated in
  * decimal, so the published t is ONE double divide of two exact
  * aggregates and bit-identical in any engine/partitioning.
  *
  * Scale shape: two corpus scans (class-attribute counts,
  * global-attribute counts) — both partial-agg'd shuffles of
  * AGGREGATE cardinality; the zero-filled class×bucket grid, the
  * per-class cumulative window (partitioned BY CLASS, bounded by the
  * attribute domain) and the final fold all run on frames of
  * |classes|·|buckets| rows, never corpus-sized. The naive
  * formulation would window the corpus per class instead.
  */
object TCloseness {

  private def dec0(c: Column): Column = c.cast(DecimalType(38, 0))

  /** Per-class ordered-EMD audit: (classCols…, class_size, t_emd,
    * t_close = t ≤ threshold). Buckets absent from a class count 0
    * (the grid is zero-filled); a single-bucket domain has identical
    * distributions by construction and publishes t = 0.
    */
  def orderedEmdAudit(df: DataFrame, classCols: Seq[String], attr: Column,
                      threshold: Double = 0.2): DataFrame = {
    require(classCols.nonEmpty, "need at least one quasi-identifier column")
    val cls = classCols.map(col)
    val base = df.select(cls :+ attr.as("__a"): _*)
    // ONE corpus scan: the global histogram re-aggregates the
    // class-attribute cells instead of re-scanning the corpus, and
    // the cells frame (reused by classes/grid) is lineage-cut
    val ca = Materialize.cut(base.groupBy(cls :+ col("__a"): _*)
      .agg(count(lit(1)).as("n")))
    val ga = ca.groupBy(col("__a")).agg(sum(col("n")).as("m"))
    val classes = ca.groupBy(cls: _*).agg(sum(col("n")).as("nc"))
    val totals = ga.agg(sum(col("m")).cast("long").as("ng"),
      count(lit(1)).as("nb"))
    val grid = classes
      .crossJoin(broadcast(ga))
      .join(ca, classCols :+ "__a", "left")
      .withColumn("n", coalesce(col("n"), lit(0L)))
      .crossJoin(broadcast(totals))
    val w = Window.partitionBy(cls: _*).orderBy(col("__a"))
      .rowsBetween(Window.unboundedPreceding, 0)
    val cum = grid
      .withColumn("__cn", sum(col("n")).over(w))
      .withColumn("__cm", sum(col("m")).over(w))
      .withColumn("__num",
        abs(dec0(col("ng")) * col("__cn") - dec0(col("nc")) * col("__cm")))
    cum
      .groupBy(cls :+ col("nc") :+ col("ng") :+ col("nb"): _*)
      .agg(sum(col("__num")).cast("double").as("__s"))
      .withColumn("t_emd",
        when(col("nb") <= 1, lit(0.0)).otherwise(
          round(col("__s") / (col("nc").cast("double") * col("ng")
            * (col("nb") - 1)), 6)))
      .select(cls ++ Seq(col("nc").as("class_size"), col("t_emd"),
        (col("t_emd") <= threshold).as("t_close")): _*)
  }
}
