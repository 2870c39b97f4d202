package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions

/** Shared core of the D79 signal-agreement audit and its streaming
  * face (E21): per-doc quality signals lifted to exact integer
  * micro-units, their sufficient statistics (n + nine sums), and the
  * Pearson matrix over those statistics.
  *
  * The split matters because the sums are ADDITIVE integers: partial
  * sums over any partitioning of the corpus — batch partitions or
  * stream micro-batches — merge to exactly the sums over the union,
  * so the streaming monitor is bit-identical to the batch audit by
  * construction, not by tolerance.
  */
object SignalStats {

  /** (q, r, t) micro-unit signal frame: D14 composite quality and D29
    * trigram dup-fraction rounded to 1e-6 (the Doremi idiom), plus
    * the whitespace token count.
    */
  def microSignals(df: DataFrame, textCol: String): DataFrame = {
    val tg = graft.functions.ShingleFunctions.word_shingles(col(textCol), 3)
    val rep = when(size(tg) === 0, 0.0)
      .otherwise((size(tg) - size(array_distinct(tg))).cast("double")
        / size(tg).cast("double"))
    df.select(
      round(TextFunctions.qualityScore(col(textCol)) * 1000000.0)
        .cast("long").as("q"),
      round(rep * 1000000.0).cast("long").as("r"),
      TextFunctions.tokenCount(col(textCol)).cast("long").as("t"))
  }

  /** One-row sufficient statistics: decimal-exact integer sums, so the
    * row is independent of partition order and additive across frames.
    */
  def sums(sigs: DataFrame): DataFrame = {
    def dsum(c: Column, as: String) = sum(c.cast("decimal(38,0)")).as(as)
    sigs.agg(
      count(lit(1)).as("n"),
      dsum(col("q"), "sq"), dsum(col("r"), "sr"), dsum(col("t"), "st"),
      dsum(col("q") * col("q"), "sqq"), dsum(col("r") * col("r"), "srr"),
      dsum(col("t") * col("t"), "stt"), dsum(col("q") * col("r"), "sqr"),
      dsum(col("q") * col("t"), "sqt"), dsum(col("r") * col("t"), "srt"))
  }

  /** Merge partial statistic rows (from stream micro-batches) into the
    * union's statistics — exact, because every column is an integer.
    */
  def mergeSums(parts: DataFrame): DataFrame =
    parts.agg(
      sum(col("n")).as("n"),
      sum(col("sq")).as("sq"), sum(col("sr")).as("sr"),
      sum(col("st")).as("st"), sum(col("sqq")).as("sqq"),
      sum(col("srr")).as("srr"), sum(col("stt")).as("stt"),
      sum(col("sqr")).as("sqr"), sum(col("sqt")).as("sqt"),
      sum(col("srt")).as("srt"))

  /** The 3-row Pearson matrix over a one-row statistics frame. */
  def pearsonMatrix(stats: DataFrame): DataFrame = {
    def pearson(sx: String, sy: String, sxx: String, syy: String,
                sxy: String): Column = {
      val n = col("n").cast("double")
      val x = col(sx).cast("double"); val y = col(sy).cast("double")
      val xx = col(sxx).cast("double"); val yy = col(syy).cast("double")
      val xy = col(sxy).cast("double")
      val dx = n * xx - x * x
      val dy = n * yy - y * y
      // a constant signal has zero variance: emit NULL explicitly
      // instead of a silent 0/0 NaN that no alert threshold can see
      when(dx === 0.0 || dy === 0.0, lit(null).cast("double"))
        .otherwise((n * xy - x * y) / (sqrt(dx) * sqrt(dy)))
    }
    def row(a: String, b: String, r: Column) =
      stats.select(lit(a).as("signal_a"), lit(b).as("signal_b"),
        col("n").cast("long").as("n"), r.as("pearson_r"))
    row("quality", "repetition", pearson("sq", "sr", "sqq", "srr", "sqr"))
      .unionAll(row("quality", "tokens",
        pearson("sq", "st", "sqq", "stt", "sqt")))
      .unionAll(row("repetition", "tokens",
        pearson("sr", "st", "srr", "stt", "srt")))
      .orderBy(col("signal_a"), col("signal_b"))
  }
}
