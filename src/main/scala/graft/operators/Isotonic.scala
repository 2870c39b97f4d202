package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Isotonic (monotone) calibration via the minimax identity
  * (Ayer et al. 1955's pool-adjacent-violators solution; Robertson,
  * Wright & Dykstra 1988 give the closed form used here) — the
  * monotone regularization of D96's raw calibration curve: a quality
  * score is CALIBRATED when P(good | score) is non-decreasing in the
  * score, and the isotonic fit is the least-squares monotone curve
  * through the binned empirical rates. Where the raw curve wiggles
  * (finite-sample noise), the fit pools adjacent bins — the standard
  * recipe for turning a ranking score into a usable probability
  * (Zadrozny & Elkan 2002).
  *
  * Instead of the sequential PAV stack (a driver loop), the fit uses
  * the CLOSED FORM fit_i = max_{h≤i} min_{j≥i} avg(h..j): fully
  * relational, O(B³) rows over the BIN frame only (B ≤ ~100 — the
  * corpus collapsed to bins upstream), provably equal to PAV. Every
  * avg(h..j) = (P_j−P_{h−1})/(N_j−N_{h−1}) is ONE IEEE divide of two
  * exact integers, so min/max decisions compare identical doubles in
  * any engine — no rounding inside the recursion, 6-dp only on the
  * published fit.
  *
  * Scale shape: the caller's one partial-agg'd scan produces the bin
  * frame; everything here is windows/joins over ≤ B, B², B³ rows —
  * corpus-size-independent past the scan.
  */
object Isotonic {

  /** Monotone fit over an already-binned frame.
    *
    * @param bins (binCol, nCol, posCol) — ascending bins, trial and
    *             positive counts (exact integers)
    * @return (bin, n, frac_pos, fit_isotonic) — fit non-decreasing in
    *         bin, equal to the PAV solution, weighted by n
    */
  def fit(bins: DataFrame, binCol: Column, nCol: Column,
          posCol: Column): DataFrame = {
    val base = Materialize.cut(
      bins.select(binCol.as("bin"), nCol.cast("long").as("n"),
        posCol.cast("long").as("pos")))
    // bounded-domain windows: the bin frame is aggregate-sized by
    // construction (the corpus collapsed upstream)
    val w = Window.orderBy(col("bin"))
      .rowsBetween(Window.unboundedPreceding, 0)
    val pre = base
      .withColumn("i", row_number().over(Window.orderBy(col("bin"))))
      .withColumn("cn", sum(col("n")).over(w))
      .withColumn("cp", sum(col("pos")).over(w))
    val cum = Materialize.cut(
      pre.select(col("i"), col("bin"), col("n"), col("pos"),
        col("cn"), col("cp")))
    // avg(h..j) for every h ≤ j: exact-integer prefix differences,
    // one IEEE divide each
    val lo = cum.select(col("i").as("h"),
      (col("cn") - col("n")).as("cn0"), (col("cp") - col("pos")).as("cp0"))
    val hi = cum.select(col("i").as("j"), col("cn").as("cnj"),
      col("cp").as("cpj"))
    val pairs = lo.join(hi, col("h") <= col("j"))
      .select(col("h"), col("j"),
        ((col("cpj") - col("cp0")).cast("double") /
          (col("cnj") - col("cn0")).cast("double")).as("avg"))
    // m(h,i) = min_{j≥i} avg(h,j); fit_i = max_{h≤i} m(h,i)
    val idx = cum.select(col("i").as("k"))
    val m = pairs.join(idx, col("k") >= col("h") && col("k") <= col("j"))
      .groupBy(col("h"), col("k"))
      .agg(min(col("avg")).as("m"))
    val fitCol = m.groupBy(col("k")).agg(max(col("m")).as("fit"))
    cum.join(fitCol, col("i") === col("k"))
      .select(col("bin"), col("n"),
        when(col("n") > 0,
          round(col("pos").cast("double") / col("n").cast("double"), 6))
          .as("frac_pos"),
        round(col("fit"), 6).as("fit_isotonic"))
      .orderBy(col("bin"))
  }
}
