package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector math over `array<float>` embedding columns as higher-order
  * column expressions (SURVEY §2.D5-D7). No UDFs: `zip_with` +
  * `aggregate` fold left-to-right, so results are deterministic for a
  * given row regardless of partitioning.
  *
  * All arithmetic is promoted to double before accumulation — float
  * accumulation would lose ~3 digits over 64+ dims.
  */
object VectorFunctions {

  /** Σ aᵢ·bᵢ in double. */
  def dot(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, x) => acc + x)

  /** ‖a‖₂ in double. */
  def norm(a: Column): Column = sqrt(dot(a, a))

  /** Cosine similarity in double; 0.0 for zero vectors (guarded). */
  def cosine(a: Column, b: Column): Column = {
    val d = dot(a, b)
    val na = norm(a)
    val nb = norm(b)
    when(na === 0.0 || nb === 0.0, 0.0).otherwise(d / (na * nb))
  }

  /** Random-hyperplane LSH bucket: `planes` sign bits packed into a
    * long. Plane components are pseudo-random ±1 derived from
    * xxhash64(plane, dim) — deterministic, no stored model, and the
    * same bucketing is computable on any engine.
    */
  def hyperplaneBucket(v: Column, planes: Int): Column =
    aggregate(
      transform(sequence(lit(0), lit(planes - 1)), p => {
        val proj = aggregate(
          zip_with(v, sequence(lit(0), size(v) - 1), (x, i) =>
            when(xxhash64(p, i).bitwiseAND(1) === 1,
              x.cast("double")).otherwise(-x.cast("double"))),
          lit(0.0), (acc, x) => acc + x)
        when(proj > 0, call_function("shiftleft", lit(1L), p)).otherwise(lit(0L))
      }),
      lit(0L), (acc, x) => acc.bitwiseOR(x))
}
