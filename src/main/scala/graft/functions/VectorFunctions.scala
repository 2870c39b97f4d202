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

  /** max|xᵢ| in double (0.0 for the empty vector). */
  def maxAbs(v: Column): Column =
    aggregate(v, lit(0.0), (acc, x) => greatest(acc, abs(x.cast("double"))))

  /** Symmetric int8 quantization of an embedding (D24): per-vector
    * scale = max|xᵢ|/127, stored as `struct(scale float, q array<tinyint>)`
    * — 4× smaller than float32 at ~0.4% worst-case per-component
    * error, the standard storage/recall trade for billion-vector ANN
    * corpora. Pure column algebra (quantized ANN search dequantizes
    * with [[dequantize8]] or probes int8 directly).
    *
    * Pass a pre-computed `scale` column (e.g. via `withColumn("s",
    * maxAbs(v) / 127.0)`) on hot paths: higher-order lambdas are
    * interpreted, so the 1-arg convenience form re-evaluates the
    * embedded max-abs fold per element — O(d²) per vector.
    */
  def quantize8(v: Column, scale: Column): Column =
    struct(
      scale.cast("float").as("scale"),
      transform(v, x =>
        when(scale === 0.0, lit(0))
          .otherwise(round(x.cast("double") / scale))
          .cast("tinyint")).as("q"))

  def quantize8(v: Column): Column = quantize8(v, maxAbs(v) / 127.0)

  /** Inverse of [[quantize8]]: `array<float>` reconstruction. */
  def dequantize8(qv: Column): Column =
    transform(qv.getField("q"), x =>
      (x.cast("double") * qv.getField("scale").cast("double")).cast("float"))

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
