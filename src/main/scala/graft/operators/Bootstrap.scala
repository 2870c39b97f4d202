package graft.operators

import java.nio.ByteBuffer
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, XXH64}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** D82: deterministic Poisson bootstrap (Chamandy et al. 2012 — the
  * resampling scheme that works on a distributed corpus: instead of
  * drawing n docs with replacement, each doc contributes an
  * independent Poisson(1) weight per replica, so a replica never
  * needs a global sample — one scan computes every replica's
  * weighted sum as B partial-aggregated cells).
  *
  * Determinism: the per-(doc, replica) weight is the Poisson(1)
  * inverse CDF of the D68 uniform (engine XXH64 of id·B+b → top 53
  * bits), so the CI is retry-stable and DuckDB-replayable; weights
  * cap at 8 (P(X>8) ≈ 1e-6 — identical truncation in both engines,
  * far below the CI's resolution).
  *
  * Scale shape: ONE row per doc — [[BootstrapCellsAgg]] folds all B
  * replica legs into a single 2B-long aggregation buffer per task
  * (B weighted sums + B weight sums + (n, vsum)), so the corpus is
  * never inflated ×B into physical rows; the shuffle carries one
  * (2B+2)-long buffer per partition and the final frame is B
  * aggregate-sized cells. (The previous explode(sequence(0,B−1))
  * formulation survives as [[Bootstrap.cellsExploded]] purely as the
  * spec oracle pinning the agg's draw bit-exactly.)
  */
object Bootstrap {

  /** Cumulative Poisson(1) CDF c_k = P(X ≤ k), k = 0..7 — shared with
    * the DuckDB oracle builder so both engines cut on identical
    * doubles.
    */
  val cum: Array[Double] = {
    val out = new Array[Double](8)
    var p = math.exp(-1.0)
    var c = 0.0
    var k = 0
    while (k < 8) {
      c += p; out(k) = c; p = p / (k + 1.0); k += 1
    }
    out
  }

  /** The weight CASE chain over a uniform column. */
  def weight(u: Column): Column =
    cum.zipWithIndex.reverse.foldLeft(lit(8L)) { case (acc, (c, k)) =>
      when(u < lit(c), lit(k.toLong)).otherwise(acc)
    }

  /** The per-(id, replica) uniform — the D68 XXH64 draw. Shared with
    * the streaming twin so the two faces cannot drift.
    */
  def uniform(id: Column, b: Column, replicas: Int, seed: Long): Column =
    (shiftrightunsigned(xxhash64(lit(seed), id * replicas + b), 11)
      .cast("double") + lit(0.5)) / lit(9007199254740992.0)

  /** The B replica cells off ONE scan and ONE row per doc:
    * (b, wv, ws, n, vsum). Every doc contributes to every replica
    * cell, so each cell also carries the corpus's plain count and
    * value sum — the mean needs no second pass over the input.
    */
  def cells(df: DataFrame, idCol: Column, valueCol: Column,
            replicas: Int, seed: Long): DataFrame = {
    require(replicas > 1, s"need at least 2 replicas, got $replicas")
    val agg = ColumnBridge.column(
      BootstrapCellsAgg(
        ColumnBridge.expression(idCol.cast("long")),
        ColumnBridge.expression(valueCol.cast("long")),
        replicas, seed).toAggregateExpression())
    df.agg(agg.as("__c"))
      .select(posexplode(col("__c").getField("ws")).as(Seq("__i", "__ws")),
        col("__c"))
      .select(col("__i").cast("long").as("b"),
        element_at(col("__c").getField("wv"), col("__i") + 1)
          .cast("decimal(38,0)").as("wv"),
        col("__ws").cast("decimal(38,0)").as("ws"),
        col("__c").getField("n").as("n"),
        col("__c").getField("vsum").cast("decimal(38,0)").as("vsum"))
  }

  /** Reference formulation of [[cells]] via explode(sequence(0,B−1))
    * — ×B row inflation, kept ONLY as the spec pin that the
    * single-pass aggregate reproduces the exact per-(doc, replica)
    * XXH64 draw. Do not call in production paths.
    */
  def cellsExploded(df: DataFrame, idCol: Column, valueCol: Column,
                    replicas: Int, seed: Long): DataFrame = {
    require(replicas > 1, s"need at least 2 replicas, got $replicas")
    df.select(idCol.as("__id"), valueCol.as("__v"),
        explode(sequence(lit(0L), lit(replicas - 1L))).as("__b"))
      .withColumn("__w",
        weight(uniform(col("__id"), col("__b"), replicas, seed)))
      .groupBy(col("__b").as("b"))
      .agg(sum((col("__w") * col("__v")).cast("decimal(38,0)")).as("wv"),
        sum(col("__w").cast("decimal(38,0)")).as("ws"),
        count(lit(1)).as("n"),
        sum(col("__v").cast("decimal(38,0)")).as("vsum"))
  }

  /** Finish a (merged) cell frame into the one-row report — shared by
    * the batch operator and the streaming read face so the percentile
    * convention cannot drift: lo rank = ceil(α·B), hi = B − lo + 1,
    * 1-based on the sorted replica means. The mean reads any cell's
    * (n, vsum) pair (all equal by construction — max() selects it
    * deterministically).
    */
  def finishCi(cellFrame: DataFrame, replicas: Int,
               alpha: Double): DataFrame = {
    require(alpha > 0 && alpha < 0.5, s"alpha must be in (0, 0.5), got $alpha")
    val lo = math.ceil(alpha * replicas).toInt
    val hi = replicas - lo + 1
    cellFrame
      .select((col("wv").cast("double") / col("ws").cast("double")).as("__m"),
        col("n"), col("vsum"))
      .agg(sort_array(collect_list(col("__m"))).as("a"),
        count(lit(1)).as("n_replicas"),
        max(col("n")).as("__n"), max(col("vsum")).as("__vs"))
      .select(col("n_replicas"),
        round(col("__vs").cast("double") / col("__n").cast("double"), 6)
          .as("mean"),
        element_at(col("a"), lo).as("ci_lo"),
        element_at(col("a"), hi).as("ci_hi"))
  }

  /** One-row (n_replicas, mean, ci_lo, ci_hi) for the mean of an
    * exact-integer `valueCol` (micro-units — integer sums keep every
    * replica mean partition-order-free). ONE scan: cells + finisher.
    */
  def meanCi(df: DataFrame, idCol: Column, valueCol: Column,
             replicas: Int = 200, alpha: Double = 0.025,
             seed: Long = 42L): DataFrame =
    finishCi(cells(df, idCol, valueCol, replicas, seed), replicas, alpha)
}

/** All B Poisson-bootstrap replica cells in one aggregation buffer —
  * the single-pass engine under [[Bootstrap.cells]]. Buffer layout is
  * a flat long[2B+2]: [0,B) per-replica weight sums, [B,2B)
  * per-replica weighted value sums, then (row count, plain value
  * sum). Per input row the update loop replays Spark's own
  * `xxhash64(lit(seed), id·B+b)` chain (seed 42 fold, then
  * [[XXH64.hashLong]]) for each b — identical bits to the SQL
  * expression, pinned by OperatorsSpec against [[Bootstrap.cellsExploded]].
  *
  * Scale: the buffer is 2B+2 longs per task regardless of corpus
  * size; merge is elementwise-add, so map-side partials keep the
  * shuffle at one buffer per partition. Long sums hold exactly while
  * 8·Σv < 2^63 — with micro-unit values ≤ 1e6·8 that is ~1.1e14 docs,
  * three orders past a 100 TB corpus.
  *
  * Null semantics match the exploded formulation: a null value still
  * counts the row and accrues its weights (sum skips the null legs);
  * a null id hashes as xxhash64's null-skip (seed-only fold).
  */
case class BootstrapCellsAgg(
    id: Expression,
    value: Expression,
    replicas: Int,
    seed: Long,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] {

  override def children: Seq[Expression] = Seq(id, value)
  override def nullable: Boolean = false
  override def dataType: DataType = StructType(Seq(
    StructField("ws", ArrayType(LongType, containsNull = false), nullable = false),
    StructField("wv", ArrayType(LongType, containsNull = false), nullable = false),
    StructField("n", LongType, nullable = false),
    StructField("vsum", LongType, nullable = false)))

  override def checkInputDataTypes(): TypeCheckResult =
    (id.dataType, value.dataType) match {
      case (LongType, LongType) if replicas > 1 => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"bootstrap_cells needs (bigint, bigint) and replicas > 1, got $t")
    }

  // xxhash64(lit(seed), x) = hashLong(x, hashLong(seed, 42)); the
  // seed fold is input-independent, so hoist it.
  private val seedFold: Long = XXH64.hashLong(seed, 42L)

  override def createAggregationBuffer(): Array[Long] =
    new Array[Long](2 * replicas + 2)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val idV = id.eval(input)
    val vV = value.eval(input)
    val hasV = vV != null
    val v = if (hasV) vV.asInstanceOf[Long] else 0L
    buf(2 * replicas) += 1L
    if (hasV) buf(2 * replicas + 1) += v
    val base = if (idV == null) 0L
               else idV.asInstanceOf[Long] * replicas
    val cum = Bootstrap.cum
    var b = 0
    while (b < replicas) {
      val h = if (idV == null) seedFold
              else XXH64.hashLong(base + b, seedFold)
      val u = ((h >>> 11).toDouble + 0.5) / 9007199254740992.0
      var w = 0L
      while (w < 8 && u >= cum(w.toInt)) w += 1
      buf(b) += w
      if (hasV) buf(replicas + b) += w * v
      b += 1
    }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < a.length) { a(i) += b(i); i += 1 }
    a
  }

  override def eval(buf: Array[Long]): Any = {
    val ws = new Array[Long](replicas)
    val wv = new Array[Long](replicas)
    System.arraycopy(buf, 0, ws, 0, replicas)
    System.arraycopy(buf, replicas, wv, 0, replicas)
    new GenericInternalRow(Array[Any](
      new GenericArrayData(ws), new GenericArrayData(wv),
      buf(2 * replicas), buf(2 * replicas + 1)))
  }

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(8 * buf.length)
    var i = 0
    while (i < buf.length) { bb.putLong(buf(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val buf = new Array[Long](bytes.length / 8)
    var i = 0
    while (i < buf.length) { buf(i) = bb.getLong(); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(o: Int): BootstrapCellsAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): BootstrapCellsAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): BootstrapCellsAgg =
    copy(id = c(0), value = c(1))
  override def prettyName: String = "bootstrap_cells"
}
