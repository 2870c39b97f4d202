package graft.functions

import org.apache.datasketches.kll.KllDoublesSketch
import org.apache.datasketches.memory.Memory
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._

/** KLL quantile sketches as first-class lake columns (SURVEY §2.C19)
  * — the quantile twin of the HLL pattern (C17): persist one small
  * binary sketch per partition (per day, per source, …) ONCE, then
  * answer any range's quantiles by merging sketches — raw data is
  * never rescanned. Built on the datasketches KLL implementation that
  * ships with Spark (`org.apache.datasketches.kll`), exposed the same
  * way Spark exposes `hll_sketch_agg`/`hll_union_agg`: a
  * TypedImperativeAggregate pair plus a scalar quantile reader.
  *
  * KLL merge is lossless in the sketch's error model: merging per-day
  * sketches answers the range query with the same ~1.65% (k=200)
  * normalized rank-error guarantee as sketching the raw range
  * directly. `approx_percentile` (D18) gives one-shot quantiles;
  * these make the sketch itself storable and mergeable.
  */
case class KllSketchAgg(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[KllDoublesSketch] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case DoubleType if k >= 8 => TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      s"kll_sketch_agg needs a double column and k >= 8, got ${child.dataType}, k=$k")
  }

  override def createAggregationBuffer(): KllDoublesSketch =
    KllDoublesSketch.newHeapInstance(k)

  override def update(buf: KllDoublesSketch, input: InternalRow): KllDoublesSketch = {
    val v = child.eval(input)
    if (v != null) buf.update(v.asInstanceOf[Double])
    buf
  }

  override def merge(a: KllDoublesSketch, b: KllDoublesSketch): KllDoublesSketch = {
    a.merge(b); a
  }

  override def eval(buf: KllDoublesSketch): Any = buf.toByteArray

  override def serialize(buf: KllDoublesSketch): Array[Byte] = buf.toByteArray
  override def deserialize(bytes: Array[Byte]): KllDoublesSketch =
    KllDoublesSketch.heapify(Memory.wrap(bytes))

  override def withNewMutableAggBufferOffset(o: Int): KllSketchAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): KllSketchAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): KllSketchAgg =
    copy(child = c.head)
  override def prettyName: String = "kll_sketch_agg"
}

/** Merge persisted KLL sketch bytes (the `hll_union_agg` analogue). */
case class KllMergeAgg(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[KllDoublesSketch] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType if k >= 8 => TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      s"kll_merge_agg needs a binary sketch column and k >= 8, got ${child.dataType}, k=$k")
  }

  override def createAggregationBuffer(): KllDoublesSketch =
    KllDoublesSketch.newHeapInstance(k)

  override def update(buf: KllDoublesSketch, input: InternalRow): KllDoublesSketch = {
    val v = child.eval(input)
    if (v != null) {
      buf.merge(KllDoublesSketch.heapify(Memory.wrap(v.asInstanceOf[Array[Byte]])))
    }
    buf
  }

  override def merge(a: KllDoublesSketch, b: KllDoublesSketch): KllDoublesSketch = {
    a.merge(b); a
  }

  override def eval(buf: KllDoublesSketch): Any = buf.toByteArray

  override def serialize(buf: KllDoublesSketch): Array[Byte] = buf.toByteArray
  override def deserialize(bytes: Array[Byte]): KllDoublesSketch =
    KllDoublesSketch.heapify(Memory.wrap(bytes))

  override def withNewMutableAggBufferOffset(o: Int): KllMergeAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): KllMergeAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): KllMergeAgg =
    copy(child = c.head)
  override def prettyName: String = "kll_merge_agg"
}

/** Read quantiles off a serialized KLL sketch: (sketch, array<double>
  * of ranks in [0,1]) → array<double> of values. NULL for an empty
  * sketch (no data ⇒ no quantiles), mirroring SQL aggregate-over-
  * nothing semantics.
  */
case class KllQuantiles(left: Expression, right: Expression)
  extends BinaryExpression
  with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {
  // CodegenFallback on purpose: this reads a handful of merged
  // sketches at the END of a pre-agg plan (rows = quantile requests,
  // not data) — never a per-row hot path worth a codegen kernel.

  override def nullable: Boolean = true
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      // nullable elements are accepted at the type level (parquet
      // round-trips mark arrays nullable even when null-free); an
      // actual null rank is rejected at eval with a clear error
      // rather than the NPE-or-silent-0.0 toDoubleArray would give
      case (BinaryType, ArrayType(DoubleType, _)) => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"kll_quantiles needs (binary, array<double>), got $t")
    }

  override def nullSafeEval(sketchBytes: Any, ranks: Any): Any = {
    val sk = KllDoublesSketch.heapify(
      Memory.wrap(sketchBytes.asInstanceOf[Array[Byte]]))
    if (sk.isEmpty) null
    else {
      val arr = ranks.asInstanceOf[ArrayData]
      val n = arr.numElements()
      val out = new Array[Any](n)
      var i = 0
      while (i < n) {
        require(!arr.isNullAt(i), s"kll_quantiles: rank at position $i is null")
        out(i) = sk.getQuantile(arr.getDouble(i))
        i += 1
      }
      new GenericArrayData(out)
    }
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression): KllQuantiles =
    copy(left = l, right = r)
  override def prettyName: String = "kll_quantiles"
}

/** Column-API entry points. */
object KllFunctions {
  val DefaultK = 200 // ~1.65% normalized rank error, ~KB-scale sketches

  def kll_sketch_agg(c: Column, k: Int = DefaultK): Column =
    ColumnBridge.column(
      KllSketchAgg(ColumnBridge.expression(c), k).toAggregateExpression())
  def kll_merge_agg(c: Column, k: Int = DefaultK): Column =
    ColumnBridge.column(
      KllMergeAgg(ColumnBridge.expression(c), k).toAggregateExpression())
  def kll_quantiles(sketch: Column, ranks: Column): Column =
    ColumnBridge.column(KllQuantiles(
      ColumnBridge.expression(sketch), ColumnBridge.expression(ranks)))
}
