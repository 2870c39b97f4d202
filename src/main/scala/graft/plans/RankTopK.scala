package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.GenerateOrdering
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{SparkPlan, UnaryExecNode}
import org.apache.spark.sql.execution.metric.{SQLMetric, SQLMetrics}

/** Ties-kept top-k per group — `rank() <= k` semantics, or with
  * `dense = true` the `dense_rank() <= k` semantics (SURVEY §2.C9b
  * companions to [[TopKPerGroupNode]]'s `row_number` semantics).
  *
  * rank(): a row qualifies iff fewer than k rows in its group are
  * strictly better, so every row tied with the k-th best survives.
  * dense_rank(): a row qualifies iff fewer than k DISTINCT order
  * values in its group are strictly better — the first k whole value
  * groups survive, however large. Both share one data structure: a
  * tree of rank groups holding the qualifying prefix — the minimum
  * state any correct evaluator of these semantics needs (O(k +
  * boundary tie group) for rank, O(k value groups) for dense) —
  * instead of the window's full-group sort.
  */
case class RankTopKNode(
    groupExprs: Seq[Expression],
    orderExprs: Seq[SortOrder],
    k: Int,
    rankAttr: Attribute,
    child: LogicalPlan,
    dense: Boolean = false) extends UnaryNode {
  override def nodeName: String = if (dense) "DenseRankTopK" else "RankTopK"
  override def output: Seq[Attribute] = child.output :+ rankAttr
  override def producedAttributes: AttributeSet = AttributeSet(rankAttr)
  override protected def withNewChildInternal(newChild: LogicalPlan): RankTopKNode =
    copy(child = newChild)
}

case class RankTopKExec(
    groupExprs: Seq[Expression],
    orderExprs: Seq[SortOrder],
    k: Int,
    rankAttr: Attribute,
    child: SparkPlan,
    dense: Boolean = false) extends UnaryExecNode {

  override def nodeName: String = if (dense) "DenseRankTopK" else "RankTopK"

  override def output: Seq[Attribute] = child.output :+ rankAttr
  override def producedAttributes: AttributeSet = AttributeSet(rankAttr)
  override def outputPartitioning: Partitioning = child.outputPartitioning
  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(groupExprs) :: Nil

  override lazy val metrics: Map[String, SQLMetric] = Map(
    "numSpills" -> SQLMetrics.createMetric(sparkContext, "number of spills"),
    "spilledBytes" -> SQLMetrics.createSizeMetric(sparkContext, "spilled bytes"))

  override protected def doExecute(): RDD[InternalRow] = {
    val childOutput = child.output
    val spillThreshold = conf.getConfString(TopKSpill.ThresholdKey,
      TopKSpill.DefaultThresholdBytes.toString).toLong
    val rowTypes = childOutput.map(_.dataType).toArray
    val numSpills = longMetric("numSpills")
    val spilledBytes = longMetric("spilledBytes")
    child.execute().mapPartitions { it =>
      val numFields = childOutput.length
      val keyProj = UnsafeProjection.create(groupExprs, childOutput)
      val ordering = GenerateOrdering.generate(
        orderExprs.map(BindReferences.bindReference(_, childOutput)))
      // per key: rank groups keyed by a representative row, compared on
      // the ORDER expressions only (ties ⇔ equal under `ordering`)
      type Groups = java.util.TreeMap[InternalRow, scala.collection.mutable.ArrayBuffer[InternalRow]]
      val comparator = ordering.asInstanceOf[java.util.Comparator[InternalRow]]
      val perKey = new java.util.HashMap[UnsafeRow, (Groups, Array[Int])]()
      val runs = new TopKRuns(numFields, rowTypes)
      var retainedBytes = 0L

      // flush the retained rank prefixes as one key-sorted run; the
      // retained set per chunk ⊇ the chunk's true rank-≤-k rows, so
      // ranks recomputed on the merged stream are exact (TopKSpill).
      def spill(): Unit = if (!perKey.isEmpty) {
        val entries = new Array[(Array[Byte], Groups)](perKey.size)
        var i = 0
        val eit = perKey.entrySet().iterator()
        while (eit.hasNext) {
          val e = eit.next()
          entries(i) = (e.getKey.getBytes, e.getValue._1)
          i += 1
        }
        java.util.Arrays.sort(entries,
          (a: (Array[Byte], Groups), b: (Array[Byte], Groups)) =>
            TopKSpill.compareKeys(a._1, b._1))
        val before = runs.spilledBytes
        import scala.jdk.CollectionConverters._
        runs.writeRun(entries.iterator.flatMap { case (kb, groups) =>
          groups.values().iterator().asScala.flatMap(
            _.iterator.map(r => (kb, r)))
        })
        perKey.clear()
        retainedBytes = 0L
        numSpills += 1
        spilledBytes += runs.spilledBytes - before
      }

      while (it.hasNext) {
        val row = it.next()
        val key = keyProj(row)
        var entry = perKey.get(key)
        if (entry == null) {
          entry = (new java.util.TreeMap[InternalRow,
            scala.collection.mutable.ArrayBuffer[InternalRow]](comparator),
            Array(0))
          perKey.put(key.copy(), entry)
        }
        val (groups, total) = entry
        // only insert if it can still qualify: fewer than k rows
        // strictly better (i.e. its group is not past the boundary)
        val copied = row.copy()
        var bucket = groups.get(copied)
        if (bucket == null) {
          bucket = scala.collection.mutable.ArrayBuffer.empty[InternalRow]
          groups.put(copied, bucket)
        }
        bucket += copied
        total(0) += 1
        retainedBytes += TopKSpill.sizeOf(copied, numFields)
        // invariant — rank(): rows strictly better than the worst group
        // < k, otherwise the worst group can never rank ≤ k; dense:
        // at most k value groups retained. Either way drop it whole.
        var worst = groups.lastEntry()
        while (groups.size > 1 &&
            (if (dense) groups.size > k
             else total(0) - worst.getValue.length >= k)) {
          total(0) -= worst.getValue.length
          worst.getValue.foreach(r =>
            retainedBytes -= TopKSpill.sizeOf(r, numFields))
          groups.remove(worst.getKey)
          worst = groups.lastEntry()
        }
        if (retainedBytes > spillThreshold) spill()
      }

      val outProj = UnsafeProjection.create(output.map(_.dataType).toArray)
      val joined = new JoinedRow
      val rankRow = new GenericInternalRow(1)
      import scala.jdk.CollectionConverters._
      if (runs.isEmpty) {
        perKey.values().iterator().asScala.flatMap { case (groups, _) =>
          var cum = 0
          var groupIdx = 0
          groups.entrySet().iterator().asScala.flatMap { e =>
            val rank = if (dense) groupIdx + 1 else cum + 1
            cum += e.getValue.length
            groupIdx += 1
            if (rank <= k) e.getValue.iterator.map { r =>
              rankRow.setInt(0, rank)
              outProj(joined(r, rankRow))
            } else Iterator.empty
          }
        }
      } else {
        spill() // final in-memory chunk becomes the last run
        // merged stream is (key, ORDER)-sorted; recompute rank() with
        // tie detection against the previous row of the same key
        var curKey: Array[Byte] = null
        var seen = 0
        var distinct = 0
        var rank = 0
        var prev: InternalRow = null
        runs.merged(comparator).flatMap { case (kb, row) =>
          if (curKey == null || !java.util.Arrays.equals(kb, curKey)) {
            curKey = kb
            seen = 0
            distinct = 0
            rank = 0
            prev = null
          }
          seen += 1
          if (prev == null || comparator.compare(row, prev) != 0) {
            distinct += 1
            rank = if (dense) distinct else seen
          }
          prev = row
          if (rank <= k) {
            rankRow.setInt(0, rank)
            Iterator.single(outProj(joined(row, rankRow)))
          } else Iterator.empty
        }
      }
    }
  }

  override protected def withNewChildInternal(newChild: SparkPlan): RankTopKExec =
    copy(child = newChild)
}

object RankTopK {
  import org.apache.spark.sql.DataFrame
  import org.apache.spark.sql.graftbridge.ColumnBridge
  import org.apache.spark.sql.types.IntegerType

  /** DataFrame API mirroring [[TopKPerGroup.apply]], with rank()
    * (ties-kept) semantics — or dense_rank() when `dense = true`.
    */
  def apply(df: DataFrame, groupCols: Seq[String],
            order: Seq[(String, Boolean)], k: Int,
            rankName: String = "rk", dense: Boolean = false): DataFrame = {
    val spark = df.sparkSession
    if (!spark.experimental.extraStrategies.contains(TopKStrategy))
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ TopKStrategy
    val analyzed = df.queryExecution.analyzed
    def attr(name: String): Attribute =
      analyzed.output.find(_.name == name).getOrElse(
        throw new IllegalArgumentException(
          s"column $name not in ${analyzed.output.map(_.name)}"))
    val sortOrders = order.map { case (name, asc) =>
      SortOrder(attr(name), if (asc) Ascending else Descending)
    }
    val rankAttr = AttributeReference(rankName, IntegerType, nullable = false)()
    ColumnBridge.ofRows(spark,
      RankTopKNode(groupCols.map(attr), sortOrders, k, rankAttr, analyzed,
        dense))
  }
}

/** dense_rank() ≤ k as a first-class operator: the first k distinct
  * order values per key, whole tie groups kept (SURVEY §2.C9d).
  */
object DenseRankTopK {
  import org.apache.spark.sql.DataFrame

  def apply(df: DataFrame, groupCols: Seq[String],
            order: Seq[(String, Boolean)], k: Int,
            rankName: String = "rk"): DataFrame =
    RankTopK(df, groupCols, order, k, rankName, dense = true)
}
