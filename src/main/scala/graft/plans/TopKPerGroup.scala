package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.GenerateOrdering
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{SparkPlan, UnaryExecNode}
import org.apache.spark.sql.execution.metric.{SQLMetric, SQLMetrics}
import org.apache.spark.sql.types.IntegerType

/** Top-K-per-group as a first-class operator (SURVEY §2.C9 scale path).
  *
  * The composable formulation — `row_number().over(Window.partitionBy
  * (key).orderBy(ord)) <= k` — materializes and SORTS every group in
  * full before discarding all but k rows; at 100 TB that's a full
  * shuffle + full sort of the fact table for a k-row-per-key answer.
  * This operator keeps a bounded heap per key inside each partition:
  * same single shuffle, no sort, memory O(keys × k) instead of
  * O(partition).
  *
  * Tier (c) of the custom-operator ladder: logical node + planner
  * strategy + physical exec, injected via [[graft.GraftExtensions]].
  */
case class TopKPerGroupNode(
    groupExprs: Seq[Expression],
    orderExprs: Seq[SortOrder],
    k: Int,
    rankAttr: Attribute,
    child: LogicalPlan) extends UnaryNode {
  override def output: Seq[Attribute] = child.output :+ rankAttr
  override def producedAttributes: AttributeSet = AttributeSet(rankAttr)
  override protected def withNewChildInternal(newChild: LogicalPlan): TopKPerGroupNode =
    copy(child = newChild)
}

case class TopKPerGroupExec(
    groupExprs: Seq[Expression],
    orderExprs: Seq[SortOrder],
    k: Int,
    rankAttr: Attribute,
    child: SparkPlan) extends UnaryExecNode {

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
      // per key: bounded max-heap holding the current best k rows
      // (heap head = worst of the kept rows)
      val heaps = new java.util.HashMap[UnsafeRow,
        java.util.PriorityQueue[InternalRow]]()
      val runs = new TopKRuns(numFields, rowTypes)
      var retainedBytes = 0L
      val buf = new Array[InternalRow](k)

      // flush all heaps as one key-sorted run (rows in rank order per
      // key); per-chunk top-k ⊇ the chunk's contribution to the true
      // top-k, so the merge recomputes exact ranks (see TopKSpill).
      def spill(): Unit = if (!heaps.isEmpty) {
        val entries = new Array[(Array[Byte],
          java.util.PriorityQueue[InternalRow])](heaps.size)
        var i = 0
        val eit = heaps.entrySet().iterator()
        while (eit.hasNext) {
          val e = eit.next()
          entries(i) = (e.getKey.getBytes, e.getValue)
          i += 1
        }
        java.util.Arrays.sort(entries,
          (a: (Array[Byte], java.util.PriorityQueue[InternalRow]),
           b: (Array[Byte], java.util.PriorityQueue[InternalRow])) =>
            TopKSpill.compareKeys(a._1, b._1))
        val before = runs.spilledBytes
        runs.writeRun(entries.iterator.flatMap { case (kb, heap) =>
          val n = heap.size
          var j = n - 1
          while (j >= 0) { buf(j) = heap.poll(); j -= 1 }
          (0 until n).iterator.map(r => (kb, buf(r)))
        })
        heaps.clear()
        retainedBytes = 0L
        numSpills += 1
        spilledBytes += runs.spilledBytes - before
      }

      while (it.hasNext) {
        val row = it.next()
        val key = keyProj(row)
        var heap = heaps.get(key)
        if (heap == null) {
          heap = new java.util.PriorityQueue[InternalRow](k + 1,
            ordering.reverse.asInstanceOf[java.util.Comparator[InternalRow]])
          heaps.put(key.copy(), heap)
        }
        if (heap.size < k) {
          val copied = row.copy()
          heap.add(copied)
          retainedBytes += TopKSpill.sizeOf(copied, numFields)
        } else if (ordering.compare(row, heap.peek()) < 0) {
          retainedBytes -= TopKSpill.sizeOf(heap.poll(), numFields)
          val copied = row.copy()
          heap.add(copied)
          retainedBytes += TopKSpill.sizeOf(copied, numFields)
        }
        if (retainedBytes > spillThreshold) spill()
      }

      val outProj = UnsafeProjection.create(output.map(_.dataType).toArray)
      val joined = new JoinedRow
      val rankRow = new GenericInternalRow(1)
      if (runs.isEmpty) {
        import scala.jdk.CollectionConverters._
        heaps.values().iterator().asScala.flatMap { heap =>
          // drain the heap: worst first → reverse into rank order
          val n = heap.size
          var i = n - 1
          while (i >= 0) { buf(i) = heap.poll(); i -= 1 }
          (0 until n).iterator.map { r =>
            rankRow.setInt(0, r + 1)
            outProj(joined(buf(r), rankRow))
          }
        }
      } else {
        spill() // final in-memory chunk becomes the last run
        var curKey: Array[Byte] = null
        var count = 0
        runs.merged(ordering.asInstanceOf[java.util.Comparator[InternalRow]])
          .flatMap { case (kb, row) =>
            if (curKey == null || !java.util.Arrays.equals(kb, curKey)) {
              curKey = kb
              count = 0
            }
            count += 1
            if (count <= k) {
              rankRow.setInt(0, count)
              Iterator.single(outProj(joined(row, rankRow)))
            } else Iterator.empty
          }
      }
    }
  }

  override protected def withNewChildInternal(newChild: SparkPlan): TopKPerGroupExec =
    copy(child = newChild)
}

object TopKStrategy extends org.apache.spark.sql.execution.SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerGroupNode(g, o, k, rank, child) =>
      TopKPerGroupExec(g, o, k, rank, planLater(child)) :: Nil
    case RankTopKNode(g, o, k, rank, child, dense) =>
      RankTopKExec(g, o, k, rank, planLater(child), dense) :: Nil
    case _ => Nil
  }
}

object TopKPerGroup {
  import org.apache.spark.sql.{Column, DataFrame}
  import org.apache.spark.sql.graftbridge.ColumnBridge

  /** DataFrame API: top `k` rows per `groupCols`, ranked by `order`
    * — (columnName, ascending) pairs that must form a total order
    * within a key for deterministic output. Rank emitted as
    * `rankName`. Columns are resolved by name against the child, so
    * the node enters the plan fully resolved (the analyzer has no
    * resolution rule for foreign operators).
    */
  def apply(df: DataFrame, groupCols: Seq[String],
            order: Seq[(String, Boolean)], k: Int,
            rankName: String = "rk"): DataFrame = {
    // make the strategy available on sessions not built withExtensions
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
    ColumnBridge.ofRows(df.sparkSession,
      TopKPerGroupNode(groupCols.map(attr), sortOrders, k, rankAttr, analyzed))
  }
}
