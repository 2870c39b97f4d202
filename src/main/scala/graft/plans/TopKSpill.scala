package graft.plans

import java.io.{BufferedInputStream, BufferedOutputStream, DataInputStream, DataOutputStream, File, FileInputStream, FileOutputStream}

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.TaskContext
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.types.DataType

/** Spill support for the bounded-heap top-k execs (SURVEY §2.C9b/C9c).
  *
  * The execs' retained state is O(keys-in-partition × k) — exactly the
  * operator's own per-partition output, so it normally fits easily.
  * But unlike Spark's window-sort path there was no fallback when it
  * doesn't (huge k × high key cardinality). This adds one: when a
  * task's retained rows exceed [[TopKSpill.ThresholdKey]] bytes, the
  * state is flushed to disk as a sorted run — records ordered by
  * (group-key bytes, then the operator's ORDER) — and the final answer
  * streams out of a k-way merge of all runs with O(#runs) memory.
  *
  * Correctness of the merge rests on the subset property: a row in the
  * partition's true top-k (row_number OR rank semantics) is top-k
  * within any subset containing it, so each chunk's retained prefix is
  * a superset of its contribution, and ranks recomputed on the merged
  * stream are exact (every row ranked ≤ k overall survives its chunk;
  * every overall-worse row sees ≥ k better survivors ahead of it).
  */
object TopKSpill {
  /** Retained-state byte budget per task before the heap execs flush a
    * sorted run to disk. */
  val ThresholdKey = "spark.graft.topk.spill.thresholdBytes"
  val DefaultThresholdBytes: Long = 256L * 1024 * 1024

  def sizeOf(row: InternalRow, numFields: Int): Long = row match {
    case u: UnsafeRow => u.getSizeInBytes.toLong + 16L
    case _ => 64L + 8L * numFields
  }

  /** Unsigned-lexicographic key-byte order. Consistent with UnsafeRow
    * equality (equal keys ⇔ identical bytes for a fixed projection
    * schema), which is all the merge grouping needs. */
  def compareKeys(a: Array[Byte], b: Array[Byte]): Int =
    java.util.Arrays.compareUnsigned(a, b)
}

/** Sorted-run storage + streaming merge. Files live in the JVM temp
  * dir (`java.io.tmpdir` — point it at fast local disks on a real
  * cluster, as Spark's own spills do via `spark.local.dir`) and are
  * deleted on task completion.
  */
private[plans] final class TopKRuns(
    numRowFields: Int, rowTypes: Array[DataType]) {

  private val files = ArrayBuffer.empty[File]
  private lazy val toUnsafe = UnsafeProjection.create(rowTypes)
  var spilledBytes = 0L
  var numRuns = 0

  Option(TaskContext.get()).foreach(_.addTaskCompletionListener[Unit] { _ =>
    files.foreach(_.delete())
  })

  def isEmpty: Boolean = files.isEmpty

  /** Writes one run. `records` must arrive ordered by (keyBytes, then
    * the operator's ORDER); record format is length-prefixed key and
    * UnsafeRow bytes. */
  def writeRun(records: Iterator[(Array[Byte], InternalRow)]): Unit = {
    val f = File.createTempFile("graft-topk-spill-", ".run")
    f.deleteOnExit()
    files += f
    numRuns += 1
    val out = new DataOutputStream(
      new BufferedOutputStream(new FileOutputStream(f), 1 << 16))
    try {
      records.foreach { case (kb, row) =>
        val u = row match {
          case u: UnsafeRow => u
          case other => toUnsafe(other)
        }
        out.writeInt(kb.length)
        out.write(kb)
        val rb = u.getBytes
        out.writeInt(rb.length)
        out.write(rb)
      }
    } finally out.close()
    spilledBytes += f.length()
  }

  private final class RunReader(file: File) {
    private val in = new DataInputStream(
      new BufferedInputStream(new FileInputStream(file), 1 << 16))
    private val total = file.length()
    private var consumed = 0L
    var keyBytes: Array[Byte] = _
    var row: UnsafeRow = _

    def advance(): Boolean =
      if (consumed >= total) { in.close(); false }
      else {
        val kl = in.readInt()
        keyBytes = new Array[Byte](kl)
        in.readFully(keyBytes)
        val rl = in.readInt()
        val rb = new Array[Byte](rl)
        in.readFully(rb)
        row = new UnsafeRow(numRowFields)
        row.pointTo(rb, rl)
        consumed += 8L + kl + rl
        true
      }
  }

  /** Streams the union of all runs ordered by (keyBytes, rowOrder).
    * Each emitted pair is freshly allocated — safe to hold across
    * `next()` calls (the rank merge keeps the previous row for tie
    * detection). */
  def merged(rowOrder: java.util.Comparator[InternalRow])
      : Iterator[(Array[Byte], UnsafeRow)] = {
    val cmp = new java.util.Comparator[RunReader] {
      override def compare(a: RunReader, b: RunReader): Int = {
        val c = TopKSpill.compareKeys(a.keyBytes, b.keyBytes)
        if (c != 0) c else rowOrder.compare(a.row, b.row)
      }
    }
    val pq = new java.util.PriorityQueue[RunReader](
      math.max(files.size, 1), cmp)
    files.foreach { f =>
      val r = new RunReader(f)
      if (r.advance()) pq.add(r)
    }
    new Iterator[(Array[Byte], UnsafeRow)] {
      override def hasNext: Boolean = !pq.isEmpty
      override def next(): (Array[Byte], UnsafeRow) = {
        val r = pq.poll()
        val out = (r.keyBytes, r.row)
        if (r.advance()) pq.add(r)
        out
      }
    }
  }
}
