package graft

import java.sql.Timestamp
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.streaming.EventsStream

/** Watermark semantics: events later than watermark-behind-max must be
  * dropped from append-mode windowed aggregation, on-time events
  * across batches must merge into their windows.
  */
class WatermarkSpec extends AnyFunSuite {
  import SparkTestSession._
  import spark.implicits._

  private def ev(id: Long, t: String, typ: String = "click"): EventsStream.Event =
    EventsStream.Event(id, Timestamp.valueOf(t), id % 3, typ, 1.0)

  test("late events beyond the watermark are dropped; windows finalize once") {
    val src = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[EventsStream.Event](spark, 1)
    val agg = EventsStream.windowedAgg(src.toDF())
    val q = agg.writeStream.outputMode("append")
      .format("memory").queryName("wm_out").start()
    try {
      // batch 1: two events in hour 00, one in hour 06 (advances
      // max event time to 06:30 → watermark 04:30 after batch)
      src.addData(ev(1, "2024-03-01 00:10:00"), ev(2, "2024-03-01 00:20:00"),
        ev(3, "2024-03-01 06:30:00"))
      q.processAllAvailable()
      // batch 2: a late event for hour 00 — behind the 04:30 watermark
      src.addData(ev(4, "2024-03-01 00:40:00"),
        ev(5, "2024-03-01 07:00:00"))
      q.processAllAvailable()
      // batch 3: push event time far ahead so all windows close
      src.addData(ev(6, "2024-03-02 00:00:00"))
      q.processAllAvailable()

      val rows = spark.table("wm_out")
        .select(col("window_start"), col("n_events"))
        .collect().map(r => (r.getTimestamp(0).toString, r.getLong(1))).toMap
      // hour-00 window finalized with the 2 on-time events only —
      // the late event 4 was dropped
      assert(rows("2024-03-01 00:00:00.0") == 2L,
        s"late event leaked into a closed window: $rows")
      assert(rows("2024-03-01 06:00:00.0") == 1L)
      assert(rows("2024-03-01 07:00:00.0") == 1L)
    } finally q.stop()
  }
}
