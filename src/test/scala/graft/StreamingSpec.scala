package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.streaming.EventsStream

/** Structured Streaming specs: the streaming windowed agg must agree
  * with its batch twin; the stateful sessionizer must respect gap
  * semantics.
  */
class StreamingSpec extends AnyFunSuite {
  import SparkTestSession._

  test("streaming windowed agg equals the batch equivalent") {
    val stream = EventsStream.windowedAgg(
      EventsStream.readEvents(spark, sfDir))
    val q = stream.writeStream.outputMode("complete")
      .format("memory").queryName("win_out").start()
    try {
      q.processAllAvailable()
      val got = spark.table("win_out")
        .select(col("window_start"), col("event_type"), col("n_events"))
        .collect().map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2)))
        .toSet
      val want = graft.queries.TextQueries.eventsWindowedAgg(spark, sfDir)
        .select(col("window_start"), col("event_type"), col("n_events"))
        .collect().map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2)))
        .toSet
      assert(got == want)
    } finally q.stop()
  }

  test("stream-stream interval join equals its batch twin") {
    val stream = EventsStream.clickPurchaseJoin(
      EventsStream.readEvents(spark, sfDir))
    val q = stream.writeStream.outputMode("append")
      .format("memory").queryName("attr_out").start()
    try {
      q.processAllAvailable()
      val got = spark.table("attr_out")
        .select(col("click_id"), col("purchase_id"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val want = graft.queries.TextQueries.clickAttribution(spark, sfDir)
        .select(col("click_id"), col("purchase_id"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(want.nonEmpty, "batch attribution should find click→purchase pairs")
      assert(got == want)
    } finally q.stop()
  }

  test("stateful sessionizer: gaps within bound never split, events conserved") {
    import spark.implicits._
    val events = graft.sources.Tables.events(spark, sfDir)
      .select(col("event_id"), col("ts"), col("user_id"),
        col("event_type"), col("value"))
      .as[EventsStream.Event]
    // batch-mode flatMapGroupsWithState needs Update output semantics;
    // run it through the streaming engine with a memory source instead
    val src = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[EventsStream.Event](
      spark, 1)
    src.addData(events.collect().toSeq)
    val q = EventsStream.sessionize(src.toDS(), gapSeconds = 4 * 3600)
      .writeStream.outputMode("append").format("memory")
      .queryName("sess_out").start()
    try {
      q.processAllAvailable()
      val sessions = spark.table("sess_out").collect()
        .map(r => (r.getLong(0), r.getTimestamp(1), r.getTimestamp(2), r.getLong(3)))
      // emitted (closed) sessions respect the gap invariant:
      // start <= end, and per-user sessions don't overlap
      assert(sessions.forall(s => !s._2.after(s._3)))
      sessions.groupBy(_._1).foreach { case (_, ss) =>
        val sorted = ss.sortBy(_._2.getTime)
        sorted.sliding(2).foreach {
          case Array(a, b) =>
            assert(a._3.getTime + 4 * 3600 * 1000 < b._2.getTime,
              "adjacent sessions closer than the gap")
          case _ =>
        }
      }
    } finally q.stop()
  }
}
