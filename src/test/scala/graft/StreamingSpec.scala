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

  /** SURVEY §4 prescribes the RocksDB state store for big keyed state
    * (state off-heap, incremental snapshots); the stateful specs run
    * under BOTH providers so the prescription is exercised, not just
    * documented. The conf is read at streaming-query start, so setting
    * it on the shared session around each variant is sufficient.
    */
  private val stateStoreVariants: Seq[(Option[String], String)] = Seq(
    (None, "default HDFS store"),
    (Some("org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"),
      "RocksDB store"))

  private def withStateStoreProvider[A](provider: Option[String])(body: => A): A = {
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    provider.foreach(spark.conf.set(key, _))
    try body
    finally if (provider.isDefined) prev match {
      case Some(v) => spark.conf.set(key, v)
      case None    => spark.conf.unset(key)
    }
  }

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

  test("streaming sliding agg equals the batch equivalent") {
    val stream = EventsStream.slidingAgg(
      EventsStream.readEvents(spark, sfDir))
    val q = stream.writeStream.outputMode("complete")
      .format("memory").queryName("slide_out").start()
    try {
      q.processAllAvailable()
      // counts AND the decimal-exact sum: stream == batch bit-for-bit
      val got = spark.table("slide_out")
        .collect().map(r => (r.getTimestamp(0), r.getTimestamp(1),
          r.getString(2), r.getLong(3), r.getDouble(4))).toSet
      val want = graft.queries.WarehouseQueries
        .eventsSlidingAgg(spark, sfDir)
        .select(col("window_start"), col("window_end"), col("event_type"),
          col("n_events"), col("sum_value"))
        .collect().map(r => (r.getTimestamp(0), r.getTimestamp(1),
          r.getString(2), r.getLong(3), r.getDouble(4))).toSet
      assert(got == want)
    } finally q.stop()
  }

  test("streaming admission equals sequential batch admission and resumes from the lake") {
    import spark.implicits._
    import graft.operators.Dedup
    import graft.streaming.StreamingAdmission
    import org.apache.spark.sql.streaming.Trigger
    val all = graft.sources.Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("text"))
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    val seed = all.filter(_._1 % 3 == 0)
    val batch1 = all.filter(_._1 % 3 == 1)
    val batch2 = all.filter(_._1 % 3 == 2)
    val dir = java.nio.file.Files.createTempDirectory("graft_admit_stream").toString
    val (corpusPath, indexPath, ckpt) = (s"$dir/corpus", s"$dir/index", s"$dir/ckpt")
    // seed the lake through the batch path, index kept in step
    seed.toDF("doc_id", "text").write.parquet(corpusPath)
    Dedup.saveBandIndex(
      Dedup.bandIndex(seed.toDF("doc_id", "text"), "text", "doc_id"), indexPath)

    def ids(df: org.apache.spark.sql.DataFrame): Set[Long] =
      df.select(col("doc_id")).collect().map(_.getLong(0)).toSet
    val src = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, String)](spark, 77)
    val q = StreamingAdmission.start(src.toDS().toDF("doc_id", "text"),
      "text", "doc_id", corpusPath, indexPath, ckpt, threshold = 0.8,
      trigger = Trigger.ProcessingTime(0L))
    try {
      src.addData(batch1: _*); q.processAllAvailable()
      src.addData(batch2: _*); q.processAllAvailable()
    } finally q.stop()

    // sequential batch reference over the same two batches
    var corpus = seed.toDF("doc_id", "text")
    val want = scala.collection.mutable.Set(seed.map(_._1): _*)
    Seq(batch1, batch2).foreach { b =>
      val admitted = Dedup.admitIncremental(corpus, b.toDF("doc_id", "text"),
        "text", "doc_id", threshold = 0.8)
      want ++= ids(admitted)
      corpus = corpus.unionByName(admitted).localCheckpoint()
    }
    assert(ids(spark.read.parquet(corpusPath)) == want.toSet,
      "stream admission must equal sequential batch admission")
    // the persisted index stayed in step with the grown corpus
    val gotIdx = Dedup.loadBandIndex(spark, indexPath)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    val wantIdx = Dedup.bandIndex(corpus, "text", "doc_id")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    assert(gotIdx == wantIdx)

    // a NEW query on the same artifacts keeps screening: an exact copy
    // of a seed doc is rejected, a novel doc admitted
    val copyOfSeed = (900001L, seed.head._2)
    val novel = (900002L, "zanzibar quokka paradox luminous arcade " +
      "velvet thunder biscuit meridian opal cascade")
    val src2 = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, String)](spark, 78)
    val q2 = StreamingAdmission.start(src2.toDS().toDF("doc_id", "text"),
      "text", "doc_id", corpusPath, indexPath, s"$dir/ckpt2", threshold = 0.8,
      trigger = Trigger.ProcessingTime(0L))
    try { src2.addData(copyOfSeed, novel); q2.processAllAvailable() }
    finally q2.stop()
    val finalIds = ids(spark.read.parquet(corpusPath))
    assert(finalIds.contains(900002L) && !finalIds.contains(900001L),
      "resumed admission must reject the copy and admit the novel doc")
  }

  test("versioned streaming upsert: one commit per batch, rollback serves the prior version") {
    import spark.implicits._
    import graft.sources.SnapshotLake
    val dir = java.nio.file.Files.createTempDirectory("graft_vsupsert").toString
    val (table, ckpt) = (s"$dir/table", s"$dir/ckpt")
    // (user_id, event_type, ts_version, value); keys = (user_id,
    // event_type), partition = event_type
    val src = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, String, Long, Double)](spark, 91)
    val q = graft.streaming.StreamingUpsert.startVersioned(
      src.toDS().toDF("user_id", "event_type", "ver", "value"),
      Seq("user_id", "event_type"), "ver", Nil, table, ckpt, "event_type",
      trigger = org.apache.spark.sql.streaming.Trigger.ProcessingTime(0L))
    def snapshot(v: Option[Int]): Map[(Long, String), (Long, Double)] =
      SnapshotLake.read(spark, table, v, partCol = "event_type")
        .select(col("user_id"), col("event_type"), col("ver"), col("value"))
        .collect().map(r => ((r.getLong(0), r.getString(1)),
          (r.getLong(2), r.getDouble(3)))).toMap
    try {
      src.addData((1L, "click", 1L, 1.0), (2L, "click", 1L, 2.0),
        (3L, "view", 1L, 3.0))
      q.processAllAvailable()
      assert(SnapshotLake.currentVersion(spark, table) == 1)
      val v1 = snapshot(None)
      assert(v1 == Map((1L, "click") -> (1L, 1.0), (2L, "click") -> (1L, 2.0),
        (3L, "view") -> (1L, 3.0)))
      // batch 2 updates user 1's click and adds a purchase — only the
      // click partition is rewritten; view carries forward by manifest
      src.addData((1L, "click", 2L, 10.0), (4L, "purchase", 1L, 4.0))
      q.processAllAvailable()
      assert(SnapshotLake.currentVersion(spark, table) == 2)
      val v2 = snapshot(None)
      assert(v2((1L, "click")) == (2L, 10.0), "batch row must win on collision")
      assert(v2((2L, "click")) == (1L, 2.0) && v2((3L, "view")) == (1L, 3.0))
      assert(v2((4L, "purchase")) == (1L, 4.0))
      // time travel: version 1 still serves the pre-merge state
      assert(snapshot(Some(1)) == v1, "older version must be unaffected by commits")
      // mid-stream rollback: the table serves version 1's content again...
      SnapshotLake.rollback(spark, table, 1)
      assert(snapshot(None) == v1, "rollback must serve the prior version")
      // ...and the STREAM keeps committing on top of the rolled-back state
      src.addData((5L, "view", 3L, 5.0))
      q.processAllAvailable()
      val v4 = snapshot(None)
      assert(v4((5L, "view")) == (3L, 5.0))
      assert(v4((1L, "click")) == (1L, 1.0),
        "post-rollback commit must build on the rolled-back content")
      assert(!v4.contains((4L, "purchase")),
        "rolled-back partition content must stay rolled back")
      // full history retained: 4 versions (3 commits + 1 rollback)
      assert(SnapshotLake.currentVersion(spark, table) == 4)
    } finally q.stop()
  }

  test("stream-static enrichment join equals the batch equivalent") {
    val dim = graft.sources.Tables.customer(spark, sfDir)
      .select(col("c_custkey"), col("c_mktsegment"))
    val stream = EventsStream.enrichedAgg(
      EventsStream.readEvents(spark, sfDir), dim)
    val q = stream.writeStream.outputMode("complete")
      .format("memory").queryName("enrich_out").start()
    try {
      q.processAllAvailable()
      // collapse the stream's windows: totals per (segment, type) must
      // match the batch face exactly
      val got = spark.table("enrich_out")
        .groupBy(col("c_mktsegment"), col("event_type"))
        .agg(sum(col("n_events")).as("n"))
        .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
        .toSet
      val want = graft.queries.WarehouseQueries
        .eventsEnrichedAgg(spark, sfDir)
        .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
        .toSet
      assert(got == want)
    } finally q.stop()
  }

  test("streaming session_window equals the batch formulation once the watermark passes") {
    import spark.implicits._
    def ev(id: Long, user: Long, minute: Long): EventsStream.Event =
      EventsStream.Event(id, new java.sql.Timestamp(
        java.sql.Timestamp.valueOf("2024-01-01 00:00:00").getTime + minute * 60000L),
        user, "click", 1.0)
    // user 1: two sessions (gap 400min > 4h); user 2: one singleton
    val real = Seq(ev(1, 1, 0), ev(2, 1, 100), ev(3, 1, 500), ev(4, 2, 30))
    // epilogue far in the future so the watermark passes every real
    // session and append mode emits them all
    val epilogue = ev(99, 99, 60 * 24 * 10)
    val src = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[EventsStream.Event](
      spark, 42)
    val q = EventsStream.sessionWindowAgg(src.toDS().toDF())
      .writeStream.outputMode("append").format("memory")
      .queryName("sess_win_out").start()
    try {
      src.addData(real: _*)
      q.processAllAvailable()
      src.addData(epilogue)
      q.processAllAvailable()
      val got = spark.table("sess_win_out")
        .filter(col("user_id") =!= 99)
        .collect()
        .map(r => (r.getLong(0), r.getTimestamp(1), r.getTimestamp(2), r.getLong(3)))
        .toSet
      val batch = real.toDF()
        .groupBy(col("user_id"), session_window(col("ts"), "4 hours").as("w"))
        .agg(count(lit(1)).as("n_events"))
        .select(col("user_id"), col("w.start"), col("w.end"), col("n_events"))
        .collect()
        .map(r => (r.getLong(0), r.getTimestamp(1), r.getTimestamp(2), r.getLong(3)))
        .toSet
      assert(got == batch)
      assert(got.size == 3, s"expected 3 sessions, got $got")
    } finally q.stop()
  }

  for (((provider, label), vi) <- stateStoreVariants.zipWithIndex)
  test(s"streaming dedup keeps one arrival per key across batches ($label)") {
    import spark.implicits._
    def ev(id: Long, minute: Long): EventsStream.Event =
      EventsStream.Event(id, new java.sql.Timestamp(
        java.sql.Timestamp.valueOf("2024-01-01 00:00:00").getTime + minute * 60000L),
        7L, "click", 1.0)
    withStateStoreProvider(provider) {
      val src = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[EventsStream.Event](
        spark, 3 + vi * 100)
      val q = EventsStream.streamingDedup(src.toDS().toDF(), Seq("event_id"))
        .writeStream.outputMode("append").format("memory")
        .queryName(s"dedup_out_$vi").start()
      try {
        // duplicates inside a batch AND repeated across batches
        src.addData(ev(1, 0), ev(1, 0), ev(2, 1))
        q.processAllAvailable()
        src.addData(ev(2, 1), ev(3, 2), ev(1, 0))
        q.processAllAvailable()
        val got = spark.table(s"dedup_out_$vi")
          .select(col("event_id")).collect().map(_.getLong(0)).sorted.toSeq
        assert(got == Seq(1L, 2L, 3L),
          s"each key must survive exactly once, got $got")
      } finally q.stop()
    }
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

  test("outer attribution emits an unmatched click once both watermarks pass") {
    import spark.implicits._
    def ev(id: Long, user: Long, minute: Long, typ: String): EventsStream.Event =
      EventsStream.Event(id, new java.sql.Timestamp(
        java.sql.Timestamp.valueOf("2024-01-01 00:00:00").getTime + minute * 60000L),
        user, typ, 1.0)
    val src = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[EventsStream.Event](
      spark, 1)
    val q = EventsStream.clickPurchaseJoinOuter(src.toDS().toDF())
      .writeStream.outputMode("append").format("memory")
      .queryName("attr_outer_out").start()
    try {
      // user 1: click matched by a purchase 10 min later;
      // user 2: click with NO purchase — the abandonment signal
      src.addData(ev(1, 1, 0, "click"), ev(2, 1, 10, "purchase"),
        ev(3, 2, 5, "click"))
      q.processAllAvailable()
      // advance BOTH sides' watermarks far past click+30min windows
      src.addData(ev(4, 9, 600, "click"), ev(5, 9, 601, "purchase"))
      q.processAllAvailable()
      src.addData(ev(6, 9, 650, "click"), ev(7, 9, 651, "purchase"))
      q.processAllAvailable()
      val got = spark.table("attr_outer_out")
        .select(col("click_id"), col("purchase_id"))
        .collect()
        .map(r => (r.getLong(0), if (r.isNullAt(1)) None else Some(r.getLong(1))))
        .toMap
      assert(got(1L) == Some(2L), s"matched click wrong: $got")
      assert(got.contains(3L) && got(3L).isEmpty,
        s"unmatched click not emitted as outer row: $got")
    } finally q.stop()
  }

  test("event-time timeout closes an idle session once the watermark passes") {
    import spark.implicits._
    def ev(id: Long, user: Long, minute: Long): EventsStream.Event =
      EventsStream.Event(id, new java.sql.Timestamp(
        java.sql.Timestamp.valueOf("2024-01-01 00:00:00").getTime + minute * 60000L),
        user, "click", 1.0)
    val src = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[EventsStream.Event](
      spark, 1)
    val q = EventsStream.sessionizeEventTime(src.toDS(), gapSeconds = 600)
      .writeStream.outputMode("append").format("memory")
      .queryName("sess_et_out").start()
    try {
      // user 1: three events inside one session; no later events for
      // user 1 ever arrive
      src.addData(ev(1, 1, 0), ev(2, 1, 3), ev(3, 1, 6))
      q.processAllAvailable()
      assert(spark.table("sess_et_out").isEmpty,
        "session still live — nothing may be emitted yet")
      // another USER's much-later event advances the watermark past
      // user 1's last + gap; the timeout must close user 1's session
      src.addData(ev(4, 2, 600))
      q.processAllAvailable()
      src.addData(ev(5, 2, 601))   // one more batch so the timeout fires
      q.processAllAvailable()
      val sessions = spark.table("sess_et_out").as[EventsStream.Session]
        .collect().filter(_.user_id == 1L)
      assert(sessions.length == 1,
        s"idle session must be closed by the event-time timeout, got ${sessions.toSeq}")
      assert(sessions.head.n_events == 3)
    } finally q.stop()
  }

  test("transformWithState sessionizer matches the flatMapGroupsWithState semantics") {
    import spark.implicits._
    def ev(id: Long, user: Long, minute: Long): EventsStream.Event =
      EventsStream.Event(id, new java.sql.Timestamp(
        java.sql.Timestamp.valueOf("2024-01-01 00:00:00").getTime + minute * 60000L),
        user, "click", 1.0)
    // transformWithState mandates the RocksDB provider
    withStateStoreProvider(stateStoreVariants.last._1) {
      val src = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[EventsStream.Event](
        spark, 201)
      val q = EventsStream.sessionizeTws(src.toDS(), gapSeconds = 600)
        .writeStream.outputMode("append").format("memory")
        .queryName("sess_tws_out").start()
      try {
        // same scenario as the v1 event-time test: an idle session must
        // close via the event-time TIMER once the watermark passes
        src.addData(ev(1, 1, 0), ev(2, 1, 3), ev(3, 1, 6))
        q.processAllAvailable()
        assert(spark.table("sess_tws_out").isEmpty,
          "session still live — nothing may be emitted yet")
        src.addData(ev(4, 2, 600))
        q.processAllAvailable()
        src.addData(ev(5, 2, 601))
        q.processAllAvailable()
        val sessions = spark.table("sess_tws_out").as[EventsStream.Session]
          .collect().filter(_.user_id == 1L)
        assert(sessions.length == 1,
          s"idle session must close via the event-time timer, got ${sessions.toSeq}")
        assert(sessions.head.n_events == 3)
        assert(sessions.head.t_end.getTime ==
          java.sql.Timestamp.valueOf("2024-01-01 00:06:00").getTime)
      } finally q.stop()
    }
  }

  test("transformWithState sessionizer: late in-gap event merges without a duplicate timer") {
    import spark.implicits._
    def ev(id: Long, user: Long, minute: Long): EventsStream.Event =
      EventsStream.Event(id, new java.sql.Timestamp(
        java.sql.Timestamp.valueOf("2024-01-01 00:00:00").getTime + minute * 60000L),
        user, "click", 1.0)
    withStateStoreProvider(stateStoreVariants.last._1) {
      val src = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[EventsStream.Event](
        spark, 202)
      val q = EventsStream.sessionizeTws(src.toDS(), gapSeconds = 600,
          watermarkDelay = "30 minutes")
        .writeStream.outputMode("append").format("memory")
        .queryName("sess_tws_late").start()
      try {
        src.addData(ev(1, 1, 0), ev(2, 1, 6))
        q.processAllAvailable()
        // a LATE in-gap event: s.last is unchanged, so the re-arm sees
        // the same deadline and must NOT stack a second timer
        src.addData(ev(3, 1, 3))
        q.processAllAvailable()
        src.addData(ev(4, 2, 60))
        q.processAllAvailable()
        src.addData(ev(5, 2, 61))
        q.processAllAvailable()
        val s = spark.table("sess_tws_late").as[EventsStream.Session]
          .collect().filter(_.user_id == 1L)
        assert(s.length == 1, s"expected exactly one closed session, got ${s.toSeq}")
        assert(s.head.n_events == 3, "late event must merge into the session")
        assert(s.head.t_end.getTime ==
          java.sql.Timestamp.valueOf("2024-01-01 00:06:00").getTime,
          "a late event must not drag the session end backward")
      } finally q.stop()
    }
  }

  test("late in-gap event extends the session without dragging bounds backward") {
    import spark.implicits._
    def ev(id: Long, user: Long, minute: Long): EventsStream.Event =
      EventsStream.Event(id, new java.sql.Timestamp(
        java.sql.Timestamp.valueOf("2024-01-01 00:00:00").getTime + minute * 60000L),
        user, "click", 1.0)
    val src = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[EventsStream.Event](
      spark, 2)
    val q = EventsStream.sessionizeEventTime(src.toDS(), gapSeconds = 600,
        watermarkDelay = "30 minutes")
      .writeStream.outputMode("append").format("memory")
      .queryName("sess_late_out").start()
    try {
      src.addData(ev(1, 1, 0), ev(2, 1, 6))
      q.processAllAvailable()
      // a LATE event inside the session span arrives in the next batch
      src.addData(ev(3, 1, 3))
      q.processAllAvailable()
      // advance the watermark far past last+gap so the timeout closes it
      src.addData(ev(4, 2, 60))
      q.processAllAvailable()
      src.addData(ev(5, 2, 61))
      q.processAllAvailable()
      val s = spark.table("sess_late_out").as[EventsStream.Session]
        .collect().filter(_.user_id == 1L)
      assert(s.length == 1, s"expected one closed session, got ${s.toSeq}")
      assert(s.head.n_events == 3, "late event must merge into the session")
      assert(s.head.t_end.getTime == java.sql.Timestamp.valueOf("2024-01-01 00:06:00").getTime,
        "a late event must not drag the session end backward")
    } finally q.stop()
  }

  for (((provider, label), vi) <- stateStoreVariants.zipWithIndex)
  test(s"stateful sessionizer: gaps within bound never split, events conserved ($label)") {
    import spark.implicits._
    val events = graft.sources.Tables.events(spark, sfDir)
      .select(col("event_id"), col("ts"), col("user_id"),
        col("event_type"), col("value"))
      .as[EventsStream.Event]
    // batch-mode flatMapGroupsWithState needs Update output semantics;
    // run it through the streaming engine with a memory source instead
    withStateStoreProvider(provider) {
    val src = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[EventsStream.Event](
      spark, 1)
    src.addData(events.collect().toSeq)
    val q = EventsStream.sessionize(src.toDS(), gapSeconds = 4 * 3600)
      .writeStream.outputMode("append").format("memory")
      .queryName(s"sess_out_$vi").start()
    try {
      q.processAllAvailable()
      val sessions = spark.table(s"sess_out_$vi").collect()
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

  test("tws NoTimeout sessionizer emits exactly the fMGWS NoTimeout sessions across batches") {
    import spark.implicits._
    val events = graft.sources.Tables.events(spark, sfDir)
      .select(col("event_id"), col("ts"), col("user_id"),
        col("event_type"), col("value"))
      .as[EventsStream.Event]
      .collect().toSeq
    // split into two batches mid-stream so sessions span a state
    // round-trip in both engines; chronological split keeps the
    // scenario realistic (state carries OPEN sessions forward)
    val sorted = events.sortBy(e => (e.ts.getTime, e.event_id))
    val (b1, b2) = sorted.splitAt(sorted.length / 2)
    def run(name: String, mk: org.apache.spark.sql.Dataset[EventsStream.Event] =>
        org.apache.spark.sql.Dataset[EventsStream.Session]): Set[(Long, Long, Long, Long)] = {
      val src = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[EventsStream.Event](
        spark, name.hashCode.abs % 1000 + 300)
      val q = mk(src.toDS()).writeStream.outputMode("append")
        .format("memory").queryName(name).start()
      try {
        src.addData(b1); q.processAllAvailable()
        src.addData(b2); q.processAllAvailable()
        spark.table(name).as[EventsStream.Session].collect()
          .map(s => (s.user_id, s.t_start.getTime, s.t_end.getTime, s.n_events))
          .toSet
      } finally q.stop()
    }
    val v1 = withStateStoreProvider(stateStoreVariants.head._1) {
      run("sess_v1_parity", EventsStream.sessionize(_, gapSeconds = 4 * 3600))
    }
    // transformWithState mandates the RocksDB provider
    val v2 = withStateStoreProvider(stateStoreVariants.last._1) {
      run("sess_tws_parity",
        EventsStream.sessionizeTwsNoTimeout(_, gapSeconds = 4 * 3600))
    }
    assert(v1.nonEmpty, "the two-batch split must close at least one session")
    assert(v2 == v1, s"tws and fMGWS emissions differ: " +
      s"only-v1=${(v1 -- v2).take(3)} only-v2=${(v2 -- v1).take(3)}")
  }

  test("tws event-time sessionizer emits exactly the fMGWS event-time sessions across batches") {
    import spark.implicits._
    def ev(id: Long, user: Long, minute: Long): EventsStream.Event =
      EventsStream.Event(id, new java.sql.Timestamp(
        java.sql.Timestamp.valueOf("2024-01-01 00:00:00").getTime + minute * 60000L),
        user, "click", 1.0)
    // three batches driving the same watermark march through both
    // engines: u1/u2 close via TIMER when b2's watermark passes, u3's
    // first session closes on b3, u3's last event stays open (emitted
    // by neither)
    val batches = Seq(
      Seq(ev(1, 1, 0), ev(2, 1, 3), ev(3, 1, 6), ev(4, 2, 2)),
      Seq(ev(5, 3, 30)),
      Seq(ev(6, 3, 60)))
    def run(name: String, mk: org.apache.spark.sql.Dataset[EventsStream.Event] =>
        org.apache.spark.sql.Dataset[EventsStream.Session]): Set[(Long, Long, Long, Long)] = {
      val src = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[EventsStream.Event](
        spark, name.hashCode.abs % 1000 + 1300)
      val q = mk(src.toDS()).writeStream.outputMode("append")
        .format("memory").queryName(name).start()
      try {
        batches.foreach { b => src.addData(b); q.processAllAvailable() }
        spark.table(name).as[EventsStream.Session].collect()
          .map(s => (s.user_id, s.t_start.getTime, s.t_end.getTime, s.n_events))
          .toSet
      } finally q.stop()
    }
    val v1 = withStateStoreProvider(stateStoreVariants.head._1) {
      run("sess_v1_et_parity",
        EventsStream.sessionizeEventTime(_, gapSeconds = 600))
    }
    // transformWithState mandates the RocksDB provider
    val v2 = withStateStoreProvider(stateStoreVariants.last._1) {
      run("sess_tws_et_parity",
        EventsStream.sessionizeTws(_, gapSeconds = 600))
    }
    assert(v1.exists(_._1 == 1L) && v1.exists(_._1 == 2L),
      s"timer-closed sessions expected for u1 and u2, got $v1")
    assert(v2 == v1, s"tws and fMGWS event-time emissions differ: " +
      s"only-v1=${v1 -- v2} only-v2=${v2 -- v1}")
  }

  test("streaming quality monitoring totals equal the batch expectation scan") {
    import spark.implicits._
    import graft.operators.Expectations
    val rules = Seq(
      Expectations.notNull("fk"),
      Expectations.inRange("amount", 0.0, 100.0),
      Expectations.inSet("status", Seq("O", "F")))
    val rows = Seq(
      (Option(1L), 50.0, "O"), (Option(2L), -5.0, "O"),
      (None: Option[Long], 60.0, "F"), (Option(3L), 70.0, "X"),
      (Option(4L), 200.0, "F"), (None: Option[Long], 300.0, "Y"))
    val base = java.nio.file.Files.createTempDirectory("graft_squal")
      .toFile.getAbsolutePath
    val src = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Option[Long], Double, String)](spark, 80)
    val q = graft.streaming.StreamingQuality.start(
      src.toDS().toDF("fk", "amount", "status"), rules,
      s"$base/lake", s"$base/ckpt",
      trigger = org.apache.spark.sql.streaming.Trigger.ProcessingTime(0L))
    try {
      src.addData(rows.take(2): _*); q.processAllAvailable()
      src.addData(rows.slice(2, 5): _*); q.processAllAvailable()
      src.addData(rows.drop(5): _*); q.processAllAvailable()
    } finally q.stop()
    val streamed = graft.streaming.StreamingQuality.totals(spark, s"$base/lake")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getBoolean(2))).toSeq
    val batch = Expectations.check(rows.toDF("fk", "amount", "status"),
        rowRules = rules)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getBoolean(2))).toSeq
    assert(streamed == batch, s"stream $streamed vs batch $batch")
    // the per-batch history is the monitoring series: 3 rows per rule
    assert(spark.read.parquet(s"$base/lake").count() == 3L * rules.length)
  }

  test("streaming A/B readout equals the batch Welch row bit-exactly") {
    import spark.implicits._
    val rows = (1 to 60).map(i => (i.toLong, (i % 17) + 0.25 * (i % 4)))
    val base = java.nio.file.Files.createTempDirectory("graft_ab")
      .toFile.getAbsolutePath
    val src = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, Double)](spark, 81)
    val q = graft.streaming.StreamingAb.start(
      src.toDS().toDF("u", "v"), col("u") % 2, col("v"),
      s"$base/stats", s"$base/ckpt",
      trigger = org.apache.spark.sql.streaming.Trigger.ProcessingTime(0L))
    try {
      src.addData(rows.take(13): _*); q.processAllAvailable()
      src.addData(rows.slice(13, 40): _*); q.processAllAvailable()
      src.addData(rows.drop(40): _*); q.processAllAvailable()
    } finally q.stop()
    val streamed = graft.streaming.StreamingAb
      .ttestToDate(spark, s"$base/stats").collect().head
    val batch = graft.operators.AbStats.welchTTest(
      rows.toDF("u", "v"), col("u") % 2, col("v")).collect().head
    assert(streamed === batch,
      s"stream $streamed vs batch $batch — additive decimal sums + " +
        "shared finisher must be bit-equal")
    // replay idempotency: re-appending batch 1 replaces its partition
    graft.streaming.LakeState.putBatch(
      graft.operators.AbStats.welchSufficient(
        rows.take(13).toDF("u", "v"), col("u") % 2, col("v")),
      s"$base/stats", 0L)
    assert(graft.streaming.StreamingAb.ttestToDate(spark, s"$base/stats")
      .collect().head === batch, "replayed batch must not double-count")
  }

  test("streaming trending heavy hitters equals the one-shot batch operator") {
    import spark.implicits._
    // skewed occurrence stream: unique occurrence ids, known heavies
    val words = Seq.fill(50)("alpha") ++ Seq.fill(30)("beta") ++
      Seq.fill(20)("gamma") ++ (1 to 40).map(i => s"tail$i")
    val occ = words.zipWithIndex.map { case (w, i) => (i.toLong, w) }
    val base = java.nio.file.Files.createTempDirectory("graft_trend")
      .toFile.getAbsolutePath
    val src = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, String)](spark, 79)
    val q = graft.streaming.StreamingTrending.start(
      src.toDS().toDF("i", "e"), col("i"), col("e"),
      s"$base/lake", s"$base/ckpt",
      trigger = org.apache.spark.sql.streaming.Trigger.ProcessingTime(0L))
    try {
      val (b1, rest) = occ.splitAt(47)
      val (b2, b3) = rest.splitAt(51)
      src.addData(b1: _*); q.processAllAvailable()
      src.addData(b2: _*); q.processAllAvailable()
      src.addData(b3: _*); q.processAllAvailable()
    } finally q.stop()
    val streamed = graft.streaming.StreamingTrending
      .trendingTopK(spark, s"$base/lake", 5)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    val batch = graft.operators.HeavyHitters
      .topK(occ.toDF("i", "e"), col("i"), col("e"), 5)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    // exact equality: merged per-batch CMS == one CMS over the union
    // (counters sum; same depth/width/seed), nomination coins are a
    // pure function of the occurrence id
    assert(streamed == batch, s"stream $streamed vs batch $batch")
    assert(streamed.take(3).map(_._1) == Seq("alpha", "beta", "gamma"))
    assert(streamed.head._2 >= 50, "CMS never undercounts")
  }

  test("streaming mixture gate equals the batch hash-range sampler at frozen fractions") {
    import graft.streaming.StreamingMixture
    val docs = graft.sources.Tables.documents(spark, sfDir)
    // freeze: one small stratum whole, the big one halved, one zeroed;
    // strata not listed (es/zh) take the 0.0 quarantine default
    val pairs = Seq(("en", 0.5), ("fr", 1.0), ("de", 0.0))
    val base = java.nio.file.Files.createTempDirectory("graft_mixgate")
      .toFile.getAbsolutePath
    StreamingMixture.saveFractions(
      StreamingMixture.fractions(pairs, spark), s"$base/fr")
    val lake = spark.read.parquet(s"$base/fr")
    val stream = spark.readStream.schema(docs.schema)
      .option("pathGlobFilter", "documents.parquet").parquet(sfDir)
    val q = StreamingMixture.admitted(stream, "lang", "doc_id", lake)
      .writeStream.outputMode("append").format("memory")
      .queryName("mix_gate").start()
    val got = try {
      q.processAllAvailable()
      spark.table("mix_gate").select("doc_id")
        .collect().map(_.getLong(0)).toSet
    } finally q.stop()
    // batch twin #1: the same transform over the static frame
    val want = StreamingMixture.admitted(docs, "lang", "doc_id", lake)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(got == want)
    // batch twin #2: Resample.byStratum with the same fractions/seed
    // (quarantine default 0.0) — the frozen gate IS the batch sampler
    val byStratum = graft.operators.Resample.byStratum(docs,
        col("lang"), col("doc_id"), pairs.toMap, defaultFraction = 0.0)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(got == byStratum,
      s"only-stream=${(got -- byStratum).take(3)} only-batch=${(byStratum -- got).take(3)}")
    val langs = docs.filter(col("doc_id").isInCollection(got.take(200).toSeq))
      .select("lang").distinct().collect().map(_.getString(0)).toSet
    assert(!langs.contains("de") && !langs.contains("es"),
      "zeroed and unlisted strata must be quarantined")
  }

  test("streaming boilerplate strip equals the batch strip at the frozen digest set") {
    import spark.implicits._
    import graft.streaming.StreamingBoilerplate
    val docs = graft.sources.Tables.documents(spark, sfDir)
    val base = java.nio.file.Files.createTempDirectory("graft_boiler")
      .toFile.getAbsolutePath
    StreamingBoilerplate.saveBoilerplate(docs, col("text"), col("doc_id"),
      s"$base/dup")
    val rows = docs.select(col("doc_id"), col("text"))
      .as[(Long, String)].collect().toSeq
    val (b1, b2) = rows.splitAt(rows.length / 2)
    val src = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, String)](
      spark, 2201)
    val q = StreamingBoilerplate.start(src.toDF().toDF("doc_id", "text"),
      "text", "doc_id", s"$base/dup", s"$base/out", s"$base/ckpt",
      trigger = org.apache.spark.sql.streaming.Trigger.ProcessingTime(0L))
    try {
      src.addData(b1); q.processAllAvailable()
      src.addData(b2); q.processAllAvailable()
    } finally q.stop()
    val got = spark.read.parquet(s"$base/out")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3))).toSet
    // batch twin: strip the static frame against the same artifact
    val want = graft.operators.ParagraphDedup.strip(docs, col("text"),
        col("doc_id"), spark.read.parquet(s"$base/dup"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3))).toSet
    assert(got == want,
      s"only-stream=${(got -- want).take(2)} only-batch=${(want -- got).take(2)}")
    // and the one-shot dedup (detect + strip on the same corpus) is
    // the same thing when the artifact came from that corpus
    val oneShot = graft.queries.TextQueries.paragraphDedup(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3))).toSet
    assert(got == oneShot)
  }

  test("streaming drift monitor: merged batch histograms give the batch PSI bit-exactly") {
    import spark.implicits._
    import graft.streaming.StreamingDrift
    val docs = graft.sources.Tables.documents(spark, sfDir)
    val key = col("lang")
    // reference = even doc_ids; the stream carries the odd half,
    // arriving in two micro-batches split mid-stream
    val ref = docs.filter(col("doc_id") % 2 === 0)
    val curRows = docs.filter(col("doc_id") % 2 === 1)
      .select(col("doc_id"), col("lang")).as[(Long, String)].collect().toSeq
    val (b1, b2) = curRows.splitAt(curRows.length / 2)
    val base = java.nio.file.Files.createTempDirectory("graft_drift")
      .toFile.getAbsolutePath
    StreamingDrift.saveReference(ref, key, s"$base/ref")
    val src = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, String)](
      spark, 2101)
    // continuous trigger: AvailableNow would stop after batch 1
    val q = StreamingDrift.start(src.toDF().toDF("doc_id", "lang"),
      col("lang"), s"$base/counts", s"$base/ckpt",
      trigger = org.apache.spark.sql.streaming.Trigger.ProcessingTime(0L))
    try {
      src.addData(b1); q.processAllAvailable()
      src.addData(b2); q.processAllAvailable()
    } finally q.stop()
    // per-batch rows are aggregate-sized and form a time series
    val perBatch = spark.read.parquet(s"$base/counts")
    assert(perBatch.select("batch_id").distinct().count() == 2)
    // stream-to-date PSI ≡ the batch operator over the union,
    // BIT-exactly (same expression tree via psiFromCounts)
    val got = StreamingDrift.psiToDate(spark, s"$base/ref", s"$base/counts")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4), r.getDouble(5))).toSet
    val want = graft.operators.Drift.psi(
        ref, docs.filter(col("doc_id") % 2 === 1), key)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4), r.getDouble(5))).toSet
    assert(got == want,
      s"only-stream=${(got -- want).take(2)} only-batch=${(want -- got).take(2)}")
    // identical halves of a corpus: headline must read stable
    val verdict = StreamingDrift.headline(
      StreamingDrift.psiToDate(spark, s"$base/ref", s"$base/counts")).head()
    assert(verdict.getString(1) == "stable",
      s"even/odd halves of one corpus must not alarm: $verdict")
  }

  test("streaming correlation monitor: merged statistics give the batch Pearson bit-exactly") {
    import spark.implicits._
    import graft.streaming.StreamingCorrelation
    val docs = graft.sources.Tables.documents(spark, sfDir)
    val rows = docs.select(col("doc_id"), col("text"))
      .as[(Long, String)].collect().toSeq
    val (b1, b2) = rows.splitAt(rows.length / 2)
    val base = java.nio.file.Files.createTempDirectory("graft_corr")
      .toFile.getAbsolutePath
    val src = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, String)](
      spark, 2102)
    val q = StreamingCorrelation.start(src.toDF().toDF("doc_id", "text"),
      "text", s"$base/stats", s"$base/ckpt",
      trigger = org.apache.spark.sql.streaming.Trigger.ProcessingTime(0L))
    try {
      src.addData(b1); q.processAllAvailable()
      src.addData(b2); q.processAllAvailable()
    } finally q.stop()
    // one statistics row per micro-batch — the correlation time series
    val perBatch = spark.read.parquet(s"$base/stats")
    assert(perBatch.count() == 2)
    // stream-to-date matrix ≡ the batch D79 audit over the union,
    // bit-exactly: the sums are additive integers
    val got = StreamingCorrelation.matrixToDate(spark, s"$base/stats")
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getDouble(3))).toSeq
    val want = graft.queries.TextQueries.signalCorrelation(spark, sfDir)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getDouble(3))).toSeq
    assert(got == want, s"stream=$got batch=$want")
  }

  test("streaming forecast: merged period sums give the batch Holt bit-exactly") {
    import spark.implicits._
    import graft.streaming.StreamingForecast
    val rows = graft.sources.Tables.events(spark, sfDir)
      .select(col("user_id"), col("ts"), col("value"))
      .as[(Long, java.sql.Timestamp, Double)].collect().toSeq
    // split by parity so EVERY period's rows straddle the two batches
    // — the case a per-batch running fold would get wrong
    val (b1, b2) = rows.zipWithIndex.partition(_._2 % 2 == 0) match {
      case (a, b) => (a.map(_._1), b.map(_._1))
    }
    val base = java.nio.file.Files.createTempDirectory("graft_fc")
      .toFile.getAbsolutePath
    val src = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, java.sql.Timestamp, Double)](
      spark, 2103)
    val stream = src.toDF().toDF("user_id", "ts", "value")
    val q = StreamingForecast.start(stream, col("user_id"),
      date_trunc("day", col("ts")),
      col("value").cast("decimal(12,2)"),
      s"$base/sums", s"$base/ckpt",
      trigger = org.apache.spark.sql.streaming.Trigger.ProcessingTime(0L))
    try {
      src.addData(b1); q.processAllAvailable()
      src.addData(b2); q.processAllAvailable()
    } finally q.stop()
    val got = StreamingForecast
      .forecastToDate(spark, s"$base/sums", alpha = 0.3, beta = 0.3)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getDouble(2),
        r.getDouble(3), r.getDouble(4))).toSet
    val want = graft.queries.WarehouseQueries.holtForecast(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getDouble(2),
        r.getDouble(3), r.getDouble(4))).toSet
    assert(got == want,
      s"only-stream=${(got -- want).take(2)} only-batch=${(want -- got).take(2)}")
  }

  test("streaming bootstrap: merged replica cells give the batch CI bit-exactly") {
    import spark.implicits._
    import graft.streaming.StreamingBootstrap
    val rows = graft.sources.Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("text")).as[(Long, String)].collect().toSeq
    val (b1, b2) = rows.splitAt(rows.length / 2)
    val base = java.nio.file.Files.createTempDirectory("graft_bs")
      .toFile.getAbsolutePath
    val src = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, String)](
      spark, 2104)
    val quality = round(graft.functions.TextFunctions
      .qualityScore(col("text")) * 1000000.0).cast("long")
    val q = StreamingBootstrap.start(src.toDF().toDF("doc_id", "text"),
      col("doc_id"), quality, s"$base/cells", s"$base/ckpt",
      trigger = org.apache.spark.sql.streaming.Trigger.ProcessingTime(0L))
    try {
      src.addData(b1); q.processAllAvailable()
      src.addData(b2); q.processAllAvailable()
    } finally q.stop()
    val got = StreamingBootstrap.ciToDate(spark, s"$base/cells").head()
    val want = graft.queries.TextQueries.bootstrapQualityCi(spark, sfDir).head()
    assert(got == want, s"stream=$got batch=$want")
    // at-least-once recovery: REPLAY the last batch (same batchId,
    // same rows — what foreachBatch does after a crash between the
    // lake write and the checkpoint commit) and assert the read face
    // is unchanged: the replay replaces its batch_id partition
    // instead of double-counting it
    val lastBatchId = spark.read.parquet(s"$base/cells")
      .agg(max(col("batch_id"))).head().getInt(0)
    graft.streaming.LakeState.putBatch(
      graft.operators.Bootstrap.cells(
        b2.toDF("doc_id", "text"), col("doc_id"), quality, 200, 42L),
      s"$base/cells", lastBatchId)
    val replayed = StreamingBootstrap.ciToDate(spark, s"$base/cells").head()
    assert(replayed == want,
      s"replayed batch double-counted: $replayed vs $want")
  }

  test("sentinel-drained faces equal their batch twins bit-exactly") {
    // the E2 recipe: a far-future sentinel event marches the watermark
    // past every real session/window so append mode flushes ALL state
    val gotS = graft.queries.StreamFaces.streamSessionWindows(spark, sfDir)
      .collect().toSeq
    val wantS = graft.queries.TextQueries.eventsSessionWindow(spark, sfDir)
      .collect().toSeq
    assert(gotS == wantS, s"sessions diverge: stream=${gotS.take(2)} " +
      s"batch=${wantS.take(2)}")
    // E18: the fMGWS funnel's single-batch in-order fold
    val gotF = graft.queries.StreamFaces.streamFunnelSteps(spark, sfDir)
      .collect().toSeq
    val wantF = graft.queries.WarehouseQueries.funnelSteps(spark, sfDir)
      .collect().toSeq
    assert(gotF == wantF, s"funnel diverges: stream=$gotF batch=$wantF")
  }

  test("streaming Benford equals the batch C79 audit bit-exactly") {
    // E28: additive per-batch digit counts merge to the identical
    // count frame, so the finisher output matches digit for digit
    val got = graft.queries.StreamFaces.streamBenford(spark, sfDir)
      .collect().toSeq
    val want = graft.queries.WarehouseQueries.benfordAudit(spark, sfDir)
      .collect().toSeq
    assert(got == want, s"benford diverges: stream=${got.take(2)} " +
      s"batch=${want.take(2)}")
  }

  test("streaming turning-point census equals the batch C118 readout bit-exactly") {
    // E38: same additive day cells, local-extremum finisher
    val got = graft.queries.StreamFaces.streamTurningPoint(spark, sfDir)
      .collect().toSeq
    val want = graft.queries.WarehouseQueries
      .turningPointTest(spark, sfDir).collect().toSeq
    assert(got == want, s"turning diverges: stream=$got batch=$want")
  }

  test("streaming Theil U equals the batch C119 readout bit-exactly") {
    // E37: additive day cells merge to the identical series, so the
    // Holt-fold accumulator matches slot for slot
    val got = graft.queries.StreamFaces.streamTheilU(spark, sfDir)
      .collect().toSeq
    val want = graft.queries.WarehouseQueries.theilUForecast(spark, sfDir)
      .collect().toSeq
    assert(got == want, s"theil diverges: stream=$got batch=$want")
  }

  test("streaming alpha-spending monitor equals the batch C121 readout bit-exactly") {
    // E40: per-day per-arm conversion cells are additive integer sums,
    // and the read face IS the batch finisher over the merged cells —
    // looks, z, boundaries, spend and decisions match row for row
    val got = graft.queries.StreamFaces.streamAlphaSpending(spark, sfDir)
      .collect().toSeq
    val want = graft.queries.WarehouseQueries
      .alphaSpendingMonitor(spark, sfDir).collect().toSeq
    assert(got == want, s"alpha-spending diverges: stream=$got batch=$want")
  }

  test("streaming Wilcoxon signed-rank equals the batch C116 readout bit-exactly") {
    // E39: per-(user, half-month) additive cent cells merge to the
    // identical per-user differences, so the half-unit-rank ledger
    // and z match exactly
    val got = graft.queries.StreamFaces.streamWilcoxon(spark, sfDir)
      .collect().toSeq
    val want = graft.queries.WarehouseQueries
      .wilcoxonSignedRank(spark, sfDir).collect().toSeq
    assert(got == want, s"wilcoxon diverges: stream=$got batch=$want")
  }

  test("streaming Kruskal-Wallis and Mood equal their batch readouts bit-exactly") {
    // E35/E36: the SAME additive (value, arm) census as E34 under two
    // more finishers — stream ≡ batch for each
    val gk = graft.queries.StreamFaces
      .streamKruskalWallis(spark, sfDir).collect().toSeq
    val wk = graft.queries.WarehouseQueries
      .kruskalWallis(spark, sfDir).collect().toSeq
    assert(gk == wk, s"KW diverges: stream=$gk batch=$wk")
    val gm = graft.queries.StreamFaces
      .streamMoodMedian(spark, sfDir).collect().toSeq
    val wm = graft.queries.WarehouseQueries
      .moodMedian(spark, sfDir).collect().toSeq
    assert(gm == wm, s"Mood diverges: stream=$gm batch=$wm")
  }

  test("streaming Anderson-Darling equals the batch C114 readout bit-exactly") {
    // E34: additive per-(value, arm) counts merge to the identical
    // value-domain census, so the midrank statistic matches exactly
    val got = graft.queries.StreamFaces
      .streamAndersonDarling(spark, sfDir).collect().toSeq
    val want = graft.queries.WarehouseQueries
      .andersonDarling(spark, sfDir).collect().toSeq
    assert(got == want, s"AD diverges: stream=$got batch=$want")
  }

  test("streaming Hurst equals the batch C105 readout bit-exactly") {
    // E33: additive per-hour decimal cells merge to the identical
    // hour series, so the R/S ladder matches leg for leg
    val got = graft.queries.StreamFaces.streamHurst(spark, sfDir)
      .collect().toSeq
    val want = graft.queries.WarehouseQueries.hurstExponent(spark, sfDir)
      .collect().toSeq
    assert(got == want, s"hurst diverges: stream=$got batch=$want")
  }

  test("streaming PII density equals the batch D126 readout bit-exactly") {
    // E32: four additive per-source counters merge to the identical
    // sufficient frame, so the rate finisher matches bit for bit
    val got = graft.queries.StreamFaces.streamPiiDensity(spark, sfDir)
      .collect().toSeq
    val want = graft.queries.TextQueries.piiDensityBySource(spark, sfDir)
      .collect().toSeq
    assert(got == want, s"pii diverges: stream=${got.take(2)} " +
      s"batch=${want.take(2)}")
  }

  test("streaming vocabulary monitor equals the batch D114 readout bit-exactly") {
    // E31: additive word-count cells merge to the identical census,
    // so the Good-Turing/Chao1 finisher matches bit for bit
    val got = graft.queries.StreamFaces.streamVocabMonitor(spark, sfDir)
      .collect().toSeq
    val want = graft.queries.TextQueries.goodTuringVocab(spark, sfDir)
      .collect().toSeq
    assert(got == want, s"vocab diverges: stream=$got batch=$want")
  }

  test("streaming Cramér's V equals the batch C103 readout bit-exactly") {
    // E30: additive contingency cells merge to the identical census,
    // so the chi-square/V finisher matches bit for bit
    val got = graft.queries.StreamFaces.streamCramersV(spark, sfDir)
      .collect().toSeq
    val want = graft.queries.TextQueries.langSourceCramersV(spark, sfDir)
      .collect().toSeq
    assert(got == want, s"cramers diverges: stream=$got batch=$want")
  }

  test("streaming Ljung-Box equals the batch C104 readout bit-exactly") {
    // E29: same additive day cells as E27, Q finisher instead of the
    // raw ACF — stream ≡ batch down to the folded statistic
    val got = graft.queries.StreamFaces.streamLjungBox(spark, sfDir)
      .collect().toSeq
    val want = graft.queries.WarehouseQueries.ljungBox(spark, sfDir)
      .collect().toSeq
    assert(got == want, s"ljung-box diverges: stream=$got batch=$want")
  }

  test("streaming ACF equals the batch C88 readout bit-exactly") {
    // E27: additive per-day decimal cells merge to the IDENTICAL day
    // series, so the exact-integer ACF matches lag for lag
    val got = graft.queries.StreamFaces.streamValueAcf(spark, sfDir)
      .collect().toSeq
    val want = graft.queries.WarehouseQueries.valueAcf(spark, sfDir)
      .collect().toSeq
    assert(got == want, s"acf diverges: stream=${got.take(3)} " +
      s"batch=${want.take(3)}")
  }

  test("kill-and-restart: engine-level replay of an uncommitted batch still bit-matches batch") {
    import graft.streaming.StreamingBootstrap
    val base = java.nio.file.Files.createTempDirectory("graft_chaos")
      .toFile.getAbsolutePath
    // two source files + maxFilesPerTrigger=1 => two micro-batches
    graft.sources.Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("text"))
      .repartition(2).write.parquet(s"$base/src")
    val schema = spark.read.parquet(s"$base/src").schema
    val quality = round(graft.functions.TextFunctions
      .qualityScore(col("text")) * 1000000.0).cast("long")
    def run(): Unit = {
      val stream = spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1").parquet(s"$base/src")
      val q = StreamingBootstrap.start(stream, col("doc_id"), quality,
        s"$base/cells", s"$base/ckpt",
        trigger = org.apache.spark.sql.streaming.Trigger.AvailableNow())
      q.awaitTermination()
    }
    run()
    val want = graft.queries.TextQueries.bootstrapQualityCi(spark, sfDir).head()
    assert(StreamingBootstrap.ciToDate(spark, s"$base/cells").head() == want)
    val batches = spark.read.parquet(s"$base/cells")
      .select(col("batch_id")).distinct().count()
    assert(batches == 2, s"expected 2 micro-batches, got $batches")
    // CHAOS: crash in the at-least-once window — the lake write for
    // the last batch landed but its checkpoint commit never did.
    // Deleting the last commit marker reproduces that state exactly;
    // the restarted query must REPLAY the batch through the real
    // foreachBatch path, and LakeState's batch_id partition overwrite
    // must absorb it
    val commits = new java.io.File(s"$base/ckpt/commits")
      .listFiles().filter(_.getName.forall(_.isDigit))
    assert(commits.nonEmpty)
    val last = commits.maxBy(_.getName.toInt)
    assert(last.delete(), s"could not delete commit marker $last")
    // the local-FS checkpoint manager keeps a checksum shadow; a stale
    // one would fail the restarted query's commit rename
    val crc = new java.io.File(last.getParentFile, s".${last.getName}.crc")
    if (crc.exists()) crc.delete()
    run() // restart: replays the uncommitted batch, then finishes
    assert(StreamingBootstrap.ciToDate(spark, s"$base/cells").head() == want,
      "replayed batch double-counted after kill-and-restart")
    // still exactly one partition per batch id — the replay replaced,
    // never appended
    val after = spark.read.parquet(s"$base/cells")
      .groupBy(col("batch_id"), col("b")).count()
      .filter(col("count") > 1).count()
    assert(after == 0, "duplicate cells after replay")
  }

  test("multi-batch upsert: later load wins; permuting file order flips the winner") {
    import spark.implicits._
    // user 1 has conflicting rows in all three slices with event time
    // OPPOSING batch order: the globally-latest ts (event 3) sits in
    // slice 0, so load order — not event time — must pick the winner
    val rows = Seq(
      (3L, java.sql.Timestamp.valueOf("2024-01-05 10:00:00"), 1L, "view", 1.0),
      (1L, java.sql.Timestamp.valueOf("2024-01-01 10:00:00"), 1L, "view", 2.0),
      (2L, java.sql.Timestamp.valueOf("2024-01-03 10:00:00"), 1L, "view", 3.0),
      (6L, java.sql.Timestamp.valueOf("2024-02-01 10:00:00"), 2L, "view", 4.0))
      .toDF("event_id", "ts", "user_id", "event_type", "value")
    def run(order: org.apache.spark.sql.Column, tag: String): Map[Long, Long] = {
      val base = java.nio.file.Files.createTempDirectory(s"graft_perm$tag")
        .toFile.getAbsolutePath
      val src = graft.queries.StreamFaces.sliceSource(rows, base, order, 3)
      val stream = spark.readStream.schema(rows.schema)
        .option("maxFilesPerTrigger", "1").parquet(src)
      val q = graft.streaming.StreamingUpsert.start(
        stream, Seq("user_id"), "ts", Seq("event_id"),
        s"$base/table", s"$base/ckpt")
      q.awaitTermination()
      spark.read.parquet(s"$base/table").collect()
        .map(r => r.getAs[Long]("user_id") -> r.getAs[Long]("event_id")).toMap
    }
    val fwd = run(pmod(col("event_id"), lit(3)), "f")
    val rev = run(lit(2) - pmod(col("event_id"), lit(3)), "r")
    // forward (slices 0,1,2): the last batch holds event 2 — it wins
    // even though event 3's ts is later
    assert(fwd(1L) == 2L, s"forward order winner: $fwd")
    // reversed (slices 2,1,0): the last batch is the id%3=0 slice —
    // event 3 wins; SAME data, different load order, different table
    assert(rev(1L) == 3L, s"reversed order winner: $rev")
    // a user present in one batch only is untouched by the permutation
    assert(fwd(2L) == 6L && rev(2L) == 6L)
  }

  test("multi-batch upsert chaos: permuted order + kill after batch 2, " +
      "resume equals the contiguous run") {
    // the ORDER-DEPENDENT face under the full chaos recipe: slices
    // arrive in permuted order (2,0,1), the stream dies after batch
    // 2's lake write with the commit marker LOST (the worst crash
    // window for a non-transactional sink), slice 1 arrives while
    // down, and the resumed stream must (a) replay batch 1 as a
    // no-op re-merge and (b) land batch 2 — ending BIT-IDENTICAL to
    // the same permuted order run without any crash.
    val ev = graft.sources.Tables.events(spark, sfDir)
      .select(col("event_id"), col("ts"), col("user_id"),
        col("event_type"), col("value"))
    // permutation 2,0,1 of the event_id mod 3 slices
    val permuted = element_at(
      array(lit(1L), lit(2L), lit(0L)), (pmod(col("event_id"), lit(3)) + 1).cast("int"))
    def mkStaged(tag: String): (String, String) = {
      val base = java.nio.file.Files.createTempDirectory(s"graft_uxc$tag")
        .toFile.getAbsolutePath
      (base, graft.queries.StreamFaces.sliceSource(ev, base, permuted, 3))
    }
    def run(base: String, srcDir: String): Unit = {
      val stream = spark.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", "1").parquet(srcDir)
      val q = graft.streaming.StreamingUpsert.start(
        stream, Seq("user_id"), "ts", Seq("event_id"),
        s"$base/table", s"$base/ckpt")
      q.awaitTermination()
    }
    def table(base: String) = spark.read.parquet(s"$base/table")
      .orderBy(col("user_id"), col("event_id")).collect().toSeq
    // reference: all three files present, one contiguous run
    val (refBase, refSrc) = mkStaged("ref")
    run(refBase, refSrc)
    // chaos: stage all three, expose only the first two
    val (chBase, chStaged) = mkStaged("ch")
    val live = new java.io.File(s"$chBase/live"); live.mkdirs()
    def arm(k: Int): Unit = java.nio.file.Files.copy(
      new java.io.File(chStaged, s"slice$k.parquet").toPath,
      new java.io.File(live, s"slice$k.parquet").toPath)
    arm(0); arm(1)
    run(chBase, live.getAbsolutePath) // batches 0, 1 commit, stream ends
    val commits = new java.io.File(s"$chBase/ckpt/commits")
      .listFiles().filter(_.getName.forall(_.isDigit))
    assert(commits.map(_.getName.toInt).sorted.toSeq == Seq(0, 1))
    // crash window: batch 1's table write landed, its marker didn't
    val last = commits.maxBy(_.getName.toInt)
    assert(last.delete())
    val crc = new java.io.File(last.getParentFile, s".${last.getName}.crc")
    if (crc.exists()) crc.delete()
    arm(2) // slice 1 (the third permuted file) arrives while down
    run(chBase, live.getAbsolutePath) // replay batch 1 + run batch 2
    val committed = new java.io.File(s"$chBase/ckpt/commits")
      .listFiles().count(f => f.isFile && f.getName.forall(_.isDigit))
    assert(committed == 3, s"expected 3 committed batches, saw $committed")
    assert(table(chBase) == table(refBase),
      "crash + resume diverged from the contiguous permuted run")
  }

  test("multi-batch chaos: kill between batches 2 and 3, replay + cross-batch merge compose") {
    import graft.streaming.StreamingBootstrap
    val base = java.nio.file.Files.createTempDirectory("graft_chaos3")
      .toFile.getAbsolutePath
    // three single-file slices staged aside; the source dir starts
    // with the first two
    val docs = graft.sources.Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("text"))
    val staged = graft.queries.StreamFaces.sliceSource(
      docs, base, pmod(col("doc_id"), lit(3)), 3)
    val src = new java.io.File(s"$base/live"); src.mkdirs()
    def arm(k: Int): Unit = java.nio.file.Files.copy(
      new java.io.File(staged, s"slice$k.parquet").toPath,
      new java.io.File(src, s"slice$k.parquet").toPath)
    arm(0); arm(1)
    val schema = spark.read.parquet(staged).schema
    val quality = round(graft.functions.TextFunctions
      .qualityScore(col("text")) * 1000000.0).cast("long")
    def run(): Unit = {
      val stream = spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1").parquet(src.getAbsolutePath)
      val q = StreamingBootstrap.start(stream, col("doc_id"), quality,
        s"$base/cells", s"$base/ckpt",
        trigger = org.apache.spark.sql.streaming.Trigger.AvailableNow())
      q.awaitTermination()
    }
    run() // batches 0 and 1 commit
    // CHAOS between batches 2 and 3: batch 1's lake write landed but
    // its commit marker didn't; batch 2's file arrives while down
    val commits = new java.io.File(s"$base/ckpt/commits")
      .listFiles().filter(_.getName.forall(_.isDigit))
    assert(commits.map(_.getName.toInt).sorted.toSeq == Seq(0, 1))
    val last = commits.maxBy(_.getName.toInt)
    assert(last.delete())
    val crc = new java.io.File(last.getParentFile, s".${last.getName}.crc")
    if (crc.exists()) crc.delete()
    arm(2)
    run() // replays batch 1, then runs batch 2 — merge must compose
    val cells = spark.read.parquet(s"$base/cells")
    assert(cells.select(col("batch_id")).distinct().count() == 3)
    assert(StreamingBootstrap.ciToDate(spark, s"$base/cells").head() ==
      graft.queries.TextQueries.bootstrapQualityCi(spark, sfDir).head(),
      "replayed + merged cells must still equal the batch CI")
    // replay replaced its batch partition, never appended
    assert(cells.groupBy(col("batch_id"), col("b")).count()
      .filter(col("count") > 1).count() == 0)
  }

  test("streaming SCD2: chaos replay of a multi-version batch is a no-op") {
    import spark.implicits._
    def d(s: String) = java.sql.Date.valueOf(s)
    val base = java.nio.file.Files.createTempDirectory("graft_s2chaos")
      .toFile.getAbsolutePath
    // batch 2 opens TWO versions for key 1 — the case where a naive
    // replay would re-open the closed middle version
    val rows = Seq(
      (1L, "A", d("2024-01-01"), 1L),   // slice 0
      (1L, "B", d("2024-02-01"), 2L),   // slice 1
      (1L, "C", d("2024-02-15"), 3L),   // slice 1 (two versions in one batch)
      (2L, "X", d("2024-02-20"), 4L))   // slice 1
      .toDF("k", "attr", "dt", "tb")
    val slice = when(col("dt") < lit(d("2024-01-15")), 0).otherwise(1)
    val src = graft.queries.StreamFaces.sliceSource(rows, base, slice, 2)
    def run(): Unit = {
      val stream = spark.readStream.schema(rows.schema)
        .option("maxFilesPerTrigger", "1").parquet(src)
      val q = graft.streaming.StreamingScd2.start(stream,
        Seq("k"), Seq("attr"), "dt", "tb", s"$base/table", s"$base/ckpt")
      q.awaitTermination()
    }
    run()
    def table() = spark.read.parquet(s"$base/table")
      .orderBy(col("k"), col("valid_from")).collect().toSeq
    val want = graft.operators.Scd2.history(rows, Seq("k"), Seq("attr"), "dt", "tb")
      .orderBy(col("k"), col("valid_from")).collect().toSeq
    assert(table() == want, "streamed history must equal the batch rebuild")
    // CHAOS: drop the last commit marker — the restarted query replays
    // the multi-version batch against the table it already extended
    val commits = new java.io.File(s"$base/ckpt/commits")
      .listFiles().filter(_.getName.forall(_.isDigit))
    val last = commits.maxBy(_.getName.toInt)
    assert(last.delete())
    val crc = new java.io.File(last.getParentFile, s".${last.getName}.crc")
    if (crc.exists()) crc.delete()
    run()
    assert(table() == want, "replayed batch must be absorbed as a no-op")
  }

  test("streaming perplexity gate equals the batch threshold filter and honors the frozen cut") {
    import graft.streaming.StreamingScoreFilter
    import graft.operators.LanguageModel
    val docs = graft.sources.Tables.documents(spark, sfDir)
    val lm = LanguageModel.trainBigram(docs, "text", topK = 64)
    val cut = graft.queries.TextQueries.perplexityFilter(spark, sfDir)
    val thr = StreamingScoreFilter.thresholds(cut)
    // artifact round-trip: what the stream loads is what batch froze
    val base = java.nio.file.Files.createTempDirectory("graft_pplgate")
      .toFile.getAbsolutePath
    StreamingScoreFilter.saveThresholds(thr, s"$base/thr")
    val thrLake = spark.read.parquet(s"$base/thr")
    val stream = spark.readStream.schema(docs.schema)
      .option("pathGlobFilter", "documents.parquet").parquet(sfDir)
    val q = StreamingScoreFilter.filtered(stream, lm, thrLake)
      .writeStream.outputMode("append").format("memory")
      .queryName("ppl_gate").start()
    val got = try {
      q.processAllAvailable()
      spark.table("ppl_gate").select("doc_id")
        .collect().map(_.getLong(0)).toSet
    } finally q.stop()
    // the gate is a stateless plan: the same transform over the static
    // frame is its batch twin
    val want = StreamingScoreFilter.filtered(docs, lm, thrLake)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(got == want, s"only-stream=${(got -- want).take(3)} " +
      s"only-batch=${(want -- got).take(3)}")
    // threshold admission is the quota cut plus boundary ties: every
    // quota-kept doc passes, and nothing below any language threshold
    // is lost
    val keptBatch = cut.filter(col("kept")).select("doc_id")
      .collect().map(_.getLong(0)).toSet
    assert(keptBatch.subsetOf(got), "a quota-kept doc failed the frozen gate")
  }

  test("streaming classifier gate equals the batch margin filter and admits every quota-kept doc") {
    import graft.streaming.StreamingClassifierGate
    import graft.operators.QualityClassifier
    val docs = graft.sources.Tables.documents(spark, sfDir)
    val m = QualityClassifier.train(docs, "text", col("source") === "src0")
    val cut = StreamingClassifierGate.batchCut(docs, m, keepRate = 0.5)
    val thr = StreamingClassifierGate.threshold(cut)
    val stream = spark.readStream.schema(docs.schema)
      .option("pathGlobFilter", "documents.parquet").parquet(sfDir)
    val q = StreamingClassifierGate.filtered(stream, m, thr)
      .writeStream.outputMode("append").format("memory")
      .queryName("clf_gate").start()
    val got = try {
      q.processAllAvailable()
      spark.table("clf_gate").select("doc_id")
        .collect().map(_.getLong(0)).toSet
    } finally q.stop()
    val want = StreamingClassifierGate.filtered(docs, m, thr)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(got == want, s"only-stream=${(got -- want).take(3)} " +
      s"only-batch=${(want -- got).take(3)}")
    // the frozen threshold reproduces the quota cut up to boundary
    // ties: every kept doc admitted, nothing above the boundary lost
    val kept = cut.filter(col("kept")).select("doc_id")
      .collect().map(_.getLong(0)).toSet
    assert(kept.subsetOf(got), "a quota-kept doc failed the frozen gate")
    assert(kept.nonEmpty && got.size < docs.count(),
      "the gate must actually separate (non-trivial keep set)")
  }

  test("streaming funnel equals batch first-touch across a chronological batch split") {
    import spark.implicits._
    import graft.streaming.StreamingFunnel
    val stages = Seq("view", "click", "purchase")
    val events = graft.sources.Tables.events(spark, sfDir)
      .select(col("event_id"), col("ts"), col("user_id"),
        col("event_type"), col("value"))
      .as[EventsStream.Event]
      .collect().toSeq
    val sorted = events.sortBy(e => (e.ts.getTime, e.event_id))
    val (b1, b2) = sorted.splitAt(sorted.length / 2)
    val src = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[EventsStream.Event](spark, 411)
    val q = StreamingFunnel.funnel(src.toDS(), stages,
        gapSeconds = Some(4 * 3600L))
      .writeStream.outputMode("append").format("memory")
      .queryName("funnel_out").start()
    val got = try {
      src.addData(b1); q.processAllAvailable()
      src.addData(b2); q.processAllAvailable()
      spark.table("funnel_out").collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getString(2), r.getTimestamp(3)))
        .toSet
    } finally q.stop()
    // twin 1: the in-order fold over the full corpus
    val want = StreamingFunnel.funnelBatch(events, stages, Some(4 * 3600L))
      .map(h => (h.user_id, h.step, h.stage, h.ts)).toSet
    assert(got == want, s"only-stream=${(got -- want).take(3)} " +
      s"only-batch=${(want -- got).take(3)}")
    // twin 2: operators.Funnel first-touch — per (user, stage) the
    // earliest qualifying ts must agree exactly
    val qual = graft.operators.Funnel.qualify(
      events.toDF(), "user_id", "event_type", "ts", "event_id", stages,
      Some(expr("INTERVAL 4 HOURS")))
    val ft = stages.indices.flatMap { i =>
      qual.filter(col(s"__q$i").isNotNull)
        .groupBy(col("user_id"))
        .agg(min(col(s"__q$i")).as("t"))
        .collect().map(r => (r.getLong(0), i + 1, stages(i), r.getTimestamp(1)))
    }.toSet
    assert(got == ft, s"stream diverges from Funnel.qualify: " +
      s"only-stream=${(got -- ft).take(3)} only-funnel=${(ft -- got).take(3)}")
    assert(got.exists(_._2 == stages.length), "some user completes the funnel")
  }

  test("streaming funnel: idle state evicts and a returning user restarts at step 1") {
    import spark.implicits._
    import graft.streaming.StreamingFunnel
    def ev(id: Long, user: Long, day: Long, typ: String): EventsStream.Event =
      EventsStream.Event(id, new java.sql.Timestamp(
        java.sql.Timestamp.valueOf("2024-01-01 00:00:00").getTime
          + day * 86400000L), user, typ, 1.0)
    val src = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[EventsStream.Event](spark, 412)
    val q = StreamingFunnel.funnel(src.toDS(), Seq("view", "click"),
        gapSeconds = None, expireSeconds = 86400L)
      .writeStream.outputMode("append").format("memory")
      .queryName("funnel_evict").start()
    val got = try {
      src.addData(ev(1, 7, 0, "view")); q.processAllAvailable()
      // another user far ahead marches the watermark past 7's horizon
      src.addData(ev(2, 8, 5, "view")); q.processAllAvailable()
      src.addData(ev(3, 8, 5, "click")); q.processAllAvailable()
      // user 7 returns after eviction: a fresh funnel, step 1 re-emits;
      // the click then completes the NEW funnel (state restarted)
      src.addData(ev(4, 7, 6, "view"), ev(5, 7, 6, "click"))
      q.processAllAvailable()
      spark.table("funnel_evict").collect()
        .map(r => (r.getLong(0), r.getInt(1))).toSeq.sorted
    } finally q.stop()
    val sevens = got.filter(_._1 == 7L).map(_._2)
    assert(sevens.count(_ == 1) == 2,
      s"user 7 should emit step 1 twice (pre- and post-eviction): $got")
    assert(sevens.contains(2), s"user 7's restarted funnel should complete: $got")
  }

  test("streaming robust monitor equals the static twin and the batch report; artifact round-trips") {
    import graft.streaming.StreamingRobust
    import graft.operators.RobustStats
    val ev = graft.sources.Tables.events(spark, sfDir)
      .select(col("event_id"), col("event_type"), col("value"))
    val stats = RobustStats.medMadBuckets(ev, "event_type", "value")
    val path = java.nio.file.Files
      .createTempDirectory("graft_robust").toString + "/stats"
    StreamingRobust.saveStats(stats, path)
    val back = StreamingRobust.loadStats(spark, path)
    assert(back.collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .toSet == stats.collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet,
      "stats artifact must round-trip exactly")
    val evDir = java.nio.file.Files
      .createTempDirectory("graft_robust_ev").toString
    ev.write.mode("overwrite").parquet(evDir)
    val stream = spark.readStream.schema(ev.schema).parquet(evDir)
    val q = StreamingRobust.monitored(stream, back)
      .writeStream.outputMode("append").format("memory")
      .queryName("robust_mon").start()
    val got = try {
      q.processAllAvailable()
      spark.table("robust_mon")
        .select(col("event_id"), col("is_outlier"))
        .collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    } finally q.stop()
    val want = StreamingRobust.monitored(ev, back)
      .select(col("event_id"), col("is_outlier"))
      .collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    assert(got == want, "stream must equal the static twin")
    // and both equal the batch report's verdicts (same frozen stats)
    val report = graft.queries.WarehouseQueries
      .eventsMadOutliers(spark, sfDir)
      .select(col("event_id"), col("is_outlier"))
      .collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    assert(got == report, "stream must equal the batch report")
    assert(got.valuesIterator.exists(identity) &&
      got.valuesIterator.exists(!_),
      "sf fixture should contain both verdicts")
  }

  test("streaming media gate: index screen, within-batch reps, resume across queries") {
    import spark.implicits._
    import graft.operators.MediaDedup
    import graft.streaming.StreamingMediaGate
    import graft.sources.MediaCodecs
    import org.apache.spark.sql.streaming.Trigger
    // 3x3 gradient fixtures: bright shifts are dHash twins, the
    // reversed gradient is distinct
    def img(bright: Int, reverse: Boolean = false): Array[Byte] = {
      val px = Array.tabulate(9) { i =>
        val v = math.min(255, i * 20 + bright)
        (v << 16) | (v << 8) | v
      }
      MediaCodecs.encodeBmp(3, 3, if (reverse) px.reverse else px)
    }
    val dir = java.nio.file.Files
      .createTempDirectory("graft_media_gate").toString
    val (assetPath, indexPath) = (s"$dir/assets", s"$dir/index")
    val b1 = Seq((1L, img(0)), (2L, img(30)), (3L, img(0, reverse = true)))
    val b2 = Seq((4L, img(60)), (5L, img(5, reverse = true)))
    val src = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, Array[Byte])](spark, 81)
    val q = StreamingMediaGate.start(src.toDS().toDF("doc_id", "media"),
      "doc_id", assetPath, indexPath, s"$dir/ckpt",
      trigger = Trigger.ProcessingTime(0L))
    try {
      src.addData(b1: _*); q.processAllAvailable()
      src.addData(b2: _*); q.processAllAvailable()
    } finally q.stop()
    val got = spark.read.parquet(assetPath)
      .select(col("doc_id")).collect().map(_.getLong(0)).toSet
    // b1: {1,2} are a within-batch component → rep 1; 3 distinct.
    // b2: 4 is a twin of indexed 1 → rejected; 5 is a twin of
    // indexed 3 (reversed gradient, small brightness shift) → rejected
    assert(got == Set(1L, 3L), s"got $got")
    // sequential batch reference over the same batches
    var idx: Option[org.apache.spark.sql.DataFrame] = None
    val want = scala.collection.mutable.Set.empty[Long]
    Seq(b1, b2).foreach { b =>
      val hashes = StreamingMediaGate.fingerprint(
        b.toDF("doc_id", "media"), "doc_id")
      val adm = MediaDedup.admitBatch(idx, hashes, "doc_id", "phash")
        .localCheckpoint()
      want ++= adm.select(col("doc_id")).collect().map(_.getLong(0))
      idx = Some(idx.map(_.unionByName(
          adm.select(col("width"), col("height"), col("phash"))))
        .getOrElse(adm.select(col("width"), col("height"), col("phash")))
        .localCheckpoint())
    }
    assert(got == want.toSet, "stream must equal sequential admitBatch")
    // a NEW query on the same artifacts keeps screening
    val src2 = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, Array[Byte])](spark, 82)
    val q2 = StreamingMediaGate.start(src2.toDS().toDF("doc_id", "media"),
      "doc_id", assetPath, indexPath, s"$dir/ckpt2",
      trigger = Trigger.ProcessingTime(0L))
    try {
      // 6 = yet another twin of 1 (rejected); 7 = genuinely new
      // pattern (admitted)
      // alternating gray 10/200 → dHash bits 10101010: hamming 4
      // from both indexed prints (all-ascending 0xFF, all-descending 0)
      val fresh = MediaCodecs.encodeBmp(3, 3,
        Array.tabulate(9)(i => if (i % 2 == 0) 0x0A0A0A else 0xC8C8C8))
      src2.addData((6L, img(90)), (7L, fresh)); q2.processAllAvailable()
    } finally q2.stop()
    val finalIds = spark.read.parquet(assetPath)
      .select(col("doc_id")).collect().map(_.getLong(0)).toSet
    assert(finalIds == Set(1L, 3L, 7L), s"got $finalIds")
  }

  test("streaming DP release equals the batch twin bit-for-bit; noise keyed per cell") {
    import graft.streaming.StreamingDp
    val stream = graft.streaming.EventsStream.readEvents(spark, sfDir)
    val q = StreamingDp.windowedNoisyCounts(stream, epsilon = 1.0)
      .writeStream.outputMode("complete").format("memory")
      .queryName("dp_out").start()
    val got = try {
      q.processAllAvailable()
      spark.table("dp_out")
        .collect().map(r => (r.getTimestamp(0), r.getString(1),
          r.getLong(2), r.getDouble(3))).toSet
    } finally q.stop()
    val want = StreamingDp.windowedNoisyCounts(
        graft.sources.Tables.events(spark, sfDir), epsilon = 1.0)
      .collect().map(r => (r.getTimestamp(0), r.getString(1),
        r.getLong(2), r.getDouble(3))).toSet
    assert(got == want, "stream must equal the batch twin exactly")
    assert(got.nonEmpty)
    // noise is keyed per (window, type) cell: deviates differ across
    // cells, and every |deviate| stays in the Lap(1) plausibility band
    val devs = got.toSeq.map(t => t._4 - t._3)
    assert(devs.distinct.length > math.max(1, devs.length / 2))
    assert(devs.forall(d => math.abs(d) < 37.0))
    // tighter ε ⇒ the SAME cell's deviate scales exactly by 1/ε
    val half = StreamingDp.windowedNoisyCounts(
        graft.sources.Tables.events(spark, sfDir), epsilon = 0.5)
      .collect().map(r => ((r.getTimestamp(0), r.getString(1)),
        r.getDouble(3) - r.getLong(2))).toMap
    val one = got.map(t => ((t._1, t._2), t._4 - t._3)).toMap
    one.foreach { case (k, d) =>
      assert(math.abs(half(k) - 2.0 * d) < 1e-5) }
  }

  test("DP release face: append mode releases each cell once, finalized-only") {
    import spark.implicits._
    import graft.streaming.StreamingDp
    def ts(day: Int, hour: Int) =
      java.sql.Timestamp.valueOf(f"2024-03-0$day $hour%02d:00:00")
    // day 1: 3 events, day 2: 2 events, day 3: 1 event
    val d1 = Seq((ts(1, 10), "click"), (ts(1, 11), "click"), (ts(1, 12), "view"))
    val d2 = Seq((ts(2, 10), "click"), (ts(2, 11), "view"))
    val d3 = Seq((ts(3, 10), "click"))
    val base = java.nio.file.Files.createTempDirectory("graft_dprel")
      .toFile.getAbsolutePath
    val src = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(java.sql.Timestamp, String)](
      spark, 2301)
    val q = StreamingDp.release(src.toDF().toDF("ts", "event_type"),
      s"$base/out", s"$base/ckpt", epsilon = 1.0,
      trigger = org.apache.spark.sql.streaming.Trigger.ProcessingTime(0L))
    try {
      src.addData(d1); q.processAllAvailable()
      src.addData(d2); q.processAllAvailable()
      src.addData(d3); q.processAllAvailable()
      // one more trigger so the day-3 watermark (10:00 − 1h) finalizes day 2
      src.addData(Seq((ts(3, 11), "view"))); q.processAllAvailable()
    } finally q.stop()
    val released = spark.read.parquet(s"$base/out")
      .collect().map(r => (r.getTimestamp(0), r.getString(1),
        r.getLong(2), r.getDouble(3)))
    // once-only: no (window, key) cell appears twice
    val cells = released.map(t => (t._1, t._2))
    assert(cells.distinct.length == cells.length,
      s"cell released more than once: ${released.toSeq}")
    // finalized-only: day 3 is still open (watermark 10:00 < day-3 end)
    assert(released.nonEmpty)
    assert(released.forall(_._1.before(ts(3, 0))),
      s"open window released: ${released.toSeq}")
    // released values match the batch twin bit-for-bit on those cells
    val twin = StreamingDp.windowedNoisyCounts(
        (d1 ++ d2 ++ d3 ++ Seq((ts(3, 11), "view"))).toDF("ts", "event_type"),
        epsilon = 1.0)
      .collect().map(r => ((r.getTimestamp(0), r.getString(1)),
        (r.getLong(2), r.getDouble(3)))).toMap
    released.foreach { case (w, k, n, noisy) =>
      assert(twin((w, k)) == ((n, noisy)), s"cell ($w, $k) drifted from twin")
    }
  }
}
