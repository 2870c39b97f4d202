package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Null/edge-input behavior of the operator surface — the lake tables
  * carry no nulls, so these drive synthetic frames with nulls, empty
  * strings, and degenerate rows through each operator family.
  */
class NullSafetySpec extends AnyFunSuite {
  import SparkTestSession._
  import spark.implicits._

  test("kernel expressions: null text/arrays propagate null, empty inputs behave") {
    val df = Seq[Option[String]](Some("a b c d"), Some(""), Some("  "), None)
      .toDF("text")
    val out = df.select(
      graft.functions.ShingleFunctions.word_shingles(col("text"), 3).as("sh"),
      graft.functions.Fingerprint.rolling_fingerprint(col("text")).as("fp"))
      .collect()
    assert(out(0).getSeq[String](0) == Seq("a b c", "b c d"))
    assert(out(1).getSeq[String](0).isEmpty)   // empty string → no shingles
    assert(out(2).getSeq[String](0).isEmpty)   // whitespace only
    assert(out(3).isNullAt(0) && out(3).isNullAt(1)) // null in → null out
    assert(out(1).getLong(1) == 0L)            // fingerprint of "" = 0
  }

  test("simhash/minhash on empty shingle arrays") {
    val df = Seq("", "x").toDF("text")
      .select(graft.functions.ShingleFunctions.word_shingles(col("text"), 3).as("sh"))
    val out = df.select(
      graft.functions.GraftFunctions.simhash64(col("sh")),
      graft.functions.GraftFunctions.minhash_sig(col("sh"), 4)).collect()
    // empty votes → all bits negative → signature 0; minima = MaxValue
    assert(out(0).getLong(0) == 0L)
    assert(out(0).getSeq[Long](1).forall(_ == Long.MaxValue))
  }

  test("vec_cosine: zero vectors and nulls") {
    val rows = Seq(
      (Some(Seq(0f, 0f)), Some(Seq(1f, 2f))),
      (Some(Seq(1f, 0f)), Some(Seq(1f, 0f))),
      (None, Some(Seq(1f, 2f))))
    val df = rows.toDF("a", "b")
    val out = df.select(
      graft.functions.GraftFunctions.vec_cosine(col("a"), col("b"))).collect()
    assert(out(0).getDouble(0) == 0.0) // zero vector guarded
    assert(math.abs(out(1).getDouble(0) - 1.0) < 1e-12)
    assert(out(2).isNullAt(0))
  }

  test("upsert keepLatest: null versions sort last, null keys form their own group") {
    val df = Seq(
      (Some(1L), Some(10L), "a"), (Some(1L), None, "b"),
      (None, Some(5L), "c"), (None, Some(7L), "d"))
      .toDF("k", "v", "p")
    val out = graft.operators.Upsert.keepLatest(df, Seq("k"), col("v"), Seq(col("p")))
      .collect().map(r => (if (r.isNullAt(0)) -1L else r.getLong(0), r.getString(2))).toMap
    assert(out(1L) == "a")   // 10 beats null (desc puts nulls last)
    assert(out(-1L) == "d")  // null-key group resolved deterministically
  }

  test("merge: batch with null key doesn't wipe base rows") {
    val base = Seq((Some(1L), "x"), (Some(2L), "y")).toDF("k", "v")
    val batch = Seq((Option.empty[Long], "z")).toDF("k", "v")
    val out = graft.operators.Upsert.merge(base, batch, Seq("k")).collect()
    assert(out.length == 3, "null-key batch row must not anti-join away base rows")
  }

  test("range join: null points and null interval bounds drop cleanly") {
    val ts = (s: String) => java.sql.Timestamp.valueOf(s)
    val points = Seq(
      (1L, Option(ts("2024-01-01 09:00:00"))),
      (2L, Option.empty[java.sql.Timestamp]))
      .toDF("pid", "pt")
    val intervals = Seq(
      (Option(ts("2024-01-01 08:00:00")), Option(ts("2024-01-01 18:00:00"))),
      (Option.empty[java.sql.Timestamp], Option(ts("2024-01-01 18:00:00"))))
      .toDF("lo", "hi")
    val got = graft.operators.RangeJoin
      .pointInInterval(points, intervals, col("pt"), col("lo"), col("hi"), 3600)
      .select(col("pid")).collect().map(_.getLong(0)).toSeq
    // null point and null-lo interval produce no pairs; the valid pair survives
    assert(got == Seq(1L))
  }

  test("resample: null stratum falls to the default fraction") {
    val df = Seq((1L, Option("a")), (2L, Option.empty[String]),
      (3L, Option("a")), (4L, Option.empty[String]))
      .toDF("id", "s")
    // default 1.0 keeps null-stratum rows; listed stratum 0.0 drops its rows
    val kept = graft.operators.Resample
      .byStratum(df, col("s"), col("id"), Map("a" -> 0.0), defaultFraction = 1.0)
      .select(col("id")).collect().map(_.getLong(0)).toSet
    assert(kept == Set(2L, 4L),
      "null stratum must take the default fraction, not vanish")
  }

  test("contamination: empty and sub-n texts contribute no grams, no pairs") {
    val df = Seq((0L, "too short"), (10L, "also very short text here"), (11L, ""))
      .toDF("doc_id", "text")
    val out = graft.operators.Dedup
      .contamination(df, df.filter(col("doc_id") % 10 === 0), "text", "doc_id", n = 8)
      .collect()
    assert(out.isEmpty, "no 8-grams exist, so no contamination pairs")
  }

  test("token budget: null/NaN scores are never dropped — they queue last") {
    val df = Seq(
      (1L, Some(0.9), 10L), (2L, Some(0.5), 10L), (3L, None, 10L),
      (4L, Some(Double.NaN), 10L), (5L, Some(0.1), 10L))
      .toDF("id", "score", "m")
    val out = graft.operators.TokenBudget.markKept(
      df, col("score"), col("m"), col("id"), budget = 20L)
    // every input row survives with a concrete verdict
    assert(out.count() == 5 && out.filter(col("kept").isNull).count() == 0)
    val kept = out.filter(col("kept")).select("id")
      .collect().map(_.getLong(0)).toSet
    assert(kept == Set(1L, 2L), s"best two fill the budget, got $kept")
    // with room for everything, the null/NaN rows are admitted too
    val all = graft.operators.TokenBudget.markKept(
      df, col("score"), col("m"), col("id"), budget = 100L)
    assert(all.filter(col("kept")).count() == 5)
  }

  test("paragraph dedup: null and empty texts survive with zero paragraphs") {
    val df = Seq((1L, Some("a b c")), (2L, Some("a b c")), (3L, None),
        (4L, Some("")))
      .toDF("doc_id", "text")
    val out = graft.operators.ParagraphDedup.dedup(
        df, col("text"), col("doc_id"))
      .collect().map(r => r.getLong(0) ->
        ((r.isNullAt(1), r.getLong(2), r.getString(3)))).toMap
    assert(out.keySet == Set(1L, 2L, 3L, 4L), "no row may vanish")
    // the duplicated doc pair strips to empty
    assert(out(1L)._2 == 0 && out(1L)._3 == "" && out(2L)._2 == 0)
    // null text: no paragraphs, empty rewrite (n_paras null is fine)
    assert(out(3L)._2 == 0 && out(3L)._3 == "")
  }

  test("splitByHash: invalid weights throw; a single weight puts every row in split 0") {
    val df = Seq(1L, 2L, 3L).toDF("id")
    intercept[IllegalArgumentException] {
      graft.operators.Resample.splitByHash(df, col("id"), Seq.empty)
    }
    intercept[IllegalArgumentException] {
      graft.operators.Resample.splitByHash(df, col("id"), Seq(0.0, 0.0))
    }
    intercept[IllegalArgumentException] {
      graft.operators.Resample.splitByHash(df, col("id"), Seq(0.5, -0.5))
    }
    val one = graft.operators.Resample.splitByHash(df, col("id"), Seq(1.0))
      .select(col("split")).collect().map(_.getInt(0))
    assert(one.toSeq == Seq(0, 0, 0))
  }

  test("z-order write: empty input and degenerate ranges degrade to a plain layout, no NPE") {
    val path = java.nio.file.Files.createTempDirectory("graft_zorder_empty").toString
    val empty = Seq.empty[(Long, Double)].toDF("a", "b")
    graft.sources.ZOrder.writeClustered(empty, Seq("a", "b"), path + "/e", numFiles = 4)
    assert(spark.read.parquet(path + "/e").isEmpty)
    // one distinct value per dim → every range is degenerate → bucket 0
    val const = Seq((1L, 2.0), (1L, 2.0)).toDF("a", "b")
    graft.sources.ZOrder.writeClustered(const, Seq("a", "b"), path + "/c", numFiles = 4)
    assert(spark.read.parquet(path + "/c").count() == 2)
  }

  test("contamination: empty bench on the shuffle path yields no pairs, no bloom") {
    val df = Seq((1L, "a b c d e f g h i j k l m n o p")).toDF("doc_id", "text")
    val out = graft.operators.Dedup.contamination(
        df, df.filter(col("doc_id") < 0), "text", "doc_id", n = 8,
        benchIsSmall = Some(false))
      .collect()
    assert(out.isEmpty)
  }

  test("sessionize: single-event users and duplicate timestamps stay deterministic") {
    val ts = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    val df = Seq((1L, ts, 1L), (2L, ts, 2L), (2L, ts, 3L)).toDF("u", "ts", "eid")
    val out = graft.operators.Sessionize.sessions(df, col("u"), col("ts"),
        3600L, Seq(col("ts"), col("eid")))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(out.toSet == Set((1L, 1L, 1L), (2L, 1L, 2L)))
  }

  test("session_window boundary: an event at exactly prev + gap merges into the session") {
    // pins the semantics the events_session_window oracle encodes
    // (sessions split only at diff > gap, NOT at diff == gap)
    val t0 = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    def at(h: Double) = new java.sql.Timestamp(t0.getTime + (h * 3600000L).toLong)
    val df = Seq((1L, at(0)), (1L, at(4)), (2L, at(0)), (2L, at(4.001)))
      .toDF("user_id", "ts")
    val out = df.groupBy(col("user_id"), session_window(col("ts"), "4 hours").as("w"))
      .agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getLong(0), r.getLong(2)))
      .groupBy(_._1).view.mapValues(_.map(_._2).sorted.toSeq).toMap
    assert(out(1L) == Seq(2L), "exactly-gap-apart events must merge into one session")
    assert(out(2L) == Seq(1L, 1L), "past-gap events must split")
  }

  test("stripRepeatedSpans: null/empty texts survive, unaffected docs unchanged") {
    val df = Seq(
      (1L, Some("a b c d e a b c d e")), // within-doc repeated 4-gram
      (2L, Some("x y z w q")),           // unique, untouched
      (3L, Some("")),                    // empty
      (4L, None)                         // null text
    ).toDF("doc_id", "text")
    val out = graft.operators.Dedup
      .stripRepeatedSpans(df, "text", "doc_id", n = 4, minCount = 2)
      .collect().map(r => r.getLong(0) ->
        ((if (r.isNullAt(1)) null else r.getString(1),
          if (r.isNullAt(2)) -1 else r.getInt(2)))).toMap
    // doc 1: "a b c d" and "b c d e" each occur twice -> positions
    // 0..4 and 5..9 are all covered; everything is removed
    assert(out(1L) == (("", 10)))
    assert(out(2L) == (("x y z w q", 0)))
    // empty text tokenizes to a single empty token; nothing repeats
    assert(out(3L)._2 == 0)
    // null text propagates null, never throws
    assert(out(4L) == ((null, -1)))
  }

  test("StratifiedTopQuota: null ord ranks first (window twin parity), null stratum keeps nothing, no rows vanish") {
    val df = Seq(
      (1L, Option("a"), Option(5L)), (2L, Option("a"), Option.empty[Long]),
      (3L, Option("a"), Option(1L)), (4L, Option.empty[String], Option(1L)))
      .toDF("id", "s", "v")
    val quotas = Seq(("a", 2L)).toDF("__stratum", "__quota")
    val out = graft.operators.StratifiedTopQuota.markKept(df,
        stratum = col("s"), ord = Seq(col("v"), col("id")),
        coarse = col("v"), quotas = broadcast(quotas))
      .collect().map(r => r.getLong(0) -> r.getBoolean(3)).toMap
    assert(out.size == 4, "every input row must appear in the output")
    // nulls-first: the null-v row outranks v=5 for stratum a's 2 slots
    assert(out == Map(1L -> false, 2L -> true, 3L -> true, 4L -> false),
      s"got $out")
  }

  test("label propagation: empty edge set leaves every node its own community; self-loops vote") {
    import graft.operators.Community
    val nodes = (1L to 4L).toDF("id")
    val empty = Seq.empty[(Long, Long)].toDF("src", "dst")
    val own = Community.labelPropagation(empty, nodes, iterations = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(own == (1L to 4L).map(v => v -> v).toMap)
    // a self-loop is just a vote for the node's own label — stable
    val loops = Seq((2L, 2L)).toDF("src", "dst")
    val still = Community.labelPropagation(loops, nodes, iterations = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(still == own)
  }

  test("noveltyScore: null and short texts score 0 over 0 grams, never null") {
    val docs = Seq((1L, Option.empty[String]), (2L, Option("tiny text")),
      (3L, Option("a b c d e f g h")), (4L, Option("a b c d e f g h")))
      .toDF("doc_id", "text")
    val out = graft.operators.Dedup.noveltyScore(docs, "text", "doc_id", n = 8)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    assert(out(1L) == (0L, 0L, 0.0), s"null text: ${out(1L)}")
    assert(out(2L) == (0L, 0L, 0.0))
    assert(out(3L) == (1L, 1L, 1.0) && out(4L) == (1L, 1L, 1.0),
      "the planted duplicate pair must still register")
  }

  test("doremi: null domains fold to a sentinel, null/NaN losses count as zero mass") {
    import spark.implicits._
    import graft.operators.Doremi
    val scored = Seq(
      (Some("a"), Some(2.5)), (Some("a"), Some(3.5)),
      (None, Some(9.0)),                 // null domain
      (Some("b"), None),                 // null loss
      (Some("b"), Some(Double.NaN)),     // NaN loss
      (Some("b"), Some(4.0)))
      .toDF("dom", "ce")
      .select(col("dom"), col("ce").cast("double").as("ce"))
    val out = Doremi.domainWeights(scored, "dom", "ce", rounds = 3)
      .collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    // null domain present as sentinel; nothing NPEs in the sorted fold
    assert(out.keySet == Set("a", "b", "__null__"))
    assert(out("__null__") == ((1L, 9000000L)))
    // null/NaN losses contribute zero, not absence: b keeps 3 docs
    // and mean = floor(4.0e6 / 3)
    assert(out("b") == ((3L, 1333333L)), s"got ${out("b")}")
  }

  test("attribution: null event types become a sentinel channel, journeys stay linked") {
    import spark.implicits._
    import graft.operators.Attribution
    // u1: view → <null> → purchase — the null event must stay in the
    // chain (view→__missing__→CONV), not unlink view from purchase
    val ev = Seq(
      (1L, 10L, 1L, Some("view")), (1L, 20L, 2L, None),
      (1L, 30L, 3L, Some("purchase")))
      .toDF("user_id", "ts", "event_id", "event_type")
    val tr = Attribution.transitions(ev, "user_id", "ts", "event_id",
        "event_type", "purchase")
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2))
      .toMap
    assert(tr == Map(
      (Attribution.StartState, "view") -> 1L,
      ("view", "__missing__") -> 1L,
      ("__missing__", Attribution.ConvState) -> 1L), s"got $tr")
  }

  test("kcore: edges with null endpoints drop before peeling, no null node rows") {
    import spark.implicits._
    import graft.operators.KCore
    val edges = Seq(
      (Some(1L), Some(2L)), (Some(2L), Some(1L)),
      (Some(1L), None), (None, Some(2L)))
      .toDF("src", "dst")
    val out = KCore.peelLayers(edges, k = 1, rounds = 2)
      .collect().map(r => (r.getLong(0), r.getBoolean(2)))
    assert(out.toSet == Set((1L, true), (2L, true)),
      s"only the 1-2 edge survives, got ${out.toSeq}")
  }
}
