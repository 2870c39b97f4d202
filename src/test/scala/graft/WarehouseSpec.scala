package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import java.sql.Timestamp

import graft.operators.{Funnel, Profile, Scd2, TextRank}

/** Semantics pins for the round-5 warehouse/retrieval operators, on
  * hand-built data where every expected row is derivable by eye. Value
  * correctness at sf scale is the DuckDB oracle's job; these pin the
  * CONTRACTS — gap cutoffs, first-touch funnels, null-safe change
  * detection, interval tiling, score math.
  */
class WarehouseSpec extends AnyFunSuite {
  import SparkTestSession._
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  // ---- Funnel -----------------------------------------------------------

  private val funnelEvents = Seq(
    // u1 completes view→click→purchase strictly in order and in gap
    (1L, "view", ts("2024-01-01 10:00:00"), 1L),
    (1L, "click", ts("2024-01-01 11:00:00"), 2L),
    (1L, "purchase", ts("2024-01-01 12:00:00"), 3L),
    // u2 clicks BEFORE any view: click never qualifies
    (2L, "click", ts("2024-01-01 10:00:00"), 4L),
    (2L, "view", ts("2024-01-01 11:00:00"), 5L),
    (2L, "purchase", ts("2024-01-01 12:00:00"), 6L),
    // u3 clicks past the 4h gap from the first view
    (3L, "view", ts("2024-01-01 10:00:00"), 7L),
    (3L, "click", ts("2024-01-01 15:00:01"), 8L),
    // u4: purchase gap is measured from the FIRST qualified click
    // (first-touch) — the later in-gap click does not reopen it
    (4L, "view", ts("2024-01-01 10:00:00"), 9L),
    (4L, "click", ts("2024-01-01 10:30:00"), 10L),
    (4L, "click", ts("2024-01-01 13:00:00"), 11L),
    (4L, "purchase", ts("2024-01-01 14:31:00"), 12L)
  ).toDF("user_id", "event_type", "ts", "event_id")

  test("funnel: ordering, gap cutoff, and first-touch semantics") {
    val out = Funnel.steps(funnelEvents, "user_id", "event_type", "ts",
        "event_id", Seq("view", "click", "purchase"),
        maxGap = Some(expr("INTERVAL 4 HOURS")))
      .collect().map(r => (r.getInt(0), r.getString(1), r.getLong(2)))
    // step1: u1,u2,u3,u4 viewed; step2: u1,u4 (u2 out of order, u3 out
    // of gap); step3: u1 only (u4's purchase is 4h01m after its first
    // qualified click at 10:30)
    assert(out.toSeq == Seq((1, "view", 4L), (2, "click", 2L),
      (3, "purchase", 1L)))
  }

  test("funnel: boundary event exactly at maxGap still qualifies") {
    val ev = Seq(
      (1L, "view", ts("2024-01-01 10:00:00"), 1L),
      (1L, "click", ts("2024-01-01 14:00:00"), 2L)
    ).toDF("user_id", "event_type", "ts", "event_id")
    val out = Funnel.steps(ev, "user_id", "event_type", "ts", "event_id",
        Seq("view", "click"), Some(expr("INTERVAL 4 HOURS")))
      .collect().map(_.getLong(2))
    assert(out.toSeq == Seq(1L, 1L))
  }

  test("funnel: same-timestamp events qualify by tiebreak order only") {
    val ev = Seq(
      // view and click share a timestamp; click's event_id sorts AFTER
      // the view's, so the strictly-earlier window sees the view
      (1L, "view", ts("2024-01-01 10:00:00"), 1L),
      (1L, "click", ts("2024-01-01 10:00:00"), 2L),
      // u2: click's id sorts BEFORE the same-ts view — no view strictly
      // earlier, click must not qualify
      (2L, "click", ts("2024-01-01 10:00:00"), 3L),
      (2L, "view", ts("2024-01-01 10:00:00"), 4L)
    ).toDF("user_id", "event_type", "ts", "event_id")
    val out = Funnel.steps(ev, "user_id", "event_type", "ts", "event_id",
        Seq("view", "click"), None)
      .collect().map(_.getLong(2))
    assert(out.toSeq == Seq(2L, 1L))
  }

  // ---- SCD2 -------------------------------------------------------------

  private val changeLog = Seq(
    // k1: A A B A — consecutive dup collapses, re-entry reopens
    (1L, Option("A"), ts("2024-01-01 00:00:00"), 1L),
    (1L, Option("A"), ts("2024-01-02 00:00:00"), 2L),
    (1L, Option("B"), ts("2024-01-03 00:00:00"), 3L),
    (1L, Option("A"), ts("2024-01-04 00:00:00"), 4L),
    // k2: null is a VALUE — null→A→null opens three versions,
    // null→null collapses
    (2L, None, ts("2024-01-01 00:00:00"), 5L),
    (2L, None, ts("2024-01-02 00:00:00"), 6L),
    (2L, Option("A"), ts("2024-01-03 00:00:00"), 7L),
    (2L, None, ts("2024-01-04 00:00:00"), 8L)
  ).toDF("k", "attr", "at", "seq")

  test("scd2: collapses dups, reopens on re-entry, null-safe compare") {
    val h = Scd2.history(changeLog, Seq("k"), Seq("attr"), "at", "seq")
      .orderBy("k", "valid_from")
      .collect()
      .map(r => (r.getLong(0), Option(r.getString(1)),
        r.getTimestamp(2), Option(r.getTimestamp(3)), r.getBoolean(4)))
    val d = (s: String) => ts(s + " 00:00:00")
    assert(h.toSeq == Seq(
      (1L, Some("A"), d("2024-01-01"), Some(d("2024-01-03")), false),
      (1L, Some("B"), d("2024-01-03"), Some(d("2024-01-04")), false),
      (1L, Some("A"), d("2024-01-04"), None, true),
      (2L, None, d("2024-01-01"), Some(d("2024-01-03")), false),
      (2L, Some("A"), d("2024-01-03"), Some(d("2024-01-04")), false),
      (2L, None, d("2024-01-04"), None, true)))
  }

  test("scd2: intervals tile each key's timeline (no gaps, no overlaps)") {
    val h = Scd2.history(
      graft.sources.Tables.orders(spark, sfDir),
      Seq("o_custkey"), Seq("o_orderpriority"), "o_orderdate", "o_orderkey")
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("o_custkey")).orderBy(col("valid_from"))
    val bad = h
      .withColumn("next_from", lead(col("valid_from"), 1).over(w))
      .filter((col("next_from").isNotNull &&
        !(col("valid_to") <=> col("next_from"))) ||
        (col("next_from").isNull && !col("is_current")))
      .count()
    assert(bad == 0L)
    // exactly one current row per key
    val keys = h.select("o_custkey").distinct().count()
    val current = h.filter(col("is_current")).count()
    assert(current == keys)
  }

  test("scd2: stateAt returns exactly one version per key") {
    val h = Scd2.history(changeLog, Seq("k"), Seq("attr"), "at", "seq")
    val at = Scd2.stateAt(h, lit(ts("2024-01-03 12:00:00")))
      .orderBy("k").collect()
      .map(r => (r.getLong(0), Option(r.getString(1))))
    assert(at.toSeq == Seq((1L, Some("B")), (2L, Some("A"))))
  }

  // ---- Profile ----------------------------------------------------------

  test("profile: nulls, distincts, bounds, and canonical rendering") {
    val df = Seq(
      (Some(1.5), Some("b")),
      (Some(2.25), None),
      (None, Some("a")),
      (Some(1.5), Some("a"))
    ).toDF("x", "s")
    val p = Profile.profile(df, Seq("s", "x")).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getString(4), r.getString(5)))
    assert(p.toSeq == Seq(
      ("s", 4L, 1L, 2L, "a", "b"),
      ("x", 4L, 1L, 2L, "1.500000", "2.250000")))
  }

  test("profile: approx variant agrees on exact-count corpora") {
    val cust = graft.sources.Tables.customer(spark, sfDir)
    val exact = Profile.profile(cust, Seq("c_mktsegment")).collect()(0)
    val approx = Profile.profile(cust, Seq("c_mktsegment"),
      approxDistinct = true).collect()(0)
    // 5 segments — HLL is exact at this cardinality; bounds identical
    assert(approx.getLong(3) == exact.getLong(3))
    assert(approx.getString(4) == exact.getString(4))
    assert(approx.getString(5) == exact.getString(5))
  }

  // ---- BM25 -------------------------------------------------------------

  test("bm25: scores match a direct reference implementation") {
    val docs = Seq(
      (1L, "spark joins the hash table to the stream"),
      (2L, "a hash join beats a sort merge join for small builds"),
      (3L, "vectors and streams and vectors again"),
      (4L, "nothing relevant here at all"),
      (5L, "hash hash hash join join vector stream")
    ).toDF("id", "text")
    val terms = Seq("hash", "join", "vector", "stream")
    val out = TextRank.bm25TopK(docs, "id", "text", terms, 10)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toMap

    // reference: same formula, straight Scala
    val toks = Seq(
      1L -> "spark joins the hash table to the stream",
      2L -> "a hash join beats a sort merge join for small builds",
      3L -> "vectors and streams and vectors again",
      4L -> "nothing relevant here at all",
      5L -> "hash hash hash join join vector stream"
    ).map { case (id, t) =>
      id -> t.toLowerCase.split("[^a-z0-9]+").filter(_.nonEmpty).toSeq
    }
    val n = toks.size.toDouble
    val avgdl = toks.map(_._2.size).sum.toDouble / n
    val sorted = terms.sorted
    val dfs = sorted.map(t => t -> toks.count(_._2.contains(t)).toDouble).toMap
    val expected = toks.map { case (id, tk) =>
      val dl = tk.size.toDouble
      val score = sorted.map { t =>
        val tf = tk.count(_ == t).toDouble
        val idf = math.log((n - dfs(t) + 0.5) / (dfs(t) + 0.5) + 1.0)
        idf * ((tf * 2.2) / (tf + 1.2 * (0.25 + 0.75 * dl / avgdl)))
      }.sum
      id -> BigDecimal(score).setScale(6, BigDecimal.RoundingMode.HALF_UP)
        .toDouble
    }.filter(_._2 > 0).toMap
    assert(out.keySet == expected.keySet)
    expected.foreach { case (id, s) =>
      assert(math.abs(out(id) - s) < 1e-9, s"doc $id: ${out(id)} vs $s")
    }
    // doc 4 has no query term → excluded
    assert(!out.contains(4L))
  }

  test("query likelihood: scores match a direct reference implementation") {
    val docs = Seq(
      (1L, "spark joins the hash table to the stream"),
      (2L, "a hash join beats a sort merge join for small builds"),
      (3L, "vectors and streams and vectors again"),
      (4L, "nothing relevant here at all"),
      (5L, "hash hash hash join join vector stream")
    ).toDF("id", "text")
    val terms = Seq("hash", "join", "vector", "stream")
    val mu = 100.0
    val out = TextRank.queryLikelihoodTopK(docs, "id", "text", terms, 10, mu)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toMap
    val toks = Seq(
      1L -> "spark joins the hash table to the stream",
      2L -> "a hash join beats a sort merge join for small builds",
      3L -> "vectors and streams and vectors again",
      4L -> "nothing relevant here at all",
      5L -> "hash hash hash join join vector stream"
    ).map { case (id, t) =>
      id -> t.toLowerCase.split("[^a-z0-9]+").filter(_.nonEmpty).toSeq
    }
    val sumdl = toks.map(_._2.size).sum.toDouble
    val sorted = terms.sorted
    val cfs = sorted.map(t => t -> toks.map(_._2.count(_ == t)).sum.toDouble).toMap
    val expected = toks.map { case (id, tk) =>
      val dl = tk.size.toDouble
      val score = sorted.map { t =>
        val tf = tk.count(_ == t).toDouble
        math.log((tf + mu * cfs(t) / sumdl) / (dl + mu))
      }.sum
      id -> BigDecimal(score).setScale(6, BigDecimal.RoundingMode.HALF_UP)
        .toDouble
    }.toMap
    // smoothing scores EVERY doc, including term-free doc 4
    assert(out.keySet == expected.keySet)
    expected.foreach { case (id, s) =>
      assert(math.abs(out(id) - s) < 1e-9, s"doc $id: ${out(id)} vs $s")
    }
    // the term-dense doc ranks first; the two term-free docs (3 has
    // only "vectors"/"streams", not the exact terms) rank bottom —
    // between them the LONGER zero-tf doc scores lower (÷(dl+μ))
    val ranked = out.toSeq.sortBy { case (id, s) => (-s, id) }.map(_._1)
    assert(ranked.head == 5L && ranked.takeRight(2) == Seq(4L, 3L))
  }

  test("bm25: tokenizer drops empties and non-ascii-word runs") {
    val docs = Seq((1L, "Hash—JOIN!! vector…stream 42x")).toDF("id", "text")
    val out = TextRank.bm25TopK(docs, "id", "text",
      Seq("hash", "join", "vector", "stream"), 5).collect()
    assert(out.length == 1 && out(0).getLong(0) == 1L)
  }

  // ---- FuzzyJoin --------------------------------------------------------

  test("fuzzy join: finds substitution/insertion/deletion pairs, not d=2") {
    val df = Seq(
      (1L, "spark"),   // base
      (2L, "spork"),   // substitution (d=1)
      (3L, "sparks"),  // insertion (d=1)
      (4L, "spak"),    // deletion (d=1)
      (5L, "spark"),   // exact duplicate (d=0)
      (6L, "sprk"),    // d=1 from spark (del a), spork (del o), spak (sub)
      (7L, "scala")    // far away
    ).toDF("id", "name")
    val pairs = graft.operators.FuzzyJoin.selfJoin(df, "id", "name")
      .select("a_id", "b_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val expected = Set((1L, 2L), (1L, 3L), (1L, 4L), (1L, 5L), (1L, 6L),
      (2L, 5L), (2L, 6L), (3L, 5L), (4L, 5L), (4L, 6L), (5L, 6L))
    assert(pairs == expected)
  }

  test("fuzzy join: blocking is complete vs brute force on real names") {
    val cust = graft.sources.Tables.customer(spark, sfDir).limit(200)
      .select(col("c_custkey").as("id"), col("c_name").as("name"))
    val got = graft.operators.FuzzyJoin.selfJoin(cust, "id", "name")
      .select("a_id", "b_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val a = cust.toDF("a_id", "a_name")
    val b = cust.toDF("b_id", "b_name")
    val brute = a.crossJoin(b)
      .filter(col("a_id") < col("b_id") &&
        levenshtein(col("a_name"), col("b_name")) <= 1)
      .select("a_id", "b_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == brute)
  }

  test("fuzzy join d=2: complete vs a driver-side levenshtein brute force") {
    // small alphabet forces dense distance-1/2 structure, incl. pairs
    // that need BOTH sides to delete (substitution+substitution)
    val rnd = new scala.util.Random(42)
    val corpus = (1L to 80L).map { i =>
      val len = 3 + rnd.nextInt(6)
      (i, Seq.fill(len)("abc" (rnd.nextInt(3))).mkString)
    }
    def lev(a: String, b: String): Int = {
      val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
        if (i == 0) j else if (j == 0) i else 0 }
      for (i <- 1 to a.length; j <- 1 to b.length)
        d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
          d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      d(a.length)(b.length)
    }
    val want = (for {
      (ia, va) <- corpus; (ib, vb) <- corpus
      if ia < ib && lev(va, vb) <= 2
    } yield (ia, ib, lev(va, vb))).toSet
    import spark.implicits._
    val got = graft.operators.FuzzyJoin
      .selfJoin(corpus.toDF("id", "name"), "id", "name", maxDist = 2)
      .collect().map(r => (r.getLong(0), r.getLong(2), r.getInt(4))).toSet
    assert(want.nonEmpty && got == want,
      s"extra=${got -- want} missing=${want -- got}")
    // d=1 results are a subset (the verify keeps distances exact)
    val got1 = graft.operators.FuzzyJoin
      .selfJoin(corpus.toDF("id", "name"), "id", "name")
      .collect().map(r => (r.getLong(0), r.getLong(2), r.getInt(4))).toSet
    assert(got1 == want.filter(_._3 <= 1))
    assertThrows[IllegalArgumentException] {
      graft.operators.FuzzyJoin
        .selfJoin(corpus.toDF("id", "name"), "id", "name", maxDist = 3)
    }
  }

  // ---- EWMA -------------------------------------------------------------

  test("ewma: fold matches the recursive definition; order by period") {
    val df = Seq(
      // deliberately out of period order in the input
      (1L, 3, 30.0), (1L, 1, 10.0), (1L, 2, 20.0),
      (2L, 1, 5.0) // single period: ewma = the value itself
    ).toDF("k", "period", "v")
    val out = graft.operators.Ewma
      .smooth(df, "k", "period", col("v"), alpha = 0.5)
      .orderBy("k").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getDouble(2)))
    // k1: s1=10; s2=.5*20+.5*10=15; s3=.5*30+.5*15=22.5
    assert(out.toSeq == Seq((1L, 3, 22.5), (2L, 1, 5.0)))
  }

  test("holt: fold matches the recursive definition; linear series tracked exactly") {
    val df = Seq(
      (1L, 3, 30.0), (1L, 1, 10.0), (1L, 2, 20.0), // linear, out of order
      (2L, 1, 5.0), // single period: trend 0, forecast = value
      (3L, 1, 4.0), (3L, 2, 2.0), (3L, 3, 9.0)
    ).toDF("k", "period", "v")
    val out = graft.operators.Ewma
      .holt(df, "k", "period", col("v"), alpha = 0.5, beta = 0.5)
      .orderBy("k").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getDouble(2), r.getDouble(3),
        r.getDouble(4)))
    // driver reference: same recursion
    def ref(xs: Seq[Double]): (Double, Double) =
      xs.drop(1).foldLeft((xs.head,
        if (xs.size >= 2) xs(1) - xs.head else 0.0)) { case ((l, b), x) =>
        val nl = 0.5 * x + 0.5 * (l + b)
        (nl, 0.5 * (nl - l) + 0.5 * b)
      }
    Seq(1L -> Seq(10.0, 20.0, 30.0), 2L -> Seq(5.0),
        3L -> Seq(4.0, 2.0, 9.0)).foreach { case (k, xs) =>
      val (l, b) = ref(xs)
      val row = out.find(_._1 == k).get
      assert(row._2 == xs.size)
      assert(row._3 == l && row._4 == b && row._5 == l + b, s"key $k: $row")
    }
    // a perfectly linear series is tracked exactly: level = last point,
    // trend = slope, forecast = the true next point
    val r1 = out.find(_._1 == 1L).get
    assert(r1._3 == 30.0 && r1._4 == 10.0 && r1._5 == 40.0)
    // single-period contract
    val r2 = out.find(_._1 == 2L).get
    assert(r2._3 == 5.0 && r2._4 == 0.0 && r2._5 == 5.0)
  }

  // ---- Sliding windows --------------------------------------------------

  test("sliding agg: every event lands in exactly duration/slide windows") {
    val ev = graft.sources.Tables.events(spark, sfDir)
    val total = ev.count()
    val windowed = graft.queries.WarehouseQueries
      .eventsSlidingAgg(spark, sfDir)
      .agg(sum(col("n_events"))).collect()(0).getLong(0)
    assert(windowed == total * 4,
      s"each event should appear in 4 overlapping windows: $windowed vs ${total * 4}")
  }

  // ---- Greedy tokenizer -------------------------------------------------

  test("greedy tokenizer: longest match wins, single-char fallback") {
    import graft.functions.TokenizeKernel
    val vocab = Seq("the", "th", "he", "in", "ing")
    val df = Seq("theme", "singing", "xyz", "").toDF("w")
    val out = df.select(
      TokenizeKernel.greedySubwords(col("w"), vocab, 3).as("t"))
      .collect().map(_.getSeq[String](0).toList)
    assert(out(0) == List("the", "m", "e"))       // "the" beats "th"
    assert(out(1) == List("s", "ing", "ing"))     // greedy restart after s
    assert(out(2) == List("x", "y", "z"))         // pure fallback
    assert(out(3) == Nil)                         // empty input
  }

  test("vocab OOV-rate matches a driver-side greedy reference per language") {
    import graft.queries.TextQueries
    val got = TextQueries.vocabOovRate(spark, sfDir).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    // plain-Scala greedy segmentation (independent of the kernel)
    val vocab = TextQueries.SubwordVocab.toSet
    def segment(w: String): Seq[Int] = {  // emitted piece lengths
      val out = scala.collection.mutable.ArrayBuffer.empty[Int]
      var i = 0
      while (i < w.length) {
        val l = (3 to 2 by -1).find(l =>
          i + l <= w.length && vocab(w.substring(i, i + l))).getOrElse(1)
        out += l; i += l
      }
      out.toSeq
    }
    val want = graft.sources.Tables.documents(spark, sfDir)
      .select(col("lang"), col("text")).collect()
      .map(r => (r.getString(0), r.getString(1)))
      .groupBy(_._1).view.mapValues { rows =>
        val lens = rows.flatMap(_._2.trim.split("\\s+").flatMap(segment))
        val np = lens.size.toLong
        val nf = lens.count(_ == 1).toLong
        (np, nf, BigDecimal(nf.toDouble / np.toDouble)
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
      }.toMap
    assert(got.keySet == want.keySet)
    got.foreach { case (lang, (np, nf, rate)) =>
      val (wnp, wnf, wrate) = want(lang)
      assert(np == wnp && nf == wnf, s"$lang counts: ($np,$nf) vs ($wnp,$wnf)")
      assert(math.abs(rate - wrate) < 1e-9, s"$lang rate: $rate vs $wrate")
    }
    // every language has fallback on this corpus but never 100%
    assert(got.values.forall { case (np, nf, r) => nf > 0 && nf < np && r > 0 && r < 1 })
  }

  test("greedy tokenizer: kernel equals the HOF twin on corpus words") {
    import graft.functions.TokenizeKernel
    val vocab = graft.queries.TextQueries.SubwordVocab
    val words = graft.sources.Tables.documents(spark, sfDir)
      .select(explode(graft.functions.TextFunctions.tokens(col("text")))
        .as("w"))
      .limit(2000)
    val mismatches = words.select(
        TokenizeKernel.greedySubwords(col("w"), vocab, 3).as("k"),
        TokenizeKernel.greedySubwordsHof(col("w"), vocab, 3).as("h"))
      .filter(not(col("k") <=> col("h")))
      .count()
    assert(mismatches == 0L)
  }

  test("greedy tokenizer: concatenation of subwords reconstructs the word") {
    import graft.functions.TokenizeKernel
    val vocab = graft.queries.TextQueries.SubwordVocab
    val words = graft.sources.Tables.documents(spark, sfDir)
      .select(explode(graft.functions.TextFunctions.tokens(col("text")))
        .as("w"))
      .limit(2000)
    val broken = words.filter(
      concat_ws("", TokenizeKernel.greedySubwords(col("w"), vocab, 3))
        =!= col("w")).count()
    assert(broken == 0L)
  }

  test("greedy tokenizer: text kernel equals per-word flat concatenation") {
    import graft.functions.{TextFunctions, TokenizeKernel}
    val vocab = graft.queries.TextQueries.SubwordVocab
    val mism = graft.sources.Tables.documents(spark, sfDir).limit(200)
      .select(
        TokenizeKernel.greedySubwordsText(col("text"), vocab, 3).as("t"),
        flatten(transform(TextFunctions.tokens(col("text")),
          w => TokenizeKernel.greedySubwords(w, vocab, 3))).as("f"))
      .filter(not(col("t") <=> col("f")))
      .count()
    assert(mism == 0L)
  }

  test("greedy tokenizer: HOF twin returns [] on the empty word, like the kernel") {
    import graft.functions.TokenizeKernel
    val vocab = Seq("ab")
    val out = Seq("", "ab").toDF("w").select(
        TokenizeKernel.greedySubwordsHof(col("w"), vocab, 3).as("h"),
        TokenizeKernel.greedySubwords(col("w"), vocab, 3).as("k"))
      .collect().map(r => (r.getSeq[String](0).toList, r.getSeq[String](1).toList))
    assert(out(0) == (Nil, Nil)) // sequence(1,0) counts down — guarded
    assert(out(1) == (List("ab"), List("ab")))
  }

  test("asof join carries a right row whose payload VALUE is null") {
    import graft.operators.AsOfJoin
    val left = Seq((1L, ts("2024-01-05 00:00:00"))).toDF("id", "t")
    val right = Seq(
      (1L, ts("2024-01-01 00:00:00"), Option("HIGH")),
      (1L, ts("2024-01-03 00:00:00"), Option.empty[String]) // null IS the value
    ).toDF("id", "rt", "payload")
    val out = AsOfJoin.lastValue(left, right, "id", "t", "rt",
      Seq("payload")).collect()
    // the valid-at version is the null one — must NOT resurrect HIGH
    assert(out.length == 1 && out(0).isNullAt(2),
      s"stale payload resurrected: ${out.toSeq}")
  }

  test("greedy tokenizer: registered as a SQL function") {
    graft.GraftExtensions.registerAll(spark)
    val r = spark.sql(
      "SELECT greedy_tokenize('theme', array('the', 'he'), 3) AS t")
      .collect()(0).getSeq[String](0)
    assert(r.toList == List("the", "m", "e"))
  }

  test("vec_project: registered as a SQL function, matches the driver fold") {
    graft.GraftExtensions.registerAll(spark)
    val r = spark.sql(
      """SELECT vec_project(array(CAST(1.0 AS FLOAT), CAST(2.0 AS FLOAT)),
        |  array(0.5, 0.5), array(2.0, 4.0), 2.0) AS p""".stripMargin)
      .collect()(0).getDouble(0)
    // ((1-0.5)*2 + (2-0.5)*4) / 2 = 7/2
    assert(r == 3.5)
  }

  // ---- Quality-weighted sampling ----------------------------------------

  test("byScore: boundary scores, determinism, and prefix stability") {
    import graft.operators.Resample
    val df = spark.range(2000).select(col("id"),
      (col("id") % 2).cast("double").as("half"))
    // score 1 keeps everything, score 0 keeps nothing
    assert(Resample.byScore(df, lit(1.0), col("id")).count() == 2000)
    assert(Resample.byScore(df, lit(0.0), col("id")).count() == 0)
    // clamping: scores outside [0,1] behave as the boundary
    assert(Resample.byScore(df, lit(7.5), col("id")).count() == 2000)
    assert(Resample.byScore(df, lit(-3.0), col("id")).count() == 0)
    // deterministic across runs
    val a = Resample.byScore(df, col("half") * 0.6, col("id"))
      .select("id").collect().map(_.getLong(0)).toSet
    val b = Resample.byScore(df, col("half") * 0.6, col("id"))
      .select("id").collect().map(_.getLong(0)).toSet
    assert(a == b)
    // raising every score only ADDS rows (hash-range prefix)
    val hi = Resample.byScore(df, col("half") * 0.9, col("id"))
      .select("id").collect().map(_.getLong(0)).toSet
    assert(a.subsetOf(hi))
    // kept fraction tracks the score (0.6 on the odd half)
    val oddKept = a.size.toDouble / 1000
    assert(math.abs(oddKept - 0.6) < 0.06, s"kept fraction $oddKept")
  }

  // ---- Cohorts ----------------------------------------------------------

  test("cohort retention: week-0 cells partition the user base") {
    val rows = graft.queries.WarehouseQueries
      .cohortRetention(spark, sfDir).collect()
    assert(rows.forall(_.getLong(1) >= 0L), "no activity before the cohort week")
    val week0 = rows.filter(_.getLong(1) == 0L).map(_.getLong(2)).sum
    val users = graft.sources.Tables.events(spark, sfDir)
      .select("user_id").distinct().count()
    // every user is active in their own first week by definition
    assert(week0 == users)
    // later-week cells never exceed their cohort's size
    val cohortSize = rows.filter(_.getLong(1) == 0L)
      .map(r => r.getTimestamp(0) -> r.getLong(2)).toMap
    assert(rows.forall(r => r.getLong(2) <= cohortSize(r.getTimestamp(0))))
  }

  // ---- Quality filter ---------------------------------------------------

  test("quality filter: keeps the top ~quartile at bucket granularity") {
    val docs = graft.sources.Tables.documents(spark, sfDir)
    val total = docs.count()
    val kept = graft.queries.TextQueries.qualityFilter(spark, sfDir)
    val k = kept.count()
    // threshold is bucket-granular: the kept share is ~25%, never under
    assert(k >= total / 4, s"kept $k of $total — p75 cut lost rows")
    assert(k <= total / 2, s"kept $k of $total — threshold far too low")
    // separation: every kept doc scores >= every dropped doc - 0.01
    val keptIds = kept.select("doc_id")
    val dropped = graft.queries.TextQueries.textQualityScore(spark, sfDir)
      .join(keptIds, Seq("doc_id"), "left_anti")
    val minKept = kept.agg(min(col("quality"))).collect()(0).getDouble(0)
    val maxDrop = dropped.agg(max(col("quality"))).collect()(0).getDouble(0)
    assert(minKept >= maxDrop - 0.01,
      s"bucket separation violated: $minKept vs $maxDrop")
  }

  // ---- Outliers ---------------------------------------------------------

  test("outliers: degenerate groups are excluded, not flagged") {
    val df = (Seq(
      ("single", 7.25),              // n=1: variance undefined
      ("const", 5.0), ("const", 5.0), ("const", 5.0), // variance 0
      // a lone outlier's max z is (n-1)/sqrt(n) — needs n ≥ 12 to pass 3
      ("ok", 100.0)) ++ Seq.fill(12)(("ok", 1.0))).toDF("g", "v")
    val out = graft.operators.Outliers.zscore(df, "g", "v")
      .collect().map(r => (r.getString(0), r.getDouble(1)))
    assert(out.forall(_._1 == "ok"),
      s"degenerate groups leaked: ${out.mkString(", ")}")
    assert(out.map(_._2).toSeq == Seq(100.0))
  }

  test("profile: column names with spaces and quotes survive") {
    val df = Seq((1, "x"), (2, null))
      .toDF("order date", "na'me")
    val p = Profile.profile(df, Seq("na'me", "order date"))
      .collect().map(r => (r.getString(0), r.getLong(2), r.getString(4)))
    assert(p.toSeq == Seq(("na'me", 1L, "x"), ("order date", 0L, "1.000000")))
  }

  test("funnel: stage labels with quotes survive") {
    val ev = Seq(
      (1L, "add's", ts("2024-01-01 10:00:00"), 1L),
      (1L, "buy", ts("2024-01-01 11:00:00"), 2L)
    ).toDF("user_id", "event_type", "ts", "event_id")
    val out = Funnel.steps(ev, "user_id", "event_type", "ts", "event_id",
        Seq("add's", "buy"), None)
      .collect().map(r => (r.getString(1), r.getLong(2)))
    assert(out.toSeq == Seq(("add's", 1L), ("buy", 1L)))
  }

  test("ewma: null period values are dropped, not poisoning the fold") {
    val df = Seq(
      (1L, 1, Option(10.0)), (1L, 2, Option.empty[Double]),
      (1L, 3, Option(30.0))
    ).toDF("k", "period", "v")
    val out = graft.operators.Ewma
      .smooth(df, "k", "period", col("v"), alpha = 0.5)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getDouble(2)))
    // null period dropped: series = [10, 30], ewma = .5*30+.5*10 = 20
    assert(out.toSeq == Seq((1L, 2, 20.0)))
  }

  test("peak concurrency matches a driver-side global sweep line") {
    val got = graft.queries.WarehouseQueries.peakConcurrency(spark, sfDir)
      .collect().map(r => r.getTimestamp(0).getTime -> r.getLong(1)).toMap
    // reference: ONE global sweep (the thing the operator decomposes
    // per-day), tracking the running count and each day's max —
    // including the concurrency carried across midnight
    val sessions = graft.operators.Sessionize.sessions(
        graft.sources.Tables.events(spark, sfDir),
        col("user_id"), col("ts"), 4 * 3600L, Seq(col("ts"), col("event_id")))
      .select(col("t_start"), col("t_end")).collect()
      .map(r => (r.getTimestamp(0).getTime, r.getTimestamp(1).getTime))
    val points = sessions.flatMap { case (s, e) => Seq((s, 1L), (e, -1L)) }
      .sortBy(identity)  // (t asc, d asc) → -1 before +1 at shared t
    def dayOf(t: Long): Long = t - Math.floorMod(t, 86400000L)
    val peak = scala.collection.mutable.Map.empty[Long, Long]
    var cur = 0L
    var prevDay = Long.MinValue
    points.foreach { case (t, d) =>
      val day = dayOf(t)
      if (prevDay != Long.MinValue && day > prevDay) {
        // concurrency at each crossed midnight is `cur`
        var x = prevDay + 86400000L
        while (x <= day) { peak(x) = math.max(peak.getOrElse(x, 0L), cur); x += 86400000L }
      }
      cur += d
      peak(day) = math.max(peak.getOrElse(day, 0L), cur)
      prevDay = math.max(prevDay, day)
    }
    val want = peak.toMap.filter(_._2 > 0)
    assert(got == want,
      s"diff only-got=${(got.toSet -- want.toSet).take(3)} only-want=${(want.toSet -- got.toSet).take(3)}")
    assert(got.values.max > 1, "busiest instant must overlap sessions")
  }

  test("winsorize: clipping respects the exact p05/p95 bucket thresholds per type") {
    val rows = graft.queries.WarehouseQueries.eventsWinsorize(spark, sfDir)
      .collect().map(r => (r.getString(1), r.getDouble(2), r.getDouble(3)))
    assert(rows.nonEmpty)
    rows.groupBy(_._1).foreach { case (tpe, vs) =>
      val n = vs.length.toDouble
      // driver-side exact thresholds from the same bucket rule
      val buckets = vs.map(v => math.floor(v._2 * 100.0).toLong).sorted
      def thrAt(q: Double): Long = {
        val need = math.ceil(q * n).toLong
        buckets(need.toInt - 1)
      }
      val lo = thrAt(0.05) / 100.0
      val hi = thrAt(0.95) / 100.0
      vs.foreach { case (_, v, c) =>
        val expect = math.min(math.max(v, lo), hi)
        assert(c == expect, s"$tpe: value $v clipped to $c, want $expect")
      }
      // the clip actually fires on both tails of this distribution
      assert(vs.exists { case (_, v, c) => c > v } &&
        vs.exists { case (_, v, c) => c < v }, s"$tpe: no clipping happened")
    }
  }

  test("outliers: z-scores match per-type moments; all |z| > 3") {
    val out = graft.queries.WarehouseQueries.eventsOutliers(spark, sfDir)
    val rows = out.collect()
    assert(rows.nonEmpty, "exponential-tail values must produce 3-sigma outliers")
    assert(rows.forall(r => math.abs(r.getDouble(3)) > 3.0))
    // spot-check one z against driver-side moments
    val ev = graft.sources.Tables.events(spark, sfDir)
      .select("event_type", "value").collect()
      .map(r => (r.getString(0), r.getDouble(1)))
    val byType = ev.groupBy(_._1)
    val r0 = rows.head
    val vals = byType(r0.getString(1)).map(_._2)
    val n = vals.length.toDouble
    val mean = vals.sum / n
    val sd = math.sqrt(vals.map(v => (v - mean) * (v - mean)).sum / (n - 1))
    val z = (r0.getDouble(2) - mean) / sd
    assert(math.abs(r0.getDouble(3) - z) < 1e-6)
  }

  test("integer PageRank: matches the driver recursion exactly, hub dominates, partition-invariant") {
    import spark.implicits._
    import graft.operators.Centrality
    // undirected star: hub 0 <-> {1,2,3,4}
    val ePairs = (1L to 4L).flatMap(i => Seq((0L, i), (i, 0L)))
    val edges = ePairs.toDF("src", "dst")
    val nodes = (0L to 4L).toDF("id")
    val got = Centrality.pageRank(edges, nodes, iterations = 10)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

    // the same integer recursion, folded on the driver
    val out = ePairs.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    val inc = ePairs.groupBy(_._2).view.mapValues(_.map(_._1)).toMap
    val n = 5L
    val r0 = Centrality.Scale / n
    val base = (15L * r0) / 100L
    var ranks = (0L to 4L).map(_ -> r0).toMap
    (1 to 10).foreach { _ =>
      ranks = (0L to 4L).map { v =>
        val s = inc.getOrElse(v, Nil).map(u => ranks(u) / out(u)).sum
        v -> (base + (85L * s) / 100L)
      }.toMap
    }
    assert(got == ranks, s"got $got want $ranks")
    assert(got(0L) == got.values.max, "hub must rank highest")
    assert(got(1L) == got(2L) && got(2L) == got(3L), "leaves symmetric")

    // integer arithmetic => identical under any partitioning
    val re = Centrality.pageRank(edges.repartition(7), nodes.repartition(3), 10)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(re == got)
  }

  test("weighted PageRank: matches driver recursion, weight skew shifts rank, duplicate edges collapse by sum") {
    import spark.implicits._
    import graft.operators.Centrality
    // hub 0 with skewed weights to {1,2}: 9 vs 1 (both directions);
    // edge (0,1) supplied as two parallel rows that must sum to 9
    val ePairs = Seq(
      (0L, 1L, 4L), (0L, 1L, 5L), (0L, 2L, 1L),
      (1L, 0L, 9L), (2L, 0L, 1L))
    val edges = ePairs.toDF("src", "dst", "weight")
    val nodes = (0L to 2L).toDF("id")
    val got = Centrality.weightedPageRank(edges, nodes, iterations = 10)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

    // same integer recursion on the driver, over the COLLAPSED edges
    val collapsed = ePairs.groupBy(p => (p._1, p._2)).view
      .mapValues(_.map(_._3).sum).toSeq.map { case ((s, d), w) => (s, d, w) }
    val wout = collapsed.groupBy(_._1).view.mapValues(_.map(_._3).sum).toMap
    val inc = collapsed.groupBy(_._2)
    val n = 3L
    val r0 = Centrality.Scale / n
    val base = (15L * r0) / 100L
    var ranks = (0L to 2L).map(_ -> r0).toMap
    (1 to 10).foreach { _ =>
      ranks = (0L to 2L).map { v =>
        val s = inc.getOrElse(v, Nil)
          .map { case (u, _, w) => ranks(u) * w / wout(u) }.sum
        v -> (base + (85L * s) / 100L)
      }.toMap
    }
    assert(got == ranks, s"got $got want $ranks")
    assert(got(1L) > got(2L),
      "the 9x-weighted neighbor must outrank the 1x one")
    // partition-invariant (integer sums reorder freely)
    val re = Centrality.weightedPageRank(
      edges.repartition(5), nodes.repartition(2), 10)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(re == got)
  }

  test("personalized PageRank: matches driver recursion, seeds dominate, zero-weight isolates get 0") {
    import spark.implicits._
    import graft.operators.Centrality
    // path 0-1-2-3 (undirected) + isolated 4; teleport only on node 0
    val ePairs = Seq((0L, 1L), (1L, 0L), (1L, 2L), (2L, 1L), (2L, 3L), (3L, 2L))
    val edges = ePairs.toDF("src", "dst")
    val teleport = Seq((0L, 3L), (1L, 0L), (2L, 0L), (3L, 0L), (4L, 0L))
      .toDF("id", "weight")
    val got = Centrality.personalizedPageRank(edges, teleport, iterations = 8)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // same integer recursion on the driver
    val out = ePairs.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    val inc = ePairs.groupBy(_._2).view.mapValues(_.map(_._1)).toMap
    val t = Map(0L -> Centrality.Scale, 1L -> 0L, 2L -> 0L, 3L -> 0L, 4L -> 0L)
    var ranks = t
    (1 to 8).foreach { _ =>
      ranks = (0L to 4L).map { v =>
        val s = inc.getOrElse(v, Nil).map(u => ranks(u) / out(u)).sum
        v -> ((15L * t(v)) / 100L + (85L * s) / 100L)
      }.toMap
    }
    assert(got == ranks, s"got $got want $ranks")
    assert(got(0L) == got.values.max, "seed must rank highest")
    // (no strict monotone decay on a reflecting path — the dead-end
    // node 3 bounces all its mass back to 2, lifting 2 above 1)
    assert(got(3L) < got(1L), "farthest node must rank below the seed's neighbour")
    assert(got(4L) == 0L, "zero-weight isolated node gets no teleport and no links")
  }

  test("HITS: matches driver recursion, hubs/authorities split the bipartite graph") {
    import spark.implicits._
    import graft.operators.Centrality
    // directed bipartite: hubs {1,2} → authorities {10,11,12}; 3 isolated
    val ePairs = Seq((1L, 10L), (1L, 11L), (2L, 10L), (2L, 11L), (2L, 12L))
    val edges = ePairs.toDF("src", "dst")
    val ids = Seq(1L, 2L, 3L, 10L, 11L, 12L)
    val nodes = ids.toDF("id")
    val got = Centrality.hits(edges, nodes, iterations = 4)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    // the same integer recursion on the driver
    val inc = ePairs.groupBy(_._2).view.mapValues(_.map(_._1)).toMap
    val out = ePairs.groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    var hub = ids.map(_ -> Centrality.Scale / ids.length).toMap
    var auth = Map.empty[Long, Long]
    (1 to 4).foreach { _ =>
      val aRaw = ids.map(v => v -> inc.getOrElse(v, Nil).map(hub).sum).toMap
      val da = math.max(1L, aRaw.values.sum / Centrality.Scale)
      auth = aRaw.view.mapValues(_ / da).toMap
      val hRaw = ids.map(v => v -> out.getOrElse(v, Nil).map(auth).sum).toMap
      val dh = math.max(1L, hRaw.values.sum / Centrality.Scale)
      hub = hRaw.view.mapValues(_ / dh).toMap
    }
    val want = ids.map(v => v -> (auth(v), hub(v))).toMap
    assert(got == want, s"got $got want $want")
    // structure: hub side has zero authority and vice versa
    assert(got(1L)._1 == 0L && got(2L)._1 == 0L)
    assert(got(10L)._2 == 0L && got(12L)._2 == 0L)
    assert(got(3L) == (0L, 0L), "isolated node scores zero both ways")
    assert(got(2L)._2 > got(1L)._2, "the 3-degree buyer out-hubs the 2-degree one")
    assert(got(10L)._1 == got(11L)._1 && got(10L)._1 > got(12L)._1,
      "authorities served by both hubs beat the single-hub one")
    // integer arithmetic => partition-invariant
    val re = Centrality.hits(edges.repartition(5), nodes.repartition(3), 4)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(re == got)
  }

  test("label propagation: matches driver recursion, cliques split, isolated node keeps its label") {
    import spark.implicits._
    import graft.operators.Community
    // two triangles {1,2,3} and {4,5,6} joined by bridge 3-4; 7 isolated
    val und = Seq((1L, 2L), (1L, 3L), (2L, 3L),
      (4L, 5L), (4L, 6L), (5L, 6L), (3L, 4L))
    val ePairs = und.flatMap { case (a, b) => Seq((a, b), (b, a)) }
    val edges = ePairs.toDF("src", "dst")
    val nodes = (1L to 7L).toDF("id")
    val got = Community.labelPropagation(edges, nodes, iterations = 5)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // the same synchronous min-tiebreak recursion on the driver
    val nbrs = ePairs.groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    var lab = (1L to 7L).map(v => v -> v).toMap
    (1 to 5).foreach { _ =>
      val prev = lab
      lab = (1L to 7L).map { v =>
        val ls = nbrs.getOrElse(v, Nil).map(prev)
        if (ls.isEmpty) v -> prev(v)
        else v -> ls.groupBy(identity).toSeq
          .map { case (l, occ) => (-occ.size.toLong, l) }.min._2
      }.toMap
    }
    assert(got == lab, s"got $got want $lab")
    assert(got(1L) == got(2L) && got(2L) == got(3L), "left clique converges")
    assert(got(4L) == got(5L) && got(5L) == got(6L), "right clique converges")
    assert(got(1L) != got(4L), "bridge must not merge the cliques")
    assert(got(7L) == 7L, "isolated node keeps its own label")
    // exact integers => partition-invariant
    val re = Community.labelPropagation(
        edges.repartition(5), nodes.repartition(3), 5)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(re == got)
  }

  test("kcore: onion layers match driver peeling, core exact, fixpoint idempotent") {
    import spark.implicits._
    import graft.operators.KCore
    // square {10,11,12,13} (the 2-core) with a chain 1-2-3-10 hanging
    // off it and a pendant 14 on the square: peeling at k=2 removes
    // 1 (deg 1) and 14 in round 1, then 2 in round 2, then 3 in
    // round 3; the square survives as the exact 2-core.
    val und = Seq((10L, 11L), (11L, 12L), (12L, 13L), (13L, 10L),
      (1L, 2L), (2L, 3L), (3L, 10L), (10L, 14L))
    val edges = und.flatMap { case (a, b) => Seq((a, b), (b, a)) }
      .toDF("src", "dst")
    val got = KCore.peelLayers(edges, k = 2, rounds = 6)
      .collect()
      .map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) None else Some(r.getInt(1)), r.getBoolean(2)))
      .toMap
    val want = Map(
      1L -> (Some(1), false), 14L -> (Some(1), false),
      2L -> (Some(2), false), 3L -> (Some(3), false),
      10L -> (None, true), 11L -> (None, true),
      12L -> (None, true), 13L -> (None, true))
    assert(got == want, s"got $got want $want")
    // extra rounds past the fixpoint are the identity
    val more = KCore.peelLayers(edges, k = 2, rounds = 9)
      .collect()
      .map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) None else Some(r.getInt(1)), r.getBoolean(2)))
      .toMap
    assert(more == got, "idempotent past fixpoint")
    // k above the max degree peels everything in one round
    val all = KCore.peelLayers(edges, k = 10, rounds = 3).collect()
    assert(all.forall(r => r.getInt(1) == 1 && !r.getBoolean(2)))
    // exact integers => partition-invariant
    val re = KCore.peelLayers(edges.repartition(5), k = 2, rounds = 6)
      .collect()
      .map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) None else Some(r.getInt(1)), r.getBoolean(2)))
      .toMap
    assert(re == got)
  }

  test("Markov attribution: exact transitions, mandatory channel dominates, no-conv zeroes, partition-invariant") {
    import spark.implicits._
    import graft.operators.Attribution
    // journeys (tiebreak = eid): u1 view→click→P, u2 click→P,
    // u3 view→signup (drop), u4 signup→click→P — every conversion
    // passes through click
    val ev = Seq(
      (1L, 10L, 1L, "view"), (1L, 20L, 2L, "click"), (1L, 30L, 3L, "purchase"),
      (2L, 10L, 4L, "click"), (2L, 20L, 5L, "purchase"),
      (3L, 10L, 6L, "view"), (3L, 20L, 7L, "signup"),
      (4L, 10L, 8L, "signup"), (4L, 20L, 9L, "click"), (4L, 30L, 10L, "purchase"))
      .toDF("user_id", "ts", "event_id", "event_type")
    val tr = Attribution.transitions(ev, "user_id", "ts", "event_id",
        "event_type", "purchase")
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2))
      .toMap
    val S = Attribution.StartState; val C = Attribution.ConvState
    val N = Attribution.NullState
    val wantTr = Map(
      (S, "view") -> 2L, (S, "click") -> 1L, (S, "signup") -> 1L,
      ("view", "click") -> 1L, ("view", "signup") -> 1L,
      ("click", C) -> 3L, ("signup", "click") -> 1L, ("signup", N) -> 1L)
    assert(tr == wantTr, s"got $tr want $wantTr")
    val out = Attribution.markovRemoval(ev, "user_id", "ts", "event_id",
        "event_type", "purchase", iterations = 12,
        channelsHint = Some(Seq("click", "error", "signup", "view")))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2)))
      .toMap
    assert(out.keySet == Set("click", "error", "signup", "view"))
    // click is on EVERY converting path: removing it kills all
    // conversions, so its removal effect is the full base probability
    // and strictly dominates the others
    assert(out("click")._1 > out("view")._1 &&
      out("click")._1 > out("signup")._1, s"got $out")
    assert(out("error")._1 == 0L, "absent channel earns nothing")
    assert(out("click")._2 > 0.5, "mandatory channel takes the majority share")
    assert(math.abs(out.values.map(_._2).sum - 1.0) < 1e-3)
    // partition invariance (integer fixed point + aggregate collect)
    val re = Attribution.markovRemoval(ev.repartition(5), "user_id", "ts",
        "event_id", "event_type", "purchase", iterations = 12,
        channelsHint = Some(Seq("click", "error", "signup", "view")))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2)))
      .toMap
    assert(re == out)
    // a corpus with no conversions attributes nothing
    val cold = ev.filter(col("event_type") =!= "purchase")
    val zero = Attribution.markovRemoval(cold, "user_id", "ts", "event_id",
        "event_type", "purchase",
        channelsHint = Some(Seq("click", "error", "signup", "view")))
      .collect().map(r => (r.getLong(1), r.getDouble(2)))
    assert(zero.forall(_ == ((0L, 0.0))))
  }

  test("seedDistance: BFS hops from a seed set, unreached -1, horizon respected") {
    import spark.implicits._
    import graft.operators.Centrality
    // path 0-1-2-3-4 (undirected) + isolated 5; seeds {0, 9}
    // (9 is not in the node set and must be ignored)
    val und = Seq((0L, 1L), (1L, 2L), (2L, 3L), (3L, 4L))
    val edges = und.flatMap { case (a, b) => Seq((a, b), (b, a)) }
      .toDF("src", "dst")
    val nodes = (0L to 5L).toDF("id")
    val seeds = Seq(0L, 9L).toDF("id")
    val got = Centrality.seedDistance(edges, seeds, nodes, maxIter = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(0L -> 0L, 1L -> 1L, 2L -> 2L, 3L -> 3L,
      4L -> -1L, 5L -> -1L), s"got $got")
    // a wider horizon reaches node 4; exact integers => partition-invariant
    val far = Centrality.seedDistance(
        edges.repartition(5), seeds, nodes.repartition(3), maxIter = 4)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(far(4L) == 4L && far(5L) == -1L)
  }

  test("weightedDistance: cheap multi-hop beats expensive direct; horizon + nulls hold") {
    import spark.implicits._
    import graft.operators.Centrality
    // 0→3 direct costs 100; 0→1→2→3 costs 3·10 = 30 (3 hops);
    // node 4 dangles two hops past 3; node 5 isolated
    val und = Seq((0L, 3L, 100L), (0L, 1L, 10L), (1L, 2L, 10L),
      (2L, 3L, 10L), (3L, 4L, 10L))
    val edges = und.flatMap { case (a, b, w) => Seq((a, b, w), (b, a, w)) }
      .toDF("src", "dst", "w")
    val nodes = (0L to 5L).toDF("id")
    val seeds = Seq(0L).toDF("id")
    def run(iters: Int) = Centrality
      .weightedDistance(edges, seeds, nodes, maxIter = iters)
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) None else Some(r.getLong(1)))).toMap
    // 2 rounds: 3 is reachable only via the expensive direct edge
    val near = run(2)
    assert(near(3L) == Some(100L) && near(2L) == Some(20L) &&
      near(4L) == Some(110L) && near(5L) == None, s"got $near")
    // 3 rounds: the cheap 3-hop path relaxes through to 3 — but 4
    // still rides the expensive route until round 4 propagates it
    val mid = run(3)
    assert(mid(3L) == Some(30L) && mid(4L) == Some(110L), s"got $mid")
    val far = run(4)
    assert(far == Map(0L -> Some(0L), 1L -> Some(10L), 2L -> Some(20L),
      3L -> Some(30L), 4L -> Some(40L), 5L -> None), s"got $far")
    // integer min-plus => partition-invariant
    val re = Centrality.weightedDistance(
        edges.repartition(5), seeds, nodes.repartition(3), maxIter = 4)
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) None else Some(r.getLong(1)))).toMap
    assert(re == far)
  }

  test("Materialize.cut: reliable-checkpoint path matches local path bit-exactly") {
    import spark.implicits._
    import graft.operators.{Centrality, Dedup}
    val ePairs = (1L to 4L).flatMap(i => Seq((0L, i), (i, 0L))) ++
      Seq((5L, 6L), (6L, 5L))
    val edges = ePairs.toDF("src", "dst")
    val nodes = (0L to 7L).toDF("id")
    val ccEdges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (6L, 5L)).toDF("id_a", "id_b")
    val ccNodes = (1L to 7L).toDF("id")
    def runBoth[A](f: => A): (A, A) = {
      val sc = spark.sparkContext
      assert(sc.getCheckpointDir.isEmpty, "test expects no ambient checkpoint dir")
      val local = f
      val dir = java.nio.file.Files.createTempDirectory("graft-ckpt").toString
      sc.setCheckpointDir(dir)
      // setCheckpointDir(null) resets to None (Option(null) inside)
      try { (local, f) } finally sc.setCheckpointDir(null)
    }
    val (prLocal, prReliable) = runBoth {
      Centrality.pageRank(edges, nodes, iterations = 6)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    }
    assert(prLocal == prReliable, "pageRank must be identical under both cut modes")
    val (ccLocal, ccReliable) = runBoth {
      Dedup.connectedComponents(ccEdges, ccNodes)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    }
    assert(ccLocal == ccReliable,
      "connectedComponents must be identical under both cut modes")
    assert(ccLocal(4L) == 1L && ccLocal(7L) == 7L && ccLocal(6L) == 5L)
  }

  test("expectations: planted violations counted exactly, clean rules pass") {
    import spark.implicits._
    import graft.operators.Expectations
    val df = Seq(
      (1L, Option(10L), 50.0, "O"),
      (2L, Option(11L), -5.0, "O"),   // range violation
      (3L, None,        60.0, "F"),   // null violation
      (3L, Option(12L), 70.0, "X"),   // dup id + set violation
      (4L, Option(99L), 80.0, "F"))   // missing FK
      .toDF("id", "fk", "amount", "status")
    val dim = Seq(10L, 11L, 12L).toDF("pk")
    val got = Expectations.check(df,
        rowRules = Seq(
          Expectations.notNull("fk"),
          Expectations.inRange("amount", 0.0, 100.0),
          Expectations.inSet("status", Seq("O", "F"))),
        uniqueCols = Seq("id"),
        refRules = Seq(Expectations.refIntegrity("fk", dim, "pk")))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getBoolean(2))).toMap
    assert(got == Map(
      "not_null(fk)" -> ((1L, false)),
      "in_range(amount)" -> ((1L, false)),
      "in_set(status)" -> ((1L, false)),
      "unique(id)" -> ((1L, false)),
      "ref_integrity(fk)" -> ((1L, false))))

    val clean = Expectations.check(df.filter(col("id") === 1),
        rowRules = Seq(Expectations.notNull("fk")),
        uniqueCols = Seq("id"),
        refRules = Seq(Expectations.refIntegrity("fk", dim, "pk")))
      .collect()
    assert(clean.forall(_.getBoolean(2)), "clean subset must pass every rule")
  }

  test("Triangles: hand-counted K4 + pendant, raw-edge normalization, partition-invariant") {
    import spark.implicits._
    import graft.operators.Triangles
    // K4 on {1,2,3,4} (4 triangles, every node in 3) + pendant 1–5 +
    // isolated 6; input deliberately dirty: reversed duplicates and a
    // self-loop must normalize away
    val edges = Seq((1L, 2L), (2L, 1L), (1L, 3L), (3L, 1L), (1L, 4L),
      (2L, 3L), (2L, 4L), (3L, 4L), (4L, 4L), (1L, 5L)).toDF("u", "v")
    val nodes = Seq(1L, 2L, 3L, 4L, 5L, 6L).toDF("id")
    val got = Triangles.nodeTriangles(edges, nodes)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    // node 1: degree 4 (K4 + pendant), 3 triangles, lcc 2·3/(4·3) = 0.5
    assert(got(1L) == (4L, 3L, 0.5))
    // nodes 2–4: degree 3, 3 triangles, lcc 2·3/(3·2) = 1.0
    Seq(2L, 3L, 4L).foreach(v => assert(got(v) == (3L, 3L, 1.0), s"node $v"))
    assert(got(5L) == (1L, 0L, 0.0), "pendant: degree 1, no triangles")
    assert(got(6L) == (0L, 0L, 0.0), "isolated node")
    // total incidences = 3 × triangle count
    assert(got.values.map(_._2).sum == 12L)
    val re = Triangles.nodeTriangles(edges.repartition(5), nodes.repartition(3))
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    assert(re == got, "exact integer counts must be partition-invariant")
  }

  test("TWAP: hand-computed weighted means, single-event days drop, day boundary splits") {
    import spark.implicits._
    import java.sql.Timestamp
    def ts(s: String) = Timestamp.valueOf(s)
    val rows = Seq(
      // user 1, one day: 10.0 held 10s, then 20.0 held 30s → (100+600)/40
      (1L, ts("2024-01-01 00:00:00"), 1L, 10.0),
      (2L, ts("2024-01-01 00:00:10"), 1L, 20.0),
      (3L, ts("2024-01-01 00:00:40"), 1L, 99.0),   // last event: no gap
      // user 1, next day: single event → no interval, day drops
      (4L, ts("2024-01-02 12:00:00"), 1L, 7.0),
      // user 2 same day as user 1: independent window
      (5L, ts("2024-01-01 00:00:00"), 2L, 4.0),
      (6L, ts("2024-01-01 00:01:00"), 2L, 8.0))
      .toDF("event_id", "ts", "user_id", "value")
      .withColumn("event_type", lit("x")).withColumn("props", lit("{}"))
    val dir = java.nio.file.Files.createTempDirectory("graft_twap")
      .toFile.getAbsolutePath
    rows.write.mode("overwrite").parquet(s"$dir/events.parquet")
    val got = graft.queries.WarehouseQueries.eventsTwap(spark, dir)
      .collect().map(r => (r.getLong(0), r.getDate(1).toString,
        r.getLong(2), r.getDouble(3)))
    assert(got.toSeq == Seq(
      (1L, "2024-01-01", 2L, (10.0 * 10 + 20.0 * 30) / 40.0),
      (2L, "2024-01-01", 1L, 4.0)), s"got ${got.toSeq}")
  }

  test("k-anonymity: class sizes match a driver recompute and small classes flag") {
    val docs = graft.sources.Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("lang"), col("source"), col("n_chars"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3)))
    val classes = docs.groupBy(d => (d._2, d._3, d._4 / 100))
      .view.mapValues(_.length.toLong).toMap
    val got = graft.queries.TextQueries.kAnonymityAudit(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(4), r.getBoolean(5)))
    assert(got.length == docs.length, "audit must cover every doc")
    val byId = docs.map(d => d._1 -> (d._2, d._3, d._4 / 100)).toMap
    got.foreach { case (id, sz, risk) =>
      assert(sz == classes(byId(id)), s"doc $id class size")
      assert(risk == (sz < 5), s"doc $id risk flag")
    }
    assert(got.exists(_._3), "sf0.001 fixture should contain small classes")
  }

  test("l-diversity: class stats match a driver recompute; homogeneous classes flag") {
    val docs = graft.sources.Tables.documents(spark, sfDir)
      .select(col("source"), col("n_chars"), col("lang"))
      .collect().map(r => (r.getString(0), r.getLong(1) / 100, r.getString(2)))
    val want = docs.groupBy(d => (d._1, d._2)).map { case (k, rows) =>
      k -> (rows.length.toLong, rows.map(_._3).distinct.length.toLong)
    }
    val got = graft.queries.TextQueries.lDiversityAudit(spark, sfDir)
      .collect().map(r => ((r.getString(0), r.getLong(1)),
        (r.getLong(2), r.getLong(3), r.getBoolean(4)))).toMap
    assert(got.keySet == want.keySet)
    got.foreach { case (k, (sz, ns, div)) =>
      assert((sz, ns) == want(k), s"class $k stats")
      assert(div == (ns >= 2), s"class $k flag")
    }
    // the audit is non-degenerate both ways on the gate corpus: some
    // classes are diverse, and some are k-large yet lang-homogeneous —
    // exactly the rows k-anonymity alone would wave through
    assert(got.values.exists(_._3) && got.values.exists(!_._3))
  }

  test("item cosine: matches a driver recompute; normalization beats raw support") {
    val li = graft.sources.Tables.lineitem(spark, sfDir)
      .select(col("l_orderkey"), col("l_partkey"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).distinct
    val byItem = li.groupBy(_._2).view.mapValues(_.length.toLong).toMap
    val co = li.groupBy(_._1).values.flatMap { rows =>
      val pks = rows.map(_._2).sorted
      for (i <- pks.indices; j <- i + 1 until pks.length) yield (pks(i), pks(j))
    }.groupBy(identity).view.mapValues(_.size.toLong).filter(_._2 >= 2).toMap
    val want = co.map { case ((u, v), s) =>
      (u, v) -> (s, s.toDouble / math.sqrt((byItem(u) * byItem(v)).toDouble))
    }
    val top = want.toSeq.map { case ((u, v), (s, c)) => (c, u, v, s) }
      .sortBy { case (c, u, v, _) => (-c, u, v) }.take(50)
    val got = graft.queries.WarehouseQueries.itemCosine(spark, sfDir)
      .collect().map(r => (r.getDouble(3), r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got.toSeq == top)
    // the popularity discount is live: the cosine order differs from
    // the raw-support order (else C60 would be C58 re-sorted)
    val bySupport = want.toSeq.map { case ((u, v), (s, _)) => (s, u, v) }
      .sortBy { case (s, u, v) => (-s, u, v) }.take(50).map(t => (t._2, t._3))
    assert(got.map(t => (t._2, t._3)).toSeq != bySupport)
  }

  test("window funnel: chain restart, window cut, and latest-start dominance") {
    import graft.operators.Funnel
    def ts(h: Long) = new java.sql.Timestamp(h * 3600 * 1000L)
    val ev = Seq(
      // u1: stale first chain, fresh complete chain later
      (1L, 1L, "view", ts(0)), (1L, 2L, "click", ts(30)),
      (1L, 3L, "view", ts(31)), (1L, 4L, "click", ts(32)),
      (1L, 5L, "purchase", ts(33)),
      // u2: purchase lands outside the 24h window from the chain start
      (2L, 6L, "view", ts(0)), (2L, 7L, "click", ts(1)),
      (2L, 8L, "purchase", ts(30)),
      // u3: never saw the first stage
      (3L, 9L, "click", ts(0)), (3L, 10L, "purchase", ts(1)),
      // u4: no middle stage
      (4L, 11L, "view", ts(0)), (4L, 12L, "purchase", ts(1)),
      // u5: only the LATER view's chain fits the window — first-touch
      // semantics (stage after EARLIEST view) would stop at depth 2
      (5L, 13L, "view", ts(0)), (5L, 14L, "view", ts(20)),
      (5L, 15L, "click", ts(23)), (5L, 16L, "purchase", ts(26))
    ).toDF("user_id", "event_id", "event_type", "ts")
    val got = Funnel.windowFunnel(ev, "user_id", "event_type", "ts",
        "event_id", Seq("view", "click", "purchase"),
        windowMicros = 24L * 3600 * 1000000)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(got == Map(1L -> 3, 2L -> 2, 3L -> 0, 4L -> 1, 5L -> 3), s"$got")
  }

  test("bootstrap CI: brackets the mean, deterministic, CDF constants sane") {
    val r1 = graft.queries.TextQueries.bootstrapQualityCi(spark, sfDir).head()
    val r2 = graft.queries.TextQueries.bootstrapQualityCi(spark, sfDir).head()
    assert(r1 == r2, "bootstrap must be retry-stable")
    val (n, mean, lo, hi) =
      (r1.getLong(0), r1.getDouble(1), r1.getDouble(2), r1.getDouble(3))
    assert(n == 200)
    assert(lo < mean && mean < hi, s"CI [$lo, $hi] must bracket mean $mean")
    // interval is meaningfully narrower than the score range — the
    // replicas genuinely vary (weights aren't constant)
    assert(hi - lo > 0.0 && hi - lo < 200000.0)
    // Poisson(1) CDF thresholds: increasing, c0 = 1/e, -> 1
    val c = graft.operators.Bootstrap.cum
    assert(c(0) == math.exp(-1.0))
    assert(c.sliding(2).forall(p => p(0) < p(1)))
    assert(c.last > 0.9999 && c.last < 1.0)
  }

  test("bootstrap cells: single-pass aggregate ≡ exploded reference bit-exactly") {
    import graft.operators.Bootstrap
    val docs = graft.sources.Tables.documents(spark, sfDir)
      .select(col("doc_id"), length(col("text")).cast("long").as("v"))
    def asMap(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => r.getLong(0) ->
        (r.getDecimal(1), r.getDecimal(2), r.getLong(3), r.getDecimal(4))).toMap
    val fast = asMap(Bootstrap.cells(docs, col("doc_id"), col("v"), 50, 7L))
    val ref = asMap(Bootstrap.cellsExploded(docs, col("doc_id"), col("v"), 50, 7L))
    assert(fast.size == 50 && fast == ref,
      s"agg path must replay the exploded draw exactly")
    // null id and null value rows follow the exploded semantics too
    val withNulls = docs.unionAll(spark.range(1).select(
      lit(null).cast("long").as("doc_id"), lit(null).cast("long").as("v")))
    val f2 = asMap(Bootstrap.cells(withNulls, col("doc_id"), col("v"), 5, 7L))
    val r2 = asMap(Bootstrap.cellsExploded(withNulls, col("doc_id"), col("v"), 5, 7L))
    assert(f2 == r2, "null-row semantics must match the exploded formulation")
  }

  test("corpus card: every leg equals its standalone key's aggregate") {
    val card = graft.queries.TextQueries.corpusCard(spark, sfDir)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val docs = graft.sources.Tables.documents(spark, sfDir)
    assert(card("n_docs") == docs.count().toDouble)
    assert(card("neardup_pairs") ==
      graft.queries.TextQueries.dedupMinhashLsh(spark, sfDir).count().toDouble)
    assert(card("contamination_pairs") ==
      graft.queries.TextQueries.decontaminate(spark, sfDir).count().toDouble)
    assert(card("zipf_slope") ==
      graft.queries.ExtendedQueries.zipfFit(spark, sfDir)
        .collect()(0).getDouble(1))
    val langSum = card.collect { case (k, v) if k.startsWith("docs_lang:") => v }.sum
    assert(langSum == card("n_docs"), "language mix must partition the corpus")
  }

  test("signal correlation: Pearson matrix matches a driver recompute") {
    val texts = graft.sources.Tables.documents(spark, sfDir)
      .select(col("text")).collect().map(_.getString(0))
    val stop = Set("the", "a", "of", "and", "to", "in", "is")
    val rows = texts.map { txt =>
      val tk = txt.trim.split("\\s+").toSeq
      val n = tk.size.toDouble
      val u = tk.distinct.size.toDouble
      val h = tk.count(stop).toDouble
      val q = 0.4 * math.min(n / 64.0, 1.0) + 0.4 * (u / n) +
        0.2 * math.min((h / n) * 8.0, 1.0)
      val g = tk.sliding(3).filter(_.size == 3).map(_.mkString(" ")).toSeq
      val rep = if (g.isEmpty) 0.0
        else (g.size - g.distinct.size).toDouble / g.size
      (math.round(q * 1e6), math.round(rep * 1e6), tk.size.toLong)
    }
    def pear(xs: Seq[Long], ys: Seq[Long]): Double = {
      val n = xs.size.toDouble
      val sx = xs.sum.toDouble; val sy = ys.sum.toDouble
      val sxx = xs.map(x => x * x).sum.toDouble
      val syy = ys.map(y => y * y).sum.toDouble
      val sxy = xs.zip(ys).map { case (x, y) => x * y }.sum.toDouble
      (n * sxy - sx * sy) /
        (math.sqrt(n * sxx - sx * sx) * math.sqrt(n * syy - sy * sy))
    }
    val qs = rows.map(_._1).toSeq; val rs = rows.map(_._2).toSeq
    val ts = rows.map(_._3).toSeq
    val want = Map(
      ("quality", "repetition") -> pear(qs, rs),
      ("quality", "tokens") -> pear(qs, ts),
      ("repetition", "tokens") -> pear(rs, ts))
    val got = graft.queries.TextQueries.signalCorrelation(spark, sfDir)
      .collect().map(r => ((r.getString(0), r.getString(1)),
        (r.getLong(2), r.getDouble(3)))).toMap
    assert(got.keySet == want.keySet)
    got.foreach { case (k, (n, r)) =>
      assert(n == texts.length)
      assert(math.abs(r - want(k)) < 1e-12, s"$k: $r vs ${want(k)}")
      assert(r >= -1.0 && r <= 1.0)
    }
  }

  test("Q20 shape: dominance decision matches a driver-side recompute") {
    val li = graft.sources.Tables.lineitem(spark, sfDir)
      .select(col("l_partkey"), col("l_suppkey"), col("l_quantity"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    // exact cents arithmetic, mirroring the plan's cross-multiply
    val sp = li.groupBy(t => (t._1, t._2))
      .map { case (k, rows) => k -> rows.map(t => math.round(t._3 * 100)).sum }
    val byPart = sp.groupBy(_._1._1)
    val expect = sp.collect {
      case ((pk, sk), qc)
        if 2 * qc * byPart(pk).size > 3 * byPart(pk).values.sum => sk
    }.groupBy(identity).map { case (sk, xs) => sk -> xs.size.toLong }
    val got = graft.queries.RelationalQueries.q20DominantSuppliers(spark, sfDir)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(got == expect)
  }

  test("Q22 shape: no kept customer has an urgent order; threshold is the positive-balance mean") {
    val cust = graft.sources.Tables.customer(spark, sfDir)
      .select(col("c_custkey"), col("c_acctbal"), col("c_mktsegment"))
      .collect().map(r => (r.getLong(0), math.round(r.getDouble(1) * 100), r.getString(2)))
    val urgent = graft.sources.Tables.orders(spark, sfDir)
      .filter(col("o_orderpriority") === "1-URGENT")
      .select(col("o_custkey")).collect().map(_.getLong(0)).toSet
    val pos = cust.map(_._2).filter(_ > 0)
    val kept = cust.filter(c => !urgent(c._1) && c._2 * pos.length > pos.sum)
    val expect = kept.groupBy(_._3).map { case (seg, xs) => seg -> xs.length.toLong }
    val got = graft.queries.RelationalQueries.q22IdleRichCustomers(spark, sfDir)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == expect)
  }

  test("doc chunking: tiling covers every char, stride/width hold, text reassembles") {
    val docs = graft.sources.Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("text")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val chunks = graft.queries.TextQueries.docChunking(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getString(3)))
      .groupBy(_._1)
    docs.filter(_._2.nonEmpty).foreach { case (id, text) =>
      val cs = chunks(id).sortBy(_._2)
      assert(cs.head._3 == 0 && cs.forall(c => c._3 == c._2 * 48))
      assert(cs.forall(c => c._4.length <= 64 && c._4.nonEmpty))
      // every chunk is the exact substring at its offset
      assert(cs.forall(c => text.slice(c._3, c._3 + 64) == c._4))
      // tail coverage: the last chunk reaches the end of the doc
      val last = cs.last
      assert(last._3 + last._4.length == text.length ||
        (text.length <= 64 && cs.length == 1))
      // a doc within one window yields exactly one chunk
      if (text.length <= 64) assert(cs.length == 1)
    }
    assert(chunks.keySet == docs.filter(_._2.nonEmpty).keySet)
  }

  test("Q4 shape: counts match a driver recompute; no order double-counted") {
    import java.time.LocalDateTime
    val lo = LocalDateTime.of(1996, 1, 1, 0, 0)
    val hi = LocalDateTime.of(1996, 4, 1, 0, 0)
    val ord = graft.sources.Tables.orders(spark, sfDir)
      .select(col("o_orderkey"), col("o_orderdate"), col("o_orderpriority"))
      .collect().map(r => (r.getLong(0), r.getAs[LocalDateTime](1), r.getString(2)))
      .filter(o => !o._2.isBefore(lo) && o._2.isBefore(hi))
    val ship = graft.sources.Tables.lineitem(spark, sfDir)
      .select(col("l_orderkey"), col("l_shipdate"))
      .collect().map(r => (r.getLong(0), r.getAs[LocalDateTime](1)))
      .groupBy(_._1)
    val expect = ord
      .filter(o => ship.getOrElse(o._1, Array.empty[(Long, LocalDateTime)])
        .exists(_._2.isAfter(o._2.plusDays(60))))
      .groupBy(_._3).map { case (p, xs) => p -> xs.length.toLong }
    val got = graft.queries.RelationalQueries.q4OrderPriority(spark, sfDir)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == expect)
    // an order with MANY late lines still counts once (semi-join contract)
    assert(got.values.sum == expect.values.sum)
  }

  test("Q6 shape: revenue matches exact cents arithmetic over the filter") {
    import java.time.LocalDateTime
    val lo = LocalDateTime.of(1996, 1, 1, 0, 0)
    val hi = LocalDateTime.of(1997, 1, 1, 0, 0)
    val li = graft.sources.Tables.lineitem(spark, sfDir)
      .select(col("l_shipdate"), col("l_discount"), col("l_quantity"),
        col("l_extendedprice"))
      .collect().map(r => (r.getAs[LocalDateTime](0), r.getDouble(1), r.getDouble(2), r.getDouble(3)))
      .filter(t => !t._1.isBefore(lo) && t._1.isBefore(hi) &&
        t._2 >= 0.05 && t._2 <= 0.07 && t._3 < 24)
    // decimal(18,2) × decimal(18,2) in integer hundredths-of-cents
    val cents = li.map(t =>
      BigInt(math.round(t._4 * 100)) * BigInt(math.round(t._2 * 100))).sum
    val row = graft.queries.RelationalQueries.q6ForecastRevenue(spark, sfDir).collect()(0)
    assert(row.getLong(1) == li.length.toLong)
    assert(math.abs(row.getDouble(0) - (BigDecimal(cents) / 10000).toDouble) < 1e-9)
  }

  test("Q12 shape: high+low counts partition the late lines per flag") {
    val got = graft.queries.RelationalQueries.q12LatePriority(spark, sfDir)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(got.map(_._1).sorted.sameElements(got.map(_._1)))
    import java.time.LocalDateTime
    val lo = LocalDateTime.of(1996, 1, 1, 0, 0)
    val hi = LocalDateTime.of(1997, 1, 1, 0, 0)
    val ordPrio = graft.sources.Tables.orders(spark, sfDir)
      .select(col("o_orderkey"), col("o_orderdate"), col("o_orderpriority"))
      .collect().map(r => r.getLong(0) -> (r.getAs[LocalDateTime](1), r.getString(2))).toMap
    val lines = graft.sources.Tables.lineitem(spark, sfDir)
      .select(col("l_orderkey"), col("l_returnflag"), col("l_shipdate"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getAs[LocalDateTime](2)))
      .filter(t => !t._3.isBefore(lo) && t._3.isBefore(hi) &&
        ordPrio.contains(t._1) &&
        t._3.isAfter(ordPrio(t._1)._1.plusDays(30)))
    val expect = lines.groupBy(_._2).map { case (f, xs) =>
      val hi = xs.count(x => Set("1-URGENT", "2-HIGH")(ordPrio(x._1)._2))
      f -> (hi.toLong, (xs.length - hi).toLong)
    }
    assert(got.map(t => t._1 -> (t._2, t._3)).toMap == expect)
  }

  test("Q10 shape: top-20 deterministic, revenue desc, only returned lines") {
    val rows = graft.queries.RelationalQueries.q10ReturnedItems(spark, sfDir).collect()
    assert(rows.length <= 20 && rows.nonEmpty)
    val rev = rows.map(_.getAs[Double]("revenue"))
    assert(rev.zip(rev.tail).forall { case (a, b) => a >= b })
    // every reported customer really has an 'R' line in the quarter
    val ids = rows.map(_.getAs[Long]("c_custkey")).toSet
    val withR = graft.sources.Tables.lineitem(spark, sfDir)
      .filter(col("l_returnflag") === "R")
      .join(graft.sources.Tables.orders(spark, sfDir),
        col("l_orderkey") === col("o_orderkey"))
      .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
        col("o_orderdate") < lit("1996-04-01").cast("timestamp"))
      .select(col("o_custkey")).collect().map(_.getLong(0)).toSet
    assert(ids.subsetOf(withR))
  }

  // ---- Holt-Winters -----------------------------------------------------

  test("holt-winters: driver bit-replay, constant series degenerates, short keys dropped") {
    val (al, be, ga, m) = (0.3, 0.2, 0.4, 7)
    // driver replay of the exact recurrence on the sf daily series
    val daily = graft.sources.Tables.events(spark, sfDir)
      .groupBy(col("event_type"), date_trunc("day", col("ts")).as("day"))
      .agg(sum(graft.functions.Num.dec2(col("value"))).as("dval"))
      .collect()
      .map(r => (r.getString(0), r.getTimestamp(1), r.getDecimal(2).doubleValue()))
      .groupBy(_._1)
      .map { case (k, rs) => k -> rs.sortBy(_._2.getTime).map(_._3).toVector }
    val got = graft.queries.WarehouseQueries.holtWintersForecast(spark, sfDir)
      .collect()
      .map(r => r.getString(0) ->
        ((r.getInt(1), r.getDouble(2), r.getDouble(3), r.getDouble(5))))
      .toMap
    daily.filter(_._2.length >= 2 * m).foreach { case (k, xs) =>
      var l = xs.take(m).foldLeft(0.0)(_ + _) / m
      var b = (1 to m).foldLeft(0.0)((a, i) => a + (xs(i + m - 1) - xs(i - 1))) / (m * m)
      val s = Array.tabulate(m)(j => xs(j) - l)
      var t = m
      xs.drop(m).foreach { x =>
        t += 1
        val slot = ((t - 1) % m) // 0-based
        val newl = al * (x - s(slot)) + (1.0 - al) * (l + b)
        val newb = be * (newl - l) + (1.0 - be) * b
        val news = ga * (x - newl) + (1.0 - ga) * s(slot)
        l = newl; b = newb; s(slot) = news
      }
      val (np, gl, gb, gf) = got(k)
      assert(np == xs.length)
      assert(gl == l, s"$k level bits diverge")
      assert(gb == b, s"$k trend bits diverge")
      assert(gf == l + b + s(xs.length % m), s"$k forecast bits diverge")
    }
    // constant series: level = const, trend = 0, seasonals = 0
    import spark.implicits._
    val const = (1 to 20).map(t => ("k", t, 5.0)).toDF("k", "t", "v")
    val r = graft.operators.Ewma.holtWinters(
        const, "k", "t", col("v"), al, be, ga, m).collect().head
    assert(r.getDouble(2) == 5.0 && r.getDouble(3) == 0.0 &&
      r.getDouble(5) == 5.0)
    // a key with fewer than 2m periods is dropped by contract
    val short = (1 to 13).map(t => ("s", t, 1.0)).toDF("k", "t", "v")
    assert(graft.operators.Ewma.holtWinters(
      short, "k", "t", col("v"), al, be, ga, m).count() == 0)
  }

  // ---- Pareto skyline ---------------------------------------------------

  test("skyline: hand fixture incl. duplicates and one-dim ties, partition invariance") {
    // (id, x minimize, y maximize). Frontier by hand:
    //   (1, 1.0, 5)  cheapest AND best — dominates everything with y<=5
    //   (4, 2.0, 7)  pricier but higher y
    //   (7, 5.0, 9)  the high end
    // Dominated: 2 (same x as 1, lower y), 3 (worse both), 5 (same y
    // as 4, higher x), 6 (duplicate of 4 with larger id), 8 (worse
    // than 7 on both).
    val pts = Seq(
      (1L, 1.0, 5), (2L, 1.0, 4), (3L, 3.0, 2), (4L, 2.0, 7),
      (5L, 3.0, 7), (6L, 2.0, 7), (7L, 5.0, 9), (8L, 6.0, 8))
      .toDF("id", "x", "y")
    val got = graft.operators.Skyline.paretoFrontier2d(
        pts, col("x"), col("y"), col("id"))
      .select(col("id")).collect().map(_.getLong(0)).toSet
    assert(got == Set(1L, 4L, 7L))
    // brute-force dominance reference over the sf part table
    val parts = graft.sources.Tables.part(spark, sfDir)
      .select(col("p_partkey"), col("p_retailprice"), col("p_size"))
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getInt(2)))
    val expect = parts.filter { case (id, x, y) =>
      !parts.exists { case (eid, ex, ey) =>
        (ex < x && ey >= y) || (ex <= x && ey > y) ||
          (ex == x && ey == y && eid < id) }
    }.map(_._1).toSet
    val gotSf = graft.queries.WarehouseQueries.paretoFrontier(spark, sfDir)
      .collect().map(_.getLong(0)).toSet
    assert(gotSf == expect)
    // partition invariance: the range boundaries must not matter
    val re = graft.operators.Skyline.paretoFrontier2d(
        pts.repartition(7), col("x"), col("y"), col("id"))
      .select(col("id")).collect().map(_.getLong(0)).toSet
    assert(re == got)
  }

  test("scd2 incremental apply ≡ full rebuild; new keys, unchanged attrs, untouched pass-through") {
    import graft.operators.Scd2
    val orders = graft.sources.Tables.orders(spark, sfDir)
    val split = lit(java.sql.Date.valueOf("1996-01-01"))
    val args = (Seq("o_custkey"), Seq("o_orderpriority"), "o_orderdate", "o_orderkey")
    def hist(df: org.apache.spark.sql.DataFrame) =
      Scd2.history(df, args._1, args._2, args._3, args._4)
    val full = hist(orders)
      .orderBy(col("o_custkey"), col("valid_from"), col("o_orderpriority"))
      .collect().toSeq
    val inc = Scd2.applyIncremental(
        hist(orders.filter(col("o_orderdate") < split)),
        orders.filter(col("o_orderdate") >= split),
        args._1, args._2, args._3, args._4)
      .orderBy(col("o_custkey"), col("valid_from"), col("o_orderpriority"))
      .collect().toSeq
    assert(inc == full, "incremental apply must equal the full rebuild")
    // hand fixture: new key opens fresh history; identical attrs open
    // no version; an untouched key's rows pass through bit-identical
    import spark.implicits._
    def d(s: String) = java.sql.Date.valueOf(s)
    val log1 = Seq((1L, "A", d("2024-01-01"), 1L), (1L, "B", d("2024-02-01"), 2L),
      (9L, "Z", d("2024-01-15"), 3L)).toDF("k", "attr", "dt", "tb")
    val batch = Seq((1L, "B", d("2024-03-01"), 4L),  // unchanged attr
      (2L, "C", d("2024-03-02"), 5L))                // brand-new key
      .toDF("k", "attr", "dt", "tb")
    def hist2(df: org.apache.spark.sql.DataFrame) =
      Scd2.history(df, Seq("k"), Seq("attr"), "dt", "tb")
    val got = Scd2.applyIncremental(hist2(log1), batch,
        Seq("k"), Seq("attr"), "dt", "tb")
      .orderBy(col("k"), col("valid_from"))
      .collect().map(r => (r.getLong(0), r.getString(1),
        r.getDate(2).toString, Option(r.getDate(3)).map(_.toString),
        r.getBoolean(4))).toSeq
    assert(got == Seq(
      (1L, "A", "2024-01-01", Some("2024-02-01"), false),
      (1L, "B", "2024-02-01", None, true),           // no new version
      (2L, "C", "2024-03-02", None, true),           // new key
      (9L, "Z", "2024-01-15", None, true)))          // untouched
  }

  // ---- BlockedLinkage (C76 block-size dial) ----------------------------

  /** names crafted so lexicographic sort order inside the block is the
    * id order: rank gaps are computable by eye */
  private def linkRows(blk: String, n: Int, base: Long) =
    (0 until n).map(i => (base + i, f"$blk-name-$i%03d"))

  private def pairsOf(df: org.apache.spark.sql.DataFrame) =
    graft.operators.BlockedLinkage.candidatePairs(
        df, "id", "name", substring(col("name"), 1, 4),
        maxBlock = 4, window = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

  test("blocked linkage: block at the cap is exhaustive, over it is SNM-windowed") {
    // block 'aaaa' has exactly maxBlock=4 rows -> all 6 pairs;
    // block 'bbbb' has 6 > cap rows -> only rank gaps 1..window=2
    val df = (linkRows("aaaa", 4, 10L) ++ linkRows("bbbb", 6, 20L))
      .toDF("id", "name")
    val got = pairsOf(df)
    val exhaustive = (for {
      a <- 10L until 14L; b <- (a + 1) until 14L } yield (a, b)).toSet
    val snm = (for {
      a <- 20L until 26L; b <- (a + 1) to math.min(a + 2, 25L) } yield (a, b)).toSet
    assert(got == exhaustive ++ snm)
    // each pair exactly once (the adjacent-chunk probe must not dup)
    val all = graft.operators.BlockedLinkage.candidatePairs(
        df, "id", "name", substring(col("name"), 1, 4),
        maxBlock = 4, window = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(all.size == all.toSet.size)
  }

  test("blocked linkage: window >= block-1 makes the SNM path exhaustive; partition invariance") {
    val df = linkRows("cccc", 7, 30L).toDF("id", "name")
    val full = (for {
      a <- 30L until 37L; b <- (a + 1) until 37L } yield (a, b)).toSet
    val got = graft.operators.BlockedLinkage.candidatePairs(
        df.repartition(5), "id", "name", substring(col("name"), 1, 4),
        maxBlock = 2, window = 6)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == full)
  }

  test("blocked linkage: values travel with ids and id_a < id_b always") {
    val df = Seq((2L, "dddd-x"), (1L, "dddd-y"), (3L, "dddd-z"))
      .toDF("id", "name")
    val rows = graft.operators.BlockedLinkage.candidatePairs(
        df, "id", "name", substring(col("name"), 1, 4),
        maxBlock = 1, window = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1),
        r.getString(2), r.getString(3)))
    assert(rows.forall { case (a, b, _, _) => a < b })
    val byPair = rows.map(r => (r._1, r._2) -> (r._3, r._4)).toMap
    // sort order is by name: y(1) < x(2) lexicographically? no:
    // "dddd-x" < "dddd-y" < "dddd-z" so ranks are 2,1,3 by id —
    // gaps within window=2 cover all three pairs
    assert(byPair((1L, 2L)) == ("dddd-y", "dddd-x"))
    assert(byPair((2L, 3L)) == ("dddd-x", "dddd-z"))
    assert(byPair((1L, 3L)) == ("dddd-y", "dddd-z"))
  }

  test("blocked linkage: carried attrs equal the join-back attach on both legs") {
    // round-17 optimization: attrs ride THROUGH pair formation instead
    // of a pair-volume join-back. Pin equivalence on a fixture with an
    // exhaustive block AND an SNM block (both orientation paths).
    val df = (linkRows("aaaa", 4, 10L) ++ linkRows("bbbb", 6, 20L))
      .toDF("id", "name")
      .withColumn("tag", concat(lit("t"), col("id")))
    def canon(rows: Array[org.apache.spark.sql.Row]) =
      rows.map(r => (r.getLong(0), r.getLong(1), r.getString(2),
        r.getString(3), r.getString(4), r.getString(5))).toSet
    val carried = canon(graft.operators.BlockedLinkage.candidatePairs(
        df, "id", "name", substring(col("name"), 1, 4),
        maxBlock = 4, window = 2, attrs = Seq("tag"))
      .select(col("id_a"), col("id_b"), col("val_a"), col("val_b"),
        col("tag_a"), col("tag_b")).collect())
    val attach = df.select(col("id"), col("tag"))
    val joined = canon(graft.operators.BlockedLinkage.candidatePairs(
        df, "id", "name", substring(col("name"), 1, 4),
        maxBlock = 4, window = 2)
      .join(attach.select(col("id").as("id_a"), col("tag").as("tag_a")),
        Seq("id_a"))
      .join(attach.select(col("id").as("id_b"), col("tag").as("tag_b")),
        Seq("id_b"))
      .select(col("id_a"), col("id_b"), col("val_a"), col("val_b"),
        col("tag_a"), col("tag_b")).collect())
    assert(carried == joined,
      s"missing=${(joined -- carried).take(3)} extra=${(carried -- joined).take(3)}")
    assert(carried.nonEmpty &&
      carried.forall { case (a, b, _, _, ta, tb) => ta == s"t$a" && tb == s"t$b" })
  }

  test("blocked linkage: SNM recall contract — every gap ≤ window found, incl. chunk-boundary straddlers") {
    // VERDICT r13 item 7: quantify the SNM recall contract in-spec.
    // One oversized block (40 ≫ maxBlock=8), window=5 → chunk
    // boundaries at ranks 5|6, 10|11, … The planted near-dup pair
    // sits EXACTLY astride a boundary (ranks 5 and 6: names differ in
    // the last char only), and the property sweep pins the full
    // contract: a pair is a candidate IFF its rank gap ≤ window — so
    // no boundary can ever hide a near-dup the window promises.
    val df = linkRows("eeee", 40, 100L).toDF("id", "name")
    val window = 5
    val got = graft.operators.BlockedLinkage.candidatePairs(
        df.repartition(7), "id", "name", substring(col("name"), 1, 4),
        maxBlock = 8, window = window)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // ranks = id order by construction; boundary straddler = (rank 5,
    // rank 6) = ids (104, 105), chunks 0 and 1
    assert(got.contains((104L, 105L)), "boundary-straddling near-dup missed")
    val want = (for {
      a <- 100L until 140L
      b <- (a + 1) to math.min(a + window, 139L)
    } yield (a, b)).toSet
    assert(got == want,
      s"SNM candidates must be exactly the gap<=window pairs: " +
        s"missing=${(want -- got).take(5)} extra=${(got -- want).take(5)}")
  }

  test("jaro_winkler_links: capped path with huge cap equals the default result") {
    val a = graft.queries.WarehouseQueries
      .jaroWinklerLinks(spark, sfDir).collect().toSeq
    val b = graft.queries.WarehouseQueries
      .jaroWinklerLinks(spark, sfDir, maxBlock = Int.MaxValue, window = 1)
      .collect().toSeq
    assert(a == b)
  }
}
