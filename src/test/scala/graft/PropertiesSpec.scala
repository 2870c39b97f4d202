package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** Property-based checks: kernel expressions must agree with their
  * composable (built-in-function) twins and with driver-side scala
  * references on arbitrary generated inputs — not just the testdata
  * corpus. (scalatestplus isn't in the offline cache, so generators
  * are sampled with fixed seeds — deterministic across runs.)
  */
class PropertiesSpec extends AnyFunSuite {
  import SparkTestSession._
  import spark.implicits._

  /** Deterministic sampling: n draws with seeds 0..n-1. */
  private def forAll[A](g: Gen[A], n: Int = 6)(body: A => Unit): Unit =
    (0 until n).foreach { i =>
      g.apply(Gen.Parameters.default, Seed(i.toLong)).foreach(body)
    }
  private def forAll2[A, B](ga: Gen[A], gb: Gen[B], n: Int = 6)(body: (A, B) => Unit): Unit =
    (0 until n).foreach { i =>
      for {
        a <- ga.apply(Gen.Parameters.default, Seed(i.toLong))
        b <- gb.apply(Gen.Parameters.default, Seed((i + 1000).toLong))
      } body(a, b)
    }

  private val word = Gen.nonEmptyListOf(Gen.alphaLowerChar).map(_.mkString)
  private val text = Gen.listOf(word).map(_.mkString(" "))
  private val texts = Gen.listOfN(24, text)

  test("WordShingles kernel == split+transform HOF formulation") {
    forAll(texts) { ts =>
      if (ts.nonEmpty) {
        val df = ts.toDF("text")
        val kernel = df.select(
          graft.functions.ShingleFunctions.word_shingles(col("text"), 3))
          .collect().map(_.getSeq[String](0).toList).toList
        val hof = df.select(graft.functions.TextFunctions.shingles(
          graft.functions.TextFunctions.tokens(col("text")), 3))
          .collect().map(_.getSeq[String](0).toList).toList
        assert(kernel == hof)
      }
    }
  }

  test("LM CE kernels == HOF folds bit-for-bit, quirky whitespace included") {
    import graft.operators.LanguageModel
    // hand corpus with vocab overlap + OOV + adversarial whitespace:
    // leading tab (the split-keeps-a-leading-empty-token quirk),
    // internal runs, trailing spaces, empty, null
    val corpus = Seq(
      "the cat sat on the mat", "the cat the cat", "zzz yyy the",
      "\tthe cat", "  the   cat  ", "", "the",
      // trailing non-space whitespace: split(limit -1) KEEPS the
      // trailing empty token — the regression the kernels once had
      "the cat\t", "the cat\n ", "\t", "\tthe\t")
      .toDF("text")
    val probes = (corpus.collect().map(_.getString(0)) :+ null)
      .toSeq.toDF("text")
    val uni = LanguageModel.train(corpus, "text", topK = 4)
    val bi = LanguageModel.trainBigram(corpus, "text", topK = 4)
    val got = probes.select(
        LanguageModel.crossEntropy(col("text"), uni).as("u"),
        LanguageModel.crossEntropyBigram(col("text"), bi).as("b"))
      .collect().map(r => (r.getDouble(0), r.getDouble(1))).toList
    val want = probes.select(
        LanguageModel.crossEntropyHof(col("text"), uni).as("u"),
        LanguageModel.crossEntropyBigramHof(col("text"), bi).as("b"))
      .collect().map(r => (r.getDouble(0), r.getDouble(1))).toList
    assert(got == want, s"kernel vs HOF:\n$got\n$want")
    // property sweep on random texts
    forAll(texts) { ts =>
      if (ts.nonEmpty) {
        val df = ts.toDF("text")
        val u2 = LanguageModel.train(df, "text", topK = 8)
        val b2 = LanguageModel.trainBigram(df, "text", topK = 8)
        val k = df.select(
            LanguageModel.crossEntropy(col("text"), u2),
            LanguageModel.crossEntropyBigram(col("text"), b2))
          .collect().map(r => (r.getDouble(0), r.getDouble(1))).toList
        val h = df.select(
            LanguageModel.crossEntropyHof(col("text"), u2),
            LanguageModel.crossEntropyBigramHof(col("text"), b2))
          .collect().map(r => (r.getDouble(0), r.getDouble(1))).toList
        assert(k == h)
      }
    }
  }

  test("SimHash64 kernel == HOF vote formulation (same xxhash64 seed)") {
    forAll(texts) { ts =>
      if (ts.nonEmpty) {
        val df = ts.toDF("text")
        val toks = graft.functions.TextFunctions.tokens(col("text"))
        val kernel = df.select(graft.functions.GraftFunctions.simhash64(toks))
          .collect().map(_.getLong(0)).toList
        // HOF twin (the original formulation, kept in VectorFunctions
        // style): per-token hash votes per bit
        val votes = aggregate(toks, array_repeat(lit(0), 64),
          (acc, t) => zip_with(acc,
            transform(sequence(lit(0), lit(63)), j =>
              when(call_function("shiftright", xxhash64(t), j)
                .bitwiseAND(1) === 1, 1).otherwise(-1)),
            (a, v) => a + v))
        val hof = df.select(aggregate(
            zip_with(votes, sequence(lit(0), lit(63)),
              (v, j) => when(v > 0, call_function("shiftleft", lit(1L), j))
                .otherwise(lit(0L))),
            lit(0L), (acc, x) => acc.bitwiseOR(x)))
          .collect().map(_.getLong(0)).toList
        assert(kernel == hof)
      }
    }
  }

  test("VecCosine kernel == HOF zip_with/aggregate formulation bit-for-bit") {
    val vec = Gen.listOfN(16, Gen.chooseNum(-10.0f, 10.0f))
    forAll(Gen.listOfN(8, Gen.zip(vec, vec))) { pairs =>
      if (pairs.nonEmpty) {
        val df = pairs.map { case (a, b) => (a, b) }.toDF("a", "b")
          .select(col("a").cast("array<float>").as("a"),
            col("b").cast("array<float>").as("b"))
        val kernel = df.select(
          graft.functions.GraftFunctions.vec_cosine(col("a"), col("b")))
          .collect().map(_.getDouble(0)).toList
        val hof = df.select(
          graft.functions.VectorFunctions.cosine(col("a"), col("b")))
          .collect().map(_.getDouble(0)).toList
        assert(kernel == hof)
      }
    }
  }

  test("Scd2.applyIncremental == full rebuild on random logs at any strictly-later split") {
    import graft.operators.Scd2
    // random change logs: few keys + few attr values force real
    // version churn, duplicate dates per key exercise the tiebreak
    val rowGen = for {
      k <- Gen.choose(1L, 4L)
      a <- Gen.oneOf("A", "B", "C")
      d <- Gen.choose(1, 60)
    } yield (k, a, d)
    val logGen = Gen.listOfN(40, rowGen)
    forAll2(logGen, Gen.choose(2, 59), n = 8) { (rows, split) =>
      val df = rows.zipWithIndex.map { case ((k, a, d), i) =>
        (k, a, java.sql.Date.valueOf(java.time.LocalDate.of(2024, 1, 1)
          .plusDays(d.toLong)), i.toLong)
      }.toDF("k", "attr", "dt", "tb")
      val cut = java.sql.Date.valueOf(java.time.LocalDate.of(2024, 1, 1)
        .plusDays(split.toLong))
      def sorted(d: org.apache.spark.sql.DataFrame) =
        d.orderBy(col("k"), col("valid_from"), col("attr")).collect().toSeq
      val full = sorted(Scd2.history(df, Seq("k"), Seq("attr"), "dt", "tb"))
      val inc = sorted(Scd2.applyIncremental(
        Scd2.history(df.filter(col("dt") < lit(cut)),
          Seq("k"), Seq("attr"), "dt", "tb"),
        df.filter(col("dt") >= lit(cut)),
        Seq("k"), Seq("attr"), "dt", "tb"))
      assert(inc == full, s"split=$split rows=$rows")
    }
  }

  test("Upsert.keepLatest is idempotent and keeps the max version") {
    val rows = Gen.listOfN(60,
      Gen.zip(Gen.chooseNum(0L, 9L), Gen.chooseNum(0L, 20L), Gen.alphaStr))
    forAll(rows) { rs =>
      if (rs.nonEmpty) {
        val df = rs.toDF("k", "v", "payload")
        val once = graft.operators.Upsert.keepLatest(df, Seq("k"), col("v"),
          Seq(col("payload")))
        val twice = graft.operators.Upsert.keepLatest(once, Seq("k"), col("v"),
          Seq(col("payload")))
        val got = once.collect().map(r => (r.getLong(0), r.getLong(1))).toMap
        val expect = rs.groupBy(_._1).map { case (k, g) => (k, g.map(_._2).max) }
        assert(got == expect)
        assert(twice.collect().toSet == once.collect().toSet)
      }
    }
  }

  test("TopKPerGroup custom operator == window row_number formulation") {
    val rows = Gen.listOfN(80,
      Gen.zip(Gen.chooseNum(0L, 7L), Gen.chooseNum(0L, 1000L)))
    forAll2(rows, Gen.chooseNum(1, 5)) { (rs, k) =>
      if (rs.nonEmpty) {
        // make (grp, v) unique so the order is total
        val uniq = rs.distinct
        val df = uniq.toDF("grp", "v")
        val custom = graft.plans.TopKPerGroup(df, Seq("grp"),
            Seq("v" -> false), k)
          .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
        import org.apache.spark.sql.expressions.Window
        val w = Window.partitionBy(col("grp")).orderBy(col("v").desc)
        val win = df.withColumn("rk", row_number().over(w))
          .filter(col("rk") <= k)
          .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
        assert(custom == win)
      }
    }
  }

  test("RollingFingerprint == scala reference on arbitrary ASCII") {
    forAll(Gen.listOfN(12, Gen.asciiPrintableStr)) { ss =>
      if (ss.nonEmpty) {
        val df = ss.toDF("s")
        val got = df.select(
          graft.functions.Fingerprint.rolling_fingerprint(col("s")))
          .collect().map(_.getLong(0)).toList
        val want = ss.map { str =>
          var h = 0L
          str.getBytes("UTF-8").foreach(b => h = (h * 31 + (b & 0xff)) % 1000000007L)
          h
        }
        assert(got == want)
      }
    }
  }

  private val edgeList: Gen[List[(Long, Long)]] = for {
    n <- Gen.choose(2, 40)
    m <- Gen.choose(0, 60)
    edges <- Gen.listOfN(m, for {
      a <- Gen.choose(0L, n - 1L); b <- Gen.choose(0L, n - 1L) if a != b
    } yield (math.min(a, b), math.max(a, b)))
  } yield edges

  test("connectedComponents == driver-side union-find on random graphs") {
    forAll(edgeList, n = 8) { edges =>
      val nodeIds = (edges.flatMap(e => Seq(e._1, e._2)) ++ (0L to 5L)).distinct
      // driver reference: union-find with path compression
      val parent = scala.collection.mutable.Map(nodeIds.map(i => i -> i): _*)
      def find(x: Long): Long = {
        var r = x
        while (parent(r) != r) r = parent(r)
        var c = x
        while (parent(c) != r) { val nxt = parent(c); parent(c) = r; c = nxt }
        r
      }
      edges.foreach { case (a, b) =>
        val (ra, rb) = (find(a), find(b))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      // canonical = component MIN: root by construction (always union
      // the larger root under the smaller)
      val want = nodeIds.map(i => i -> find(i)).toMap
      val edgesDf =
        if (edges.isEmpty) Seq.empty[(Long, Long)].toDF("id_a", "id_b")
        else edges.toDF("id_a", "id_b")
      val got = graft.operators.Dedup
        .connectedComponents(edgesDf, nodeIds.toDF("id"), maxIters = 30)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got == want, s"labels diverge for edges $edges")
    }
  }

  test("RankTopK == window rank() formulation on tie-heavy random data") {
    import org.apache.spark.sql.expressions.Window
    val rows: Gen[List[(Long, Long, Long)]] = Gen.listOfN(60, for {
      g <- Gen.choose(0L, 4L)      // few groups
      v <- Gen.choose(0L, 5L)      // few values → many ties
      id <- Gen.choose(0L, 1000L)
    } yield (g, v, id))
    forAll(rows, n = 8) { data =>
      if (data.nonEmpty) {
        val df = data.toDF("g", "v", "id")
        val got = graft.plans.RankTopK(df, Seq("g"), Seq("v" -> false), k = 3)
          .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getInt(3)))
          .sorted.toSeq
        val w = Window.partitionBy(col("g")).orderBy(col("v").desc)
        val want = df.withColumn("rk", rank().over(w)).filter(col("rk") <= 3)
          .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getInt(3)))
          .sorted.toSeq
        assert(got == want, s"rank-k diverges on $data")
      }
    }
  }

  test("DenseRankTopK == window dense_rank() formulation on tie-heavy random data") {
    import org.apache.spark.sql.expressions.Window
    val rows: Gen[List[(Long, Long, Long)]] = Gen.listOfN(60, for {
      g <- Gen.choose(0L, 4L)      // few groups
      v <- Gen.choose(0L, 5L)      // few values → many ties
      id <- Gen.choose(0L, 1000L)
    } yield (g, v, id))
    forAll(rows, n = 8) { data =>
      if (data.nonEmpty) {
        val df = data.toDF("g", "v", "id")
        val got = graft.plans.DenseRankTopK(df, Seq("g"), Seq("v" -> false), k = 3)
          .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getInt(3)))
          .sorted.toSeq
        // reference must be the genuine window plan, not the rewrite
        val prev = spark.experimental.extraOptimizations
        spark.experimental.extraOptimizations =
          prev.filterNot(_ == graft.plans.TopKRewrite)
        val want = try {
          val w = Window.partitionBy(col("g")).orderBy(col("v").desc)
          df.withColumn("rk", dense_rank().over(w)).filter(col("rk") <= 3)
            .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getInt(3)))
            .sorted.toSeq
        } finally spark.experimental.extraOptimizations = prev
        assert(got == want, s"dense-rank-k diverges on $data")
      }
    }
  }

  test("RangeJoin == naive nested-loop containment on random intervals") {
    val scenario: Gen[(List[Long], List[(Long, Long)])] = for {
      points <- Gen.listOfN(30, Gen.choose(0L, 2000L))
      ivs <- Gen.listOfN(8, for {
        lo <- Gen.choose(0L, 1800L); len <- Gen.choose(1L, 400L)
      } yield (lo, lo + len))
    } yield (points, ivs)
    forAll(scenario, n = 8) { case (points, ivs) =>
      val base = java.sql.Timestamp.valueOf("2024-01-01 00:00:00").getTime
      def ts(s: Long) = new java.sql.Timestamp(base + s * 1000L)
      val p = points.zipWithIndex.map { case (s, i) => (i.toLong, ts(s)) }
        .toDF("pid", "pt")
      val iv = ivs.zipWithIndex.map { case ((lo, hi), i) => (i.toLong, ts(lo), ts(hi)) }
        .toDF("ivid", "lo", "hi")
      val got = graft.operators.RangeJoin
        .pointInInterval(p, iv, col("pt"), col("lo"), col("hi"), bucketSeconds = 60)
        .select(col("pid"), col("ivid"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val want = (for {
        (s, i) <- points.zipWithIndex
        ((lo, hi), j) <- ivs.zipWithIndex if s >= lo && s < hi
      } yield (i.toLong, j.toLong)).toSet
      assert(got == want, s"containment diverges: points=$points ivs=$ivs")
    }
  }

  test("z-interleave: monotone in each dimension, bijective on bucket tuples") {
    import graft.sources.ZOrder
    val gBuckets = Gen.listOfN(24, Gen.zip(
      Gen.choose(0L, 65535L), Gen.choose(0L, 65535L)))
    forAll(gBuckets) { pairs =>
      val df = pairs.toDF("a", "b")
        .select(col("a"), col("b"),
          ZOrder.interleave(Seq(col("a"), col("b"))).as("z"))
      val rows = df.collect().map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2)))
      rows.foreach { case (_, z) => assert(z >= 0, "z must never reach the sign bit") }
      // bijective: equal z ⇔ equal bucket tuple
      rows.groupBy(_._2).foreach { case (_, g) =>
        assert(g.map(_._1).distinct.length == 1,
          "two distinct bucket tuples interleaved to the same z")
      }
      // monotone per dimension with the other fixed
      for (((a1, b1), z1) <- rows; ((a2, b2), z2) <- rows) {
        if (a1 == a2 && b1 < b2) assert(z1 < z2, s"z not monotone in b at a=$a1")
        if (b1 == b2 && a1 < a2) assert(z1 < z2, s"z not monotone in a at b=$b1")
      }
    }
  }

  test("splitByHash: partition of the id space for arbitrary positive weights") {
    val gWeights = Gen.choose(1, 4).flatMap(k =>
      Gen.listOfN(k, Gen.choose(0.05, 10.0)))
    forAll(gWeights, n = 4) { weights =>
      val ids = (0L until 400L).toDF("id")
      val out = graft.operators.Resample
        .splitByHash(ids, col("id"), weights)
        .select(col("id"), col("split"))
        .collect().map(r => (r.getLong(0), r.getInt(1)))
      assert(out.length == 400, "complete: every id assigned exactly once")
      assert(out.forall { case (_, s) => s >= 0 && s < weights.size })
      // every split with meaningful weight share is non-empty at n=400
      val total = weights.sum
      val counts = out.groupBy(_._2).view.mapValues(_.size).toMap
      weights.zipWithIndex.foreach { case (w, i) =>
        if (w / total > 0.05)
          assert(counts.getOrElse(i, 0) > 0, s"split $i (share ${w / total}) empty")
      }
    }
  }

  test("stripRepeatedSpans == scala reference on random small-vocab corpora") {
    // small vocabulary forces genuine cross-doc gram repetition
    val smallWord = Gen.oneOf("a", "b", "c", "d", "e")
    val smallText = Gen.choose(0, 14)
      .flatMap(k => Gen.listOfN(k, smallWord)).map(_.mkString(" "))
    val corpus = Gen.listOfN(12, smallText)
    forAll2(corpus, Gen.choose(2, 4), n = 5) { (ts, span) =>
      val rows = ts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      val df = rows.toDF("doc_id", "text")
      val got = graft.operators.Dedup
        .stripRepeatedSpans(df, "text", "doc_id", n = span, minCount = 2)
        .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getInt(2)))).toMap
      val toks = rows.map { case (id, t) => id -> t.trim.split("\\s+").toSeq }
      val counts = toks.flatMap(_._2.sliding(span).filter(_.length == span)
        .map(_.mkString(" "))).groupBy(identity).view.mapValues(_.size).toMap
      val hot = counts.collect { case (g, c) if c >= 2 => g }.toSet
      toks.foreach { case (id, tk) =>
        val covered = tk.sliding(span).zipWithIndex
          .collect { case (w, i) if w.length == span && hot(w.mkString(" ")) =>
            i until i + span }
          .flatten.toSet
        val clean = tk.zipWithIndex.collect { case (t, i) if !covered(i) => t }
        assert(got(id) == ((clean.mkString(" "), tk.length - clean.length)),
          s"doc $id diverges for span=$span corpus=$ts")
      }
    }
  }

  test("Pack.concatChunk: contiguous offsets, budget-aligned shards, permutation-safe") {
    val gCounts = Gen.listOfN(40, Gen.choose(1, 300))
    val gBudget = Gen.choose(64L, 1024L)
    forAll2(gCounts, gBudget, n = 5) { (ns, budget) =>
      val rows = ns.zipWithIndex.map { case (n, i) => (i.toLong, n) }
      // shuffled input order must not change the layout (window sorts)
      val df = scala.util.Random.javaRandomToRandom(new java.util.Random(7))
        .shuffle(rows).toDF("doc_id", "n")
      val out = graft.operators.Pack.concatChunk(df,
          col("doc_id"), col("n"), pmod(col("doc_id"), lit(4)), budget)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2),
          r.getLong(3), r.getLong(4)))
      val byBucket = out.groupBy(_._2)
      byBucket.foreach { case (b, ds) =>
        val sorted = ds.sortBy(_._1)
        var off = 0L
        sorted.foreach { case (id, _, n, start, shard) =>
          assert(start == off, s"bucket $b doc $id: offset $start != $off")
          assert(shard == start / budget)
          assert(id % 4 == b)
          off += n
        }
      }
      assert(out.length == rows.length)
    }
  }

  test("StratifiedTopQuota == row_number window twin on arbitrary strata/quotas") {
    import org.apache.spark.sql.expressions.Window
    val gRows = Gen.listOfN(80, for {
      s <- Gen.oneOf("a", "b", "c", "d")
      v <- Gen.choose(-50L, 50L)
    } yield (s, v))
    // quotas exercise the edge cases: 0, tiny, ~half, and > stratum
    // size; stratum "d" is deliberately ABSENT (must keep nothing)
    val gQuotas = for {
      qa <- Gen.choose(0L, 100L)
      qb <- Gen.choose(0L, 10L)
      qc <- Gen.oneOf(0L, 1L, 1000L)
    } yield Seq(("a", qa), ("b", qb), ("c", qc))
    forAll2(gRows, gQuotas, n = 6) { (rows, qs) =>
      val df = rows.zipWithIndex
        .map { case ((s, v), i) => (s, v, i.toLong) }
        .toDF("s", "v", "id")
      val quotas = qs.toDF("__stratum", "__quota")
      val got = graft.operators.StratifiedTopQuota.markKept(df,
          stratum = col("s"),
          ord = Seq(col("v"), col("id")),
          // a coarse, collision-heavy monotone bucketing of v
          coarse = floor(col("v") / lit(7.0)),
          quotas = broadcast(quotas))
        .collect().map(r => (r.getLong(2), r.getBoolean(3))).toMap
      val w = Window.partitionBy(col("s")).orderBy(col("v").asc, col("id").asc)
      val want = df.withColumn("__rk", row_number().over(w))
        .join(broadcast(quotas), col("s") === col("__stratum"), "left")
        .withColumn("kept",
          col("__quota").isNotNull && col("__rk") <= col("__quota"))
        .collect().map(r => (r.getLong(2), r.getBoolean(6))).toMap
      assert(got == want,
        s"diff=${got.toSet.diff(want.toSet).take(5)} quotas=$qs")
    }
  }
}
