package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.SkewJoin
import graft.sources.Tables

class OperatorsSpec extends AnyFunSuite {
  import SparkTestSession._

  test("unigram LM: cross-entropy matches a driver reference, OOV and empty docs handled") {
    import spark.implicits._
    import graft.operators.LanguageModel
    val docs = Seq(
      (1L, "the cat sat on the mat"),
      (2L, "the the the the"),          // most predictable
      (3L, "zyx wvu tsr"),              // mostly OOV at topK=4 → highest H
      (4L, ""),                         // token-less
      (5L, "the cat zyx"))              // mixed
      .toDF("doc_id", "text")
    val topK = 4
    // driver reference, same model definition
    val words = Seq(1L -> "the cat sat on the mat", 2L -> "the the the the",
      3L -> "zyx wvu tsr", 5L -> "the cat zyx")
      .flatMap(_._2.split("\\s+"))
    val cnt = words.groupBy(identity).view.mapValues(_.size).toMap
    val vocab = cnt.toSeq.sortBy { case (w, c) => (-c, w) }.take(topK)
    val d = (words.size + vocab.size + 1).toDouble
    val lnP = vocab.map { case (w, c) => w -> math.log((c + 1) / d) }.toMap
    val lnOov = math.log(1 / d)
    def ref(text: String): (Int, Double) = {
      val ts = text.split("\\s+").filter(_.nonEmpty)
      if (ts.isEmpty) (0, 0.0)
      else (ts.length, BigDecimal(-ts.map(w => lnP.getOrElse(w, lnOov)).sum / ts.length)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    }
    val want = Seq(1L, 2L, 3L, 4L, 5L).map(i =>
      (i, ref(Seq("the cat sat on the mat", "the the the the", "zyx wvu tsr",
        "", "the cat zyx")(i.toInt - 1)))).map { case (i, (n, h)) => (i, n, h) }.toSet
    val got = LanguageModel.scoreCorpus(docs, "text", "doc_id", topK)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getDouble(2))).toSet
    assert(got == want, s"extra=${got -- want} missing=${want -- got}")
    // the quality ordering the score exists for
    val byId = got.map(t => t._1 -> t._3).toMap
    assert(byId(2L) < byId(1L) && byId(1L) < byId(3L),
      s"repetitive < natural < gibberish expected, got $byId")

    // a token-less corpus trains a degenerate (all-OOV) model and
    // still scores every doc with the 0.0 sentinel instead of throwing
    val empties = Seq((1L, ""), (2L, "   ")).toDF("doc_id", "text")
    val degens = LanguageModel.scoreCorpus(empties, "text", "doc_id", topK)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getDouble(2))).toSet
    assert(degens == Set((1L, 0, 0.0), (2L, 0, 0.0)))
  }

  test("quality classifier: log-odds model and margins match a driver reference") {
    import spark.implicits._
    import graft.operators.QualityClassifier
    val docs = Seq(
      (1L, "good clean prose text", true),
      (2L, "good good prose", true),
      (3L, "spam spam click here", false),
      (4L, "click spam now", false),
      (5L, "", false),                       // token-less → bare bias
      (6L, "good spam mystery", false))      // mixed + OOV at topV=4
      .toDF("doc_id", "text", "pos")
    val topV = 4
    // driver reference, same closed form
    val toks = docs.collect().map(r =>
      (r.getString(1).split("\\s+").filter(_.nonEmpty), r.getBoolean(2)))
    val all = toks.flatMap { case (ws, p) => ws.map(_ -> p) }
    val cnt = all.groupBy(_._1).view
      .mapValues(xs => (xs.length.toLong, xs.count(_._2).toLong)).toMap
    val vocab = cnt.toSeq.sortBy { case (w, (c, _)) => (-c, w) }.take(topV)
    val np = all.count(_._2).toLong; val nn = all.length - np
    val denP = (np + vocab.length + 1).toDouble
    val denN = (nn + vocab.length + 1).toDouble
    val wts = vocab.map { case (w, (c, cp)) =>
      w -> (math.log((cp + 1) / denP) - math.log((c - cp + 1) / denN)) }.toMap
    val oov = math.log(1 / denP) - math.log(1 / denN)
    val bias = math.log(2 + 1.0) - math.log(4 + 1.0)   // 2 pos, 4 neg docs
    def ref(text: String): Double = {
      val ts = text.split("\\s+").filter(_.nonEmpty)
      BigDecimal(ts.foldLeft(bias)((a, w) => a + wts.getOrElse(w, oov)))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    val m = QualityClassifier.train(docs, "text", col("pos"), topV)
    assert(m.weights == wts && m.oov == oov && m.bias == bias)
    // curated-class words carry positive weight, spam words negative
    assert(m.weights("good") > 0 && m.weights("spam") < 0)
    val got = QualityClassifier.scoreCorpus(docs, "text", "doc_id",
        col("pos"), topV)
      .collect()
      .map(r => r.getLong(0) -> ((r.getDouble(2), r.getBoolean(3)))).toMap
    val texts = Map(1L -> "good clean prose text", 2L -> "good good prose",
      3L -> "spam spam click here", 4L -> "click spam now", 5L -> "",
      6L -> "good spam mystery")
    texts.foreach { case (id, t) =>
      assert(got(id) == ((ref(t), ref(t) > 0)), s"doc $id") }
    // the separation the classifier exists for
    assert(got(2L)._1 > got(3L)._1)
  }

  test("bigram LM: backoff fold matches a driver reference") {
    import spark.implicits._
    import graft.operators.LanguageModel
    val fixture = Seq(
      1L -> "the cat sat on the mat",
      2L -> "the cat the cat the cat",
      3L -> "mat on sat zzz",
      4L -> "")
    val docs = fixture.toDF("doc_id", "text")
    val topK = 4
    val lm = LanguageModel.trainBigram(docs, "text", topK)
    // driver reference walking the same branches
    def ref(text: String): (Int, Double) = {
      val ts = text.split("\\s+").filter(_.nonEmpty)
      if (ts.isEmpty) return (0, 0.0)
      var prev = ""
      var sum = 0.0
      ts.foreach { w =>
        val uni = lm.uni.lnP.getOrElse(w, lm.uni.lnOov)
        val lnS =
          if (prev == "") uni
          else lm.lnPair.getOrElse(s"$prev $w", lm.lnAlpha + uni)
        sum += lnS
        prev = w
      }
      (ts.length, BigDecimal(-sum / ts.length)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    }
    val want = fixture.map { case (id, t) =>
      val (n, h) = ref(t); (id, n, h) }.toSet
    val got = LanguageModel.scoreCorpusBigram(docs, "text", "doc_id", topK)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getDouble(2))).toSet
    assert(got == want, s"extra=${got -- want} missing=${want -- got}")
    // the seen-pair branch actually fired (doc 2's "the cat" repeats)
    assert(lm.lnPair.nonEmpty && lm.lnPair.contains("the cat"))
  }

  test("KN LM: interpolated fold matches an independent driver reference") {
    import spark.implicits._
    import graft.operators.LanguageModel
    val fixture = Seq(
      1L -> "the cat sat on the mat",
      2L -> "the cat the cat the cat",
      3L -> "mat on sat zzz",
      4L -> "")
    val docs = fixture.toDF("doc_id", "text")
    val topK = 4
    val lm = LanguageModel.trainKneserNey(docs, "text", topK)
    // independent reference: recount everything from the fixture
    val vocab = fixture.flatMap(_._2.split("\\s+").filter(_.nonEmpty))
      .groupBy(identity).view.mapValues(_.size).toSeq
      .sortBy { case (w, c) => (-c, w) }.take(topK).map(_._1).toSet
    val pairCounts = fixture.flatMap { case (_, t) =>
      val ts = t.split("\\s+").filter(_.nonEmpty)
      ts.zip(ts.drop(1)).filter { case (v, w) => vocab(v) && vocab(w) }
    }.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val ctx = pairCounts.groupBy(_._1._1).map { case (v, ps) =>
      v -> (ps.values.sum, ps.size) }
    val n1b = pairCounts.groupBy(_._1._2).view.mapValues(_.size).toMap
    val denom = (pairCounts.size + vocab.size + 1).toDouble
    def base(w: String) = (n1b.getOrElse(w, 0) + 1).toDouble / denom
    def ref(text: String): (Int, Double) = {
      val ts = text.split("\\s+").filter(_.nonEmpty)
      if (ts.isEmpty) return (0, 0.0)
      var prev = ""
      var sum = 0.0
      ts.foreach { w =>
        val lnS =
          if (prev == "" || !ctx.contains(prev)) math.log(base(w))
          else pairCounts.get((prev, w)) match {
            case Some(c) =>
              val (cv, n1) = ctx(prev)
              math.log((c.toDouble - 0.75) / cv.toDouble +
                (0.75 * n1.toDouble / cv.toDouble) * base(w))
            case None =>
              val (cv, n1) = ctx(prev)
              math.log(0.75 * n1.toDouble / cv.toDouble) + math.log(base(w))
          }
        sum += lnS
        prev = w
      }
      (ts.length, BigDecimal(-sum / ts.length)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    }
    val want = fixture.map { case (id, t) =>
      val (n, h) = ref(t); (id, n, h) }.toSet
    val got = LanguageModel.scoreCorpusKn(docs, "text", "doc_id", topK)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getDouble(2))).toSet
    assert(got == want, s"extra=${got -- want} missing=${want -- got}")
    // the continuation signal is live: "the" precedes two distinct
    // words, "cat" follows only one context
    assert(lm.pairKeys.nonEmpty && lm.lambdaKeys.contains("the"))
    // KN must genuinely differ from stupid backoff on this fixture
    val sb = LanguageModel.scoreCorpusBigram(docs, "text", "doc_id", topK)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    val kn = got.map(t => t._1 -> t._3).toMap
    assert(fixture.exists { case (id, t) => t.nonEmpty && sb(id) != kn(id) })
  }

  test("period pivot: null periods never rank, n is guarded, pivot is exact") {
    import spark.implicits._
    import graft.operators.PeriodPivot
    val df = Seq(
      (1L, Some("2024-03"), 10), (1L, Some("2024-02"), 20),
      (1L, Some("2024-01"), 30), (1L, None, 99),
      (2L, Some("2024-03"), 5), (2L, None, 88))
      .toDF("entity", "period", "v")
    // contract: null periods are dropped before ranking — they can
    // never occupy one of the trailing-n slots
    val ranked = PeriodPivot.rankPeriods(df, "period", 2)
      .collect().map(r => (r.getString(0), r.getInt(1))).toSeq.sortBy(_._2)
    assert(ranked == Seq(("2024-03", 1), ("2024-02", 2)),
      s"null period must not rank, got $ranked")
    val piv = PeriodPivot.lastPeriods(df, "entity", "period", col("v"),
        2, i => s"p$i")
      .collect().map(r => r.getLong(0) ->
        ((Option(r.get(1)), Option(r.get(2))))).toMap
    assert(piv == Map(
      1L -> ((Some(10), Some(20))),
      2L -> ((Some(5), None))),
      s"pivot mismatch: $piv")
    assertThrows[IllegalArgumentException] {
      PeriodPivot.rankPeriods(df, "period", -1)
    }
    assert(PeriodPivot.rankPeriods(df, "period", 0).count() == 0L)
  }

  test("kll lake column: merged per-day sketches hit exact ranks within bound, survive parquet") {
    import graft.functions.KllFunctions._
    val qs = Seq(0.25, 0.5, 0.9, 0.99)
    val exact = Tables.events(spark, sfDir).select(col("value").cast("double"))
      .collect().map(_.getDouble(0)).sorted
    def rankOf(v: Double): Double = {
      val below = exact.count(_ <= v)
      below.toDouble / exact.length
    }
    val daily = Tables.events(spark, sfDir)
      .groupBy(date_trunc("day", col("ts")).as("day"))
      .agg(kll_sketch_agg(col("value").cast("double")).as("sk"))
    def mergedQuantiles(df: org.apache.spark.sql.DataFrame): Seq[Double] =
      df.agg(kll_quantiles(kll_merge_agg(col("sk")),
          array(qs.map(lit): _*)).as("qv"))
        .head().getSeq[Double](0)
    val got = mergedQuantiles(daily)
    // k=200 ⇒ ~1.65% normalized rank error; 3% keeps the spec stable
    qs.zip(got).foreach { case (q, v) =>
      assert(math.abs(rankOf(v) - q) <= 0.03,
        s"quantile $q -> $v has rank ${rankOf(v)}, outside the KLL bound")
    }
    // the sketch column is a persistable lake column: parquet
    // round-trip must keep it mergeable with the same guarantees
    val dir = Files.createTempDirectory("kll_lake").toString
    daily.write.mode("overwrite").parquet(dir)
    val rt = mergedQuantiles(spark.read.parquet(dir))
    qs.zip(rt).foreach { case (q, v) =>
      assert(math.abs(rankOf(v) - q) <= 0.03,
        s"round-trip quantile $q -> $v outside the KLL bound")
    }
    // SQL face via GraftExtensions
    GraftExtensions.registerAll(spark)
    daily.createOrReplaceTempView("kll_daily")
    val sqlQ = spark.sql(
      "SELECT kll_quantiles(kll_merge_agg(sk), array(0.5D)) FROM kll_daily")
      .head().getSeq[Double](0)
    assert(math.abs(rankOf(sqlQ.head) - 0.5) <= 0.03)
  }

  test("sequence packing: per-bucket streams are contiguous, shards cut at the budget") {
    val budget = 512L
    val docs = Tables.documents(spark, sfDir)
    val got = graft.operators.Pack.concatChunk(docs,
        col("doc_id"), graft.functions.TextFunctions.tokenCount(col("text")),
        pmod(col("doc_id"), lit(8)), budget)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getLong(3), r.getLong(4)))
    // exact reference: sequential layout per bucket in id order
    val ref = got.map { case (id, _, n, _, _) => (id, n) }.sortBy(_._1)
      .groupBy { case (id, _) => id % 8 }
      .flatMap { case (b, ds) =>
        var off = 0L
        ds.map { case (id, n) =>
          val r = (id, b, n, off, off / budget); off += n; r
        }.toSeq
      }.toSet
    assert(got.toSet == ref)
    assert(got.map(_._5).max >= 1, "corpus should span multiple shards")
    // deterministic under re-evaluation
    val again = graft.operators.Pack.concatChunk(docs,
        col("doc_id"), graft.functions.TextFunctions.tokenCount(col("text")),
        pmod(col("doc_id"), lit(8)), budget)
      .collect().map(r => (r.getLong(0), r.getLong(3))).toSet
    assert(again == got.map(t => (t._1, t._4)).toSet)
  }

  test("quotaCap keeps at most the quota per stratum, lowest priority first") {
    val docs = Tables.documents(spark, sfDir).select(col("doc_id"), col("source"))
    val quota = 7
    val kept = graft.operators.Resample.quotaCap(
        docs, col("source"), Seq(col("doc_id")), quota)
      .collect().map(r => (r.getString(1), r.getLong(0)))
    val bySource = docs.collect().map(r => (r.getString(1), r.getLong(0)))
      .groupBy(_._1).view.mapValues(_.map(_._2).sorted).toMap
    val got = kept.groupBy(_._1).view.mapValues(_.map(_._2).sorted.toSeq).toMap
    assert(got.keySet == bySource.keySet, "no stratum may vanish")
    bySource.foreach { case (src, ids) =>
      assert(got(src) == ids.take(quota).toSeq,
        s"stratum $src must keep exactly its $quota lowest ids")
    }
    intercept[IllegalArgumentException] {
      graft.operators.Resample.quotaCap(docs, col("source"), Seq(col("doc_id")), 0)
    }
  }

  test("GraftExtensions registers all kernel functions for SQL") {
    // builder-time extensions don't apply to an already-running
    // session (common in tests) — the runtime path covers that
    GraftExtensions.registerAll(spark)
    val out = spark.sql(
      """SELECT simhash64(word_shingles('a b c d e', 3)) AS sh,
        |       minhash_sig(word_shingles('a b c d e', 3), 4) AS mh,
        |       vec_cosine(array(CAST(1.0 AS FLOAT), CAST(0.0 AS FLOAT)),
        |                  array(CAST(1.0 AS FLOAT), CAST(0.0 AS FLOAT))) AS cos,
        |       rolling_fingerprint('abc') AS fp""".stripMargin).head()
    assert(out.getSeq[Long](1).length == 4)
    assert(math.abs(out.getDouble(2) - 1.0) < 1e-12)
    assert(out.getLong(3) == 96354L) // h("abc") = ((97*31)+98)*31+99
  }

  test("salted join equals plain join") {
    val li = Tables.lineitem(spark, sfDir).select("l_orderkey", "l_quantity")
    val ord = Tables.orders(spark, sfDir).select("o_orderkey", "o_custkey")
      .withColumnRenamed("o_orderkey", "l_orderkey")
    val plain = li.join(ord, Seq("l_orderkey")).count()
    val salted = SkewJoin.saltedInnerJoin(li, ord, Seq("l_orderkey"), 8).count()
    assert(salted == plain)
  }

  test("streaming upsert sink converges to keep-latest semantics") {
    import spark.implicits._
    val root = Files.createTempDirectory("graft_supsert").toFile.getAbsolutePath
    val events = Tables.events(spark, sfDir)
      .select($"event_id", $"ts", $"user_id", $"event_type", $"value")
      .as[graft.streaming.EventsStream.Event]
    val src = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[graft.streaming.EventsStream.Event](spark, 1)
    src.addData(events.collect().toSeq)
    val q = graft.streaming.StreamingUpsert.start(
      src.toDF(), Seq("user_id", "event_type"), "ts", Seq("event_id"),
      s"$root/table", s"$root/ckpt")
    q.awaitTermination()
    val got = spark.read.parquet(s"$root/table")
      .select($"user_id", $"event_type", $"event_id")
      .collect().map(r => ((r.getLong(0), r.getString(1)), r.getLong(2))).toMap
    val want = graft.queries.ReferenceQueries.upsertKeepLatest(spark, sfDir)
      .select($"user_id", $"event_type", $"event_id")
      .collect().map(r => ((r.getLong(0), r.getString(1)), r.getLong(2))).toMap
    assert(got == want, "streamed lake table must equal batch keep-latest")
  }

  test("approx distinct is within HLL error of exact") {
    val li = Tables.lineitem(spark, sfDir)
    val r = li.agg(
      countDistinct(col("l_partkey")).as("exact"),
      approx_count_distinct(col("l_partkey"), 0.02).as("approx")).head()
    val (exact, approx) = (r.getLong(0), r.getLong(1))
    assert(math.abs(approx - exact).toDouble / exact < 0.1,
      s"approx=$approx exact=$exact")
  }

  test("heavy hitters: every exact top-10 word surfaces, estimates never undercount") {
    val exact = graft.queries.ExtendedQueries.vocabTopWords(spark, sfDir)
      .collect().take(10).map(r => (r.getString(0), r.getLong(1)))
    val totalTokens = Tables.documents(spark, sfDir)
      .agg(sum(graft.functions.TextFunctions.tokenCount(col("text"))))
      .head().getLong(0)
    // sketch-level pins, against the raw CMS slate (the query's
    // join-back layer would mask an undercount)
    val occ = Tables.documents(spark, sfDir)
      .select(col("doc_id"), posexplode(
        graft.functions.TextFunctions.tokens(col("text"))).as(Seq("pos", "word")))
    val est = graft.operators.HeavyHitters.topK(occ,
        struct(col("doc_id"), col("pos")), col("word"), 20)
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    exact.foreach { case (w, f) =>
      assert(est.contains(w), s"true heavy hitter '$w' missing from sketch top-k")
      assert(est(w) >= f, s"CMS must never undercount: $w est=${est(w)} exact=$f")
      assert(est(w) - f <= math.max(2, (0.001 * totalTokens).toLong),
        s"$w overestimated: est=${est(w)} exact=$f")
    }
    // query-level pin: the exact-verified join-back equals the exact top-10
    val verified = graft.queries.TextQueries.vocabHeavyHitters(spark, sfDir)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(verified == exact.toSeq,
      s"exact-verified heavy hitters must equal the exact top-10: $verified vs ${exact.toSeq}")
  }

  test("mixture resample: deterministic, prefix-stable, near-target fractions") {
    import spark.implicits._
    val df = spark.range(0, 20000)
      .select(col("id"), (col("id") % 4).cast("string").as("stratum"))
    def run(fracs: Map[String, Double], seed: Long) =
      graft.operators.Resample.byStratum(df, col("stratum"), col("id"), fracs, seed = seed)
        .select(col("id")).as[Long].collect().toSet
    val fracs = Map("0" -> 0.5, "1" -> 0.25, "2" -> 1.0, "3" -> 0.0)
    val a = run(fracs, 42L)
    val b = run(fracs, 42L)
    assert(a == b, "same seed must keep the same rows")
    assert(run(fracs, 7L) != a, "different seed must keep a different subset")
    // near-target per-stratum fractions (hash-uniform, 5000 rows/stratum)
    Seq(("0", 0.5), ("1", 0.25), ("2", 1.0), ("3", 0.0)).foreach { case (s, f) =>
      val kept = a.count(_ % 4 == s.toLong) / 5000.0
      assert(math.abs(kept - f) < 0.03, s"stratum $s kept $kept, want ~$f")
    }
    // raising a fraction keeps the original subset (hash-range prefix)
    val raised = run(fracs.updated("1", 0.5), 42L)
    assert(a.subsetOf(raised), "raising a fraction must only add rows")
  }

  test("compact rewrites many small files into few, contents unchanged") {
    val dir = java.nio.file.Files.createTempDirectory("graft_compact")
      .toFile.getAbsolutePath + "/t"
    Tables.orders(spark, sfDir).repartition(16)
      .write.mode("overwrite").parquet(dir)
    val before = spark.read.parquet(dir)
    val beforeRows = before.collect().map(_.toString).sorted.toSeq
    assert(before.inputFiles.length >= 16)
    graft.sources.LakeWriter.compact(spark, dir, targetFileBytes = 1L << 30)
    val after = spark.read.parquet(dir)
    assert(after.inputFiles.length == 1,
      s"expected 1 compacted file, got ${after.inputFiles.length}")
    assert(after.collect().map(_.toString).sorted.toSeq == beforeRows)
  }

  test("compact keeps a partitionBy layout, compacting inside each partition dir") {
    val dir = java.nio.file.Files.createTempDirectory("graft_compact_part")
      .toFile.getAbsolutePath + "/t"
    graft.sources.LakeWriter.writeByPeriod(
      Tables.orders(spark, sfDir), "o_orderdate", dir, filesPerPartition = 4)
    val beforeRows = spark.read.parquet(dir)
      .collect().map(_.toString).sorted.toSeq
    val beforeDirs = new java.io.File(dir).listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("period=")).map(_.getName).toSet
    assert(beforeDirs.nonEmpty)
    graft.sources.LakeWriter.compact(spark, dir, targetFileBytes = 1L << 30)
    val afterDirs = new java.io.File(dir).listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("period=")).map(_.getName).toSet
    assert(afterDirs == beforeDirs, "partition directories must survive compaction")
    afterDirs.foreach { d =>
      val files = new java.io.File(s"$dir/$d").listFiles()
        .filter(_.getName.endsWith(".parquet"))
      assert(files.length == 1, s"$d should compact to one file, has ${files.length}")
    }
    assert(spark.read.parquet(dir).collect().map(_.toString).sorted.toSeq == beforeRows)
  }

  test("schema-evolution read: old files' missing columns null-fill") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_evolve")
      .toFile.getAbsolutePath + "/t"
    Seq((1L, "a")).toDF("id", "v1").write.mode("append").parquet(dir)
    Seq((2L, "b", 9.5)).toDF("id", "v1", "v2").write.mode("append").parquet(dir)
    val evolved = graft.sources.LakeWriter.readEvolved(spark, dir)
    assert(evolved.columns.toSet == Set("id", "v1", "v2"))
    val rows = evolved.orderBy(col("id")).collect()
    assert(rows(0).isNullAt(rows(0).fieldIndex("v2")),
      "pre-evolution row must null-fill the new column")
    assert(rows(1).getDouble(rows(1).fieldIndex("v2")) == 9.5)
  }

  test("range join: inclusive lo, exclusive hi, bucket-boundary exact") {
    import spark.implicits._
    val points = Seq(
      (1L, "2024-01-01 08:00:00"),   // == lo: in
      (2L, "2024-01-01 17:59:59"),   // just under hi: in
      (3L, "2024-01-01 18:00:00"),   // == hi: out
      (4L, "2024-01-01 07:59:59"),   // just under lo: out
      (5L, "2024-01-02 09:30:00"))   // second interval: in
      .toDF("pid", "s").select($"pid", $"s".cast("timestamp").as("pt"))
    val intervals = Seq(
      ("2024-01-01 08:00:00", "2024-01-01 18:00:00"),
      ("2024-01-02 08:00:00", "2024-01-02 18:00:00"))
      .toDF("l", "h")
      .select($"l".cast("timestamp").as("lo"), $"h".cast("timestamp").as("hi"))
    val got = graft.operators.RangeJoin
      .pointInInterval(points, intervals, col("pt"), col("lo"), col("hi"), 3600)
      .select($"pid").collect().map(_.getLong(0)).toSet
    assert(got == Set(1L, 2L, 5L))
  }

  test("text_length_quantiles: sketch ranks within 1% of exact") {
    val got = graft.queries.TextQueries.textLengthQuantiles(spark, sfDir)
      .collect().map(r => (r.getDouble(0), r.getAs[Number](1).intValue()))
    val vals = Tables.documents(spark, sfDir)
      .select(col("n_chars")).collect().map(_.getAs[Number](0).intValue()).sorted
    val n = vals.length
    got.foreach { case (q, v) =>
      val rank = vals.count(_ <= v).toDouble / n
      val rankLo = vals.count(_ < v).toDouble / n
      assert(rankLo - 0.01 <= q && q <= rank + 0.01,
        s"q=$q estimate $v has rank window [$rankLo, $rank]")
    }
  }

  test("approx_distinct query entry tracks exact distinct_counts within tolerance") {
    val ex = graft.queries.RelationalQueries.distinctCounts(spark, sfDir).head()
    val ap = graft.queries.RelationalQueries.approxDistinct(spark, sfDir).head()
    (0 until 3).foreach { i =>
      val (exact, approx) = (ex.getLong(i), ap.getLong(i))
      assert(math.abs(approx - exact).toDouble / exact < 0.15,
        s"col $i: approx=$approx exact=$exact")
    }
  }

  test("hash split: disjoint, complete, deterministic, near-target fractions") {
    import graft.operators.Resample
    val docs = Tables.documents(spark, sfDir)
    val n = docs.count()
    def splits(df: org.apache.spark.sql.DataFrame): Map[Long, Int] =
      Resample.splitByHash(df, col("doc_id"), Seq(0.9, 0.05, 0.05))
        .select(col("doc_id"), col("split"))
        .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val s1 = splits(docs)
    assert(s1.size == n, "every row lands in exactly one split")
    assert(s1.values.forall(s => s >= 0 && s <= 2))
    // deterministic under repartitioning
    assert(splits(docs.repartition(7)) == s1)
    // growing the input never moves an old row's split
    val subset = splits(docs.filter(col("doc_id") < 100))
    assert(subset.forall { case (id, s) => s1(id) == s })
    // fractions near target (binomial noise at sf test sizes)
    val frac0 = s1.values.count(_ == 0).toDouble / n
    assert(math.abs(frac0 - 0.9) < 0.05, s"train fraction $frac0")
    // weights are normalized: relative weights give the same split
    val w2 = Resample.splitByHash(docs, col("doc_id"), Seq(18.0, 1.0, 1.0))
      .select(col("doc_id"), col("split"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(w2 == s1)
  }

  test("hll pre-aggregated sketches merge to the global distinct and survive parquet") {
    val ev = Tables.events(spark, sfDir)
    // the declared 5% tolerance is pinned AGAINST THE GATED WITNESS
    // KEY (hll_partitioned_distinct_exact — itself DuckDB-oracled),
    // not a spec-local recompute: the two §2 rows verify each other
    val wit = graft.queries.ExtendedQueries
      .hllPartitionedDistinctExact(spark, sfDir).head()
    val exact = wit.getLong(0)
    val row = graft.queries.ExtendedQueries.hllPartitionedDistinct(spark, sfDir).head()
    val est = row.getLong(0)
    assert(math.abs(est - exact) <= math.max(1L, (exact * 0.05).toLong),
      s"merged estimate $est vs exact witness $exact")
    assert(row.getLong(2) == ev.count(), "pre-agg must cover every event")
    assert(wit.getLong(2) == row.getLong(2),
      "witness and sketch rows must cover the same event total")
    assert(wit.getLong(1) == row.getLong(1),
      "witness and sketch rows must cover the same day range")

    // the sketch column is lake-persistable: daily sketches written to
    // parquet and unioned later must give the SAME estimate — that is
    // the incremental-maintenance contract (merge bytes, not rescan)
    val path = Files.createTempDirectory("graft_hll").toString + "/daily"
    ev.groupBy(date_trunc("day", col("ts")).as("day"))
      .agg(hll_sketch_agg(col("user_id")).as("sk"))
      .write.mode("overwrite").parquet(path)
    val est2 = spark.read.parquet(path)
      .agg(hll_sketch_estimate(hll_union_agg(col("sk")))).head().getLong(0)
    assert(est2 == est, s"round-tripped sketches drifted: $est2 vs $est")
  }

  test("next-fit-decreasing packing: whole docs, budget respected, NFD reference order") {
    import spark.implicits._
    import graft.operators.Pack
    // one bucket, budget 10, lengths 7,5,4,3,3,2,12 (12 is oversized)
    val docs = Seq((1L, 7L), (2L, 5L), (3L, 4L), (4L, 3L), (5L, 3L),
      (6L, 2L), (7L, 12L)).toDF("id", "n")
    val got = Pack.nextFitDecreasing(docs, col("id"), col("n"), lit(0), 10L)
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(2), r.getLong(3), r.getLong(4)))
      .toMap
    // NFD order by (len desc, id): 7(12) 1(7) 2(5) 3(4) 4(3) 5(3) 6(2)
    // shard 0: [12] oversized alone; shard 1: 7 (5 doesn't fit);
    // shard 2: 5+4 (3 doesn't fit at fill 9+3>10... 9+3=12>10);
    // shard 3: 3+3+2
    assert(got == Map(
      7L -> ((12L, 0L, 0L)),
      1L -> ((7L, 1L, 0L)),
      2L -> ((5L, 2L, 0L)),
      3L -> ((4L, 2L, 5L)),
      4L -> ((3L, 3L, 0L)),
      5L -> ((3L, 3L, 3L)),
      6L -> ((2L, 3L, 6L))), s"assignments diverge: $got")

    // corpus-level invariants at the gate dials: every doc exactly
    // once, no truncation (offset + len <= budget unless singleton
    // oversized), shards contiguous from 0 per bucket
    val corpus = graft.queries.TextQueries.sequencePackNextFit(spark, sfDir)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    val n = graft.sources.Tables.documents(spark, sfDir).count()
    assert(corpus.length == n && corpus.map(_._1).distinct.length == n)
    corpus.foreach { case (id, _, len, _, off) =>
      assert(off + len <= 512 || off == 0,
        s"doc $id truncated: off=$off len=$len")
    }
    corpus.groupBy(_._2).foreach { case (bucket, rows) =>
      val shards = rows.map(_._4).distinct.sorted.toSeq
      assert(shards == (0L until shards.length.toLong).toSeq,
        s"bucket $bucket shards not contiguous: $shards")
    }
  }

  test("FIM transform: reassembling prefix+middle+suffix recovers every document") {
    val docs = Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("text"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val out = graft.queries.TextQueries.fimTransform(spark, sfDir).collect()
    assert(out.length == docs.size)
    var applied = 0
    out.foreach { r =>
      val (id, isFim, t) = (r.getLong(0), r.getBoolean(1), r.getString(2))
      if (!isFim) assert(t == docs(id), s"passthrough doc $id must be untouched")
      else {
        applied += 1
        // <PRE>p<SUF>s<MID>m  ->  p + m + s == original
        val m1 = t.indexOf("<PRE>"); val m2 = t.indexOf("<SUF>")
        val m3 = t.indexOf("<MID>")
        assert(m1 == 0 && m2 > 0 && m3 > m2, s"doc $id malformed: $t")
        val p = t.substring(5, m2)
        val s = t.substring(m2 + 5, m3)
        val m = t.substring(m3 + 5)
        assert(p + m + s == docs(id), s"doc $id does not reassemble")
      }
    }
    // the hash coin picks roughly half
    assert(applied > out.length / 4 && applied < out.length * 3 / 4,
      s"$applied of ${out.length} FIM'd")
  }

  test("BPE training: textbook merges, monotone structure, deterministic, compresses") {
    import graft.operators.Bpe
    // Sennrich et al. 2016's worked example (no end-of-word marker):
    // first four merges are hand-derivable
    val counts = Seq("low" -> 5L, "lower" -> 2L, "newest" -> 6L, "widest" -> 3L)
    val t = Bpe.trainFromCounts(counts, numMerges = 4)
    assert(t.merges == Seq(("e", "s"), ("es", "t"), ("l", "o"), ("lo", "w")),
      s"textbook merges diverge: ${t.merges}")
    assert(t.vocab == Seq("es", "est", "lo", "low"))

    // every merge operand is a single codepoint or an earlier product
    val full = Bpe.trainFromCounts(counts, numMerges = 100)
    full.merges.zipWithIndex.foreach { case ((a, b), i) =>
      val prior = full.merges.take(i).map(p => p._1 + p._2).toSet
      Seq(a, b).foreach(s =>
        assert(s.codePointCount(0, s.length) == 1 || prior.contains(s),
          s"merge $i operand '$s' from nowhere"))
    }
    // early stop: no pair repeats twice -> loop ends before numMerges
    assert(full.merges.length < 100)

    // corpus-trained: deterministic, and the trained vocab compresses
    // (fewer subword tokens than codepoints, at least one per word)
    val docs = Tables.documents(spark, sfDir)
    val t1 = Bpe.train(docs, "text", numMerges = 64)
    val t2 = Bpe.train(docs, "text", numMerges = 64)
    assert(t1 == t2, "same corpus must train the same merges")
    assert(t1.vocab.nonEmpty && t1.vocab.forall(_.length >= 2))
    val row = graft.queries.TextQueries.vocabBpeTokenize(spark, sfDir)
      .join(docs.select(col("doc_id"),
        length(regexp_replace(col("text"), "\\s", "")).as("n_cp")), "doc_id")
      .agg(sum(col("n_subtokens")).as("st"), sum(col("n_words")).as("w"),
        sum(col("n_cp")).as("cp"))
      .head()
    assert(row.getLong(0) >= row.getLong(1), "at least one subtoken per word")
    assert(row.getLong(0) < row.getLong(2),
      s"trained vocab must beat the char fallback: ${row.getLong(0)} vs ${row.getLong(2)}")
  }

  test("DSIR: hand-computed importance weights, on-target docs win the Gumbel cut, repartition-invariant") {
    import spark.implicits._
    import graft.operators.Dsir
    // 3 on-target docs (60 tokens of {aa,bb,cc}) + 3 junk docs
    // (60 tokens of {zz,yy,xx}); target = the on-target slice
    val tgtText = Seq.fill(20)("aa bb cc").mkString(" ")
    val junkText = Seq.fill(20)("zz yy xx").mkString(" ")
    val docs = Seq((1L, tgtText), (2L, tgtText), (3L, tgtText),
      (4L, junkText), (5L, junkText), (6L, junkText)).toDF("doc_id", "text")
    val got = Dsir.resample(docs, docs.filter(col("doc_id") <= 3),
        "text", "doc_id", k = 3, vocabTopK = 8)
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2)))
    // weight gap (≈60·ln 2 per side) dwarfs the Gumbel range
    // ([−2.7, 14.6] for the M=1e6 bucket grid) → the cut is the slice
    assert(got.map(_._1).toSet == Set(1L, 2L, 3L))
    // driver reference: same add-one estimator on both models
    // target: 180 tokens, vocab {aa,bb,cc} → d = 184
    // raw: 360 tokens, vocab all 6 words → d = 367
    val perTok = Map(
      "aa" -> (math.log(61 / 184.0) - math.log(61 / 367.0)),
      "bb" -> (math.log(61 / 184.0) - math.log(61 / 367.0)),
      "cc" -> (math.log(61 / 184.0) - math.log(61 / 367.0)))
    val wantLw = BigDecimal(
      tgtText.split(" ").foldLeft(0.0)((acc, w) => acc + perTok(w)))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    got.foreach { case (id, lw, key) =>
      assert(lw == wantLw, s"doc $id log_weight $lw want $wantLw")
      val g = key - lw
      assert(g > -3.0 && g < 15.0, s"gumbel part $g outside the bucket-grid range")
    }
    // deterministic under repartitioning (seeded hash, not an RNG)
    val re = Dsir.resample(docs.repartition(7), docs.filter(col("doc_id") <= 3),
        "text", "doc_id", k = 3, vocabTopK = 8)
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2)))
    assert(re.sortBy(_._1).sameElements(got.sortBy(_._1)))
  }

  test("temperature mixing: √mass quotas, lowest-hash-first selection, repartition-invariant") {
    import spark.implicits._
    import graft.operators.Resample
    // masses: A = 25×16 = 400, B = 20×5 = 100, C = 2×0 = 0
    // √: 20 / 10 / 0, total 30; sampleN 30 → quotas 20 / 10 / 0
    val rows = (1L to 25L).map(i => (i, "A", 16L)) ++
      (26L to 45L).map(i => (i, "B", 5L)) ++ Seq((46L, "C", 0L), (47L, "C", 0L))
    val df = rows.toDF("id", "src", "mass")
    val kept = Resample.temperatureBySource(df, col("src"), col("id"),
      col("mass"), sampleN = 30L)
    val bySrc = kept.groupBy(col("src")).agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(bySrc == Map("A" -> 20L, "B" -> 10L),
      s"quotas must be ⌊N·√mass/Σ√mass⌋ per source, got $bySrc")
    // selection = the quota smallest seeded-hash buckets per source
    val buckets = df.select(col("id"), col("src"),
        pmod(xxhash64(lit(42L), col("id")), lit(1000000L)).as("b"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val want = buckets.groupBy(_._2).toSeq.flatMap { case (s, g) =>
      g.sortBy(x => (x._3, x._1)).take(if (s == "A") 20 else if (s == "B") 10 else 0)
    }.map(_._1).toSet
    val gotIds = kept.select(col("id")).collect().map(_.getLong(0)).toSet
    assert(gotIds == want, "kept set must be the lowest-bucket prefix per source")
    val re = Resample.temperatureBySource(df.repartition(5), col("src"),
      col("id"), col("mass"), sampleN = 30L)
      .select(col("id")).collect().map(_.getLong(0)).toSet
    assert(re == gotIds)
  }

  test("water-fill mixing: small strata whole, budget cascades, repartition-invariant") {
    import spark.implicits._
    import graft.operators.Resample
    // capacities: a = 2, b = 5, c = 100; budget 30
    // sorted (a2, b5, c100): a min(2, 30/3=10)=2 rem 28;
    // b min(5, 28/2=14)=5 rem 23; c min(100, 23)=23
    val rows = Seq((1L, "a"), (2L, "a")) ++
      (3L to 7L).map(i => (i, "b")) ++ (8L to 107L).map(i => (i, "c"))
    val df = rows.toDF("id", "s")
    val kept = Resample.waterFillByStratum(df, col("s"), col("id"), budget = 30L)
    val byS = kept.groupBy(col("s")).agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byS == Map("a" -> 2L, "b" -> 5L, "c" -> 23L),
      s"water-fill allocation wrong: $byS")
    // selection within the capped stratum = lowest-hash prefix
    val buckets = df.filter(col("s") === "c").select(col("id"),
        pmod(xxhash64(lit(42L), col("id")), lit(1000000L)).as("b"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val wantC = buckets.sortBy(x => (x._2, x._1)).take(23).map(_._1).toSet
    val gotC = kept.filter(col("s") === "c").select(col("id"))
      .collect().map(_.getLong(0)).toSet
    assert(gotC == wantC, "kept c-rows must be the lowest-bucket prefix")
    val re = Resample.waterFillByStratum(df.repartition(7), col("s"),
        col("id"), budget = 30L)
      .select(col("id")).collect().map(_.getLong(0)).toSet
    val got = kept.select(col("id")).collect().map(_.getLong(0)).toSet
    assert(re == got)
    // a budget above the corpus takes everything
    val all = Resample.waterFillByStratum(df, col("s"), col("id"),
      budget = 1000L)
    assert(all.count() == rows.length.toLong)
  }

  test("Drift.psi: hand-computed terms, one-sided buckets finite, identical corpora score ~0") {
    import spark.implicits._
    import graft.operators.Drift
    val ref = (Seq.fill(8)("a") ++ Seq.fill(2)("b")).zipWithIndex
      .map { case (s, i) => (i.toLong, s) }.toDF("id", "k")
    val cur = (Seq.fill(2)("a") ++ Seq.fill(6)("b") ++ Seq.fill(2)("c"))
      .zipWithIndex.map { case (s, i) => (i.toLong, s) }.toDF("id", "k")
    val got = Drift.psi(ref, cur, col("k"))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(5))).toMap
    def term(rn: Long, cn: Long): Double = {
      val p = (rn + 1).toDouble / 13.0; val q = (cn + 1).toDouble / 13.0
      math.round((p - q) * math.log(p / q) * 1e6) / 1e6
    }
    assert(got("a") == (8L, 2L, term(8, 2)), s"a: ${got("a")}")
    assert(got("b") == (2L, 6L, term(2, 6)))
    // bucket c exists only on the cur side — smoothing keeps it finite
    assert(got("c") == (0L, 2L, term(0, 2)))
    assert(got.values.map(_._3).sum > 0.25, "planted shift must alarm")
    // identical distributions → every term exactly 0 (p == q bitwise)
    val same = Drift.psi(ref, ref, col("k"))
      .collect().map(_.getDouble(5))
    assert(same.forall(_ == 0.0))
  }

  test("TF-IDF: hand-computed cosine scores, spam page ranks below a focused one") {
    import spark.implicits._
    import graft.operators.TextRank
    val texts = Map(
      1L -> "apple banana",                      // focused: 1 of 2 tokens
      2L -> ("apple " * 8 + (2 to 93).map(i => s"w$i").mkString(" ")), // spam
      3L -> "banana cherry")                     // no match
    val docs = texts.toSeq.toDF("doc_id", "text")
    val got = TextRank.tfidfTopK(docs, "doc_id", "text",
        terms = Seq("apple"), k = 10)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(got.keySet == Set(1L, 2L), "only matching docs are returned")
    // driver reference, same smooth-idf / L2-normalized scheme
    val n = 3.0
    val toksOf = texts.view.mapValues(
      _.toLowerCase.split("[^a-z0-9]+").filter(_.nonEmpty).toSeq).toMap
    val df = toksOf.values.flatMap(_.distinct).groupBy(identity)
      .view.mapValues(_.size.toDouble).toMap
    def idf(w: String) = math.log((1 + n) / (1 + df.getOrElse(w, 0.0))) + 1
    def score(id: Long): Double = {
      val tf = toksOf(id).groupBy(identity).view.mapValues(_.size.toDouble).toMap
      val norm = math.sqrt(tf.map { case (w, f) =>
        val x = f * idf(w); x * x }.sum)
      val qn = math.sqrt(idf("apple") * idf("apple"))
      BigDecimal(tf.getOrElse("apple", 0.0) * idf("apple") * idf("apple") / (norm * qn))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    assert(got(1L) == score(1L) && got(2L) == score(2L),
      s"got $got want ${Seq(1L, 2L).map(i => i -> score(i))}")
    // cosine punishes the term-spam page: its weight mass is spread
    // over 20 tokens, the focused page concentrates on 2
    assert(got(1L) > got(2L))
  }

  test("token budget selection equals the naive running-sum window, edge cases pinned") {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val df = Tables.documents(spark, sfDir).select(col("doc_id"),
      graft.functions.TextFunctions.qualityScore(col("text")).as("q"),
      graft.functions.TextFunctions.tokenCount(col("text")).cast("long").as("m"))
    val total = df.agg(sum(col("m"))).head().getLong(0)
    val budget = total / 2
    val got = graft.operators.TokenBudget.markKept(
        df, col("q"), col("m"), col("doc_id"), budget)
      .select(col("doc_id"), col("kept"))
      .collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    // naive twin: one global running-sum window in the same order
    val w = Window.orderBy(floor(col("q") * 100).cast("long").desc,
        col("doc_id").asc)
      .rowsBetween(Window.unboundedPreceding, 0)
    val want = df.withColumn("cum", sum(col("m")).over(w))
      .select(col("doc_id"), (col("cum") <= budget).as("kept"))
      .collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    assert(got == want, s"diff=${got.toSet.diff(want.toSet).take(5)}")
    // the cut is real: some kept, some dropped, mass within budget
    assert(got.values.exists(identity) && got.values.exists(!_))
    // budget >= total admits everything (empty-bounds sentinel path)
    val all = graft.operators.TokenBudget.markKept(
        df, col("q"), col("m"), col("doc_id"), total + 1)
      .filter(col("kept")).count()
    assert(all == df.count(), "budget above total mass must keep all")
    // kept mass never exceeds the budget
    val keptMass = graft.operators.TokenBudget.select(
        df, col("q"), col("m"), col("doc_id"), budget)
      .agg(sum(col("m"))).head().getLong(0)
    assert(keptMass <= budget, s"$keptMass > $budget")
  }

  test("html extract: tag soup, script/style payloads, entities, case, multiline") {
    import spark.implicits._
    def x(html: String): String =
      Seq(html).toDF("h")
        .select(graft.functions.TextFunctions.htmlToText(col("h")))
        .head().getString(0)
    assert(x("<p>a  b</p>") == "a b")
    // script payload containing markup: removed wholesale, not stripped
    assert(x("<script>if (a<b) { w('<div>x</div>'); }</script>hello") == "hello")
    assert(x("<SCRIPT>var y = 1;</SCRIPT>ok") == "ok")            // case
    assert(x("<script>\nvar a;\n</script>done") == "done")        // multiline
    assert(x("<style>p { color: red; }</style>text") == "text")
    assert(x("a<!-- hidden\n boilerplate -->b") == "a b")
    // entity decode with &amp; LAST: double-encoded stays literal
    assert(x("&amp;lt; &lt; &quot;q&quot; &#39;s&#39; a&nbsp;b")
      == "&lt; < \"q\" 's' a b")
    // the full query round-trips every doc's text ahead of the footer
    val got = graft.queries.TextQueries.htmlExtract(spark, sfDir)
      .select(col("doc_id"), col("extracted")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val want = Tables.documents(spark, sfDir)
      .select(col("doc_id"),
        trim(regexp_replace(col("text"), "\\s+", " ")).as("t"))
      .collect().map(r => r.getLong(0) -> (r.getString(1) + " visit & read")).toMap
    assert(got == want)
  }

  test("rouge overlap: clipped-count fixture, bounds, harmonic identity") {
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    // ref "a a b c" vs cand "a b b d": R1 clip = min(2,1)+min(1,2) = 2
    // → r=p=f1=0.5; R2 grams share only "a b" → 1/3 everywhere
    val pairs = Seq((1L, 2L, "a a b c", "a b b d"))
      .toDF("id_a", "id_b", "text_a", "text_b")
    val r1 = graft.operators.Rouge.overlap(pairs, 1, "r1").collect().head
    assert(r1.getLong(2) == 2L && r1.getDouble(3) == 0.5 &&
      r1.getDouble(4) == 0.5 && r1.getDouble(5) == 0.5)
    val r2 = graft.operators.Rouge.overlap(pairs, 2, "r2").collect().head
    assert(r2.getLong(2) == 1L && r2.getDouble(3) == 1.0 / 3 &&
      r2.getDouble(4) == 1.0 / 3 && r2.getDouble(5) == 1.0 / 3)
    // a side shorter than n publishes zeros, not nulls
    val short = Seq((1L, 2L, "a", "b c"))
      .toDF("id_a", "id_b", "text_a", "text_b")
    val rs = graft.operators.Rouge.overlap(short, 2, "r2").collect().head
    assert(rs.getLong(2) == 0L && rs.getDouble(3) == 0.0 &&
      rs.getDouble(5) == 0.0)
    // sf face: bounds and the F1 harmonic identity
    val sf = graft.queries.TextQueries.rougeOverlap(spark, sfDir).collect()
    assert(sf.nonEmpty)
    sf.foreach { r =>
      Seq(3, 4, 5, 7, 8, 9).foreach { i =>
        val v = r.getDouble(i); assert(v >= 0.0 && v <= 1.0) }
      val (p, rc, f1) = (r.getDouble(4), r.getDouble(3), r.getDouble(5))
      if (p + rc > 0)
        assert(math.abs(f1 - 2 * p * rc / (p + rc)) < 1e-9,
          s"pair ${r.getLong(0)}: F1 must be the harmonic mean")
    }
  }

  test("epoch allocation: hand greedy replay, budget conservation, prefix property") {
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    // u = (a:100, b:50, c:10), budget = 3/2 · 160 = 240. Greedy by
    // marginal u·0.7^k: a0(1000)→100, a1(700)→100, b0(500)→40
    // partial (budget hit), a2(490)→0, … c never starts.
    val masses = Seq(("a", 100L), ("b", 50L), ("c", 10L)).toDF("source", "u")
    val got = graft.operators.EpochAlloc.allocate(masses)
      .collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getInt(2), r.getInt(3), r.getLong(4), r.getLong(5))))
      .toMap
    assert(got("a") == ((100L, 2, 2, 200L, 100L * 10000000L + 100L * 7000000L)))
    assert(got("b") == ((50L, 1, 0, 40L, 40L * 10000000L)))
    assert(got("c") == ((10L, 0, 0, 0L, 0L)))
    // budget exactly consumed when Σu exceeds it
    assert(got.values.map(_._4).sum == 240L)
    // sf face: per-source epochs form a prefix (full before partial),
    // total allocation equals the 1.5× budget, output is per-source
    val sf = graft.queries.TextQueries.epochAllocation(spark, sfDir).collect()
    assert(sf.nonEmpty)
    sf.foreach { r =>
      val (ne, fe) = (r.getInt(2), r.getInt(3))
      assert(ne == fe || ne == fe + 1, s"${r.getString(0)}: partial beyond prefix")
    }
    val totU = sf.map(_.getLong(1)).sum
    assert(sf.map(_.getLong(4)).sum == totU * 3 / 2)
  }

  test("luhn redaction: known card vectors, valid-only replacement, length window") {
    import org.apache.spark.sql.functions.{lit, typedLit}
    // the textbook vectors: 4111111111111111 valid, last-digit flip invalid
    val vecs = Seq(
      ("4111111111111111", true), ("4111111111111112", false),
      ("79927398713", true), // the Wikipedia reference number (11 digits)
      ("1234567812345670", true), ("1234567812345678", false))
    val got = spark.range(1).select(
      vecs.map { case (s, _) =>
        graft.functions.TextFunctions.luhnValid(lit(s)).as(s) }: _*)
      .collect().head
    vecs.zipWithIndex.foreach { case ((s, want), i) =>
      assert(got.getBoolean(i) == want, s"luhnValid($s)") }

    val rows = graft.queries.TextQueries.textRedactLuhn(spark, sfDir)
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getString(3)))
    assert(rows.nonEmpty)
    rows.foreach { case (id, nc, nv, red) =>
      assert(nc == 1, s"doc $id: exactly one card-length candidate")
      assert(nv == (if (id % 2 == 0) 1 else 0), s"doc $id: validity by parity")
      if (id % 2 == 0) {
        assert(red.contains("<CC>") && !red.matches(".*[0-9]{13,16}.*"),
          s"doc $id: valid candidate must be redacted")
      } else
        assert(!red.contains("<CC>"), s"doc $id: invalid candidate kept")
      assert(red.contains(" ref 12345 end"),
        s"doc $id: short digit runs must survive the length window")
    }
  }

  test("luhn_redact kernel ≡ the HOF chain on adversarial digit runs") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    import graft.functions.TextFunctions
    // runs of every interesting length (12 no-match, 13/16 exact,
    // 17/29/30 greedy-split), repeated candidates, a candidate that
    // re-occurs verbatim elsewhere, unicode around digits
    val fixtures = Seq(
      "pay 4111111111111111 now",                       // valid 16
      "id 4111111111111112 ref",                        // invalid 16
      "run 79927398713000 and 79927398713000 twice",    // valid 14 twice
      "short 123456789012 only",                        // 12 — no candidate
      "long 41111111111111110003456789012345678 tail",  // 35-digit run
      "edge13 4111111111111 end",                       // 13 exact
      "édgé 4111111111111111 ünïcode 99 42",
      "nested 00004111111111111111000 run",             // 23-digit run
      "")
    val df = fixtures.zipWithIndex
      .map { case (s, i) => (i.toLong, s) }.toDF("i", "s")
    val cands = regexp_extract_all(col("s"), lit("[0-9]{13,16}"), lit(0))
    val valid = filter(cands, c => TextFunctions.luhnValid(c))
    val hof = df.select(col("i"), size(cands).as("nc"), size(valid).as("nv"),
        aggregate(valid, col("s"),
          (txt, c) => replace(txt, c, lit("<CC>"))).as("red"))
      .orderBy("i").collect()
    val k = graft.functions.GraftFunctions.luhn_redact(col("s"))
    val ker = df.select(col("i"), k.getField("n_candidates").as("nc"),
        k.getField("n_valid").as("nv"), k.getField("redacted").as("red"))
      .orderBy("i").collect()
    hof.zip(ker).foreach { case (h, g) =>
      assert(h.getInt(1) == g.getInt(1), s"n_candidates @${h.getLong(0)}")
      assert(h.getInt(2) == g.getInt(2), s"n_valid @${h.getLong(0)}")
      assert(h.getString(3) == g.getString(3), s"redacted @${h.getLong(0)}")
    }
    // luhn_sum kernel ≡ the HOF fold on the same strings
    val sums = df.filter(length(col("s")) > lit(0)).select(
      TextFunctions.luhnSum(regexp_replace(col("s"), "[^0-9]", "")).as("a"),
      graft.functions.GraftFunctions
        .luhn_sum(regexp_replace(col("s"), "[^0-9]", "")).as("b")).collect()
    sums.foreach(r => assert(r.getInt(0) == r.getInt(1), "luhn_sum"))
  }

  test("chunk overlap: exact fixture, coverage, overlap, reassembly") {
    val got = graft.queries.TextQueries.chunkOverlap(spark, sfDir,
        window = 4, stride = 3)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getString(4)))
    val docs = Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("text")).collect()
      .map(r => r.getLong(0) -> r.getString(1).trim.split("\\s+").toSeq).toMap
    // per-doc: chunk count = ceil(n/stride); starts are 0,3,6,…; each
    // chunk is exactly tokens[start, start+4); concatenating each
    // chunk's first `stride` tokens rebuilds the doc
    val byDoc = got.groupBy(_._1)
    assert(byDoc.keySet == docs.filter(_._2.nonEmpty).keySet)
    byDoc.foreach { case (id, cs) =>
      val toks = docs(id)
      val n = toks.length
      assert(cs.length == (n + 2) / 3, s"doc $id chunk count")
      cs.sortBy(_._2).zipWithIndex.foreach { case ((_, cid, start, nt, txt), i) =>
        assert(cid == i && start == 3L * i)
        val want = toks.slice(start.toInt, start.toInt + 4)
        assert(nt == want.length && txt == want.mkString(" "),
          s"doc $id chunk $cid")
      }
      val rebuilt = cs.sortBy(_._2).flatMap(c =>
        c._5.split(" ", -1).take(3)).toSeq
      assert(rebuilt == toks, s"doc $id reassembly")
    }
  }

  test("unicode dedup: NFC + casefold + whitespace unify; mapping exact") {
    import spark.implicits._
    val composed = "caf\u00e9 crema"     // e-acute, composed
    val decomposed = "cafe\u0301 crema"  // e + combining acute
    val docs = Seq(
      (1L, composed),
      (2L, decomposed),                  // NFC-equal to 1
      (3L, "CAF\u00c9   crema"),         // case + whitespace run
      (4L, "espresso lungo"),            // unique group
      (5L, "espresso lungo")).toDF("doc_id", "text")
    val norm = docs.select(col("doc_id"),
      graft.functions.TextFunctions.canonicalText(col("text")).as("n"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(norm(1L) == norm(2L) && norm(2L) == norm(3L),
      s"NFC/case/space must unify: $norm")
    assert(norm(1L) == composed.toLowerCase)
    // full query shape over the frame: lowest id is canonical
    val canon = docs.select(col("doc_id"), col("text"),
        graft.functions.TextFunctions.canonicalText(col("text")).as("norm"))
    val c = canon.groupBy(col("norm")).agg(min(col("doc_id")).as("cid"))
    val got = canon.join(c, Seq("norm"))
      .select(col("doc_id"), col("cid")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 4L, 5L -> 4L))
    // ASCII fast path: collapse + trim without the String round-trip
    val ascii = graft.functions.TextFunctions.canonicalText(lit("plain  Text\n"))
    assert(spark.range(1).select(ascii).head().getString(0) == "plain text")
  }

  test("PrefixSum: distributed running sum equals the global window bit-exactly") {
    import org.apache.spark.sql.expressions.Window
    val df = Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("n_chars"))
    val got = graft.operators.PrefixSum.runningSum(
        df, col("doc_id"), col("n_chars"), "run")
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    val w = Window.orderBy(col("doc_id").asc)
      .rowsBetween(Window.unboundedPreceding, 0)
    val want = df.withColumn("run", sum(col("n_chars")).over(w))
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(got == want, s"diff=${got.toSet.diff(want.toSet).take(5)}")
  }

  test("PrefixSum.runningSums: several riders in one pass equal per-rider windows") {
    import org.apache.spark.sql.expressions.Window
    val df = Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("n_chars"),
        (col("doc_id") % 7).as("m2"))
    val got = graft.operators.PrefixSum.runningSums(df, col("doc_id"),
        Seq(col("n_chars") -> "r1", col("m2") -> "r2"))
      .collect().map(r => r.getLong(0) ->
        (r.getAs[Long]("r1"), r.getAs[Long]("r2"))).toMap
    val w = Window.orderBy(col("doc_id").asc)
      .rowsBetween(Window.unboundedPreceding, 0)
    val want = df
      .withColumn("r1", sum(col("n_chars")).over(w))
      .withColumn("r2", sum(col("m2")).over(w))
      .collect().map(r => r.getLong(0) ->
        (r.getAs[Long]("r1"), r.getAs[Long]("r2"))).toMap
    assert(got == want)
  }

  test("token budget: single-score corpus (whole corpus in the boundary bucket)") {
    import org.apache.spark.sql.expressions.Window
    // every row shares one 2-dp score: the degenerate case that would
    // funnel the full corpus through an unpartitioned window without
    // the PrefixSum decomposition
    val df = Tables.documents(spark, sfDir).select(col("doc_id"),
      lit(0.5).as("q"), col("n_chars").as("m"))
    val total = df.agg(sum(col("m"))).head().getLong(0)
    val budget = total / 3
    val got = graft.operators.TokenBudget.markKept(
        df, col("q"), col("m"), col("doc_id"), budget)
      .select(col("doc_id"), col("kept"))
      .collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    val w = Window.orderBy(col("doc_id").asc)
      .rowsBetween(Window.unboundedPreceding, 0)
    val want = df.withColumn("cum", sum(col("m")).over(w))
      .select(col("doc_id"), (col("cum") <= budget).as("kept"))
      .collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    assert(got == want)
    assert(got.values.exists(identity) && got.values.exists(!_))
  }

  test("GlobalIds: contiguous 0..n-1, equals the global row_number twin, partition-invariant") {
    import spark.implicits._
    import graft.operators.GlobalIds
    import org.apache.spark.sql.expressions.Window
    val df = (1L to 997L).map(i => (i, i * 7919L)).toDF("id", "salt")
      .withColumn("k", xxhash64(col("salt")))
    val assigned = GlobalIds.assign(df, col("k"), col("id"), bucketBits = 5)
    val got = assigned.select(col("id"), col("gid")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // the specification: gid == global row_number over (k, id) - 1
    val twin = df.withColumn("gid",
        row_number().over(Window.orderBy(col("k"), col("id"))).cast("long") - 1L)
      .select(col("id"), col("gid")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == twin)
    assert(got.values.toSeq.sorted == (0L until 997L))
    // the buckets really fan out (the scheme isn't degenerate-single-bucket)
    val nBkt = df.select(shiftright(col("k"), 59)).distinct().count()
    assert(nBkt > 10, s"only $nBkt buckets populated")
    // partitioning cannot change ids
    val re = GlobalIds.assign(df.repartition(13), col("k"), col("id"),
        bucketBits = 5)
      .select(col("id"), col("gid")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(re == twin)
  }

  test("HybridRetrieval.rrf: hand-computed fusion, absent legs contribute zero, id tiebreak") {
    import spark.implicits._
    import graft.operators.HybridRetrieval
    // leg A ranks docs 1,2,3; leg B ranks 2,3,4
    val a = Seq((1L, 1), (2L, 2), (3L, 3)).toDF("doc_id", "rank")
    val b = Seq((2L, 1), (3L, 2), (4L, 3)).toDF("doc_id", "rank")
    val out = HybridRetrieval.rrf(Seq("a" -> a, "b" -> b),
      idCol = "doc_id", rankCol = "rank", kConst = 60, topK = 10)
    val rows = out.collect().map(r => (r.getLong(0),
      Option(r.get(1)), Option(r.get(2)), r.getDouble(3)))
    def rr(r: Int) = 1.0 / (60.0 + r)
    def rnd(x: Double) = BigDecimal(x)
      .setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble
    val expect = Map(
      1L -> rnd(rr(1)),          // only leg A
      2L -> rnd(rr(2) + rr(1)),  // both
      3L -> rnd(rr(3) + rr(2)),
      4L -> rnd(rr(3)))          // only leg B
    assert(rows.map(r => r._1 -> r._4).toMap == expect)
    // doc 2 wins (both legs, best ranks); doc in one leg has a null
    // rank on the other side
    assert(rows.head._1 == 2L)
    val d1 = rows.find(_._1 == 1L).get
    assert(d1._2.contains(1) && d1._3.isEmpty)
  }

  test("DpRelease: deterministic Laplace draws, exact 1/ε scaling, partition-invariant") {
    import spark.implicits._
    import graft.operators.DpRelease
    val df = (1 to 300).map { i =>
      (i.toLong, if (i % 3 == 0) "a" else if (i % 3 == 1) "b" else "c",
        s"g${i % 5}")
    }.toDF("id", "k1", "k2")
    val out = DpRelease.noisyCounts(df, Seq("k1", "k2"), epsilon = 1.0)
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getDouble(3)))
    assert(out.length == 15, "3×5 released groups")
    // counts exact; noise bounded away from silly magnitudes at ε=1
    // (|Lap(1)| < 37 with prob 1−2e−37; a blowup means the inverse
    // CDF is wrong)
    out.foreach { case (_, _, n, noisy) =>
      assert(n == 20L)
      assert(math.abs(noisy - n) < 37.0, s"noise blowup: $noisy vs $n")
    }
    // noise actually varies across groups (u is keyed per group)
    assert(out.map(o => o._4 - o._3).distinct.length > 10)
    // determinism + partition invariance
    val re = DpRelease.noisyCounts(df.repartition(7), Seq("k1", "k2"), 1.0)
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getDouble(3)))
    assert(re.sortBy(o => (o._1, o._2)).toSeq ==
      out.sortBy(o => (o._1, o._2)).toSeq)
    // same u ⇒ noise scales exactly 1/ε: ε = 0.5 doubles every deviate
    val half = DpRelease.noisyCounts(df, Seq("k1", "k2"), epsilon = 0.5)
      .collect()
      .map(r => ((r.getString(0), r.getString(1)), r.getDouble(3) - r.getLong(2)))
      .toMap
    val one = out.map(o => ((o._1, o._2), o._4 - o._3)).toMap
    one.foreach { case (k, nz) =>
      assert(math.abs(half(k) - 2.0 * nz) < 1e-5,
        s"$k: ${half(k)} vs ${2.0 * nz}")
    }
  }

  test("Doremi: uniform losses stay uniform, worst domain gains, weights sum to 1, partition-invariant") {
    import spark.implicits._
    import graft.operators.Doremi
    // three domains with well-separated mean losses
    val scored = (
      (1 to 40).map(i => ("low", 1.000001)) ++
      (1 to 40).map(i => ("mid", 3.500002)) ++
      (1 to 20).map(i => ("high", 6.000003))).toDF("dom", "ce")
    val out = Doremi.domainWeights(scored, "dom", "ce",
        eta = 0.1, smoothing = 0.01, rounds = 10)
      .collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3)))
      .toMap
    assert(out("low")._1 == 40 && out("high")._1 == 20)
    assert(out("low")._2 == 1000001L && out("mid")._2 == 3500002L &&
      out("high")._2 == 6000003L, s"micro means: $out")
    // driver reference of the same fold
    val doms = Seq("high", "low", "mid") // sorted order
    val losses = Map("low" -> 1.000001, "mid" -> 3.500002, "high" -> 6.000003)
    val lbar = Math.floorDiv(
      40L * 1000001L + 40L * 3500002L + 20L * 6000003L, 100L) / 1e6
    var w = Map("low" -> 1.0 / 3, "mid" -> 1.0 / 3, "high" -> 1.0 / 3)
    (1 to 10).foreach { _ =>
      val a = doms.map(d => d -> w(d) * math.exp(0.1 * math.max(0.0, losses(d) - lbar)))
      val s = a.map(_._2).foldLeft(0.0)(_ + _)
      w = a.map { case (d, ai) => d -> (0.99 * (ai / s) + 0.01 / 3) }.toMap
    }
    doms.foreach { d =>
      val want = BigDecimal(w(d))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(math.abs(out(d)._3 - want) < 1e-9, s"$d: ${out(d)._3} vs $want")
    }
    assert(out("high")._3 > out("mid")._3 && out("mid")._3 > out("low")._3,
      "worse loss ⇒ bigger weight")
    assert(math.abs(out.values.map(_._3).sum - 1.0) < 1e-4)
    // uniform losses ⇒ weights stay uniform (excess = 0 everywhere)
    val flat = (1 to 30).map(i => (s"d${i % 3}", 2.0)).toDF("dom", "ce")
    val fw = Doremi.domainWeights(flat, "dom", "ce").collect()
      .map(_.getDouble(3))
    assert(fw.forall(x => math.abs(x - 1.0 / 3) < 1e-6))
    // partition invariance (exact-integer aggregation + driver fold)
    val re = Doremi.domainWeights(scored.repartition(13), "dom", "ce",
        eta = 0.1, smoothing = 0.01, rounds = 10)
      .collect()
      .map(r => r.getString(0) -> r.getDouble(3)).toMap
    doms.foreach(d => assert(re(d) == out(d)._3))
  }

  // ---- ByteEntropy (D95) ----------------------------------------------

  test("byteEntropy kernel: hand values, byte contract, codegen parity") {
    import graft.functions.ByteEntropy
    import spark.implicits._
    // uniform k-symbol strings hit exactly log2(k) bits
    val df = Seq(("aaaa", 1L), ("ab", 2L), ("abcd", 3L), ("", 4L),
      ("é", 5L)) // é = 2 distinct UTF-8 bytes → 1 bit
      .toDF("t", "id")
    val out = df.select(col("id"), ByteEntropy.byte_entropy(col("t")).as("h"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(out(1L) === 0.0)
    assert(math.abs(out(2L) - 1.0) < 1e-12)
    assert(math.abs(out(3L) - 2.0) < 1e-12)
    assert(out(4L) === 0.0, "empty string is 0 by contract")
    assert(math.abs(out(5L) - 1.0) < 1e-12,
      "entropy is over UTF-8 BYTES: a 2-byte code point has 1 bit")
    // null propagates; interpreted path (eval through a filter that
    // blocks codegen is overkill — compare vs the static kernel)
    val withNull = Seq((Some("abab"), 1L), (None, 2L)).toDF("t", "id")
    val rows = withNull
      .select(col("id"), ByteEntropy.byte_entropy(col("t")).as("h"))
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) None else Some(r.getDouble(1)))).toMap
    assert(rows(1L) === Some(1.0))
    assert(rows(2L) === None)
    // kernel static function agrees with the column path (codegen)
    assert(ByteEntropy.entropyOf("abab".getBytes("UTF-8")) === 1.0)
  }

  // ---- TCloseness (D93) ---------------------------------------------

  test("tCloseness orderedEmdAudit: hand-computable skew and exact zero") {
    import graft.operators.TCloseness
    import spark.implicits._
    // global buckets {0:2, 1:2}; class A all-bucket-0, class B
    // all-bucket-1: both sit at ordered EMD 0.5 from the corpus
    val df = Seq(("A", 0L), ("A", 0L), ("B", 1L), ("B", 1L)).toDF("cls", "a")
    val out = TCloseness.orderedEmdAudit(df, Seq("cls"), col("a"),
        threshold = 0.2)
      .collect().map(r => r.getString(0) ->
        (r.getAs[Long]("class_size"), r.getAs[Double]("t_emd"),
          r.getAs[Boolean]("t_close"))).toMap
    assert(out("A") === ((2L, 0.5, false)))
    assert(out("B") === ((2L, 0.5, false)))
    // a class mirroring the global distribution has t = 0 EXACTLY
    val mirror = Seq(("A", 0L), ("A", 1L), ("B", 0L), ("B", 1L))
      .toDF("cls", "a")
    TCloseness.orderedEmdAudit(mirror, Seq("cls"), col("a")).collect()
      .foreach { r =>
        assert(r.getAs[Double]("t_emd") === 0.0)
        assert(r.getAs[Boolean]("t_close"))
      }
    // single-bucket domain: identical by construction, t = 0 (no /0)
    val one = Seq(("A", 5L), ("B", 5L)).toDF("cls", "a")
    TCloseness.orderedEmdAudit(one, Seq("cls"), col("a")).collect()
      .foreach(r => assert(r.getAs[Double]("t_emd") === 0.0))
    // ordering matters: mass moved TWO buckets costs twice one bucket
    val far = Seq(("A", 0L), ("B", 2L), ("C", 1L)).toDF("cls", "a")
    val t = TCloseness.orderedEmdAudit(far, Seq("cls"), col("a")).collect()
      .map(r => r.getString(0) -> r.getAs[Double]("t_emd")).toMap
    // class A: p=(1,0,0), q=(1/3,1/3,1/3): cum diffs 2/3, 1/3 → t=0.5
    // class C: p=(0,1,0): cum diffs 1/3, 1/3 → t = 1/3 (closer)
    assert(t("A") === 0.5)
    assert(t("C") === BigDecimal(1.0 / 3.0)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    assert(t("A") > t("C"), "two-bucket move must cost more than one")
  }
}
