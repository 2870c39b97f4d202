package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.TextFunctions
import graft.operators.Dedup

/** Semantic checks for the dedup family against exact (brute-force)
  * reference computations at sf0.001 — these cover the rows-only
  * queries the DuckDB oracle can't express.
  */
class DedupSpec extends AnyFunSuite {
  import SparkTestSession._

  test("contamination: exactly the pairs with a shared 8-gram, counts exact") {
    val got = graft.queries.TextQueries.decontaminate(spark, sfDir)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2))).toMap
    // exact reference: driver-side 8-gram sets
    val grams = docs.collect().map { r =>
      val toks = r.getAs[String]("text").trim.split("\\s+")
      r.getAs[Long]("doc_id") -> toks.sliding(8).filter(_.length == 8)
        .map(_.mkString(" ")).toSet
    }.toMap
    val bench = grams.keys.filter(_ % 10 == 0)
    val want = (for {
      b <- bench; d <- grams.keys if d != b
      shared = (grams(d) intersect grams(b)).size if shared > 0
    } yield ((d, b), shared.toLong)).toMap
    assert(want.nonEmpty, "testdata should contain contaminated pairs")
    assert(got == want)
  }

  test("sampled similarity edges = full edges restricted to sample incidence") {
    for (k <- Seq(1, 4)) {
      val full = Dedup.similarityJoinEdges(docs, "text", "doc_id")
        .collect().map(r => (r.getLong(0), r.getLong(1)))
        .filter { case (a, b) => a % k == 0 || b % k == 0 }.toSet
      val sampled = Dedup
        .similarityJoinEdgesSampled(docs, "text", "doc_id", sampleK = k)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(sampled == full, s"sampleK=$k")
      if (k == 1) assert(sampled.nonEmpty, "sf0.001 plants near-dup pairs")
    }
    // the sampled face's recall estimate agrees with the exact audit
    // on gate data (both measure the same banding geometry; the
    // sampled slice is ~half the pair population at k=4)
    val exact = graft.queries.TextQueries.dedupRecallReport(spark, sfDir)
      .head()
    val est = graft.queries.TextQueries.dedupRecallReportSampled(spark, sfDir)
      .head()
    assert(est.getInt(0) == 4)
    assert(est.getLong(1) > 0, "sampled truth slice must be non-empty")
    assert(math.abs(est.getDouble(4) - exact.getDouble(3)) <= 0.05,
      s"sampled recall ${est.getDouble(4)} vs exact ${exact.getDouble(3)}")
  }

  test("incremental admission matches an exact jaccard + union-find reference") {
    val threshold = 0.8
    val sets = docs.collect().map { r =>
      val toks = r.getAs[String]("text").trim.split("\\s+")
      r.getAs[Long]("doc_id") -> toks.sliding(3).filter(_.length == 3)
        .map(_.mkString(" ")).toSet
    }.toMap
    def j(a: Long, b: Long): Double = {
      val u = (sets(a) union sets(b)).size
      if (u == 0) 0.0 else (sets(a) intersect sets(b)).size.toDouble / u
    }
    val inc = sets.keys.filter(_ % 2 == 1).toSeq.sorted
    val ex = sets.keys.filter(_ % 2 == 0).toSeq
    // union-find over incoming near-dup pairs
    val parent = scala.collection.mutable.Map(inc.map(i => i -> i): _*)
    def find(x: Long): Long =
      if (parent(x) == x) x else { parent(x) = find(parent(x)); parent(x) }
    for (a <- inc; b <- inc if a < b && j(a, b) >= threshold)
      parent(find(math.max(a, b))) = find(math.min(a, b))
    val tainted = inc.filter(i => ex.exists(e => j(i, e) >= threshold))
      .map(find).toSet
    val want = inc.groupBy(find).collect {
      case (root, members) if !tainted.contains(root) => members.min
    }.toSet
    val got = graft.queries.TextQueries.dedupIncremental(spark, sfDir)
      .collect().map(_.getLong(0)).toSet
    assert(want.nonEmpty && got == want,
      s"admitted mismatch: extra=${got -- want} missing=${want -- got}")
  }

  test("incremental admission via a persisted band index equals the direct path") {
    val existing = docs.filter(col("doc_id") % 2 === 0)
    val incoming = docs.filter(col("doc_id") % 2 === 1)
    def admitted(index: Option[org.apache.spark.sql.DataFrame]): Set[Long] =
      graft.operators.Dedup.admitIncremental(existing, incoming,
          "text", "doc_id", threshold = 0.8, existingIndex = index)
        .select(col("doc_id")).collect().map(_.getLong(0)).toSet
    val direct = admitted(None)
    // the lake pattern: the index is persisted once, read back, reused
    val path = java.nio.file.Files.createTempDirectory("graft_bandidx").toString
    graft.operators.Dedup.saveBandIndex(
      graft.operators.Dedup.bandIndex(existing, "text", "doc_id"), path)
    val loaded = graft.operators.Dedup.loadBandIndex(spark, path)
    val viaIndex = admitted(Some(loaded))
    assert(direct.nonEmpty && viaIndex == direct,
      "persisted-index admission must match recomputing the index")

    // growth path: append ONLY the admitted batch's band rows; the
    // appended artifact must equal re-signing the grown corpus
    val admittedDocs = incoming
      .join(spark.createDataset(direct.toSeq)(
          org.apache.spark.sql.Encoders.scalaLong).toDF("doc_id"),
        Seq("doc_id"), "left_semi")
    graft.operators.Dedup.saveBandIndex(
      graft.operators.Dedup.bandIndex(admittedDocs, "text", "doc_id"),
      path, append = true)
    val grownGot = graft.operators.Dedup.loadBandIndex(spark, path)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    val grownWant = graft.operators.Dedup.bandIndex(
        existing.unionByName(admittedDocs), "text", "doc_id")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    assert(grownGot == grownWant,
      "appended band index must equal re-signing the grown corpus")

    // replay tolerance (StreamingAdmission's index-first write order
    // leans on this): duplicate index rows AND rows for docs not in
    // the corpus must not change admission — candidate pairs dedup
    // and the exact-verify join drops unknown ex_ids
    graft.operators.Dedup.saveBandIndex(
      graft.operators.Dedup.bandIndex(admittedDocs, "text", "doc_id"),
      path, append = true)
    val viaNoisyIndex =
      admitted(Some(graft.operators.Dedup.loadBandIndex(spark, path)))
    assert(viaNoisyIndex == direct,
      "a duplicated / ahead-of-corpus index must not change admission")
  }

  test("char-span dedup matches a brute-force suffix reference on planted substrings") {
    import spark.implicits._
    val boiler = "SUBSCRIBE-TO-OUR-NEWSLETTER-TODAY!" // 34 chars
    val fixture: Seq[(Long, String)] = Seq(
      1L -> s"alpha beta $boiler gamma delta",
      2L -> s"$boiler completely different middle $boiler",
      3L -> "unique text with no repeats whatsoever here",
      4L -> "",
      5L -> "short",
      // a 20-char repeat must NOT trigger at minLen=25
      6L -> s"pre ${boiler.take(20)} xx not long enough qq ${boiler.take(20)} yy")
    val docs = fixture.toDF("doc_id", "text")
    val L = 25

    // brute-force suffix-style reference: every position covered by a
    // length-L gram with >= 2 corpus occurrences is removed
    val occ = fixture.flatMap { case (id, t) =>
      (0 to t.length - L).map(i => (t.substring(i, i + L), id, i)) }
    val hot = occ.groupBy(_._1).collect {
      case (g, os) if os.size >= 2 => g }.toSet
    val want = fixture.map { case (id, t) =>
      val cov = occ.collect { case (g, `id`, i) if hot(g) =>
        i until (i + L) }.flatten.toSet
      val clean = t.zipWithIndex.collect {
        case (c, i) if !cov(i) => c }.mkString
      (id, clean, t.length - clean.length)
    }.toSet
    val got = graft.operators.SuffixDedup
      .stripRepeatedCharSpans(docs, "text", "doc_id", minLen = L)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getInt(2))).toSet
    assert(got == want, s"extra=${got -- want} missing=${want -- got}")
    assert(want.exists(_._3 > 0), "fixture must actually remove something")

    // longest repeated span vs brute force (monotone binary search
    // must land on the true maximum, incl. the space-extended repeat)
    val maxLen = fixture.map(_._2.length).max
    val brute = (maxLen to 1 by -1).iterator.map { len =>
      val gs = fixture.flatMap { case (_, t) =>
        (0 to t.length - len).map(i => t.substring(i, i + len)) }
      val rep = gs.groupBy(identity).filter(_._2.size >= 2)
      if (rep.isEmpty) None
      else { val g = rep.keys.min; Some((g, len, rep(g).size.toLong)) }
    }.collectFirst { case Some(x) => x }.get
    val lrs = graft.operators.SuffixDedup
      .longestRepeatedSpan(docs, "text", "doc_id")
      .collect().map(r => (r.getString(0), r.getInt(1), r.getLong(2))).head
    assert(lrs == brute, s"got $lrs want $brute")

    // no repeats at all -> empty result frame
    assert(graft.operators.SuffixDedup.longestRepeatedSpan(
      Seq(7L -> "abcdefg").toDF("doc_id", "text"), "text", "doc_id")
      .isEmpty)
  }

  test("strip_covered_windows kernel: codepoints, overlap, unsorted starts") {
    import org.apache.spark.unsafe.types.UTF8String
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    def strip(s: String, starts: Seq[Int], len: Int): String =
      graft.functions.GraftKernels.stripCoveredWindows(
        UTF8String.fromString(s), new GenericArrayData(starts.toArray),
        len).toString
    // reference: union of [p, p+len-1] over 1-based codepoint starts
    def ref(s: String, starts: Seq[Int], len: Int): String = {
      val cps = s.codePoints().toArray
      val cov = starts.flatMap(p => (p - 1) until math.min(p - 1 + len,
        cps.length)).toSet
      new String(cps.zipWithIndex.collect {
        case (c, i) if !cov(i) => c }, 0,
        cps.zipWithIndex.count { case (_, i) => !cov(i) })
    }
    val uni = "aéb😀cdে́fgh" // astral + combining marks
    for {
      (s, starts, len) <- Seq(
        ("abcdefghij", Seq(2, 5), 3),          // overlap-free
        ("abcdefghij", Seq(1, 2, 2), 4),       // overlapping + duplicate
        ("abcdefghij", Seq(8, 3), 3),          // unsorted
        ("abcdefghij", Seq(1), 10),            // full coverage
        ("abcdefghij", Seq.empty[Int], 5),     // no repeats
        (uni, Seq(2, 4), 2),                   // non-BMP codepoint steps
        (uni, Seq(1), 3),
        ("", Seq.empty[Int], 4))
    } assert(strip(s, starts, len) == ref(s, starts, len),
      s"s=$s starts=$starts len=$len")
  }

  test("contamination: bloom-pruned shuffle path equals the broadcast path") {
    val bench = docs.filter(col("doc_id") % 10 === 0)
    def run(small: Boolean) = graft.operators.Dedup
      .contamination(docs, bench, "text", "doc_id", n = 8,
        benchIsSmall = Some(small))
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2))).toMap
    val viaBroadcast = run(small = true)
    val viaBloomShuffle = run(small = false)
    assert(viaBroadcast.nonEmpty)
    assert(viaBloomShuffle == viaBroadcast,
      "the bloom prefilter must not change which pairs/counts survive")
  }

  test("training order: deterministic non-identity permutation, seed-sensitive") {
    val ids = docs.select(col("doc_id")).collect().map(_.getLong(0)).sorted.toSeq
    val a = graft.queries.TextQueries.trainingOrder(spark, sfDir)
      .collect().map(_.getLong(0)).toSeq
    val b = graft.queries.TextQueries.trainingOrder(spark, sfDir)
      .collect().map(_.getLong(0)).toSeq
    val other = graft.queries.TextQueries.trainingOrder(spark, sfDir, seed = 7L)
      .collect().map(_.getLong(0)).toSeq
    assert(a == b, "same seed must reproduce the exact order")
    assert(a.sorted == ids, "output must be a permutation of the corpus")
    assert(a != a.sorted, "hash order should not be id order")
    assert(other != a, "different seed should permute differently")
    assert(other.sorted == ids)
  }

  test("connectedComponents resolves a 50-node path graph within few rounds") {
    import spark.implicits._
    // worst case for plain min-propagation (diameter 49); pointer
    // jumping must collapse it in O(log n) rounds — well under 10.
    val edges = (0L until 49L).map(i => (i, i + 1)).toDF("id_a", "id_b")
    val nodes = (0L to 49L).toDF("id")
    val labels = Dedup.connectedComponents(edges, nodes, maxIters = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(labels.length == 50)
    assert(labels.forall(_._2 == 0L),
      s"every node must resolve to component min 0, got ${labels.filter(_._2 != 0L).take(5).toSeq}")
  }

  test("connectedComponents throws rather than returning partial labels") {
    import spark.implicits._
    val edges = (0L until 49L).map(i => (i, i + 1)).toDF("id_a", "id_b")
    val nodes = (0L to 49L).toDF("id")
    intercept[IllegalStateException] {
      Dedup.connectedComponents(edges, nodes, maxIters = 2)
    }
  }

  test("keep-best canonical selection: exactly one winner per cluster, and it's the best") {
    val rows = graft.queries.TextQueries.dedupKeepBest(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2)))
    val quality = docs.select(col("doc_id"),
        graft.functions.TextFunctions.qualityScore(col("text")).as("q"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(rows.length == docs.count())
    rows.groupBy(_._2).foreach { case (canon, members) =>
      val kept = members.filter(_._3)
      assert(kept.length == 1, s"cluster $canon: ${kept.length} winners")
      // the winner has max quality (ties → lowest id)
      val best = members.map(m => (quality(m._1), -m._1)).max
      assert((quality(kept.head._1), -kept.head._1) == best,
        s"cluster $canon kept ${kept.head._1}, best was $best")
    }
    // multi-doc clusters exist (planted near-dups) and in at least one
    // the winner is NOT the min id — the rule genuinely differs from
    // dedup_resolve's min-id canonical
    val multi = rows.groupBy(_._2).filter(_._2.length > 1)
    assert(multi.nonEmpty)
    assert(multi.exists { case (_, ms) =>
      ms.filter(_._3).head._1 != ms.map(_._1).min },
      "expected at least one cluster where best != min id")
  }

  test("paragraph dedup matches a driver-side reference and drops cross-doc boilerplate only") {
    val W = 12
    val got = graft.queries.TextQueries.paragraphDedup(spark, sfDir)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    // driver reference: same segmentation, same >= 2-distinct-docs rule
    val texts = docs.select(col("doc_id"), col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1))).sortBy(_._1)
    def paras(t: String): Seq[String] =
      t.trim.split("\\s+").grouped(W).map(_.mkString(" ")).toSeq
    val byPara = texts.flatMap { case (id, t) => paras(t).map(_ -> id) }
      .groupBy(_._1).view.mapValues(_.map(_._2).distinct.size).toMap
    val want = texts.map { case (id, t) =>
      val ps = paras(t)
      val kept = ps.filter(p => byPara(p) < 2)
      id -> ((ps.size.toLong, kept.size.toLong, kept.mkString(" ")))
    }.toMap
    assert(got == want,
      s"diff=${(got.toSet -- want.toSet).take(2)} / ${(want.toSet -- got.toSet).take(2)}")
    // the rule fired: this corpus has cross-doc duplicate paragraphs
    assert(want.exists { case (_, (np, nk, _)) => nk < np },
      "expected at least one dropped boilerplate paragraph")
    assert(want.forall { case (_, (np, nk, _)) => nk <= np })
  }

  test("stripRepeatedSpans matches an exact driver-side reference") {
    val n = 4
    val toks = docs.collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("text").trim.split("\\s+").toSeq)
      .toMap
    val counts = toks.values.flatMap(_.sliding(n).filter(_.length == n)
      .map(_.mkString(" "))).groupBy(identity).map { case (g, o) => g -> o.size }
    val hot = counts.collect { case (g, c) if c >= 2 => g }.toSet
    assert(hot.nonEmpty, "testdata should contain repeated 4-grams")
    val want = toks.map { case (id, tk) =>
      val covered = tk.sliding(n).zipWithIndex
        .collect { case (w, i) if w.length == n && hot(w.mkString(" ")) =>
          i until i + n }
        .flatten.toSet
      val clean = tk.zipWithIndex.collect { case (t, i) if !covered(i) => t }
      id -> ((clean.mkString(" "), tk.length - clean.length))
    }
    val got = Dedup.stripRepeatedSpans(docs, "text", "doc_id").collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getInt(2)))).toMap
    assert(got == want)
    assert(want.values.map(_._2).sum > 0, "removal should be non-degenerate")
  }

  test("stripRepeatedSpans: planted boilerplate vanishes everywhere, short docs untouched") {
    import spark.implicits._
    val boiler = "all rights reserved contact us here"
    val corpus = Seq(
      (1L, s"alpha beta gamma delta $boiler"),
      (2L, s"$boiler epsilon zeta eta theta"),
      (3L, s"iota kappa $boiler lambda mu"),
      (4L, "completely unique sentence nothing shared whatsoever today"),
      (5L, "tiny doc") // shorter than the span width
    ).toDF("doc_id", "text")
    val out = Dedup.stripRepeatedSpans(corpus, "text", "doc_id", n = 4, minCount = 2)
      .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getInt(2)))).toMap
    val bt = boiler.split(" ").toSet
    for (id <- Seq(1L, 2L, 3L)) {
      val kept = out(id)._1.split("\\s+").filter(_.nonEmpty).toSet
      assert(kept.intersect(bt).isEmpty, s"doc $id kept boilerplate tokens: $kept")
      assert(out(id)._2 == 6, s"doc $id should lose exactly the 6 boilerplate tokens")
    }
    assert(out(4L) == (("completely unique sentence nothing shared whatsoever today", 0)))
    assert(out(5L) == (("tiny doc", 0)))
  }

  private lazy val docs =
    graft.sources.Tables.documents(spark, sfDir).cache()

  /** Exact pairwise trigram jaccard for every doc pair (50 docs →
    * 1225 pairs at sf0.001): the ground truth LSH is judged against.
    */
  private lazy val exactPairs = {
    val sh = docs.select(col("doc_id").as("id"),
      TextFunctions.shingles(TextFunctions.tokens(col("text")), 3).as("sh"))
    val l = sh.select(col("id").as("id_a"), col("sh").as("sh_a"))
    val r = sh.select(col("id").as("id_b"), col("sh").as("sh_b"))
    l.crossJoin(r).filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        TextFunctions.jaccard(col("sh_a"), col("sh_b")).as("j"))
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
  }

  test("minhashLsh finds every pair with true jaccard >= 0.9 and reports exact jaccard") {
    val got = Dedup.minhashLsh(docs, "text", "doc_id")
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    val planted = exactPairs.filter(_._2 >= 0.9).keySet
    assert(planted.nonEmpty, "testdata should contain planted near-dups")
    val missed = planted -- got.keySet
    assert(missed.isEmpty, s"LSH missed high-jaccard pairs: $missed")
    // no false jaccards: reported values equal the exact computation
    got.foreach { case (k, j) =>
      assert(math.abs(j - exactPairs(k)) < 1e-12, s"pair $k jaccard drift")
      assert(j >= 0.5, s"pair $k below threshold")
    }
    // full set equality with the exact >= 0.5 pairs — the property the
    // DuckDB oracle for dedup_minhash_lsh relies on: every true pair on
    // the gate corpora sits at j >= 0.889 where the 8x4 band miss
    // probability (1-j^4)^8 is ~4e-4, and the pipeline is
    // deterministic, so LSH + exact verify IS the exact pair set here
    assert(got.keySet == exactPairs.filter(_._2 >= 0.5).keySet,
      "LSH output must equal the exact jaccard >= 0.5 pair set")
  }

  test("b-bit minhash audit: bit-exact vs an independent driver reference") {
    val got = Dedup.bbitMinhashAudit(docs, "text", "doc_id")
      .collect().map(r => ((r.getLong(0), r.getLong(1)),
        (r.getDouble(2), r.getDouble(3), r.getBoolean(4)))).toMap
    // same pair set as the exact >= 0.5 set (the LSH completeness the
    // dedup_minhash_lsh test already pins)
    assert(got.keySet == exactPairs.filter(_._2 >= 0.5).keySet)
    // independent reference: naive signature from Spark's public XXH64
    // + an inline splitmix64, low-4-bit lanes, Li-Konig correction
    def mix(z0: Long): Long = {
      var z = z0 + 0x9e3779b97f4a7c15L
      z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
      z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
      z ^ (z >>> 31)
    }
    val k = 32; val b = 4
    val sigs = docs.collect().map { r =>
      val sh = r.getAs[String]("text").trim.split("\\s+").toSeq
        .sliding(3).filter(_.length == 3).map(_.mkString(" ")).toSeq.distinct
      val mins = Array.fill(k)(Long.MaxValue)
      sh.foreach { g =>
        val u = org.apache.spark.unsafe.types.UTF8String.fromString(g)
        val base = org.apache.spark.sql.catalyst.expressions.XXH64
          .hashUnsafeBytes(u.getBaseObject, u.getBaseOffset, u.numBytes, 42L)
        (0 until k).foreach { s =>
          val h = mix(base ^ mix(s.toLong))
          if (h < mins(s)) mins(s) = h
        }
      }
      r.getAs[Long]("doc_id") -> mins.map(_ & ((1L << b) - 1))
    }.toMap
    val c = 1.0 / (1L << b)
    got.foreach { case ((a, o), (j, est, kept)) =>
      val m = sigs(a).zip(sigs(o)).count { case (x, y) => x == y }
      val want = (m.toDouble / k - c) / (1.0 - c)
      assert(est == want, s"pair ($a,$o) estimate mismatch: $est vs $want")
      assert(kept == (est >= 0.5))
      assert(math.abs(j - exactPairs((a, o))) < 1e-12)
      // sanity: with k=32 lanes the estimate tracks the exact value
      assert(math.abs(est - j) < 0.35, s"estimator off by ${math.abs(est - j)}")
    }
  }

  test("b-bit production path equals the audit's kept set on gate data") {
    val prod = Dedup.bbitMinhashPairs(docs, "text", "doc_id")
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    val audit = Dedup.bbitMinhashAudit(docs, "text", "doc_id")
      .filter(col("kept_bbit"))
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(3))).toMap
    // gate corpora have no mid-jaccard pairs, so the estimator admits
    // exactly the exact-verify set — the same separation argument the
    // LSH oracle uses; where the corpora differ the audit key is the
    // tool that MEASURES the difference
    assert(prod == audit)
  }

  test("ICWS weighted jaccard: exact leg matches a driver recompute; multiset sensitivity") {
    import spark.implicits._
    val fixture = Seq(
      (1L, "a a a b"), (2L, "a b"), // same SET {a,b}; weighted differs
      (3L, "x y z"), (4L, "x y z"), // identical multisets: exact = 1
      (5L, "p q"), (6L, "r s")      // disjoint: exact = 0
    ).toDF("doc_id", "text")
    val rows = Dedup.weightedJaccardAudit(fixture, "text", "doc_id")
      .collect().map(r => r.getLong(0) -> (r.getDouble(2), r.getDouble(3))).toMap
    // pair (1,2): min/max sums = (1+1)/(3+1) = 0.5 — the SET jaccard
    // would be 1.0; the weighted audit sees the repetition
    assert(rows(1L)._1 == 0.5)
    // identical multisets estimate exactly 1 (every sample agrees)
    assert(rows(3L)._1 == 1.0 && rows(3L)._2 == 1.0)
    // disjoint multisets: exact 0; ICWS can only collide by hash
    // accident (2^-64 per sample) — must be 0 here
    assert(rows(5L)._1 == 0.0 && rows(5L)._2 == 0.0)
    // estimates bounded
    rows.values.foreach { case (e, i) =>
      assert(e >= 0.0 && e <= 1.0 && i >= 0.0 && i <= 1.0)
    }
    // gate-corpus sanity: the estimator tracks exact with k=32 samples
    val corpus = Dedup.weightedJaccardAudit(docs, "text", "doc_id")
      .collect().map(r => (r.getDouble(2), r.getDouble(3)))
    val mae = corpus.map { case (e, i) => math.abs(e - i) }.sum / corpus.length
    assert(mae < 0.12, s"ICWS mean abs error $mae too high for k=32")
  }

  test("leakage-safe split: near-dup clusters never straddle splits") {
    val rows = graft.queries.TextQueries.leakageSafeSplit(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    assert(rows.length == docs.count())
    assert(rows.forall(r => r._3 >= 0 && r._3 <= 2))
    // every member of a cluster gets its cluster's split
    rows.groupBy(_._2).foreach { case (c, xs) =>
      assert(xs.map(_._3).distinct.length == 1,
        s"cluster $c straddles splits: ${xs.toSeq}")
    }
    // and the planted near-dup pairs really do share clusters
    val pairs = Dedup.minhashLsh(docs, "text", "doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val splitOf = rows.map(r => r._1 -> r._3).toMap
    pairs.foreach { case (a, b) =>
      assert(splitOf(a) == splitOf(b), s"near-dups $a/$b split apart")
    }
    assert(pairs.nonEmpty && rows.map(_._3).distinct.length > 1)
  }

  test("dedupSourceMatrix rolls the pair set up by canonical source cell") {
    val srcOf = docs.select(col("doc_id"), col("source"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val pairs = Dedup.minhashLsh(docs, "text", "doc_id")
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2)))
    assert(pairs.nonEmpty)
    val expect = pairs.groupBy { case ((a, b), _) =>
      val (sa, sb) = (srcOf(a), srcOf(b))
      if (sa <= sb) (sa, sb) else (sb, sa)
    }.map { case (cell, xs) =>
      cell -> (xs.length.toLong, xs.map(_._2).max)
    }
    val got = graft.queries.TextQueries.dedupSourceMatrix(spark, sfDir)
      .collect()
      .map(r => (r.getString(0), r.getString(1)) -> (r.getLong(2), r.getDouble(3)))
      .toMap
    assert(got == expect, s"got $got\nwant $expect")
    got.keys.foreach { case (a, b) => assert(a <= b, "cells must be canonical") }
  }

  test("simhash is deterministic and near-identical docs have small hamming distance") {
    val pairs = Dedup.simhashPairs(docs, "text", "doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    // every reported pair must satisfy the hamming bound
    assert(pairs.forall(_._3 <= 7))
    // near-identical pairs (j >= 0.985 ⇒ hamming well under the bound
    // on this corpus) must all be caught — pigeonhole guarantees it
    val planted = exactPairs.filter(_._2 >= 0.985).keySet
    val got = pairs.map(p => (p._1, p._2)).toSet
    assert(planted.subsetOf(got),
      s"simhash missed near-identical pairs: ${planted -- got}")
    // determinism across evaluations
    val sig1 = docs.select(Dedup.simhash(TextFunctions.tokens(col("text"))))
      .collect().map(_.getLong(0)).toSeq
    val sig2 = docs.select(Dedup.simhash(TextFunctions.tokens(col("text"))))
      .collect().map(_.getLong(0)).toSeq
    assert(sig1 == sig2)
  }

  test("LSH-routed resolution matches the exact inverted-index resolution") {
    // scale path (VERDICT r3 item 3): minhash candidates → CC must
    // assign the same canonical ids as the exact all-pairs index on
    // the planted-near-dup corpus (the planted pairs sit at j ≥ 0.9,
    // where 8×4 LSH recall is ~1 — pinned by the minhashLsh test above)
    val exact = graft.queries.TextQueries.dedupResolve(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val viaLsh = Dedup.resolveCandidates(docs, "text", "doc_id",
        Dedup.minhashLsh(docs, "text", "doc_id"), verified = true)
      .orderBy(col("id"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(viaLsh == exact)
    // unverified candidates (raw id pairs) go through the exact-Jaccard
    // verify: a garbage pair must not merge components
    import spark.implicits._
    val garbage = exactPairs.find(_._2 < 0.1).get._1
    val noisy = Dedup.minhashLsh(docs, "text", "doc_id")
      .select(col("id_a"), col("id_b"))
      .unionAll(Seq(garbage).toDF("id_a", "id_b"))
    val verified = Dedup.resolveCandidates(docs, "text", "doc_id", noisy)
      .orderBy(col("id"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(verified == exact,
      "unverified garbage candidate must be filtered by the exact verify")
  }

  test("noveltyScore: shared grams counted once per doc, unique and short docs score zero") {
    import spark.implicits._
    val docs = Seq(
      (1L, "one two three four five six seven eight alpha"),
      (2L, "zzz one two three four five six seven eight"),
      (3L, "u1 u2 u3 u4 u5 u6 u7 u8"),
      (4L, "hi there")).toDF("doc_id", "text")
    val got = graft.operators.Dedup.noveltyScore(docs, "text", "doc_id", n = 8)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    // docs 1/2 share exactly the 8-gram "one ... eight"; each has 2 grams
    assert(got(1L) == (2L, 1L, 0.5), s"doc1: ${got(1L)}")
    assert(got(2L) == (2L, 1L, 0.5), s"doc2: ${got(2L)}")
    assert(got(3L) == (1L, 0L, 0.0), "unique doc must score 0")
    assert(got(4L) == (0L, 0L, 0.0), "short doc: 0 grams, 0 dup, frac 0")
  }

  test("containment fires on a planted partial copy that jaccard misses") {
    import spark.implicits._
    val long = (1 to 40).map(i => s"w$i").mkString(" ")      // 38 trigrams
    val short = (1 to 10).map(i => s"w$i").mkString(" ")     // 8 trigrams, all shared
    val other = (100 to 110).map(i => s"x$i").mkString(" ")  // disjoint
    val docs = Seq((1L, long), (2L, short), (3L, other)).toDF("doc_id", "text")
    val got = Dedup.containmentJoinEdges(docs, "text", "doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(got.toSeq == Seq((1L, 2L, 1.0)),
      s"exact subset must score containment 1.0, got ${got.toSeq}")
    // the same pair is BELOW any useful jaccard threshold: 8/38
    val jac = Dedup.similarityJoinEdges(docs, "text", "doc_id").count()
    assert(jac == 0, "jaccard at 0.5 must miss the partial copy")
    // symmetric near-dups still pass: two docs sharing all shingles
    val twins = Seq((1L, short), (2L, short)).toDF("doc_id", "text")
    val t = Dedup.containmentJoinEdges(twins, "text", "doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(t.toSeq == Seq((1L, 2L, 1.0)))
  }

  test("exact dedup: digests are unique per text and counts sum to corpus size") {
    val out = graft.queries.TextQueries.dedupExact(spark, sfDir).collect()
    assert(out.map(_.getLong(2)).sum == docs.count())
  }

  test("shingles: shorter than n yields empty array, not a descending sequence") {
    import spark.implicits._
    val tiny = Seq("one two", "a b c d").toDF("text")
    val out = tiny.select(TextFunctions.shingles(
      TextFunctions.tokens(col("text")), 3).as("sh"))
      .collect().map(_.getSeq[String](0))
    assert(out(0).isEmpty)
    assert(out(1) == Seq("a b c", "b c d"))
  }

  test("charContamination: planted 30-char copy flagged, 29-char near-miss clean, counts exact") {
    import spark.implicits._
    import graft.operators.SuffixDedup
    val span30 = "ABCDEFGHIJKLMNOPQRSTUVWXYZ0123" // exactly 30 chars
    assert(span30.length == 30)
    val bench = Seq((100L, s"eval question: $span30 end"))
      .toDF("doc_id", "text")
    val corpus = Seq(
      // exact 30-char overlap → flagged; the copy sits mid-document
      (1L, s"some prefix $span30 some suffix"),
      // 28 shared chars behind non-matching boundaries → every
      // 30-window differs → clean
      (2L, "some prefix-" + span30.drop(1).dropRight(1) + "-some suffix"),
      // no overlap at all
      (3L, "completely unrelated text with nothing shared here at all"),
      // a LONGER shared region: " question: " + span + " " = 42
      // shared chars → 13 distinct shared 30-windows
      (4L, s"xx question: $span30 yy"))
      .toDF("doc_id", "text")
    val got = SuffixDedup.charContamination(corpus, bench,
        "text", "doc_id", len = 30)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got.contains(1L) && !got.contains(2L) && !got.contains(3L),
      s"got $got")
    assert(got(4L) == 13L, s"got $got")
    // doc 1's shared region is " " + span30 + " " = 32 chars →
    // 3 distinct shared 30-windows (counts verified by brute force)
    assert(got(1L) == 3L, s"got $got")
    // partition invariance
    val re = SuffixDedup.charContamination(corpus.repartition(5), bench,
        "text", "doc_id", len = 30)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(re == got)
  }
}
