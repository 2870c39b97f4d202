package graft

import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.{EncodingRepair, UrlFunctions, UrlKernels}

/** Round-17 string kernels: RFC 3986 URL canonicalization (D128),
  * mojibake repair (D129), and the FS∘JW linkage composition (D130) —
  * hand-pinned cases plus independent Scala replays of the faces.
  */
class UrlEncodingSpec extends AnyFunSuite {
  import SparkTestSession._

  private def canon(s: String): String =
    UrlKernels.canonicalize(UTF8String.fromString(s)).toString

  test("URL canonicalization: RFC 3986 pinned ladder") {
    // case + default port + fragment + reserved-escape uppercasing
    assert(canon("HTTP://WWW.Example.COM:80/a%2fb?X=1#frag") ==
      "http://www.example.com/a%2Fb?X=1")
    assert(canon("https://Example.com:443/") == "https://example.com/")
    // non-default port survives
    assert(canon("https://example.com:8080/p") == "https://example.com:8080/p")
    // empty path with authority -> '/'
    assert(canon("https://example.com") == "https://example.com/")
    // bare port colon stripped
    assert(canon("https://example.com:/x") == "https://example.com/x")
    // unreserved escapes decode (%7E ~, %41 A, %5A Z, %30 0, %2D -)
    assert(canon("https://example.com/%7Euser/%41%5A%30%2D") ==
      "https://example.com/~user/AZ0-")
    // utm_* dropped case-insensitively; bare 'utm' (no underscore) kept;
    // survivor ORDER preserved
    assert(canon("https://example.com/a?utm_source=x&b=2&UTM_Medium=y&utm=z")
      == "https://example.com/a?b=2&utm=z")
    // all params dropped -> no '?'
    assert(canon("https://example.com/a?utm_source=x") ==
      "https://example.com/a")
    // invalid percent escapes left verbatim
    assert(canon("https://example.com/a%2") == "https://example.com/a%2")
    assert(canon("https://example.com/a%zz") == "https://example.com/a%zz")
    // non-hierarchical input: fragment-stripped only
    assert(canon("example.com/a#b") == "example.com/a")
    // userinfo preserved verbatim, host still lowered
    assert(canon("https://User@Example.com/x") == "https://User@example.com/x")
    // path/query case is NOT touched (only scheme+host lower)
    assert(canon("s3://Bucket/KeY?Q=V") == "s3://bucket/KeY?Q=V")
    // %26 ('&', reserved) must NOT decode — would change query structure
    assert(canon("https://example.com/a?q=x%26y=1&b=2") ==
      "https://example.com/a?q=x%26y=1&b=2")
  }

  test("URL canonicalization: codegen expression == kernel") {
    val urls = Seq(
      "HTTP://WWW.Example.COM:80/a%2fb?X=1#frag",
      "https://example.com/%7Euser?utm_source=x&id=7",
      "not a url at all", "https://h:0443/p", "ftp://H.Ost:21/f")
    import spark.implicits._
    val got = urls.toDF("u")
      .select(UrlFunctions.canonical_url(col("u"))).as[String].collect()
    assert(got.toSeq == urls.map(canon))
    // null-safe
    val nulls = Seq[Option[String]](None).toDF("u")
      .select(UrlFunctions.canonical_url(col("u"))).collect()
    assert(nulls.head.isNullAt(0))
  }

  test("mojibake repair: classic ladder byte-exact") {
    assert(EncodingRepair.mojibake("é") == "Ã©")
    assert(EncodingRepair.mojibake("’") == "â€™")
    assert(EncodingRepair.mojibake("”") == "â€")
    import spark.implicits._
    val cases = Seq(
      "Ã©" -> "é",
      "dÃ©jÃ  vu" -> "déjà vu", // à's image is Ã + NBSP (C3 A0)
      "donâ€™t" -> "don’t",
      "â€œquotedâ€" -> "“quoted”",
      "Â£9 â‚¬5" -> "£9 €5",
      "StraÃŸe" -> "Straße",
      "em â€” dash â€¦ fin" -> "em — dash … fin",
      "plain ascii stays" -> "plain ascii stays")
    val got = cases.map(_._1).toDF("s")
      .select(EncodingRepair.repair(col("s"))).as[String].collect()
    assert(got.toSeq == cases.map(_._2))
  }

  test("mojibake repair table invariants") {
    val images = EncodingRepair.table.map(_._1)
    assert(images.distinct.size == images.size, "images must be unique")
    // no repair OUTPUT may be a pattern lead char (order-stability)
    val leads = Set("Â", "Ã", "â")
    assert(EncodingRepair.table.forall(e => !leads.contains(e._2)))
    // longest-first application order
    assert(images.map(_.length).sliding(2).forall(w => w(0) >= w(1)))
    // every phrase round-trips through the chain semantics (Scala fold
    // mirror of the replace chain)
    EncodingRepair.phrases.foreach { p =>
      val dirty = EncodingRepair.mojibake(p)
      val repaired = EncodingRepair.table.foldLeft(dirty) {
        case (acc, (m, t)) => acc.replace(m, t)
      }
      assert(repaired == p, s"phrase '$p' did not round-trip")
    }
  }

  test("fs_jw_linkage: independent Scala replay of the weight ledger") {
    val out = graft.queries.WarehouseQueries.fsJwLinkage(spark, sfDir)
      .collect()
    assert(out.length == 50)
    // driver-side u statistics (exact ints, one IEEE divide)
    val parts = graft.sources.Tables.part(spark, sfDir)
      .select(col("p_partkey"), col("p_name"), col("p_brand"), col("p_type"))
      .collect()
    val n = parts.length.toDouble
    def ss(f: Int): Double = parts.groupBy(_.get(f)).values
      .map(g => g.size.toLong * g.size).sum.toDouble
    val (uName, uBrand, uType) =
      (ss(1) / (n * n), ss(2) / (n * n), ss(3) / (n * n))
    def wa(m: Double, u: Double) = math.log(m / u)
    def wd(m: Double, u: Double) = math.log((1.0 - m) / (1.0 - u))
    out.foreach { r =>
      val jw = r.getAs[Double]("jw")
      val nameTerm =
        if (jw >= 0.94) wa(0.95, uName)
        else if (jw >= 0.7)
          math.max(wd(0.95, uName),
            wa(0.95, uName) - (wa(0.95, uName) - wd(0.95, uName)) *
              (1.0 - jw) * 4.5)
        else wd(0.95, uName)
      val brandTerm = if (r.getAs[Boolean]("agree_brand")) wa(0.9, uBrand)
        else wd(0.9, uBrand)
      val typeTerm = if (r.getAs[Boolean]("agree_type")) wa(0.85, uType)
        else wd(0.85, uType)
      val want = BigDecimal((nameTerm + brandTerm) + typeTerm)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(math.abs(want - r.getAs[Double]("score")) < 1e-9,
        s"pair (${r.getLong(0)},${r.getLong(1)}): want $want got ${r.get(5)}")
    }
    // ordering: score desc with (id_a, id_b) tiebreaks
    val keys = out.map(r => (-r.getAs[Double]("score"), r.getLong(0),
      r.getLong(1))).toSeq
    assert(keys == keys.sorted)
  }

  test("url_dedup: keep-best replay via the kernel") {
    val got = graft.queries.TextQueries.urlDedup(spark, sfDir).collect()
      .map(r => (r.getString(0), (r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    val docs = graft.sources.Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("n_chars")).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    // groups of 3 consecutive doc_ids share one canonical URL
    val groups = docs.groupBy(_._1 / 3)
    assert(got.size == groups.size)
    groups.foreach { case (g, members) =>
      val url = s"https://src${g % 20}.example.com/wiki/Page_$g?id=$g&q=a%2Fb"
      val best = members.minBy { case (id, nc) => (-nc, id) }
      assert(got(url) == (best._1, best._2, members.length.toLong),
        s"group $g")
    }
  }

  test("fs_em_linkage: EM fit replayed by an independent implementation") {
    import graft.operators.FellegiSunter
    // the ACTUAL census the face fits (tiny: <= 8 rows)
    val census = graft.queries.WarehouseQueries
      .fsEmCensusForTest(spark, sfDir)
    assert(census.nonEmpty && census.map(_._2).sum > 0)
    // independent replay: functional style, same model, same init
    def replay(iters: Int): (Double, Seq[Double], Seq[Double],
        Seq[Double]) = {
      val k = census.head._1.size
      def clamp(x: Double) = math.min(1.0 - 1e-6, math.max(1e-6, x))
      def step(p: Double, m: Seq[Double], u: Seq[Double]) = {
        val ws = census.map { case (g, n) =>
          val pm = p * g.zip(m).map { case (gj, mj) =>
            if (gj) mj else 1.0 - mj }.product
          val pu = (1.0 - p) * g.zip(u).map { case (gj, uj) =>
            if (gj) uj else 1.0 - uj }.product
          (g, n.toDouble, pm / (pm + pu))
        }
        val sw = ws.map { case (_, n, w) => w * n }.sum
        val sn = ws.map(_._2).sum
        val su = ws.map { case (_, n, w) => (1.0 - w) * n }.sum
        (clamp(sw / sn),
          (0 until k).map(j => clamp(ws.collect {
            case (g, n, w) if g(j) => w * n }.sum / sw)),
          (0 until k).map(j => clamp(ws.collect {
            case (g, n, w) if g(j) => (1.0 - w) * n }.sum / su)))
      }
      def loglik(p: Double, m: Seq[Double], u: Seq[Double]): Double =
        census.map { case (g, n) =>
          val pm = p * g.zip(m).map { case (gj, mj) =>
            if (gj) mj else 1.0 - mj }.product
          val pu = (1.0 - p) * g.zip(u).map { case (gj, uj) =>
            if (gj) uj else 1.0 - uj }.product
          n * math.log(pm + pu)
        }.sum
      var st = (0.1, Seq.fill(k)(0.9), Seq.fill(k)(0.1))
      val lls = scala.collection.mutable.ArrayBuffer(
        loglik(st._1, st._2, st._3))
      (1 to iters).foreach { _ =>
        st = step(st._1, st._2, st._3)
        lls += loglik(st._1, st._2, st._3)
      }
      (st._1, st._2, st._3, lls.toSeq)
    }
    val (p, m, u, lls) = replay(30)
    val got = FellegiSunter.emEstimate(census, iters = 30)
    // the two implementations fold in different orders, so allow ulps
    assert(math.abs(got.p - p) < 1e-12)
    (0 until 3).foreach { j =>
      assert(math.abs(got.m(j) - m(j)) < 1e-12, s"m($j)")
      assert(math.abs(got.u(j) - u(j)) < 1e-12, s"u($j)")
    }
    // EM guarantee: observed-data log-likelihood never decreases
    lls.sliding(2).foreach { w => assert(w(1) >= w(0) - 1e-9) }
    // params in range
    assert(got.p > 0 && got.p < 1)
    assert((got.m ++ got.u).forall(x => x >= 1e-6 && x <= 1 - 1e-6))
  }

  test("fs_em_linkage: every output row's ledger replays from the fit") {
    val prm = graft.queries.WarehouseQueries.fsEmParamsForTest(spark, sfDir)
    val out = graft.queries.WarehouseQueries.fsEmLinkage(spark, sfDir)
      .collect()
    assert(out.length == 50)
    out.foreach { r =>
      def term(flag: Boolean, j: Int) =
        if (flag) math.log(prm.m(j) / prm.u(j))
        else math.log((1.0 - prm.m(j)) / (1.0 - prm.u(j)))
      val want = BigDecimal((term(r.getBoolean(2), 0) +
          term(r.getBoolean(3), 1)) + term(r.getBoolean(4), 2))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(math.abs(want - r.getAs[Double]("score")) < 1e-9)
    }
  }

  test("stream_url_dedup: 3-micro-batch keep-best ≡ batch url_dedup") {
    val stream = graft.queries.StreamFaces.streamUrlDedup(spark, sfDir)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val batch = graft.queries.TextQueries.urlDedup(spark, sfDir)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(stream.toSeq == batch.toSeq,
      "cross-batch keep-best must equal the batch argmax row for row")
  }

  test("media_decode_jpeg_witness: zero cross-decoder mismatches") {
    val r = graft.queries.MultimodalQueries
      .mediaDecodeJpegWitness(spark, sfDir).head()
    assert(r.getAs[Long]("n_docs") > 0)
    assert(r.getAs[Long]("n_mismatched") == 0L)
  }
}
