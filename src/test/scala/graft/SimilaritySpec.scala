package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.functions.{col, countDistinct}
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Similarity

/** Brute-force KNN against a driver-side exact reference; LSH recall
  * against brute force.
  */
class SimilaritySpec extends AnyFunSuite {
  import SparkTestSession._

  private def cosineRef(a: Seq[Float], b: Seq[Float]): Double = {
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < a.length) {
      dot += a(i).toDouble * b(i).toDouble
      na += a(i).toDouble * a(i).toDouble
      nb += b(i).toDouble * b(i).toDouble
      i += 1
    }
    if (na == 0 || nb == 0) 0.0 else dot / (math.sqrt(na) * math.sqrt(nb))
  }

  test("bruteForceKnn matches an exact scala reference") {
    val all = graft.sources.Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), col("embedding"))
      .collect().map(r => (r.getLong(0), r.getSeq[Float](1))).toMap
    val queries = all.filter(_._1 < 5)
    val got = graft.queries.VectorQueries.annBruteForce(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3)))
    assert(got.nonEmpty)
    queries.foreach { case (qid, qvec) =>
      val expect = all.toSeq.filter(_._1 != qid)
        .map { case (id, v) => (id, cosineRef(qvec, v)) }
        .sortBy { case (id, c) => (-c, id) }.take(10)
      val gotQ = got.filter(_._1 == qid).sortBy(_._4)
        .map(r => (r._2, r._3))
      assert(gotQ.map(_._1).toList == expect.map(_._1).toList,
        s"qid=$qid neighbor ids diverge: got=${gotQ.map(_._1).toList} want=${expect.map(_._1).toList}")
      gotQ.zip(expect).foreach { case ((_, c1), (_, c2)) =>
        assert(math.abs(c1 - c2) < 1e-9)
      }
    }
  }

  test("hard negatives: below-τ top-k, exact vs driver reference, τ genuinely bites") {
    val tau = 0.35
    val all = graft.sources.Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), col("embedding"))
      .collect().map(r => (r.getLong(0), r.getSeq[Float](1))).toMap
    val queries = all.filter(_._1 < 5)
    val got = graft.queries.VectorQueries.hardNegatives(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3)))
    assert(got.nonEmpty)
    assert(got.forall(_._3 < tau), "every negative must sit below the positive line")
    queries.foreach { case (qid, qvec) =>
      val scored = all.toSeq.filter(_._1 != qid)
        .map { case (id, v) => (id, cosineRef(qvec, v)) }
      val expect = scored.filter(_._2 < tau)
        .sortBy { case (id, c) => (-c, id) }.take(10)
      val gotQ = got.filter(_._1 == qid).sortBy(_._4).map(r => (r._2, r._3))
      assert(gotQ.map(_._1).toList == expect.map(_._1).toList, s"qid=$qid")
      gotQ.zip(expect).foreach { case ((_, c1), (_, c2)) =>
        assert(math.abs(c1 - c2) < 1e-9) }
    }
    // the τ filter must exclude something for SOME query (the corpus
    // plants near-dups ≥ τ), so hard negatives ≠ plain top-k
    val excluded = queries.exists { case (qid, qvec) =>
      all.toSeq.exists { case (id, v) => id != qid && cosineRef(qvec, v) >= tau } }
    assert(excluded, "fixture must contain at least one above-τ positive")
  }

  test("semantic decontamination: argmax matches a driver reference, both verdicts live") {
    val all = graft.sources.Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), col("embedding"))
      .collect().map(r => (r.getLong(0), r.getSeq[Float](1))).toMap
    val bench = all.filter(_._1 % 100 == 0)
    assert(bench.nonEmpty, "bench slice must be non-empty")
    val got = graft.queries.VectorQueries.decontaminationSemantic(spark, sfDir)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getBoolean(3)))
    assert(got.length == all.size - bench.size, "one row per corpus vector")
    got.foreach { case (id, bid, maxCos, flag) =>
      val expect = bench.toSeq
        .map { case (b, bv) => (b, cosineRef(all(id), bv)) }
        .sortBy { case (b, c) => (-c, b) }.head
      assert(bid == expect._1, s"id=$id argmax bench id diverges")
      assert(math.abs(maxCos - expect._2) < 1e-12, s"id=$id max cos diverges")
      assert(flag == (maxCos >= 0.35), s"id=$id flag inconsistent with the cut")
    }
    assert(got.exists(_._4) && got.exists(!_._4),
      "fixture must produce both contaminated and clean verdicts")
  }

  test("lshKnn returns a subset ranking consistent with brute force on shared candidates") {
    val bf = graft.queries.VectorQueries.annBruteForce(spark, sfDir)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    val lsh = graft.queries.VectorQueries.annLsh(spark, sfDir).collect()
    assert(lsh.nonEmpty)
    // any (qid,id) also present in brute force must carry the same score
    lsh.foreach { r =>
      val key = (r.getLong(0), r.getLong(1))
      bf.get(key).foreach(c => assert(math.abs(c - r.getDouble(2)) < 1e-9))
    }
  }

  test("IVF: deterministic training, valid assignments, sane recall vs brute force") {
    val c = graft.sources.Tables.embeddings(spark, sfDir)
      .select(col("vec_id").as("id"), col("embedding").as("vec"))
    val cent1 = graft.operators.IvfIndex.train(c, "vec", "id", k = 8, dim = 64)
    val cent2 = graft.operators.IvfIndex.train(c, "vec", "id", k = 8, dim = 64)
    assert(cent1.map(_.toSeq).toSeq == cent2.map(_.toSeq).toSeq, "training must be deterministic")
    val assigned = graft.operators.IvfIndex.assign(c, "vec", cent1)
    assert(assigned.filter(col("cid") < 0 || col("cid") >= 8).count() == 0)
    assert(assigned.select(countDistinct(col("cid"))).head().getLong(0) > 1,
      "quantizer collapsed to one list")
    // recall@10 against brute force — IVF with nprobe=2 of 16 lists on
    // unclustered gaussian data is weak by nature; just require overlap
    val bf = graft.queries.VectorQueries.annBruteForce(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val ivf = graft.queries.VectorQueries.annIvf(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(ivf.nonEmpty)
    assert((bf intersect ivf).nonEmpty, "IVF found none of the true neighbors")
  }

  test("matryoshka audit: refine leg dominates truncation-only, recalls in range") {
    val rows = graft.queries.VectorQueries.annMatryoshka(spark, sfDir)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(rows.keySet == Set("trunc16", "trunc16_refine"))
    val (th, tr) = rows("trunc16"); val (rh, rr) = rows("trunc16_refine")
    assert(tr >= 0.0 && tr <= 1.0 && rr >= 0.0 && rr <= 1.0)
    assert(tr == th / 50.0 && rr == rh / 50.0)
    // the full-dim re-rank can only promote true neighbors the prefix
    // scan already surfaced in its 4x shortlist — never lose them
    assert(rr >= tr, s"refine recall $rr below truncation recall $tr")
  }

  test("cosineNearDup pairs all meet the threshold") {
    val out = graft.queries.VectorQueries.dedupEmbeddingCosine(spark, "/root/testdata/sf0.01")
    assert(out.filter(col("cos") < 0.35).count() == 0)
    assert(out.count() > 0)
  }

  test("cosineNearDup candidate volume stays far below all-pairs") {
    // amplified corpus (×4 ids) so the bound is meaningful beyond the
    // raw testdata size; expected volume is (planes+1)·N²/2^planes / 2
    // ordered pairs — N²/57 at planes=8. Assert a 2× safety margin.
    val copies = spark.range(4).withColumnRenamed("id", "copy")
    val emb = graft.sources.Tables.embeddings(spark, "/root/testdata/sf0.01")
      .crossJoin(copies)
      .select((col("vec_id") * 4 + col("copy")).as("id"), col("embedding").as("vec"))
    val n = emb.count()
    val cand = Similarity.cosineNearDupCandidates(emb, planes = 8).count()
    val allPairs = n * n / 2
    assert(cand < allPairs / 25,
      s"candidate pairs $cand vs all-pairs $allPairs — bucketing is not pruning")
  }

  test("multi-probe lshKnn raises recall vs single-bucket at equal planes") {
    val c = graft.sources.Tables.embeddings(spark, "/root/testdata/sf0.01")
      .select(col("vec_id").as("id"), col("embedding").as("vec"))
    val q = graft.sources.Tables.embeddings(spark, "/root/testdata/sf0.01")
      .filter(col("vec_id") < 5)
      .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
    val bf = Similarity.bruteForceKnn(q, c, 10)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    def recall(planes: Int, probeBits: Int): Double = {
      val got = Similarity.lshKnn(q, c, 10, planes, probeBits)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      (bf intersect got).size.toDouble / bf.size
    }
    // testdata neighbors are weakly similar (gaussian corpus, top-10
    // cosine ≈ 0.4-0.5) — the hardest case for hyperplane LSH — so the
    // 0.9 bar needs the 3-bit probe ring; at a real ≥0.9-cosine
    // near-dup threshold probeBits=1 already suffices.
    val single = recall(4, 0)
    val probed2 = recall(4, 2)
    val probed3 = recall(4, 3)
    info(f"recall planes=4: single $single%.2f, probe2 $probed2%.2f, probe3 $probed3%.2f")
    assert(single < probed2 && probed2 < probed3,
      "probe rings must monotonically improve recall here")
    assert(probed3 >= 0.9, f"multi-probe recall $probed3%.2f below 0.9")
  }

  test("int8 quantization: per-component error bounded by scale/2, top-k mostly stable") {
    import graft.functions.VectorFunctions.{dequantize8, quantize8}
    import org.apache.spark.sql.functions.col
    val emb = graft.sources.Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), col("embedding"))
    val rows = emb
      .select(col("vec_id"), col("embedding"),
        dequantize8(quantize8(col("embedding"))).as("rec"))
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val v = r.getSeq[Float](1); val rec = r.getSeq[Float](2)
      assert(v.length == rec.length)
      val maxAbs = v.map(x => math.abs(x.toDouble)).max
      // scale/2 rounding bound, padded for the float32 scale storage
      val bound = maxAbs / 127.0 * 0.5 * (1 + 1e-5) + 1e-7
      v.zip(rec).foreach { case (x, y) =>
        assert(math.abs(x - y) <= bound,
          s"vec ${r.getLong(0)}: |$x - $y| > $bound")
      }
    }
    // the quantized ANN path agrees with the float path on most of
    // each query's top-10 (ties may reorder at the boundary)
    val float = graft.queries.VectorQueries.annBruteForce(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val quant = graft.queries.VectorQueries.annQuantized(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    assert(float.keySet == quant.keySet)
    float.foreach { case (qid, ids) =>
      val overlap = (ids intersect quant(qid)).size
      assert(overlap >= 8, s"query $qid: only $overlap/10 shared with float path")
    }
  }

  test("PQ: ADC kernel matches a driver fold, reconstruction bounded, codebooks round-trip") {
    import graft.operators.PqIndex
    val c = graft.sources.Tables.embeddings(spark, sfDir)
      .select(col("vec_id").as("id"), col("embedding").as("vec"))
    val cb = PqIndex.train(c, "vec", "id", dim = 64)
    assert(cb.m == 8 && cb.ds == 8 && cb.ksub == 16)
    // codes live in a SIGNED tinyint: ksub past 128 would wrap
    assertThrows[IllegalArgumentException] {
      PqIndex.train(c, "vec", "id", dim = 64, ksub = 200)
    }

    // ADC column result ≡ the same fold run driver-side (bit-exact)
    val q = c.filter(col("id") === 0)
      .select(col("id").as("qid"), col("vec").as("qvec"))
    val coded = PqIndex.encode(c, "vec", cb).select(col("id"), col("codes"))
    val gotAdc = PqIndex.searchAdc(q, coded, 5, cb)
      .collect().map(r => (r.getLong(1), r.getDouble(2))).toMap
    val qvec = c.filter(col("id") === 0).select(col("vec"))
      .head().getSeq[Float](0).toArray
    val codesById = coded.collect()
      .map(r => r.getLong(0) -> r.getSeq[Byte](1).toArray).toMap
    def adcRef(codes: Array[Byte]): Double = {
      var sum = 0.0
      for (j <- 0 until cb.m) {
        val cent = cb.books(j)(codes(j) & 0xFF)
        for (i <- 0 until cb.ds) {
          val d = qvec(j * cb.ds + i).toDouble - cent(i).toDouble
          sum += d * d
        }
      }
      sum
    }
    gotAdc.foreach { case (id, adc) =>
      assert(adc == adcRef(codesById(id)), s"ADC drift on id $id")
    }

    // reconstruction error well under the raw signal energy
    val err = PqIndex.encode(c, "vec", cb)
      .select(PqIndex.decode(col("codes"), cb).as("rec"), col("vec"))
      .select(aggregate(zip_with(col("vec"), col("rec"),
          (a, b) => (a - b) * (a - b)),
        lit(0.0), (acc, x) => acc + x).as("se"),
        aggregate(col("vec"), lit(0.0),
          (acc, x) => acc + x * x).as("energy"))
      .agg(sum(col("se")), sum(col("energy"))).head()
    // the synthetic embeddings are near-isotropic — PQ's worst case
    // (real embedding corpora cluster and reconstruct far tighter);
    // observed ~0.56·energy here, so pin "clearly better than the
    // zero-vector quantizer" rather than a clustered-data bound
    assert(err.getDouble(0) < 0.8 * err.getDouble(1),
      s"PQ reconstruction must beat the trivial quantizer: ${err}")

    // refined search recall vs brute force (candidate pool from codes
    // alone; observed ≥0.85 on the testdata — pin a safe floor)
    val queries = graft.sources.Tables.embeddings(spark, sfDir)
      .filter(col("vec_id") < 5)
      .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
    val exact = Similarity.bruteForceKnn(queries, c, 10)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val pq = PqIndex.searchAdc(queries, coded, 10, cb, refineWith = Some(c))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val recall = exact.keys.map(qid =>
      (exact(qid) intersect pq.getOrElse(qid, Set.empty)).size.toDouble / 10).sum / exact.size
    assert(recall >= 0.5, f"PQ+refine recall@10 too low: $recall%.2f")

    // persistence round-trip reproduces the codes bit-for-bit
    val path = java.nio.file.Files.createTempDirectory("graft_pq")
      .toFile.getAbsolutePath + "/books"
    PqIndex.saveCodebooks(spark, cb, path)
    val loaded = PqIndex.loadCodebooks(spark, path)
    assert(loaded.m == cb.m && loaded.ds == cb.ds &&
      loaded.books.zip(cb.books).forall { case (a, b) =>
        a.zip(b).forall { case (x, y) => x.sameElements(y) } })
    val recoded = PqIndex.encode(c, "vec", loaded)
      .select(col("id"), col("codes")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Byte](1).toSeq).toMap
    assert(recoded == codesById.map { case (k, v) => k -> v.toSeq })
  }

  test("IVF-PQ: residual coding beats raw PQ reconstruction, partitioned search " +
       "matches in-memory, index round-trips") {
    import graft.operators.{IvfPq, PqIndex}
    val c = graft.sources.Tables.embeddings(spark, sfDir)
      .select(col("vec_id").as("id"), col("embedding").as("vec"))
    val idx = IvfPq.train(c, "vec", "id", k = 16, dim = 64)
    val queries = graft.sources.Tables.embeddings(spark, sfDir)
      .filter(col("vec_id") < 5)
      .select(col("vec_id").as("qid"), col("embedding").as("qvec"))

    // every row lands in exactly one list, codes in range
    val coded = IvfPq.encode(c, "vec", "id", idx)
    val n = c.count()
    assert(coded.count() == n)
    assert(coded.select(countDistinct(col("id"))).head().getLong(0) == n)
    val codeBounds = coded
      .select(explode(col("codes")).as("b")).agg(min("b"), max("b")).head()
    assert(codeBounds.getByte(0) >= 0 && codeBounds.getByte(1) < 16)

    // the reason residual PQ exists: reconstructing centroid + decoded
    // residual must beat raw-vector PQ's reconstruction on the same
    // (m, ksub) budget
    val rawCb = PqIndex.train(c, "vec", "id", dim = 64)
    def sqErr(recon: org.apache.spark.sql.DataFrame): Double = recon
      .select(aggregate(zip_with(col("vec"), col("rec"),
          (a, b) => (a - b) * (a - b)),
        lit(0.0), (acc, x) => acc + x).as("se"))
      .agg(sum(col("se"))).head().getDouble(0)
    val rawErr = sqErr(PqIndex.encode(c, "vec", rawCb)
      .select(col("vec"), PqIndex.decode(col("codes"), rawCb).as("rec")))
    val centsLit = graft.operators.IvfIndex.centroidsLiteral(idx.centroids)
    val resErr = sqErr(
      PqIndex.encode(
          graft.operators.IvfIndex.assign(c, "vec", idx.centroids)
            .withColumn("__res", IvfPq.residual(col("vec"), col("cid"), idx.centroids)),
          "__res", idx.books)
        .select(col("vec"),
          zip_with(element_at(centsLit, col("cid") + lit(1)),
            PqIndex.decode(col("codes"), idx.books),
            (a, b) => a + b).as("rec")))
    assert(resErr < rawErr,
      f"residual coding must reconstruct tighter: res=$resErr%.1f raw=$rawErr%.1f")

    // refined recall floor vs brute force
    val exact = Similarity.bruteForceKnn(queries, c, 10)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val got = IvfPq.search(queries, coded, 10, idx, refineWith = c, nprobe = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val recall = exact.keys.map(qid =>
      (exact(qid) intersect got.getOrElse(qid, Set.empty)).size.toDouble / 10)
      .sum / exact.size
    assert(recall >= 0.4, f"IVF-PQ recall@10 too low: $recall%.2f")

    // partitioned layout: pruned read, identical results
    val base = java.nio.file.Files.createTempDirectory("graft_ivfpq")
      .toFile.getAbsolutePath
    IvfPq.writePartitioned(c, "vec", "id", idx, s"$base/lists")
    val inMem = IvfPq.search(queries, coded, 10, idx, refineWith = c, nprobe = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3))).toSet
    val part = IvfPq.searchPartitioned(spark, s"$base/lists", queries, 10, idx,
        refineWith = c, nprobe = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3))).toSet
    assert(part == inMem)

    // lake refine: float vectors id-clustered, pool ids pushed to the
    // parquet reader as an IN filter — identical results
    c.repartitionByRange(4, col("id")).sortWithinPartitions(col("id"))
      .write.mode("overwrite").parquet(s"$base/floats")
    val lake = IvfPq.searchLakeRefine(spark, coded, s"$base/floats",
        queries, 10, idx, nprobe = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3))).toSet
    assert(lake == inMem)

    // index artifact round-trip: loaded index reproduces the search
    IvfPq.saveIndex(spark, idx, s"$base/index")
    val loaded = IvfPq.loadIndex(spark, s"$base/index")
    assert(loaded.centroids.zip(idx.centroids)
      .forall { case (a, b) => a.sameElements(b) })
    assert(loaded.books.books.zip(idx.books.books).forall { case (a, b) =>
      a.zip(b).forall { case (x, y) => x.sameElements(y) } })
    val reSearch = IvfPq.search(queries,
        IvfPq.encode(c, "vec", "id", loaded), 10, loaded,
        refineWith = c, nprobe = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3))).toSet
    assert(reSearch == inMem)
  }

  test("SemDeDup: planted paraphrase groups collapse to one kept representative each") {
    import spark.implicits._
    import graft.operators.{IvfIndex, SemDedup}
    val rnd = new scala.util.Random(7)
    def jitter(base: Array[Float], eps: Float): Seq[Float] =
      base.map(x => x + (rnd.nextFloat() - 0.5f) * eps).toSeq
    // two tight "paraphrase" groups around far-apart anchors, plus
    // isolated uniform noise
    val anchorA = Array.fill(64)(rnd.nextFloat() * 2 - 1)
    val anchorB = Array.fill(64)(rnd.nextFloat() * 2 - 1)
    val rows =
      (0L to 3L).map(i => i -> jitter(anchorA, 0.02f)) ++
      (10L to 12L).map(i => i -> jitter(anchorB, 0.02f)) ++
      (20L to 39L).map(i => i -> Seq.fill(64)(rnd.nextFloat() * 2 - 1))
    val df = rows.toDF("id", "vec")
      .select(col("id"), col("vec").cast("array<float>").as("vec"))
      .localCheckpoint()
    val cents = IvfIndex.train(df, "vec", "id", k = 4, dim = 64)
    val out = SemDedup.semDedup(df, "vec", "id", cents, threshold = 0.95)
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3), r.getBoolean(4)))
    assert(out.length == rows.length) // verdict for every row

    // each planted group shares one canonical id; the two groups differ
    val byId = out.map(t => t._1 -> t).toMap
    val compA = (0L to 3L).map(byId(_)._3).toSet
    val compB = (10L to 12L).map(byId(_)._3).toSet
    assert(compA.size == 1 && compB.size == 1 && compA != compB,
      s"planted groups must each collapse: A=$compA B=$compB")

    // exactly one keep per component, and it's the least-typical member
    out.groupBy(_._3).foreach { case (canon, members) =>
      val kept = members.filter(_._5)
      assert(kept.length == 1, s"component $canon kept ${kept.length}")
      val want = members.minBy(m => (m._4, m._1))
      assert(kept.head._1 == want._1,
        s"component $canon kept ${kept.head._1}, want least-typical ${want._1}")
    }

    // noise rows keep themselves
    (20L to 39L).foreach { i =>
      assert(byId(i)._3 == i && byId(i)._5, s"noise row $i must survive")
    }
  }

  test("PCA: orthonormal basis, descending eigenvalues, bit-exact projection, artifact round-trip") {
    import graft.operators.Pca
    val corpus = graft.sources.Tables.embeddings(spark, sfDir)
      .select(col("vec_id").as("id"), col("embedding").as("vec"))
    val m = Pca.train(corpus, "vec", "id", dim = 64, components = 4)
    // orthonormal within numeric tolerance, eigenvalues sorted desc > 0
    m.basis.indices.foreach { i =>
      m.basis.indices.foreach { j =>
        val dot = (0 until 64).map(k => m.basis(i)(k) * m.basis(j)(k)).sum
        val want = if (i == j) 1.0 else 0.0
        assert(math.abs(dot - want) < 1e-9, s"basis($i)·basis($j) = $dot")
      }
    }
    assert(m.eigenvalues.sliding(2).forall(p => p(0) >= p(1)))
    assert(m.eigenvalues.forall(_ > 0))
    // the plan-literal projection equals the driver fold BIT-exactly
    val got = corpus.select(col("id"), Pca.project(col("vec"), m))
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    val vecs = corpus.collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    vecs.foreach { case (id, v) =>
      val want = m.basis.map { axis =>
        var acc = 0.0
        var i = 0
        while (i < 64) { acc += (v(i).toDouble - m.mean(i)) * axis(i); i += 1 }
        acc
      }.toSeq
      assert(got(id) == want, s"projection mismatch for id $id")
    }
    // whitened projections have ~unit variance along each axis
    val proj = corpus.select(Pca.project(col("vec"), m, whiten = true))
      .collect().map(_.getSeq[Double](0))
    val n = proj.length
    (0 until 4).foreach { j =>
      val mu = proj.map(_(j)).sum / n
      val va = proj.map(p => (p(j) - mu) * (p(j) - mu)).sum / (n - 1)
      assert(va > 0.5 && va < 2.0, s"whitened variance axis $j = $va")
    }
    // codegen kernel == HOF fold twin, bit for bit (both whiten modes)
    Seq(true, false).foreach { w =>
      val pair = corpus.select(
          Pca.component(col("vec"), m, 2, whiten = w).as("k"),
          Pca.componentHof(col("vec"), m, 2, whiten = w).as("h"))
        .collect()
      pair.foreach(r => assert(r.getDouble(0) == r.getDouble(1),
        s"kernel/HOF mismatch (whiten=$w): ${r.getDouble(0)} vs ${r.getDouble(1)}"))
    }
    // lake artifact round-trips the exact model
    val path = java.nio.file.Files.createTempDirectory("graft_pca").toString
    Pca.save(spark, m, s"$path/pca")
    val back = Pca.load(spark, s"$path/pca")
    assert(back.mean.toSeq == m.mean.toSeq &&
      back.eigenvalues.toSeq == m.eigenvalues.toSeq &&
      back.basis.map(_.toSeq).toSeq == m.basis.map(_.toSeq).toSeq)
  }

  test("cluster-balanced sample: quotas are the exact water-fill of cluster caps") {
    val c = graft.sources.Tables.embeddings(spark, sfDir)
      .select(col("vec_id").as("id"), col("embedding").as("vec"))
    val cents = graft.operators.IvfIndex.trainCached(
      s"embeddings:$sfDir", c, "vec", "id", k = 16, dim = 64)
    val assigned = graft.operators.IvfIndex.assign(c, "vec", cents)
      .select(col("id"), col("cid"))
    val caps = assigned.groupBy(col("cid")).count()
      .collect().map(r => r.get(0).toString -> r.getLong(1))
    val budget = 17L
    // driver replay of the exact integer water-fill (avail asc, name asc)
    var rem = budget
    val sorted = caps.sortBy { case (s, m) => (m, s) }
    val quotas = sorted.zipWithIndex.map { case ((s, cap), i) =>
      val a = math.min(cap, rem / (sorted.length - i)); rem -= a; s -> a
    }.toMap
    val kept = graft.operators.Resample
      .waterFillByStratum(assigned, col("cid"), col("id"), budget)
      .collect().map(r => r.get(1).toString)
      .groupBy(identity).view.mapValues(_.length.toLong).toMap
    quotas.filter(_._2 > 0).foreach { case (s, q) =>
      assert(kept.getOrElse(s, 0L) == q, s"cluster $s quota")
    }
    assert(kept.values.sum == quotas.values.sum && kept.values.sum <= budget)
    // and the registered query fills its whole budget when caps allow
    val full = graft.queries.VectorQueries
      .clusterBalancedSample(spark, sfDir).count()
    assert(full == math.min(200L, c.count()), "query should fill the budget")
  }

  test("retrieval quality: metrics bounded, consistent with recall, drift buckets cover the corpus") {
    val rq = graft.queries.VectorQueries
      .retrievalQualityReport(spark, sfDir).collect()
      .map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    assert(rq.keySet == Set("ivf", "ivfpq", "lsh", "pq"))
    rq.values.foreach { case (mrr, ndcg) =>
      assert(mrr >= 0.0 && mrr <= 1.0 && ndcg >= 0.0 && ndcg <= 1.0)
    }
    // a method with perfect recall would have ndcg 1.0 only if ranks
    // match; conversely zero recall forces both metrics to 0 — check
    // consistency against the recall report
    val rec = graft.queries.VectorQueries.annRecallReport(spark, sfDir)
      .collect().map(r => r.getString(0) -> r.getDouble(2)).toMap
    rec.foreach { case (m, r) =>
      if (r == 0.0) assert(rq(m) == ((0.0, 0.0)), s"$m: no hits but nonzero metric")
      if (r > 0.0) assert(rq(m)._2 > 0.0, s"$m: hits but zero ndcg")
    }
    val sd = graft.queries.VectorQueries.semanticDrift(spark, sfDir)
      .collect()
    assert(sd.map(_.getLong(1)).sum + sd.map(_.getLong(2)).sum ==
      graft.sources.Tables.embeddings(spark, sfDir).count(),
      "drift buckets must partition the corpus")
  }

  test("MMR: demotes the near-duplicate out of the top-k") {
    import spark.implicits._
    val q = Seq((0L, Array(1f, 0f, 0f))).toDF("qid", "qvec")
    val corpus = Seq(
      (1L, Array(0.99f, 0.141f, 0f)),  // rel ≈ 0.990 — picked first
      (2L, Array(0.99f, 0.145f, 0f)),  // rel ≈ 0.989, near-dup of 1
      (3L, Array(0.7f, -0.714f, 0f)),  // rel ≈ 0.700, diverse
      (4L, Array(0f, 0f, 1f))          // rel = 0, orthogonal
    ).toDF("id", "vec")
    val got = graft.operators.MmrRetrieval
      .diversifyBruteForce(spark, q, corpus, k = 3, lambda = 0.5, poolSize = 10)
      .orderBy(col("rk"))
      .collect().map(r => (r.getLong(1), r.getInt(4)))
    // plain top-3 by relevance would be (1, 2, 3); under MMR the
    // near-duplicate's sim≈1 penalty pushes it below BOTH diverse docs
    assert(got.map(_._1).toList == List(1L, 3L, 4L), got.mkString(","))
  }

  test("MMR: executor greedy matches a driver-side replay on the sf corpus") {
    val all = graft.sources.Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), col("embedding"))
      .collect().map(r => (r.getLong(0), r.getSeq[Float](1).toArray)).toMap
    val qv = all(0L)
    val pool = all.toSeq.filter(_._1 != 0L)
      .map { case (id, v) => (id, cosineRef(qv, v), v) }
      .sortBy { case (id, c, _) => (-c, id) }.take(50)
    // greedy replay
    var sel = List.empty[(Long, Double, Double, Int)]
    var remaining = pool
    for (rk <- 1 to 10) {
      val scored = remaining.map { case (id, rel, v) =>
        val ms = if (sel.isEmpty) 0.0
          else sel.map(s => cosineRef(v, all(s._1))).max
        (id, rel, 0.5 * rel - 0.5 * ms)
      }
      val best = scored.minBy { case (id, _, s) => (-s, id) }
      sel = sel :+ ((best._1, best._2, best._3, rk))
      remaining = remaining.filterNot(_._1 == best._1)
    }
    val got = graft.queries.VectorQueries.mmrDiversified(spark, sfDir)
      .collect().map(r => (r.getLong(1), r.getDouble(2), r.getDouble(3), r.getInt(4)))
    assert(got.toList == sel, s"got=${got.toList}\nwant=$sel")
  }

  test("cluster silhouette matches a driver recompute over the cached codebook") {
    import SparkTestSession._
    val corpus = graft.sources.Tables.embeddings(spark, sfDir)
      .select(org.apache.spark.sql.functions.col("vec_id").as("id"),
        org.apache.spark.sql.functions.col("embedding").as("vec"))
    val cents = graft.operators.IvfIndex.trainCached(
      s"embeddings:$sfDir", corpus, "vec", "id", k = 16, dim = 64)
    val rows = corpus.collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
    def dist(v: Array[Float], c: Array[Float]): Double = {
      var s = 0.0; var i = 0
      while (i < 64) { val d = v(i).toDouble - c(i).toDouble; s += d * d; i += 1 }
      math.sqrt(s)
    }
    val per = rows.map { case (_, v) =>
      val ds = cents.zipWithIndex.map { case (c, j) => (dist(v, c), j) }.sorted
      val (a, own) = ds(0); val (b, _) = ds(1)
      val s = if (b == 0.0) 0.0 else (b - a) / b
      (own, BigDecimal(s * 1e6)
        .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong)
    }
    val want = per.groupBy(_._1).map { case (cid, xs) =>
      val sum = xs.map(_._2).sum
      (cid, xs.length.toLong,
        BigDecimal(sum.toDouble / xs.length / 1e6)
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    }.toSeq.sortBy(_._1)
    val got = graft.queries.VectorQueries.clusterSilhouette(spark, sfDir)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(got == want, s"got=$got\nwant=$want")
    // every point lands in exactly one cluster
    assert(got.map(_._2).sum == rows.length)
  }
}
