package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries._
import OracleFns._

/** Oracle SQL builders rendered at Verify time from session-trained
  * state (IVF/PQ codebooks, BPE vocab, PCA basis) — split from
  * [[OracleFns]]; used by [[SparkEntry.dynamicOracleSql]].
  */
private[graft] object OracleFnsTrained {


  // ------------------------------------------------------------------
  // Oracles rendered at Verify time from session-trained state.
  //
  // ann_ivf_topk's codebook comes out of Lloyd iterations whose
  // per-cluster double sums merge in shuffle-fetch order — deterministic
  // in VALUE only to ~ulp, so the exact centroid bits belong to the
  // training run, not the algorithm. The same session that dumped the
  // query result embeds ITS trained centroids as literals (exactly as
  // ann_lsh_topk embeds its hyperplane signs); everything downstream of
  // the codebook — assignment (squared-L2 left fold, ties to the lower
  // cid), probe ranking and cosine scoring (left-to-right double folds
  // over floats) — is IEEE correctly-rounded arithmetic that DuckDB
  // reproduces bit-for-bit via list_reduce in the same order.
  // ------------------------------------------------------------------

  /** Float literal that parses back to the identical 32 bits:
    * Float.toString is the shortest decimal that round-trips, and
    * DuckDB's VARCHAR→FLOAT cast is correctly rounded. (A bare numeric
    * literal would type DECIMAL and risk double rounding.)
    */
  /** DuckDB replay of the b-bit minhash audit (D72). Ground truth =
    * the exact-pair CTEs of dedup_minhash_lsh (same completeness
    * argument); the estimator side replays the engine signature
    * bit-for-bit: per-shingle XXH64 via the shared cd..hf chain,
    * per-slot derivation mix64(base ^ mix64(s)) with splitmix64
    * constants and per-slot constants emitted from the very same Scala
    * implementation, SIGNED minima per (doc, slot) (the kernel
    * compares Java longs), low-b-bit lanes, and the Li–König
    * correction (P−C)/(1−C) with double constants routed through
    * CAST('…' AS DOUBLE) so they parse as DOUBLE, not DECIMAL.
    * Mixing runs per DISTINCT shingle × slot; minima fold per doc.
    */
  private[graft] def bbitOracle(bands: Int, rows: Int, b: Int,
                         threshold: Double): String = {
    val k = bands * rows
    def u(x: Long) = java.lang.Long.toUnsignedString(x)
    def d(x: Double) = s"CAST('$x' AS DOUBLE)"
    val slots = (0 until k).map(s =>
      s"($s, CAST('${u(graft.functions.GraftKernels.mix64(s.toLong))}' AS HUGEINT))")
      .mkString(", ")
    val C0 = u(0x9e3779b97f4a7c15L)
    val C1 = u(0xbf58476d1ce4e5b9L)
    val C2 = u(0x94d049bb133111ebL)
    val mixChain = Seq(
      s"(xor(CAST(hv AS HUGEINT), sc) + $C0) % $M64 AS z1",
      s"${xorShift("z1", 30)} AS x1",
      s"(${mul64("x1", C1)}) % $M64 AS z2",
      s"${xorShift("z2", 27)} AS x2",
      s"(${mul64("x2", C2)}) % $M64 AS z3",
      s"${xorShift("z3", 31)} AS m")
      .foldLeft("SELECT hf.sh, sl.s, sl.sc, hf.hv FROM hf CROSS JOIN (VALUES "
        + slots + ") sl(s, sc)") { (q, step) => s"SELECT *, $step FROM ($q)" }
    val mod = u(1L << b)
    val est = s"(CAST(cnt AS DOUBLE) / ${d(k.toDouble)} - ${d(1.0 / (1L << b))})" +
      s" / ${d(1.0 - 1.0 / (1L << b))}"
    s"""WITH t AS (
      |  SELECT doc_id, string_split_regex(trim(text), '\\s+') AS tk FROM documents),
      |s AS (SELECT doc_id, list_distinct(list_transform(range(1, len(tk) - 1),
      |  i -> tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2])) AS sh FROM t),
      |ex AS (SELECT doc_id, len(sh) AS n, unnest(sh) AS shingle FROM s
      |       WHERE len(sh) > 0),
      |pairs AS (
      |  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS c,
      |    any_value(a.n) AS na, any_value(b.n) AS nb
      |  FROM ex a JOIN ex b ON a.shingle = b.shingle AND b.doc_id > a.doc_id
      |  GROUP BY 1, 2),
      |j AS (
      |  SELECT id_a, id_b, CAST(c AS DOUBLE) / (na + nb - c) AS jaccard
      |  FROM pairs WHERE CAST(c AS DOUBLE) / (na + nb - c) >= $threshold),
      |dsh AS (SELECT DISTINCT shingle AS sh FROM ex),
      |$strXxh64Ctes
      |msig AS (
      |  SELECT sh, s,
      |    CAST(CASE WHEN m >= 9223372036854775808 THEN m - $M64 ELSE m END
      |      AS BIGINT) AS ms
      |  FROM ($mixChain)),
      |mins AS (
      |  SELECT ex.doc_id, msig.s, MIN(msig.ms) AS mn
      |  FROM ex JOIN msig ON msig.sh = ex.shingle GROUP BY 1, 2),
      |lanes AS (SELECT doc_id, s, ((mn % $mod) + $mod) % $mod AS lane FROM mins),
      |mt AS (
      |  SELECT j.id_a, j.id_b, j.jaccard,
      |    SUM(CASE WHEN la.lane = lb.lane THEN 1 ELSE 0 END) AS cnt
      |  FROM j JOIN lanes la ON la.doc_id = j.id_a
      |         JOIN lanes lb ON lb.doc_id = j.id_b AND lb.s = la.s
      |  GROUP BY 1, 2, 3)
      |SELECT id_a, id_b, jaccard, $est AS jaccard_bbit,
      |  ($est >= ${d(threshold)}) AS kept_bbit
      |FROM mt ORDER BY id_a, id_b""".stripMargin
  }

  /** D108 oracle — truth = the exact-pairs CTEs shared with
    * dedup_minhash_lsh; candidates = the banding replayed through the
    * SAME XXH64 ∘ splitmix64 signature as [[bbitOracle]], with band
    * collision expressed as row-minima LIST equality (hash equality ⟺
    * slice equality up to hash collisions, which can only ADD a
    * candidate on the Spark side — none occur at gate scale).
    */
  private[graft] def dedupRecallOracle(bands: Int, rows: Int,
                                       threshold: Double,
                                       sampleK: Option[Int] = None): String = {
    val k = bands * rows
    // D109: the sampled audit = the full audit restricted to pairs
    // incident to the id-modulus sample — the filtered full pair set
    // IS the sampled-probe computation's output (both exact), so the
    // oracle filters where the Spark side saves the probe cost
    val incident = sampleK.map(s =>
      s"(id_a % $s = 0 OR id_b % $s = 0)").getOrElse("TRUE")
    val sampleCol = sampleK.map(s =>
      s"CAST($s AS INTEGER) AS sample_k, ").getOrElse("")
    def u(x: Long) = java.lang.Long.toUnsignedString(x)
    val slots = (0 until k).map(s =>
      s"($s, CAST('${u(graft.functions.GraftKernels.mix64(s.toLong))}' AS HUGEINT))")
      .mkString(", ")
    val C0 = u(0x9e3779b97f4a7c15L)
    val C1 = u(0xbf58476d1ce4e5b9L)
    val C2 = u(0x94d049bb133111ebL)
    val mixChain = Seq(
      s"(xor(CAST(hv AS HUGEINT), sc) + $C0) % $M64 AS z1",
      s"${xorShift("z1", 30)} AS x1",
      s"(${mul64("x1", C1)}) % $M64 AS z2",
      s"${xorShift("z2", 27)} AS x2",
      s"(${mul64("x2", C2)}) % $M64 AS z3",
      s"${xorShift("z3", 31)} AS m")
      .foldLeft("SELECT hf.sh, sl.s, sl.sc, hf.hv FROM hf CROSS JOIN (VALUES "
        + slots + ") sl(s, sc)") { (q, step) => s"SELECT *, $step FROM ($q)" }
    s"""WITH t AS (
      |  SELECT doc_id, string_split_regex(trim(text), '\\s+') AS tk FROM documents),
      |s AS (SELECT doc_id, list_distinct(list_transform(range(1, len(tk) - 1),
      |  i -> tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2])) AS sh FROM t),
      |ex AS (SELECT doc_id, len(sh) AS n, unnest(sh) AS shingle FROM s
      |       WHERE len(sh) > 0),
      |pairs AS (
      |  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS c,
      |    any_value(a.n) AS na, any_value(b.n) AS nb
      |  FROM ex a JOIN ex b ON a.shingle = b.shingle AND b.doc_id > a.doc_id
      |  GROUP BY 1, 2),
      |truth AS (
      |  SELECT id_a, id_b FROM pairs
      |  WHERE CAST(c AS DOUBLE) / (na + nb - c) >= $threshold
      |    AND $incident),
      |dsh AS (SELECT DISTINCT shingle AS sh FROM ex),
      |$strXxh64Ctes
      |msig AS (
      |  SELECT sh, s,
      |    CAST(CASE WHEN m >= 9223372036854775808 THEN m - $M64 ELSE m END
      |      AS BIGINT) AS ms
      |  FROM ($mixChain)),
      |mins AS (
      |  SELECT ex.doc_id, msig.s, MIN(msig.ms) AS mn
      |  FROM ex JOIN msig ON msig.sh = ex.shingle GROUP BY 1, 2),
      |bnd AS (
      |  SELECT doc_id, s // $rows AS band, list(mn ORDER BY s) AS sig
      |  FROM mins GROUP BY doc_id, s // $rows),
      |cand AS (
      |  SELECT id_a, id_b FROM (
      |    SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
      |    FROM bnd a JOIN bnd b
      |      ON a.band = b.band AND a.sig = b.sig AND b.doc_id > a.doc_id)
      |  WHERE $incident),
      |hit AS (SELECT * FROM cand INTERSECT SELECT * FROM truth),
      |agg AS (SELECT
      |  (SELECT CAST(COUNT(*) AS BIGINT) FROM truth) AS n_true,
      |  (SELECT CAST(COUNT(*) AS BIGINT) FROM cand) AS n_candidates,
      |  (SELECT CAST(COUNT(*) AS BIGINT) FROM hit) AS n_hit)
      |SELECT ${sampleCol}n_true, n_candidates, n_hit,
      |  CASE WHEN n_true > 0 THEN
      |    round(CAST(n_hit AS DOUBLE) / CAST(n_true AS DOUBLE), 6) END
      |    AS recall,
      |  CASE WHEN n_candidates > 0 THEN
      |    round(CAST(n_hit AS DOUBLE) / CAST(n_candidates AS DOUBLE), 6) END
      |    AS precision
      |FROM agg""".stripMargin
  }

  private[graft] def floatLit(f: Float): String = s"CAST('$f' AS FLOAT)"

  /** D107 oracle — the silhouette replay over the SAME trained
    * centroids: squared-L2 index-order folds, (dist, cid) rank for
    * own/second-nearest, micro-unit integer sums per cluster.
    */
  private[graft] def silhouetteOracle(cents: Array[Array[Float]]): String =
    s"""WITH cents AS (
       |  SELECT * FROM (VALUES
       |    ${centroidsValues(cents)}) t(cid, cvec)),
       |corpus AS (SELECT vec_id AS id, embedding AS vec FROM embeddings),
       |dist AS (
       |  SELECT c.id, ct.cid,
       |    sqrt(list_reduce(list_transform(range(1, 65),
       |      i -> (CAST(c.vec[i] AS DOUBLE) - CAST(ct.cvec[i] AS DOUBLE))
       |         * (CAST(c.vec[i] AS DOUBLE) - CAST(ct.cvec[i] AS DOUBLE))),
       |      (x, y) -> x + y)) AS dst
       |  FROM corpus c CROSS JOIN cents ct),
       |r AS (
       |  SELECT id, cid, dst,
       |    row_number() OVER (PARTITION BY id ORDER BY dst ASC, cid ASC) AS rn
       |  FROM dist),
       |ab AS (
       |  SELECT a.id, a.cid AS own, a.dst AS da, b.dst AS db
       |  FROM r a JOIN r b ON a.id = b.id AND a.rn = 1 AND b.rn = 2),
       |s AS (
       |  SELECT own, CAST(round(
       |      (CASE WHEN db = 0 THEN 0.0 ELSE (db - da) / db END) * 1000000.0)
       |    AS BIGINT) AS micro
       |  FROM ab)
       |SELECT own AS cid, CAST(COUNT(*) AS BIGINT) AS n_points,
       |  round(CAST(SUM(micro) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE)
       |    / 1000000.0, 6) AS mean_silhouette
       |FROM s GROUP BY own ORDER BY cid""".stripMargin

  private[graft] def centroidsValues(cents: Array[Array[Float]]): String =
    cents.zipWithIndex.map { case (c, i) =>
      s"($i, ${c.map(floatLit).mkString("[", ", ", "]")})"
    }.mkString(",\n    ")

  /** The three cosine accumulators as index-order folds (mirrors
    * GraftKernels.cosine: independent left folds, float→double exact).
    */
  private[graft] def cosineFolds(a: String, b: String): String =
    s"""list_reduce(list_transform(range(1, 65),
       |      i -> CAST($a[i] AS DOUBLE) * CAST($b[i] AS DOUBLE)), (x, y) -> x + y) AS dot,
       |    list_reduce(list_transform(range(1, 65),
       |      i -> CAST($a[i] AS DOUBLE) * CAST($a[i] AS DOUBLE)), (x, y) -> x + y) AS na,
       |    list_reduce(list_transform(range(1, 65),
       |      i -> CAST($b[i] AS DOUBLE) * CAST($b[i] AS DOUBLE)), (x, y) -> x + y) AS nb""".stripMargin

  private[graft] def ivfOracle(cents: Array[Array[Float]], k: Int, nprobe: Int): String =
    s"""WITH cents AS (
       |  SELECT * FROM (VALUES
       |    ${centroidsValues(cents)}) t(cid, cvec)),
       |corpus AS (SELECT vec_id AS id, embedding AS vec FROM embeddings),
       |asg AS (
       |  -- nearest centroid by squared L2, index-order fold, ties to lower cid
       |  SELECT id, vec, cid FROM (
       |    SELECT c.id, c.vec, ct.cid,
       |      row_number() OVER (PARTITION BY c.id ORDER BY
       |        list_reduce(list_transform(range(1, 65),
       |          i -> (CAST(c.vec[i] AS DOUBLE) - CAST(ct.cvec[i] AS DOUBLE))
       |             * (CAST(c.vec[i] AS DOUBLE) - CAST(ct.cvec[i] AS DOUBLE))),
       |          (x, y) -> x + y) ASC, ct.cid ASC) AS rn
       |    FROM corpus c CROSS JOIN cents ct)
       |  WHERE rn = 1),
       |qs AS (SELECT vec_id AS qid, embedding AS qv FROM embeddings WHERE vec_id < 5),
       |qcos AS (
       |  SELECT qid, qv, cid,
       |    ${cosineFolds("qv", "cvec")}
       |  FROM qs CROSS JOIN cents),
       |qp AS (
       |  -- the nprobe nearest lists per query (cosine desc, cid tiebreak)
       |  SELECT qid, qv, cid FROM (
       |    SELECT qid, qv, cid, row_number() OVER (PARTITION BY qid ORDER BY
       |      CASE WHEN na = 0 OR nb = 0 THEN 0.0
       |           ELSE dot / (sqrt(na) * sqrt(nb)) END DESC, cid ASC) AS rk
       |    FROM qcos)
       |  WHERE rk <= $nprobe),
       |sc AS (
       |  SELECT qp.qid, a.id,
       |    ${cosineFolds("qp.qv", "a.vec")}
       |  FROM asg a JOIN qp USING (cid) WHERE a.id <> qp.qid),
       |scored AS (
       |  SELECT qid, id,
       |    CASE WHEN na = 0 OR nb = 0 THEN 0.0
       |         ELSE dot / (sqrt(na) * sqrt(nb)) END AS cos
       |  FROM sc),
       |r AS (
       |  SELECT qid, id, cos,
       |    row_number() OVER (PARTITION BY qid ORDER BY cos DESC, id) AS rk
       |  FROM scored)
       |SELECT qid, id, cos, CAST(rk AS INTEGER) AS rk
       |FROM r WHERE rk <= $k ORDER BY qid, rk""".stripMargin

  /** PQ oracle: encode = per-subspace argmin (index-order squared-L2
    * fold, ties to the lower code — bit-exact vs the kernel), ADC
    * candidate cut on round(adc, 6) with the id tiebreak (the kernel
    * folds all 64 terms in one accumulator while SQL sums 8 subspace
    * folds — ±ulp regrouping drift, absorbed by the rounding both
    * engines rank on), exact-cosine re-rank mirrored bit-for-bit.
    */
  private[graft] def pqOracle(cb: graft.operators.PqIndex.Codebooks,
                       k: Int, poolMult: Int): String = {
    val ds = cb.ds
    val centsRows = (for (j <- 0 until cb.m; c <- 0 until cb.ksub) yield
      s"($j, $c, ${cb.books(j)(c).map(floatLit).mkString("[", ", ", "]")})")
      .mkString(",\n    ")
    def subDist(vec: String, jExpr: String) =
      s"""list_reduce(list_transform(range(1, ${ds + 1}),
         |      i -> (CAST($vec[$jExpr * $ds + i] AS DOUBLE) - CAST(ct.cvec[i] AS DOUBLE))
         |         * (CAST($vec[$jExpr * $ds + i] AS DOUBLE) - CAST(ct.cvec[i] AS DOUBLE))),
         |      (x, y) -> x + y)""".stripMargin
    s"""WITH cents AS (
       |  SELECT * FROM (VALUES
       |    $centsRows) t(j, c, cvec)),
       |corpus AS (SELECT vec_id AS id, embedding AS vec FROM embeddings),
       |enc AS (
       |  SELECT id, j, c AS code FROM (
       |    SELECT cr.id, ct.j, ct.c,
       |      row_number() OVER (PARTITION BY cr.id, ct.j ORDER BY
       |        ${subDist("cr.vec", "ct.j")} ASC, ct.c ASC) AS rn
       |    FROM corpus cr CROSS JOIN cents ct)
       |  WHERE rn = 1),
       |qs AS (SELECT vec_id AS qid, embedding AS qv FROM embeddings WHERE vec_id < 5),
       |adc AS (
       |  SELECT q.qid, e.id,
       |    round(SUM(${subDist("q.qv", "e.j")}), 6) AS radc
       |  FROM qs q CROSS JOIN enc e
       |  JOIN cents ct ON ct.j = e.j AND ct.c = e.code
       |  WHERE e.id <> q.qid
       |  GROUP BY q.qid, e.id),
       |pool AS (
       |  SELECT qid, id FROM (
       |    SELECT qid, id,
       |      row_number() OVER (PARTITION BY qid ORDER BY radc ASC, id) AS prk
       |    FROM adc) WHERE prk <= ${k * poolMult}),
       |sc AS (
       |  SELECT p.qid, p.id,
       |    ${cosineFolds("qs.qv", "cv.vec")}
       |  FROM pool p
       |  JOIN corpus cv ON cv.id = p.id
       |  JOIN qs ON qs.qid = p.qid),
       |scored AS (
       |  SELECT qid, id,
       |    CASE WHEN na = 0 OR nb = 0 THEN 0.0
       |         ELSE dot / (sqrt(na) * sqrt(nb)) END AS cos
       |  FROM sc),
       |r AS (
       |  SELECT qid, id, cos,
       |    row_number() OVER (PARTITION BY qid ORDER BY cos DESC, id) AS rk
       |  FROM scored)
       |SELECT qid, id, cos, CAST(rk AS INTEGER) AS rk
       |FROM r WHERE rk <= $k ORDER BY qid, rk""".stripMargin
  }

  /** IVF-PQ oracle: the [[ivfOracle]] assignment/probe stages composed
    * with the [[pqOracle]] encode/ADC/re-rank stages, with one new
    * ingredient — the RESIDUAL `vec − centroid(cid)`, a per-element
    * single-precision subtract (correctly rounded in both engines, so
    * the residual bits reproduce; FLOAT − FLOAT stays FLOAT in DuckDB).
    * Encode argmin and re-rank folds are bit-exact; the regrouped ADC
    * sum (kernel: one accumulator over all 64 terms; SQL: 8 subspace
    * folds summed) is absorbed by the round(·, 6) both engines cut
    * the pool on.
    */
  private[graft] def ivfpqOracle(idx: graft.operators.IvfPq.Index,
                          k: Int, nprobe: Int, poolMult: Int): String = {
    val cb = idx.books
    val ds = cb.ds
    val pqRows = (for (j <- 0 until cb.m; c <- 0 until cb.ksub) yield
      s"($j, $c, ${cb.books(j)(c).map(floatLit).mkString("[", ", ", "]")})")
      .mkString(",\n    ")
    def subDist(vec: String, jExpr: String) =
      s"""list_reduce(list_transform(range(1, ${ds + 1}),
         |      i -> (CAST($vec[$jExpr * $ds + i] AS DOUBLE) - CAST(ct.cvec[i] AS DOUBLE))
         |         * (CAST($vec[$jExpr * $ds + i] AS DOUBLE) - CAST(ct.cvec[i] AS DOUBLE))),
         |      (x, y) -> x + y)""".stripMargin
    s"""WITH cents AS (
       |  SELECT * FROM (VALUES
       |    ${centroidsValues(idx.centroids)}) t(cid, cvec)),
       |pq AS (
       |  SELECT * FROM (VALUES
       |    $pqRows) t(j, c, cvec)),
       |corpus AS (SELECT vec_id AS id, embedding AS vec FROM embeddings),
       |asg AS (
       |  SELECT id, vec, cid FROM (
       |    SELECT c.id, c.vec, ct.cid,
       |      row_number() OVER (PARTITION BY c.id ORDER BY
       |        list_reduce(list_transform(range(1, 65),
       |          i -> (CAST(c.vec[i] AS DOUBLE) - CAST(ct.cvec[i] AS DOUBLE))
       |             * (CAST(c.vec[i] AS DOUBLE) - CAST(ct.cvec[i] AS DOUBLE))),
       |          (x, y) -> x + y) ASC, ct.cid ASC) AS rn
       |    FROM corpus c CROSS JOIN cents ct)
       |  WHERE rn = 1),
       |res AS (
       |  -- float residual: single-precision subtract, bit-exact
       |  SELECT a.id, a.cid,
       |    list_transform(range(1, 65), i -> a.vec[i] - ct.cvec[i]) AS rvec
       |  FROM asg a JOIN cents ct USING (cid)),
       |enc AS (
       |  SELECT id, cid, j, c AS code FROM (
       |    SELECT r.id, r.cid, ct.j, ct.c,
       |      row_number() OVER (PARTITION BY r.id, ct.j ORDER BY
       |        ${subDist("r.rvec", "ct.j")} ASC, ct.c ASC) AS rn
       |    FROM res r CROSS JOIN pq ct)
       |  WHERE rn = 1),
       |qs AS (SELECT vec_id AS qid, embedding AS qv FROM embeddings WHERE vec_id < 5),
       |qcos AS (
       |  SELECT qid, qv, cid,
       |    ${cosineFolds("qv", "cvec")}
       |  FROM qs CROSS JOIN cents),
       |qp AS (
       |  SELECT qid, qv, cid FROM (
       |    SELECT qid, qv, cid, row_number() OVER (PARTITION BY qid ORDER BY
       |      CASE WHEN na = 0 OR nb = 0 THEN 0.0
       |           ELSE dot / (sqrt(na) * sqrt(nb)) END DESC, cid ASC) AS rk
       |    FROM qcos)
       |  WHERE rk <= $nprobe),
       |qres AS (
       |  SELECT p.qid, p.cid,
       |    list_transform(range(1, 65), i -> p.qv[i] - ct.cvec[i]) AS qrv
       |  FROM qp p JOIN cents ct USING (cid)),
       |adc AS (
       |  SELECT q.qid, e.id,
       |    round(SUM(${subDist("q.qrv", "e.j")}), 6) AS radc
       |  FROM qres q
       |  JOIN enc e ON e.cid = q.cid
       |  JOIN pq ct ON ct.j = e.j AND ct.c = e.code
       |  WHERE e.id <> q.qid
       |  GROUP BY q.qid, e.id),
       |pool AS (
       |  SELECT qid, id FROM (
       |    SELECT qid, id,
       |      row_number() OVER (PARTITION BY qid ORDER BY radc ASC, id) AS prk
       |    FROM adc) WHERE prk <= ${k * poolMult}),
       |sc AS (
       |  SELECT p.qid, p.id,
       |    ${cosineFolds("qs.qv", "cv.vec")}
       |  FROM pool p
       |  JOIN corpus cv ON cv.id = p.id
       |  JOIN qs ON qs.qid = p.qid),
       |scored AS (
       |  SELECT qid, id,
       |    CASE WHEN na = 0 OR nb = 0 THEN 0.0
       |         ELSE dot / (sqrt(na) * sqrt(nb)) END AS cos
       |  FROM sc),
       |r AS (
       |  SELECT qid, id, cos,
       |    row_number() OVER (PARTITION BY qid ORDER BY cos DESC, id) AS rk
       |  FROM scored)
       |SELECT qid, id, cos, CAST(rk AS INTEGER) AS rk
       |FROM r WHERE rk <= $k ORDER BY qid, rk""".stripMargin
  }

  /** SemDeDup oracle: the [[ivfOracle]] assignment stage, within-
    * cluster exact-cosine edges (bit-exact folds, threshold on the
    * exact double), the recursive-CTE closure from `dedup_resolve`,
    * and the paper's keep rule ranked on (cos_to_centroid, id) — all
    * engine-independent given the embedded centroids.
    */
  /** Cluster-balanced sample oracle: the semDedup assignment CTE
    * (nearest centroid by squared-L2 fold, tie to lower cid) feeding
    * the unimax_mix recursive water-fill — caps keyed on the STRING
    * form of cid (mirroring waterFillByStratum's stratum cast, whose
    * driver sort is lexicographic) and selection by the portable
    * XXH64 bucket rank.
    */
  private[graft] def clusterBalancedOracle(cents: Array[Array[Float]],
                                    budget: Long): String =
    s"""WITH RECURSIVE cents AS (
       |  SELECT * FROM (VALUES
       |    ${centroidsValues(cents)}) t(cid, cvec)),
       |corpus AS (SELECT vec_id AS id, embedding AS vec FROM embeddings),
       |asg AS (
       |  SELECT id, cid FROM (
       |    SELECT c.id, ct.cid,
       |      row_number() OVER (PARTITION BY c.id ORDER BY
       |        list_reduce(list_transform(range(1, 65),
       |          i -> (CAST(c.vec[i] AS DOUBLE) - CAST(ct.cvec[i] AS DOUBLE))
       |             * (CAST(c.vec[i] AS DOUBLE) - CAST(ct.cvec[i] AS DOUBLE))),
       |          (x, y) -> x + y) ASC, ct.cid ASC) AS rn
       |    FROM corpus c CROSS JOIN cents ct)
       |  WHERE rn = 1),
       |caps AS (
       |  SELECT CAST(cid AS VARCHAR) AS s, CAST(COUNT(*) AS BIGINT) AS cap
       |  FROM asg GROUP BY 1),
       |nn AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM caps),
       |srt AS (SELECT s, cap,
       |    CAST(ROW_NUMBER() OVER (ORDER BY cap, s) AS BIGINT) AS i
       |  FROM caps),
       |alloc AS (
       |  SELECT CAST(0 AS BIGINT) AS i, CAST($budget AS BIGINT) AS rem,
       |         CAST(NULL AS VARCHAR) AS s, CAST(0 AS BIGINT) AS a
       |  UNION ALL
       |  SELECT t.i,
       |         al.rem - LEAST(t.cap, al.rem // (nn.n - t.i + 1)),
       |         t.s,
       |         LEAST(t.cap, al.rem // (nn.n - t.i + 1))
       |  FROM alloc al JOIN srt t ON t.i = al.i + 1 CROSS JOIN nn),
       |q AS (SELECT s, a AS quota FROM alloc WHERE i > 0),
       |r AS (
       |  SELECT id, cid,
       |    row_number() OVER (PARTITION BY cid
       |      ORDER BY $xxhBucket, id) AS rk
       |  FROM (${xxh64Nested("SELECT id, cid FROM asg", "id")}))
       |SELECT r.id, r.cid FROM r JOIN q ON CAST(r.cid AS VARCHAR) = q.s
       |WHERE rk <= quota
       |ORDER BY r.id""".stripMargin

  /** Semantic-drift oracle: the centroid-assignment CTE feeding the
    * corpus_drift PSI tree (same smoothing/divides/rounding), buckets
    * keyed on the cid string cast.
    */
  private[graft] def semanticDriftOracle(cents: Array[Array[Float]]): String =
    s"""WITH cents AS (
       |  SELECT * FROM (VALUES
       |    ${centroidsValues(cents)}) t(cid, cvec)),
       |corpus AS (SELECT vec_id AS id, embedding AS vec FROM embeddings),
       |asg AS (
       |  SELECT id, cid FROM (
       |    SELECT c.id, ct.cid,
       |      row_number() OVER (PARTITION BY c.id ORDER BY
       |        list_reduce(list_transform(range(1, 65),
       |          i -> (CAST(c.vec[i] AS DOUBLE) - CAST(ct.cvec[i] AS DOUBLE))
       |             * (CAST(c.vec[i] AS DOUBLE) - CAST(ct.cvec[i] AS DOUBLE))),
       |          (x, y) -> x + y) ASC, ct.cid ASC) AS rn
       |    FROM corpus c CROSS JOIN cents ct)
       |  WHERE rn = 1),
       |r AS (SELECT CAST(cid AS VARCHAR) AS bucket, COUNT(*) AS ref_n
       |  FROM asg WHERE id % 2 = 0 GROUP BY 1),
       |c AS (SELECT CAST(cid AS VARCHAR) AS bucket, COUNT(*) AS cur_n
       |  FROM asg WHERE id % 2 = 1 GROUP BY 1),
       |j AS (SELECT COALESCE(r.bucket, c.bucket) AS bucket,
       |    CAST(COALESCE(ref_n, 0) AS BIGINT) AS ref_n,
       |    CAST(COALESCE(cur_n, 0) AS BIGINT) AS cur_n
       |  FROM r FULL OUTER JOIN c ON r.bucket = c.bucket),
       |t AS (SELECT SUM(ref_n) AS rt, SUM(cur_n) AS ct,
       |    COUNT(*) AS k FROM j),
       |s AS (SELECT bucket, ref_n, cur_n,
       |    CAST(ref_n + 1 AS DOUBLE) / CAST(rt + k AS DOUBLE) AS p,
       |    CAST(cur_n + 1 AS DOUBLE) / CAST(ct + k AS DOUBLE) AS q
       |  FROM j CROSS JOIN t)
       |SELECT bucket, ref_n, cur_n, round(p, 6) AS p, round(q, 6) AS q,
       |  round((p - q) * ln(p / q), 6) AS psi_term
       |FROM s ORDER BY bucket""".stripMargin

  private[graft] def semDedupOracle(cents: Array[Array[Float]],
                             threshold: Double): String =
    s"""WITH RECURSIVE cents AS (
       |  SELECT * FROM (VALUES
       |    ${centroidsValues(cents)}) t(cid, cvec)),
       |corpus AS (SELECT vec_id AS id, embedding AS vec FROM embeddings),
       |asg AS (
       |  SELECT id, vec, cid FROM (
       |    SELECT c.id, c.vec, ct.cid,
       |      row_number() OVER (PARTITION BY c.id ORDER BY
       |        list_reduce(list_transform(range(1, 65),
       |          i -> (CAST(c.vec[i] AS DOUBLE) - CAST(ct.cvec[i] AS DOUBLE))
       |             * (CAST(c.vec[i] AS DOUBLE) - CAST(ct.cvec[i] AS DOUBLE))),
       |          (x, y) -> x + y) ASC, ct.cid ASC) AS rn
       |    FROM corpus c CROSS JOIN cents ct)
       |  WHERE rn = 1),
       |pr AS (
       |  SELECT a.id AS id_a, b.id AS id_b,
       |    ${cosineFolds("a.vec", "b.vec")}
       |  FROM asg a JOIN asg b ON a.cid = b.cid AND a.id < b.id),
       |edges AS (
       |  SELECT id_a, id_b FROM pr
       |  WHERE CASE WHEN na = 0 OR nb = 0 THEN 0.0
       |        ELSE dot / (sqrt(na) * sqrt(nb)) END >= $threshold),
       |und AS (SELECT id_a AS src, id_b AS dst FROM edges
       |  UNION ALL SELECT id_b, id_a FROM edges),
       |reach AS (
       |  SELECT src, dst FROM und
       |  UNION
       |  SELECT r.src, u.dst FROM reach r JOIN und u ON u.src = r.dst),
       |comp AS (
       |  SELECT c.id, LEAST(c.id, COALESCE(MIN(r.dst), c.id)) AS canonical_id
       |  FROM corpus c LEFT JOIN reach r ON r.src = c.id GROUP BY c.id),
       |cc AS (
       |  SELECT a.id, a.cid,
       |    ${cosineFolds("a.vec", "ct.cvec")}
       |  FROM asg a JOIN cents ct USING (cid)),
       |scored AS (
       |  SELECT id, cid,
       |    CASE WHEN na = 0 OR nb = 0 THEN 0.0
       |         ELSE dot / (sqrt(na) * sqrt(nb)) END AS cos_centroid
       |  FROM cc),
       |ranked AS (
       |  SELECT s.id, s.cid, m.canonical_id, s.cos_centroid,
       |    row_number() OVER (PARTITION BY m.canonical_id
       |      ORDER BY s.cos_centroid ASC, s.id) AS rk
       |  FROM scored s JOIN comp m ON m.id = s.id)
       |SELECT id, cid, canonical_id, cos_centroid, (rk = 1) AS keep
       |FROM ranked ORDER BY id""".stripMargin

  /** Oracles that need this session's trained state. Called by Verify
    * AFTER the query dump, so the `trainCached` calls are cache hits
    * on the very codebooks that produced the dumped results (same
    * cache keys as [[graft.queries.VectorQueries.annIvf]] /
    * [[graft.queries.VectorQueries.annPq]]).
    */
  /** PCA oracle: the plan-literal projection fold mirrored in
    * list_transform/list_reduce — float→double widening exact, center
    * /multiply/fold/√-divide all correctly rounded, model doubles
    * embedded as 17-significant-digit SCIENTIFIC literals: DuckDB
    * parses exponent-form numerics as DOUBLE (plain decimals become
    * DECIMAL, and the list literal's common-type resolution then
    * perturbs the low bits), and 17 digits round-trip any double to
    * identical bits.
    */
  private[graft] def pcaOracle(model: graft.operators.Pca.Model): String = {
    // Locale.ROOT: f"" interpolation uses the JVM default locale, and a
    // comma-decimal locale (de_DE) would emit SQL-invalid literals.
    def d(x: Double) = String.format(java.util.Locale.ROOT, "%.17e", Double.box(x))
    def dlist(xs: Array[Double]) = xs.map(d).mkString("[", ", ", "]")
    val comps = model.basis.indices.map { j =>
      s"""list_reduce(list_transform(range(1, ${model.mean.length + 1}),
         |    i -> (CAST(embedding[i] AS DOUBLE) - m[i]) * b${j + 1}[i]),
         |    (a, b) -> a + b)
         |  / sqrt(${d(model.eigenvalues(j))}) AS pc${j + 1}""".stripMargin
    }.mkString(",\n  ")
    val axes = model.basis.indices
      .map(j => s"${dlist(model.basis(j))} AS b${j + 1}").mkString(",\n  ")
    s"""WITH mdl AS (SELECT
       |  ${dlist(model.mean)} AS m,
       |  $axes)
       |SELECT vec_id AS id,
       |  $comps
       |FROM embeddings CROSS JOIN mdl
       |ORDER BY id""".stripMargin
  }
}
