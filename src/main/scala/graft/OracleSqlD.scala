package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries._
import OracleFns._
import OracleFnsTrained._

/** quality/privacy/AB-stats/media/stream oracle SQL (split from SparkEntry - part D).
  *
  * Same package, no behavior change: [[SparkEntry.oracleSql]] is the
  * concatenation of the four parts; shared SQL builders live in
  * [[OracleFns]].
  */
private[graft] object OracleSqlD {

  /** C116 oracle — half-unit ranks on the |d| value domain, 2W⁺ and
    * the tie census exact integers, one IEEE z. Shared VERBATIM by
    * `ab_wilcoxon_signed` and the E39 stream face (stream ≡ batch on
    * the merged additive per-(user, half) cells). Declared before
    * `sql` so object-init order keeps the map's reference valid.
    */
  private val wilcoxonSignedSql: String = {
    val nD = "CAST(n AS DOUBLE)"
    val vr = s"""(($nD * ($nD + 1.0) * (2.0 * $nD + 1.0)) / 24.0
      | - CAST(tie AS DOUBLE) / 48.0)""".stripMargin
    val num = "(CAST(w2 * 2 - n * (n + 1) AS DOUBLE) / 4.0)"
    s"""WITH u AS (SELECT user_id,
       |    CAST(COALESCE(SUM(CASE WHEN event_type = 'purchase'
       |      AND day(ts) BETWEEN 16 AND 31
       |      THEN CAST(value AS DECIMAL(18,2)) * 100 END), 0) AS BIGINT)
       |    - CAST(COALESCE(SUM(CASE WHEN event_type = 'purchase'
       |      AND day(ts) BETWEEN 1 AND 15
       |      THEN CAST(value AS DECIMAL(18,2)) * 100 END), 0) AS BIGINT)
       |      AS d
       |  FROM events GROUP BY 1),
       |nz AS (SELECT abs(d) AS a,
       |    CASE WHEN d > 0 THEN 1 ELSE 0 END AS p
       |  FROM u WHERE d <> 0),
       |g AS (SELECT a, CAST(COUNT(*) AS HUGEINT) AS c,
       |    CAST(SUM(p) AS HUGEINT) AS cp
       |  FROM nz GROUP BY 1),
       |cc AS (SELECT c, cp, SUM(c) OVER (ORDER BY a) AS cum FROM g),
       |ag AS (SELECT
       |    CAST(COALESCE(SUM(c), 0) AS BIGINT) AS n,
       |    CAST(COALESCE(SUM(cp), 0) AS BIGINT) AS n_pos,
       |    COALESCE(SUM(cp * (cum * 2 - c + 1)), 0) AS w2,
       |    COALESCE(SUM(c * c * c - c), 0) AS tie
       |  FROM cc)
       |SELECT n AS n_nonzero, n_pos,
       |  CAST(w2 AS DOUBLE) / 2.0 AS w_plus,
       |  CASE WHEN n > 0 AND $vr > 0.0 THEN round(
       |    $num / sqrt($vr), 6) END AS z_stat
       |FROM ag""".stripMargin
  }

  private[graft] val staticSql: Map[String, String] = Map(

    // D71: reciprocal-rank fusion over three quality legs. Each leg
    // signal reuses an oracle-proven expression tree (D14 composite,
    // D37 CE, D29 trigram dup-frac) — bit-exact values, so the
    // per-lang doc_id-tiebroken rank cuts cannot diverge; the fused
    // sum is three fixed-order correctly-rounded terms, ordered on
    // the ROUNDED value like the D59 fusion.
    "quality_fusion" -> {
      s"""WITH t AS (
         |  SELECT doc_id, lang,
         |    string_split_regex(trim(text), '\\s+') AS tk,
         |    string_split_regex(
         |      regexp_replace(text, '^\\s+|\\s+$$', '', 'g'), '\\s+') AS tk2
         |  FROM documents),
         |q AS (
         |  SELECT doc_id, lang,
         |    0.4 * least(CAST(len(tk) AS DOUBLE) / 64.0, 1.0)
         |    + 0.4 * (CAST(len(list_distinct(tk)) AS DOUBLE)
         |             / CAST(len(tk) AS DOUBLE))
         |    + 0.2 * least((CAST(len(list_filter(tk, x -> list_contains(
         |        ['the','a','of','and','to','in','is'], x))) AS DOUBLE)
         |        / CAST(len(tk) AS DOUBLE)) * 8.0, 1.0) AS quality
         |  FROM t),
         |tok AS (
         |  SELECT doc_id, unnest(string_split_regex(trim(text), '\\s+')) AS w
         |  FROM documents WHERE len(trim(text)) > 0),
         |cnt AS (SELECT w, COUNT(*) AS c FROM tok GROUP BY w),
         |top AS (SELECT w, c FROM cnt ORDER BY c DESC, w LIMIT 64),
         |dnm AS (
         |  SELECT CAST((SELECT SUM(c) FROM cnt)
         |    + (SELECT COUNT(*) FROM top) + 1 AS DOUBLE) AS d),
         |lp AS (
         |  SELECT t2.doc_id,
         |    COALESCE(ln(CAST(tp.c + 1 AS DOUBLE) / d), ln(1.0 / d)) AS lnp
         |  FROM tok t2 LEFT JOIN top tp USING (w), dnm),
         |sc AS (SELECT doc_id, COUNT(*) AS nt, SUM(lnp) AS sl
         |       FROM lp GROUP BY doc_id),
         |ce AS (
         |  SELECT t.doc_id, t.lang,
         |    COALESCE(round(-sl / nt, 6), CAST(0 AS DOUBLE)) AS ce
         |  FROM t LEFT JOIN sc USING (doc_id)),
         |tg AS (
         |  SELECT doc_id, lang,
         |    list_transform(range(1, greatest(len(tk2) - 1, 1)),
         |      i -> tk2[i] || ' ' || tk2[i+1] || ' ' || tk2[i+2]) AS g
         |  FROM t),
         |rep AS (
         |  SELECT doc_id, lang,
         |    CASE WHEN len(g) = 0 THEN 0.0
         |         ELSE CAST(len(g) - len(list_distinct(g)) AS DOUBLE)
         |              / CAST(len(g) AS DOUBLE) END AS rep
         |  FROM tg),
         |lq AS (
         |  SELECT lang, doc_id, CAST(row_number() OVER (PARTITION BY lang
         |    ORDER BY quality DESC, doc_id) AS INTEGER) AS rq
         |  FROM q QUALIFY rq <= 100),
         |lc AS (
         |  SELECT lang, doc_id, CAST(row_number() OVER (PARTITION BY lang
         |    ORDER BY ce ASC, doc_id) AS INTEGER) AS rc
         |  FROM ce QUALIFY rc <= 100),
         |lr AS (
         |  SELECT lang, doc_id, CAST(row_number() OVER (PARTITION BY lang
         |    ORDER BY rep ASC, doc_id) AS INTEGER) AS rr
         |  FROM rep QUALIFY rr <= 100),
         |f AS (
         |  SELECT lang, doc_id, rq, rc, rr,
         |    ROUND(COALESCE(1.0 / (60.0 + rq), 0.0)
         |      + COALESCE(1.0 / (60.0 + rc), 0.0)
         |      + COALESCE(1.0 / (60.0 + rr), 0.0), 9) AS fused
         |  FROM lq FULL OUTER JOIN lc USING (lang, doc_id)
         |    FULL OUTER JOIN lr USING (lang, doc_id))
         |SELECT lang, doc_id, rq, rc, rr, fused,
         |  CAST(rk AS INTEGER) AS rk
         |FROM (SELECT *, row_number() OVER (PARTITION BY lang
         |  ORDER BY fused DESC, doc_id) AS rk FROM f)
         |WHERE rk <= 20 ORDER BY lang, rk""".stripMargin
    },

    // D57: containment = c / min(na, nb) — one divide of exact
    // integers, bit-identical cross-engine; shingles are the D17
    // trigram definition verbatim.
    "dedup_containment" ->
      """WITH t AS (SELECT doc_id,
        |    string_split_regex(trim(text), '\s+') AS tk FROM documents),
        |s AS (SELECT doc_id, list_distinct(list_transform(range(1, len(tk) - 1),
        |  i -> tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2])) AS sh FROM t),
        |ex AS (SELECT doc_id, len(sh) AS n, unnest(sh) AS shingle FROM s),
        |pairs AS (
        |  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS c,
        |    any_value(a.n) AS na, any_value(b.n) AS nb
        |  FROM ex a JOIN ex b ON a.shingle = b.shingle AND b.doc_id > a.doc_id
        |  GROUP BY 1, 2)
        |SELECT id_a, id_b,
        |  CAST(c AS DOUBLE) / CAST(LEAST(na, nb) AS DOUBLE) AS containment
        |FROM pairs
        |WHERE CAST(c AS DOUBLE) / CAST(LEAST(na, nb) AS DOUBLE) >= 0.8
        |ORDER BY id_a, id_b""".stripMargin,

    // D56: closed-form naive-Bayes log-odds classifier. Counts, the
    // top-128 vocab cut (ties by word), and class totals are exact
    // integers — both engines derive the SAME model; ln drift +
    // double-sum reorder absorbed by the 6-dp rounding (the LM
    // oracle argument). `predicted` compares the ROUNDED margin, so
    // the boolean is a function of the already-hash-checked value.
    "quality_classifier" -> qualityClassifierSql,

    // E16: model + quota cut + threshold re-derived from the same
    // replay; the >= rule applied identically in both engines
    "stream_classifier_gate" ->
      s"""WITH qc AS (${qualityClassifierSql.replace("ORDER BY d.doc_id", "")}),
        |rk AS (
        |  SELECT doc_id, margin,
        |    row_number() OVER (ORDER BY margin DESC, doc_id) AS rn,
        |    COUNT(*) OVER () AS n
        |  FROM qc),
        |thr AS (SELECT min(margin) AS t FROM rk
        |        WHERE rn <= CAST(ceil(n * 0.5) AS BIGINT))
        |SELECT q.doc_id, q.margin FROM qc q, thr
        |WHERE q.margin >= t ORDER BY q.doc_id""".stripMargin,

    // D55: fixed 64-char windows, stride 48; chunk count =
    // (max(0, n-64) + 47) DIV 48 + 1 — positive integer division, so
    // truncating (Spark DIV) ≡ floor (DuckDB //).
    "doc_chunking" ->
      """WITH n AS (
        |  SELECT doc_id, text,
        |    unnest(range(0, (greatest(length(text) - 64, 0) + 47) // 48 + 1)) AS k
        |  FROM documents WHERE length(text) > 0)
        |SELECT doc_id, CAST(k AS INTEGER) AS chunk_id,
        |  CAST(k * 48 AS INTEGER) AS chunk_start,
        |  substring(text, CAST(k * 48 + 1 AS INTEGER), 64) AS chunk_text,
        |  CAST(length(substring(text, CAST(k * 48 + 1 AS INTEGER), 64))
        |    AS INTEGER) AS chunk_len
        |FROM n ORDER BY doc_id, chunk_id""".stripMargin,

    "paragraph_dedup" -> paragraphDedupSql,
    "stream_boilerplate_strip" -> paragraphDedupSql,

    // C39: same C8 session CTE; the sweep line runs per day with
    // carry-in from a calendar join (equivalent to the Spark side's
    // midnight explode: calendar day D counts a session iff
    // t_start < D <= t_end).
    // C64: the distributed sort-scan keeps a row iff no strictly-
    // earlier row in (x asc, y desc, id) order has y >= it — exactly
    // the dominance predicate plus the least-id duplicate tiebreak;
    // dominance compares STORED values only, so doubles are bit-safe
    "pareto_frontier" ->
      """SELECT p_partkey, p_retailprice, p_size FROM part t
        |WHERE NOT EXISTS (SELECT 1 FROM part e WHERE
        |  (e.p_retailprice < t.p_retailprice AND e.p_size >= t.p_size) OR
        |  (e.p_retailprice <= t.p_retailprice AND e.p_size > t.p_size) OR
        |  (e.p_retailprice = t.p_retailprice AND e.p_size = t.p_size
        |   AND e.p_partkey < t.p_partkey))
        |ORDER BY p_partkey""".stripMargin,

    "peak_concurrency" ->
      """WITH e AS (
        |  SELECT user_id, ts, event_id,
        |    CASE WHEN lag(ts) OVER w IS NULL
        |              OR ts - lag(ts) OVER w > INTERVAL 4 HOUR
        |         THEN 1 ELSE 0 END AS flag
        |  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        |s0 AS (
        |  SELECT user_id, ts, SUM(flag) OVER (
        |    PARTITION BY user_id ORDER BY ts, event_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
        |  FROM e),
        |s AS (SELECT user_id, sid, MIN(ts) AS t_start, MAX(ts) AS t_end
        |  FROM s0 GROUP BY 1, 2),
        |d AS (SELECT date_trunc('day', t) AS day, t, d FROM (
        |  SELECT t_start AS t, 1 AS d FROM s
        |  UNION ALL SELECT t_end, -1 FROM s)),
        |r AS (SELECT day, SUM(d) OVER (PARTITION BY day ORDER BY t, d
        |  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS run FROM d),
        |m AS (SELECT day, MAX(run) AS mr FROM r GROUP BY day),
        |cal AS (SELECT DISTINCT date_trunc('day', ts) AS day FROM events),
        |carry AS (SELECT cal.day, COUNT(*) AS c
        |  FROM s JOIN cal ON cal.day > s.t_start AND cal.day <= s.t_end
        |  GROUP BY 1)
        |SELECT CAST(COALESCE(m.day, carry.day) AS TIMESTAMP) AS day,
        |  CAST(COALESCE(carry.c, 0)
        |    + greatest(0, COALESCE(m.mr, 0)) AS BIGINT) AS peak
        |FROM m FULL OUTER JOIN carry ON m.day = carry.day
        |ORDER BY day""".stripMargin,

    // C38: thresholds off the per-type cumulative bucket histogram;
    // lo/hi are integer buckets so the /100.0 divides and the clamp
    // are identically-rounded doubles on both engines.
    "events_winsorize" ->
      """WITH b AS (SELECT event_id, event_type, value,
        |    CAST(floor(value * 100.0) AS BIGINT) AS bk FROM events),
        |h AS (SELECT event_type, bk, COUNT(*) AS c FROM b GROUP BY 1, 2),
        |cumt AS (SELECT event_type, bk,
        |    SUM(c) OVER (PARTITION BY event_type ORDER BY bk
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
        |    SUM(c) OVER (PARTITION BY event_type) AS total
        |  FROM h),
        |thr AS (SELECT event_type,
        |    MIN(CASE WHEN cum >= 0.05 * total THEN bk END) AS lo,
        |    MIN(CASE WHEN cum >= 0.95 * total THEN bk END) AS hi
        |  FROM cumt GROUP BY 1)
        |SELECT event_id, b.event_type, value,
        |  least(greatest(value, lo / 100.0), hi / 100.0) AS clipped
        |FROM b JOIN thr USING (event_type)
        |ORDER BY event_id""".stripMargin,

    // C59: decile boundaries off the same cent-bucket histogram; the
    // per-event decile is an all-integer fold over the nine broadcast
    // thresholds, so no double boundary can diverge
    "quantile_buckets" -> {
      val bs = (1 to 9).map(d =>
        s"MIN(CASE WHEN cum >= ${d / 10.0} * total THEN bk END) AS b$d")
        .mkString(",\n    ")
      val fold = (1 to 9).map(d =>
        s"(CASE WHEN bk > b$d THEN 1 ELSE 0 END)").mkString(" + ")
      s"""WITH b AS (SELECT event_id, event_type, value,
         |    CAST(floor(value * 100.0) AS BIGINT) AS bk FROM events),
         |h AS (SELECT event_type, bk, COUNT(*) AS c FROM b GROUP BY 1, 2),
         |cumt AS (SELECT event_type, bk,
         |    SUM(c) OVER (PARTITION BY event_type ORDER BY bk
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
         |    SUM(c) OVER (PARTITION BY event_type) AS total
         |  FROM h),
         |thr AS (SELECT event_type,
         |    $bs
         |  FROM cumt GROUP BY 1)
         |SELECT event_id, b.event_type, value,
         |  CAST(1 + $fold AS INTEGER) AS decile
         |FROM b JOIN thr USING (event_type)
         |ORDER BY event_id""".stripMargin
    },

    // C72: micro-unit integer AA weights (round(1e6/ln d) — the one
    // libm ln sits inside a per-term rounding both engines apply),
    // pair scores exact integer sums, total-order top-20
    "adamic_adar_links" ->
      """WITH m AS (SELECT DISTINCT o_custkey AS l, l_suppkey AS r
        |  FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
        |deg AS (SELECT l, COUNT(*) AS d FROM m GROUP BY 1
        |  HAVING COUNT(*) >= 2 AND COUNT(*) <= 10000),
        |w AS (SELECT l,
        |    CAST(round(1000000.0 / ln(CAST(d AS DOUBLE))) AS BIGINT) AS w
        |  FROM deg),
        |mw AS (SELECT m.l, m.r, w.w FROM m JOIN w USING (l)),
        |wedge AS (SELECT x.r AS a, y.r AS b, x.w
        |  FROM mw x JOIN mw y ON x.l = y.l AND x.r < y.r),
        |p AS (SELECT a, b, CAST(COUNT(*) AS BIGINT) AS common_neighbors,
        |    SUM(w) AS aa FROM wedge GROUP BY 1, 2)
        |SELECT a, b, common_neighbors,
        |  CAST(aa AS DOUBLE) / 1000000.0 AS aa_score
        |FROM p ORDER BY aa DESC, a, b LIMIT 20""".stripMargin,

    // D103: first-occurrence vocab growth at 10 integer thresholds,
    // OLS chain in the same textual order as the Spark reduceLeft
    "heaps_law_fit" -> heapsOracle,

    // D106: exact cumulative integers per candidate, one IEEE
    // impurity evaluation each, argmin on the 6-dp-rounded value
    // with the smallest threshold breaking ties
    "best_length_split" ->
      """WITH t AS (
        |  SELECT string_split_regex(trim(text), '\s+') AS tk, text
        |  FROM documents),
        |v AS (
        |  SELECT CAST(len(tk) AS BIGINT) AS f,
        |    (len(tk) BETWEEN 40 AND 100000
        |      AND CAST(len(regexp_replace(trim(text), '\s+', '', 'g'))
        |            AS DOUBLE) / CAST(len(tk) AS DOUBLE) BETWEEN 3.0 AND 5.0
        |      AND CAST(len(list_filter(tk, w -> regexp_matches(w, '[a-z]')))
        |            AS DOUBLE) / CAST(len(tk) AS DOUBLE) >= 0.8
        |      AND len(list_filter(tk, w -> list_contains(
        |            ['the', 'a', 'of', 'to', 'and'], w))) >= 1) AS l
        |  FROM t),
        |g AS (SELECT f, COUNT(*) AS c,
        |    SUM(CASE WHEN l THEN 1 ELSE 0 END) AS p FROM v GROUP BY 1),
        |cu AS (SELECT f,
        |    SUM(c) OVER w AS cn, SUM(p) OVER w AS cp
        |  FROM g WINDOW w AS (ORDER BY f
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
        |tt AS (SELECT CAST(SUM(c) AS BIGINT) AS n,
        |    CAST(SUM(p) AS BIGINT) AS np FROM g),
        |s AS (SELECT f,
        |    round(2.0 * CAST(cp AS DOUBLE)
        |        * (CAST(cn AS DOUBLE) - CAST(cp AS DOUBLE))
        |        / (CAST(n AS DOUBLE) * CAST(cn AS DOUBLE))
        |      + 2.0 * (CAST(np AS DOUBLE) - CAST(cp AS DOUBLE))
        |        * ((CAST(n AS DOUBLE) - CAST(cn AS DOUBLE))
        |          - (CAST(np AS DOUBLE) - CAST(cp AS DOUBLE)))
        |        / (CAST(n AS DOUBLE)
        |          * (CAST(n AS DOUBLE) - CAST(cn AS DOUBLE))), 6) AS gini,
        |    n, np
        |  FROM cu CROSS JOIN tt WHERE cn < n),
        |m AS (SELECT MIN(gini) AS mn FROM s)
        |SELECT MIN(f) AS threshold, MAX(gini) AS gini_split,
        |  MAX(n) AS n, MAX(np) AS n_pos,
        |  round(2.0 * CAST(MAX(np) AS DOUBLE)
        |    * CAST(MAX(n) - MAX(np) AS DOUBLE)
        |    / (CAST(MAX(n) AS DOUBLE) * CAST(MAX(n) AS DOUBLE)), 6)
        |    AS gini_root
        |FROM s CROSS JOIN m WHERE gini = mn""".stripMargin,

    // D105: half-unit average ranks (2·cum − c + 1) per variable,
    // exact sums, rho one IEEE evaluation (pinned parenthesization)
    "spearman_signals" ->
      """WITH t AS (
        |  SELECT doc_id, string_split_regex(trim(text), '\s+') AS tk
        |  FROM documents),
        |c AS (
        |  SELECT doc_id,
        |    CAST(len(tk) AS DOUBLE) AS n,
        |    CAST(len(list_distinct(tk)) AS DOUBLE) AS u,
        |    CAST(len(list_filter(tk, x -> list_contains(
        |      ['the','a','of','and','to','in','is'], x))) AS DOUBLE) AS h
        |  FROM t),
        |v AS (
        |  SELECT CAST(n AS BIGINT) AS x,
        |    CAST(round((0.4 * least(n / 64.0, 1.0) + 0.4 * (u / n)
        |      + 0.2 * least((h / n) * 8.0, 1.0)) * 1000000.0) AS BIGINT)
        |      AS y
        |  FROM c),
        |rx AS (SELECT x, 2 * SUM(COUNT(*)) OVER (ORDER BY x
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |    - COUNT(*) + 1 AS xr2 FROM v GROUP BY x),
        |ry AS (SELECT y, 2 * SUM(COUNT(*)) OVER (ORDER BY y
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |    - COUNT(*) + 1 AS yr2 FROM v GROUP BY y),
        |j AS (SELECT xr2, yr2 FROM v JOIN rx USING (x) JOIN ry USING (y)),
        |a AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
        |    CAST(SUM(xr2) AS DOUBLE) AS sx, CAST(SUM(yr2) AS DOUBLE) AS sy,
        |    CAST(SUM(CAST(xr2 AS HUGEINT) * yr2) AS DOUBLE) AS sxy,
        |    CAST(SUM(CAST(xr2 AS HUGEINT) * xr2) AS DOUBLE) AS sxx,
        |    CAST(SUM(CAST(yr2 AS HUGEINT) * yr2) AS DOUBLE) AS syy
        |  FROM j)
        |SELECT n,
        |  CASE WHEN CAST(n AS DOUBLE) * sxx - sx * sx > 0.0
        |        AND CAST(n AS DOUBLE) * syy - sy * sy > 0.0 THEN
        |    round((CAST(n AS DOUBLE) * sxy - sx * sy)
        |      / (sqrt(CAST(n AS DOUBLE) * sxx - sx * sx)
        |        * sqrt(CAST(n AS DOUBLE) * syy - sy * sy)), 6)
        |  END AS rho
        |FROM a""".stripMargin,

    // C81: Apriori level-1 prune, exact counts, total-order top-30
    "frequent_triples" ->
      """WITH lp AS MATERIALIZED (
        |  SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem),
        |fi AS MATERIALIZED (
        |  SELECT pk FROM lp GROUP BY pk HAVING COUNT(*) >= 2),
        |pr AS MATERIALIZED (SELECT lp.ok, lp.pk FROM lp JOIN fi USING (pk))
        |SELECT a.pk AS u, b.pk AS v, c.pk AS w,
        |  CAST(COUNT(*) AS BIGINT) AS support
        |FROM pr a JOIN pr b ON a.ok = b.ok AND a.pk < b.pk
        |  JOIN pr c ON a.ok = c.ok AND b.pk < c.pk
        |GROUP BY 1, 2, 3 HAVING COUNT(*) >= 2
        |ORDER BY support DESC, u, v, w LIMIT 30""".stripMargin,

    // C80: cross-multiplied integer gap argmax (earliest value on
    // ties), D one divide, threshold compare on the unrounded D
    "ab_ks_test" ->
      """WITH p AS (SELECT user_id % 2 AS arm, value AS v
        |  FROM events WHERE event_type = 'purchase'),
        |g AS (SELECT v,
        |    SUM(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS c0,
        |    SUM(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS c1
        |  FROM p GROUP BY 1),
        |c AS (SELECT v,
        |    SUM(c0) OVER w AS cum0, SUM(c1) OVER w AS cum1
        |  FROM g WINDOW w AS (ORDER BY v
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
        |t AS (SELECT CAST(SUM(c0) AS BIGINT) AS n0,
        |    CAST(SUM(c1) AS BIGINT) AS n1 FROM g),
        |s AS (SELECT v,
        |    ABS(CAST(cum0 AS HUGEINT) * n1 - CAST(cum1 AS HUGEINT) * n0)
        |      AS gap, n0, n1
        |  FROM c CROSS JOIN t),
        |m AS (SELECT MAX(gap) AS mx FROM s)
        |SELECT MAX(n0) AS n_a, MAX(n1) AS n_b,
        |  MIN(v) AS ks_at_value,
        |  round(CAST(MAX(gap) AS DOUBLE)
        |    / (CAST(MAX(n0) AS DOUBLE) * CAST(MAX(n1) AS DOUBLE)), 6)
        |    AS ks_stat,
        |  CAST(MAX(gap) AS DOUBLE)
        |    / (CAST(MAX(n0) AS DOUBLE) * CAST(MAX(n1) AS DOUBLE))
        |    > 1.358 * sqrt(CAST(MAX(n0) + MAX(n1) AS DOUBLE)
        |      / (CAST(MAX(n0) AS DOUBLE) * CAST(MAX(n1) AS DOUBLE)))
        |    AS reject_05
        |FROM s CROSS JOIN m WHERE gap = mx""".stripMargin,

    // C79: first digit off the cents integer's decimal string (no
    // float log in the decision path); the expected probabilities are
    // the SAME Scala-rendered double constants on both sides
    // E28's stream face merges additive per-batch digit counts to the
    // IDENTICAL count frame — one SQL proves both
    "benford_audit" -> benfordSql,
    "stream_benford" -> benfordSql,

    // C78: exact integer day-series sums per lag, Pearson one IEEE
    // evaluation with pinned parenthesization
    "lead_lag_correlation" ->
      """WITH daily AS (SELECT CAST(date_trunc('day', ts) AS DATE) AS day,
        |    CAST(SUM(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END)
        |      AS BIGINT) AS x,
        |    CAST(COALESCE(SUM(CASE WHEN event_type = 'purchase'
        |      THEN CAST(value AS DECIMAL(18,2)) * 100 END), 0) AS BIGINT)
        |      AS y
        |  FROM events GROUP BY 1),
        |lags AS (SELECT CAST(unnest(range(-3, 4)) AS INTEGER) AS lag),
        |j AS (SELECT lag, a.x AS x, b.y AS y
        |  FROM daily a CROSS JOIN lags JOIN daily b
        |    ON a.day + to_days(lag) = b.day),
        |g AS (SELECT lag, CAST(COUNT(*) AS BIGINT) AS n_days,
        |    CAST(SUM(x) AS DOUBLE) AS sx, CAST(SUM(y) AS DOUBLE) AS sy,
        |    CAST(SUM(CAST(x AS HUGEINT) * y) AS DOUBLE) AS sxy,
        |    CAST(SUM(CAST(x AS HUGEINT) * x) AS DOUBLE) AS sxx,
        |    CAST(SUM(CAST(y AS HUGEINT) * y) AS DOUBLE) AS syy
        |  FROM j GROUP BY 1)
        |SELECT lag, n_days,
        |  CASE WHEN CAST(n_days AS DOUBLE) * sxx - sx * sx > 0.0
        |        AND CAST(n_days AS DOUBLE) * syy - sy * sy > 0.0 THEN
        |    round((CAST(n_days AS DOUBLE) * sxy - sx * sy)
        |      / (sqrt(CAST(n_days AS DOUBLE) * sxx - sx * sx)
        |        * sqrt(CAST(n_days AS DOUBLE) * syy - sy * sy)), 6)
        |  END AS r
        |FROM g ORDER BY lag""".stripMargin,

    // C77: user-partitioned lead pairs, exact integer cells, one
    // divide per probability
    "event_transitions" ->
      """WITH p AS (SELECT user_id, ts, event_id, event_type AS cur,
        |    lead(event_type, 1) OVER (PARTITION BY user_id
        |      ORDER BY ts, event_id) AS nxt
        |  FROM events),
        |c AS (SELECT cur, nxt, CAST(COUNT(*) AS BIGINT) AS n FROM p
        |  WHERE nxt IS NOT NULL GROUP BY 1, 2),
        |t AS (SELECT cur, SUM(n) AS tot FROM c GROUP BY 1)
        |SELECT c.cur, c.nxt, c.n,
        |  round(CAST(c.n AS DOUBLE) / CAST(tot AS DOUBLE), 6) AS p
        |FROM c JOIN t USING (cur)
        |ORDER BY cur, nxt""".stripMargin,

    // D102: the D13 lang-id CTE verbatim as predictions, exact cells
    "langid_confusion" ->
      """WITH t AS (
        |  SELECT doc_id, lang,
        |    string_split_regex(trim(text), '\s+') AS tk FROM documents),
        |h AS (
        |  SELECT doc_id, lang,
        |    len(list_filter(tk, x -> list_contains(['the','a','of','and','to','in','is'], x))) AS he,
        |    len(list_filter(tk, x -> list_contains(['le','la','et','les','des','un','une'], x))) AS hf,
        |    len(list_filter(tk, x -> list_contains(['der','die','und','das','ein','nicht'], x))) AS hd,
        |    len(list_filter(tk, x -> list_contains(['el','los','y','que','un','una','en'], x))) AS hs
        |  FROM t),
        |pr AS (SELECT lang AS true_lang,
        |    CASE WHEN greatest(he, hf, hd, hs) = 0 THEN 'und'
        |         WHEN he = greatest(he, hf, hd, hs) THEN 'en'
        |         WHEN hf = greatest(he, hf, hd, hs) THEN 'fr'
        |         WHEN hd = greatest(he, hf, hd, hs) THEN 'de'
        |         ELSE 'es' END AS pred_lang
        |  FROM h),
        |c AS (SELECT true_lang, pred_lang, CAST(COUNT(*) AS BIGINT) AS n
        |  FROM pr GROUP BY 1, 2),
        |tt AS (SELECT true_lang, SUM(n) AS tot FROM c GROUP BY 1)
        |SELECT c.true_lang, c.pred_lang, c.n,
        |  round(CAST(c.n AS DOUBLE) / CAST(tot AS DOUBLE), 6) AS share
        |FROM c JOIN tt USING (true_lang)
        |ORDER BY true_lang, pred_lang""".stripMargin,

    // C76: the oracle is DuckDB's BUILT-IN jaro_winkler_similarity —
    // an independent implementation of the same Winkler-1990
    // convention (window ⌊max/2⌋−1, halved transpositions, ≤4-char
    // prefix at 0.1, 0.7 boost threshold); 6-dp rounding on both
    // sides absorbs the ulp between the two codebases
    "jaro_winkler_links" ->
      """WITH p AS (SELECT p_partkey AS pk, p_name AS name,
        |    substr(p_name, 1, 8) AS blk FROM part)
        |SELECT a.pk AS id_a, b.pk AS id_b,
        |  a.name AS name_a, b.name AS name_b,
        |  round(jaro_winkler_similarity(a.name, b.name), 6) AS jw
        |FROM p a JOIN p b ON a.blk = b.blk AND a.pk < b.pk
        |WHERE round(jaro_winkler_similarity(a.name, b.name), 6) >= 0.94
        |ORDER BY jw DESC, id_a, id_b LIMIT 50""".stripMargin,

    // C75: per-time (deaths, leavers) exact integers; at-risk via the
    // exclusive cumulative over the day domain; the survival product
    // folds in pinned time order with seed 1.0, each factor one IEEE
    // divide — list_reduce mirrors the association
    "km_retention" ->
      """WITH u AS (SELECT user_id,
        |    CAST(min(date_trunc('day', ts)) AS DATE) AS fd,
        |    CAST(max(date_trunc('day', ts)) AS DATE) AS ld,
        |    CAST(min(CASE WHEN event_type = 'error'
        |      THEN date_trunc('day', ts) END) AS DATE) AS ed
        |  FROM events GROUP BY 1),
        |s AS (SELECT CAST(CASE WHEN ed IS NOT NULL
        |      THEN date_diff('day', fd, ed)
        |      ELSE date_diff('day', fd, ld) END AS BIGINT) AS t,
        |    (ed IS NULL) AS cens FROM u),
        |bt AS (SELECT t,
        |    CAST(SUM(CASE WHEN NOT cens THEN 1 ELSE 0 END) AS BIGINT) AS d,
        |    CAST(COUNT(*) AS BIGINT) AS leave
        |  FROM s GROUP BY 1),
        |n AS (SELECT CAST(COUNT(*) AS BIGINT) AS total FROM s),
        |r AS (SELECT t, d,
        |    total - COALESCE(SUM(leave) OVER (ORDER BY t
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |      AS n_risk
        |  FROM bt CROSS JOIN n),
        |dr AS (SELECT t, CAST(n_risk AS BIGINT) AS n_risk, d
        |  FROM r WHERE d >= 1)
        |SELECT a.t, a.n_risk, a.d AS d_events,
        |  round(list_reduce(list_prepend(1.0,
        |    list(CAST(b.n_risk - b.d AS DOUBLE) / CAST(b.n_risk AS DOUBLE)
        |      ORDER BY b.t)),
        |    (x, y) -> x * y), 6) AS survival
        |FROM dr a JOIN dr b ON b.t <= a.t
        |GROUP BY a.t, a.n_risk, a.d
        |ORDER BY a.t""".stripMargin,

    // C74: goodness-of-fit vs the designed 50/50 split reduces to
    // (n_a − n_b)²/N — one IEEE evaluation over exact counts; flag
    // compares the UNROUNDED statistic to the 1-dof 5% critical value
    // C82: the Wald-bound constants and the per-step ln literals are
    // the EXACT doubles the Spark plan carries (sprtOracle interpolates
    // Scala's round-trip repr), so K·ln(...) is bit-identical in both
    // engines at any cumulative count
    "ab_sprt_monitor" -> sprtOracle(0.18, 0.22, 0.05, 0.05),
    "ab_msprt_monitor" -> msprtOracle(0.18,
      graft.queries.WarehouseQueries.MsprtGrid, 0.05),
    // C86: same-literal discipline — looks/critical shared with the
    // plan; the look schedule is multiplication-only integer tests
    "ab_obf_monitor" -> obfOracle(looks = 5, critical = 2.04),

    // C121: Lan–DeMets alpha-spending — boundaries from the SAME
    // design-time recursion the plan embeds, as round-trip literals;
    // unequal (15,40,65,85,100)% look schedule, OBF-type spending
    "ab_alpha_spending" -> {
      val fr = Seq(15, 40, 65, 85, 100)
      alphaSpendingOracle(fr,
        graft.operators.AlphaSpending.obfBoundsRounded(fr, 0.05),
        graft.operators.AlphaSpending.obfSpendRounded(fr, 0.05))
    },

    // E40: stream ≡ batch is structural (the read face IS the batch
    // finisher over merged additive day cells) — oracle verbatim C121
    "stream_alpha_spending" -> {
      val fr = Seq(15, 40, 65, 85, 100)
      alphaSpendingOracle(fr,
        graft.operators.AlphaSpending.obfBoundsRounded(fr, 0.05),
        graft.operators.AlphaSpending.obfSpendRounded(fr, 0.05))
    },


    // C121b: the same monitor under Hwang–Shih–DeCani γ=−4 spending,
    // quarterly looks — the recursion drives the literals, no table
    "ab_alpha_spending_hsd" -> {
      val fr = Seq(25, 50, 75, 100)
      val sp = graft.operators.AlphaSpending.hsdSpend(0.05, -4.0) _
      alphaSpendingOracle(fr,
        graft.operators.AlphaSpending.boundsRounded(fr, 0.05, sp),
        graft.operators.AlphaSpending.spendRounded(fr, 0.05, sp))
    },

    // C17's exact witness: distinct users/days + event total — the
    // per-day distinct-set union collapses to the same three scalars
    "hll_partitioned_distinct_exact" ->
      """SELECT CAST(count(DISTINCT user_id) AS BIGINT)
        |    AS exact_distinct_users,
        |  CAST(count(DISTINCT date_trunc('day', ts)) AS BIGINT)
        |    AS n_days,
        |  CAST(count(*) AS BIGINT) AS n_events
        |FROM events""".stripMargin,
    // C92: per-arm value-domain cumulatives + exact rank slicing
    "ab_yuen_trimmed" -> yuenOracle(trimDen = 10),
    // C94: exact order statistics off the value-domain cumulative;
    // the only double is the floored rank formula (z shared literal)
    "median_ci" -> {
      val z = "CAST('1.959963984540054' AS DOUBLE)"
      s"""WITH p AS (SELECT
         |    CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS v
         |  FROM events WHERE event_type = 'purchase'),
         |g AS (SELECT v, COUNT(*) AS c FROM p GROUP BY v),
         |cc AS (SELECT v, CAST(SUM(c) OVER (ORDER BY v) AS BIGINT)
         |    AS cum FROM g),
         |t AS (SELECT CAST(COALESCE(SUM(c), 0) AS BIGINT) AS n FROM g),
         |x AS (SELECT cc.v, cc.cum, t.n,
         |    GREATEST(1, CAST(floor((CAST(n AS DOUBLE)
         |      - $z * sqrt(CAST(n AS DOUBLE))) / 2.0) AS BIGINT)) AS l
         |  FROM cc CROSS JOIN t),
         |y AS (SELECT *, LEAST(n, n - l + 1) AS u, (n + 1) // 2 AS m
         |  FROM x)
         |SELECT MAX(n) AS n,
         |  MIN(CASE WHEN cum >= m THEN v END) AS median,
         |  MIN(CASE WHEN cum >= l THEN v END) AS ci_lo,
         |  MIN(CASE WHEN cum >= u THEN v END) AS ci_hi
         |FROM y""".stripMargin
    },

    // C95: exact integer runs/signs off the day series; mu/sigma one
    // IEEE evaluation mirrored parenthesis-for-parenthesis
    "runs_test" -> {
      def d(s: String) = s"CAST($s AS DOUBLE)"
      val n1 = d("n_up"); val n2 = d("n_down")
      val nn = s"($n1 + $n2)"
      val mu = s"(2.0 * $n1 * $n2 / $nn + 1.0)"
      val s2 = s"(2.0 * $n1 * $n2 * (2.0 * $n1 * $n2 - $n1 - $n2)" +
        s" / ($nn * $nn * ($nn - 1.0)))"
      s"""WITH dly AS (
         |  SELECT CAST(date_trunc('day', ts) AS DATE) AS day,
         |    CAST(SUM(CAST(value AS DECIMAL(18,2))) * 100
         |      AS HUGEINT) AS cents
         |  FROM events WHERE event_type = 'purchase' GROUP BY 1),
         |dd AS (SELECT day,
         |    cents - lag(cents) OVER (ORDER BY day) AS df FROM dly),
         |s AS (SELECT day, CASE WHEN df > 0 THEN 1 ELSE -1 END AS sgn
         |  FROM dd WHERE df IS NOT NULL AND df <> 0),
         |r AS (SELECT sgn,
         |    CASE WHEN lag(sgn) OVER (ORDER BY day) IS NULL THEN 1
         |         WHEN lag(sgn) OVER (ORDER BY day) <> sgn THEN 1
         |         ELSE 0 END AS chg
         |  FROM s),
         |a AS (SELECT
         |    CAST(COALESCE(SUM(chg), 0) AS BIGINT) AS n_runs,
         |    CAST(COALESCE(SUM(CASE WHEN sgn = 1 THEN 1 ELSE 0 END), 0)
         |      AS BIGINT) AS n_up,
         |    CAST(COALESCE(SUM(CASE WHEN sgn = -1 THEN 1 ELSE 0 END), 0)
         |      AS BIGINT) AS n_down
         |  FROM r)
         |SELECT n_runs, n_up, n_down,
         |  CASE WHEN n_up > 0 AND n_down > 0
         |    THEN round($mu, 6) END AS expected_runs,
         |  CASE WHEN n_up > 0 AND n_down > 0 AND $s2 > 0.0
         |    THEN round((${d("n_runs")} - $mu) / sqrt($s2), 6)
         |  END AS z_stat
         |FROM a""".stripMargin
    },

    // C96: the C68 half-unit rank identity per arm off the value-domain
    // cumulative; H folds the three arm terms in fixed order, each an
    // IEEE evaluation over exact integers, mirrored parenthesis-for-
    // parenthesis (including the guarded tie correction)
    "ab_kruskal_wallis" -> kruskalSql,

    // E35: continuous k-arm rank monitor - stream ≡ batch on the
    // merged additive census, oracle verbatim
    "stream_kruskal_wallis" -> kruskalSql,

    // C97: 3k conditional exact sums; SSB/SSW mirrored with the same
    // fixed arm-fold order and per-term n>0 guards as the plan
    "ab_anova_f" -> anovaOracle(
      src = """SELECT CAST(user_id % 3 AS INTEGER) AS arm,
              |    CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS v,
              |    1 AS c
              |  FROM events WHERE event_type = 'purchase'""".stripMargin,
      fName = "f_stat", withMedians = false),

    // C99: per-arm lower medians off PARTITIONed value-domain
    // cumulatives (the C94 (n+1) DIV 2 rank), exact-integer |v − med|
    // deviations with multiplicity, then the same F finisher
    "ab_levene_var" -> anovaOracle(
      src = """SELECT g0.arm, abs(g0.v - m.med) AS v, g0.c, m.med
              |  FROM (SELECT arm, v, COUNT(*) AS c FROM
              |    (SELECT CAST(user_id % 3 AS INTEGER) AS arm,
              |      CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS v
              |     FROM events WHERE event_type = 'purchase')
              |    GROUP BY arm, v) g0
              |  JOIN (SELECT arm,
              |      MIN(CASE WHEN cum >= (n + 1) // 2 THEN v END) AS med
              |    FROM (SELECT arm, v, c,
              |        SUM(c) OVER (PARTITION BY arm ORDER BY v) AS cum,
              |        SUM(c) OVER (PARTITION BY arm) AS n
              |      FROM (SELECT arm, v, COUNT(*) AS c FROM
              |        (SELECT CAST(user_id % 3 AS INTEGER) AS arm,
              |          CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)
              |            AS v
              |         FROM events WHERE event_type = 'purchase')
              |        GROUP BY arm, v))
              |    GROUP BY arm) m ON m.arm = g0.arm""".stripMargin,
      fName = "w_stat", withMedians = true),

    // C98: exact integer pair census over the calendar-day frame;
    // tau-b one IEEE evaluation (decimal product under the sqrt)
    "kendall_tau" ->
      """WITH daily AS (SELECT CAST(date_trunc('day', ts) AS DATE) AS day,
        |    CAST(SUM(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END)
        |      AS BIGINT) AS x,
        |    CAST(COALESCE(SUM(CASE WHEN event_type = 'purchase'
        |      THEN CAST(value AS DECIMAL(18,2)) * 100 END), 0) AS BIGINT)
        |      AS y
        |  FROM events GROUP BY 1),
        |pr AS (SELECT b.x - a.x AS dx, b.y - a.y AS dy
        |  FROM daily a JOIN daily b ON a.day < b.day),
        |cells AS (SELECT
        |    CAST(COALESCE(SUM(CASE WHEN dx > 0 AND dy > 0
        |      OR dx < 0 AND dy < 0 THEN 1 ELSE 0 END), 0) AS BIGINT)
        |      AS concordant,
        |    CAST(COALESCE(SUM(CASE WHEN dx > 0 AND dy < 0
        |      OR dx < 0 AND dy > 0 THEN 1 ELSE 0 END), 0) AS BIGINT)
        |      AS discordant,
        |    CAST(COALESCE(SUM(CASE WHEN dx = 0 AND dy <> 0
        |      THEN 1 ELSE 0 END), 0) AS BIGINT) AS ties_x,
        |    CAST(COALESCE(SUM(CASE WHEN dy = 0 AND dx <> 0
        |      THEN 1 ELSE 0 END), 0) AS BIGINT) AS ties_y,
        |    CAST(COALESCE(SUM(CASE WHEN dx = 0 AND dy = 0
        |      THEN 1 ELSE 0 END), 0) AS BIGINT) AS ties_xy
        |  FROM pr),
        |j AS (SELECT *,
        |    CAST(n_steps * (n_steps - 1) // 2 AS BIGINT) AS n0
        |  FROM cells CROSS JOIN
        |    (SELECT CAST(COUNT(*) AS BIGINT) AS n_steps FROM daily)),
        |k AS (SELECT *, n0 - (ties_x + ties_xy) AS denx,
        |    n0 - (ties_y + ties_xy) AS deny FROM j)
        |SELECT n_steps, concordant, discordant, ties_x, ties_y, ties_xy,
        |  CASE WHEN denx > 0 AND deny > 0 THEN
        |    round(CAST(concordant - discordant AS DOUBLE)
        |      / sqrt(CAST(CAST(denx AS HUGEINT) * deny AS DOUBLE)), 6)
        |  END AS tau_b
        |FROM k""".stripMargin,

    // C93: z and z² as shared round-trip literals; center/half
    // mirrored parenthesis-for-parenthesis
    "ab_rate_wilson" -> {
      val z = 1.959963984540054
      def d(x: Double) = s"CAST('$x' AS DOUBLE)"
      def leg(t: String, arm: Int) = {
        val n = s"CAST(n_$t AS DOUBLE)"; val k = s"CAST(k_$t AS DOUBLE)"
        val z2 = d(z * z)
        val p = s"($k / $n)"
        val denom = s"(1.0 + $z2 / $n)"
        val center = s"(($p + $z2 / (2.0 * $n)) / $denom)"
        val half = s"(${d(z)} * sqrt($p * (1.0 - $p) / $n" +
          s" + $z2 / (4.0 * $n * $n)) / $denom)"
        s"""CASE WHEN n_$t > 0 THEN round($p, 6) END AS rate_$t,
           |  CASE WHEN n_$t > 0 THEN round($center - $half, 6) END AS lo_$t,
           |  CASE WHEN n_$t > 0 THEN round($center + $half, 6) END AS hi_$t"""
          .stripMargin
      }
      s"""WITH a AS (SELECT
         |    CAST(SUM(CASE WHEN user_id % 2 = 0 THEN 1 ELSE 0 END)
         |      AS BIGINT) AS n_a,
         |    CAST(SUM(CASE WHEN user_id % 2 = 0 AND event_type = 'purchase'
         |      THEN 1 ELSE 0 END) AS BIGINT) AS k_a,
         |    CAST(SUM(CASE WHEN user_id % 2 = 1 THEN 1 ELSE 0 END)
         |      AS BIGINT) AS n_b,
         |    CAST(SUM(CASE WHEN user_id % 2 = 1 AND event_type = 'purchase'
         |      THEN 1 ELSE 0 END) AS BIGINT) AS k_b
         |  FROM events)
         |SELECT n_a, k_a,
         |  ${leg("a", 0)},
         |  n_b, k_b,
         |  ${leg("b", 1)},
         |  CASE WHEN n_a > 0 AND n_b > 0 THEN
         |    round(CAST(k_b AS DOUBLE) / CAST(n_b AS DOUBLE)
         |      - CAST(k_a AS DOUBLE) / CAST(n_a AS DOUBLE), 6) END AS diff
         |FROM a""".stripMargin
    },

    // C87: per-user (x=events, y=purchase revenue) aggregates in
    // DECIMAL(18,2) like the plan; the 12 sufficient sums are exact,
    // the delta-method finisher is mirrored parenthesis-for-
    // parenthesis with guards on the same edges
    "ab_ratio_delta" ->
      """WITH pu AS (SELECT user_id, COUNT(*) AS xn,
        |    SUM(CASE WHEN event_type = 'purchase'
        |      THEN CAST(value AS DECIMAL(18,2)) END) AS ys
        |  FROM events GROUP BY user_id),
        |p AS (SELECT user_id % 2 AS arm,
        |    CAST(xn AS DECIMAL(18,2)) AS x,
        |    CAST(COALESCE(ys, CAST(0 AS DECIMAL(18,2)))
        |      AS DECIMAL(18,2)) AS y
        |  FROM pu),
        |a AS (SELECT
        |    CAST(SUM(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
        |    CAST(SUM(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_b,
        |    CAST(SUM(CASE WHEN arm = 0 THEN x END) AS DOUBLE) AS sxa,
        |    CAST(SUM(CASE WHEN arm = 1 THEN x END) AS DOUBLE) AS sxb,
        |    CAST(SUM(CASE WHEN arm = 0 THEN y END) AS DOUBLE) AS sya,
        |    CAST(SUM(CASE WHEN arm = 1 THEN y END) AS DOUBLE) AS syb,
        |    CAST(SUM(CASE WHEN arm = 0 THEN x * x END) AS DOUBLE) AS sxxa,
        |    CAST(SUM(CASE WHEN arm = 1 THEN x * x END) AS DOUBLE) AS sxxb,
        |    CAST(SUM(CASE WHEN arm = 0 THEN x * y END) AS DOUBLE) AS sxya,
        |    CAST(SUM(CASE WHEN arm = 1 THEN x * y END) AS DOUBLE) AS sxyb,
        |    CAST(SUM(CASE WHEN arm = 0 THEN y * y END) AS DOUBLE) AS syya,
        |    CAST(SUM(CASE WHEN arm = 1 THEN y * y END) AS DOUBLE) AS syyb
        |  FROM p),
        |f AS (SELECT n_a, n_b,
        |    CASE WHEN sxa <> 0.0 THEN sya / sxa END AS ra,
        |    CASE WHEN sxb <> 0.0 THEN syb / sxb END AS rb,
        |    CASE WHEN n_a >= 2 AND sxa <> 0.0 THEN
        |      (((syya - sya * sya / CAST(n_a AS DOUBLE)) / (CAST(n_a AS DOUBLE) - 1.0))
        |       - 2.0 * (sya / sxa)
        |         * ((sxya - sxa * sya / CAST(n_a AS DOUBLE)) / (CAST(n_a AS DOUBLE) - 1.0))
        |       + (sya / sxa) * (sya / sxa)
        |         * ((sxxa - sxa * sxa / CAST(n_a AS DOUBLE)) / (CAST(n_a AS DOUBLE) - 1.0)))
        |      / (CAST(n_a AS DOUBLE) * (sxa / CAST(n_a AS DOUBLE))
        |         * (sxa / CAST(n_a AS DOUBLE))) END AS va,
        |    CASE WHEN n_b >= 2 AND sxb <> 0.0 THEN
        |      (((syyb - syb * syb / CAST(n_b AS DOUBLE)) / (CAST(n_b AS DOUBLE) - 1.0))
        |       - 2.0 * (syb / sxb)
        |         * ((sxyb - sxb * syb / CAST(n_b AS DOUBLE)) / (CAST(n_b AS DOUBLE) - 1.0))
        |       + (syb / sxb) * (syb / sxb)
        |         * ((sxxb - sxb * sxb / CAST(n_b AS DOUBLE)) / (CAST(n_b AS DOUBLE) - 1.0)))
        |      / (CAST(n_b AS DOUBLE) * (sxb / CAST(n_b AS DOUBLE))
        |         * (sxb / CAST(n_b AS DOUBLE))) END AS vb
        |  FROM a)
        |SELECT n_a, n_b,
        |  round(ra, 6) AS ratio_a, round(rb, 6) AS ratio_b,
        |  CASE WHEN ra IS NOT NULL AND rb IS NOT NULL
        |    THEN round(rb - ra, 6) END AS diff,
        |  CASE WHEN va + vb > 0.0
        |    THEN round((rb - ra) / sqrt(va + vb), 6) END AS z_stat
        |FROM f""".stripMargin,

    // C88: the m²-scaled centered products are exact HUGEINT (the
    // plan's decimal(38,0)); acf is one IEEE divide of two exact
    // integers per lag. E27's stream face merges additive per-day
    // decimal cells to the IDENTICAL series — one SQL proves both.
    "value_acf" -> valueAcfSql,
    "stream_value_acf" -> valueAcfSql,
    // C88b: Durbin-Levinson as the flat-list fold over the rounded
    // acf values (see OracleFns.pacfOracle)
    "value_pacf" -> pacfOracle(maxLag = 7),

    // C91: the D62b slope machinery pointed at the day series —
    // slopes/intercepts round to 6 dp BEFORE the lower-middle order
    // statistic so the selection cannot diverge on a ulp
    "sen_slope" ->
      """WITH dly AS (
        |  SELECT CAST(date_trunc('day', ts) AS DATE) AS day,
        |    CAST(SUM(CAST(value AS DECIMAL(18,2))) * 100
        |      AS HUGEINT) AS cents
        |  FROM events WHERE event_type = 'purchase' GROUP BY 1),
        |l AS (SELECT list_sort(list(
        |    [CAST(day - DATE '1970-01-01' AS DOUBLE),
        |     CAST(cents AS DOUBLE)])) AS a
        |  FROM dly),
        |sl AS (SELECT CAST(len(a) AS BIGINT) AS n_steps, a,
        |    flatten(list_transform(range(1, len(a)), i ->
        |      list_transform(range(i + 1, len(a) + 1), j ->
        |        round((a[j][2] - a[i][2]) / (a[j][1] - a[i][1]), 6))))
        |      AS ss
        |  FROM l),
        |s2 AS (SELECT n_steps, a, ss,
        |    CASE WHEN len(ss) > 0 THEN
        |      list_sort(ss)[CAST((len(ss) + 1) // 2 AS INTEGER)]
        |    END AS sen_slope
        |  FROM sl)
        |SELECT n_steps, CAST(len(ss) AS BIGINT) AS n_pairs, sen_slope,
        |  CASE WHEN sen_slope IS NOT NULL THEN
        |    list_sort(list_transform(a, e ->
        |      round(e[2] - sen_slope * e[1], 6)))
        |      [CAST((n_steps + 1) // 2 AS INTEGER)]
        |  END AS sen_intercept
        |FROM s2""".stripMargin,

    // C90: the p-scaled detrended values are exact HUGEINT; the
    // weekday index is one IEEE divide, the centering mean a pinned
    // wd-ordered fold, weekday = epoch-days mod 7 (no engine
    // dayofweek convention)
    "seasonal_decompose" ->
      """WITH dly AS (
        |  SELECT CAST(date_trunc('day', ts) AS DATE) AS day,
        |    CAST(SUM(CAST(value AS DECIMAL(18,2))) * 100
        |      AS HUGEINT) AS cents
        |  FROM events WHERE event_type = 'purchase' GROUP BY 1),
        |r AS (SELECT day, cents,
        |    CAST((day - DATE '1970-01-01') % 7 AS INTEGER) AS wd,
        |    SUM(cents) OVER (ORDER BY day ROWS BETWEEN 3 PRECEDING
        |      AND 3 FOLLOWING) AS sp,
        |    COUNT(*) OVER (ORDER BY day ROWS BETWEEN 3 PRECEDING
        |      AND 3 FOLLOWING) AS cw
        |  FROM dly),
        |d AS (SELECT *, CASE WHEN cw = 7 THEN 7 * cents - sp END AS dd
        |  FROM r),
        |ix AS (SELECT wd,
        |    CAST(SUM(dd) AS DOUBLE) / (CAST(COUNT(*) AS DOUBLE) * 7.0)
        |      AS s_raw
        |  FROM d WHERE dd IS NOT NULL GROUP BY wd),
        |mu AS (SELECT list_reduce(list_prepend(0.0,
        |    list(s_raw ORDER BY wd)), (a, b) -> a + b)
        |    / CAST(len(list(s_raw ORDER BY wd)) AS DOUBLE) AS mu
        |  FROM ix)
        |SELECT day, CAST(cents AS BIGINT) AS value,
        |  CASE WHEN cw = 7 THEN round(CAST(sp AS DOUBLE) / 7.0, 6)
        |  END AS trend,
        |  round(s_raw - mu, 6) AS seasonal,
        |  CASE WHEN cw = 7 AND s_raw IS NOT NULL THEN
        |    round(CAST(cents AS DOUBLE) - CAST(sp AS DOUBLE) / 7.0
        |      - (s_raw - mu), 6) END AS residual
        |FROM d LEFT JOIN ix USING (wd) CROSS JOIN mu
        |ORDER BY day""".stripMargin,

    // C89: all five Pearson sufficient sums over the doubled edge
    // list are exact HUGEINT (the plan's decimal(38,0)); r is one
    // IEEE evaluation mirrored term-for-term
    "degree_assortativity" ->
      """WITH lp AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk
        |  FROM lineitem),
        |e AS (SELECT a.pk AS u, b.pk AS v FROM lp a
        |  JOIN lp b ON a.ok = b.ok AND a.pk < b.pk),
        |bo AS (SELECT u AS a, v AS b FROM e
        |  UNION ALL SELECT v AS a, u AS b FROM e),
        |deg AS (SELECT a AS id, COUNT(*) AS dg FROM bo GROUP BY 1),
        |p AS (SELECT x.dg AS da, y.dg AS db FROM bo
        |  JOIN deg x ON x.id = bo.a JOIN deg y ON y.id = bo.b),
        |s AS (SELECT CAST(COUNT(*) AS BIGINT) AS m2,
        |    SUM(CAST(da AS HUGEINT)) AS sx, SUM(CAST(db AS HUGEINT)) AS sy,
        |    SUM(CAST(da AS HUGEINT) * CAST(da AS HUGEINT)) AS sxx,
        |    SUM(CAST(db AS HUGEINT) * CAST(db AS HUGEINT)) AS syy,
        |    SUM(CAST(da AS HUGEINT) * CAST(db AS HUGEINT)) AS sxy
        |  FROM p)
        |SELECT CAST(m2 // 2 AS BIGINT) AS n_edges,
        |  CASE WHEN m2 > 0
        |    AND CAST(sxx AS DOUBLE) * CAST(m2 AS DOUBLE)
        |      - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) > 0.0
        |    AND CAST(syy AS DOUBLE) * CAST(m2 AS DOUBLE)
        |      - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE) > 0.0
        |  THEN round(
        |    (CAST(sxy AS DOUBLE) * CAST(m2 AS DOUBLE)
        |      - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
        |    / (sqrt(CAST(sxx AS DOUBLE) * CAST(m2 AS DOUBLE)
        |        - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
        |      * sqrt(CAST(syy AS DOUBLE) * CAST(m2 AS DOUBLE)
        |        - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))), 6)
        |  END AS assortativity
        |FROM s""".stripMargin,

    "ab_srm_check" ->
      """WITH c AS (SELECT
        |    CAST(SUM(CASE WHEN user_id % 2 = 0 THEN 1 ELSE 0 END)
        |      AS BIGINT) AS n_a,
        |    CAST(SUM(CASE WHEN user_id % 2 = 1 THEN 1 ELSE 0 END)
        |      AS BIGINT) AS n_b
        |  FROM events)
        |SELECT n_a, n_b,
        |  CASE WHEN n_a + n_b > 0 THEN
        |    round(CAST(n_a - n_b AS DOUBLE) * CAST(n_a - n_b AS DOUBLE)
        |      / CAST(n_a + n_b AS DOUBLE), 6) END AS chi2,
        |  CASE WHEN n_a + n_b > 0 THEN
        |    CAST(n_a - n_b AS DOUBLE) * CAST(n_a - n_b AS DOUBLE)
        |      / CAST(n_a + n_b AS DOUBLE) > 3.841 END AS srm_flag
        |FROM c""".stripMargin,

    // D100: the quality CTE's 2-dp buckets; per-source and global
    // cumulative histograms; the mapping is the CROSS-MULTIPLIED
    // integer compare — no double enters the decision
    "quality_quantile_norm" ->
      """WITH t AS (
        |  SELECT doc_id, source,
        |    string_split_regex(trim(text), '\s+') AS tk FROM documents),
        |c AS (
        |  SELECT doc_id, source,
        |    CAST(len(tk) AS DOUBLE) AS n,
        |    CAST(len(list_distinct(tk)) AS DOUBLE) AS u,
        |    CAST(len(list_filter(tk, x -> list_contains(
        |      ['the','a','of','and','to','in','is'], x))) AS DOUBLE) AS h
        |  FROM t),
        |q AS (
        |  SELECT source,
        |    CAST(floor((0.4 * least(n / 64.0, 1.0) + 0.4 * (u / n)
        |      + 0.2 * least((h / n) * 8.0, 1.0)) * 100.0) AS BIGINT)
        |      AS bucket
        |  FROM c),
        |sc AS (SELECT source, bucket, COUNT(*) AS n FROM q GROUP BY 1, 2),
        |scum AS (SELECT source, bucket, n,
        |    SUM(n) OVER (PARTITION BY source ORDER BY bucket
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS src_cum,
        |    SUM(n) OVER (PARTITION BY source) AS src_n
        |  FROM sc),
        |g AS (SELECT bucket AS gb, SUM(n) AS gn FROM sc GROUP BY 1),
        |gcum AS (SELECT gb,
        |    SUM(gn) OVER (ORDER BY gb
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS g_cum,
        |    SUM(gn) OVER () AS g_n
        |  FROM g)
        |SELECT source, bucket, CAST(n AS BIGINT) AS n,
        |  CAST(src_cum AS BIGINT) AS src_cum,
        |  MIN(gb) AS norm_bucket
        |FROM scum JOIN gcum
        |  ON CAST(g_cum AS HUGEINT) * CAST(src_n AS HUGEINT)
        |    >= CAST(src_cum AS HUGEINT) * CAST(g_n AS HUGEINT)
        |GROUP BY 1, 2, 3, 4
        |ORDER BY source, bucket""".stripMargin,

    // D99: integer word/sentence/syllable counters (same regex
    // semantics both engines), two one-evaluation scores
    "readability_scores" ->
      """WITH c AS (SELECT doc_id,
        |    CAST(len(string_split_regex(trim(text), '\s+')) AS BIGINT)
        |      AS n_words,
        |    CAST(greatest(len(regexp_extract_all(text, '[.!?]')), 1)
        |      AS BIGINT) AS n_sentences,
        |    CAST(len(regexp_extract_all(lower(text), '[aeiouy]+'))
        |      AS BIGINT) AS n_syllables
        |  FROM documents)
        |SELECT doc_id, n_words, n_sentences, n_syllables,
        |  round(206.835
        |    - 1.015 * (CAST(n_words AS DOUBLE) / CAST(n_sentences AS DOUBLE))
        |    - 84.6 * (CAST(n_syllables AS DOUBLE) / CAST(n_words AS DOUBLE)),
        |    6) AS flesch,
        |  round(0.39 * (CAST(n_words AS DOUBLE) / CAST(n_sentences AS DOUBLE))
        |    + 11.8 * (CAST(n_syllables AS DOUBLE) / CAST(n_words AS DOUBLE))
        |    - 15.59, 6) AS fk_grade
        |FROM c ORDER BY doc_id""".stripMargin,

    // D98: Gini via the rank formula (integer numerator — rank·count
    // in exact decimal, tie order irrelevant to the sum), HHI and
    // top-share one divide each
    "source_concentration" -> sourceConcentrationSql,
    // E25 stream face: merged additive group counts + the same
    // finisher == the batch query exactly
    "stream_source_concentration" -> sourceConcentrationSql,

    // C70: the D-scaled deviation cumsum S_i = D·cum_i − i·N is an
    // exact integer (HUGEINT ↔ decimal(38,0)), so the argmax and the
    // earliest-step tie-break are all-integer decisions; |S|/D and
    // N/D are one IEEE divide each
    "cusum_changepoint" ->
      """WITH daily AS (SELECT event_type,
        |    CAST(date_trunc('day', ts) AS DATE) AS day, COUNT(*) AS n
        |  FROM events GROUP BY 1, 2),
        |c AS (SELECT event_type, day,
        |    CAST(ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY day)
        |      AS HUGEINT) AS i,
        |    SUM(CAST(n AS HUGEINT)) OVER (PARTITION BY event_type
        |      ORDER BY day ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |      AS cum
        |  FROM daily),
        |t AS (SELECT event_type, COUNT(*) AS d,
        |    SUM(CAST(n AS HUGEINT)) AS ntot FROM daily GROUP BY 1),
        |s AS (SELECT c.event_type, c.day, t.d, t.ntot,
        |    CAST(t.d AS HUGEINT) * c.cum - c.i * t.ntot AS S
        |  FROM c JOIN t USING (event_type)),
        |p AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY event_type
        |    ORDER BY ABS(S) DESC, day ASC) AS rk FROM s)
        |SELECT event_type, day AS cp_step,
        |  round(CAST(ABS(S) AS DOUBLE) / CAST(d AS DOUBLE), 6) AS cusum_stat,
        |  round(CAST(ntot AS DOUBLE) / CAST(d AS DOUBLE), 6) AS mean_level,
        |  CAST(d AS BIGINT) AS n_steps
        |FROM p WHERE rk = 1 ORDER BY event_type""".stripMargin,

    // C71: quintile thresholds off the cumulative histogram — the
    // C59 decile recipe ×3 metrics; fraction literals forced to
    // DOUBLE so both engines cut the same IEEE boundary; scoring an
    // all-integer fold; monetary exact cents → one divide
    "rfm_segments" -> {
      def thr(metric: String) = (1 to 4).map(d =>
        s"MIN(CASE WHEN cum >= CAST(${d / 5.0} AS DOUBLE) * total " +
          s"THEN bk END) AS ${metric}_b$d").mkString(",\n      ")
      def hist(metric: String) =
        s"""${metric}_h AS (SELECT $metric AS bk, COUNT(*) AS c
           |  FROM u GROUP BY 1),
           |${metric}_cum AS (SELECT bk,
           |    SUM(c) OVER (ORDER BY bk
           |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
           |    SUM(c) OVER () AS total FROM ${metric}_h),
           |${metric}_thr AS (SELECT
           |      ${thr(metric)}
           |  FROM ${metric}_cum)""".stripMargin
      def fold(metric: String) = (1 to 4).map(d =>
        s"(CASE WHEN $metric > ${metric}_b$d THEN 1 ELSE 0 END)")
        .mkString(" + ")
      s"""WITH u AS (SELECT user_id,
         |    CAST(date_diff('day', CAST(max(date_trunc('day', ts)) AS DATE),
         |      DATE '2024-01-31') AS BIGINT) AS recency,
         |    COUNT(*) AS frequency,
         |    CAST(SUM(CAST(value AS DECIMAL(18,2)) * 100) AS BIGINT) AS cents
         |  FROM events WHERE event_type = 'purchase' GROUP BY 1),
         |${hist("recency")},
         |${hist("frequency")},
         |${hist("cents")},
         |sc AS (SELECT user_id, recency, frequency, cents,
         |    CAST(6 - (1 + ${fold("recency")}) AS INTEGER) AS r_score,
         |    CAST(1 + ${fold("frequency")} AS INTEGER) AS f_score,
         |    CAST(1 + ${fold("cents")} AS INTEGER) AS m_score
         |  FROM u CROSS JOIN recency_thr CROSS JOIN frequency_thr
         |    CROSS JOIN cents_thr)
         |SELECT user_id, recency, frequency,
         |  CAST(cents AS DOUBLE) / 100.0 AS monetary,
         |  r_score, f_score, m_score,
         |  CAST(r_score AS VARCHAR) || CAST(f_score AS VARCHAR)
         |    || CAST(m_score AS VARCHAR) AS segment
         |FROM sc ORDER BY user_id""".stripMargin
    },

    // C66: exact decimal sufficient aggregates (n, Σv, Σv²) per arm,
    // then ONE scalar IEEE evaluation per statistic with identical
    // parenthesization in both engines
    "ab_welch_ttest" ->
      welchTTestSql,

    // C67: integer contingency cells + margins; each cell term is one
    // IEEE evaluation over exact integers and the cross-cell sum folds
    // in pinned (rk, ck) order — list_reduce mirrors Spark's
    // sorted-collect aggregate fold including the 0.0 seed
    "ab_chi_square" ->
      """WITH cells AS (SELECT event_type AS rk, user_id % 2 AS ck,
        |    COUNT(*) AS o FROM events GROUP BY 1, 2),
        |rt AS (SELECT rk, SUM(o) AS rt FROM cells GROUP BY 1),
        |ct AS (SELECT ck, SUM(o) AS ct FROM cells GROUP BY 1),
        |t AS (SELECT CAST(SUM(o) AS BIGINT) AS n,
        |    COUNT(DISTINCT rk) AS nr, COUNT(DISTINCT ck) AS nc FROM cells),
        |term AS (SELECT rk, ck,
        |    pow(CAST(o AS DOUBLE) * CAST(n AS DOUBLE)
        |        - CAST(rt AS DOUBLE) * CAST(ct AS DOUBLE), 2)
        |      / (CAST(n AS DOUBLE) * CAST(rt AS DOUBLE) * CAST(ct AS DOUBLE))
        |      AS tt
        |  FROM cells JOIN rt USING (rk) JOIN ct USING (ck) CROSS JOIN t)
        |SELECT n, CAST((nr - 1) * (nc - 1) AS BIGINT) AS dof,
        |  round(list_reduce(list_prepend(0.0,
        |    list(tt ORDER BY rk, ck)), (a, b) -> a + b), 6) AS chi2
        |FROM term CROSS JOIN t GROUP BY n, nr, nc""".stripMargin,

    // C68: tie-group average ranks in exact HALF units
    // (2·cum − c + 1), rank sums exact integers; z is one scalar IEEE
    // evaluation mirrored parenthesis-for-parenthesis
    "ab_mann_whitney" ->
      """WITH p AS (SELECT user_id % 2 AS arm, value AS v
        |  FROM events WHERE event_type = 'purchase'),
        |g AS (SELECT v, COUNT(*) AS c,
        |    SUM(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS c1
        |  FROM p GROUP BY 1),
        |r AS (SELECT v, c, c1, SUM(c) OVER (ORDER BY v
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum FROM g),
        |a AS (SELECT
        |    SUM(CAST(c1 AS HUGEINT) * (2 * CAST(cum AS HUGEINT) - c + 1))
        |      AS r1x2,
        |    CAST(SUM(c1) AS BIGINT) AS n1, CAST(SUM(c) AS BIGINT) AS n,
        |    CAST(SUM(CAST(c AS HUGEINT) * c * c - c) AS DOUBLE) AS tie
        |  FROM r),
        |u AS (SELECT n1, n, tie,
        |    CAST(r1x2 - CAST(n1 AS HUGEINT) * (n1 + 1) AS DOUBLE) / 2.0
        |      AS u_stat,
        |    CAST(n1 AS DOUBLE) * (n - n1) / 12.0 * ((n + 1.0)
        |      - tie / (CAST(n AS DOUBLE) * (n - 1.0))) AS s2
        |  FROM a)
        |SELECT n1 AS n_a_ranked, CAST(n - n1 AS BIGINT) AS n_b_ranked,
        |  u_stat,
        |  CASE WHEN n1 > 0 AND n > n1 AND s2 > 0.0 THEN
        |    round((u_stat - CAST(n1 AS DOUBLE) * (n - n1) / 2.0)
        |      / sqrt(s2), 6) END AS z_stat
        |FROM u""".stripMargin,

    // C69: per-user period totals re-narrowed to decimal(18,2) so the
    // x·x / x·y products stay exact decimal(37,4) in BOTH engines;
    // θ / effect / ρ² are scalar IEEE evaluations over the exact sums
    "ab_cuped_effect" ->
      """WITH p AS (SELECT user_id AS u, CAST(value AS DECIMAL(18,2)) AS v,
        |    (ts < TIMESTAMP '2024-01-16 00:00:00') AS pre
        |  FROM events WHERE event_type = 'purchase'),
        |pu AS (SELECT u,
        |    CAST(COALESCE(SUM(CASE WHEN pre THEN v END), 0)
        |      AS DECIMAL(18,2)) AS x,
        |    CAST(COALESCE(SUM(CASE WHEN NOT pre THEN v END), 0)
        |      AS DECIMAL(18,2)) AS y,
        |    CAST(u % 2 AS INT) AS arm
        |  FROM p GROUP BY u),
        |a AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_users,
        |    CAST(SUM(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS DOUBLE) AS n0,
        |    CAST(SUM(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS DOUBLE) AS n1,
        |    CAST(SUM(CASE WHEN arm = 0 THEN x END) AS DOUBLE) AS sx0,
        |    CAST(SUM(CASE WHEN arm = 1 THEN x END) AS DOUBLE) AS sx1,
        |    CAST(SUM(CASE WHEN arm = 0 THEN y END) AS DOUBLE) AS sy0,
        |    CAST(SUM(CASE WHEN arm = 1 THEN y END) AS DOUBLE) AS sy1,
        |    CAST(SUM(x * x) AS DOUBLE) AS sxx,
        |    CAST(SUM(x * y) AS DOUBLE) AS sxy,
        |    CAST(SUM(y * y) AS DOUBLE) AS syy
        |  FROM pu),
        |d AS (SELECT n_users, n0, n1, sx0, sx1, sy0, sy1,
        |    sxy - (sx0 + sx1) * (sy0 + sy1) / (n0 + n1) AS covxy,
        |    sxx - (sx0 + sx1) * (sx0 + sx1) / (n0 + n1) AS varx,
        |    syy - (sy0 + sy1) * (sy0 + sy1) / (n0 + n1) AS vary
        |  FROM a),
        |f AS (SELECT *, (n0 > 0 AND n1 > 0 AND varx > 0.0 AND vary > 0.0)
        |    AS ok, sy1 / n1 - sy0 / n0 AS raw FROM d)
        |SELECT n_users,
        |  CASE WHEN ok THEN round(covxy / varx, 6) END AS theta,
        |  CASE WHEN n0 > 0 AND n1 > 0 THEN round(raw, 6) END AS raw_diff,
        |  CASE WHEN ok THEN round(raw - covxy / varx
        |    * (sx1 / n1 - sx0 / n0), 6) END AS adjusted_diff,
        |  CASE WHEN ok THEN round(covxy * covxy / (varx * vary), 6) END
        |    AS var_reduction
        |FROM f""".stripMargin,

    // median + MAD off the same cent-bucket histograms; the flag is an
    // all-integer compare (dev > 3·mad in buckets) so no double
    // boundary can diverge; MAD-0 groups flag nothing (mirrored guard)
    "mad_outliers" -> madOutliersSql,
    // E24 stream face: merged additive sufficient rows +
    // the same finisher == the batch query exactly
    "stream_ab_ttest" -> welchTTestSql,
    // the E17 stream face flags under stats frozen from the SAME
    // corpus — a pure per-row decision, so one SQL proves both
    "stream_robust_flags" -> madOutliersSql,

    // A14: both engines derive the two snapshots the same way; the
    // digest compare reduces to text equality under the derivation
    // (sha256 is injective on this corpus), so the oracle compares
    // the rewritten text directly.
    "corpus_diff" ->
      """WITH old AS (SELECT doc_id, source, text FROM documents
        |  WHERE doc_id % 11 <> 3),
        |neu AS (SELECT doc_id, source,
        |    CASE WHEN doc_id % 5 = 0 THEN text || ' rev2' ELSE text END AS text
        |  FROM documents WHERE doc_id % 13 <> 5)
        |SELECT COALESCE(o.source, n.source) AS source,
        |  CASE WHEN o.doc_id IS NULL THEN 'added'
        |       WHEN n.doc_id IS NULL THEN 'removed'
        |       WHEN o.text <> n.text THEN 'changed'
        |       ELSE 'unchanged' END AS status,
        |  COUNT(*) AS n_docs
        |FROM old o FULL OUTER JOIN neu n
        |  ON o.doc_id = n.doc_id AND o.source = n.source
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    // A13: the aggregate runs over the ORC round-trip on the Spark
    // side but over the parquet source here — a hash match proves the
    // ORC write→read path preserved every row and value.
    "orc_ingest" ->
      """SELECT source, COUNT(*) AS n_docs,
        |  CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
        |  MIN(doc_id) AS min_id, MAX(doc_id) AS max_id
        |FROM documents WHERE lang = 'en'
        |GROUP BY source ORDER BY source""".stripMargin,

    // A16/A17: the oracle is the ORIGINAL table verbatim — a hash
    // match proves the interchange writer/parser round-tripped every
    // value (quoting, nulls, double shortest-repr, µs timestamps)
    "csv_roundtrip" ->
      "SELECT * FROM orders ORDER BY o_orderkey",
    "json_roundtrip" ->
      "SELECT * FROM orders ORDER BY o_orderkey",

    // D12: the oracle recomputes the stats from the pixel/sample
    // GENERATOR arithmetic (MultimodalQueries.synthImage/synthAudio),
    // while the Spark side recovers them by DECODING the real
    // BMP/WAV bytes — a hash match proves the byte-level round-trip.
    // (range() can't take lateral column args in DuckDB, hence the
    // join-filter against the max domain size.)
    "media_decode_image" ->
      """SELECT d.doc_id,
        |  CAST(d.doc_id % 6 + 2 AS INTEGER) AS width,
        |  CAST(d.doc_id % 4 + 2 AS INTEGER) AS height,
        |  CAST(SUM((d.doc_id*7 + i.i*3) % 256) AS BIGINT) AS sum_r,
        |  CAST(SUM((d.doc_id*11 + i.i*5) % 256) AS BIGINT) AS sum_g,
        |  CAST(SUM((d.doc_id*13 + i.i*7) % 256) AS BIGINT) AS sum_b
        |FROM documents d JOIN range(0, 35) AS i(i)
        |  ON i.i < (d.doc_id % 6 + 2)*(d.doc_id % 4 + 2)
        |GROUP BY d.doc_id ORDER BY d.doc_id""".stripMargin,

    // D12d: same generator arithmetic as media_decode_image — PNG is
    // LOSSLESS, so the decode side must recover the identical pixels
    // through real zlib + the five scanline filters; a hash match is
    // the byte-exact proof (lossy JPEG can't make this claim and is
    // spec-pinned instead)
    "media_decode_png" -> losslessMediaStatsSql,

    // D12e: GIF shares the generator arithmetic — palette-indexed and
    // LZW is lossless, so the same hash-exact claim holds
    "media_decode_gif" -> losslessMediaStatsSql,

    // D70: the dHash fingerprints re-derived from the pixel-GENERATOR
    // arithmetic (the D12 oracle pattern) — grayscale, gradient sign,
    // 48-bit pack, 4×12-bit banding, xor+popcount verify: every step
    // exact integers, so the pair set is bit-identical to the Spark
    // side that got there by decoding real BMP bytes.

    // E20: fingerprints replayed from the generator arithmetic (the
    // D12/D70 oracle pattern); the admission rule — taint a whole
    // within-batch component if ANY member sits within hamming<=2 of
    // an indexed (even) asset, admit the min-id representative of
    // clean components — closes over the near-dup graph via a
    // recursive CTE (UNION dedup terminates the fixpoint).
    "stream_media_gate" ->
      """WITH RECURSIVE hs AS (
        |  SELECT d.doc_id, CAST(d.doc_id % 6 + 2 AS INTEGER) AS w,
        |    CAST(d.doc_id % 4 + 2 AS INTEGER) AS h,
        |    CAST(COALESCE(SUM(CASE WHEN
        |      ((d.doc_id*7 + (i.i+1)*3) % 256 + (d.doc_id*11 + (i.i+1)*5) % 256
        |        + (d.doc_id*13 + (i.i+1)*7) % 256) // 3
        |      > ((d.doc_id*7 + i.i*3) % 256 + (d.doc_id*11 + i.i*5) % 256
        |        + (d.doc_id*13 + i.i*7) % 256) // 3
        |      THEN (CAST(1 AS BIGINT) << i.i)
        |      ELSE CAST(0 AS BIGINT) END), 0) AS BIGINT) AS phash
        |  FROM documents d JOIN range(0, 34) AS i(i)
        |    ON i.i < (d.doc_id % 6 + 2)*(d.doc_id % 4 + 2) - 1
        |  GROUP BY d.doc_id),
        |odd AS (SELECT * FROM hs WHERE doc_id % 2 = 1),
        |ev AS (SELECT * FROM hs WHERE doc_id % 2 = 0),
        |taint AS (
        |  SELECT DISTINCT o.doc_id FROM odd o JOIN ev e
        |  ON o.w = e.w AND o.h = e.h
        |    AND bit_count(xor(o.phash, e.phash)) <= 2),
        |edges AS (
        |  SELECT a.doc_id AS ia, b.doc_id AS ib FROM odd a JOIN odd b
        |  ON a.w = b.w AND a.h = b.h AND a.doc_id <> b.doc_id
        |    AND bit_count(xor(a.phash, b.phash)) <= 2),
        |reach(id, r) AS (
        |  SELECT doc_id, doc_id FROM odd
        |  UNION
        |  SELECT reach.id, edges.ib FROM reach JOIN edges
        |    ON edges.ia = reach.r),
        |comp AS (SELECT id, min(r) AS canon FROM reach GROUP BY id),
        |bad AS (SELECT DISTINCT c.canon FROM comp c
        |        JOIN taint t ON t.doc_id = c.id),
        |adm AS (SELECT id FROM comp WHERE id = canon
        |        AND canon NOT IN (SELECT canon FROM bad))
        |SELECT o.doc_id, o.w AS width, o.h AS height, o.phash
        |FROM odd o JOIN adm ON adm.id = o.doc_id
        |ORDER BY o.doc_id""".stripMargin,

    // E20-multibatch: the three admission rounds unrolled against the
    // grown fingerprint set (see OracleFns.mediaMultibatchGateSql)
    "stream_media_multibatch" -> mediaMultibatchGateSql,

    "media_dedup_phash" ->
      """WITH hs AS (
        |  SELECT d.doc_id, CAST(d.doc_id % 6 + 2 AS INTEGER) AS w,
        |    CAST(d.doc_id % 4 + 2 AS INTEGER) AS h,
        |    CAST(COALESCE(SUM(CASE WHEN
        |      ((d.doc_id*7 + (i.i+1)*3) % 256 + (d.doc_id*11 + (i.i+1)*5) % 256
        |        + (d.doc_id*13 + (i.i+1)*7) % 256) // 3
        |      > ((d.doc_id*7 + i.i*3) % 256 + (d.doc_id*11 + i.i*5) % 256
        |        + (d.doc_id*13 + i.i*7) % 256) // 3
        |      THEN (CAST(1 AS BIGINT) << i.i)
        |      ELSE CAST(0 AS BIGINT) END), 0) AS BIGINT) AS phash
        |  FROM documents d JOIN range(0, 34) AS i(i)
        |    ON i.i < (d.doc_id % 6 + 2)*(d.doc_id % 4 + 2) - 1
        |  GROUP BY d.doc_id),
        |bands AS (
        |  SELECT doc_id, w, h, phash, b.b AS band,
        |    (phash >> (b.b*12)) & 4095 AS bv
        |  FROM hs JOIN range(0, 4) AS b(b) ON TRUE),
        |cand AS (
        |  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b,
        |    a.phash AS ha, b.phash AS hb
        |  FROM bands a JOIN bands b ON a.w = b.w AND a.h = b.h
        |    AND a.band = b.band AND a.bv = b.bv AND a.doc_id < b.doc_id)
        |SELECT id_a, id_b,
        |  CAST(bit_count(xor(ha, hb)) AS INTEGER) AS hamming
        |FROM cand WHERE bit_count(xor(ha, hb)) <= 2
        |ORDER BY id_a, id_b""".stripMargin,

    // D70b: the audio contour hash from the sample-GENERATOR
    // arithmetic — the ±2000 offset cancels in the comparison, so the
    // oracle compares raw mod values; banding/popcount identical to
    // the image oracle.
    "media_dedup_audio" ->
      """WITH hs AS (
        |  SELECT d.doc_id,
        |    CAST(8000 + (d.doc_id % 8)*1000 AS INTEGER) AS sr,
        |    CAST(d.doc_id % 24 + 4 AS INTEGER) AS ns,
        |    CAST(COALESCE(SUM(CASE WHEN
        |      (d.doc_id*131 + (i.i+1)*17) % 4001
        |        > (d.doc_id*131 + i.i*17) % 4001
        |      THEN (CAST(1 AS BIGINT) << i.i)
        |      ELSE CAST(0 AS BIGINT) END), 0) AS BIGINT) AS phash
        |  FROM documents d JOIN range(0, 27) AS i(i)
        |    ON i.i < d.doc_id % 24 + 3
        |  GROUP BY d.doc_id),
        |bands AS (
        |  SELECT doc_id, sr, ns, phash, b.b AS band,
        |    (phash >> (b.b*12)) & 4095 AS bv
        |  FROM hs JOIN range(0, 4) AS b(b) ON TRUE),
        |cand AS (
        |  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b,
        |    a.phash AS ha, b.phash AS hb
        |  FROM bands a JOIN bands b ON a.sr = b.sr AND a.ns = b.ns
        |    AND a.band = b.band AND a.bv = b.bv AND a.doc_id < b.doc_id)
        |SELECT id_a, id_b,
        |  CAST(bit_count(xor(ha, hb)) AS INTEGER) AS hamming
        |FROM cand WHERE bit_count(xor(ha, hb)) <= 2
        |ORDER BY id_a, id_b""".stripMargin,

    "media_decode_audio" ->
      """SELECT d.doc_id,
        |  CAST(8000 + (d.doc_id % 8)*1000 AS INTEGER) AS sample_rate,
        |  CAST(d.doc_id % 24 + 4 AS BIGINT) AS n_samples,
        |  CAST(SUM((d.doc_id*131 + i.i*17) % 4001 - 2000) AS BIGINT) AS sum_amp,
        |  CAST(MAX(ABS((d.doc_id*131 + i.i*17) % 4001 - 2000)) AS BIGINT) AS peak_amp
        |FROM documents d JOIN range(0, 28) AS i(i) ON i.i < d.doc_id % 24 + 4
        |GROUP BY d.doc_id ORDER BY d.doc_id""".stripMargin,

    // D117: smoothed TF-IDF keywords — tf/df/N exact integers, the
    // score ln rounded at 6dp BEFORE ranking (the BM25 absorb
    // argument), ties cut by word ascending in both engines
    "keyword_tfidf" ->
      """WITH t AS (
        |  SELECT doc_id, CASE WHEN len(trim(text)) > 0
        |    THEN string_split_regex(trim(text), '\s+')
        |    ELSE [] END AS tk
        |  FROM documents),
        |p AS (SELECT doc_id, w, COUNT(*) AS tf FROM (
        |    SELECT doc_id, unnest(tk) AS w FROM t) GROUP BY 1, 2),
        |d AS (SELECT w, CAST(COUNT(*) AS BIGINT) AS doc_freq
        |  FROM p GROUP BY 1),
        |n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_docs FROM documents),
        |s AS (SELECT doc_id, w, tf, doc_freq,
        |    round(CAST(tf AS DOUBLE)
        |      * (ln((CAST(n_docs AS DOUBLE) + 1.0)
        |          / (CAST(doc_freq AS DOUBLE) + 1.0)) + 1.0), 6) AS score
        |  FROM p JOIN d USING (w) CROSS JOIN n),
        |r AS (SELECT *, row_number() OVER (
        |    PARTITION BY doc_id ORDER BY score DESC, w) AS rk FROM s)
        |SELECT doc_id, CAST(rk AS INTEGER) AS rk, w AS word, tf,
        |  doc_freq, score
        |FROM r WHERE rk <= 3 ORDER BY doc_id, rk""".stripMargin,

    // D118: per-doc lexical diversity — every sufficient statistic
    // (N, V, V1, Σc²) an exact integer, one IEEE divide per ratio;
    // token-less docs survive via the left join with zero counts
    "lexical_diversity" ->
      """WITH t AS (
        |  SELECT doc_id, CASE WHEN len(trim(text)) > 0
        |    THEN string_split_regex(trim(text), '\s+')
        |    ELSE [] END AS tk
        |  FROM documents),
        |p AS (SELECT doc_id, w, COUNT(*) AS c FROM (
        |    SELECT doc_id, unnest(tk) AS w FROM t) GROUP BY 1, 2),
        |per AS (SELECT doc_id,
        |    CAST(SUM(c) AS BIGINT) AS n_tokens,
        |    CAST(COUNT(*) AS BIGINT) AS n_types,
        |    CAST(COALESCE(SUM(CASE WHEN c = 1 THEN 1 END), 0) AS BIGINT)
        |      AS hapax,
        |    CAST(SUM(c * c) AS BIGINT) AS ssq
        |  FROM p GROUP BY 1)
        |SELECT d.doc_id,
        |  CAST(COALESCE(n_tokens, 0) AS BIGINT) AS n_tokens,
        |  CAST(COALESCE(n_types, 0) AS BIGINT) AS n_types,
        |  CAST(COALESCE(hapax, 0) AS BIGINT) AS hapax,
        |  CASE WHEN n_tokens > 0 THEN round(
        |    CAST(n_types AS DOUBLE) / CAST(n_tokens AS DOUBLE), 6)
        |  END AS ttr,
        |  CASE WHEN n_tokens > 0 THEN round(
        |    CAST(hapax AS DOUBLE) / CAST(n_tokens AS DOUBLE), 6)
        |  END AS hapax_ratio,
        |  CASE WHEN n_tokens > 0 THEN round(
        |    10000.0 * CAST(ssq - n_tokens AS DOUBLE)
        |      / (CAST(n_tokens AS DOUBLE) * CAST(n_tokens AS DOUBLE)), 6)
        |  END AS yule_k
        |FROM documents d LEFT JOIN per USING (doc_id)
        |ORDER BY d.doc_id""".stripMargin,

    // C100: McNemar — four exact integer cells off the per-user pair
    // frame, each chi-square one IEEE divide
    "ab_mcnemar" ->
      """WITH u AS (
        |  SELECT user_id,
        |    COALESCE(SUM(CASE WHEN event_type = 'purchase'
        |      AND day(ts) <= 15 THEN 1 ELSE 0 END), 0) > 0 AS a,
        |    COALESCE(SUM(CASE WHEN event_type = 'purchase'
        |      AND day(ts) >= 16 THEN 1 ELSE 0 END), 0) > 0 AS b
        |  FROM events GROUP BY 1),
        |c AS (SELECT
        |    CAST(COUNT(*) AS BIGINT) AS n,
        |    CAST(SUM(CASE WHEN a AND b THEN 1 ELSE 0 END) AS BIGINT)
        |      AS n_both,
        |    CAST(SUM(CASE WHEN a AND NOT b THEN 1 ELSE 0 END) AS BIGINT)
        |      AS n_before_only,
        |    CAST(SUM(CASE WHEN NOT a AND b THEN 1 ELSE 0 END) AS BIGINT)
        |      AS n_after_only,
        |    CAST(SUM(CASE WHEN NOT a AND NOT b THEN 1 ELSE 0 END)
        |      AS BIGINT) AS n_neither
        |  FROM u)
        |SELECT n, n_both, n_before_only, n_after_only, n_neither,
        |  CASE WHEN n_before_only + n_after_only > 0 THEN round(
        |    (CAST(n_before_only AS DOUBLE) - CAST(n_after_only AS DOUBLE))
        |    * (CAST(n_before_only AS DOUBLE) - CAST(n_after_only AS DOUBLE))
        |    / (CAST(n_before_only AS DOUBLE) + CAST(n_after_only AS DOUBLE)),
        |    6) END AS chi2,
        |  CASE WHEN n_before_only + n_after_only > 0 THEN round(
        |    (abs(CAST(n_before_only AS DOUBLE) - CAST(n_after_only AS DOUBLE))
        |      - 1.0)
        |    * (abs(CAST(n_before_only AS DOUBLE) - CAST(n_after_only AS DOUBLE))
        |      - 1.0)
        |    / (CAST(n_before_only AS DOUBLE) + CAST(n_after_only AS DOUBLE)),
        |    6) END AS chi2_cc,
        |  CAST(1 AS BIGINT) AS dof
        |FROM c""".stripMargin,

    // C101: Cochran's Q — everything exact integers until the final
    // divide; the per-block row sum is row-local
    "ab_cochran_q" ->
      """WITH u AS (
        |  SELECT user_id,
        |    CASE WHEN COALESCE(SUM(CASE WHEN event_type = 'purchase'
        |      AND day(ts) BETWEEN 1 AND 10 THEN 1 ELSE 0 END), 0) > 0
        |      THEN 1 ELSE 0 END AS f0,
        |    CASE WHEN COALESCE(SUM(CASE WHEN event_type = 'purchase'
        |      AND day(ts) BETWEEN 11 AND 20 THEN 1 ELSE 0 END), 0) > 0
        |      THEN 1 ELSE 0 END AS f1,
        |    CASE WHEN COALESCE(SUM(CASE WHEN event_type = 'purchase'
        |      AND day(ts) BETWEEN 21 AND 31 THEN 1 ELSE 0 END), 0) > 0
        |      THEN 1 ELSE 0 END AS f2
        |  FROM events GROUP BY 1),
        |a AS (SELECT
        |    CAST(COUNT(*) AS BIGINT) AS n_blocks,
        |    CAST(SUM(f0 + f1 + f2) AS BIGINT) AS t,
        |    CAST(SUM((f0 + f1 + f2) * (f0 + f1 + f2)) AS BIGINT) AS r2,
        |    CAST(SUM(f0) AS BIGINT) AS c_0,
        |    CAST(SUM(f1) AS BIGINT) AS c_1,
        |    CAST(SUM(f2) AS BIGINT) AS c_2
        |  FROM u)
        |SELECT n_blocks, c_0, c_1, c_2,
        |  CASE WHEN 3.0 * CAST(t AS DOUBLE) - CAST(r2 AS DOUBLE) > 0.0
        |  THEN round(2.0 * (3.0 * ((CAST(c_0 AS DOUBLE) * CAST(c_0 AS DOUBLE)
        |      + CAST(c_1 AS DOUBLE) * CAST(c_1 AS DOUBLE))
        |      + CAST(c_2 AS DOUBLE) * CAST(c_2 AS DOUBLE))
        |      - CAST(t AS DOUBLE) * CAST(t AS DOUBLE))
        |    / (3.0 * CAST(t AS DOUBLE) - CAST(r2 AS DOUBLE)), 6)
        |  END AS q_stat,
        |  CAST(2 AS BIGINT) AS dof
        |FROM a""".stripMargin,

    // C102: Friedman — half-unit ranks and the pair-identity tie
    // census are row-local integer expressions; Q/Q' one IEEE
    // evaluation each off exact column sums
    "ab_friedman" ->
      """WITH u AS (
        |  SELECT user_id,
        |    CAST(COALESCE(SUM(CASE WHEN event_type = 'purchase'
        |      AND day(ts) BETWEEN 1 AND 10
        |      THEN CAST(value AS DECIMAL(18,2)) * 100 END), 0) AS BIGINT)
        |      AS v0,
        |    CAST(COALESCE(SUM(CASE WHEN event_type = 'purchase'
        |      AND day(ts) BETWEEN 11 AND 20
        |      THEN CAST(value AS DECIMAL(18,2)) * 100 END), 0) AS BIGINT)
        |      AS v1,
        |    CAST(COALESCE(SUM(CASE WHEN event_type = 'purchase'
        |      AND day(ts) BETWEEN 21 AND 31
        |      THEN CAST(value AS DECIMAL(18,2)) * 100 END), 0) AS BIGINT)
        |      AS v2
        |  FROM events GROUP BY 1),
        |r AS (SELECT
        |    2 + 2*((CASE WHEN v1 < v0 THEN 1 ELSE 0 END)
        |         + (CASE WHEN v2 < v0 THEN 1 ELSE 0 END))
        |      + (CASE WHEN v1 = v0 THEN 1 ELSE 0 END)
        |      + (CASE WHEN v2 = v0 THEN 1 ELSE 0 END) AS r0,
        |    2 + 2*((CASE WHEN v0 < v1 THEN 1 ELSE 0 END)
        |         + (CASE WHEN v2 < v1 THEN 1 ELSE 0 END))
        |      + (CASE WHEN v0 = v1 THEN 1 ELSE 0 END)
        |      + (CASE WHEN v2 = v1 THEN 1 ELSE 0 END) AS r1,
        |    2 + 2*((CASE WHEN v0 < v2 THEN 1 ELSE 0 END)
        |         + (CASE WHEN v1 < v2 THEN 1 ELSE 0 END))
        |      + (CASE WHEN v0 = v2 THEN 1 ELSE 0 END)
        |      + (CASE WHEN v1 = v2 THEN 1 ELSE 0 END) AS r2,
        |    (CASE WHEN v0 = v1 THEN
        |       2 * ((2 + CASE WHEN v2 = v0 THEN 1 ELSE 0 END) + 1)
        |     ELSE 0 END)
        |    + (CASE WHEN v0 = v2 THEN
        |       2 * ((2 + CASE WHEN v1 = v0 THEN 1 ELSE 0 END) + 1)
        |     ELSE 0 END)
        |    + (CASE WHEN v1 = v2 THEN
        |       2 * ((2 + CASE WHEN v0 = v1 THEN 1 ELSE 0 END) + 1)
        |     ELSE 0 END) AS tie
        |  FROM u),
        |a AS (SELECT
        |    CAST(COUNT(*) AS BIGINT) AS n_blocks,
        |    CAST(SUM(tie) AS BIGINT) AS tie,
        |    CAST(SUM(r0) AS BIGINT) AS r2_0,
        |    CAST(SUM(r1) AS BIGINT) AS r2_1,
        |    CAST(SUM(r2) AS BIGINT) AS r2_2
        |  FROM r)
        |SELECT n_blocks,
        |  CAST(r2_0 AS DOUBLE) / 2.0 AS rank_sum_0,
        |  CAST(r2_1 AS DOUBLE) / 2.0 AS rank_sum_1,
        |  CAST(r2_2 AS DOUBLE) / 2.0 AS rank_sum_2,
        |  CASE WHEN n_blocks > 0 THEN round(
        |    3.0 * ((CAST(r2_0 AS DOUBLE) * CAST(r2_0 AS DOUBLE)
        |        + CAST(r2_1 AS DOUBLE) * CAST(r2_1 AS DOUBLE))
        |        + CAST(r2_2 AS DOUBLE) * CAST(r2_2 AS DOUBLE))
        |      / (CAST(n_blocks AS DOUBLE) * 3.0 * 4.0)
        |      - 3.0 * CAST(n_blocks AS DOUBLE) * 4.0, 6)
        |  END AS q_stat,
        |  CASE WHEN n_blocks > 0 AND 1.0 - CAST(tie AS DOUBLE)
        |      / (CAST(n_blocks AS DOUBLE) * 3.0 * 8.0) > 0.0
        |  THEN round(
        |    (3.0 * ((CAST(r2_0 AS DOUBLE) * CAST(r2_0 AS DOUBLE)
        |        + CAST(r2_1 AS DOUBLE) * CAST(r2_1 AS DOUBLE))
        |        + CAST(r2_2 AS DOUBLE) * CAST(r2_2 AS DOUBLE))
        |      / (CAST(n_blocks AS DOUBLE) * 3.0 * 4.0)
        |      - 3.0 * CAST(n_blocks AS DOUBLE) * 4.0)
        |    / (1.0 - CAST(tie AS DOUBLE)
        |      / (CAST(n_blocks AS DOUBLE) * 3.0 * 8.0)), 6)
        |  END AS q_adj,
        |  CAST(2 AS BIGINT) AS dof
        |FROM a""".stripMargin,

    // C103: Cramér's V — cell terms nano-quantized (nonnegative ⇒
    // HALF_UP ≡ half-away-from-zero) and summed as exact integers,
    // the D119 convention; margins/dims exact integers
    "assoc_cramers_v" -> cramersVSql,

    // E30: continuously-maintained association — stream ≡ batch on
    // the merged additive contingency cells, oracle verbatim
    "stream_cramers_v" -> cramersVSql,

    // C106: Granger lag-1 F — nine exact sums, closed-form OLS algebra
    "granger_causality" -> grangerSql,

    // D122: JL projection distortion — deterministic Rademacher signs,
    // 0.0-seeded index-order folds (the ANN-oracle convention),
    // nano-quantized ratios aggregated as exact integers
    "jl_projection_audit" ->
      """WITH v AS (SELECT vec_id AS id, vec_id // 2 AS p, embedding AS v
        |  FROM embeddings),
        |pj AS (SELECT id, p, v,
        |    list_transform(range(0, 16), j ->
        |      list_reduce(list_prepend(0.0, list_transform(range(0, 64),
        |        i -> CAST(v[i+1] AS DOUBLE)
        |          * (CASE WHEN (i+1) * (j+3) * 2654435761 % 1000003 % 2
        |             = 0 THEN 1.0 ELSE -1.0 END))),
        |        (a, b) -> a + b) / 4.0) AS pv
        |  FROM v),
        |h AS (SELECT p, v AS va, pv AS pa FROM pj WHERE id % 2 = 0),
        |r AS (SELECT p, v AS vb, pv AS pb FROM pj WHERE id % 2 = 1),
        |pr AS (SELECT h.p,
        |    list_reduce(list_prepend(0.0, list_transform(range(1, 65),
        |      i -> (CAST(va[i] AS DOUBLE) - CAST(vb[i] AS DOUBLE))
        |        * (CAST(va[i] AS DOUBLE) - CAST(vb[i] AS DOUBLE)))),
        |      (a, b) -> a + b) AS do_,
        |    list_reduce(list_prepend(0.0, list_transform(range(1, 17),
        |      i -> (pa[i] - pb[i]) * (pa[i] - pb[i]))),
        |      (a, b) -> a + b) AS dp_
        |  FROM h JOIN r ON r.p = h.p),
        |nn AS (SELECT CASE WHEN do_ > 0.0 THEN
        |    CAST(round(dp_ / do_ * 1e9, 0) AS BIGINT) END AS nano
        |  FROM pr),
        |a AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_pairs,
        |    CAST(SUM(CASE WHEN nano IS NULL THEN 1 ELSE 0 END) AS BIGINT)
        |      AS n_zero,
        |    CAST(SUM(nano) AS BIGINT) AS ns,
        |    CAST(MIN(nano) AS BIGINT) AS mn,
        |    CAST(MAX(nano) AS BIGINT) AS mx,
        |    CAST(SUM(CASE WHEN nano BETWEEN 800000000 AND 1200000000
        |      THEN 1 ELSE 0 END) AS BIGINT) AS w20
        |  FROM nn)
        |SELECT n_pairs, n_zero, CAST(16 AS BIGINT) AS k_dims,
        |  CASE WHEN n_pairs > n_zero THEN round(CAST(ns AS DOUBLE)
        |    / CAST(n_pairs - n_zero AS DOUBLE) / 1e9, 6) END AS mean_ratio,
        |  round(CAST(mn AS DOUBLE) / 1e9, 6) AS min_ratio,
        |  round(CAST(mx AS DOUBLE) / 1e9, 6) AS max_ratio,
        |  CASE WHEN n_pairs > n_zero THEN round(CAST(w20 AS DOUBLE)
        |    / CAST(n_pairs - n_zero AS DOUBLE), 6) END
        |    AS frac_within_20pct
        |FROM a""".stripMargin,

    // C104: Ljung-Box — the m per-lag terms fold in lag order over
    // the 6-dp-rounded acf values both engines agree on bit-for-bit
    "ljung_box" -> ljungBoxSql,

    // E29: continuous Ljung-Box — stream ≡ batch on the merged
    // additive day cells (the E27 argument), oracle verbatim
    "stream_ljung_box" -> ljungBoxSql,

    // D120: Fellegi-Sunter — Σn_v² / N exact integers, each weight
    // one IEEE evaluation (1−m subtracted IN the tree, both engines);
    // score folds fields in declaration order, rounded before the
    // (score, id, id) cut
    "fellegi_sunter_linkage" ->
      """WITH c AS (SELECT c_custkey AS id, c_nationkey AS blk,
        |    c_mktsegment AS seg,
        |    CAST(floor(CAST(CAST(CAST(c_acctbal AS DECIMAL(18,2)) * 100
        |      AS BIGINT) AS DOUBLE) / 100000.0) AS BIGINT) AS band,
        |    CAST(CAST(c_acctbal AS DECIMAL(18,2)) * 100 AS BIGINT) >= 0
        |      AS sign
        |  FROM customer),
        |n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM c),
        |s1 AS (SELECT CAST(SUM(cc * cc) AS BIGINT) AS ss_seg FROM (
        |    SELECT COUNT(*) AS cc FROM c GROUP BY seg)),
        |s2 AS (SELECT CAST(SUM(cc * cc) AS BIGINT) AS ss_band FROM (
        |    SELECT COUNT(*) AS cc FROM c GROUP BY band)),
        |s3 AS (SELECT CAST(SUM(cc * cc) AS BIGINT) AS ss_sign FROM (
        |    SELECT COUNT(*) AS cc FROM c GROUP BY sign)),
        |p AS (SELECT a.id AS id_a, b.id AS id_b,
        |    a.seg IS NOT DISTINCT FROM b.seg AS agree_seg,
        |    a.band IS NOT DISTINCT FROM b.band AS agree_band,
        |    a.sign IS NOT DISTINCT FROM b.sign AS agree_sign
        |  FROM c a JOIN c b ON a.blk = b.blk AND a.id < b.id)
        |SELECT id_a, id_b, agree_seg, agree_band, agree_sign,
        |  round(
        |    (CASE WHEN agree_seg
        |     THEN ln(0.95 / (CAST(ss_seg AS DOUBLE)
        |       / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE))))
        |     ELSE ln((1.0 - 0.95) / (1.0 - CAST(ss_seg AS DOUBLE)
        |       / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE))))
        |     END
        |    + CASE WHEN agree_band
        |     THEN ln(0.9 / (CAST(ss_band AS DOUBLE)
        |       / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE))))
        |     ELSE ln((1.0 - 0.9) / (1.0 - CAST(ss_band AS DOUBLE)
        |       / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE))))
        |     END)
        |    + CASE WHEN agree_sign
        |     THEN ln(0.98 / (CAST(ss_sign AS DOUBLE)
        |       / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE))))
        |     ELSE ln((1.0 - 0.98) / (1.0 - CAST(ss_sign AS DOUBLE)
        |       / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE))))
        |     END, 6) AS score
        |FROM p CROSS JOIN n CROSS JOIN s1 CROSS JOIN s2 CROSS JOIN s3
        |ORDER BY score DESC, id_a, id_b LIMIT 50""".stripMargin,

    // D121: self-BLEU-2 — clipped counts exact integers off the
    // doc_id-DIV-2 pairing; per-pair BLEU one IEEE tree,
    // nano-quantized, per-lang exact integer sums
    "self_bleu" ->
      """WITH t AS (
        |  SELECT doc_id, lang, CASE WHEN len(trim(text)) > 0
        |    THEN string_split_regex(trim(text), '\s+')
        |    ELSE [] END AS tk
        |  FROM documents),
        |h AS (SELECT doc_id // 2 AS p, lang, tk FROM t
        |  WHERE doc_id % 2 = 0),
        |r AS (SELECT doc_id // 2 AS p, lang, tk FROM t
        |  WHERE doc_id % 2 = 1),
        |pr AS (SELECT h.p, h.lang, h.tk AS th, r.tk AS tr
        |  FROM h JOIN r ON r.p = h.p AND r.lang = h.lang),
        |gh AS (SELECT p, g, COUNT(*) AS ch FROM (
        |    SELECT p, '1 ' || unnest(th) AS g FROM pr
        |    UNION ALL
        |    SELECT p, '2 ' || unnest(list_transform(range(1, len(th)),
        |      i -> th[i] || ' ' || th[i+1])) AS g FROM pr)
        |  GROUP BY 1, 2),
        |gr AS (SELECT p, g, COUNT(*) AS cr FROM (
        |    SELECT p, '1 ' || unnest(tr) AS g FROM pr
        |    UNION ALL
        |    SELECT p, '2 ' || unnest(list_transform(range(1, len(tr)),
        |      i -> tr[i] || ' ' || tr[i+1])) AS g FROM pr)
        |  GROUP BY 1, 2),
        |cl AS (SELECT gh.p,
        |    CAST(SUM(CASE WHEN substring(gh.g, 1, 1) = '1'
        |      THEN LEAST(ch, cr) END) AS BIGINT) AS c1,
        |    CAST(SUM(CASE WHEN substring(gh.g, 1, 1) = '2'
        |      THEN LEAST(ch, cr) END) AS BIGINT) AS c2
        |  FROM gh JOIN gr ON gr.p = gh.p AND gr.g = gh.g GROUP BY 1),
        |sc AS (SELECT pr.lang,
        |    CAST(len(th) AS BIGINT) AS lh, CAST(len(tr) AS BIGINT) AS lr,
        |    c1, c2
        |  FROM pr LEFT JOIN cl ON cl.p = pr.p),
        |b AS (SELECT lang,
        |    CASE WHEN lh >= 2 AND COALESCE(c1, 0) > 0
        |      AND COALESCE(c2, 0) > 0
        |    THEN (CASE WHEN lh >= lr THEN 1.0
        |      ELSE exp(1.0 - CAST(lr AS DOUBLE) / CAST(lh AS DOUBLE)) END)
        |      * sqrt((CAST(c1 AS DOUBLE) / CAST(lh AS DOUBLE))
        |        * (CAST(c2 AS DOUBLE) / (CAST(lh AS DOUBLE) - 1.0)))
        |    ELSE 0.0 END AS bleu
        |  FROM sc)
        |SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_pairs,
        |  round(CAST(SUM(CAST(round(bleu * 1e9, 0) AS BIGINT)) AS DOUBLE)
        |    / CAST(COUNT(*) AS DOUBLE) / 1e9, 6) AS self_bleu2
        |FROM b GROUP BY 1 ORDER BY lang""".stripMargin,

    // C105: Hurst R/S — w-scaled deviation cumsums and w²·S² exact
    // HUGEINTs per block, one sqrt + one divide each, per-size block
    // means off nano-quantized exact integer sums, the dyadic-ladder
    // closed-form slope
    "hurst_exponent" -> hurstSql,

    // E33: continuous Hurst - stream ≡ batch on the merged additive
    // hour cells, oracle verbatim
    "stream_hurst" -> hurstSql,

    // C107: Nelson-Aalen — the km_retention frame verbatim with the
    // additive seed-0.0 hazard fold instead of the survival product
    "nelson_aalen" ->
      """WITH u AS (SELECT user_id,
        |    CAST(min(date_trunc('day', ts)) AS DATE) AS fd,
        |    CAST(max(date_trunc('day', ts)) AS DATE) AS ld,
        |    CAST(min(CASE WHEN event_type = 'error'
        |      THEN date_trunc('day', ts) END) AS DATE) AS ed
        |  FROM events GROUP BY 1),
        |s AS (SELECT CAST(CASE WHEN ed IS NOT NULL
        |      THEN date_diff('day', fd, ed)
        |      ELSE date_diff('day', fd, ld) END AS BIGINT) AS t,
        |    (ed IS NULL) AS cens FROM u),
        |bt AS (SELECT t,
        |    CAST(SUM(CASE WHEN NOT cens THEN 1 ELSE 0 END) AS BIGINT) AS d,
        |    CAST(COUNT(*) AS BIGINT) AS leave
        |  FROM s GROUP BY 1),
        |n AS (SELECT CAST(COUNT(*) AS BIGINT) AS total FROM s),
        |r AS (SELECT t, d,
        |    total - COALESCE(SUM(leave) OVER (ORDER BY t
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |      AS n_risk
        |  FROM bt CROSS JOIN n),
        |dr AS (SELECT t, CAST(n_risk AS BIGINT) AS n_risk, d
        |  FROM r WHERE d >= 1)
        |SELECT a.t, a.n_risk, a.d AS d_events,
        |  round(list_reduce(list_prepend(0.0,
        |    list(CAST(b.d AS DOUBLE) / CAST(b.n_risk AS DOUBLE)
        |      ORDER BY b.t)),
        |    (x, y) -> x + y), 6) AS cum_hazard
        |FROM dr a JOIN dr b ON b.t <= a.t
        |GROUP BY a.t, a.n_risk, a.d
        |ORDER BY a.t""".stripMargin,

    // C108: log-rank — per-time O-E and hypergeometric V folded in
    // pinned time order, every input an exact integer
    "log_rank_test" ->
      """WITH u AS (SELECT user_id,
        |    CAST(min(date_trunc('day', ts)) AS DATE) AS fd,
        |    CAST(max(date_trunc('day', ts)) AS DATE) AS ld,
        |    CAST(min(CASE WHEN event_type = 'error'
        |      THEN date_trunc('day', ts) END) AS DATE) AS ed
        |  FROM events GROUP BY 1),
        |s AS (SELECT CAST(user_id % 2 AS INTEGER) AS arm,
        |    CAST(CASE WHEN ed IS NOT NULL
        |      THEN date_diff('day', fd, ed)
        |      ELSE date_diff('day', fd, ld) END AS BIGINT) AS t,
        |    (ed IS NULL) AS cens FROM u),
        |bt AS (SELECT t,
        |    CAST(SUM(CASE WHEN NOT cens AND arm = 1 THEN 1 ELSE 0 END)
        |      AS BIGINT) AS d1,
        |    CAST(SUM(CASE WHEN NOT cens THEN 1 ELSE 0 END) AS BIGINT)
        |      AS d,
        |    CAST(SUM(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS BIGINT)
        |      AS leave1,
        |    CAST(COUNT(*) AS BIGINT) AS leave
        |  FROM s GROUP BY 1),
        |tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
        |    CAST(SUM(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS BIGINT)
        |      AS n1,
        |    CAST(SUM(CASE WHEN NOT cens THEN 1 ELSE 0 END) AS BIGINT)
        |      AS ev,
        |    CAST(SUM(CASE WHEN NOT cens AND arm = 1 THEN 1 ELSE 0 END)
        |      AS BIGINT) AS ev1
        |  FROM s),
        |r AS (SELECT t, d1, d,
        |    n - COALESCE(SUM(leave) OVER (ORDER BY t
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |      AS n_r,
        |    n1 - COALESCE(SUM(leave1) OVER (ORDER BY t
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |      AS n_r1
        |  FROM bt CROSS JOIN tot),
        |terms AS (SELECT t,
        |    CAST(d1 AS DOUBLE) - CAST(d AS DOUBLE)
        |      * CAST(n_r1 AS DOUBLE) / CAST(n_r AS DOUBLE) AS ome,
        |    CASE WHEN n_r > 1 THEN CAST(d AS DOUBLE)
        |      * (CAST(n_r1 AS DOUBLE) / CAST(n_r AS DOUBLE))
        |      * (1.0 - CAST(n_r1 AS DOUBLE) / CAST(n_r AS DOUBLE))
        |      * ((CAST(n_r AS DOUBLE) - CAST(d AS DOUBLE))
        |        / (CAST(n_r AS DOUBLE) - 1.0))
        |    ELSE 0.0 END AS v
        |  FROM r WHERE d >= 1),
        |f AS (SELECT
        |    list_reduce(list_prepend(0.0, list(ome ORDER BY t)),
        |      (x, y) -> x + y) AS so,
        |    list_reduce(list_prepend(0.0, list(v ORDER BY t)),
        |      (x, y) -> x + y) AS sv
        |  FROM terms)
        |SELECT n AS n_total, n1 AS n_arm1, ev AS events_total,
        |  ev1 AS events_arm1,
        |  round(so, 6) AS o_minus_e,
        |  CASE WHEN sv > 0.0 THEN round(so * so / sv, 6) END AS chi2,
        |  CAST(1 AS BIGINT) AS dof
        |FROM f CROSS JOIN tot""".stripMargin,

    // C109: Mood's median — pooled lower median off the value-domain
    // cumulative; 2×k cells exact integers, chi-square unrolled in
    // fixed arm order
    "mood_median" -> moodMedianSql,

    // E36: continuous median-equality monitor - stream ≡ batch on
    // the merged additive census, oracle verbatim
    "stream_mood_median" -> moodMedianSql,

    // C110: Page's L — the C102 rank frame with the ordered weights;
    // L2 exact integer, z one IEEE evaluation
    "page_trend" ->
      """WITH u AS (
        |  SELECT user_id,
        |    CAST(COALESCE(SUM(CASE WHEN event_type = 'purchase'
        |      AND day(ts) BETWEEN 1 AND 10
        |      THEN CAST(value AS DECIMAL(18,2)) * 100 END), 0) AS BIGINT)
        |      AS v0,
        |    CAST(COALESCE(SUM(CASE WHEN event_type = 'purchase'
        |      AND day(ts) BETWEEN 11 AND 20
        |      THEN CAST(value AS DECIMAL(18,2)) * 100 END), 0) AS BIGINT)
        |      AS v1,
        |    CAST(COALESCE(SUM(CASE WHEN event_type = 'purchase'
        |      AND day(ts) BETWEEN 21 AND 31
        |      THEN CAST(value AS DECIMAL(18,2)) * 100 END), 0) AS BIGINT)
        |      AS v2
        |  FROM events GROUP BY 1),
        |r AS (SELECT
        |    2 + 2*((CASE WHEN v1 < v0 THEN 1 ELSE 0 END)
        |         + (CASE WHEN v2 < v0 THEN 1 ELSE 0 END))
        |      + (CASE WHEN v1 = v0 THEN 1 ELSE 0 END)
        |      + (CASE WHEN v2 = v0 THEN 1 ELSE 0 END) AS r0,
        |    2 + 2*((CASE WHEN v0 < v1 THEN 1 ELSE 0 END)
        |         + (CASE WHEN v2 < v1 THEN 1 ELSE 0 END))
        |      + (CASE WHEN v0 = v1 THEN 1 ELSE 0 END)
        |      + (CASE WHEN v2 = v1 THEN 1 ELSE 0 END) AS r1,
        |    2 + 2*((CASE WHEN v0 < v2 THEN 1 ELSE 0 END)
        |         + (CASE WHEN v1 < v2 THEN 1 ELSE 0 END))
        |      + (CASE WHEN v0 = v2 THEN 1 ELSE 0 END)
        |      + (CASE WHEN v1 = v2 THEN 1 ELSE 0 END) AS r2
        |  FROM u),
        |a AS (SELECT
        |    CAST(COUNT(*) AS BIGINT) AS n_blocks,
        |    CAST(SUM(r0) AS BIGINT) AS r2_0,
        |    CAST(SUM(r1) AS BIGINT) AS r2_1,
        |    CAST(SUM(r2) AS BIGINT) AS r2_2
        |  FROM r)
        |SELECT n_blocks,
        |  CAST(r2_0 AS DOUBLE) / 2.0 AS rank_sum_0,
        |  CAST(r2_1 AS DOUBLE) / 2.0 AS rank_sum_1,
        |  CAST(r2_2 AS DOUBLE) / 2.0 AS rank_sum_2,
        |  CAST(((r2_0 * 1 + r2_1 * 2) + r2_2 * 3) AS DOUBLE) / 2.0
        |    AS l_stat,
        |  CASE WHEN n_blocks > 0
        |    AND CAST(n_blocks AS DOUBLE) * 288.0 / 144.0 > 0.0
        |  THEN round(
        |    (CAST(((r2_0 * 1 + r2_1 * 2) + r2_2 * 3) AS DOUBLE) / 2.0
        |      - CAST(n_blocks AS DOUBLE) * 48.0 / 4.0)
        |    / sqrt(CAST(n_blocks AS DOUBLE) * 288.0 / 144.0), 6)
        |  END AS z_stat
        |FROM a""".stripMargin,

    // C111: power/MDE — six exact sums, z-constants shared
    // plan/oracle literals (the C94 string-cast convention)
    "ab_power_mde" -> {
      val zA = "CAST('1.959963984540054' AS DOUBLE)"
      val z80 = "CAST('0.8416212335729143' AS DOUBLE)"
      val z90 = "CAST('1.2815515655446004' AS DOUBLE)"
      val na = "CAST(n_a AS DOUBLE)"; val nb = "CAST(n_b AS DOUBLE)"
      val pooled = s"""((CAST(ssa AS DOUBLE)
        | - CAST(sa AS DOUBLE) * CAST(sa AS DOUBLE) / $na
        | + (CAST(ssb AS DOUBLE)
        |   - CAST(sb AS DOUBLE) * CAST(sb AS DOUBLE) / $nb))
        | / ($na + $nb - 2.0))""".stripMargin
      val se = s"sqrt($pooled * (1.0 / $na + 1.0 / $nb))"
      val ok = s"n_a >= 2 AND n_b >= 2 AND $pooled > 0.0"
      s"""WITH p AS (SELECT CAST(user_id % 2 AS INTEGER) AS arm,
         |    CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS v
         |  FROM events WHERE event_type = 'purchase'),
         |a AS (SELECT
         |    CAST(SUM(CASE WHEN arm = 1 THEN 0 ELSE 1 END) AS BIGINT)
         |      AS n_a,
         |    CAST(SUM(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS BIGINT)
         |      AS n_b,
         |    SUM(CASE WHEN arm = 1 THEN NULL
         |      ELSE CAST(v AS HUGEINT) END) AS sa,
         |    SUM(CASE WHEN arm = 1 THEN CAST(v AS HUGEINT) END) AS sb,
         |    SUM(CASE WHEN arm = 1 THEN NULL
         |      ELSE CAST(v AS HUGEINT) * v END) AS ssa,
         |    SUM(CASE WHEN arm = 1 THEN CAST(v AS HUGEINT) * v END)
         |      AS ssb
         |  FROM p)
         |SELECT n_a, n_b,
         |  CASE WHEN n_a > 0 THEN round(CAST(sa AS DOUBLE) / $na, 6)
         |  END AS mean_a,
         |  CASE WHEN $ok THEN round(sqrt($pooled), 6) END AS pooled_sd,
         |  CASE WHEN $ok THEN round(($zA + $z80) * $se, 6)
         |  END AS mde_abs_80,
         |  CASE WHEN $ok THEN round(($zA + $z90) * $se, 6)
         |  END AS mde_abs_90,
         |  CASE WHEN $ok AND CAST(sa AS DOUBLE) / $na > 0.0
         |  THEN round(($zA + $z80) * $se / (CAST(sa AS DOUBLE) / $na), 6)
         |  END AS mde_rel_80
         |FROM a""".stripMargin
    },

    // E31: continuous vocabulary monitor — stream ≡ batch on the
    // merged additive word counts, oracle verbatim
    "stream_vocab_monitor" -> OracleSqlC.sql("good_turing_vocab"),

    // C112: Cochran-Armitage — 2k exact conditional counts, one IEEE
    // tree for T, Var and z
    "ab_cochran_armitage" -> {
      val n = "((n_0 + n_1) + n_2)"; val r = "((r_0 + r_1) + r_2)"
      val sr = "((r_0 * 1 + r_1 * 2) + r_2 * 3)"
      val sn = "((n_0 * 1 + n_1 * 2) + n_2 * 3)"
      val ssn = "((n_0 * 1 + n_1 * 4) + n_2 * 9)"
      val nD = s"CAST($n AS DOUBLE)"; val rD = s"CAST($r AS DOUBLE)"
      val t = s"(CAST($sr AS DOUBLE) - $rD * CAST($sn AS DOUBLE) / $nD)"
      val vr = s"""($rD / $nD * (1.0 - $rD / $nD)
        | * (CAST($ssn AS DOUBLE)
        |   - CAST($sn AS DOUBLE) * CAST($sn AS DOUBLE) / $nD))"""
        .stripMargin
      val ok = s"$n > 0 AND $r > 0 AND $r < $n AND $vr > 0.0"
      s"""WITH e AS (SELECT
         |    CASE WHEN day(ts) <= 10 THEN 0
         |         WHEN day(ts) <= 20 THEN 1 ELSE 2 END AS g,
         |    (event_type = 'purchase') AS s
         |  FROM events),
         |a AS (SELECT
         |    CAST(SUM(CASE WHEN g = 0 THEN 1 ELSE 0 END) AS BIGINT)
         |      AS n_0,
         |    CAST(SUM(CASE WHEN g = 1 THEN 1 ELSE 0 END) AS BIGINT)
         |      AS n_1,
         |    CAST(SUM(CASE WHEN g = 2 THEN 1 ELSE 0 END) AS BIGINT)
         |      AS n_2,
         |    CAST(SUM(CASE WHEN g = 0 AND s THEN 1 ELSE 0 END) AS BIGINT)
         |      AS r_0,
         |    CAST(SUM(CASE WHEN g = 1 AND s THEN 1 ELSE 0 END) AS BIGINT)
         |      AS r_1,
         |    CAST(SUM(CASE WHEN g = 2 AND s THEN 1 ELSE 0 END) AS BIGINT)
         |      AS r_2
         |  FROM e)
         |SELECT n_0, n_1, n_2, r_0, r_1, r_2,
         |  CASE WHEN $ok THEN round($t / sqrt($vr), 6) END AS z_stat,
         |  CASE WHEN $ok THEN round($t * $t / $vr, 6) END AS chi2,
         |  CAST(1 AS BIGINT) AS dof
         |FROM a""".stripMargin
    },

    // D125: code-switch audit — half-doc marker censuses, the D38
    // argmax priority verbatim per half
    "code_switch_audit" -> {
      def langCase(part: String): String =
        s"""CASE WHEN greatest(
           |    len(list_filter($part, x -> list_contains(
           |      ['the','a','of','and','to','in','is'], x))),
           |    len(list_filter($part, x -> list_contains(
           |      ['le','la','et','les','des','un','une'], x))),
           |    len(list_filter($part, x -> list_contains(
           |      ['der','die','und','das','ein','nicht'], x))),
           |    len(list_filter($part, x -> list_contains(
           |      ['el','los','y','que','un','una','en'], x)))) = 0
           |  THEN 'und'
           |  WHEN len(list_filter($part, x -> list_contains(
           |      ['the','a','of','and','to','in','is'], x))) = greatest(
           |    len(list_filter($part, x -> list_contains(
           |      ['the','a','of','and','to','in','is'], x))),
           |    len(list_filter($part, x -> list_contains(
           |      ['le','la','et','les','des','un','une'], x))),
           |    len(list_filter($part, x -> list_contains(
           |      ['der','die','und','das','ein','nicht'], x))),
           |    len(list_filter($part, x -> list_contains(
           |      ['el','los','y','que','un','una','en'], x))))
           |  THEN 'en'
           |  WHEN len(list_filter($part, x -> list_contains(
           |      ['le','la','et','les','des','un','une'], x))) = greatest(
           |    len(list_filter($part, x -> list_contains(
           |      ['the','a','of','and','to','in','is'], x))),
           |    len(list_filter($part, x -> list_contains(
           |      ['le','la','et','les','des','un','une'], x))),
           |    len(list_filter($part, x -> list_contains(
           |      ['der','die','und','das','ein','nicht'], x))),
           |    len(list_filter($part, x -> list_contains(
           |      ['el','los','y','que','un','una','en'], x))))
           |  THEN 'fr'
           |  WHEN len(list_filter($part, x -> list_contains(
           |      ['der','die','und','das','ein','nicht'], x))) = greatest(
           |    len(list_filter($part, x -> list_contains(
           |      ['the','a','of','and','to','in','is'], x))),
           |    len(list_filter($part, x -> list_contains(
           |      ['le','la','et','les','des','un','une'], x))),
           |    len(list_filter($part, x -> list_contains(
           |      ['der','die','und','das','ein','nicht'], x))),
           |    len(list_filter($part, x -> list_contains(
           |      ['el','los','y','que','un','una','en'], x))))
           |  THEN 'de'
           |  ELSE 'es' END""".stripMargin
      s"""WITH t AS (
         |  SELECT doc_id, CASE WHEN len(trim(text)) > 0
         |    THEN string_split_regex(trim(text), '\\s+')
         |    ELSE [] END AS tk
         |  FROM documents),
         |s AS (SELECT doc_id, CAST(len(tk) AS BIGINT) AS n,
         |    len(tk) // 2 AS h, tk FROM t),
         |parts AS (SELECT doc_id, n,
         |    list_transform(range(1, h + 1), i -> tk[i]) AS hd,
         |    list_transform(range(h + 1, CAST(n AS INTEGER) + 1),
         |      i -> tk[i]) AS tl
         |  FROM s),
         |l AS (SELECT doc_id, n,
         |    ${langCase("hd")} AS lang_head,
         |    ${langCase("tl")} AS lang_tail
         |  FROM parts)
         |SELECT doc_id, n AS n_tokens, lang_head, lang_tail,
         |  lang_head <> lang_tail AND lang_head <> 'und'
         |    AND lang_tail <> 'und' AS switched
         |FROM l ORDER BY doc_id""".stripMargin
    },

    // C120: post-stratified mean — 4k exact sums, strata folded in
    // fixed order, one IEEE tree per published statistic
    "ab_post_stratified" -> {
      val bigN = "((bn_0 + bn_1) + bn_2)"
      val nR = "((n_0 + n_1) + n_2)"
      val sT = "((COALESCE(s_0, 0) + COALESCE(s_1, 0)) + COALESCE(s_2, 0))"
      val ssT =
        "((COALESCE(ss_0, 0) + COALESCE(ss_1, 0)) + COALESCE(ss_2, 0))"
      def w(k: Int) = s"(CAST(bn_$k AS DOUBLE) / CAST($bigN AS DOUBLE))"
      def mTerm(k: Int) =
        s"(${w(k)} * (CAST(s_$k AS DOUBLE) / CAST(n_$k AS DOUBLE)))"
      def vTerm(k: Int) =
        s"""(${w(k)} * ${w(k)}
           | * ((CAST(ss_$k AS DOUBLE) - CAST(s_$k AS DOUBLE)
           |     * CAST(s_$k AS DOUBLE) / CAST(n_$k AS DOUBLE))
           |   / (CAST(n_$k AS DOUBLE) - 1.0))
           | / CAST(n_$k AS DOUBLE))""".stripMargin
      def fold(f: Int => String) = s"((${f(0)} + ${f(1)}) + ${f(2)})"
      val rawMean = s"(CAST($sT AS DOUBLE) / CAST($nR AS DOUBLE))"
      val rawVar =
        s"""(((CAST($ssT AS DOUBLE) - CAST($sT AS DOUBLE)
           |  * CAST($sT AS DOUBLE) / CAST($nR AS DOUBLE))
           |  / (CAST($nR AS DOUBLE) - 1.0)) / CAST($nR AS DOUBLE))"""
          .stripMargin
      s"""WITH u AS (SELECT
         |    CAST(user_id % 3 AS INTEGER) AS st,
         |    CAST(COALESCE(SUM(CASE WHEN event_type = 'purchase'
         |      THEN CAST(value AS DECIMAL(18,2)) * 100 END), 0) AS BIGINT)
         |      AS spend
         |  FROM events GROUP BY user_id),
         |a AS (SELECT
         |    CAST(SUM(CASE WHEN st = 0 THEN 1 ELSE 0 END) AS BIGINT)
         |      AS bn_0,
         |    CAST(SUM(CASE WHEN st = 1 THEN 1 ELSE 0 END) AS BIGINT)
         |      AS bn_1,
         |    CAST(SUM(CASE WHEN st = 2 THEN 1 ELSE 0 END) AS BIGINT)
         |      AS bn_2,
         |    CAST(SUM(CASE WHEN st = 0 AND spend > 0 THEN 1 ELSE 0 END)
         |      AS BIGINT) AS n_0,
         |    CAST(SUM(CASE WHEN st = 1 AND spend > 0 THEN 1 ELSE 0 END)
         |      AS BIGINT) AS n_1,
         |    CAST(SUM(CASE WHEN st = 2 AND spend > 0 THEN 1 ELSE 0 END)
         |      AS BIGINT) AS n_2,
         |    SUM(CASE WHEN st = 0 AND spend > 0
         |      THEN CAST(spend AS HUGEINT) END) AS s_0,
         |    SUM(CASE WHEN st = 1 AND spend > 0
         |      THEN CAST(spend AS HUGEINT) END) AS s_1,
         |    SUM(CASE WHEN st = 2 AND spend > 0
         |      THEN CAST(spend AS HUGEINT) END) AS s_2,
         |    SUM(CASE WHEN st = 0 AND spend > 0
         |      THEN CAST(spend AS HUGEINT) * spend END) AS ss_0,
         |    SUM(CASE WHEN st = 1 AND spend > 0
         |      THEN CAST(spend AS HUGEINT) * spend END) AS ss_1,
         |    SUM(CASE WHEN st = 2 AND spend > 0
         |      THEN CAST(spend AS HUGEINT) * spend END) AS ss_2
         |  FROM u)
         |SELECT n_0, n_1, n_2,
         |  CAST($bigN AS BIGINT) AS n_population,
         |  CAST($nR AS BIGINT) AS n_responders,
         |  CASE WHEN $nR > 0 THEN round($rawMean, 6) END AS raw_mean,
         |  CASE WHEN n_0 > 0 AND n_1 > 0 AND n_2 > 0
         |  THEN round(${fold(mTerm)}, 6) END AS ps_mean,
         |  CASE WHEN n_0 >= 2 AND n_1 >= 2 AND n_2 >= 2
         |    AND $rawVar > 0.0
         |  THEN round(${fold(vTerm)} / $rawVar, 6) END AS var_ratio
         |FROM a""".stripMargin
    },

    // C118: turning points — strict local extrema over the day±1
    // self-joins, exact counts, one IEEE z
    "turning_point_test" -> turningPointSql,

    // E38: continuous shape randomness - stream ≡ batch on the
    // merged additive day cells, oracle verbatim
    "stream_turning_point" -> turningPointSql,

    // C119: Theil's U — the Holt recursion + both error accumulators
    // as one 5-slot flat-list fold (the C88b/pacf discipline);
    // alpha/(1-alpha) interpolated as Scala round-trip literals
    "theil_u_forecast" -> theilUSql,

    // E37: continuous forecast honesty - stream ≡ batch on the
    // merged additive day cells, oracle verbatim
    "stream_theil_u" -> theilUSql,

    // C116: Wilcoxon signed-rank — half-unit ranks on the |d| value
    // domain, 2W+ and the tie census exact integers, one IEEE z
    "ab_wilcoxon_signed" -> wilcoxonSignedSql,

    // E39: continuous paired-magnitude monitoring — stream ≡ batch on
    // the merged additive per-(user, half) cells, oracle verbatim
    "stream_wilcoxon" -> wilcoxonSignedSql,

    // C117: sign test — two exact counts, one IEEE evaluation
    "ab_sign_test" ->
      """WITH u AS (SELECT user_id,
        |    CAST(COALESCE(SUM(CASE WHEN event_type = 'purchase'
        |      AND day(ts) BETWEEN 16 AND 31
        |      THEN CAST(value AS DECIMAL(18,2)) * 100 END), 0) AS BIGINT)
        |    - CAST(COALESCE(SUM(CASE WHEN event_type = 'purchase'
        |      AND day(ts) BETWEEN 1 AND 15
        |      THEN CAST(value AS DECIMAL(18,2)) * 100 END), 0) AS BIGINT)
        |      AS d
        |  FROM events GROUP BY 1),
        |a AS (SELECT
        |    CAST(SUM(CASE WHEN d <> 0 THEN 1 ELSE 0 END) AS BIGINT) AS m,
        |    CAST(SUM(CASE WHEN d > 0 THEN 1 ELSE 0 END) AS BIGINT)
        |      AS n_pos
        |  FROM u)
        |SELECT m AS n_nonzero, n_pos,
        |  CASE WHEN m > 0 THEN round(
        |    (2.0 * CAST(n_pos AS DOUBLE) - CAST(m AS DOUBLE))
        |      / sqrt(CAST(m AS DOUBLE)), 6) END AS z_stat
        |FROM a""".stripMargin,

    // C115: CMH — 4k exact cells, per-stratum E/V/OR legs folded in
    // stratum order, one IEEE tree per published statistic
    "ab_cmh_test" -> {
      def nk(k: Int) = s"((a_$k + b_$k) + (c_$k + d_$k))"
      def eTerm(k: Int) =
        s"""(CASE WHEN ${nk(k)} > 0 THEN CAST(a_$k + b_$k AS DOUBLE)
           |  * CAST(a_$k + c_$k AS DOUBLE) / CAST(${nk(k)} AS DOUBLE)
           |  ELSE 0.0 END)""".stripMargin
      def vTerm(k: Int) =
        s"""(CASE WHEN ${nk(k)} > 1 THEN CAST(a_$k + b_$k AS DOUBLE)
           |  * CAST(c_$k + d_$k AS DOUBLE) * CAST(a_$k + c_$k AS DOUBLE)
           |  * CAST(b_$k + d_$k AS DOUBLE)
           |  / (CAST(${nk(k)} AS DOUBLE) * CAST(${nk(k)} AS DOUBLE)
           |    * (CAST(${nk(k)} AS DOUBLE) - 1.0))
           |  ELSE 0.0 END)""".stripMargin
      def onTerm(k: Int) =
        s"""(CASE WHEN ${nk(k)} > 0 THEN CAST(a_$k * d_$k AS DOUBLE)
           |  / CAST(${nk(k)} AS DOUBLE) ELSE 0.0 END)""".stripMargin
      def odTerm(k: Int) =
        s"""(CASE WHEN ${nk(k)} > 0 THEN CAST(b_$k * c_$k AS DOUBLE)
           |  / CAST(${nk(k)} AS DOUBLE) ELSE 0.0 END)""".stripMargin
      def fold(f: Int => String) =
        s"((${f(0)} + ${f(1)}) + ${f(2)})"
      val sumA = "((a_0 + a_1) + a_2)"
      val dev = s"(CAST($sumA AS DOUBLE) - ${fold(eTerm)})"
      val legs = (0 until 3).flatMap(k => Seq("a", "b", "c", "d").map {
        cell =>
          val armCond = if (cell == "a" || cell == "b")
            "user_id % 2 = 1" else "user_id % 2 = 0"
          val sCond = if (cell == "a" || cell == "c")
            "event_type = 'purchase'" else "event_type <> 'purchase'"
          val stCond = k match {
            case 0 => "day(ts) <= 10"
            case 1 => "day(ts) > 10 AND day(ts) <= 20"
            case _ => "day(ts) > 20"
          }
          s"""CAST(SUM(CASE WHEN $stCond AND $armCond AND $sCond
             |  THEN 1 ELSE 0 END) AS BIGINT) AS ${cell}_$k"""
            .stripMargin
      }).mkString(",\n    ")
      s"""WITH a AS (SELECT
         |    $legs
         |  FROM events)
         |SELECT a_0, a_1, a_2,
         |  CAST($sumA AS BIGINT) AS sum_a,
         |  CASE WHEN ${fold(vTerm)} > 0.0 THEN round(
         |    $dev * $dev / ${fold(vTerm)}, 6) END AS cmh_chi2,
         |  CASE WHEN ${fold(odTerm)} > 0.0 THEN round(
         |    ${fold(onTerm)} / ${fold(odTerm)}, 6) END AS or_mh,
         |  CAST(1 AS BIGINT) AS dof
         |FROM a""".stripMargin
    },

    // C114: k-sample Anderson-Darling — half-unit midrank cumulatives
    // exact HUGEINTs, per-(arm,value) terms nano-quantized and summed
    // as exact integers, per-arm sums folded in arm order
    "ab_anderson_darling" -> adKSql,

    // E34: continuous arm-distribution monitor - stream ≡ batch on
    // the merged additive per-(value, arm) counts, oracle verbatim
    "stream_ab_distribution" -> adKSql,

    // C113: seasonal Mann-Kendall — per-weekday pairwise census, S
    // and Var summed across disjoint seasons as exact integers
    "seasonal_mann_kendall" ->
      """WITH dly AS (
        |  SELECT CAST(date_trunc('day', ts) AS DATE) AS day,
        |    CAST(CAST(SUM(CAST(value AS DECIMAL(18,2))) * 100
        |      AS HUGEINT) AS BIGINT) AS x
        |  FROM events WHERE event_type = 'purchase' GROUP BY 1),
        |g AS (SELECT (day - DATE '1970-01-01') % 7 AS grp, day, x
        |  FROM dly),
        |s AS (SELECT CAST(COALESCE(SUM(CASE WHEN b.x > a.x THEN 1
        |    WHEN b.x < a.x THEN -1 ELSE 0 END), 0) AS BIGINT) AS s_stat
        |  FROM g a JOIN g b ON b.grp = a.grp AND a.day < b.day),
        |per AS (SELECT grp, CAST(COUNT(*) AS BIGINT) AS m FROM g
        |  GROUP BY 1),
        |t AS (SELECT grp, CAST(SUM(t*(t-1)*(2*t+5)) AS BIGINT) AS tie
        |  FROM (SELECT grp, x, CAST(COUNT(*) AS BIGINT) AS t FROM g
        |        GROUP BY 1, 2)
        |  WHERE t > 1 GROUP BY 1),
        |v AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_seasons,
        |    CAST(COALESCE(SUM(m), 0) AS BIGINT) AS n_steps,
        |    CAST(COALESCE(SUM(m*(m-1)*(2*m+5) - COALESCE(tie, 0)), 0)
        |      AS BIGINT) AS var18
        |  FROM per LEFT JOIN t USING (grp)),
        |z AS (SELECT s_stat, n_seasons, n_steps, var18,
        |    CASE WHEN var18 <= 0 THEN NULL
        |    ELSE (CASE WHEN s_stat > 0 THEN CAST(s_stat - 1 AS DOUBLE)
        |          WHEN s_stat < 0 THEN CAST(s_stat + 1 AS DOUBLE)
        |          ELSE 0.0 END)
        |      / sqrt(CAST(var18 AS DOUBLE) / 18.0) END AS zv
        |  FROM s, v)
        |SELECT n_seasons, n_steps, s_stat, var18,
        |  round(zv, 6) AS z_stat,
        |  CASE WHEN zv IS NULL THEN 'undefined'
        |       WHEN round(zv, 6) > 1.96 THEN 'increasing'
        |       WHEN round(zv, 6) < -1.96 THEN 'decreasing'
        |       ELSE 'no_trend' END AS trend
        |FROM z""".stripMargin,

    // D127: Hill tail index — top-(k+1) order statistics (only the
    // value MULTISET enters, so cut-boundary ties are harmless), ln
    // terms folded descending with seed 0.0
    "hill_tail_index" -> {
      val s = """list_reduce(list_prepend(0.0,
        |    list_transform(range(1, 101),
        |      i -> ln(CAST(lst[i] AS DOUBLE) / CAST(lst[101] AS DOUBLE)))),
        |    (a, b) -> a + b)""".stripMargin
      s"""WITH t AS (SELECT CASE WHEN len(trim(text)) > 0
         |    THEN CAST(len(string_split_regex(trim(text), '\\s+'))
         |      AS BIGINT)
         |    ELSE 0 END AS x
         |  FROM documents),
         |p AS (SELECT x FROM t WHERE x > 0),
         |np AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_pos FROM p),
         |top AS (SELECT x FROM p ORDER BY x DESC LIMIT 101),
         |l AS (SELECT list_sort(list(x), 'DESC') AS lst,
         |    CAST(COUNT(*) AS BIGINT) AS cnt FROM top)
         |SELECT n_pos, CAST(100 AS BIGINT) AS k,
         |  lst[101] AS x_kplus1,
         |  CASE WHEN cnt = 101 AND n_pos > 101 AND $s > 0.0
         |  THEN round(100.0 / $s, 6) END AS alpha,
         |  CASE WHEN cnt = 101 AND n_pos > 101 AND $s > 0.0
         |  THEN round(100.0 / $s, 6) < 2.0 END AS infinite_variance
         |FROM l CROSS JOIN np""".stripMargin
    },

    // E32: continuous PII density — stream ≡ batch on the merged
    // additive per-source counters, oracle verbatim
    "stream_pii_density" -> piiDensitySql,

    // D126: PII density — the embedded-marker censuses are exact
    // integers, each rate one IEEE divide
    "pii_density_by_source" -> piiDensitySql,

    // A18: schema-evolution read — the merged frame equals the
    // original table with the new column null before its version
    "schema_evolution_read" ->
      """SELECT r_regionkey, r_name,
        |  CASE WHEN r_regionkey >= 3
        |    THEN CAST(length(r_name) AS BIGINT) END AS r_name_len
        |FROM region ORDER BY r_regionkey""".stripMargin,

    // D124: RAKE — gaps-and-islands runs per doc, deg/freq word
    // scores exact-integer divides, phrase scores folded in phrase
    // word order, rounded before the (score desc, phrase) cut
    "rake_keywords" ->
      """WITH t AS (
        |  SELECT doc_id, CASE WHEN len(trim(text)) > 0
        |    THEN string_split_regex(trim(text), '\s+')
        |    ELSE [] END AS tk
        |  FROM documents),
        |tp AS (SELECT doc_id,
        |    unnest(range(1, len(tk) + 1)) - 1 AS pos,
        |    unnest(tk) AS w
        |  FROM t),
        |ns AS (SELECT doc_id, pos, w,
        |    pos - row_number() OVER (PARTITION BY doc_id ORDER BY pos)
        |      AS run
        |  FROM tp
        |  WHERE w NOT IN ('the','a','an','of','and','to','in','is',
        |    'on','for','with','as')),
        |ph AS (SELECT doc_id, run,
        |    string_agg(w, ' ' ORDER BY pos) AS phrase,
        |    list(w ORDER BY pos) AS words,
        |    CAST(COUNT(*) AS BIGINT) AS n_words
        |  FROM ns GROUP BY 1, 2),
        |ws AS (SELECT w,
        |    CAST(SUM(n_words) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE)
        |      AS score_w
        |  FROM (SELECT unnest(words) AS w, n_words FROM ph)
        |  GROUP BY 1),
        |ty AS (SELECT phrase, n_words,
        |    CAST(COUNT(*) AS BIGINT) AS n_occurrences
        |  FROM ph GROUP BY 1, 2),
        |pw AS (SELECT phrase, n_words, n_occurrences,
        |    unnest(range(1, len(string_split(phrase, ' ')) + 1)) AS wi,
        |    unnest(string_split(phrase, ' ')) AS w
        |  FROM ty),
        |sc AS (SELECT phrase, n_words, n_occurrences,
        |    round(list_reduce(list_prepend(0.0,
        |      list(score_w ORDER BY wi)), (x, y) -> x + y), 6) AS score
        |  FROM pw JOIN ws USING (w) GROUP BY 1, 2, 3)
        |SELECT phrase, n_words, n_occurrences, score
        |FROM sc ORDER BY score DESC, phrase LIMIT 30""".stripMargin,

    // D123: word burstiness — all-docs-including-zeros moments from
    // present counts only (T, S, N closed form); VMR one IEEE tree,
    // rounded before the (vmr desc, word) cut
    "word_burstiness" ->
      """WITH t AS (
        |  SELECT doc_id, CASE WHEN len(trim(text)) > 0
        |    THEN string_split_regex(trim(text), '\s+')
        |    ELSE [] END AS tk
        |  FROM documents),
        |p AS (SELECT doc_id, w, COUNT(*) AS c FROM (
        |    SELECT doc_id, unnest(tk) AS w FROM t) GROUP BY 1, 2),
        |n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_docs FROM documents),
        |pw AS (SELECT w, CAST(COUNT(*) AS BIGINT) AS doc_freq,
        |    CAST(SUM(c) AS BIGINT) AS total_count,
        |    CAST(SUM(c * c) AS BIGINT) AS s2
        |  FROM p GROUP BY 1),
        |f AS (SELECT w, doc_freq, total_count,
        |    round((CAST(s2 AS DOUBLE) - CAST(total_count AS DOUBLE)
        |        * CAST(total_count AS DOUBLE) / CAST(n_docs AS DOUBLE))
        |      / (CAST(n_docs AS DOUBLE) - 1.0)
        |      / (CAST(total_count AS DOUBLE) / CAST(n_docs AS DOUBLE)),
        |      6) AS burstiness
        |  FROM pw CROSS JOIN n WHERE total_count >= 50)
        |SELECT w AS word, doc_freq, total_count, burstiness
        |FROM f ORDER BY burstiness DESC, word LIMIT 30""".stripMargin,

    // D119: per-source JSD vs the corpus unigram mix — each PRESENT
    // word's pointwise term quantized to 1e-9 bits (nonnegative, so
    // HALF_UP and half-away-from-zero agree) and summed as an exact
    // integer; the absent-word tail is the closed form
    // 0.5·(N−S)/N over exact integer masses
    "source_js_divergence" ->
      """WITH t AS (
        |  SELECT source, CASE WHEN len(trim(text)) > 0
        |    THEN string_split_regex(trim(text), '\s+')
        |    ELSE [] END AS tk
        |  FROM documents),
        |cnt AS (SELECT source, w, COUNT(*) AS c FROM (
        |    SELECT source, unnest(tk) AS w FROM t) GROUP BY 1, 2),
        |gt AS (SELECT source, CAST(SUM(c) AS BIGINT) AS n_tokens
        |  FROM cnt GROUP BY 1),
        |g AS (SELECT w, CAST(SUM(c) AS BIGINT) AS cg FROM cnt GROUP BY 1),
        |tot AS (SELECT CAST(SUM(cg) AS BIGINT) AS n_all FROM g),
        |term AS (SELECT cnt.source,
        |    CAST(round((p * ln(p / m) + q * ln(q / m)) * 0.5
        |      / 0.6931471805599453 * 1e9, 0) AS BIGINT) AS nano, cg
        |  FROM (SELECT cnt.source, cnt.w, cnt.c, g.cg, gt.n_tokens,
        |      tot.n_all,
        |      CAST(cnt.c AS DOUBLE) / CAST(gt.n_tokens AS DOUBLE) AS p,
        |      CAST(g.cg AS DOUBLE) / CAST(tot.n_all AS DOUBLE) AS q,
        |      (CAST(cnt.c AS DOUBLE) / CAST(gt.n_tokens AS DOUBLE)
        |        + CAST(g.cg AS DOUBLE) / CAST(tot.n_all AS DOUBLE))
        |        / 2.0 AS m
        |    FROM cnt JOIN g USING (w) JOIN gt USING (source)
        |    CROSS JOIN tot) cnt),
        |agg AS (SELECT source,
        |    CAST(COUNT(*) AS BIGINT) AS n_types,
        |    CAST(SUM(nano) AS BIGINT) AS nano_sum,
        |    CAST(SUM(cg) AS BIGINT) AS s
        |  FROM term GROUP BY 1)
        |SELECT source, n_types, gt.n_tokens,
        |  round(CAST(nano_sum AS DOUBLE) / 1e9
        |    + 0.5 * CAST(n_all - s AS DOUBLE) / CAST(n_all AS DOUBLE), 6)
        |    AS jsd_bits
        |FROM agg JOIN gt USING (source) CROSS JOIN tot
        |ORDER BY source""".stripMargin,
  )

  /** C122's oracle invokes the multi-second futility quadrature
    * (WarehouseQueries.betaSpendingDesign). Rendered lazily so the
    * cost is paid only when an oracle consumer materializes the map,
    * and a require failure inside the design recursion surfaces as an
    * ordinary exception at the call site instead of an
    * ExceptionInInitializerError that poisons every OracleSqlD entry
    * (r16 ADVICE). The quadrature is memoized (futilityBoundsCached),
    * so repeated renders after the first are cheap.
    */
  private lazy val betaSpendingEntry: (String, String) =
    "ab_beta_spending" -> betaSpendingOracle(Seq(25, 50, 75, 100),
      graft.queries.WarehouseQueries.betaSpendingDesign)

  /** RFC 3986 §6.2.2.2 percent-normalization of SQL expression `x`,
    * independently in DuckDB: tokenize into %XX triplets / literal
    * runs, decode unreserved octets (ALPHA DIGIT - . _ ~), uppercase
    * the hex of everything else. Mirrors the SEMANTICS of
    * [[graft.functions.UrlKernels.percentNorm]] with a completely
    * different mechanism (regexp token list vs a char loop).
    */
  private def pnSql(x: String): String = {
    val code = "((strpos('0123456789abcdef', substr(lower(t), 2, 1)) - 1)" +
      " * 16 + strpos('0123456789abcdef', substr(lower(t), 3, 1)) - 1)"
    s"""list_aggregate(list_transform(
       |      regexp_extract_all($x, '%[0-9A-Fa-f]{2}|%|[^%]+'),
       |      t -> CASE WHEN NOT starts_with(t, '%') OR length(t) <> 3 THEN t
       |        WHEN $code BETWEEN 65 AND 90 OR $code BETWEEN 97 AND 122
       |          OR $code BETWEEN 48 AND 57 OR $code IN (45, 46, 95, 126)
       |        THEN chr(CAST($code AS INT)) ELSE upper(t) END),
       |    'string_agg', '')""".stripMargin
  }

  /** The D128 canonicalizer chain through `c` (doc_id, n_chars,
    * canonical_url) — shared by `url_dedup` and `stream_url_dedup`.
    * RAW margins (no stripMargin here): the text interpolates into
    * templates that strip ONCE — stripping twice would eat the first
    * bar of SQL `||` concat lines (the corpusPipelineChain rule).
    */
  private lazy val urlCanonChainSql: String =
    s"""WITH d AS (SELECT doc_id, n_chars, doc_id // 3 AS g,
         |    doc_id % 3 AS v FROM documents),
         |s AS (SELECT doc_id, n_chars, v, CAST(g AS VARCHAR) AS gs,
         |    CAST(g % 20 AS VARCHAR) AS ks FROM d),
         |u AS (SELECT doc_id, n_chars,
         |    CASE WHEN v = 0 THEN 'HTTPS://SRC' || ks ||
         |        '.Example.COM:443/wiki/Page_' || gs || '?id=' || gs ||
         |        '&q=a%2fb#top'
         |      WHEN v = 1 THEN 'https://src' || ks ||
         |        '.example.com/%77iki/Page_' || gs || '?id=' || gs ||
         |        '&utm_source=feed&q=a%2fb'
         |      ELSE 'https://src' || ks ||
         |        '.example.com:/wiki/Page%5f' || gs || '?id=' || gs ||
         |        '&q=a%2fb&utm_medium=email' END AS url
         |  FROM s),
         |f AS (SELECT doc_id, n_chars,
         |    regexp_replace(url, '#.*$$', '') AS su FROM u),
         |pr AS (SELECT doc_id, n_chars,
         |    lower(regexp_extract(su, '^([A-Za-z][A-Za-z0-9+.-]*)://', 1))
         |      AS scheme,
         |    regexp_extract(su, '^[A-Za-z][A-Za-z0-9+.-]*://([^/?]*)', 1)
         |      AS auth,
         |    regexp_extract(su,
         |      '^[A-Za-z][A-Za-z0-9+.-]*://[^/?]*([^?]*)', 1) AS path0,
         |    CASE WHEN strpos(su, '?') > 0
         |      THEN substr(su, strpos(su, '?') + 1) END AS query0
         |  FROM f),
         |hp AS (SELECT doc_id, n_chars, scheme, path0, query0,
         |    CASE WHEN regexp_matches(auth, ':[0-9]*$$') THEN
         |      CASE WHEN regexp_extract(auth, ':([0-9]*)$$', 1) = ''
         |          OR (scheme = 'http'
         |            AND regexp_extract(auth, ':([0-9]*)$$', 1) = '80')
         |          OR (scheme = 'https'
         |            AND regexp_extract(auth, ':([0-9]*)$$', 1) = '443')
         |        THEN lower(regexp_replace(auth, ':[0-9]*$$', ''))
         |        ELSE lower(regexp_replace(auth, ':[0-9]*$$', '')) || ':'
         |          || regexp_extract(auth, ':([0-9]*)$$', 1) END
         |      ELSE lower(auth) END AS hostport
         |  FROM pr),
         |pq AS (SELECT doc_id, n_chars, scheme, hostport,
         |    COALESCE(${pnSql("path0")}, '') AS path1,
         |    CASE WHEN query0 IS NULL THEN NULL
         |      ELSE ${pnSql("query0")} END AS query1
         |  FROM hp),
         |qf AS (SELECT doc_id, n_chars, scheme, hostport, path1,
         |    CASE WHEN query1 IS NULL THEN NULL ELSE
         |      list_aggregate(list_filter(string_split(query1, '&'),
         |        x -> x <> '' AND NOT starts_with(lower(
         |          CASE WHEN strpos(x, '=') > 0
         |            THEN substr(x, 1, strpos(x, '=') - 1) ELSE x END),
         |          'utm_')), 'string_agg', '&') END AS query2
         |  FROM pq),
         |c AS (SELECT doc_id, n_chars,
         |    scheme || '://' || hostport ||
         |      (CASE WHEN path1 = '' THEN '/' ELSE path1 END) ||
         |      (CASE WHEN query2 IS NULL THEN ''
         |        ELSE '?' || query2 END) AS canonical_url
         |  FROM qf)"""

  /** Round-17 additions (D128-D130). Kept out of [[staticSql]] so the
    * builder-rendered pieces (repair chain, phrase mojibake) stay next
    * to their generators.
    */
  private[graft] lazy val r17Sql: Map[String, String] = Map(

    // D128: same messy-URL derivation, then an INDEPENDENT SQL
    // canonicalizer (regexp parse + token-list percent-norm + utm
    // filter) and window-based keep-best (the engine uses a
    // struct-max aggregate — different mechanism, same rule). The
    // chain is shared with E41's streaming twin below.
    "url_dedup" -> s"""$urlCanonChainSql,
         |r AS (SELECT canonical_url, doc_id, n_chars,
         |    CAST(COUNT(*) OVER (PARTITION BY canonical_url) AS BIGINT)
         |      AS n_dups,
         |    row_number() OVER (PARTITION BY canonical_url
         |      ORDER BY n_chars DESC, doc_id) AS rn
         |  FROM c)
         |SELECT canonical_url, doc_id, n_chars, n_dups FROM r
         |WHERE rn = 1 ORDER BY canonical_url""".stripMargin,

    // E41: the same chain + keep-best select, WITHOUT the group
    // multiplicity — the streaming sink's state carries the argmax
    // per canonical URL, not the count (StreamFaces.streamUrlDedup)
    "stream_url_dedup" -> s"""$urlCanonChainSql,
         |r AS (SELECT canonical_url, doc_id, n_chars,
         |    row_number() OVER (PARTITION BY canonical_url
         |      ORDER BY n_chars DESC, doc_id) AS rn
         |  FROM c)
         |SELECT canonical_url, doc_id, n_chars FROM r
         |WHERE rn = 1 ORDER BY canonical_url""".stripMargin,

    // D129: same dirty/clean construction (phrase constants shared
    // with the face), repair = the replace chain rendered from the
    // SAME explicit table — the table is the spec, the spec pins it
    "text_fix_encoding" -> {
      import graft.functions.EncodingRepair
      val ph = EncodingRepair.phrases
      val cleanCase = ph.zipWithIndex.map { case (p, i) =>
        s"WHEN $i THEN '${EncodingRepair.sqlEsc(p)}'" }.mkString(" ")
      val dirtyCase = ph.zipWithIndex.map { case (p, i) =>
        s"WHEN $i THEN '${EncodingRepair.sqlEsc(EncodingRepair.mojibake(p))}'"
      }.mkString(" ")
      s"""WITH d AS (SELECT doc_id,
         |    substr(text, 1, 40) || ' ' ||
         |      CASE CAST(doc_id % ${ph.size} AS INT) $dirtyCase END AS dirty,
         |    substr(text, 1, 40) || ' ' ||
         |      CASE CAST(doc_id % ${ph.size} AS INT) $cleanCase END AS clean
         |  FROM documents),
         |r AS (SELECT doc_id, clean, length(dirty) AS len_dirty,
         |    ${EncodingRepair.repairSql("dirty")} AS repaired FROM d)
         |SELECT doc_id, repaired,
         |  repaired IS NOT DISTINCT FROM clean AS repaired_ok,
         |  CAST(len_dirty - length(repaired) AS BIGINT) AS n_shrunk
         |FROM r ORDER BY doc_id""".stripMargin
    },

    // D130: FS ∘ JW — DuckDB's BUILT-IN jaro_winkler_similarity (the
    // C76 independence argument), u-collision stats as exact ints,
    // the Winkler comparator interpolation as the identical IEEE
    // tree; blocked pairs under the cap = plain prefix-8 self-join
    "fs_jw_linkage" -> {
      def u(ss: String) =
        s"(CAST($ss AS DOUBLE) / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)))"
      val waN = s"ln(0.95 / ${u("ss_name")})"
      val wdN = s"ln((1.0 - 0.95) / (1.0 - ${u("ss_name")}))"
      s"""WITH p AS (SELECT p_partkey AS pk, p_name AS name,
         |    p_brand AS brand, p_type AS ptype,
         |    substr(p_name, 1, 8) AS blk FROM part),
         |n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM p),
         |s1 AS (SELECT CAST(SUM(cc * cc) AS BIGINT) AS ss_name FROM (
         |    SELECT COUNT(*) AS cc FROM p GROUP BY name)),
         |s2 AS (SELECT CAST(SUM(cc * cc) AS BIGINT) AS ss_brand FROM (
         |    SELECT COUNT(*) AS cc FROM p GROUP BY brand)),
         |s3 AS (SELECT CAST(SUM(cc * cc) AS BIGINT) AS ss_type FROM (
         |    SELECT COUNT(*) AS cc FROM p GROUP BY ptype)),
         |pr AS (SELECT a.pk AS id_a, b.pk AS id_b,
         |    round(jaro_winkler_similarity(a.name, b.name), 6) AS jw,
         |    a.brand IS NOT DISTINCT FROM b.brand AS agree_brand,
         |    a.ptype IS NOT DISTINCT FROM b.ptype AS agree_type
         |  FROM p a JOIN p b ON a.blk = b.blk AND a.pk < b.pk)
         |SELECT id_a, id_b, jw, agree_brand, agree_type,
         |  round(
         |    (CASE WHEN jw >= 0.94 THEN $waN
         |      WHEN jw >= 0.7 THEN greatest($wdN,
         |        $waN - ($waN - $wdN) * (1.0 - jw) * 4.5)
         |      ELSE $wdN END
         |    + CASE WHEN agree_brand
         |      THEN ln(0.9 / ${u("ss_brand")})
         |      ELSE ln((1.0 - 0.9) / (1.0 - ${u("ss_brand")})) END)
         |    + CASE WHEN agree_type
         |      THEN ln(0.85 / ${u("ss_type")})
         |      ELSE ln((1.0 - 0.85) / (1.0 - ${u("ss_type")})) END, 6)
         |    AS score
         |FROM pr CROSS JOIN n CROSS JOIN s1 CROSS JOIN s2 CROSS JOIN s3
         |ORDER BY score DESC, id_a, id_b LIMIT 50""".stripMargin
    },

    // D12c witness: the Spark side counts cross-decoder pixel
    // mismatches between JpegCodec and javax.imageio on EVERY doc's
    // bitstream; the independent truth is that there are none — the
    // oracle states the expected constant over the same row domain
    "media_decode_jpeg_witness" ->
      """SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM documents)
        |  AS n_docs, CAST(0 AS BIGINT) AS n_mismatched""".stripMargin
  )

  private[graft] def sql: Map[String, String] =
    staticSql + betaSpendingEntry ++ r17Sql
}
