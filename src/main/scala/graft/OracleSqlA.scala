package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries._
import OracleFns._
import OracleFnsTrained._

/** graph/mixture/events/dashboard/TPC-H oracle SQL (split from SparkEntry - part A).
  *
  * Same package, no behavior change: [[SparkEntry.oracleSql]] is the
  * concatenation of the four parts; shared SQL builders live in
  * [[OracleFns]].
  */
private[graft] object OracleSqlA {
  private[graft] val sql: Map[String, String] = Map(
    "pagerank_centrality" -> pageRankOracle(10),
    "pagerank_weighted" -> weightedPageRankOracle(10),
    "pagerank_personalized" -> personalizedPageRankOracle(10),
    "hits_centrality" -> hitsOracle(8),
    "community_labels" -> lpaOracle(5),
    "seed_distance" -> bfsOracle(4),
    "shortest_paths" -> ssspOracle(4),
    "kcore_layers" -> kcoreOracle(2, 9),
    "markov_attribution" -> markovOracle(12),

    // C84: S, m, and the tie term are exact integers; the only doubles
    // are the final sqrt/divide — one IEEE evaluation in each engine
    "mann_kendall_trend" ->
      """WITH d AS (SELECT CAST(date_trunc('day', ts) AS DATE) AS day,
        |    CAST(COUNT(*) AS BIGINT) AS n FROM events GROUP BY 1),
        |s AS (SELECT CAST(COALESCE(SUM(CASE WHEN b.n > a.n THEN 1
        |    WHEN b.n < a.n THEN -1 ELSE 0 END), 0) AS BIGINT) AS s_stat
        |  FROM d a JOIN d b ON a.day < b.day),
        |m AS (SELECT CAST(COUNT(*) AS BIGINT) AS m FROM d),
        |t AS (SELECT CAST(COALESCE(SUM(t*(t-1)*(2*t+5)), 0) AS BIGINT)
        |    AS tie_term
        |  FROM (SELECT CAST(COUNT(*) AS BIGINT) AS t FROM d
        |        GROUP BY n HAVING COUNT(*) > 1)),
        |j AS (SELECT s_stat, m, m*(m-1)*(2*m+5) - tie_term AS var18
        |  FROM s, m, t),
        |z AS (SELECT *, CASE WHEN var18 <= 0 THEN NULL
        |    ELSE (CASE WHEN s_stat > 0 THEN CAST(s_stat - 1 AS DOUBLE)
        |          WHEN s_stat < 0 THEN CAST(s_stat + 1 AS DOUBLE)
        |          ELSE 0.0 END)
        |      / sqrt(CAST(var18 AS DOUBLE) / 18.0) END AS zv FROM j)
        |SELECT m AS n_steps, s_stat, var18, round(zv, 6) AS z_stat,
        |  CASE WHEN zv IS NULL THEN 'undefined'
        |       WHEN round(zv, 6) > 1.96 THEN 'increasing'
        |       WHEN round(zv, 6) < -1.96 THEN 'decreasing'
        |       ELSE 'no_trend' END AS trend
        |FROM z""".stripMargin,

    // C83: the exact 16-coalition Shapley replay — masks of channels
    // touched strictly before the first purchase (ROW comparison =
    // the same (ts, event_id) total order), v(S) as subset sums, the
    // |S|!(n-1-|S|)!-weighted marginals kept INTEGER (×4! = 24) until
    // the final divides. Channel bits in sorted-name order: click=1,
    // error=2, signup=4, view=8.
    "shapley_attribution" ->
      """WITH fc AS (
        |  SELECT user_id AS u, min(row(ts, event_id)) AS conv_at
        |  FROM events WHERE event_type = 'purchase' GROUP BY 1),
        |tch AS (
        |  SELECT f.u,
        |    max(CASE WHEN e.event_type = 'click'  THEN 1 ELSE 0 END) * 1
        |  + max(CASE WHEN e.event_type = 'error'  THEN 1 ELSE 0 END) * 2
        |  + max(CASE WHEN e.event_type = 'signup' THEN 1 ELSE 0 END) * 4
        |  + max(CASE WHEN e.event_type = 'view'   THEN 1 ELSE 0 END) * 8 AS m
        |  FROM fc f JOIN events e ON e.user_id = f.u
        |    AND row(e.ts, e.event_id) < f.conv_at
        |  GROUP BY 1),
        |cnt AS (
        |  SELECT COALESCE(t.m, 0) AS m, CAST(COUNT(*) AS BIGINT) AS cnt
        |  FROM fc f LEFT JOIN tch t ON t.u = f.u GROUP BY 1),
        |coal AS (SELECT i AS s FROM range(0, 16) r(i)),
        |v AS (
        |  SELECT s, CAST(COALESCE(SUM(cnt), 0) AS BIGINT) AS v
        |  FROM coal LEFT JOIN cnt ON (m & (15 - s)) = 0 GROUP BY s),
        |ch AS (SELECT * FROM (VALUES
        |  ('click', 1), ('error', 2), ('signup', 4), ('view', 8))
        |  c(channel, bit)),
        |terms AS (
        |  SELECT ch.channel,
        |    CAST(SUM((CASE bit_count(coal.s) WHEN 0 THEN 6 WHEN 1 THEN 2
        |              WHEN 2 THEN 2 ELSE 6 END)
        |      * (vi.v - vs.v)) AS BIGINT) AS phi24
        |  FROM ch JOIN coal ON (coal.s & ch.bit) = 0
        |  JOIN v vs ON vs.s = coal.s
        |  JOIN v vi ON vi.s = coal.s + ch.bit
        |  GROUP BY 1),
        |tot AS (SELECT
        |  (SELECT v FROM v WHERE s = 15) - (SELECT v FROM v WHERE s = 0)
        |  AS tot)
        |SELECT channel,
        |  round(CAST(phi24 AS DOUBLE) / 24.0, 6) AS shapley,
        |  CASE WHEN tot > 0
        |    THEN round(CAST(phi24 AS DOUBLE) / 24.0 / CAST(tot AS DOUBLE), 6)
        |  END AS share
        |FROM terms CROSS JOIN tot ORDER BY channel""".stripMargin,
    // C58: exact-integer supports; total (support DESC, u, v) order
    // makes the LIMIT boundary engine-independent
    // C60: co-counts are C58's integers; the cosine is one
    // sqrt/÷ chain over exact integer products — correctly-rounded
    // IEEE in both engines, hashes raw
    "item_cosine" ->
      """WITH lp AS (
        |  SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem),
        |f AS (SELECT pk, COUNT(*) AS n FROM lp GROUP BY pk),
        |p AS (
        |  SELECT a.pk AS u, b.pk AS v, COUNT(*) AS support
        |  FROM lp a JOIN lp b ON a.ok = b.ok AND a.pk < b.pk
        |  GROUP BY 1, 2 HAVING COUNT(*) >= 2)
        |SELECT u, v, support,
        |  CAST(support AS DOUBLE) / sqrt(CAST(fu.n * fv.n AS DOUBLE)) AS cosine
        |FROM p JOIN f fu ON fu.pk = u JOIN f fv ON fv.pk = v
        |ORDER BY cosine DESC, u, v LIMIT 50""".stripMargin,

    "frequent_pairs" ->
      """WITH lp AS (
        |  SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem)
        |SELECT a.pk AS u, b.pk AS v, COUNT(*) AS support
        |FROM lp a JOIN lp b ON a.ok = b.ok AND a.pk < b.pk
        |GROUP BY 1, 2 HAVING COUNT(*) >= 2
        |ORDER BY support DESC, u, v LIMIT 50""".stripMargin,
    "tfidf_search" -> tfidfOracle(
      graft.queries.WarehouseQueries.Bm25Terms, 50),

    "triangle_count" ->
      """WITH lp AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk
        |  FROM lineitem),
        |e AS (SELECT DISTINCT a.pk AS u, b.pk AS v
        |  FROM lp a JOIN lp b ON a.ok = b.ok AND a.pk < b.pk),
        |deg AS (SELECT id, COUNT(*) AS c FROM
        |  (SELECT u AS id FROM e UNION ALL SELECT v FROM e) GROUP BY id),
        |tri AS (SELECT e1.u AS a, e1.v AS b, e2.v AS c
        |  FROM e e1 JOIN e e2 ON e2.u = e1.v
        |  JOIN e e3 ON e3.u = e1.u AND e3.v = e2.v),
        |tn AS (SELECT id, COUNT(*) AS t FROM
        |  (SELECT a AS id FROM tri UNION ALL SELECT b FROM tri
        |   UNION ALL SELECT c FROM tri) GROUP BY id)
        |SELECT p.id, CAST(COALESCE(d.c, 0) AS BIGINT) AS degree,
        |  CAST(COALESCE(tn.t, 0) AS BIGINT) AS triangles,
        |  CASE WHEN COALESCE(d.c, 0) >= 2
        |    THEN round(2.0 * COALESCE(tn.t, 0)
        |      / CAST(d.c * (d.c - 1) AS DOUBLE), 6)
        |    ELSE 0.0 END AS lcc
        |FROM (SELECT CAST(p_partkey AS BIGINT) AS id FROM part) p
        |LEFT JOIN deg d USING (id) LEFT JOIN tn USING (id)
        |ORDER BY p.id""".stripMargin,

    // DSIR: two add-one unigram LMs (target = lang 'en', raw = whole
    // corpus, the exact lm_cross_entropy estimator twice), per-doc
    // Σ(lnPt − lnPr), Gumbel keys from the portable-XXH64 uniform;
    // ln drift + sum regrouping absorbed by the 6-dp round, the cut
    // ordered on the rounded key.
    "dsir_resample" ->
      raw"""WITH tokr AS (
        |  SELECT doc_id, unnest(string_split_regex(trim(text), '\s+')) AS w
        |  FROM documents WHERE len(trim(text)) > 0),
        |cr AS (SELECT w, COUNT(*) AS c FROM tokr GROUP BY w),
        |topr AS (SELECT w, c FROM cr ORDER BY c DESC, w LIMIT 64),
        |dr AS (SELECT CAST((SELECT SUM(c) FROM cr)
        |  + (SELECT COUNT(*) FROM topr) + 1 AS DOUBLE) AS d),
        |tokt AS (
        |  SELECT doc_id, unnest(string_split_regex(trim(text), '\s+')) AS w
        |  FROM documents WHERE lang = 'en' AND len(trim(text)) > 0),
        |ct AS (SELECT w, COUNT(*) AS c FROM tokt GROUP BY w),
        |topt AS (SELECT w, c FROM ct ORDER BY c DESC, w LIMIT 64),
        |dt AS (SELECT CAST((SELECT SUM(c) FROM ct)
        |  + (SELECT COUNT(*) FROM topt) + 1 AS DOUBLE) AS d),
        |lpw AS (
        |  SELECT t.doc_id,
        |    COALESCE(ln(CAST(a.c + 1 AS DOUBLE) / dt.d), ln(1.0 / dt.d))
        |      - COALESCE(ln(CAST(b.c + 1 AS DOUBLE) / dr.d), ln(1.0 / dr.d)) AS lw
        |  FROM tokr t LEFT JOIN topt a USING (w) LEFT JOIN topr b USING (w)
        |  CROSS JOIN dt CROSS JOIN dr),
        |sw AS (SELECT doc_id, SUM(lw) AS lw FROM lpw GROUP BY doc_id),
        |gw AS (SELECT d.doc_id, COALESCE(sw.lw, 0.0) AS lw
        |  FROM documents d LEFT JOIN sw USING (doc_id)),
        |uu AS (
        |  SELECT doc_id, (CAST($xxhBucket AS DOUBLE) + 0.5) / 1000000.0 AS u
        |  FROM (${xxh64Nested("SELECT doc_id FROM documents", "doc_id")}))
        |SELECT g.doc_id, round(g.lw, 6) AS log_weight,
        |  round(g.lw + (-ln(-ln(u.u))), 6) AS gumbel_key
        |FROM gw g JOIN uu u USING (doc_id)
        |ORDER BY gumbel_key DESC, g.doc_id
        |LIMIT 100""".stripMargin,

    // Temperature mixing: per-source √token-mass quotas (sqrt is
    // IEEE-correctly-rounded, the total folded in sorted-source order
    // — fixed association, identical doubles), selection by the
    // portable-XXH64 rank within source.
    "temperature_mix" ->
      raw"""WITH d AS (
        |  SELECT doc_id, source,
        |    CAST(len(string_split_regex(trim(text), '\s+')) AS BIGINT) AS n_tokens
        |  FROM documents),
        |m AS (SELECT source, SUM(n_tokens) AS n FROM d GROUP BY source),
        |ww AS (SELECT source, sqrt(CAST(n AS DOUBLE)) AS w FROM m),
        |tt AS (SELECT list_reduce(list(w ORDER BY source),
        |  (a, b) -> a + b) AS tot FROM ww),
        |q AS (SELECT source, CAST(floor(400 * w / tot) AS BIGINT) AS quota
        |  FROM ww CROSS JOIN tt),
        |r AS (
        |  SELECT doc_id, source, n_tokens,
        |    row_number() OVER (PARTITION BY source
        |      ORDER BY $xxhBucket, doc_id) AS rk
        |  FROM (${xxh64Nested("SELECT doc_id, source, n_tokens FROM d", "doc_id")}))
        |SELECT r.doc_id, r.source, r.n_tokens
        |FROM r JOIN q USING (source) WHERE rk <= quota
        |ORDER BY r.doc_id""".stripMargin,

    // UniMax water-fill: the driver's greedy integer fold replays as a
    // recursive CTE walking strata in (cap, name) order — every step
    // BIGINT, so quotas and the kept set hash-match; selection is the
    // same portable-XXH64 rank the other mixture oracles use
    // D91: the greedy marginal schedule as pure integer arithmetic —
    // marginals ride as u·7^k·10^(7−k) (0.7^k in fixed point, common
    // denominator), so the order, the prefix-mass walk, and the
    // partial boundary epoch are all BIGINT-exact in both engines
    "epoch_allocation" ->
      """WITH m AS (
        |  SELECT source,
        |    CAST(SUM(len(string_split_regex(trim(text), '\s+'))) AS BIGINT) AS u
        |  FROM documents WHERE source IS NOT NULL GROUP BY source),
        |t AS (SELECT CAST(SUM(u) AS BIGINT) AS tu FROM m),
        |c AS (
        |  SELECT source, u, k,
        |    ([10000000, 7000000, 4900000, 3430000, 2401000, 1680700,
        |      1176490, 823543][k + 1]) AS mult
        |  FROM m CROSS JOIN (SELECT unnest(range(0, 8)) AS k)),
        |w AS (
        |  SELECT source, u, k, mult, u * mult AS mv,
        |    COALESCE(SUM(u) OVER (ORDER BY u * mult DESC, source, k
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS prev,
        |    (SELECT tu * 3 // 2 FROM t) AS b
        |  FROM c),
        |a AS (
        |  SELECT source, u, k, mult,
        |    CASE WHEN prev >= b THEN 0
        |         ELSE LEAST(u, b - prev) END AS alloc
        |  FROM w)
        |SELECT source, u AS unique_tokens,
        |  CAST(COUNT(*) FILTER (WHERE alloc > 0) AS INTEGER) AS n_epochs,
        |  CAST(COUNT(*) FILTER (WHERE alloc = u AND u > 0) AS INTEGER)
        |    AS full_epochs,
        |  CAST(SUM(alloc) AS BIGINT) AS tokens_alloc,
        |  CAST(SUM(alloc * mult) AS BIGINT) AS eff_fp
        |FROM a GROUP BY source, u ORDER BY source""".stripMargin,

    "unimax_mix" ->
      s"""WITH RECURSIVE caps AS (
        |  SELECT lang AS s, CAST(COUNT(*) AS BIGINT) AS cap
        |  FROM documents GROUP BY lang),
        |nn AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM caps),
        |srt AS (SELECT s, cap,
        |    CAST(ROW_NUMBER() OVER (ORDER BY cap, s) AS BIGINT) AS i
        |  FROM caps),
        |alloc AS (
        |  SELECT CAST(0 AS BIGINT) AS i, CAST(380 AS BIGINT) AS rem,
        |         CAST(NULL AS VARCHAR) AS s, CAST(0 AS BIGINT) AS a
        |  UNION ALL
        |  SELECT t.i,
        |         al.rem - LEAST(t.cap, al.rem // (nn.n - t.i + 1)),
        |         t.s,
        |         LEAST(t.cap, al.rem // (nn.n - t.i + 1))
        |  FROM alloc al JOIN srt t ON t.i = al.i + 1 CROSS JOIN nn),
        |q AS (SELECT s AS lang, a AS quota FROM alloc WHERE i > 0),
        |r AS (
        |  SELECT doc_id, lang,
        |    row_number() OVER (PARTITION BY lang
        |      ORDER BY $xxhBucket, doc_id) AS rk
        |  FROM (${xxh64Nested("SELECT doc_id, lang FROM documents", "doc_id")}))
        |SELECT r.doc_id, r.lang FROM r JOIN q USING (lang)
        |WHERE rk <= quota
        |ORDER BY r.doc_id""".stripMargin,

    "vocab_tokenize" -> vocabTokenizeOracle(
      graft.queries.TextQueries.SubwordVocab, 3),
    "vocab_tokenize_ids" -> vocabTokenizeIdsOracle(
      graft.queries.TextQueries.SubwordVocab, 3),
    "vocab_oov_rate" -> vocabOovOracle(
      graft.queries.TextQueries.SubwordVocab, 3),

    // composes the (already bit-exact) D9 quality doubles with the
    // portable-XXH64 bucket; the clamp and the bucket<score·M compare
    // mirror Resample.byScore exactly
    "quality_weighted_sample" ->
      s"""WITH t AS (
        |  SELECT doc_id, string_split_regex(trim(text), '\\s+') AS tk FROM documents),
        |c AS (
        |  SELECT doc_id,
        |    CAST(len(tk) AS DOUBLE) AS n,
        |    CAST(len(list_distinct(tk)) AS DOUBLE) AS u,
        |    CAST(len(list_filter(tk, x -> list_contains(
        |      ['the','a','of','and','to','in','is'], x))) AS DOUBLE) AS h
        |  FROM t),
        |s AS (
        |  SELECT doc_id,
        |    0.4 * least(n / 64.0, 1.0) + 0.4 * (u / n)
        |      + 0.2 * least((h / n) * 8.0, 1.0) AS quality
        |  FROM c),
        |hb AS (
        |  SELECT doc_id, $xxhBucket AS bucket
        |  FROM (${xxh64Nested("SELECT doc_id FROM documents", "doc_id")}))
        |SELECT doc_id, quality
        |FROM s JOIN hb USING (doc_id)
        |WHERE CAST(bucket AS DOUBLE) < greatest(0.0, least(1.0, quality)) * 1000000
        |ORDER BY doc_id""".stripMargin,

    "fuzzy_name_match" ->
      """SELECT a.c_custkey AS a_id, a.c_name AS a_val,
        |  b.c_custkey AS b_id, b.c_name AS b_val,
        |  CAST(levenshtein(a.c_name, b.c_name) AS INTEGER) AS dist
        |FROM customer a, customer b
        |WHERE a.c_custkey < b.c_custkey
        |  AND levenshtein(a.c_name, b.c_name) <= 1
        |ORDER BY a_id, b_id""".stripMargin,

    // gap-fill: densify per-user daily series over each user's own
    // span, forward-fill via IGNORE NULLS; sums decimal-exact
    "events_gap_fill" ->
      """WITH daily AS (
        |  SELECT user_id, date_trunc('day', ts) AS day,
        |    CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS day_value
        |  FROM events GROUP BY user_id, date_trunc('day', ts)),
        |cal AS (
        |  SELECT user_id, unnest(generate_series(
        |    min(day), max(day), INTERVAL 1 DAY)) AS day
        |  FROM daily GROUP BY user_id)
        |SELECT c.user_id, c.day,
        |  last_value(d.day_value IGNORE NULLS) OVER (
        |    PARTITION BY c.user_id ORDER BY c.day
        |    ROWS UNBOUNDED PRECEDING) AS filled_value,
        |  d.day_value IS NULL AS is_gap
        |FROM cal c LEFT JOIN daily d USING (user_id, day)
        |ORDER BY c.user_id, c.day""".stripMargin,

    "events_sliding_agg" ->
      """WITH x AS (
        |  SELECT time_bucket(INTERVAL '15 minutes', ts)
        |           - k * INTERVAL '15 minutes' AS window_start,
        |         event_type, value
        |  FROM events, (SELECT unnest([0, 1, 2, 3]) AS k))
        |SELECT window_start, window_start + INTERVAL '1 hour' AS window_end,
        |  event_type, COUNT(*) AS n_events,
        |  CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS sum_value
        |FROM x GROUP BY window_start, event_type
        |ORDER BY window_start, event_type""".stripMargin,

    "events_outliers" ->
      """WITH s AS (
        |  SELECT event_type, COUNT(*) AS n,
        |    SUM(CAST(value AS DECIMAL(12,2))) AS s1,
        |    SUM(CAST(value AS DECIMAL(12,2)) * CAST(value AS DECIMAL(12,2))) AS s2
        |  FROM events GROUP BY 1),
        |z AS (
        |  SELECT event_id, e.event_type, value,
        |    (CAST(s2 AS DOUBLE)
        |        - (CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE)) / CAST(n AS DOUBLE))
        |      / (CAST(n AS DOUBLE) - 1.0) AS variance,
        |    n,
        |    (value - CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE))
        |      / sqrt((CAST(s2 AS DOUBLE)
        |          - (CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE)) / CAST(n AS DOUBLE))
        |        / (CAST(n AS DOUBLE) - 1.0)) AS z
        |  FROM events e JOIN s USING (event_type))
        |SELECT event_id, event_type, value, z FROM z
        |WHERE n >= 2 AND variance > 0.0 AND abs(z) > 3.0
        |ORDER BY event_id""".stripMargin,

    "ewma_user_value" -> ewmaOracle(0.3),

    "holt_forecast" -> holtOracle(0.3, 0.3),
    // E22 stream face: merged per-(user, day) decimal sums +
    // the same fold == the batch query exactly
    "stream_holt_forecast" -> holtOracle(0.3, 0.3),
    "holt_winters_forecast" -> holtWintersOracle(0.3, 0.2, 0.4, 7),

    // quality CTE mirrors text_quality_score's (already hash-green →
    // the per-doc quality doubles are bit-identical in both engines);
    // the threshold logic mirrors TextQueries.qualityFilter: 2-dp
    // buckets, p75 = least bucket with cum ≥ 0.75·N, keep b ≥ thr.
    "quality_filter" ->
      """WITH t AS (
        |  SELECT doc_id, string_split_regex(trim(text), '\s+') AS tk FROM documents),
        |c AS (
        |  SELECT doc_id,
        |    CAST(len(tk) AS DOUBLE) AS n,
        |    CAST(len(list_distinct(tk)) AS DOUBLE) AS u,
        |    CAST(len(list_filter(tk, x -> list_contains(
        |      ['the','a','of','and','to','in','is'], x))) AS DOUBLE) AS h
        |  FROM t),
        |s AS (
        |  SELECT doc_id,
        |    0.4 * least(n / 64.0, 1.0) + 0.4 * (u / n)
        |      + 0.2 * least((h / n) * 8.0, 1.0) AS quality
        |  FROM c),
        |sb AS (SELECT doc_id, quality,
        |  CAST(floor(quality * 100.0) AS BIGINT) AS b FROM s),
        |hist AS (SELECT b, COUNT(*) AS cnt FROM sb GROUP BY 1),
        |cum AS (SELECT b, SUM(cnt) OVER (ORDER BY b
        |  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum FROM hist),
        |thr AS (SELECT MIN(b) AS thr FROM cum, (SELECT COUNT(*) AS n FROM sb)
        |  WHERE cum >= n * 0.75)
        |SELECT doc_id, quality FROM sb, thr WHERE b >= thr
        |ORDER BY doc_id""".stripMargin,

    "cohort_retention" ->
      """WITH f AS (
        |  -- DuckDB's week-trunc yields DATE; Spark's yields TIMESTAMP
        |  SELECT user_id, CAST(date_trunc('week', MIN(ts)) AS TIMESTAMP) AS cohort_week
        |  FROM events GROUP BY 1),
        |w AS (SELECT DISTINCT user_id,
        |  CAST(date_trunc('week', ts) AS TIMESTAMP) AS week FROM events)
        |SELECT cohort_week,
        |  CAST(date_diff('day', cohort_week, week) / 7 AS BIGINT) AS week_number,
        |  COUNT(DISTINCT user_id) AS active_users
        |FROM w JOIN f USING (user_id)
        |GROUP BY cohort_week, week_number
        |ORDER BY cohort_week, week_number""".stripMargin,

    "events_enriched_agg" ->
      """SELECT c_mktsegment, event_type, COUNT(*) AS n_events,
        |  CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS sum_value
        |FROM events e JOIN customer c ON e.user_id = c.c_custkey
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    // same history CTE as scd2_history; empty intervals dropped so the
    // ASOF pick is unique — mirrors eventsPriorityAtTime exactly
    "events_priority_at_time" ->
      """WITH v AS (
        |  SELECT o_custkey, o_orderpriority, o_orderdate, o_orderkey,
        |    lag(o_orderpriority) OVER (PARTITION BY o_custkey
        |      ORDER BY o_orderdate, o_orderkey) AS prev
        |  FROM orders),
        |c AS (SELECT * FROM v WHERE prev IS DISTINCT FROM o_orderpriority),
        |hist AS (
        |  SELECT o_custkey AS user_id, o_orderpriority AS priority_at_event,
        |    o_orderdate AS valid_from,
        |    lead(o_orderdate) OVER w AS valid_to
        |  FROM c
        |  WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)),
        |h AS (SELECT * FROM hist WHERE valid_to IS NULL OR valid_from < valid_to)
        |SELECT e.event_id, e.user_id, e.ts, h.priority_at_event
        |FROM events e
        |ASOF LEFT JOIN h ON e.user_id = h.user_id AND e.ts >= h.valid_from
        |ORDER BY e.event_id""".stripMargin,

    "window_suite" ->
      """SELECT l_suppkey, l_orderkey, l_linenumber, l_quantity,
        |  CAST(ntile(4) OVER w AS INTEGER) AS quartile,
        |  percent_rank() OVER w AS pct_rank,
        |  cume_dist() OVER w AS cume,
        |  lag(l_quantity, 1) OVER w AS prev_qty,
        |  lead(l_quantity, 1) OVER w AS next_qty,
        |  first_value(l_quantity) OVER w AS first_qty,
        |  nth_value(l_quantity, 3) OVER w AS third_qty
        |FROM lineitem
        |WINDOW w AS (PARTITION BY l_suppkey
        |  ORDER BY l_shipdate, l_orderkey, l_linenumber)
        |ORDER BY l_suppkey, l_orderkey, l_linenumber""".stripMargin,

    "grouping_sets_totals" -> s"""SELECT l_returnflag, l_linestatus,
        |  ${dsum("l_quantity")} AS sum_qty, COUNT(*) AS n,
        |  CAST(GROUPING(l_returnflag) * 2 + GROUPING(l_linestatus) AS BIGINT) AS gid
        |FROM lineitem
        |GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())
        |ORDER BY gid, l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST""".stripMargin,

    "scd2_history" -> scd2HistorySql,
    // C20b: the incremental apply's contract IS equality with the full
    // rebuild (the date split satisfies strictly-later), so the oracle
    // is the batch SQL verbatim
    "scd2_incremental" -> scd2HistorySql,
    // E26: date-tercile micro-batches satisfy strictly-later, so the
    // streamed lake history equals the full rebuild
    "stream_scd2_history" -> scd2HistorySql,

    "funnel_steps" -> funnelStepsSql,
    "stream_funnel_steps" -> funnelStepsSql,
    "bucketed_join" ->
      """SELECT o_orderkey, o_orderpriority, COUNT(*) AS n_items,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
        |    * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS revenue
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |GROUP BY 1, 2 ORDER BY 1""".stripMargin,

    // A8: the write → compact → read cycle must preserve every row,
    // value, and the derived period — the oracle aggregates the RAW
    // events directly
    "partitioned_lake_write" ->
      """SELECT strftime(ts, '%Y-%m') AS period, event_type,
        |  CAST(COUNT(*) AS BIGINT) AS n_events,
        |  CAST(SUM(CAST(CAST(value AS DECIMAL(12,2)) * 100 AS BIGINT))
        |    AS BIGINT) AS value_cents,
        |  MIN(event_id) AS min_id, MAX(event_id) AS max_id
        |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    // A12: versions replayed set-theoretically — v1 = evens, v2 = hot
    // segments replaced by odds with the rest carried forward, v3 =
    // rollback ≡ v1; the Spark side time-travels a real manifest lake
    "snapshot_time_travel" -> {
      val seg = s"CAST(SUM(CAST(CAST(c_acctbal AS DECIMAL(12,2)) * 100 AS BIGINT)) AS BIGINT)"
      s"""WITH ev AS (
        |  SELECT c_mktsegment, CAST(COUNT(*) AS BIGINT) AS n_customers,
        |    $seg AS balance_cents
        |  FROM customer WHERE c_custkey % 2 = 0 GROUP BY 1),
        |od AS (
        |  SELECT c_mktsegment, CAST(COUNT(*) AS BIGINT) AS n_customers,
        |    $seg AS balance_cents
        |  FROM customer WHERE c_custkey % 2 = 1
        |    AND c_mktsegment IN ('AUTOMOBILE', 'BUILDING') GROUP BY 1),
        |v2 AS (
        |  SELECT * FROM ev WHERE c_mktsegment NOT IN ('AUTOMOBILE', 'BUILDING')
        |  UNION ALL SELECT * FROM od)
        |SELECT CAST(1 AS INTEGER) AS version, * FROM ev
        |UNION ALL SELECT CAST(2 AS INTEGER), * FROM v2
        |UNION ALL SELECT CAST(3 AS INTEGER), * FROM ev
        |ORDER BY version, c_mktsegment""".stripMargin
    },

    // A15: the two audit reports recomputed from the source table;
    // published_rows = the clean commit's row count (the rejected one
    // publishes nothing — the face asserts version 0 in between)
    "write_audit_publish" ->
      """WITH n AS (SELECT CAST(COUNT(*) AS BIGINT) AS published_rows
        |           FROM customer),
        |r AS (
        |  SELECT 1 AS attempt, 'in_range(c_acctbal)' AS rule,
        |    CAST(COUNT(*) FILTER (WHERE c_acctbal < 0.0 OR c_acctbal > 10000.0)
        |      AS BIGINT) AS violations
        |  FROM customer
        |  UNION ALL
        |  SELECT 1, 'not_null(c_name)',
        |    CAST(COUNT(*) FILTER (WHERE c_name IS NULL) AS BIGINT)
        |  FROM customer
        |  UNION ALL
        |  SELECT 2, 'in_range(c_acctbal)',
        |    CAST(COUNT(*) FILTER (WHERE c_acctbal < -1000.0 OR c_acctbal > 10000.0)
        |      AS BIGINT)
        |  FROM customer
        |  UNION ALL
        |  SELECT 2, 'not_null(c_name)',
        |    CAST(COUNT(*) FILTER (WHERE c_name IS NULL) AS BIGINT)
        |  FROM customer
        |  UNION ALL
        |  SELECT 2, 'unique(c_custkey)',
        |    CAST(COUNT(c_custkey) - COUNT(DISTINCT c_custkey) AS BIGINT)
        |  FROM customer)
        |SELECT CAST(attempt AS INTEGER) AS attempt, rule, violations,
        |  violations = 0 AS pass, n.published_rows
        |FROM r, n ORDER BY attempt, rule""".stripMargin,

    // E4: salted ≡ plain inner join (SkewSpec pins the identity), so
    // the oracle is the unsalted join; the above-average test is the
    // same exact decimal cross-multiplication
    "skew_salted_join" ->
      """WITH dim AS (
        |  SELECT event_type, SUM(CAST(value AS DECIMAL(12,2))) AS tot,
        |    COUNT(*) AS n
        |  FROM events GROUP BY 1)
        |SELECT e.event_type, COUNT(*) AS n_events,
        |  CAST(SUM(CASE WHEN CAST(e.value AS DECIMAL(12,2)) * d.n > d.tot
        |    THEN 1 ELSE 0 END) AS BIGINT) AS n_above,
        |  round(CAST(SUM(CASE WHEN CAST(e.value AS DECIMAL(12,2)) * d.n > d.tot
        |    THEN 1 ELSE 0 END) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE), 6)
        |    AS frac_above
        |FROM events e JOIN dim d USING (event_type)
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    "table_profile" -> profileOracle("customer",
      graft.queries.WarehouseQueries.ProfileCols,
      Set("c_acctbal", "c_custkey", "c_nationkey")),

    "bm25_search" -> bm25Oracle(
      graft.queries.WarehouseQueries.Bm25Terms, 50, 1.2, 0.75),

    // D101: pass-1 BM25 verbatim, ordered expansion pick, pass-2
    // join-based BM25 with the pinned per-doc term fold
    "rocchio_prf_search" -> rocchioPrfOracle(
      graft.queries.WarehouseQueries.Bm25Terms,
      kDocs = 5, kExp = 3, k = 50, k1 = 1.2, b = 0.75),

    "ql_search" -> qlOracle(
      graft.queries.WarehouseQueries.Bm25Terms, 50, 100.0),

    // C62: all-integer micros fold — list_reduce with the list-typed
    // accumulator trick replays the engine's greedy chain-start state
    // exactly (same (t, tiebreak, step) sort, same CASE branches)
    "window_funnel" ->
      """WITH e AS (
        |  SELECT user_id, epoch_us(ts) AS t, event_id AS tb,
        |    CASE event_type WHEN 'view' THEN 0 WHEN 'click' THEN 1
        |         WHEN 'purchase' THEN 2 ELSE -1 END AS s
        |  FROM events),
        |g AS (
        |  SELECT user_id, list_sort(list([t, tb, s])) AS arr
        |  FROM e WHERE s >= 0 GROUP BY user_id),
        |f AS (
        |  SELECT user_id,
        |    list_reduce(
        |      list_prepend([CAST('-9223372036854775808' AS BIGINT),
        |                    CAST('-9223372036854775808' AS BIGINT),
        |                    CAST('-9223372036854775808' AS BIGINT)], arr),
        |      (acc, x) -> list_transform(range(1, 4), d -> CASE
        |        WHEN d = 1 AND x[3] = 0 THEN greatest(acc[1], x[1])
        |        WHEN d - 1 = x[3] AND x[3] > 0
        |             AND acc[d - 1] != CAST('-9223372036854775808' AS BIGINT)
        |             AND x[1] - acc[d - 1] <= 86400000000
        |             THEN greatest(acc[d], acc[d - 1])
        |        ELSE acc[d] END)) AS st
        |  FROM g)
        |SELECT user_id,
        |  CAST(len(list_filter(st,
        |    v -> v != CAST('-9223372036854775808' AS BIGINT))) AS INTEGER)
        |    AS depth
        |FROM f ORDER BY user_id""".stripMargin,

    "bootstrap_quality_ci" -> bootstrapOracle(200, 0.025),
    // the streaming face must land on the EXACT batch bits — one SQL
    "stream_bootstrap_ci" -> bootstrapOracle(200, 0.025),
    "stream_multibatch_ci" -> bootstrapOracle(200, 0.025),

    "dedup_weighted_jaccard" -> icwsOracle(32),

    // every leg is an exact integer count; rule names are the stable
    // sort key on both sides
    "data_expectations" ->
      """WITH legs AS (
        |  SELECT 'not_null(o_custkey)' AS rule,
        |    COUNT(*) FILTER (WHERE o_custkey IS NULL) AS violations FROM orders
        |  UNION ALL
        |  SELECT 'in_range(o_totalprice)',
        |    COUNT(*) FILTER (WHERE o_totalprice IS NOT NULL
        |      AND (o_totalprice < 0.0 OR o_totalprice > 400000.0)) FROM orders
        |  UNION ALL
        |  SELECT 'in_set(o_orderstatus)',
        |    COUNT(*) FILTER (WHERE o_orderstatus IS NOT NULL
        |      AND o_orderstatus NOT IN ('O', 'F')) FROM orders
        |  UNION ALL
        |  SELECT 'matches(o_orderpriority)',
        |    COUNT(*) FILTER (WHERE o_orderpriority IS NOT NULL
        |      AND NOT regexp_matches(o_orderpriority, '^[1-5]-')) FROM orders
        |  UNION ALL
        |  SELECT 'unique(o_orderkey)',
        |    COUNT(o_orderkey) - COUNT(DISTINCT o_orderkey) FROM orders
        |  UNION ALL
        |  SELECT 'ref_integrity(o_custkey)',
        |    (SELECT COUNT(*) FROM orders o
        |     LEFT JOIN customer c ON o.o_custkey = c.c_custkey
        |     WHERE o.o_custkey IS NOT NULL AND c.c_custkey IS NULL))
        |SELECT rule, CAST(violations AS BIGINT) AS violations,
        |  (violations = 0) AS pass
        |FROM legs ORDER BY rule""".stripMargin,

    // the E11 stream face monitors the ROW-LEVEL rule subset only
    // (uniqueness/ref-integrity are not per-batch decomposable); the
    // summed per-batch counts equal the batch scan exactly
    "stream_quality_totals" ->
      """WITH legs AS (
        |  SELECT 'not_null(o_custkey)' AS rule,
        |    COUNT(*) FILTER (WHERE o_custkey IS NULL) AS violations FROM orders
        |  UNION ALL
        |  SELECT 'in_range(o_totalprice)',
        |    COUNT(*) FILTER (WHERE o_totalprice IS NOT NULL
        |      AND (o_totalprice < 0.0 OR o_totalprice > 400000.0)) FROM orders
        |  UNION ALL
        |  SELECT 'in_set(o_orderstatus)',
        |    COUNT(*) FILTER (WHERE o_orderstatus IS NOT NULL
        |      AND o_orderstatus NOT IN ('O', 'F')) FROM orders
        |  UNION ALL
        |  SELECT 'matches(o_orderpriority)',
        |    COUNT(*) FILTER (WHERE o_orderpriority IS NOT NULL
        |      AND NOT regexp_matches(o_orderpriority, '^[1-5]-')) FROM orders)
        |SELECT rule, CAST(violations AS BIGINT) AS violations,
        |  (violations = 0) AS pass
        |FROM legs ORDER BY rule""".stripMargin,

    "json_ingest" ->
      """SELECT CAST(json_extract_string(props, '$.k') AS BIGINT) AS k, COUNT(*) AS n
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,

    // The Spark query (ReferenceQueries.csvIngest) first dumps the same
    // deterministic CSV the oracle reads; the driver runs Verify before
    // the DuckDB pass, so the files exist. The static entry renders the
    // driver-gate SF (sf0.01); SparkEntry.dynamicOracleSql overrides it
    // with the actual SF dir's name, so an any-SF sweep (GATE_sf1)
    // compares against the dump that sweep's Verify actually wrote
    // (r15 verdict item 3: the pinned path made sf1 FAIL by construction).
    "csv_ingest" -> csvIngestSql("sf0.01"),

    "code_mapping" ->
      """SELECT c_mktsegment,
        |  CASE c_mktsegment WHEN 'AUTOMOBILE' THEN 1 WHEN 'BUILDING' THEN 2
        |    WHEN 'FURNITURE' THEN 3 WHEN 'HOUSEHOLD' THEN 4
        |    WHEN 'MACHINERY' THEN 5 ELSE 0 END AS segment_code,
        |  COUNT(*) AS n
        |FROM customer GROUP BY 1, 2 ORDER BY segment_code""".stripMargin,

    "upsert_keep_latest" ->
      """SELECT event_id, ts, user_id, event_type, value FROM (
        |  SELECT event_id, ts, user_id, event_type, value,
        |    row_number() OVER (PARTITION BY user_id, event_type
        |                       ORDER BY ts DESC, event_id DESC) AS rn
        |  FROM events) WHERE rn = 1 ORDER BY user_id, event_type""".stripMargin,

    "incremental_load" ->
      """SELECT o_orderkey, o_custkey, o_orderdate FROM orders
        |WHERE date_trunc('month', o_orderdate) =
        |  (SELECT MAX(date_trunc('month', o_orderdate)) FROM orders)
        |ORDER BY o_orderkey""".stripMargin,

    "pk_dedup" ->
      """SELECT l_orderkey, l_linenumber, l_partkey, l_suppkey FROM (
        |  SELECT l_orderkey, l_linenumber, l_partkey, l_suppkey,
        |    row_number() OVER (PARTITION BY l_orderkey
        |      ORDER BY l_linenumber, l_partkey, l_suppkey) AS rn
        |  FROM lineitem) WHERE rn = 1 ORDER BY l_orderkey""".stripMargin,

    "top_n_by_metric" ->
      """SELECT c_custkey, c_name, c_acctbal FROM customer
        |ORDER BY c_acctbal DESC, c_custkey LIMIT 9""".stripMargin,

    "ratio_metric" ->
      """SELECT p_partkey, p_name, p_retailprice,
        |  p_retailprice / CAST(p_size AS DOUBLE) AS price_per_size
        |FROM part ORDER BY p_retailprice DESC, p_partkey LIMIT 9""".stripMargin,

    "dashboard_detail" -> s"""WITH $monthlyCte,
        |totals AS (
        |  SELECT o_custkey, ${dsum("o_totalprice")} AS total_spend, COUNT(*) AS n_orders
        |  FROM orders GROUP BY 1),
        |piv AS (
        |  SELECT o_custkey,
        |    CAST(MAX(CASE WHEN rk = 1 THEN mspend END) AS DOUBLE) AS m1_spend,
        |    CAST(MAX(CASE WHEN rk = 2 THEN mspend END) AS DOUBLE) AS m2_spend,
        |    CAST(MAX(CASE WHEN rk = 3 THEN mspend END) AS DOUBLE) AS m3_spend
        |  FROM monthly JOIN ranked USING (month) WHERE rk <= 3 GROUP BY 1),
        |avg4 AS (
        |  SELECT o_custkey, CAST(SUM(mspend) AS DOUBLE) / 4.0 AS avg_4m
        |  FROM monthly JOIN ranked USING (month) WHERE rk <= 4 GROUP BY 1)
        |SELECT c_custkey, c_name, c_mktsegment, n_name AS nation_name,
        |  concat_ws(' ', c_name, n_name) AS display_name,
        |  COALESCE(total_spend, 0.0) AS total_spend,
        |  COALESCE(n_orders, 0) AS n_orders,
        |  avg_4m, m1_spend, m2_spend, m3_spend
        |FROM customer
        |LEFT JOIN nation ON n_nationkey = c_nationkey
        |LEFT JOIN totals ON totals.o_custkey = c_custkey
        |LEFT JOIN piv ON piv.o_custkey = c_custkey
        |LEFT JOIN avg4 ON avg4.o_custkey = c_custkey
        |ORDER BY total_spend DESC, c_custkey LIMIT 15""".stripMargin,

    "last_periods_pivot" -> s"""WITH $monthlyCte
        |SELECT o_custkey,
        |  CAST(MAX(CASE WHEN rk = 1 THEN mspend END) AS DOUBLE) AS m1_spend,
        |  CAST(MAX(CASE WHEN rk = 2 THEN mspend END) AS DOUBLE) AS m2_spend,
        |  CAST(MAX(CASE WHEN rk = 3 THEN mspend END) AS DOUBLE) AS m3_spend
        |FROM monthly JOIN ranked USING (month) WHERE rk <= 3
        |GROUP BY 1 ORDER BY o_custkey""".stripMargin,

    "entity_time_series" ->
      """SELECT CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS month,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS spend,
        |  COUNT(*) AS n_orders
        |FROM orders WHERE o_custkey = 42
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    "rolling_period_avg" -> s"""WITH $monthlyCte
        |SELECT o_custkey, CAST(SUM(mspend) AS DOUBLE) / 4.0 AS avg_4m
        |FROM monthly JOIN ranked USING (month) WHERE rk <= 4
        |GROUP BY 1 ORDER BY o_custkey""".stripMargin,

    "stats_totals_a" -> s"""WITH $statsTotalsCte
        |SELECT l_partkey, n_lines, total_qty, total_price, disc_amount,
        |  tax_amount, disc_amount + tax_amount AS total_levies
        |FROM t ORDER BY total_qty DESC, l_partkey LIMIT 15""".stripMargin,

    "stats_totals_b" -> s"""WITH $statsTotalsCte
        |SELECT l_partkey, n_lines, total_qty, total_price, disc_amount,
        |  tax_amount, disc_amount + tax_amount AS total_levies
        |FROM t ORDER BY total_price DESC, l_partkey LIMIT 15""".stripMargin,

    "point_lookup" ->
      "SELECT c_custkey, c_name FROM customer WHERE c_name = 'Customer#000000042'",

    "join_quality" ->
      """SELECT COUNT(*) AS n_orphans FROM orders o
        |WHERE NOT EXISTS (SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey)""".stripMargin,

    "last_watermark" ->
      "SELECT MAX(o_orderdate) AS last_period, MAX(o_orderkey) AS last_key FROM orders",

    "q1_pricing_summary" -> s"""SELECT l_returnflag, l_linestatus,
        |  ${dsum("l_quantity")} AS sum_qty,
        |  ${dsum("l_extendedprice")} AS sum_base_price,
        |  $revenueSum AS sum_disc_price,
        |  CAST(SUM(${DP.format("l_extendedprice")} * ($ONE - ${DR.format("l_discount")})
        |    * ($ONE + ${DR.format("l_tax")})) AS DOUBLE) AS sum_charge,
        |  ${davg("l_quantity")} AS avg_qty,
        |  ${davg("l_extendedprice")} AS avg_price,
        |  ${davg("l_discount")} AS avg_disc,
        |  COUNT(*) AS count_order
        |FROM lineitem GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "q3_shipping_priority" -> s"""SELECT l_orderkey, o_orderdate, o_orderpriority,
        |  $revenueSum AS revenue
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |WHERE c_mktsegment = 'BUILDING'
        |GROUP BY 1, 2, 3 ORDER BY revenue DESC, l_orderkey LIMIT 20""".stripMargin,

    // Q17 shape: the correlated scalar subquery decorrelated the same
    // way the Spark side writes it — per-part decimal-exact avg (sum
    // cast double / count, THEN ×0.2), decimal revenue sum / 7.0
    "q17_small_quantity" ->
      """WITH thr AS (
        |  SELECT l_partkey,
        |    CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)
        |      / COUNT(l_quantity) * 0.2 AS thr
        |  FROM lineitem GROUP BY l_partkey)
        |SELECT p_brand,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
        |    / 7.0 AS avg_yearly
        |FROM lineitem JOIN thr USING (l_partkey)
        |JOIN part ON p_partkey = l_partkey
        |WHERE l_quantity < thr
        |GROUP BY p_brand ORDER BY p_brand""".stripMargin,

    // Q18 shape: HAVING-subquery membership as agg → filter → semi join
    "q18_large_volume" ->
      """WITH big AS (
        |  SELECT l_orderkey FROM lineitem GROUP BY l_orderkey
        |  HAVING SUM(CAST(l_quantity AS DECIMAL(18,2))) > 250)
        |SELECT c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS total_qty
        |FROM orders
        |JOIN big ON o_orderkey = big.l_orderkey
        |JOIN lineitem ON o_orderkey = lineitem.l_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |GROUP BY c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice
        |ORDER BY o_totalprice DESC, o_orderdate, o_orderkey
        |LIMIT 100""".stripMargin,

    "q2_min_cost" ->
      """WITH ps AS (
        |  SELECT l_partkey, l_suppkey,
        |    MIN(CAST(l_extendedprice AS DECIMAL(18,2))) AS cost
        |  FROM lineitem GROUP BY 1, 2),
        |m AS (SELECT l_partkey, MIN(cost) AS mc FROM ps GROUP BY 1)
        |SELECT ps.l_partkey AS p_partkey, ps.l_suppkey AS s_suppkey,
        |  CAST(ps.cost AS DOUBLE) AS cost
        |FROM ps JOIN m ON ps.l_partkey = m.l_partkey AND ps.cost = m.mc
        |ORDER BY p_partkey, s_suppkey""".stripMargin,

    "q16_supplier_variety" ->
      """SELECT p_brand, p_size,
        |  CAST(COUNT(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
        |FROM lineitem
        |JOIN part ON l_partkey = p_partkey
        |WHERE l_suppkey NOT IN
        |  (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
        |GROUP BY 1, 2 ORDER BY supplier_cnt DESC, p_brand, p_size""".stripMargin,

    "q21_suppliers_waiting" ->
      """WITH lo AS (
        |  SELECT l_orderkey, l_suppkey, l_shipdate, o_orderdate, o_orderstatus
        |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
        |l1 AS (
        |  SELECT DISTINCT l_orderkey AS ok, l_suppkey AS sk FROM lo
        |  WHERE o_orderstatus = 'F'
        |    AND l_shipdate > o_orderdate + INTERVAL 90 DAY)
        |SELECT s_name, CAST(COUNT(*) AS BIGINT) AS numwait
        |FROM l1 JOIN supplier ON sk = s_suppkey
        |WHERE EXISTS (SELECT 1 FROM lineitem l2
        |    WHERE l2.l_orderkey = l1.ok AND l2.l_suppkey <> l1.sk)
        |  AND NOT EXISTS (SELECT 1 FROM lo l3
        |    WHERE l3.l_orderkey = l1.ok AND l3.l_suppkey <> l1.sk
        |      AND l3.l_shipdate > l3.o_orderdate + INTERVAL 90 DAY)
        |GROUP BY s_name ORDER BY numwait DESC, s_name""".stripMargin,

    // Q20 shape: the correlated scalar aggregate decorrelates to a
    // double aggregate + join-back; the keep decision is integer-CENTS
    // cross-multiplied (2·q·ns > 3·tq) so it's exact in both engines.
    "q20_dominant_suppliers" ->
      """WITH sp AS (
        |  SELECT l_partkey, l_suppkey,
        |    CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) * 100 AS BIGINT) AS qc
        |  FROM lineitem GROUP BY 1, 2),
        |pt AS (SELECT l_partkey, SUM(qc) AS tqc, COUNT(*) AS ns
        |       FROM sp GROUP BY 1)
        |SELECT s_suppkey, s_name, n_dominant FROM (
        |  SELECT l_suppkey, COUNT(*) AS n_dominant
        |  FROM sp JOIN pt USING (l_partkey)
        |  WHERE 2 * qc * ns > 3 * tqc GROUP BY 1) d
        |JOIN supplier ON l_suppkey = s_suppkey
        |ORDER BY s_suppkey""".stripMargin,

    // Q22 shape: global scalar avg (cross-multiplied in cents — no
    // division) + NOT EXISTS as an anti join with the filter pushed.
    "q22_idle_rich_customers" ->
      """WITH pos AS (
        |  SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) * 100 AS BIGINT) AS tot,
        |         COUNT(*) AS n
        |  FROM customer WHERE c_acctbal > 0)
        |SELECT c_mktsegment, COUNT(*) AS numcust,
        |  CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS totacctbal
        |FROM customer, pos
        |WHERE CAST(CAST(c_acctbal AS DECIMAL(18,2)) * 100 AS BIGINT) * n > tot
        |  AND NOT EXISTS (SELECT 1 FROM orders o
        |    WHERE o.o_custkey = c_custkey AND o.o_orderpriority = '1-URGENT')
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    // Q13 shape: aggregate-before-join, zero-order customers kept.
    "q13_customer_distribution" ->
      """WITH oc AS (
        |  SELECT o_custkey, COUNT(*) AS n FROM orders
        |  WHERE o_orderpriority <> '1-URGENT' GROUP BY 1)
        |SELECT c_count, COUNT(*) AS custdist FROM (
        |  SELECT COALESCE(n, 0) AS c_count
        |  FROM customer LEFT JOIN oc ON c_custkey = o_custkey)
        |GROUP BY 1 ORDER BY custdist DESC, c_count DESC""".stripMargin,

    // D58: per-vector QA — integer counts, the ANN oracle's exact
    // index-ordered fold for the norm, float min/max selection.
    "embedding_audit" ->
      """WITH s AS (
        |  SELECT vec_id,
        |    CAST(len(embedding) AS INTEGER) AS dim,
        |    CAST(len(list_filter(embedding, x -> x = 0)) AS INTEGER) AS n_zeros,
        |    sqrt(list_reduce(list_transform(range(1, len(embedding) + 1),
        |      i -> CAST(embedding[i] AS DOUBLE) * CAST(embedding[i] AS DOUBLE)),
        |      (a, b) -> a + b)) AS l2_norm,
        |    list_min(embedding) AS min_c,
        |    list_max(embedding) AS max_c
        |  FROM embeddings)
        |SELECT vec_id, dim, n_zeros, l2_norm, min_c, max_c,
        |  l2_norm < 1e-6 AS is_degenerate
        |FROM s ORDER BY vec_id""".stripMargin,

    "q5_local_supplier" -> s"""SELECT n_name, $revenueSum AS revenue
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN customer ON o_custkey = c_custkey AND c_nationkey = s_nationkey
        |JOIN nation ON s_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |WHERE r_name = 'ASIA'
        |GROUP BY 1 ORDER BY revenue DESC, n_name""".stripMargin,

    "q7_nation_volume" ->
      s"""SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
        |  CAST(year(l_shipdate) AS INTEGER) AS l_year,
        |  $revenueSum AS revenue
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation n1 ON s_nationkey = n1.n_nationkey
        |JOIN nation n2 ON c_nationkey = n2.n_nationkey
        |WHERE (n1.n_name = 'NATION_18' AND n2.n_name = 'NATION_19')
        |   OR (n1.n_name = 'NATION_19' AND n2.n_name = 'NATION_18')
        |GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""".stripMargin,

    "q8_market_share" ->
      s"""WITH ac AS (
        |  SELECT c_custkey FROM customer
        |  JOIN nation ON c_nationkey = n_nationkey
        |  JOIN region ON n_regionkey = r_regionkey
        |  WHERE r_name = 'ASIA')
        |SELECT CAST(year(o_orderdate) AS INTEGER) AS o_year,
        |  round(
        |    CAST(SUM(CASE WHEN n_name = 'NATION_5'
        |      THEN ${DP.format("l_extendedprice")} *
        |        ($ONE - ${DR.format("l_discount")})
        |      ELSE CAST(0 AS DECIMAL(12,2)) END) AS DOUBLE)
        |    / CAST(SUM(${DP.format("l_extendedprice")} *
        |        ($ONE - ${DR.format("l_discount")})) AS DOUBLE), 6)
        |    AS mkt_share
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN nation ON s_nationkey = n_nationkey
        |WHERE o_custkey IN (SELECT c_custkey FROM ac)
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    "q9_product_profit" ->
      s"""SELECT n_name AS nation,
        |  CAST(year(l_shipdate) AS INTEGER) AS o_year,
        |  CAST(SUM(${DP.format("l_extendedprice")} *
        |      ($ONE - ${DR.format("l_discount")})
        |    - ${DP.format("l_quantity")} * ${DP.format("p_retailprice")} *
        |      CAST(0.5 AS DECIMAL(3,2))) AS DOUBLE) AS sum_profit
        |FROM lineitem
        |JOIN part ON l_partkey = p_partkey
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN nation ON s_nationkey = n_nationkey
        |WHERE p_name LIKE '%gear%'
        |GROUP BY 1, 2 ORDER BY 1, 2 DESC""".stripMargin,

    "q14_promo_revenue" ->
      s"""SELECT CAST(year(l_shipdate) AS INTEGER) AS l_year,
        |  round(100.0 *
        |    CAST(SUM(CASE WHEN p_type = 'PROMO'
        |      THEN ${DP.format("l_extendedprice")} *
        |        ($ONE - ${DR.format("l_discount")})
        |      ELSE CAST(0 AS DECIMAL(12,2)) END) AS DOUBLE)
        |    / CAST(SUM(${DP.format("l_extendedprice")} *
        |        ($ONE - ${DR.format("l_discount")})) AS DOUBLE), 6)
        |    AS promo_revenue
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    "q15_top_supplier" ->
      s"""WITH rev AS (
        |  SELECT l_suppkey,
        |    SUM(${DP.format("l_extendedprice")} *
        |      ($ONE - ${DR.format("l_discount")})) AS total
        |  FROM lineitem
        |  WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        |    AND l_shipdate < TIMESTAMP '1996-04-01'
        |  GROUP BY 1)
        |SELECT s_suppkey, s_name,
        |  CAST(total AS DOUBLE) AS total_revenue
        |FROM rev JOIN supplier ON l_suppkey = s_suppkey
        |WHERE total = (SELECT MAX(total) FROM rev)
        |ORDER BY s_suppkey""".stripMargin,

    "q19_disjunctive_predicates" ->
      s"""SELECT $revenueSum AS revenue, COUNT(*) AS n_items
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15
        |       AND l_quantity BETWEEN 1 AND 20)
        |   OR (p_brand = 'Brand#2' AND p_size BETWEEN 16 AND 30
        |       AND l_quantity BETWEEN 10 AND 30)
        |   OR (p_brand = 'Brand#3' AND p_size BETWEEN 31 AND 50
        |       AND l_quantity BETWEEN 20 AND 50)""".stripMargin,

    // the 1.5×-mean threshold cross-multiplies DECIMALs and integers
    // (2·val·n > 3·tot) — exact in both engines, so the boundary part
    // set cannot diverge
    "q11_important_stock" ->
      s"""WITH pp AS (
        |  SELECT l_partkey,
        |    SUM(${DP.format("l_extendedprice")} *
        |      ($ONE - ${DR.format("l_discount")})) AS val
        |  FROM lineitem GROUP BY 1)
        |SELECT l_partkey AS p_partkey, CAST(val AS DOUBLE) AS stock_value
        |FROM pp
        |WHERE val * (SELECT COUNT(*) FROM pp) * 2
        |    > (SELECT SUM(val) FROM pp) * 3
        |ORDER BY stock_value DESC, p_partkey""".stripMargin,

    // Q4 shape: correlated EXISTS as a semi join with the late-ship
    // predicate in the join condition
    "q4_order_priority" ->
      """SELECT o_orderpriority, COUNT(*) AS order_count
        |FROM orders
        |WHERE o_orderdate >= TIMESTAMP '1996-01-01'
        |  AND o_orderdate < TIMESTAMP '1996-04-01'
        |  AND EXISTS (SELECT 1 FROM lineitem
        |    WHERE l_orderkey = o_orderkey
        |      AND l_shipdate > o_orderdate + INTERVAL 60 DAY)
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    "q6_forecast_revenue" ->
      """SELECT
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
        |    * CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
        |  COUNT(*) AS n_items
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        |  AND l_shipdate < TIMESTAMP '1997-01-01'
        |  AND l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24""".stripMargin,

    "q10_returned_items" ->
      """SELECT c_custkey, c_name, c_acctbal, n_name,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
        |    * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2))))
        |    AS DOUBLE) AS revenue
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |WHERE o_orderdate >= TIMESTAMP '1996-01-01'
        |  AND o_orderdate < TIMESTAMP '1996-04-01'
        |  AND l_returnflag = 'R'
        |GROUP BY 1, 2, 3, 4
        |ORDER BY revenue DESC, c_custkey LIMIT 20""".stripMargin,

    // Q12 shape: CASE-sums fold into one aggregate pass; BIGINT casts
    // keep DuckDB's HUGEINT sums off the wire
    "q12_late_priority" ->
      """SELECT l_returnflag,
        |  CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH')
        |    THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
        |  CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH')
        |    THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        |  AND l_shipdate < TIMESTAMP '1997-01-01'
        |  AND l_shipdate > o_orderdate + INTERVAL 30 DAY
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    "window_running_sum" ->
      """SELECT l_suppkey, l_orderkey, l_linenumber,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) OVER (
        |    PARTITION BY l_suppkey
        |    ORDER BY l_shipdate, l_orderkey, l_linenumber
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_qty
        |FROM lineitem ORDER BY l_suppkey, l_orderkey, l_linenumber""".stripMargin,
  )

  /** A4 oracle body, parametrized on the SF dir NAME (sf0.01, sf1, …) —
    * the same derivation the Spark side uses
    * (ReferenceQueries.csvIngest: `/tmp/graft_csv_ingest/<sfName>`), so
    * both engines read the dump the current Verify run wrote.
    */
  private[graft] def csvIngestSql(sfName: String): String =
    s"""SELECT match_id, COUNT(*) AS n_rows,
       |  CAST(SUM(min_played) AS BIGINT) AS sum_min,
       |  CAST(SUM(key_passes) AS BIGINT) AS sum_kp,
       |  CAST(SUM(CAST(xg AS DECIMAL(18,2))) AS DOUBLE) AS sum_xg,
       |  CAST(SUM(CAST(xa AS DECIMAL(18,2))) AS DOUBLE) AS sum_xa
       |FROM read_csv('/tmp/graft_csv_ingest/$sfName/*.csv', header=true,
       |  ignore_errors=true,
       |  columns={'row_idx':'BIGINT','id':'BIGINT','full_name':'VARCHAR',
       |    'min_played':'INTEGER','key_passes':'INTEGER','assists':'INTEGER',
       |    'shots':'INTEGER','xg':'DOUBLE','xa':'DOUBLE','match_id':'BIGINT'})
       |GROUP BY match_id ORDER BY match_id""".stripMargin
}
